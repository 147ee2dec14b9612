"""Spark Connect smoke test (reference parity: the reference treats
Spark-via-Connect as a first-class execution target,
ibis-server/app/model/connector.py:930-981; this repo honors
``SPARK_MASTER=sc://host:port`` in session.get_spark).

The test starts a local Connect server out of $SPARK_HOME/sbin, attaches
a remote session, and runs a semantic-layer query end-to-end through the
sc:// channel. It skips — never fails — when the environment can't host
it: the Python Connect client needs grpcio (not bundled in every
container even though the server jar ships with pyspark), and the server
needs a free port and a JVM.
"""

from __future__ import annotations

import os
import socket
import subprocess
import time

import pytest

from tests.conftest import SF_DIR

_PORT = 15002


def _has_connect_client() -> bool:
    try:
        import grpc  # noqa: F401
        import pyspark.sql.connect.session  # noqa: F401

        return True
    except ImportError:
        return False


def _port_open(port: int, host: str = "127.0.0.1") -> bool:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.settimeout(0.5)
        return s.connect_ex((host, port)) == 0


pytestmark = pytest.mark.skipif(
    not _has_connect_client(),
    reason="Spark Connect client deps (grpcio) not installed",
)


@pytest.fixture(scope="module")
def connect_session():
    spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
    script = os.path.join(spark_home, "sbin", "start-connect-server.sh")
    if not os.path.exists(script):
        pytest.skip("start-connect-server.sh not found under SPARK_HOME")
    started_here = False
    if not _port_open(_PORT):
        proc = subprocess.run(
            [script, "--conf", f"spark.connect.grpc.binding.port={_PORT}"],
            capture_output=True,
            text=True,
            timeout=120,
        )
        if proc.returncode != 0:
            pytest.skip(f"connect server failed to start: {proc.stderr[-500:]}")
        started_here = True
        for _ in range(60):
            if _port_open(_PORT):
                break
            time.sleep(1)
        else:
            pytest.skip("connect server did not open its port within 60s")
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.remote(f"sc://localhost:{_PORT}").getOrCreate()
    yield spark
    spark.stop()
    if started_here:
        subprocess.run(
            [os.path.join(spark_home, "sbin", "stop-connect-server.sh")],
            capture_output=True,
            timeout=60,
        )


class TestSparkConnectSmoke:
    def test_parquet_scan_over_connect(self, connect_session):
        df = connect_session.read.parquet(f"{SF_DIR}/customer.parquet")
        assert df.count() > 0
        assert "c_custkey" in df.columns

    def test_semantic_query_over_connect(self, connect_session):
        # the engine's declarative plan builds unchanged on a remote
        # session: deploy a manifest and run a model projection through
        # the sc:// channel
        from wren_engine_spark.queries.registry import QUERIES

        rows = QUERIES["sem1_model_projection"](connect_session, SF_DIR).limit(5).collect()
        assert rows
