"""Dialect-render snapshots of the sem-layer corpus (round-3 verdict
item 8, textual-renderer half): pin the trino/snowflake/bigquery/
postgres/duckdb dry-plan renders so a renderer change that silently
alters cross-dialect output fails loudly. duckdb additionally
execute-verifies in test_serving.py; the sqlglot full-fidelity path has
its own test that activates when sqlglot is installed.

Regenerate with UPDATE_SNAPSHOTS=1 python -m pytest tests/test_dialect_snapshots.py
"""

import os
import pathlib

import pytest

from tests.conftest import SF_DIR
from wren_engine_spark.queries.semantic import deploy
from wren_engine_spark.serving import SemanticService

SNAP_DIR = pathlib.Path(__file__).parent / "snapshots" / "dialects"

CORPUS = {
    "scalar_funcs": (
        "SELECT custkey, instr(name, 'a') AS pos, nvl(acctbal, 0) AS bal "
        "FROM customer_m WHERE mktsegment = 'BUILDING' ORDER BY custkey LIMIT 10"
    ),
    "semantic_join": (
        "SELECT n.name AS nation, COUNT(*) AS n_cust FROM customer_m c "
        "JOIN nation_m n ON c.nationkey = n.nationkey GROUP BY n.name"
    ),
    "cte": (
        "WITH big AS (SELECT custkey, acctbal FROM customer_m "
        "WHERE acctbal > 1000) SELECT COUNT(*) AS n FROM big"
    ),
}

DIALECTS = ("trino", "snowflake", "bigquery", "postgres", "duckdb")


@pytest.fixture(scope="module")
def service(spark):
    return SemanticService(deploy(spark, SF_DIR))


def _normalize(text: str) -> str:
    # snapshots must not depend on where the testdata lives
    return text.replace(SF_DIR, "<SF>")


@pytest.mark.parametrize("dialect", DIALECTS)
def test_dialect_render_snapshot(service, dialect):
    rendered = "\n".join(
        f"-- {name}\n{_normalize(service.dry_plan(sql, dialect=dialect))}\n"
        for name, sql in CORPUS.items()
    )
    snap = SNAP_DIR / f"{dialect}.sql"
    if os.environ.get("UPDATE_SNAPSHOTS") or not snap.exists():
        snap.parent.mkdir(parents=True, exist_ok=True)
        snap.write_text(rendered)
    assert rendered == snap.read_text(), (
        f"{dialect} render drifted; regenerate with UPDATE_SNAPSHOTS=1 "
        "if the change is intentional"
    )


def test_snapshots_have_dialect_markers():
    """Spot-check the committed snapshots carry the per-dialect deltas
    the renderer is responsible for."""
    if not SNAP_DIR.exists():
        pytest.skip("snapshots not generated yet")
    tri = (SNAP_DIR / "trino.sql").read_text()
    sno = (SNAP_DIR / "snowflake.sql").read_text()
    bq = (SNAP_DIR / "bigquery.sql").read_text()
    duck = (SNAP_DIR / "duckdb.sql").read_text()
    assert "strpos(" in tri and "instr(" not in tri
    assert "charindex('a', name)" in sno and "instr(" not in sno
    assert "`customer_m`" in bq and "strpos(" in bq
    assert "read_parquet('" in duck
