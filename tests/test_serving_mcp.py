"""MCP tool surface (reference mcp-server/app/wren.py parity): the
deploy-then-query state machine and each tool's envelope."""

import base64
import json

import pytest

from tests.conftest import SF_DIR
from wren_engine_spark.queries.semantic import MANIFEST
from wren_engine_spark.serving_mcp import McpToolServer
from wren_engine_spark.sources.registry import SourceRegistry


@pytest.fixture(scope="module")
def server(spark):
    srv = McpToolServer(spark, SourceRegistry(spark).add_directory(SF_DIR))
    b64 = base64.b64encode(json.dumps(MANIFEST).encode()).decode()
    out = srv.deploy(manifest_b64=b64)
    assert out["deployed"] and "customer_m" in out["models"]
    return srv


class TestTools:
    def test_query(self, server):
        out = server.query("SELECT custkey FROM customer_m ORDER BY custkey", limit=2)
        assert out["columns"] == ["custkey"] and len(out["data"]) == 2

    def test_dry_run_valid(self, server):
        assert server.dry_run("SELECT custkey FROM customer_m")["valid"]

    def test_dry_run_invalid(self, server):
        with pytest.raises(Exception):
            server.dry_run("SELECT nope FROM customer_m")

    def test_validate(self, server):
        assert server.validate("customer_m", "custkey")["valid"]
        assert not server.validate("customer_m", "nope")["valid"]

    def test_list_tables_and_columns(self, server):
        names = {t["name"] for t in server.list_tables()["tables"]}
        assert "customer_m" in names
        cols = {c["name"] for c in server.list_columns("customer_m")["columns"]}
        assert "custkey" in cols

    def test_list_relationships_and_functions(self, server):
        rels = {r["name"] for r in server.list_relationships()["relationships"]}
        assert "CustomerNation" in rels
        assert "sum" in set(server.list_functions()["functions"])

    def test_health(self, server):
        h = server.health()
        assert h["status"] == "ok" and h["deployed"]

    def test_registry_complete(self, server):
        names = {t.name for t in server.tools()}
        assert names == {
            "deploy", "query", "dry_run", "validate", "list_tables",
            "list_columns", "list_relationships", "list_functions",
            "knowledge", "dry_plan", "remote_metadata", "health",
        }

    def test_query_before_deploy_raises(self, spark):
        fresh = McpToolServer(spark)
        with pytest.raises(RuntimeError):
            fresh.query("SELECT 1")


def test_dry_plan_tool(server):
    out = server.dry_plan("SELECT custkey FROM customer_m", dialect="postgres")
    assert '"customer_m"' in out["sql"]


def test_knowledge_tool(server):
    k = server.knowledge()
    assert "rules" in k and k["schema"]["models"]
