"""Source registry: file-format scans (csv/json/parquet), directory
sources, scheme/extension resolution, and an MDL model backed by a CSV
file end-to-end (reference file-source surface:
wren-core/core/src/mdl/mod.rs:104-167, sqllogictest test_context.rs:119-131).
"""

import os

import pytest

from tests.conftest import SF_DIR
from wren_engine_spark.sources.registry import SourceError, SourceRegistry


@pytest.fixture(scope="module")
def files(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("src")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    csv_path = str(root / "nation_csv")
    json_path = str(root / "nation_json")
    nation.coalesce(1).write.option("header", "true").csv(csv_path)
    nation.coalesce(1).write.json(json_path)
    return {"csv": csv_path, "json": json_path, "rows": nation.count()}


class TestFileResolution:
    def test_scheme_csv(self, spark, files):
        reg = SourceRegistry(spark)
        df = reg.resolve(f"csv:{files['csv']}")
        assert df.count() == files["rows"]
        assert "n_name" in df.columns

    def test_scheme_json(self, spark, files):
        reg = SourceRegistry(spark)
        df = reg.resolve(f"json:{files['json']}")
        assert df.count() == files["rows"]

    def test_extension_parquet(self, spark):
        reg = SourceRegistry(spark)
        df = reg.resolve(f"{SF_DIR}/region.parquet")
        assert df.count() == 5

    def test_directory_source(self, spark):
        reg = SourceRegistry(spark).add_directory(SF_DIR)
        assert reg.resolve("region").count() == 5
        assert reg.resolve('"wren"."public"."region"').count() == 5

    def test_resolve_sql_forms(self, spark):
        reg = SourceRegistry(spark).add_directory(SF_DIR)
        assert reg.resolve_sql("csv:/tmp/x.csv") == "csv.`/tmp/x.csv`"
        assert reg.resolve_sql("/tmp/y.parquet") == "parquet.`/tmp/y.parquet`"
        assert reg.resolve_sql("region").startswith("parquet.`")

    def test_unresolvable_raises(self, spark):
        with pytest.raises(SourceError):
            SourceRegistry(spark).resolve("no_such_table_anywhere")


class TestCsvBackedModel:
    def test_model_over_csv(self, spark, files):
        from wren_engine_spark.engine import SemanticEngine
        from wren_engine_spark.mdl.manifest import Manifest

        manifest = Manifest.from_dict(
            {
                "catalog": "wren",
                "schema": "public",
                "models": [
                    {
                        "name": "nations_csv",
                        "tableReference": f"csv:{files['csv']}",
                        "columns": [
                            {"name": "key", "type": "integer", "expression": "n_nationkey"},
                            {"name": "name", "type": "varchar", "expression": "n_name"},
                        ],
                    }
                ],
            }
        )
        eng = SemanticEngine(spark, manifest, SourceRegistry(spark)).deploy()
        rows = eng.sql("SELECT COUNT(*) AS n FROM nations_csv").collect()
        assert rows[0].n == files["rows"]
