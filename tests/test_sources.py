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


@pytest.fixture(scope="module")
def derby_db(spark, tmp_path_factory):
    """An embedded Derby database with one table — Derby ships inside the
    Spark distribution (used for the metastore), so this is a REAL
    spark.read.jdbc round trip with no external service."""
    db = str(tmp_path_factory.mktemp("jdbc") / "testdb")
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE accounts (id INT, name VARCHAR(32), balance DOUBLE)")
    st.execute("INSERT INTO accounts VALUES (1,'alice',10.5),(2,'bob',20.0),(3,'carol',7.25)")
    st.close()
    conn.close()
    return {"url": f"jdbc:derby:{db}", "driver": driver}


class TestJdbcSource:
    def test_direct_url_reference(self, spark, derby_db):
        reg = SourceRegistry(spark)
        df = reg.resolve(f"{derby_db['url']}#accounts")
        assert df.count() == 3
        assert {c.lower() for c in df.columns} == {"id", "name", "balance"}

    def test_alias_reference(self, spark, derby_db):
        reg = SourceRegistry(spark).add_jdbc(
            "mydb", derby_db["url"], {"driver": derby_db["driver"]}
        )
        df = reg.resolve("jdbc:mydb#accounts")
        assert df.count() == 3

    def test_pushdown_subquery(self, spark, derby_db):
        reg = SourceRegistry(spark).add_jdbc("mydb", derby_db["url"])
        df = reg.resolve("jdbc:mydb#(SELECT id, balance FROM accounts WHERE balance > 8)")
        rows = df.collect()
        assert len(rows) == 2

    def test_pushdown_nested_subquery_keeps_parens(self, spark, derby_db):
        # trailing '))' must survive (no blanket rstrip of parens)
        reg = SourceRegistry(spark).add_jdbc("mydb", derby_db["url"])
        df = reg.resolve(
            "jdbc:mydb#(SELECT * FROM (SELECT id FROM accounts) AS inner1)"
        )
        assert df.count() == 3

    def test_pushdown_subquery_with_alias(self, spark, derby_db):
        reg = SourceRegistry(spark).add_jdbc("mydb", derby_db["url"])
        df = reg.resolve("jdbc:mydb#(SELECT id FROM accounts WHERE id >= 2) q")
        assert df.count() == 2

    def test_pushdown_subquery_paren_in_literal(self, spark, derby_db):
        # a ')' inside a string literal must not end the balance scan
        # early (which would skip the auto-alias and fail on Derby)
        reg = SourceRegistry(spark).add_jdbc("mydb", derby_db["url"])
        df = reg.resolve(
            "jdbc:mydb#(SELECT id, ')' AS c FROM accounts WHERE id = 1)"
        )
        rows = df.collect()
        assert len(rows) == 1 and rows[0]["C"] == ")"

    def test_filter_pushdown_reaches_jdbc_scan(self, spark, derby_db):
        # Catalyst pushes the filter into the remote query (JDBCRelation
        # PushedFilters) instead of scanning-then-filtering
        reg = SourceRegistry(spark).add_jdbc("mydb", derby_db["url"])
        df = reg.resolve("jdbc:mydb#accounts").filter("id = 2").select("name")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "id" in plan.lower()
        assert df.collect()[0][0] == "bob"

    def test_model_over_jdbc(self, spark, derby_db):
        from wren_engine_spark.engine import SemanticEngine
        from wren_engine_spark.mdl.manifest import Manifest

        manifest = Manifest.from_dict(
            {
                "catalog": "wren",
                "schema": "public",
                "models": [
                    {
                        "name": "accounts_m",
                        "tableReference": f"{derby_db['url']}#accounts",
                        "columns": [
                            {"name": "account_id", "type": "integer", "expression": "id"},
                            {"name": "owner", "type": "varchar", "expression": "name"},
                            {"name": "balance_eur", "type": "double",
                             "expression": "balance * 0.9"},
                        ],
                    }
                ],
            }
        )
        reg = SourceRegistry(spark)
        eng = SemanticEngine(spark, manifest, reg).deploy()
        rows = eng.sql(
            "SELECT owner, balance_eur FROM accounts_m ORDER BY account_id"
        ).collect()
        assert [r.owner for r in rows] == ["alice", "bob", "carol"]
        assert rows[0].balance_eur == pytest.approx(9.45)

    def test_jdbc_metadata_scrape(self, spark, derby_db):
        # reference per-backend metadata parity: live tables + columns +
        # pk through JDBC DatabaseMetaData
        reg = SourceRegistry(spark).add_jdbc(
            "mydb", derby_db["url"], {"driver": derby_db["driver"]}
        )
        tables = reg.jdbc_metadata("mydb", schema_pattern="APP")
        by_name = {t["name"].lower(): t for t in tables}
        assert "accounts" in by_name
        colnames = [c["name"].lower() for c in by_name["accounts"]["columns"]]
        assert colnames == ["id", "name", "balance"]
        types = {c["name"].lower(): c["type"].upper()
                 for c in by_name["accounts"]["columns"]}
        assert types["id"] == "INTEGER" and types["balance"] == "DOUBLE"

    def test_jdbc_metadata_unknown_alias(self, spark):
        with pytest.raises(SourceError, match="unknown jdbc alias"):
            SourceRegistry(spark).jdbc_metadata("nope")

    def test_malformed_jdbc_reference(self, spark):
        with pytest.raises(SourceError, match="jdbc"):
            SourceRegistry(spark).resolve("jdbc:derby:/nope/missing-table-sep")


class TestObjectStoreConfig:
    def test_s3_conf_keys_set(self, spark):
        reg = SourceRegistry(spark).configure_s3(
            endpoint="http://localhost:9000",
            access_key="ak",
            secret_key="sk",
            region="us-east-1",
            path_style=True,
        )
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        assert conf.get("fs.s3a.endpoint") == "http://localhost:9000"
        assert conf.get("fs.s3a.access.key") == "ak"
        assert conf.get("fs.s3a.secret.key") == "sk"
        assert conf.get("fs.s3a.endpoint.region") == "us-east-1"
        assert conf.get("fs.s3a.path.style.access") == "true"
        assert reg is not None

    def test_minio_is_s3_with_path_style(self, spark):
        SourceRegistry(spark).configure_minio("http://minio:9000", "a", "b")
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        assert conf.get("fs.s3a.endpoint") == "http://minio:9000"
        assert conf.get("fs.s3a.path.style.access") == "true"

    def test_s3a_path_resolves_through_scheme(self, spark):
        # network-free: only that the reference FORM routes to a reader —
        # the actual scan needs a bucket; resolve_sql must emit the path
        reg = SourceRegistry(spark)
        assert (
            reg.resolve_sql("parquet:s3a://bucket/events/")
            == "parquet.`s3a://bucket/events/`"
        )


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
