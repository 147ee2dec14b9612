"""SemanticEngine behavior tests on tiny in-memory fixtures.

Mirrors the reference's test matrix (wren-core/core/src/mdl/mod.rs:648-
4205 + sqllogictest model.slt): expression columns, ref_sql, to-one /
to-many calculated fields with the cardinality invariant (model.slt:
37-44), hidden columns, RLS required/optional/default properties,
RLS sanitization, CLAC operator matrix.
"""

import pytest

from wren_engine_spark.engine import AccessControlError, SemanticEngine
from wren_engine_spark.mdl.manifest import Manifest
from wren_engine_spark.sources.registry import SourceRegistry


def _sources(spark):
    customers = spark.createDataFrame(
        [(1, "alice", "NY"), (2, "bob", "CA"), (3, "carol", "TX")],
        "id INT, name STRING, state STRING",
    )
    orders = spark.createDataFrame(
        [(10, 1, 100.0), (11, 1, 50.0), (12, 2, 70.0)],
        "oid INT, cust_id INT, price DOUBLE",
    )
    return (
        SourceRegistry(spark)
        .add_dataframe("customers", customers)
        .add_dataframe("orders", orders)
    )


BASE = {
    "catalog": "t",
    "schema": "t",
    "models": [
        {
            "name": "Customers",
            "tableReference": "customers",
            "primaryKey": "Id",
            "columns": [
                {"name": "Id", "type": "int", "expression": "id"},
                {"name": "Name", "type": "varchar", "expression": "name"},
                {"name": "State", "type": "varchar", "expression": "state"},
                {"name": "orders", "relationship": "CO"},
                {"name": "Total", "type": "double", "isCalculated": True,
                 "expression": 'sum("orders"."Price")'},
                {"name": "NOrders", "type": "bigint", "isCalculated": True,
                 "expression": 'count("orders"."Oid")'},
            ],
        },
        {
            "name": "Orders",
            "tableReference": "orders",
            "primaryKey": "Oid",
            "columns": [
                {"name": "Oid", "type": "int", "expression": "oid"},
                {"name": "CustId", "type": "int", "expression": "cust_id"},
                {"name": "Price", "type": "double", "expression": "price"},
                {"name": "customer", "relationship": "CO"},
                {"name": "CustState", "type": "varchar", "isCalculated": True,
                 "expression": '"customer"."State"'},
                {"name": "PriceTax", "type": "double", "isCalculated": True,
                 "expression": '"Price" * 1.1'},
            ],
        },
    ],
    "relationships": [
        {"name": "CO", "models": ["Customers", "Orders"], "joinType": "ONE_TO_MANY",
         "condition": '"Customers"."Id" = "Orders"."CustId"'}
    ],
    "views": [
        {"name": "StateView",
         "statement": 'SELECT "State", COUNT(*) AS n FROM "Customers" GROUP BY "State"'}
    ],
}


def _deploy(spark, manifest_dict=None, props=None):
    eng = SemanticEngine(spark, Manifest.from_dict(manifest_dict or BASE), _sources(spark))
    return eng.deploy(props or {})


class TestModelExpansion:
    def test_expression_columns(self, spark):
        eng = _deploy(spark)
        rows = eng.sql("SELECT Id, Name FROM Customers ORDER BY Id").collect()
        assert [(r.Id, r.Name) for r in rows] == [(1, "alice"), (2, "bob"), (3, "carol")]

    def test_to_one_calculated(self, spark):
        eng = _deploy(spark)
        rows = eng.sql("SELECT Oid, CustState FROM Orders ORDER BY Oid").collect()
        assert [(r.Oid, r.CustState) for r in rows] == [(10, "NY"), (11, "NY"), (12, "CA")]

    def test_to_one_preserves_cardinality(self, spark):
        # model.slt:37-44 invariant
        eng = _deploy(spark)
        assert eng.sql("SELECT * FROM Orders").count() == 3

    def test_to_many_calculated(self, spark):
        eng = _deploy(spark)
        rows = eng.sql("SELECT Id, Total, NOrders FROM Customers ORDER BY Id").collect()
        assert [(r.Id, r.Total, r.NOrders) for r in rows] == [
            (1, 150.0, 2), (2, 70.0, 1), (3, None, None)]

    def test_to_many_preserves_cardinality(self, spark):
        eng = _deploy(spark)
        assert eng.sql("SELECT * FROM Customers").count() == 3

    def test_inline_calculated(self, spark):
        eng = _deploy(spark)
        r = eng.sql("SELECT PriceTax FROM Orders WHERE Oid = 10").collect()[0]
        assert r.PriceTax == pytest.approx(110.0)

    def test_view(self, spark):
        eng = _deploy(spark)
        rows = eng.sql("SELECT * FROM StateView ORDER BY State").collect()
        assert [(r.State, r.n) for r in rows] == [("CA", 1), ("NY", 1), ("TX", 1)]

    def test_ref_sql_model(self, spark):
        man = {
            "catalog": "t", "schema": "t",
            "models": [{
                "name": "BigOrders",
                "refSql": "SELECT oid, price FROM src_orders WHERE price > 60",
                "columns": [{"name": "oid", "type": "int"},
                            {"name": "price", "type": "double"}],
            }],
        }
        # ref_sql reads an already-registered temp view
        _sources(spark).resolve("orders").createOrReplaceTempView("src_orders")
        eng = SemanticEngine(spark, Manifest.from_dict(man), _sources(spark))
        eng.deploy({})
        assert eng.sql("SELECT count(*) AS c FROM BigOrders").collect()[0].c == 2

    def test_hidden_column(self, spark):
        man = {
            "catalog": "t", "schema": "t",
            "models": [{
                "name": "M", "tableReference": "customers",
                "columns": [{"name": "id", "type": "int"},
                            {"name": "state", "type": "varchar", "isHidden": True}],
            }],
        }
        eng = _deploy(spark, man)
        assert eng.sql("SELECT * FROM M").columns == ["id"]

    def test_dry_run(self, spark):
        eng = _deploy(spark)
        eng.dry_run("SELECT Id FROM Customers")
        with pytest.raises(Exception):
            eng.dry_run("SELECT nope FROM Customers")

    def test_calc_field_pruning(self, spark):
        # semantic-layer column pruning (plan.rs:63-426 parity): a query
        # not touching join-backed calculated fields must plan no joins
        eng = _deploy(spark)
        plan = (
            eng.sql("SELECT Id, Name FROM Customers")
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "Join" not in plan and "Aggregate" not in plan
        plan2 = (
            eng.sql("SELECT Id, Total FROM Customers")
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert plan2.count("Aggregate") == 1

    def test_star_keeps_full_schema(self, spark):
        eng = _deploy(spark)
        cols = eng.sql("SELECT * FROM Customers").columns
        assert cols == ["Id", "Name", "State", "Total", "NOrders"]


def _rls_manifest(required=True, default=None, condition='"Price" > @lvl'):
    props = [{"name": "lvl", "required": required}]
    if default is not None:
        props[0]["defaultExpr"] = default
    return {
        "catalog": "t", "schema": "t",
        "models": [{
            "name": "Orders", "tableReference": "orders", "primaryKey": "Oid",
            "columns": [{"name": "Oid", "type": "int", "expression": "oid"},
                        {"name": "Price", "type": "double", "expression": "price"}],
            "rowLevelAccessControls": [
                {"name": "r", "requiredProperties": props, "condition": condition}],
        }],
    }


class TestRLS:
    # access_control.rs:121-288 semantics
    def test_filter_applied(self, spark):
        eng = _deploy(spark, _rls_manifest(), props={"lvl": "60"})
        assert eng.sql("SELECT count(*) AS c FROM Orders").collect()[0].c == 2

    def test_required_property_missing(self, spark):
        with pytest.raises(AccessControlError, match="lvl"):
            _deploy(spark, _rls_manifest())

    def test_default_expr_used(self, spark):
        eng = _deploy(spark, _rls_manifest(required=False, default="90"))
        assert eng.sql("SELECT count(*) AS c FROM Orders").collect()[0].c == 1

    def test_string_property_quoted(self, spark):
        man = _rls_manifest(condition='"Oid" = @lvl')
        man["models"][0]["rowLevelAccessControls"][0]["requiredProperties"][0]["name"] = "lvl"
        eng = _deploy(spark, man, props={"lvl": "10"})
        assert eng.sql("SELECT count(*) AS c FROM Orders").collect()[0].c == 1

    def test_subquery_rejected(self, spark):
        # access_control.rs:216-248: no statements inside RLS conditions
        with pytest.raises(AccessControlError, match="simple boolean"):
            _deploy(spark, _rls_manifest(condition='"Oid" IN (SELECT 1)'), props={"lvl": "1"})


def _clac_manifest(operator, threshold, ttype="NUMERIC"):
    return {
        "catalog": "t", "schema": "t",
        "models": [{
            "name": "M", "tableReference": "customers",
            "columns": [
                {"name": "id", "type": "int"},
                {"name": "state", "type": "varchar",
                 "columnLevelAccessControl": {
                     "name": "g", "operator": operator,
                     "threshold": {"value": threshold, "type": ttype},
                     "requiredProperties": [{"name": "level", "required": True}]}},
            ],
        }],
    }


class TestCLAC:
    # access_control.rs:290-399: six comparison operators
    @pytest.mark.parametrize(
        "op,thr,prop,visible",
        [
            ("EQUALS", "5", "5", True),
            ("EQUALS", "5", "4", False),
            ("NOT_EQUALS", "5", "4", True),
            ("GREATER_THAN", "5", "7", True),
            ("GREATER_THAN", "5", "5", False),
            ("LESS_THAN", "5", "3", True),
            ("GREATER_THAN_OR_EQUALS", "5", "5", True),
            ("LESS_THAN_OR_EQUALS", "5", "9", False),
        ],
    )
    def test_operator_matrix(self, spark, op, thr, prop, visible):
        eng = _deploy(spark, _clac_manifest(op, thr), props={"level": prop})
        cols = eng.sql("SELECT * FROM M").columns
        assert ("state" in cols) == visible

    def test_missing_required_property_hides(self, spark):
        eng = _deploy(spark, _clac_manifest("EQUALS", "5"))
        assert eng.sql("SELECT * FROM M").columns == ["id"]

    def test_string_threshold(self, spark):
        eng = _deploy(
            spark, _clac_manifest("EQUALS", "admin", "STRING"), props={"level": "admin"})
        assert "state" in eng.sql("SELECT * FROM M").columns


class TestCachedModel:
    def test_cached_model_materializes(self, spark):
        from tests.conftest import SF_DIR
        from wren_engine_spark.queries.semantic import MANIFEST, deploy

        manifest = {**MANIFEST}
        manifest["models"] = [
            {**m, "cached": True} if m["name"] == "region_m" else m
            for m in MANIFEST["models"]
        ]
        deploy(spark, SF_DIR, manifest)
        df = spark.table("region_m")
        assert df.storageLevel.useMemory
        assert df.count() == 5
        # leave the session clean for other tests
        df.unpersist()


class TestPermissionAnalyze:
    # mod.rs:543-592: clean permission error instead of UNRESOLVED_COLUMN
    def test_denied_column_raises_access_error(self, spark):
        from wren_engine_spark.engine import AccessControlError

        eng = _deploy(spark, _clac_manifest("EQUALS", "5"), props={"level": "4"})
        with pytest.raises(AccessControlError, match=r"M\.state"):
            eng.sql("SELECT state FROM M")

    def test_plain_unknown_column_not_masked(self, spark):
        from wren_engine_spark.engine import AccessControlError

        eng = _deploy(spark, _clac_manifest("EQUALS", "5"), props={"level": "5"})
        with pytest.raises(Exception) as exc:
            eng.sql("SELECT no_such FROM M")
        assert not isinstance(exc.value, AccessControlError)

    def test_allowed_column_unaffected(self, spark):
        eng = _deploy(spark, _clac_manifest("EQUALS", "5"), props={"level": "5"})
        assert eng.sql("SELECT state FROM M").columns == ["state"]

    def test_qualified_denied_column_still_reported(self, spark):
        # Spark reports multi-part names per part (`M`.`state`); the
        # qualifier must not defeat the clean AccessControlError
        from wren_engine_spark.engine import AccessControlError

        eng = _deploy(spark, _clac_manifest("EQUALS", "5"), props={"level": "4"})
        with pytest.raises(AccessControlError, match=r"M\.state"):
            eng.sql("SELECT M.state FROM M")

    def test_denied_name_in_string_literal_not_reported(self, spark):
        # ADVICE parity: a denied column name appearing ONLY inside a
        # string literal is not an identifier reference — the query must
        # succeed, not raise AccessControlError
        eng = _deploy(spark, _clac_manifest("EQUALS", "5"), props={"level": "4"})
        rows = eng.sql("SELECT id, 'state' AS lbl FROM M").collect()
        assert all(r.lbl == "state" for r in rows)

    def test_other_unresolved_column_not_misattributed(self, spark):
        # an unresolved column DIFFERENT from the denied one must surface
        # as the original analysis error, not a permission denial
        from wren_engine_spark.engine import AccessControlError

        eng = _deploy(spark, _clac_manifest("EQUALS", "5"), props={"level": "4"})
        with pytest.raises(Exception) as exc:
            eng.sql("SELECT no_such, state FROM M")
        # whichever column Spark reports first, a wrong column name must
        # never be converted into a denial of a different column
        if isinstance(exc.value, AccessControlError):
            assert "state" in str(exc.value)

    def test_syntax_error_not_masked(self, spark):
        from wren_engine_spark.engine import AccessControlError

        eng = _deploy(spark, _clac_manifest("EQUALS", "5"), props={"level": "4"})
        with pytest.raises(Exception) as exc:
            eng.sql("SELEC id FRM M")
        assert not isinstance(exc.value, AccessControlError)


class TestQuoteAwareness:
    """String-literal content must survive the identifier rewrites
    (ADVICE: the '\"...\"' -> backtick rewrite previously corrupted
    literals containing double quotes)."""

    def test_double_quotes_in_literal_survive(self, spark):
        eng = _deploy(spark)
        rows = eng.sql(
            "SELECT Name, 'he said \"hi\"' AS quote FROM Customers ORDER BY Id"
        ).collect()
        assert all(r.quote == 'he said "hi"' for r in rows)

    def test_literal_filter_value_not_rewritten(self, spark):
        eng = _deploy(spark)
        # if the literal were rewritten to backticks, this would match 0
        # rows differently / corrupt the comparison value
        n = eng.sql(
            "SELECT * FROM Customers WHERE Name <> 'x\"y'"
        ).count()
        assert n == 3

    def test_namespace_pattern_inside_literal_kept(self, spark):
        eng = _deploy(spark)
        rows = eng.sql("SELECT 't.t.keep' AS v FROM Customers LIMIT 1").collect()
        assert rows[0].v == "t.t.keep"

    def test_escaped_quote_literal(self, spark):
        eng = _deploy(spark)
        rows = eng.sql('SELECT \'don\'\'t "quote" me\' AS v FROM Customers LIMIT 1').collect()
        assert rows[0].v == 'don\'t "quote" me'


class TestPerRequestTimezone:
    """Per-request session timezone (reference x-wren-timezone header;
    wren-core/core/src/mdl/context.rs:50-75 timezone cases): tz-aware
    expressions evaluate under the requested zone for that query only,
    and the session default (UTC) is restored afterwards."""

    def test_offset_zone_shifts_interpretation(self, spark):
        eng = _deploy(spark)
        q = "SELECT unix_timestamp('2024-01-01 00:00:00') AS ts FROM Customers LIMIT 1"
        utc = eng.sql(q, timezone="UTC").collect()[0].ts
        plus8 = eng.sql(q, timezone="+08:00").collect()[0].ts
        minus5 = eng.sql(q, timezone="-05:00").collect()[0].ts
        # midnight wall clock in +08:00 is 8h EARLIER as an instant
        assert utc - plus8 == 8 * 3600
        assert minus5 - utc == 5 * 3600

    def test_iana_zone_name(self, spark):
        eng = _deploy(spark)
        row = eng.sql(
            "SELECT current_timezone() AS tz FROM Customers LIMIT 1",
            timezone="Asia/Tokyo",
        ).collect()[0]
        assert row.tz == "Asia/Tokyo"

    def test_session_default_restored(self, spark):
        eng = _deploy(spark)
        eng.sql("SELECT 1 FROM Customers LIMIT 1", timezone="+08:00").collect()
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # restored even when the query fails
        import pytest as _pytest

        with _pytest.raises(Exception):
            eng.sql("SELECT no_such FROM Customers", timezone="+08:00")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"

    def test_invalid_timezone_rejected(self, spark):
        from wren_engine_spark.engine import PlanError

        eng = _deploy(spark)
        with pytest.raises(PlanError, match="invalid timezone"):
            eng.sql("SELECT 1 FROM Customers", timezone="Mars/Olympus_Mons")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"

    def test_timestamp_rendering_in_zone(self, spark):
        from wren_engine_spark.serving import SemanticService

        eng = _deploy(spark)
        svc = SemanticService(eng)
        # an instant fixed in UTC, rendered in a requested zone's wall clock
        q = ("SELECT to_timestamp('2024-06-01 12:00:00') AS ts "
             "FROM Customers LIMIT 1")
        out_utc = svc.query(q, timezone="UTC")
        out_tokyo = svc.query(q, timezone="Asia/Tokyo")
        assert out_utc["data"][0][0] == "2024-06-01 12:00:00.000000"
        # the literal is interpreted as Tokyo wall clock AND rendered back
        # in Tokyo wall clock -> same display; use an explicit UTC instant
        # for the shift check
        q2 = ("SELECT from_utc_timestamp(to_utc_timestamp("
              "'2024-06-01 12:00:00', 'UTC'), 'UTC') AS ts FROM Customers LIMIT 1")
        out2 = svc.query(q2, timezone="UTC")
        assert out2["data"][0][0] == "2024-06-01 12:00:00.000000"
        assert out_tokyo["data"][0][0] == "2024-06-01 12:00:00.000000"

    def test_optimizer_substituted_fns_see_zone_through_service(self, spark):
        # the serving wrappers (zone rendering, limit) must not push the
        # optimizer pass outside the tz window
        from wren_engine_spark.serving import SemanticService

        eng = _deploy(spark)
        svc = SemanticService(eng)
        out = svc.query(
            "SELECT current_timezone() AS tz, timestamp_seconds(0) AS ts "
            "FROM Customers",
            timezone="Asia/Tokyo",
            limit=1,
        )
        assert out["data"][0][0] == "Asia/Tokyo"
        assert out["data"][0][1] == "1970-01-01 09:00:00.000000"  # UTC+9

    def test_timestamp_shift_via_service(self, spark):
        from wren_engine_spark.serving import SemanticService

        eng = _deploy(spark)
        svc = SemanticService(eng)
        # timestamp stored as a UTC instant: cast a unix epoch (zone-free)
        q = "SELECT timestamp_seconds(1717243200) AS ts FROM Customers LIMIT 1"
        utc = svc.query(q, timezone="UTC")["data"][0][0]
        tokyo = svc.query(q, timezone="Asia/Tokyo")["data"][0][0]
        assert utc == "2024-06-01 12:00:00.000000"
        assert tokyo == "2024-06-01 21:00:00.000000"  # UTC+9 wall clock


class TestCalcPruning:
    def test_count_star_still_prunes_calc_joins(self, spark):
        # COUNT(*) reads no columns — the heavy to-many pre-aggregation
        # joins must NOT be kept for it
        eng = _deploy(spark)
        df = eng.sql("SELECT COUNT(*) AS n FROM Customers")
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan
        assert df.collect()[0].n == 3

    def test_real_star_keeps_all_fields(self, spark):
        eng = _deploy(spark)
        cols = eng.sql("SELECT * FROM Customers").columns
        assert "Total" in cols and "NOrders" in cols

    def test_qualified_star_keeps_all_fields(self, spark):
        eng = _deploy(spark)
        cols = eng.sql("SELECT c.* FROM Customers c").columns
        assert "Total" in cols

    def test_multiplication_is_conservative(self, spark):
        # a '*' that is multiplication keeps fields (no parse available)
        eng = _deploy(spark)
        rows = eng.sql(
            "SELECT Id, Total * 2 AS t2 FROM Customers ORDER BY Id"
        ).collect()
        assert rows[0].t2 == 300.0

    def test_calc_on_calc_transitive_pruning(self, spark):
        # a query naming only TotalX2 must also attach Total (its
        # dependency); COUNT(*) pruning exposes the closure requirement
        import copy

        man = copy.deepcopy(BASE)
        man["models"][0]["columns"].append(
            {"name": "TotalX2", "type": "double", "isCalculated": True,
             "expression": '"Total" * 2'}
        )
        eng = _deploy(spark, man)
        r = eng.sql(
            "SELECT COUNT(*) AS n FROM Customers WHERE TotalX2 > 200"
        ).collect()[0]
        assert r.n == 1  # alice: Total 150 -> 300
        rows = eng.sql(
            "SELECT Id, TotalX2 FROM Customers WHERE TotalX2 IS NOT NULL ORDER BY Id"
        ).collect()
        assert [(r.Id, r.TotalX2) for r in rows] == [(1, 300.0), (2, 140.0)]


class TestPlanCache:
    def test_repeat_query_returns_cached_plan(self, spark):
        eng = _deploy(spark)
        q = "SELECT Id, Total FROM Customers"
        a = eng.sql(q)
        b = eng.sql(q)
        assert a is b  # same bound plan object — no re-analysis
        assert eng.sql(q, use_plan_cache=False) is not b

    def test_cache_key_includes_timezone(self, spark):
        eng = _deploy(spark)
        q = "SELECT unix_timestamp('2024-01-01 00:00:00') AS ts FROM Customers LIMIT 1"
        a = eng.sql(q, timezone="UTC").collect()[0].ts
        b = eng.sql(q, timezone="+08:00").collect()[0].ts
        assert a - b == 8 * 3600  # distinct cache entries per zone

    def test_redeploy_invalidates(self, spark):
        eng = _deploy(spark)
        q = "SELECT Id FROM Customers"
        a = eng.sql(q)
        eng.deploy({})
        assert eng.sql(q) is not a

    def test_time_dependent_queries_not_cached(self, spark):
        # a cached plan would freeze ComputeCurrentTime's baked literals
        eng = _deploy(spark)
        q = "SELECT current_date() AS d FROM Customers LIMIT 1"
        assert eng.sql(q) is not eng.sql(q)
        q2 = "SELECT rand() AS r FROM Customers LIMIT 1"
        assert eng.sql(q2) is not eng.sql(q2)
        # aliases must be covered too (curdate == current_date)
        q3 = "SELECT curdate() AS d FROM Customers LIMIT 1"
        assert eng.sql(q3) is not eng.sql(q3)

    def test_limited_service_query_uses_plan_cache(self, spark):
        # {sql, limit} requests (the dashboard shape) must still benefit
        # from the analyzed-plan cache: the limit is applied OUTSIDE the
        # engine so the base plan is cached and reused
        from wren_engine_spark.serving import SemanticService

        eng = _deploy(spark)
        svc = SemanticService(eng)
        q = "SELECT Id, Total FROM Customers ORDER BY Id"
        svc.query(q, limit=2)
        base = eng.sql(q)
        assert eng.sql(q) is base  # cache was populated despite the limit
        out = svc.query(q, limit=1)
        assert len(out["data"]) == 1

    def test_errors_surface_as_pyspark_types(self, spark):
        # the direct JVM sql call must convert Java errors to the same
        # PySpark exception types spark.sql raises
        from pyspark.errors import AnalysisException

        eng = _deploy(spark)
        with pytest.raises(AnalysisException):
            eng.sql("SELECT definitely_missing FROM Customers")


class TestConcurrentSql:
    def test_concurrent_variant_swaps_do_not_race(self, spark):
        """Two threads alternating different calculated-field subsets on
        the same engine: without serialization, one thread's view swap
        lands between the other's registration and analysis and fails
        with UNRESOLVED_COLUMN (ADVICE race)."""
        import threading

        eng = _deploy(spark)
        errors: list[Exception] = []

        def worker(q: str) -> None:
            try:
                for _ in range(10):
                    eng.sql(q).collect()
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=worker, args=("SELECT Id, Total FROM Customers",)),
            threading.Thread(target=worker, args=("SELECT Id, NOrders FROM Customers",)),
            threading.Thread(target=worker, args=("SELECT Oid, CustState FROM Orders",)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:1]


class TestViewOrdering:
    def _manifest_with_views(self, views):
        return {
            "catalog": "t", "schema": "t",
            "models": [{
                "name": "base_m", "tableReference": "customers",
                "columns": [{"name": "id", "type": "int"},
                            {"name": "state", "type": "varchar"}],
            }],
            "views": views,
        }

    def test_out_of_order_views_deploy(self, spark):
        # v2 references v1 but is declared FIRST
        eng = _deploy(spark, self._manifest_with_views([
            {"name": "v2", "statement": "SELECT * FROM v1 WHERE id > 0"},
            {"name": "v1", "statement": "SELECT id, state FROM base_m"},
        ]))
        assert eng.sql("SELECT COUNT(*) AS n FROM v2").collect()[0].n >= 0

    def test_view_cycle_rejected(self, spark):
        from wren_engine_spark.engine import PlanError

        with pytest.raises(PlanError, match="cycle"):
            _deploy(spark, self._manifest_with_views([
                {"name": "va", "statement": "SELECT * FROM vb"},
                {"name": "vb", "statement": "SELECT * FROM va"},
            ]))


class TestNonIdentifierNames:
    """Reference parity: quote-aware, case-sensitive identifiers — model,
    column, and view names that are not bare identifiers (unicode,
    spaces) must deploy and be queryable with backticks
    (mod.rs:823,1851,3448)."""

    MANIFEST = {
        "catalog": "t",
        "schema": "t",
        "models": [
            {
                "name": "客户 table",
                "tableReference": "customers",
                "primaryKey": "clé",
                "columns": [
                    {"name": "clé", "type": "int", "expression": "id"},
                    {"name": "namé", "type": "varchar", "expression": "name"},
                ],
            }
        ],
        "relationships": [],
        "views": [
            {"name": "vue française",
             "statement": 'SELECT `clé` FROM `客户 table` WHERE `clé` >= 2'}
        ],
    }

    def test_unicode_model_and_view(self, spark):
        eng = _deploy(spark, self.MANIFEST)
        rows = eng.sql('SELECT `clé`, `namé` FROM `客户 table` ORDER BY `clé`').collect()
        assert [r[0] for r in rows] == [1, 2, 3]
        assert eng.sql('SELECT COUNT(*) AS n FROM `vue française`').collect()[0].n == 2
