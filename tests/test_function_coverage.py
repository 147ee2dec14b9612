"""Measured function-surface coverage against the reference's declared
Spark function list (ibis-server/resources/function_list/spark.csv —
which is the Databricks runtime catalog: it includes vendor-proprietary
families OSS Spark cannot provide). The test measures, rather than
asserts by prose, SURVEY §7.2's name-compatibility claim.

Skips when the reference tree is absent (repo is standalone; the list
is an external artifact)."""

import csv
import os

import pytest

_REF_CSV = "/root/reference/ibis-server/resources/function_list/spark.csv"

# Databricks-proprietary families with no OSS equivalent: managed-AI
# functions, H3 geospatial index, ST_* geometry, Delta/Unity-Catalog
# introspection, managed ingestion/secrets/streaming sources.
_VENDOR_PREFIXES = ("ai_", "h3_", "st_", "ingestion_", "read_", "cloud_files",
                    "table_changes", "to_geo", "try_to_geo")
_VENDOR_NAMES = {
    "current_metastore", "current_oauth_custom_identity_claim",
    "current_recipient", "current_version", "event_log",
    "get_warmup_tracing", "hll_cardinality_internal", "hll_collect_internal",
    "http_request", "is_account_group_member", "is_member", "list_secrets",
    "measure", "metric_store", "remote_query", "schema_of_json_agg",
    "secret", "try_secret", "vector_search", "zstd_compress",
    "zstd_decompress", "try_zstd_decompress", "bit_reverse",
}


@pytest.mark.skipif(not os.path.exists(_REF_CSV), reason="reference list absent")
def test_oss_addressable_function_names_resolve(spark):
    from wren_engine_spark.functions.compat import register_compat_functions

    register_compat_functions(spark)
    with open(_REF_CSV) as f:
        names = [r["name"] for r in csv.DictReader(f)]
    oss = [
        n for n in names
        if n not in _VENDOR_NAMES and not n.startswith(_VENDOR_PREFIXES)
    ]
    missing = [n for n in oss if not spark.catalog.functionExists(n)]
    assert len(names) >= 400  # the list is the full catalog, not a sample
    # every OSS-addressable name must resolve (builtins + compat aliases)
    assert not missing, f"unresolved OSS-addressable functions: {missing}"


def test_alias_semantics(spark):
    from wren_engine_spark.functions.compat import register_compat_functions

    register_compat_functions(spark)
    row = spark.sql(
        "SELECT charindex('b', 'abc') AS ci, "
        "iff(1 < 2, 'y', 'n') AS f, "
        "try_remainder(7, 3) AS r, try_remainder(7, 0) AS r0, "
        "stringdecode(encode('héllo', 'utf-8'), 'utf-8') AS sd, "
        "(getdate() IS NOT NULL) AS gd"
    ).collect()[0]
    assert (row.ci, row.f, row.r, row.r0, row.sd, row.gd) == (2, "y", 1, None, "héllo", True)
