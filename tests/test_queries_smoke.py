"""Registry-wide smoke: every __spark_entry__.queries() entry must run at
sf0.001 and produce a stable schema (mirrors the driver's t1 check).

Value-level correctness vs DuckDB is covered by tools/check_correctness.py
(the driver's t2 gate) — this test only guards that no registered query
crashes or returns a column-less frame.
"""

import pytest

from wren_engine_spark.queries.registry import QUERIES, ORACLES
from tests.conftest import SF_DIR

# queries whose semantics legitimately return 0 rows on the tiny sf0.001 slice
MAY_BE_EMPTY = {
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q11_important_stock",
    "q18_large_volume_customer",
    "q20_potential_part_promotion",
    "q21_suppliers_kept_waiting",
    "x3_ngram_jaccard_pairs",
    "x4_minhash_lsh_candidates",
    "x11_lsh_ann",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name} returned no columns"
    rows = df.collect()
    if name not in MAY_BE_EMPTY:
        assert rows, f"{name} returned 0 rows at sf0.001"


def test_every_tpch_query_present():
    # reference correctness corpus covers all 22 TPC-H queries
    # (wren-core/sqllogictest/test_files/tpch/q1..q22.slt.part)
    nums = {int(n.split("_")[0][1:]) for n in QUERIES if n[0] == "q" and n[1].isdigit()}
    assert nums == set(range(1, 23))


def test_oracle_coverage():
    missing = set(QUERIES) - set(ORACLES)
    # every registered query carries a DuckDB oracle since r7 (x14's
    # trained-IVF was the last holdout; its quantized Lloyd training
    # is now replayed bit-exactly in the oracle)
    assert missing == set()
