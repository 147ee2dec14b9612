"""Property-based tests (hypothesis) for the round-6 batch-4/5/6/7
operators: arbitrary inputs vs pure-Python references — the strongest
check on the integer rank-pair median math, the coupled Holt fold, the
encoding-health length arithmetic, and the consistent-hash ring."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wren_engine_spark.operators import metrics, text
from wren_engine_spark.operators.selection import ring_positions

_ST = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _med2(vals):
    s = sorted(vals)
    n = len(s)
    return s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]


@settings(**_ST)
@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=1000.0, allow_nan=False),
        min_size=1,
        max_size=24,
    )
)
def test_robust_stats_equals_rank_pair_reference(spark, vals):
    rows = [("k", float(v)) for v in vals]
    df = spark.createDataFrame(rows, "event_type STRING, value DOUBLE")
    r = metrics.robust_stats(df, "event_type", "value").collect()[0]
    q = [math.floor(v * 1e6 + 0.5) for v in vals]
    m2 = _med2(q)
    m4 = _med2([abs(2 * x - m2) for x in q])
    assert (r.n_values, r.med2, r.mad4) == (len(q), m2, m4)


@settings(**_ST)
@given(
    vals=st.lists(
        st.floats(min_value=-100.0, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=20,
    )
)
def test_holt_fold_bit_equals_python(spark, vals):
    rows = [(1, "a", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id LONG, event_type STRING, event_id LONG, value DOUBLE"
    )
    r = metrics.holt_linear(
        df, ["user_id", "event_type"], ["event_id"], "value",
        alpha=0.5, beta=0.25,
    ).collect()[0]
    l = b = 0.0
    for x in vals:
        lnew = 0.5 * x + 0.5 * (l + b)
        b = 0.25 * (lnew - l) + 0.75 * b
        l = lnew
    assert (r.level, r.trend, r.forecast) == (l, b, l + b)


# printable unicode incl. multibyte, controls, and the replacement char
_txt = st.text(
    alphabet=st.sampled_from(list("ab c\t\n\rπ日�é")), min_size=0, max_size=40
)


@settings(**_ST)
@given(texts=st.lists(_txt, min_size=1, max_size=6))
def test_encoding_health_counts_equal_python(spark, texts):
    rows = [(i, t, "s") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    r = text.encoding_health(df, "text", "source").collect()[0]
    chars = sum(len(t) for t in texts)
    bytes_ = sum(len(t.encode("utf-8")) for t in texts)
    ctrl = sum(t.count("\t") + t.count("\n") + t.count("\r") for t in texts)
    repl = sum(1 for t in texts if "�" in t)
    assert (r.n_docs, r.total_chars, r.total_bytes) == (len(texts), chars, bytes_)
    assert (r.multibyte_overhead, r.n_ctrl_chars, r.n_docs_replacement) == (
        bytes_ - chars,
        ctrl,
        repl,
    )


@pytest.mark.parametrize("seed", [7, 42, 1234])
@settings(max_examples=20, deadline=None)
@given(
    n_old=st.integers(min_value=1, max_value=12),
    grow=st.integers(min_value=1, max_value=6),
    vnodes=st.integers(min_value=1, max_value=24),
    keys=st.lists(st.integers(min_value=0, max_value=2**31 - 2), max_size=40),
)
def test_ring_growth_monotone_for_any_shape(seed, n_old, grow, vnodes, keys):
    """Consistent-hash invariant for ANY (n_old, n_new, vnodes, seed):
    growing the ring never moves a key between two OLD shards."""
    old_r = ring_positions(n_old, vnodes, seed)
    new_r = ring_positions(n_old + grow, vnodes, seed)

    def shard(ring, hv):
        ge = [p for p, _ in ring if p >= hv]
        key = min(ge) if ge else ring[0][0]
        for p, s in ring:
            if p == key:
                return s

    for h in keys:
        a, b = shard(old_r, h), shard(new_r, h)
        if a != b:
            assert b >= n_old, (h, a, b, n_old, grow, vnodes, seed)
