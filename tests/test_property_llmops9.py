"""Property-based tests (hypothesis) for the round-7 operators:
arbitrary inputs vs pure-Python references — the bloom screen's
no-false-negative guarantee and bit arithmetic on adversarial token
streams, and the frozen-codebook PQ encode on arbitrary vector sets."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from wren_engine_spark.operators import similarity, text

_ST = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_M1, _M2 = 2147483647, 2147483629
_B1, _B2 = 1000003, 999983
_NBITS = 1024 * 63
_MULTS = (48271, 69621, 16807)

# small alphabet forces hash collisions and shared windows between the
# train/test sides — the regime where a bloom-bit bug would actually
# show up as a wrong flag
_tok = st.sampled_from(["a", "bb", "ccc", "dd", "e", "éé", "zz9"])
_doc = st.lists(_tok, min_size=0, max_size=14).map(" ".join)


def _windows(txt, w=4):
    toks = [t for t in txt.strip().split() if t]
    th = []
    for t in toks:
        acc = 0
        for ch in t:
            acc = (acc * 31 + ord(ch)) % _M1
        th.append(acc)
    if len(th) < w:
        return None
    out = []
    for i in range(len(th) - w + 1):
        h1 = h2 = 0
        for h in th[i:i + w]:
            h1 = (h1 * _B1 + h) % _M1
            h2 = (h2 * _B2 + h) % _M2
        out.append(h1 * _M2 + h2)
    return out


def _positions(wh):
    g = wh % _M1
    return [(g * a % _M1) % _NBITS for a in _MULTS]


@settings(**_ST)
@given(
    train=st.lists(_doc, min_size=1, max_size=5),
    test=st.lists(_doc, min_size=1, max_size=4),
)
def test_bloom_screen_matches_python_and_never_misses(spark, train, test):
    rows = [(i, t) for i, t in enumerate(train)] + [
        (100 + i, t) for i, t in enumerate(test)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    train_df = df.filter(F.col("doc_id") < 100)
    test_df = df.filter(F.col("doc_id") >= 100)
    got = {
        r.doc_id: (r.n_windows, r.n_bloom_hits, r.maybe_contaminated)
        for r in text.bloom_decontamination_screen(
            train_df, test_df, "text", "doc_id", window_tokens=4
        ).collect()
    }
    bits = set()
    held = set()
    for i, t in enumerate(test):
        for wh in (_windows(t) or []):
            bits.update(_positions(wh))
            held.add(wh)
    for i, t in enumerate(train):
        wins = _windows(t)
        if wins is None:
            assert i not in got
            continue
        hits = sum(
            1 for wh in wins if all(p in bits for p in _positions(wh))
        )
        assert got[i] == (len(wins), hits, hits > 0), (i, t)
        # the guarantee the screen exists for: a window genuinely in
        # the held-out set can never be missed
        if any(wh in held for wh in wins):
            assert got[i][2] is True


@settings(**_ST)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-4, 4, allow_nan=False, allow_infinity=False),
            min_size=4, max_size=4,
        ),
        min_size=5, max_size=10,
    ),
)
def test_pq_append_encode_matches_python(spark, tmp_path_factory, vecs):
    # base = first 4 vectors (seeds the codebooks), delta = the rest;
    # appended codes must equal the pure-Python frozen-codebook argmin
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id LONG, vec ARRAY<DOUBLE>")
    base = df.filter(F.col("vec_id") < 4)
    delta = df.filter(F.col("vec_id") >= 4)
    path = str(tmp_path_factory.mktemp("pqprop") / "idx")
    similarity.write_pq_index(
        base, "vec_id", "vec", path, n_subspaces=2, k_codes=2, iters=1
    )
    books, meta = similarity._load_pq_index(spark, path)
    similarity.pq_index_append(spark, path, delta, "vec_id", "vec")
    sub = meta.dim // meta.n_subspaces
    got = {
        r["__id"]: (r["code_0"], r["code_1"])
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    for i, v in enumerate(vecs):
        if i < 4:
            continue
        qx = [math.floor(x * 1e6 + 0.5) for x in v]
        want = []
        for s, book in enumerate(books):
            qs = qx[s * sub:(s + 1) * sub]
            d = [sum((a - b) * (a - b) for a, b in zip(qs, c)) for c in book]
            want.append(min(range(len(book)), key=lambda c: (d[c], c)))
        assert got[i] == tuple(want), (i, v)
