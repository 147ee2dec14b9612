"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the engine-native extension point for connectors Spark lacks, the
Spark-first answer to the reference's pluggable-connector registry
(ibis-server/app/model/data_source.py enumerates its backends; here a
new source is a Python class registered per-session, planned and
scanned by Catalyst like any table).

`SyntheticDocsDataSource` generates a deterministic document corpus of
ANY size without files — the scale-soak workhorse: doc content is a
pure function of (seed, doc_id), so a 10^9-row corpus needs zero bytes
of storage, generation is embarrassingly parallel across
`n_partitions` input splits, and two reads of the same options are
bit-identical (tests and oracles can re-derive every row).

Supports FILTER PUSHDOWN on doc_id (Spark 4.1 `pushFilters`): range
predicates narrow the generated id range at PLANNING time, so
`WHERE doc_id < k` prunes work before any row exists — the same
scan-elimination contract a parquet reader gets from min/max stats.

Zipfian vocabulary: token ranks follow u^alpha inverse-power sampling,
so generated corpora have the hot-token skew that stresses the dedup
pipeline (see tests/test_scale.py).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

_MOD = (1 << 31) - 1

_LANGS = ("en", "en", "en", "de", "fr", "es", "zh")


def _h(seed: int, *parts: int) -> int:
    """Deterministic integer hash (base-31 fold mod 2^31-1 — the repo's
    portable-hash construction, so generated corpora are re-derivable
    in any engine)."""
    acc = seed % _MOD
    for p in parts:
        acc = (acc * 31 + (p % _MOD)) % _MOD
    # nonlinear scramble (square-and-multiply, exact in int64: acc < 2^31
    # so acc*acc < 2^62) — a linear fold alone leaves consecutive ids on
    # an arithmetic progression, which shows up as runs of near-equal
    # Zipf ranks inside a document
    acc = (acc * acc + 12345) % _MOD
    return (acc * 48271) % _MOD


class _DocsPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _DocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.vocab = int(options.get("vocab", 1000))
        self.alpha = float(options.get("alpha", 3.0))
        self.min_tokens = int(options.get("min_tokens", 10))
        self.max_tokens = int(options.get("max_tokens", 100))
        self.lo = 0
        self.hi = self.n_docs  # exclusive

    # -- planning-time range pruning ------------------------------------
    def pushFilters(self, filters):
        """Handle doc_id range predicates by narrowing [lo, hi) at
        planning time; everything else is returned for Spark to apply."""
        for f in filters:
            col = getattr(f, "attribute", None)
            if col != ("doc_id",):
                yield f
                continue
            if isinstance(f, EqualTo):
                v = int(f.value)
                self.lo = max(self.lo, v)
                self.hi = min(self.hi, v + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.hi, self.lo)
        n = max(min(self.n_partitions, hi - lo), 1)
        span = (hi - lo + n - 1) // n if hi > lo else 0
        out = []
        for i in range(n):
            s = lo + i * span
            e = min(lo + (i + 1) * span, hi)
            if s < e:
                out.append(_DocsPartition(s, e))
        return out or [_DocsPartition(0, 0)]

    # -- execution-time generation --------------------------------------
    def _doc(self, i: int):
        h0 = _h(self.seed, i)
        n_tok = self.min_tokens + h0 % (self.max_tokens - self.min_tokens + 1)
        words = []
        for j in range(n_tok):
            u = _h(self.seed, i, j) / _MOD
            rank = int(self.vocab * (u ** self.alpha))
            words.append(f"w{min(rank, self.vocab - 1)}")
        text = " ".join(words)
        lang = _LANGS[_h(self.seed, i, 7919) % len(_LANGS)]
        source = f"src{_h(self.seed, i, 104729) % 20}"
        return (i, text, lang, source, len(text))

    def read(self, partition: _DocsPartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield self._doc(i)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n_docs", N)...``
    after ``spark.dataSource.register(SyntheticDocsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return (
            "doc_id BIGINT, text STRING, lang STRING, source STRING, "
            "n_chars BIGINT"
        )

    def reader(self, schema: StructType) -> _DocsReader:
        return _DocsReader(self.options)


def register_synthetic_docs(spark) -> None:
    """Idempotent per-session registration. Also enables Python-source
    filter pushdown — a reader that implements ``pushFilters`` is
    rejected outright when the flag is off (Spark 4.1 guard)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
