"""Binned range join: point-in-interval joins without a nested loop.

Spark plans a bare ``l.ts BETWEEN r.start AND r.end`` predicate as
BroadcastNestedLoopJoin (or cartesian), which collapses at scale. The
standard fix — used by Databricks' range-join optimization and
DuckDB/kdb's interval indexes — is binning: quantize both sides onto
fixed-width buckets, explode each interval to the buckets it overlaps,
equi-join on bucket, then apply the exact predicate.

Cost model: shuffle keys are (bucket), so work scales with
points + Σ interval_width/bucket_width instead of |points| × |intervals|.
Pick ``bucket_width`` near the median interval width: much smaller
multiplies the interval-side explosion, much larger degrades bucket
selectivity toward the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval containing them
    (start <= point < end), timestamps quantized to ``bucket_width_s``
    second buckets. Returns all columns from both inputs.
    """
    if how != "inner":
        raise ValueError("range_join supports inner joins")
    pt = F.unix_micros(F.col(point_col).cast("timestamp"))
    st = F.unix_micros(F.col(start_col).cast("timestamp"))
    en = F.unix_micros(F.col(end_col).cast("timestamp"))
    w = int(bucket_width_s) * 1_000_000
    p = points.withColumn("__bp", F.floor(pt / w).cast("long"))
    # explode each interval to the buckets it overlaps; end is exclusive
    # so an interval ending exactly on a bucket boundary skips that bucket
    i = intervals.withColumn(
        "__bi",
        F.explode(F.sequence(F.floor(st / w).cast("long"), F.floor((en - 1) / w).cast("long"))),
    )
    cond = (
        (F.col("__bp") == F.col("__bi"))
        & (F.col(point_col).cast("timestamp") >= F.col(start_col).cast("timestamp"))
        & (F.col(point_col).cast("timestamp") < F.col(end_col).cast("timestamp"))
    )
    return p.join(i, cond, "inner").drop("__bp", "__bi")
