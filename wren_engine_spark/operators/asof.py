"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the union + last-value-carry-forward composition (pure
DataFrame ops, SURVEY guidance (a)): tag right rows, union both sides on
the shared key/time axis, sort within each key partition by (time,
right-before-left on ties), and carry the last right value forward with
``last(..., ignorenulls=True)``. One shuffle on the join key — the same
cost as a sort-merge join — and no per-row Python.

At 100 TB this beats the naive inequality join (which Spark plans as a
broadcast-nested-loop) by orders of magnitude: the window sort is
O(n log n) per key partition and skew is handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every left row, attach the greatest right row with
    ``right_time <= left_time`` within the same ``on`` key (backward
    as-of semantics, ties matched). Right columns come back as
    ``asof_<name>``; unmatched rows keep NULLs.
    """
    right_values = right_values or [c for c in right.columns if c not in (on, right_time)]
    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(right_time, *right_values).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(right_time, *right_values).alias("__r"),
    )
    # right rows sort before left rows at equal time so a tie matches
    w = (
        W.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = lt.unionByName(rt).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 0)
    if tolerance_seconds is not None:
        out = out.withColumn(
            "__match",
            F.when(
                F.col("__match").isNotNull()
                & (
                    F.col("__t").cast("double")
                    - F.col("__match")[right_time].cast("double")
                    <= tolerance_seconds
                ),
                F.col("__match"),
            ),
        )
    sel = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    sel.append(F.col(f"__match.{right_time}").alias(f"asof_{right_time}"))
    sel += [F.col(f"__match.{c}").alias(f"asof_{c}") for c in right_values]
    return out.select(*sel)
