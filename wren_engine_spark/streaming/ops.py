"""Structured Streaming operators (extension beyond reference parity —
the reference is batch-only; SURVEY §1.2/§2.B notes streaming as our
extension point).

Each operator takes a *streaming* DataFrame (``spark.readStream...``)
and returns a transformed streaming DataFrame; callers pick the sink.
Semantics are the streaming twins of batch operators in this repo:

  windowed_event_counts   <-> t1-style time-bucketed aggregation
  sessionize              <-> w4_event_sessionization (session_window)
  streaming_dedup         <-> x1_exact_dedup (state-backed, watermarked)
  running_user_totals     <-> w2-style running totals (stateful)

Watermarks bound state for late data: at 100 TB/day the state store
only holds open windows/sessions inside the watermark horizon, and all
aggregations are incremental (no full recompute per microbatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ltz(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with local tz); NTZ event times are
    reinterpreted in the session zone (engine default: UTC)."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    by: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts with late-data watermark."""
    keys = [F.window(F.col(ts_col), window).alias("win")] + [F.col(c) for c in (by or [])]
    events = _ltz(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(c) for c in (by or [])],
            "n_events",
        )
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregation via ``session_window`` — the
    streaming twin of the batch lag/cumsum sessionization (w4)."""
    events = _ltz(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Exactly-once record dedup inside the watermark horizon
    (state-store backed ``dropDuplicates``)."""
    return _ltz(df, ts_col).withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def running_user_totals(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user running totals in update mode (incremental grouped agg —
    the stateful twin of batch running windows)."""
    events = _ltz(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .agg(
            F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double").alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


THRESHOLD_ALERT_SCHEMA = (
    "user_id BIGINT, alert_level BIGINT, total_value DOUBLE, n_events BIGINT"
)
_ALERT_STATE_SCHEMA = "total DOUBLE, n BIGINT, emitted BIGINT"


def threshold_alerts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    threshold: float = 100.0,
    watermark: str = "1 hour",
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per user,
    accumulate value across microbatches and emit one alert row each
    time the running total crosses another multiple of ``threshold``
    (alert_level = floor(total/threshold)).

    This is the semantics grouped aggregation can't express: output
    rows are emitted on *state transitions*, not per window — the
    classic custom-state shape (fraud/quota alerting). State per user is
    three scalars.

    ``state_timeout_ms`` is OPT-IN and only for continuous (long-lived
    trigger) deployments, where ProcessingTimeTimeout reaps idle users
    so state is bounded by active users in the timeout horizon. It must
    stay ``None`` for bounded replays: a processing-time timeout makes
    the engine keep scheduling timeout-evaluation microbatches, so an
    ``availableNow`` query never reaches termination (observed: the
    round-2 t7 wedge). With ``None`` the operator runs under
    ``GroupStateTimeout.NoTimeout`` and an availableNow replay
    terminates after draining the source.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state_timeout_ms and state.hasTimedOut:
            state.remove()
            return
        total, n, emitted = state.get if state.exists else (0.0, 0, 0)
        for pdf in pdfs:
            total += float(pdf[value_col].sum())
            n += len(pdf)
        level = int(total // threshold)
        state.update((total, n, level))
        if state_timeout_ms:
            state.setTimeoutDuration(state_timeout_ms)
        if level > emitted:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "alert_level": [level],
                    "total_value": [total],
                    "n_events": [n],
                }
            )

    events = _ltz(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=THRESHOLD_ALERT_SCHEMA,
            stateStructType=_ALERT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "60 minutes",
    watermark: str = "2 hours",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join with an event-time interval
    bound: match right-side rows to left-side rows with the same key
    where ``right.ts`` falls in ``[left.ts, left.ts + max_delay]`` —
    the attribution-join shape (click -> purchase within the window).

    Both sides carry watermarks and the join condition bounds event
    time in BOTH directions, which is exactly what Spark needs to
    bound the state store: each side's buffered rows are evicted once
    the other side's watermark passes the interval, so state is
    O(traffic inside watermark + max_delay), not O(stream). Inner
    joins emit matches immediately — an availableNow replay of a
    bounded source therefore produces the exact batch-join result
    (the t10 oracle-check).

    Returns all left columns suffixed ``suffixes[0]``, all right
    columns suffixed ``suffixes[1]``.
    """
    sl, sr = suffixes
    lft = _ltz(left, left_ts).withWatermark(left_ts, watermark)
    rgt = _ltz(right, right_ts).withWatermark(right_ts, watermark)
    lft = lft.select([F.col(c).alias(f"{c}{sl}") for c in lft.columns])
    rgt = rgt.select([F.col(c).alias(f"{c}{sr}") for c in rgt.columns])
    cond = (
        (F.col(f"{key_col}{sl}") == F.col(f"{key_col}{sr}"))
        & (F.col(f"{right_ts}{sr}") >= F.col(f"{left_ts}{sl}"))
        & (
            F.col(f"{right_ts}{sr}")
            <= F.col(f"{left_ts}{sl}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return lft.join(rgt, cond, "inner")


def point_in_time_join(
    stream: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time-correct STREAM-STATIC join against a versioned
    (SCD2) dimension: each streaming event picks the dimension version
    whose validity interval ``[valid_from, valid_to)`` contains the
    event's own timestamp — never a later version (the feature-store
    leakage rule: a training example must not see attribute values
    from its future).

    Stream-static joins need no watermark (the static side is fully
    available to every microbatch) and Spark broadcasts the dimension
    when small; with a large dimension the range predicate still
    evaluates post-equi-join on the key, so the join stays an equi-join
    on ``key_col`` plus a residual filter — no cross product. Versions
    with empty intervals (two changes at one instant) match nothing, so
    the result is deterministic under same-timestamp ties.

    Returns the stream columns plus the dimension's non-key columns.
    """
    cond = (
        (stream[key_col] == dim[key_col])
        & (stream[ts_col] >= dim[valid_from])
        & (dim[valid_to].isNull() | (stream[ts_col] < dim[valid_to]))
    )
    return stream.join(dim, cond, "inner").drop(dim[key_col])


def run_available_now(
    spark,
    out: DataFrame,
    qname: str,
    output_mode: str = "append",
    timeout_sec: int = 300,
) -> DataFrame:
    """Drain a bounded stream into a memory sink and return the result
    table. Guard rails for batch-replay use (driver gate, tests):

    - stops any previous query holding the sink name (re-runs in one
      session);
    - bounds ``awaitTermination`` — a query that has not terminated
      within ``timeout_sec`` is STOPPED and raised on, so a
      non-terminating stream surfaces as a fast, attributable error
      instead of wedging the harness (round-2 postmortem: an unbounded
      ``awaitTermination()`` hid a never-terminating replay for hours).
    """
    for q in spark.streams.active:
        if q.name == qname:
            q.stop()
    query = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = query.awaitTermination(timeout_sec)
    except Exception:
        query.stop()
        raise
    if not finished:
        query.stop()
        raise RuntimeError(
            f"streaming query {qname!r} did not terminate within "
            f"{timeout_sec}s (availableNow replay should drain and stop)"
        )
    return spark.table(qname)
