"""Gap-based sessionization over event streams.

A session is a maximal run of one user's events where consecutive
events are no further apart than ``gap_seconds``. The reference has no
session concept (its time grouping is the fixed hourly floor,
``silver_clean.py:84-85``); sessionization generalizes that bucketing
to data-driven boundaries, and is a staple of training-data pipelines
(conversation threading, browse-session corpus grouping).

Spark-first design: one ``lag`` window flags session starts, a running
``sum`` over the same window numbers sessions per user — both windows
share a single hash partitioning on the user key, so the whole
assignment costs exactly one shuffle. The stats aggregate groups by
``(user, session_id)``; session_id is functionally dependent on the
user partitioning, but Catalyst cannot know that, so the groupBy adds
one more exchange — at 100 TB both exchanges hash the same ~uniform
user key, no skew hot-spot (user cardinality grows with data size).

All outputs are shuffle-order invariant: counts, min/max timestamps,
and integer second differences — no float folds, so the DuckDB oracle
matches bit-exactly under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(col: Column) -> Column:
    """Epoch seconds for any timestamp flavor. ``CAST(ts AS BIGINT)`` is
    legal for TIMESTAMP but a DATATYPE_MISMATCH AnalysisException for
    TIMESTAMP_NTZ (Spark 4), and the testdata's parquet encoding has
    flipped between the two across regenerations. Casting through
    ``timestamp_ltz`` first is a no-op for LTZ and interprets NTZ in the
    session zone — pinned UTC by ``tables.load_table`` — so both
    encodings yield the same epoch the DuckDB oracle computes."""
    return col.cast("timestamp_ltz").cast("long")


def assign_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 28800,
    tiebreak: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Add a per-user ``session_id`` (1-based, in time order).

    A new session opens at the first event and whenever the gap since
    the previous event exceeds ``gap_seconds`` (strict: gap == limit
    stays in-session). Ties on the timestamp are ordered by
    ``tiebreak`` so numbering is total and deterministic.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (_epoch_seconds(F.col(ts_col)) - _epoch_seconds(prev_ts) > gap_seconds)
    ).cast("int")
    running = Window.partitionBy(user_col).orderBy(ts_col, *tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", F.sum(is_new).over(running))


def session_window_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 28800,
) -> DataFrame:
    """Sessionization via Spark's native ``session_window`` — the same
    gap semantics as ``assign_sessions`` (verified: an event exactly at
    prev + gap merges; strictly beyond opens a new session), but planned
    as a single merging-window aggregate instead of lag + running-sum +
    groupBy. One shuffle on the user key, no window sort pass — and the
    identical expression works under Structured Streaming with a
    watermark (``streaming.ingest_stream.stream_session_aggregate``),
    which the two-window formulation cannot.

    ``session_end`` is the window's exclusive end (last event + gap) —
    the watermark-eviction boundary, not the last-event time."""
    w = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (
        events.groupBy(F.col(user_col), w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy(user_col, "session_start")
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 28800,
    tiebreak: tuple[str, ...] = ("event_id",),
    ordered: bool = True,
) -> DataFrame:
    """One row per (user, session): size, bounds, duration, distinct
    event types. Every aggregate is order-invariant (no float sums).
    ``ordered=False`` skips the presentation sort — pass it when the
    result feeds another operator (a global orderBy is a range
    exchange + sort that a downstream join immediately destroys)."""
    sess = assign_sessions(events, user_col, ts_col, gap_seconds, tiebreak)
    out = sess.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(_epoch_seconds(F.col(ts_col))) - F.min(_epoch_seconds(F.col(ts_col))))
        .alias("duration_sec"),
        F.countDistinct("event_type").alias("n_event_types"),
    )
    return out.orderBy(user_col, "session_id") if ordered else out
