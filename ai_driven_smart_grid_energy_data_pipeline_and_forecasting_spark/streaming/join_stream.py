"""Stream-stream interval join: click→purchase attribution as
Structured Streaming (the one §2.8 join shape the batch twins —
``session_attribution`` / ``funnel`` — run offline).

Two watermarked event streams join on the user key under a time-range
condition (purchase within ``attribution_window`` after the click).
The range condition plus BOTH watermarks is what makes the state
finite — Spark derives per-side state-eviction bounds from them
(a click can be dropped once the watermark passes
``click_ts + attribution_window``; a purchase once the watermark
passes ``purchase_ts``), so state size tracks the event rate times
the window, never the stream's lifetime. An un-watermarked
stream-stream join would grow state forever, which is why this module
refuses to build one.

The join state lives in the checkpoint's state store: a restarted
``availableNow`` run restores it, so a purchase arriving in a LATER
trigger still attributes to a click from an earlier one (tested), and
events arriving after the watermark has passed their eviction bound
are dropped — the streaming answer matches the batch twin only up to
watermark lateness, the standard Structured Streaming contract.

Sink: append-mode parquet (stream-stream inner joins emit a row
exactly once, when it first becomes joinable — append is the natural
mode; no ``foreachBatch`` needed because attribution rows are
immutable facts, not keyed state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    out_path: str,
    checkpoint: str,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
    how: str = "inner",
) -> StreamingQuery:
    """purchase rows joined to every click by the same user within
    ``attribution_window`` before them → (user_id, click_id, click_ts,
    purchase_id, purchase_ts, value) appended to parquet.

    ``how="leftOuter"`` additionally emits every UNATTRIBUTED click —
    with NULL purchase columns — once the watermark passes its
    eviction bound (click_ts + window + watermark), i.e. once no
    future purchase could still match it. That is the streaming form
    of the batch funnel's drop-off rows: the null row appears in a
    LATER micro-batch than the click (the state store must first prove
    the negative), so an ``availableNow`` run that ingests no
    subsequent data leaves pending negatives in state for the next run
    — the restart-resumes-state contract, tested."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(
            f"how={how!r}: stream-stream attribution supports 'inner' "
            "and 'leftOuter' (null rows for clicks no purchase matched)"
        )
    c = clicks.withWatermark(ts_col, watermark).select(
        F.col(user_col),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    p = purchases.withWatermark(ts_col, watermark).select(
        F.col(user_col).alias("_p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("value"),
    )
    joined = c.join(
        p,
        (F.col(user_col) == F.col("_p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
        how,
    ).select(
        user_col, "click_id", "click_ts", "purchase_id", "purchase_ts", "value"
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
