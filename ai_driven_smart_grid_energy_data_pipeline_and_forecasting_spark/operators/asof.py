"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key.

Not in the reference's implemented surface (it has only equi-joins,
SURVEY.md §2.3), but required by the Gold forecast-vs-actual evaluation
(§7 phase 3) and a standard time-series engine operator.

Implementation: union-and-window (the scalable MapReduce as-of):
tag both sides, union, single window partitioned by key ordered by
(ts, side), carry the last right payload forward with
``last(..., ignorenulls=True)``, keep left rows. One shuffle on the
key — no range-explode, no per-key driver loops, skew-safe under AQE.
An alternative broadcast strategy is right for tiny right sides; this
general form is the 100 TB default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts_utc",
    right_ts: str = "ts_utc",
    tolerance_hours: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` on the same keys. Right payload columns are
    suffixed ``_right`` where they collide; unmatched lefts keep NULLs.
    ``tolerance_hours`` drops matches older than the window."""
    keys = list(keys)
    lpay = [c for c in left.columns if c not in keys and c != left_ts]
    rpay = [c for c in right.columns if c not in keys and c != right_ts]

    lt = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lpay],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rpay],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    rt = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        *[F.col(c).alias(f"_r_{c}") for c in rpay],
        F.col(right_ts).alias("_r_ts"),
    )
    # right rows sort before left rows at equal ts (_side 0 < 1) so an
    # exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = rt.unionByName(lt)
    for c in rpay:
        carried = carried.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    carried = carried.withColumn("_r_ts", F.last("_r_ts", ignorenulls=True).over(w))

    out = carried.filter(F.col("_side") == 1)
    if tolerance_hours is not None:
        in_window = F.col("_r_ts") >= F.col("_ts") - F.expr(
            f"INTERVAL {tolerance_hours} HOURS"
        )
        for c in rpay:
            out = out.withColumn(f"_r_{c}", F.when(in_window, F.col(f"_r_{c}")))
        out = out.withColumn("_r_ts", F.when(in_window, F.col("_r_ts")))

    renames = {f"_r_{c}": (f"{c}_right" if c in lpay else c) for c in rpay}
    out = out.select(
        *keys,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in lpay],
        *[F.col(old).alias(new) for old, new in renames.items()],
        F.col("_r_ts").alias("matched_ts"),
    )
    return out
