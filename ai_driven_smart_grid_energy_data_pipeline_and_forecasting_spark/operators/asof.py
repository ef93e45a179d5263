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
``asof_join_broadcast`` below is the alternative strategy for tiny
right sides (sorted-array build side + searchsorted probe, left never
shuffles); this general form is the 100 TB default when both sides are
large. The two are equivalence-tested against each other.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts_utc",
    right_ts: str = "ts_utc",
    tolerance_hours: int | None = None,
    max_build_rows: int = 5_000_000,
) -> DataFrame:
    """Broadcast strategy for the same as-of semantics: the right side
    is collected into per-key sorted timestamp arrays (the build side
    of a broadcast join, made explicit), shipped to every task, and
    probed with a vectorized ``searchsorted`` per left batch. The left
    side never shuffles — the right strategy when the right side is a
    small dimension-like series and the left is the 100 TB fact.

    The build side MUST be dimension-sized: ``max_build_rows`` guards
    the collect so a misrouted large right side fails loudly with a
    pointer to ``asof_join`` (the both-sides-large strategy) instead of
    OOMing the driver.  The extra ``count()`` is one agg over the side
    we were about to collect anyway.

    Output schema and semantics identical to ``asof_join`` (right rows
    at exactly the left timestamp match; collisions suffixed
    ``_right``; unmatched lefts keep NULLs).
    """
    keys = list(keys)
    lpay = [c for c in left.columns if c not in keys and c != left_ts]
    rpay = [c for c in right.columns if c not in keys and c != right_ts]
    spark = left.sparkSession

    n_right = right.count()
    if n_right > max_build_rows:
        raise ValueError(
            f"asof_join_broadcast build side has {n_right:,} rows "
            f"(max_build_rows={max_build_rows:,}); this strategy collects "
            "the right side to the driver — use asof_join (union-and-window) "
            "for large right sides, or raise max_build_rows deliberately."
        )

    rpdf = right.select(*keys, right_ts, *rpay).toPandas()
    build: dict = {}
    if len(rpdf):
        for key, g in rpdf.groupby(keys):
            g = g.sort_values(right_ts, kind="mergesort")
            kt = key if isinstance(key, tuple) else (key,)
            build[kt] = (
                g[right_ts].to_numpy().astype("datetime64[us]").astype(np.int64),
                {c: g[c].to_numpy() for c in rpay},
            )
    bc = spark.sparkContext.broadcast(build)
    tol_us = tolerance_hours * 3_600_000_000 if tolerance_hours is not None else None

    renames = {c: (f"{c}_right" if c in lpay else c) for c in rpay}
    out_fields = (
        [left.schema[k] for k in keys]
        + [T.StructField(left_ts, left.schema[left_ts].dataType)]
        + [left.schema[c] for c in lpay]
        + [T.StructField(renames[c], right.schema[c].dataType) for c in rpay]
        + [T.StructField("matched_ts", T.TimestampType())]
    )
    out_schema = T.StructType(out_fields)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.reset_index(drop=True)  # index == batch position
            n = len(pdf)
            m_ts = np.full(n, np.datetime64("NaT", "us"))
            m_pay = {c: [None] * n for c in rpay}
            for key, sub in pdf.groupby(keys):
                kt = key if isinstance(key, tuple) else (key,)
                hit = groups.get(kt)
                if hit is None:
                    continue
                ts_arr, pay = hit
                sub_ts = (
                    sub[left_ts].to_numpy().astype("datetime64[us]").astype(np.int64)
                )
                idx = np.searchsorted(ts_arr, sub_ts, side="right") - 1
                ok = idx >= 0
                if tol_us is not None:
                    ok &= np.where(ok, sub_ts - ts_arr[np.maximum(idx, 0)], 0) <= tol_us
                for j, r in enumerate(sub.index.to_numpy()):
                    if ok[j]:
                        m_ts[r] = np.datetime64(int(ts_arr[idx[j]]), "us")
                        for c in rpay:
                            m_pay[c][r] = pay[c][idx[j]]
            out = pd.DataFrame(
                {
                    **{k: pdf[k].to_numpy() for k in keys},
                    left_ts: pdf[left_ts].to_numpy(),
                    **{c: pdf[c].to_numpy() for c in lpay},
                    **{renames[c]: m_pay[c] for c in rpay},
                    "matched_ts": m_ts,
                }
            )
            yield out

    return left.select(*keys, left_ts, *lpay).mapInPandas(probe, out_schema)
