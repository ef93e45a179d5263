"""Bucketized range join — theta joins without the nested-loop cliff.

A join whose condition is ``lo <= point < hi`` (optionally AND-ed with
equality keys) has no equi conjunct Catalyst can hash on, so Spark plans
``BroadcastNestedLoopJoin`` when one side fits in memory and falls back
to ``CartesianProduct`` when neither does — O(|L|·|R|) row comparisons
and, at 100 TB, a job that never finishes. The reference's query surface
has no range join either (its only temporal grouping is the fixed hourly
floor, ``silver_clean.py:84-85``); this operator generalizes that family
the same way ``sessions.py`` generalizes the hourly bucket: band lookups
(value tiers, SLA windows), and point-in-interval attribution
(events into sessions, trades into quotes).

Spark-first design — manufacture the missing equi key:

1. pick a ``bin_width`` in the point column's units;
2. point side: one row per point, ``bin = floor(point / width)``;
3. interval side: ``explode(sequence(floor(lo/w), floor(hi/w)))`` — one
   row per bin the interval overlaps;
4. hash-join on ``equi_keys + [bin]`` (plain shuffle or broadcast hash
   join, Catalyst's choice), then refine with the exact range predicate.

Each point lands in exactly one bin, so no post-join dedup is needed —
the refinement filter alone restores exact semantics. The interval side
is replicated ``ceil(span / bin_width) + 1`` times; ``bin_width`` near
the typical interval span keeps that factor O(1), and a loud
``max_bins_per_interval`` guard refuses degenerate parameterizations
(one interval exploding into millions of rows) instead of silently
launching them — the same refuse-loudly contract as
``similarity.cosine_threshold_pairs``.

At 100 TB: one shuffle of each side keyed on ``(equi_keys, bin)``;
replication factor is bounded by construction; skew follows the bin
histogram, which AQE's skew-join handles because the join IS an
equi-join after step 4 — exactly the mitigation a nested-loop plan can
never get. This is the same banding idea the engine already uses for
LSH candidate generation (``dedup.py``) applied to ordered domains
(it is also what Databricks' Photon range-join optimization does under
the hood, per their public docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__rj_bin"


def _check_cols(df: DataFrame, cols: list[str], side: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"{side} side is missing columns {missing}")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float | None = None,
    equi_keys: tuple[str, ...] = (),
    closed_hi: bool = False,
    max_bins_per_interval: int = 4096,
    validate_intervals: bool = True,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    Containment is ``lo <= point < hi`` (half-open; ``closed_hi=True``
    makes it ``<= hi`` for inclusive interval ends such as
    sessionization's last-event bound). ``equi_keys`` are columns that
    must ALSO match — they become part of the hash key, so per-key
    ranges (per-user sessions, per-symbol quote windows) never compare
    across keys. Output columns: all point columns, then the interval
    columns not shadowed by point columns or equi keys.

    ``bin_width`` is in the point column's units (seconds if you
    pre-cast timestamps — see ``range_join_ts``). ``None`` (default)
    self-tunes to the MEDIAN interval span — the sweet spot where a
    typical interval explodes into ~2 bins — from the same single
    tiny aggregate that feeds the replication guard (dims are small by
    definition of "interval table"; even a fact-sized side costs one
    scan + scalar agg, not a join). Intervals that would explode into
    more than ``max_bins_per_interval`` bins raise ``RuntimeError`` up
    front: that parameterization means bin_width is ~10^3 times too
    small for the data, and the blowup should be a loud refusal, not
    an OOM an hour into the job.
    """
    if bin_width is not None and bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    _check_cols(points, [point_col, *equi_keys], "point")
    _check_cols(intervals, [lo_col, hi_col, *equi_keys], "interval")

    # The stats pass EXECUTES the interval-side plan once at build time.
    # When that side is an expensive subplan (sessionization of a fact
    # table) and the caller can bound the replication arithmetically,
    # pass an explicit bin_width + validate_intervals=False to skip it —
    # the guard and the inverted-interval refusal are then the caller's
    # responsibility (an inverted interval would make F.sequence emit a
    # huge DESCENDING bin list, the exact blowup the guard refuses).
    if validate_intervals or bin_width is None:
        span = F.col(hi_col) - F.col(lo_col)
        stats = intervals.select(
            F.max(span).alias("max_span"),
            F.min(span).alias("min_span"),
            F.percentile_approx(span, 0.5).alias("med_span"),
        ).first()
        if stats["min_span"] is not None and stats["min_span"] < 0:
            raise RuntimeError(
                f"range_join: interval side contains inverted bounds "
                f"({hi_col} < {lo_col}, worst span {stats['min_span']}) — "
                "corrupt rows; filter or fix them before joining"
            )
        if bin_width is None:
            med = stats["med_span"]
            bin_width = float(med) if med is not None and med > 0 else 1.0
        if stats["max_span"] is not None:
            worst = int(stats["max_span"] / bin_width) + 2
            if worst > max_bins_per_interval:
                raise RuntimeError(
                    f"range_join: an interval spans ~{worst} bins of width "
                    f"{bin_width} (> max_bins_per_interval="
                    f"{max_bins_per_interval}). Raise bin_width toward the "
                    "typical interval span, or raise the cap explicitly if "
                    "the replication is intended."
                )

    lo_bin = F.floor(F.col(lo_col) / F.lit(bin_width))
    hi_bin = F.floor(F.col(hi_col) / F.lit(bin_width))

    exploded = intervals.withColumn(
        _BIN, F.explode(F.sequence(lo_bin, hi_bin))
    )
    binned = points.withColumn(
        _BIN, F.floor(F.col(point_col) / F.lit(bin_width))
    )
    # name collisions outside the equi keys: the point side wins (the
    # interval duplicate is dropped) — same convention as the output
    # projection below, applied pre-join so references stay unambiguous
    collide = [
        c
        for c in exploded.columns
        if c in set(binned.columns) and c not in (*equi_keys, _BIN)
    ]
    if lo_col in collide or hi_col in collide:
        raise ValueError(
            f"range_join: bound columns {lo_col!r}/{hi_col!r} also exist "
            "on the point side — rename one side, the range predicate "
            "cannot disambiguate them"
        )
    if collide:
        exploded = exploded.drop(*collide)
    in_range = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
        if closed_hi
        else F.col(point_col) < F.col(hi_col)
    )
    joined = binned.join(exploded, [*equi_keys, _BIN]).where(in_range)
    keep = [*binned.columns] + [
        c for c in exploded.columns if c not in set(binned.columns)
    ]
    return joined.select([c for c in keep if c != _BIN])


def epoch_seconds(col: Column) -> Column:
    """NTZ-safe epoch seconds — re-exported from ``sessions`` so the
    cast-through-``timestamp_ltz`` contract (``CAST(ts AS BIGINT)`` is a
    type error for TIMESTAMP_NTZ in Spark 4) lives in exactly one place."""
    from .sessions import _epoch_seconds

    return _epoch_seconds(col)


def range_join_ts(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width_seconds: int,
    equi_keys: tuple[str, ...] = (),
    closed_hi: bool = True,
    validate_intervals: bool = True,
) -> DataFrame:
    """Timestamp-typed convenience wrapper: casts the point and interval
    bound columns to epoch seconds, range-joins on the numeric domain,
    and restores the original columns. Defaults to closed interval ends
    (``lo <= ts <= hi``) because timestamp intervals in this engine are
    min/max event bounds (sessions), which are inclusive."""
    p = points.withColumn("__rj_pt", epoch_seconds(F.col(point_col)))
    iv = intervals.withColumn(
        "__rj_lo", epoch_seconds(F.col(lo_col))
    ).withColumn("__rj_hi", epoch_seconds(F.col(hi_col)))
    out = range_join(
        p,
        iv,
        "__rj_pt",
        "__rj_lo",
        "__rj_hi",
        bin_width=float(bin_width_seconds),
        equi_keys=equi_keys,
        closed_hi=closed_hi,
        validate_intervals=validate_intervals,
    )
    return out.drop("__rj_pt", "__rj_lo", "__rj_hi")
