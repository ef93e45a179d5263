"""Ordered funnel analysis over the event stream: how many users
completed step 1, then step 2 *after* step 1, then step 3 after
step 2, ... — the sequential-pattern query every event warehouse
grows sooner or later (the reference's dashboard counts event types
independently; a funnel is the ordered generalization).

Implementation is k chained filtered aggregates, not a per-user
sort-and-scan: step i is ``min(ts) where type = sᵢ and ts > tᵢ₋₁``,
so each stage is a map-side-partial min over a type-pruned slice of
the fact joined (broadcast — one row per surviving user) to the
previous stage's reach. Every stage's frame shrinks monotonically;
nothing ever collects per-user event lists, so per-user event skew
(one user with 10⁸ events) cannot blow memory — the standard
failure mode of the collect_list formulation this replaces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_reach(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_hours: int | None = None,
) -> DataFrame:
    """Per-user funnel completion times: one row per user who completed
    step 1, with ``t1..tk`` timestamps (NULL from the first missed
    step on). Strict ordering: step i must occur strictly after the
    user's *earliest valid* completion of step i-1 (the conventional
    earliest-path funnel); ``max_gap_hours`` additionally bounds each
    transition (conversion-window semantics — integer-microsecond
    interval arithmetic, engine-exact)."""
    prev = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    out = prev
    for i, step in enumerate(steps[1:], start=2):
        cond = F.col(ts_col) > F.col(f"t{i-1}")
        if max_gap_hours is not None:
            cond = cond & (
                F.col(ts_col)
                <= F.col(f"t{i-1}") + F.expr(f"INTERVAL {max_gap_hours} HOURS")
            )
        # No broadcast hint: step-1 reach is one row per converting
        # user, which at corpus scale can exceed broadcast limits — let
        # AQE pick the strategy from runtime sizes (it broadcasts small
        # reach frames on its own).
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(out.select(user_col, f"t{i-1}"), user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        out = out.join(nxt, user_col, "left_outer")
    return out


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_hours: int | None = None,
) -> DataFrame:
    """Funnel summary: (step, step_name, n_users) — users reaching each
    step in order. Monotonically non-increasing by construction."""
    reach = funnel_reach(events, steps, user_col, ts_col, type_col, max_gap_hours)
    aggs = [
        F.sum(F.col(f"t{i}").isNotNull().cast("bigint")).alias(f"n{i}")
        for i in range(1, len(steps) + 1)
    ]
    wide = reach.agg(*aggs)
    pairs = ", ".join(
        f"{i}, '{step}', n{i}" for i, step in enumerate(steps, start=1)
    )
    return wide.selectExpr(
        f"stack({len(steps)}, {pairs}) AS (step, step_name, n_users)"
    ).orderBy("step")
