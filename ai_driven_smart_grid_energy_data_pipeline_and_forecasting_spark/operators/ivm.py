"""Incremental view maintenance for JOIN views.

The aggregate side of IVM already exists (`aggstate.aggregate_state`
merge ≡ recompute; `plans.silver.incremental_silver_refresh` touched-
group replace).  This module adds the JOIN delta rule for insert-only
updates (Blakeley, Larson & Tompa, SIGMOD 1986; the bag-algebra form
in Griffin & Libkin, SIGMOD 1995): for a view M = A ⋈ B and insert
deltas ΔA, ΔB,

    (A ∪ ΔA) ⋈ (B ∪ ΔB)  =  A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB

as a BAG identity (unionByName is UNION ALL), so maintaining the view
costs three delta-sized joins instead of one full recompute — at
100 TB the full sides are read once at view creation and never again;
each refresh joins |Δ|-sized frames against the (pruned, pre-
partitioned) stored sides.  Deletes/updates need counting-based
maintenance (keep a multiplicity column and subtract) or a
transactional format's MERGE — out of scope here and documented, not
silently mishandled: this operator is for append-only facts, the
dominant warehouse case.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def incremental_join_delta(
    a_old: DataFrame,
    b_old: DataFrame,
    a_delta: DataFrame,
    b_delta: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """ΔM = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — the rows an insert-only refresh
    appends to the stored view.  Exact bag semantics: row
    multiplicities match the full recompute's (tested).  Plan shape:
    the two cross terms join a delta against a stored side (shuffle
    sized by the delta under AQE's build-side pick; with the stored
    side bucketed on the join keys the exchange is one-sided), and the
    ΔA⋈ΔB term is delta×delta (usually broadcast)."""
    on = list(on)
    return (
        a_delta.join(b_old, on)
        .unionByName(a_old.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )


def incremental_join_view(
    a_old: DataFrame,
    b_old: DataFrame,
    a_delta: DataFrame,
    b_delta: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """The maintained view after the refresh: M_old ∪ ΔM.  Bag-equal to
    ``(A ∪ ΔA) ⋈ (B ∪ ΔB)`` recomputed from scratch — the property the
    unit test and the driver oracle pin.  In a deployment M_old is the
    STORED view table (read, not recomputed); it is a parameter here
    precisely so the stored-table case and the test's recompute case
    share one code path."""
    m_old = a_old.join(b_old, list(on))
    return m_old.unionByName(
        incremental_join_delta(a_old, b_old, a_delta, b_delta, on)
    )
