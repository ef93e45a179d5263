"""Declarative CHECK-constraint enforcement and the drop-reason cascade.

The reference enforces domain constraints twice: as Postgres CHECK
clauses (``infra/init.sql:11-13,29-31,35``) and as pandas nullify+dropna
(``silver_clean.py:88-94``); the dashboard then *re-derives* the drop
reasons client-side (``streamlit/app.py:273-299``). Here all three are
one rule table evaluated as Catalyst expressions, so the clean path and
the explain path can never disagree.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RangeRule:
    """Domain rule for one column: value valid iff within [lo, hi]
    (bounds inclusive, None = unbounded). NULL input is 'missing', not
    'invalid' — the cascade labels them differently (O12)."""

    col: str
    lo: float | None = None
    hi: float | None = None

    def valid(self) -> Column:
        c = F.col(self.col)
        cond = F.lit(True)
        if self.lo is not None:
            cond = cond & (c >= F.lit(self.lo))
        if self.hi is not None:
            cond = cond & (c <= F.lit(self.hi))
        return cond

    def invalid(self) -> Column:
        # invalid = present but out of domain; NULL is never invalid
        return F.col(self.col).isNotNull() & ~self.valid()


# The reference's Silver rules (init.sql:29-31): ghi>=0, temp in [-80,80], ws>=0.
WEATHER_RULES = (
    RangeRule("ghi_wm2", lo=0.0),
    RangeRule("t2m_c", lo=-80.0, hi=80.0),
    RangeRule("ws10_mps", lo=0.0),
)


def nullify_out_of_range(df: DataFrame, rules: tuple[RangeRule, ...]) -> DataFrame:
    """O6: out-of-domain → NULL (``silver_clean.py:88-91``). Single
    projection, no shuffle."""
    return df.withColumns(
        {r.col: F.when(r.valid(), F.col(r.col)) for r in rules}
    )


def drop_any_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """O7: drop rows with any critical NULL (``silver_clean.py:94``)."""
    return df.na.drop(subset=cols)


def drop_reason_cascade(
    df: DataFrame,
    rules: tuple[RangeRule, ...],
    duplicate_flag: Column | None = None,
) -> DataFrame:
    """O12: first-failure-wins reason labeling
    (``streamlit/app.py:273-299``). Order matters and matches the
    reference exactly: invalid_<c>... then missing_<c>... then duplicate,
    else kept. One chained CASE expression — codegen'd, zero shuffles.
    """
    reason = None
    for r in rules:
        clause = (r.invalid(), F.lit(f"invalid_{r.col}"))
        reason = F.when(*clause) if reason is None else reason.when(*clause)
    for r in rules:
        reason = reason.when(F.col(r.col).isNull(), F.lit(f"missing_{r.col}"))
    if duplicate_flag is not None:
        reason = reason.when(duplicate_flag, F.lit("duplicate"))
    return df.withColumn("reason", reason.otherwise(F.lit("kept")))


def split_quarantine(
    df: DataFrame, rules: tuple[RangeRule, ...]
) -> tuple[DataFrame, DataFrame]:
    """O9 as a routing operator: (clean, quarantined). Clean rows pass
    every rule (NULLs pass — 'missing' is O7's concern, not a domain
    violation); quarantined rows carry a ``violations`` array naming
    every failed rule so the bad-records table is self-describing.
    Both frames derive from one scan — Catalyst shares the subplan."""
    viol = F.array_compact(
        F.array(
            *[
                F.when(r.invalid(), F.lit(r.col)).otherwise(F.lit(None))
                for r in rules
            ]
        )
    )
    tagged = df.withColumn("violations", viol)
    clean = tagged.filter(F.size("violations") == 0).drop("violations")
    quarantined = tagged.filter(F.size("violations") > 0)
    return clean, quarantined


def referential_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table referential-integrity audit (the dbt-style
    `relationships` test, engine-side): for each ``(name, child,
    fk_col, parent, pk_col)`` count children whose FK resolves to no
    parent row → (relation, n_children, n_orphans, ok). NULL FKs are
    not violations (SQL FK semantics) and are excluded from
    ``n_children`` too, so ``ok`` means every *present* reference
    resolves.

    Plan per relation: one anti-join of the child against the
    parent's distinct key projection — parents are dimension-sized in
    a star schema, so every arm broadcasts; the output is one row per
    relation. This is the O9/O11 validation family lifted from
    row-level rules to cross-TABLE invariants.
    """
    if not relations:
        raise ValueError("referential_audit needs at least one relation")
    parts = []
    for name, child, fk, parent, pk in relations:
        nn = child.select(F.col(fk)).where(F.col(fk).isNotNull())
        orphans = nn.join(
            parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
        )
        parts.append(
            nn.agg(F.count(F.lit(1)).alias("n_children"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(
                F.lit(name).alias("relation"),
                "n_children",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("relation")
