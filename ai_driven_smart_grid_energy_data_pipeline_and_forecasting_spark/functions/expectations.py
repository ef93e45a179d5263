"""Declarative data-quality expectations, evaluated in ONE pass.

The reference enforces quality as per-row CHECK constraints
(``infra/init.sql``) and the engine mirrors those as validation
filters/quarantine (``functions/validation.py``). This module adds the
*table-level* counterpart — Deequ-style expectation suites: named
assertions over aggregate metrics (row counts, uniqueness, null
fractions, domain membership, bounds) that all fold into a single
aggregate scan. At 100 TB the single-pass property is the point: a
suite of 20 checks costs one fact scan + one tiny row, not 20 jobs.

Every metric is an exact count/min/max (no float folds), so the
report is bit-reproducible and oracle-checkable like any other query.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named check: an aggregate ``metric`` plus inclusive bounds.
    ``lo``/``hi`` of None mean unbounded on that side."""

    name: str
    metric: Column
    lo: float | None = None
    hi: float | None = None


def row_count() -> Column:
    return F.count(F.lit(1)).cast("double")


def null_count(col: str) -> Column:
    return F.sum(F.col(col).isNull().cast("bigint")).cast("double")


def duplicate_key_count(*cols: str) -> Column:
    """count(*) − count(DISTINCT key): 0 iff the key is unique."""
    return (
        F.count(F.lit(1)) - F.count_distinct(F.struct(*[F.col(c) for c in cols]))
    ).cast("double")


def out_of_set_count(col: str, allowed: list[str]) -> Column:
    return F.sum((~F.col(col).isin(*allowed)).cast("bigint")).cast("double")


def min_of(col: str) -> Column:
    return F.min(col).cast("double")


def max_of(col: str) -> Column:
    return F.max(col).cast("double")


def expectation_report(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate the whole suite in one aggregate pass; returns one row
    per expectation: (check, metric, lo, hi, passed) ordered by name.

    The metrics aggregate together (one partial/final hash-agg pair,
    one scan); the long-form report is a zero-cost stack of the single
    result row."""
    wide = df.agg(
        *[e.metric.alias(f"m{i}") for i, e in enumerate(expectations)]
    )
    parts = []
    for i, e in enumerate(expectations):
        # stack() demands uniform types per output column: bound
        # literals must be explicit DOUBLEs (bare 100.0 parses DECIMAL)
        lo = (
            "CAST(NULL AS DOUBLE)"
            if e.lo is None
            else f"CAST({float(e.lo)!r} AS DOUBLE)"
        )
        hi = (
            "CAST(NULL AS DOUBLE)"
            if e.hi is None
            else f"CAST({float(e.hi)!r} AS DOUBLE)"
        )
        ok_lo = "true" if e.lo is None else f"m{i} >= {float(e.lo)!r}"
        ok_hi = "true" if e.hi is None else f"m{i} <= {float(e.hi)!r}"
        parts.append(
            f"'{e.name}', CAST(m{i} AS DOUBLE), {lo}, {hi}, ({ok_lo} AND {ok_hi})"
        )
    n = len(expectations)
    return wide.selectExpr(
        f"stack({n}, {', '.join(parts)}) AS (check, metric, lo, hi, passed)"
    ).orderBy("check")
