"""Distribution-drift audit between two snapshots of a keyed stream.

Production pipelines (and the reference's silver-layer quality checks —
``silver_clean.py``'s validation counters generalized across *time*)
need to know when the incoming data's shape changes: a sensor fleet
starts emitting a new event type, a scraper's source mix shifts, a
bug silently drops a category. The standard monitors are PSI
(population stability index) and the chi-square statistic over the
per-category rate tables of a reference window vs a current window.

Cross-engine determinism note: PSI needs ``ln``, which is a libm
function — NOT bit-identical across engines (only IEEE 754 basic ops
+ - * / sqrt are correctly rounded everywhere). The *checked* output
therefore carries the rational-arithmetic monitors — absolute rate
difference (total-variation contribution) and the chi-square term
``(cur-ref)²/ref`` — which reproduce bit-exactly in any engine;
``include_psi=True`` adds the conventional PSI column for production
dashboards, excluded from oracle-checked queries by design.

Scale profile: one partial-aggregated shuffle per side on the category
key (result rows = |categories|, tiny), a category-keyed full outer
join of the two count tables, and a broadcast of the 1-row totals.
Nothing is collected; the windows are pushdown-friendly predicates on
the partition/sort column, so each side scans only its time range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def categorical_drift(
    ref: DataFrame,
    cur: DataFrame,
    cat_col: str,
    threshold: float = 0.01,
    include_psi: bool = False,
) -> DataFrame:
    """Per-category drift table between ``ref`` and ``cur``.

    Output: (cat_col, ref_n, cur_n, ref_rate, cur_rate, rate_diff,
    chi2_term, drifted[, psi_term]) — one row per category seen in
    either window (missing side counts as 0). ``drifted`` flags
    ``rate_diff > threshold``; ``chi2_term`` is NULL for categories
    absent from the reference (a *new* category has infinite chi² —
    the NULL plus ``ref_n = 0`` is the unambiguous signal).

    Every checked column is integer counts or IEEE basic-op arithmetic
    on them — identical in Spark and any SQL oracle (module docstring).
    """
    rc = ref.groupBy(cat_col).agg(F.count(F.lit(1)).alias("ref_n"))
    cc = cur.groupBy(cat_col).agg(F.count(F.lit(1)).alias("cur_n"))
    # null-safe join key: a NULL category must be ONE row with both
    # sides' counts, not one orphan row per side (plain full-outer
    # equality never matches NULL to NULL)
    joined = (
        rc.join(
            cc.withColumnRenamed(cat_col, "_cur_cat"),
            rc[cat_col].eqNullSafe(F.col("_cur_cat")),
            "full",
        )
        .select(
            F.coalesce(rc[cat_col], F.col("_cur_cat")).alias(cat_col),
            "ref_n",
            "cur_n",
        )
        .na.fill(0, ["ref_n", "cur_n"])
    )
    totals = joined.agg(
        F.sum("ref_n").alias("_ref_total"), F.sum("cur_n").alias("_cur_total")
    )
    # an empty window means rate 0 for every category, NOT NULL/inf:
    # a vanished current window must flag every reference category as
    # drifted — the loudest signal, not a silent all-NULL verdict
    # (review finding; also keeps the x/0 edge engine-independent)
    ref_rate = F.when(
        F.col("_ref_total") > 0,
        F.col("ref_n").cast("double") / F.col("_ref_total").cast("double"),
    ).otherwise(F.lit(0.0))
    cur_rate = F.when(
        F.col("_cur_total") > 0,
        F.col("cur_n").cast("double") / F.col("_cur_total").cast("double"),
    ).otherwise(F.lit(0.0))
    out = (
        joined.crossJoin(F.broadcast(totals))
        .withColumn("ref_rate", ref_rate)
        .withColumn("cur_rate", cur_rate)
        .withColumn("rate_diff", F.abs(F.col("cur_rate") - F.col("ref_rate")))
        .withColumn(
            "chi2_term",
            (
                (F.col("cur_rate") - F.col("ref_rate"))
                * (F.col("cur_rate") - F.col("ref_rate"))
            )
            / F.nullif(F.col("ref_rate"), F.lit(0.0)),
        )
        .withColumn("drifted", F.col("rate_diff") > F.lit(threshold))
    )
    if include_psi:
        # ln-based; fine within one engine, excluded from oracle checks
        out = out.withColumn(
            "psi_term",
            (F.col("cur_rate") - F.col("ref_rate"))
            * F.log(
                F.nullif(F.col("cur_rate"), F.lit(0.0))
                / F.nullif(F.col("ref_rate"), F.lit(0.0))
            ),
        )
    return out.drop("_ref_total", "_cur_total")


def split_at_day_boundary(
    df: DataFrame, ts_col: str, split_days: int
) -> tuple[DataFrame, DataFrame]:
    """(before, after) halves of ``df`` split ``split_days`` days past
    the day-truncated minimum timestamp. The boundary is computed
    declaratively (1-row aggregate cross-joined, never collected), so
    both halves stay lazy plans — shared by the drift audit and the
    incremental-rollup queries (one definition of "the boundary")."""
    bounds = df.agg(
        F.expr(
            f"timestampadd(DAY, {int(split_days)}, date_trunc('DAY', min({ts_col})))"
        ).alias("_boundary")
    )
    with_b = df.crossJoin(F.broadcast(bounds))
    return (
        with_b.filter(F.col(ts_col) < F.col("_boundary")).drop("_boundary"),
        with_b.filter(F.col(ts_col) >= F.col("_boundary")).drop("_boundary"),
    )


def window_drift(
    df: DataFrame,
    ts_col: str,
    cat_col: str,
    split_days: int,
    threshold: float = 0.01,
) -> DataFrame:
    """``categorical_drift`` with the two windows derived from the data
    itself: reference = the first ``split_days`` days, current =
    everything after (``split_at_day_boundary``)."""
    ref, cur = split_at_day_boundary(df, ts_col, split_days)
    return categorical_drift(ref, cur, cat_col, threshold=threshold)


def numeric_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bin_width: float,
    threshold: float = 0.01,
) -> DataFrame:
    """Distribution drift for a CONTINUOUS column: fixed-width binning
    (``bin = floor(value / bin_width)``) reduces the numeric
    distribution to a categorical one, then ``categorical_drift``
    compares the bin-frequency tables — the histogram-PSI construction
    every monitoring stack uses, kept engine-exact because floor on
    IEEE division is deterministic (quantile-based binning would pull
    approximate percentiles into the checked columns).

    Output column ``bin`` is the bin INDEX; multiply by ``bin_width``
    for the left edge. NULL values form their own bin row (NULL index)
    via the null-safe category join.
    """
    b = lambda df: df.select(  # noqa: E731
        F.floor(F.col(value_col) / F.lit(float(bin_width))).alias("bin")
    )
    return categorical_drift(b(ref), b(cur), "bin", threshold=threshold)


def schema_drift(old: DataFrame, new: DataFrame) -> list[dict]:
    """Schema-level drift between two frames: added / removed /
    type-changed columns → list of ``{column, status, old_type,
    new_type}`` dicts (metadata-only — no job runs; returned as plain
    Python because the answer is about the frames, not the data). The
    structural complement of the value-level audits above; the
    upsert/versioned sinks use additive evolution, so "removed" or
    "type_changed" here is exactly what should block a blind write.
    """
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    out = []
    for c in sorted(o.keys() | n.keys()):
        if c not in n:
            out.append(
                {"column": c, "status": "removed", "old_type": o[c], "new_type": None}
            )
        elif c not in o:
            out.append(
                {"column": c, "status": "added", "old_type": None, "new_type": n[c]}
            )
        elif o[c] != n[c]:
            out.append(
                {
                    "column": c,
                    "status": "type_changed",
                    "old_type": o[c],
                    "new_type": n[c],
                }
            )
    return out


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    side_col: str,
    n_bins: int | None = None,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the two
    sides of ``side_col`` (boolean: True = side A): D = max over the
    value domain of |F_A(v) − F_B(v)| — the distribution-free "are
    these two splits drawn alike" test that completes the drift family
    (PSI/chi² compare categorical masses, histogram drift compares
    fixed bins; KS is the sup-norm over the whole empirical CDF, so it
    catches location/shape shifts no single bin boundary aligns with).

    Exactness discipline: per-value counts are integers, the CDF gap
    is kept as the INTEGER numerator |cumA·nB − cumB·nA| (denominator
    nA·nB), the max is over integers, and the one division to a double
    happens on the final scalar — partition-order-free, value-exact
    oracle.

    Scale: the cumulative walk is a window over the DISTINCT value
    domain. For discrete columns (counts, grades, bucketed features)
    that domain is small and the single-partition window is bounded by
    it. For continuous columns pass ``n_bins``/``lo``/``hi`` — values
    are pre-bucketed to ⌊n_bins·(v−lo)/(hi−lo)⌋ (clamped), making the
    domain n_bins by construction (the ``histogram_state`` discipline;
    binned KS is a lower bound on exact KS, the standard large-data
    treatment). Unbucketed use on a near-unique column is refused
    loudly above 1<<20 distinct values rather than silently sorting
    the corpus on one partition.

    Returns 1 row: (n_a, n_b, ks_num, ks_den, ks_stat)."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    side = F.col(side_col)
    base = df.where(v.isNotNull() & ~F.isnan(v) & side.isNotNull())
    if n_bins is not None:
        if lo is None or hi is None or not hi > lo or n_bins < 1:
            raise ValueError(
                "binned KS needs n_bins >= 1 and lo < hi"
            )
        width = (hi - lo) / n_bins
        bucket = F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width))
            ),
        ).cast("long")
        base = base.select(bucket.alias("_v"), side.alias("_s"))
    else:
        base = base.select(v.alias("_v"), side.alias("_s"))
    per_value = base.groupBy("_v").agg(
        F.sum(F.when(F.col("_s"), 1).otherwise(0)).alias("_ca"),
        F.sum(F.when(F.col("_s"), 0).otherwise(1)).alias("_cb"),
    )
    if n_bins is None:
        n_distinct = per_value.count()
        if n_distinct > (1 << 20):
            raise ValueError(
                f"ks_two_sample: {n_distinct} distinct values — pass "
                "n_bins/lo/hi to bound the cumulative domain instead "
                "of sorting it on one partition"
            )
    w = (
        Window.orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gaps = per_value.select(
        F.sum("_ca").over(w).alias("_cuma"),
        F.sum("_cb").over(w).alias("_cumb"),
    )
    totals = per_value.agg(
        F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb")
    )
    return (
        gaps.crossJoin(F.broadcast(totals))
        .agg(
            F.max(F.col("_na")).alias("n_a"),
            F.max(F.col("_nb")).alias("n_b"),
            F.max(
                F.abs(
                    F.col("_cuma") * F.col("_nb")
                    - F.col("_cumb") * F.col("_na")
                )
            ).alias("ks_num"),
        )
        .select(
            "n_a",
            "n_b",
            "ks_num",
            (F.col("n_a") * F.col("n_b")).alias("ks_den"),
            # an empty side makes the CDF (and KS) undefined → NULL,
            # not an ANSI divide-by-zero error
            F.expr(
                "try_divide(cast(ks_num as double),"
                " cast(n_a * n_b as double))"
            ).alias("ks_stat"),
        )
    )
