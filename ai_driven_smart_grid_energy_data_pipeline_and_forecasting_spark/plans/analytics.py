"""Event-stream analytics plans — the reference's dashboard analytics
(``streamlit/app.py:260-310,434-541``) generalized to any keyed event
table, exercised by the harness on the driver's ``events`` table.

The reference computes these client-side in pandas on ≤336-row API
responses; here they are server-side distributed plans that hold at
100 TB: every one is a single scan → (optional window/shuffle) → small
aggregate, with the filter/projection pushed into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.validation import RangeRule, drop_reason_cascade
from ..operators.relational import mark_duplicates, value_counts

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
# Harness analog of the weather CHECK rules: value ∈ [0, 300].
EVENT_RULES = (RangeRule("value", lo=0.0, hi=300.0),)


def with_hour(events: DataFrame) -> DataFrame:
    """W1 hour bucketing (``silver_clean.py:84-85``)."""
    return events.withColumn("ts_hour", F.date_trunc("hour", F.col("ts")))


def det_mean(col: str):
    """Order-independent mean: exact decimal(20,6) sum ÷ count, cast
    back to double. Float ``avg`` partial-aggregates in shuffle order,
    so its last ulp — and therefore any rounded digit sitting on a
    boundary — depends on partitioning; the decimal sum is exact, so
    the quotient is bit-stable under any partitioning AND bit-identical
    to the SQL oracle's mirrored expression (no rounding needed)."""
    return F.sum(F.col(col).cast("decimal(20,6)")).cast("double") / F.count(col)


def hourly_type_matrix(events: DataFrame) -> DataFrame:
    """J1 n-way alignment as groupBy+pivot: one row per hour, one column
    per event type, mean(value), missing combination → NULL.

    Pivot domain passed explicitly (EVENT_TYPES) so Spark skips the
    distinct-values pre-pass — one shuffle total, keyed on the hour.
    """
    return (
        with_hour(events)
        .groupBy("ts_hour")
        .pivot("event_type", EVENT_TYPES)
        .agg(det_mean("value"))
        .orderBy("ts_hour")
    )


def hourly_completeness(events: DataFrame) -> DataFrame:
    """A6/A7 completeness matrix: per hour, 0/1 per event type for
    whether any observation of that type exists (the dashboard's
    per-hour all-not-null heatmap, ``streamlit/app.py:519-526``)."""
    wide = hourly_type_matrix(events)
    return wide.select(
        "ts_hour",
        *[F.col(t).isNotNull().cast("int").alias(f"{t}_complete") for t in EVENT_TYPES],
    )


def hourly_long(events: DataFrame) -> DataFrame:
    """A9 wide→long: the melt of hourly_type_matrix with absent combos
    dropped. Expressed directly as a long aggregate (same result, one
    shuffle, no unpivot generate)."""
    return (
        with_hour(events)
        .groupBy("ts_hour", F.col("event_type").alias("variable"))
        .agg(det_mean("value").alias("value"))
        .orderBy("ts_hour", "variable")
    )


def labeled_events(events: DataFrame) -> DataFrame:
    """O12 drop-reason cascade on the event stream: invalid_value →
    missing_value → duplicate → kept, first failure wins
    (``streamlit/app.py:273-299``). Duplicate = all-but-newest per
    (user_id, hour), newest by (ts, event_id) (W2)."""
    hourly = with_hour(events)
    marked = mark_duplicates(
        hourly, keys=["user_id", "ts_hour"], order_col="ts", tiebreak=["event_id"]
    )
    return drop_reason_cascade(marked, EVENT_RULES, duplicate_flag=F.col("is_duplicate"))


def drop_reason_counts(events: DataFrame) -> DataFrame:
    """A5 frequency count of drop reasons (``streamlit/app.py:307-308``)."""
    return value_counts(labeled_events(events), "reason")


def kept_events(events: DataFrame) -> DataFrame:
    """The rows the clean would keep — input to keep-rate metrics."""
    return labeled_events(events).filter(F.col("reason") == "kept")


def props_stats(events: DataFrame) -> DataFrame:
    """F9/F10 JSON extraction: parse the ``props`` JSON payload, pull
    ``$.k``, aggregate per event type. ``get_json_object`` is a JVM
    built-in — no Python in the row path."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def ohlc_downsample(events: DataFrame) -> DataFrame:
    """Hourly OHLC downsampling per event type — the classic timeseries
    rollup (open/high/low/close + bar mean and count), the shape a
    metrics store or hypertable continuous aggregate maintains.

    Open/close are arg-min/arg-max over the (ts, event_id) total order
    via ``min_by``/``max_by`` — a single partial-aggregated groupBy
    (the shuffle carries one candidate per (type, hour) per partition),
    never a per-row window. NULL values are excluded up front so every
    aggregate sees the same row set (and ``min_by`` never elects a NULL
    bar edge). Mean uses the exact-decimal quotient (``det_mean``) so
    the bar is bit-stable under any partitioning.
    """
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        with_hour(events.filter(F.col("value").isNotNull()))
        .groupBy("event_type", "ts_hour")
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order_key).alias("close"),
            det_mean("value").alias("mean_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type", "ts_hour")
    )


def hourly_count_anomalies(
    events: DataFrame, z_threshold: float = 2.0
) -> DataFrame:
    """Hourly event-rate anomaly detection: per (type, hour) counts
    z-scored against the type's own hourly distribution; rows with
    |z| > threshold are the alert set a rate monitor pages on. Counts
    are INTEGERS, so Σc and Σc² fold as exact BIGINTs — no decimal
    carrier needed, and mean/variance are a fixed IEEE op sequence on
    exact sums (partition-invariant, oracle-exact; the
    ``zscore_normalize`` math over a count table). Two partial-agg
    shuffles (hour counts, then the tiny per-type moment table which
    broadcasts back); no windows. Zero-variance or single-hour types
    emit no rows (nothing to standardize)."""
    cnt = (
        with_hour(events)
        .groupBy("event_type", "ts_hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mom = cnt.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_h"),
        F.sum("n").alias("_s1"),
        F.sum(F.col("n") * F.col("n")).alias("_s2"),
    )
    h = F.col("_h").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    var = (s2 - s1 * s1 / h) / (h - 1)
    stats = mom.select(
        "event_type",
        (s1 / h).alias("_mean"),
        F.when((F.col("_h") > 1) & (var > 0), F.sqrt(var)).alias("_sd"),
    )
    z = (F.col("n").cast("double") - F.col("_mean")) / F.col("_sd")
    return (
        cnt.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .where(F.abs(F.col("z")) > z_threshold)
        .select("event_type", "ts_hour", "n", "z")
        .orderBy("event_type", "ts_hour")
    )


def hourly_cusum_changepoints(
    events: DataFrame,
    slack_num: int = 1,
    slack_den: int = 4,
    h_num: int = 3,
    h_den: int = 1,
) -> DataFrame:
    """Sustained event-rate shift detection: one-sided upward CUSUM
    (Page, Biometrika 1954) over each type's hourly count series.
    Where the z-score monitor (``hourly_count_anomalies``) flags
    single outlier hours, CUSUM accumulates small persistent drifts —
    the alarm a slow leak trips that no single hour would.

    Exact-integer formulation at S = 1e6, per event type:

        μ_S   = (S·Σn) div H              (the type's mean hourly count)
        κ_S   = (slack_num·μ_S) div slack_den      (slack, default μ/4)
        h_S   = (h_num·μ_S) div h_den          (threshold, default 3·μ)
        y_t   = S·n_t − μ_S − κ_S
        C_t   = max(0, C_{t−1} + y_t)
              = P_t − min(0, min_{j≤t} P_j),  P_t = Σ_{j≤t} y_j

    The recursive clamp-at-zero is rewritten as prefix-sum minus
    running-minimum — two window frames, no recursion — so the whole
    statistic stays in exact BIGINTs (counts are integers; μ/κ/h are
    integer fixed point; parametrizing slack and threshold as
    FRACTIONS of μ avoids the σ/√ of the textbook tuning, keeping the
    operator oracle-exact). Emitted rows are the alarm set C_t > h_S.

    Plan: one partial-agg shuffle for hour counts, a tiny per-type
    (μ, κ, h) table broadcast back, then ONE window shuffle
    (partitionBy type, orderBy hour) carrying both frames. Overflow:
    S·n·H ≤ 1e6·n·H — BIGINT-safe to Σn·…≈9e12 count-hours per type,
    far past any hourly series.

    Semantics note: hours with ZERO events produce no count row, so
    they neither alarm (an upward statistic cannot, on zero) nor pull
    the accumulator down the way an explicit 0 would (y = −μ−κ). A
    DOWNWARD/outage monitor needs the dense hour spine first —
    compose with ``gold.gap_fill_hourly`` and negate; the upward
    registered form is pinned by its oracle as-is."""
    S = 1_000_000
    cnt = (
        with_hour(events)
        .groupBy("event_type", "ts_hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mu = cnt.groupBy("event_type").agg(
        F.expr(f"{S}L * sum(n) div count(*)").alias("_mu_s")
    )
    params = mu.select(
        "event_type",
        "_mu_s",
        F.expr(f"{int(slack_num)}L * _mu_s div {int(slack_den)}L").alias(
            "_k_s"
        ),
        F.expr(f"{int(h_num)}L * _mu_s div {int(h_den)}L").alias("_h_s"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = F.col("n") * F.lit(S).cast("long") - F.col("_mu_s") - F.col("_k_s")
    with_p = (
        cnt.join(F.broadcast(params), "event_type")
        .withColumn("_p", F.sum(y).over(w))
    )
    cusum = F.col("_p") - F.least(F.lit(0).cast("long"), F.min("_p").over(w))
    return (
        with_p.withColumn("cusum_s", cusum)
        .where(F.col("cusum_s") > F.col("_h_s"))
        .select("event_type", "ts_hour", "n", "cusum_s")
        .orderBy("event_type", "ts_hour")
    )


def source_language_entropy(docs: DataFrame) -> DataFrame:
    """Shannon entropy of each source's language mix — the DIVERSITY
    number beside the dataset cards' dominant-language arg-max (a
    source can share a dominant language with another yet be far more
    mixed; mixture designers balance on exactly this).

    Exactness discipline: H = Σ_l (c_l/n)·ln(n/c_l) is computed as the
    INTEGER numerator Σ_l c_l·⌊1e6·ln(n/c_l)⌋ (one ln per (source,
    lang) row, floored at the BM25 fixed-point precision before the
    sum — so the aggregate is an exact BIGINT, partition-order-free)
    over the denominator n·1e6, divided once at the end. A
    single-language source gets exactly 0.0.

    Plan: two partial-agg groupBys (lang counts, then per-source fold)
    — no windows, no corpus re-scan."""
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("_c")
    )
    tot = per.groupBy("source").agg(
        F.sum("_c").alias("_n"), F.count(F.lit(1)).alias("n_langs")
    )
    num = (
        per.join(tot.select("source", "_n"), "source")
        .select(
            "source",
            (
                F.col("_c")
                * F.floor(
                    F.lit(1_000_000)
                    * F.log(
                        F.col("_n").cast("double")
                        / F.col("_c").cast("double")
                    )
                ).cast("long")
            ).alias("_t"),
        )
        .groupBy("source")
        .agg(F.sum("_t").alias("_num"))
    )
    return (
        tot.join(num, "source")
        .select(
            "source",
            F.col("_n").alias("n_docs"),
            "n_langs",
            (
                F.col("_num").cast("double")
                / (F.col("_n") * F.lit(1_000_000)).cast("double")
            ).alias("entropy"),
        )
        .orderBy("source")
    )


def source_dataset_cards(docs: DataFrame) -> DataFrame:
    """Per-source dataset cards — the datasheet table a corpus release
    publishes (Gebru et al., "Datasheets for Datasets", CACM 2021),
    over the harness corpus: document/token/char volumes, the exact-
    duplicate rate, and the dominant language, one row per source.

    Every metric is exact-integer derived so the card is value-exact
    against the oracle: token/char counts are integer sums; the dup
    rate is (n_docs − distinct fingerprints) over n_docs — a single
    deterministic division of exact BIGINTs; top_lang is an arg-max
    with count-then-name tie-break (``max_by`` on a (count, lang)
    struct — the ``latest_per_group`` kernel). Floating quality scores
    stay OUT of the card (their sums are partition-order-sensitive;
    per-document quality lives in ``text_stats``).

    Plan: one pass computes per-doc (tokens, chars, fingerprint); two
    partial-agg groupBys (per-source totals + per-(source, lang)
    counts for the arg-max) — no windows, no joins wider than the
    per-source card table itself."""
    from ..functions.text import doc_fingerprint, token_count

    base = docs.select(
        "source",
        "lang",
        token_count(F.col("text")).cast("long").alias("_tok"),
        F.length("text").cast("long").alias("_chr"),
        doc_fingerprint(F.col("text")).alias("_fp"),
    )
    totals = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("n_tokens"),
        F.sum("_chr").alias("n_chars"),
        F.count_distinct("_fp").alias("_n_fp"),
    )
    lang_top = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("source")
        .agg(
            F.expr(
                "max_by(lang, struct(_c, lang))"
            ).alias("top_lang")
        )
    )
    dup_rate = (
        (F.col("n_docs") - F.col("_n_fp")).cast("double") / F.col("n_docs")
    )
    return (
        totals.join(lang_top, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            dup_rate.alias("dup_rate"),
            "top_lang",
        )
        .orderBy("source")
    )


def hourly_autocorrelation(events: DataFrame, max_lag: int = 6) -> DataFrame:
    """Per-type autocorrelation function of the hourly event-rate
    series at lags 1..max_lag — the seasonality/persistence probe a
    forecaster runs before choosing model order (a strong lag-24 says
    daily cycle; fast decay says the seasonal-naive baseline is all
    there is). Sits beside ``hourly_count_anomalies`` (single outlier
    hours) and ``hourly_cusum_changepoints`` (sustained shifts) as the
    third lens on the same hourly count series.

    ACF over the DENSE hour spine: hours with zero events enter as
    explicit 0 rows (lagging the sparse count table would silently
    pair counts across gaps, which is not autocorrelation — same spine
    discipline as ``gold.gap_fill_hourly``). For the series x_1..x_H
    with mean m = T/H (T = Σx):

        acf_k = Σ_{t>k} (x_t − m)(x_{t−k} − m) / Σ_t (x_t − m)²

    Multiplying both sides by H² clears the rational mean, so BOTH are
    exact integers on decimal(38,0) carriers:

        num_k·H² = H²·C_k − H·T·(A_k + B_k) + (H−k)·T²
        den·H²   = H²·S2 − H·T²

    with C_k = Σ x_t·x_{t−k}, A_k/B_k the lead/trail partial sums over
    defined pairs, S2 = Σx². One terminal double division — bit-stable
    under any partitioning and bit-identical to the SQL oracle.

    Plan: after the (type, hour) count shuffle, EVERYTHING runs on the
    count table — bounded by |types|·|hours|, independent of event
    volume, so the spine join, the single lag window (all max_lag lags
    ride one window spec via an array of structs), and the two
    partial-agg folds cost nothing at 100 TB; the scan-side shuffle is
    the one partial-aggregated count. Overflow (loud guard): products
    stay under 1e31 provided H < 1e6 hours AND max hourly count < 1e6
    — a 114-year series at a million events/hour; beyond, the carrier
    casts would NULL-overflow and silently zero the ACF, so the plan
    raises per offending type instead. Types with zero variance or
    H ≤ k emit no row for that lag (nothing to correlate)."""
    if max_lag < 1:
        raise ValueError(f"hourly_autocorrelation: max_lag must be >= 1, got {max_lag}")
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731 — (19,0)x(19,0)->(38,0) exact
    cnt = (
        with_hour(events)
        .groupBy("event_type", "ts_hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rng = cnt.groupBy("event_type").agg(
        F.min("ts_hour").alias("_lo"), F.max("ts_hour").alias("_hi")
    )
    spine = rng.select(
        "event_type",
        F.explode(
            F.sequence("_lo", "_hi", F.expr("interval 1 hour"))
        ).alias("ts_hour"),
    )
    dense = spine.join(cnt, ["event_type", "ts_hour"], "left").select(
        "event_type",
        "ts_hour",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
    )
    w = Window.partitionBy("event_type").orderBy("ts_hour")
    # window exprs and the generator cannot share one projection
    # (UNSUPPORTED_EXPR_FOR_OPERATOR) — lag first, explode second;
    # still ONE window shuffle carrying all max_lag frames.
    lagged = dense.select(
        "event_type",
        "n",
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("k"), F.lag("n", k).over(w).alias("m")
                )
                for k in range(1, max_lag + 1)
            ]
        ).alias("_l"),
    ).select(
        "event_type", "n", F.explode("_l").alias("p")
    ).where(F.col("p.m").isNotNull())
    per_lag = lagged.groupBy(
        "event_type", F.col("p.k").cast("long").alias("lag")
    ).agg(
        F.sum(dec(F.col("n")) * dec(F.col("p.m"))).alias("_c"),
        F.sum("n").alias("_a"),
        F.sum("p.m").alias("_b"),
        F.count(F.lit(1)).alias("_p"),
    )
    glob = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_h"),
        F.sum("n").alias("_t"),
        F.sum(dec(F.col("n")) * dec(F.col("n"))).alias("_s2"),
        F.max("n").alias("_nmax"),
    )
    j = per_lag.join(F.broadcast(glob), "event_type")
    num = (
        dec(F.col("_h") * F.col("_h")) * dec(F.col("_c"))
        - dec(F.col("_h") * F.col("_t"))
        * dec(F.col("_a") + F.col("_b"))
        + dec(F.col("_p") * F.col("_t")) * dec(F.col("_t"))
    )
    den_raw = dec(F.col("_h") * F.col("_h")) * dec(F.col("_s2")) - dec(
        F.col("_h") * F.col("_t")
    ) * dec(F.col("_t"))
    unsafe = (F.col("_h") >= F.lit(1_000_000)) | (
        F.col("_nmax") >= F.lit(1_000_000)
    )
    den = F.when(
        unsafe,
        F.raise_error(
            F.concat(
                F.lit(
                    "hourly_autocorrelation: series domain too large for"
                    " the exact decimal carriers (H = "
                ),
                F.col("_h").cast("string"),
                F.lit(", max hourly count = "),
                F.col("_nmax").cast("string"),
                F.lit(
                    "); need H < 1e6 AND max count < 1e6 — otherwise the"
                    " decimal(19,0) casts would NULL-overflow and"
                    " silently zero the ACF. Bucket coarser first."
                ),
            )
        ).cast("decimal(38,0)"),
    ).otherwise(den_raw)
    return (
        j.select(
            "event_type",
            "lag",
            F.col("_h").alias("n_hours"),
            num.alias("_num"),
            den.alias("_den"),
        )
        .where(F.col("_den") > 0)
        .select(
            "event_type",
            "lag",
            "n_hours",
            (F.col("_num").cast("double") / F.col("_den").cast("double")).alias(
                "acf"
            ),
        )
        .orderBy("event_type", "lag")
    )


def hourly_crosscorrelation(
    events: DataFrame,
    type_x: str,
    type_y: str,
    max_lag: int = 6,
) -> DataFrame:
    """Cross-correlation function between two event types' hourly rate
    series at lags −max_lag..+max_lag — the lead-lag screen behind
    "do clicks predict purchases N hours later?" (a positive peak at
    lag k>0 means x leads y by k hours). Completes the hourly-series
    lens family: ACF (self-structure), z-score (outlier hours), CUSUM
    (sustained shifts), CCF (between-series structure).

    Both series live on the SHARED dense hour spine (global min..max
    hour across both types, zero-filled — the ``hourly_autocorrelation``
    spine discipline; correlating only co-present hours would bias
    toward busy periods). Lag k pairs the CURRENT y with x from k hours
    EARLIER — (x_{t−k}, y_t) — so a peak at k > 0 reads "x leads y by
    k hours". For x_1..x_H, y_1..y_H with T_x = Σx, T_y = Σy, the
    H²-scaled integers

        num_k·H² = H²·C_k − H·T_x·A_k − H·T_y·B_k + P_k·T_x·T_y
        (C_k = Σ x_{t−k}·y_t over defined pairs, A_k = Σ y_t,
         B_k = Σ x_{t−k}, P_k = H − |k|)
        denx·H² = H²·Σx² − H·T_x²   (deny analogous)

    are exact on decimal(19,0)→(38,0) carriers; the final
    num / sqrt(denx·deny) runs in doubles — sqrt is CORRECTLY ROUNDED
    under IEEE 754 (unlike ln/exp), so the fixed op sequence is
    bit-identical to the SQL oracle (the ``zscore_normalize``
    precedent). Negative lags ride lead() on the same single window.

    Plan: ONE (type, hour) count shuffle over the pruned two-type scan;
    everything after runs on the |hours|-bounded spine table — the
    unpartitioned lag window is deliberate and safe (the table is the
    HOUR COUNT series, whose size is independent of event volume).
    Same loud overflow guard as ACF: H < 1e6 and max count < 1e6.
    Emits no rows if either series has zero variance."""
    if max_lag < 1:
        raise ValueError(
            f"hourly_crosscorrelation: max_lag must be >= 1, got {max_lag}"
        )
    if type_x == type_y:
        raise ValueError(
            "hourly_crosscorrelation: use hourly_autocorrelation for a"
            " series against itself"
        )
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    cnt = (
        with_hour(events)
        .where(F.col("event_type").isin([type_x, type_y]))
        .groupBy("ts_hour")
        .agg(
            F.sum(
                (F.col("event_type") == type_x).cast("long")
            ).alias("x"),
            F.sum(
                (F.col("event_type") == type_y).cast("long")
            ).alias("y"),
        )
    )
    rng = cnt.agg(F.min("ts_hour").alias("_lo"), F.max("ts_hour").alias("_hi"))
    spine = rng.select(
        F.explode(
            F.sequence("_lo", "_hi", F.expr("interval 1 hour"))
        ).alias("ts_hour")
    )
    dense = spine.join(cnt, ["ts_hour"], "left").select(
        "ts_hour",
        F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
    )
    w = Window.orderBy("ts_hour")
    pairs = []
    for k in range(-max_lag, max_lag + 1):
        shifted = (
            F.lag("x", k).over(w) if k >= 0 else F.lead("x", -k).over(w)
        )
        pairs.append(
            F.struct(F.lit(k).cast("long").alias("k"), shifted.alias("m"))
        )
    lagged = (
        dense.select("x", "y", F.array(*pairs).alias("_l"))
        .select("y", F.explode("_l").alias("p"))
        .where(F.col("p.m").isNotNull())
    )
    per_lag = lagged.groupBy(F.col("p.k").alias("lag")).agg(
        F.sum(dec(F.col("p.m")) * dec(F.col("y"))).alias("_c"),
        F.sum("y").alias("_a"),
        F.sum("p.m").alias("_b"),
        F.count(F.lit(1)).alias("_p"),
    )
    glob = dense.agg(
        F.count(F.lit(1)).alias("_h"),
        F.sum("x").alias("_tx"),
        F.sum("y").alias("_ty"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("_sx2"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("_sy2"),
        F.greatest(F.max("x"), F.max("y")).alias("_nmax"),
    )
    j = per_lag.crossJoin(F.broadcast(glob))
    num = (
        dec(F.col("_h") * F.col("_h")) * dec(F.col("_c"))
        - dec(F.col("_h") * F.col("_tx")) * dec(F.col("_a"))
        - dec(F.col("_h") * F.col("_ty")) * dec(F.col("_b"))
        + dec(F.col("_p") * F.col("_tx")) * dec(F.col("_ty"))
    )
    denx = dec(F.col("_h") * F.col("_h")) * dec(F.col("_sx2")) - dec(
        F.col("_h") * F.col("_tx")
    ) * dec(F.col("_tx"))
    deny = dec(F.col("_h") * F.col("_h")) * dec(F.col("_sy2")) - dec(
        F.col("_h") * F.col("_ty")
    ) * dec(F.col("_ty"))
    unsafe = (F.col("_h") >= F.lit(1_000_000)) | (
        F.col("_nmax") >= F.lit(1_000_000)
    )
    guarded_num = F.when(
        unsafe,
        F.raise_error(
            F.concat(
                F.lit(
                    "hourly_crosscorrelation: series domain too large for"
                    " the exact decimal carriers (H = "
                ),
                F.col("_h").cast("string"),
                F.lit(", max hourly count = "),
                F.col("_nmax").cast("string"),
                F.lit(
                    "); need H < 1e6 AND max count < 1e6 — otherwise the"
                    " decimal(19,0) casts would NULL-overflow and"
                    " silently zero the CCF. Bucket coarser first."
                ),
            )
        ).cast("decimal(38,0)"),
    ).otherwise(num)
    return (
        j.select(
            "lag",
            F.col("_h").alias("n_hours"),
            guarded_num.alias("_num"),
            denx.alias("_dx"),
            deny.alias("_dy"),
        )
        .where((F.col("_dx") > 0) & (F.col("_dy") > 0))
        .select(
            "lag",
            "n_hours",
            (
                F.col("_num").cast("double")
                / F.sqrt(
                    F.col("_dx").cast("double") * F.col("_dy").cast("double")
                )
            ).alias("ccf"),
        )
        .orderBy("lag")
    )
