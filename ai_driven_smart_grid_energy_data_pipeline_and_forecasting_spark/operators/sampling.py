"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need *reproducible* sampling: the same document
must land in the same split on every run, on every engine, under any
partitioning — re-runs of a 100 TB job cannot be allowed to move
examples between train and eval. RNG-based sampling (``df.sample``,
``sampleBy``) is seed-stable only within one engine and one partition
layout, so everything here derives from the content key instead:
``bucket = h32(key) % n`` with md5-backed ``h32`` (bit-identical in
Spark and DuckDB — see ``functions.text.h32``).

Scale profile: all pure per-row Catalyst expressions — no shuffle, no
RNG state, filters fully codegen'd; a split or sample composes with
partition pruning and pushdown exactly like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import h32

BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "", n: int = BUCKETS) -> Column:
    """Stable bucket in [0, n) from the key's md5. ``salt`` decouples
    independent sampling decisions on the same key (split vs subsample
    vs A/B arm) — different salts give independent bucket streams."""
    return h32(F.concat(F.lit(salt), key.cast("string"))) % n


def with_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign every row a named split by hash-bucket range.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any
    remainder falls into the last split). Ranges are contiguous bucket
    intervals, so growing one split later only *moves the boundary* —
    rows never shuffle between non-adjacent splits (the stable-split
    property hash-based assignment exists for)."""
    b = hash_bucket(F.col(key_col), salt)
    expr = None
    lo = 0
    names = list(weights)
    for name in names:
        hi = lo + int(round(weights[name] * BUCKETS))
        hi = BUCKETS if name == names[-1] and sum(weights.values()) >= 0.999 else hi
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn("split", expr.otherwise(names[-1]))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sample: keep a row iff its hash bucket
    falls under its stratum's rate (unlisted strata drop). The same
    key survives at any rate ≥ its bucket position — raising a rate
    strictly grows the sample (nested-sample property)."""
    b = hash_bucket(F.col(key_col), salt)
    cond = F.lit(False)
    for stratum, rate in rates.items():
        cond = cond | (
            (F.col(stratum_col) == stratum) & (b < int(round(rate * BUCKETS)))
        )
    return df.filter(cond)


def mixture_rates(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-stratum keep-rates that reshape a corpus to a target domain
    mixture with maximum coverage (no upsampling): the bottleneck
    stratum (smallest count-to-weight ratio) keeps everything and every
    other stratum downsamples to match the target proportions.

    Pure arithmetic on the (tiny) per-stratum count table — the data
    itself is never collected."""
    present = {s: w for s, w in weights.items() if s in counts and w > 0}
    scale = min(counts[s] / w for s, w in present.items())
    return {s: min(1.0, scale * w / counts[s]) for s, w in present.items()}


def weighted_mixture_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weights: dict[str, float],
    salt: str = "mixture",
) -> DataFrame:
    """Deterministically resample ``df`` toward the ``weights`` domain
    mixture (strata not in ``weights`` drop — the LLM-corpus "domain
    mixing" step).

    Two passes: a per-stratum count aggregate (rows = #strata — the one
    driver-visible table), then the pure-predicate hash sample. Rerunning
    on the same corpus keeps exactly the same documents; growing a
    stratum's weight only widens its bucket interval (nested samples)."""
    counts = {
        r[stratum_col]: r["n"]
        for r in df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return stratified_hash_sample(
        df, key_col, stratum_col, mixture_rates(counts, weights), salt
    )


def deterministic_top_n(
    df: DataFrame,
    key_col: str,
    n: int,
    salt: str = "sample",
) -> DataFrame:
    """EXACTLY ``n`` rows, chosen deterministically: the ``n`` smallest
    content-hash values (ties impossible up to md5 collisions; ``key``
    breaks them anyway). Rate-based sampling (`with_split`,
    `stratified_hash_sample`) gives *expected* sizes; eval sets and
    demo extracts need exact ones, and RNG reservoirs move rows
    between runs. Growing ``n`` only appends (the hash order is a
    fixed global permutation) — the same nested property as the
    rate-based samplers.

    Plan: global top-N = per-partition heap + single merge
    (TakeOrderedAndProject) — no full sort, no shuffle of the corpus.
    """
    h = h32(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return (
        df.withColumn("_h", h)
        .orderBy("_h", key_col)
        .limit(n)
        .drop("_h")
    )


def weighted_priority_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    n: int,
    salt: str = "priority",
) -> DataFrame:
    """Deterministic weight-proportional sample of exactly ``n`` rows —
    priority sampling (Duffield, Lund & Thorup 2007, public): each row
    gets priority q = w / u with u a hash-derived uniform in (0, 1],
    and the n largest priorities win. Heavier rows win more often
    (inclusion probability ≈ min(1, n·w/Σw)), yet the choice is a pure
    function of (key, salt, weight) — rerunning selects the same rows,
    growing ``n`` only appends (the priority order is a fixed global
    permutation), and no RNG state ships anywhere. The weighted
    counterpart of ``deterministic_top_n``, for curation steps like
    "sample documents ∝ quality score".

    Rows with weight ≤ 0 or NULL are excluded (zero weight means zero
    inclusion mass; a negative weight has no sampling meaning).

    Plan: global top-N = per-partition heap + single merge
    (TakeOrderedAndProject) — no shuffle of the corpus. u = (h32+1) /
    2³² and q = w/u are two IEEE ops mirrored verbatim in the SQL
    oracle, so selections are engine-portable."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    h = h32(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    u = (h + F.lit(1)).cast("double") / F.lit(4294967296.0)
    return (
        df.withColumn("_w", weight.cast("double"))
        .where(F.col("_w") > 0)
        .withColumn("_q", F.col("_w") / u)
        .orderBy(F.desc("_q"), key_col)
        .limit(n)
        .drop("_w", "_q")
    )


def group_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe dataset split: near-duplicate documents must never
    straddle the train/eval boundary (a train doc's near-dup in the
    test set is contamination — the reason pipelines dedup *before*
    splitting, per the contamination literature the audit op cites).
    ``with_split`` hashes each doc independently, so two near-dups can
    land on opposite sides; here the split key is the *component* of
    the near-dup pair graph instead: every doc in a connected group
    shares one canonical key (the component's min id), so the whole
    group moves as a unit. Singletons (docs in no pair) key on their
    own id — for them this degrades to exactly ``with_split``.

    Output adds ``group_key`` (the shared split key) and ``split``.
    Determinism: the component labels and the md5 bucket are both
    content-derived — re-runs, engines, and partitionings agree.

    Scale: one CC pass over the (post-LSH, tiny relative to the
    corpus) pair list + one join of the component map onto the corpus;
    the split predicate itself stays a pure per-row expression. The
    component map is |docs-in-pairs| rows — the duplicate fraction,
    not the corpus — so the join is deliberately NOT broadcast-hinted:
    at typical dup rates AQE converts it to broadcast on its own, and
    a pathological 30%-dup corpus still gets a sound shuffle join
    instead of a forced-broadcast OOM.
    """
    from .dedup import connected_components

    comp = connected_components(pairs, src=src, dst=dst).select(
        F.col("doc_id").alias(id_col), F.col("component").alias("group_key")
    )
    keyed = df.join(comp, id_col, "left").withColumn(
        "group_key", F.coalesce(F.col("group_key"), F.col(id_col))
    )
    return with_split(keyed, "group_key", weights, salt)


def quota_cap(
    df: DataFrame,
    stratum_col: str,
    cap: int,
    order_cols: tuple[str, ...] = ("doc_id",),
    spray: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum — the per-domain quota
    step of web-corpus curation (RefinedWeb/C4 cap the documents any
    single host may contribute so megasites don't dominate the
    mixture). Selection is deterministic: the ``cap`` smallest rows by
    ``order_cols`` within each stratum (``order_cols`` must be a total
    order — ties make the rank cut arbitrary), so re-runs and engines
    agree row-for-row (contrast RNG subsampling; see the module
    docstring).

    Plan: one shuffle on the stratum key for the rank window. A hot
    stratum (one domain = half the corpus) makes that window's sort
    the straggler at 100 TB; ``spray=P`` adds the skew-safe pre-cut:
    rank first within (stratum, hash(order_cols) % P) — the hot
    stratum's sort spreads over P reducers — keep the per-bucket
    ``cap`` smallest, then run the global window on the survivors,
    now ≤ cap·P rows per stratum. Every true global top-``cap`` row is
    in its own bucket's top ``cap``, so the result is IDENTICAL to the
    plain window (equivalence-tested); only the straggler profile
    changes — the same contract as ``skew.salted_agg``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(*order_cols)
    if spray is not None and spray > 1:
        bucket = F.pmod(
            F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(spray)
        )
        pre = Window.partitionBy(F.col(stratum_col), bucket).orderBy(*order_cols)
        df = (
            df.withColumn("__pqr", F.row_number().over(pre))
            .filter(F.col("__pqr") <= cap)
            .drop("__pqr")
        )
    return (
        df.withColumn("__qr", F.row_number().over(w))
        .filter(F.col("__qr") <= cap)
        .drop("__qr")
    )


def epoch_upsample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    epochs: dict[str, float],
    salt: str = "epochs",
) -> DataFrame:
    """Deterministic per-stratum UPSAMPLING: repeat each row of stratum
    ``s`` ``epochs[s]`` times on average — the "epochs per domain" knob
    of published LLM data recipes (e.g. LLaMA's per-source epoch
    counts), where high-quality domains are seen >1× per training pass.
    ``mixture_rates`` deliberately never upsamples; this is its other
    half. Strata absent from ``epochs`` drop (same convention).

    Every row gets ``floor(e)`` copies plus one more iff its hash
    bucket clears the fractional part — so e=2.5 repeats every doc
    twice and a deterministic, content-keyed half of them a third
    time. Re-runs reproduce the same copies exactly; raising e only
    adds copies (nested, like the samplers above). Output adds
    ``copy_idx`` (1-based) so downstream shuffles can decorrelate
    copies.

    Scale: pure per-row expressions + a generate-only explode — no
    shuffle, no RNG, no driver data. Use exact-binary epoch fractions
    (x/2^k) if bit-stable cross-engine replay matters.
    """
    pairs: list[Column] = []
    for s, e in epochs.items():
        pairs += [F.lit(s), F.lit(float(e))]
    e = F.create_map(*pairs)[F.col(stratum_col)]
    base = F.floor(e).cast("long")
    frac = e - F.floor(e)
    extra = (
        hash_bucket(F.col(key_col), salt) < frac * F.lit(float(BUCKETS))
    ).cast("long")
    n = base + extra
    seq = F.when(n >= 1, F.sequence(F.lit(1).cast("long"), n)).otherwise(
        F.array().cast("array<long>")
    )
    return df.withColumn("copy_idx", F.explode(seq))


def contrastive_negatives(
    docs: DataFrame,
    k: int = 4,
    n_buckets: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor gets exactly ``k`` pseudo-random negatives — the next k ids
    on a HASH RING (documents ordered by (h32(id), id) inside a hash
    bucket, wrapping cyclically at the bucket end). Hash order is
    uncorrelated with any data attribute, so ring-neighbors are as
    good as uniform negatives, while being rerun-stable and RNG-free
    (the `doc_weighted_sample` determinism discipline; word2vec-style
    negative sampling without a generator state).

    The ring lives INSIDE a hash bucket so the only window is
    partitioned — no global sort, no single-partition stage; at scale
    pick ``n_buckets`` ~ corpus/10⁶ and every bucket windows
    independently. The bucket boundary costs nothing statistically
    (bucket assignment is itself hash-uniform). Wrap-around is a
    broadcast join of each bucket's first ``k`` ring rows back onto
    its tail, so tail anchors get the ring's head as negatives —
    every anchor ends with exactly k distinct negatives, verified by a
    LOUD guard: any bucket with ≤ k rows raises (sample more buckets
    into fewer, or shrink k) rather than silently emitting self-pairs
    or duplicates.

    Output: (anchor, negative, slot 1..k), ordered. Value-exact SQL
    oracle (h32 is the cross-engine md5 hash; windows mirror)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("contrastive_negatives needs k >= 1")
    ring = docs.select(
        F.col(id_col).alias("anchor"),
        h32(F.col(id_col).cast("string")).alias("_r"),
    ).withColumn("_b", F.col("_r") % F.lit(n_buckets))
    w = Window.partitionBy("_b").orderBy("_r", "anchor")
    pos = ring.withColumn("_pos", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("_b"))
    )
    # loud guard rides the anchor column: a bucket with <= k members
    # cannot yield k distinct non-self negatives
    guarded = pos.withColumn(
        "anchor",
        F.when(
            F.col("_n") <= k,
            F.raise_error(
                F.concat(
                    F.lit(
                        "contrastive_negatives: hash bucket with only "
                    ),
                    F.col("_n").cast("string"),
                    F.lit(
                        f" rows cannot supply k={k} distinct negatives"
                        " — lower n_buckets or k"
                    ),
                )
            ).cast(pos.schema["anchor"].dataType.simpleString()),
        ).otherwise(F.col("anchor")),
    )
    slots = F.explode(
        F.sequence(F.lit(1), F.lit(k))
    ).alias("slot")
    want = guarded.select(
        "anchor", "_b", "_pos", "_n", slots
    ).withColumn(
        # cyclic successor position on the bucket ring
        "_tgt", (F.col("_pos") - 1 + F.col("slot")) % F.col("_n") + 1
    )
    members = guarded.select(
        F.col("_b").alias("_mb"),
        F.col("_pos").alias("_mpos"),
        F.col("anchor").alias("negative"),
    )
    return (
        want.join(
            members,
            (F.col("_b") == F.col("_mb")) & (F.col("_tgt") == F.col("_mpos")),
        )
        .select("anchor", "negative", F.col("slot").cast("int").alias("slot"))
        .orderBy("anchor", "slot")
    )
