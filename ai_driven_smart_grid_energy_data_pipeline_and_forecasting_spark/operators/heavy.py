"""Exact distributed heavy hitters — the two-pass Misra-Gries shape.

``GROUP BY token ORDER BY count DESC`` over a 100 TB corpus shuffles
every distinct token; but the items that matter — frequency above
``n/k`` — admit a plan that shuffles almost nothing:

1. **Candidate pass**: each partition runs a Misra-Gries summary
   (Misra & Gries 1982, "Finding repeated elements") with ``k``
   counters — O(k) memory, one sequential scan, NO shuffle. The union
   of per-partition summaries (≤ P·k tiny rows) over-approximates:
   every item with global frequency > n/k is GUARANTEED to survive in
   at least one partition's summary (the MG deficit bound sums across
   partitions: a global heavy hitter loses at most n_p/k per
   partition, total < n/k < its count).
2. **Recount pass**: exact counts for the candidate set only — a
   broadcast semi-join + partial-agg count, shuffling |candidates|
   rows instead of |distinct items|. The global row count rides along
   the candidate pass as per-task sentinel rows, so the whole operator
   is exactly two scans of the data.

Filtering the recount at ``count > n/k`` trims the over-approximation
to EXACTLY the true heavy-hitter set with exact counts. The MG
candidate set itself depends on row order within partitions; the
final output does not (superset in, exact-filter out) — which is what
keeps this operator deterministic under any partitioning, and
therefore SQL-oracle-able against the naive full GROUP BY.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """Items of ``df[col]`` with frequency strictly greater than
    ``n/k``, with their exact counts → (item, n_occurrences), ordered
    count desc / item asc. See module docstring for the plan."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    src = df.select(F.col(col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one Misra-Gries summary per TASK (Arrow batches of one
        # partition share the counter dict — the whole point is that
        # state stays O(k) no matter how much data streams through).
        # Each Arrow batch is pre-aggregated with value_counts and the
        # (item, weight) pairs folded in with the WEIGHTED MG update:
        # an uncovered item of weight w drains in rounds of
        # d = min(w, min counter); every round removes d from the
        # incoming weight and d from each of the k-1 counters, i.e.
        # d·k total weight per round, so total drained weight ≤ n and
        # any single item's deficit stays < n/k — the same guarantee
        # as unit-step MG, at O(distinct·k) per batch instead of
        # O(rows·k).
        counters: dict[str, int] = {}
        cap = k - 1
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            for item, w in pdf["item"].value_counts().items():
                w = int(w)
                if item in counters:
                    counters[item] += w
                    continue
                while w > 0 and len(counters) >= cap:
                    d = min(w, min(counters.values()))
                    w -= d
                    for i in list(counters):
                        counters[i] -= d
                        if counters[i] == 0:
                            del counters[i]
                if w > 0:
                    counters[item] = w
        # the task's row count rides along as a NULL-item sentinel, so
        # the global n needs no third scan of the corpus
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "task_rows": [0] * len(counters) + [seen],
            }
        )

    # materialized once (≤ P·k + P rows): two consumers below would
    # otherwise re-execute the corpus-wide candidate pass each
    summary = src.mapInPandas(
        mg, "item string, task_rows long"
    ).localCheckpoint()
    cands = summary.where(F.col("item").isNotNull()).select("item").distinct()
    total = summary.agg(F.sum("task_rows").alias("_n"))
    return (
        src.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") > F.col("_n") / k)
        .select("item", "n_occurrences")
        .orderBy(F.desc("n_occurrences"), "item")
    )


def _mg_compress(frame: DataFrame, k: int) -> DataFrame:
    """Reduce an MG counter frame to ≤ k−1 rows: subtract the k-th
    largest counter from every counter and drop the non-positive —
    the Agarwal et al. (PODS 2012, "Mergeable Summaries") reduction,
    which preserves the summed deficit bound because removing d from
    ≥ k counters drains ≥ k·d total mass. The NULL-item sentinel row
    (total observed count) passes through untouched. All frames here
    are ≤ O(k) rows — driver-scale by construction."""
    items = frame.where(F.col("item").isNotNull())
    sentinel = frame.where(F.col("item").isNull())
    kth = (
        items.orderBy(F.desc("cnt"))
        .limit(k)
        .agg(
            F.when(F.count(F.lit(1)) >= k, F.min("cnt"))
            .otherwise(F.lit(0))
            .alias("_d")
        )
    )
    return (
        items.crossJoin(F.broadcast(kth))
        .select("item", (F.col("cnt") - F.col("_d")).alias("cnt"))
        .where(F.col("cnt") > 0)
        .unionByName(sentinel)
    )


def mg_summary(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """Misra-Gries summary as a MERGEABLE STATE frame: ≤ k−1
    (item, cnt) counter rows plus one NULL-item sentinel carrying the
    total observed row count — the bounded-memory approximate
    heavy-hitter structure (unlike ``heavy_hitters``' exact two-pass
    form, this never re-reads the data, which is what a STREAM needs).
    Guarantee (Misra-Gries 1982 + the mergeability theorem of Agarwal
    et al. 2012): for every item, ``cnt ≤ true ≤ cnt + n/k`` where n
    is the sentinel total — so every item with true frequency > n/k is
    PRESENT in the summary, and ``mg_probe`` exposes both ends of the
    interval.

    Unlike the CMS/Bloom/histogram states, an MG summary is
    ORDER-DEPENDENT (which valid summary you get depends on fold
    order), so the streamed state is not bit-identical to a one-pass
    batch build — both are valid summaries of the same data; the
    tests pin the GUARANTEE (interval containment, heavy-hitter
    presence), not cell equality.

    Plan: one O(k)-memory kernel pass per task (the weighted MG
    update shared with ``heavy_hitters``), then the compress merge of
    the ≤ P·(k−1) per-task counters — no corpus shuffle at all."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    src = df.select(F.col(col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        cap = k - 1
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            for item, w in pdf["item"].value_counts().items():
                w = int(w)
                if item in counters:
                    counters[item] += w
                    continue
                while w > 0 and len(counters) >= cap:
                    d = min(w, min(counters.values()))
                    w -= d
                    for i in list(counters):
                        counters[i] -= d
                        if counters[i] == 0:
                            del counters[i]
                if w > 0:
                    counters[item] = w
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [seen],
            }
        )

    per_task = src.mapInPandas(mg, "item string, cnt long")
    summed = per_task.groupBy("item").agg(F.sum("cnt").alias("cnt"))
    return _mg_compress(summed, k)


def merge_mg_summaries(states: list[DataFrame], k: int = 100) -> DataFrame:
    """⊕ of MG summaries: pointwise counter addition (sentinels sum
    into the merged total) followed by the compress reduction back to
    ≤ k−1 counters. Deficit bounds ADD across inputs (each ≤ nᵢ/k), so
    the merged summary keeps ``cnt ≤ true ≤ cnt + n/k`` — the
    mergeability contract shared with the decimal/HLL, histogram, CMS
    and Bloom states. The k must match across states (a summary's
    guarantee is parameterized by it; the histogram-family caller-owns
    -the-spec contract)."""
    if not states:
        raise ValueError("merge_mg_summaries needs at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return _mg_compress(
        out.groupBy("item").agg(F.sum("cnt").alias("cnt")), k
    )


def mg_probe(state: DataFrame, k: int = 100) -> DataFrame:
    """Read an MG summary state: (item, est_floor, est_ceil) per
    counter row — ``est_floor`` the stored counter (never an
    overcount), ``est_ceil = cnt + ⌈n/k⌉`` the deficit-bound upper end
    — ordered by floor desc. Items absent from the summary have true
    count ≤ n/k (the structure's negative guarantee)."""
    total = state.where(F.col("item").isNull()).agg(
        F.sum("cnt").alias("_n")
    )
    return (
        state.where(F.col("item").isNotNull())
        .crossJoin(F.broadcast(total))
        .select(
            "item",
            F.col("cnt").alias("est_floor"),
            (F.col("cnt") + F.ceil(F.col("_n") / k)).alias("est_ceil"),
        )
        .orderBy(F.desc("est_floor"), "item")
    )


def _cms_rows(col_name: str, depth: int, width: int):
    """The per-item (row, cell) array expression shared by build and
    probe — one definition so they can never disagree."""
    from ..functions.text import h32

    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    h32(F.concat(F.lit(f"cms{j}_"), F.col(col_name))) % width
                ).alias("cell"),
            )
            for j in range(depth)
        ]
    )


def cms_state(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min sketch as a mergeable STATE frame (j, cell, cnt):
    ≤ depth·width rows however large the corpus, built in one
    partial-aggregated shuffle. Two sketches with the same (depth,
    width) merge by cell-wise addition (``merge_cms_states``) — the
    same ⊕ contract as the decimal/HLL rollup and histogram states,
    which is what makes the streaming twin
    (``agg_stream.stream_cms_state``) exact rather than approximate-
    on-top-of-approximate: estimate(merge of batches) ≡
    estimate(build of union), cell for cell."""
    items = df.select(F.col(col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )
    return (
        items.select(F.explode(_cms_rows("item", depth, width)).alias("rc"))
        .groupBy(F.col("rc.j").alias("j"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cms_states(states: list[DataFrame]) -> DataFrame:
    """⊕ of CMS states: cell-wise addition. The (depth, width) spec
    must match across states — cells are only meaningful under one
    hash layout, and a mismatched-width merge would silently alias
    cells, so the caller owns the spec (the histogram family's
    contract; width is not recoverable from the state rows, which are
    sparse)."""
    if not states:
        raise ValueError("merge_cms_states needs at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "cell").agg(F.sum("cnt").alias("cnt"))


def cms_probe(
    state: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate lookup: min over rows of the item's cells (an
    absent cell means count 0). Broadcast the ≤ depth·width state.

    Probe cells hash the SAME string-cast, NULL-filtered ``item`` the
    build side hashes (ADVICE r7): hashing the raw column instead would
    emit NULL probes as an (item=NULL, estimate=0) row the build side
    never counted, and non-string columns would depend on concat's
    implicit cast agreeing with ``cast('string')``."""
    probes = (
        items.select(F.col(col).cast("string").alias("item"))
        .where(F.col("item").isNotNull())
        .select("item", F.explode(_cms_rows("item", depth, width)).alias("rc"))
        .select(
            "item", F.col("rc.j").alias("j"), F.col("rc.cell").alias("cell")
        )
    )
    return (
        probes.join(F.broadcast(state), ["j", "cell"], "left")
        .groupBy("item")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
        )
    )


def cms_join_size_estimate(
    state_a: DataFrame, state_b: DataFrame, depth: int = 4
) -> DataFrame:
    """Equi-join SIZE estimate from two Count-Min sketches — the
    inner-product composition of Cormode & Muthukrishnan §4.2:
    |A ⋈ B| = Σ_v f_A(v)·f_B(v), estimated as the MIN over sketch rows
    of the cell-wise inner product Σ_cell cntA·cntB. One-sided like
    the point estimate (hash collisions only ADD cross terms), so
    estimate ≥ true always; expected overshoot ≤ |A|·|B|/width per
    row. The cardinality-estimation primitive a cost-based optimizer
    wants BEFORE running a join — two ≤ depth·width states stand in
    for scanning either side. Both states must share (depth, width)
    (the merge contract). Joins the two tiny states, one groupBy, one
    min — all exact integers."""
    a = state_a.select("j", "cell", F.col("cnt").alias("_ca"))
    b = state_b.select("j", "cell", F.col("cnt").alias("_cb"))
    per_j = (
        a.join(b, ["j", "cell"])
        .groupBy("j")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_ip"))
    )
    # a sketch row with NO overlapping cells proves the join is empty —
    # it must participate in the min as 0, not vanish from the groupBy
    spark = state_a.sparkSession
    all_j = spark.range(depth).select(F.col("id").cast("int").alias("j"))
    return (
        all_j.join(per_j, "j", "left")
        .agg(
            F.min(F.coalesce(F.col("_ip"), F.lit(0))).alias(
                "cms_join_estimate"
            )
        )
    )


def cms_join_size_audit(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Join-cardinality estimate audited against the exact join count:
    (true_join_size, cms_estimate, overestimate) — ``overestimate ≥ 0``
    VERIFIES the one-sided inner-product guarantee from the data, the
    same shape as ``cms_topk_audit``'s point-estimate audit. The exact
    side is one equi-join count; the sketch side never joins the data
    at all (two sketch builds + a depth·width-bounded inner product) —
    which is the whole point at 100 TB."""
    sa = cms_state(df_a, col_a, depth, width)
    sb = cms_state(df_b, col_b, depth, width)
    est = cms_join_size_estimate(sa, sb, depth)
    true_sz = (
        df_a.select(F.col(col_a).cast("string").alias("_k"))
        .where(F.col("_k").isNotNull())
        .join(
            df_b.select(F.col(col_b).cast("string").alias("_k")).where(
                F.col("_k").isNotNull()
            ),
            "_k",
        )
        .agg(F.count(F.lit(1)).alias("true_join_size"))
    )
    return true_sz.crossJoin(F.broadcast(est)).select(
        "true_join_size",
        "cms_join_estimate",
        (F.col("cms_join_estimate") - F.col("true_join_size")).alias(
            "overestimate"
        ),
    )


def cms_topk_audit(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    k: int = 10,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved
    data stream summary: the count-min sketch and its applications")
    audited against exact counts — the third leg of the sketch family
    beside HLL distinct (``sketch_accuracy_audit``) and Misra-Gries
    heavy hitters: mergeable approximate FREQUENCIES in
    depth × width ≪ |domain| space.

    Build: one partial-aggregated shuffle of (row, cell) — each item
    increments cell ``h32("cms<j>_" ‖ item) mod width`` in each of
    ``depth`` rows, so the sketch is ≤ depth·width rows however large
    the corpus, and two sketches merge by cell-wise addition (the same
    mergeability contract as ``aggstate``). Estimate of an item =
    min over rows of its cells — never an undercount (every collision
    only adds), overcount bounded by n/width per row w.h.p.

    The audit takes the exact top-k items (count desc, item asc),
    probes the sketch, and emits (item, true_count, cms_estimate,
    overestimate): ``overestimate >= 0`` VERIFIES the one-sided
    guarantee from the data, and every number is md5-deterministic, so
    the SQL oracle checks the whole row value-exact."""
    items = df.select(F.col(col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )
    rows = _cms_rows("item", depth, width)
    cells = cms_state(df, col, depth, width)
    top = (
        items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), "item")
        .limit(k)
    )
    probes = top.select(
        "item", "true_count", F.explode(rows).alias("rc")
    ).select("item", "true_count", "rc.j", "rc.cell")
    return (
        probes.join(F.broadcast(cells), ["j", "cell"])
        .groupBy("item", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            "item",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_count")).alias("overestimate"),
        )
        .orderBy(F.desc("true_count"), "item")
    )


def minhash_state(
    df: DataFrame, keys: list[str], col: str, n_hashes: int = 16
) -> DataFrame:
    """Per-key MinHash signature as a mergeable STATE frame
    (keys..., j, sig) — ≤ n_hashes rows per key however large the
    input, built in one partial-aggregated shuffle. min is idempotent
    and orderless, so two states merge by component-wise min
    (``merge_minhash_states``) with merge-of-batches ≡ build-of-union
    EXACTLY, cell for cell — the same ⊕ contract as the CMS/histogram
    states, and duplicates never move a min, so the state is a SET
    sketch by construction (no pre-distinct needed). Estimates Jaccard
    similarity BETWEEN keys' item sets (``minhash_state_jaccard``) —
    the set-overlap question the other five states can't answer.

    Hash family: the repo's md5-derived universal family
    h_j(x) = (a_j·h32(x) + b_j) mod 2^32 (``dedup.minhash_params``) —
    engine-portable, RNG-free, value-exact oracle. Items are
    string-cast and NULL-filtered on BOTH build and probe paths (the
    cms_probe ADVICE lesson)."""
    from ..functions.text import h32
    from .dedup import MH_MOD, minhash_params

    items = df.select(
        *keys, F.col(col).cast("string").alias("item")
    ).where(F.col("item").isNotNull())
    params = [minhash_params(j) for j in range(n_hashes)]
    rows = items.withColumn("_h", h32(F.col("item"))).select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            (F.lit(a) * F.col("_h") + F.lit(b))
                            % F.lit(MH_MOD)
                        ).alias("v"),
                    )
                    for j, (a, b) in enumerate(params)
                ]
            )
        ).alias("rc"),
    )
    return rows.groupBy(
        *keys, F.col("rc.j").alias("j")
    ).agg(F.min("rc.v").alias("sig"))


def merge_minhash_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """⊕ of MinHash states: component-wise min. The hash family and
    n_hashes must match across states (the CMS width contract — the
    family is not recoverable from the rows, so the caller owns it)."""
    if not states:
        raise ValueError("merge_minhash_states needs at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys, "j").agg(F.min("sig").alias("sig"))


def minhash_state_jaccard(
    state: DataFrame, key: str, n_hashes: int = 16
) -> DataFrame:
    """Pairwise Jaccard estimates between every two keys' item sets
    from their signatures alone: ĵ = (#agreeing components)/n_hashes —
    Broder's estimator, E[ĵ] = J. The join is on the n_hashes-row
    signatures (state-sized, never item-sized); output one row per
    unordered key pair."""
    a = state.select(
        F.col(key).alias("key_a"), "j", F.col("sig").alias("_sa")
    )
    b = state.select(
        F.col(key).alias("key_b"), "j", F.col("sig").alias("_sb")
    )
    return (
        a.join(b, "j")
        .where(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(
            F.sum(
                (F.col("_sa") == F.col("_sb")).cast("long")
            ).alias("n_agree")
        )
        .select(
            "key_a",
            "key_b",
            "n_agree",
            (F.col("n_agree") / F.lit(float(n_hashes))).alias("jhat"),
        )
        .orderBy("key_a", "key_b")
    )
