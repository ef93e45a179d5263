"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline. Query set broadcast
  against the corpus; per-row cosine is a pure Catalyst fold
  (zip_with + aggregate — no Python, no UDF); top-k via rank window
  partitioned by query.
- Threshold pairs: all corpus pairs above a cosine cutoff (near-dup by
  embedding).
- Random-hyperplane LSH (scale path): sign-bit signatures from
  md5-derived deterministic hyperplanes; candidates share a bucket, so
  the all-pairs cross join disappears. Approximate — recall depends on
  bits/bands like any SRP-LSH.

Scale: brute force is O(|Q|·|C|) — fine for |Q| small (broadcast), the
LSH path is the 100 TB corpus-vs-corpus strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _vec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Fold-based dot for unknown dims. Prefer dot_fixed when the
    dimensionality is known: higher-order functions are interpreted
    (no whole-stage codegen), ~10x slower per row."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def dot_fixed(a: Column, b: Column, dims: int) -> Column:
    """Dot product unrolled to explicit getItem terms. Left-associated
    addition — the identical IEEE order to the fold and to DuckDB's
    list_dot_product, so results stay bit-identical — but fully
    codegen-able by Catalyst."""
    acc = a.getItem(0) * b.getItem(0)
    for d in range(1, dims):
        acc = acc + a.getItem(d) * b.getItem(d)
    return acc


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def norm_fixed(a: Column, dims: int) -> Column:
    return F.sqrt(dot_fixed(a, a, dims))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def ann_bruteforce_topk(
    emb: DataFrame,
    query_filter: Column,
    k: int = 5,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the query subset.

    The query side is tiny → broadcast; the corpus side streams through
    one stage computing cosine per (query, candidate). Norms are
    precomputed per vector (not per pair), and the dot product is
    unrolled (dot_fixed) so the whole scoring stage is codegen'd. Rank
    ties broken by neighbor id; the arithmetic order is bit-identical
    to the DuckDB oracle.
    """
    q = emb.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        _vec(vec_col).alias("qv"),
    ).withColumn("qn", norm_fixed(F.col("qv"), dims))
    # project (cast + norm) BEFORE the repartition: the exchange then
    # materializes the double arrays once per row instead of recomputing
    # them per joined pair, and the scoring stage runs on all cores
    # (single-file inputs are otherwise one task)
    c = (
        emb.select(F.col(id_col).alias("neighbor_id"), _vec(vec_col).alias("cv"))
        .withColumn("cn", norm_fixed(F.col("cv"), dims))
        .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_fixed(F.col("qv"), F.col("cv"), dims)
                / (F.col("qn") * F.col("cn"))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def cosine_threshold_pairs(
    emb: DataFrame,
    threshold: float,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All corpus pairs with cosine ≥ threshold — embedding near-dup.
    Exact all-pairs: O(n²) compute, n² rows through one stage but only
    matches shuffle out. Norms precomputed per vector; unrolled dot.
    The LSH variant below is the scale path."""
    # project (cast + norm) before the repartition exchange — see
    # ann_bruteforce_topk; same per-pair-recompute + one-task trap
    a = (
        emb.select(F.col(id_col).alias("vec_a"), _vec(vec_col).alias("va"))
        .withColumn("na", norm_fixed(F.col("va"), dims))
        .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    )
    b = emb.select(F.col(id_col).alias("vec_b"), _vec(vec_col).alias("vb")).withColumn(
        "nb", norm_fixed(F.col("vb"), dims)
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (
                dot_fixed(F.col("va"), F.col("vb"), dims)
                / (F.col("na") * F.col("nb"))
            ).alias("sim"),
        )
        .filter(F.col("sim") >= F.lit(threshold))
        .orderBy("vec_a", "vec_b")
    )


# ----------------------------------------------- random-hyperplane LSH

SRP_BITS = 16


def hyperplane_weight(bit: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1):
    md5-derived constant, so signatures are reproducible run-to-run,
    across engines, and in the SQL oracle. No RNG state to ship."""
    import hashlib

    h = int(hashlib.md5(f"srp:{bit}:{dim}".encode()).hexdigest()[:8], 16)
    return h / 2147483648.0 - 1.0


def hyperplanes(dims: int) -> list[list[float]]:
    return [[hyperplane_weight(b, d) for d in range(dims)] for b in range(SRP_BITS)]


def srp_signatures(
    emb: DataFrame, dims: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Sign-random-projection signature: bit b = sign(v · r_b), with the
    hyperplanes inlined as literal arrays — each projection is one
    zip_with/aggregate fold, left-to-right, bit-identical to the SQL
    oracle's list_dot_product."""
    v = _vec(vec_col)
    sig = None
    for bit, w in enumerate(hyperplanes(dims)):
        proj = None
        for d, x in enumerate(w):
            term = v.getItem(d) * F.lit(x)
            proj = term if proj is None else proj + term
        bit_val = F.when(proj > 0, F.lit(1 << bit)).otherwise(F.lit(0))
        sig = bit_val if sig is None else sig + bit_val
    return emb.select(F.col(id_col).alias("vec_id_sig"), sig.cast("long").alias("srp"))


SRP_BANDS = 2  # 2 bands × 8 bits: candidates share either half-signature


def ann_lsh_pairs(
    emb: DataFrame,
    dims: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SRP-LSH near-neighbor pairs: signatures split into 2 bands of
    8 bits; docs sharing any band become candidates (equi-join on
    (band, half-signature) — no n² cross join); candidates verified
    with exact cosine ≥ threshold. Distinct pairs survive both bands
    colliding."""
    sig = srp_signatures(emb, dims, id_col, vec_col)
    base = (
        emb.select(F.col(id_col).alias("vid"), _vec(vec_col).alias("v"))
        .withColumn("vn", norm_fixed(F.col("v"), dims))
        .join(sig, F.col("vid") == F.col("vec_id_sig"))
    )
    bands = base.select(
        "vid",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("srp"), 8 * i).bitwiseAND(255).alias("bv"),
                    )
                    for i in range(SRP_BANDS)
                ]
            )
        ).alias("e"),
    ).select("vid", "v", "e.band", "e.bv")
    a = bands.alias("a")
    b = bands.alias("b")
    # distinct on the id pair only — deduping 512-byte vector payloads
    # through the shuffle would be waste; vectors rejoin afterwards
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b"))
        .distinct()
    )
    va = base.select(
        F.col("vid").alias("vec_a"), F.col("v").alias("va"), F.col("vn").alias("na")
    )
    vb = base.select(
        F.col("vid").alias("vec_b"), F.col("v").alias("vb"), F.col("vn").alias("nb")
    )
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (
                dot_fixed(F.col("va"), F.col("vb"), dims)
                / (F.col("na") * F.col("nb"))
            ).alias("sim"),
        )
        .filter(F.col("sim") >= F.lit(threshold))
        .orderBy("vec_a", "vec_b")
    )
