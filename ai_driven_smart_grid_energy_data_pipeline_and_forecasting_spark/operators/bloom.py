"""Broadcast Bloom-filter membership (Bloom 1970, "Space/time
trade-offs in hash coding with allowable errors").

The scale pattern: a semi-join against a large key set normally
broadcasts (or shuffles) O(|keys|) data; a Bloom filter compresses the
build side to O(m) bits with a bounded false-positive rate and ZERO
false negatives — the same trick Spark's own runtime row-group filters
use, expressed here as an auditable operator whose hashes are
engine-portable (md5-backed ``h32``, the repo-wide convention) so the
whole thing is hash-exact checkable against a SQL oracle.

Representation: the filter is a DataFrame of SET bit positions
(``pos`` long, ≤ m rows) rather than a packed bitmap — broadcast-
hash-joinable as-is, no UDF in the probe path, and the build is one
distinct-aggregate shuffle. At the default m = 2^16 the broadcast is
at most a few hundred KB regardless of how many keys were folded in.

Probe plan: explode each candidate key into its k probe positions
(generate-only), broadcast-left-join the bit table, and keep keys
whose k probes ALL hit (``min(hit)``) — one partial-aggregated
groupBy on the probe side, nothing corpus-sized ever moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import h32


def _positions(key: Column, m: int, k: int) -> Column:
    """The k probe positions of a key: h32("bf<j>_" ‖ key) mod m —
    k independent md5-derived hashes, identical in any engine."""
    return F.array(
        *[
            (h32(F.concat(F.lit(f"bf{j}_"), key)) % F.lit(m)).alias(f"p{j}")
            for j in range(k)
        ]
    )


def bloom_build(
    keys: DataFrame, key_col: str, m: int = 1 << 16, k: int = 4
) -> DataFrame:
    """SET bit positions (``pos``) of the Bloom filter over ``keys`` —
    ≤ m rows however large the key set; one distinct shuffle."""
    return (
        keys.select(
            F.explode(
                _positions(F.col(key_col).cast("string"), m, k)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    candidates: DataFrame,
    bits: DataFrame,
    key_col: str,
    m: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Rows of ``candidates`` the filter admits (superset of true
    members; no false negatives). ``m``/``k`` must match the build."""
    probes = candidates.select(key_col).distinct().select(
        key_col,
        F.explode(
            _positions(F.col(key_col).cast("string"), m, k)
        ).alias("pos"),
    )
    hits = (
        probes.join(
            F.broadcast(bits.withColumn("_hit", F.lit(1))), "pos", "left"
        )
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("_hit"), F.lit(0))).alias("_all_hit"))
        .filter(F.col("_all_hit") == 1)
        .select(key_col)
    )
    return candidates.join(hits, key_col, "left_semi")


def bloom_membership_audit(
    universe: DataFrame,
    key_col: str,
    member_pred: Column,
    m: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """End-to-end audit of the Bloom semi-join against exact
    membership: build the filter over ``universe`` rows satisfying
    ``member_pred``, probe every key, and report one row —
    (n_universe, n_members, n_bits_set, n_candidates, n_false_pos,
    n_false_neg). ``n_false_neg`` is structurally zero (the Bloom
    guarantee); computing it from the data keeps the guarantee
    VERIFIED rather than asserted, and the whole row is deterministic
    (md5 hashing), so the SQL oracle checks it value-exact."""
    keys = universe.select(
        F.col(key_col).cast("string").alias("key")
    ).distinct()
    members = universe.filter(member_pred).select(
        F.col(key_col).cast("string").alias("key")
    ).distinct()
    bits = bloom_build(members, "key", m, k)
    admitted = bloom_probe(keys, bits, "key", m, k).withColumn(
        "_adm", F.lit(1)
    )
    labeled = (
        keys.join(members.withColumn("_mem", F.lit(1)), "key", "left")
        .join(admitted, "key", "left")
        .select(
            F.coalesce("_mem", F.lit(0)).alias("is_member"),
            F.coalesce("_adm", F.lit(0)).alias("is_admitted"),
        )
    )
    return labeled.crossJoin(
        F.broadcast(bits.agg(F.count(F.lit(1)).alias("n_bits_set")))
    ).agg(
        F.count(F.lit(1)).alias("n_universe"),
        F.sum("is_member").alias("n_members"),
        F.first("n_bits_set").alias("n_bits_set"),
        F.sum("is_admitted").alias("n_candidates"),
        F.sum(
            ((F.col("is_admitted") == 1) & (F.col("is_member") == 0)).cast(
                "long"
            )
        ).alias("n_false_pos"),
        F.sum(
            ((F.col("is_admitted") == 0) & (F.col("is_member") == 1)).cast(
                "long"
            )
        ).alias("n_false_neg"),
    )
