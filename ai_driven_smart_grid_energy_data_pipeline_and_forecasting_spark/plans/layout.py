"""Physical table layout: bucketing for co-located (shuffle-free)
joins and sorted-within-partition files for min/max data skipping.

At 100 TB the dominant repeated cost is re-shuffling the same fact
tables on the same keys for every join. Bucketing pays that shuffle
ONCE at write time: both sides hash-partitioned into the same bucket
count on the join key mean the join requires no Exchange at read time
(`tests/test_layout.py` asserts this on the actual plan). The same
write clusters rows within files (`sortBy`), so parquet min/max stats
skip row groups for selective key predicates — the plain-parquet
equivalent of Delta Z-order on one dimension.

Bucketed tables must live in the session catalog (``saveAsTable``) —
bucket metadata is catalog state, not file state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (and optionally sorted) parquet
    table in the session catalog. ``n_buckets`` should be sized so one
    bucket of the largest table fits an executor's scan budget; both
    sides of a co-located join must use the same count and keys."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket
    keys. With bucketing metadata present, Catalyst plans this as a
    SortMergeJoin over the pre-hashed files — zero Exchange."""
    return spark.table(left_table).join(spark.table(right_table), list(on))


def zorder_column(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
) -> DataFrame:
    """Morton (Z-order) interleave of ``cols`` as a ``_z`` column: each
    column is uniform-bucketized to ``bits`` bits over its [min, max]
    range (one tiny agg pass for the bounds), and the bucket bits are
    interleaved so rows close in EVERY dimension get close z-values.

    Uniform buckets (not quantiles) keep the computation one exact
    integer expression — good enough for skipping unless a dimension
    is pathologically skewed, in which case feed a pre-normalized
    (ranked) column. All arithmetic is integer shifts/ors in codegen."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).first()
    n = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for bit in range(bits - 1, -1, -1):
        for ci, c in enumerate(cols):
            lo = float(bounds[f"_lo_{c}"])
            hi = float(bounds[f"_hi_{c}"])
            span = (hi - lo) or 1.0
            bucket = F.least(
                F.lit(n),
                F.floor((F.col(c).cast("double") - lo) / span * n).cast("long"),
            )
            # arithmetic bit extraction: Column & / | are boolean ops
            # in PySpark, so interleave via *2 + (>>bit) % 2
            z = z * 2 + (F.shiftright(bucket, bit) % 2)
    return df.withColumn("_z", z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` Z-ordered on ``cols``: range-partition + sort by
    the Morton key, so every output file covers a small hyper-rectangle
    of the key space and parquet min/max footers skip files for
    predicates on ANY prefix-free combination of the ordered columns —
    multi-dimensional data skipping on plain parquet (Delta's OPTIMIZE
    ZORDER, minus the transaction log)."""
    zdf = zorder_column(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def morton_code(x, y, bits: int = 16):
    """Z-order (Morton) interleave of the low ``bits`` of two
    non-negative integer bucket indices: bit i of x lands at output
    bit 2i, bit i of y at 2i+1. Pure integer shift/mask algebra —
    codegen-able, engine-portable, value-exact oracle. 2·bits ≤ 62
    keeps the code inside a non-negative BIGINT.

    Why it exists: min/max row-group skipping prunes on the SORT
    prefix — a layout sorted by (custkey, date) answers custkey
    predicates well and date predicates not at all. Sorting by the
    interleaved code gives every row group a small RECTANGLE in
    (x, y) space, so range predicates on EITHER dimension (or both)
    prune — the multi-dimensional clustering trick behind Delta/
    Databricks Z-ORDER, expressed as one deterministic column."""
    if not 1 <= bits <= 31:
        raise ValueError(f"morton_code: bits must be in [1, 31], got {bits}")
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code + F.shiftleft(
            F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        code = code + F.shiftleft(
            F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return code


def zorder_write(
    df: DataFrame,
    path: str,
    x,
    y,
    bits: int = 16,
    n_files: int = 1,
) -> None:
    """Write ``df`` clustered by the Morton code of (x, y): range-
    partition + sort by the code so consecutive rows — and therefore
    parquet row groups — cover small 2-D rectangles. The code column
    itself is dropped from the files (it is a layout artifact, not
    data); re-derive it with ``morton_code`` when needed."""
    coded = df.withColumn("_z", morton_code(x, y, bits))
    (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
