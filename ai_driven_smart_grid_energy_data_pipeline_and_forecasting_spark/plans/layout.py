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
