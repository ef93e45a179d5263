"""Keyed upsert (MERGE) sink without assuming Delta Lake.

The reference's idempotent ``INSERT ... ON CONFLICT (site, ts_utc) DO
UPDATE`` (``nasa.py:126-149``, ``silver_clean.py:47-54``; re-run safety
promised at ``README.md:36``) is the one semantic Spark's built-in
Parquet writer lacks. Strategy here is the standard pure-Parquet
fallback (SURVEY.md §7 "what's hard" #1):

    read target ∪ updates → keep newest per key → dynamic partition
    overwrite of ONLY the partitions the updates touch.

With the table partitioned by ``site``, an incremental ingest rewrites
just the affected site partitions, not the table — the same blast
radius as Postgres's per-row upsert, amortized at Parquet granularity.
On Delta/Iceberg deployments ``MERGE INTO`` replaces this wholesale;
the call signature is the contract.

Idempotency: keys are unique after ``latest_per_group``, so re-running
the same batch rewrites identical bytes — observable no-op, matching
the reference.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import latest_per_group


def merge_frames(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """The MERGE resolution core, path-free: union target and updates,
    keep the newest row per key (``order_col`` recency; ties resolved
    update-over-existing — the reference's ON CONFLICT DO UPDATE).
    ``merge_upsert`` wraps this with partition-pruned IO; use this form
    directly for in-pipeline (non-sink) merge semantics."""
    t = target.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    return (
        latest_per_group(
            t.unionByName(u), keys=list(keys), order_col=order_col, tiebreak=["_src"]
        )
        .drop("_src")
    )


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str,
    partition_by: Sequence[str] = ("site",),
) -> int:
    """Upsert ``updates`` into the Parquet table at ``target_path`` keyed
    by ``keys``; conflicts resolved by highest ``order_col`` (ingest
    recency), ties by update-over-existing. Returns rows written.

    Only partitions present in ``updates`` are read and rewritten
    (partition pruning on the read, dynamic overwrite on the write).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    updates = updates.withColumn("_src", F.lit(1))
    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path).withColumn("_src", F.lit(0))
        # prune to touched partitions: tiny distinct list, broadcast semi join
        touched = updates.select(*partition_by).distinct()
        existing = existing.join(F.broadcast(touched), list(partition_by), "left_semi")
        merged = existing.unionByName(updates)
        # localCheckpoint: Spark refuses to overwrite a path it is
        # simultaneously reading; materialize the merge first. On a real
        # cluster this is a reliable-checkpoint or a Delta MERGE instead.
        out = latest_per_group(
            merged, keys=list(keys), order_col=order_col, tiebreak=["_src"]
        ).drop("_src").localCheckpoint(eager=True)
    else:
        out = latest_per_group(
            updates, keys=list(keys), order_col=order_col, tiebreak=["_src"]
        ).drop("_src")
    n = out.count()
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(target_path)
    return n


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: Sequence[str] = ("site",),
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Rewrite a partitioned Parquet table with right-sized files — the
    maintenance job every streaming-merge sink needs: ``foreachBatch``
    upserts spray one small file set per micro-batch, and at 100 TB
    file-count (driver listing, task scheduling, open cost) becomes the
    bottleneck before data size does.

    Per partition: files_out = ceil(partition_bytes / target) via
    ``coalesce`` (no shuffle — coalesce only narrows). Returns
    {partition_value: files_after}. Content is byte-identical (same
    rows, same schema); only the file layout changes — asserted by the
    round-trip test. Transactional formats run this as OPTIMIZE; the
    logic is the same."""
    import math

    out: dict[str, int] = {}
    table = spark.read.parquet(path)
    part_vals = [
        tuple(str(v) for v in r)
        for r in table.select(*partition_by).distinct().collect()
    ]
    for vals in sorted(part_vals):
        sub = os.path.join(
            path, *[f"{k}={v}" for k, v in zip(partition_by, vals)]
        )
        size = sum(
            os.path.getsize(os.path.join(sub, f))
            for f in os.listdir(sub)
            if f.endswith(".parquet")
        )
        n_files = max(1, math.ceil(size / target_file_bytes))
        part_df = spark.read.parquet(sub).coalesce(n_files)
        compacted = part_df.localCheckpoint(eager=True)
        compacted.coalesce(n_files).write.mode("overwrite").parquet(sub)
        out["/".join(vals)] = n_files
    return out
