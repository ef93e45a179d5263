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


def _partition_sizes(
    spark: SparkSession, path: str, partition_by: Sequence[str]
) -> dict[tuple[str, ...], int]:
    """One recursive Hadoop-FileSystem listing → {partition values:
    total parquet bytes}. Goes through the FS API, not ``os``, so the
    same code paths work on HDFS/S3A mounts, and the whole table costs
    a single metadata pass instead of one listing per partition."""
    from urllib.parse import unquote

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    sizes: dict[tuple[str, ...], int] = {}
    while it.hasNext():
        st = it.next()
        fp = st.getPath().toString()
        if not fp.endswith(".parquet"):
            continue
        kv = dict(
            seg.split("=", 1)
            for seg in fp.split("/")[:-1]
            if "=" in seg
        )
        try:
            key = tuple(unquote(kv[k]) for k in partition_by)
        except KeyError:
            continue  # stray file outside the partition layout
        sizes[key] = sizes.get(key, 0) + st.getLen()
    return sizes


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

    One job for the whole table: partition byte sizes come from a single
    recursive FS listing; each partition's row set is hashed into
    ceil(bytes / target) buckets (content hash — deterministic, no RNG);
    one repartition on (partition cols, bucket) then one dynamic
    partition overwrite rewrites every partition in parallel. No
    per-partition driver loop — 100k partitions is one shuffle, not a
    day of serial jobs. Returns {partition_value: files_planned}
    (a bucket-to-task hash collision can merge two buckets of the same
    partition into one file — fewer, larger files, never lost rows).
    Content is row-identical; only layout changes — asserted by the
    round-trip test. Transactional formats run this as OPTIMIZE; the
    logic is the same."""
    import math

    sizes = _partition_sizes(spark, path, partition_by)
    if not sizes:
        return {}
    n_files = {
        vals: max(1, math.ceil(sz / target_file_bytes))
        for vals, sz in sizes.items()
    }
    nf_df = spark.createDataFrame(
        [(*vals, nf) for vals, nf in n_files.items()],
        ", ".join([f"_pv_{k} string" for k in partition_by] + ["_nf int"]),
    )
    table = spark.read.parquet(path)
    data_cols = [c for c in table.columns if c not in partition_by]
    cond = None
    for k in partition_by:
        eq = table[k].cast("string") == nf_df[f"_pv_{k}"]
        cond = eq if cond is None else (cond & eq)
    bucketed = table.join(F.broadcast(nf_df), cond).withColumn(
        "_b", F.pmod(F.xxhash64(*data_cols), F.col("_nf"))
    )
    total = sum(n_files.values())
    out = (
        bucketed.repartition(total, *partition_by, "_b")
        .drop("_b", "_nf", *[f"_pv_{k}" for k in partition_by])
        # materialize before overwriting the path being read (see
        # merge_upsert; Delta/Iceberg replace this with a commit)
        .localCheckpoint(eager=True)
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    return {"/".join(vals): nf for vals, nf in sorted(n_files.items())}
