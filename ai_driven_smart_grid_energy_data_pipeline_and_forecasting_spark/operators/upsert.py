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
    allow_schema_evolution: bool = False,
) -> DataFrame:
    """The MERGE resolution core, path-free: union target and updates,
    keep the newest row per key (``order_col`` recency; ties resolved
    update-over-existing — the reference's ON CONFLICT DO UPDATE).
    ``merge_upsert`` wraps this with partition-pruned IO; use this form
    directly for in-pipeline (non-sink) merge semantics.

    ``allow_schema_evolution=True`` is Delta's ``mergeSchema`` analog:
    columns present on only one side union as NULL on the other, so an
    ingest batch may ADD columns (old rows read NULL there). Because
    resolution is whole-row newest-wins, an update row *missing* an
    existing column replaces it with NULL — additive evolution is the
    intended use. Off by default: a silently widened schema is usually
    an upstream bug, and the loud AnalysisException is the guardrail."""
    t = target.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    return (
        latest_per_group(
            t.unionByName(u, allowMissingColumns=allow_schema_evolution),
            keys=list(keys), order_col=order_col, tiebreak=["_src"]
        )
        .drop("_src")
    )


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the Hadoop FS API — the same
    code paths work on local disk, HDFS, and S3A mounts."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _leaf_dirs(fs, jvm, root: str) -> set[str]:
    """Relative paths of every directory under ``root`` that directly
    contains a file (one recursive listing)."""
    HPath = jvm.org.apache.hadoop.fs.Path
    if not fs.exists(HPath(root)):
        return set()
    root_uri = fs.makeQualified(HPath(root)).toUri().getPath()
    leaves: set[str] = set()
    it = fs.listFiles(HPath(root), True)
    while it.hasNext():
        fp = it.next().getPath().getParent().toUri().getPath()
        leaves.add(fp[len(root_uri):].strip("/"))
    return leaves


def _has_parquet_files(fs, jvm, root: str) -> bool:
    """True iff any ``.parquet`` file exists under ``root``."""
    HPath = jvm.org.apache.hadoop.fs.Path
    if not fs.exists(HPath(root)):
        return False
    it = fs.listFiles(HPath(root), True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            return True
    return False


def _rename_or_die(fs, src, dst) -> None:
    """Hadoop FileSystem.rename reports failure by returning FALSE, not
    raising; an unchecked false followed by the work-dir delete would
    destroy the only copy of staged data (review r5). Raise instead —
    recovery must stop BEFORE anything is deleted."""
    if not fs.rename(src, dst):
        raise RuntimeError(
            f"recovery rename failed: {src} -> {dst}; refusing to clear "
            "work dirs (staged/trash bytes may be the only copy)"
        )


def _clear_work_dirs(spark: SparkSession, path: str) -> None:
    """Clear ``_staging``/``_trash`` left by a crashed writer — but
    RECOVER first (ADVICE r4): a crash inside ``_publish_staged``'s
    rename loop can leave the batch half-applied, and staged/trash
    bytes may be the ONLY copy of data.

    If the staged fileset is COMPLETE (``_SUCCESS`` present), the
    interrupted publish is resumed in full: every staged partition
    leaf still unpublished — whether its live dir was already moved to
    ``_trash``, still holds the old data, or never existed (brand-new
    partition) — is renamed into place, so recovery finishes the
    commit instead of applying it partially (a crash after site=a's
    rename but before site=b's must not yield a table with new-a /
    old-b and site=b's durable staged update deleted). If staging is
    INCOMPLETE, trash-stranded leaves roll back (trash→live). Only
    then are the work dirs deleted — staged/trash bytes are never the
    only copy at the moment of deletion. A crash strictly before the
    staged write finished leaves no ``_SUCCESS`` and no ``_trash``, so
    that path is a plain delete as before."""
    fs, jvm = _hadoop_fs(spark, path)
    HPath = jvm.org.apache.hadoop.fs.Path
    trash_root = f"{path}/_trash"
    staged_root = f"{path}/_staging/data"
    staged_complete = fs.exists(HPath(f"{staged_root}/_SUCCESS"))
    if staged_complete:
        # roll the whole publish forward: any staged leaf still present
        # was not yet renamed into place
        for rel in sorted(_leaf_dirs(fs, jvm, staged_root)):
            if "=" not in rel:
                continue  # the _SUCCESS marker at the staged root
            live = HPath(f"{path}/{rel}")
            if fs.exists(live):
                trash = HPath(f"{trash_root}/{rel}")
                fs.mkdirs(trash.getParent())
                _rename_or_die(fs, live, trash)
            fs.mkdirs(live.getParent())
            _rename_or_die(fs, HPath(f"{staged_root}/{rel}"), live)
    else:
        for rel in sorted(_leaf_dirs(fs, jvm, trash_root)):
            live = HPath(f"{path}/{rel}")
            if fs.exists(live):
                continue  # this leaf's publish completed; trash is stale
            fs.mkdirs(live.getParent())
            _rename_or_die(fs, HPath(f"{trash_root}/{rel}"), live)  # roll back
    for d in (f"{path}/_staging", trash_root):
        p = HPath(d)
        if fs.exists(p):
            fs.delete(p, True)


def _publish_staged(spark: SparkSession, path: str, n_partition_cols: int) -> list[str]:
    """Swap staged partition directories into the live tree: per leaf
    partition, rename live→``_trash`` then staged→live (two metadata
    ops, no data movement on rename-capable filesystems). Split out as
    a seam so the crash-injection test can kill between write and
    publish. Returns the published partition dir names."""
    fs, jvm = _hadoop_fs(spark, path)
    HPath = jvm.org.apache.hadoop.fs.Path
    staged_root = f"{path}/_staging/data"
    leaves = {
        rel
        for rel in _leaf_dirs(fs, jvm, staged_root)
        if rel.count("=") >= n_partition_cols
    }
    for rel in sorted(leaves):
        live = HPath(f"{path}/{rel}")
        if fs.exists(live):
            trash = HPath(f"{path}/_trash/{rel}")
            fs.mkdirs(trash.getParent())
            _rename_or_die(fs, live, trash)
        fs.mkdirs(live.getParent())
        _rename_or_die(fs, HPath(f"{staged_root}/{rel}"), live)
    _clear_work_dirs(spark, path)
    return sorted(leaves)


def _staged_overwrite(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    partition_by: Sequence[str],
    recovered: bool = False,
) -> int:
    """Crash-safe partition overwrite (VERDICT r2 #3 / r3 #6): write the
    new fileset under ``<path>/_staging`` — underscore-prefixed, so
    Parquet readers of ``path`` never see it — then publish each staged
    partition with two directory renames. A crash anywhere before
    publish leaves the previous snapshot fully readable; the next
    writer clears the stale staging. The residual window is the rename
    loop itself — pure metadata ops; a transactional format (Delta/
    Iceberg) shrinks that to one manifest CAS, which is the production
    deployment's answer (see class docstring). Returns rows written
    (counted from staged parquet footers — no recompute of the plan).

    Writing to staging instead of overwriting in place also removes the
    read-own-input hazard, so callers no longer need the eager
    ``localCheckpoint`` materialization this module used to carry — one
    full pass over the merge output saved per call."""
    # callers that already ran recovery at entry (merge_upsert,
    # compact_partitions — they must, for read-plan freshness) skip the
    # duplicate multi-request FS probe (review r5)
    if not recovered:
        _clear_work_dirs(spark, path)
    staged = f"{path}/_staging/data"
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(staged)
    # A zero-row df stages only _SUCCESS (ADVICE r4): reading that back
    # throws UNABLE_TO_INFER_SCHEMA, and there is nothing to publish —
    # the old in-place path was a no-op for empty batches, so this one
    # must be too (module contract: re-run idempotency).
    fs, jvm = _hadoop_fs(spark, path)
    if not _has_parquet_files(fs, jvm, staged):
        _clear_work_dirs(spark, path)
        return 0
    n = spark.read.parquet(staged).count()  # metadata-only row count
    _publish_staged(spark, path, len(partition_by))
    return n


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str,
    partition_by: Sequence[str] = ("site",),
    allow_schema_evolution: bool = False,
) -> int:
    """Upsert ``updates`` into the Parquet table at ``target_path`` keyed
    by ``keys``; conflicts resolved by highest ``order_col`` (ingest
    recency), ties by update-over-existing. Returns rows written.

    Only partitions present in ``updates`` are read and rewritten
    (partition pruning on the read; the write stages the rewritten
    partitions and publishes them by rename — crash-safe, see
    ``_staged_overwrite``).

    ``allow_schema_evolution=True`` (Delta ``mergeSchema`` analog) lets
    a batch ADD columns: the touched-partition read uses parquet
    ``mergeSchema`` and the union fills the missing side with NULL (see
    ``merge_frames``). UNTOUCHED partitions keep their old files — the
    table becomes mixed-schema on disk, exactly like Delta before
    ``OPTIMIZE``; read an evolved table with
    ``spark.read.option("mergeSchema", "true")`` until every partition
    has been rewritten.
    """
    # recover any crashed writer's work dirs BEFORE planning the read:
    # roll-forward recovery renames live partition dirs, and a read plan
    # captured earlier would hold stale file references (observed as
    # FileNotFoundException at execution time)
    _clear_work_dirs(spark, target_path)
    updates = updates.withColumn("_src", F.lit(1))
    if os.path.exists(target_path):
        # ALWAYS mergeSchema on the existing read: once a table has been
        # evolved it is mixed-schema on disk, and a plain read would
        # infer from one arbitrary footer — a later default merge could
        # then silently rewrite partitions WITHOUT the evolved column
        # (nondeterministic data loss). With the union of footers, a
        # default merge against an evolved table instead fails loudly at
        # unionByName, which is the guardrail this flag is about.
        existing = (
            spark.read.option("mergeSchema", "true")
            .parquet(target_path)
            .withColumn("_src", F.lit(0))
        )
        # prune to touched partitions: tiny distinct list, broadcast semi join
        touched = updates.select(*partition_by).distinct()
        existing = existing.join(F.broadcast(touched), list(partition_by), "left_semi")
        merged = existing.unionByName(
            updates, allowMissingColumns=allow_schema_evolution
        )
    else:
        merged = updates
    out = latest_per_group(
        merged, keys=list(keys), order_col=order_col, tiebreak=["_src"]
    ).drop("_src")
    return _staged_overwrite(spark, target_path, out, partition_by, recovered=True)


def _file_sizes(spark: SparkSession, path: str) -> dict[str, int]:
    """One recursive Hadoop-FileSystem listing → {decoded URI path of
    each parquet file: bytes}. Goes through the FS API, not ``os``, so
    the same code paths work on HDFS/S3A mounts, and the whole table
    costs a single metadata pass instead of one listing per partition.
    Underscore/dot-prefixed work dirs (``_staging``, ``_trash``) are
    excluded, matching what Parquet readers see."""
    fs, jvm = _hadoop_fs(spark, path)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(path)):
        return {}
    root = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(path)).toUri().getPath()
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(path), True)
    sizes: dict[str, int] = {}
    while it.hasNext():
        st = it.next()
        fp = st.getPath().toUri().getPath()
        rel = fp[len(root):].lstrip("/")
        if not fp.endswith(".parquet") or any(
            seg.startswith(("_", ".")) for seg in rel.split("/")
        ):
            continue
        sizes[fp] = st.getLen()
    return sizes


#: Strips "scheme:" and an optional "//authority" from a URI, leaving
#: the absolute filesystem path — the form ``Path.toUri().getPath()``
#: returns, so the two sides of the file-size join agree.
_URI_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?"


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

    Partition identity is derived from the DATA, not from parsing
    directory names (ADVICE r2): each row is tagged with its source file
    (``input_file_name``), file bytes come from one recursive FS
    listing, and bytes-per-partition is a groupBy on the partition
    columns as Spark actually read them — so NULL partitions
    (``__HIVE_DEFAULT_PARTITION__``) and values whose directory form
    differs from a string cast are compacted, not silently skipped, and
    the returned plan can never claim a partition the job didn't touch.
    Partition-column type inference is disabled for the rewrite so
    values round-trip byte-identically (``site=00123`` stays ``00123``,
    not int 123); data-column types are untouched.

    Each partition's row set is hashed into ceil(bytes / target)
    buckets (content hash — deterministic, no RNG); one repartition on
    (partition cols, bucket) rewrites every partition in parallel — no
    per-partition driver loop, 100k partitions is one shuffle. The
    rewrite goes through ``_staged_overwrite`` (write staged, publish
    by rename), so a crash never leaves a half-compacted table.
    Returns {partition_value: files_planned} (a bucket-to-task hash
    collision can merge two buckets of the same partition into one
    file — fewer, larger files, never lost rows). Content is
    row-identical; only layout changes — asserted by the round-trip
    test. Transactional formats run this as OPTIMIZE; the logic is the
    same."""
    from functools import reduce

    # recover first, for the same plan-staleness reason as merge_upsert
    _clear_work_dirs(spark, path)
    sizes = _file_sizes(spark, path)
    if not sizes:
        return {}
    files_df = spark.createDataFrame(
        list(sizes.items()), "_path string, _bytes long"
    )

    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    infer_prev = spark.conf.get(infer_key, "true")
    spark.conf.set(infer_key, "false")
    try:
        # url_decode is form-decoding ('+' → space), but the Hadoop-side
        # keys in _file_sizes keep a literal '+' (ADVICE r4): pre-encode
        # '+' as %2B so only percent-escapes decode and '+' round-trips.
        table = spark.read.parquet(path).withColumn(
            "_path",
            F.url_decode(
                F.regexp_replace(
                    F.regexp_replace(F.input_file_name(), _URI_SCHEME_RE, ""),
                    r"\+",
                    "%2B",
                )
            ),
        )
        data_cols = [
            c for c in table.columns if c not in partition_by and c != "_path"
        ]
        part_nf = (
            table.select(*partition_by, "_path")
            .dropDuplicates(["_path"])
            .join(F.broadcast(files_df), "_path")
            .groupBy(*partition_by)
            .agg(F.sum("_bytes").alias("_bytes"))
            .select(
                *partition_by,
                F.greatest(
                    F.lit(1), F.ceil(F.col("_bytes") / F.lit(target_file_bytes))
                ).cast("int").alias("_nf"),
            )
        )
        # one driver-side row per live partition: bounded metadata, used
        # for the shuffle width and the returned plan
        nf_rows = part_nf.collect()
        if not nf_rows:
            return {}
        total = sum(r["_nf"] for r in nf_rows)
        t, p = table.alias("t"), part_nf.alias("p")
        cond = reduce(
            lambda a, b: a & b,
            [
                F.col(f"t.{k}").eqNullSafe(F.col(f"p.{k}"))  # NULL partitions match
                for k in partition_by
            ],
        )
        out = (
            t.join(F.broadcast(p), cond)
            .select("t.*", "p._nf")
            .withColumn("_b", F.pmod(F.xxhash64(*data_cols), F.col("_nf")))
            .repartition(total, *partition_by, "_b")
            .drop("_b", "_nf", "_path")
        )
        _staged_overwrite(spark, path, out, partition_by, recovered=True)
    finally:
        spark.conf.set(infer_key, infer_prev)
    null_label = "__HIVE_DEFAULT_PARTITION__"
    return {
        "/".join(null_label if r[k] is None else str(r[k]) for k in partition_by):
            r["_nf"]
        for r in sorted(
            nf_rows, key=lambda r: tuple(str(r[k]) for k in partition_by)
        )
    }
