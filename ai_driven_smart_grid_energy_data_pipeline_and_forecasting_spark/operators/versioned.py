"""Snapshot-versioned tables: copy-on-write partitions + per-version
manifests — time travel without Delta Lake.

Reproducible training runs need pinned inputs: "train on corpus
@v12" must read the same bytes next month even though ingest kept
merging. Transactional formats (Delta/Iceberg) provide this via
snapshot manifests; this module implements the same shape on plain
Parquet, scoped to the harness container:

    <root>/data/v<N>/<part>=<val>/*.parquet   -- only REWRITTEN partitions
    <root>/manifests/v<N>.json                -- partition -> version map

A new version rewrites only the partitions its updates touch; every
other partition entry is inherited from the previous manifest and its
files are never copied — commit cost is O(touched), storage is
shared across versions (copy-on-write at partition granularity; real
formats refine this to file granularity, same design). Reads resolve
one manifest and union per-partition scans, so time travel is free at
plan time: each scan is still partition-pruned Parquet.

Versions are dense integers (no wall-clock anywhere — deterministic
and replay-safe). Concurrency control is out of scope (single-writer
harness); a production port would CAS the manifest pointer.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import merge_frames


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "manifests")


def versions(root: str) -> list[int]:
    """All committed versions, ascending."""
    d = _manifest_dir(root)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[1:-5]) for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    )


def _read_manifest(root: str, version: int) -> dict[str, str]:
    with open(os.path.join(_manifest_dir(root), f"v{version}.json")) as fh:
        return json.load(fh)["partitions"]


def _write_manifest(root: str, version: int, partitions: dict[str, str]) -> None:
    os.makedirs(_manifest_dir(root), exist_ok=True)
    path = os.path.join(_manifest_dir(root), f"v{version}.json")
    with open(path, "w") as fh:
        json.dump({"version": version, "partitions": partitions}, fh, sort_keys=True)


def _part_path(root: str, data_version: str, part_key: str, part_val: str) -> str:
    return os.path.join(root, "data", data_version, f"{part_key}={part_val}")


def write_version(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    partition_by: str = "site",
) -> int:
    """Commit ``df`` as the next full snapshot (initial load / full
    rebuild). Every partition is written under this version."""
    ver = (versions(root)[-1] + 1) if versions(root) else 1
    vtag = f"v{ver}"
    manifest: dict[str, str] = {}
    part_vals = [r[0] for r in df.select(partition_by).distinct().collect()]
    for val in sorted(map(str, part_vals)):
        part = df.filter(F.col(partition_by) == val).drop(partition_by)
        part.write.mode("overwrite").parquet(_part_path(root, vtag, partition_by, val))
        manifest[val] = vtag
    _write_manifest(root, ver, manifest)
    return ver


def read_version(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    partition_by: str = "site",
) -> DataFrame:
    """Read a snapshot (default: latest). Each partition scans its
    owning version's files — time travel is manifest resolution, not
    data copying."""
    vs = versions(root)
    if not vs:
        raise FileNotFoundError(f"no versions at {root}")
    ver = vs[-1] if version is None else version
    manifest = _read_manifest(root, ver)
    parts = []
    for val in sorted(manifest):
        p = spark.read.parquet(
            _part_path(root, manifest[val], partition_by, val)
        ).withColumn(partition_by, F.lit(val))
        parts.append(p)
    if not parts:
        raise ValueError(f"version {ver} is empty")
    return reduce(lambda a, b: a.unionByName(b), parts)


def merge_version(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str,
    partition_by: str = "site",
) -> int:
    """Commit a new version by merging ``updates`` into the latest
    snapshot: touched partitions get merge-resolved (newest per key
    wins — same semantics as ``merge_upsert``) and rewritten under the
    new version; untouched partitions are INHERITED by manifest
    reference — their files are shared, not copied. A touched
    partition whose merge yields zero rows drops out of the manifest
    (partition deletion, which plain upsert cannot express)."""
    prev_manifest = _read_manifest(root, versions(root)[-1]) if versions(root) else {}
    ver = (versions(root)[-1] + 1) if versions(root) else 1
    vtag = f"v{ver}"

    touched = sorted(
        str(r[0]) for r in updates.select(partition_by).distinct().collect()
    )
    manifest = dict(prev_manifest)
    for val in touched:
        upd = updates.filter(F.col(partition_by) == val).drop(partition_by)
        if val in prev_manifest:
            cur = spark.read.parquet(
                _part_path(root, prev_manifest[val], partition_by, val)
            )
            merged = merge_frames(cur, upd, keys=[k for k in keys if k != partition_by],
                                  order_col=order_col)
        else:
            merged = upd.dropDuplicates([k for k in keys if k != partition_by])
        merged = merged.localCheckpoint(eager=True)
        if merged.isEmpty():
            manifest.pop(val, None)
            continue
        merged.write.mode("overwrite").parquet(
            _part_path(root, vtag, partition_by, val)
        )
        manifest[val] = vtag
    _write_manifest(root, ver, manifest)
    return ver


def snapshot_diff(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int,
    keys: Sequence[str],
    partition_by: str = "site",
) -> DataFrame:
    """Change-data-capture between two snapshots: one row per key that
    was inserted / deleted / updated, with both value structs. The
    audit/debug primitive versioning exists for ("what changed between
    the run that worked and the run that didn't").

    Plan: full outer join on the key columns; manifest-identical
    partitions (inherited by reference — the common case) could be
    skipped entirely at plan time, an optimization a file-level format
    gets for free; here both sides are partition-pruned scans and the
    join shuffles on the uniform natural key."""
    old = read_version(spark, root, from_version, partition_by)
    new = read_version(spark, root, to_version, partition_by)
    val_cols = [c for c in new.columns if c not in keys]
    o = old.select(
        *keys, F.struct(*val_cols).alias("old_val"), F.lit(1).alias("_o")
    )
    n = new.select(
        *keys, F.struct(*val_cols).alias("new_val"), F.lit(1).alias("_n")
    )
    j = o.join(n, list(keys), "full_outer")
    change = (
        F.when(F.col("_o").isNull(), "insert")
        .when(F.col("_n").isNull(), "delete")
        .when(F.col("old_val") != F.col("new_val"), "update")
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change", "old_val", "new_val")
        .orderBy(*keys)
    )
