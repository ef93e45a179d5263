"""Snapshot-versioned tables: time travel, copy-on-write inheritance,
partition deletion, and idempotent re-merge."""

from __future__ import annotations

import datetime as dt

import pytest

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.versioned import (
    merge_version,
    read_version,
    versions,
    write_version,
    _read_manifest,
)

UTC = dt.timezone.utc


def ts(h):
    return dt.datetime(2025, 4, 1, h, tzinfo=UTC)


SCHEMA = "site string, ts_utc timestamp, val double, ingested_at timestamp"
ING0 = dt.datetime(2025, 4, 2, 0, tzinfo=UTC)
ING1 = ING0 + dt.timedelta(hours=1)


def _snap(spark, root, version=None):
    return {
        (r.site, r.ts_utc.hour): r.val
        for r in read_version(spark, root, version).collect()
    }


@pytest.fixture()
def root(spark, tmp_path):
    root = str(tmp_path / "table")
    base = spark.createDataFrame(
        [
            ("alpha", ts(0), 1.0, ING0),
            ("alpha", ts(1), 2.0, ING0),
            ("beta", ts(0), 3.0, ING0),
        ],
        SCHEMA,
    )
    assert write_version(spark, root, base) == 1
    return root


def test_time_travel_reads_are_stable(spark, root):
    v1 = _snap(spark, root, 1)
    upd = spark.createDataFrame([("alpha", ts(1), 20.0, ING1)], SCHEMA)
    v2 = merge_version(spark, root, upd, keys=["site", "ts_utc"],
                       order_col="ingested_at")
    assert v2 == 2
    # latest sees the update; v1 still reads the original bytes
    assert _snap(spark, root)[("alpha", 1)] == 20.0
    assert _snap(spark, root, 1) == v1
    assert versions(root) == [1, 2]


def test_untouched_partitions_inherited_not_copied(spark, root):
    upd = spark.createDataFrame([("alpha", ts(2), 9.0, ING1)], SCHEMA)
    merge_version(spark, root, upd, keys=["site", "ts_utc"],
                  order_col="ingested_at")
    m2 = _read_manifest(root, 2)
    assert m2["alpha"] == "v2"  # rewritten
    assert m2["beta"] == "v1"  # shared by reference — no copy
    assert _snap(spark, root)[("beta", 0)] == 3.0


def test_stale_update_does_not_regress(spark, root):
    stale = spark.createDataFrame(
        [("alpha", ts(0), -1.0, ING0 - dt.timedelta(days=1))], SCHEMA
    )
    merge_version(spark, root, stale, keys=["site", "ts_utc"],
                  order_col="ingested_at")
    assert _snap(spark, root)[("alpha", 0)] == 1.0


def test_new_partition_appears(spark, root):
    upd = spark.createDataFrame([("gamma", ts(0), 7.0, ING1)], SCHEMA)
    merge_version(spark, root, upd, keys=["site", "ts_utc"],
                  order_col="ingested_at")
    snap = _snap(spark, root)
    assert snap[("gamma", 0)] == 7.0
    assert snap[("alpha", 0)] == 1.0


def test_merge_then_read_matches_manual_merge(spark, root):
    upd = spark.createDataFrame(
        [("alpha", ts(1), 20.0, ING1), ("beta", ts(5), 8.0, ING1)], SCHEMA
    )
    merge_version(spark, root, upd, keys=["site", "ts_utc"],
                  order_col="ingested_at")
    assert _snap(spark, root) == {
        ("alpha", 0): 1.0,
        ("alpha", 1): 20.0,
        ("beta", 0): 3.0,
        ("beta", 5): 8.0,
    }


def test_snapshot_diff_classifies_changes(spark, root):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.versioned import (
        snapshot_diff,
    )

    upd = spark.createDataFrame(
        [
            ("alpha", ts(1), 20.0, ING1),   # update
            ("gamma", ts(0), 7.0, ING1),    # insert (new partition)
        ],
        SCHEMA,
    )
    merge_version_kwargs = dict(keys=["site", "ts_utc"], order_col="ingested_at")
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.versioned import (
        merge_version,
    )

    merge_version(spark, root, upd, **merge_version_kwargs)
    diff = {
        (r.site, r.ts_utc.hour): r.change
        for r in snapshot_diff(
            spark, root, 1, 2, keys=["site", "ts_utc"]
        ).collect()
    }
    assert diff == {("alpha", 1): "update", ("gamma", 0): "insert"}


def test_merge_version_null_and_escaped_partition_values(spark, tmp_path):
    # ADVICE r4 low: merge_version compared raw str(value) against
    # Hive-escaped directory names, so NULL partitions (written as
    # __HIVE_DEFAULT_PARTITION__) and values Spark escapes (':') never
    # matched the written set — fresh partitions dropped out of the
    # manifest and later snapshots silently lost their rows.
    root = str(tmp_path / "table")
    base = spark.createDataFrame(
        [
            (None, ts(0), 1.0, ING0),        # NULL partition value
            ("a:b", ts(0), 2.0, ING0),       # ':' is Hive-escaped to %3A
            ("plain", ts(0), 3.0, ING0),
        ],
        SCHEMA,
    )
    assert write_version(spark, root, base) == 1

    upd = spark.createDataFrame(
        [(None, ts(1), 10.0, ING1), ("a:b", ts(0), 20.0, ING1)], SCHEMA
    )
    v2 = merge_version(spark, root, upd, keys=["site", "ts_utc"],
                       order_col="ingested_at")
    assert v2 == 2

    m2 = _read_manifest(root, 2)
    assert m2["__HIVE_DEFAULT_PARTITION__"] == "v2"
    assert m2["a%3Ab"] == "v2"
    assert m2["plain"] == "v1"  # untouched, inherited

    snap = {
        (r.site, r.ts_utc.hour): r.val
        for r in read_version(spark, root, 2).collect()
    }
    assert snap == {
        (None, 0): 1.0,
        (None, 1): 10.0,
        ("a:b", 0): 20.0,
        ("plain", 0): 3.0,
    }
    # time travel still resolves v1 with the unescaped column values
    snap1 = {
        (r.site, r.ts_utc.hour): r.val
        for r in read_version(spark, root, 1).collect()
    }
    assert snap1 == {(None, 0): 1.0, ("a:b", 0): 2.0, ("plain", 0): 3.0}


def test_crash_before_manifest_leaves_previous_version_readable(spark, root, monkeypatch):
    # The manifest write IS the commit: killing the writer after the
    # data-file job but before the manifest publish must leave the
    # latest committed version fully readable, and the next commit must
    # succeed (the orphaned data dir is overwritten, not tripped over).
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import versioned

    before_versions = versions(root)
    before = _snap(spark, root)

    def crash(*args, **kwargs):
        raise RuntimeError("simulated crash before manifest publish")

    monkeypatch.setattr(versioned, "_write_manifest", crash)
    upd = spark.createDataFrame([("alpha", ts(1), 99.0, ING1)], SCHEMA)
    kw = dict(keys=["site", "ts_utc"], order_col="ingested_at")
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_version(spark, root, upd, **kw)
    assert versions(root) == before_versions  # nothing committed
    assert _snap(spark, root) == before       # old snapshot intact
    monkeypatch.undo()
    ver = merge_version(spark, root, upd, **kw)
    assert versions(root)[-1] == ver
    assert _snap(spark, root)[("alpha", 1)] == 99.0


def test_vacuum_keeps_surviving_reads_identical(spark, tmp_path):
    import os

    import pytest as _pt

    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.versioned import (
        merge_version,
        read_version,
        vacuum_versions,
        versions,
    )

    root = str(tmp_path / "vt")
    base = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 11.0), ("b", 1, 20.0)],
        "site string, k int, v double",
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.versioned import (
        write_version,
    )

    write_version(spark, root, base)  # v1
    merge_version(
        spark, root,
        spark.createDataFrame([("a", 2, 12.0)], "site string, k int, v double"),
        keys=["site", "k"], order_col="v",
    )  # v2 rewrites a; b inherited from v1
    merge_version(
        spark, root,
        spark.createDataFrame([("b", 9, 21.0)], "site string, k int, v double"),
        keys=["site", "k"], order_col="v",
    )  # v3 rewrites b
    # crashed-commit garbage: data written, manifest never published
    os.makedirs(os.path.join(root, "data", "v99", "site=zz"))

    before = sorted(map(tuple, read_version(spark, root).collect()))
    v2_before = sorted(map(tuple, read_version(spark, root, 2).collect()))
    stats = vacuum_versions(root, keep_last=2)
    assert versions(root) == [2, 3]
    assert stats["versions_dropped"] == 1 and stats["dirs_deleted"] >= 1
    # v2 rewrote 'a' but still references v1's copy of 'b', so v1's data
    # dir partially survives — every surviving read must be byte-identical
    assert sorted(map(tuple, read_version(spark, root).collect())) == before
    assert sorted(map(tuple, read_version(spark, root, 2).collect())) == v2_before
    assert not os.path.isdir(os.path.join(root, "data", "v99"))
    with _pt.raises(FileNotFoundError):
        read_version(spark, root, 1)


def test_vacuum_refuses_rootless_table(spark, tmp_path):
    import os

    import pytest as _pt

    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.versioned import (
        vacuum_versions,
    )

    root = str(tmp_path / "novers")
    os.makedirs(os.path.join(root, "data", "v1", "site=a"))
    with _pt.raises(FileNotFoundError):
        vacuum_versions(root)
    assert os.path.isdir(os.path.join(root, "data", "v1", "site=a"))
