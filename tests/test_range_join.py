"""Bucketized range join: exact equivalence to the naive theta join on
every boundary case, plan contract (hash join, never nested-loop), and
the loud replication guard."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.range_join import (
    range_join,
    range_join_ts,
)


def _points(spark):
    rows = [
        ("u1", -7.5),
        ("u1", 0.0),
        ("u1", 5.0),   # exactly lo of [5,10): included
        ("u1", 10.0),  # exactly hi of [5,10): excluded half-open
        ("u2", 5.0),   # same value, other key
        ("u2", 99.0),  # matches nothing
        ("u3", 3.3),   # key absent from interval side
    ]
    return spark.createDataFrame(rows, "k string, v double")


def _intervals(spark):
    rows = [
        ("u1", -10.0, 0.5, "neg"),
        ("u1", 5.0, 10.0, "mid"),
        ("u1", 9.0, 30.0, "wide"),   # overlaps "mid": v=5? no; v=10 yes
        ("u2", 4.0, 6.0, "u2band"),
        ("u2", 200.0, 300.0, "empty"),
    ]
    return spark.createDataFrame(rows, "k string, lo double, hi double, tag string")


def _naive(points, intervals, equi, closed_hi):
    # faithful all-pairs oracle in pure python
    p = [r.asDict() for r in points.collect()]
    iv = [r.asDict() for r in intervals.collect()]
    res = []
    for a in p:
        for b in iv:
            if equi and any(a[k] != b[k] for k in equi):
                continue
            hi_ok = a["v"] <= b["hi"] if closed_hi else a["v"] < b["hi"]
            if a["v"] >= b["lo"] and hi_ok:
                res.append((a["k"], a["v"], b["lo"], b["hi"], b["tag"]))
    return sorted(res)


@pytest.mark.parametrize("closed_hi", [False, True])
@pytest.mark.parametrize("bin_width", [0.7, 5.0, 64.0])
def test_matches_naive_theta_join(spark, closed_hi, bin_width):
    points, intervals = _points(spark), _intervals(spark)
    got = range_join(
        points, intervals, "v", "lo", "hi",
        bin_width=bin_width, equi_keys=("k",), closed_hi=closed_hi,
    )
    rows = sorted((r.k, r.v, r.lo, r.hi, r.tag) for r in got.collect())
    assert rows == _naive(points, intervals, ["k"], closed_hi)


def test_no_equi_keys_pure_range(spark):
    points, intervals = _points(spark), _intervals(spark)
    got = range_join(
        points.select("v").distinct(),
        intervals.select("lo", "hi", "tag"),
        "v", "lo", "hi", bin_width=3.0,
    )
    want = _naive(
        _points(spark).select(F.lit("x").alias("k"), "v").distinct(),
        _intervals(spark).select(F.lit("x").alias("k"), "lo", "hi", "tag"),
        [], False,
    )
    rows = sorted(("x", r.v, r.lo, r.hi, r.tag) for r in got.collect())
    assert rows == sorted(want)


def test_point_matches_once_per_interval(spark):
    # an interval spanning many bins must not duplicate matches
    points = spark.range(1).select(F.lit(50.0).alias("v"))
    intervals = spark.createDataFrame([(0.0, 100.0, "all")], "lo double, hi double, tag string")
    got = range_join(points, intervals, "v", "lo", "hi", bin_width=1.0)
    assert got.count() == 1


def test_replication_guard_raises(spark):
    points = spark.range(1).select(F.lit(1.0).alias("v"))
    intervals = spark.createDataFrame([(0.0, 1e9, "huge")], "lo double, hi double, tag string")
    with pytest.raises(RuntimeError, match="max_bins_per_interval"):
        range_join(points, intervals, "v", "lo", "hi", bin_width=1.0)


def test_plan_is_hash_join_not_nested_loop(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got = range_join(
            _points(spark), _intervals(spark), "v", "lo", "hi",
            bin_width=5.0, equi_keys=("k",),
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_timestamp_wrapper(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    pts = spark.createDataFrame(
        [("u1", t0 + dt.timedelta(minutes=m)) for m in (0, 30, 60, 90, 200)],
        "k string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [("u1", t0, t0 + dt.timedelta(hours=1), "s1"),
         ("u1", t0 + dt.timedelta(hours=3), t0 + dt.timedelta(hours=4), "s2")],
        "k string, lo timestamp, hi timestamp, tag string",
    )
    got = range_join_ts(pts, iv, "ts", "lo", "hi", 1800, equi_keys=("k",))
    tags = sorted((r.ts.minute + 60 * r.ts.hour, r.tag) for r in got.collect())
    # closed ends: minute 0, 30 and 60 (=exact hi) in s1; 200min in s2
    assert tags == [(0, "s1"), (30, "s1"), (60, "s1"), (200, "s2")]


def test_auto_bin_width_matches_explicit(spark):
    points, intervals = _points(spark), _intervals(spark)
    auto = range_join(points, intervals, "v", "lo", "hi", equi_keys=("k",))
    rows = sorted((r.k, r.v, r.lo, r.hi, r.tag) for r in auto.collect())
    assert rows == _naive(points, intervals, ["k"], False)


def test_auto_bin_width_empty_intervals(spark):
    points = _points(spark)
    empty = _intervals(spark).filter("lo > 1e18")
    assert range_join(points, empty, "v", "lo", "hi").count() == 0


def test_inverted_interval_refused(spark):
    points = spark.range(1).select(F.lit(1.0).alias("v"))
    bad = spark.createDataFrame(
        [(86400000.0, 0.0, "swapped")], "lo double, hi double, tag string"
    )
    with pytest.raises(RuntimeError, match="inverted"):
        range_join(points, bad, "v", "lo", "hi", bin_width=60.0)


def test_validate_intervals_false_skips_prescan(spark):
    # explicit width + opt-out: no eager action on the interval side
    points, intervals = _points(spark), _intervals(spark)
    got = range_join(
        points, intervals, "v", "lo", "hi",
        bin_width=5.0, equi_keys=("k",), validate_intervals=False,
    )
    rows = sorted((r.k, r.v, r.lo, r.hi, r.tag) for r in got.collect())
    assert rows == _naive(points, intervals, ["k"], False)
