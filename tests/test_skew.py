"""salted_agg must be salt-invariant: identical results to the plain
groupBy for every decomposable kind, at any salt width."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.skew import (
    salted_agg,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"

METRICS = {
    "n": ("value", "count"),
    "sum_value": ("value", "sum"),
    "min_value": ("value", "min"),
    "max_value": ("value", "max"),
    "avg_value": ("value", "avg"),
}


@pytest.mark.parametrize("n_salt", [1, 16])
def test_salted_matches_plain_groupby(spark, n_salt):
    ev = load_table(spark, "events", SF_DIR)
    got = {
        r.event_type: r
        for r in salted_agg(ev, ["event_type"], METRICS, n_salt=n_salt).collect()
    }
    want = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.avg("value").alias("avg_value"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k].n == want[k].n
        assert got[k].min_value == want[k].min_value
        assert got[k].max_value == want[k].max_value
        assert abs(got[k].sum_value - want[k].sum_value) < 1e-6
        assert abs(got[k].avg_value - want[k].avg_value) < 1e-9


def test_salted_rejects_nondecomposable(spark):
    ev = load_table(spark, "events", SF_DIR)
    with pytest.raises(ValueError):
        salted_agg(ev, ["event_type"], {"bad": ("value", "median")})


# ---------------------------------------------------------------- joins


def _skewed_fixture(spark, n_large=20_000, n_dim=200):
    """90%-one-key fact ⋈ dim — the shuffle-join pathology AQE can't
    always save. key 7 holds 90% of the fact."""
    from pyspark.sql import functions as F

    large = spark.range(n_large).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % n_dim)
        .cast("long")
        .alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return large, dim


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


@pytest.mark.parametrize("hot", [None, [7]])
def test_salted_join_matches_plain_inner(spark, hot):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.skew import (
        salted_join,
    )

    large, dim = _skewed_fixture(spark)
    got = salted_join(large, dim, ["k"], n_salt=8, hot_keys=hot)
    want = large.join(dim, ["k"])
    assert _rows(got) == _rows(want)


def test_salted_join_left_preserves_unmatched_and_null_keys(spark):
    from pyspark.sql import functions as F

    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.skew import (
        salted_join,
    )

    large = spark.createDataFrame(
        [(7, 1), (7, 2), (None, 3), (999, 4), (2, 5)], "k long, v long"
    )
    dim = spark.createDataFrame([(7, "hot"), (2, "cold")], "k long, name string")
    got = salted_join(large, dim, ["k"], n_salt=4, how="left", hot_keys=[7])
    want = large.join(dim, ["k"], "left")
    assert _rows(got) == _rows(want)
    # NULL-key and unmatched rows survive exactly once
    assert sum(1 for r in got.collect() if r.k is None) == 1
    assert sum(1 for r in got.collect() if r.k == 999) == 1


def test_salted_join_refuses_right_and_full(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.skew import (
        salted_join,
    )

    large, dim = _skewed_fixture(spark, n_large=10, n_dim=5)
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(large, dim, ["k"], how=how)


def test_detect_hot_keys_finds_the_hot_key_only(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.skew import (
        detect_hot_keys,
    )

    large, _ = _skewed_fixture(spark)
    assert detect_hot_keys(large, "k", min_frac=0.5) == [7]
    # NULL keys never qualify
    null_heavy = spark.createDataFrame(
        [(None, 1)] * 9 + [(1, 1)], "k long, v long"
    )
    assert detect_hot_keys(null_heavy, "k", min_frac=0.5) == []
    with pytest.raises(ValueError):
        detect_hot_keys(large, "k", min_frac=0.0)


def test_salted_join_spreads_the_hot_key_across_tasks(spark):
    # The point of the operator: with broadcast and AQE off, the plain
    # shuffle join lands every hot-key row in ONE task; the salted join
    # spreads them over n_salt tasks. Measured from the actual output
    # partition sizes, not inferred from the plan.
    from pyspark.sql import functions as F

    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.skew import (
        salted_join,
    )

    conf = spark.conf
    prev_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = conf.get("spark.sql.adaptive.enabled")
    prev_sp = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    # session default is 4 shuffle partitions — too few for 8 salt
    # buckets to land on distinct tasks; widen for the spread check
    conf.set("spark.sql.shuffle.partitions", "64")
    try:
        large, dim = _skewed_fixture(spark)
        n_salt = 8

        def max_task_rows(df):
            sizes = (
                df.withColumn("_p", F.spark_partition_id())
                .groupBy("_p")
                .count()
                .collect()
            )
            return max(r["count"] for r in sizes)

        def hot_task_spread(df):
            sizes = (
                df.filter(F.col("k") == 7)
                .withColumn("_p", F.spark_partition_id())
                .groupBy("_p")
                .count()
                .collect()
            )
            return len(sizes)

        plain = large.join(dim.hint("shuffle_hash"), ["k"])
        salted = salted_join(large, dim, ["k"], n_salt=n_salt, hot_keys=[7])
        plain_max = max_task_rows(plain)
        salted_max = max_task_rows(salted)
        # hot key = 18k of 20k rows: plain puts them all in one task...
        assert hot_task_spread(plain) == 1 and plain_max >= 18_000
        # ...salted spreads them over multiple tasks (up to n_salt, less
        # when salt buckets hash-collide into one shuffle partition),
        # and no task holds more than half the plain straggler
        assert hot_task_spread(salted) >= n_salt // 2
        assert salted_max <= plain_max / 2
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        conf.set("spark.sql.adaptive.enabled", prev_aqe)
        conf.set("spark.sql.shuffle.partitions", prev_sp)
