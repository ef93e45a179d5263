"""Two-pass exact heavy hitters: output must equal the naive GROUP BY
filtered at n/k, under any partitioning, despite order-dependent
Misra-Gries candidate sets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.heavy import (
    heavy_hitters,
)


def _exact(df, col, k):
    n = df.count()
    return {
        (r.item, r.n)
        for r in df.select(F.col(col).cast("string").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > n / k)
        .collect()
    }


def test_heavy_hitters_match_naive_groupby(spark):
    # skewed fixture: 'hot' = 40%, 'warm' = 15%, long tail of uniques
    rows = (
        [("hot",)] * 400 + [("warm",)] * 150 + [(f"u{i}",) for i in range(450)]
    )
    df = spark.createDataFrame(rows, "w string")
    got = {(r.item, r.n_occurrences) for r in heavy_hitters(df, "w", k=10).collect()}
    assert got == _exact(df, "w", 10)
    assert ("hot", 400) in got and ("warm", 150) in got
    assert all(not i.startswith("u") for i, _ in got)


@pytest.mark.parametrize("parts", [1, 7, 32])
def test_heavy_hitters_partition_invariant(spark, parts):
    rows = [("a",)] * 300 + [("b",)] * 120 + [(f"t{i % 97}",) for i in range(580)]
    df = spark.createDataFrame(rows, "w string").repartition(parts)
    got = {(r.item, r.n_occurrences) for r in heavy_hitters(df, "w", k=8).collect()}
    assert got == _exact(df, "w", 8)


def test_heavy_hitters_threshold_strict_and_k_validated(spark):
    # exactly n/k occurrences must NOT qualify (strict >)
    df = spark.createDataFrame([("x",)] * 5 + [(f"y{i}",) for i in range(5)], "w string")
    got = heavy_hitters(df, "w", k=2).collect()  # threshold = 5, x has 5
    assert got == []
    with pytest.raises(ValueError):
        heavy_hitters(df, "w", k=1)


def test_heavy_hitters_null_and_order(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50 + [(None,)] * 100, "w string"
    )
    rows = heavy_hitters(df, "w", k=3).collect()
    # NULLs dropped (not a heavy hitter), ties broken item asc
    assert [(r.item, r.n_occurrences) for r in rows] == [("a", 50), ("b", 50)]


@pytest.mark.slow
def test_weighted_mg_update_matches_exact_on_random_streams(spark):
    # property guard for the r6 weighted-MG rewrite: for arbitrary
    # value streams and small k, the two-pass operator must still emit
    # EXACTLY the items above n/k with exact counts (the MG summary is
    # only a candidate superset — this exercises the weighted drain
    # path where batch value_counts folds whole (item, weight) pairs)
    from collections import Counter

    from hypothesis import HealthCheck, given, settings, strategies as st

    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.heavy import (
        heavy_hitters,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        stream=st.lists(
            st.sampled_from([f"w{i}" for i in range(12)]),
            min_size=1,
            max_size=300,
        ),
        k=st.integers(min_value=2, max_value=6),
    )
    def run(stream, k):
        df = spark.createDataFrame(
            [(s,) for s in stream], "item string"
        ).repartition(5)
        got = {
            (r.item, r.n_occurrences)
            for r in heavy_hitters(df, "item", k=k).collect()
        }
        counts = Counter(stream)
        want = {
            (item, c)
            for item, c in counts.items()
            if c > len(stream) / k
        }
        assert got == want, (stream, k, got, want)

    run()
