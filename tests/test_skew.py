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
