"""Mergeable aggregate state: ⊕ must equal full recompute bit-exactly
for the algebraic measures and within sketch error for distinct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.aggstate import (
    aggregate_state,
    finalize_state,
    merge_aggregate_states,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
    load_table,
)

SF = "/root/testdata/sf0.001"
KEYS = ["event_type"]


@pytest.fixture(scope="module")
def ev(spark):
    return load_table(spark, "events", SF)


def _rollup(df):
    return {
        r.event_type: (r.n, r.sum_value, r.min_value, r.max_value)
        for r in finalize_state(
            aggregate_state(df, KEYS, "value"), KEYS
        ).collect()
    }


def test_three_way_merge_equals_full_recompute(ev):
    # arbitrary 3-way split by row hash — merged state must reproduce
    # the single-pass state exactly (decimal sums make this bit-exact,
    # not just approximately true)
    parts = [ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]
    merged = merge_aggregate_states(
        [aggregate_state(p, KEYS, "value") for p in parts], KEYS
    )
    got = {
        r.event_type: (r.n, r.sum_value, r.min_value, r.max_value)
        for r in finalize_state(merged, KEYS).collect()
    }
    assert got == _rollup(ev)


def test_merge_is_associative(ev):
    a = aggregate_state(ev.filter(F.col("event_id") % 2 == 0), KEYS, "value")
    b = aggregate_state(ev.filter(F.col("event_id") % 2 == 1), KEYS, "value")
    ab = merge_aggregate_states([a, b], KEYS)
    ba = merge_aggregate_states([b, a], KEYS)
    fa = sorted(map(tuple, finalize_state(ab, KEYS).collect()))
    fb = sorted(map(tuple, finalize_state(ba, KEYS).collect()))
    assert fa == fb


def test_merge_with_disjoint_keys_unions(spark):
    a = aggregate_state(
        spark.createDataFrame([("x", 1.0)], "k string, value double"),
        ["k"],
        "value",
    )
    b = aggregate_state(
        spark.createDataFrame([("y", 2.0), ("y", 4.0)], "k string, value double"),
        ["k"],
        "value",
    )
    rows = {
        r.k: (r.n, r.sum_value, r.avg_value)
        for r in finalize_state(
            merge_aggregate_states([a, b], ["k"]), ["k"]
        ).collect()
    }
    assert rows == {"x": (1, 1.0, 1.0), "y": (2, 6.0, 3.0)}


def test_hll_state_merges_to_union_estimate(ev):
    # sketch-union over a split must estimate the distinct count of
    # the union, not the sum of per-part distincts (users appear in
    # both halves — a naive sum would overcount heavily)
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    merged = merge_aggregate_states(
        [
            aggregate_state(half_a, KEYS, "value", "user_id"),
            aggregate_state(half_b, KEYS, "value", "user_id"),
        ],
        KEYS,
    )
    est = {
        r.event_type: r.approx_distinct
        for r in finalize_state(merged, KEYS).collect()
    }
    exact = {
        r.event_type: r.d
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for k, d in exact.items():
        assert abs(est[k] - d) <= max(0.1 * d, 2), (k, est[k], d)


def test_merge_requires_states(spark):
    with pytest.raises(ValueError):
        merge_aggregate_states([], ["k"])
