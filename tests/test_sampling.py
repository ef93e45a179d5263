"""Deterministic hash sampling/splitting: coverage, stability, and the
nested-sample / boundary-move properties the design exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
    stratified_hash_sample,
    with_split,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
    load_table,
)

SF = "/root/testdata/sf0.001"
W = {"train": 0.9, "val": 0.05, "test": 0.05}


def test_split_covers_every_row(spark):
    docs = load_table(spark, "documents", SF)
    out = with_split(docs, "doc_id", W)
    assert out.filter(F.col("split").isNull()).count() == 0
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    # 90/5/5 within sampling noise on 500 docs
    assert counts["train"] > 0.8 * docs.count()
    assert 0 < counts.get("val", 0) < 0.15 * docs.count()


def test_split_is_deterministic(spark):
    docs = load_table(spark, "documents", SF)
    a = {r.doc_id: r.split for r in with_split(docs, "doc_id", W).collect()}
    b = {
        r.doc_id: r.split
        for r in with_split(docs.repartition(7), "doc_id", W).collect()
    }
    assert a == b


def test_split_boundary_move_is_monotone(spark):
    # growing train only moves the adjacent boundary: every train row
    # stays train when train grows
    docs = load_table(spark, "documents", SF)
    small = with_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    big = with_split(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    small_train = {r.doc_id for r in small.filter(F.col("split") == "train").collect()}
    big_train = {r.doc_id for r in big.filter(F.col("split") == "train").collect()}
    assert small_train <= big_train


def test_stratified_sample_nested_and_scoped(spark):
    docs = load_table(spark, "documents", SF)
    lo = stratified_hash_sample(docs, "doc_id", "source", {"src0": 0.2})
    hi = stratified_hash_sample(docs, "doc_id", "source", {"src0": 0.5})
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    assert lo_ids <= hi_ids  # nested-sample property
    # unlisted strata never leak into the sample
    assert hi.filter(F.col("source") != "src0").count() == 0
