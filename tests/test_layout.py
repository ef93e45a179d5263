"""Bucketed layout: the join over identically-bucketed tables must
plan WITHOUT a shuffle Exchange — the write-once-join-many contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.layout import (
    colocated_join,
    write_bucketed,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    o = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_totalprice")
    li = load_table(spark, "lineitem", SF_DIR).select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(o, "t_orders_b", ["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"])
    write_bucketed(li, "t_lineitem_b", ["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"])
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    lt, rt = bucketed
    # force the sort-merge path so the demonstration isn't voided by a
    # broadcast (tiny test tables would otherwise broadcast)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, lt, rt, ["o_orderkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, (
            "bucketed-to-bucketed join must not shuffle:\n" + plan
        )
        # and the result matches the plain (shuffling) join
        n_bucketed = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    o = load_table(spark, "orders", SF_DIR)
    li = load_table(spark, "lineitem", SF_DIR)
    n_plain = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert n_bucketed == n_plain


def test_bucket_metadata_in_catalog(spark, bucketed):
    lt, _ = bucketed
    desc = {r.col_name: r.data_type for r in spark.sql(f"DESCRIBE EXTENDED {lt}").collect()}
    assert desc.get("Num Buckets") == "4", desc
    assert "o_orderkey" in desc.get("Bucket Columns", ""), desc
