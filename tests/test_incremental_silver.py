"""Incremental silver maintenance: delta-touched (site, hour) groups
are recomputed in place and the result is row-identical to a full
recompute — including group DELETION, which a plain keyed merge cannot
express."""

from __future__ import annotations

import datetime as dt

import pytest

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.upsert import (
    merge_upsert,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.silver import (
    clean_to_hourly,
    incremental_silver_refresh,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.schemas import (
    RAW_WEATHER,
)

UTC = dt.timezone.utc


def ts(h, m=0):
    return dt.datetime(2025, 3, 1, h, m, tzinfo=UTC)


def key(site, h):
    # collected timestamps come back session-naive (UTC session)
    return (site, dt.datetime(2025, 3, 1, h))


ING0 = dt.datetime(2025, 3, 2, 0, 0, tzinfo=UTC)
ING1 = ING0 + dt.timedelta(hours=1)


def _base_rows():
    return [
        ("alpha", ts(0), 100.0, 10.0, 5.0, None, ING0),
        ("alpha", ts(1), 110.0, 11.0, 5.5, None, ING0),
        ("alpha", ts(2), 120.0, 12.0, 6.0, None, ING0),
        ("beta", ts(0), 50.0, 20.0, 3.0, None, ING0),
        ("gamma", ts(0), 60.0, 21.0, 2.0, None, ING0),  # single-group site
    ]


def _full(spark, bronze_path):
    return {
        (r.site, r.ts_utc): (r.ghi_wm2, r.temp_c, r.wind_mps)
        for r in clean_to_hourly(spark.read.parquet(bronze_path)).collect()
    }


def _silver(spark, silver_path):
    return {
        (r.site, r.ts_utc): (r.ghi_wm2, r.temp_c, r.wind_mps)
        for r in spark.read.parquet(silver_path).collect()
    }


@pytest.fixture()
def paths(spark, tmp_path):
    bronze_path = str(tmp_path / "bronze")
    silver_path = str(tmp_path / "silver")
    base = spark.createDataFrame(_base_rows(), RAW_WEATHER)
    merge_upsert(spark, bronze_path, base, keys=["site", "ts_utc"],
                 order_col="ingested_at")
    clean_to_hourly(spark.read.parquet(bronze_path)).write.partitionBy(
        "site"
    ).parquet(silver_path)
    return bronze_path, silver_path


def test_value_update_refreshes_only_touched_group(spark, paths):
    bronze_path, silver_path = paths
    delta = spark.createDataFrame(
        [("alpha", ts(1), 999.0, 19.0, 9.0, None, ING1)], RAW_WEATHER
    )
    incremental_silver_refresh(spark, bronze_path, silver_path, delta)
    got = _silver(spark, silver_path)
    assert got == _full(spark, bronze_path)
    assert got[key("alpha", 1)] == (999.0, 19.0, 9.0)
    assert got[key("alpha", 0)] == (100.0, 10.0, 5.0)  # untouched


def test_stale_delta_does_not_regress(spark, paths):
    bronze_path, silver_path = paths
    stale = spark.createDataFrame(
        [("alpha", ts(1), 1.0, 1.0, 1.0, None, ING0 - dt.timedelta(hours=5))],
        RAW_WEATHER,
    )
    incremental_silver_refresh(spark, bronze_path, silver_path, stale)
    got = _silver(spark, silver_path)
    assert got == _full(spark, bronze_path)
    assert got[key("alpha", 1)] == (110.0, 11.0, 5.5)


def test_invalidation_deletes_group(spark, paths):
    bronze_path, silver_path = paths
    # newer ingest makes hour 2 invalid (ghi < 0) -> group must vanish
    delta = spark.createDataFrame(
        [("alpha", ts(2), -1.0, 12.0, 6.0, None, ING1)], RAW_WEATHER
    )
    incremental_silver_refresh(spark, bronze_path, silver_path, delta)
    got = _silver(spark, silver_path)
    assert got == _full(spark, bronze_path)
    assert key("alpha", 2) not in got
    assert key("alpha", 0) in got


def test_site_vanishes_when_only_group_invalidated(spark, paths):
    bronze_path, silver_path = paths
    delta = spark.createDataFrame(
        [("gamma", ts(0), None, 21.0, 2.0, None, ING1)], RAW_WEATHER
    )
    incremental_silver_refresh(spark, bronze_path, silver_path, delta)
    got = _silver(spark, silver_path)
    assert got == _full(spark, bronze_path)
    assert all(site != "gamma" for site, _ in got)


def test_new_site_and_new_hour_insert(spark, paths):
    bronze_path, silver_path = paths
    delta = spark.createDataFrame(
        [
            ("delta", ts(4), 70.0, 15.0, 4.0, None, ING1),
            ("beta", ts(5), 55.0, 22.0, 3.3, None, ING1),
        ],
        RAW_WEATHER,
    )
    incremental_silver_refresh(spark, bronze_path, silver_path, delta)
    got = _silver(spark, silver_path)
    assert got == _full(spark, bronze_path)
    assert key("delta", 4) in got and key("beta", 5) in got


@pytest.mark.slow
def test_refresh_is_idempotent(spark, paths):
    bronze_path, silver_path = paths
    delta = spark.createDataFrame(
        [("alpha", ts(1), 999.0, 19.0, 9.0, None, ING1)], RAW_WEATHER
    )
    incremental_silver_refresh(spark, bronze_path, silver_path, delta)
    once = _silver(spark, silver_path)
    incremental_silver_refresh(spark, bronze_path, silver_path, delta)
    assert _silver(spark, silver_path) == once
