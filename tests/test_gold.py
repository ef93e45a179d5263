"""Gold layer: feature math, KPI clamps, seasonal-naive baseline,
grouped-map forecast plumbing, as-of join evaluation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.gold import (
    WIND_CAPACITY_MW,
    mart_features,
    mart_kpis,
    seasonal_naive_forecast,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.forecast import (
    sarimax_forecast,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.asof import (
    asof_join,
)

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def fact(spark):
    # 8 days of hourly data, 2 sites: a daily sine-ish profile via hour index
    rows = []
    base = dt.datetime(2025, 1, 1, tzinfo=UTC)
    for site in ["s1", "s2"]:
        for h in range(24 * 8):
            t = base + dt.timedelta(hours=h)
            ghi = max(0.0, 500.0 * (1 - abs(t.hour - 12) / 12) + (50 if site == "s2" else 0))
            rows.append((site, t, ghi, 10.0, 5.0 + (h % 24) / 10))
    return spark.createDataFrame(
        rows, "site STRING, ts_utc TIMESTAMP, ghi_wm2 DOUBLE, temp_c DOUBLE, wind_mps DOUBLE"
    )


def test_features_math(fact):
    feats = mart_features(fact)
    row = feats.filter((F.col("site") == "s1") & (F.hour("ts_utc") == 12)).first()
    assert row.ghi_kwh_m2 == pytest.approx(0.5)  # 500 W/m² × 1h = 0.5 kWh/m²
    assert row.pv_est_mwh == pytest.approx(0.5 * 0.2 * 10000 / 1000)  # 1.0 MWh
    assert row.wind_est_mwh <= WIND_CAPACITY_MW  # capacity cap


def test_kpis_in_domain(fact):
    kpis = mart_kpis(mart_features(fact))
    bad = kpis.filter(
        (F.col("pv_cf") < 0) | (F.col("pv_cf") > 1.2)
        | (F.col("wind_cf") < 0) | (F.col("wind_cf") > 1.2)
    ).count()
    assert bad == 0  # init.sql:83-86 CHECK domain


def test_seasonal_naive_h24_equals_lag(fact):
    feats = mart_features(fact)
    fc = seasonal_naive_forecast(feats, horizons=[24])
    # h=24 forecast for target ts T must equal actual at T-24h
    joined = (
        fc.filter(F.col("var") == "pv")
        .alias("f")
        .join(
            feats.select(
                "site",
                (F.col("ts_utc") + F.expr("INTERVAL 24 HOURS")).alias("ts_utc"),
                F.col("pv_est_mwh").alias("actual_lag"),
            ).alias("a"),
            ["site", "ts_utc"],
        )
    )
    mismatches = joined.filter(F.abs(F.col("yhat") - F.col("actual_lag")) > 1e-9).count()
    assert mismatches == 0
    assert fc.filter(F.col("yhat_lower") > F.col("yhat")).count() == 0


def test_forecast_schema_and_horizons(fact):
    fc = seasonal_naive_forecast(mart_features(fact), horizons=[1, 6, 24, 48])
    assert set(r.horizon_h for r in fc.select("horizon_h").distinct().collect()) == {1, 6, 24, 48}
    assert fc.columns == [
        "site", "ts_utc", "model", "var", "horizon_h", "yhat", "yhat_lower", "yhat_upper",
    ]


def test_sarimax_grouped_map(fact):
    fc = sarimax_forecast(mart_features(fact), horizons=[1, 24])
    rows = fc.collect()
    # 2 sites × 2 vars × 2 horizons
    assert len(rows) == 8
    assert all(r.model == "sarimax" and r.yhat >= 0 for r in rows)
    assert all(r.yhat_upper >= r.yhat >= r.yhat_lower for r in rows)


def test_asof_forecast_vs_actual(spark, fact):
    feats = mart_features(fact)
    fc = seasonal_naive_forecast(feats, horizons=[24]).filter(F.col("var") == "pv")
    actual = feats.select("site", "ts_utc", F.col("pv_est_mwh").alias("actual"))
    joined = asof_join(
        fc.select("site", "ts_utc", "yhat"), actual, keys=["site"], tolerance_hours=0
    )
    row = joined.filter(F.col("actual").isNotNull()).first()
    assert row is not None
    # tolerance 0: match must be the exact same hour
    assert row.matched_ts == row.ts_utc


def test_asof_takes_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [("k", dt.datetime(2025, 1, 1, 5, tzinfo=UTC), 1.0)],
        "site STRING, ts_utc TIMESTAMP, x DOUBLE",
    )
    right = spark.createDataFrame(
        [
            ("k", dt.datetime(2025, 1, 1, 3, tzinfo=UTC), 30.0),
            ("k", dt.datetime(2025, 1, 1, 5, tzinfo=UTC), 50.0),
            ("k", dt.datetime(2025, 1, 1, 7, tzinfo=UTC), 70.0),
        ],
        "site STRING, ts_utc TIMESTAMP, y DOUBLE",
    )
    out = asof_join(left, right, keys=["site"]).collect()[0]
    assert out.y == 50.0  # equal-ts right row visible; future row not


def test_asof_broadcast_matches_union_window(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.asof import (
        asof_join,
        asof_join_broadcast,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    a = asof_join(left, right, keys=["user_id"], left_ts="ts", right_ts="ts")
    b = asof_join_broadcast(left, right, keys=["user_id"], left_ts="ts", right_ts="ts")
    assert sorted(a.columns) == sorted(b.columns)
    ra = sorted(map(tuple, a.select(*sorted(a.columns)).collect()))
    rb = sorted(map(tuple, b.select(*sorted(a.columns)).collect()))
    assert ra == rb
    # and with a tolerance window both strategies agree too
    at = asof_join(left, right, keys=["user_id"], left_ts="ts", right_ts="ts", tolerance_hours=24)
    bt = asof_join_broadcast(left, right, keys=["user_id"], left_ts="ts", right_ts="ts", tolerance_hours=24)
    rat = sorted(map(tuple, at.select(*sorted(at.columns)).collect()))
    rbt = sorted(map(tuple, bt.select(*sorted(at.columns)).collect()))
    assert rat == rbt


def test_asof_broadcast_guard_trips_on_large_build_side(spark):
    import pytest as _pytest

    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.asof import (
        asof_join_broadcast,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
        load_table,
    )

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    left = ev.select("user_id", "ts", "value").limit(10)
    with _pytest.raises(ValueError, match="asof_join"):
        asof_join_broadcast(
            left, ev.select("user_id", "ts", "value"),
            keys=["user_id"], left_ts="ts", right_ts="ts",
            max_build_rows=100,
        )


def test_gap_fill_bounded_forward_fill(spark):
    import datetime as dt

    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.gold import (
        gap_fill_hourly,
    )

    t0 = dt.datetime(2025, 5, 1, 0)

    def row(h, v):
        return ("s1", t0 + dt.timedelta(hours=h), v, v, v)

    # hours 0,1 present; 2..4 missing (fillable); 5 present; 6..14
    # missing (beyond the 6h fill bound after hour 11); 15 present
    fact = spark.createDataFrame(
        [row(0, 10.0), row(1, 11.0), row(5, 15.0), row(15, 25.0)],
        "site string, ts_utc timestamp, ghi_wm2 double, temp_c double, wind_mps double",
    )
    out = {
        r.ts_utc.hour: (r.ghi_wm2, r.ghi_wm2_filled)
        for r in gap_fill_hourly(fact, max_fill_hours=6).collect()
    }
    assert len(out) == 16  # dense spine 0..15
    assert out[1] == (11.0, False)
    assert out[2] == (11.0, True)  # filled from hour 1
    assert out[4] == (11.0, True)
    assert out[5] == (15.0, False)
    assert out[11] == (15.0, True)  # 6 hours after 5 — still in bound
    assert out[12][0] is None  # beyond the fill bound -> stays NULL
    assert out[15] == (25.0, False)


def test_holt_winters_periodic_series(spark):
    # a perfectly 24h-periodic series: level converges to the mean,
    # trend to ~0, and the h-step forecast tracks the periodic value
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.forecast import (
        holt_winters_forecast,
    )
    import math

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(24 * 6):
        v = 10.0 + 5.0 * math.sin(2 * math.pi * (i % 24) / 24)
        rows.append(("s1", t0 + dt.timedelta(hours=i), v, 0.0))
    feats = spark.createDataFrame(
        rows, "site string, ts_utc timestamp, pv_est_mwh double, wind_est_mwh double"
    )
    fc = {
        (r.var, r.horizon_h): r
        for r in holt_winters_forecast(feats, horizons=[1, 24]).collect()
    }
    for h in (1, 24):
        r = fc[("pv", h)]
        want = 10.0 + 5.0 * math.sin(2 * math.pi * (((24 * 6 - 1 + h) % 24)) / 24)
        assert abs(r.yhat - want) < 0.75, (h, r.yhat, want)
        assert r.yhat_upper >= r.yhat >= r.yhat_lower >= 0
        assert r.model == "holt_winters"
    # deterministic under repartitioning
    again = {
        (r.var, r.horizon_h): r.yhat
        for r in holt_winters_forecast(feats.repartition(7), horizons=[1, 24]).collect()
    }
    assert all(again[k] == fc[k].yhat for k in again)


def test_holt_winters_short_series_empty(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.forecast import (
        holt_winters_forecast,
    )

    t0 = dt.datetime(2024, 1, 1)
    feats = spark.createDataFrame(
        [("s1", t0 + dt.timedelta(hours=i), 1.0, 1.0) for i in range(47)],
        "site string, ts_utc timestamp, pv_est_mwh double, wind_est_mwh double",
    )
    assert holt_winters_forecast(feats).count() == 0


def test_count_decomposition_identity_and_flat_series(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.forecast import (
        count_decomposition,
    )
    import datetime as dt

    # flat series: 3 events every hour for 4 days -> trend = 3,
    # seasonal = 0, resid = 0 everywhere
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(hours=h, minutes=m), "t")
        for h in range(96)
        for m in (0, 20, 40)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = count_decomposition(ev).collect()
    assert len(out) == 96
    for r in out:
        assert r.n == 3
        assert r.trend == pytest.approx(3.0)
        assert r.seasonal == pytest.approx(0.0)
        assert r.resid == pytest.approx(0.0)
        # the additive identity holds EXACTLY by construction
        assert r.n - r.trend - r.seasonal == r.resid


def test_count_decomposition_seasonal_shape(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.forecast import (
        count_decomposition,
    )
    import datetime as dt

    # diurnal pattern: 5 events at hour 12, 1 otherwise, 10 days ->
    # seasonal peaks at slot 12 and dips elsewhere; trend ~ daily mean
    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(10):
        for h in range(24):
            k = 5 if h == 12 else 1
            for i in range(k):
                rows.append((base + dt.timedelta(days=d, hours=h, minutes=i), "t"))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    by_slot = {}
    for r in count_decomposition(ev).collect():
        by_slot.setdefault(r.hour.hour, []).append(r.seasonal)
    assert by_slot[12][0] == pytest.approx(5 - 28 / 24)
    assert by_slot[3][0] == pytest.approx(1 - 28 / 24)
