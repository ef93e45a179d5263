"""Gold layer — the reference's declared-but-unbuilt marts
(``infra/init.sql:44-91``, roadmap ``README.md:54-58``), built here as
first-class plans (SURVEY.md §2.10).

- mart_features: GHI W/m² → kWh/m² (1 h integration), PV/wind energy
  estimates. Pure column math — zero shuffles.
- mart_kpis: capacity factors, constrained to [0, 1.2] like the DDL
  CHECK (``init.sql:83-86``).
- mart_forecast baseline: seasonal-naive — yhat(t+h) = y(t+h−24k) via
  lag windows per (site, var); intervals from the residual stddev.

PV/wind estimation formulas are deliberately simple deterministic
proxies (panel efficiency × area; cubic wind power capped at rating) —
the reference never specified them, only their schema/constraints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic plant parameters (per-site config would come from a dim
# table; constants keep the math oracle-checkable)
PV_CAPACITY_MW = 2.0
WIND_CAPACITY_MW = 3.0
PV_EFFICIENCY = 0.2
PV_AREA_M2 = 10_000.0
AIR_DENSITY = 1.225
ROTOR_AREA_M2 = 5_000.0
WIND_CP = 0.4


def mart_features(fact: DataFrame) -> DataFrame:
    """FACT_WEATHER → MART_FEATURES (init.sql:44-54)."""
    ghi_kwh = F.col("ghi_wm2") / 1000.0  # 1-hour integration, W/m² → kWh/m²
    pv_mwh = ghi_kwh * PV_EFFICIENCY * PV_AREA_M2 / 1000.0
    # P = ½ρAv³Cp (W) capped at rated capacity, × 1 h → MWh.
    # v³ as v·v·v, not pow(v,3): multiplication is correctly rounded
    # everywhere, while Math.pow tolerates 1 ulp — enough to break
    # bit-exact cross-engine comparison.
    v = F.col("wind_mps")
    wind_w = 0.5 * AIR_DENSITY * ROTOR_AREA_M2 * (v * v * v) * WIND_CP
    wind_mwh = F.least(wind_w / 1_000_000.0, F.lit(WIND_CAPACITY_MW))
    return fact.select(
        "site",
        "ts_utc",
        ghi_kwh.alias("ghi_kwh_m2"),
        pv_mwh.alias("pv_est_mwh"),
        wind_mwh.alias("wind_est_mwh"),
    )


def mart_kpis(features: DataFrame) -> DataFrame:
    """MART_FEATURES → MART_KPIS (init.sql:80-91): hourly capacity
    factors, clamped to the DDL domain [0, 1.2]."""
    pv_cf = F.least(F.col("pv_est_mwh") / F.lit(PV_CAPACITY_MW), F.lit(1.2))
    wind_cf = F.least(F.col("wind_est_mwh") / F.lit(WIND_CAPACITY_MW), F.lit(1.2))
    return features.select(
        "site",
        "ts_utc",
        F.lit(PV_CAPACITY_MW).alias("pv_capacity_mw"),
        F.lit(WIND_CAPACITY_MW).alias("wind_capacity_mw"),
        F.greatest(pv_cf, F.lit(0.0)).alias("pv_cf"),
        F.greatest(wind_cf, F.lit(0.0)).alias("wind_cf"),
    )


def seasonal_naive_forecast(
    features: DataFrame,
    horizons: list[int] | None = None,
    season_hours: int = 24,
) -> DataFrame:
    """Baseline forecast (init.sql:64: model='baseline'): for each
    (site, var, horizon h), yhat at origin t targets t+h and equals the
    value at t+h−24·ceil(h/24) — the same hour on the most recent fully
    observed day. One lag window per horizon over the per-(site, var)
    series; intervals = ±1.96σ of the 24h-lag residuals.

    Shuffle profile: a single partition-by-(site, var) sort serves every
    lag/stddev window — Catalyst reuses the window exchange.
    """
    horizons = horizons or [1, 6, 24, 48]
    long = features.select(
        "site", "ts_utc", F.col("pv_est_mwh").alias("pv"), F.col("wind_est_mwh").alias("wind")
    ).unpivot(["site", "ts_utc"], ["pv", "wind"], "var", "y")

    w = Window.partitionBy("site", "var").orderBy("ts_utc")
    # residual scale from the season-lag differences seen so far
    resid = F.stddev(F.col("y") - F.lag("y", season_hours).over(w)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    out = None
    for h in horizons:
        back = season_hours * -(-h // season_hours)  # ceil to full seasons
        yhat = F.lag("y", back - h).over(w)  # value at (t+h) - back
        row = (
            long.withColumn("horizon_h", F.lit(h))
            .withColumn("model", F.lit("baseline"))
            .withColumn("target_ts", F.col("ts_utc") + F.make_interval(hours=F.lit(h)))
            # keep the raw lag for the existence filter: greatest()
            # ignores NULLs, so clamping first would turn "no history"
            # into a spurious 0.0 forecast
            .withColumn("yraw", yhat)
            .withColumn("yhat", F.greatest(yhat, F.lit(0.0)))
            .withColumn("sigma", resid)
        )
        out = row if out is None else out.unionByName(row)
    return (
        out.filter(F.col("yraw").isNotNull())
        .select(
            "site",
            F.col("target_ts").alias("ts_utc"),
            "model",
            "var",
            F.col("horizon_h").cast("int").alias("horizon_h"),
            "yhat",
            F.greatest(F.col("yhat") - 1.96 * F.coalesce(F.col("sigma"), F.lit(0.0)), F.lit(0.0)).alias(
                "yhat_lower"
            ),
            (F.col("yhat") + 1.96 * F.coalesce(F.col("sigma"), F.lit(0.0))).alias("yhat_upper"),
        )
    )


def forecast_accuracy(forecast: DataFrame, features: DataFrame) -> DataFrame:
    """Forecast-vs-actual evaluation — the Gold-layer join the reference
    roadmap implies but never built (SURVEY.md §7 phase 3; the
    ``mart_forecast`` rows of ``init.sql:61-73`` are useless without
    it). Equi-join of forecasts to later actuals on (site, ts_utc, var)
    — both sides hour-aligned so no as-of tolerance is needed — then
    per (model, var, horizon) error metrics.

    Shuffle profile: one join shuffle on the composite key, one tiny
    final agg; at 100 TB both sides are partitioned by site so the join
    co-locates.
    """
    actual = features.select(
        "site", "ts_utc", F.col("pv_est_mwh").alias("pv"), F.col("wind_est_mwh").alias("wind")
    ).unpivot(["site", "ts_utc"], ["pv", "wind"], "var", "y")
    j = forecast.join(actual, ["site", "ts_utc", "var"])
    err = F.col("yhat") - F.col("y")
    return (
        j.groupBy("model", "var", "horizon_h")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.abs(err)), 4).alias("mae"),
            F.round(F.sqrt(F.avg(err * err)), 4).alias("rmse"),
            F.round(
                F.avg(
                    (
                        (F.col("y") >= F.col("yhat_lower"))
                        & (F.col("y") <= F.col("yhat_upper"))
                    ).cast("double")
                ),
                4,
            ).alias("interval_coverage"),
        )
        .orderBy("model", "var", "horizon_h")
    )
