"""StructType schemas for the medallion tables (reference
``infra/init.sql:8-91``) and the NASA POWER payload (``nasa.py:106``).

Nullability mirrors the DDL: Bronze observation columns nullable,
Silver NOT NULL (enforced by the clean chain's dropna, not by writer
magic). ``raw_json`` keeps the reference's JSONB payload as a typed
struct since its shape is fixed at ``nasa.py:106``; ``to_json`` at the
serving edge reproduces the JSON form.
"""

from __future__ import annotations

from pyspark.sql import types as T

RAW_JSON_STRUCT = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("ghi_wm2", T.DoubleType(), True),
        T.StructField("t2m_c", T.DoubleType(), True),
        T.StructField("ws10_mps", T.DoubleType(), True),
    ]
)

# Bronze: raw_weather (init.sql:8-18)
RAW_WEATHER = T.StructType(
    [
        T.StructField("site", T.StringType(), False),
        T.StructField("ts_utc", T.TimestampType(), False),
        T.StructField("ghi_wm2", T.DoubleType(), True),
        T.StructField("t2m_c", T.DoubleType(), True),
        T.StructField("ws10_mps", T.DoubleType(), True),
        T.StructField("raw_json", T.StringType(), True),
        T.StructField("ingested_at", T.TimestampType(), False),
    ]
)

# Silver: fact_weather (init.sql:26-37) — renamed t2m_c→temp_c, ws10_mps→wind_mps
FACT_WEATHER = T.StructType(
    [
        T.StructField("site", T.StringType(), False),
        T.StructField("ts_utc", T.TimestampType(), False),
        T.StructField("ghi_wm2", T.DoubleType(), False),
        T.StructField("temp_c", T.DoubleType(), False),
        T.StructField("wind_mps", T.DoubleType(), False),
    ]
)

# Gold: mart_features (init.sql:44-54)
MART_FEATURES = T.StructType(
    [
        T.StructField("site", T.StringType(), False),
        T.StructField("ts_utc", T.TimestampType(), False),
        T.StructField("ghi_kwh_m2", T.DoubleType(), True),
        T.StructField("pv_est_mwh", T.DoubleType(), True),
        T.StructField("wind_est_mwh", T.DoubleType(), True),
    ]
)

# Gold: mart_forecast (init.sql:61-73)
MART_FORECAST = T.StructType(
    [
        T.StructField("site", T.StringType(), False),
        T.StructField("ts_utc", T.TimestampType(), False),
        T.StructField("model", T.StringType(), False),  # 'baseline' | 'sarimax'
        T.StructField("var", T.StringType(), False),  # 'pv' | 'wind'
        T.StructField("horizon_h", T.IntegerType(), False),  # 1..48
        T.StructField("yhat", T.DoubleType(), True),
        T.StructField("yhat_lower", T.DoubleType(), True),
        T.StructField("yhat_upper", T.DoubleType(), True),
    ]
)

# Gold: mart_kpis (init.sql:80-91)
MART_KPIS = T.StructType(
    [
        T.StructField("site", T.StringType(), False),
        T.StructField("ts_utc", T.TimestampType(), False),
        T.StructField("pv_capacity_mw", T.DoubleType(), True),
        T.StructField("wind_capacity_mw", T.DoubleType(), True),
        T.StructField("pv_cf", T.DoubleType(), True),
        T.StructField("wind_cf", T.DoubleType(), True),
    ]
)

# NASA POWER response envelope for spark.read.json on landed payloads.
# parameter values arrive as map<string, double> (shape A: yyyymmddhh keys)
# or map<string, array<double>> (shape B: yyyymmdd keys, 24 hourly values).
# Schema-on-read keeps both as strings and the parser dispatches (F10).
NASA_PAYLOAD = T.StructType(
    [
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField(
                        "parameter",
                        T.MapType(T.StringType(), T.StringType()),
                        True,
                    )
                ]
            ),
            True,
        )
    ]
)
