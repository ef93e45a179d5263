"""Serving-layer queries — the reference's FastAPI read path
(``fastapi/app/main.py``) re-expressed as thin plan functions over the
silver/bronze DataFrames. JSON serialization (S8) stays at the edge:
these return DataFrames; a server would ``toJSON()`` them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import (
    distinct_sorted,
    keep_metrics,
    summary,
    topk_recent,
)

MAX_HOURS = 336  # API read cap, main.py:215,240


def sites(silver: DataFrame) -> DataFrame:
    """GET / — distinct sorted sites (A2; main.py:74-77)."""
    return distinct_sorted(silver, "site")


def site_exists(silver: DataFrame, site: str) -> bool:
    """O11 membership validation (main.py:219-222) — left-semi shaped;
    driver-side boolean for the 404 path."""
    return silver.filter(F.col("site") == site).limit(1).count() > 0


def weather_summary(df: DataFrame, site: str | None = None) -> DataFrame:
    """A1 count/min/max, optional site filter (main.py:81-104)."""
    where = (F.col("site") == site) if site is not None else None
    return summary(df, "ts_utc", where)


def hourly_rows(silver: DataFrame, site: str, hours: int) -> DataFrame:
    """GET /weather/hourly — latest N clean rows, chronological
    (S4/O22; main.py:108-134). ``hours`` clamped to the API contract."""
    hours = max(1, min(int(hours), MAX_HOURS))
    per_site = silver.filter(F.col("site") == site)
    return topk_recent(per_site, "ts_utc", hours)


def raw_rows(bronze: DataFrame, site: str, hours: int) -> DataFrame:
    """GET /weather/raw — same over bronze, keeps ingested_at
    (S5; main.py:138-165)."""
    hours = max(1, min(int(hours), MAX_HOURS))
    per_site = bronze.filter(F.col("site") == site)
    return topk_recent(per_site, "ts_utc", hours, tiebreak=["ingested_at"])


def metrics(bronze: DataFrame, silver: DataFrame, site: str | None = None) -> DataFrame:
    """GET /weather/metrics — dropped_rows / kept_percentage
    (J3/A8; main.py:261-287)."""
    if site is not None:
        bronze = bronze.filter(F.col("site") == site)
        silver = silver.filter(F.col("site") == site)
    return keep_metrics(bronze, silver)
