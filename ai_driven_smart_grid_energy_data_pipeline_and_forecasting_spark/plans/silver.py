"""Bronze → Silver clean chain (reference ``silver_clean.py:74-121``).

The reference's 7 pandas steps become one lazy DataFrame chain that
Catalyst fuses into a single pipelined stage with exactly one shuffle
(the per-(site, hour) dedup). At 100 TB, with bronze partitioned by
``site``, the per-site window read is partition-pruned and the dedup
shuffle only carries surviving candidate rows (max_by partial agg).

Step map (reference line → here):
  tz-coerce F4  (silver_clean.py:81-82)  → session TZ=UTC + cast
  hour-floor W1 (silver_clean.py:84-85)  → date_trunc("hour")
  range-nullify O6 (silver_clean.py:88-91) → validation.nullify_out_of_range
  drop-nulls O7 (silver_clean.py:94)     → na.drop
  last-per-group A3 (silver_clean.py:99-101) → latest_per_group (max_by)
  rename/project O2 (silver_clean.py:107-113) → select with aliases
  hourly/tz assertions W3 (silver_clean.py:116-118) → filter assertions
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.validation import WEATHER_RULES, nullify_out_of_range, drop_any_null
from ..operators.relational import latest_per_group

CRITICAL_COLS = ["ghi_wm2", "t2m_c", "ws10_mps"]


def clean_to_hourly(bronze: DataFrame) -> DataFrame:
    """Full Silver transform; returns FACT_WEATHER-shaped rows.

    Input: RAW_WEATHER-shaped DataFrame (already range/site filtered by
    the caller — predicates stay outside so they push into the scan).
    """
    hourly = bronze.withColumn("ts_hour", F.date_trunc("hour", F.col("ts_utc")))
    validated = nullify_out_of_range(hourly, WEATHER_RULES)
    complete = drop_any_null(validated, CRITICAL_COLS)
    deduped = latest_per_group(
        complete, keys=["site", "ts_hour"], order_col="ingested_at", tiebreak=["ts_utc"]
    )
    fact = deduped.select(
        F.col("site"),
        F.col("ts_hour").alias("ts_utc"),
        F.col("ghi_wm2"),
        F.col("t2m_c").alias("temp_c"),
        F.col("ws10_mps").alias("wind_mps"),
    )
    # W3 write-path assertion: hourly alignment is guaranteed by
    # date_trunc, but keep the reference's explicit guard as a filter so
    # a future non-truncating path can't write misaligned rows.
    return fact.filter(
        (F.minute("ts_utc") == 0) & (F.second("ts_utc") == 0)
    ).orderBy("site", "ts_utc")
