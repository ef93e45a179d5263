"""SparkSession factory.

The reference pins all timestamps to UTC by convention
(``infra/init.sql:3``, ``silver_clean.py:81-82``); here that is session
config, not discipline. AQE is on so broadcast/skew decisions are made at
runtime from real sizes — this is what replaces Postgres's planner
(SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# local[32] on the test box; a real deployment overrides master/memory via
# spark-submit. Everything else here is scale-safe config, not sizing.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "smartgrid-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session with the engine's mandatory config.

    ``spark.sql.shuffle.partitions`` defaults to the local core count;
    on a 1000-executor cluster you'd set it (or let AQE coalesce) to
    ~2-3x total cores. AQE's coalesce makes the exact number forgiving.
    """
    cpus = int(_DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
