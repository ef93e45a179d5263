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
        # Split size is SIZING, not semantics: the harness tables are
        # single ~1-10 MB parquet files, which at the 128 MB default
        # scan as 1-3 tasks on 32 cores. 1 MB splits parallelize those
        # scans; a real cluster reading 100 TB of ≥128 MB files should
        # override back via SPARK_GRAFT_MAX_PARTITION_BYTES.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(1 * 1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
