"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2;
each callable takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (tables
pre-registered as views). Column names/aliases match exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
    relational as R,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans import (
    analytics as A,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans import (
    warehouse as W,
)


from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
    load_table,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hourly event-type matrix (J1 alignment) at sf0.001."""
    return A.hourly_type_matrix(_t(spark, "/root/testdata/sf0.001", "events"))


# ---------------------------------------------------------------- queries

def q_summary_events(spark, sf_dir):
    # A1 count/min/max summary (main.py:81-104)
    return R.summary(_t(spark, sf_dir, "events"), "ts")


def q_distinct_event_types(spark, sf_dir):
    # A2 distinct + sort (main.py:74-77)
    return R.distinct_sorted(_t(spark, sf_dir, "events"), "event_type")


def q_latest_per_user_hour(spark, sf_dir):
    # A3 last-per-group dedup (silver_clean.py:99-101)
    ev = A.with_hour(_t(spark, sf_dir, "events"))
    latest = R.latest_per_group(
        ev, keys=["user_id", "ts_hour"], order_col="ts", tiebreak=["event_id"]
    )
    return latest.select("user_id", "ts_hour", "event_id", "event_type", "value")


def q_recent_events_topk(spark, sf_dir):
    # O22 latest-k then chronological (main.py:117-124)
    ev = _t(spark, sf_dir, "events")
    return R.topk_recent(ev, "ts", 168, tiebreak=["event_id"]).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def q_events_window_filter(spark, sf_dir):
    # O4 equality + O5 half-open range predicate (silver_clean.py:39-41)
    ev = _t(spark, sf_dir, "events")
    return R.half_open_window(
        ev,
        "ts",
        "2024-01-10 00:00:00",
        "2024-01-20 00:00:00",
        extra=(F.col("event_type") == "click"),
    ).select("event_id", "ts", "user_id", "value")


def q_hourly_type_pivot(spark, sf_dir):
    # J1 n-way series alignment via pivot (nasa.py:91-108)
    return A.hourly_type_matrix(_t(spark, sf_dir, "events"))


def q_hourly_completeness(spark, sf_dir):
    # A6/A7 completeness matrix (streamlit/app.py:519-524)
    return A.hourly_completeness(_t(spark, sf_dir, "events"))


def q_hourly_long(spark, sf_dir):
    # A9 wide->long melt (streamlit/app.py:525-526)
    return A.hourly_long(_t(spark, sf_dir, "events"))


def q_drop_reason_counts(spark, sf_dir):
    # O12 labeled cascade + A5 value_counts + W2 dup window
    return A.drop_reason_counts(_t(spark, sf_dir, "events"))


def q_keep_metrics(spark, sf_dir):
    # J3/A8 two-table scalar combine -> kept pct (main.py:274-287)
    ev = _t(spark, sf_dir, "events")
    return R.keep_metrics(ev, A.kept_events(ev))


def q_props_stats(spark, sf_dir):
    # F9/F10 JSON extraction + aggregate (nasa.py:58-87 analog)
    return A.props_stats(_t(spark, sf_dir, "events"))


def q_pricing_summary(spark, sf_dir):
    # TPC-H Q1-shaped hash aggregate (scale surface)
    return W.pricing_summary(_t(spark, sf_dir, "lineitem"))


def q_shipping_priority(spark, sf_dir):
    # TPC-H Q3-shaped join + top-k
    return W.shipping_priority(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


def q_local_supplier_volume(spark, sf_dir):
    # TPC-H Q5-shaped 5-way broadcast-dim join
    return W.local_supplier_volume(
        _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "summary_events": q_summary_events,
        "distinct_event_types": q_distinct_event_types,
        "latest_per_user_hour": q_latest_per_user_hour,
        "recent_events_topk": q_recent_events_topk,
        "events_window_filter": q_events_window_filter,
        "hourly_type_pivot": q_hourly_type_pivot,
        "hourly_completeness": q_hourly_completeness,
        "hourly_long": q_hourly_long,
        "drop_reason_counts": q_drop_reason_counts,
        "keep_metrics": q_keep_metrics,
        "props_stats": q_props_stats,
        "pricing_summary": q_pricing_summary,
        "shipping_priority": q_shipping_priority,
        "local_supplier_volume": q_local_supplier_volume,
    }


# ---------------------------------------------------------------- oracles

_CASCADE_CTE = """
WITH ranked AS (
  SELECT event_id, user_id, value,
         row_number() OVER (
           PARTITION BY user_id, date_trunc('hour', ts)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), labeled AS (
  SELECT CASE
           WHEN value IS NOT NULL AND NOT (value >= 0 AND value <= 300)
             THEN 'invalid_value'
           WHEN value IS NULL THEN 'missing_value'
           WHEN rn > 1 THEN 'duplicate'
           ELSE 'kept'
         END AS reason
  FROM ranked
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "summary_events": """
            SELECT count(*) AS n_rows,
                   CAST(min(ts) AS TIMESTAMP) AS min_ts,
                   CAST(max(ts) AS TIMESTAMP) AS max_ts
            FROM events
        """,
        "distinct_event_types": """
            SELECT DISTINCT event_type FROM events ORDER BY event_type
        """,
        "latest_per_user_hour": """
            SELECT user_id, CAST(ts_hour AS TIMESTAMP) AS ts_hour,
                   event_id, event_type, value
            FROM (
              SELECT user_id, date_trunc('hour', ts) AS ts_hour, event_id,
                     event_type, value,
                     row_number() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "recent_events_topk": """
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                   event_type, value
            FROM events
            ORDER BY ts DESC, event_id DESC
            LIMIT 168
        """,
        "events_window_filter": """
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
            FROM events
            WHERE event_type = 'click'
              AND ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts <  TIMESTAMP '2024-01-20 00:00:00'
        """,
        "hourly_type_pivot": """
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_hour,
                   round(avg(value) FILTER (event_type = 'click'), 4) AS click,
                   round(avg(value) FILTER (event_type = 'error'), 4) AS error,
                   round(avg(value) FILTER (event_type = 'purchase'), 4) AS purchase,
                   round(avg(value) FILTER (event_type = 'signup'), 4) AS signup,
                   round(avg(value) FILTER (event_type = 'view'), 4) AS view
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "hourly_completeness": """
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_hour,
                   max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click_complete,
                   max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error_complete,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase_complete,
                   max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signup_complete,
                   max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view_complete
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "hourly_long": """
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_hour,
                   event_type AS variable,
                   round(avg(value), 4) AS value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "drop_reason_counts": _CASCADE_CTE
        + """
            SELECT reason, count(*) AS n FROM labeled
            GROUP BY reason ORDER BY n DESC, reason
        """,
        "keep_metrics": _CASCADE_CTE
        + """
            SELECT raw_rows, kept_rows,
                   greatest(raw_rows - kept_rows, 0) AS dropped_rows,
                   CASE WHEN raw_rows > 0
                        THEN round(kept_rows * 100.0 / raw_rows, 4)
                   END AS kept_percentage
            FROM (SELECT count(*) AS raw_rows FROM events),
                 (SELECT count(*) AS kept_rows FROM labeled WHERE reason = 'kept')
        """,
        "props_stats": """
            SELECT event_type,
                   count(*) AS n,
                   min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
                   round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "shipping_priority": """
            SELECT l.l_orderkey,
                   CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
                   o.o_orderpriority,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-03-15'
              AND l.l_shipdate > TIMESTAMP '1998-03-15'
            GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
            ORDER BY revenue DESC, l.l_orderkey
            LIMIT 10
        """,
        "local_supplier_volume": """
            SELECT n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM region r
            JOIN nation n ON n.n_regionkey = r.r_regionkey
            JOIN customer c ON c.c_nationkey = n.n_nationkey
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
                           AND s.s_nationkey = c.c_nationkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name
            ORDER BY revenue DESC, n.n_name
        """,
    }
