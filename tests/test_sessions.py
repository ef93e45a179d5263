"""Gap-based sessionization: fixture-pinned boundaries + invariants,
and the nearest-centroid cluster-stats analytic."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sessions import (
    assign_sessions,
    session_stats,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.similarity import (
    cluster_assign_stats,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
    load_table,
)

SF = "/root/testdata/sf0.001"


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def _fixture(spark):
    # user 1: events at 00:00, 00:10, 01:10 with a 3600 s gap limit:
    #   00:00→00:10 (600 s, in-session), 00:10→01:10 (3600 s, exactly at
    #   the limit → still in-session: strict >), then 03:00 (new session)
    # user 2: single event
    rows = [
        (1, _ts(0, 0), 10, "click"),
        (1, _ts(0, 10), 11, "view"),
        (1, _ts(1, 10), 12, "click"),
        (1, _ts(3, 0), 13, "purchase"),
        (2, _ts(5, 0), 14, "view"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )


def test_session_boundaries_pinned(spark):
    out = (
        assign_sessions(_fixture(spark), gap_seconds=3600)
        .select("event_id", "session_id")
        .collect()
    )
    got = {r.event_id: r.session_id for r in out}
    assert got == {10: 1, 11: 1, 12: 1, 13: 2, 14: 1}


def test_session_stats_pinned(spark):
    out = session_stats(_fixture(spark), gap_seconds=3600).collect()
    by_key = {(r.user_id, r.session_id): r for r in out}
    s11 = by_key[(1, 1)]
    assert s11.n_events == 3
    assert s11.duration_sec == 4200
    assert s11.n_event_types == 2
    assert by_key[(1, 2)].n_events == 1
    assert by_key[(1, 2)].duration_sec == 0
    assert by_key[(2, 1)].n_events == 1


def test_session_invariants_on_testdata(spark):
    ev = load_table(spark, "events", SF)
    stats = session_stats(ev)
    # partition of the input: session sizes sum to the row count
    total = stats.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()
    # sessions are disjoint in time per user: next start > prev end
    overlap = (
        stats.withColumn(
            "prev_end",
            F.lag("session_end").over(
                Window.partitionBy("user_id").orderBy("session_id")
            ),
        )
        .filter(F.col("prev_end").isNotNull())
        .filter(F.col("session_start") <= F.col("prev_end"))
        .count()
    )
    assert overlap == 0


def test_session_window_matches_gap_formulation(spark):
    # native session_window must produce the same sessions as the
    # lag + running-sum formulation: same starts, sizes, and an end
    # offset by exactly the gap
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sessions import (
        session_window_stats,
    )

    ev = load_table(spark, "events", SF)
    gap = 28800
    a = session_stats(ev, gap_seconds=gap).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    b = session_window_stats(ev, gap_seconds=gap)
    ra = [(r.user_id, r.session_start, r.session_end, r.n_events) for r in a.collect()]
    rb = [
        (r.user_id, r.session_start, r.session_end - dt.timedelta(seconds=gap), r.n_events)
        for r in b.collect()
    ]
    assert sorted(ra) == sorted(rb)


def test_session_window_streams(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.streaming.ingest_stream import (
        stream_session_aggregate,
    )

    rate = spark.readStream.format("rate").load()
    stream = rate.select(
        (F.col("value") % 5).alias("user_id"), F.col("timestamp").alias("ts")
    )
    out = stream_session_aggregate(stream)
    assert out.isStreaming
    assert set(out.columns) == {"user_id", "session_start", "session_end", "n_events"}


def test_cluster_assign_stats(spark):
    emb = load_table(spark, "embeddings", SF)
    out = cluster_assign_stats(emb, n_centroids=16).collect()
    assert sum(r.n_members for r in out) == emb.count()
    assert all(0 <= r.cluster < 16 for r in out)
    # each centroid belongs to its own cluster with sim exactly 1
    ones = {r.cluster: r.max_sim for r in out}
    assert all(abs(v - 1.0) < 1e-12 for v in ones.values())
    assert all(r.min_sim <= r.max_sim for r in out)
