"""Stream-stream interval join: watermark-bounded click→purchase
attribution (streaming/join_stream.py)."""

from __future__ import annotations

import json

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.streaming.join_stream import (
    stream_attribution_join,
)

EVENT_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE"
)


def _drop(drop_dir, name, rows):
    drop_dir.mkdir(exist_ok=True)
    (drop_dir / name).write_text("\n".join(json.dumps(r) for r in rows))


def _ev(event_id, ts, user_id, etype, value=None):
    return {
        "event_id": event_id,
        "ts": ts,
        "user_id": user_id,
        "event_type": etype,
        "value": value,
    }


def _stream(spark, drop_dir):
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(drop_dir))
    )


def test_attribution_joins_within_window_only(spark, tmp_path):
    clicks, purch = tmp_path / "clicks", tmp_path / "purch"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drop(
        clicks,
        "c1.json",
        [
            _ev(1, "2024-01-01 10:00:00", 1, "click"),
            _ev(2, "2024-01-01 10:00:00", 2, "click"),
        ],
    )
    _drop(
        purch,
        "p1.json",
        [
            _ev(10, "2024-01-01 10:10:00", 1, "purchase", 5.0),  # in window
            _ev(11, "2024-01-01 11:10:00", 2, "purchase", 7.0),  # too late
            _ev(12, "2024-01-01 10:05:00", 3, "purchase", 9.0),  # no click
        ],
    )
    q = stream_attribution_join(
        _stream(spark, clicks), _stream(spark, purch), out, ckpt
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert [(r.user_id, r.click_id, r.purchase_id, r.value) for r in rows] == [
        (1, 1, 10, 5.0)
    ]


def test_attribution_state_survives_restart(spark, tmp_path):
    # the click arrives in run 1, the purchase in run 2: the join
    # state restored from the checkpoint must still attribute it
    clicks, purch = tmp_path / "clicks", tmp_path / "purch"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drop(clicks, "c1.json", [_ev(1, "2024-01-01 10:00:00", 1, "click")])
    _drop(purch, "p0.json", [])  # streams need at least one file to start
    q = stream_attribution_join(
        _stream(spark, clicks), _stream(spark, purch), out, ckpt
    )
    q.awaitTermination(120)

    _drop(
        purch,
        "p1.json",
        [_ev(10, "2024-01-01 10:20:00", 1, "purchase", 3.0)],
    )
    q = stream_attribution_join(
        _stream(spark, clicks), _stream(spark, purch), out, ckpt
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert [(r.click_id, r.purchase_id) for r in rows] == [(1, 10)]


def test_attribution_fans_out_to_all_window_clicks(spark, tmp_path):
    # one purchase, two qualifying clicks -> two attribution rows
    clicks, purch = tmp_path / "clicks", tmp_path / "purch"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drop(
        clicks,
        "c1.json",
        [
            _ev(1, "2024-01-01 10:00:00", 1, "click"),
            _ev(2, "2024-01-01 10:05:00", 1, "click"),
        ],
    )
    _drop(purch, "p1.json", [_ev(10, "2024-01-01 10:10:00", 1, "purchase", 1.0)])
    q = stream_attribution_join(
        _stream(spark, clicks), _stream(spark, purch), out, ckpt
    )
    q.awaitTermination(120)
    got = sorted(
        (r.click_id, r.purchase_id)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, 10), (2, 10)]


def test_attribution_left_outer_emits_unattributed_after_watermark(
    spark, tmp_path
):
    import pytest

    clicks, purch = tmp_path / "clicks", tmp_path / "purch"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drop(
        clicks,
        "c1.json",
        [
            _ev(1, "2024-01-01 10:00:00", 1, "click"),
            _ev(2, "2024-01-01 10:00:00", 2, "click"),  # never purchases
        ],
    )
    _drop(
        purch,
        "p1.json",
        [_ev(10, "2024-01-01 10:10:00", 1, "purchase", 5.0)],
    )
    q = stream_attribution_join(
        _stream(spark, clicks), _stream(spark, purch), out, ckpt,
        how="leftOuter",
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in spark.read.parquet(out).collect()
    }
    # the inner match emits in run 1; click 2's negative may still be
    # pending in state (the store must prove no purchase can arrive)
    assert (1, 1, 10) in got

    # run 2: much later traffic on BOTH sides pushes both watermarks
    # past click 2's eviction bound -> its NULL row emits from the
    # restored state
    _drop(clicks, "c2.json", [_ev(3, "2024-01-01 20:00:00", 9, "click")])
    _drop(
        purch,
        "p2.json",
        [_ev(11, "2024-01-01 20:00:00", 9, "purchase", 1.0)],
    )
    q = stream_attribution_join(
        _stream(spark, clicks), _stream(spark, purch), out, ckpt,
        how="leftOuter",
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    nulls = {
        r.click_id: r for r in rows if r.purchase_id is None
    }
    assert 2 in nulls and nulls[2].user_id == 2 and nulls[2].value is None
    # the attributed click never gets a spurious null twin
    assert 1 not in nulls

    with pytest.raises(ValueError, match="leftOuter"):
        stream_attribution_join(
            _stream(spark, clicks), _stream(spark, purch), out, ckpt,
            how="fullOuter",
        )
