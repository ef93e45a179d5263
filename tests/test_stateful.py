"""Stateful streaming operator: state must persist across micro-batches
(the property a stateless foreachBatch pipeline cannot provide)."""

from __future__ import annotations

import json

import pytest

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.streaming.stateful import (
    running_zscore_fn,
    stream_running_zscore,
    OUTPUT_SCHEMA,
)


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_welford_state_math():
    import pandas as pd

    state = FakeState()
    pdf = pd.DataFrame(
        {
            "site": ["a"] * 4,
            "ts_utc": pd.date_range("2025-01-01", periods=4, freq="h"),
            "ghi_wm2": [100.0, 200.0, 300.0, 1000.0],
        }
    )
    (out,) = list(running_zscore_fn(("a",), iter([pdf]), state))
    n, mean, m2 = state.get
    assert n == 4 and abs(mean - 400.0) < 1e-9
    # first two observations have no history distribution -> z = 0
    assert out["zscore"].tolist()[0] == 0.0
    # the 1000 outlier scores high against the first three (mean 200, sd 100)
    assert out["zscore"].tolist()[3] == pytest.approx(8.0)
    # state carries into the next batch: n continues from 4
    pdf2 = pdf.assign(ts_utc=pdf["ts_utc"] + pd.Timedelta(days=1))
    (out2,) = list(running_zscore_fn(("a",), iter([pdf2]), state))
    assert out2["n_seen"].tolist() == [5, 6, 7, 8]


def test_stream_state_persists_across_microbatches(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    rows_a = [
        {"site": "s1", "ts_utc": "2025-01-01T00:00:00", "ghi_wm2": 100.0},
        {"site": "s1", "ts_utc": "2025-01-01T01:00:00", "ghi_wm2": 200.0},
    ]
    rows_b = [
        {"site": "s1", "ts_utc": "2025-01-01T02:00:00", "ghi_wm2": 300.0},
    ]
    (drop / "a.json").write_text("\n".join(json.dumps(r) for r in rows_a))
    (drop / "b.json").write_text("\n".join(json.dumps(r) for r in rows_b))

    stream = (
        spark.readStream.schema("site STRING, ts_utc TIMESTAMP, ghi_wm2 DOUBLE")
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .json(str(drop))
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream_running_zscore(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.ts_utc.hour: r for r in spark.read.parquet(out_dir).collect()}
    assert len(got) == 3
    # n_seen is cumulative ACROSS batches: the third obs (second batch)
    # continues the count from the first batch's state
    assert [got[h].n_seen for h in (0, 1, 2)] == [1, 2, 3]
    assert got[2].zscore != 0.0  # scored against batch-1 history
