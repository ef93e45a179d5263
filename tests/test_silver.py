"""Silver clean chain tests against the FIXTURES.md §1 edge-case recipe:
every drop-reason branch, dedup tie-break, sub-hour binning, inclusive
boundaries, multi-site grouping."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.schemas import (
    RAW_WEATHER,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.silver import (
    clean_to_hourly,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions.validation import (
    WEATHER_RULES,
    drop_reason_cascade,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
    mark_duplicates,
)

UTC = dt.timezone.utc


def ts(h, m=0):
    return dt.datetime(2025, 1, 1, h, m, tzinfo=UTC)


ING = dt.datetime(2025, 1, 2, 0, 0, tzinfo=UTC)


@pytest.fixture(scope="module")
def bronze(spark):
    rows = [
        # kept happy path
        ("chicago_il", ts(0), 100.0, 10.0, 5.0, None, ING),
        # invalid_ghi
        ("chicago_il", ts(1), -5.0, 10.0, 5.0, None, ING),
        # invalid_temp low / high
        ("chicago_il", ts(2), 100.0, -85.0, 5.0, None, ING),
        ("chicago_il", ts(3), 100.0, 85.0, 5.0, None, ING),
        # invalid_wind
        ("chicago_il", ts(4), 100.0, 10.0, -1.2, None, ING),
        # missing ghi / temp / wind
        ("chicago_il", ts(5), None, 10.0, 5.0, None, ING),
        ("chicago_il", ts(6), 100.0, None, 5.0, None, ING),
        ("chicago_il", ts(7), 100.0, 10.0, None, None, ING),
        # duplicate pair: later ingested_at must win
        ("chicago_il", ts(8), 111.0, 11.0, 1.0, None, ING),
        ("chicago_il", ts(8), 222.0, 22.0, 2.0, None, ING + dt.timedelta(hours=1)),
        # sub-hour timestamp binned to 14:00
        ("chicago_il", ts(14, 37), 100.0, 10.0, 5.0, None, ING),
        # inclusive boundary values kept
        ("chicago_il", ts(15), 0.0, -80.0, 0.0, None, ING),
        ("chicago_il", ts(16), 0.0, 80.0, 0.0, None, ING),
        # multi-site same hour: both kept
        ("austin_tx", ts(0), 50.0, 20.0, 3.0, None, ING),
    ]
    return spark.createDataFrame(rows, RAW_WEATHER)


def test_clean_counts_and_schema(bronze):
    fact = clean_to_hourly(bronze)
    assert fact.columns == ["site", "ts_utc", "ghi_wm2", "temp_c", "wind_mps"]
    out = {(r.site, r.ts_utc): r for r in fact.collect()}
    # kept: h0 x2 sites, dedup h8, binned 14:00, boundaries 15/16
    assert len(out) == 6


def test_invalid_and_missing_rows_dropped(bronze):
    fact = clean_to_hourly(bronze)
    hours = {r.ts_utc.hour for r in fact.filter(F.col("site") == "chicago_il").collect()}
    assert hours == {0, 8, 14, 15, 16}


def test_dedup_keeps_latest_ingest(bronze):
    fact = clean_to_hourly(bronze)
    row = fact.filter(
        (F.col("site") == "chicago_il") & (F.hour("ts_utc") == 8)
    ).collect()[0]
    assert row.ghi_wm2 == 222.0 and row.temp_c == 22.0 and row.wind_mps == 2.0


def test_subhour_binned_to_hour_floor(bronze):
    fact = clean_to_hourly(bronze)
    row = fact.filter(F.hour("ts_utc") == 14).collect()[0]
    assert row.ts_utc.minute == 0 and row.ts_utc.second == 0


def test_boundary_values_inclusive(bronze):
    fact = clean_to_hourly(bronze)
    vals = {r.ts_utc.hour: r for r in fact.filter(F.col("site") == "chicago_il").collect()}
    assert vals[15].temp_c == -80.0 and vals[16].temp_c == 80.0


def test_key_uniqueness_invariant(bronze):
    fact = clean_to_hourly(bronze)
    assert fact.count() == fact.select("site", "ts_utc").distinct().count()


def test_idempotency_run_twice(bronze):
    """Property from README.md:36: re-running the clean over the same
    bronze yields identical silver."""
    a = clean_to_hourly(bronze).collect()
    b = clean_to_hourly(bronze).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_drop_reason_cascade_labels(bronze, spark):
    hourly = bronze.withColumn("ts_hour", F.date_trunc("hour", F.col("ts_utc")))
    marked = mark_duplicates(
        hourly, keys=["site", "ts_hour"], order_col="ingested_at", tiebreak=["ts_utc"]
    )
    labeled = drop_reason_cascade(
        marked, WEATHER_RULES, duplicate_flag=F.col("is_duplicate")
    )
    got = {
        (r.site, r.ts_utc.hour, r.ts_utc.minute): r.reason for r in labeled.collect()
    }
    assert got[("chicago_il", 0, 0)] == "kept"
    assert got[("chicago_il", 1, 0)] == "invalid_ghi_wm2"
    assert got[("chicago_il", 2, 0)] == "invalid_t2m_c"
    assert got[("chicago_il", 3, 0)] == "invalid_t2m_c"
    assert got[("chicago_il", 4, 0)] == "invalid_ws10_mps"
    assert got[("chicago_il", 5, 0)] == "missing_ghi_wm2"
    assert got[("chicago_il", 6, 0)] == "missing_t2m_c"
    assert got[("chicago_il", 7, 0)] == "missing_ws10_mps"
    assert got[("chicago_il", 14, 37)] == "kept"
    assert got[("austin_tx", 0, 0)] == "kept"
    # duplicate pair: older labeled duplicate, newer kept
    dup = [r for r in labeled.collect() if r.ts_utc.hour == 8 and r.site == "chicago_il"]
    reasons = {r.ghi_wm2: r.reason for r in dup}
    assert reasons == {111.0: "duplicate", 222.0: "kept"}


def test_split_quarantine_routes_and_names_violations(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions.validation import (
        WEATHER_RULES,
        split_quarantine,
    )

    df = spark.createDataFrame(
        [
            ("a", 100.0, 20.0, 5.0),     # clean
            ("b", -5.0, 20.0, 5.0),      # ghi violation
            ("c", -5.0, 95.0, -1.0),     # three violations
            ("d", None, 20.0, 5.0),      # NULL passes domain rules
        ],
        "site string, ghi_wm2 double, t2m_c double, ws10_mps double",
    )
    clean, quarantined = split_quarantine(df, WEATHER_RULES)
    assert {r.site for r in clean.collect()} == {"a", "d"}
    bad = {r.site: r.violations for r in quarantined.collect()}
    assert bad["b"] == ["ghi_wm2"]
    assert sorted(bad["c"]) == ["ghi_wm2", "t2m_c", "ws10_mps"]
    assert clean.count() + quarantined.count() == df.count()


def test_half_open_window_boundary_rows(spark):
    # FIXTURES.md §1 "window boundary": a row at exactly `start` is
    # kept, a row at exactly `end` is excluded — the [start, end)
    # contract of silver_clean.py:40-41,137-138.
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        half_open_window,
    )

    lo, hi = ts(2), ts(5)
    rows = [
        ("s", ts(1)), ("s", lo), ("s", ts(3)), ("s", hi), ("s", ts(6)),
    ]
    df = spark.createDataFrame(rows, "site string, ts_utc timestamp")
    got = sorted(
        r.ts_utc.hour
        for r in half_open_window(df, "ts_utc", lo, hi).collect()
    )
    assert got == [2, 3]


def test_referential_audit_counts_planted_orphans(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions.validation import (
        referential_audit,
    )
    from pyspark.sql import functions as F

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    rows = referential_audit([("child->parent", child, "fk", parent, "pk")]).collect()
    assert len(rows) == 1
    r = rows[0]
    # NULL FK excluded from both counts; fk=99 is the one orphan
    assert r.n_children == 3 and r.n_orphans == 1 and r.ok is False
