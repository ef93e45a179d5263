"""Property-based tests (SURVEY.md §5 rebuild plan, item e):
idempotency of the MERGE sink semantics and the silver cleaning
invariants, over hypothesis-generated adversarial inputs (duplicate
keys, NULLs, out-of-range values, sub-hour timestamps).

Examples are kept small and few — each one round-trips through a Spark
job — but unshrunk failures still pin down semantic bugs the fixture
tests can't reach.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F
import pytest

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
    load_table,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
    latest_per_group,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.upsert import (
    merge_frames,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.silver import (
    clean_to_hourly,
)

BASE = dt.datetime(2024, 1, 1)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# RAW_WEATHER-shaped rows: keys collide (3 sites × 48 hours), values
# include NULLs and out-of-range readings, timestamps are sub-hour
raw_rows = st.lists(
    st.tuples(
        st.sampled_from(["site_a", "site_b", "site_c"]),
        st.integers(min_value=0, max_value=48 * 60 - 1),  # minutes offset
        st.one_of(st.none(), st.floats(-100, 1500, allow_nan=False)),  # ghi
        st.one_of(st.none(), st.floats(-200, 200, allow_nan=False)),  # t2m
        st.one_of(st.none(), st.floats(-5, 60, allow_nan=False)),  # ws
        st.integers(min_value=0, max_value=5),  # ingest tick
    ),
    min_size=0,
    max_size=40,
)

BRONZE_SCHEMA = (
    "site string, ts_utc timestamp, ghi_wm2 double, t2m_c double, "
    "ws10_mps double, ingested_at timestamp"
)


def _bronze_df(spark, rows):
    data = [
        (
            site,
            BASE + dt.timedelta(minutes=m),
            ghi,
            t2m,
            ws,
            BASE + dt.timedelta(hours=tick),
        )
        for site, m, ghi, t2m, ws, tick in rows
    ]
    return spark.createDataFrame(data, BRONZE_SCHEMA)


@settings(**SETTINGS)
@given(rows=raw_rows)
def test_silver_clean_invariants(spark, rows):
    out = clean_to_hourly(_bronze_df(spark, rows)).collect()
    keys = [(r.site, r.ts_utc) for r in out]
    assert len(keys) == len(set(keys)), "silver key (site, ts_utc) must be unique"
    for r in out:
        assert r.ts_utc.minute == 0 and r.ts_utc.second == 0
        assert r.ghi_wm2 is not None and r.ghi_wm2 >= 0
        assert r.temp_c is not None and -80 <= r.temp_c <= 80
        assert r.wind_mps is not None and r.wind_mps >= 0


@pytest.mark.slow
@settings(**SETTINGS)
@given(rows=raw_rows)
def test_silver_clean_idempotent(spark, rows):
    once = clean_to_hourly(_bronze_df(spark, rows))
    # feeding silver back through the chain (as a bronze frame with
    # ingested_at = ts) must be a no-op: already aligned, valid, unique
    again = clean_to_hourly(
        once.select(
            "site",
            "ts_utc",
            "ghi_wm2",
            F.col("temp_c").alias("t2m_c"),
            F.col("wind_mps").alias("ws10_mps"),
            F.col("ts_utc").alias("ingested_at"),
        )
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, again.collect()))


@pytest.mark.slow
@settings(**SETTINGS)
@given(rows=raw_rows, rows2=raw_rows)
def test_merge_frames_idempotent_and_unique(spark, rows, rows2):
    target = latest_per_group(
        _bronze_df(spark, rows), keys=["site", "ts_utc"], order_col="ingested_at"
    )
    updates = _bronze_df(spark, rows2)
    merged = merge_frames(target, updates, keys=["site", "ts_utc"], order_col="ingested_at")
    twice = merge_frames(merged, updates, keys=["site", "ts_utc"], order_col="ingested_at")
    got, got2 = merged.collect(), twice.collect()
    keys = [(r.site, r.ts_utc) for r in got]
    assert len(keys) == len(set(keys)), "merge output keys must be unique"
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2)), "re-applying a batch must be a no-op"


@settings(**SETTINGS)
@given(rows=raw_rows)
def test_latest_per_group_picks_maximal_row(spark, rows):
    df = _bronze_df(spark, rows)
    out = latest_per_group(
        df, keys=["site"], order_col="ingested_at", tiebreak=["ts_utc"]
    ).collect()
    rows_all = df.collect()
    by_site: dict[str, list] = {}
    for r in rows_all:
        by_site.setdefault(r.site, []).append(r)
    assert len(out) == len(by_site)
    for r in out:
        best = max(by_site[r.site], key=lambda x: (x.ingested_at, x.ts_utc))
        assert (r.ingested_at, r.ts_utc) == (best.ingested_at, best.ts_utc)


# ------------------------------------------- approximate-agg consistency


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.05)
    ).first()[0]
    assert abs(approx - exact) <= max(3 * 0.05 * exact, 1), (exact, approx)


def test_approx_percentile_brackets_exact(spark):
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    exact = ev.select(
        F.percentile("value", F.lit(0.5)).alias("p")
    ).first()["p"]
    approx = ev.select(
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("p")
    ).first()["p"]
    lo, hi = ev.selectExpr(
        "percentile(value, 0.45) AS lo", "percentile(value, 0.55) AS hi"
    ).first()
    assert lo <= approx <= hi, (lo, approx, hi, exact)


def test_range_join_property_vs_allpairs(spark):
    """Random points/intervals (including degenerate and negative
    spans) must match the all-pairs theta join at any bin width."""
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.range_join import (
        range_join,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pts=st.lists(
            st.tuples(st.integers(0, 2), st.integers(-50, 50)), max_size=12
        ),
        # spans >= 0 only: inverted intervals (hi < lo) are REFUSED
        # loudly by the operator (tests/test_range_join.py covers that)
        ivs=st.lists(
            st.tuples(
                st.integers(0, 2), st.integers(-50, 50), st.integers(0, 60)
            ),
            max_size=8,
        ),
        width=st.sampled_from([0.9, 7.0, 33.0]),
    )
    def run(pts, ivs, width):
        points = spark.createDataFrame(
            [(f"k{k}", float(v)) for k, v in pts] or [("k0", 0.0)],
            "k string, v double",
        )
        if not pts:
            points = points.filter("v != v")
        intervals = spark.createDataFrame(
            [(f"k{k}", float(lo), float(lo + span)) for k, lo, span in ivs]
            or [("k0", 0.0, 0.0)],
            "k string, lo double, hi double",
        )
        if not ivs:
            intervals = intervals.filter("lo != lo")
        got = sorted(
            (r.k, r.v, r.lo, r.hi)
            for r in range_join(
                points, intervals, "v", "lo", "hi",
                bin_width=width, equi_keys=("k",),
            ).collect()
        )
        want = sorted(
            (f"k{k}", float(v), float(lo), float(lo + span))
            for k, v in pts
            for k2, lo, span in ivs
            if k == k2 and lo <= v < lo + span
        )
        assert got == want, (pts, ivs, width)

    run()


# ------------------------------------------- late-r5 operator properties


@settings(**SETTINGS)
@given(
    items=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
        min_size=0,
        max_size=120,
    ),
    k=st.integers(min_value=2, max_value=8),
)
@pytest.mark.slow
def test_heavy_hitters_property_vs_exact(spark, items, k):
    # for ANY multiset and ANY k: output == the naive GROUP BY filtered
    # strictly above n/k, despite order-dependent MG candidate sets
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.heavy import (
        heavy_hitters,
    )
    from collections import Counter

    df = spark.createDataFrame([(w,) for w in items] or [(None,)], "w string")
    got = {
        (r.item, r.n_occurrences)
        for r in heavy_hitters(df, "w", k=k).collect()
    }
    n = len(items)
    want = {
        (w, c) for w, c in Counter(items).items() if c > n / k
    }
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # doc id
            st.integers(min_value=0, max_value=500),  # quality
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        max_size=15,
    ),
)
@pytest.mark.slow
def test_dedup_corpus_best_property(spark, rows, edges):
    # survivors = per-component argmax(quality, -id) + all singletons,
    # verified against a pure-Python union-find oracle
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        dedup_corpus_best,
    )

    ids = {r[0] for r in rows}
    edges = [(a, b) for a, b in edges if a in ids and b in ids and a != b]
    docs = spark.createDataFrame(rows, "doc_id long, q long")
    pairs = spark.createDataFrame(
        edges or [(-1, -2)], "doc_a long, doc_b long"
    )
    got = sorted(r.doc_id for r in dedup_corpus_best(docs, pairs, "q").collect())
    # oracle: union-find
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict = {}
    for i in ids:
        comps.setdefault(find(i), []).append(i)
    q = dict(rows)
    want = sorted(
        max(members, key=lambda i: (q[i], -i)) for members in comps.values()
    )
    assert got == want


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=60
    )
)
@pytest.mark.slow
def test_global_rank_property_dense_and_ordered(spark, vals):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        global_rank,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    out = global_rank(
        df,
        bucket=F.floor(F.col("v") / 100),
        key=F.struct(F.col("v").alias("v"), F.col("id").alias("id")),
    ).collect()
    got = sorted((r.rank, r.v, r.id) for r in out)
    assert [r[0] for r in got] == list(range(1, len(vals) + 1))
    want = sorted((v, i) for i, v in enumerate(vals))
    assert [(r[1], r[2]) for r in got] == want
