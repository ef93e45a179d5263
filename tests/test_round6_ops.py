"""Round-6 operator edge cases: OHLC bars, winsorization, profiling,
Bloom membership, z-score normalization, CMS audit, domain affinity.
(The value-exact cross-engine checks live in test_entry_oracle.py;
these cover the corners the sf-data oracles don't reach.)"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ohlc_open_close_follow_ts_order(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.analytics import (
        ohlc_downsample,
    )

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:05:00", "click", 5.0),
            (2, "2024-01-01 10:01:00", "click", 1.0),   # earliest -> open
            (3, "2024-01-01 10:59:00", "click", 2.0),   # latest -> close
            (4, "2024-01-01 10:30:00", "click", 9.0),   # high
            (5, "2024-01-01 10:30:00", "click", None),  # excluded
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = ohlc_downsample(ev).collect()[0]
    assert (r.open, r.high, r.low, r.close, r.n) == (1.0, 9.0, 1.0, 2.0, 4)


def test_ohlc_ties_break_on_event_id(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.analytics import (
        ohlc_downsample,
    )

    # two rows at the same ts: (ts, event_id) total order decides
    ev = spark.createDataFrame(
        [
            (2, "2024-01-01 10:00:00", "click", 7.0),
            (1, "2024-01-01 10:00:00", "click", 3.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = ohlc_downsample(ev).collect()[0]
    assert (r.open, r.close) == (3.0, 7.0)


def test_winsorized_single_row_key(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        winsorized_stats,
    )

    df = spark.createDataFrame(
        [("a", 42.0)], "k string, v double"
    )
    r = winsorized_stats(df, "k", "v", p=0.01).collect()[0]
    # with n=1 both ranks collapse to 1: bounds == the value itself
    assert (r.n, r.lo, r.hi, r.mean_winsorized) == (1, 42.0, 42.0, 42.0)


def test_winsorized_clamps_extremes(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        winsorized_stats,
    )

    rows = [("a", float(i)) for i in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, "k string, v double")
    r = winsorized_stats(df, "k", "v", p=0.05).collect()[0]
    # lo = rank ceil(0.05*100)=5 -> 5.0; hi = rank 95 -> 95.0
    assert (r.lo, r.hi) == (5.0, 95.0)
    # clamped mean: 4 values below 5 become 5, 5 values above 95 become 95
    expected = (sum(range(5, 96)) + 4 * 5 + 5 * 95) / 100
    assert abs(r.mean_winsorized - expected) < 1e-9


def test_table_profile_counts_nulls_and_distinct(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        table_profile,
    )

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "a long, b string"
    )
    rows = {r.column_name: r for r in table_profile(df, ["a", "b"]).collect()}
    assert rows["a"].n_nulls == 0 and rows["a"].n_distinct == 2
    assert rows["b"].n_nulls == 1 and rows["b"].n_distinct == 2
    assert rows["a"].min_str == "1" and rows["a"].max_str == "2"


def test_bloom_probe_admits_all_members(spark):
    # the Bloom guarantee: NO false negatives, for any member set
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    universe = spark.range(0, 500).withColumnRenamed("id", "k")
    members = universe.filter(F.col("k") % 7 == 0)
    bits = bloom_build(members, "k", m=1 << 10, k=3)
    admitted = {
        r.k for r in bloom_probe(universe, bits, "k", m=1 << 10, k=3).collect()
    }
    member_ids = {r.k for r in members.collect()}
    assert member_ids <= admitted  # superset, never a miss


def test_zscore_constant_group_yields_null(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        zscore_normalize,
    )

    df = spark.createDataFrame(
        [("c", 5.0), ("c", 5.0), ("v", 1.0), ("v", 3.0)],
        "k string, v double",
    )
    rows = zscore_normalize(df, "k", "v").collect()
    by_k = {}
    for r in rows:
        by_k.setdefault(r.k, []).append(r.z)
    assert by_k["c"] == [None, None]  # zero variance -> no z
    zs = sorted(by_k["v"])
    # mean 2, sd sqrt(2): z = ±1/sqrt(2)
    assert abs(zs[0] + 2 ** -0.5) < 1e-12 and abs(zs[1] - 2 ** -0.5) < 1e-12


def test_zscore_refuses_decimal_unsafe_values(spark):
    # ADVICE r6: |v| >= 1e16 overflows the exact decimal(38,6) Σv² cast —
    # under non-ANSI Spark to a silently-dropped NULL, skewing s2. The
    # guard must fail LOUDLY in both modes (ANSI: the cast errors first;
    # non-ANSI: the max(|v|) raise_error branch fires).
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        zscore_normalize,
    )
    import pytest as _pt

    bad = spark.createDataFrame(
        [("a", 1e16), ("a", 2e16)], "k string, v double"
    )
    ansi_before = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        with _pt.raises(Exception) as ei:
            zscore_normalize(bad, "k", "v").collect()
        assert "zscore_normalize" in str(ei.value)
        # values inside the bound are untouched by the guard
        ok = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0)], "k string, v double"
        )
        zs = sorted(r.z for r in zscore_normalize(ok, "k", "v").collect())
        assert abs(zs[0] + 2 ** -0.5) < 1e-12
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_before)


def test_zscore_refuses_sum_overflow_of_inbound_values(spark):
    # review r7: each |v| ~ 9e14 passes the per-row bound but 200 of
    # them push Σv² past decimal(38,6)'s cap — the guard must bound the
    # SUM too, not silently NULL the variance
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        zscore_normalize,
    )
    import pytest as _pt

    bad = spark.createDataFrame(
        [("a", 9e14 + i) for i in range(200)], "k string, v double"
    )
    ansi_before = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        with _pt.raises(Exception) as ei:
            zscore_normalize(bad, "k", "v").collect()
        assert "zscore_normalize" in str(ei.value)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_before)


def test_cms_never_undercounts_on_skew(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.heavy import (
        cms_topk_audit,
    )

    # zipf-ish: token i appears 200//(i+1) times, forcing collisions
    # at width=32
    rows = [(f"t{i}",) for i in range(80) for _ in range(200 // (i + 1))]
    df = spark.createDataFrame(rows, "token string")
    out = cms_topk_audit(df, "token", depth=3, width=32, k=8).collect()
    assert len(out) == 8
    for r in out:
        assert r.overestimate >= 0  # the one-sided CMS guarantee
        assert r.cms_estimate == r.true_count + r.overestimate


def test_domain_affinity_orders_target_docs_first(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions.text import (
        domain_affinity_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "tgt"),
            (2, "alpha beta delta", "other"),
            (3, "zeta eta theta", "other"),
        ],
        "doc_id long, text string, source string",
    )
    out = domain_affinity_topk(docs, F.col("source") == "tgt", k=3).collect()
    # doc1's tokens all appear in the target doc -> highest affinity;
    # doc3 shares none -> zero
    assert out[0].doc_id == 1
    assert out[-1].doc_id == 3 and out[-1].affinity == 0.0
    for r in out:
        assert 0.0 <= r.affinity <= 1.0
