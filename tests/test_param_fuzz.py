"""Parameter-sweep differential fuzz: the oracle gate certifies each
operator at ONE fixed configuration (the registry entry); these tests
sweep the operator's parameter space against a TEMPLATED DuckDB twin,
so a bug that only bites at an untested quantile / bin count /
threshold / reference key cannot hide behind the registry's single
config. Templates mirror the registered ``oracle_sql()`` strings with
the parameter literal substituted — same exactness discipline
(rational thresholds, decimal carriers, distinct-value windows), just
generalized over the parameter.

All sweeps run at sf0.001 (the oracle suite's scale); parameter sets
are fixed literals, not RNG draws, so failures reproduce exactly.
Every sweep INCLUDES its registry config, so if a registry oracle is
ever edited without this template, the divergence fails here instead
of drifting silently.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
    relational as R,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark import tables

# nightly tier (r15): the whole module is a robustness sweep —
# parameter fuzz sweeps; the default run must stay inside the driver's pytest
# window. SPARK_GRAFT_SLOW_TESTS=1 runs it.
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["orders", "lineitem", "events", "documents", "customer", "part"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True)


def _match(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return a == b


def _assert_same(got: pd.DataFrame, want: pd.DataFrame, label: str) -> None:
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns), (
        f"{label}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{label}: rows {len(got)} != {len(want)}"
    for col in got.columns:
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(got[col], want[col]))
            if not _match(x, y)
        ]
        assert not bad, f"{label}.{col}: first mismatches {bad[:5]}"


# ---------------------------------------------------------------- #
# weighted_percentile: sweep the rational quantile q_num/q_den
# (registry config: 1/2)


@pytest.mark.parametrize(
    "q_num,q_den", [(1, 2), (1, 4), (1, 3), (3, 4), (9, 10), (1, 1)]
)
def test_weighted_percentile_sweep(spark, duck, q_num, q_den):
    li = tables.load_table(spark, "lineitem", SF_DIR)
    got = R.weighted_percentile(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", q_num, q_den
    ).toPandas()
    want = duck.execute(f"""
        WITH base AS (
          SELECT l_returnflag, l_extendedprice AS v,
                 CAST(l_quantity AS DECIMAL(20,6)) AS w
          FROM lineitem
          WHERE l_extendedprice IS NOT NULL
            AND l_quantity IS NOT NULL AND l_quantity > 0),
        cum AS (
          SELECT l_returnflag, v,
                 sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                   RANGE BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS c
          FROM base),
        tot AS (
          SELECT l_returnflag, sum(w) AS t
          FROM base GROUP BY l_returnflag)
        SELECT cum.l_returnflag, min(cum.v) AS weighted_p{q_num}_{q_den}
        FROM cum JOIN tot ON cum.l_returnflag = tot.l_returnflag
        WHERE cum.c * {q_den} >= tot.t * {q_num}
        GROUP BY cum.l_returnflag ORDER BY cum.l_returnflag
    """).fetchdf()
    _assert_same(got, want, f"weighted_percentile({q_num}/{q_den})")


# ---------------------------------------------------------------- #
# mad_outliers: sweep the rational threshold multiple k_num/k_den
# (registry config: 3/1)


@pytest.mark.parametrize("k_num,k_den", [(3, 1), (1, 1), (2, 1), (5, 2), (7, 4)])
def test_mad_outliers_sweep(spark, duck, k_num, k_den):
    ev = tables.load_table(spark, "events", SF_DIR)
    got = R.mad_outliers(ev, "event_type", "value", k_num, k_den).toPandas()
    want = duck.execute(f"""
        WITH base AS (
          SELECT event_type AS k, value AS v FROM events
          WHERE value IS NOT NULL AND NOT isnan(value)),
        cum AS (
          SELECT k, v,
                 count(*) OVER (PARTITION BY k ORDER BY v
                   RANGE BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS c
          FROM base),
        tot AS (SELECT k, count(*) AS n FROM base GROUP BY k),
        med AS (
          SELECT cum.k, min(cum.v) AS med
          FROM cum JOIN tot ON cum.k = tot.k
          WHERE cum.c * 2 >= tot.n GROUP BY cum.k),
        dev AS (
          SELECT base.k, abs(base.v - med.med) AS d, med.med
          FROM base JOIN med ON base.k = med.k),
        dcum AS (
          SELECT k, d,
                 count(*) OVER (PARTITION BY k ORDER BY d
                   RANGE BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS c
          FROM dev),
        mad AS (
          SELECT dcum.k, min(dcum.d) AS mad
          FROM dcum JOIN tot ON dcum.k = tot.k
          WHERE dcum.c * 2 >= tot.n GROUP BY dcum.k)
        SELECT dev.k AS event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(dev.med) AS median, min(mad.mad) AS mad,
               CAST(sum(CASE WHEN dev.d * {float(k_den)!r}
                   > {float(k_num)!r} * mad.mad
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev JOIN mad ON dev.k = mad.k
        GROUP BY dev.k ORDER BY dev.k
    """).fetchdf()
    _assert_same(got, want, f"mad_outliers({k_num}/{k_den})")


# ---------------------------------------------------------------- #
# equidepth_bins: sweep the bin count (registry config: 8)


@pytest.mark.parametrize("n_bins", [2, 3, 5, 8, 16])
def test_equidepth_bins_sweep(spark, duck, n_bins):
    ev = tables.load_table(spark, "events", SF_DIR)
    got = R.equidepth_bins(ev, "value", n_bins=n_bins).toPandas()
    want = duck.execute(f"""
        WITH vc AS (
          SELECT value AS v, count(*) AS c FROM events
          WHERE value IS NOT NULL AND NOT isnan(value)
          GROUP BY value),
        cum AS (
          SELECT v, c,
                 sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum
          FROM vc),
        tot AS (SELECT sum(c) AS n FROM vc),
        edges AS (
          SELECT CAST(i.i AS BIGINT) AS bin, cum.v AS hi,
                 cum.cum AS cum
          FROM cum CROSS JOIN tot,
               unnest(generate_series(
                 CAST((cum.cum - cum.c) * {n_bins} // tot.n + 1 AS BIGINT),
                 CAST(cum.cum * {n_bins} // tot.n AS BIGINT))) AS i(i))
        SELECT bin, hi,
               CAST(cum - COALESCE(lag(cum) OVER (ORDER BY bin), 0)
                 AS BIGINT) AS n_rows
        FROM edges ORDER BY bin
    """).fetchdf()
    _assert_same(got, want, f"equidepth_bins({n_bins})")
    assert len(got) == n_bins, f"expected exactly {n_bins} bins"


# ---------------------------------------------------------------- #
# quantile_match: sweep the reference key (registry config: 'click')


@pytest.mark.parametrize("ref", ["click", "view", "purchase", "error", "signup"])
def test_quantile_match_sweep(spark, duck, ref):
    ev = tables.load_table(spark, "events", SF_DIR)
    got = R.quantile_match(ev, "event_type", "value", ref).toPandas()
    want = duck.execute(f"""
        WITH base AS (
          SELECT event_type AS k, value AS v, count(*) AS c
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL
            AND NOT isnan(value)
          GROUP BY 1, 2),
        cum AS (
          SELECT k, v, c,
                 sum(c) OVER (PARTITION BY k ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS cum
          FROM base),
        tot AS (SELECT k, sum(c) AS n FROM base GROUP BY k),
        p AS (
          SELECT cum.k, cum.v, cum.c, cum.cum, tot.n
          FROM cum JOIN tot ON cum.k = tot.k),
        r AS (SELECT v AS rv, cum AS rcum FROM p
              WHERE k = '{ref}'),
        rn AS (SELECT n AS rn FROM tot WHERE k = '{ref}')
        SELECT p.k AS event_type, p.v AS value,
               CAST(p.c AS BIGINT) AS n,
               (SELECT min(r.rv) FROM r, rn
                WHERE r.rcum * p.n >= p.cum * rn.rn) AS matched
        FROM p ORDER BY event_type, value
    """).fetchdf()
    _assert_same(got, want, f"quantile_match(ref={ref})")


# ---------------------------------------------------------------- #
# skyline_2d: sweep the dimension pair (registry config:
# orders over (o_totalprice, o_orderdate))


@pytest.mark.parametrize(
    "xc,yc",
    [
        ("o_totalprice", "o_custkey"),
        ("o_custkey", "o_totalprice"),
    ],
)
def test_skyline_sweep(spark, duck, xc, yc):
    o = tables.load_table(spark, "orders", SF_DIR)
    got = (
        R.skyline_2d(o, xc, yc)
        .select("o_orderkey", xc, yc)
        .toPandas()
    )
    # quadratic NOT-EXISTS reference — independent of the sort-scan
    # identity the operator uses, so this checks the IDENTITY, not
    # just the plumbing
    want = duck.execute(f"""
        WITH base AS (
          SELECT o_orderkey, {xc} AS x, {yc} AS y FROM orders
          WHERE {xc} IS NOT NULL AND {yc} IS NOT NULL)
        SELECT b.o_orderkey, b.x AS {xc}, b.y AS {yc}
        FROM base b
        WHERE NOT EXISTS (
          SELECT 1 FROM base d
          WHERE d.x >= b.x AND d.y >= b.y
            AND (d.x > b.x OR d.y > b.y))
        ORDER BY b.o_orderkey
    """).fetchdf()
    _assert_same(got, want, f"skyline_2d({xc},{yc})")


# ---------------------------------------------------------------- #
# spearman_corr: sweep the column pair (registry config:
# n_items vs o_totalprice)


@pytest.mark.parametrize(
    "xc,yc,ybucket_div",
    [
        ("l_quantity", "l_extendedprice", 10000),
        ("l_discount", "l_tax", None),
    ],
)
def test_spearman_sweep(spark, duck, xc, yc, ybucket_div):
    li = tables.load_table(spark, "lineitem", SF_DIR).select(xc, yc)
    yb = (
        F.floor(F.col(yc) / ybucket_div)
        if ybucket_div
        else F.floor(F.col(yc) * 100)
    )
    got = R.spearman_corr(
        li, xc, yc, x_bucket=F.col(xc), y_bucket=yb
    ).toPandas()
    want = duck.execute(f"""
        WITH r AS (
          SELECT CAST(2 * rank() OVER (ORDER BY {xc})
                      + count(*) OVER (PARTITION BY {xc}) - 1
                   AS HUGEINT) AS u,
                 CAST(2 * rank() OVER (ORDER BY {yc})
                      + count(*) OVER (PARTITION BY {yc}) - 1
                   AS HUGEINT) AS v
          FROM lineitem),
        m AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(u) AS su, sum(v) AS sv,
                 sum(u * u) AS suu, sum(v * v) AS svv,
                 sum(u * v) AS suv
          FROM r)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n * suv - su * sv AS DOUBLE)
                 / (sqrt(CAST(n * suu - su * su AS DOUBLE))
                    * sqrt(CAST(n * svv - sv * sv AS DOUBLE))) AS rho
        FROM m
    """).fetchdf()
    _assert_same(got, want, f"spearman({xc},{yc})")


# ---------------------------------------------------------------- #
# topk_recent: sweep k (registry config: 168)


@pytest.mark.parametrize("k", [1, 7, 168, 500])
def test_topk_recent_sweep(spark, duck, k):
    ev = tables.load_table(spark, "events", SF_DIR)
    got = (
        R.topk_recent(ev, "ts", k, tiebreak=["event_id"])
        .select("event_id", "ts", "user_id", "event_type", "value")
        .toPandas()
    )
    want = duck.execute(f"""
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
               event_type, value
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT {k}
    """).fetchdf()
    _assert_same(got, want, f"topk_recent({k})")


# ---------------------------------------------------------------- #
# benford_audit: sweep the amount column (registry config:
# lineitem.l_extendedprice)


@pytest.mark.parametrize(
    "table,col", [("orders", "o_totalprice"), ("lineitem", "l_quantity")]
)
def test_benford_sweep(spark, duck, table, col):
    df = tables.load_table(spark, table, SF_DIR)
    got = R.benford_audit(df, col).toPandas()
    want = duck.execute(f"""
        WITH cnt AS (
          SELECT CAST(substr(CAST(CAST(floor({col})
                   AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                 count(*) AS n
          FROM {table}
          WHERE {col} IS NOT NULL AND {col} >= 1
          GROUP BY 1),
        tot AS (SELECT sum(n) AS t FROM cnt),
        spine AS (
          SELECT * FROM (VALUES
            (1, 301029), (2, 176091), (3, 124938), (4, 96910),
            (5, 79181), (6, 66946), (7, 57991), (8, 51152),
            (9, 45757)) AS e(digit, benford_ppm)),
        j AS (
          SELECT CAST(s.digit AS BIGINT) AS digit,
                 CAST(COALESCE(c.n, 0) AS BIGINT) AS n_obs,
                 CAST((1000000 * COALESCE(c.n, 0)) // tot.t
                   AS BIGINT) AS obs_ppm,
                 CAST(s.benford_ppm AS BIGINT) AS benford_ppm
          FROM spine s LEFT JOIN cnt c ON s.digit = c.digit
          CROSS JOIN tot)
        SELECT digit, n_obs, obs_ppm, benford_ppm,
               obs_ppm - benford_ppm AS delta_ppm
        FROM j ORDER BY digit
    """).fetchdf()
    _assert_same(got, want, f"benford({table}.{col})")


# ---------------------------------------------------------------- #
# numeric_drift: sweep the split day and bin width (registry
# config: day 15, width 25.0)


@pytest.mark.parametrize("days,bw", [(15, 25.0), (7, 10.0), (20, 50.0)])
def test_numeric_drift_sweep(spark, duck, days, bw):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.drift import (
        numeric_drift,
        split_at_day_boundary,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    ref, cur = split_at_day_boundary(ev, "ts", days)
    got = numeric_drift(ref, cur, "value", bin_width=bw).toPandas()
    want = duck.execute(f"""
        WITH b AS (
          SELECT date_trunc('day', min(ts)) + INTERVAL {days} DAY AS boundary
          FROM events),
        rsel AS (
          SELECT CAST(floor(value / {bw!r}) AS BIGINT) AS bin
          FROM events, b WHERE ts < boundary),
        csel AS (
          SELECT CAST(floor(value / {bw!r}) AS BIGINT) AS bin
          FROM events, b WHERE ts >= boundary),
        rc AS (SELECT bin, CAST(count(*) AS BIGINT) AS ref_n
               FROM rsel GROUP BY bin),
        cc AS (SELECT bin, CAST(count(*) AS BIGINT) AS cur_n
               FROM csel GROUP BY bin),
        j AS (
          SELECT coalesce(rc.bin, cc.bin) AS bin,
                 coalesce(ref_n, 0) AS ref_n,
                 coalesce(cur_n, 0) AS cur_n
          FROM rc FULL OUTER JOIN cc ON rc.bin = cc.bin),
        t AS (SELECT CAST(sum(ref_n) AS DOUBLE) AS rt,
                     CAST(sum(cur_n) AS DOUBLE) AS ct FROM j),
        rated AS (
          SELECT bin, ref_n, cur_n,
                 CAST(ref_n AS DOUBLE) / rt AS ref_rate,
                 CAST(cur_n AS DOUBLE) / ct AS cur_rate
          FROM j CROSS JOIN t)
        SELECT bin, ref_n, cur_n, ref_rate, cur_rate,
               abs(cur_rate - ref_rate) AS rate_diff,
               ((cur_rate - ref_rate) * (cur_rate - ref_rate))
                 / nullif(ref_rate, 0.0) AS chi2_term,
               abs(cur_rate - ref_rate) > 0.01 AS drifted
        FROM rated ORDER BY bin
    """).fetchdf()
    _assert_same(got, want, f"numeric_drift(day={days},bw={bw})")


# ---------------------------------------------------------------- #
# ks_two_sample: sweep the split predicate (registry config:
# doc_id % 2 == 0)


@pytest.mark.parametrize("mod", [3, 5])
def test_ks_split_sweep(spark, duck, mod):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.drift import (
        ks_two_sample,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR).select(
        TX.token_count(F.col("text")).cast("long").alias("n_tokens"),
        (F.col("doc_id") % mod == 0).alias("side"),
    )
    got = ks_two_sample(
        docs.withColumn("n_tokens", F.col("n_tokens").cast("double")),
        "n_tokens",
        "side",
    ).toPandas()
    want = duck.execute(f"""
        WITH d AS (
          SELECT CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS v,
                 doc_id % {mod} = 0 AS s
          FROM documents),
        pv AS (
          SELECT v,
                 sum(CASE WHEN s THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN s THEN 0 ELSE 1 END) AS cb
          FROM d GROUP BY v),
        cum AS (
          SELECT sum(ca) OVER (ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS cuma,
                 sum(cb) OVER (ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS cumb
          FROM pv),
        t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pv)
        SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
               CAST(max(abs(cum.cuma * t.nb - cum.cumb * t.na))
                 AS BIGINT) AS ks_num,
               CAST(t.na * t.nb AS BIGINT) AS ks_den,
               CAST(max(abs(cum.cuma * t.nb - cum.cumb * t.na))
                 AS DOUBLE) / CAST(t.na * t.nb AS DOUBLE) AS ks_stat
        FROM cum CROSS JOIN t GROUP BY t.na, t.nb
    """).fetchdf()
    _assert_same(got, want, f"ks_two_sample(mod={mod})")


# ---------------------------------------------------------------- #
# stratified_hash_sample: sweep the per-stratum rates (registry
# config: src0/.5 src1/.2 src2/.1) + the nested-sample property
# ACROSS rates (raising every rate strictly grows the sample)


@pytest.mark.parametrize(
    "rates",
    [
        {"src0": 0.25, "src1": 0.75},
        {"src3": 0.1, "src4": 1.0, "src5": 0.05},
    ],
)
def test_stratified_sample_sweep(spark, duck, rates):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        stratified_hash_sample,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = (
        stratified_hash_sample(docs, "doc_id", "source", rates)
        .select("doc_id", "source")
        .toPandas()
    )
    cond = " OR ".join(
        f"(source = '{s}' AND bkt < {int(r * 10000)})"
        for s, r in rates.items()
    )
    want = duck.execute(f"""
        WITH b AS (
          SELECT doc_id, source,
                 CAST(('0x' || substr(md5('sample' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
                   AS bkt
          FROM documents
        )
        SELECT doc_id, source FROM b
        WHERE {cond}
        ORDER BY doc_id
    """).fetchdf()
    _assert_same(got, want, f"stratified_sample({rates})")


def test_stratified_sample_nested(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        stratified_hash_sample,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    small = {
        f"src{i}": r for i, r in enumerate([0.1, 0.2, 0.3, 0.4, 0.5])
    }
    big = {s: min(1.0, r + 0.3) for s, r in small.items()}
    ids_small = {
        r.doc_id
        for r in stratified_hash_sample(docs, "doc_id", "source", small)
        .select("doc_id")
        .collect()
    }
    ids_big = {
        r.doc_id
        for r in stratified_hash_sample(docs, "doc_id", "source", big)
        .select("doc_id")
        .collect()
    }
    assert ids_small <= ids_big, (
        "nested-sample property violated: raising every stratum rate "
        "must only ADD rows"
    )
    assert len(ids_big) > len(ids_small)


# ---------------------------------------------------------------- #
# session_window_stats: sweep the session gap (registry config:
# 28800 s) — exercises the merge semantics at gaps from 10 min to
# a day


@pytest.mark.parametrize("gap", [600, 3600, 28800, 86400])
def test_session_gap_sweep(spark, duck, gap):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sessions import (
        session_window_stats,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    got = session_window_stats(ev, gap_seconds=gap).toPandas()
    want = duck.execute(f"""
        WITH ordered AS (
          SELECT user_id, ts, event_id,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_ts
          FROM events
        ), flagged AS (
          SELECT user_id, ts,
                 CASE WHEN prev_ts IS NULL
                           OR epoch(ts) - epoch(prev_ts) > {gap}
                      THEN 1 ELSE 0 END AS is_new
          FROM ordered
        ), sess AS (
          SELECT user_id, ts,
                 sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS session_id
          FROM flagged
        )
        SELECT user_id,
               CAST(min(ts) AS TIMESTAMP) AS session_start,
               CAST(max(ts) + INTERVAL {gap} SECONDS AS TIMESTAMP)
                 AS session_end,
               count(*) AS n_events
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """).fetchdf()
    _assert_same(got, want, f"session_window(gap={gap})")


# ---------------------------------------------------------------- #
# quota_cap: sweep the cap AND both execution paths (plain window
# vs spray two-phase skew cut; registry config: cap=3, spray=8)


@pytest.mark.parametrize("cap,spray", [(1, None), (1, 8), (3, 8), (10, None), (10, 8)])
def test_quota_cap_sweep(spark, duck, cap, spray):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        quota_cap,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = (
        quota_cap(docs, "source", cap=cap, spray=spray)
        .select("doc_id", "source")
        .toPandas()
    )
    want = duck.execute(f"""
        SELECT doc_id, source
        FROM documents
        QUALIFY row_number() OVER (PARTITION BY source
                                   ORDER BY doc_id) <= {cap}
        ORDER BY source, doc_id
    """).fetchdf()
    _assert_same(got, want, f"quota_cap({cap},spray={spray})")


# ---------------------------------------------------------------- #
# percentile: sweep the p-values (registry config: .5/.9/.99) —
# Spark F.percentile vs DuckDB quantile_cont, both exact
# interpolated sort-based


@pytest.mark.parametrize("p", [0.25, 0.75, 0.95])
def test_percentile_sweep(spark, duck, p):
    ev = tables.load_table(spark, "events", SF_DIR)
    got = (
        ev.groupBy("event_type")
        .agg(F.percentile("value", p).alias("pv"))
        .orderBy("event_type")
        .toPandas()
    )
    want = duck.execute(f"""
        SELECT event_type, quantile_cont(value, {p!r}) AS pv
        FROM events GROUP BY event_type ORDER BY event_type
    """).fetchdf()
    _assert_same(got, want, f"percentile({p})")


# ---------------------------------------------------------------- #
# hourly_autocorrelation: sweep max_lag (registry config: 24)


@pytest.mark.parametrize("max_lag", [2, 6, 24])
def test_hourly_acf_sweep(spark, duck, max_lag):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans import (
        analytics as A,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    got = A.hourly_autocorrelation(ev, max_lag=max_lag).toPandas()
    import __spark_entry__ as entry_mod

    sql = entry_mod.oracle_sql()["hourly_acf"].replace(
        "generate_series(1, 24)", f"generate_series(1, {max_lag})"
    )
    assert f"generate_series(1, {max_lag})" in sql
    want = duck.execute(sql).fetchdf()
    _assert_same(got, want, f"hourly_acf(max_lag={max_lag})")


# ---------------------------------------------------------------- #
# ngram_jaccard_pairs: sweep threshold and df cap (registry config:
# threshold=0.5, max_df=6) — the cap changes WHICH shingles index
# AND the set sizes, so both arms of the identity move together


@pytest.mark.parametrize("threshold,max_df", [(0.5, 6), (0.3, 20), (0.7, 3)])
def test_ngram_jaccard_sweep(spark, duck, threshold, max_df):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        dedup as D,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = D.ngram_jaccard_pairs(
        docs, threshold=threshold, max_df=max_df
    ).toPandas()
    want = duck.execute(f"""
        WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS tk
                      FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(
                 generate_series(1, greatest(len(tk) - 2, 0)),
                 i -> array_to_string(tk[i:i+2], ' '))) AS shs
               FROM toks),
        inv AS (SELECT doc_id, unnest(shs) AS s FROM sh),
        df AS (SELECT s, count(*) AS df FROM inv GROUP BY 1),
        inv2 AS (SELECT i.doc_id, i.s FROM inv i
                 JOIN df ON i.s = df.s WHERE df.df <= {max_df}),
        sizes2 AS (SELECT doc_id, count(*) AS n FROM inv2 GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
          FROM inv2 a JOIN inv2 b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               c * 1.0 / (sa.n + sb.n - c) AS jaccard
        FROM inter
        JOIN sizes2 sa ON doc_a = sa.doc_id
        JOIN sizes2 sb ON doc_b = sb.doc_id
        WHERE c * 1.0 / (sa.n + sb.n - c) >= {threshold!r}
        ORDER BY doc_a, doc_b
    """).fetchdf()
    _assert_same(got, want, f"ngram_jaccard(t={threshold},df={max_df})")


# ---------------------------------------------------------------- #
# heavy_hitters: sweep the frequency divisor k (registry config:
# 100) — the Misra-Gries candidate pass + exact recount must equal
# the full GROUP BY at every threshold


@pytest.mark.parametrize("k", [10, 100, 1000])
def test_heavy_hitters_sweep(spark, duck, k):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.heavy import (
        heavy_hitters,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    toks = tables.load_table(spark, "documents", SF_DIR).select(
        F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    got = heavy_hitters(toks, "token", k=k).toPandas()
    want = duck.execute(f"""
        WITH tok AS (
          SELECT unnest(string_split(trim(text), ' ')) AS item
          FROM documents),
        tot AS (SELECT count(*) AS n FROM tok)
        SELECT item, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM tok, tot GROUP BY item, n HAVING count(*) > n / {k}
        ORDER BY n_occurrences DESC, item
    """).fetchdf()
    _assert_same(got, want, f"heavy_hitters(k={k})")


# ---------------------------------------------------------------- #
# chunk_documents: sweep (window, overlap) incl. overlap=0 (registry
# config: 32/8) — chunk boundaries and the short-tail chunk are
# byte-exact at every geometry


@pytest.mark.parametrize("w,ov", [(32, 8), (16, 0), (64, 32)])
def test_chunking_sweep(spark, duck, w, ov):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = (
        TX.chunk_documents(docs, window=w, overlap=ov)
        .orderBy("doc_id", "chunk_idx")
        .toPandas()
    )
    stride = w - ov
    want = duck.execute(f"""
        WITH t AS (
          SELECT doc_id, string_split(trim(text), ' ') AS tk
          FROM documents
        ),
        c AS (
          SELECT doc_id, tk,
                 unnest(generate_series(
                   0,
                   CAST(ceil(greatest(len(tk) - {w}, 0) / {stride}.0)
                        AS BIGINT))) AS k
          FROM t
        )
        SELECT doc_id,
               CAST(k AS BIGINT) AS chunk_idx,
               CAST(len(tk[k * {stride} + 1 : k * {stride} + {w}]) AS BIGINT)
                 AS n_chunk_tokens,
               array_to_string(tk[k * {stride} + 1 : k * {stride} + {w}], ' ')
                 AS chunk_text
        FROM c
        ORDER BY doc_id, chunk_idx
    """).fetchdf()
    _assert_same(got, want, f"chunks({w},{ov})")


# ---------------------------------------------------------------- #
# hourly_cusum_changepoints: sweep the slack and alarm rationals
# (registry config: k = mu/4, h = 3*mu)


@pytest.mark.parametrize(
    "s_num,s_den,h_num,h_den",
    [(1, 4, 3, 1), (1, 2, 1, 1), (1, 8, 2, 1)],
)
def test_cusum_sweep(spark, duck, s_num, s_den, h_num, h_den):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans import (
        analytics as A,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    got = A.hourly_cusum_changepoints(
        ev, slack_num=s_num, slack_den=s_den, h_num=h_num, h_den=h_den
    ).toPandas()
    want = duck.execute(f"""
        WITH cnt AS (
          SELECT event_type,
                 CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_hour,
                 count(*) AS n
          FROM events GROUP BY 1, 2),
        params AS (
          SELECT event_type,
                 (1000000 * sum(n)) // count(*) AS mu_s
          FROM cnt GROUP BY event_type),
        p2 AS (
          SELECT event_type, mu_s,
                 ({s_num} * mu_s) // {s_den} AS k_s,
                 ({h_num} * mu_s) // {h_den} AS h_s
          FROM params),
        pre AS (
          SELECT cnt.event_type, cnt.ts_hour, cnt.n, p2.h_s,
                 sum(cnt.n * 1000000 - p2.mu_s - p2.k_s) OVER (
                   PARTITION BY cnt.event_type ORDER BY cnt.ts_hour
                   ROWS UNBOUNDED PRECEDING) AS p
          FROM cnt JOIN p2 ON cnt.event_type = p2.event_type),
        cus AS (
          SELECT event_type, ts_hour, n, h_s,
                 p - least(0, min(p) OVER (
                   PARTITION BY event_type ORDER BY ts_hour
                   ROWS UNBOUNDED PRECEDING)) AS cusum_s
          FROM pre)
        SELECT event_type, ts_hour, CAST(n AS BIGINT) AS n,
               CAST(cusum_s AS BIGINT) AS cusum_s
        FROM cus WHERE cusum_s > h_s
        ORDER BY event_type, ts_hour
    """).fetchdf()
    for df in (got, want):
        df["ts_hour"] = pd.to_datetime(df["ts_hour"]).astype("datetime64[us]")
    _assert_same(got, want, f"cusum(k={s_num}/{s_den},h={h_num}/{h_den})")


# ---------------------------------------------------------------- #
# ntile quantile report: sweep the tile count (registry config: 4)


@pytest.mark.parametrize("n_tiles", [2, 4, 10])
def test_ntile_sweep(spark, duck, n_tiles):
    from pyspark.sql import Window

    c = tables.load_table(spark, "customer", SF_DIR)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    got = (
        c.withColumn("quartile", F.ntile(n_tiles).over(w))
        .groupBy("c_nationkey", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("lo_bal"),
            F.max("c_acctbal").alias("hi_bal"),
        )
        .orderBy("c_nationkey", "quartile")
        .toPandas()
    )
    want = duck.execute(f"""
        WITH q AS (
          SELECT c_nationkey, c_acctbal,
                 ntile({n_tiles}) OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal, c_custkey)
                   AS quartile
          FROM customer
        )
        SELECT c_nationkey, CAST(quartile AS INTEGER) AS quartile,
               count(*) AS n,
               min(c_acctbal) AS lo_bal,
               max(c_acctbal) AS hi_bal
        FROM q
        GROUP BY c_nationkey, quartile
        ORDER BY c_nationkey, quartile
    """).fetchdf()
    _assert_same(got, want, f"ntile({n_tiles})")


# ---------------------------------------------------------------- #
# with_split: sweep the fraction map (registry config:
# train .9 / val .05 / test rest)


@pytest.mark.parametrize(
    "w_train,w_val", [(0.9, 0.05), (0.6, 0.2), (0.33, 0.33)]
)
def test_with_split_sweep(spark, duck, w_train, w_val):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        with_split,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = (
        with_split(docs, "doc_id", {"train": w_train, "val": w_val, "test": 0.0})
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
        .toPandas()
    )
    t1 = int(round(w_train * 10000))
    t2 = t1 + int(round(w_val * 10000))
    want = duck.execute(f"""
        WITH b AS (
          SELECT n_chars,
                 CAST(('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
                   AS bkt
          FROM documents
        ), s AS (
          SELECT n_chars,
                 CASE WHEN bkt < {t1} THEN 'train'
                      WHEN bkt < {t2} THEN 'val'
                      ELSE 'test' END AS split
          FROM b
        )
        SELECT split, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM s GROUP BY split ORDER BY split
    """).fetchdf()
    _assert_same(got, want, f"with_split({w_train},{w_val})")


# ---------------------------------------------------------------- #
# epoch_upsample: sweep the per-stratum epoch map (registry config:
# en 2.5 / de 1.25 / fr 0.5 / es 1.0)


@pytest.mark.parametrize(
    "eps",
    [
        {"en": 2.5, "de": 1.25, "fr": 0.5, "es": 1.0},
        {"en": 1.75, "de": 0.25, "fr": 3.0, "zh": 2.0},
    ],
)
def test_epoch_upsample_sweep(spark, duck, eps):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        epoch_upsample,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = (
        epoch_upsample(docs, "doc_id", "lang", eps)
        .select("doc_id", "lang", "copy_idx")
        .toPandas()
    )
    case = " ".join(f"WHEN '{k}' THEN {v!r}" for k, v in eps.items())
    want = duck.execute(f"""
        WITH e AS (
          SELECT doc_id, lang,
                 CASE lang {case} END AS ep,
                 CAST(('0x' || substr(md5('epochs' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
                   AS bkt
          FROM documents
        ), c AS (
          SELECT doc_id, lang,
                 CAST(floor(ep)
                      + CASE WHEN bkt < (ep - floor(ep)) * 10000
                             THEN 1 ELSE 0 END AS BIGINT) AS n
          FROM e WHERE ep IS NOT NULL
        )
        SELECT doc_id, lang,
               CAST(unnest(generate_series(1, n)) AS BIGINT) AS copy_idx
        FROM c
        ORDER BY doc_id, copy_idx
    """).fetchdf()
    _assert_same(got, want, f"epoch_upsample({sorted(eps)})")


# ---------------------------------------------------------------- #
# bm25_search: sweep k1/b (registry config: k1=1.2, b=0.75, k=20) —
# b=0 turns length normalization off entirely, k1 moves the tf
# saturation ceiling; the fixed-point identity must hold at every
# setting


@pytest.mark.parametrize(
    "terms,k,k1s,bs",
    [
        ("vector stream merge window", 20, 1_200_000, 750_000),
        ("vector window", 5, 2_000_000, 0),
        ("merge stream", 10, 500_000, 1_000_000),
    ],
)
def test_bm25_param_sweep(spark, duck, terms, k, k1s, bs):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = TX.bm25_search(
        docs, terms, k=k, k1_scaled=k1s, b_scaled=bs
    ).toPandas()
    tlist = ", ".join(f"'{t}'" for t in terms.split())
    want = duck.execute(f"""
        WITH q AS (
          SELECT unnest([{tlist}]) AS t),
        stats AS (
          SELECT count(*) AS n,
                 sum(len(string_split(trim(text), ' '))) AS l
          FROM documents),
        tok AS (
          SELECT doc_id,
                 len(string_split(trim(text), ' ')) AS dl,
                 unnest(string_split(trim(text), ' ')) AS t
          FROM documents),
        hits AS (SELECT tok.doc_id, tok.dl, tok.t
                 FROM tok JOIN q ON q.t = tok.t),
        dfs AS (SELECT t, count(DISTINCT doc_id) AS df
                FROM hits GROUP BY t),
        idf AS (
          SELECT t,
                 CAST(floor(1000000 * ln(1 +
                   CAST(2*n - 2*df + 1 AS DOUBLE)
                   / CAST(2*df + 1 AS DOUBLE))) AS BIGINT) AS idf_s
          FROM dfs CROSS JOIN stats),
        tfs AS (SELECT doc_id, dl, t, count(*) AS tf
                FROM hits GROUP BY doc_id, dl, t),
        scored AS (
          SELECT tfs.doc_id,
                 sum(idf.idf_s * (
                   (CAST(tfs.tf AS HUGEINT) * {k1s + 1_000_000} * 1000000)
                   // (CAST(tfs.tf AS HUGEINT) * 1000000
                       + (CAST({k1s} AS HUGEINT) *
                          (1000000 - {bs}
                           + CAST({bs} AS HUGEINT)
                             * tfs.dl * stats.n // stats.l))
                         // 1000000))) AS score
          FROM tfs JOIN idf ON tfs.t = idf.t CROSS JOIN stats
          GROUP BY tfs.doc_id)
        SELECT doc_id, CAST(score AS BIGINT) AS score
        FROM scored ORDER BY score DESC, doc_id LIMIT {k}
    """).fetchdf()
    _assert_same(got, want, f"bm25(k1s={k1s},bs={bs},k={k})")


# ---------------------------------------------------------------- #
# edit_distance_pairs (Ed-Join): sweep the distance bound — the
# q-gram prefix filter's zero-false-negative guarantee must hold at
# every max_dist, certified by the brute-force levenshtein twin
# (registry config: max_dist=2)


@pytest.mark.parametrize("d", [1, 2, 3])
def test_edjoin_distance_sweep(spark, duck, d):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        dedup as D,
    )

    part = tables.load_table(spark, "part", SF_DIR)
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("id"))
    got = D.edit_distance_pairs(
        names.select("id", F.col("p_name").alias("s")), max_dist=d
    ).toPandas()
    want = duck.execute(f"""
        WITH p AS (
          SELECT min(p_partkey) AS id, p_name AS s
          FROM part GROUP BY p_name)
        SELECT a.id AS id1, b.id AS id2,
               CAST(levenshtein(a.s, b.s) AS INT) AS dist
        FROM p a JOIN p b
          ON a.id < b.id AND abs(len(a.s) - len(b.s)) <= {d}
        WHERE levenshtein(a.s, b.s) <= {d}
        ORDER BY id1, id2
    """).fetchdf()
    _assert_same(got, want, f"edjoin(d={d})")


# ---------------------------------------------------------------- #
# winnow_pairs: sweep the window size / df cap / pair threshold
# (registry config: w=4, max_df=50, min_shared=2) — w moves which
# grams become fingerprints, the cap moves which posting lists join


@pytest.mark.parametrize(
    "w,max_df,ms", [(4, 50, 2), (8, 50, 2), (4, 10, 3)]
)
def test_winnow_sweep(spark, duck, w, max_df, ms):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        dedup as D,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = D.winnow_pairs(
        docs, min_shared=ms, k=3, w=w, max_df=max_df
    ).toPandas()
    want = duck.execute(f"""
        WITH toks AS (
          SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
        g AS (
          SELECT doc_id, i - 1 AS pos, len(tk) - 3 + 1 AS ng,
                 array_to_string(tk[i:i+2], ' ') AS gram
          FROM toks,
               unnest(generate_series(1, greatest(len(tk) - 2, 0)))
                 AS r(i)),
        keyed AS (
          SELECT doc_id, pos, ng,
                 CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) * 2097152 + (1048576 - pos)
                   AS key
          FROM g),
        wins AS (
          SELECT doc_id, pos, ng,
                 min(key) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW
                                AND {w - 1} FOLLOWING) AS wkey
          FROM keyed),
        sel AS (
          SELECT DISTINCT doc_id, wkey // 2097152 AS fp
          FROM wins WHERE pos = 0 OR pos <= ng - {w}),
        capped AS (
          SELECT fp FROM sel GROUP BY fp HAVING count(*) <= {max_df}),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sel a JOIN capped USING (fp) JOIN sel b USING (fp)
          WHERE a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, count(*) AS n_shared
        FROM pairs GROUP BY doc_a, doc_b HAVING count(*) >= {ms}
        ORDER BY n_shared DESC, doc_a, doc_b
    """).fetchdf()
    _assert_same(got, want, f"winnow(w={w},df={max_df},ms={ms})")


# ---------------------------------------------------------------- #
# containment_pairs: sweep the directed threshold (registry
# config: 0.9)


@pytest.mark.parametrize("threshold", [0.9, 0.5])
def test_containment_sweep(spark, duck, threshold):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        dedup as D,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = D.containment_pairs(docs, threshold=threshold).toPandas()
    want = duck.execute(f"""
        WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS tk
                      FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(
                 generate_series(1, greatest(len(tk) - 2, 0)),
                 i -> array_to_string(tk[i:i+2], ' '))) AS shs
               FROM toks),
        sizes AS (SELECT doc_id, len(shs) AS n FROM sh),
        inv AS (SELECT doc_id, unnest(shs) AS s FROM sh),
        cand AS (
          SELECT a.doc_id AS da, b.doc_id AS db,
                 CAST(count(*) AS BIGINT) AS inter
          FROM inv a JOIN inv b
            ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY da, db),
        dir AS (
          SELECT da AS inner_doc, db AS outer_doc,
                 (inter * 1.0) / sa.n AS containment
          FROM cand JOIN sizes sa ON da = sa.doc_id
          UNION ALL
          SELECT db, da, (inter * 1.0) / sb.n
          FROM cand JOIN sizes sb ON db = sb.doc_id)
        SELECT inner_doc, outer_doc, containment
        FROM dir WHERE containment >= {threshold!r}
        ORDER BY inner_doc, outer_doc
    """).fetchdf()
    _assert_same(got, want, f"containment({threshold})")


def test_spearman_zero_variance_is_null_both_engines(spark, duck):
    # a constant column makes the exact-moment denominator 0; Spark's
    # double division and DuckDB's both yield NULL (neither raises,
    # neither returns inf) — pin the parity so a future guard or
    # engine change can't silently diverge
    import pandas as pd

    pdf = pd.DataFrame(
        {"x": [1.0, 1.0, 1.0, 1.0], "y": [1.0, 2.0, 3.0, 4.0]}
    )
    sdf = spark.createDataFrame(pdf)
    got = R.spearman_corr(
        sdf, "x", "y", x_bucket=F.col("x"), y_bucket=F.col("y")
    ).collect()
    assert len(got) == 1 and got[0]["n"] == 4 and got[0]["rho"] is None
    duck.register("zv", pdf)
    want = duck.execute("""
        WITH r AS (
          SELECT CAST(2 * rank() OVER (ORDER BY x)
                      + count(*) OVER (PARTITION BY x) - 1 AS HUGEINT) AS u,
                 CAST(2 * rank() OVER (ORDER BY y)
                      + count(*) OVER (PARTITION BY y) - 1 AS HUGEINT) AS v
          FROM zv),
        m AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(u) AS su, sum(v) AS sv, sum(u*u) AS suu,
                 sum(v*v) AS svv, sum(u*v) AS suv
          FROM r)
        SELECT CAST(n * suv - su * sv AS DOUBLE)
                 / (sqrt(CAST(n * suu - su * su AS DOUBLE))
                    * sqrt(CAST(n * svv - sv * sv AS DOUBLE))) AS rho
        FROM m
    """).fetchone()
    duck.unregister("zv")
    assert want[0] is None


# ---------------------------------------------------------------- #
# binary_hamming_topk: sweep k / coarse_k / query-set size
# (registry config: k=10, coarse_k=50, queries = vec_id < 8) — the
# per-partition coarse prune must stay lossless at shallow cuts
# (k = coarse_k stresses the tie edge) and wider query sets


@pytest.mark.parametrize(
    "k,ck,qmax",
    [(10, 50, 8), (3, 5, 4), (5, 5, 2), (20, 100, 16)],
)
def test_binary_ann_sweep(spark, duck, k, ck, qmax):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        similarity as S,
    )

    con = duck
    con.execute(
        f"CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    emb = tables.load_table(spark, "embeddings", SF_DIR)
    got = S.binary_hamming_topk(
        emb, F.col("vec_id") < qmax, k=k, coarse_k=ck
    ).toPandas()
    want = con.execute(f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        d AS (
          SELECT vec_id, i, v[i + 1] AS val
          FROM e, unnest(range(0, 64)) AS r(i)),
        bits AS (
          SELECT vec_id,
                 sum(CASE WHEN i < 32 AND val > 0
                     THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS lo,
                 sum(CASE WHEN i >= 32 AND val > 0
                     THEN CAST(1 AS BIGINT) << (i - 32)
                     ELSE 0 END) AS hi
          FROM d GROUP BY vec_id),
        b2 AS (
          SELECT bits.vec_id, bits.lo, bits.hi, e.v
          FROM bits JOIN e ON bits.vec_id = e.vec_id),
        q AS (
          SELECT vec_id AS query_id, lo AS qlo, hi AS qhi, v AS qv
          FROM b2 WHERE vec_id < {qmax}),
        cand AS (
          SELECT q.query_id, c.vec_id,
                 CAST(bit_count(xor(c.lo, q.qlo))
                   + bit_count(xor(c.hi, q.qhi)) AS BIGINT)
                   AS hamming,
                 c.v, q.qv
          FROM b2 c JOIN q ON c.vec_id <> q.query_id),
        coarse AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY hamming, vec_id) AS g
          FROM cand),
        fine AS (
          SELECT query_id, vec_id, hamming,
                 list_dot_product(v, qv)
                   / (sqrt(list_dot_product(v, v))
                      * sqrt(list_dot_product(qv, qv))) AS cosine
          FROM coarse WHERE g <= {ck}),
        ranked AS (
          SELECT query_id, vec_id, hamming, cosine,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
          FROM fine)
        SELECT query_id, vec_id, hamming, cosine, rank
        FROM ranked WHERE rank <= {k}
        ORDER BY query_id, rank
    """).fetchdf()
    _assert_same(got, want, f"binary_ann(k={k},ck={ck},q<{qmax})")


# ---------------------------------------------------------------- #
# as-of join (VERDICT r9 Next #4): sweep the tolerance window AND the
# execution strategy — asof_join (union-and-window) and
# asof_join_broadcast (sorted-build + searchsorted probe) must be
# row-identical to each other and to DuckDB's native ASOF LEFT JOIN
# at every tolerance. ties=True builds the right side from ALL event
# types, so every purchase has a right row at EXACTLY its own
# timestamp — the inclusive >= tie edge is exercised for every left
# row instead of being left to data luck (at sf0.001 there are ZERO
# natural purchase/view exact-ts collisions).
# (registry config: asof_purchase_view — purchase vs view,
# tolerance_hours=None — is the (None, False) case)


@pytest.mark.parametrize(
    "tol,ties",
    [
        (None, False),  # registry config
        (None, True),
        (1, True),
        (6, True),
        (24, False),
        (168, True),
    ],
)
def test_asof_join_sweep(spark, duck, tol, ties):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        asof as AS,
    )

    rtypes = (
        ("view", "click", "error", "signup", "purchase")
        if ties
        else ("view",)
    )
    ev = tables.load_table(spark, "events", SF_DIR)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    right = (
        ev.filter(F.col("event_type").isin(*rtypes))
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    got_uw = AS.asof_join(
        left, right, keys=["user_id"], left_ts="ts", right_ts="ts",
        tolerance_hours=tol,
    ).toPandas()
    got_bc = AS.asof_join_broadcast(
        left, right, keys=["user_id"], left_ts="ts", right_ts="ts",
        tolerance_hours=tol,
    ).toPandas()
    keep = (
        "TRUE" if tol is None
        else f"matched_ts >= ts - INTERVAL {tol} HOUR"
    )
    in_list = ", ".join(f"'{t}'" for t in rtypes)
    want = duck.execute(f"""
        WITH l AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
          FROM events WHERE event_type = 'purchase'),
        r AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                 max(value) AS value
          FROM events WHERE event_type IN ({in_list}) GROUP BY 1, 2),
        m AS (
          SELECT l.user_id, l.ts, l.event_id, l.value,
                 r.value AS value_right, r.ts AS matched_ts
          FROM l ASOF LEFT JOIN r
            ON l.user_id = r.user_id AND l.ts >= r.ts)
        SELECT user_id, ts, event_id, value,
               CASE WHEN {keep} THEN value_right END AS value_right,
               CASE WHEN {keep} THEN matched_ts END AS matched_ts
        FROM m ORDER BY user_id, ts, event_id
    """).fetchdf()
    _assert_same(got_uw, want, f"asof_join(tol={tol},ties={ties})")
    _assert_same(got_bc, want, f"asof_broadcast(tol={tol},ties={ties})")
    # ties=True makes the exact-ts edge non-vacuous: every purchase
    # matches at distance zero when no tolerance excludes it
    if ties and tol is None:
        assert (got_uw["matched_ts"] == got_uw["ts"]).all()


# ---------------------------------------------------------------- #
# funnel (VERDICT r9 Next #4): sweep the step-order permutations, the
# funnel depth, and the conversion window against a templated chain
# of the registry oracle's CTEs. Step order is semantic, not
# cosmetic — 'click before view' counts a different population — so
# every permutation of the 3-step funnel runs, plus a 4-step funnel
# and the unbounded-gap form.
# (registry config: event_funnel — [view, click, purchase], gap 24h)


def _funnel_twin_sql(steps: list[str], gap_hours: int | None) -> str:
    ctes = [
        f"s1 AS (SELECT user_id, min(ts) AS t1 FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i in range(2, len(steps) + 1):
        gap_cond = (
            f"AND e.ts <= s{i-1}.t{i-1} + INTERVAL {gap_hours} HOUR"
            if gap_hours is not None
            else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t{i} "
            f"FROM events e JOIN s{i-1} ON e.user_id = s{i-1}.user_id "
            f"WHERE e.event_type = '{steps[i-1]}' "
            f"AND e.ts > s{i-1}.t{i-1} {gap_cond} GROUP BY e.user_id)"
        )
    rows = " UNION ALL ".join(
        f"SELECT {i} AS step, '{s}' AS step_name, "
        f"(SELECT count(*) FROM s{i}) AS n_users"
        for i, s in enumerate(steps, start=1)
    )
    return f"WITH {', '.join(ctes)} SELECT * FROM ({rows}) ORDER BY step"


@pytest.mark.parametrize(
    "steps,gap",
    [
        (["view", "click", "purchase"], 24),  # registry config
        (["view", "purchase", "click"], 24),
        (["click", "view", "purchase"], 24),
        (["click", "purchase", "view"], 24),
        (["purchase", "view", "click"], 24),
        (["purchase", "click", "view"], 24),
        (["view", "click", "purchase"], 1),
        (["view", "click", "purchase"], None),
        (["signup", "view", "click", "purchase"], 24),
    ],
)
def test_funnel_sweep(spark, duck, steps, gap):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.funnel import (
        funnel_counts,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    got = funnel_counts(ev, steps, max_gap_hours=gap).toPandas()
    want = duck.execute(_funnel_twin_sql(steps, gap)).fetchdf()
    _assert_same(got, want, f"funnel({steps},gap={gap})")
    # the funnel invariant the operator promises: monotone reach
    assert list(got.sort_values("step")["n_users"]) == sorted(
        got["n_users"], reverse=True
    )


# ---------------------------------------------------------------- #
# SCD2 (VERDICT r9 Next #4): sweep the snapshot histories — change
# cadence, deletion/reappearance, NON-DENSE version numbers, history
# depth — against a templated generalization of the registry oracle.
# Each snapshot is ONE SQL string evaluated by BOTH engines (Spark
# temp view / DuckDB view), so the swept history is embedded in the
# case itself and cannot diverge between the two sides. The template
# ranks contiguity on the DENSE version index (a VALUES dimension
# carrying v -> (index, next-version)), which is what distinguishes
# the operator's "global version order" semantics from the registry
# oracle's dense-history shortcut (last_v + 1).
# (registry config: orders_scd2 — versions 1/2/3, %7->'X' at v2,
# %5->'Y' + %7->'X' + delete %11 at v3 — is the first case)

_SCD2_REG = [
    (1, "SELECT o_orderkey, o_orderstatus FROM {tbl}"),
    (2, "SELECT o_orderkey, CASE WHEN o_orderkey % 7 = 0 THEN 'X' "
        "ELSE o_orderstatus END AS o_orderstatus FROM {tbl}"),
    (3, "SELECT o_orderkey, CASE WHEN o_orderkey % 5 = 0 THEN 'Y' "
        "WHEN o_orderkey % 7 = 0 THEN 'X' "
        "ELSE o_orderstatus END AS o_orderstatus FROM {tbl} "
        "WHERE o_orderkey % 11 != 0"),
]
_SCD2_CASES = {
    "registry": _SCD2_REG,
    # every key changes at EVERY version: all runs are length 1 —
    # the back-to-back supersession edge (no stable run anywhere)
    "churn": [
        (1, "SELECT o_orderkey, o_orderstatus FROM {tbl}"),
        (2, "SELECT o_orderkey, 'A' AS o_orderstatus FROM {tbl}"),
        (3, "SELECT o_orderkey, o_orderstatus FROM {tbl}"),
    ],
    # %3 keys vanish at v2 and REAPPEAR at v3 with the same value:
    # the contiguity break must close [1,2) and open a NEW current
    # run at 3 even though the value never changed
    "reappear": [
        (1, "SELECT o_orderkey, o_orderstatus FROM {tbl}"),
        (2, "SELECT o_orderkey, o_orderstatus FROM {tbl} "
            "WHERE o_orderkey % 3 != 0"),
        (3, "SELECT o_orderkey, o_orderstatus FROM {tbl}"),
    ],
    # NON-DENSE version numbers (1, 5, 9): valid_from/valid_to must be
    # the actual next VERSION (vnext), not last_v + 1 — the dense
    # shortcut would emit valid_to 2/6 instead of 5/9
    "sparse": [
        (1, "SELECT o_orderkey, o_orderstatus FROM {tbl}"),
        (5, "SELECT o_orderkey, CASE WHEN o_orderkey % 4 = 0 THEN 'Z' "
            "ELSE o_orderstatus END AS o_orderstatus FROM {tbl}"),
        (9, "SELECT o_orderkey, o_orderstatus FROM {tbl} "
            "WHERE o_orderkey % 13 != 0"),
    ],
    # minimal two-snapshot history with deletions
    "two": [
        (1, "SELECT o_orderkey, o_orderstatus FROM {tbl}"),
        (2, "SELECT o_orderkey, CASE WHEN o_orderkey % 2 = 0 THEN 'E' "
            "ELSE o_orderstatus END AS o_orderstatus FROM {tbl} "
            "WHERE o_orderkey % 9 != 0"),
    ],
}


def _scd2_twin_sql(cfg: list) -> str:
    """DuckDB twin of scd2_intervals over the config's snapshots
    (snapshot SQL templated on {tbl} = the orders view)."""
    order = sorted(v for v, _ in cfg)
    vmax = order[-1]
    vnext = {order[i]: order[i + 1] for i in range(len(order) - 1)}
    u = " UNION ALL ".join(
        f"SELECT o_orderkey, o_orderstatus, {v} AS v "
        f"FROM ({sql.format(tbl='orders')})"
        for v, sql in cfg
    )
    vd = ", ".join(
        f"({v}, {i}, "
        + (f"{vnext[v]}" if v in vnext else "CAST(NULL AS BIGINT)")
        + ")"
        for i, v in enumerate(order)
    )
    return f"""
        WITH u AS ({u}),
        vd(v, vi, vnext) AS (VALUES {vd}),
        uv AS (SELECT u.*, vd.vi FROM u JOIN vd ON u.v = vd.v),
        lagged AS (
          SELECT *, lag(o_orderstatus) OVER w AS pstat,
                 lag(vi) OVER w AS pvi
          FROM uv WINDOW w AS (PARTITION BY o_orderkey ORDER BY vi)),
        brk AS (
          SELECT *, CASE WHEN pvi IS NULL OR vi != pvi + 1
                          OR o_orderstatus IS DISTINCT FROM pstat
                     THEN 1 ELSE 0 END AS b
          FROM lagged),
        runs AS (
          SELECT *, sum(b) OVER (PARTITION BY o_orderkey ORDER BY vi
                                 ROWS UNBOUNDED PRECEDING) AS run
          FROM brk),
        g AS (
          SELECT o_orderkey, run, min(o_orderstatus) AS o_orderstatus,
                 CAST(min(v) AS BIGINT) AS valid_from, max(v) AS last_v
          FROM runs GROUP BY o_orderkey, run)
        SELECT g.o_orderkey, g.o_orderstatus, g.valid_from,
               CAST(vd.vnext AS BIGINT) AS valid_to,
               (g.last_v = {vmax}) AS is_current
        FROM g JOIN vd ON g.last_v = vd.v
        ORDER BY g.o_orderkey, g.valid_from
    """


@pytest.mark.parametrize("case", sorted(_SCD2_CASES))
def test_scd2_history_sweep(spark, duck, case):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.versioned import (
        scd2_intervals,
    )

    cfg = _SCD2_CASES[case]
    tables.load_table(spark, "orders", SF_DIR).createOrReplaceTempView(
        "orders_scd2_fuzz"
    )
    snaps = [
        (v, spark.sql(sql.format(tbl="orders_scd2_fuzz")))
        for v, sql in cfg
    ]
    got = (
        scd2_intervals(snaps, ["o_orderkey"])
        .orderBy("o_orderkey", "valid_from")
        .toPandas()
    )
    want = duck.execute(_scd2_twin_sql(cfg)).fetchdf()
    _assert_same(got, want, f"scd2({case})")
    # structural invariants every history must satisfy: per-key
    # intervals are disjoint and at most one current run per key
    cur = got[got["is_current"]]
    assert cur.groupby("o_orderkey").size().max() <= 1, case
    open_rows = got[got["valid_to"].isna() & ~got["is_current"]]
    assert open_rows.empty, case


@pytest.mark.parametrize("as_of", [0, 1, 2, 3, 4])
def test_scd2_lookup_sweep(spark, duck, as_of):
    # point-in-time lookup swept across the whole version axis —
    # BEFORE the first snapshot (0: everything NULL), each real
    # version, and past the last (4: currents only). Registry config
    # probes as_of = okey % 3 + 1; the constant probes here cover the
    # two boundary values the modulo can never produce.
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.versioned import (
        scd2_intervals,
        scd2_lookup,
    )

    tables.load_table(spark, "orders", SF_DIR).createOrReplaceTempView(
        "orders_scd2_fuzz"
    )
    snaps = [
        (v, spark.sql(sql.format(tbl="orders_scd2_fuzz")))
        for v, sql in _SCD2_REG
    ]
    dim = scd2_intervals(snaps, ["o_orderkey"])
    probes = spark.sql(
        f"SELECT o_orderkey, CAST({as_of} AS INT) AS as_of "
        "FROM orders_scd2_fuzz"
    )
    got = (
        scd2_lookup(dim, probes, ["o_orderkey"], "as_of")
        .groupBy("as_of", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("as_of", "o_orderstatus")
        .toPandas()
    )
    want = duck.execute(f"""
        WITH dim AS ({_scd2_twin_sql(_SCD2_REG)}),
        looked AS (
          SELECT p.o_orderkey, d.o_orderstatus
          FROM orders p LEFT JOIN dim d
            ON p.o_orderkey = d.o_orderkey
           AND d.valid_from <= {as_of}
           AND (d.valid_to IS NULL OR {as_of} < d.valid_to))
        SELECT CAST({as_of} AS INT) AS as_of, o_orderstatus,
               count(*) AS n
        FROM looked
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """).fetchdf()
    _assert_same(got, want, f"scd2_lookup(as_of={as_of})")
    if as_of == 0:
        # before any snapshot: the LEFT join must keep every probe
        # with NULL attributes, never drop them
        assert got["o_orderstatus"].isna().all()


# ---------------------------------------------------------------- #
# counting IVM with deletes (VERDICT r9 Next #4): sweep the
# insert/delete date cuts — including the delete-heavy edge where the
# delta deletes EVERYTHING the old view held (lo == hi: every old
# multiplicity driven exactly to zero and dropped) — against the
# plain recompute over the post-delta bases. A green row proves
# signed-delta maintenance ≡ recompute at every cut.
# (registry config: incremental_join_deletes — lo=1993-01-01,
# hi=1996-01-01)


@pytest.mark.parametrize(
    "lo,hi",
    [
        ("1993-01-01", "1996-01-01"),  # registry config
        ("1995-06-01", "1996-01-01"),  # delete-heavy: most of view cut
        ("1996-01-01", "1996-01-01"),  # lo == hi: old view fully deleted
        ("1992-06-01", "1997-06-01"),  # wide: few deletes, many inserts
        ("1994-01-01", "1995-01-01"),  # interior cut
    ],
)
def test_counting_ivm_sweep(spark, duck, lo, hi):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.ivm import (
        apply_counted_delta,
        counted_join_delta,
        with_multiplicity,
    )

    orders = tables.load_table(spark, "orders", SF_DIR).select(
        F.col("o_orderkey").alias("okey"), "o_custkey", "o_orderdate"
    )
    li = tables.load_table(spark, "lineitem", SF_DIR).select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice", "l_shipdate"
    )
    a_old = with_multiplicity(orders.where(F.col("o_orderdate") < hi))
    a_delta = with_multiplicity(
        orders.where(F.col("o_orderdate") >= hi)
    ).unionByName(
        with_multiplicity(orders.where(F.col("o_orderdate") < lo))
        .withColumn("_mult", -F.col("_mult"))
    )
    b_old = with_multiplicity(li.where(F.col("l_shipdate") < hi))
    b_delta = with_multiplicity(
        li.where(F.col("l_shipdate") >= hi)
    ).unionByName(
        with_multiplicity(li.where(F.col("l_shipdate") < lo))
        .withColumn("_mult", -F.col("_mult"))
    )
    view_old = counted_join_delta(
        a_old, b_old.limit(0), a_old.limit(0), b_old, ["okey"]
    )
    delta = counted_join_delta(a_old, b_old, a_delta, b_delta, ["okey"])
    maintained = apply_counted_delta(view_old, delta)
    got = (
        maintained.groupBy("o_custkey")
        .agg(
            F.sum("_mult").alias("n_rows"),
            F.sum(
                F.col("_mult")
                * F.col("l_extendedprice").cast("decimal(20,6)")
            ).cast("double").alias("revenue"),
        )
        .orderBy("o_custkey")
        .toPandas()
    )
    want = duck.execute(f"""
        SELECT o.o_custkey, count(*) AS n_rows,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,6)))
                 AS DOUBLE) AS revenue
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '{lo}'
          AND l.l_shipdate >= TIMESTAMP '{lo}'
        GROUP BY o.o_custkey ORDER BY o.o_custkey
    """).fetchdf()
    _assert_same(got, want, f"counting_ivm(lo={lo},hi={hi})")
    # every surviving multiplicity must be strictly positive — the
    # delete-heavy cuts drive old rows exactly to zero, and a zero or
    # negative survivor would mean the drop rule leaked
    mm = maintained.agg(F.min("_mult").alias("m")).collect()[0]["m"]
    assert mm is None or mm >= 1, (lo, hi, mm)


# ---------------------------------------------------------------- #
# vocab_coverage (new r10): sweep the coverage fractions and vocab
# sizes against a templated spectrum-form DuckDB twin.
# (registry config: coverage (1/2, 9/10, 99/100), sizes (5, 20, 10000))


@pytest.mark.parametrize(
    "cov,sizes",
    [
        ([(1, 2), (9, 10), (99, 100)], [5, 20, 10000]),  # registry config
        ([(1, 1)], [1]),                 # full coverage + tiniest vocab
        ([(1, 3), (2, 3)], [2, 3]),      # thirds: non-decimal rationals
        ([(999, 1000)], [31, 32]),       # around the sf0.001 type count
    ],
)
def test_vocab_coverage_sweep(spark, duck, cov, sizes):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions.text import (
        vocab_coverage,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = vocab_coverage(docs, coverage=cov, vocab_sizes=sizes).toPandas()
    rows = []
    for n, d in cov:
        rows.append(f"""
          SELECT 'coverage_k' AS kind, '{n}/{d}' AS param, (
            SELECT CAST((cum_types - k)
              + ((((t * {n} + {d} - 1) // {d}) - (cum_mass - k * c)) + c - 1)
                // c AS BIGINT)
            FROM ranked, tot WHERE cum_mass * {d} >= t * {n}
            ORDER BY cum_types LIMIT 1) AS value""")
    for v in sizes:
        rows.append(f"""
          SELECT 'oov_tokens', '{v}', (
            SELECT CAST(t - coalesce((
              SELECT (cum_mass - k * c) + ({v} - (cum_types - k)) * c
              FROM ranked WHERE cum_types >= {v}
              ORDER BY cum_types LIMIT 1), t) AS BIGINT) FROM tot)""")
    rows.append("SELECT 'total', 'tokens', (SELECT CAST(t AS BIGINT) FROM tot)")
    rows.append("SELECT 'total', 'types', (SELECT CAST(v AS BIGINT) FROM tot)")
    want = duck.execute(f"""
        WITH tok AS (
          SELECT unnest(string_split(trim(text), ' ')) AS t
          FROM documents),
        cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
        spec AS (SELECT c, count(*) AS k FROM cnt GROUP BY c),
        ranked AS (
          SELECT c, k,
                 sum(k) OVER (ORDER BY c DESC
                   ROWS UNBOUNDED PRECEDING) AS cum_types,
                 sum(k * c) OVER (ORDER BY c DESC
                   ROWS UNBOUNDED PRECEDING) AS cum_mass
          FROM spec),
        tot AS (SELECT sum(k * c) AS t, sum(k) AS v FROM spec)
        {" UNION ALL ".join(rows)}
        ORDER BY kind, param
    """).fetchdf()
    _assert_same(got, want, f"vocab_coverage({cov},{sizes})")


# ---------------------------------------------------------------- #
# bucketized range join: sweep the BIN WIDTH — a pure execution knob
# that must never change results — across tier geometries, against
# a plain interval-join DuckDB twin. A wrong bin assignment, a
# boundary-bin off-by-one, or a replication slip shows up as a row
# diff at some width; the geometry axis varies interval sizes so the
# per-interval bin counts range from 1 to the guard's edge.
# (registry config: value_tier_report — quadratic 5k^2 tiers,
# bin_width=20.0)

_TIER_GEOMS = {
    # (name, tier SQL for DuckDB, spark builder): tier, lo, hi
    "quadratic": "SELECT k AS tier, 5.0 * k * k AS lo, "
                 "5.0 * (k + 1) * (k + 1) AS hi FROM range(10) t(k)",
    "linear": "SELECT k AS tier, 30.0 * k AS lo, 30.0 * (k + 1) AS hi "
              "FROM range(17) t(k)",
    "two_band": "SELECT k AS tier, 250.0 * k AS lo, 250.0 * (k + 1) AS hi "
                "FROM range(2) t(k)",
}


def _tiers_df(spark, geom):
    if geom == "quadratic":
        base = spark.range(10).select(
            F.col("id").alias("tier"),
            (F.col("id") * F.col("id") * F.lit(5.0)).alias("lo"),
            ((F.col("id") + 1) * (F.col("id") + 1) * F.lit(5.0)).alias("hi"),
        )
    elif geom == "linear":
        base = spark.range(17).select(
            F.col("id").alias("tier"),
            (F.col("id") * F.lit(30.0)).alias("lo"),
            ((F.col("id") + 1) * F.lit(30.0)).alias("hi"),
        )
    else:
        base = spark.range(2).select(
            F.col("id").alias("tier"),
            (F.col("id") * F.lit(250.0)).alias("lo"),
            ((F.col("id") + 1) * F.lit(250.0)).alias("hi"),
        )
    return base


@pytest.mark.parametrize(
    "geom,bw",
    [
        ("quadratic", 20.0),  # registry config
        ("quadratic", 3.0),
        ("quadratic", 500.0),  # every interval inside one bin span
        ("linear", 20.0),
        ("linear", 7.5),
        ("two_band", 100.0),
    ],
)
def test_range_join_bin_width_sweep(spark, duck, geom, bw):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.range_join import (
        range_join,
    )

    ev = tables.load_table(spark, "events", SF_DIR).select(
        "user_id", "value",
        F.col("value").cast("decimal(20,6)").alias("value_dec"),
    )
    hit = range_join(ev, _tiers_df(spark, geom), "value", "lo", "hi", bin_width=bw)
    got = (
        hit.groupBy("tier", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_dec").cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("tier")
        .toPandas()
    )
    want = duck.execute(f"""
        WITH tiers AS ({_TIER_GEOMS[geom]})
        SELECT tier, lo, hi, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
                 AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events e JOIN tiers
          ON e.value >= tiers.lo AND e.value < tiers.hi
        GROUP BY tier, lo, hi ORDER BY tier
    """).fetchdf()
    _assert_same(got, want, f"range_join({geom},bw={bw})")


def test_range_join_degenerate_width_refused(spark):
    # a bin width that replicates one interval past the guard must
    # raise the written refusal, never silently explode the join
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.range_join import (
        range_join,
    )

    ev = tables.load_table(spark, "events", SF_DIR).select("value")
    with pytest.raises(Exception, match="max_bins_per_interval|bin_width"):
        range_join(
            ev, _tiers_df(spark, "quadratic"), "value", "lo", "hi",
            bin_width=20.0, max_bins_per_interval=2,
        ).count()


@pytest.mark.parametrize("bw_sec", [3600, 28800, 604800])
def test_session_attribution_bin_width_sweep(spark, duck, bw_sec):
    # the attribution interval-join's bin width is likewise a pure
    # execution knob: every width must reproduce the registry oracle
    # (28800 is the registered width; 1h forces multi-bin sessions,
    # a week collapses everything into one or two bins)
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.range_join import (
        range_join_ts,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sessions import (
        session_stats,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    browse = ev.where(F.col("event_type") != "purchase")
    sess = (
        session_stats(browse, ordered=False)
        .select("user_id", "session_id", "session_start", "session_end")
        .localCheckpoint(eager=True)
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").cast("decimal(20,6)").alias("value_dec")
    )
    hit = range_join_ts(
        purchases, sess, "ts", "session_start", "session_end",
        bin_width_seconds=bw_sec, equi_keys=("user_id",),
    )
    got = (
        hit.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("value_dec").cast("double").alias("purchase_value"),
        )
        .orderBy("user_id", "session_id")
        .toPandas()
    )
    import __spark_entry__ as entry_mod

    want = duck.execute(entry_mod.oracle_sql()["session_attribution"]).fetchdf()
    _assert_same(got, want, f"session_attribution(bw={bw_sec})")


# ---------------------------------------------------------------- #
# winsorization: sweep the clamp fraction p (registry config: 0.01).
# Sweep values beyond the registry's are EXACT binary fractions
# (1/4, 1/8, 1/32) so ceil(p*n) is bit-identical across engines even
# where DuckDB parses the literal as DECIMAL and Spark computes in
# binary64 — the rank boundary must not depend on literal parsing.


@pytest.mark.parametrize("p", [0.01, 0.25, 0.125, 0.03125])
def test_winsorize_fraction_sweep(spark, duck, p):
    ev = tables.load_table(spark, "events", SF_DIR)
    got = R.winsorized_stats(ev, "event_type", "value", p=p).toPandas()
    want = duck.execute(f"""
        WITH v AS (
          SELECT event_type, value FROM events WHERE value IS NOT NULL),
        counts AS (
          SELECT event_type, count(*) AS n FROM v GROUP BY event_type),
        ranked AS (
          SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value) AS rn
          FROM v),
        bounds AS (
          SELECT r.event_type,
                 min(CASE WHEN rn = greatest(
                       CAST(ceil({p} * n) AS BIGINT), 1)
                     THEN value END) AS lo,
                 min(CASE WHEN rn = greatest(
                       CAST(ceil((1.0 - {p}) * n) AS BIGINT), 1)
                     THEN value END) AS hi,
                 min(n) AS n
          FROM ranked r JOIN counts c USING (event_type)
          GROUP BY r.event_type)
        SELECT v.event_type,
               min(b.n) AS n, min(lo) AS lo, min(hi) AS hi,
               CAST(sum(CAST(least(greatest(value, lo), hi)
                             AS DECIMAL(20,6))) AS DOUBLE)
                 / count(*) AS mean_winsorized
        FROM v JOIN bounds b USING (event_type)
        GROUP BY v.event_type ORDER BY v.event_type
    """).fetchdf()
    _assert_same(got, want, f"winsorize(p={p})")
    # the clamp invariant: bounds tighten monotonically in p
    assert (got["lo"] <= got["hi"]).all()


# ---------------------------------------------------------------- #
# gap fill: sweep the bounded forward-fill horizon (registry config:
# max_fill_hours=6) — 1 (fill only adjacent holes), 24, and a horizon
# wider than any gap (everything fillable fills). The oracle is the
# registry SQL templated on the window frame.


_GAP_FILL_TWIN = """
    WITH b AS (
      SELECT event_type AS site, CAST(ts AS TIMESTAMP) AS ts_utc,
             value AS ghi_wm2, value - 150.0 AS t2m_c,
             value / 50.0 AS ws10_mps,
             CAST(ts AS TIMESTAMP) AS ingested_at
      FROM events
    ), v AS (
      SELECT site, ts_utc, date_trunc('hour', ts_utc) AS ts_hour,
             CASE WHEN ghi_wm2 >= 0 THEN ghi_wm2 END AS ghi_wm2,
             CASE WHEN t2m_c BETWEEN -80 AND 80 THEN t2m_c END AS t2m_c,
             CASE WHEN ws10_mps >= 0 THEN ws10_mps END AS ws10_mps,
             ingested_at
      FROM b
    ), c AS (
      SELECT * FROM v
      WHERE ghi_wm2 IS NOT NULL AND t2m_c IS NOT NULL
        AND ws10_mps IS NOT NULL
    ), d AS (
      SELECT *, row_number() OVER (
        PARTITION BY site, ts_hour
        ORDER BY ingested_at DESC, ts_utc DESC) AS rn
      FROM c
    ), fact AS (
      SELECT site, CAST(ts_hour AS TIMESTAMP) AS ts_utc,
             ghi_wm2, t2m_c AS temp_c, ws10_mps AS wind_mps
      FROM d WHERE rn = 1
    ), spine AS (
      SELECT site, unnest(generate_series(lo, hi,
                          INTERVAL 1 HOUR)) AS ts_utc
      FROM (SELECT site, min(ts_utc) AS lo, max(ts_utc) AS hi
            FROM fact GROUP BY site)
    ), dense AS (
      SELECT s.site, CAST(s.ts_utc AS TIMESTAMP) AS ts_utc,
             f.ghi_wm2, f.temp_c, f.wind_mps
      FROM spine s LEFT JOIN fact f
        ON s.site = f.site AND s.ts_utc = f.ts_utc
    )
    SELECT site, ts_utc,
           last_value(ghi_wm2 IGNORE NULLS) OVER w AS ghi_wm2,
           ghi_wm2 IS NULL
             AND last_value(ghi_wm2 IGNORE NULLS) OVER w IS NOT NULL
             AS ghi_wm2_filled,
           last_value(temp_c IGNORE NULLS) OVER w AS temp_c,
           temp_c IS NULL
             AND last_value(temp_c IGNORE NULLS) OVER w IS NOT NULL
             AS temp_c_filled,
           last_value(wind_mps IGNORE NULLS) OVER w AS wind_mps,
           wind_mps IS NULL
             AND last_value(wind_mps IGNORE NULLS) OVER w IS NOT NULL
             AS wind_mps_filled
    FROM dense
    WINDOW w AS (PARTITION BY site ORDER BY ts_utc
                 ROWS BETWEEN {g} PRECEDING AND CURRENT ROW)
    ORDER BY site, ts_utc
"""


@pytest.mark.parametrize("g", [1, 6, 24, 100000])
def test_gap_fill_horizon_sweep(spark, duck, g):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans import (
        gold as G,
        silver as SV,
    )
    import __spark_entry__ as entry_mod

    bronze = entry_mod._pseudo_bronze(spark, SF_DIR)
    got = G.gap_fill_hourly(
        SV.clean_to_hourly(bronze), max_fill_hours=g
    ).toPandas()
    want = duck.execute(_GAP_FILL_TWIN.format(g=g)).fetchdf()
    _assert_same(got, want, f"gap_fill(max_fill_hours={g})")
