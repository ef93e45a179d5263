"""Parameter-sweep differential fuzz, waves 2+: the families the
first wave (tests/test_param_fuzz.py) had not reached — skew-salted
joins (salt factor, join type, hot-key targeting), GROUPING SETS
combinations, Z-order bit depth / prefix grain, sequence-packing
geometry (token budget x shard count), IVF probe width, MinHash-LSH
verification threshold and shingle size, contamination n-gram size,
ALL SIX mergeable sketch states (CMS, Misra-Gries, Bloom, fixed-bin
histogram, MinHash signature, decimal+HLL — where the swept property
is the published deterministic guarantee and the cell-exact merge
identity, since the estimates themselves are parameter-dependent by
design), SimHash Hamming bound, keyword top-k, sorted-neighborhood
geometry, k-core thresholds, the exactly-N sampler's nested growth,
batch-fold incremental dedup, compaction target size, the quality
cascade's threshold triple, feature-hashing table size / n-gram
order, and the SRP-LSH cosine cut.

Same discipline as wave 1: templated DuckDB twins mirroring the
registered ``oracle_sql()`` strings with the parameter literal
substituted; every sweep INCLUDES its registry config so a registry
oracle edit not mirrored here fails loudly; fixed literal parameter
sets (no RNG draws) so failures reproduce exactly; sf0.001 scale.

One documented softening of the embed rule: where the registry
oracle is built by a PARAMETERIZED generator (`_kcore_oracle`,
`_textrank_oracle`, `_kcenter_sql`, `_bm25_prf_oracle`, the
simhash/SRP signature CTEs, `_PSEUDO_FEATURES_CTE`), the sweep calls
the generator with swept arguments instead of embedding a copy — the
parameter dimension is still independently exercised, but an edit to
the generator body moves both sides together; the registry-config
case in each sweep plus the driver gate carry that residual risk.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark import tables

# nightly tier (r15): the whole module is a robustness sweep —
# parameter fuzz sweeps; the default run must stay inside the driver's pytest
# window. SPARK_GRAFT_SLOW_TESTS=1 runs it.
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["orders", "lineitem", "events", "documents", "customer",
              "embeddings", "part"]:
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
# salted_join: the salt factor is a pure execution knob — the result
# must be identical to the plain equi-join at EVERY n_salt, both join
# types, and under hot-key targeting (only the listed keys take the
# salted path). (registry config: salted_join_segments — n_salt=8,
# how='inner', hot_keys=None)

_SALTED_INNER_SQL = """
    SELECT c_mktsegment,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def _salted_inputs(spark):
    ev = tables.load_table(spark, "events", SF_DIR).select(
        F.col("user_id").alias("c_custkey"),
        F.col("value").cast("decimal(20,6)").alias("value_dec"),
    )
    cust = tables.load_table(spark, "customer", SF_DIR).select(
        "c_custkey", "c_mktsegment"
    )
    return ev, cust


@pytest.mark.parametrize("n_salt", [1, 2, 8, 32])
def test_salted_join_salt_sweep(spark, duck, n_salt):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        skew as SK,
    )

    ev, cust = _salted_inputs(spark)
    got = (
        SK.salted_join(ev, cust, ["c_custkey"], n_salt=n_salt)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value_dec").cast("double").alias("sum_value"),
        )
        .orderBy("c_mktsegment")
        .toPandas()
    )
    want = duck.execute(_SALTED_INNER_SQL).fetchdf()
    _assert_same(got, want, f"salted_join(n_salt={n_salt})")


@pytest.mark.parametrize("n_salt", [1, 8])
def test_salted_join_left_sweep(spark, duck, n_salt):
    # LEFT rows with no dim match must survive exactly once (the
    # replicated build side is the part that could get this wrong:
    # a naive replication surfaces an unmatched probe row per salt
    # value or drops it entirely).
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        skew as SK,
    )

    ev, cust = _salted_inputs(spark)
    got = (
        SK.salted_join(ev, cust, ["c_custkey"], n_salt=n_salt, how="left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value_dec").cast("double").alias("sum_value"),
        )
        .orderBy("c_mktsegment")
        .toPandas()
    )
    want = duck.execute("""
        SELECT c_mktsegment,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        FROM events LEFT JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """).fetchdf()
    _assert_same(got, want, f"salted_left(n_salt={n_salt})")


@pytest.mark.parametrize("top", [1, 3])
def test_salted_join_hotkey_sweep(spark, duck, top):
    # hot_keys limits salting to the listed values: hot rows take the
    # salted path, cold rows the plain join — the union of the two
    # paths must still be the plain join, whatever the hot list is.
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        skew as SK,
    )

    hot = [
        r[0]
        for r in duck.execute(
            "SELECT user_id FROM events WHERE user_id IS NOT NULL "
            f"GROUP BY 1 ORDER BY count(*) DESC, user_id LIMIT {top}"
        ).fetchall()
    ]
    ev, cust = _salted_inputs(spark)
    got = (
        SK.salted_join(ev, cust, ["c_custkey"], n_salt=8, hot_keys=hot)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value_dec").cast("double").alias("sum_value"),
        )
        .orderBy("c_mktsegment")
        .toPandas()
    )
    want = duck.execute(_SALTED_INNER_SQL).fetchdf()
    _assert_same(got, want, f"salted_hot(top={top})")


# ---------------------------------------------------------------- #
# GROUPING SETS: sweep the set combinations — per-dimension only
# (registry config), the CUBE-equivalent full lattice, rollup-like
# prefixes, and the cross-cells-only form. Identical SQL text runs on
# both engines. (registry config: type_status_grouping_sets —
# ((l_returnflag), (l_linestatus), ()))


@pytest.mark.parametrize(
    "sets",
    [
        "((l_returnflag), (l_linestatus), ())",  # registry config
        "((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())",
        "((l_returnflag, l_linestatus), ())",
        "((l_returnflag, l_linestatus), (l_returnflag))",
        # NOTE: a set list that omits a selected column entirely (e.g.
        # ((l_linestatus)) with l_returnflag still selected) is valid
        # DuckDB (NULL-fill) but an AnalysisException in Spark
        # (MISSING_AGGREGATION) — engine semantics, not sweepable.
        "((l_returnflag, l_linestatus), (l_linestatus))",
    ],
)
def test_grouping_sets_sweep(spark, duck, sets):
    sql = f"""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS {sets}
        ORDER BY l_returnflag, l_linestatus
    """
    tables.register_views(spark, SF_DIR)
    got = spark.sql(sql).toPandas()
    want = duck.execute(sql).fetchdf()
    _assert_same(got, want, f"grouping_sets{sets}")


# ---------------------------------------------------------------- #
# Z-order Morton code: sweep interleave bit depth and the prefix
# grain. High bits beyond `bits` are truncated identically on both
# sides (the interleave only reads the low `bits` of each dimension),
# so bits=8 exercises real truncation on both custkey and day.
# (registry config: orders_zorder_stats — bits=16, prefix shift 20)


@pytest.mark.parametrize("bits,shift", [(16, 20), (8, 12), (21, 28), (16, 8)])
def test_zorder_morton_sweep(spark, duck, bits, shift):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans.layout import (
        morton_code,
    )

    o = tables.load_table(spark, "orders", SF_DIR)
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    z = morton_code(F.col("o_custkey"), day, bits=bits)
    got = (
        o.select(z.alias("_z"))
        .groupBy(F.shiftright(F.col("_z"), shift).alias("z_prefix"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("_z").alias("min_code"),
            F.max("_z").alias("max_code"),
        )
        .orderBy("z_prefix")
        .toPandas()
    )
    want = duck.execute(f"""
        WITH base AS (
          SELECT o_custkey AS x,
                 date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) AS y
          FROM orders),
        z AS (
          SELECT (SELECT sum(
                   (((x >> i.i) & 1) << (2 * i.i))
                   + (((y >> i.i) & 1) << (2 * i.i + 1)))
                  FROM unnest(range(0, {bits})) AS i(i)) AS zc
          FROM base)
        SELECT CAST(zc >> {shift} AS BIGINT) AS z_prefix,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(min(zc) AS BIGINT) AS min_code,
               CAST(max(zc) AS BIGINT) AS max_code
        FROM z GROUP BY 1 ORDER BY z_prefix
    """).fetchdf()
    _assert_same(got, want, f"zorder(bits={bits},shift={shift})")


# ---------------------------------------------------------------- #
# Sequence packing: token budget and shard count are geometry knobs —
# doc/token totals are conserved at every (budget, n_shards), and the
# sequence/crosser counts follow the exact integer formulas. budget=64
# drives many docs across MULTIPLE sequence boundaries (spill case the
# registry's 512 hits rarely). (registry config: doc_pack_stats —
# budget=512, n_shards=16)


@pytest.mark.parametrize(
    "budget,shards", [(512, 16), (64, 16), (2048, 16), (512, 1), (512, 64)]
)
def test_pack_geometry_sweep(spark, duck, budget, shards):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.packing import (
        pack_sequences,
        pack_stats,
    )

    d = tables.load_table(spark, "documents", SF_DIR)
    got = pack_stats(
        pack_sequences(d, budget=budget, n_shards=shards), budget=budget
    ).toPandas()
    want = duck.execute(f"""
        WITH d AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5('pack' || CAST(doc_id AS VARCHAR)),
                                      1, 8)) AS BIGINT) AS h,
                 CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
          FROM documents
        ), p AS (
          SELECT h % {shards} AS shard, n_tok,
                 sum(n_tok) OVER (PARTITION BY h % {shards}
                                  ORDER BY h, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS tok_end
          FROM d
        )
        SELECT shard,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               CAST(floor((sum(n_tok) - 1) / {budget}) + 1 AS BIGINT)
                 AS n_seqs,
               CAST(sum(CASE WHEN floor((tok_end - 1) / {budget})
                               <> floor((tok_end - n_tok) / {budget})
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_crossers
        FROM p GROUP BY shard ORDER BY shard
    """).fetchdf()
    _assert_same(got, want, f"pack(budget={budget},shards={shards})")


# ---------------------------------------------------------------- #
# IVF ANN: sweep centroid count, probe width, and k. n_probe ==
# n_centroids is the exhaustive-probe edge (every cluster scored — the
# result must equal brute force minus the query's own cluster
# restriction, which the template reproduces); n_probe=1 is the
# narrowest recall cut. (registry config: ann_ivf_topk —
# n_centroids=16, n_probe=4, k=5, queries vec_id < 8)

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@pytest.mark.parametrize(
    "nc,np_,k",
    [(16, 4, 5), (16, 1, 5), (16, 16, 5), (8, 8, 10), (4, 2, 3)],
)
def test_ivf_probe_sweep(spark, duck, nc, np_, k):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        similarity as S,
    )

    emb = tables.load_table(spark, "embeddings", SF_DIR)
    got = S.ann_ivf_topk(
        emb, F.col("vec_id") < 8, k=k, n_centroids=nc, n_probe=np_
    ).toPandas()
    want = duck.execute(f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {nc}),
        asg AS (
          SELECT vec_id, cluster FROM (
            SELECT e.vec_id, c.cid AS cluster,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {_COS.format(a='e.v', b='c.cv')} DESC,
                              c.cid) AS rn
            FROM e, cents c) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        probes AS (
          SELECT query_id, cluster FROM (
            SELECT q.query_id, c.cid AS cluster,
                   row_number() OVER (PARTITION BY q.query_id
                     ORDER BY {_COS.format(a='q.qv', b='c.cv')} DESC,
                              c.cid) AS rn
            FROM q, cents c) WHERE rn <= {np_}),
        scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 {_COS.format(a='q.qv', b='e.v')} AS sim
          FROM probes p
          JOIN asg a ON a.cluster = p.cluster
          JOIN e ON e.vec_id = a.vec_id
          JOIN q ON q.query_id = p.query_id
          WHERE a.vec_id != p.query_id)
        SELECT query_id, neighbor_id, sim,
               CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY sim DESC, neighbor_id
               ) AS INTEGER) AS "rank"
        FROM scored
        QUALIFY "rank" <= {k}
        ORDER BY query_id, "rank"
    """).fetchdf()
    _assert_same(got, want, f"ivf(nc={nc},np={np_},k={k})")


# ---------------------------------------------------------------- #
# MinHash-LSH: sweep the verification threshold and the shingle size.
# Banding geometry (16 perms, 8 bands x 2 rows) is fixed — it IS the
# operator's recall contract — so the candidate set is identical
# across thresholds and the sweep exercises the verify cut; n=2
# changes the shingle domain itself. (registry config:
# minhash_lsh_pairs — threshold=0.5, n=3)


def _shingle_cte(n: int) -> str:
    nm1 = n - 1
    return f"""
        WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS tk
                      FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(
                 generate_series(1, greatest(len(tk) - {nm1}, 0)),
                 i -> array_to_string(tk[i:i+{nm1}], ' '))) AS shs
               FROM toks),
        inv AS (SELECT doc_id, unnest(shs) AS s FROM sh)
    """


def _minhash_chain_sql() -> str:
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        MH_MOD,
        minhash_params,
    )

    h = "CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)"
    mins = ",\n         ".join(
        f"min(({minhash_params(j)[0]} * {h} + {minhash_params(j)[1]})"
        f" % {MH_MOD}) AS m{j}"
        for j in range(16)
    )
    sig = f"sig AS (SELECT doc_id,\n {mins}\n FROM inv GROUP BY doc_id)"
    band_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band,"
        f" md5(CAST(m{2*b} AS VARCHAR) || '_' || CAST(m{2*b+1} AS VARCHAR))"
        f" AS bh FROM sig"
        for b in range(8)
    )
    return sig + ",\nbands AS (" + band_rows + ")"


@pytest.mark.parametrize(
    "threshold,n",
    [(0.5, 3), (0.3, 3), (0.7, 3), (0.9, 3), (0.5, 2)],
)
def test_minhash_lsh_sweep(spark, duck, threshold, n):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        dedup as D,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = D.minhash_lsh_pairs(docs, threshold=threshold, n=n).toPandas()
    want = duck.execute(
        _shingle_cte(n)
        + ",\n"
        + _minhash_chain_sql()
        + f""",
        cands AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
        verified AS (
          SELECT doc_a, doc_b,
                 len(list_intersect(sa.shs, sb.shs)) * 1.0
                   / (len(sa.shs) + len(sb.shs)
                      - len(list_intersect(sa.shs, sb.shs))) AS jacc
          FROM cands
          JOIN sh sa ON doc_a = sa.doc_id
          JOIN sh sb ON doc_b = sb.doc_id)
        SELECT doc_a, doc_b, jacc AS jaccard
        FROM verified WHERE jacc >= {threshold}
        ORDER BY doc_a, doc_b
    """
    ).fetchdf()
    _assert_same(got, want, f"minhash(th={threshold},n={n})")


# ---------------------------------------------------------------- #
# Contamination audit: sweep the n-gram size. Small n flags more of
# the corpus (3-grams collide often), large n approaches exact-span
# matching — the per-source counts must track the templated twin at
# every n. (registry config: doc_contamination — n=5)


@pytest.mark.parametrize("n", [3, 5, 8])
def test_contamination_ngram_sweep(spark, duck, n):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        ngram_contamination,
    )

    d = tables.load_table(spark, "documents", SF_DIR)
    hits = ngram_contamination(
        d.filter(F.col("source") != "src0"),
        d.filter(F.col("source") == "src0"),
        n=n,
    )
    got = (
        d.join(hits, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
        .orderBy("source")
        .toPandas()
    )
    nm1 = n - 1
    want = duck.execute(f"""
        WITH toks AS (SELECT doc_id, source,
                             string_split(trim(text), ' ') AS tk
                      FROM documents),
        sh AS (SELECT doc_id, source, list_distinct(list_transform(
                 generate_series(1, greatest(len(tk) - {nm1}, 0)),
                 i -> array_to_string(tk[i:i+{nm1}], ' '))) AS shs
               FROM toks),
        inv AS (SELECT doc_id, source, unnest(shs) AS s FROM sh),
        ev AS (SELECT DISTINCT s FROM inv WHERE source = 'src0'),
        hit AS (SELECT DISTINCT i.doc_id FROM inv i JOIN ev USING (s)
                WHERE i.source <> 'src0')
        SELECT d.source, count(*) AS n_contaminated
        FROM documents d JOIN hit USING (doc_id)
        GROUP BY d.source ORDER BY d.source
    """).fetchdf()
    _assert_same(got, want, f"contamination(n={n})")


# ---------------------------------------------------------------- #
# Count-Min sketch: the estimate is parameter-dependent by design, so
# the swept properties are the DETERMINISTIC guarantees — (a) the
# point estimate never underestimates, at every (depth, width)
# including a width small enough (64) to force heavy collision; (b)
# state merge is cell-exact: build(full) == merge(build(even),
# build(odd)), the mergeability contract every streaming twin rides.
# (registry config family: cms_join_size_audit depth=4 width=2048,
# cms_topk_audit depth=4 width=1024)


@pytest.mark.parametrize("depth,width", [(4, 2048), (4, 64), (1, 1024), (2, 256)])
def test_cms_one_sided_sweep(spark, duck, depth, width):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.heavy import (
        cms_probe,
        cms_state,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    state = cms_state(ev, "user_id", depth=depth, width=width)
    est = cms_probe(
        state, ev.select("user_id").distinct(), "user_id",
        depth=depth, width=width,
    ).toPandas()
    exact = duck.execute(
        "SELECT CAST(user_id AS VARCHAR) AS item, count(*) AS n "
        "FROM events WHERE user_id IS NOT NULL GROUP BY 1"
    ).fetchdf()
    merged = est.merge(exact, on="item", how="outer")
    assert not merged["cms_estimate"].isna().any(), "probe missed an item"
    assert not merged["n"].isna().any(), "probe invented an item"
    under = merged[merged["cms_estimate"] < merged["n"]]
    assert under.empty, (
        f"cms(d={depth},w={width}) underestimated: {under.head()}"
    )
    if width >= 2048 and depth >= 4:
        # at |items| << depth*width the estimate is near-exact; demand
        # SOME exact cells so the sweep can't pass on a vacuous >= alone
        assert (merged["cms_estimate"] == merged["n"]).any()


@pytest.mark.parametrize("depth,width", [(4, 1024), (2, 64)])
def test_cms_merge_cell_exact(spark, depth, width):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.heavy import (
        cms_state,
        merge_cms_states,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    full = cms_state(ev, "user_id", depth=depth, width=width).toPandas()
    halves = merge_cms_states(
        [
            cms_state(ev.filter(F.col("event_id") % 2 == 0), "user_id",
                      depth=depth, width=width),
            cms_state(ev.filter(F.col("event_id") % 2 == 1), "user_id",
                      depth=depth, width=width),
        ]
    ).toPandas()
    _assert_same(full, halves, f"cms_merge(d={depth},w={width})")


# ---------------------------------------------------------------- #
# Misra-Gries: the summary contents are fold-order-dependent (any
# valid summary is correct), so the swept property is the published
# guarantee at every k — cnt <= true <= cnt + n/k for each surviving
# item, sentinel == total row count, and every item with true
# frequency > n/k PRESENT. k=2 is the single-counter edge.
# (registry config family: mg state tests use k=100 defaults;
# event_type has 5 values so k=8 captures the full exact domain)


@pytest.mark.parametrize("k,col", [(2, "event_type"), (8, "event_type"),
                                   (16, "user_id"), (64, "user_id")])
def test_mg_guarantee_sweep(spark, duck, k, col):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.heavy import (
        mg_summary,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    summ = mg_summary(ev, col, k=k).toPandas()
    exact = dict(
        duck.execute(
            f"SELECT CAST({col} AS VARCHAR), count(*) FROM events "
            f"WHERE {col} IS NOT NULL GROUP BY 1"
        ).fetchall()
    )
    total = sum(exact.values())
    sentinel = summ[summ["item"].isna()]
    assert len(sentinel) == 1 and int(sentinel["cnt"].iloc[0]) == total
    items = summ[summ["item"].notna()]
    assert len(items) <= k - 1
    for _, row in items.iterrows():
        true = exact.get(row["item"], 0)
        assert row["cnt"] <= true <= row["cnt"] + total / k, (
            f"mg(k={k}) interval violated for {row['item']}: "
            f"cnt={row['cnt']} true={true} n/k={total / k}"
        )
    present = set(items["item"])
    missing = {
        it for it, n in exact.items() if n > total / k and it not in present
    }
    assert not missing, f"mg(k={k}) lost guaranteed heavy hitters {missing}"


# ---------------------------------------------------------------- #
# CMS join-size estimate: one-sided at every (depth, width) — the
# inner-product composition only ADDS collision cross-terms.
# (registry config: join_size_cms_audit — depth=4, width=2048)


@pytest.mark.parametrize("depth,width", [(4, 2048), (2, 128)])
def test_cms_join_size_sweep(spark, duck, depth, width):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.heavy import (
        cms_join_size_audit,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    orders = tables.load_table(spark, "orders", SF_DIR)
    row = cms_join_size_audit(
        ev, "user_id", orders, "o_custkey", depth=depth, width=width
    ).toPandas()
    true = duck.execute(
        "SELECT count(*) FROM events JOIN orders ON user_id = o_custkey"
    ).fetchone()[0]
    assert int(row["true_join_size"].iloc[0]) == true
    assert int(row["cms_join_estimate"].iloc[0]) >= true
    assert int(row["overestimate"].iloc[0]) == (
        int(row["cms_join_estimate"].iloc[0]) - true
    )


# ---------------------------------------------------------------- #
# Bloom filter: sweep (m, k) — the deterministic guarantees are zero
# false negatives at EVERY geometry (m=256 forces heavy collision so
# the no-false-negative claim is tested under pressure, and the test
# demands false positives there so it cannot pass vacuously) and
# bitwise-OR mergeability (build(A ∪ B) == union of builds, the state
# being the SET of set bit positions). Counts are md5-deterministic,
# so the audit row checks value-exact against DuckDB's exact
# membership counts. (registry/default config: m=2^16, k=4)


@pytest.mark.parametrize("m,k", [(1 << 16, 4), (256, 2), (1024, 8)])
def test_bloom_geometry_sweep(spark, duck, m, k):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.bloom import (
        bloom_membership_audit,
    )

    # orders.o_custkey: 150 distinct keys at sf0.001 — big enough that
    # the m=256 geometry provably saturates (50 members x 2 hashes set
    # ~84 of 256 bits -> 11 deterministic false positives), unlike
    # events.user_id's 15-key universe where fp would be luck
    o = tables.load_table(spark, "orders", SF_DIR)
    row = bloom_membership_audit(
        o, "o_custkey", F.col("o_custkey") % 3 == 0, m=m, k=k
    ).toPandas()
    n_universe, n_members = duck.execute("""
        SELECT count(DISTINCT CAST(o_custkey AS VARCHAR)),
               count(DISTINCT CASE WHEN o_custkey % 3 = 0
                     THEN CAST(o_custkey AS VARCHAR) END)
        FROM orders WHERE o_custkey IS NOT NULL
    """).fetchone()
    assert int(row["n_universe"].iloc[0]) == n_universe
    assert int(row["n_members"].iloc[0]) == n_members
    assert int(row["n_false_neg"].iloc[0]) == 0, f"bloom(m={m},k={k})"
    assert int(row["n_candidates"].iloc[0]) == n_members + int(
        row["n_false_pos"].iloc[0]
    )
    assert int(row["n_bits_set"].iloc[0]) <= min(m, n_members * k)
    if m == 256:
        # saturated filter: the sweep must SEE false positives, or the
        # zero-false-negative assertion proved nothing
        assert int(row["n_false_pos"].iloc[0]) > 0


@pytest.mark.parametrize("m,k", [(1 << 16, 4), (512, 3)])
def test_bloom_merge_is_bit_union(spark, m, k):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.bloom import (
        bloom_build,
    )

    ev = tables.load_table(spark, "events", SF_DIR).select(
        F.col("user_id").cast("string").alias("key")
    ).where(F.col("key").isNotNull())
    full = bloom_build(ev, "key", m, k).toPandas()
    halves = (
        bloom_build(ev.filter(F.col("key").cast("long") % 2 == 0), "key", m, k)
        .unionByName(
            bloom_build(
                ev.filter(F.col("key").cast("long") % 2 == 1), "key", m, k
            )
        )
        .distinct()
        .toPandas()
    )
    _assert_same(full, halves, f"bloom_merge(m={m},k={k})")


# ---------------------------------------------------------------- #
# Fixed-bin histogram state: sweep (lo, hi, n_bins) across BOTH
# physical forms (inline one-sum-per-bin <= 128 bins; the wide
# bin-as-data form above) — per-bin counts are pure binary64 floor
# arithmetic, so a templated DuckDB twin checks them value-exact,
# including real below/above mass on a narrowed range; and the merge
# is exact addition, pinned by build(full) == merge(even, odd) cell
# for cell. The width literal is injected as repr(width) so both
# engines run the identical binary64 constant the Spark side folds.
# (registry/default config: n_bins=64)


@pytest.mark.parametrize(
    "lo,hi,n_bins",
    [(0.0, 100.0, 64), (0.0, 100.0, 4), (0.0, 100.0, 200), (10.0, 50.0, 16)],
)
def test_histogram_bins_sweep(spark, duck, lo, hi, n_bins):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.aggstate import (
        histogram_state,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    st = histogram_state(ev, ["event_type"], "value", lo, hi, n_bins)
    got = st.select(
        "event_type",
        F.posexplode("bins").alias("bin", "cnt"),
    ).filter(F.col("cnt") > 0).toPandas()
    width = (hi - lo) / n_bins
    want = duck.execute(f"""
        SELECT event_type,
               CAST(least(floor((value - {lo!r}) / {width!r}),
                          {n_bins - 1}) AS INTEGER) AS bin,
               count(*) AS cnt
        FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
          AND value >= {lo!r} AND value < {hi!r}
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchdf()
    _assert_same(got, want, f"hist_bins(lo={lo},hi={hi},b={n_bins})")
    edges = st.select("event_type", "below", "above", "n").toPandas()
    want_e = duck.execute(f"""
        SELECT event_type,
               sum(CASE WHEN value < {lo!r} THEN 1 ELSE 0 END) AS below,
               sum(CASE WHEN value >= {hi!r} THEN 1 ELSE 0 END) AS above,
               count(*) AS n
        FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1 ORDER BY 1
    """).fetchdf()
    _assert_same(edges, want_e, f"hist_edges(lo={lo},hi={hi},b={n_bins})")


@pytest.mark.parametrize("n_bins", [64, 200])
def test_histogram_merge_cell_exact(spark, n_bins):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.aggstate import (
        histogram_state,
        merge_histogram_states,
    )

    ev = tables.load_table(spark, "events", SF_DIR)

    def flat(st):
        return st.select(
            "event_type", "below", "above", "n",
            F.posexplode("bins").alias("bin", "cnt"),
        ).toPandas()

    full = flat(histogram_state(ev, ["event_type"], "value", 0.0, 100.0,
                                n_bins))
    merged = flat(
        merge_histogram_states(
            [
                histogram_state(
                    ev.filter(F.col("event_id") % 2 == 0),
                    ["event_type"], "value", 0.0, 100.0, n_bins,
                ),
                histogram_state(
                    ev.filter(F.col("event_id") % 2 == 1),
                    ["event_type"], "value", 0.0, 100.0, n_bins,
                ),
            ],
            ["event_type"],
        )
    )
    _assert_same(full, merged, f"hist_merge(b={n_bins})")


# ---------------------------------------------------------------- #
# MinHash state: component-wise min is idempotent and orderless, so
# merge-of-split == build-of-union EXACTLY at every n_hashes — and the
# signature cells themselves are md5-deterministic, so the full state
# checks value-exact against a templated DuckDB twin of the same
# universal-hash family. (registry config: type_audience_similarity —
# n_hashes=16 over event_type/user_id)


@pytest.mark.parametrize("n_hashes", [4, 16, 32])
def test_minhash_state_sweep(spark, duck, n_hashes):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        MH_MOD,
        minhash_params,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.heavy import (
        merge_minhash_states,
        minhash_state,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    full = minhash_state(ev, ["event_type"], "user_id", n_hashes)
    got = full.toPandas()
    h = ("CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) "
         "AS BIGINT)")
    arms = "\nUNION ALL\n".join(
        f"SELECT event_type, {j} AS j, "
        f"min(({minhash_params(j)[0]} * {h} + {minhash_params(j)[1]})"
        f" % {MH_MOD}) AS sig "
        f"FROM events WHERE user_id IS NOT NULL GROUP BY event_type"
        for j in range(n_hashes)
    )
    want = duck.execute(arms).fetchdf()
    _assert_same(got, want, f"minhash_state(n={n_hashes})")
    merged = merge_minhash_states(
        [
            minhash_state(ev.filter(F.col("event_id") % 2 == 0),
                          ["event_type"], "user_id", n_hashes),
            minhash_state(ev.filter(F.col("event_id") % 2 == 1),
                          ["event_type"], "user_id", n_hashes),
        ],
        ["event_type"],
    ).toPandas()
    _assert_same(got, merged, f"minhash_merge(n={n_hashes})")


# ---------------------------------------------------------------- #
# Decimal + HLL rollup state: exact columns check against DuckDB per
# key; the merge identity covers the HLL column too — a register-max
# sketch over disjoint splits unions to the identical register set,
# so finalize(merge(even, odd)) == finalize(full) INCLUDING the
# approx_distinct estimate, bit for bit.


def test_aggregate_state_merge_and_exact(spark, duck):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.aggstate import (
        aggregate_state,
        finalize_state,
        merge_aggregate_states,
    )

    ev = tables.load_table(spark, "events", SF_DIR)
    full = finalize_state(
        aggregate_state(ev, ["event_type"], "value", distinct_col="user_id"),
        ["event_type"],
    ).toPandas()
    merged = finalize_state(
        merge_aggregate_states(
            [
                aggregate_state(ev.filter(F.col("event_id") % 2 == 0),
                                ["event_type"], "value",
                                distinct_col="user_id"),
                aggregate_state(ev.filter(F.col("event_id") % 2 == 1),
                                ["event_type"], "value",
                                distinct_col="user_id"),
            ],
            ["event_type"],
        ),
        ["event_type"],
    ).toPandas()
    _assert_same(full, merged, "aggstate_merge")
    want = duck.execute("""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(30,12))) AS DOUBLE)
                 AS sum_value,
               CAST(sum(CAST(value AS DECIMAL(30,12))) AS DOUBLE)
                 / count(*) AS avg_value,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events GROUP BY event_type ORDER BY event_type
    """).fetchdf()
    _assert_same(
        full.drop(columns=["approx_distinct"]), want, "aggstate_exact"
    )


# ---------------------------------------------------------------- #
# Wave 3: SimHash Hamming bound, keyword top-k, sorted-neighborhood
# geometry, k-core threshold, and the exactly-N sampler — the
# remaining parameterized operators whose registry oracles certify a
# single configuration.


# SimHash: sweep the verification bound (registry config:
# simhash_near_pairs — max_hamming=6; the 16-bit prefix bucketing is
# the operator's recall contract and stays fixed, so the candidate
# set is constant and the sweep exercises the Hamming cut, including
# max_hamming=0 = exact-signature duplicates only).


@pytest.mark.parametrize("mh", [0, 2, 6, 10])
def test_simhash_hamming_sweep(spark, duck, mh):
    import __spark_entry__ as entry
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        dedup as D,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = D.simhash_near_pairs(docs, max_hamming=mh).toPandas()
    want = duck.execute(
        entry._simhash_sig_sql()
        + f"""
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                 AS hamming
        FROM sig a JOIN sig b
          ON (a.simhash >> 16) = (b.simhash >> 16)
         AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {mh}
        ORDER BY doc_a, doc_b
    """
    ).fetchdf()
    _assert_same(got, want, f"simhash(mh={mh})")


# Keyword extraction: sweep k (registry config: doc_keywords — k=5).
# k=1 exercises the single-winner tie chain (tf DESC, df ASC, token
# ASC) hardest: any ordering disagreement surfaces as a different
# champion, not a reordered tail.


@pytest.mark.parametrize("k", [1, 3, 5, 10])
def test_doc_keywords_k_sweep(spark, duck, k):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = TX.doc_keywords(docs, k=k).toPandas()
    want = duck.execute(f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
          FROM documents
        ), tf AS (
          SELECT doc_id, token, count(*) AS tf
          FROM tok GROUP BY doc_id, token
        ), dfreq AS (
          SELECT token, count(*) AS df FROM tf GROUP BY token
        ), r AS (
          SELECT t.doc_id, t.token,
                 CAST(t.tf AS BIGINT) AS tf,
                 CAST(d.df AS BIGINT) AS df,
                 CAST(row_number() OVER (
                   PARTITION BY t.doc_id
                   ORDER BY t.tf DESC, d.df ASC, t.token ASC
                 ) AS INT) AS rank
          FROM tf t JOIN dfreq d USING (token)
        )
        SELECT doc_id, rank, token, tf, df
        FROM r WHERE rank <= {k}
        ORDER BY doc_id, rank
    """).fetchdf()
    _assert_same(got, want, f"doc_keywords(k={k})")


# Sorted-neighborhood blocking: sweep the window and the verify
# threshold (registry config: part_sorted_neighbors — window=4,
# min_shared_tokens=1). window=2 is adjacent-only; the candidate set
# is (w-1)*n by construction, so a window error changes row counts
# loudly.


@pytest.mark.parametrize("w,ms", [(4, 1), (2, 1), (8, 1), (4, 2)])
def test_sorted_neighbor_sweep(spark, duck, w, ms):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        sorted_neighbor_pairs,
    )

    part_df = tables.load_table(spark, "part", SF_DIR)
    got = sorted_neighbor_pairs(
        part_df, "p_partkey", "p_name", window=w, min_shared_tokens=ms
    ).toPandas()
    want = duck.execute(f"""
        WITH r AS (
          SELECT p_partkey AS id, p_name AS k,
                 row_number() OVER (ORDER BY p_name, p_partkey) AS rn
          FROM part WHERE p_name IS NOT NULL),
        pr AS (
          SELECT a.id AS id_a, b.id AS id_b,
                 a.k AS key_a, b.k AS key_b,
                 CAST(len(list_intersect(string_split(a.k, ' '),
                   string_split(b.k, ' '))) AS BIGINT)
                   AS shared_tokens
          FROM r a JOIN r b
            ON b.rn > a.rn AND b.rn <= a.rn + {w - 1})
        SELECT id_a, id_b, key_a, key_b, shared_tokens
        FROM pr WHERE shared_tokens >= {ms}
        ORDER BY id_a, id_b
    """).fetchdf()
    _assert_same(got, want, f"snm(w={w},ms={ms})")


# k-core: sweep the degree threshold and the edge-weight floor
# (registry config: corpus_kcore — k_core=3, n_rounds=8, min_count=5).
# Both engines run the SAME fixed 8 synchronous peeling rounds, so
# equality holds round-for-round regardless of convergence; k=2 keeps
# far more of the graph alive, k=4 peels deeper.


@pytest.mark.parametrize(
    "kc,mc", [(3, 5), (2, 5), (4, 5), (3, 3)]
)
def test_kcore_sweep(spark, duck, kc, mc):
    import __spark_entry__ as entry
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = TX.collocation_kcore(
        docs, k_core=kc, n_rounds=8, min_count=mc
    ).toPandas()
    want = duck.execute(
        entry._kcore_oracle(k_core=kc, n_rounds=8, min_count=mc)
    ).fetchdf()
    _assert_same(got, want, f"kcore(k={kc},mc={mc})")


# Exactly-N sampler: sweep n across the under/over-corpus boundary
# (registry config: doc_sample_fixed — n=100) and pin the NESTED
# property the docstring promises — growing n only appends, because
# the hash order is one fixed global permutation.


@pytest.mark.parametrize("n", [5, 50, 100, 5000])
def test_deterministic_top_n_sweep(spark, duck, n):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        deterministic_top_n,
    )

    docs = tables.load_table(spark, "documents", SF_DIR).select(
        "doc_id", "source", "lang", "n_chars"
    )
    got = deterministic_top_n(docs, "doc_id", n).toPandas()
    want = duck.execute(f"""
        SELECT doc_id, source, lang, n_chars FROM (
          SELECT *,
                 CAST(('0x' || substr(md5('sample'
                   || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
          FROM documents)
        ORDER BY h, doc_id LIMIT {n}
    """).fetchdf()
    _assert_same(got, want, f"top_n({n})")


def test_deterministic_top_n_nested(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        deterministic_top_n,
    )

    docs = tables.load_table(spark, "documents", SF_DIR).select("doc_id")
    small = set(
        deterministic_top_n(docs, "doc_id", 5).toPandas()["doc_id"]
    )
    big = set(
        deterministic_top_n(docs, "doc_id", 50).toPandas()["doc_id"]
    )
    assert len(small) == 5 and len(big) == 50
    assert small <= big, "growing n must only append"


# ---------------------------------------------------------------- #
# Incremental dedup: sweep the BATCH COUNT — folding the corpus
# through novel_against_index one batch at a time (each batch checked
# against the union of all earlier batches) must keep exactly the
# docs whose fingerprint has no occurrence in a strictly earlier
# batch, for ANY batch partitioning; k=1 is the degenerate everything-
# is-novel case. Templated twin mirrors the registered
# incremental_novel_docs fingerprint SQL with the batch rule
# substituted. (registry config: one batch = every 5th doc vs the
# rest — the k-fold generalization of that single split)

_FP_SQL = (
    "md5(array_to_string(list_sort(list_distinct("
    "string_split(trim(lower(text)), ' '))), ' '))"
)


@pytest.mark.parametrize("k", [1, 2, 4])
def test_incremental_batch_fold_sweep(spark, duck, k):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        novel_against_index,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    batches = [docs.where(F.col("doc_id") % k == i) for i in range(k)]
    kept = batches[0]
    for i in range(1, k):
        index = batches[0]
        for b in batches[1:i]:
            index = index.unionByName(b)
        kept = kept.unionByName(novel_against_index(batches[i], index))
    got = kept.select("doc_id").toPandas()
    want = duck.execute(f"""
        WITH fp AS (
          SELECT doc_id, {_FP_SQL} AS fp, doc_id % {k} AS batch
          FROM documents)
        SELECT a.doc_id
        FROM fp a
        WHERE NOT EXISTS (
          SELECT 1 FROM fp b
          WHERE b.fp = a.fp AND b.batch < a.batch)
        ORDER BY a.doc_id
    """).fetchdf()
    _assert_same(got, want, f"incremental_fold(k={k})")


# ---------------------------------------------------------------- #
# Compaction: the target file size is a pure layout knob — the
# compacted table must read back row-identical at every target, from
# one-file-per-partition (huge target) to many small files (tiny
# target), including the NULL partition value.


@pytest.mark.parametrize("target", [1 << 30, 64 * 1024, 4 * 1024])
def test_compaction_target_size_sweep(spark, tmp_path, target):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.upsert import (
        compact_partitions,
    )

    src = tables.load_table(spark, "events", SF_DIR).select(
        "event_id", "event_type", "value"
    ).withColumn(
        "event_type",
        F.when(F.col("event_id") % 97 == 0, F.lit(None)).otherwise(
            F.col("event_type")
        ),
    )
    path = str(tmp_path / f"tbl_{target}")
    # spray many small files per partition, like a streaming sink
    src.repartition(8).write.partitionBy("event_type").parquet(path)
    before = spark.read.parquet(path).toPandas()
    compact_partitions(
        spark, path, partition_by=("event_type",),
        target_file_bytes=target,
    )
    after = spark.read.parquet(path).toPandas()
    for df in (before, after):
        df["event_type"] = df["event_type"].astype(object).where(
            df["event_type"].notna(), None
        )
    _assert_same(after, before, f"compact(target={target})")


# ---------------------------------------------------------------- #
# Quality-filter cascade: sweep the thresholds (registry config:
# doc_filter_cascade — min_tokens=20, max_chars=450,
# min_avg_token_len=4.3). First-failure-wins labels partition the
# corpus, so a priority-order bug shows as mass moving between
# reasons; the avg-token ratio is integer-derived binary64 on both
# engines, so thresholds compare identically.


@pytest.mark.parametrize(
    "min_tok,max_ch,min_avt",
    [
        (20, 450, 4.3),      # registry config
        (5, 450, 4.3),
        (50, 200, 4.3),
        (20, 450, 10.0),     # short_tokens dominates the tail
        (1, 10 ** 6, 0.0),   # only low_stopword can fire
    ],
)
def test_quality_cascade_threshold_sweep(spark, duck, min_tok, max_ch,
                                         min_avt):
    import __spark_entry__ as entry
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    d = tables.load_table(spark, "documents", SF_DIR)
    got = (
        d.select(
            TX.quality_drop_reason(
                F.col("text"), F.col("lang"),
                min_tokens=min_tok, max_chars=max_ch,
                min_avg_token_len=min_avt,
            ).alias("reason")
        )
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("reason")
        .toPandas()
    )
    want = duck.execute(f"""
        WITH s AS (
          SELECT {entry._STATS['n_tokens']} AS n_tok,
                 length(text) AS n_ch,
                 {entry._AVG_TOK} AS avt,
                 lang,
                 {entry._STOP_HITS} AS hits
          FROM documents
        )
        SELECT CASE WHEN n_tok < {min_tok} THEN 'too_short'
                    WHEN n_ch > {max_ch} THEN 'too_long'
                    WHEN lang = 'en' AND hits = 0 THEN 'low_stopword'
                    WHEN avt < {min_avt!r} THEN 'short_tokens'
                    ELSE 'kept' END AS reason,
               count(*) AS n_docs
        FROM s GROUP BY reason ORDER BY reason
    """).fetchdf()
    _assert_same(got, want, f"cascade({min_tok},{max_ch},{min_avt})")


# ---------------------------------------------------------------- #
# Feature hashing: sweep the table size and the n-gram order
# (registry config: doc_feature_hashes — n_features=1024, ngram=1).
# The sweep compares the FULL sparse (doc_id, feature_idx, tf) triple
# — stronger than the registry's top-50 histogram cut — including the
# <ngram-token documents that must contribute zero grams (Spark's
# descending sequence(1, 0) footgun, guarded in the operator).


@pytest.mark.parametrize(
    "nf,ng", [(1024, 1), (64, 1), (1024, 2), (256, 3)]
)
def test_feature_hash_sweep(spark, duck, nf, ng):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    d = tables.load_table(spark, "documents", SF_DIR)
    got = TX.feature_hash_counts(d, n_features=nf, ngram=ng).toPandas()
    if ng == 1:
        gram_cte = """
            g AS (SELECT doc_id,
                         unnest(string_split(trim(text), ' ')) AS t
                  FROM documents)"""
    else:
        gram_cte = f"""
            tok AS (SELECT doc_id, string_split(trim(text), ' ') AS tk
                    FROM documents),
            g AS (SELECT doc_id, array_to_string(tk[i:i+{ng - 1}], ' ') AS t
                  FROM tok,
                       unnest(generate_series(1, len(tk) - {ng - 1}))
                         AS r(i)
                  WHERE len(tk) >= {ng})"""
    want = duck.execute(f"""
        WITH {gram_cte},
        fh AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5('feat' || t), 1, 8)) AS BIGINT)
                   % {nf} AS feature_idx
          FROM g)
        SELECT doc_id, feature_idx, CAST(count(*) AS BIGINT) AS tf
        FROM fh GROUP BY doc_id, feature_idx
        ORDER BY doc_id, feature_idx
    """).fetchdf()
    _assert_same(got, want, f"feature_hash(nf={nf},ng={ng})")


# ---------------------------------------------------------------- #
# SRP-LSH pairs: sweep the cosine verification threshold (registry
# config: ann_lsh_pairs — dims=64, threshold=0.2). The 2x8-bit
# banding is the operator's recall contract and stays fixed, so the
# candidate set is constant across thresholds and the sweep exercises
# the exact-cosine cut — including threshold=-1.0, where EVERY
# candidate survives (the full bucket-collision census).

_COS2 = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@pytest.mark.parametrize("threshold", [0.2, 0.5, 0.8, -1.0])
def test_srp_lsh_threshold_sweep(spark, duck, threshold):
    import __spark_entry__ as entry
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        similarity as S,
    )

    emb = tables.load_table(spark, "embeddings", SF_DIR)
    got = S.ann_lsh_pairs(emb, dims=64, threshold=threshold).toPandas()
    want = duck.execute(
        entry._srp_sig_sql()
        + f""",
        bands AS (
          SELECT vec_id, v, 0 AS band, srp & 255 AS bv FROM sig
          UNION ALL
          SELECT vec_id, v, 1 AS band, (srp >> 8) & 255 AS bv FROM sig),
        cands AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id)
        SELECT vec_a, vec_b,
               {_COS2.format(a='sa.v', b='sb.v')} AS sim
        FROM cands
        JOIN sig sa ON vec_a = sa.vec_id
        JOIN sig sb ON vec_b = sb.vec_id
        WHERE {_COS2.format(a='sa.v', b='sb.v')} >= {threshold}
        ORDER BY vec_a, vec_b
    """
    ).fetchdf()
    _assert_same(got, want, f"srp_lsh(th={threshold})")


# ---------------------------------------------------------------- #
# PQ / IVFADC: the codes are lossy so there is no value-level twin —
# the registry oracles are invariant audits, and the sweep asserts
# those invariants across the compression grid (registry configs:
# pq_recall_audit — m=8, n_codes=16, k=5; ivfadc_recall —
# n_centroids=16, n_probe=4, m=8, n_codes=16): every query returns
# exactly k rows, never itself, with distinct valid neighbors; wider
# m (less compression) must not lose the audits' structural shape;
# n_probe = n_centroids is the exhaustive-probe edge.


@pytest.mark.parametrize("m,n_codes", [(8, 16), (4, 16), (16, 16), (8, 8)])
def test_pq_grid_invariants(spark, m, n_codes):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        similarity as S,
    )

    emb = tables.load_table(spark, "embeddings", SF_DIR)
    qf = F.col("vec_id") < 8
    books = S.pq_codebooks(emb, m=m, n_codes=n_codes)
    assert books.shape == (m, n_codes, 64 // m)
    pq = S.pq_topk(emb, qf, books, k=5).toPandas()
    assert set(pq["query_id"]) == set(range(8))
    per_q = pq.groupby("query_id").size()
    assert (per_q == 5).all(), f"pq(m={m},c={n_codes}): {per_q.to_dict()}"
    assert (pq["query_id"] != pq["neighbor_id"]).all()
    assert not pq.duplicated(["query_id", "neighbor_id"]).any()
    assert pq["neighbor_id"].between(0, 499).all()


@pytest.mark.parametrize("np_", [1, 4, 16])
def test_ivfadc_probe_invariants(spark, np_):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        similarity as S,
    )

    emb = tables.load_table(spark, "embeddings", SF_DIR)
    qf = F.col("vec_id") < 8
    adc = S.ivfadc_topk(
        emb, qf, k=5, n_centroids=16, n_probe=np_
    ).toPandas()
    assert set(adc["query_id"]) == set(range(8))
    per_q = adc.groupby("query_id").size()
    # n_probe=1 may expose fewer than k candidates in the one probed
    # cell; every row count must still be bounded by k and positive
    assert (per_q <= 5).all() and (per_q > 0).all()
    if np_ == 16:
        # exhaustive probe scans every cell: full k for every query
        assert (per_q == 5).all()
    assert (adc["query_id"] != adc["neighbor_id"]).all()
    assert not adc.duplicated(["query_id", "neighbor_id"]).any()


# ---------------------------------------------------------------- #
# Retrieval: fixed-point TF-IDF swept over query composition and k —
# including a query term absent from the corpus, which must simply
# contribute nothing (df=0 never divides) — and two-round RM3 PRF
# swept over (fb_docs, fb_terms, k) via the parameterized chained
# oracle generator. (registry configs: doc_search_tfidf — 4 terms,
# k=20; doc_search_prf — fb_docs=10, fb_terms=5, k=20)


@pytest.mark.parametrize(
    "terms,k",
    [
        (["merge", "stream", "vector", "window"], 20),  # registry
        (["vector"], 5),
        (["merge", "zzz_no_such_term"], 20),
        (["merge", "stream", "vector", "window"], 5),
    ],
)
def test_tfidf_query_sweep(spark, duck, terms, k):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = TX.tfidf_search(docs, " ".join(terms), k=k).toPandas()
    qlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    want = duck.execute(f"""
        WITH q AS (SELECT unnest([{qlist}]) AS t),
        n AS (SELECT count(*) AS n FROM documents),
        hits AS (
          SELECT doc_id, tok.t
          FROM (SELECT doc_id,
                       unnest(string_split(trim(text), ' ')) AS t
                FROM documents) tok
          JOIN q ON q.t = tok.t),
        dfs AS (SELECT t, count(DISTINCT doc_id) AS df
                FROM hits GROUP BY t),
        tfs AS (SELECT doc_id, t, count(*) AS tf
                FROM hits GROUP BY doc_id, t),
        scored AS (
          SELECT tfs.doc_id,
                 sum(CAST(tfs.tf AS HUGEINT)
                     * ((CAST(1000000 AS HUGEINT) * n.n) // dfs.df))
                   AS score
          FROM tfs JOIN dfs ON tfs.t = dfs.t CROSS JOIN n
          GROUP BY tfs.doc_id)
        SELECT doc_id, CAST(score AS BIGINT) AS score
        FROM scored ORDER BY score DESC, doc_id LIMIT {k}
    """).fetchdf()
    _assert_same(got, want, f"tfidf(k={k},q={terms})")


@pytest.mark.parametrize(
    "fb_docs,fb_terms,k", [(10, 5, 20), (3, 5, 20), (10, 2, 20), (5, 10, 10)]
)
def test_prf_feedback_sweep(spark, duck, fb_docs, fb_terms, k):
    import __spark_entry__ as entry
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = TX.bm25_prf_search(
        docs, "vector stream merge window", k=k,
        fb_docs=fb_docs, fb_terms=fb_terms,
    ).toPandas()
    want = duck.execute(
        entry._bm25_prf_oracle(fb_docs=fb_docs, fb_terms=fb_terms, k=k)
    ).fetchdf()
    _assert_same(got, want, f"prf(fb={fb_docs},t={fb_terms},k={k})")


# ---------------------------------------------------------------- #
# Graph/co-occurrence text mining: Apriori 2-itemsets over the
# support floor, triangle strength over the edge-weight floor,
# TextRank over iteration count and pruning floor (fixed-point
# damping, both engines run the identical IEEE sequence), and
# corpus heavy-hitter n-grams over the gram order. (registry
# configs: doc_frequent_pairs — min_support=20, k=50;
# corpus_triangles — min_count=5, k=50; corpus_textrank — n_iter=5,
# k=50, min_count=5; corpus_ngram_topk — n=2, k=20)


@pytest.mark.parametrize("s,k", [(20, 50), (10, 50), (40, 50), (20, 10)])
def test_frequent_pairs_support_sweep(spark, duck, s, k):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = TX.doc_frequent_pairs(docs, min_support=s, k=k).toPandas()
    want = duck.execute(f"""
        WITH dt AS (
          SELECT DISTINCT doc_id,
                 unnest(list_distinct(string_split(trim(text), ' ')))
                   AS t
          FROM documents),
        dfs AS (SELECT t, count(*) AS df FROM dt GROUP BY t),
        freq AS (SELECT t, df FROM dfs WHERE df >= {s}),
        pr AS (SELECT dt.doc_id, dt.t FROM dt
               JOIN freq ON dt.t = freq.t),
        pairs AS (
          SELECT a.t AS a, b.t AS b, count(*) AS support
          FROM pr a JOIN pr b
            ON a.doc_id = b.doc_id AND a.t < b.t
          GROUP BY a.t, b.t HAVING count(*) >= {s}),
        n AS (SELECT count(*) AS n FROM documents)
        SELECT p.a, p.b, CAST(p.support AS BIGINT) AS support,
               CAST(p.support AS DOUBLE) * CAST(n.n AS DOUBLE)
                 / (CAST(fa.df AS DOUBLE) * CAST(fb.df AS DOUBLE))
                 AS lift
        FROM pairs p
        JOIN freq fa ON p.a = fa.t
        JOIN freq fb ON p.b = fb.t
        CROSS JOIN n
        ORDER BY support DESC, lift DESC, p.a, p.b LIMIT {k}
    """).fetchdf()
    _assert_same(got, want, f"freq_pairs(s={s},k={k})")


@pytest.mark.parametrize("mc,k", [(5, 50), (3, 50), (10, 50), (5, 10)])
def test_triangles_min_count_sweep(spark, duck, mc, k):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = TX.collocation_triangles(docs, k=k, min_count=mc).toPandas()
    want = duck.execute(f"""
        WITH tok AS (
          SELECT string_split(trim(text), ' ') AS tk FROM documents),
        pairs AS (
          SELECT least(tk[i], tk[i+1]) AS a,
                 greatest(tk[i], tk[i+1]) AS b
          FROM tok, unnest(range(1, len(tk))) AS r(i)
          WHERE len(tk) >= 2 AND tk[i] <> tk[i+1]),
        e AS (
          SELECT a, b, count(*) AS w FROM pairs GROUP BY a, b
          HAVING count(*) >= {mc})
        SELECT e1.a, e1.b, e2.b AS c,
               CAST(least(e1.w, e2.w, e3.w) AS BIGINT) AS strength
        FROM e e1
        JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
        ORDER BY strength DESC, e1.a, e1.b, c LIMIT {k}
    """).fetchdf()
    _assert_same(got, want, f"triangles(mc={mc},k={k})")


@pytest.mark.parametrize("n_iter,mc", [(5, 5), (1, 5), (3, 5), (5, 3)])
def test_textrank_iteration_sweep(spark, duck, n_iter, mc):
    import __spark_entry__ as entry
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = TX.corpus_textrank(
        docs, k=50, n_iter=n_iter, min_count=mc
    ).toPandas()
    want = duck.execute(
        entry._textrank_oracle(n_iter=n_iter, k=50, min_count=mc)
    ).fetchdf()
    _assert_same(got, want, f"textrank(it={n_iter},mc={mc})")


@pytest.mark.parametrize("n,k", [(2, 20), (1, 20), (3, 20), (2, 5)])
def test_ngram_topk_order_sweep(spark, duck, n, k):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = TX.corpus_ngram_topk(docs, n=n, k=k).toPandas()
    nm1 = n - 1
    want = duck.execute(f"""
        WITH t AS (
          SELECT string_split(trim(text), ' ') AS tk FROM documents
        ), g AS (
          SELECT unnest(list_transform(
                   generate_series(1, greatest(len(tk) - {nm1}, 0)),
                   i -> array_to_string(tk[i:i+{nm1}], ' '))) AS gram
          FROM t
        )
        SELECT gram, count(*) AS n
        FROM g GROUP BY gram
        ORDER BY n DESC, gram
        LIMIT {k}
    """).fetchdf()
    _assert_same(got, want, f"ngram_topk(n={n},k={k})")


# ---------------------------------------------------------------- #
# Greedy k-center coreset: sweep the coreset size against the
# parameterized unrolled-CTE twin — ids AND gains must hash-match at
# every k (same dot-identity distances, same (mind DESC, id)
# tie-break; k=2 pins the very first argmax round alone). (registry
# config: kcenter_selection — k=8)


@pytest.mark.parametrize("k", [2, 5, 8, 16])
def test_kcenter_k_sweep(spark, duck, k):
    # k=2 pins the very first argmax round alone; k=16 above the
    # registry's 8 became tractable once _kcenter_sql materialized its
    # m{i}/c{i} CTEs (inlined, DuckDB re-evaluated the chain
    # exponentially in k)
    import __spark_entry__ as entry
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
        similarity as S,
    )

    emb = tables.load_table(spark, "embeddings", SF_DIR)
    got = S.kcenter_select(emb, k=k).orderBy("rank").toPandas()
    want = duck.execute(entry._kcenter_sql(k)).fetchdf()
    _assert_same(got, want, f"kcenter(k={k})")


# ---------------------------------------------------------------- #
# Repetition audit: sweep the n-gram order and the high-repetition
# threshold (registry config: doc_repetition_stats — n=2,
# threshold 1/5). The threshold is an exact integer cross-
# multiplication, so sweeping the rational moves documents across
# the n_high_rep cut with no float comparison anywhere; n=3 changes
# the gram domain itself.


@pytest.mark.parametrize(
    "n,hn,hd", [(2, 1, 5), (3, 1, 5), (2, 1, 2), (2, 1, 100)]
)
def test_repetition_threshold_sweep(spark, duck, n, hn, hd):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions import (
        text as TX,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = TX.repetition_stats(
        docs, n=n, high_num=hn, high_den=hd
    ).toPandas()
    nm1 = n - 1
    want = duck.execute(f"""
        WITH t AS (
          SELECT lang, string_split(trim(text), ' ') AS tk
          FROM documents
        ), d AS (
          SELECT lang,
                 CAST(greatest(len(tk) - {nm1}, 0) AS BIGINT) AS n_grams,
                 CAST(greatest(len(tk) - {nm1}, 0)
                      - len(list_distinct(list_transform(
                          generate_series(1, greatest(len(tk) - {nm1}, 0)),
                          i -> array_to_string(tk[i:i+{nm1}], ' '))))
                   AS BIGINT) AS n_dup
          FROM t
        )
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_grams) AS BIGINT) AS total_grams,
               CAST(sum(n_dup) AS BIGINT) AS dup_grams,
               round(CAST(sum(n_dup) AS DOUBLE)
                     / CAST(sum(n_grams) AS DOUBLE), 6) AS rep_frac,
               CAST(sum(CASE WHEN n_dup * {hd} > n_grams * {hn}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_high_rep
        FROM d GROUP BY lang ORDER BY lang
    """).fetchdf()
    _assert_same(got, want, f"repetition(n={n},{hn}/{hd})")


# ---------------------------------------------------------------- #
# Split-conformal intervals: sweep the miscoverage rational alpha
# (registry config: forecast_conformal — alpha=1/10). The calibration
# rank k = ceil((n_c+1)(1-alpha)) is exact integer arithmetic, so
# every alpha moves the chosen order statistic deterministically;
# alpha=1/2 picks the (roughly) median width, alpha=1/20 the extreme
# tail clamped to n_c.


@pytest.mark.parametrize("an,ad", [(1, 10), (1, 2), (1, 4), (1, 20)])
def test_conformal_alpha_sweep(spark, duck, an, ad):
    import __spark_entry__ as entry
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans import (
        gold as G,
    )

    feats = entry._pseudo_features_hourly(spark, SF_DIR)
    fc = G.seasonal_naive_forecast(feats, horizons=[1, 24])
    got = G.conformal_eval(
        fc, feats, alpha_num=an, alpha_den=ad
    ).toPandas()
    a, b = ad - an, ad
    want = duck.execute(
        entry._PSEUDO_FEATURES_CTE
        + f""",
        fc AS (
          SELECT site, ts_utc + INTERVAL 1 HOUR AS ts_utc,
                 'baseline' AS model, var, 1 AS horizon_h,
                 lag_h1 AS yraw
          FROM sig
          UNION ALL
          SELECT site, ts_utc + INTERVAL 24 HOUR AS ts_utc,
                 'baseline' AS model, var, 24 AS horizon_h,
                 lag_h24 AS yraw
          FROM sig
        ),
        f AS (
          SELECT site, ts_utc, model, var, horizon_h,
                 greatest(yraw, 0.0) AS yhat
          FROM fc WHERE yraw IS NOT NULL
        ),
        act AS (
          SELECT site, ts_utc, 'pv' AS var, pv_est_mwh AS y FROM s
          UNION ALL
          SELECT site, ts_utc, 'wind' AS var, wind_est_mwh AS y FROM s
        ),
        pts AS (
          SELECT model, var, horizon_h, site, ts_utc,
                 abs(yhat - y) AS ar
          FROM f JOIN act USING (site, ts_utc, var)),
        ranked AS (
          SELECT *,
                 row_number() OVER (
                   PARTITION BY model, var, horizon_h
                   ORDER BY ts_utc, site) AS rn,
                 count(*) OVER (
                   PARTITION BY model, var, horizon_h) AS n
          FROM pts),
        calib AS (SELECT * FROM ranked WHERE rn <= n // 2),
        tst AS (SELECT * FROM ranked WHERE rn > n // 2),
        qt AS (
          SELECT model, var, horizon_h, ar AS q, nc AS n_calib
          FROM (
            SELECT *,
                   row_number() OVER (
                     PARTITION BY model, var, horizon_h
                     ORDER BY ar, ts_utc, site) AS ra,
                   count(*) OVER (
                     PARTITION BY model, var, horizon_h) AS nc
            FROM calib)
          WHERE ra = least(((nc + 1) * {a} + {b - 1}) // {b}, nc))
        SELECT t.model, t.var, t.horizon_h,
               CAST(q.n_calib AS BIGINT) AS n_calib,
               count(*) AS n_test,
               round(q.q, 4) AS q_width,
               round(avg(CASE WHEN t.ar <= q.q THEN 1.0 ELSE 0.0 END),
                     4) AS coverage
        FROM tst t JOIN qt q USING (model, var, horizon_h)
        GROUP BY t.model, t.var, t.horizon_h, q.n_calib, q.q
        ORDER BY t.model, t.var, t.horizon_h
    """
    ).fetchdf()
    _assert_same(got, want, f"conformal(a={an}/{ad})")


# ---------------------------------------------------------------- #
# Rolling features: sweep the trailing-frame width (registry config:
# silver_rolling_features — window_hours=24). The frame bound is the
# only thing that moves; the exact-decimal windowed mean must match
# the templated ROWS BETWEEN twin at every width, including the
# degenerate window_hours=1 (frame = current row alone, roll_mean ==
# ghi_wm2).

_ROLLING_SQL = """
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
      SELECT site, CAST(ts_hour AS TIMESTAMP) AS ts_utc, ghi_wm2
      FROM d WHERE rn = 1
    )
    SELECT site, ts_utc, ghi_wm2,
           CAST(sum(CAST(ghi_wm2 AS DECIMAL(20,6))) OVER w AS DOUBLE)
             / count(ghi_wm2) OVER w AS roll_mean,
           min(ghi_wm2) OVER w AS roll_min,
           max(ghi_wm2) OVER w AS roll_max,
           lag(ghi_wm2, 1) OVER
             (PARTITION BY site ORDER BY ts_utc) AS lag_1h,
           lag(ghi_wm2, 24) OVER
             (PARTITION BY site ORDER BY ts_utc) AS lag_24h
    FROM fact
    WINDOW w AS (PARTITION BY site ORDER BY ts_utc
                 ROWS BETWEEN {pre} PRECEDING AND CURRENT ROW)
    ORDER BY site, ts_utc
"""


@pytest.mark.parametrize("wh", [24, 1, 6, 168])
def test_rolling_window_sweep(spark, duck, wh):
    import __spark_entry__ as entry
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.plans import (
        gold as G,
        silver as SV,
    )

    got = G.rolling_features(
        SV.clean_to_hourly(entry._pseudo_bronze(spark, SF_DIR)),
        window_hours=wh,
    ).toPandas()
    want = duck.execute(_ROLLING_SQL.format(pre=wh - 1)).fetchdf()
    _assert_same(got, want, f"rolling(wh={wh})")


# ---------------------------------------------------------------- #
# Contrastive negatives: sweep k and the bucket count (registry
# config: doc_negatives — k=4, n_buckets=8). The ring lives inside a
# hash bucket, so bucket count changes EVERY neighborhood while the
# per-anchor contract (exactly k distinct negatives, cyclic hash-ring
# successors) holds at any geometry; the too-small-bucket guard is
# pinned at the k >= bucket-size edge.


@pytest.mark.parametrize("k,nb", [(4, 8), (2, 8), (4, 2), (8, 16)])
def test_contrastive_negatives_sweep(spark, duck, k, nb):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        contrastive_negatives,
    )

    docs = tables.load_table(spark, "documents", SF_DIR)
    got = contrastive_negatives(docs, k=k, n_buckets=nb).toPandas()
    slots = ", ".join(str(s) for s in range(1, k + 1))
    want = duck.execute(f"""
        WITH ring AS (
          SELECT doc_id AS anchor,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) AS r
          FROM documents),
        b AS (SELECT anchor, r, r % {nb} AS bk FROM ring),
        pos AS (
          SELECT anchor, bk,
                 row_number() OVER (
                   PARTITION BY bk ORDER BY r, anchor) AS p,
                 count(*) OVER (PARTITION BY bk) AS n
          FROM b),
        want AS (
          SELECT anchor, bk, p, n, s.slot,
                 (p - 1 + s.slot) % n + 1 AS tgt
          FROM pos, (SELECT unnest([{slots}]) AS slot) s)
        SELECT w.anchor, m.anchor AS negative,
               CAST(w.slot AS INTEGER) AS slot
        FROM want w JOIN pos m ON w.bk = m.bk AND w.tgt = m.p
        ORDER BY w.anchor, w.slot
    """).fetchdf()
    _assert_same(got, want, f"negatives(k={k},nb={nb})")


def test_contrastive_small_bucket_guard(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        contrastive_negatives,
    )

    docs = tables.load_table(spark, "documents", SF_DIR).limit(6)
    with pytest.raises(Exception, match="bucket|k"):
        contrastive_negatives(docs, k=8, n_buckets=2).collect()


# ---------------------------------------------------------------- #
# Priority sampling: sweep n across the corpus boundary plus the
# nested-growth property (growing n only appends — the priority order
# is one fixed global permutation) and a weight-sensitivity check
# (squared weights reorder priorities, so the selected set must
# actually respond to the weight column — a sweep that ignored the
# weights would still pass the identity otherwise).
# (registry config: doc_weighted_sample — n=100, weight=token count)


@pytest.mark.parametrize("n", [10, 100, 5000])
def test_priority_sample_n_sweep(spark, duck, n):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        weighted_priority_sample,
    )

    docs = tables.load_table(spark, "documents", SF_DIR).select(
        "doc_id", "text"
    )
    w = F.size(F.split(F.trim(F.col("text")), " "))
    got = (
        weighted_priority_sample(docs, "doc_id", w, n)
        .select("doc_id", w.cast("long").alias("n_tokens"))
        .orderBy("doc_id")
        .toPandas()
    )
    want = duck.execute(f"""
        WITH t AS (
          SELECT doc_id,
                 len(string_split(trim(text), ' ')) AS n_tokens
          FROM documents),
        q AS (
          SELECT doc_id, n_tokens,
                 CAST(n_tokens AS DOUBLE)
                   / ((CAST(('0x' || substr(md5('priority'
                         || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       + 1) / 4294967296.0) AS pr
          FROM t WHERE n_tokens > 0),
        top AS (
          SELECT doc_id, n_tokens FROM q
          ORDER BY pr DESC, doc_id LIMIT {n})
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
        FROM top ORDER BY doc_id
    """).fetchdf()
    _assert_same(got, want, f"priority(n={n})")


def test_priority_sample_nested_and_weighted(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        weighted_priority_sample,
    )

    docs = tables.load_table(spark, "documents", SF_DIR).select(
        "doc_id", "text"
    )
    w = F.size(F.split(F.trim(F.col("text")), " "))
    small = set(
        weighted_priority_sample(docs, "doc_id", w, 20)
        .toPandas()["doc_id"]
    )
    big = set(
        weighted_priority_sample(docs, "doc_id", w, 80)
        .toPandas()["doc_id"]
    )
    assert len(small) == 20 and len(big) == 80 and small <= big
    # squared weights must reorder the selection (weight sensitivity)
    sq = set(
        weighted_priority_sample(docs, "doc_id", w * w, 20)
        .toPandas()["doc_id"]
    )
    assert sq != small
