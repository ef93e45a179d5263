"""Round-11 operator unit tests: source_temperature_mix (alpha=1/2
data-mixing weights), ccnet_buckets (head/middle/tail perplexity
thirds per source), and the MIPS metric of ann_bruteforce_topk —
pinned against hand-computable corpora, pure-Python oracles on
randomized inputs, and (for MIPS) the norm-augmented reduction to
cosine (Bachrach et al. 2014) the docstring promises."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions.text import (
    ccnet_buckets,
    doc_nll_scores,
    source_temperature_mix,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.similarity import (
    _ordered_gemm,
    _ordered_norms,
    ann_bruteforce_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string",
    )


# ------------------------------------------- source_temperature_mix


def test_temperature_mix_hand_computed(spark):
    # src_a: 16 tokens, src_b: 4 tokens -> T=20
    # raw shares: 800000 / 200000 ppm
    # s = floor(1e6*sqrt(c)): 4_000_000 / 2_000_000; S = 6_000_000
    # temp shares: floor(1e6*4/6)=666666 / floor(1e6*2/6)=333333
    # boost: 666666*1e6 div 800000 = 833332; 333333*1e6 div 200000
    #        = 1666665 (the tail source is upsampled)
    docs = _docs(
        spark,
        [("a b c d e f g h i j k l m n o p", "src_a"), ("q r s t", "src_b")],
    )
    rows = {r["source"]: r for r in source_temperature_mix(docs).collect()}
    a, b = rows["src_a"], rows["src_b"]
    assert (a["n_tokens"], b["n_tokens"]) == (16, 4)
    assert (a["raw_share_ppm"], b["raw_share_ppm"]) == (800000, 200000)
    assert (a["temp_share_ppm"], b["temp_share_ppm"]) == (666666, 333333)
    assert (a["boost_ppm"], b["boost_ppm"]) == (833332, 1666665)


def test_temperature_mix_flattens_toward_uniform(spark):
    # the defining property of temperature sampling: every source with
    # below-average raw share is upsampled (boost > 1e6), every source
    # above average is downsampled — and the ordering of shares is
    # preserved (sqrt is monotone)
    rows = [("t " * (4 ** i)).strip() for i in range(1, 5)]
    docs = _docs(spark, [(t, f"s{i}") for i, t in enumerate(rows)])
    out = source_temperature_mix(docs).collect()
    mean_ppm = 1_000_000 // len(out)
    for r in out:
        if r["raw_share_ppm"] < mean_ppm:
            assert r["boost_ppm"] > 1_000_000, r
        if r["raw_share_ppm"] > mean_ppm:
            assert r["boost_ppm"] < 1_000_000, r
    by_raw = sorted(out, key=lambda r: r["raw_share_ppm"])
    temp = [r["temp_share_ppm"] for r in by_raw]
    assert temp == sorted(temp)
    # ppm rounding: shares sum to 1e6 minus at most one floor unit each
    for col in ("raw_share_ppm", "temp_share_ppm"):
        tot = sum(r[col] for r in out)
        assert 1_000_000 - len(out) < tot <= 1_000_000, (col, tot)


def test_temperature_mix_python_oracle_randomized(spark):
    rng = np.random.default_rng(11)
    sizes = {f"s{i}": int(rng.integers(1, 400)) for i in range(12)}
    docs = _docs(
        spark, [(("x " * n).strip(), s) for s, n in sizes.items()]
    )
    got = {r["source"]: r for r in source_temperature_mix(docs).collect()}
    t = sum(sizes.values())
    sq = {s: math.floor(1e6 * math.sqrt(n)) for s, n in sizes.items()}
    ts = sum(sq.values())
    for s, n in sizes.items():
        raw = math.floor(1e6 * (n / t))
        temp = math.floor(1e6 * (sq[s] / ts))
        assert got[s]["n_tokens"] == n
        assert got[s]["raw_share_ppm"] == raw, s
        assert got[s]["temp_share_ppm"] == temp, s
        assert got[s]["boost_ppm"] == (
            temp * 1_000_000 // raw if raw > 0 else None
        ), s


def test_temperature_mix_zero_raw_share_is_null_boost(spark):
    # ADVICE r11 #1: actually drive the raw_share_ppm == 0 -> NULL
    # guard through the Spark plan. One source contributes a single
    # token against > 1e6 tokens total, so floor(1e6 * 1/total) = 0
    # and boost_ppm must come back NULL — not a division error.
    # 8 docs x 125_001 tokens ≈ 2 MB of text: fast enough for a unit
    # test, large enough to floor a one-token source to 0 ppm.
    docs = spark.createDataFrame(
        [(0, "lone", "tiny")]
        + [(i, ("y " * 125_001).strip(), "big") for i in range(1, 9)],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in source_temperature_mix(docs).collect()}
    assert out["tiny"]["raw_share_ppm"] == 0
    assert out["tiny"]["boost_ppm"] is None
    # sqrt-temperature still upsamples... nothing here: the guard only
    # nulls the ratio; the shares themselves stay well-defined
    assert out["tiny"]["temp_share_ppm"] > 0
    assert out["big"]["boost_ppm"] is not None


# -------------------------------------------------- ccnet_buckets


def _bucket_oracle(scores_by_source):
    """Pure-Python twin of the threshold rule."""
    out = {}
    for src, scores in scores_by_source.items():
        n = len(scores)
        counts = {}
        for v in scores:
            counts[v] = counts.get(v, 0) + 1
        cum = 0
        for v in sorted(counts):
            c = counts[v]
            if 3 * cum < n:
                b = "head"
            elif 3 * cum < 2 * n:
                b = "middle"
            else:
                b = "tail"
            rec = out.setdefault((src, b), [0, v, v])
            rec[0] += c
            rec[1] = min(rec[1], v)
            rec[2] = max(rec[2], v)
            cum += c
    return {k: tuple(v) for k, v in out.items()}


def test_ccnet_buckets_match_python_oracle_on_real_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scores = {
        (r["doc_id"]): r["avg_nll_s"]
        for r in doc_nll_scores(docs).collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in docs.select("doc_id", "source").collect()
    }
    by_source = {}
    for d, v in scores.items():
        by_source.setdefault(src[d], []).append(v)
    want = _bucket_oracle(by_source)
    got = {
        (r["source"], r["bucket"]): (r["n_docs"], r["min_nll_s"], r["max_nll_s"])
        for r in ccnet_buckets(docs).collect()
    }
    assert got == want
    # buckets partition each source's scored docs
    for s, scores_s in by_source.items():
        total = sum(got.get((s, b), (0,))[0] for b in ("head", "middle", "tail"))
        assert total == len(scores_s), s


def test_ccnet_buckets_ranges_ordered_and_thirds(spark):
    # distinct scores per doc -> bucket sizes are the exact integer
    # thirds (ceil-split) and score ranges are disjoint ascending
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = ccnet_buckets(docs).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], {})[r["bucket"]] = r
    for s, bs in by_src.items():
        order = [bs[b] for b in ("head", "middle", "tail") if b in bs]
        for a, b in zip(order, order[1:]):
            assert a["max_nll_s"] < b["min_nll_s"], s
        for r in order:
            assert r["min_nll_s"] <= r["max_nll_s"], s


def test_ccnet_buckets_uniform_source_is_all_head(spark):
    # every doc identical -> one score group starting at rank 0 ->
    # the whole source is 'head' (a filter keeping head+middle drops
    # nothing it cannot distinguish)
    docs = _docs(spark, [("same text here ok", "u")] * 9)
    out = ccnet_buckets(docs).collect()
    assert len(out) == 1
    assert (out[0]["bucket"], out[0]["n_docs"]) == ("head", 9)


def test_ccnet_buckets_tie_group_lands_where_it_starts(spark):
    # source with scores [x, x, y>x]: the x-group starts at cum_lt=0
    # -> head; y starts at cum_lt=2, 3*2 >= n=3 and 6 >= 2n=6 -> tail
    docs = _docs(
        spark,
        [
            ("a a a a", "t"),        # low NLL (repeated bigram)
            ("a a a a", "t"),
            ("q z k w", "t"),        # rare bigrams -> higher NLL
        ],
    )
    got = {
        (r["bucket"]): r["n_docs"] for r in ccnet_buckets(docs).collect()
    }
    assert got == {"head": 2, "tail": 1}


def test_ccnet_buckets_skips_unscorable_docs(spark):
    # docs with < 2 tokens have no bigrams, no score, no bucket
    docs = _docs(
        spark,
        [("one", "s"), ("a b c", "s"), ("d e f", "s"), ("g h i", "s")],
    )
    out = ccnet_buckets(docs).collect()
    assert sum(r["n_docs"] for r in out) == 3


# -------------------------------------------------- MIPS top-k


def _emb_df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )


def test_mips_topk_matches_numpy_bruteforce(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(60, 8)).astype(np.float32)
    df = _emb_df(spark, mat)
    got = ann_bruteforce_topk(
        df, F.col("vec_id") < 5, k=4, dims=8, metric="dot"
    ).collect()
    m = mat.astype(np.float64)
    for q in range(5):
        dots = m[q] @ m.T
        order = sorted(
            (i for i in range(60) if i != q),
            key=lambda i: (-dots[i], i),
        )[:4]
        rows = [r for r in got if r["query_id"] == q]
        assert [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])] == order


def test_mips_reduces_to_cosine_via_norm_augmentation(spark):
    # Bachrach et al. 2014: append sqrt(M^2 - |x|^2) to each corpus
    # vector and 0 to each query; cosine ranking over the augmented
    # pair equals dot-product ranking (the augmented corpus norm is
    # the constant M, so cos = dot / (|q| M) — monotone in dot).
    rng = np.random.default_rng(13)
    mat = rng.normal(size=(40, 6))
    df = _emb_df(spark, mat)
    mips = ann_bruteforce_topk(
        df, F.col("vec_id") < 6, k=5, dims=6, metric="dot"
    ).collect()
    big_m = float(np.max(_ordered_norms(mat))) * (1.0 + 1e-12)
    aug = np.concatenate(
        [mat, np.sqrt(big_m**2 - _ordered_norms(mat) ** 2)[:, None]], axis=1
    )
    q = np.concatenate([mat[:6], np.zeros((6, 1))], axis=1)
    sims = _ordered_gemm(q, aug) / np.multiply.outer(
        _ordered_norms(q), np.full(len(aug), big_m)
    )
    for qi in range(6):
        s = sims[qi].copy()
        s[qi] = -np.inf
        order = sorted(range(40), key=lambda i: (-s[i], i))[:5]
        rows = sorted(
            (r for r in mips if r["query_id"] == qi), key=lambda r: r["rank"]
        )
        assert [r["neighbor_id"] for r in rows] == order


def test_mips_and_cosine_agree_on_unit_vectors(spark):
    # on a unit-normalized corpus the two metrics induce the same
    # ranking (cos = dot exactly when all norms are 1)
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(30, 4))
    mat = mat / _ordered_norms(mat)[:, None]
    df = _emb_df(spark, mat)
    a = ann_bruteforce_topk(df, F.col("vec_id") < 4, k=3, dims=4, metric="dot")
    b = ann_bruteforce_topk(
        df, F.col("vec_id") < 4, k=3, dims=4, metric="cosine"
    )
    ka = [(r["query_id"], r["rank"], r["neighbor_id"]) for r in a.collect()]
    kb = [(r["query_id"], r["rank"], r["neighbor_id"]) for r in b.collect()]
    assert sorted(ka) == sorted(kb)


def test_mips_unknown_metric_refused(spark):
    df = _emb_df(spark, np.eye(3))
    with pytest.raises(ValueError, match="unknown metric"):
        ann_bruteforce_topk(df, F.col("vec_id") < 1, metric="euclid")


# ------------------------------------------- templated-oracle sweeps
# (the registration ladder's sweep requirement: each r11 entry swept
# over its free parameters against a templated DuckDB twin, not just
# at the registry configuration)

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _assert_same(got: pd.DataFrame, want: pd.DataFrame, label: str) -> None:
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns), ignore_index=True)

    got, want = norm(got), norm(want)
    assert list(got.columns) == list(want.columns), label
    assert len(got) == len(want), f"{label}: {len(got)} != {len(want)}"
    for col in got.columns:
        for i, (x, y) in enumerate(zip(got[col], want[col])):
            if pd.isna(x) and pd.isna(y):
                continue
            if isinstance(x, float) or isinstance(y, float):
                assert math.isclose(
                    float(x), float(y), rel_tol=1e-9, abs_tol=1e-9
                ), (label, col, i, x, y)
            else:
                assert x == y, (label, col, i, x, y)


@pytest.mark.parametrize("group_col", ["source", "lang"])
def test_temperature_mix_group_column_sweep(spark, duck, group_col):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = source_temperature_mix(docs, source_col=group_col).toPandas()
    want = duck.execute(f"""
        WITH per_src AS (
          SELECT {group_col} AS source,
                 CAST(SUM(len(string_split(trim(text), ' ')))
                   AS BIGINT) AS n_tokens
          FROM documents GROUP BY {group_col}),
        sq AS (
          SELECT source, n_tokens,
                 CAST(floor(1000000 * sqrt(CAST(n_tokens AS DOUBLE)))
                   AS BIGINT) AS s
          FROM per_src),
        tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
                       CAST(SUM(s) AS BIGINT) AS ts FROM sq),
        shares AS (
          SELECT source, n_tokens,
                 CAST(floor(1000000 * (CAST(n_tokens AS DOUBLE)
                   / CAST(t AS DOUBLE))) AS BIGINT) AS raw_share_ppm,
                 CAST(floor(1000000 * (CAST(s AS DOUBLE)
                   / CAST(ts AS DOUBLE))) AS BIGINT) AS temp_share_ppm
          FROM sq CROSS JOIN tot)
        SELECT source, n_tokens, raw_share_ppm, temp_share_ppm,
               CASE WHEN raw_share_ppm > 0
                    THEN CAST(temp_share_ppm * 1000000 // raw_share_ppm
                      AS BIGINT) END AS boost_ppm
        FROM shares ORDER BY source
    """).fetchdf()
    _assert_same(got, want, f"temperature_mix({group_col})")


@pytest.mark.parametrize("group_col", ["source", "lang"])
def test_ccnet_buckets_group_column_sweep(spark, duck, group_col):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = ccnet_buckets(docs, source_col=group_col).toPandas()
    want = duck.execute(f"""
        WITH tok AS (
          SELECT doc_id, string_split(trim(text), ' ') AS tk
          FROM documents),
        pairs AS (
          SELECT doc_id, tk[i] AS a, tk[i+1] AS b
          FROM tok, unnest(range(1, len(tk))) AS r(i)
          WHERE len(tk) >= 2),
        big AS (SELECT a, b, count(*) AS cab FROM pairs GROUP BY a, b),
        ctx AS (SELECT a, sum(cab) AS ca FROM big GROUP BY a),
        voc AS (
          SELECT count(DISTINCT t) AS v
          FROM (SELECT unnest(string_split(trim(text), ' ')) AS t
                FROM documents)),
        model AS (
          SELECT big.a, big.b,
                 CAST(floor(1000000 * ln(
                   CAST(ctx.ca + voc.v AS DOUBLE)
                   / CAST(big.cab + 1 AS DOUBLE))) AS BIGINT) AS nll_s
          FROM big JOIN ctx ON big.a = ctx.a CROSS JOIN voc),
        per_doc AS (
          SELECT doc_id, a, b, count(*) AS tf
          FROM pairs GROUP BY doc_id, a, b),
        scored AS (
          SELECT p.doc_id,
                 sum(p.tf) AS n_bigrams,
                 sum(p.tf * m.nll_s) AS nll_sum
          FROM per_doc p JOIN model m ON p.a = m.a AND p.b = m.b
          GROUP BY p.doc_id),
        avg_s AS (
          SELECT doc_id,
                 CAST(nll_sum // n_bigrams AS BIGINT) AS avg_nll_s
          FROM scored),
        src AS (
          SELECT d.{group_col} AS source, p.avg_nll_s
          FROM avg_s p JOIN documents d USING (doc_id)),
        spec AS (
          SELECT source, avg_nll_s, count(*) AS c
          FROM src GROUP BY source, avg_nll_s),
        cum AS (
          SELECT source, avg_nll_s, c,
                 sum(c) OVER (PARTITION BY source ORDER BY avg_nll_s
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) - c AS cum_lt,
                 sum(c) OVER (PARTITION BY source) AS n
          FROM spec),
        b AS (
          SELECT source, avg_nll_s, c,
                 CASE WHEN 3 * cum_lt < n THEN 'head'
                      WHEN 3 * cum_lt < 2 * n THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM cum)
        SELECT source, bucket, CAST(sum(c) AS BIGINT) AS n_docs,
               CAST(min(avg_nll_s) AS BIGINT) AS min_nll_s,
               CAST(max(avg_nll_s) AS BIGINT) AS max_nll_s
        FROM b GROUP BY source, bucket
        ORDER BY source, bucket
    """).fetchdf()
    _assert_same(got, want, f"ccnet_buckets({group_col})")


@pytest.mark.parametrize(
    "k,qmax", [(1, 8), (5, 8), (12, 3), (3, 16)]
)
def test_mips_topk_param_sweep(spark, duck, k, qmax):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = ann_bruteforce_topk(
        emb, F.col("vec_id") < qmax, k=k, metric="dot"
    ).toPandas()
    want = duck.execute(f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_dot_product(q.v, c.v) AS sim
          FROM e q JOIN e c ON q.vec_id < {qmax} AND q.vec_id != c.vec_id)
        SELECT query_id, neighbor_id, sim,
               CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY sim DESC, neighbor_id
               ) AS INTEGER) AS "rank"
        FROM scored
        QUALIFY "rank" <= {k}
        ORDER BY query_id, "rank"
    """).fetchdf()
    _assert_same(got, want, f"mips(k={k},qmax={qmax})")


# -------------------------------------------------- inner-product IVF


def test_mips_ivf_exhaustive_probe_equals_exact_mips(spark):
    # probing every cell makes the candidate set the whole corpus
    # (minus self), so the inner-product IVF must reproduce the exact
    # MIPS top-k row for row — the identity the docstring promises
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.similarity import (
        ann_ivf_topk,
    )

    exact = ann_bruteforce_topk(
        emb, F.col("vec_id") < 6, k=4, metric="dot"
    ).collect()
    ivf = ann_ivf_topk(
        emb, F.col("vec_id") < 6, k=4, n_centroids=16, n_probe=16,
        metric="dot",
    ).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
    assert sorted(map(key, exact)) == sorted(map(key, ivf))


def test_mips_ivf_recall_reasonable_at_registry_config(spark):
    # 4/16 probes: recall@5 against exact MIPS must clear 0.5 on the
    # harness embeddings (the cosine IVF's own audit bar) — a broken
    # candidate path would collapse it toward k/|C|
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.similarity import (
        ann_ivf_topk,
    )

    exact = ann_bruteforce_topk(emb, F.col("vec_id") < 8, k=5, metric="dot")
    approx = ann_ivf_topk(
        emb, F.col("vec_id") < 8, k=5, n_centroids=16, n_probe=4,
        metric="dot",
    )
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(ex & ap) / len(ex) >= 0.5


def test_mips_ivf_unknown_metric_refused(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.similarity import (
        ann_ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError, match="unknown metric"):
        ann_ivf_topk(emb, F.col("vec_id") < 1, metric="l2")


@pytest.mark.parametrize("k,n_probe", [(5, 4), (3, 1), (8, 16), (5, 7)])
def test_mips_ivf_param_sweep(spark, duck, k, n_probe):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.similarity import (
        ann_ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = ann_ivf_topk(
        emb, F.col("vec_id") < 8, k=k, n_centroids=16, n_probe=n_probe,
        metric="dot",
    ).toPandas()
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
    )
    want = duck.execute(f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        asg AS (
          SELECT vec_id, cluster FROM (
            SELECT e.vec_id, c.cid AS cluster,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY {cos.format(a='e.v', b='c.cv')} DESC,
                              c.cid) AS rn
            FROM e, cents c) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        probes AS (
          SELECT query_id, cluster FROM (
            SELECT q.query_id, c.cid AS cluster,
                   row_number() OVER (PARTITION BY q.query_id
                     ORDER BY {cos.format(a='q.qv', b='c.cv')} DESC,
                              c.cid) AS rn
            FROM q, cents c) WHERE rn <= {n_probe}),
        scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 list_dot_product(q.qv, e.v) AS sim
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
    _assert_same(got, want, f"mips_ivf(k={k},probe={n_probe})")
