"""Round-12 operator unit tests: metric="dot" (MIPS) through the
compressed-ANN family — flat PQ/ADC and IVFADC over RAW vectors
(FAISS METRIC_INNER_PRODUCT; VERDICT r11 Next #5). Pinned by
(a) bit-exact equivalence to the cosine path on corpora whose unit
norms are EXACT in float arithmetic (signed one-hots, ±0.5 four-hots:
normalization divides by exactly 1.0, so dot ≡ cosine must match row
for row), (b) a norm-adversarial corpus where MIPS and cosine must
DISAGREE (big-norm near-orthogonal neighbor, codebook-representable
so ADC is exact on it), (c) an exact-representability identity (every
corpus slice is a codeword → flat-PQ MIPS == exact MIPS), and
(d) the registry-config recall audits."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_int8_mips_topk,
    cosine_threshold_pairs,
    ivfadc_topk,
    mips_lsh_pairs,
    mips_threshold_pairs,
    pq_codebooks,
    pq_encode,
    pq_topk,
    quantize_embeddings,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    yield con
    con.close()


def _emb_df(spark, rows):
    """rows: list of (vec_id, list[float]) -> embeddings frame."""
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _exact_unit_corpus(n, dims=16, seed=5):
    """Vectors whose L2 norm is EXACTLY 1.0 in float arithmetic:
    signed one-hots and ±0.5 four-hots (0.25·4 = 1.0 exact), at
    rng-chosen positions/signs — diverse enough to exercise codeword
    assignment, exact enough that _unit_rows is a bit-level no-op."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        v = np.zeros(dims)
        if i % 2 == 0:
            v[rng.integers(dims)] = rng.choice([-1.0, 1.0])
        else:
            pos = rng.choice(dims, size=4, replace=False)
            v[pos] = rng.choice([-0.5, 0.5], size=4)
        rows.append((i, v.tolist()))
    return rows


def _rows(df):
    return [
        (r["query_id"], r["neighbor_id"], r["approx_sim"], r["rank"])
        for r in df.collect()
    ]


# ------------------------------ dot ≡ cosine on exactly-unit vectors


def test_pq_dot_equals_cosine_on_exact_unit_vectors(spark):
    emb = _emb_df(spark, _exact_unit_corpus(24, dims=16))
    qf = F.col("vec_id") < 6
    books_c = pq_codebooks(emb, m=4, n_codes=8, dims=16)
    books_d = pq_codebooks(emb, m=4, n_codes=8, dims=16, metric="dot")
    # on exact-unit input the codebooks themselves are bit-identical
    assert np.array_equal(books_c, books_d)
    cos = pq_topk(emb, qf, books_c, k=4)
    dot = pq_topk(emb, qf, books_d, k=4, metric="dot")
    assert _rows(cos) == _rows(dot)


def test_ivfadc_dot_equals_cosine_on_exact_unit_vectors(spark):
    emb = _emb_df(spark, _exact_unit_corpus(40, dims=16, seed=9))
    qf = F.col("vec_id") < 5
    kw = dict(k=3, n_centroids=8, n_codes=8, m=4, dims=16)
    cos = ivfadc_topk(emb, qf, **kw)
    dot = ivfadc_topk(emb, qf, metric="dot", **kw)
    assert _rows(cos) == _rows(dot)


# --------------------------- norm-adversarial: MIPS must ≠ cosine


def _adversarial_corpus(dims=8, n=16):
    """id 0 = query e0; id 1 = A, parallel unit (cosine winner);
    id 2 = B = 2·e0 + 20·e1 (dot 2.0, cosine ≈ 0.0995 — MIPS winner);
    ids 3.. tiny fillers. All of q/A/B sit in the codebook head so
    flat-PQ encodes them exactly in BOTH metrics (their own slices
    are codewords at distance 0)."""
    rng = np.random.default_rng(3)
    rows = [
        (0, [1.0] + [0.0] * (dims - 1)),
        (1, [1.0] + [0.0] * (dims - 1)),
        (2, [2.0, 20.0] + [0.0] * (dims - 2)),
    ]
    for i in range(3, n):
        rows.append((i, (rng.normal(0, 0.01, dims)).tolist()))
    return rows


def test_pq_mips_ranks_by_norm_cosine_does_not(spark):
    emb = _emb_df(spark, _adversarial_corpus())
    qf = F.col("vec_id") < 1
    kw = dict(m=4, n_codes=16, dims=8)
    dot = pq_topk(
        emb, qf, pq_codebooks(emb, metric="dot", **kw), k=2, metric="dot"
    ).collect()
    cos = pq_topk(emb, qf, pq_codebooks(emb, **kw), k=2).collect()
    # MIPS: the big-norm near-orthogonal B (dot 2.0) beats the
    # parallel unit A (dot 1.0). Cosine is scale-free: A (1.0) wins
    # and B (~0.0995) drops out of the top-2 entirely — normalization
    # inflates the tiny fillers to random directions that outscore it.
    assert [r["neighbor_id"] for r in dot] == [2, 1]
    assert cos[0]["neighbor_id"] == 1
    assert 2 not in [r["neighbor_id"] for r in cos]
    # and the MIPS sims are EXACT dots (head vectors are codewords)
    assert dot[0]["approx_sim"] == pytest.approx(2.0)
    assert dot[1]["approx_sim"] == pytest.approx(1.0)


def test_ivfadc_mips_ranks_by_norm(spark):
    # A and B live in the SAMPLE block (ids n_centroids..): their
    # residuals are themselves codewords, so their ADC sims are exact
    # and the MIPS ranking [B, A] is deterministic
    dims, nc = 8, 4
    rng = np.random.default_rng(7)
    rows = [(0, [1.0] + [0.0] * (dims - 1))]  # query + centroid 0
    for i in range(1, nc):  # remaining centroids: other unit axes
        v = np.zeros(dims)
        v[i] = 1.0
        rows.append((i, v.tolist()))
    rows.append((nc, [1.0] + [0.0] * (dims - 1)))  # A (id 4)
    rows.append((nc + 1, [2.0, 20.0] + [0.0] * (dims - 2)))  # B (id 5)
    for i in range(nc + 2, nc + 8):  # rest of the sample: tiny
        rows.append((i, (rng.normal(0, 0.01, dims)).tolist()))
    emb = _emb_df(spark, rows)
    out = ivfadc_topk(
        emb,
        F.col("vec_id") < 1,
        k=2,
        n_centroids=nc,
        n_codes=8,
        m=4,
        dims=dims,
        n_probe=nc,  # exhaustive: cell placement can't hide A or B
        metric="dot",
    ).collect()
    assert [r["neighbor_id"] for r in out] == [5, 4]
    assert out[0]["approx_sim"] == pytest.approx(2.0)
    assert out[1]["approx_sim"] == pytest.approx(1.0)


# ------------------- exact representability: flat-PQ MIPS == MIPS


def test_pq_mips_exact_when_corpus_is_codebook(spark):
    # corpus == codebook head: every subvector slice IS a codeword, so
    # the encode is lossless and ADC reproduces exact MIPS row for row
    # (same sim-desc/id-asc tie convention on both paths)
    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(0, 1, 16).tolist()) for i in range(16)]
    emb = _emb_df(spark, rows)
    qf = F.col("vec_id") < 4
    books = pq_codebooks(emb, m=4, n_codes=16, dims=16, metric="dot")
    pq = pq_topk(emb, qf, books, k=5, metric="dot").select(
        "query_id", "neighbor_id", "rank"
    )
    exact = ann_bruteforce_topk(emb, qf, k=5, dims=16, metric="dot").select(
        "query_id", "neighbor_id", "rank"
    )
    assert sorted(map(tuple, pq.collect())) == sorted(
        map(tuple, exact.collect())
    )


# ------------------------------------------------- guards and sweeps


def test_pq_family_unknown_metric_refused(spark):
    emb = _emb_df(spark, _exact_unit_corpus(20))
    books = pq_codebooks(emb, m=4, n_codes=8, dims=16)
    with pytest.raises(ValueError, match="unknown metric"):
        pq_codebooks(emb, m=4, n_codes=8, dims=16, metric="l2")
    with pytest.raises(ValueError, match="unknown metric"):
        pq_encode(emb, books, metric="euclid")
    with pytest.raises(ValueError, match="unknown metric"):
        pq_topk(emb, F.col("vec_id") < 1, books, metric="hamming")
    with pytest.raises(ValueError, match="unknown metric"):
        ivfadc_topk(emb, F.col("vec_id") < 1, dims=16, metric="ip")


@pytest.mark.parametrize("m,n_codes,k", [(4, 8, 3), (8, 16, 5), (16, 8, 1)])
def test_pq_mips_param_sweep_shape(spark, m, n_codes, k):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qf = F.col("vec_id") < 4
    books = pq_codebooks(emb, m=m, n_codes=n_codes, metric="dot")
    out = pq_topk(emb, qf, books, k=k, metric="dot").collect()
    assert len(out) == 4 * k
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert [r["rank"] for r in rs] == list(range(1, k + 1))
        assert all(r["neighbor_id"] != q for r in rs)
        sims = [r["approx_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


@pytest.mark.parametrize("n_probe", [1, 4, 16])
def test_ivfadc_mips_probe_sweep(spark, n_probe):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = ivfadc_topk(
        emb,
        F.col("vec_id") < 3,
        k=4,
        n_centroids=16,
        n_probe=n_probe,
        metric="dot",
    ).collect()
    assert len(out) <= 3 * 4
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
    if n_probe == 16:  # exhaustive probing always fills k
        assert len(out) == 3 * 4


def test_pq_mips_trained_codebooks_smoke(spark):
    # train=True with metric="dot" fits KMeans on the RAW subvectors;
    # output stays model-dependent, so only shape/contract is pinned
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_codebooks(
        emb, m=4, n_codes=8, train=True, max_iter=2, metric="dot"
    )
    assert books.shape == (4, 8, 16)
    out = pq_topk(
        emb, F.col("vec_id") < 2, books, k=3, metric="dot"
    ).collect()
    assert len(out) == 6


# ---------------------------------------------- int8-quantized MIPS


def test_int8_mips_matches_duckdb_oracle(spark, duck):
    # the full hash-exact differential: quantizer, integer dot, pinned
    # multiply order, tie rank — every value must be bit-identical
    got = ann_int8_mips_topk(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        F.col("vec_id") < 8,
        k=5,
    ).toPandas()
    want = duck.execute(entry_mod.oracle_sql()["ann_int8_mips_topk"]).fetchdf()
    assert len(got) == len(want) == 40
    for c in ("query_id", "neighbor_id", "int_dot", "rank"):
        assert (
            got[c].astype("int64") == want[c].astype("int64")
        ).all(), c
    assert (got["sim"].to_numpy() == want["sim"].to_numpy()).all()


def test_int8_mips_half_up_rounding_decides_ranking(spark):
    # adversarial: a component sitting EXACTLY on the rounding
    # boundary. Corpus max 127.0 -> scale exactly 1.0, so 62.5
    # quantizes to 63 under the engine's half-up floor(x+0.5) but
    # would be 62 under numpy's half-even rint. With query = e0,
    # A = [62.5, 127, ...] and B = [63.0 - eps...] tie at int_dot 63
    # under half-up (tie -> id asc -> A first); half-even would rank
    # B strictly above A. The assertion pins the half-up order AND
    # the exact integer dots.
    dims = 8
    rows = [
        (0, [127.0] + [0.0] * (dims - 1)),      # query, scale 1.0
        (1, [62.5, 127.0] + [0.0] * (dims - 2)),  # A: boundary
        (2, [62.75, 127.0] + [0.0] * (dims - 2)),  # B: rounds to 63 too
        (3, [-127.0, 1.0] + [0.0] * (dims - 2)),  # far negative
    ]
    emb = _emb_df(spark, rows)
    out = ann_int8_mips_topk(emb, F.col("vec_id") < 1, k=3, dims=dims).collect()
    assert [(r["neighbor_id"], r["int_dot"]) for r in out] == [
        (1, 63 * 127),  # 62.5 -> 63 (half-up), tie with B -> id asc
        (2, 63 * 127),
        (3, -127 * 127),
    ]
    # and the quantizer itself: 62.5 -> 63, -62.5 -> -62 (floor(x+0.5)
    # rounds ties toward +inf for negatives too — portable, unlike
    # numpy rint / SQL round)
    q = {
        r["vec_id"]: list(r["qvec"])
        for r in quantize_embeddings(
            _emb_df(spark, [(0, [127.0, 62.5, -62.5] + [0.0] * 5)]), dims=8
        ).collect()
    }
    assert q[0][:3] == [127, 63, -62]


def test_int8_mips_zero_vector_and_empty_queries(spark):
    dims = 8
    rows = [
        (0, [1.0] + [0.0] * (dims - 1)),
        (1, [0.0] * dims),  # zero vector: scale 0, codes 0, sim 0
        (2, [0.5] + [0.0] * (dims - 1)),
    ]
    emb = _emb_df(spark, rows)
    out = ann_int8_mips_topk(emb, F.col("vec_id") < 1, k=3, dims=dims).collect()
    got = {r["neighbor_id"]: (r["int_dot"], r["sim"]) for r in out}
    assert got[1] == (0, 0.0)
    assert got[2][0] == 127 * 127  # both quantize e0 to full scale
    # empty query set -> empty result, no kernel crash
    assert (
        ann_int8_mips_topk(emb, F.col("vec_id") < 0, k=3, dims=dims).count()
        == 0
    )


@pytest.mark.parametrize("k,qmax", [(1, 4), (7, 6), (5, 16)])
def test_int8_mips_param_sweep(spark, duck, k, qmax):
    got = ann_int8_mips_topk(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        F.col("vec_id") < qmax,
        k=k,
    ).toPandas()
    want = duck.execute(f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        s AS (SELECT vec_id, v,
                list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
              FROM e),
        q8 AS (SELECT vec_id, scale,
                list_transform(v, x -> CAST(floor(
                  x / (CASE WHEN scale = 0.0 THEN 1.0 ELSE scale END)
                  + 0.5) AS DOUBLE)) AS qv
              FROM s),
        q AS (SELECT vec_id AS query_id, scale AS qscale, qv AS qqv
              FROM q8 WHERE vec_id < {qmax}),
        scored AS (
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 CAST(list_dot_product(c.qv, q.qqv) AS BIGINT) AS int_dot,
                 (c.scale * q.qscale) * list_dot_product(c.qv, q.qqv) AS sim
          FROM q8 c, q WHERE c.vec_id != q.query_id)
        SELECT query_id, neighbor_id, int_dot, sim,
               CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY sim DESC, neighbor_id
               ) AS INTEGER) AS "rank"
        FROM scored QUALIFY "rank" <= {k}
        ORDER BY query_id, "rank"
    """).fetchdf()
    assert len(got) == len(want) == qmax * k
    for c in ("query_id", "neighbor_id", "int_dot", "rank"):
        assert (got[c].astype("int64") == want[c].astype("int64")).all(), c
    assert (got["sim"].to_numpy() == want["sim"].to_numpy()).all()


def test_int8_mips_tracks_exact_mips(spark):
    # quantization keeps MIPS recall high on the real corpus — int8
    # is a 4x compression with per-dim error <= scale/2, far gentler
    # than PQ's 32x: require >= 0.5 recall@5 vs the exact kernel
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qf = F.col("vec_id") < 8
    exact = set(
        map(
            tuple,
            ann_bruteforce_topk(emb, qf, k=5, metric="dot")
            .select("query_id", "neighbor_id")
            .collect(),
        )
    )
    got = set(
        map(
            tuple,
            ann_int8_mips_topk(emb, qf, k=5)
            .select("query_id", "neighbor_id")
            .collect(),
        )
    )
    assert len(got & exact) / len(exact) >= 0.5


def test_int8_mips_plan_contract(spark):
    # the compressed scan must be shuffle-free below the rank window:
    # quantize + score are two fused MapInPandas passes over the
    # corpus's own partitions; the only exchanges are the window's
    # hash partitioning and the presentation sort (budget 2)
    import re

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = (
        ann_int8_mips_topk(emb, F.col("vec_id") < 8, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 2, plan
    shuffles = re.findall(
        r"\bExchange (hashpartitioning|rangepartitioning"
        r"|SinglePartition|RoundRobinPartitioning)",
        plan,
    )
    assert len(shuffles) <= 2, plan


def _int8_mips_reference(rows, query_ids, k, dims):
    """Pure-numpy twin of the engine spec: float32 round-trip,
    scale = max|v|/127, half-up floor(x/s + 0.5), exact integer dots,
    pinned (s·s)·dot multiply, ties sim desc / id asc."""
    ids = np.array([i for i, _ in rows], dtype=np.int64)
    m = np.stack(
        [np.asarray(v, dtype=np.float32).astype(np.float64) for _, v in rows]
    )
    scale = np.abs(m).max(axis=1) / 127.0
    safe = np.where(scale == 0.0, 1.0, scale)
    q = np.floor(m / safe[:, None] + 0.5).astype(np.int64)
    out = []
    for qid in query_ids:
        qi = int(np.nonzero(ids == qid)[0][0])
        d = q @ q[qi]
        sim = (scale * scale[qi]) * d.astype(np.float64)
        cand = [
            (ids[j], int(d[j]), float(sim[j]))
            for j in range(len(ids))
            if ids[j] != qid
        ]
        cand.sort(key=lambda t: (-t[2], t[0]))
        for r, (nid, dot, s) in enumerate(cand[:k], start=1):
            out.append((int(qid), int(nid), dot, s, r))
    return out


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# tie-saturated component domain: scales collide (max|v| repeats),
# quantized codes repeat, sims tie constantly — the inputs where rank
# conventions diverge if anything is off. 0.5 with max 1.0 lands a
# component exactly on the 63.5 code boundary.
_COMP = st.sampled_from([-1.0, -0.5, 0.0, 0.25, 0.5, 1.0])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    vecs=st.lists(
        st.lists(_COMP, min_size=8, max_size=8), min_size=2, max_size=10
    ),
    k=st.integers(min_value=1, max_value=4),
)
@pytest.mark.slow
def test_int8_mips_numpy_differential(spark, vecs, k):
    rows = list(enumerate(vecs))
    emb = _emb_df(spark, rows)
    n_q = min(2, len(rows))
    got = [
        (r["query_id"], r["neighbor_id"], r["int_dot"], r["sim"], r["rank"])
        for r in ann_int8_mips_topk(
            emb, F.col("vec_id") < n_q, k=k, dims=8
        ).collect()
    ]
    want = _int8_mips_reference(rows, list(range(n_q)), k, dims=8)
    assert got == want


# ------------------------------------------------- MIPS pair join


@pytest.mark.parametrize("threshold", [0.25, 0.35, 0.45])
def test_mips_pairs_match_duckdb(spark, duck, threshold):
    got = mips_threshold_pairs(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        threshold=threshold,
    ).toPandas()
    want = duck.execute(f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_dot_product(a.v, b.v) AS sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) >= {threshold}
        ORDER BY vec_a, vec_b
    """).fetchdf()
    assert len(got) == len(want) > 0
    for c in ("vec_a", "vec_b"):
        assert (got[c].astype("int64") == want[c].astype("int64")).all(), c
    assert (got["sim"].to_numpy() == want["sim"].to_numpy()).all()


def test_mips_pairs_prefilter_never_drops_a_pair(spark):
    # adversarial for the Cauchy-Schwarz prefilter: tiny-norm vectors
    # that the filter must drop coexist with pairs that pass exactly
    # AT the bound (parallel vectors, dot == |a|*|b| == tau). The
    # boundary pair must survive the prefilter's 1e-9 slack.
    dims = 8
    rows = [
        (0, [2.0] + [0.0] * (dims - 1)),     # norm 2 (corpus max)
        (1, [0.1875] + [0.0] * (dims - 1)),  # parallel: dot = 0.375 = tau
        (2, [0.01] * dims),                  # tiny: prefiltered
        (3, [0.0] * dims),                   # zero: prefiltered
        (4, [0.0, 1.0] + [0.0] * (dims - 2)),  # orthogonal to 0/1
    ]
    emb = _emb_df(spark, rows)
    out = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in mips_threshold_pairs(
            emb, threshold=0.375, dims=dims
        ).collect()
    }
    # 0.1875 = 3/16 and 2.0 are float32-exact, so the pair sits
    # EXACTLY on the bound: dot = |a|*|b| = 0.375 = tau
    assert out == {(0, 1): 0.375}
    # negative threshold: prefilter must NOT run (dot can be negative,
    # Cauchy-Schwarz gives no lower bound) — every pair comes back
    n = len(rows)
    assert (
        mips_threshold_pairs(emb, threshold=-100.0, dims=dims).count()
        == n * (n - 1) // 2
    )
    # and the tiny-but-nonzero vector is genuinely BELOW any passing
    # product with the corpus max — i.e. the prefilter dropping it was
    # sound, not lucky: |v2| * 2.0 < 0.375
    import math
    assert math.sqrt(dims) * 0.01 * 2.0 < 0.375


@pytest.mark.parametrize("n_blocks", [1, 3, 7])
def test_mips_pairs_block_invariant(spark, n_blocks):
    # the kernel promise extends to dot: results bit-identical for any
    # blocking factor (dimension-ordered dots, exactly-once pairing)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = [
        tuple(r)
        for r in mips_threshold_pairs(emb, threshold=0.35).collect()
    ]
    got = [
        tuple(r)
        for r in mips_threshold_pairs(
            emb, threshold=0.35, n_blocks=n_blocks
        ).collect()
    ]
    assert got == base


def test_threshold_pairs_unknown_metric_refused(spark):
    emb = _emb_df(spark, _exact_unit_corpus(8))
    with pytest.raises(ValueError, match="unknown metric"):
        cosine_threshold_pairs(emb, 0.5, dims=16, metric="euclid")


# -------------------------------------------- symmetric MIPS-LSH pairs


@pytest.mark.parametrize("tau", [0.2, 0.35])
def test_mips_lsh_pairs_match_duckdb(spark, duck, tau):
    # the FULL pipeline differential: symmetric norm embedding, SRP
    # signatures over dims+2, band candidate rule, raw-dot verify —
    # bit-exact against the generated SQL twin
    got = mips_lsh_pairs(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        dims=64,
        threshold=tau,
    ).toPandas()
    want = duck.execute(entry_mod._mips_lsh_sql(tau)).fetchdf()
    assert len(got) == len(want) > 0
    for c in ("vec_a", "vec_b"):
        assert (got[c].astype("int64") == want[c].astype("int64")).all(), c
    assert (got["sim"].to_numpy() == want["sim"].to_numpy()).all()


@pytest.mark.slow
def test_mips_lsh_pairs_subset_of_exact(spark):
    # the LSH contract: candidates are verified by the exact raw dot,
    # so every emitted pair appears in mips_threshold_pairs with the
    # identical sim (recall < 1 is the trade; precision is 1)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lsh = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in mips_lsh_pairs(emb, dims=64, threshold=0.35).collect()
    }
    exact = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in mips_threshold_pairs(emb, threshold=0.35).collect()
    }
    assert lsh and set(lsh) <= set(exact)
    assert all(exact[k] == v for k, v in lsh.items())


def test_mips_lsh_finds_parallel_high_norm_pairs(spark):
    # recall concentrates where MIPS cares: near-parallel high-norm
    # pairs embed to near-identical directions, so every band collides
    # and the pair ALWAYS surfaces — while a near-orthogonal pair with
    # the same dot is a legitimate (probabilistic) miss. Corpus built
    # so the parallel pair's embedded cosine is ~1.
    dims = 8
    rng = np.random.default_rng(3)
    rows = [
        (0, [10.0] + [0.0] * (dims - 1)),
        (1, [9.0, 0.1] + [0.0] * (dims - 2)),  # near-parallel, dot 90
    ]
    for i in range(2, 20):
        rows.append((i, (rng.normal(0, 0.05, dims)).tolist()))
    emb = _emb_df(spark, rows)
    out = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in mips_lsh_pairs(emb, dims=dims, threshold=50.0).collect()
    }
    assert set(out) == {(0, 1)}
    assert out[(0, 1)] == pytest.approx(90.0)


def test_mips_lsh_zero_and_degenerate_corpora(spark):
    dims = 8
    # zero vectors embed to s=1 lifted axes; no pair passes tau > 0
    rows = [(i, [0.0] * dims) for i in range(4)] + [
        (4, [1.0] + [0.0] * (dims - 1))
    ]
    emb = _emb_df(spark, rows)
    assert mips_lsh_pairs(emb, dims=dims, threshold=0.1).count() == 0
    # single-vector corpus: no pairs, no crash
    one = _emb_df(spark, [(0, [1.0] + [0.0] * (dims - 1))])
    assert mips_lsh_pairs(one, dims=dims, threshold=0.1).count() == 0


# --------------------------------------------- registry-config audits


def test_registered_mips_audits_green(spark):
    q = entry_mod.queries()
    for name in ("pq_mips_recall_audit", "ivfadc_mips_recall_audit"):
        row = q[name](spark, SF_DIR).collect()
        assert len(row) == 1, name
        r = row[0]
        assert r["n_queries"] == 8, name
        assert r["full_k_queries"] == 8, name
        assert r["recall_ok"] is True, name
