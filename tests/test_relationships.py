"""Cross-operator consistency: every approximate operator's output must
be a subset of its exact counterpart's, with identical scores on the
shared pairs — LSH banding changes recall, never correctness of what it
reports (both families verify candidates exactly)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators import (
    dedup as D,
    similarity as S,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF_DIR)


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF_DIR)


def test_minhash_pairs_subset_of_exact_jaccard(docs):
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert set(lsh) <= set(exact), "LSH reported a pair the exact join rejects"
    for k, j in lsh.items():
        assert j == pytest.approx(exact[k], rel=1e-12)


def test_srp_lsh_pairs_subset_of_exact_cosine(emb):
    exact = {
        (r.vec_a, r.vec_b): r.sim
        for r in S.cosine_threshold_pairs(emb, threshold=0.2).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.sim
        for r in S.ann_lsh_pairs(emb, dims=64, threshold=0.2).collect()
    }
    assert set(lsh) <= set(exact)
    for k, sim in lsh.items():
        assert sim == exact[k], "verify scores must be bit-identical"


def test_ivf_neighbors_scored_identically_to_bruteforce(emb):
    exact = {
        (r.query_id, r.neighbor_id): r.sim
        for r in S.ann_bruteforce_topk(emb, F.col("vec_id") < 8, k=50).collect()
    }
    ivf = S.ann_ivf_topk(emb, F.col("vec_id") < 8, k=5).collect()
    for r in ivf:
        key = (r.query_id, r.neighbor_id)
        assert key in exact, "IVF produced a neighbor brute force never scored"
        assert r.sim == exact[key]


def test_exact_dedup_partitions_the_corpus(docs):
    groups = D.exact_dedup_groups(docs).agg(F.sum("n_copies")).collect()[0][0]
    assert groups == docs.count(), "dedup groups must partition all docs"


def test_kmeans_ivf_scores_consistent_and_recall_reasonable(emb):
    exact = {
        (r.query_id, r.neighbor_id): r.sim
        for r in S.ann_bruteforce_topk(emb, F.col("vec_id") < 8, k=50).collect()
    }
    trained = S.kmeans_ivf_topk(emb, F.col("vec_id") < 8, k=5).collect()
    for r in trained:
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert r.sim == exact[key], "scores must be bit-identical"
    # trained cells should recover a reasonable share of true top-5
    got = {(r.query_id, r.neighbor_id) for r in trained}
    per_q: dict = {}
    for (q, n), s in exact.items():
        per_q.setdefault(q, []).append((-s, n))
    truth = set()
    for q, lst in per_q.items():
        for _, n in sorted(lst)[:5]:
            truth.add((q, n))
    recall = len(got & truth) / len(truth)
    assert recall >= 0.3, f"trained-IVF recall {recall} unreasonably low"


def test_quantization_codes_bounded_and_error_within_bound(emb):
    q = S.quantize_embeddings(emb).collect()
    assert all(-127 <= c <= 127 for r in q for c in r.qvec)
    stats = S.quantization_error_stats(emb).first()
    assert stats.n_within_bound == stats.n_vectors
    assert stats.worst_abs_err >= 0.0
