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


def test_cosine_pairs_invariant_to_block_count(emb):
    # block-matrix decomposition must not change results: per-pair
    # arithmetic is dimension-ordered, independent of blocking
    base = sorted(
        (r.vec_a, r.vec_b, r.sim)
        for r in S.cosine_threshold_pairs(emb, threshold=0.2, n_blocks=1).collect()
    )
    for nb in (3, 8):
        got = sorted(
            (r.vec_a, r.vec_b, r.sim)
            for r in S.cosine_threshold_pairs(emb, threshold=0.2, n_blocks=nb).collect()
        )
        assert got == base, f"n_blocks={nb} changed the exact pair set"


def test_cosine_pairs_sparse_residues_no_duplicates(emb):
    # ADVICE r2 (high): ids that do NOT populate every residue mod
    # n_blocks leave some blocks empty; an off-diagonal group with an
    # empty b-side must emit NOTHING — the old emptiness-based diagonal
    # detection re-emitted block i's internal pairs once per empty
    # partner block.  Force the pathology: keep only ids ≡ 0 (mod 8)
    # and run with n_blocks=8 so 7 of 8 blocks are empty.
    sparse = emb.filter(F.col("vec_id") % 8 == 0)
    base = sorted(
        (r.vec_a, r.vec_b, r.sim)
        for r in S.cosine_threshold_pairs(sparse, threshold=0.2, n_blocks=1).collect()
    )
    got_list = [
        (r.vec_a, r.vec_b, r.sim)
        for r in S.cosine_threshold_pairs(sparse, threshold=0.2, n_blocks=8).collect()
    ]
    assert len(got_list) == len(set(got_list)), "duplicate pairs emitted"
    assert sorted(got_list) == base


def test_auto_n_blocks_bounds_task_memory():
    # the auto default must (a) satisfy the 2·(n/B)·dims·8 ≤ budget
    # memory bound for large corpora and (b) never under-parallelize
    # small ones below the block-pair count the cluster can use
    n, dims, budget = 10_000_000, 512, S._DEFAULT_TASK_BUDGET_BYTES
    b = S._auto_n_blocks(n, dims, parallelism=32)
    assert 2 * (n / b) * dims * 8 <= budget
    small = S._auto_n_blocks(1000, 64, parallelism=32)
    assert small * (small + 1) // 2 >= 32
    assert S._auto_n_blocks(0, 64) == 1


def test_auto_n_blocks_refuses_impractical_scale():
    # 1e9 rows × 512 dims needs B ≈ 61k to satisfy the memory bound —
    # exact all-pairs is the wrong algorithm there; the auto path must
    # refuse loudly and point at ann_lsh_pairs, not silently derive a B
    # whose pair table and shuffle replication are unusable.
    import pytest

    with pytest.raises(ValueError, match="ann_lsh_pairs"):
        S._auto_n_blocks(1_000_000_000, 512, parallelism=32)


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


def test_ngram_jaccard_max_df_noop_when_unbound(docs):
    base = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    )
    capped = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5, max_df=10_000).collect()
    )
    assert capped == base, "a cap no shingle reaches must be a bit-exact no-op"


def test_ngram_jaccard_max_df_drops_hot_shingles(spark):
    # "a b c" appears in all 4 docs (df=4); "b c d" only in docs 1,2.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d f"),
            (3, "a b c x y"),
            (4, "a b c p q"),
        ],
        "doc_id long, text string",
    )
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert uncapped == {(1, 2): pytest.approx(0.5)}
    # cap binds on "a b c": docs 1,2 keep {"b c d", "c d *"} → jacc 1/3
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.3, max_df=3).collect()
    }
    assert capped == {(1, 2): pytest.approx(1 / 3)}
    # a non-binding cap reproduces the exact result
    loose = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5, max_df=10).collect()
    }
    assert loose == uncapped


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


def test_lsh_plans_bound_kernel_executions(docs):
    # Plan contract for the round-4 rework: candidate generation must
    # not re-execute the Python kernel per self-join side. If a future
    # edit reintroduces a bands-vs-bands or index-vs-index join, the
    # MapInPandas count jumps and this fails before the bench does.
    def n_kernels(df):
        return df._jdf.queryExecution().executedPlan().toString().count("MapInPandas")

    assert n_kernels(D.ngram_jaccard_pairs(docs)) <= 1
    # capped: the sizes branch re-plans the posting subplan once (its
    # shuffle is AQE-reusable at runtime); the pair branch is the other
    assert n_kernels(D.ngram_jaccard_pairs(docs, max_df=50)) <= 2
    assert n_kernels(D.minhash_lsh_pairs(docs)) <= 2  # signatures + verify sets


def test_pq_encode_shape_and_self_codes(emb):
    # head vectors ARE the codewords: vector i < n_codes must encode to
    # code i in every subspace (its own slice is at distance 0)
    books = S.pq_codebooks(emb, m=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    codes = {r.vec_id: r.codes for r in S.pq_encode(emb, books).collect()}
    n = emb.count()
    assert len(codes) == n
    for cs in codes.values():
        assert len(cs) == 8 and all(0 <= c < 16 for c in cs)
    for i in range(16):
        assert codes[i] == [i] * 8, f"head vector {i} not self-coded"


def test_pq_encode_partition_invariant(emb):
    books = S.pq_codebooks(emb, m=8, n_codes=16)
    a = {r.vec_id: r.codes for r in S.pq_encode(emb, books).collect()}
    b = {
        r.vec_id: r.codes
        for r in S.pq_encode(emb.repartition(13), books).collect()
    }
    assert a == b


def test_pq_topk_full_k_and_rank_dense(emb):
    books = S.pq_codebooks(emb, m=8, n_codes=16)
    out = S.pq_topk(emb, F.col("vec_id") < 4, books, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for q, rows in by_q.items():
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        assert all(r.neighbor_id != q for r in rows)
        sims = [r.approx_sim for r in rows]
        assert sims == sorted(sims, reverse=True)


@pytest.mark.slow
def test_pq_trained_codebooks_shape(emb):
    books = S.pq_codebooks(emb, m=4, n_codes=8, train=True, max_iter=2)
    assert books.shape == (4, 8, 16)
    out = S.pq_topk(emb, F.col("vec_id") < 2, books, k=3)
    assert out.count() == 6


@pytest.mark.slow
def test_pq_trained_codebooks_pad_collapsed_centers(spark):
    # a duplicate-heavy corpus collapses KMeans to < n_codes distinct
    # centers; the codebook must keep its (m, n_codes, dsub) contract
    # by padding with the deterministic head codewords
    vecs = [
        (i, [1.0 if j == (i % 2) else 0.0 for j in range(64)])
        for i in range(32)
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    )
    import numpy as np

    books = S.pq_codebooks(
        emb, m=8, n_codes=16, train=True, max_iter=2
    )
    assert books.shape == (8, 16, 8)
    assert np.isfinite(books).all()


def test_ivfadc_topk_shape_and_determinism(emb):
    out = S.ivfadc_topk(emb, F.col("vec_id") < 4, k=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for q, rs in by_q.items():
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        assert all(r.neighbor_id != q for r in rs)
    # partition-invariant: same result from a different layout
    again = S.ivfadc_topk(
        emb.repartition(13), F.col("vec_id") < 4, k=5
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ivfadc_candidates_only_from_probed_cells(emb):
    # with n_probe = n_centroids the probe covers everything and IVFADC
    # must equal flat PQ built on the same residual codebooks' geometry
    # in *shape*; with n_probe=1 the candidate pool shrinks but ranks
    # stay dense 1..k
    narrow = S.ivfadc_topk(emb, F.col("vec_id") < 2, k=3, n_probe=1)
    rows = narrow.collect()
    assert {r.query_id for r in rows} == {0, 1}
    for q in (0, 1):
        assert [r.rank for r in rows if r.query_id == q] == [1, 2, 3]


def test_sparse_cosine_exact_on_tiny_fixture(spark):
    # hand-checkable vectors: doc1 = doc2 scaled (cos 1.0), doc3
    # orthogonal to both (no shared features -> no pair at all)
    triples = spark.createDataFrame(
        [(1, 10, 2), (1, 20, 1), (2, 10, 4), (2, 20, 2), (3, 30, 7)],
        "doc_id long, feature_idx long, tf long",
    )
    rows = S.sparse_cosine_pairs(triples, threshold=0.0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2) and r.cos == pytest.approx(1.0)


def test_sparse_cosine_max_df_biases_low_never_high(spark):
    # dropping a hot bucket from pair generation may only LOWER scores
    # (norms keep every feature) — no pair may gain
    triples = spark.createDataFrame(
        [(i, 99, 5) for i in range(6)]  # bucket 99 is hot (df=6)
        + [(0, 1, 3), (1, 1, 3), (2, 2, 1)],
        "doc_id long, feature_idx long, tf long",
    )
    full = {
        (r.doc_a, r.doc_b): r.cos
        for r in S.sparse_cosine_pairs(triples, threshold=0.0).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.cos
        for r in S.sparse_cosine_pairs(
            triples, threshold=0.0, max_df=5
        ).collect()
    }
    assert set(capped) <= set(full)
    for k, c in capped.items():
        assert c <= full[k] + 1e-12


def test_sparse_cosine_partition_invariant(docs):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions.text import (
        feature_hash_counts,
    )

    fh = feature_hash_counts(docs, n_features=4096)
    a = [(r.doc_a, r.doc_b, r.cos)
         for r in S.sparse_cosine_pairs(fh, threshold=0.85).collect()]
    b = [(r.doc_a, r.doc_b, r.cos)
         for r in S.sparse_cosine_pairs(
             fh.repartition(17), threshold=0.85
         ).collect()]
    assert a == b  # bit-identical, including the ordering contract


def test_dedup_corpus_best_keeps_longest(spark):
    # cluster {1,2,3}: doc 2 is longest -> survives; min-id policy
    # would keep 1. Singleton 9 untouched.
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (9, 5)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r.doc_id
        for r in D.dedup_corpus_best(docs, pairs, "n_chars").collect()
    )
    assert kept == [2, 9]
    # quality tie -> smallest id wins
    tied = spark.createDataFrame(
        [(1, 10), (2, 10), (9, 5)], "doc_id long, n_chars long"
    )
    kept2 = sorted(
        r.doc_id
        for r in D.dedup_corpus_best(
            tied, spark.createDataFrame([(1, 2)], "doc_a long, doc_b long"), "n_chars"
        ).collect()
    )
    assert kept2 == [1, 9]


def test_global_rank_matches_single_window(spark, docs):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        global_rank,
    )
    from pyspark.sql import Window

    key = F.struct((-F.col("n_chars")).alias("nc"), F.col("doc_id").alias("id"))
    got = {
        r.doc_id: r.rank
        for r in global_rank(
            docs.select("doc_id", "n_chars"),
            bucket=-F.floor(F.col("n_chars") / 64),
            key=key,
        ).collect()
    }
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    want = {
        r.doc_id: r.rank
        for r in docs.select(
            "doc_id", F.row_number().over(w).alias("rank")
        ).collect()
    }
    assert got == want
    assert sorted(got.values()) == list(range(1, len(got) + 1))  # dense


def test_global_rank_rejects_non_monotone_bucket(spark, docs):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        global_rank,
    )

    # r15: the audit is folded into the plan (no driver collect), so
    # the refusal surfaces at ACTION time from the raise_error guard —
    # same message text, Spark exception instead of ValueError
    with pytest.raises(Exception, match="not monotone"):
        global_rank(
            docs.select("doc_id", "n_chars"),
            bucket=F.col("doc_id") % 7,  # uncorrelated with the order
            key=F.struct((-F.col("n_chars")).alias("nc"), F.col("doc_id").alias("id")),
        ).collect()


def test_global_rank_bucket_cap(spark, docs):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        global_rank,
    )

    with pytest.raises(Exception, match="more than"):
        global_rank(
            docs.select("doc_id", "n_chars"),
            bucket=F.col("doc_id"),  # one bucket per row
            key=F.col("doc_id"),
            max_buckets=10,
        ).collect()


def test_persisted_feature_index_probe_matches_inline(docs, spark):
    # offline persist + online probe ≡ inline sparse cosine restricted
    # to cross (index, batch) pairs — the incremental-search split
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions.text import (
        feature_hash_counts,
    )

    new = docs.where(F.col("doc_id") % 5 == 0)
    idx = docs.where(F.col("doc_id") % 5 != 0)
    S.persist_feature_index(idx, "t_feat_idx", n_features=1 << 20, ngram=3)
    try:
        probed = {
            (r.new_id, r.index_id): r.cos
            for r in S.probe_feature_index(
                new, "t_feat_idx", threshold=0.5, max_df=None
            ).collect()
        }
        fh_all = feature_hash_counts(docs, n_features=1 << 20, ngram=3)
        inline = {}
        new_ids = {r.doc_id for r in new.select("doc_id").collect()}
        for r in S.sparse_cosine_pairs(fh_all, threshold=0.5).collect():
            a_new, b_new = r.doc_a in new_ids, r.doc_b in new_ids
            if a_new != b_new:  # cross pairs only
                k = (r.doc_a, r.doc_b) if a_new else (r.doc_b, r.doc_a)
                inline[k] = r.cos
        assert probed == inline  # bit-identical scores, same pair set
        assert len(probed) > 0  # non-vacuous at this SF
    finally:
        # the index is FOUR tables — dropping a subset leaves orphan
        # warehouse locations that fail the next session's saveAsTable
        for suffix in ("postings", "norms", "df", "meta"):
            spark.sql(f"DROP TABLE IF EXISTS t_feat_idx_{suffix}")


def test_probe_feature_index_reprobe_and_meta_guard(spark):
    # re-probing a doc already in the index must not report it as its
    # own near-duplicate; mismatched hashing params must refuse loudly
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),
            (2, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    S.persist_feature_index(docs, "t_reprobe_idx", n_features=1 << 16, ngram=3)
    try:
        hits = S.probe_feature_index(
            docs, "t_reprobe_idx", threshold=0.0,
            max_df=None, n_features=1 << 16, ngram=3,
        ).collect()
        assert all(r.new_id != r.index_id for r in hits)
        with pytest.raises(ValueError, match="n_features"):
            S.probe_feature_index(
                docs, "t_reprobe_idx", n_features=1 << 18, ngram=3
            )
    finally:
        for suffix in ("postings", "norms", "df", "meta"):
            spark.sql(f"DROP TABLE IF EXISTS t_reprobe_idx_{suffix}")


def test_containment_asymmetric_quote_detection(spark):
    # doc 2 is a verbatim excerpt of doc 1: containment(2->1) = 1.0
    # while Jaccard is far below any dedup threshold — the case the
    # symmetric family is blind to
    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lam mu nu xi omicron pi rho sigma tau upsilon"
    quote = "epsilon zeta eta theta iota"
    docs = spark.createDataFrame(
        [(1, long), (2, quote), (3, "unrelated words entirely different here")],
        "doc_id long, text string",
    )
    rows = {(r.inner_doc, r.outer_doc): r.containment
            for r in D.containment_pairs(docs, threshold=0.9).collect()}
    assert rows == {(2, 1): 1.0}
    jacc = D.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    assert jacc == []  # symmetric dedup misses the inclusion


def test_containment_max_df_biases_low(spark):
    docs = spark.createDataFrame(
        [(i, "x y z common run " + f"unique{i} a{i} b{i}") for i in range(6)],
        "doc_id long, text string",
    )
    full = {(r.inner_doc, r.outer_doc): r.containment
            for r in D.containment_pairs(docs, threshold=0.0).collect()}
    capped = {(r.inner_doc, r.outer_doc): r.containment
              for r in D.containment_pairs(docs, threshold=0.0, max_df=3).collect()}
    assert set(capped) <= set(full)
    for k, c in capped.items():
        assert c <= full[k] + 1e-12
