"""Deterministic hash sampling/splitting: coverage, stability, and the
nested-sample / boundary-move properties the design exists for."""

from __future__ import annotations

from pyspark.sql import functions as F
import pytest

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
    stratified_hash_sample,
    with_split,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
    load_table,
)

SF = "/root/testdata/sf0.001"
W = {"train": 0.9, "val": 0.05, "test": 0.05}


def test_split_covers_every_row(spark):
    docs = load_table(spark, "documents", SF)
    out = with_split(docs, "doc_id", W)
    assert out.filter(F.col("split").isNull()).count() == 0
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    # 90/5/5 within sampling noise on 500 docs
    assert counts["train"] > 0.8 * docs.count()
    assert 0 < counts.get("val", 0) < 0.15 * docs.count()


def test_split_is_deterministic(spark):
    docs = load_table(spark, "documents", SF)
    a = {r.doc_id: r.split for r in with_split(docs, "doc_id", W).collect()}
    b = {
        r.doc_id: r.split
        for r in with_split(docs.repartition(7), "doc_id", W).collect()
    }
    assert a == b


def test_split_boundary_move_is_monotone(spark):
    # growing train only moves the adjacent boundary: every train row
    # stays train when train grows
    docs = load_table(spark, "documents", SF)
    small = with_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    big = with_split(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    small_train = {r.doc_id for r in small.filter(F.col("split") == "train").collect()}
    big_train = {r.doc_id for r in big.filter(F.col("split") == "train").collect()}
    assert small_train <= big_train


def test_group_split_no_cross_split_pairs(spark):
    # the property group_split exists for: a pair's endpoints always
    # land in the same split, including transitively (a-b, b-c => a,
    # b, c together even if a-c was never emitted as a pair)
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        group_split,
    )

    docs = load_table(spark, "documents", SF)
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (200, 300)], "doc_a long, doc_b long"
    )
    out = group_split(docs, pairs, W)
    sp = {r.doc_id: (r.split, r.group_key) for r in out.collect()}
    assert len(sp) == docs.count()  # left join keeps every doc
    for chain in [(0, 1, 2), (10, 11), (200, 300)]:
        assert len({sp[i][0] for i in chain}) == 1
        assert {sp[i][1] for i in chain} == {min(chain)}
    # singletons degrade to exactly with_split (same key, same salt)
    base = {r.doc_id: r.split for r in with_split(docs, "doc_id", W).collect()}
    paired = {0, 1, 2, 10, 11, 200, 300}
    for i, (s, g) in sp.items():
        if i not in paired:
            assert g == i and s == base[i]


def test_stratified_sample_nested_and_scoped(spark):
    docs = load_table(spark, "documents", SF)
    lo = stratified_hash_sample(docs, "doc_id", "source", {"src0": 0.2})
    hi = stratified_hash_sample(docs, "doc_id", "source", {"src0": 0.5})
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    assert lo_ids <= hi_ids  # nested-sample property
    # unlisted strata never leak into the sample
    assert hi.filter(F.col("source") != "src0").count() == 0


def test_epoch_upsample_copy_counts(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        epoch_upsample,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
        load_table,
    )

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    epochs = {"en": 2.5, "de": 1.25, "fr": 0.5, "es": 1.0}
    up = epoch_upsample(docs, "doc_id", "lang", epochs)
    rows = up.groupBy("doc_id", "lang").count().collect()
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    seen = set()
    for r in rows:
        e = epochs.get(r.lang)
        assert e is not None, "unlisted stratum must drop"
        assert r["count"] in (int(e), int(e) + (1 if e != int(e) else 0)), (
            r.lang, r["count"], e)
        seen.add(r.doc_id)
    # zh docs dropped entirely; es exactly once
    for doc_id, lang in langs.items():
        if lang == "zh":
            assert doc_id not in seen
    es = [r["count"] for r in rows if r.lang == "es"]
    assert es and all(c == 1 for c in es)


def test_epoch_upsample_nested_in_rate(spark):
    # raising an epoch factor only ADDS copies (same nested property as
    # the hash samplers): copies at e=1.25 are a subset of e=1.75
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        epoch_upsample,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
        load_table,
    )

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    lo = {(r.doc_id, r.copy_idx) for r in epoch_upsample(
        docs, "doc_id", "lang", {"en": 1.25}).select("doc_id", "copy_idx").collect()}
    hi = {(r.doc_id, r.copy_idx) for r in epoch_upsample(
        docs, "doc_id", "lang", {"en": 1.75}).select("doc_id", "copy_idx").collect()}
    assert lo <= hi


def test_novel_against_index(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        novel_against_index,
    )

    idx = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "hello world")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "hello world"),          # exact dup of 2
            (11, "world hello"),          # token-set dup of 2 (reordered)
            (12, "entirely new content"), # novel
            (13, "entirely new content"), # batch-internal dup: kept
        ],
        "doc_id long, text string",
    )
    got = sorted(r.doc_id for r in novel_against_index(new, idx).collect())
    assert got == [12, 13]


def test_novel_against_index_near(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        novel_against_index_near,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    idx = spark.createDataFrame(
        [(1, base), (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base),                                   # exact dup
            (11, base + " lambda"),                       # near dup (J=8/9)
            (12, "totally different words here entirely never overlapping"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r.doc_id for r in novel_against_index_near(new, idx, threshold=0.5).collect()
    )
    assert got == [12]


@pytest.mark.slow
def test_persisted_lsh_index_probe_matches_inline(spark):
    # offline persist + online probe ≡ the inline near-dedup, and the
    # probe re-executes NO index-side kernels (the whole point)
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        novel_against_index_near,
        persist_lsh_index,
        probe_lsh_index,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    new = docs.where(F.col("doc_id") % 5 == 0)
    idx = docs.where(F.col("doc_id") % 5 != 0)
    persist_lsh_index(idx, "t_lsh_idx")
    try:
        probed = sorted(
            r.doc_id for r in probe_lsh_index(new, "t_lsh_idx").collect()
        )
        inline = sorted(
            r.doc_id for r in novel_against_index_near(new, idx).collect()
        )
        assert probed == inline
        plan = (
            probe_lsh_index(new, "t_lsh_idx")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # only the NEW side runs kernels: its bands + its shingle sets
        assert plan.count("MapInPandas") == 2, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lsh_idx_bands")
        spark.sql("DROP TABLE IF EXISTS t_lsh_idx_sets")


def test_deterministic_top_n_exact_nested_invariant(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        deterministic_top_n,
    )

    docs = load_table(spark, "documents", SF)
    s50 = [r.doc_id for r in deterministic_top_n(docs, "doc_id", 50).collect()]
    s100 = [r.doc_id for r in deterministic_top_n(docs, "doc_id", 100).collect()]
    assert len(s50) == 50 and len(s100) == 100
    assert set(s50) <= set(s100)  # growing n only appends
    again = [
        r.doc_id
        for r in deterministic_top_n(docs.repartition(13), "doc_id", 50).collect()
    ]
    assert sorted(s50) == sorted(again)
    # a different salt picks a different set
    other = {
        r.doc_id
        for r in deterministic_top_n(docs, "doc_id", 50, salt="other").collect()
    }
    assert other != set(s50)
