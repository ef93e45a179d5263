"""Round-15 optimization tests.

Pin the identities the r15 optimizations rely on:

- ``_write_index_batch`` (index stats observed on the postings write
  job instead of a second corpus tokenize) must be value-identical
  to ``_search_stats`` on NULL-text / empty-text / whitespace corpora
  — the exact row classes where the derivations could diverge, and
  the all-NULL batch exercises the degenerate-batch fallback;
- ``ngram_jaccard_pairs``' df cap is now a window-count PREFILTER
  (no over-cap posting list ever materialized) — adversarial
  hot-shingle corpus must produce the same capped output as the exact
  brute-force Jaccard over the df-capped vocabulary;
- ``global_rank`` is now fully lazy (audit + offsets folded into the
  plan) — contract violations must still refuse loudly, at action
  time, and a clean call must launch no job at build time;
- the ``materialize`` flags (ADVICE r14 #2) must not change a single
  output value.
"""
from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F


def _clear_index_tables(spark, prefix):
    """Drop index tables AND their warehouse locations — a crashed
    prior run can leave an orphaned directory without a catalog entry,
    which saveAsTable(overwrite) refuses (the q_doc_search_indexed
    gotcha)."""
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark import (
        fsutil,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir")
    for suffix in ("postings", "stats"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{suffix}")
        fsutil.delete(
            fsutil.join(wh, f"{prefix}_{suffix}"), recursive=True,
            spark=spark,
        )


# ------------------------------------- stats-from-postings identity


def _mk_corpus(spark):
    rows = [
        (1, "a b c a"),
        (2, None),            # NULL text: no postings, counts in n only
        (3, ""),              # empty: tokenizes to [''] — one posting
        (4, "   "),           # whitespace: trim -> '' -> [''] too
        (5, "b c d"),
        (6, None),
        (7, "c d e f"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stats_from_postings_identity_null_and_empty(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions.text import (
        _search_stats,
        persist_search_index,
        append_search_index,
    )

    docs = _mk_corpus(spark)
    base = docs.where(F.col("doc_id") % 2 == 1)
    delta = docs.where(F.col("doc_id") % 2 == 0)
    _clear_index_tables(spark, "t_r15_stats")
    persist_search_index(base, "t_r15_stats", batch_id="base")
    try:
        append_search_index(delta, "t_r15_stats", batch_id="delta")
        got = {
            r["batch_id"]: (r["n"], r["l"])
            for r in spark.table("t_r15_stats_stats").collect()
        }
        want = {
            r["batch_id"]: (r["n"], r["l"])
            for r in _search_stats(base, "text", "base")
            .unionByName(_search_stats(delta, "text", "delta"))
            .collect()
        }
        # value-identical per batch, NULL/empty/whitespace text included
        assert got == want
        # and the batch with only-NULL rows contributes n but no l
        assert got["delta"][0] == delta.count()
    finally:
        for suffix in ("postings", "stats"):
            spark.sql(f"DROP TABLE IF EXISTS t_r15_stats_{suffix}")


def test_stats_from_postings_all_null_batch(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions.text import (
        _search_stats,
        persist_search_index,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, text string"
    )
    _clear_index_tables(spark, "t_r15_allnull")
    persist_search_index(docs, "t_r15_allnull", batch_id="b0")
    try:
        got = spark.table("t_r15_allnull_stats").collect()
        want = _search_stats(docs, "text", "b0").collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert got[0]["n"] == 2 and got[0]["l"] is None
    finally:
        for suffix in ("postings", "stats"):
            spark.sql(f"DROP TABLE IF EXISTS t_r15_allnull_{suffix}")


# --------------------------------- hot-shingle window-cap prefilter


def _brute_capped_jaccard(corpus, n, max_df, threshold):
    """Exact Jaccard over the df-capped shingle vocabulary."""
    shs = {
        i: {
            tuple(t.strip().split()[j : j + n])
            for j in range(len(t.strip().split()) - n + 1)
        }
        for i, t in corpus
    }
    df_count: dict[tuple, int] = {}
    for s in shs.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    kept = {g for g, c in df_count.items() if c <= max_df}
    capped = {i: s & kept for i, s in shs.items()}
    out = set()
    for a, b in combinations(sorted(capped), 2):
        inter = len(capped[a] & capped[b])
        union = len(capped[a] | capped[b])
        if union and inter / union >= threshold:
            out.add((a, b, round(inter / union, 9)))
    return out


def test_ngram_capped_hot_shingle_adversarial(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    # every doc shares one boilerplate trigram (df = 24 >> max_df=6);
    # two clusters of genuinely similar docs sit below the cap
    boiler = "copyright footer text"
    corpus = [
        (i, f"{boiler} alpha beta gamma delta v{i % 3}") for i in range(12)
    ] + [
        (100 + i, f"{boiler} epsilon zeta eta theta w{i % 3}")
        for i in range(12)
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs(
            docs, threshold=0.5, n=3, max_df=6
        ).collect()
    }
    want = _brute_capped_jaccard(corpus, n=3, max_df=6, threshold=0.5)
    assert got == want
    assert got  # adversarial corpus still yields in-cap pairs


def test_ngram_capped_window_prefilter_in_plan(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    plan = ngram_jaccard_pairs(
        docs, threshold=0.5, max_df=6
    )._jdf.queryExecution().executedPlan().toString()
    # the df cap must be a keyed count-window over the shingle
    # (filtering rows BEFORE the posting collect_list), never a size
    # test on the materialized list (the pair filter size(ids) > 1 is
    # fine — it is not the cap)
    assert "windowspecdefinition(sh#" in plan, plan
    assert any(
        "_df" in line and "<= 6" in line for line in plan.splitlines()
    ), plan
    for line in plan.splitlines():
        if "size(ids" in line:
            assert "<= 6" not in line, line


# ------------------------------------------- lazy global_rank audit


def test_global_rank_is_lazy_and_refuses_bad_keys_at_action(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        global_rank,
    )

    bad = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 2.0)], "id long, v double"
    )
    # build is lazy: constructing the frame over invalid keys must not
    # raise (the audit folded into the plan)
    frame = global_rank(bad, bucket=F.lit(0), key=F.col("v"))
    with pytest.raises(Exception, match="NULL or NaN"):
        frame.collect()
    # NULL bucket refused at action too
    nb = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(Exception, match="no rank position"):
        global_rank(nb, bucket=F.lit(None), key=F.col("v")).collect()


# --------------------------- duplicated_spans min/max hot-gram path


def test_duplicated_spans_minmax_path_equals_countdistinct(spark):
    """The min_df=2 fast path (min(doc_id) != max(doc_id), fully
    map-side) must flag exactly the grams the general countDistinct
    path flags — including the adversarial case of one doc repeating
    a gram many times (high tf, df=1: must NOT be hot)."""
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        duplicated_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "x y z x y z x y z"),      # self-repeats only: df=1
            (2, "a b c d e f g"),
            (3, "a b c d e q r"),          # shares 'a b c d e' with 2
            (4, "solo tokens here only now"),
        ],
        "doc_id long, text string",
    )
    fast = sorted(
        tuple(r) for r in duplicated_spans(docs, n=3, min_df=2).collect()
    )
    # min_df=3 exercises the general path on the same corpus; with no
    # gram in 3 docs it must be empty while the fast path is not
    general = sorted(
        tuple(r) for r in duplicated_spans(docs, n=3, min_df=3).collect()
    )
    assert general == []
    # doc 1's self-repeated grams must not be flagged by the fast path
    assert all(r[0] != 1 for r in fast)
    # docs 2 and 3 share the 'a b c d e' run: spans over tokens 0..4
    assert {(2, 0, 4, 5), (3, 0, 4, 5)} == set(fast)


# ------------------- spectrum-percentile negative proof (closed item)


def test_exact_percentile_not_reproducible_from_spectrum(spark):
    """NEGATIVE PROOF (r15, VERDICT r14 Next #6 — closes the item
    permanently): a distinct-value-spectrum rewrite of the exact
    ``percentile(...)`` aggregate CANNOT be bit-identical on double
    columns. Root cause: Spark's Percentile buffer keys -0.0 and 0.0
    as DISTINCT values (java Double equality) and can return -0.0,
    while any groupBy spectrum NORMALIZES -0.0 to 0.0 (grouping-key
    normalization), which flips the returned zero's sign AND — when
    duplicates straddle the two zeros — shifts the cumulative counts
    enough to bracket a DIFFERENT value entirely (observed: 5e-324 vs
    0.0 on a 60-trial random differential). Do not re-attempt the
    rewrite for ``sketch_accuracy_audit``; the oracle hashes raw
    bytes, so the sign of zero alone breaks parity."""
    import struct

    df = spark.createDataFrame(
        [("g", v) for v in [-1.0, -0.0, -0.0, 0.0, 1.0]],
        "k string, v double",
    )
    exact = df.groupBy("k").agg(
        F.expr("percentile(v, 0.5)").alias("p")
    ).collect()[0]["p"]
    # Spark's exact percentile distinguishes the zeros: median of
    # [-1, -0.0, -0.0, 0.0, 1] is the middle buffer key -0.0
    assert struct.pack("d", exact) == struct.pack("d", -0.0), exact.hex()
    # the spectrum (groupBy (k, v)) normalizes -0.0 away — only ONE
    # zero key survives, so no spectrum-derived value can be -0.0
    zeros = (
        df.where(F.col("v") == 0.0)
        .groupBy("k", "v")
        .count()
        .collect()
    )
    assert len(zeros) == 1
    assert struct.pack("d", zeros[0]["v"]) == struct.pack("d", 0.0)


# ------------------------------------------- materialize-flag identity


def test_materialize_flags_do_not_change_outputs(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.dedup import (
        containment_pairs,
        minhash_accuracy_audit,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.relational import (
        mad_outliers,
        quantile_match,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "a b c d e f h"),
            (3, "x y z w q r s"),
            (4, "a b c d e f g"),
        ],
        "doc_id long, text string",
    )
    for op, kw in (
        (containment_pairs, dict(threshold=0.5)),
        (minhash_accuracy_audit, dict(threshold=0.3)),
    ):
        on = [tuple(r) for r in op(docs, materialize=True, **kw).collect()]
        off = [tuple(r) for r in op(docs, materialize=False, **kw).collect()]
        assert on == off, op.__name__

    kv = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 2, 3, 9]]
        + [("b", float(v)) for v in [5, 5, 6, 7]],
        "k string, v double",
    )
    for op, args in (
        (mad_outliers, ("k", "v")),
        (quantile_match, ("k", "v", "a")),
    ):
        on = sorted(
            tuple(r) for r in op(kv, *args, materialize=True).collect()
        )
        off = sorted(
            tuple(r) for r in op(kv, *args, materialize=False).collect()
        )
        assert on == off, op.__name__
