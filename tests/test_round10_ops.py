"""Round-10 operator unit tests: vocab_coverage (the tokenizer-sizing
report — minimal vocab for a coverage target + exact OOV mass at fixed
vocab sizes), pinned against hand-computable corpora and a pure-Python
oracle on randomized inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.functions.text import (
    vocab_coverage,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _report(df):
    return {
        (r["kind"], r["param"]): r["value"] for r in df.collect()
    }


def test_vocab_coverage_hand_computed(spark):
    # corpus: a:6  b:3  c:1  -> T=10, V=3
    docs = _docs(spark, ["a a a b", "a a a b b c"])
    rep = _report(
        vocab_coverage(
            docs, coverage=((1, 2), (9, 10), (1, 1)), vocab_sizes=(1, 2, 3, 7)
        )
    )
    assert rep[("total", "tokens")] == 10
    assert rep[("total", "types")] == 3
    # 50%: ceil(10/2)=5 -> 'a' alone (6) covers it -> K=1
    assert rep[("coverage_k", "1/2")] == 1
    # 90%: target 9 -> a+b = 9 -> K=2
    assert rep[("coverage_k", "9/10")] == 2
    # 100%: all three types
    assert rep[("coverage_k", "1/1")] == 3
    # OOV: top-1 keeps a (6) -> 4 out; top-2 -> 1 out; top-3 or more -> 0
    assert rep[("oov_tokens", "1")] == 4
    assert rep[("oov_tokens", "2")] == 1
    assert rep[("oov_tokens", "3")] == 0
    assert rep[("oov_tokens", "7")] == 0


def test_vocab_coverage_tie_groups_partial_take(spark):
    # four types ALL with count 2 (one spectrum group): T=8.
    # 50% -> target 4 -> 2 whole types from inside the group;
    # 5/8 -> target 5 -> ceil(5/2)=3 types
    docs = _docs(spark, ["w x y z", "w x y z"])
    rep = _report(
        vocab_coverage(docs, coverage=((1, 2), (5, 8)), vocab_sizes=(3,))
    )
    assert rep[("coverage_k", "1/2")] == 2
    assert rep[("coverage_k", "5/8")] == 3
    # top-3 of the equal-count group covers 6 of 8
    assert rep[("oov_tokens", "3")] == 2


def test_vocab_coverage_single_type(spark):
    docs = _docs(spark, ["q q q"])
    rep = _report(
        vocab_coverage(docs, coverage=((999, 1000),), vocab_sizes=(1, 5))
    )
    assert rep[("coverage_k", "999/1000")] == 1
    assert rep[("oov_tokens", "1")] == 0
    assert rep[("total", "types")] == 1


def test_vocab_coverage_python_oracle_randomized(spark):
    # deterministic pseudo-random corpus; the pure-Python oracle sorts
    # types by (count desc, token) and scans — the definitional form
    # the spectrum formulation must equal
    words = [f"t{(i * i) % 37}" for i in range(400)]
    texts = [" ".join(words[i:i + 23]) for i in range(0, 400, 23)]
    from collections import Counter

    toks = [w for t in texts for w in t.split(" ")]
    cnt = Counter(toks)
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    T = sum(cnt.values())
    coverage = [(1, 3), (2, 3), (9, 10), (99, 100)]
    sizes = [1, 5, 17, 1000]
    want = {("total", "tokens"): T, ("total", "types"): len(cnt)}
    for n, d in coverage:
        target = -(-T * n // d)
        acc = k = 0
        for _, c in ordered:
            k += 1
            acc += c
            if acc >= target:
                break
        want[("coverage_k", f"{n}/{d}")] = k
    for v in sizes:
        covered = sum(c for _, c in ordered[:v])
        want[("oov_tokens", str(v))] = T - covered
    rep = _report(
        vocab_coverage(_docs(spark, texts), coverage=coverage, vocab_sizes=sizes)
    )
    assert rep == want


def test_vocab_coverage_loud_refusals(spark):
    docs = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="bad coverage fraction"):
        vocab_coverage(docs, coverage=((3, 2),))
    with pytest.raises(ValueError, match="bad coverage fraction"):
        vocab_coverage(docs, coverage=((0, 5),))
    with pytest.raises(ValueError, match="vocab sizes"):
        vocab_coverage(docs, vocab_sizes=(0,))
    empty = docs.where(F.lit(False))
    with pytest.raises(ValueError, match="empty corpus"):
        vocab_coverage(empty)
