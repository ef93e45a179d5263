"""Generate tests/shuffle_budgets.json: per-registry-entry SHUFFLE
Exchange counts from the PREPARED physical plan (executedPlan before
any job runs — i.e. after EnsureRequirements has inserted exchanges
but before AQE re-optimizes; sparkPlan() is the wrong hook, it
pre-dates EnsureRequirements so it contains NO Exchange nodes at all
and every budget degenerates to a vacuous 0). AQE may later ELIDE
exchanges at runtime (broadcast conversion, coalescing), never add
them, so the prepared count is the stable upper-bound contract.
BroadcastExchange nodes are deliberately NOT counted — a broadcast is
the cheap alternative to a shuffle, and counting it would penalize
exactly the plans we want.

The budget file is the shuffle contract of the whole engine: a code
change that adds an Exchange to any registered query fails
tests/test_shuffle_budget.py until the budget is consciously re-raised
— shuffles are the scarce resource at 100 TB (SCALE.md), so a silent
extra one is a perf regression the oracle gate cannot see.

Usage: python scripts/gen_shuffle_budgets.py  (rewrites the JSON)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark import (  # noqa: E402
    get_spark,
)
import __spark_entry__ as entry_mod  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "shuffle_budgets.json",
)

# Entries whose PLAN depends on driver-side loops/collects over the
# data (iteration counts, auto-derived knobs, bounded driver fast
# paths) — their Exchange count is data-dependent, so they carry no
# static budget; the scale probes and plan contracts cover them.
DYNAMIC = {
    "kcenter_selection",        # k-1 per-round plans (driver loop)
    "corpus_kcore",             # per-round localCheckpoint peeling (driver loop)
    "corpus_communities",       # per-round localCheckpoint LPA (driver loop)
    "part_fuzzy_pairs_auto",    # auto_gram_size collects sigma first
    "semantic_dedup",           # CC rounds data-dependent
    "semantic_dedup_auto",
    "near_dup_clusters",
    "dedup_corpus",
    "dedup_corpus_best",
    "embedding_dedup",
    "dedup_cluster_sizes",
    "leakage_safe_split",
    "curated_corpus",
    "bpe_audit",                # merge-loop iterations
    "ann_ivf_trained",          # MLlib fit
    "forecast_mllib",
    "doc_search_indexed",       # persists tables before the probe plan
}
# (r10) the three media byte-path audits left this set: their plans
# are static (pruned id scan -> mapInPandas -> orderBy) - the new
# media_jpeg_prog_audit proved the shape budgets cleanly, so the
# siblings now carry measured budgets (2) instead of an exclusion.
# (r10 continuation) seven more stale exclusions measured and moved
# to budgets: incremental_novel_docs/_near, doc_curriculum,
# upsert_merge, hourly_agg_incremental, silver_clean_vs_actual,
# pipeline_lineage — each builds ONE DataFrame whose prepared plan is
# bit-stable across builds (side-effectful setup like upsert_merge's
# staged write happens at build time, but the RETURNED read-back plan
# is what the budget pins, and its Exchange count is deterministic).


# Confs that can change a prepared plan's Exchange COUNT (ADVICE r10:
# a drift between the generator session and the test session must
# surface as a conf mismatch, not masquerade as a plan regression).
# Recorded into the JSON under "_confs"; tests/test_shuffle_budget.py
# asserts its session matches before trusting any budget failure.
# spark.sql.shuffle.partitions is deliberately NOT here: it sets the
# ARITY of each exchange, never whether one exists, so the generator
# (32) and the test fixture (4) may differ on it safely.
PLAN_CONFS = (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.enabled",
    "spark.sql.files.maxPartitionBytes",
)

# \bExchange does not match inside BroadcastExchange (no word boundary
# between two word characters), so this counts data shuffles only.
_SHUFFLE = re.compile(
    r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition"
    r"|RoundRobinPartitioning)"
)


def count_shuffles(plan: str) -> int:
    return len(_SHUFFLE.findall(plan))


def main() -> None:
    spark = get_spark("shuffle-budgets")
    budgets: dict = {
        "_confs": {k: spark.conf.get(k) for k in PLAN_CONFS}
    }
    # ADVICE r14 #1: entries whose captured plan reads a pinned
    # (localCheckpoint) subtree — visible as a Scan ExistingRDD — ran
    # shuffles in PRE-CAPTURE jobs that the budget number cannot see.
    # Annotate them so the budget is read as "shuffles in the final
    # plan", not total shuffle cost. Driver-side bounded collects and
    # index-lifecycle writes are the same class but leave no RDD scan
    # in the plan; those are annotated statically below.
    PRE_JOB_STATIC = {
        # prf_index_topk collects the bounded expansion term set and
        # the lifecycle writes postings+stats tables before the probe
        # plan is captured
        "doc_search_prf_indexed",
    }
    pinned: list[str] = sorted(PRE_JOB_STATIC)
    for name, fn in entry_mod.queries().items():
        if name in DYNAMIC:
            continue
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"[skip] {name}: {type(exc).__name__}: {exc}"[:200])
            continue
        budgets[name] = count_shuffles(plan)
        if "ExistingRDD" in plan:
            pinned.append(name)
    budgets["_pinned_entries"] = sorted(pinned)
    with open(OUT, "w") as fh:
        json.dump(budgets, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"wrote {len(budgets) - 2} budgets to {OUT} "
        f"({len(pinned)} pinned-annotated)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
