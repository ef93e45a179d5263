"""Plan-contract tests: assert the physical-plan properties the engine
is designed around (SURVEY.md §4) so an optimization regression fails
CI, not a benchmark run later.

Checked properties:
- predicate pushdown + column pruning reach the parquet scan;
- dimension joins broadcast (no shuffle of the big fact side);
- dedup is a partial-aggregatable max_by agg, not a window;
- no interpreted BroadcastNestedLoopJoin in the similarity family
  (the regression behind the round-1 10× slowdown).
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entry_mod.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_lines(plan: str, table: str) -> list[str]:
    return [
        line
        for line in plan.splitlines()
        if "FileScan parquet" in line and f"{table}.parquet" in line
    ]


def test_q6_scan_prunes_columns_and_pushes_filters(spark):
    plan = _plan(spark, "revenue_q6")
    scans = _scan_lines(plan, "lineitem")
    assert scans, plan
    scan = scans[0]
    # projection pruning: only the 4 referenced columns in ReadSchema
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
    assert m is not None, scan
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert set(cols) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }, cols
    # the range/equality predicates reach the scan
    assert "DataFilters: [" in scan and "l_quantity" in scan.split("DataFilters")[1]


def test_events_window_filter_pushdown(spark):
    plan = _plan(spark, "events_window_filter")
    scans = _scan_lines(plan, "events")
    assert scans, plan
    # equality predicate on event_type is pushable as-is; the ts range
    # compares a converted column (nanos->micros) so it cannot reach
    # the scan — assert at least the pushable one does
    assert "event_type" in scans[0].split("DataFilters")[1]


def test_local_supplier_volume_broadcasts_dims(spark):
    plan = _plan(spark, "local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # region/nation/customer/supplier are all dim-side: no sort-merge
    # join should be needed at this scale profile
    assert "CartesianProduct" not in plan


def test_latest_per_user_hour_is_aggregate_not_window(spark):
    plan = _plan(spark, "latest_per_user_hour")
    assert "max_by" in plan or "ObjectHashAggregate" in plan, plan
    assert "Window" not in plan, "dedup must stay a partial-aggregatable agg"


def test_pricing_summary_partial_aggregation(spark):
    plan = _plan(spark, "pricing_summary")
    # two HashAggregate levels (partial + final) around one exchange
    assert plan.count("HashAggregate") >= 2, plan


@pytest.mark.parametrize(
    "name", ["embedding_near_pairs", "ann_lsh_pairs", "ann_topk"]
)
def test_similarity_avoids_nested_loop_join(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name}: dense scoring regressed to an interpreted BNLJ condition"
    )


def test_returned_item_report_plan(spark):
    plan = _plan(spark, "returned_item_report")
    # customer⋈nation arm broadcasts; returnflag filter reaches the scan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    scans = _scan_lines(plan, "lineitem")
    assert scans and "l_returnflag" in scans[0].split("DataFilters")[1], plan


def test_supplier_part_stats_plan(spark):
    plan = _plan(spark, "supplier_part_stats")
    # part is the broadcast build side: the lineitem fact never
    # shuffles for the join itself
    assert "BroadcastHashJoin" in plan
    scans = _scan_lines(plan, "part")
    assert scans and "p_size" in scans[0].split("DataFilters")[1], plan
    # distinct-agg plans as the two-phase Expand pipeline
    assert plan.count("HashAggregate") >= 2, plan


def test_large_volume_customers_partial_agg(spark):
    plan = _plan(spark, "large_volume_customers")
    # the HAVING pre-aggregate must partial-aggregate map-side so the
    # exchange carries (orderkey, partial-sum) not raw lineitems
    assert plan.count("HashAggregate") >= 2, plan
    assert "CartesianProduct" not in plan


def test_user_sessions_single_partitioning(spark):
    plan = _plan(spark, "user_sessions")
    # lag + running-sum share one user_id partitioning: exactly one
    # window-feeding exchange plus the final groupBy exchange — more
    # exchanges means the two windows stopped sharing their sort
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan


@pytest.mark.parametrize(
    "name",
    [
        "nation_market_share",
        "product_type_profit",
        "top_revenue_supplier",
        "shipping_delay_report",
        "small_quantity_revenue",
    ],
)
def test_new_warehouse_shapes_no_interpreted_joins(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_nation_market_share_broadcasts_all_dims(spark):
    # The only allowed shuffle joins are fact-fact; every dimension arm
    # (part, customer market selector, supplier labeler) must broadcast.
    plan = _plan(spark, "nation_market_share")
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_order_count_distribution_preaggregates_orders(spark):
    # The orders side must collapse to (custkey, count) BEFORE joining
    # customer — the join may not carry one row per order.
    plan = _plan(spark, "order_count_distribution")
    agg_pos = plan.find("HashAggregate")
    assert agg_pos != -1, plan
    assert "orders.parquet" in plan[agg_pos:], (
        "orders scan must feed a pre-aggregate below the join"
    )


def test_small_quantity_revenue_single_fact_pattern(spark):
    # Decorrelation contract: the brand-part list broadcasts into both
    # the threshold aggregate and the probe; no sort-merge join of two
    # full lineitem scans.
    plan = _plan(spark, "small_quantity_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_regional_cheapest_supplier_argmin_no_self_join(spark):
    # The Q2 correlated min must decorrelate to ONE min_by aggregate —
    # no join-back of a per-part min table onto the fact.
    plan = _plan(spark, "regional_cheapest_supplier")
    assert "min_by" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sole_failing_supplier_single_fact_aggregate(spark):
    # Q21's EXISTS/NOT-EXISTS pair must fold into one per-order
    # aggregate: exactly one scan of lineitem in the plan.
    plan = _plan(spark, "sole_failing_supplier")
    assert plan.count("lineitem.parquet") == 1, plan


def test_important_part_share_reuses_fact_exchange(spark):
    # The global total re-aggregates the per-part partials: after AQE
    # finalizes, the per-part shuffle must be a ReusedExchange (one
    # physical scan + partial-agg of the fact, not two).
    df = entry_mod.queries()["important_part_share"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan


@pytest.mark.parametrize(
    "name",
    ["event_funnel", "cohort_retention", "top_customers_per_nation",
     "silver_rolling_features", "silver_gap_fill"],
)
def test_event_and_series_shapes_no_interpreted_joins(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rolling_features_single_window_exec(spark):
    # All frames share one (site, ts) sort: exactly one Window node.
    plan = _plan(spark, "silver_rolling_features")
    assert plan.count("Window ") + plan.count("Window\n") <= 2, plan


def test_gap_fill_no_driver_loop_spine(spark):
    # The dense spine must come from explode(sequence(...)), not a
    # driver-side collect: plan contains a Generate node.
    plan = _plan(spark, "silver_gap_fill")
    assert "Generate" in plan, plan


def test_above_type_average_sql_decorrelates(spark):
    # The correlated scalar subquery must decorrelate into an
    # aggregate + equi-join (one extra scan at most), never a per-row
    # re-execution (which would surface as a nested-loop shape).
    plan = _plan(spark, "above_type_average_sql")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_orders_expectations_single_pass(spark):
    # The whole suite must fold into ONE aggregate over ONE scan —
    # the property that makes a 20-check suite cost one job at 100 TB.
    plan = _plan(spark, "orders_expectations")
    assert plan.count("orders.parquet") == 1, plan


# ----------------------------------------------------- round-5 operators


def test_session_attribution_no_nested_loop(spark):
    # the range join must be a hash/sort-merge join on (user_id, bin),
    # never the BNLJ Catalyst natively plans for theta conditions
    plan = _plan(spark, "session_attribution")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_value_tier_report_no_nested_loop(spark):
    plan = _plan(spark, "value_tier_report")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_scrub_spans_no_token_explode(spark):
    # the token cut is a per-row HOF filter: the only Generate allowed
    # is the span pipeline's positional-gram posexplode — the full
    # token stream itself must not be exploded a second time for the
    # scrub, and the doc<-spans join must not be a nested loop
    plan = _plan(spark, "doc_scrubbed_spans")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Generate posexplode") <= 1, plan


def test_semantic_dedup_single_cell_shuffle(spark):
    # assignment kernel -> ONE exchange on the cell key -> per-cell
    # pair kernel; pair generation itself adds no further exchange
    # (the CC/survivor stages after it have their own)
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.similarity import (
        semantic_cell_pairs,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
        load_table,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    plan = (
        semantic_cell_pairs(emb, n_centroids=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "FlatMapGroupsInPandas" in plan, plan


def test_epoch_upsample_shuffle_free(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.sampling import (
        epoch_upsample,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
        load_table,
    )

    docs = load_table(spark, "documents", SF_DIR)
    plan = (
        epoch_upsample(docs, "doc_id", "lang", {"en": 2.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "Generate explode" in plan, plan


def test_heavy_hitters_candidate_semi_join_broadcasts(spark):
    # the recount pass must probe the (tiny) candidate set as a
    # broadcast LEFT SEMI — a shuffled semi or a BNLJ would move the
    # full token stream to the candidates instead of the reverse
    plan = _plan(spark, "token_heavy_hitters")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    # the MG candidate pass ran once at localCheckpoint time; the final
    # plan reads its materialized summary (no Python kernel re-run)
    assert "MapInPandas" not in plan, plan


def test_sparse_cosine_equi_join_no_bnlj(spark):
    # posting self-join must be a hash/SMJ equi-join on the feature
    # key; the norm joins stay equi too — no interpreted joins anywhere
    plan = _plan(spark, "doc_sparse_cosine")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_drift_two_aggregates_one_broadcast_total(spark):
    # two partial-agg shuffles (ref/cur count tables) + the category
    # outer join; totals arrive via broadcast, never a driver collect
    plan = _plan(spark, "event_type_drift")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CollectLimit" not in plan, plan


def test_pq_encode_shuffle_free(spark):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.tables import (
        load_table,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    books = pq_codebooks(emb, m=8, n_codes=16)
    plan = (
        pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_hourly_agg_incremental_no_expand_no_bnlj_fact_side(spark):
    # the merge is union -> ONE re-aggregate; no Expand (the multi-
    # count(DISTINCT) trap) — the HLL sketch is what keeps DISTINCT
    # out of the plan shape
    plan = _plan(spark, "hourly_agg_incremental")
    assert "Expand" not in plan, plan


def test_containment_pairs_equi_join_no_bnlj(spark):
    plan = _plan(spark, "doc_containment_pairs")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_doc_curriculum_single_bucket_exchange(spark):
    # the total-order-partitioner promise: ONE hash exchange on the
    # bucket key + broadcast offsets, never a 1-partition global sort
    # of ROW-scale data. r15: global_rank's envelope audit + offsets
    # fold into the plan (no driver collect), so exactly ONE
    # single-partition exchange is expected — the per-bucket offset
    # table, bounded by max_buckets (the same single-partition sort
    # the eager form ran hidden in its collect pre-job). More than one
    # would mean row-scale data collapsed to a single task.
    plan = _plan(spark, "doc_curriculum")
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "BroadcastExchange" in plan, plan


def test_events_ohlc_single_agg_no_window(spark):
    # OHLC bars are ONE partial-aggregated groupBy (min_by/max_by),
    # never a per-row window sort
    plan = _plan(spark, "events_ohlc")
    assert "Window" not in plan, plan
    # the tail orderBy plans as rangepartitioning; nothing else may
    # collapse to one partition
    assert "Exchange SinglePartition" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_zscore_broadcasts_moments_no_window(spark):
    # the per-key moment table comes back via broadcast; the data is
    # never window-sorted and never re-shuffled on the key
    plan = _plan(spark, "events_zscore")
    assert "Window" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bloom_probe_broadcasts_bits_no_bnlj(spark):
    # the bit table (<= m rows) must broadcast; the only BNLJ allowed
    # is the deliberate 1-row scalar cross attaching n_bits_set
    plan = _plan(spark, "bloom_membership_audit")
    assert "BroadcastExchange" in plan, plan
    bnlj = [
        line for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line
    ]
    assert len(bnlj) <= 1 and all("Cross" in line for line in bnlj), plan


def test_winsorized_broadcasts_bounds(spark):
    plan = _plan(spark, "value_winsorized")
    assert "BroadcastExchange" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_cms_audit_broadcasts_cells_no_bnlj(spark):
    # sketch cells (<= depth*width rows) broadcast onto the probes
    plan = _plan(spark, "token_cms_audit")
    assert "BroadcastExchange" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_media_codec_audit_shuffle_free_kernel(spark):
    # per-row independent raster work: no hash exchange at all before
    # the final presentation sort
    plan = _plan(spark, "media_codec_audit")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_weighted_sample_is_take_ordered(spark):
    # priority sampling must be a global top-N (per-partition heap +
    # single merge), never a full sort of the corpus
    plan = _plan(spark, "doc_weighted_sample")
    assert "TakeOrderedAndProject" in plan, plan


def test_trend_slopes_single_hash_aggregate(spark):
    # one partial-aggregated shuffle fits thousands of series; a
    # SortAggregate fallback or a window would be a regression
    plan = _plan(spark, "site_trend_slopes")
    assert "HashAggregate" in plan, plan
    assert "Window" not in plan, plan


def test_scd2_no_nested_loop_and_broadcast_version_dim(spark):
    plan = _plan(spark, "orders_scd2")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan  # tiny version dimension


def test_click_attribution_outer_is_sortmerge_not_bnlj(spark):
    # equi key (user_id) carries the shuffle; the interval predicate is
    # a post-join condition — a BNLJ/Cartesian would be the quadratic
    # failure mode of a range join without its equi key
    plan = _plan(spark, "click_attribution_outer")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_winnow_pairs_windows_only_per_doc(spark):
    # every window must be KEYED — a global (empty partition-spec)
    # window would sort the gram stream on one task. Two keyed windows
    # exist since r14: the winnowing min per doc_id, and the df cap's
    # count per fingerprint (the _cap_hot_buckets convention).
    plan = _plan(spark, "doc_winnow_pairs")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            # the PARTITION SPEC itself must be the per-doc or
            # per-fingerprint key (r15, ADVICE r14 #4: substring
            # membership on the whole line would pass any column whose
            # name merely contains "fp")
            assert re.search(
                r"windowspecdefinition\((doc_id|fp)#", line
            ), line
            assert "windowspecdefinition()" not in line, line


def test_spearman_windows_bounded_by_buckets(spark):
    # both rank passes ride global_rank's bucket partitioner: every
    # window over row-scale data must partition by the bucket column;
    # the only unpartitioned windows are over the tiny per-bucket
    # offset table (bounded by max_buckets)
    plan = _plan(spark, "order_size_price_spearman")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_incremental_join_deletes_no_cartesian(spark):
    plan = _plan(spark, "incremental_join_deletes")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_doc_search_indexed_probe_prunes_buckets(spark):
    # the lifecycle entry's ONLINE half must keep the bucket-pruned
    # read: the postings scan shows a SelectedBucketsCount
    plan = _plan(spark, "doc_search_indexed")
    assert "SelectedBucketsCount" in plan, plan


def test_zipf_fit_topn_is_take_ordered(spark):
    # the spectrum cut must be a global top-N, never a full sort of
    # the token-count table
    plan = _plan(spark, "corpus_zipf_fit")
    assert "TakeOrderedAndProject" in plan, plan


def test_revenue_rollup_single_pass_expand(spark):
    # the three grouping levels (detail, region subtotal, grand total)
    # must come from ONE Expand over the fact rows — never three
    # groupBys + union (three fact scans); dims broadcast onto the
    # fact side so the only key shuffle is orders x lineitem + the
    # single rollup partial-agg exchange
    plan = _plan(spark, "revenue_rollup")
    assert "Expand" in plan, plan
    assert "Union" not in plan, "rollup regressed to union-of-groupbys"
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
