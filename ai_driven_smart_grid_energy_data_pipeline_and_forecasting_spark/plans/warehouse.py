"""Warehouse-scale join/aggregate plans over the driver's star schema.

The reference's join surface is tiny (J1-J3, SURVEY.md §2.3); these
plans prove the engine's join/agg machinery at the scale the reference
never reached. They double as the headline bench queries.

Scale design:
- Dimension joins (region, nation, customer at harness SF) are
  broadcast — verified via ``.explain``: no shuffle on the fact side.
  On a real cluster AQE re-checks sizes at runtime.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; both
  sides pre-filtered so the exchange carries only surviving rows.
- All aggregates partial-aggregate map-side before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan → filter (pushed down) →
    8-group hash aggregate. The canonical partial-agg benchmark."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cut: str = "1998-03-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped: broadcast(customer-filter) ⋈ orders ⋈ lineitem,
    group by order, top-k revenue. The orders⋈lineitem join shuffles on
    l_orderkey with both sides date-pruned at the scan."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < F.lit(cut).cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    line = lineitem.filter(F.col("l_shipdate") > F.lit(cut).cast("timestamp")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    # orders is a fact table: no broadcast hint — the orders⋈lineitem join
    # shuffles on orderkey at scale; AQE upgrades it to broadcast at small SF.
    return (
        line.join(ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey),
                  line.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(k)
    )


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-07-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped: lost-revenue-by-customer over returned items.

    Plan: lineitem scans with the returnflag filter pushed down; orders
    date-pruned at the scan; the one big shuffle is lineitem ⋈ orders
    on orderkey; customer⋈nation is a broadcast arm attached after the
    fact join so the exchange never carries dimension columns. Top-k by
    revenue is TakeOrderedAndProject — no global sort."""
    line = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        line.join(ords, line.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total lineitem quantity exceeds
    ``min_qty``, with their customer.

    Plan: the HAVING pre-aggregate runs map-side-partial on lineitem,
    shuffling only (orderkey, partial-sum); survivors (rare) join back
    to orders on the same key — AQE sees the tiny filtered side and
    broadcasts it; customer attaches broadcast. Quantity sums are exact
    (integral doubles), so the oracle matches bit-exactly."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(k)
    )


def supplier_part_stats(
    part: DataFrame,
    lineitem: DataFrame,
    brand_excl: str = "Brand#45",
    sizes: tuple[int, ...] = (1, 3, 9, 14, 19, 23, 36, 45),
) -> DataFrame:
    """TPC-H Q16-shaped: distinct supplier count per (brand, type,
    size) for a filtered part family.

    Plan: part filters push to the scan; part is the broadcast side of
    the join with lineitem (dimension ⋈ fact, no fact shuffle for the
    join); the distinct-agg expands to the two-phase
    partial-distinct → final-count pipeline (Spark plans count(DISTINCT)
    as an Expand + two exchanges on the group key — skew-safe here:
    group cardinality = brands × types × sizes)."""
    pf = part.filter(
        (F.col("p_brand") != brand_excl) & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(pf), F.col("l_partkey") == pf.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def nation_trade_volume(
    supplier: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7-shaped: shipped revenue between two nations by year and
    direction.

    Plan: both nation lookups and the supplier dim broadcast; orders
    pre-joins its (broadcast) customer-nation arm so the one real
    shuffle is lineitem ⋈ orders on orderkey. The pair filter
    ((a→b) ∨ (b→a)) evaluates on two broadcast-provided columns after
    the joins — a cheap codegen'd predicate, never a join condition."""
    nsel = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        "n_nationkey", "n_name"
    )
    supp = supplier.join(
        F.broadcast(nsel), supplier.s_nationkey == nsel.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(nsel), customer.c_nationkey == nsel.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    ords = orders.select("o_orderkey", "o_custkey").join(
        F.broadcast(cust), F.col("o_custkey") == cust.c_custkey
    )
    line = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        line.join(ords, line.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), line.l_suppkey == supp.s_suppkey)
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def discounted_brand_revenue(
    part: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q19-shaped: one scalar revenue over a 3-arm disjunctive
    brand/size/quantity predicate.

    Plan: part predicates (the size bounds and brand list) push to the
    part scan; part broadcasts; the per-arm quantity bounds evaluate
    post-join in codegen. The OR of quantity ranges collapses to a
    pushable [1,30] envelope on the lineitem scan — Catalyst does not
    derive that itself, so it is stated explicitly (at 100 TB the
    envelope skips most row groups via min/max stats)."""
    arms = [
        ("Brand#12", 5, 1.0, 11.0),
        ("Brand#23", 10, 10.0, 20.0),
        ("Brand#34", 15, 20.0, 30.0),
    ]
    pf = part.filter(
        F.col("p_brand").isin(*[a[0] for a in arms])
        & (F.col("p_size") <= max(a[1] for a in arms))
    ).select("p_partkey", "p_brand", "p_size")
    qty_envelope = (F.col("l_quantity") >= min(a[2] for a in arms)) & (
        F.col("l_quantity") <= max(a[3] for a in arms)
    )
    cond = None
    for brand, size_hi, q_lo, q_hi in arms:
        arm = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") <= size_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )
        cond = arm if cond is None else cond | arm
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.filter(qty_envelope)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(F.broadcast(pf), F.col("l_partkey") == pf.p_partkey)
        .filter(cond)
        .agg(F.round(revenue, 2).alias("revenue"))
    )


def idle_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    idle_since: str = "2000-01-01",
) -> DataFrame:
    """TPC-H Q22-shaped: per-segment count/balance of above-average-
    balance customers with no recent orders (none since ``idle_since``).

    Plan: the global threshold is a one-row broadcast (the scalar
    subquery made explicit); the no-recent-orders test is a left-anti
    join on custkey with the date filter pushed to the orders scan — at
    scale that is the shuffle, on a uniform key. The above-average
    comparison is stated multiplicatively (bal · n > total, all exact
    decimals) so it is bit-reproducible across engines and
    partitionings — no float division anywhere."""
    pos = customer.filter(F.col("c_acctbal") > 0.0)
    thr = pos.agg(
        F.sum(F.col("c_acctbal").cast("decimal(20,6)")).alias("total_bal"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    rich = (
        customer.crossJoin(F.broadcast(thr))
        .filter(
            F.col("c_acctbal").cast("decimal(20,6)") * F.col("n_pos")
            > F.col("total_bal")
        )
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(idle_since).cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(recent, rich.c_custkey == F.col("o_custkey"), "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(20,6)"))
            .cast("double")
            .alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5-shaped: 5-way join with the whole dimension arm
    broadcast; the only big shuffle is orders ⋈ lineitem on orderkey.
    Customer and supplier must share the nation (the join's selective
    twist), enforced post-join on broadcast columns."""
    nr = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(F.broadcast(nr), customer.c_nationkey == nr.n_nationkey).select(
        "c_custkey", F.col("n_nationkey").alias("c_nkey"), "n_name"
    )
    supp = supplier.join(F.broadcast(nr), supplier.s_nationkey == nr.n_nationkey).select(
        "s_suppkey", F.col("n_nationkey").alias("s_nkey")
    )
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nkey") == F.col("s_nkey")))
        .groupBy("n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def revenue_rollup(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Multi-level subtotals in ONE pass — ROLLUP on the warehouse
    scale surface. `type_status_rollup` already exposes the SURVEY
    §2.4 "free Spark capability" on a single-table aggregate; this is
    the form that matters at 100 TB — the Expand sits ABOVE a
    multi-join fact stream, so the grouping-set duplication must not
    multiply the join work and the dims must broadcast (reference
    parity site: the KPI cards recompute the same aggregate at two
    granularities with separate queries — ``streamlit/app.py:339-341``
    + ``main.py:276-286``): customer revenue at (region, nation)
    detail, per-region subtotal, and grand total, with ``gid =
    grouping_id()`` marking the level (0 detail / 1 region subtotal /
    3 grand total; bit set ⇔ that column is NULLed out — the same
    bitmask DuckDB's ``GROUPING(a, b)`` produces, so the oracle is a
    literal ``GROUP BY ROLLUP``).

    Plan / 100 TB design: region and nation are domain-bounded (a few
    dozen rows by schema semantics) and carry explicit broadcast
    hints; customer is a GROWABLE dimension, so its arm deliberately
    carries NO hint — Spark never demotes an explicit broadcast hint,
    so hinting customer would pin a driver-side OOM at the 100 TB
    design point, while leaving the decision to
    auto-broadcast/AQE (size-threshold-checked at runtime) broadcasts
    it at benched scales and falls back to a shuffle join when the
    dimension outgrows the threshold (r9 ADVICE). The only
    guaranteed big shuffle is
    orders ⋈ lineitem on orderkey, and the rollup itself is Catalyst's
    Expand: each surviving fact row is duplicated once per grouping
    set MAP-SIDE and ONE partial-agg exchange carries all three
    levels at once — vs the naive three groupBys + union (three fact
    scans, three shuffles). Revenue rides the exact decimal(30,6)
    carrier (per-row IEEE product, then exact decimal sum), so every
    level is partition-order-free and bit-identical to the oracle;
    one final cast back to double."""
    nr = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(
        "n_nationkey",
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
    )
    cust = customer.join(
        F.broadcast(nr), customer.c_nationkey == nr.n_nationkey
    ).select("c_custkey", "region", "nation")
    ords = (
        orders.select("o_orderkey", "o_custkey")
        # no broadcast hint: customer grows with the fact data — see
        # docstring (explicit hints are never demoted by AQE)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select("o_orderkey", "region", "nation")
    )
    rev = (
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,6)"
            )
        )
        .cast("double")
        .alias("revenue")
    )
    return (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .rollup("region", "nation")
        .agg(F.grouping_id().cast("long").alias("gid"), rev)
        .orderBy("gid", "region", "nation")
    )


def order_count_distribution(
    customer: DataFrame,
    orders: DataFrame,
    priority_excl: str = "4-NOT SPECIFIED",
) -> DataFrame:
    """TPC-H Q13-shaped: distribution of orders-per-customer, including
    zero-order customers (the comment-pattern exclusion becomes an
    order-priority exclusion — the harness schema has no comments).

    Plan: the filtered orders side pre-aggregates to (custkey, count)
    map-side before any join, so the customer ⋈ counts join carries one
    row per *customer*, not per order; at harness SF the counted side is
    small enough for AQE to broadcast, at 100 TB it shuffles on the
    uniform custkey. The outer join keeps zero-order customers (count
    coalesced to 0). Second aggregate is tiny (distinct count values)."""
    per_cust = (
        orders.filter(F.col("o_orderpriority") != priority_excl)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        customer.select("c_custkey")
        .join(per_cust, customer.c_custkey == per_cust.o_custkey, "left_outer")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def small_quantity_revenue(
    part: DataFrame,
    lineitem: DataFrame,
    brand: str = "Brand#13",
    frac: float = 0.2,
    years: float = 7.0,
) -> DataFrame:
    """TPC-H Q17-shaped: average yearly revenue lost if small-quantity
    orders (below ``frac`` of the part's mean quantity) were not taken.

    Plan: the correlated scalar subquery (per-part avg) is decorrelated
    into a per-part aggregate joined back — both sides pre-filtered by
    the broadcast brand-part list, so the aggregate and the probe scan
    the same pruned fraction of lineitem. The per-part threshold frame
    is dimension-sized (one row per brand part) and broadcasts; nothing
    shuffles the fact side twice at scale."""
    pf = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice").join(
        F.broadcast(pf), F.col("l_partkey") == pf.p_partkey
    )
    thresh = li.groupBy("l_partkey").agg(
        (F.lit(frac) * F.avg("l_quantity")).alias("qty_thresh")
    ).select(F.col("l_partkey").alias("t_partkey"), "qty_thresh")
    return (
        li.join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(years), 2).alias("avg_yearly")
        )
    )


def top_revenue_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15-shaped: the supplier(s) with maximum shipped revenue in
    a quarter (the reference view + scalar-max, ties kept).

    Plan: one map-side-partial aggregate over the date-pruned lineitem
    scan builds the revenue view keyed by suppkey; the global max is a
    one-row broadcast joined back (no second pass over the fact); the
    supplier dimension attaches broadcast. Revenue is rounded before the
    max comparison so the tie test is on the exact published value."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def nation_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_2",
    region_name: str = "ASIA",
    p_type: str = "PROMO",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q8-shaped: ``target_nation``'s share of ``region_name``'s
    market for one part type, per order year.

    Plan: every dimension arm (part-type filter, customer→nation→region
    market selector, supplier→nation labeler) broadcasts; the single
    fact-fact shuffle is lineitem ⋈ orders on orderkey with both sides
    scan-pruned (part semi-reduction on lineitem via the broadcast,
    date window on orders). The share is a conditional-sum ratio
    computed in one aggregate — no second pass, no self-join."""
    mkt_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(mkt_nations), customer.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    pf = part.filter(F.col("p_type") == p_type).select("p_partkey")
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    # Exact-decimal volume (inputs carry ≤2 decimals) so both sums are
    # fold-order-invariant; the ratio divides as double only at the end.
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    zero = F.lit(0).cast("decimal(21,4)")
    return (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(F.broadcast(pf), F.col("l_partkey") == pf.p_partkey)
        .join(ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == target_nation, vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def product_type_profit(
    nation: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    name_token: str = "widget",
    cost_factor: float = 0.1,
) -> DataFrame:
    """TPC-H Q9-shaped: profit by supplier nation and order year for a
    part-name family. The harness schema has no partsupp, so supply
    cost is proxied as ``cost_factor × p_retailprice × l_quantity`` —
    same expression shape (join-provided unit cost × quantity).

    Plan: the part-name filter (a non-anchored contains — not pushable
    as a parquet predicate, but evaluated in the scan stage on the tiny
    part table) broadcasts; supplier→nation broadcasts; the one shuffle
    is lineitem ⋈ orders on orderkey. Profit folds to one expression so
    the aggregate stays a single partial/final hash-agg pair."""
    pf = part.filter(F.col("p_name").contains(name_token)).select(
        "p_partkey", "p_retailprice"
    )
    supp = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    # Profit mixes a sum and a difference of money terms — the one shape
    # where double fold-order reaches the rounded cents. All inputs carry
    # ≤2 decimals, so decimal arithmetic is EXACT: the sum is
    # partition-count- and engine-invariant by construction.
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    cost = (
        F.lit(str(cost_factor)).cast("decimal(4,2)")
        * F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    )
    profit = rev.cast("decimal(30,6)") - cost.cast("decimal(30,6)")
    return (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount",
        )
        .join(F.broadcast(pf), F.col("l_partkey") == pf.p_partkey)
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def shipping_delay_report(
    orders: DataFrame,
    lineitem: DataFrame,
    fast_days: int = 30,
    normal_days: int = 90,
) -> DataFrame:
    """TPC-H Q12-shaped: line counts by ship-delay bucket × order
    priority class (the harness schema has no shipmode/commitdate, so
    the mode split becomes an order-date→ship-date delay bucket).

    Plan: one shuffle (lineitem ⋈ orders on orderkey); the bucket and
    the priority-class indicator are both codegen'd CASE expressions,
    so the aggregate is a 3-group conditional count — partial map-side,
    one tiny exchange."""
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= fast_days, "fast")
        .when(delay <= normal_days, "normal")
        .otherwise("slow")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(is_high.cast("bigint")).alias("high_line_count"),
            F.sum((~is_high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


def regional_cheapest_supplier(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    region_name: str = "EUROPE",
    size: int = 15,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2-shaped: per part, the region supplier offering the
    minimum unit price (no partsupp in the harness schema, so unit
    price is observed ``l_extendedprice / l_quantity`` and the
    correlated min decorrelates over shipped lines).

    Plan: supplier→nation→region broadcasts as one arm; the part-size
    filter broadcasts as the other; the correlated MIN is a single
    ``min_by``/``min`` aggregate over the pruned fact — one shuffle on
    partkey, no join-back (arg-min replaces the Q2 self-join entirely).
    Ties break to the lowest suppkey via the composite ordering struct,
    which keeps the result deterministic across partitionings."""
    rn = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    supp = supplier.join(
        F.broadcast(rn), supplier.s_nationkey == rn.n_nationkey
    ).select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    pf = part.filter(F.col("p_size") == size).select("p_partkey", "p_name")
    # Exact-decimal unit price: extendedprice has 2 decimals, quantity is
    # integral — round to 6 in decimal so min/tie comparisons are
    # engine-invariant (double division would tie-break on last bits).
    unit_price = F.round(
        F.col("l_extendedprice").cast("decimal(18,2)")
        / F.col("l_quantity").cast("decimal(18,2)"),
        6,
    ).cast("double")
    best = F.min_by(
        F.struct("s_suppkey", "s_name", "s_acctbal", "nation"),
        F.struct(F.col("price"), F.col("s_suppkey")),
    )
    return (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(pf), F.col("l_partkey") == pf.p_partkey)
        .withColumn("price", unit_price)
        .groupBy("p_partkey", "p_name")
        .agg(F.min("price").alias("min_price"), best.alias("s"))
        .select(
            "p_partkey", "p_name", "min_price",
            F.col("s.s_suppkey").alias("s_suppkey"),
            F.col("s.s_name").alias("s_name"),
            F.col("s.s_acctbal").alias("s_acctbal"),
            F.col("s.nation").alias("nation"),
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey")
        .limit(k)
    )


def important_part_share(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str | None = None,
    frac: float = 0.0005,
) -> DataFrame:
    """TPC-H Q11-shaped: parts whose shipped value exceeds ``frac`` of
    the total shipped value (global scalar fraction HAVING).

    Plan: one map-side-partial aggregate keyed by partkey; the global
    total re-aggregates the *per-part* sums (tiny — part cardinality,
    not fact cardinality: no second fact scan) and broadcasts back as a
    one-row threshold. Value sums are exact decimals so the threshold
    comparison is engine- and partitioning-invariant."""
    li = lineitem
    if brand is not None:
        pf = part.filter(F.col("p_brand") == brand).select("p_partkey")
        li = li.join(F.broadcast(pf), F.col("l_partkey") == pf.p_partkey)
    val = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(val).alias("value_dec"))
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    # State the fraction as an integer ratio (frac = num/1e6) so the
    # HAVING comparison is pure integer-scaled decimal arithmetic —
    # exact in both engines, no decimal-precision truncation.
    num = round(frac * 1_000_000)
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec") * F.lit(1_000_000)
            > F.col("total_dec") * F.lit(num)
        )
        .select(
            "l_partkey",
            F.round(F.col("value_dec"), 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def excess_share_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    name_token: str = "red",
    share: float = 0.125,
) -> DataFrame:
    """TPC-H Q20-shaped: suppliers responsible for more than ``share``
    of a part family's total shipped quantity (the excess-stock
    semi-join chain re-expressed over observed shipments). The default
    share is an exact binary fraction (1/8) so share × integral-qty
    compares identically in IEEE arithmetic on every engine.

    Plan: the name-filtered part list broadcasts into the fact scan;
    quantity aggregates once per (partkey, suppkey) map-side; the
    per-part total reuses that aggregate (re-agg of partials, not a
    second fact pass). Survivors form a small distinct suppkey set that
    semi-joins (broadcast) into supplier — the Q20 IN-subquery chain
    with each step explicit."""
    pf = part.filter(F.col("p_name").contains(name_token)).select("p_partkey")
    qty = (
        lineitem.select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(pf), F.col("l_partkey") == pf.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    totals = qty.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    heavy = (
        qty.join(totals, "l_partkey")
        .filter(F.col("supp_qty") > F.lit(share) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(heavy), supplier.s_suppkey == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def sole_failing_supplier(
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    k: int = 100,
) -> DataFrame:
    """TPC-H Q21-shaped: suppliers from one nation who were the *sole*
    returned-line supplier on a multi-supplier order (no
    commit/receipt dates in the harness schema, so "kept waiting"
    becomes ``l_returnflag = 'R'``; the EXISTS / NOT-EXISTS pair
    becomes per-order distinct-supplier counts).

    Plan: both correlated subqueries collapse into a two-level
    aggregate over the order's lines — per (orderkey, suppkey) first
    (one row per supplier per order, fully partial-aggregatable), then
    per orderkey — so the fact shuffles once on orderkey instead of
    three self-joins AND avoids the Expand (3× row multiplication)
    that multiple count(DISTINCT)s in one aggregate would plan
    (measured 4.0s → 1.3s at sf0.1); the nation-filtered supplier dim
    broadcasts into the final count."""
    per_supp = (
        lineitem.select("l_orderkey", "l_suppkey", "l_returnflag")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("any_fail")
        )
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("any_fail").alias("n_fail_supp"),
            F.max(
                F.when(F.col("any_fail") == 1, F.col("l_suppkey"))
            ).alias("fail_suppkey"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_fail_supp") == 1))
    )
    fo = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        per_order.join(fo, per_order.l_orderkey == fo.o_orderkey, "left_semi")
        .join(F.broadcast(supp), F.col("fail_suppkey") == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(k)
    )
