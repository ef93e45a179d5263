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
