"""Relational query suite over the star schema.

The reference's only documented join is `fact LEFT JOIN dim_programs`
(reference docs/SCHEMA.md:362-370); its schema is explicitly designed
to minimize joins. For a complete engine we implement the full
relational operator surface -- multi-way joins, semi/anti joins,
windows, having-filters, top-k -- as declarative plans over the
TPC-H-style testdata tables.

Scale notes: dimension tables (region/nation/customer/supplier/part)
are broadcast explicitly -- at 100 TB the fact tables (lineitem,
orders) must never shuffle for a dim join. The orders<->lineitem joins
are key-partitioned shuffles on the same key (orderkey) so AQE can
plan them as a single exchange reuse; aggregations are
partial+final (map-side combine) by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.plans.testdata_model import load_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary report (scan -> hash agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + agg + top-10 (broadcast customer)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: fact joined through 4 broadcast dims -> revenue per nation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter + scalar aggregate (pushdown showcase)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: semi-join (EXISTS) + group-by priority.

    Adapted to this schema: an order is 'late' if any of its lineitems
    shipped more than 90 days after the order date.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate").isNotNull()).select("l_orderkey", "l_shipdate")
    late_orders = (
        orders.join(late, (orders.o_orderkey == late.l_orderkey), "inner")
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .select("o_orderkey", "o_orderpriority")
        .distinct()
    )
    return late_orders.groupBy("o_orderpriority").agg(F.count("*").alias("late_order_count"))


def segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documented-join parity: fact LEFT JOIN dim -> per-segment stats
    (reference docs/SCHEMA.md:362-370's fact->dim left join shape)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
        .groupBy(F.coalesce(F.col("c_mktsegment"), F.lit("unknown")).alias("mktsegment"))
        .agg(
            F.count("*").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_order_value"),
        )
    )


def big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: agg -> HAVING -> join back to dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


def customer_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface: top-3 orders per customer by price
    (row_number over partitioned window -- beyond the reference, which
    has no window functions, SURVEY.md section 2.6)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank_in_customer", F.row_number().over(w))
        .filter(F.col("rank_in_customer") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_customer")
    )


def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) surface: the lineitem money/quantity measures
    reshaped wide -> long, then aggregated per measure. unpivot is a
    per-row Expand (no shuffle); the single shuffle is the final
    3-group aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n_values"),
        F.round(F.sum("val"), 2).alias("total"),
        F.round(F.avg("val"), 6).alias("mean"),
    )


HIGH_VALUE_ORDER = 300_000.0


def inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join surface: customers with no high-value (>300k) orders,
    per segment. The filter is pushed below the anti-join so the right
    side shrinks before the shuffle; Catalyst plans
    BroadcastHashJoin(LeftAnti) when the filtered side fits."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > HIGH_VALUE_ORDER)
        .select("o_custkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("inactive_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (returnflag -> linestatus ->
    grand total). Catalyst expands grouping sets into one Expand +
    single hash aggregate -- one scan, one shuffle for all levels.
    `level` is the grouping_id bitmask (0=detail, 1=flag subtotal,
    3=grand total) so subtotal rows are unambiguous even if the
    grouped columns could be NULL."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("level"),
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "level",
            "n_items",
            "revenue",
        )
    )


def order_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (order year, priority): all four grouping combinations
    in one Expand + hash-agg pass (no multi-scan union)."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("bigint").alias("order_year")
    return (
        orders.select(yr, F.col("o_orderpriority"), F.col("o_totalprice"))
        .cube("order_year", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("level"),
            F.count("*").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("order_year").cast("string"), F.lit("ALL")).alias("order_year"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("order_priority"),
            "level",
            "order_count",
            "total_price",
        )
    )


PRICE_TIERS: list[tuple[str, float, float]] = [
    ("bronze", 0.0, 100_000.0),
    ("silver", 100_000.0, 200_000.0),
    ("gold", 200_000.0, 350_000.0),
    ("platinum", 350_000.0, 1e12),
]


def price_tier_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi band) join: orders banded into price tiers with
    `lo <= o_totalprice < hi`. The tier table is tiny and broadcast, so
    Catalyst plans BroadcastNestedLoopJoin -- the fact side streams
    without a shuffle; the join itself never materializes more than
    |facts| x |tiers| comparisons map-side."""
    orders = load_table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(PRICE_TIERS, "tier string, lo double, hi double")
    return (
        orders.join(
            F.broadcast(tiers),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("order_count"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: order counts per (year x priority) as columns.
    Explicit pivot values keep the plan single-pass (no extra job to
    discover the domain) and the output schema static."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.select(F.year("o_orderdate").cast("bigint").alias("order_year"), "o_orderpriority")
        .groupBy("order_year")
        .pivot("o_orderpriority", PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    renames = {p: "p" + p.split("-")[0] for p in PRIORITIES}
    cols = [F.col("order_year")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("bigint").alias(renames[p]) for p in PRIORITIES
    ]
    return piv.select(*cols)


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregate surface: EXACT interpolated percentiles
    (median / p90) of order value per priority. Exact `percentile`
    collects the group's values into the aggregation buffer -- correct
    but memory-bound per group at scale; approx_percentile is the
    bounded-memory trade when cross-engine exactness is not required."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.count("*").alias("order_count"),
    )


def repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: INTERSECT / EXCEPT of customer key sets
    from two order-year snapshots (returning buyers vs churned buyers).
    Both set ops are distinct-based -- one shuffle each on the key."""
    orders = load_table(spark, sf_dir, "orders")
    y1996 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y1997 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    both = y1996.intersect(y1997).select(F.lit("retained").alias("cohort"), "o_custkey")
    churned = y1996.subtract(y1997).select(F.lit("churned").alias("cohort"), "o_custkey")
    return (
        both.unionByName(churned)
        .groupBy("cohort")
        .agg(F.count("*").alias("customers"))
    )


def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join + conditional agg: per-nation supplier vs customer
    account balances (set-op flavored union of two dim scans)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    c = cust.groupBy("c_nationkey").agg(
        F.count("*").alias("customers"), F.round(F.sum("c_acctbal"), 2).alias("customer_balance")
    )
    s = supp.groupBy("s_nationkey").agg(
        F.count("*").alias("suppliers"), F.round(F.sum("s_acctbal"), 2).alias("supplier_balance")
    )
    return (
        nation.join(F.broadcast(c), nation.n_nationkey == c.c_nationkey, "left")
        .join(F.broadcast(s), nation.n_nationkey == s.s_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("customers", F.lit(0)).alias("customers"),
            F.coalesce("customer_balance", F.lit(0.0)).alias("customer_balance"),
            F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
            F.coalesce("supplier_balance", F.lit(0.0)).alias("supplier_balance"),
        )
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated scalar subquery, decorrelated: revenue
    from below-average-quantity lineitems of one brand/type. The
    correlated ``l_quantity < 0.2 * (SELECT avg ... WHERE l_partkey =
    p_partkey)`` becomes a per-part window average -- the part filter
    broadcast-semi-joins BEFORE the average, so the fact table is
    scanned ONCE and shuffled once on l_partkey (vs. the textbook
    agg-then-self-join decorrelation, which scans it twice)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_type") == "ECONOMY")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    )
    qty_cap = 0.2 * F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    return (
        li.select("l_quantity", "l_extendedprice", qty_cap.alias("qty_cap"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("qualifying_lineitems"),
        )
    )


def daily_purchase_vs_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: daily purchase volume vs daily error volume,
    keeping days where either side is absent (coalesced to zero). Both
    sides are day-grain aggregates, so the outer join is tiny however
    large the fact table -- aggregate first, join after."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    p = ev.filter(F.col("event_type") == "purchase").groupBy(day).agg(F.count("*").alias("purchases"))
    e = ev.filter(F.col("event_type") == "error").groupBy(day).agg(F.count("*").alias("errors"))
    return p.join(e, "day", "full").select(
        "day",
        F.coalesce("purchases", F.lit(0)).alias("purchases"),
        F.coalesce("errors", F.lit(0)).alias("errors"),
    )


def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (share-of-total): per-nation revenue
    as a fraction of the grand total. The total comes from an
    unpartitioned window over the already-aggregated per-nation rows
    (25 rows), not a second scan of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    total = Window.partitionBy()
    return rev.select(
        "n_name",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(total), 6).alias("revenue_share"),
    )


def order_value_histogram(spark: SparkSession, sf_dir: str, bin_width: float = 50_000.0) -> DataFrame:
    """Fixed-width histogram of order values: bucket id is pure
    per-row arithmetic (no global sort, unlike NTILE-based deciles
    which serialize through one partition), so the whole plan is a
    single partial+final hash agg -- the scale-correct way to get a
    distribution sketch of a 100 TB column."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / bin_width).cast("int")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_value"),
        )
        .select(
            "bucket",
            F.round(F.lit(bin_width) * F.col("bucket"), 2).alias("bucket_lo"),
            "orders",
            "avg_value",
        )
    )
