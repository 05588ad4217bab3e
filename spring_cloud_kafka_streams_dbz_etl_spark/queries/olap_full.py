"""TPC-H completion: the 12 queries not already in ``olap.py`` (Q1, Q2,
Q9, Q11, Q12, Q13, Q15, Q16, Q17, Q20, Q21, Q22), closing the full
22-query suite.

Like ``olap.py``, these exercise the reference's star-join enrichment
topology (EventTransformerStream.java:45-80) in batch form at benchmark
scale. The driver fixture omits ``partsupp`` and several spec columns
(l_shipmode, l_commitdate/receiptdate, p_container, c_phone, comments),
so where the spec touches those, the query keeps the SPEC'S PLAN SHAPE
(correlated aggregate, NOT IN, multi-EXISTS, scalar subquery, left-join
count distribution) against an adapted predicate/relation, documented
per query. Q2/Q11/Q16/Q20 derive the part-supplier relation from
``lineitem`` (distinct / aggregated (l_partkey, l_suppkey)) — the same
relation ``partsupp`` materializes in the spec.

Cross-engine policy matches olap.py: monetary aggregates accumulate in
DECIMAL(18,6) (order-independent, exact) and cast to DOUBLE once;
averages and ratios are a single double division of two exact values;
LIMIT queries carry a unique tie-break in ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.scalars import DEC, dec_sum, exact_avg
from ..session import tune
from . import cache_scoped, query

_DSUM = "CAST(SUM(CAST({e} AS DECIMAL(18,6))) AS DOUBLE)"
_DAVG = "CAST(SUM(CAST({e} AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"
_REV = "l_extendedprice * (1 - l_discount)"


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q1 — pricing summary report (exact: every referenced column exists)

Q1_DATE = "1998-09-02"


@query(
    "q_tpch_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_DSUM.format(e='l_quantity')} AS sum_qty,
       {_DSUM.format(e='l_extendedprice')} AS sum_base_price,
       {_DSUM.format(e='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_DSUM.format(e='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_DAVG.format(e='l_quantity')} AS avg_qty,
       {_DAVG.format(e='l_extendedprice')} AS avg_price,
       {_DAVG.format(e='l_discount')} AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_DATE} 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    bench=True,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary): THE scan-aggregate benchmark — one
    pass over the fact table, eight aggregates into ~4 groups. The plan
    to protect at 100 TB: a single WholeStageCodegen map stage computing
    all aggregates in one partial-agg pass (4 groups x 8 states is bytes
    of map-side state), one exchange of those partials, no second scan.
    The shipdate filter and the 7-column projection push to parquet; row
    groups past the date cutoff never leave storage."""
    tune(spark)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= Q1_DATE)
    disc_price = _revenue()
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum(F.col("l_quantity"), "sum_qty"),
        dec_sum(F.col("l_extendedprice"), "sum_base_price"),
        dec_sum(disc_price, "sum_disc_price"),
        dec_sum(charge, "sum_charge"),
        exact_avg(F.col("l_quantity"), "avg_qty"),
        exact_avg(F.col("l_extendedprice"), "avg_price"),
        exact_avg(F.col("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (adapted: the part-supplier relation and its
# cost come from lineitem instead of the absent partsupp)

Q2_REGION = "EUROPE"
Q2_TYPE = "SMALL"
Q2_MAX_SIZE = 10


@query(
    "q_tpch_q2",
    oracle=f"""
WITH supply AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         MIN(CAST(l_extendedprice AS DECIMAL(18,6))) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}')
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(s1.cost AS DOUBLE) AS supply_cost
FROM supply s1 JOIN eu ON s1.sk = s_suppkey
JOIN part ON s1.pk = p_partkey
WHERE p_type = '{Q2_TYPE}' AND p_size <= {Q2_MAX_SIZE}
  AND s1.cost = (
    SELECT MIN(s2.cost) FROM supply s2 JOIN eu e2 ON s2.sk = e2.s_suppkey
    WHERE s2.pk = s1.pk)
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
""",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): a correlated MIN subquery
    — for each qualifying part, the supplier(s) achieving the regional
    minimum cost. The fixture has no partsupp, so the supply relation is
    the aggregated (l_partkey, l_suppkey, MIN(l_extendedprice)) from
    lineitem — the same relation, derived; cost stays DECIMAL until the
    final projection so the min-equality join is exact.

    Plan shape: decorrelate the MIN into a groupBy(partkey) aggregate
    and equi-join it back on (partkey, cost) — two shuffles on partkey
    that AQE coalesces, never a per-row subquery. The 100-supplier
    dimension side broadcasts; LIMIT 100 with a unique (s_name,
    p_partkey) tie-break is TakeOrderedAndProject."""
    tune(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast(DEC)).alias("cost")
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    eu = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    supply_eu = cache_scoped(
        supply.join(F.broadcast(eu), supply.l_suppkey == eu.s_suppkey)
    )
    min_cost = supply_eu.groupBy(F.col("l_partkey").alias("mpk")).agg(
        F.min("cost").alias("min_cost")
    )
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE)
    )
    return (
        supply_eu.join(
            min_cost,
            (F.col("l_partkey") == min_cost.mpk)
            & (F.col("cost") == min_cost.min_cost),
        )
        .drop("mpk")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("cost").cast("double").alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (adapted: supply cost proxied by p_retailprice
# since partsupp/ps_supplycost is absent)

Q9_NAME_FRAGMENT = "red"
Q9_COST_FACTOR = 0.5


@query(
    "q_tpch_q9",
    oracle=f"""
SELECT nation, o_year, {_DSUM.format(e='amount')} AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount)
           - {Q9_COST_FACTOR} * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%{Q9_NAME_FRAGMENT}%')
GROUP BY nation, o_year
""",
    bench=True,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): the heaviest spec join — the
    fact table against four dimensions, profit rolled up by supplier
    nation and order year. ps_supplycost does not exist in the fixture,
    so unit cost is proxied as {Q9_COST_FACTOR} x p_retailprice; the
    join graph and aggregate are the spec's.

    Scale: part is filtered BEFORE the join (name predicate pushes to
    its scan) and joins first so the fact stream thins early; supplier
    (100 rows) and nation (25) broadcast; orders joins on the orderkey
    shuffle that AQE sizes. Per-row profit arithmetic is codegen; the
    (25 nations x years) rollup is map-side combinable to a few hundred
    groups."""
    tune(spark)
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_NAME_FRAGMENT)
    ).select("p_partkey", "p_retailprice")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    supplier = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = _revenue() - F.lit(Q9_COST_FACTOR) * F.col("p_retailprice") * F.col(
        "l_quantity"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dec_sum(F.col("amount"), "sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification (adapted: per-part value from
# lineitem revenue of one nation's suppliers, vs ps_supplycost*ps_availqty)

Q11_NATION = "NATION_5"
Q11_FRACTION = 0.001


@query(
    "q_tpch_q11",
    oracle=f"""
WITH nat_items AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}')
SELECT l_partkey AS partkey, {_DSUM.format(e='l_extendedprice')} AS value
FROM nat_items
GROUP BY l_partkey
HAVING {_DSUM.format(e='l_extendedprice')} > {Q11_FRACTION} * (
  SELECT {_DSUM.format(e='l_extendedprice')} FROM nat_items)
""",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): a grouped aggregate gated by a
    HAVING against a scalar subquery over the SAME relation — per-part
    value vs a fraction of the national total. The fixture lacks
    partsupp, so value is lineitem revenue attributed through the
    nation's suppliers; fraction semantics are the spec's.

    Plan: the nation-filtered item set is computed once and persisted
    (query-scoped), then read twice — once for the per-part rollup, once
    for the 1-row total that broadcasts back as a cross join. At 100 TB
    the persist trades one re-scan for executor memory; both aggregates
    are map-side combinable and the broadcast is one double."""
    tune(spark)
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == Q11_NATION)
    supplier = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat_supp = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    items = cache_scoped(
        li.join(F.broadcast(nat_supp), li.l_suppkey == nat_supp.s_suppkey).select(
            "l_partkey", "l_extendedprice"
        )
    )
    total = items.agg(dec_sum(F.col("l_extendedprice"), "__total"))
    return (
        items.groupBy("l_partkey")
        .agg(dec_sum(F.col("l_extendedprice"), "value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.lit(Q11_FRACTION) * F.col("__total"))
        .select(F.col("l_partkey").alias("partkey"), "value")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-mode priority counts (adapted: no l_shipmode/commit/receipt
# dates; lines bucket into SLOW/FAST by ship lag relative to order date)

Q12_FROM, Q12_TO = "1997-01-01", "1998-01-01"
Q12_SLOW_DAYS = 90
_Q12_HIGH = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


@query(
    "q_tpch_q12",
    oracle=f"""
SELECT speed,
       CAST(SUM(CASE WHEN {_Q12_HIGH} THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN {_Q12_HIGH} THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > {Q12_SLOW_DAYS}
              THEN 'SLOW' ELSE 'FAST' END AS speed,
         o_orderpriority
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= TIMESTAMP '{Q12_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q12_TO} 00:00:00')
GROUP BY speed
""",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes & priority): fact-to-orders join
    with a conditional CASE aggregation splitting order priorities per
    ship-speed class. l_shipmode/l_commitdate/l_receiptdate are absent,
    so the class is derived from ship lag (> {Q12_SLOW_DAYS} days after
    order date = SLOW) — the same join + pivot-style conditional-sum
    plan as the spec.

    Scale: the year filter pushes to the lineitem scan; the join
    shuffles on orderkey; both CASE sums ride one map-side-combinable
    aggregate with a 2-row result."""
    tune(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q12_FROM) & (F.col("l_shipdate") < Q12_TO)
    ).select("l_orderkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    speed = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > Q12_SLOW_DAYS, "SLOW"
    ).otherwise("FAST")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(speed.alias("speed"), "o_orderpriority")
        .groupBy("speed")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (adapted: the comment NOT LIKE
# exclusion becomes an order-priority exclusion)

Q13_EXCLUDE_PRIORITY = "1-URGENT"


@query(
    "q_tpch_q13",
    oracle=f"""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{Q13_EXCLUDE_PRIORITY}'
  GROUP BY c_custkey)
GROUP BY c_count
""",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): LEFT OUTER join with the
    exclusion INSIDE the join condition (customers keep a row — and a
    zero count — even when every order is excluded), then a two-level
    aggregate: orders per customer, customers per order-count. The
    fixture has no o_comment, so the exclusion filters a priority class
    instead; the double-aggregation histogram plan is the spec's.

    Scale: COUNT(o_orderkey) counts only matched rows (nulls skipped) so
    no post-join CASE is needed; first rollup shuffles on custkey, the
    second on the ~30 distinct counts — tiny. The left join itself is
    the only real exchange."""
    tune(spark)
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != Q13_EXCLUDE_PRIORITY),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (exact: revenue view + scalar MAX, all columns exist)

Q15_FROM, Q15_TO = "1997-01-01", "1997-04-01"


@query(
    "q_tpch_q15",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {_DSUM.format(e=_REV)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q15_TO} 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the spec's CREATE VIEW + scalar MAX —
    quarterly revenue per supplier, keep the one(s) achieving the
    maximum. Revenue sums in DECIMAL(18,6) before the double cast, so
    the MAX-equality comparison is exact cross-engine (ties, if any,
    return all maximal suppliers in both engines).

    Plan: the revenue aggregate is computed once and persisted
    (query-scoped), read twice — per-supplier rollup and the 1-row MAX
    that broadcasts into the filter. The supplier dimension broadcasts;
    nothing rescans lineitem."""
    tune(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q15_FROM) & (F.col("l_shipdate") < Q15_TO)
    )
    revenue = cache_scoped(
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            dec_sum(_revenue(), "total_revenue")
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("__best"))
    supplier = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("__best"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship counts (adapted: relation from
# lineitem; the complaints exclusion becomes a negative-balance exclusion)

Q16_EXCLUDE_BRAND = "Brand#2"
Q16_EXCLUDE_TYPE = "ECONOMY"
Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


@query(
    "q_tpch_q16",
    oracle=f"""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) rel
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCLUDE_BRAND}'
  AND p_type <> '{Q16_EXCLUDE_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
""",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): COUNT(DISTINCT
    supplier) per (brand, type, size) over the part-supplier relation,
    minus an excluded supplier set via NOT IN. The relation is the
    DISTINCT (l_partkey, l_suppkey) projection of lineitem (partsupp's
    content, derived); the comment-LIKE complaints exclusion becomes a
    negative-acctbal exclusion — same anti-join + distinct-count plan.

    Scale: NOT IN over a provably non-null key column decorrelates to a
    broadcast LEFT ANTI join (no null-aware fallback); the DISTINCT
    pre-projection shuffles once on the pair and also serves as the
    count-distinct's first phase. Part is filtered before its join."""
    tune(spark)
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCLUDE_BRAND)
        & (F.col("p_type") != Q16_EXCLUDE_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (adapted: brand-only part filter, no
# p_container in the fixture)

Q17_BRAND = "Brand#17"
Q17_QTY_FRACTION = 0.2


@query(
    "q_tpch_q17",
    oracle=f"""
WITH pq AS (
  SELECT l_partkey AS apk, {_DAVG.format(e='l_quantity')} AS avg_qty
  FROM lineitem GROUP BY l_partkey)
SELECT {_DSUM.format(e='l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pq ON apk = l_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND l_quantity < {Q17_QTY_FRACTION} * avg_qty
""",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): a correlated AVG
    subquery — lines whose quantity is under {Q17_QTY_FRACTION} x that
    part's average quantity. The fixture has no p_container, so the part
    filter is brand-only; the decorrelation is the textbook one: the
    per-part AVG becomes a groupBy(partkey) aggregate equi-joined back
    to the fact, never a per-row subquery.

    Scale: the brand filter broadcasts part and thins lineitem FIRST;
    the avg side aggregates the full fact but only (partkey, two
    numbers) survive the shuffle. avg is exact-decimal-sum / count, so
    the threshold comparison is deterministic cross-engine."""
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    pq = li.groupBy(F.col("l_partkey").alias("apk")).agg(
        exact_avg(F.col("l_quantity"), "avg_qty")
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND).select(
        "p_partkey"
    )
    branded = li.select("l_partkey", "l_quantity", "l_extendedprice").join(
        F.broadcast(part), F.col("l_partkey") == part.p_partkey
    )
    return (
        branded.join(pq, F.col("l_partkey") == pq.apk)
        .filter(F.col("l_quantity") < F.lit(Q17_QTY_FRACTION) * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (adapted: "excess stock" becomes a
# dominant share of a part's annual shipped volume, from lineitem)

Q20_NAME_PREFIX = "blue"
Q20_FROM, Q20_TO = "1997-01-01", "1998-01-01"
Q20_SHARE = 0.3
Q20_NATION = "NATION_3"


@query(
    "q_tpch_q20",
    oracle=f"""
WITH ship AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
    AND l_shipdate >= TIMESTAMP '{Q20_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q20_TO} 00:00:00'
  GROUP BY l_suppkey, l_partkey),
tot AS (
  SELECT l_partkey AS tpk, SUM(qty) AS part_qty FROM ship GROUP BY l_partkey)
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (
    SELECT l_suppkey FROM ship JOIN tot ON l_partkey = tpk
    WHERE CAST(qty AS DOUBLE) > {Q20_SHARE} * CAST(part_qty AS DOUBLE))
""",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): nested IN subqueries
    — suppliers in one nation whose shipped volume of a name-filtered
    part family dominates that part's annual volume. ps_availqty is
    absent, so "excess stock" becomes a > {Q20_SHARE} share of the
    part's total shipped quantity — the same two-level aggregate +
    IN-semi-join plan as the spec's availqty comparison.

    Scale: the part-name filter broadcasts into the fact scan; per
    (supplier, part) and per-part totals are two map-side-combinable
    aggregates over the SAME shuffled relation (the second aggregates
    the first's output, no rescan); the qualifying supplier set is tiny
    and the final nation-filtered supplier join is a broadcast semi."""
    tune(spark)
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q20_NAME_PREFIX)
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q20_FROM) & (F.col("l_shipdate") < Q20_TO)
    ).select("l_partkey", "l_suppkey", "l_quantity")
    ship = cache_scoped(
        li.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    tot = ship.groupBy(F.col("l_partkey").alias("tpk")).agg(
        F.sum("qty").alias("part_qty")
    )
    qualifying = (
        ship.join(tot, F.col("l_partkey") == F.col("tpk"))
        .filter(
            F.col("qty").cast("double")
            > F.lit(Q20_SHARE) * F.col("part_qty").cast("double")
        )
        .select("l_suppkey")
    )
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == Q20_NATION)
    supplier = table(spark, sf_dir, "supplier")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(qualifying),
            supplier.s_suppkey == qualifying.l_suppkey,
            "left_semi",
        )
        .select("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted: lateness relative to
# order date, as in Q4, since commit/receipt dates are absent)

Q21_NATION = "NATION_1"
Q21_LATE_DAYS = 60


@query(
    "q_tpch_q21",
    oracle=f"""
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN date_diff('day', o_orderdate, l_shipdate) > {Q21_LATE_DAYS}
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
po AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
  FROM lo GROUP BY l_orderkey)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM po
JOIN supplier ON late_supp = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_supp >= 2 AND n_late = 1 AND n_name = '{Q21_NATION}'
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
""",
    bench=True,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the spec's
    EXISTS + NOT EXISTS pair — a late line in a finished multi-supplier
    order where NO OTHER supplier was late — collapsed into ONE grouped
    aggregate per order: distinct suppliers, distinct late suppliers,
    and (when exactly one) that supplier. n_supp >= 2 is the EXISTS
    (another supplier participated); n_late = 1 is the NOT EXISTS
    (nobody else late). Lateness is ship-vs-order-date as in Q4 (no
    commit/receipt dates in the fixture).

    Scale: both EXISTS clauses ride the SAME orderkey shuffle instead of
    two extra self-joins of the fact table — the classic rewrite that
    turns the spec's four fact-table touches into two. The blamed-
    supplier rollup is a 100-group aggregate; supplier and nation
    broadcast; top-100 with the s_name tie-break is
    TakeOrderedAndProject."""
    tune(spark)
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > Q21_LATE_DAYS
    ).cast("int")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    late_supp = F.when(F.col("is_late") == 1, F.col("l_suppkey"))
    po = lo.groupBy("l_orderkey").agg(
        F.count_distinct(F.col("l_suppkey")).alias("n_supp"),
        F.count_distinct(late_supp).alias("n_late"),
        F.max(late_supp).alias("late_supp"),
    )
    supplier = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == Q21_NATION)
    return (
        po.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supplier), F.col("late_supp") == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (adapted: country grouping by nationkey
# instead of the absent phone prefix)

Q22_NATIONKEYS = (0, 3, 7, 10, 14, 17, 21)
# "no orders" is evaluated against the recent window: the fixture's order
# history covers EVERY customer (the literal NOT-EXISTS-ever is empty at all
# test scales, which would make the oracle check vacuous), so the anti-join
# targets customers with no order since the cutoff — the lapsed-customer
# reading of the spec's clause, with 4 (sf0.001) / ~20 (sf0.01) qualifying
# customers, so the anti join and threshold actually bite.
Q22_RECENT = "2000-01-01"


@query(
    "q_tpch_q22",
    oracle=f"""
WITH avg_bal AS (
  SELECT {_DAVG.format(e='c_acctbal')} AS threshold
  FROM customer
  WHERE c_acctbal > 0.0 AND c_nationkey IN {Q22_NATIONKEYS})
SELECT c_nationkey AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {_DSUM.format(e='c_acctbal')} AS totacctbal
FROM customer, avg_bal
WHERE c_nationkey IN {Q22_NATIONKEYS}
  AND c_acctbal > threshold
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{Q22_RECENT} 00:00:00')
GROUP BY c_nationkey
""",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers in selected
    countries with above-average positive balances and NO RECENT orders
    — a scalar AVG subquery plus a NOT EXISTS anti-join, rolled up per
    country. Two fixture adaptations, both shape-preserving: "country"
    is c_nationkey directly (no c_phone; the spec's substring IS the
    country code), and the NOT EXISTS is bounded to orders since
    {Q22_RECENT} (every fixture customer has SOME order, so the literal
    clause would be vacuously empty — see Q22_RECENT note).

    Scale: the threshold is one broadcast double; NOT EXISTS is a LEFT
    ANTI join against the date-filtered o_custkey projection (filter
    and 1-column pruning push to the orders scan) — at 100 TB the anti
    side shuffles on custkey once; the country rollup is a 7-group
    map-side combine."""
    tune(spark)
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(*Q22_NATIONKEYS)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        exact_avg(F.col("c_acctbal"), "threshold")
    )
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= Q22_RECENT)
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )
