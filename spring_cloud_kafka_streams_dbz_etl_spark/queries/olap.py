"""Classic multi-way OLAP join/agg queries (TPC-H Q3/Q5/Q10 shapes).

The reference's analytics surface is stream-shaped, but its enrichment
topology (fact stream joined to keyed dimensions,
EventTransformerStream.java:45-80) is exactly the star-join these classics
exercise in batch form; they are the standard yardstick for whether a
Spark plan survives scale-up (join order, broadcast choice, partial aggs).

Cross-engine policy: monetary aggregates accumulate in DECIMAL(18,6)
(functions.scalars.dec_sum) so sums are order-independent and identical
to the DuckDB oracle; top-N orderings always carry a unique key as the
final tie-break so both engines select the same rows.

Scale notes (100 TB):
- lineitem/orders are fact tables: their join shuffles on the join key
  and AQE picks the partition count; no fan_out (the exchange itself
  redistributes, and filter+projection are pushed below it into the scan).
- nation/region (bounded) are broadcast; customer is left to AQE's
  size-based choice — at sf0.1 it broadcasts, at 100 TB it shuffles,
  same code either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.scalars import dec_sum
from ..session import tune
from . import query

# DuckDB twin of functions/scalars.dec_sum
_DSUM = "CAST(SUM(CAST({e} AS DECIMAL(18,6))) AS DOUBLE)"

_REVENUE = "l_extendedprice * (1 - l_discount)"

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-30"
Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1997-01-01", "1998-01-01"
Q10_FROM, Q10_TO = "1997-07-01", "1997-10-01"


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q_tpch_q3",
    oracle=f"""
SELECT l_orderkey, revenue, o_orderdate, o_orderpriority FROM (
  SELECT l_orderkey,
         {_DSUM.format(e=_REVENUE)} AS revenue,
         o_orderdate, o_orderpriority
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = '{Q3_SEGMENT}'
    AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
    AND l_shipdate  > TIMESTAMP '{Q3_DATE} 00:00:00'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority)
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""",
    bench=True,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): segment-filtered customers x open
    orders x shipped-later lineitems -> revenue per order -> top 10.

    Plan shape to protect at scale: both date filters and the segment
    filter reach the scans (pushdown); customer, reduced to c_custkey by
    the semi-join-like usage, broadcasts under AQE at test scale; the
    orders-lineitem join shuffles on the order key; the final top-10 is
    TakeOrderedAndProject (no global sort).
    """
    tune(spark)
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    ).select("c_custkey")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < Q3_DATE
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > Q3_DATE
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(_revenue(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_q5",
    oracle=f"""
SELECT n_name, {_DSUM.format(e=_REVENUE)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q5_TO} 00:00:00'
GROUP BY n_name
""",
    bench=True,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the 6-way star join — facts
    shuffle on their keys, bounded dims (nation x region, pre-joined and
    region-filtered) broadcast explicitly, supplier joins on BOTH the
    lineitem suppkey and the customer nationkey (the 'local' predicate).

    Join order matters at 100 TB: lineitem->orders first (both facts,
    one shuffle each on the order key), then customer (carries
    c_nationkey), then the supplier equi-join with the nation-match
    condition fused into it, then the broadcast dim reduction last —
    revenue rows never widen beyond the needed columns.
    """
    tune(spark)
    nr = (
        table(spark, sf_dir, "nation")
        .join(
            table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q5_FROM) & (F.col("o_orderdate") < Q5_TO)
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            # no broadcast hint: supplier scales with SF (~1B rows at the
            # 100 TB target) — only the bounded nation x region dim gets an
            # explicit broadcast; AQE still broadcasts supplier at small SF
            # on its size estimate, and demotes it at scale (ADVICE r03).
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dec_sum(_revenue(), "revenue"))
    )


@query(
    "q_tpch_q10",
    oracle=f"""
SELECT c_custkey, c_name, revenue, c_acctbal, n_name, c_mktsegment FROM (
  SELECT c_custkey, c_name,
         {_DSUM.format(e=_REVENUE)} AS revenue,
         c_acctbal, n_name, c_mktsegment
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE o_orderdate >= TIMESTAMP '{Q10_FROM} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{Q10_TO} 00:00:00'
    AND l_returnflag = 'R'
  GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment)
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): one quarter of orders x
    returned lineitems -> revenue lost per customer -> top 20 with the
    customer/nation detail columns carried through the aggregate.

    Scale: the quarter filter + returnflag filter push to the scans and
    shrink the fact join ~50x before any shuffle; detail columns ride the
    customer side (grouped by key, so no second join-back); nation
    broadcasts; top-20 is TakeOrderedAndProject.
    """
    tune(spark)
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q10_FROM) & (F.col("o_orderdate") < Q10_TO)
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey", "c_mktsegment"
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dec_sum(_revenue(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q6_FROM, Q6_TO = "1997-01-01", "1998-01-01"
Q18_QTY = 300


@query(
    "q_tpch_q6",
    oracle=f"""
SELECT {_DSUM.format(e='l_extendedprice * l_discount')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q6_TO} 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    filter-everything-then-one-aggregate scan. All four predicates push
    to the parquet reader and only 3 columns are read — the plan is a
    single map stage feeding a 1-row partial-aggregated sum; at 100 TB
    this query IS the scan-layer benchmark (row-group min/max statistics
    on l_shipdate skip most of the table)."""
    tune(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q6_FROM)
        & (F.col("l_shipdate") < Q6_TO)
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q_tpch_q18",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {_DSUM.format(e='l_quantity')} AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > {Q18_QTY})
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
""",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): an aggregate SEMI-join — the
    qualifying set is itself a grouped HAVING over the fact table, then
    the detail join re-reads only qualifying orders. Plan shape to
    protect at scale: the HAVING aggregate is map-side combinable and
    produces a small key set that LEFT SEMI joins (never materializes a
    row multiplier); the final top-100 is TakeOrderedAndProject.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("__s"))
        .filter(F.col("__s") > Q18_QTY)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "__bk"), li.l_orderkey == F.col("__bk"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dec_sum(F.col("l_quantity"), "total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


Q7_NATION_A, Q7_NATION_B = "NATION_3", "NATION_7"
Q7_FROM, Q7_TO = "1996-01-01", "1998-01-01"


@query(
    "q_tpch_q7",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, {{dsum}} AS revenue FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
      OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
    AND l_shipdate >= TIMESTAMP '{Q7_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q7_TO} 00:00:00')
GROUP BY supp_nation, cust_nation, l_year
""".format(dsum=_DSUM.format(e=_REVENUE)),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between two nations —
    supplier nation x customer nation x ship year, BOTH directions via a
    disjunctive nation-pair predicate.

    Plan shape at scale: the two fact joins (lineitem->orders->customer /
    ->supplier) shuffle on their keys; nation is a 25-row broadcast
    joined TWICE under different aliases; the nation-pair disjunction is
    applied after both nation joins on broadcast-resolved names, so fact
    rows of non-participating nations are dropped before the aggregate
    (at 100 TB one would pre-resolve the 2-key nationkey sets and push
    them into the supplier/customer scans — same result, this plan
    already keeps the disjunction off the fact shuffle)."""
    tune(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q7_FROM) & (F.col("l_shipdate") < Q7_TO)
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B))
        | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("__sn_key"))
        .join(n2, cust.c_nationkey == F.col("__cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(dec_sum(_revenue(), "revenue"))
    )


Q8_REGION = "ASIA"
Q8_TYPE = "STANDARD"
Q8_NATION = "NATION_5"
Q8_FROM, Q8_TO = "1996-01-01", "1998-01-01"


@query(
    "q_tpch_q8",
    oracle=f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}'
                     THEN CAST({_REVENUE} AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST({_REVENUE} AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice, l_discount, n1.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '{Q8_FROM} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{Q8_TO} 00:00:00')
GROUP BY o_year
""",
    bench=True,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the supplier nation's share of
    revenue for one part type sold into one region, per order year — the
    8-way join with a conditional-aggregate ratio on top.

    Scale: part (type-filtered) broadcasts and prunes lineitem FIRST —
    the most selective reduction runs before any fact-fact shuffle;
    nation(x2)/region broadcast; numerator and denominator both
    accumulate as DECIMAL(18,6) and divide once as exact-operand doubles
    (cross-engine deterministic, no per-row float sums)."""
    tune(spark)
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q8_FROM) & (F.col("o_orderdate") < Q8_TO)
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    n2 = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey").alias("__cn_key"))
    )
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")))
    rev = F.col("l_extendedprice").cast("double") * (1 - F.col("l_discount"))
    dec = rev.cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(n2, cust.c_nationkey == F.col("__cn_key"), "left_semi")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("__sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == Q8_NATION, dec).otherwise(F.lit(0).cast("decimal(18,6)"))).cast("double")
                / F.sum(dec).cast("double")
            ).alias("mkt_share")
        )
    )


Q14_FROM, Q14_TO = "1997-03-01", "1997-04-01"


@query(
    "q_tpch_q14",
    oracle=f"""
SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST({_REVENUE} AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST({_REVENUE} AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q14_TO} 00:00:00'
""",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percent of one month's revenue from
    promo-type parts — the canonical conditional-aggregate ratio over a
    broadcast-joined dimension attribute.

    Scale: the month filter pushes to the lineitem scan (row-group
    skipping makes this a ~1/84th scan of the fact); part broadcasts;
    both sums are DECIMAL-exact with ONE final exact-operand double
    division, so the percentage is bit-stable across partitionings.

    The ×100 multiplies the DECIMAL sum (exact) BEFORE the double cast,
    mirroring the oracle's `100.0 * SUM(decimal)`: the old
    `100.0 * double(sum)` rounded twice and diverged from DuckDB in the
    16th digit — found by the r13 sf0.001 full parity sweep (the only
    red row in 241; sf0.01/sf0.1 values never hit a rounding
    boundary)."""
    tune(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q14_FROM) & (F.col("l_shipdate") < Q14_TO)
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    dec = _revenue().cast("decimal(18,6)")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", dec).otherwise(
            F.lit(0).cast("decimal(18,6)")
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                (promo * F.lit(100)).cast("double")
                / F.sum(dec).cast("double")
            ).alias("promo_revenue")
        )
    )


Q19_BRANDS = (("Brand#3", 1, 5, 1, 11), ("Brand#12", 1, 10, 10, 20), ("Brand#21", 1, 15, 20, 30))


def _q19_disjunct_sql() -> str:
    return " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {s_lo} AND {s_hi}"
        f" AND l_quantity BETWEEN {q_lo} AND {q_hi})"
        for b, s_lo, s_hi, q_lo, q_hi in Q19_BRANDS
    )


@query(
    "q_tpch_q19",
    oracle=f"""
SELECT {_DSUM.format(e=_REVENUE)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_q19_disjunct_sql()}
""",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the disjunctive-predicate join —
    three (brand, size-range, quantity-range) alternatives OR'd together
    across the join boundary.

    Scale: the disjunction mixes columns from BOTH sides, so it cannot
    fully push below the join; what CAN push is derived: the union of
    quantity ranges prunes the lineitem scan and the union of
    brand/size alternatives prunes part BEFORE the broadcast join, with
    the exact disjunction re-applied on the joined row — the standard
    derived-predicate decomposition Catalyst can't always infer itself."""
    tune(spark)
    q_lo = min(q for *_, q, _ in Q19_BRANDS)
    q_hi = max(q for *_, q in Q19_BRANDS)
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(q_lo, q_hi)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part_pred = None
    for b, s_lo, s_hi, *_ in Q19_BRANDS:
        p = (F.col("p_brand") == b) & F.col("p_size").between(s_lo, s_hi)
        part_pred = p if part_pred is None else (part_pred | p)
    part = table(spark, sf_dir, "part").filter(part_pred).select(
        "p_partkey", "p_brand", "p_size"
    )
    full = None
    for b, s_lo, s_hi, ql, qh in Q19_BRANDS:
        p = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(ql, qh)
        )
        full = p if full is None else (full | p)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(full)
        .agg(
            dec_sum(_revenue(), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q4_FROM, Q4_TO = "1997-01-01", "1997-07-01"
Q4_LATE_DAYS = 60


@query(
    "q_tpch_q4",
    oracle=f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q4_TO} 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND date_diff('day', o_orderdate, l_shipdate) > {Q4_LATE_DAYS})
GROUP BY o_orderpriority
""",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders in one quarter
    that have AT LEAST ONE late line — an EXISTS decorrelated into a
    LEFT SEMI join whose condition mixes the equi key with a non-equi
    cross-table predicate (ship date more than {Q4_LATE_DAYS} days after
    the order date; the fixture lacks commit/receipt dates, so lateness
    is relative to order date — same plan shape as the spec's clause).

    Scale: the semi join never multiplies rows (an order with 7 late
    lines counts once, no DISTINCT pass); the quarter filter pushes to
    the orders scan; the date comparison evaluates inside the join,
    keyed on the equi component — at 100 TB this is one key shuffle, and
    the priority rollup is a 5-group map-side-combinable aggregate."""
    tune(spark)
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q4_FROM) & (F.col("o_orderdate") < Q4_TO)
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > Q4_LATE_DAYS
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
