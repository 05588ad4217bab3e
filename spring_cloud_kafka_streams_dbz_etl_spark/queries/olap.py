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
