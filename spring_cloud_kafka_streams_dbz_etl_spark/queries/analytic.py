"""Analytic extension surface: percentiles, moments, conditional/arg
aggregates, array explode, range (interval) join, histogram, grouping sets.

These generalize the reference's aggregation-free pipeline (SURVEY.md §2A
has NO aggregation operators) to the analytics surface any consumer of the
materialized CDC state needs. Numeric policy follows functions/scalars.py:
exact decimal sufficient statistics, identical final double arithmetic on
both engines, so every result is bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import local_rows, table
from ..functions.scalars import dec_sum
from ..functions.vector import safe_div
from ..session import tune
from . import query

_DSUM = "CAST(SUM(CAST({e} AS DECIMAL(18,6))) AS DOUBLE)"
# wide decimal for sums of squares / cross products (values up to ~5e5
# squared ~2.5e11, 60k rows -> ~1.5e16; DECIMAL(38,6) holds 1e32)
_DSUM_W = "CAST(SUM(CAST({e} AS DECIMAL(38,6))) AS DOUBLE)"


@query(
    "q_percentiles",
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type,
       MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN value END) AS p25,
       MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN value END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN value END) AS p90,
       MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS p99
FROM ranked
GROUP BY event_type
""",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (percentile_disc, nearest-rank ceil) per
    group, built from one rank window + conditional max — no interpolation
    arithmetic, so the value returned is an actual data value and the two
    engines agree bit-for-bit (linear-interpolated percentile_cont would
    hinge on float op ordering).

    Scale: one shuffle on the group key; the window and the aggregate share
    it. At 100 TB you'd swap in approx_percentile (t-digest) — the exact
    rank form is the oracle-checkable ground truth.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def disc(p: float, alias: str):
        pos = F.ceil(F.lit(p) * F.col("n")).cast("long")
        return F.max(F.when(F.col("rn") == pos, F.col("value"))).alias(alias)

    return ranked.groupBy("event_type").agg(
        disc(0.25, "p25"), disc(0.50, "p50"), disc(0.90, "p90"), disc(0.99, "p99")
    )


@query(
    "q_stats_moments",
    oracle=f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       {_DSUM.format(e='l_extendedprice')} / COUNT(*) AS mean_price,
       ROUND(sqrt(({_DSUM_W.format(e='l_extendedprice * l_extendedprice')}
             - {_DSUM.format(e='l_extendedprice')} * {_DSUM.format(e='l_extendedprice')} / COUNT(*))
            / (COUNT(*) - 1)), 6) AS stddev_price,
       ROUND((({_DSUM_W.format(e='l_quantity * l_extendedprice')}
         - {_DSUM.format(e='l_quantity')} * {_DSUM.format(e='l_extendedprice')} / COUNT(*)) / COUNT(*))
       / (sqrt(({_DSUM_W.format(e='l_quantity * l_quantity')}
                - {_DSUM.format(e='l_quantity')} * {_DSUM.format(e='l_quantity')} / COUNT(*)) / COUNT(*))
          * sqrt(({_DSUM_W.format(e='l_extendedprice * l_extendedprice')}
                  - {_DSUM.format(e='l_extendedprice')} * {_DSUM.format(e='l_extendedprice')} / COUNT(*)) / COUNT(*))), 9)
       AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (mean / sample stddev / Pearson corr) from
    exact decimal sufficient statistics (n, Σx, Σx², Σxy): the per-row
    double products are IEEE-identical across engines, the decimal sums are
    order-independent exact integers, and the closing formula is the same
    double expression on both sides; stddev/corr get a final ROUND(6/9)
    because the wide-decimal sums (~23 significant digits) round to double
    differently per engine by 1 ulp. Native STDDEV/CORR (order-dependent
    fp accumulation) would not be checkable at all.

    Scale: a single map-side-combinable aggregation — the same one-pass
    sufficient-statistics shape Spark's own Welford-free CentralMomentAgg
    uses internally.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    wide = "decimal(38,6)"
    agg = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast("decimal(18,6)")).cast("double").alias("sx"),
            F.sum(y.cast("decimal(18,6)")).cast("double").alias("sy"),
            F.sum((x * x).cast(wide)).cast("double").alias("sxx"),
            F.sum((y * y).cast(wide)).cast("double").alias("syy"),
            F.sum((x * y).cast(wide)).cast("double").alias("sxy"),
        )
    )
    n = F.col("n")
    sx, sy, sxx, syy, sxy = (F.col(c) for c in ["sx", "sy", "sxx", "syy", "sxy"])
    # safe_div where dirty data can zero the denominator: a single-row
    # group makes n-1 = 0 (sample variance undefined) and a constant
    # series makes sdx*sdy = 0 (corr undefined). ANSI `/` would abort
    # the whole job; DuckDB's x/0 is NULL, and safe_div matches it —
    # bit-identical division wherever the denominator is nonzero.
    var_y = safe_div(syy - sy * sy / n, n - 1)
    cov = (sxy - sx * sy / n) / n
    sdx = F.sqrt((sxx - sx * sx / n) / n)
    sdy = F.sqrt((syy - sy * sy / n) / n)
    return agg.select(
        "l_returnflag",
        n.alias("n"),
        (sy / n).alias("mean_price"),
        F.round(F.sqrt(var_y), 6).alias("stddev_price"),
        F.round(safe_div(cov, sdx * sdy), 9).alias("corr_qty_price"),
    )


@query(
    "q_conditional_agg",
    oracle=f"""
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_clicks,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_errors,
       COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'purchase') AS DOUBLE), 0.0) AS purchase_total,
       max_by(event_type, event_id) AS last_event,
       min_by(event_type, event_id) AS first_event,
       MAX(value) AS max_value
FROM events
GROUP BY user_id
""",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (FILTER-clause) and argument (min_by/max_by) aggregates:
    the per-user cohort rollup a CDC consumer materializes. max_by keyed on
    the unique event_id so arg-extremes are tie-free on both engines.

    Scale: all of these are single-pass map-side-combinable aggregates —
    one shuffle on user_id, no window, no self-join.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    click = F.when(F.col("event_type") == "click", 1)
    err = F.when(F.col("event_type") == "error", 1)
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.groupBy("user_id").agg(
        F.count(click).alias("n_clicks"),
        F.count(err).alias("n_errors"),
        F.coalesce(
            F.sum(purchase_val.cast("decimal(18,6)")).cast("double"), F.lit(0.0)
        ).alias("purchase_total"),
        F.max_by("event_type", "event_id").alias("last_event"),
        F.min_by("event_type", "event_id").alias("first_event"),
        F.max("value").alias("max_value"),
    )


@query(
    "q_explode_array",
    oracle="""
SELECT pos,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_micros,
       MIN(CAST(val AS DOUBLE)) AS min_val,
       MAX(CAST(val AS DOUBLE)) AS max_val
FROM (SELECT unnest(embedding) AS val,
             unnest(range(len(embedding))) AS pos
      FROM embeddings)
GROUP BY pos
""",
)
def q_explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode (posexplode / unnest WITH ORDINALITY): per-dimension
    statistics over the embedding column — the column-profile pass an
    embedding-quality monitor runs. The sum accumulates floor(x*1e6)
    integers: x*1e6 and floor are single exact IEEE ops, so the result is
    deterministic with NO rounding mode in play (a double->DECIMAL cast
    here hit a round-half tie at sf0.1 where Spark's exact-expansion
    HALF_UP and DuckDB's scaled-multiply rounding disagreed by 1e-9).

    Scale: explode multiplies rows ×dim (64 here, often 1024+) — the
    aggregate keeps it map-side-combinable so the shuffle carries only
    dim × n_partitions partial rows, not the exploded data.
    """
    tune(spark)
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("pos", "val")).select(
        "pos", F.col("val").cast("double").alias("val")
    )
    return ex.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("val") * 1000000.0).cast("long")).alias("sum_micros"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


_TIERS = [
    ("bronze", 0.0, 50.0),
    ("silver", 50.0, 150.0),
    ("gold", 150.0, 300.0),
    ("platinum", 300.0, 1000.0),
]


@query(
    "q_range_join",
    oracle=f"""
WITH tiers(tier, lo, hi) AS (VALUES
  ('bronze', 0.0, 50.0), ('silver', 50.0, 150.0),
  ('gold', 150.0, 300.0), ('platinum', 300.0, 1000.0))
SELECT tier,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_DSUM.format(e='value')} AS sum_value
FROM events JOIN tiers ON value >= lo AND value < hi
GROUP BY tier
""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: map each event's value into a non-uniform
    band from an interval dimension — no equi key, pure `lo <= v < hi`.

    Scale: the interval side is tiny and broadcast, so Spark picks
    BroadcastNestedLoopJoin — O(rows × bands) with bands≈4, i.e. a scan;
    that IS the right plan for small interval dims at any fact size (for
    large interval tables you'd bucketize both sides to a uniform grid and
    equi-join on the grid cell first).
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    tiers = F.broadcast(
        # local_rows: Arrow slices instead of 32 driver round-trips for
        # a 4-row tier grid (VERDICT r17 #6)
        local_rows(spark, _TIERS, "tier string, lo double, hi double")
    )
    return (
        ev.join(tiers, (ev.value >= tiers.lo) & (ev.value < tiers.hi))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum(F.col("value"), "sum_value"),
        )
    )


@query(
    "q_histogram",
    oracle=f"""
SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS lo_val,
       MAX(value) AS hi_val,
       {_DSUM.format(e='value')} AS sum_value
FROM events
GROUP BY bucket
""",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: uniform bucketing is a computed equi key
    (`floor(v/width)`), turning a range lookup into a plain groupBy — the
    scale path for binning (one map-side-combinable shuffle, no join at
    all; contrast q_range_join's interval-dimension form).
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.floor(F.col("value") / 50.0).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo_val"),
            F.max("value").alias("hi_val"),
            dec_sum(F.col("value"), "sum_value"),
        )
    )


@query(
    "q_unpivot",
    oracle="""
SELECT c_custkey, metric, val FROM (
  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer)
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide -> long): the inverse of q_pivot, via the native
    DataFrame.unpivot (Expand-based — rows ×K in one pass, no join, no
    shuffle at all; the long format then groups/filters like any fact).
    """
    tune(spark)
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "q_grouping_sets",
    oracle=f"""
SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {_DSUM.format(e='l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (flag-only, status-only, grand total) via the
    SQL surface — distinct from rollup/cube (q_rollup_cube, q_cube): the
    sets are arbitrary, not prefix- or power-set-shaped. Catalyst compiles
    to one Expand + single aggregation (rows ×3, one shuffle).
    """
    tune(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM lineitem_gs
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""
    )


@query(
    "q_outer_join",
    oracle="""
SELECT COALESCE(c.c_custkey, -1) AS custkey,
       c.c_name AS name,
       o.o_orderkey AS orderkey,
       o.o_totalprice AS totalprice,
       c.c_custkey IS NULL AS order_only,
       o.o_orderkey IS NULL AS customer_only
FROM (SELECT * FROM customer WHERE c_custkey % 7 <> 0) c
FULL OUTER JOIN (SELECT * FROM orders WHERE o_orderkey % 3 = 0) o
  ON c.c_custkey = o.o_custkey
""",
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with both-side survivors tagged: customers without
    (sampled) orders and orders whose (sampled) customer is absent — the
    reconciliation shape CDC consumers run between two change feeds.

    Scale: full outer cannot broadcast (both sides must survive) — it is
    the one join shape that always shuffles both inputs; AQE still
    skew-splits it.
    """
    tune(spark)
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 != 0)
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0)
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce(F.col("c_custkey"), F.lit(-1)).alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("c_custkey").isNull().alias("order_only"),
        F.col("o_orderkey").isNull().alias("customer_only"),
    )


@query(
    "q_scalar_subquery",
    oracle="""
SELECT c_custkey, c_name, c_acctbal, c_nationkey
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer i
                   WHERE i.c_nationkey = c.c_nationkey)
""",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above-nation-average customers):
    Catalyst de-correlates it into an aggregate + equi-join — the rewrite
    a naive engine would run as N subqueries. AVG here is a comparison
    threshold (per-row double vs double), not an output value, so native
    fp AVG is safe cross-engine: both engines agg per nation over the
    same ~hundreds of values in deterministic parquet order.

    Scale: one aggregate over the dimension + one broadcastable join —
    the de-correlation IS the scale story.
    """
    tune(spark)
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    return spark.sql(
        """
SELECT c_custkey, c_name, c_acctbal, c_nationkey
FROM customer_sq c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer_sq i
                   WHERE i.c_nationkey = c.c_nationkey)
"""
    )


@query(
    "q_window_ranks",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 9) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
)
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family per key (rank / dense_rank / ntile
    / percent_rank / cume_dist), deterministic via the orderkey tiebreak;
    the fractional ranks are ROUND(9)ed on both sides (they are ratios of
    small ints — identical division, the round only guards repr).
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@query(
    "q_string_funcs",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       replace(p_brand, '#', '-') AS brand_norm,
       levenshtein(p_brand, 'Brand-11') AS brand_dist,
       CAST(strpos(p_name, 'a') AS INT) AS first_a,
       reverse(p_brand) AS brand_rev,
       trim(upper(p_name)) AS name_up
FROM part
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: regexp extraction, padding, translation,
    edit distance (levenshtein — the fuzzy-match primitive record linkage
    needs), position, reverse, case/trim. All JVM built-ins, codegen'd.
    """
    tune(spark)
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_norm"),
        F.levenshtein("p_brand", F.lit("Brand-11")).alias("brand_dist"),
        F.instr("p_name", "a").cast("int").alias("first_a"),
        F.reverse("p_brand").alias("brand_rev"),
        F.trim(F.upper(F.col("p_name"))).alias("name_up"),
    )


@query(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
       CAST(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH - INTERVAL 1 DAY AS DATE) AS month_end,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_cutoff,
       CAST(dayofweek(o_orderdate) AS INT) + 1 AS dow,
       CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(week(o_orderdate) AS INT) AS iso_week
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval surface: month arithmetic, month-end, day diffs,
    day-of-week, quarter, ISO week. Numbering conventions differ between
    engines (DuckDB dayofweek: 0=Sun; Spark: 1=Sun) — normalized
    explicitly in the oracle, as any cross-engine pipeline must.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("date").alias("d"),
        F.add_months(d, 3).alias("plus3m"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date"))
        .cast("int")
        .alias("days_to_cutoff"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.quarter(d).cast("int").alias("q"),
        F.weekofyear(d).cast("int").alias("iso_week"),
    )


@query(
    "q_nullsafe_join",
    oracle="""
WITH e AS (
  SELECT event_id, NULLIF(user_id % 50, 0) AS bucket_key, value FROM events),
d AS (
  SELECT NULLIF(c_custkey % 50, 0) AS bucket_key,
         CAST(COUNT(*) AS BIGINT) AS n_cust
  FROM customer GROUP BY 1)
SELECT e.event_id, e.bucket_key, d.n_cust, e.value
FROM e JOIN d ON e.bucket_key IS NOT DISTINCT FROM d.bucket_key
""",
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — required when the join key is
    itself derived and legitimately nullable (here NULLIF-sentineled
    buckets). Plans as a normal hash join on the null-safe key.
    """
    tune(spark)
    e = table(spark, sf_dir, "events").select(
        "event_id",
        F.nullif(F.col("user_id") % 50, F.lit(0)).alias("bucket_key"),
        "value",
    )
    d = (
        table(spark, sf_dir, "customer")
        .select(F.nullif(F.col("c_custkey") % 50, F.lit(0)).alias("bucket_key"))
        .groupBy("bucket_key")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    return e.join(d, e.bucket_key.eqNullSafe(d.bucket_key)).select(
        "event_id", e.bucket_key.alias("bucket_key"), "n_cust", "value"
    )


@query(
    "q_multiset_ops",
    oracle="""
SELECT 'intersect_all' AS op, k FROM (
  SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'
  INTERSECT ALL
  SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'A')
UNION ALL
SELECT 'except_all' AS op, k FROM (
  SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'
  EXCEPT ALL
  SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'A')
""",
)
def q_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — INTERSECT ALL keeps min(m,n)
    copies, EXCEPT ALL keeps max(m-n,0) — the semantics reconciliation
    between at-least-once feeds needs (plain INTERSECT/EXCEPT would hide
    duplicate-count differences). Catalyst plans both as count-based
    aggregations + generate, one shuffle each.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("k"))
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_partkey").alias("k"))
    return (
        r.intersectAll(a).select(F.lit("intersect_all").alias("op"), "k")
        .unionByName(r.exceptAll(a).select(F.lit("except_all").alias("op"), "k"))
    )


@query(
    "q_time_rollup",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         SUM(CAST(value AS DECIMAL(18,6))) AS dec_total
  FROM events GROUP BY 1, 2)
SELECT 'hour' AS grain, bucket, event_type, n_events,
       CAST(dec_total AS DOUBLE) AS total_value
FROM hourly
UNION ALL
SELECT 'day' AS grain, date_trunc('day', bucket) AS bucket, event_type,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(dec_total) AS DOUBLE) AS total_value
FROM hourly GROUP BY 2, 3
""",
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the DAILY grain is computed
    by RE-AGGREGATING the hourly partials (sums of sums, counts of
    counts), never by rescanning raw events — the invariant that lets a
    materialized hourly rollup serve every coarser grain incrementally.
    Decimal accumulation stays exact through both levels; the double cast
    happens only at the output edge.

    Scale: one shuffle builds the hourly partials (map-side partial agg);
    the daily pass shuffles only |hours|x|types| rows — at 100 TB that
    second stage is ~6 orders of magnitude smaller than the input, which
    is the entire point of the pattern.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("dec_total"),
        )
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("day", "bucket").alias("bucket"), "event_type"
        ).agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("dec_total").alias("dec_total"),
        )
    )
    cols = ["grain", "bucket", "event_type", "n_events", "total_value"]
    return (
        hourly.select(
            F.lit("hour").alias("grain"), "bucket", "event_type", "n_events",
            F.col("dec_total").cast("double").alias("total_value"),
        ).select(cols)
        .unionByName(
            daily.select(
                F.lit("day").alias("grain"), "bucket", "event_type", "n_events",
                F.col("dec_total").cast("double").alias("total_value"),
            ).select(cols)
        )
    )


@query(
    "q_retention_cohorts",
    oracle="""
WITH act AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events
), first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.day) // 7 AS INT) AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY f.cohort_day, date_diff('day', f.cohort_day, a.day) // 7
""",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the standard product-analytics rollup:
    users grouped by their FIRST-activity day (the cohort), activity
    counted at weekly offsets from it. (cohort_day, week_offset) →
    distinct active users; a row per cell of the retention triangle.

    Scale: one groupBy(user) for first-activity (map-side combinable),
    the cohort relation joins back on the user key (shares the same
    shuffle partitioning), and the distinct-count aggregate shuffles
    (cohort, offset) pairs — bounded by days x weeks, not by events.
    At 100 TB the events scan dominates and everything downstream is
    tiny; exactly how a warehouse rollup schedules it."""
    tune(spark)
    act = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    week = F.floor(F.datediff(F.col("day"), F.col("cohort_day")) / 7).cast("int")
    return (
        act.join(first, "user_id")
        .groupBy("cohort_day", week.alias("week_offset"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )


@query(
    "q_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
)
SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
       CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
              + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS INT) AS stage_reached
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON c.user_id = p.user_id
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): each stage's
    timestamp is the user's FIRST qualifying event strictly after the
    previous stage — the sequenced-event analysis every event pipeline
    grows, with out-of-order occurrences correctly NOT counted (a click
    before any view doesn't advance the funnel).

    Scale: three user-keyed aggregates sharing one shuffle partitioning
    (each stage joins the previous stage's per-user row, same key);
    event text/props never leave the scan. The per-stage 'first event
    after X' is an aggregate-after-join, not a window over all events —
    state per user is one timestamp per stage."""
    tune(spark)
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("view_ts")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    stage = (
        F.lit(1)
        + F.when(F.col("click_ts").isNotNull(), 1).otherwise(0)
        + F.when(F.col("purchase_ts").isNotNull(), 1).otherwise(0)
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id", "view_ts", "click_ts", "purchase_ts",
            stage.cast("int").alias("stage_reached"),
        )
    )


GAP_FILL_MAX_USER = 50  # bound the demo grid; the mechanics are per-key


@query(
    "q_gap_fill",
    oracle=f"""
WITH obs AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS hour_value
  FROM events WHERE user_id < {GAP_FILL_MAX_USER}
  GROUP BY user_id, date_trunc('hour', ts)),
bounds AS (
  SELECT user_id, MIN(hour) AS lo, MAX(hour) AS hi FROM obs GROUP BY user_id),
grid AS (
  SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
  FROM bounds)
SELECT g.user_id, g.hour,
       COALESCE(o.n_events, 0) AS n_events,
       COALESCE(o.hour_value, 0.0) AS hour_value,
       o.hour IS NULL AS is_filled,
       LAST_VALUE(o.hour_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value
FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.hour = o.hour
""",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: densify each key's hourly series over
    its own [first, last] range (sequence + explode — generate-only, no
    shuffle to build the grid), LEFT JOIN the observed hourly rollup,
    zero-fill counts, and carry the last observed value forward across
    the gaps (last_value IGNORE NULLS). The operation every
    continuous-aggregate consumer needs before charting/joining —
    missing hours are rows, not absences.

    Scale: grid size is keys x hours (independent of event count);
    the observed rollup is one combinable groupBy; grid and rollup
    co-partition on user_id so the join and the forward-fill window
    share one shuffle. The forward-fill is deterministic because the
    grid's hour column is unique per key."""
    tune(spark)
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < GAP_FILL_MAX_USER)
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum(F.col("value"), "hour_value"),
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    o = obs.select(
        F.col("user_id").alias("o_user_id"),
        F.col("hour").alias("o_hour"),
        "n_events",
        "hour_value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("hour").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(
            o,
            (grid.user_id == o.o_user_id) & (grid.hour == o.o_hour),
            "left",
        )
        .select(
            "user_id",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("hour_value", F.lit(0.0)).alias("hour_value"),
            F.col("o_hour").isNull().alias("is_filled"),
            F.last(F.col("hour_value"), ignorenulls=True).over(w).alias("carried_value"),
        )
    )


ROLLING_DAYS = 90


@query(
    "q_rolling_window",
    oracle=f"""
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC
         RANGE BETWEEN INTERVAL {ROLLING_DAYS} DAYS PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rolling_revenue,
       CAST(COUNT(*) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC
         RANGE BETWEEN INTERVAL {ROLLING_DAYS} DAYS PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS rolling_orders
FROM orders
""",
)
def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-framed rolling aggregates: per customer, revenue and
    order count over a true {ROLLING_DAYS}-day RANGE frame — peers with
    equal order dates share one frame (RANGE, not ROWS, semantics), and
    sparse histories window by TIME, not by row position. Spark has no
    interval literal in rangeBetween, so the frame is declared over
    epoch seconds with the equivalent inclusive bounds — the standard
    portable encoding of a time-range frame.

    Scale: one shuffle on the partition key; the frame is evaluated
    with a sliding accumulator within each sorted partition (no
    per-row rescan). Per-frame sums accumulate in DECIMAL so every
    frame total is order-independent and engine-exact."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-ROLLING_DAYS * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("rolling_revenue"),
        F.count(F.lit(1)).over(w).alias("rolling_orders"),
    )


Z_THRESHOLD = 2.5


@query(
    "q_anomaly_zscore",
    oracle=f"""
WITH stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         {_DSUM.format(e='value')} AS sx,
         {_DSUM_W.format(e='value * value')} AS sxx
  FROM events GROUP BY event_type),
sd AS (
  SELECT event_type, n, sx,
         sqrt(GREATEST((sxx - sx * sx / n) / (n - 1), 0.0)) AS sd
  FROM stats WHERE n > 1)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - s.sx / s.n) / s.sd, 6) AS z
FROM events e JOIN sd s ON e.event_type = s.event_type
WHERE s.sd > 0
  AND abs(ROUND((e.value - s.sx / s.n) / s.sd, 6)) >= {Z_THRESHOLD}
""",
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-relative outlier detection: per-group mean/stddev from
    exact decimal sufficient statistics, broadcast back onto the stream of
    rows, flag |z| >= {Z_THRESHOLD}. The monitoring primitive behind every
    "metric deviated from its baseline" alert (the reference's control
    plane exposes health, not analytics — SURVEY.md §2A; this is the
    §2B analytic extension over the same event stream).

    Scale: the stats side is a map-combinable aggregation producing one
    row per group — broadcast to the fact scan, so the flagging pass is
    map-only (no shuffle of the events themselves). The decision is made
    on ROUND(z, 6): the sufficient statistics are order-independent
    decimals, so the rounded z is engine-exact."""
    tune(spark)
    ev = table(spark, sf_dir, "events")
    v = F.col("value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum((v * v).cast("decimal(38,6)")).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    mean = sx / n
    # clamp the fp variance residual: a (near-)constant group can round to
    # a tiny NEGATIVE residual — Spark sqrt(neg) yields NaN (and NaN >= t
    # is TRUE under Spark's NaN-is-largest), DuckDB sqrt(neg) raises.
    # GREATEST(...,0) + the sd>0 gate give both engines the same answer:
    # constant groups produce no anomalies.
    sd_stats = (
        stats.filter(n > 1)
        .withColumn("sd", F.sqrt(F.greatest((sxx - sx * sx / n) / (n - 1), F.lit(0.0))))
        .filter(F.col("sd") > 0)
    )
    z = F.round((F.col("value") - mean) / F.col("sd"), 6)
    return (
        ev.join(F.broadcast(sd_stats.withColumnRenamed("event_type", "s_type")),
                F.col("event_type") == F.col("s_type"))
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) >= Z_THRESHOLD)
    )


N_BINS = 10
RANK_BUCKETS = 32  # range buckets for the distributed exact rank


@query(
    "q_quantile_bins",
    bench=True,
    oracle=f"""
WITH binned AS (
  SELECT o_orderkey, o_totalprice,
         NTILE({N_BINS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
  FROM orders)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi,
       {_DSUM.format(e='o_totalprice')} AS bin_total
FROM binned GROUP BY bin
""",
)
def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth binning (feature bucketization / histogram equalization):
    every row gets the bin NTILE({N_BINS}) OVER (ORDER BY price, key) would
    assign (ties broken by key, so the assignment is total-order
    deterministic), then per-bin boundaries and mass. The oracle pins the
    exact-NTILE ground truth.

    Scale (VERDICT r05 "What's wrong" #1 — the naive form is a
    single-partition global sort): exact global ranks come from
    ``operators/rank.py::global_rank`` — deterministic approx_percentile
    range buckets, per-bucket row_number on
    ``hashpartitioning(__rank_bucket)``, broadcast cumulative offsets —
    then the exact NTILE formula on (rank, total): the first N mod k
    bins take ceil(N/k) rows, the rest floor(N/k). The only
    single-partition work is the {RANK_BUCKETS}-row offset window; see
    the operator docstring for the skew caveat."""
    tune(spark)
    from ..operators.rank import global_rank

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_rank(
        o,
        ["o_totalprice", "o_orderkey"],
        n_buckets=RANK_BUCKETS,
        rank_col="__r",
        total_col="__total",
    )
    r = F.col("__r")

    # exact NTILE(k) on (rank r, total N): qsz = N div k rows per small
    # bin, the first rem = N mod k bins take qsz+1. CASE is lazy, and the
    # greatest() guard keeps the untaken branch total even when qsz = 0.
    k = F.lit(N_BINS)
    qsz = F.floor(F.col("__total") / k)
    rem = F.col("__total") % k
    big = rem * (qsz + F.lit(1))
    bin_col = (
        F.when(r <= big, F.floor((r - F.lit(1)) / (qsz + F.lit(1))) + F.lit(1))
        .otherwise(rem + F.floor((r - big - F.lit(1)) / F.greatest(qsz, F.lit(1))) + F.lit(1))
        .cast("int")
    )
    return (
        ranked.select("o_totalprice", bin_col.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            dec_sum(F.col("o_totalprice"), "bin_total"),
        )
    )


@query(
    "q_pareto_frontier",
    oracle="""
WITH pts AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_custkey),
xagg AS (
  SELECT n_orders, MAX(revenue) AS max_rev FROM pts GROUP BY n_orders),
xrun AS (
  SELECT n_orders, max_rev,
         MAX(max_rev) OVER (
           ORDER BY n_orders DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_above
  FROM xagg)
SELECT p.o_custkey, p.n_orders, p.revenue
FROM pts p JOIN xrun x ON p.n_orders = x.n_orders
WHERE p.revenue = x.max_rev
  AND (x.best_above IS NULL OR p.revenue > x.best_above)
""",
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier: customers not dominated on
    (order count, revenue) — a point is dominated iff another point is
    >= on both axes and strictly > on one; exact-duplicate points all
    survive. The classic multi-criteria shortlist (best customers, best
    configs, best checkpoints) without weighting the axes.

    Algorithm: collapse to one (x, max_y) row per distinct x (a
    combinable aggregate), run the strictly-greater-x running max over
    that tiny relation, and join back — a point survives iff it holds
    its own x's max y AND beats every strictly-better x's best y. No
    self-join, no quadratic step; the only global window runs over
    |distinct x| rows. At 100 TB the pts aggregate is already ~6 orders
    of magnitude below raw orders, and frontier-over-raw-rows cases
    pre-filter with a coarse grid (each cell keeps a local frontier —
    combinable) before this pass."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    from ..operators.relational import pareto_frontier

    pts = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum(F.col("o_totalprice"), "revenue"),
    )
    return pareto_frontier(pts, "n_orders", "revenue").select(
        "o_custkey", "n_orders", "revenue"
    )


COOC_MIN_SUPPORT = 50


@query(
    "q_cooccurrence",
    bench=True,
    oracle=f"""
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2),
singles AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users FROM ut GROUP BY 1),
total AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events)
SELECT p.type_a, p.type_b, p.support,
       ROUND(CAST(p.support AS DOUBLE) / sa.n_users, 6) AS confidence_a_b,
       ROUND(CAST(p.support AS DOUBLE) * t.n / (sa.n_users * sb.n_users), 6) AS lift
FROM pairs p
JOIN singles sa ON p.type_a = sa.event_type
JOIN singles sb ON p.type_b = sb.event_type
CROSS JOIN total t
WHERE p.support >= {COOC_MIN_SUPPORT}
""",
)
def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence / association mining over user baskets (the
    market-basket primitive): distinct (user, type) pairs self-join on
    user to count pair support, then confidence and lift against the
    per-type user counts. Data-pipeline use: which quality signals /
    event kinds co-fire, feature cross candidates.

    Scale: the distinct projection collapses the fact table to
    |users| x |types| FIRST (combinable distinct), so the self-join
    fans out only k(k-1)/2 pairs per user over a tiny alphabet — with
    k types, pair rows = O(|users| k^2), independent of raw event
    count. Singles and the total are one-row-per-type / one-row
    broadcasts; lift arithmetic is exact-integer inputs to one rounded
    double expression."""
    from . import cache_scoped

    tune(spark)
    ev = table(spark, sf_dir, "events")
    # ut feeds four consumers (both join sides, singles, the total);
    # cache so the fact-table distinct shuffle runs once
    ut = cache_scoped(ev.select("user_id", "event_type").distinct())
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= COOC_MIN_SUPPORT)
    )
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    total = ut.select(F.countDistinct("user_id").alias("n"))
    sa = singles.select(F.col("event_type").alias("sa_type"), F.col("n_users").alias("na"))
    sb = singles.select(F.col("event_type").alias("sb_type"), F.col("n_users").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), F.col("type_a") == F.col("sa_type"))
        .join(F.broadcast(sb), F.col("type_b") == F.col("sb_type"))
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "support",
            F.round(F.col("support").cast("double") / F.col("na"), 6).alias("confidence_a_b"),
            F.round(
                F.col("support").cast("double") * F.col("n") / (F.col("na") * F.col("nb")), 6
            ).alias("lift"),
        )
    )


EWMA_K = 12


@query(
    "q_ewma",
    oracle=f"""
WITH recent AS (
  SELECT user_id,
         CAST(ROUND(value * 1000000) AS BIGINT) AS micros,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS BIGINT) AS rn
  FROM events
  QUALIFY rn <= {EWMA_K})
SELECT user_id,
       CAST(MAX(rn) AS BIGINT) AS n_recent,
       ROUND(CAST(SUM(micros << ({EWMA_K} - rn)) AS DOUBLE)
             / (((1 << MAX(rn)) - 1) * CAST(POW(2, {EWMA_K} - MAX(rn)) AS BIGINT)
                * 1000000.0), 6) AS ewma_value
FROM recent
GROUP BY user_id
""",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted recency score per key (alpha = 1/2 over the
    last {EWMA_K} events): newest event carries weight 2^(k-1), halving
    backwards — the rate/recency feature behind "recent behaviour"
    signals. Deterministic BY CONSTRUCTION: values become integer
    micros, weights are exact powers of two applied as integer
    multiplies (bit shifts on the oracle side — pow(2, k) is exact in
    double and casts to an exact BIGINT), the weighted sum is an exact
    BIGINT (max ~5e8 << 12 x 12 ~ 2.5e13, far
    under 2^53 and bigint range), and the single closing division +
    ROUND(6) runs on identical exact operands in both engines — no
    accumulation-order dependence anywhere.

    Scale: one shuffle on the key shared by the rank window and the
    groupBy; the window keeps only the top-{EWMA_K} rows per key (rank
    filter prunes before aggregation). Normalization divides by the
    realized weight mass (users with fewer than {EWMA_K} events
    normalize over what exists)."""
    tune(spark)
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = (
        ev.select(
            "user_id",
            F.round(F.col("value") * 1000000, 0).cast("long").alias("micros"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= EWMA_K)
    )
    agg = recent.groupBy("user_id").agg(
        F.max("rn").alias("n_recent"),
        F.sum(
            F.col("micros")
            * F.pow(F.lit(2.0), (F.lit(EWMA_K) - F.col("rn")).cast("double")).cast("long")
        ).alias("unnorm"),
    )
    denom = (
        (F.pow(F.lit(2.0), F.col("n_recent").cast("double")).cast("long") - 1)
        * F.pow(F.lit(2.0), (F.lit(EWMA_K) - F.col("n_recent")).cast("double")).cast("long")
        * F.lit(1000000.0)
    )
    return agg.select(
        "user_id",
        "n_recent",
        F.round(F.col("unnorm").cast("double") / denom, 6).alias("ewma_value"),
    )


@query(
    "q_pop_growth",
    oracle="""
WITH monthly AS (
  SELECT n.n_name AS nation, date_trunc('month', o.o_orderdate) AS month,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2)
SELECT nation, month, revenue,
       LAG(revenue) OVER w AS prev_revenue,
       CASE WHEN LAG(revenue) OVER w IS NOT NULL AND LAG(revenue) OVER w <> 0
            THEN ROUND((revenue - LAG(revenue) OVER w) / LAG(revenue) OVER w, 6)
       END AS pct_change
FROM monthly
WINDOW w AS (PARTITION BY nation ORDER BY month ASC)
""",
)
def q_pop_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth — the month-over-month revenue delta per
    nation every BI layer renders: monthly decimal-exact rollup, LAG to
    the prior period, guarded percent change (NULL for the first month
    and zero-revenue predecessors). The rounded ratio divides two
    identical exact-decimal-derived doubles, so the growth figures are
    engine-exact.

    Scale: the star join thins to |nations| x |months| rows BEFORE the
    window (the q_time_rollup invariant — the lag runs over the rollup,
    never the fact table); dims broadcast, one fact shuffle for the
    rollup, one tiny nation-keyed window."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
        )
        .agg(dec_sum(F.col("o_totalprice"), "revenue"))
    )
    w = Window.partitionBy("nation").orderBy(F.col("month").asc())
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "nation",
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(
            prev.isNotNull() & (prev != 0),
            F.round((F.col("revenue") - prev) / prev, 6),
        ).alias("pct_change"),
    )


@query(
    "q_running_distinct",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id),
per_day AS (
  SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM firsts GROUP BY first_day)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (
         ORDER BY day ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS BIGINT) AS cumulative_users
FROM per_day
""",
)
def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users over time — the classic "total uniques"
    growth chart, WITHOUT a per-day distinct-over-history rescan: a
    user contributes to the running distinct exactly on their FIRST
    active day, so cumulative uniques = running sum of first-activity
    counts. Turns an O(days x history) distinct into two combinable
    aggregates plus a window over |days| rows.

    Scale: first-day per user is one key shuffle; the day rollup and
    the running sum operate on |days| rows — at 100 TB the window input
    is ~3 orders of magnitude below even one day of events. All-integer
    arithmetic, determinism structural."""
    tune(spark)
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


PATTERN_WINDOW_US = 30 * 60 * 1_000_000  # view -> purchase within 30 min


@query(
    "q_event_pattern",
    oracle=f"""
SELECT user_id, event_id, purchase_us, view_us
FROM (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) AS purchase_us,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS view_us,
         LAST_VALUE(CASE WHEN event_type = 'error' THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS err_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
WHERE event_type = 'purchase'
  AND view_us IS NOT NULL
  AND purchase_us - view_us <= {PATTERN_WINDOW_US}
  AND (err_us IS NULL OR err_us < view_us)
""",
)
def q_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern detection WITH NEGATION — the CEP /
    MATCH_RECOGNIZE primitive q_funnel's ordered-stages shape can't
    express: every purchase preceded by a view within 30 minutes with NO
    error event in between. The negation ("no intervening C") is what
    separates this from a funnel: it needs the position of the last C
    relative to the last B, not just existence.

    Technique: one event-ordered window per user computes the running
    "last view time" and "last error time" via conditional
    last(..., ignorenulls) over rows-unbounded-preceding-to-1-preceding;
    a purchase matches iff the view is recent enough and the last error
    (if any) predates that view — i.e. no error landed inside the
    matched span. All exact integer microseconds.

    Scale: ONE shuffle on user_id, two conditional running-last columns
    in the same window pass, map-only predicate after — per-key state is
    two timestamps regardless of history length, so the pattern scan
    costs the same as any per-user window. Longer patterns chain more
    conditional lasts in the SAME pass; the streaming twin keeps the two
    timestamps in a state store."""
    tune(spark)
    return event_pattern_matches(table(spark, sf_dir, "events"))


def event_pattern_matches(
    ev: DataFrame, window_us: int = PATTERN_WINDOW_US
) -> DataFrame:
    """The pattern-with-negation plan q_event_pattern serves, as a
    reusable operator over any (user_id, event_id, event_type, ts)
    relation — so the property fuzz
    (test_event_pattern_matches_bruteforce /
    tools/deep_fuzz.py::fuzz_event_pattern) drives the REGISTERED
    conditional-last state columns, not an inline replica that can
    drift from the production plan."""
    # unix_micros needs TIMESTAMP_LTZ; the session is pinned UTC so the
    # NTZ cast is the same instant DuckDB's epoch_us(ts) computes
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("purchase_us"),
        F.last(
            F.when(F.col("event_type") == "view", us), ignorenulls=True
        ).over(w).alias("view_us"),
        F.last(
            F.when(F.col("event_type") == "error", us), ignorenulls=True
        ).over(w).alias("err_us"),
    )
    return marked.filter(
        (F.col("event_type") == "purchase")
        & F.col("view_us").isNotNull()
        & (F.col("purchase_us") - F.col("view_us") <= window_us)
        & (F.col("err_us").isNull() | (F.col("err_us") < F.col("view_us")))
    ).select("user_id", "event_id", "purchase_us", "view_us")


# -- changepoint detection (two-window mean shift) -----------------------------

MS_W = 7  # days on each side of the candidate changepoint


_MEAN_SHIFT_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), g AS (
  SELECT event_type, CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS gmean
  FROM daily GROUP BY 1
), win AS (
  SELECT event_type, day, cnt,
         SUM(cnt) OVER wb AS sum_before, COUNT(*) OVER wb AS n_before,
         SUM(cnt) OVER wa AS sum_after, COUNT(*) OVER wa AS n_after
  FROM daily
  WINDOW wb AS (PARTITION BY event_type ORDER BY day ASC
                ROWS BETWEEN {MS_W} PRECEDING AND 1 PRECEDING),
         wa AS (PARTITION BY event_type ORDER BY day ASC
                ROWS BETWEEN CURRENT ROW AND {MS_W - 1} FOLLOWING)
)
SELECT w.event_type, w.day, w.cnt,
       ROUND(CAST(w.sum_before AS DOUBLE) / {MS_W}, 6) AS before_mean,
       ROUND(CAST(w.sum_after AS DOUBLE) / {MS_W}, 6) AS after_mean,
       ROUND(CAST(w.sum_after - w.sum_before AS DOUBLE) / {MS_W}, 6) AS shift,
       CAST(CASE WHEN ABS(CAST(w.sum_after - w.sum_before AS DOUBLE) / {MS_W})
                      > 0.25 * g.gmean
                 THEN 1 ELSE 0 END AS INT) AS is_change
FROM win w JOIN g ON g.event_type = w.event_type
WHERE w.n_before = {MS_W} AND w.n_after = {MS_W}
"""


@query("q_mean_shift_detect", oracle=_MEAN_SHIFT_ORACLE)
def q_mean_shift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint detection by two-window MEAN SHIFT — the streaming-
    telemetry question "did this metric's level move, and when":
    per (event_type, day), compare the mean of the {MS_W} days before
    against the {MS_W} days from the candidate on (the windowed twin of
    a CUSUM alarm: a sustained level shift maximizes exactly this
    statistic; unlike CUSUM's clamped recursion it is pure window
    algebra, so it stays one shuffle and needs no per-key fold). Flag
    when |shift| exceeds 25% of the type's global daily mean.

    Determinism: daily counts are exact integers; both window sums are
    exact; every division is exact-int / constant; the flag compares
    two doubles derived from identical exact operands in both engines.
    Edge days with incomplete windows are excluded (n_before = n_after
    = {MS_W}), so the row set is fixture-shape-stable.

    Scale: one shuffle builds |types|x|days| daily rows (map-side
    combinable count over the raw events); both windows and the global
    mean run on that tiny relation partitioned by type — at 100 TB the
    window stage is ~6 orders of magnitude below the scan, the
    q_time_rollup continuous-aggregate shape with a detector on top."""
    tune(spark)
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return mean_shift_table(daily)


def mean_shift_table(daily: DataFrame) -> DataFrame:
    """The detector stage of q_mean_shift_detect over a daily rollup
    (event_type, day, cnt) — shared with s_mean_shift_alert, whose
    rollup is maintained incrementally from arriving shards (the
    q_time_rollup partial-merge invariant) rather than scanned."""
    g = daily.groupBy("event_type").agg(
        (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("gmean")
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(-MS_W, -1)
    )
    wa = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(0, MS_W - 1)
    )
    win = daily.select(
        "event_type",
        "day",
        "cnt",
        F.sum("cnt").over(wb).alias("sum_before"),
        F.count(F.lit(1)).over(wb).alias("n_before"),
        F.sum("cnt").over(wa).alias("sum_after"),
        F.count(F.lit(1)).over(wa).alias("n_after"),
    ).filter((F.col("n_before") == MS_W) & (F.col("n_after") == MS_W))
    shift_raw = (F.col("sum_after") - F.col("sum_before")).cast("double") / MS_W
    return win.join(F.broadcast(g), "event_type").select(
        "event_type",
        "day",
        "cnt",
        F.round(F.col("sum_before").cast("double") / MS_W, 6).alias("before_mean"),
        F.round(F.col("sum_after").cast("double") / MS_W, 6).alias("after_mean"),
        F.round(shift_raw, 6).alias("shift"),
        F.when(F.abs(shift_raw) > 0.25 * F.col("gmean"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_change"),
    )


# -- seasonal decomposition (trend / weekday seasonal / residual) --------------

SD_HALF = 3  # centered moving-average half-width (7-day trend window)


@query(
    "q_seasonal_decompose",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), tr AS (
  SELECT event_type, day, cnt,
         SUM(cnt) OVER wc AS tsum, COUNT(*) OVER wc AS tn,
         CAST(dayofweek(day) AS INT) AS dow
  FROM daily
  WINDOW wc AS (PARTITION BY event_type ORDER BY day ASC
                ROWS BETWEEN {SD_HALF} PRECEDING AND {SD_HALF} FOLLOWING)
), trf AS (
  SELECT event_type, day, cnt, dow,
         CAST(tsum AS DOUBLE) / {2 * SD_HALF + 1} AS trend
  FROM tr WHERE tn = {2 * SD_HALF + 1}
), seas AS (
  -- weekday effect: mean detrended deviation per (type, weekday), as
  -- one exact-operand division (SUM of identical doubles is order-
  -- sensitive, so aggregate the EXACT pieces: Σcnt exact int, Σtsum
  -- exact int, then one arithmetic expression)
  SELECT event_type, dow,
         (CAST(SUM(cnt) AS DOUBLE)
          - CAST(SUM(tsum_part) AS DOUBLE) / {2 * SD_HALF + 1})
         / COUNT(*) AS seasonal
  FROM (SELECT event_type, day, cnt, dow,
               CAST(tsum AS BIGINT) AS tsum_part
        FROM tr WHERE tn = {2 * SD_HALF + 1})
  GROUP BY 1, 2
)
SELECT t.event_type, t.day, t.cnt,
       ROUND(t.trend, 6) AS trend,
       ROUND(s.seasonal, 6) AS seasonal,
       ROUND(CAST(t.cnt AS DOUBLE) - t.trend - s.seasonal, 6) AS residual
FROM trf t JOIN seas s ON s.event_type = t.event_type AND s.dow = t.dow
""",
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (STL-lite) of the daily
    event series: trend = {2 * SD_HALF + 1}-day CENTERED moving average
    (full windows only), seasonal = per-weekday mean of the detrended
    deviation, residual = observed − trend − seasonal — the triple a
    data-quality dashboard plots to separate "traffic is growing" from
    "it's just Saturday" from "something broke".

    Determinism: the weekday seasonal aggregates EXACT pieces (Σcnt and
    Σ(window-sum) are exact BIGINTs) and divides once — never a SUM of
    per-row doubles, whose accumulation order differs across engines;
    residual then combines three identically-derived doubles.

    Scale: same shape as q_mean_shift_detect — one combinable shuffle
    to |types|×|days| rows, windows + weekday groupBy on the tiny
    relation; the weekday table joins back broadcast."""
    tune(spark)
    ev = table(spark, sf_dir, "events")
    width = 2 * SD_HALF + 1
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wc = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(-SD_HALF, SD_HALF)
    )
    tr = daily.select(
        "event_type",
        "day",
        "cnt",
        F.sum("cnt").over(wc).alias("tsum"),
        F.count(F.lit(1)).over(wc).alias("tn"),
        F.dayofweek("day").cast("int").alias("dow"),
    ).filter(F.col("tn") == width)
    seas = tr.groupBy("event_type", "dow").agg(
        (
            (
                F.sum("cnt").cast("double")
                - F.sum("tsum").cast("double") / width
            )
            / F.count(F.lit(1))
        ).alias("seasonal")
    )
    trend = F.col("tsum").cast("double") / width
    return tr.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_type",
        "day",
        "cnt",
        F.round(trend, 6).alias("trend"),
        F.round(F.col("seasonal"), 6).alias("seasonal"),
        F.round(F.col("cnt").cast("double") - trend - F.col("seasonal"), 6).alias(
            "residual"
        ),
    )


@query(
    "q_mad_outliers",
    oracle="""
WITH ranked AS (
  SELECT lang, source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang, source) AS n
  FROM documents
), med AS (
  SELECT lang, source, MAX(n) AS n,
         MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                  THEN n_chars END) AS med_chars
  FROM ranked GROUP BY lang, source
), dev AS (
  SELECT d.lang, d.source, d.doc_id,
         ABS(d.n_chars - m.med_chars) AS absdev,
         ROW_NUMBER() OVER (PARTITION BY d.lang, d.source
                            ORDER BY ABS(d.n_chars - m.med_chars), d.doc_id)
             AS rn,
         m.n, m.med_chars
  FROM documents d JOIN med m ON d.lang = m.lang AND d.source = m.source
), mad AS (
  SELECT lang, source, MAX(n) AS n, MAX(med_chars) AS med_chars,
         MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                  THEN absdev END) AS mad_chars
  FROM dev GROUP BY lang, source
)
SELECT v.lang, v.source,
       CAST(MAX(v.n) AS BIGINT) AS n_docs,
       CAST(MAX(v.med_chars) AS BIGINT) AS med_chars,
       CAST(MAX(m.mad_chars) AS BIGINT) AS mad_chars,
       CAST(SUM(CASE WHEN v.absdev > 3 * m.mad_chars THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev v JOIN mad m ON v.lang = m.lang AND v.source = m.source
GROUP BY v.lang, v.source
""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median / MAD (median absolute
    deviation) of document length per (lang, source), flagging docs whose
    deviation exceeds 3x MAD — the length-anomaly screen that survives the
    heavy-tailed corpora where mean/stddev z-scores (q_anomaly_zscore)
    saturate on the outliers themselves. Both medians are DISCRETE
    nearest-rank values over a total integer order (n_chars/absdev, then
    doc_id), so every output column is an integer actually present in the
    data — no interpolation, engine-exact end-to-end.

    Scale: both rank windows and the final rollup share ONE shuffle key
    (lang, source) — Catalyst reuses the exchange, and group cardinality
    (|langs| x |sources|) is planner-sized, never data-sized. At 100 TB
    you'd swap the exact medians for approx_percentile(0.5) sketches
    (combinable, one pass) and keep the identical 3-sigma-equivalent
    gate; the exact rank form here is the oracle-checkable ground truth
    for that sketch, the same pairing q_approx_stats pins.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    grp = ["lang", "source"]
    w = Window.partitionBy(*grp).orderBy("n_chars", "doc_id")
    wn = Window.partitionBy(*grp)
    ranked = d.select(
        *grp, "doc_id", "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = ranked.groupBy(*grp).agg(
        F.max("n").alias("n"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")).cast("long"),
                F.col("n_chars"),
            )
        ).alias("med_chars"),
    )
    dev = d.join(F.broadcast(med), grp).select(
        *grp, "doc_id", "n", "med_chars",
        F.abs(F.col("n_chars") - F.col("med_chars")).alias("absdev"),
    )
    wd = Window.partitionBy(*grp).orderBy("absdev", "doc_id")
    rdev = dev.select(
        *grp, "absdev", "n", "med_chars", F.row_number().over(wd).alias("rn")
    )
    mad = rdev.groupBy(*grp).agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")).cast("long"),
                F.col("absdev"),
            )
        ).alias("mad_chars"),
    )
    return (
        dev.join(F.broadcast(mad), grp)
        .groupBy(*grp)
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.max("med_chars").cast("bigint").alias("med_chars"),
            F.max("mad_chars").cast("bigint").alias("mad_chars"),
            F.sum(
                F.when(F.col("absdev") > 3 * F.col("mad_chars"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )
