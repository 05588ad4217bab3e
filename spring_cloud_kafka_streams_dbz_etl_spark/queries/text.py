"""Text-analysis surface over `documents` (north-star extensions:
language-ID, quality scoring, token counting, fingerprinting).

No reference counterpart (BASELINE.json north star). All expressions are
JVM built-ins — a single scan, no shuffle, no UDFs — so at 100 TB these run
at parquet-scan speed and parallelize embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fan_out, local_rows, table
from ..functions.textfns import EN_STOPWORDS, en_stopword_count, token_total_len, tokens
from ..operators.curation import LANG_GATE_RATIO, QUALITY_GATE
from ..session import tune
from . import cache_scoped, query, round_half_up6

_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


@query(
    "q_text_stats",
    oracle="""
SELECT doc_id, lang, source,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) AS ttr,
       CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
           / len(string_split(text, ' ')) AS avg_token_len
FROM documents
""",
    bench=True,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: counts, type-token ratio, mean token
    length. Integer sums + one double division keep it engine-exact."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    n_dis = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        n_tok.cast("bigint").alias("n_tokens"),
        n_dis.cast("bigint").alias("n_distinct"),
        (n_dis / n_tok).alias("ttr"),
        (token_total_len(toks).cast("double") / n_tok).alias("avg_token_len"),
    )


@query(
    "q_token_count",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re_tokens,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_actual
FROM documents
""",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    ([a-z]+|[0-9]+ runs) — the standard cheap token-budget estimators."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint").alias("n_ws_tokens"),
        F.expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0))")
        .cast("bigint")
        .alias("n_re_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


@query(
    "q_lang_id",
    oracle=f"""
SELECT * FROM (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL})))
             / len(string_split(text, ' ')) AS en_stop_ratio,
         CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL})))
                   / len(string_split(text, ' ')) >= 0.05
              THEN 'en' ELSE 'und' END AS predicted_lang
  FROM documents)
""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: English function-word ratio (the classic
    n-gram/stopword heuristic). Deterministic int/int ratio -> identical
    threshold decisions across engines."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    ratio = en_stopword_count(toks) / F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        ratio.alias("en_stop_ratio"),
        F.when(ratio >= 0.05, "en").otherwise("und").alias("predicted_lang"),
    )


@query(
    "q_quality_score",
    oracle="""
SELECT * FROM (
  SELECT doc_id,
         0.4 * LEAST(len(string_split(text, ' ')) / 100.0, 1.0)
             + 0.3 * (len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')))
             + 0.3 * LEAST((CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
                            / len(string_split(text, ' '))) / 8.0, 1.0) AS quality_score
  FROM documents) q
""",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: length saturation + lexical diversity +
    mean-token-length saturation (the usual cheap pre-training filters)."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tok
    avg_len = token_total_len(toks).cast("double") / n_tok
    score = (
        0.4 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + 0.3 * ttr
        + 0.3 * F.least(avg_len / 8.0, F.lit(1.0))
    )
    return d.select("doc_id", score.alias("quality_score"))


@query(
    "q_fingerprint",
    oracle="""
SELECT doc_id,
       md5(text) AS fp_exact,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp_bow,
       substr(md5(text), 1, 8) AS fp_band
FROM documents
""",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact digest, order-insensitive bag-of-words
    digest (sorted distinct tokens), and an 8-hex-char band for cheap
    bucketing — the building blocks of exact/near dedup at scale."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    bow = F.array_join(F.array_sort(F.array_distinct(tokens(F.col("text")))), " ")
    return d.select(
        "doc_id",
        F.md5("text").alias("fp_exact"),
        F.md5(bow).alias("fp_bow"),
        F.substring(F.md5("text"), 1, 8).alias("fp_band"),
    )


@query(
    "q_top_terms",
    oracle="""
SELECT lang, term, n, rank FROM (
  SELECT lang, term,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY COUNT(*) DESC, term ASC) AS INT) AS rank
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY lang, term)
WHERE rank <= 5
""",
)
def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary analysis: top-5 terms per language by raw
    frequency — explode + one grouped count + a tiny per-group rank
    window (two shuffles total, both on small keys)."""
    from pyspark.sql import Window

    tune(spark)
    d = table(spark, sf_dir, "documents")
    ex = d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("term"))
    counts = ex.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("lang", "term", "n", "rank")
    )


@query(
    "q_tfidf",
    oracle="""
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS c FROM ex GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, COUNT(*) AS total FROM ex GROUP BY doc_id
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS n_docs FROM ex GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_total FROM documents
)
SELECT doc_id, term, tfidf, rank FROM (
  SELECT tf.doc_id, tf.term,
         ROUND((tf.c / dl.total) * LN(n.n_total / df.n_docs), 6) AS tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
              ORDER BY ROUND((tf.c / dl.total) * LN(n.n_total / df.n_docs), 6) DESC,
                       tf.term ASC) AS INT) AS rank
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.term = df.term
  CROSS JOIN n)
WHERE rank <= 3
""",
    bench=True,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF scoring: term frequency x inverse document frequency, top-3
    terms per document. Counts are exact integers; only LN is
    transcendental, so scores are rounded to 6 decimals before the
    ranking decision (tie-break on term).

    Scale shape (VERDICT r01 fix): document length is a WINDOW sum over
    the (doc_id, term) counts — it shares the doc_id partitioning with the
    final rank window, so no per-document relation is ever joined (the old
    broadcast of one-row-per-document would OOM at billions of docs).
    Document frequency comes from `tf` (one row per (doc,term), so
    COUNT(*) per term == docs containing the term); `tf` recomputes per
    consumer — the r17 cache A/B showed the columnar cache write of the
    corpus-sized counts relation costs more than the second
    explode+count pass. The corpus size is a 1-row aggregate folded in
    as a broadcast cross join (no separate count() action). Only
    small-at-any-scale relations are broadcast: the 1-row count and the
    per-term vocab aggregate."""
    from pyspark.sql import Window

    tune(spark)
    d = table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n_total"))
    ex = fan_out(d, spark).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    # tf is NOT cached (r17): recomputing the explode+count for the
    # per-term consumer beats the columnar cache write of a corpus-sized
    # counts relation — measured 1.71 s (cached) vs 1.33 s
    # warm-alternating medians at sf0.1 on q_tfidf; see
    # _unigram_nll_scores for the rule.
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("n_docs"))
    total = F.sum("c").over(Window.partitionBy("doc_id"))
    score = F.round(
        (F.col("c") / F.col("total")) * F.log(F.col("n_total") / F.col("n_docs")), 6
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        tf.withColumn("total", total)
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", score)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


@query(
    "q_bm25",
    oracle="""
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS c FROM ex GROUP BY doc_id, term
), tfdl AS (
  SELECT doc_id, term, c, SUM(c) OVER (PARTITION BY doc_id) AS dl FROM tf
), df AS (
  SELECT term, COUNT(*) AS n_docs FROM tf GROUP BY term
), g AS (
  SELECT COUNT(*) AS n_total,
         SUM(len(string_split(text, ' '))) AS total_len
  FROM documents
)
SELECT doc_id, term, score, rank FROM (
  SELECT t.doc_id, t.term,
         ROUND(LN((g.n_total - df.n_docs + 0.5) / (df.n_docs + 0.5) + 1.0)
               * (t.c * 2.2)
               / (t.c + 1.2 * (0.25 + 0.75 * t.dl / (CAST(g.total_len AS DOUBLE) / g.n_total))),
               6) AS score,
         CAST(ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY
              ROUND(LN((g.n_total - df.n_docs + 0.5) / (df.n_docs + 0.5) + 1.0)
                    * (t.c * 2.2)
                    / (t.c + 1.2 * (0.25 + 0.75 * t.dl / (CAST(g.total_len AS DOUBLE) / g.n_total))),
                    6) DESC, t.term ASC) AS INT) AS rank
  FROM tfdl t JOIN df ON t.term = df.term CROSS JOIN g)
WHERE rank <= 3
""",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance scoring (k1=1.2, b=0.75): the IDF-saturated
    upgrade of TF-IDF every retrieval/curation stack reaches for. Inputs
    are exact integer counts; LN is the only transcendental, so scores
    round to 6 decimals before the per-document top-3 ranking (term
    tie-break), keeping both engines' decisions identical.

    Scale shape == the fixed q_tfidf: document length is a window sum over
    the (doc,term) counts (no per-document relation is built, let alone
    broadcast); corpus totals (N, avgdl) are a 1-row broadcast cross join;
    only the per-term vocab aggregate is broadcast."""
    from pyspark.sql import Window

    tune(spark)
    k1, b = 1.2, 0.75
    d = table(spark, sf_dir, "documents")
    g = d.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("total_len"),
    )
    ex = fan_out(d, spark).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    # tf is NOT cached (r18, the swap q_tfidf's r17 cache A/B deferred
    # for window-budget reasons): recomputing the explode+count for the
    # per-term consumer beats the columnar cache write of a corpus-sized
    # counts relation — measured 1.71 s (cached) vs 1.33 s on the
    # identical q_tfidf pipeline; see _unigram_nll_scores for the rule.
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("n_docs"))
    dl = F.sum("c").over(Window.partitionBy("doc_id"))
    avgdl = F.col("total_len").cast("double") / F.col("n_total")
    idf = F.log((F.col("n_total") - F.col("n_docs") + 0.5) / (F.col("n_docs") + 0.5) + 1.0)
    score = F.round(
        idf * (F.col("c") * (k1 + 1.0))
        / (F.col("c") + k1 * (1.0 - b + b * F.col("dl") / avgdl)),
        6,
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        tf.withColumn("dl", dl)
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(g))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "score", "rank")
    )


@query(
    "q_char_entropy",
    oracle="""
SELECT doc_id, n_chars_actual, n_distinct_chars,
       -- + 0.0 normalizes IEEE -0.0 (a uniform doc's -1*ln(1) sum) to
       -- +0.0 on both engines; an EMPTY doc stays NULL (list_sum([]) is
       -- NULL here, matched by the n>0 gate Spark-side) — entropy of
       -- nothing is undefined, not zero
       ROUND(-list_sum(list_transform(counts,
              c -> (c / CAST(n_chars_actual AS DOUBLE))
                   * LN(c / CAST(n_chars_actual AS DOUBLE)))), 6) + 0.0 AS entropy_nats
FROM (
  SELECT doc_id,
         CAST(len(chars) AS BIGINT) AS n_chars_actual,
         CAST(len(list_distinct(chars)) AS BIGINT) AS n_distinct_chars,
         list_transform(list_sort(list_distinct(chars)),
                        x -> len(list_filter(chars, y -> y = x))) AS counts
  FROM (SELECT doc_id, list_filter(string_split(text, ''), c -> c <> '') AS chars
        FROM documents))
""",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy (nats) per document — the classic
    gibberish/binary-noise quality gate (low entropy = repeated chars,
    high = random bytes). Computed entirely with array expressions so it
    is map-only AND deterministic: char counts come from the SORTED
    distinct-char array and the entropy sum reduces over that array in a
    fixed left-to-right order on both engines (a groupBy SUM of doubles
    would be shuffle-order-dependent and could differ in the last ulp).

    Scale: no shuffle, no UDF; O(|alphabet| * doc_len) per document with
    |alphabet| small by definition."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != "")
    base = d.select("doc_id", chars.alias("chars"))
    counts = F.transform(
        F.array_sort(F.array_distinct(F.col("chars"))),
        lambda x: F.size(F.filter(F.col("chars"), lambda y: y == x)),
    )
    n = F.size(F.col("chars")).cast("bigint")
    with_counts = base.select(
        "doc_id",
        n.alias("n_chars_actual"),
        F.size(F.array_distinct(F.col("chars"))).cast("bigint").alias("n_distinct_chars"),
        counts.alias("counts"),
    )
    p = lambda c: c / F.col("n_chars_actual").cast("double")  # noqa: E731
    ent = -F.aggregate(
        F.col("counts"),
        F.lit(0.0),
        lambda acc, c: acc + p(c) * F.log(p(c)),
    )
    return with_counts.select(
        "doc_id",
        "n_chars_actual",
        "n_distinct_chars",
        # n > 0 gate: empty doc -> NULL (DuckDB's list_sum([])); + 0.0
        # normalizes the uniform doc's -0.0 — dirty-data parity in
        # tests/test_dirty_data.py
        F.when(F.col("n_chars_actual") > 0, F.round(ent, 6) + F.lit(0.0)).alias(
            "entropy_nats"
        ),
    )


@query(
    "q_repetition",
    oracle="""
SELECT doc_id, n_bigrams, dup_bigram_ratio, top_bigram_frac FROM (
  SELECT doc_id,
         CAST(len(g) AS BIGINT) AS n_bigrams,
         1.0 - len(list_distinct(g)) / CAST(len(g) AS DOUBLE) AS dup_bigram_ratio,
         list_max(list_transform(list_distinct(g),
                  x -> len(list_filter(g, y -> y = x)))) / CAST(len(g) AS DOUBLE)
             AS top_bigram_frac
  FROM (SELECT doc_id,
               list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i+1]) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        WHERE len(toks) >= 2))
""",
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-bigram ratio and
    most-frequent-bigram fraction — high values flag boilerplate/spam
    (nav bars, keyword stuffing) that per-token stats miss. All-integer
    counts, two divisions per row.

    Scale: map-only array expressions, no shuffle (exploding bigrams
    through a groupBy would shuffle the whole corpus for a per-doc
    statistic). The top-bigram count is array_sort + a single run-length
    scan — O(n log n) per document (VERDICT r02 replaced the earlier
    O(distinct²) filter-per-distinct-gram, which concentrated 10¹⁰
    comparisons in one row for a 10⁵-distinct-bigram pathological doc).
    The oracle keeps the quadratic spelling as the readable spec; on a
    sorted array max run length == max frequency, so the two agree."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    gram = F.transform(
        F.sequence(F.lit(0), F.size(F.col("toks")) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("toks"), i + 1), F.element_at(F.col("toks"), i + 2)
        ),
    )
    g = base.select("doc_id", gram.alias("g"))
    n = F.size(F.col("g")).cast("double")
    # Run-length scan over the sorted gram array: acc = (prev, current run,
    # best run). Initial prev="" is safe — the equality branch still yields
    # run 0+1=1 for a genuine empty-string first gram.
    top = F.aggregate(
        F.array_sort(F.col("g")),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("int").alias("run"),
            F.lit(0).cast("int").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return g.select(
        "doc_id",
        F.size(F.col("g")).cast("bigint").alias("n_bigrams"),
        (F.lit(1.0) - F.size(F.array_distinct(F.col("g"))) / n).alias("dup_bigram_ratio"),
        (top / n).alias("top_bigram_frac"),
    )


@query(
    "q_pmi_bigrams",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), uni AS (
  SELECT term, COUNT(*) AS c_u
  FROM (SELECT unnest(t) AS term FROM toks WHERE len(t) >= 2) GROUP BY term
), bi AS (
  SELECT term_a, term_b, COUNT(*) AS c_ab
  FROM (SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS term_a,
               unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS term_b
        FROM toks WHERE len(t) >= 2)
  GROUP BY term_a, term_b
), g AS (
  SELECT SUM(len(t)) AS n_uni, SUM(len(t) - 1) AS n_bi FROM toks WHERE len(t) >= 2
)
SELECT term_a, term_b, c_ab, pmi FROM (
  SELECT term_a, term_b, c_ab,
         ROUND(LN((c_ab / CAST(g.n_bi AS DOUBLE))
               / ((ua.c_u / CAST(g.n_uni AS DOUBLE)) * (ub.c_u / CAST(g.n_uni AS DOUBLE)))), 6) AS pmi
  FROM bi JOIN uni ua ON bi.term_a = ua.term
          JOIN uni ub ON bi.term_b = ub.term
          CROSS JOIN g
  WHERE c_ab >= 5)
ORDER BY pmi DESC, term_a ASC, term_b ASC
LIMIT 20
""",
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information over adjacent token
    pairs, top-20 (min count 5). PMI = ln(P(ab) / (P(a)P(b))) from exact
    integer counts; round-6 before the fully tie-broken global ordering.

    Scale: one explode->groupBy for bigrams, one for unigrams; the unigram
    side joins back as a broadcast (vocab-sized — same assumption as the
    TF-IDF family); the final top-20 is TakeOrderedAndProject, no global
    sort. NOTE the unigram totals deliberately count only docs with >= 2
    tokens so P(a), P(b) and P(ab) come from the same population."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = cache_scoped(
        fan_out(d.select("doc_id", toks.alias("t")), spark).filter(F.size("t") >= 2)
    )
    g = base.agg(
        F.sum(F.size("t")).alias("n_uni"),
        F.sum(F.size("t") - 1).alias("n_bi"),
    )
    uni = (
        base.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_u"))
    )
    pair = F.transform(
        F.sequence(F.lit(0), F.size(F.col("t")) - 2),
        lambda i: F.struct(
            F.element_at(F.col("t"), i + 1).alias("term_a"),
            F.element_at(F.col("t"), i + 2).alias("term_b"),
        ),
    )
    bi = (
        base.select(F.explode(pair).alias("p"))
        .select("p.term_a", "p.term_b")
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    ua = uni.select(F.col("term").alias("term_a"), F.col("c_u").alias("c_a"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("c_u").alias("c_b"))
    n_uni = F.col("n_uni").cast("double")
    pmi = F.round(
        F.log(
            (F.col("c_ab") / F.col("n_bi").cast("double"))
            / ((F.col("c_a") / n_uni) * (F.col("c_b") / n_uni))
        ),
        6,
    )
    return (
        bi.join(F.broadcast(ua), "term_a")
        .join(F.broadcast(ub), "term_b")
        .crossJoin(F.broadcast(g))
        .select("term_a", "term_b", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("term_a").asc(), F.col("term_b").asc())
        .limit(20)
    )


@query(
    "q_winnow_fingerprint",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (SELECT doc_id,
              unnest(list_transform(range(1, len(toks) - 1),
                     i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS h,
              unnest(range(1, len(toks) - 1)) AS idx,
              len(toks) - 2 AS n_grams
       FROM t WHERE len(toks) >= 3),
wm AS (SELECT doc_id, idx, n_grams,
              MIN(h) OVER (PARTITION BY doc_id ORDER BY idx
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
       FROM sh),
fp AS (SELECT DISTINCT doc_id, wmin FROM wm WHERE idx <= n_grams - 3)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_fps,
       md5(string_agg(wmin, '' ORDER BY wmin)) AS fp_digest
FROM fp GROUP BY doc_id
""",
)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints, MOSS-style: hash every
    3-gram, slide a window of 4 gram-hashes, keep each window's minimum —
    the selected minima are the document's fingerprints (guaranteed to
    catch any shared substring of >= 6 tokens between documents). Digest =
    md5 over the sorted distinct minima.

    Scale: one explode + one partition-local window + one groupBy — all on
    a single doc_id shuffle; fingerprints are 32-byte strings, so the
    matching join downstream never touches document text.
    """
    from ..operators.dedup import winnow_fingerprints

    tune(spark)
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 3)
    fp = winnow_fingerprints(base, "doc_id", "toks", n=3, window=4)
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list("wmin")))).alias(
            "fp_digest"
        ),
    )



# Shared oracle SQL for the flagship curation pipeline stages (used by
# q_curation_pipeline and q_curation_near_dup — one copy, so the quality
# weights / thresholds / split seed can never drift between the two).
_CURATION_STAGES_SQL = f"""scored AS (
  SELECT doc_id, text,
         len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL})))
             / len(string_split(text, ' ')) AS en_ratio,
         0.4 * LEAST(len(string_split(text, ' ')) / 100.0, 1.0)
             + 0.3 * (len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')))
             + 0.3 * LEAST((CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
                            / len(string_split(text, ' '))) / 8.0, 1.0) AS quality
  FROM documents),
kept AS (
  SELECT doc_id, text, quality FROM scored
  WHERE en_ratio >= {LANG_GATE_RATIO} AND quality >= {QUALITY_GATE}),
deduped AS (
  SELECT MIN(doc_id) AS doc_id, ANY_VALUE(quality) AS quality
  FROM kept GROUP BY md5(text))"""

_CURATION_SPLIT_TAIL_SQL = """SELECT doc_id, quality,
       CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, quality,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split-seed-42'), 1, 8)) AS BIGINT) % 100 AS INT) AS bucket
      FROM {src})"""

@query(
    "q_curation_pipeline",
    oracle="WITH " + _CURATION_STAGES_SQL + "\n"
    + _CURATION_SPLIT_TAIL_SQL.format(src="deduped"),
    bench=True,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data curation pass (the engine's north-star
    job, composed from its own operators): language-ID gate (English
    stopword ratio) -> quality-score gate -> exact dedup (content-hash
    keep-first) -> deterministic train/val/test assignment. Every stage is
    built-in expressions; the only shuffle in the whole pipeline is the
    dedup groupBy on the 16-byte digest.

    ANY_VALUE(quality) is deterministic here BECAUSE identical text
    implies identical score (the grouped value is functionally dependent
    on the group key).
    """
    from ..operators.curation import quality_score

    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    toks = tokens(F.col("text"))
    en_ratio = en_stopword_count(toks) / F.size(toks)
    kept = (
        d.select(
            "doc_id",
            "text",
            en_ratio.alias("en_ratio"),
            quality_score(F.col("text")).alias("quality"),
        )
        .filter(
            (F.col("en_ratio") >= LANG_GATE_RATIO)
            & (F.col("quality") >= QUALITY_GATE)
        )
    )
    deduped = (
        kept.groupBy(F.md5("text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"), F.first("quality").alias("quality"))
        .drop("__h")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split-seed-42"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    ).cast("int")
    return deduped.select(
        "doc_id",
        "quality",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test").alias("split"),
    )




def _unigram_nll_scores(spark, sf_dir):
    """Per-doc (doc_id, n_tokens agg-ready tok relation, avg surprisal
    inputs) for the unigram-LM scorers: corpus MLE p(w), per-token
    -ln p rounded to 6 decimals and carried as EXACT integer MICROS
    (``nll_mu`` = round6(-ln p) x 1e6, a LONG) so per-doc sums are exact
    and order-independent (the cross-engine float policy — see
    q_unigram_nll's docstring for the accepted libm-ulp residual).
    Shared by q_unigram_nll and q_perplexity_filter so the determinism
    machinery exists in exactly one place.

    Why micros, not DECIMAL(18,6) (r17 optimization): SUM over a
    DECIMAL(18,6) column widens its buffer to precision 28, off Spark's
    long-backed Decimal fast path — every add is a BigDecimal op.
    round6(x) is by construction an exact multiple of 1e-6, so
    round(round6(x) * 1e6) recovers the integer numerator EXACTLY (the
    product sits within ~1e-9 of the integer, far inside the 0.5
    half-up window) and SUM(long) is the same exact integer arithmetic
    on the codegen fast path — measured 20.9 -> 17.7 s summed task time
    on the unigram pipeline at sf0.1. Consumers reconstruct the double
    as (SUM(nll_mu) as double) / 1e6, which equals the old
    (SUM(decimal) as double) bit-for-bit: SUM(nll_mu) < 2^53 (per-doc
    sums; a doc would need ~2e8 tokens to overflow that), so both are
    the correctly-rounded double of the same rational S/1e6 — verified
    bit-identical over all sf0.1 docs before the swap."""
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    # tok is deliberately NOT cached (r17): persisting an exploded
    # corpus-sized token stream pays a columnar cache write that costs
    # more than recomputing the split+explode for the second consumer —
    # measured 1.40 s (cached) vs 0.97 s (recompute) warm-alternating
    # medians at sf0.1. The same holds at 100 TB, where an exploded
    # token cache would be larger than the source and disk-backed;
    # scan-recompute is the standard form. Caching stays correct where
    # the lineage is genuinely expensive per row (winnow md5, Python
    # kernels — see q_containment / q_simhash_near_dup).
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    uni = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.sum("c").alias("n"))
    nll_mu = F.round(
        F.round(
            -F.log(F.col("c").cast("double") / F.col("n").cast("double")), 6
        )
        * F.lit(1000000.0)
    ).cast("long")
    return (
        tok.join(F.broadcast(uni), "term")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", nll_mu.alias("nll_mu"))
    )


@query(
    "q_unigram_nll",
    bench=True,
    oracle="""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
), uni AS (
  SELECT term, COUNT(*) AS c FROM tok GROUP BY term
), tot AS (
  SELECT SUM(c) AS n FROM uni
), per AS (
  SELECT t.doc_id,
         CAST(round(-ln(CAST(u.c AS DOUBLE) / CAST(tot.n AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS nll
  FROM tok t JOIN uni u USING (term) CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_nll
FROM per GROUP BY doc_id
""",
)
def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: corpus MLE p(w) = c_w/N, then
    each document's mean negative log-likelihood (avg surprisal — exp of it
    is perplexity). The CCNet/KenLM-style fluency signal: word-salad and
    boilerplate score high, typical prose scores low.

    Determinism: per-token -ln p is rounded to 6 decimals and summed as
    exact integer micros (see _unigram_nll_scores — LONG sum, the same
    exact order-independent arithmetic the DECIMAL(18,6) form gave,
    minus the BigDecimal per-row cost), so the per-doc sum is EXACT and
    order-independent — float summation order across engines/
    partitionings can never flip the hash (the engine's cross-engine
    float policy; see q_tfidf). Residual risk (accepted): ln itself is
    libm (JVM Math.log vs DuckDB's C log), so a count whose -ln(c/N)
    lands within 1 ulp of a 0.5e-6 rounding boundary could round
    differently across engines — probability ~1e-10 per distinct count
    value, checked green at sf0.01 and sf0.1.

    Scale: one explode -> vocab groupBy (map-side combinable), the
    vocab-sized count relation broadcasts back onto the token stream, N is
    a 1-row broadcast cross join; then one groupBy on doc_id. Two
    shuffles total, none carrying document text.
    """
    tune(spark)
    per = _unigram_nll_scores(spark, sf_dir)
    return per.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (
            (F.sum("nll_mu").cast("double") / F.lit(1000000.0))
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_nll"),
    )


# GPT-2-style pretokenizer pattern, restricted to constructs whose
# semantics are identical in Java regex (Spark) and RE2 (DuckDB):
# letter runs, digit runs, and single non-alphanumeric-non-space chars.
_BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@query(
    "q_bpe_tokens",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT) AS n_alpha_runs,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
       CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS BIGINT) AS n_other,
       CAST(list_sum(list_append(list_transform(regexp_extract_all(text, '[a-zA-Z]+'),
                                 t -> length(t)), 0)) AS BIGINT) AS alpha_chars
FROM documents
""",
)
def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (the prompt-budget estimator a training
    pipeline runs before the real tokenizer): a GPT-2-pretokenizer-shaped
    pattern splits text into letter runs / digit runs / punctuation, giving
    a token count that tracks BPE counts far better than whitespace
    splitting (which q_token_count provides). Pattern constrained to the
    Java-regex ∩ RE2 common subset so both engines match identically.

    Scale: map-only regexp_extract_all over the scan — no shuffle, no
    Python; the pattern compiles once per task inside codegen.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    n = lambda pat: F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))  # noqa: E731
    alpha = F.regexp_extract_all(F.col("text"), F.lit("[a-zA-Z]+"), F.lit(0))
    return d.select(
        "doc_id",
        n(_BPE_PATTERN).cast("bigint").alias("n_bpe_tokens"),
        n("[a-zA-Z]+").cast("bigint").alias("n_alpha_runs"),
        n("[0-9]+").cast("bigint").alias("n_digit_runs"),
        n("[^a-zA-Z0-9 ]").cast("bigint").alias("n_other"),
        F.aggregate(
            alpha, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("alpha_chars"),
    )


@query(
    "q_gopher_rules",
    oracle="""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
           / len(toks) AS mean_word_len,
         CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
           / len(toks) AS alpha_ratio,
         CAST(len(list_filter(toks, w -> contains(w, '#') OR contains(w, '...'))) AS DOUBLE)
           / len(toks) AS symbol_ratio,
         CAST(len(list_filter(toks, w -> list_contains(
           ['the','be','to','of','and','that','have','with'], w))) AS BIGINT) AS n_stop
  FROM t
)
SELECT doc_id, n_words, mean_word_len, alpha_ratio, symbol_ratio, n_stop,
       n_words BETWEEN 50 AND 100000 AS ok_word_count,
       mean_word_len BETWEEN 3.0 AND 10.0 AS ok_mean_len,
       alpha_ratio >= 0.8 AS ok_alpha,
       symbol_ratio <= 0.1 AS ok_symbols,
       n_stop >= 2 AS ok_stopwords,
       (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
         AND alpha_ratio >= 0.8 AND symbol_ratio <= 0.1 AND n_stop >= 2
         AS pass_gopher
FROM m
""",
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021 §A1.1, the public
    heuristic set most pre-training pipelines start from), each rule as
    its own column so a curation run can report WHICH gate rejected a
    document, plus the combined pass flag: word count in [50, 1e5], mean
    word length in [3, 10], >=80% of words containing an alphabetic
    character, <=10% symbol words (# or ellipsis), >=2 distinct-position
    stop words. (Line-shape rules — bullet/ellipsis line starts — need
    line structure the single-line fixture lacks; the word-level battery
    is the transferable part.)

    Scale: map-only higher-order array expressions over one scan, zero
    shuffles, all ratios exact int/int divisions — same plan class as
    q_quality_score; at 100 TB this runs at parquet-scan speed."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    n = F.size(toks)
    stop_lit = F.array(
        *[F.lit(w) for w in ("the", "be", "to", "of", "and", "that", "have", "with")]
    )
    m = d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        (
            F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w)).cast("double") / n
        ).alias("mean_word_len"),
        (
            F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).cast("double") / n
        ).alias("alpha_ratio"),
        (
            F.size(
                F.filter(
                    toks,
                    lambda w: w.contains("#") | w.contains("..."),
                )
            ).cast("double")
            / n
        ).alias("symbol_ratio"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop_lit, w)))
        .cast("bigint")
        .alias("n_stop"),
    )
    ok_wc = F.col("n_words").between(50, 100000)
    ok_ml = F.col("mean_word_len").between(3.0, 10.0)
    ok_al = F.col("alpha_ratio") >= 0.8
    ok_sy = F.col("symbol_ratio") <= 0.1
    ok_st = F.col("n_stop") >= 2
    return m.select(
        "doc_id", "n_words", "mean_word_len", "alpha_ratio", "symbol_ratio", "n_stop",
        ok_wc.alias("ok_word_count"),
        ok_ml.alias("ok_mean_len"),
        ok_al.alias("ok_alpha"),
        ok_sy.alias("ok_symbols"),
        ok_st.alias("ok_stopwords"),
        (ok_wc & ok_ml & ok_al & ok_sy & ok_st).alias("pass_gopher"),
    )


@query(
    "q_bigram_nll",
    oracle="""
WITH tok AS (
  SELECT doc_id, term, idx FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS idx
    FROM documents)
  WHERE term <> ''
), bg AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
), bc AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2
), uc AS (
  SELECT w1, SUM(c2) AS c1 FROM bc GROUP BY w1
), per AS (
  SELECT g.doc_id,
         CAST(round(-ln(CAST(c.c2 AS DOUBLE) / CAST(u.c1 AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS nll
  FROM bg g JOIN bc c USING (w1, w2) JOIN uc u USING (w1)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_nll
FROM per GROUP BY doc_id
""",
    bench=True,
)
def q_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model fluency score — the next-order companion to
    q_unigram_nll: corpus MLE p(w2|w1) = c(w1,w2)/c(w1·), each document's
    mean conditional surprisal. Catches locally-scrambled text unigram
    stats can't (every word common, transitions absurd) — the KenLM-ish
    signal CCNet thresholds on, at n=2.

    Determinism: the unigram policy — per-bigram -ln p rounded to 6 and
    summed as exact integer micros (LONG; see _unigram_nll_scores for
    why this replaced the DECIMAL(18,6) sum bit-identically),
    order-independent across engines and partitionings. The conditional
    denominator c(w1·) aggregates FROM the bigram counts (not raw
    unigram counts), so first/last-token boundary effects are identical
    in both engines by construction.

    Scale: explode with position -> self-join on (doc, idx+1) shares the
    doc_id shuffle; bigram vocab groupBy is map-side combinable; vocab
    relations broadcast back; one final doc groupBy. Nothing carries
    text bodies."""
    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    # tok/bg are NOT cached (r17): both are corpus-sized streams on
    # cheap explode/join lineage, and the columnar cache writes cost
    # more than recomputing them per consumer — measured 1.94 s (both
    # cached) vs 1.85 s (bg only) vs 1.43 s (neither), warm-alternating
    # medians at sf0.1. See _unigram_nll_scores for the general rule.
    tok = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("idx", "term")
    ).filter(F.col("term") != "")
    a = tok.select("doc_id", F.col("idx").alias("i"), F.col("term").alias("w1"))
    b = tok.select("doc_id", (F.col("idx") - 1).alias("i"), F.col("term").alias("w2"))
    bg = a.join(b, ["doc_id", "i"]).select("doc_id", "w1", "w2")
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    uc = bc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    nll_mu = F.round(
        F.round(
            -F.log(F.col("c2").cast("double") / F.col("c1").cast("double")), 6
        )
        * F.lit(1000000.0)
    ).cast("long")
    per = (
        bg.join(F.broadcast(bc), ["w1", "w2"])
        .join(F.broadcast(uc), "w1")
        .select("doc_id", nll_mu.alias("nll_mu"))
    )
    return per.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            (F.sum("nll_mu").cast("double") / F.lit(1000000.0))
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_nll"),
    )


PHRASE_N = 5
PHRASE_MIN = 2


@query(
    "q_boilerplate_phrases",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id,
         array_to_string(t[CAST(i AS INT):CAST(i AS INT) + {PHRASE_N - 1}], ' ')
           AS phrase
  FROM w, UNNEST(range(1, len(t) - {PHRASE_N - 2})) AS u(i)),
h AS (SELECT doc_id, phrase, md5(phrase) AS gh FROM g),
c AS (
  SELECT gh,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM h GROUP BY gh
  HAVING COUNT(*) >= {PHRASE_MIN})
SELECT MIN(h.phrase) AS phrase, c.n_occurrences, c.n_docs
FROM h JOIN c USING (gh)
GROUP BY c.gh, c.n_occurrences, c.n_docs
""",
)
def q_boilerplate_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-phrase mining ({PHRASE_N}-grams occurring >= {PHRASE_MIN}
    times corpus-wide): the boilerplate detector behind nav-bar /
    license-header / template removal — phrases repeated across
    documents are removal candidates the per-doc q_repetition score
    cannot see.

    Scale (two-pass hash-first, the q_decontaminate policy): pass 1
    counts md5'd grams — only 16-byte digests shuffle, phrase text
    stays at the scan; the qualifying set (HAVING >= {PHRASE_MIN}) is
    rare by construction, so pass 2 re-scans and semi-joins grams onto
    the qualifying digests to attach ONE example phrase per digest
    (min — deterministic), a shuffle bounded by qualifying occurrences
    only. Corpus text is scanned twice but never shuffled."""
    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    t = F.split(F.col("text"), " ")
    # guard short docs: size-PHRASE_N < 0 would make F.sequence descend and
    # slice(_, 0, _) throw; the oracle's range() is empty for them, so the
    # filter is exactly the oracle's behavior
    d = d.filter(F.size(t) >= PHRASE_N)
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - PHRASE_N),
                lambda i: F.array_join(F.slice(t, i + 1, PHRASE_N), " "),
            )
        ).alias("phrase"),
    ).select("doc_id", "phrase", F.md5("phrase").alias("gh"))
    grams = cache_scoped(grams)
    counts = (
        grams.groupBy("gh")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= PHRASE_MIN)
    )
    return (
        grams.join(counts, "gh")
        .groupBy("gh", "n_occurrences", "n_docs")
        .agg(F.min("phrase").alias("phrase"))
        .select("phrase", "n_occurrences", "n_docs")
    )


def _curation_near_dup_oracle() -> str:
    from .dedup import _minhash_cte

    return (
        f"WITH {_minhash_cte()},\n"
        + _CURATION_STAGES_SQL
        + """,
survivors AS (
  SELECT doc_id, quality FROM deduped
  WHERE doc_id NOT IN (SELECT doc_b FROM verified))
"""
        + _CURATION_SPLIT_TAIL_SQL.format(src="survivors")
    )


@query("q_curation_near_dup", oracle=_curation_near_dup_oracle())
def q_curation_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship curation pipeline with a NEAR-dup removal stage:
    after the exact-dedup groupBy, any doc that is the LARGER side of a
    verified MinHash near-dup pair is dropped (greedy local-minimum
    keep — every surviving doc has no near-dup with a smaller id; the
    transitive-closure cluster variant is q_dup_clusters, this is the
    single-pass rule production thinning uses when CC rounds aren't
    worth it). Pairs reuse the exact q_minhash_near_dup machinery.

    Scale: adds exactly the near-dup stages' shuffles (band equi-join +
    verify) on top of the pipeline's one digest shuffle; the loser set
    is |near-dup pairs|-bounded, applied as an anti-join keyed on
    doc_id."""
    from ..operators.curation import quality_score
    from .dedup import _build_minhash_pairs

    tune(spark)
    losers = _build_minhash_pairs(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    toks = tokens(F.col("text"))
    en_ratio = en_stopword_count(toks) / F.size(toks)
    kept = (
        d.select(
            "doc_id",
            "text",
            en_ratio.alias("en_ratio"),
            quality_score(F.col("text")).alias("quality"),
        )
        .filter(
            (F.col("en_ratio") >= LANG_GATE_RATIO)
            & (F.col("quality") >= QUALITY_GATE)
        )
    )
    deduped = (
        kept.groupBy(F.md5("text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"), F.first("quality").alias("quality"))
        .drop("__h")
    )
    survivors = deduped.join(losers, "doc_id", "left_anti")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split-seed-42"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    ).cast("int")
    return survivors.select(
        "doc_id",
        "quality",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test").alias("split"),
    )


PPL_LO, PPL_HI = 0.25, 0.90


@query(
    "q_perplexity_filter",
    bench=True,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
), uni AS (
  SELECT term, COUNT(*) AS c FROM tok GROUP BY term
), tot AS (
  SELECT SUM(c) AS n FROM uni
), per AS (
  SELECT t.doc_id,
         CAST(round(-ln(CAST(u.c AS DOUBLE) / CAST(tot.n AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS nll
  FROM tok t JOIN uni u USING (term) CROSS JOIN tot
), scores AS (
  SELECT doc_id, CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_nll
  FROM per GROUP BY doc_id
), ranked AS (
  SELECT doc_id, avg_nll,
         ROW_NUMBER() OVER (ORDER BY avg_nll, doc_id) AS rn,
         COUNT(*) OVER () AS n_docs
  FROM scores)
SELECT doc_id, avg_nll
FROM ranked
WHERE rn > CAST(ceil({PPL_LO} * n_docs) AS BIGINT)
  AND rn <= CAST(ceil({PPL_HI} * n_docs) AS BIGINT)
""",
)
def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-band filtering (the CCNet middle-bucket rule): score
    every document by unigram-LM mean surprisal (q_unigram_nll's exact
    decimal machinery), then keep the ({PPL_LO:.0%}, {PPL_HI:.0%}]
    rank band — dropping the lowest-surprisal docs (degenerate /
    boilerplate repetition the LM finds too easy) AND the highest
    (noise the LM can't model). The standard quality gate a real
    curation stack runs with a KenLM; the plumbing is identical, only
    the scorer swaps.

    Scale: scoring is the unigram pipeline (two shuffles, no text
    moves); the band cut is an EXACT global rank computed distributed —
    ``operators/rank.py::global_rank`` (approx_percentile range buckets,
    per-bucket row_number, broadcast offsets; no single-partition sort
    over |docs| rows), same machinery as q_quantile_bins."""
    tune(spark)
    from ..operators.rank import global_rank

    # global_rank consumes its input three times (boundary sketch, local
    # rank, bucket counts); scores is |docs| rows on an expensive
    # explode+join+agg lineage, so persist the 1-row-per-doc frame
    # instead of recomputing the unigram pipeline per consumer —
    # measured 3.35 s → 2.7 s isolated median (tools/measure_watchlist)
    scores = cache_scoped(
        _unigram_nll_scores(spark, sf_dir).groupBy("doc_id").agg(
            (
                (F.sum("nll_mu").cast("double") / F.lit(1000000.0))
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_nll")
        )
    )
    ranked = global_rank(
        scores, ["avg_nll", "doc_id"], rank_col="rn", total_col="n_docs"
    )
    lo = F.ceil(F.lit(PPL_LO) * F.col("n_docs")).cast("long")
    hi = F.ceil(F.lit(PPL_HI) * F.col("n_docs")).cast("long")
    return ranked.filter((F.col("rn") > lo) & (F.col("rn") <= hi)).select(
        "doc_id", "avg_nll"
    )


DRIFT_MIN_COUNT = 30


@query(
    "q_term_drift",
    oracle=f"""
WITH tok AS (
  SELECT doc_id % 2 AS half, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
), counts AS (
  SELECT term,
         CAST(COUNT(*) FILTER (WHERE half = 0) AS BIGINT) AS c_a,
         CAST(COUNT(*) FILTER (WHERE half = 1) AS BIGINT) AS c_b
  FROM tok GROUP BY term),
tot AS (
  SELECT CAST(SUM(c_a) AS BIGINT) AS t_a, CAST(SUM(c_b) AS BIGINT) AS t_b
  FROM counts)
SELECT term, c_a, c_b,
       ROUND(((CAST(c_a AS DOUBLE) + 1) / (t_a + 2))
             / ((CAST(c_b AS DOUBLE) + 1) / (t_b + 2)), 6) AS drift_ratio
FROM counts CROSS JOIN tot
WHERE c_a + c_b >= {DRIFT_MIN_COUNT}
""",
)
def q_term_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between two corpus slices (here the doc_id parity
    halves; in production, yesterday's crawl vs today's): per qualifying
    term, its add-one-smoothed relative-frequency ratio — the monitoring
    signal that catches topic shift, scraper breakage, or a source
    flipping language before a model trains on it. Deliberately
    libm-free: the score is one division chain over exact integer
    counts, so determinism needs no log/rounding caveat at all.

    Scale: one explode -> one combinable (term, half-conditional)
    count — the same single-shuffle shape as the vocab build; totals
    are a 1-row broadcast. Slices needn't be balanced: smoothed shares
    normalize by each half's own mass."""
    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    tok = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    ).filter(F.col("term") != "")
    counts = tok.groupBy("term").agg(
        F.count(F.when(F.col("half") == 0, 1)).alias("c_a"),
        F.count(F.when(F.col("half") == 1, 1)).alias("c_b"),
    )
    tot = counts.agg(
        F.sum("c_a").cast("long").alias("t_a"), F.sum("c_b").cast("long").alias("t_b")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter((F.col("c_a") + F.col("c_b")) >= DRIFT_MIN_COUNT)
        .select(
            "term",
            "c_a",
            "c_b",
            F.round(
                ((F.col("c_a").cast("double") + 1) / (F.col("t_a") + 2))
                / ((F.col("c_b").cast("double") + 1) / (F.col("t_b") + 2)),
                6,
            ).alias("drift_ratio"),
        )
    )


FEAT_BUCKETS = 64


@query(
    "q_feature_hash",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
), bucketed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % {FEAT_BUCKETS}
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS nnz,
       CAST(SUM(c * c) AS BIGINT) AS sq_norm,
       CAST(CEIL(MAX(c * 1000 - bucket) / 1000.0) AS BIGINT) AS max_count,
       CAST((1000 - (MAX(c * 1000 - bucket) % 1000)) % 1000 AS BIGINT)
         AS argmax_bucket
FROM bucketed GROUP BY doc_id
""",
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick featurizer (Weinberger et al.): terms fold into
    {FEAT_BUCKETS} hash buckets — a fixed-width count vector per doc
    with NO vocabulary pass, the classic streaming-friendly text
    feature. Emitted as the vector's scalar canonicalization (nnz,
    exact squared norm, max count, argmax bucket — the latter two
    decoded from one integer-packed MAX(c*1000 - bucket), ties to the
    smallest bucket) because the driver's canonicalizer hashes scalars,
    not arrays; the full vector is the obvious collect_list away.

    Scale: one explode -> one combinable (doc, bucket) count -> one
    per-doc fold; bucket ids are md5 arithmetic (engine-portable), all
    outputs exact integers. No vocabulary broadcast, no global state —
    the whole featurizer is two shuffles at any corpus size."""
    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long") % FEAT_BUCKETS
    )
    bucketed = tok.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mk = F.max(F.col("c") * 1000 - F.col("bucket"))
    return bucketed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nnz"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq_norm"),
        F.ceil(mk / 1000.0).cast("long").alias("max_count"),
        ((1000 - (mk % 1000)) % 1000).cast("long").alias("argmax_bucket"),
    )


# -- BPE tokenizer TRAINING (Sennrich et al. 2015) ---------------------------

N_BPE_MERGES = 8


def bpe_merge_capacity(words: DataFrame) -> int:
    """Certain-exhaustion upper bound on trainable merges for a word
    histogram (column ``w``): ``sum(len(w)) - |W|``. Every applied merge
    shrinks at least one vocabulary word's token sequence by >= 1 and the
    floor is one token per word, so training PAST this depth is
    guaranteed to exhaust; BELOW it, exhaustion can still arrive early
    when one merge rule eats several occurrences (this fixture: bound
    107, actual exhaustion 89 — pinned in test_plans.py). One
    vocabulary-sized aggregate, 1-row collect (control-plane; at 100 TB
    the histogram is ~1e7 rows)."""
    row = words.agg(
        F.count(F.lit(1)).alias("nw"), F.sum(F.length("w")).alias("chars")
    ).collect()[0]
    return int(row.chars or 0) - int(row.nw)  # empty histogram -> 0


def bpe_merges_for(words: DataFrame, vocab_target: int) -> int:
    """Merge-count knob (VERDICT r12 ask #7, the ivf_cells_for pattern):
    classic BPE sizing ``merges = vocab_target - |alphabet|`` (final
    vocabulary ~= base characters + one new token per merge), capped by
    :func:`bpe_merge_capacity` so an over-ambitious target on a small
    corpus degrades to "as deep as the corpus can go" instead of a
    guaranteed mid-loop exhaustion. On this fixture alphabet=24, so
    vocab_target=32 reproduces the registered N_BPE_MERGES=8.

    Scale note: the knob prices the DISTRIBUTED loop, whose per-round
    cost is two control-plane jobs (SCALE.md: ~0.2-0.3 s/round constant
    in depth). For production vocab_targets (32k) SCALE.md's posture is
    the cutover — histogram collects (~100 MB, vocabulary-bounded) and
    the merge loop runs on a local pair-heap — so this knob's cap also
    marks where the distributed loop stops being the right shape."""
    alphabet = (
        words.select(F.explode(F.split("w", "")).alias("c"))
        .filter(F.col("c") != "")
        .agg(F.countDistinct("c"))
        .collect()[0][0]
    )
    return max(0, min(int(vocab_target) - int(alphabet), bpe_merge_capacity(words)))


_VOCAB_GROWTH_GRID = ((1, 16), (1, 8), (1, 4), (1, 2), (1, 1))


@query(
    "q_vocab_growth",
    oracle=f"""
WITH w AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
), first_seen AS (
  SELECT w, MIN(doc_id) AS first_doc FROM w GROUP BY w
), doc_tokens AS (
  -- per-doc token count as a map-only array expression so EMPTY
  -- documents keep their row (an exploded-word groupBy drops them and
  -- undercounts n_docs — found by the Heaps property fuzz)
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n
  FROM documents
), mx AS (SELECT MAX(doc_id) AS max_id FROM documents),
grid(grid_idx, num, den) AS (
  VALUES {", ".join(f"({i + 1}, {n}, {d})" for i, (n, d) in enumerate(_VOCAB_GROWTH_GRID))}
), thr AS (
  SELECT grid_idx, CAST(max_id * num // den AS BIGINT) AS threshold_id
  FROM grid CROSS JOIN mx
), tok AS (
  SELECT t.grid_idx,
         CAST(SUM(CASE WHEN d.doc_id <= t.threshold_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN d.doc_id <= t.threshold_id THEN d.n ELSE 0 END)
              AS BIGINT) AS n_tokens
  FROM thr t CROSS JOIN doc_tokens d GROUP BY t.grid_idx
), voc AS (
  SELECT t.grid_idx,
         CAST(SUM(CASE WHEN f.first_doc <= t.threshold_id THEN 1 ELSE 0 END)
              AS BIGINT) AS vocab_size
  FROM thr t CROSS JOIN first_seen f GROUP BY t.grid_idx
)
SELECT t.grid_idx, t.threshold_id, k.n_docs, k.n_tokens,
       COALESCE(v.vocab_size, 0) AS vocab_size,
       ROUND(CAST(COALESCE(v.vocab_size, 0) AS DOUBLE) / k.n_tokens, 6) AS ttr
FROM thr t JOIN tok k ON k.grid_idx = t.grid_idx
LEFT JOIN voc v ON v.grid_idx = t.grid_idx
""",
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve (r13): distinct-word count at
    a grid of deterministic corpus prefixes (docs with id ≤ a fraction
    of max id), with cumulative token counts and type-token ratio. The
    corpus-planning primitive: the curve's log-log slope (fit offline —
    libm log is not a cross-engine-safe oracle surface) extrapolates
    vocabulary size at 100 TB, which sizes BPE vocab targets
    (q_bpe_capacity feeds on it), embedding tables, and the
    `bpe_merges_for` knob before any training run.

    Scale: Heaps sampling WITHOUT windows or sorts — a word's prefix
    membership is ``first_doc = min(doc_id)`` (ONE combinable
    corpus-sized groupBy(word), same shape as the BPE histogram), then
    both curve legs are conditional sums over a broadcast |grid|-row
    literal: vocabulary leg over the |V|-row first-seen relation,
    token leg over the |docs|-row per-doc counts. No global row_number
    anywhere — prefix thresholds are integer id fractions, exact on
    both engines.

    Reference parity: none (BASELINE.json north star)."""
    tune(spark)
    return vocab_growth_curve(
        spark, table(spark, sf_dir, "documents"), _VOCAB_GROWTH_GRID
    )


def vocab_growth_curve(
    spark: SparkSession, d: DataFrame, grid_fracs: tuple[tuple[int, int], ...]
) -> DataFrame:
    """q_vocab_growth's computation over an arbitrary (doc_id, text)
    relation — factored so the threshold/conditional-sum arithmetic is
    property-testable against a pure-Python Heaps model on synthetic
    corpora (sparse ids, empty docs, duplicate words —
    tests/test_properties.py)."""
    w = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    first_seen = w.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    # map-only per-doc token count: EMPTY documents keep their row (an
    # exploded-word groupBy drops them and undercounts n_docs — found
    # by the Heaps property fuzz on synthetic corpora)
    doc_tokens = d.select(
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).cast("bigint").alias("n"),
    )
    mx = d.agg(F.max("doc_id").alias("max_id"))
    grid = local_rows(
        spark,
        [(i + 1, n, den) for i, (n, den) in enumerate(grid_fracs)],
        "grid_idx int, num long, den long",
    )
    thr = (
        grid.crossJoin(F.broadcast(mx))
        .select(
            "grid_idx",
            F.expr("max_id * num div den").cast("bigint").alias("threshold_id"),
        )
    )
    tok = (
        doc_tokens.crossJoin(F.broadcast(thr))
        .groupBy("grid_idx", "threshold_id")
        .agg(
            F.sum(F.when(F.col("doc_id") <= F.col("threshold_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") <= F.col("threshold_id"), F.col("n")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    voc = (
        first_seen.crossJoin(F.broadcast(thr.select("grid_idx", "threshold_id")))
        .groupBy("grid_idx")
        .agg(
            F.sum(
                F.when(F.col("first_doc") <= F.col("threshold_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("vocab_size")
        )
    )
    from ..functions.vector import safe_div

    # both legs are |grid|-row aggregates; the closing join is broadcast
    # (static stats can't see post-agg cardinality, so hint it) and LEFT
    # (an all-empty-word corpus has NO first_seen rows — the vocabulary
    # leg vanishes entirely; coalesce restores the honest 0).
    # safe_div: an all-empty-docs prefix has n_tokens = 0 — ANSI `/`
    # would abort the job where DuckDB yields NULL (found by the Heaps
    # property fuzz on its first run; the driver fixture never hits it).
    vocab = F.coalesce(F.col("vocab_size"), F.lit(0).cast("bigint"))
    return tok.join(F.broadcast(voc), "grid_idx", "left").select(
        "grid_idx",
        "threshold_id",
        "n_docs",
        "n_tokens",
        vocab.alias("vocab_size"),
        F.round(safe_div(vocab.cast("double"), F.col("n_tokens")), 6).alias("ttr"),
    )


_BPE_VOCAB_GRID = (26, 32, 64, 1_000_000)


@query(
    "q_bpe_capacity",
    oracle=f"""
WITH words AS (
  SELECT w FROM (
    SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
), stats AS (
  -- COALESCE: an all-empty-text corpus has zero histogram rows; SUM
  -- over none is NULL on both engines and NULL-skipping LEAST would
  -- then let n_merges degrade to the raw target instead of 0
  SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(COALESCE(SUM(LENGTH(w)), 0) AS BIGINT) AS total_chars
  FROM words
), alpha AS (
  SELECT CAST(COUNT(DISTINCT c) AS BIGINT) AS alphabet_size FROM (
    SELECT UNNEST(string_split(w, '')) AS c FROM words)
  WHERE c <> ''
), grid(vocab_target) AS (
  VALUES {", ".join(f"(CAST({v} AS BIGINT))" for v in _BPE_VOCAB_GRID)}
)
SELECT vocab_target, alphabet_size, n_words, total_chars,
       total_chars - n_words AS merge_capacity,
       GREATEST(CAST(0 AS BIGINT),
                LEAST(vocab_target - alphabet_size,
                      total_chars - n_words)) AS n_merges
FROM grid, stats, alpha
""",
)
def q_bpe_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer capacity planning (r13, the table form of
    :func:`bpe_merges_for` / :func:`bpe_merge_capacity`): for each
    candidate vocab_target, the merge depth the knob would train —
    ``min(vocab_target - alphabet, capacity)`` floored at 0 — alongside
    the corpus stats it derives from (distinct words, total vocabulary
    chars, alphabet size, the certain-exhaustion capacity bound). The
    sheet an operator reads BEFORE launching q_bpe_train at a new
    vocabulary size; driver-verifies the knob arithmetic cross-engine.

    Scale: two vocabulary-sized aggregates (word histogram is the one
    corpus-sized groupBy, shared shape with q_bpe_train) broadcast onto
    a |grid|-row literal table — the documented 1-row scalar
    crossJoin pattern, |grid| output rows. All integer arithmetic: no
    float surface at all.

    Reference parity: none (BASELINE.json north star)."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    stats = words.agg(
        F.count(F.lit(1)).alias("n_words"),
        # coalesce: zero histogram rows -> NULL sum, and NULL-skipping
        # least() would let n_merges degrade to the raw target
        F.coalesce(F.sum(F.length("w")), F.lit(0)).cast("bigint").alias(
            "total_chars"
        ),
    )
    alpha = (
        words.select(F.explode(F.split("w", "")).alias("c"))
        .filter(F.col("c") != "")
        .agg(F.countDistinct("c").alias("alphabet_size"))
    )
    grid = local_rows(
        spark, [(v,) for v in _BPE_VOCAB_GRID], "vocab_target long"
    )
    zero = F.lit(0).cast("long")
    return (
        grid.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(alpha))
        .select(
            "vocab_target",
            "alphabet_size",
            "n_words",
            "total_chars",
            (F.col("total_chars") - F.col("n_words")).alias("merge_capacity"),
            F.greatest(
                zero,
                F.least(
                    F.col("vocab_target") - F.col("alphabet_size"),
                    F.col("total_chars") - F.col("n_words"),
                ),
            ).alias("n_merges"),
        )
    )


def _bpe_train_oracle() -> str:
    """Unrolled relational BPE: per round, (a) adjacent-pair counts
    weighted by word frequency, (b) deterministic argmax (count DESC,
    pair lexicographic), (c) GREEDY left-to-right merge application
    stated relationally — match starts grouped into islands of
    CONSECUTIVE positions (overlap is only possible when left==right)
    and the even offsets within each island are exactly the pairs a
    left-to-right scan merges. Deliberately a DIFFERENT formulation
    from the Spark side's fold (windows/joins vs a HOF reduce), so
    parity cannot come from mirroring a shared bug.

    Every t{r} is AS MATERIALIZED: each round references its
    predecessor twice (pair stats + rebuild), so inlined CTEs would
    expand the base scan 2^rounds times — materialization keeps the
    chain linear, exactly like the engine's per-round persist."""
    chain = ["""w0 AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
), t0 AS MATERIALIZED (
  SELECT w, f, CAST(i AS BIGINT) AS pos, substr(w, CAST(i AS INT), 1) AS tok
  FROM w0, UNNEST(range(1, length(w) + 1)) AS u(i)
)"""]
    for r in range(1, N_BPE_MERGES + 1):
        p = r - 1
        chain.append(f"""b{r} AS (
  SELECT lt, rt, cnt FROM (
    SELECT lt, rt, SUM(f) AS cnt FROM (
      SELECT t.tok AS lt,
             LEAD(t.tok) OVER (PARTITION BY t.w ORDER BY t.pos) AS rt, t.f
      FROM t{p} t) x
    WHERE rt IS NOT NULL GROUP BY lt, rt)
  QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, lt ASC, rt ASC) = 1
), g{r} AS (
  SELECT w, pos FROM (
    SELECT w, pos, MIN(pos) OVER (PARTITION BY w, isl) AS isl_start FROM (
      SELECT w, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS isl
      FROM (
        SELECT x.w, x.pos FROM (
          SELECT t.w, t.pos, t.tok,
                 LEAD(t.tok) OVER (PARTITION BY t.w ORDER BY t.pos) AS nxt
          FROM t{p} t) x, b{r}
        WHERE x.tok = b{r}.lt AND x.nxt = b{r}.rt)))
  WHERE (pos - isl_start) % 2 = 0
), t{r} AS MATERIALIZED (
  SELECT w, f, ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS pos,
         CASE WHEN is_start THEN tok || nxt ELSE tok END AS tok
  FROM (
    SELECT t.w, t.f, t.pos, t.tok,
           LEAD(t.tok) OVER (PARTITION BY t.w ORDER BY t.pos) AS nxt,
           g1.pos IS NOT NULL AS is_start,
           g2.pos IS NOT NULL AS is_dropped
    FROM t{p} t
    LEFT JOIN g{r} g1 ON g1.w = t.w AND g1.pos = t.pos
    LEFT JOIN g{r} g2 ON g2.w = t.w AND g2.pos = t.pos - 1)
  WHERE NOT is_dropped
), v{r} AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab FROM t{r})""")
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS merge_rank, lt AS left_tok, rt AS right_tok,"
        f" CAST(cnt AS BIGINT) AS pair_count,"
        f" (SELECT vocab FROM v{r}) AS vocab_size_after FROM b{r}"
        for r in range(1, N_BPE_MERGES + 1)
    )
    return f"WITH {', '.join(chain)}\n{unions}"


def _bpe_apply_merge(lt: str, rt: str, merged: str) -> F.Column:
    """One merge round applied to the per-word token array as a single
    codegen'd left fold (the greedy left-to-right BPE scan): if the
    accumulator's last token is ``lt`` and the incoming token is ``rt``,
    replace the last with ``merged``, else append. The merged symbol is
    strictly longer than ``lt``, so a just-merged token can never match
    as the left of the same pair — exactly the scan-from-i+2 rule.
    Tokens pass through ``F.lit`` (never string-spliced into SQL), so
    arbitrary corpus characters are safe."""
    init = F.expr("CAST(array() AS ARRAY<STRING>)")

    def step(acc: F.Column, x: F.Column) -> F.Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lt))
            & (x == F.lit(rt))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate("toks", init, step)


@query("q_bpe_train", oracle=_bpe_train_oracle())
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2015, arXiv:1508.07909)
    — the learn-the-merges half that q_bpe_tokens' fixed pretokenizer
    only applies: the top {N} merge rules from the corpus, each row
    (merge_rank, left_tok, right_tok, pair_count, vocab_size_after).
    Deterministic end to end: pair argmax ties break lexicographically,
    greedy left-to-right application (overlapping occurrences of a
    self-pair merge at even offsets only — 'aaaa' + (a,a) -> [aa, aa],
    'aaa' -> [aa, a]).

    Spark shape — the part that matters at 100 TB: BPE trains on the
    WORD HISTOGRAM, not the corpus. The only corpus-sized work is ONE
    groupBy(word) (map-side combinable; at 100 TB the histogram is
    ~1e7 rows against 1e11 corpus words). Every merge round then runs
    on vocabulary-sized data: pair counting is a combinable
    groupBy(pair) over per-word adjacent pairs, the argmax collect is
    ONE row (control-plane, the Lloyd-model pattern), and merge
    application is a map-only whole-stage-codegen array fold — no
    shuffle. Rounds are inherently sequential (each merge changes the
    next round's pair statistics); each round's relation persists and
    the previous unpersists, so lineage stays one round deep.

    The oracle unrolls all {N} rounds relationally with a DIFFERENT
    greedy formulation (consecutive-match islands + even-offset rule
    vs the fold) — two independent statements of the same spec.

    Reference parity: none (BASELINE.json north star — LLM-data
    tooling the reference ETL never had)."""
    tune(spark)
    out, _ = _bpe_train_merges(spark, sf_dir, N_BPE_MERGES)
    return local_rows(
        spark,
        out,
        "merge_rank int, left_tok string, right_tok string, "
        "pair_count bigint, vocab_size_after bigint",
    )


def _bpe_train_merges(
    spark: SparkSession, sf_dir: str, n_merges: int, allow_exhaustion: bool = False
) -> tuple[list[tuple], DataFrame]:
    """The distributed merge loop behind q_bpe_train, parameterized on
    depth so the rounds-vs-merges cost curve can be measured past the
    registered query's N_BPE_MERGES (tools/measure_bpe.py; SCALE.md
    prices the 32k-merge regime from it).

    Lineage control (found BY the depth measurement, r12): persist()
    truncates COMPUTATION but not the LOGICAL PLAN — each round nests
    another transform() over the last, and by ~16 rounds plan
    construction itself OOMs the driver. localCheckpoint(eager=True)
    materializes the round AND truncates the plan to a leaf — the
    MLlib/GraphX iterative-algorithm rule. (Local checkpoints live on
    executors; a production run at reliability-critical depth points
    sparkContext.setCheckpointDir at durable storage and uses
    checkpoint() at the same cadence.)"""
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    prev = words.select(
        "w",
        "f",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("toks"),
    ).localCheckpoint(eager=True)
    out: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            prev.filter(F.size("toks") >= 2)
            .select(
                "f",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1), i -> "
                        "struct(element_at(toks, i) AS lt, "
                        "element_at(toks, i + 1) AS rt))"
                    )
                ).alias("p"),
            )
            .groupBy("p.lt", "p.rt")
            .agg(F.sum("f").alias("cnt"))
        )
        best = pairs.orderBy(F.col("cnt").desc(), "lt", "rt").limit(1).collect()
        if not best:
            # every histogram word is a single token — nothing left to
            # learn. Callers sizing depth with bpe_merges_for() hit this
            # only on degenerate corpora (the knob's capacity cap is an
            # upper bound, not the exact exhaustion point).
            if allow_exhaustion:
                break
            raise ValueError(
                f"pairs exhausted after {rank - 1} merges — corpus too small "
                f"for n_merges={n_merges}"
            )
        b = best[0]
        merged = b.lt + b.rt
        nxt = prev.select(
            "w", "f", _bpe_apply_merge(b.lt, b.rt, merged).alias("toks")
        ).localCheckpoint(eager=True)
        vocab = (
            nxt.select(F.explode("toks").alias("t"))
            .agg(F.countDistinct("t"))
            .collect()[0][0]
        )
        out.append((rank, b.lt, b.rt, int(b.cnt), int(vocab)))
        prev = nxt
    return out, prev


def _bpe_segment_oracle() -> str:
    """The training chain's final relation t{N}, expanded back to the
    document grain: per-word token counts join the per-doc word
    multiset (every corpus word is in the histogram by construction)."""
    n = N_BPE_MERGES
    train = _bpe_train_oracle()
    chain = train[len("WITH ") : train.index("\nSELECT CAST(1 AS INT)")]
    # keep only the CTE chain; the merge-table SELECT tail is replaced
    # by the document-grain expansion
    chain = chain[: chain.rindex(f", v{n} AS")]
    return f"""WITH {chain}, wl AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_tok FROM t{n} GROUP BY w
), dw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
)
SELECT dw.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(LENGTH(dw.w)) AS BIGINT) AS n_chars,
       CAST(SUM(wl.n_tok) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(SUM(LENGTH(dw.w)) AS DOUBLE) / SUM(wl.n_tok), 6) AS chars_per_token
FROM dw JOIN wl ON dw.w = wl.w
GROUP BY dw.doc_id
"""


@query("q_bpe_segment", oracle=_bpe_segment_oracle())
def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half completing the tokenizer lifecycle (train →
    segment, the q_bpe_train twin the way ivf_assign is kmeans_fit's):
    the corpus re-segments under the trained merge table and each
    document reports its token budget — (doc_id, n_words, n_chars,
    n_bpe_tokens, chars_per_token). The compression trajectory is what
    a data pipeline actually buys from a tokenizer: context-window
    budgeting (q_pack_sequences consumes exactly this count) and
    per-source cost accounting before a training run.

    Spark shape: training reruns the histogram loop (see q_bpe_train —
    corpus-sized work is ONE groupBy(word)); segmentation then joins
    the per-WORD token length back to the doc-word relation with the
    vocabulary-sized side BROADCAST — the corpus never shuffles for
    the lookup, only the final doc rollup groups. At 100 TB: histogram
    ~1e7 rows broadcast in MiBs, corpus pass is scan + map + one
    combinable groupBy(doc_id).

    The oracle reuses the training chain's final relation verbatim and
    expands it to the document grain — one spec, two engines, shared
    derivation."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    # the trained final relation comes from the SAME loop as
    # q_bpe_train (shared _bpe_train_merges — lineage-checkpointed per
    # round; the per-round vocab count it also computes is
    # vocabulary-sized noise next to the pair aggregate)
    _, trained = _bpe_train_merges(spark, sf_dir, N_BPE_MERGES)
    wl = trained.select("w", F.size("toks").cast("long").alias("n_tok"))
    dw = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    return (
        dw.join(F.broadcast(wl), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum("n_tok").alias("n_bpe_tokens"),
            F.round(
                F.sum(F.length("w")).cast("double") / F.sum("n_tok"), 6
            ).alias("chars_per_token"),
        )
    )


# -- in-engine linear-probe training (distributed full-batch GD) --------------

GD_BUCKETS = 8
GD_ROUNDS = 3
GD_LR = 0.125  # 2^-3: exact in binary, so lr*grad is one exact scaling


def _linear_probe_oracle() -> str:
    D, n_r, lr, scale = GD_BUCKETS, GD_ROUNDS, GD_LR, 1_000_000
    bucket = f"CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % {D}"
    zcols = ", ".join(
        f"CASE WHEN (SELECT sd{d} FROM st) = 0 THEN 0.0 "
        f"ELSE FLOOR((COALESCE(c.c{d}, 0) - (SELECT mu{d} FROM st)) "
        f"/ (SELECT sd{d} FROM st) * {scale}) / {scale} END AS z{d}"
        for d in range(D)
    )
    ccols = ", ".join(
        f"SUM(CASE WHEN b = {d} THEN 1 ELSE 0 END) AS c{d}" for d in range(D)
    )
    stat_cols = ", ".join(
        f"CAST(SUM(COALESCE(c{d}, 0)) AS DOUBLE) / (SELECT n FROM nn) AS mu{d}, "
        f"SQRT(CAST(SUM(COALESCE(c{d}, 0) * COALESCE(c{d}, 0)) AS DOUBLE) "
        f"/ (SELECT n FROM nn) "
        f"- (CAST(SUM(COALESCE(c{d}, 0)) AS DOUBLE) / (SELECT n FROM nn)) "
        f"* (CAST(SUM(COALESCE(c{d}, 0)) AS DOUBLE) / (SELECT n FROM nn))) AS sd{d}"
        for d in range(D)
    )
    chain = [f"""tok AS (
  SELECT doc_id, {bucket} AS b FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
), cnt AS (
  SELECT doc_id, {ccols} FROM tok GROUP BY doc_id
), nn AS (SELECT COUNT(*) AS n FROM documents),
jc AS (
  SELECT d.doc_id, d.n_chars, {', '.join(f'cc.c{d}' for d in range(D))}
  FROM documents d LEFT JOIN cnt cc ON cc.doc_id = d.doc_id
), st AS (
  SELECT {stat_cols} FROM jc
), yb AS (
  SELECT CAST(SUM(n_chars) AS DOUBLE) / (SELECT n FROM nn) AS ybar FROM documents
), z AS MATERIALIZED (
  SELECT c.doc_id, c.n_chars - (SELECT ybar FROM yb) AS yc, {zcols}
  FROM jc c
), w0 AS (SELECT {', '.join(f'0.0 AS w{d}' for d in range(D))})"""]
    for r in range(1, n_r + 1):
        p = r - 1
        pred = " + ".join(f"z.z{d} * w.w{d}" for d in range(D))
        gsum = ", ".join(
            f"SUM(CAST(ROUND(z.z{d} * ({pred} - z.yc), 6) AS DECIMAL(38, 6))) AS g{d}"
            for d in range(D)
        )
        wnew = ", ".join(
            f"FLOOR((w.w{d} - {lr} * (CAST(s.g{d} AS DOUBLE) / (SELECT n FROM nn)))"
            f" * {scale}) / {scale} AS w{d}"
            for d in range(D)
        )
        chain.append(f"""s{r} AS (
  SELECT {gsum},
         SUM(CAST(ROUND(({pred} - z.yc) * ({pred} - z.yc), 6)
             AS DECIMAL(38, 6))) AS sq
  FROM z CROSS JOIN w{p} w
), w{r} AS (
  SELECT {wnew} FROM s{r} s CROSS JOIN w{p} w
), m{r} AS (
  SELECT ROUND(CAST(sq AS DOUBLE) / (SELECT n FROM nn), 6) AS mse FROM s{r}
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS round, CAST({d} AS INT) AS feature_id, "
        f"w{d} AS weight_after, (SELECT mse FROM m{r}) AS mse_before FROM w{r}"
        for r in range(1, n_r + 1)
        for d in range(D)
    )
    return f"WITH {', '.join(chain)}\n{unions}"


@query("q_linear_probe", oracle=_linear_probe_oracle())
def q_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine MODEL TRAINING: a linear probe fit by distributed
    full-batch gradient descent — the standard representation-quality
    diagnostic (here: hashed bag-of-words -> document length; swap in
    an embedding matrix and a quality target unchanged). On the sf0.01
    fixture the loss trajectory runs 19002.0 (round-1 start) -> 602.8
    entering round {GD_ROUNDS} at lr 2^-3.

    This is the Lloyd/BPE training pattern, third instance: the MODEL
    (a {GD_BUCKETS}-weight vector) lives driver-side and enters each
    round as literals in a map-only residual expression; the DATA never
    moves — each round is ONE aggregate computing all gradient
    components + the loss as decimal-exact sufficient statistics
    (order-independent sums, the repo policy that makes float
    aggregation engine-identical), collected as a single row. Per
    round: one map pass + one combinable 1-row aggregate — shuffle
    bytes constant in corpus size. At 100 TB that is exactly
    distributed data-parallel GD with an all-reduce, expressed as a
    DataFrame aggregate.

    Determinism, end to end: feature standardization quantizes z to
    floor(z·1e6)/1e6 after one exact-operand mean/IEEE-sqrt pipeline;
    per-term products round to 6 decimals and sum as DECIMAL(38,6);
    weight updates floor-quantize back to the 1e-6 lattice; lr = 2^-3
    is a one-bit-exponent scale. The oracle unrolls all rounds as
    1-row weight CTEs over the same materialized standardized relation.

    Output (round, feature_id, weight_after, mse_before) — the loss
    trajectory and weight path, {GD_ROUNDS}×{GD_BUCKETS} rows."""
    import math

    tune(spark)
    D, scale = GD_BUCKETS, 1_000_000
    d_t = table(spark, sf_dir, "documents")
    tok = (
        fan_out(d_t, spark)
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    bucket = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % D
    cnt = tok.groupBy("doc_id").agg(
        *[
            F.sum(F.when(bucket == d, 1).otherwise(0)).alias(f"c{d}")
            for d in range(D)
        ]
    )
    jc = d_t.select("doc_id", "n_chars").join(cnt, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        *[F.coalesce(F.col(f"c{d}"), F.lit(0)).alias(f"c{d}") for d in range(D)],
    )
    # exact sufficient statistics -> driver-side model constants (same
    # arithmetic as the oracle's st CTE: exact-int sums, one division,
    # IEEE sqrt)
    srow = jc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sy"),
        *[F.sum(F.col(f"c{d}")).alias(f"s{d}") for d in range(D)],
        *[
            F.sum(F.col(f"c{d}") * F.col(f"c{d}")).alias(f"q{d}")
            for d in range(D)
        ],
    ).collect()[0]
    n = srow["n"]
    ybar = float(srow["sy"]) / n
    mu = [float(srow[f"s{d}"]) / n for d in range(D)]
    sd = [
        math.sqrt(float(srow[f"q{d}"]) / n - (float(srow[f"s{d}"]) / n) ** 2)
        for d in range(D)
    ]

    def zc(d: int) -> F.Column:
        if sd[d] == 0:
            return F.lit(0.0)
        return (
            F.floor(
                (F.col(f"c{d}") - F.lit(mu[d])) / F.lit(sd[d]) * scale
            )
            / scale
        )

    z = cache_scoped(
        jc.select(
            "doc_id",
            (F.col("n_chars") - F.lit(ybar)).alias("yc"),
            *[zc(d).alias(f"z{d}") for d in range(D)],
        )
    )
    w = [0.0] * D
    out: list[tuple] = []
    for r in range(1, GD_ROUNDS + 1):
        pred = F.lit(0.0)
        first = True
        for d in range(D):
            term = F.col(f"z{d}") * F.lit(w[d])
            pred = term if first else pred + term
            first = False
        resid = pred - F.col("yc")
        row = z.agg(
            *[
                F.sum(
                    F.round(F.col(f"z{d}") * resid, 6).cast("decimal(38,6)")
                ).alias(f"g{d}")
                for d in range(D)
            ],
            F.sum(F.round(resid * resid, 6).cast("decimal(38,6)")).alias("sq"),
        ).collect()[0]
        mse = round_half_up6(float(row["sq"]) / n)
        w = [
            math.floor((w[d] - GD_LR * (float(row[f"g{d}"]) / n)) * scale)
            / scale
            for d in range(D)
        ]
        out.extend((r, d, w[d], mse) for d in range(D))
    return local_rows(
        spark, out,
        "round int, feature_id int, weight_after double, mse_before double",
    )


def _bpe_fertility_oracle() -> str:
    n = N_BPE_MERGES
    train = _bpe_train_oracle()
    chain = train[len("WITH ") : train.index("\nSELECT CAST(1 AS INT)")]
    chain = chain[: chain.rindex(f", v{n} AS")]
    return f"""WITH {chain}, wl AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_tok FROM t{n} GROUP BY w
), dw AS (
  SELECT doc_id, lang, w FROM (
    SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
)
SELECT dw.lang,
       CAST(COUNT(DISTINCT dw.doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(LENGTH(dw.w)) AS BIGINT) AS n_chars,
       CAST(SUM(wl.n_tok) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(SUM(LENGTH(dw.w)) AS DOUBLE) / SUM(wl.n_tok), 6)
         AS chars_per_token,
       ROUND(CAST(SUM(wl.n_tok) AS DOUBLE) / COUNT(*), 6) AS tokens_per_word
FROM dw JOIN wl ON dw.w = wl.w
GROUP BY dw.lang
"""


@query("q_bpe_fertility", oracle=_bpe_fertility_oracle())
def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY by language — the per-language
    tokens-per-word / chars-per-token table a tokenizer team reads
    before committing a vocabulary, because a tokenizer trained on a
    skewed mixture silently taxes the under-represented languages
    (higher fertility = more tokens for the same text = less content
    per context window and higher serving cost for those users). Same
    trained merges as q_bpe_train/q_bpe_segment (shared
    _bpe_train_merges loop), rolled up to the language grain with
    document counts.

    Scale: identical to q_bpe_segment — the vocabulary-sized
    token-length table broadcasts onto the doc-word relation, the
    corpus never shuffles for the lookup, and the final rollup is a
    combinable groupBy(lang) of |langs| output rows. Exact-integer
    sums; the two ratios are single closing divisions.

    Reference parity: none (BASELINE.json north star — LLM-data
    tooling the reference ETL never had)."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    _, trained = _bpe_train_merges(spark, sf_dir, N_BPE_MERGES)
    wl = trained.select("w", F.size("toks").cast("long").alias("n_tok"))
    dw = (
        d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    return (
        dw.join(F.broadcast(wl), "w")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
            F.sum("n_tok").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.sum(F.length("w")).cast("double") / F.sum("n_tok"), 6
            ).alias("chars_per_token"),
            F.round(
                F.sum("n_tok").cast("double") / F.count(F.lit(1)), 6
            ).alias("tokens_per_word"),
        )
    )


_QSCORE_SQL = """0.4 * LEAST(len(string_split(text, ' ')) / 100.0, 1.0)
             + 0.3 * (len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')))
             + 0.3 * LEAST((CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
                            / len(string_split(text, ' '))) / 8.0, 1.0)"""


def _source_quality_oracle() -> str:
    return f"""
WITH q AS (
  SELECT doc_id, source, lang, {_QSCORE_SQL} AS qs FROM documents
), per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         ROUND(CAST(SUM(CAST(ROUND(qs, 6) AS DECIMAL(18, 6))) AS DOUBLE)
               / COUNT(*), 6) AS mean_quality,
         CAST(SUM(CASE WHEN qs < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
  FROM q GROUP BY source
), lang_counts AS (
  SELECT source, lang, COUNT(*) AS c FROM q GROUP BY source, lang
), top_lang AS (
  SELECT source, lang AS top_lang, c FROM (
    SELECT source, lang, c,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY c DESC, lang ASC) AS rn
    FROM lang_counts)
  WHERE rn = 1
)
SELECT p.source, p.n_docs, p.mean_quality,
       ROUND(CAST(p.n_low AS DOUBLE) / p.n_docs, 6) AS p_low_quality,
       p.n_langs, t.top_lang,
       ROUND(CAST(t.c AS DOUBLE) / p.n_docs, 6) AS top_lang_share
FROM per_src p JOIN top_lang t ON t.source = p.source
"""


@query("q_source_quality_matrix", oracle=_source_quality_oracle())
def q_source_quality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-SOURCE quality triage matrix — the first table a corpus
    owner reads when a new feed lands: document count, mean composite
    quality (the q_quality_score gate), the share of low-quality
    (< 0.5) documents, language spread (distinct langs, dominant lang
    and its share). One feed full of short/repetitive text or suddenly
    mono-language shows here before any per-document gate runs at full
    corpus cost.

    Determinism: per-doc quality scores enter the mean as ROUND(6)
    DECIMAL (order-independent sums — a mean of raw doubles is
    accumulation-order-dependent); the low-quality flag compares
    identically-derived doubles to the same literal in both engines;
    the dominant language ranks (count desc, lang asc).

    Scale: two combinable groupBys over the corpus scan (per-source
    stats, per-(source, lang) counts) — output is |sources| rows; the
    dominant-language window runs over |sources|×|langs| rows."""
    from pyspark.sql import Window

    from ..operators.curation import quality_score

    tune(spark)
    d = table(spark, sf_dir, "documents")
    q = d.select("doc_id", "source", "lang", quality_score(F.col("text")).alias("qs"))
    per_src = q.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum(F.round("qs", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
        F.sum(F.when(F.col("qs") < 0.5, 1).otherwise(0)).cast("long").alias("n_low"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    lang_counts = q.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("lang").asc())
    top = (
        lang_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), "c")
    )
    return per_src.join(top, "source").select(
        "source",
        "n_docs",
        "mean_quality",
        F.round(F.col("n_low").cast("double") / F.col("n_docs"), 6).alias(
            "p_low_quality"
        ),
        "n_langs",
        "top_lang",
        F.round(F.col("c").cast("double") / F.col("n_docs"), 6).alias(
            "top_lang_share"
        ),
    )


@query(
    "q_quality_calibration",
    oracle="""
WITH scored AS (
  SELECT doc_id, n_chars, md5(text) AS fp,
         0.4 * LEAST(len(string_split(text, ' ')) / 100.0, 1.0)
             + 0.3 * (len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')))
             + 0.3 * LEAST((CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
                            / len(string_split(text, ' '))) / 8.0, 1.0) AS score
  FROM documents
), flagged AS (
  SELECT CAST(LEAST(9, CAST(FLOOR(score * 10) AS BIGINT)) AS INT) AS score_band,
         n_chars, score,
         COUNT(*) OVER (PARTITION BY fp) > 1 AS is_dup
  FROM scored
)
SELECT score_band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(score) AS min_score,
       MAX(score) AS max_score
FROM flagged
GROUP BY score_band
""",
)
def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score calibration against exact-duplicate rate: band every
    document by its composite quality score (the q_quality_score
    expression, bands = floor(score*10) clamped to 9) and report, per
    band, the population, how many docs are exact duplicates (md5 group
    size > 1), and the character mass. This is the validation table a
    curation pipeline reads before trusting a score threshold: if the
    duplicate rate does NOT fall as the band rises, the score is not
    measuring quality and the q_curation_pipeline gate is miscalibrated.
    Banding is a pure per-row map (no global quantile window — the band
    edges are fixed, not data-dependent); min/max score per band are raw
    per-row doubles with no cross-row arithmetic, so both engines agree
    bit-for-bit.

    Scale: one shuffle on the 16-byte digest scores the duplicate flag
    (the q_dedup_exact shape), one combinable groupBy over 10 bands folds
    the rest map-side; output is <= 10 rows. At 100 TB both shuffles
    carry only (digest, band, n_chars, score) — never text.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tok
    avg_len = token_total_len(toks).cast("double") / n_tok
    score = (
        0.4 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + 0.3 * ttr
        + 0.3 * F.least(avg_len / 8.0, F.lit(1.0))
    )
    scored = d.select(
        "n_chars", F.md5("text").alias("fp"), score.alias("score")
    )
    wfp = Window.partitionBy("fp")
    flagged = scored.select(
        F.least(F.lit(9), F.floor(F.col("score") * 10))
        .cast("int")
        .alias("score_band"),
        "n_chars",
        "score",
        (F.count(F.lit(1)).over(wfp) > 1).alias("is_dup"),
    )
    return flagged.groupBy("score_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


@query(
    "q_freq_spectrum",
    oracle="""
WITH words AS (
  SELECT d.source, w.word
  FROM documents d, UNNEST(string_split(d.text, ' ')) AS w(word)
  WHERE w.word <> ''
), freqs AS (
  SELECT source, word, COUNT(*) AS f
  FROM words GROUP BY source, word
), octaves AS (
  SELECT source,
         CAST(length(bin(f)) - 1 AS INT) AS octave,
         f
  FROM freqs
)
SELECT source, octave,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(f) AS BIGINT) AS n_tokens
FROM octaves
GROUP BY source, octave
""",
)
def q_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-frequency spectrum per source in OCTAVE buckets — types and
    token mass with frequency in [2^k, 2^(k+1)) — the Zipf/Heaps corpus
    diagnostic WITHOUT fitting a slope: a healthy natural-language source
    shows type counts decaying roughly geometrically across octaves
    (hapaxes dominating types, high octaves dominating tokens); a scraped
    or template-generated source shows a hole in the low octaves or a
    spike at one high frequency. Octave = bit_length(f) - 1 (== the
    mathematical floor(log2(f)) for f >= 1) is computed INTEGER-exactly
    on both engines — Spark `length(conv(f, 10, 2)) - 1`, DuckDB
    `length(bin(f)) - 1` — rather than via floating log2: Spark's LOG2
    lowers to ln(x)/ln(2) (two libm ops, not a correctly-rounded log2),
    so exactness at power-of-two boundaries would be platform luck, not
    a guarantee (ADVICE r14).

    Scale: ONE corpus-sized combinable groupBy(source, word) builds the
    frequency relation (the q_vocab_growth shuffle, word histograms are
    the cheapest corpus rollup there is), then the octave fold is a
    map-only expression and the closing rollup runs on |sources| x
    |octaves| (~20 x ~20) keys, map-side combined. At 100 TB the word
    histogram is ~1e7 rows against 1e11 corpus words and the spectrum is
    planner-sized — the same one-pass shape the BPE trainer reads.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    words = fan_out(d, spark).select(
        "source", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    freqs = words.groupBy("source", "word").agg(F.count(F.lit(1)).alias("f"))
    octed = freqs.select(
        "source",
        (F.length(F.conv(F.col("f").cast("string"), 10, 2)) - 1)
        .cast("int")
        .alias("octave"),
        "f",
    )
    return octed.groupBy("source", "octave").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("f").cast("bigint").alias("n_tokens"),
    )


# q_ngram_novelty shingle width: 5-grams, the q_boilerplate_phrases
# grain — long enough that reuse means real phrase reuse, short enough
# that every doc yields shingles.
NOVELTY_N = 5


@query(
    "q_ngram_novelty",
    oracle=f"""
WITH bounds AS (
  SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS cut FROM documents
), w AS (
  SELECT d.doc_id, d.source, d.doc_id >= b.cut AS is_new,
         string_split(d.text, ' ') AS t
  FROM documents d CROSS JOIN bounds b
  WHERE len(string_split(d.text, ' ')) >= {NOVELTY_N}
), g AS (
  SELECT source, is_new,
         md5(array_to_string(t[CAST(i AS INT):CAST(i AS INT) + {NOVELTY_N - 1}], ' '))
           AS gh
  FROM w, UNNEST(range(1, len(t) - {NOVELTY_N - 2})) AS u(i)
), old_set AS (
  SELECT DISTINCT gh FROM g WHERE NOT is_new
), new_grams AS (
  SELECT source, gh FROM g WHERE is_new GROUP BY source, gh
)
SELECT n.source,
       CAST(COUNT(*) AS BIGINT) AS n_new_grams,
       CAST(SUM(CASE WHEN o.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_seen_before,
       CAST(FLOOR(1000000.0
            * (COUNT(*) - SUM(CASE WHEN o.gh IS NOT NULL THEN 1 ELSE 0 END))
            / COUNT(*)) AS BIGINT) AS novelty_ppm
FROM new_grams n LEFT JOIN old_set o ON n.gh = o.gh
GROUP BY n.source
""",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-slice NOVELTY: how much genuinely new phrase content the
    second half of the crawl (doc_id >= (min+max) DIV 2, id as crawl
    order) adds over the first — per source, the distinct {NOVELTY_N}-gram
    digests of the new half, how many were already present anywhere in
    the old half, and the novelty rate in ppm. This is the
    continued-pretraining planning number: a source whose novelty decays
    toward zero across crawl slices is exhausted (more epochs of the old
    data, q_epoch_plan), while q_boilerplate_phrases counts repetition
    within one corpus and q_decontaminate checks a SPLIT boundary —
    neither measures marginal new content per slice.

    Determinism: the cut is pure integer arithmetic on ids; membership
    is md5-digest equality; the rate is one double divide of exact
    integers floored to ppm (single-IEEE-op policy).

    Scale (the q_decontaminate hash-first policy): shingles are md5'd at
    the scan — only 16-byte digests ever shuffle, text never does. One
    digest-keyed distinct per half (combinable), then a digest equi-join
    of the new half's distinct grams against the old-half set (both
    sides hash-partitioned on the digest, no broadcast of anything
    corpus-sized), and a |sources|-row closing rollup. At 100 TB each
    half's distinct-shingle relation is the dedup family's banded-join
    scale, and the join carries no skew by construction (md5 keys are
    uniform)."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    bounds = d.agg(
        F.expr("(min(doc_id) + max(doc_id)) DIV 2").cast("long").alias("cut")
    )
    w = (
        fan_out(d.filter(F.size(t) >= NOVELTY_N), spark)
        .crossJoin(F.broadcast(bounds))
        .select(
            "source",
            (F.col("doc_id") >= F.col("cut")).alias("is_new"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - NOVELTY_N),
                    lambda i: F.md5(F.array_join(F.slice(t, i + 1, NOVELTY_N), " ")),
                )
            ).alias("gh"),
        )
    )
    w = cache_scoped(w)
    old_set = w.filter(~F.col("is_new")).select("gh").distinct()
    new_grams = w.filter(F.col("is_new")).select("source", "gh").distinct()
    joined = new_grams.join(
        old_set.withColumn("seen", F.lit(1)), "gh", "left"
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_grams"),
        F.sum(F.when(F.col("seen").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_seen_before"),
        F.floor(
            F.lit(1000000.0)
            * (
                F.count(F.lit(1))
                - F.sum(F.when(F.col("seen").isNotNull(), 1).otherwise(0))
            )
            / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("novelty_ppm"),
    )


@query(
    "q_langid_confusion",
    oracle=f"""
WITH pred AS (
  SELECT lang,
         CASE WHEN len(list_filter(string_split(text, ' '),
                                   t -> t IN ({_STOP_SQL})))
                   / len(string_split(text, ' ')) >= 0.05
              THEN 'en' ELSE 'und' END AS predicted_lang
  FROM documents
), cells AS (
  SELECT lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY lang, predicted_lang
)
SELECT lang, predicted_lang, n_docs,
       CAST((1000000 * n_docs) //
            SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS ppm_of_lang
FROM cells
""",
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID QUALITY AUDIT: the confusion matrix of q_lang_id's
    stopword heuristic against the corpus' ground-truth ``lang`` label —
    per (truth, prediction) cell counts plus each cell's share of its
    truth row in ppm. This is the calibration table a curation owner
    reads before trusting the language gate: the en row's 'en' cell is
    the gate's recall, the non-en rows' 'en' cells are the contamination
    it lets through (q_quality_calibration plays the same role for the
    quality score). Integer-exact: the threshold decision is one
    int/int-division compare (engine-identical IEEE, the q_lang_id
    invariant) and the ppm share is bigint DIV.

    Scale: map-only flagging on the scan, then a combinable groupBy on
    |langs| x 2 keys; the window runs over the CELL relation (~10
    rows). The 100 TB cost is one corpus pass — the same pass the gate
    itself costs.
    """
    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    toks = tokens(F.col("text"))
    ratio = en_stopword_count(toks) / F.size(toks)
    cells = (
        d.select(
            "lang",
            F.when(ratio >= 0.05, "en").otherwise("und").alias(
                "predicted_lang"
            ),
        )
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "predicted_lang",
        "n_docs",
        F.expr("1000000 * n_docs").alias("_scaled"),
        F.sum("n_docs").over(w).alias("_row_total"),
    ).select(
        "lang",
        "predicted_lang",
        "n_docs",
        F.expr("_scaled DIV _row_total").cast("bigint").alias("ppm_of_lang"),
    )


# Chunk width (tokens) for the code-switching audit: wide enough that a
# genuinely-English chunk clears the stopword gate, narrow enough that a
# pasted foreign block dominates its own chunks.
CHUNK_TOKENS = 32


@query(
    "q_chunk_langid_mix",
    oracle=f"""
WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
per_doc AS (
  SELECT source,
         (len(t) + {CHUNK_TOKENS - 1}) // {CHUNK_TOKENS} AS n_chunks,
         len(list_filter(range(0, (len(t) + {CHUNK_TOKENS - 1}) // {CHUNK_TOKENS}),
             ci -> len(list_filter(t[ci*{CHUNK_TOKENS}+1 : ci*{CHUNK_TOKENS}+{CHUNK_TOKENS}],
                                   w -> w IN ({_STOP_SQL})))
                   / len(t[ci*{CHUNK_TOKENS}+1 : ci*{CHUNK_TOKENS}+{CHUNK_TOKENS}])
                   >= {LANG_GATE_RATIO})) AS n_en
  FROM toks
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_en = n_chunks THEN 1 ELSE 0 END) AS BIGINT)
           AS n_all_en,
       CAST(SUM(CASE WHEN n_en = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_all_und,
       CAST(SUM(CASE WHEN n_en > 0 AND n_en < n_chunks THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mixed,
       CAST((1000000 * SUM(CASE WHEN n_en > 0 AND n_en < n_chunks
                                THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
           AS mixed_ppm
FROM per_doc
GROUP BY source
""",
)
def q_chunk_langid_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CODE-SWITCHING audit — the within-document blind spot of
    q_lang_id's whole-doc ratio: a doc that is 80% English with a pasted
    foreign block still clears the doc-level gate, but its non-English
    chunks poison the training mix. Each document is split into
    {CHUNK_TOKENS}-token chunks, each chunk classified by the SAME
    stopword-ratio rule as the doc-level gate (LANG_GATE_RATIO — one
    constant, cannot drift), and per source the corpus reports how many
    docs are chunk-uniformly English, uniformly non-English, or MIXED
    (some chunks each way — the code-switching candidates a curation
    pass should segment rather than keep or drop whole). Integer-exact:
    chunk flags are int compares on one int/int IEEE division, rollups
    are bigint, mixed share is bigint-DIV ppm.

    Scale: the chunk loop is an ARRAY expression (sequence + filter +
    slice inside whole-stage codegen) — per-doc work proportional to
    doc length with NO explode, no per-chunk rows, nothing leaves the
    row until the per-source combinable groupBy. One corpus pass, one
    |sources|-key shuffle; the same shape at 100 TB.
    """
    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    t = tokens(F.col("text"))
    base = d.select("source", t.alias("t")).withColumn(
        "n_chunks",
        F.expr(f"(size(t) + {CHUNK_TOKENS - 1}) DIV {CHUNK_TOKENS}"),
    )
    chunk_ids = F.sequence(F.lit(0), F.col("n_chunks") - 1)

    def _chunk_is_en(ci):
        chunk = F.slice(F.col("t"), ci * CHUNK_TOKENS + 1, CHUNK_TOKENS)
        return en_stopword_count(chunk) / F.size(chunk) >= LANG_GATE_RATIO

    per_doc = base.select(
        "source",
        "n_chunks",
        F.size(F.filter(chunk_ids, _chunk_is_en)).alias("n_en"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_en") == F.col("n_chunks"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_all_en"),
        F.sum(F.when(F.col("n_en") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_all_und"),
        F.sum(
            F.when(
                (F.col("n_en") > 0) & (F.col("n_en") < F.col("n_chunks")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_mixed"),
    ).select(
        "source",
        "n_docs",
        "n_all_en",
        "n_all_und",
        "n_mixed",
        F.expr("(1000000 * n_mixed) DIV n_docs")
        .cast("bigint")
        .alias("mixed_ppm"),
    )


# Candidate quality-gate thresholds (micros) for q_quality_gate_sweep:
# brackets the production QUALITY_GATE (0.5 -> 500000) symmetrically.
QUALITY_SWEEP_MICROS = (300000, 400000, 500000, 600000, 700000)

# Candidate language-gate stopword-ratio thresholds (ppm) for
# q_langid_gate_sweep: brackets the production LANG_GATE_RATIO
# (0.05 -> 50000).
LANG_SWEEP_PPM = (20000, 50000, 100000, 150000, 200000)


@query(
    "q_langid_gate_sweep",
    oracle=f"""
WITH flags AS (
  SELECT CAST(lang = 'en' AS INT) AS true_en,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> t IN ({_STOP_SQL}))) AS BIGINT) AS stop_cnt,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
), tot AS (
  SELECT CAST(COALESCE(SUM(true_en), 0) AS BIGINT) AS true_en_total
  FROM flags
)
SELECT CAST(g.thr AS INT) AS threshold_ppm,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM flags f
        WHERE 1000000 * f.stop_cnt >= g.thr * f.n_toks) AS n_kept,
       (SELECT CAST(COALESCE(SUM(f.true_en), 0) AS BIGINT) FROM flags f
        WHERE 1000000 * f.stop_cnt >= g.thr * f.n_toks) AS n_true_en_kept,
       CAST((1000000 * (SELECT COALESCE(SUM(f.true_en), 0) FROM flags f
                        WHERE 1000000 * f.stop_cnt >= g.thr * f.n_toks))
            // NULLIF(tot.true_en_total, 0) AS BIGINT) AS recall_ppm,
       CAST((1000000 * (SELECT COUNT(*) - COALESCE(SUM(f.true_en), 0)
                        FROM flags f
                        WHERE 1000000 * f.stop_cnt >= g.thr * f.n_toks))
            // NULLIF((SELECT COUNT(*) FROM flags f
                       WHERE 1000000 * f.stop_cnt >= g.thr * f.n_toks), 0)
            AS BIGINT) AS contamination_ppm
FROM (SELECT UNNEST({list(LANG_SWEEP_PPM)}) AS thr) g
CROSS JOIN tot
""",
)
def q_langid_gate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE SHOULD THE LANGUAGE GATE SIT? The recall/contamination
    curve for the stopword-ratio gate against the ground-truth ``lang``
    label: for each candidate threshold (ppm, bracketing the production
    LANG_GATE_RATIO), how many docs the gate keeps, how many of those
    are truly English (recall against the true-English population), and
    what fraction of the kept set is contamination. q_langid_confusion
    audits the production threshold; this table prices MOVING it — the
    ROC-style evidence read before trading recall for purity. ZERO
    float arithmetic anywhere: the gate decision is the pure-integer
    compare ``1e6 * stopwords >= thr * tokens`` (no division at all),
    counts are bigint, shares bigint-DIV ppm with NULLIF degradation on
    empty populations.

    Scale: ONE corpus pass — map-only token counting, all
    |thresholds| x 2 conditional sums folded into a SINGLE combinable
    1-row aggregate, grid unpivoted from that row via stack (the
    q_quality_gate_sweep shape).
    """
    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    toks = tokens(F.col("text"))
    flags = d.select(
        (F.col("lang") == "en").cast("int").alias("true_en"),
        en_stopword_count(toks).cast("long").alias("stop_cnt"),
        F.size(toks).cast("long").alias("n_toks"),
    )
    aggs = [
        F.coalesce(F.sum("true_en"), F.lit(0))
        .cast("bigint")
        .alias("true_en_total")
    ]
    for thr in LANG_SWEEP_PPM:
        kept = F.lit(1000000) * F.col("stop_cnt") >= F.lit(thr) * F.col(
            "n_toks"
        )
        aggs.append(
            F.coalesce(F.sum(F.when(kept, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(f"k_{thr}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(kept, F.col("true_en")).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias(f"e_{thr}")
        )
    one = flags.agg(*aggs)
    stack_args = ", ".join(f"{thr}, k_{thr}, e_{thr}" for thr in LANG_SWEEP_PPM)
    return one.selectExpr(
        f"stack({len(LANG_SWEEP_PPM)}, {stack_args}) "
        "AS (threshold_ppm, n_kept, n_true_en_kept)",
        "true_en_total",
    ).selectExpr(
        "CAST(threshold_ppm AS INT) AS threshold_ppm",
        "CAST(n_kept AS BIGINT) AS n_kept",
        "CAST(n_true_en_kept AS BIGINT) AS n_true_en_kept",
        "CAST((1000000 * n_true_en_kept) DIV NULLIF(true_en_total, 0)"
        " AS BIGINT) AS recall_ppm",
        "CAST((1000000 * (n_kept - n_true_en_kept)) DIV NULLIF(n_kept, 0)"
        " AS BIGINT) AS contamination_ppm",
    )


@query(
    "q_quality_gate_sweep",
    # scored comes from the SHARED stage fragment so the sweep prices the
    # same score the pipeline gates on.
    oracle="WITH "
    + _CURATION_STAGES_SQL
    + f""",
lang_passed AS (
  SELECT CAST(FLOOR(1000000.0 * quality) AS BIGINT) AS q_micros,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM scored WHERE en_ratio >= {LANG_GATE_RATIO}
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS d,
         CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t
  FROM lang_passed
)
SELECT CAST(g.thr AS INT) AS threshold_micros,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lang_passed p
        WHERE p.q_micros >= g.thr) AS n_docs,
       (SELECT CAST(COALESCE(SUM(p.n_tokens), 0) AS BIGINT)
        FROM lang_passed p WHERE p.q_micros >= g.thr) AS n_tokens,
       CAST((1000000 * (SELECT COUNT(*) FROM lang_passed p
                        WHERE p.q_micros >= g.thr))
            // NULLIF(tot.d, 0) AS BIGINT) AS docs_kept_ppm,
       CAST((1000000 * (SELECT COALESCE(SUM(p.n_tokens), 0)
                        FROM lang_passed p WHERE p.q_micros >= g.thr))
            // NULLIF(tot.t, 0) AS BIGINT) AS tokens_kept_ppm
FROM (SELECT UNNEST({list(QUALITY_SWEEP_MICROS)}) AS thr) g
CROSS JOIN tot
""",
)
def q_quality_gate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE SHOULD THE QUALITY GATE SIT? The retention-vs-threshold
    curve for the flagship pipeline's quality stage: for each candidate
    threshold (micros, bracketing the production QUALITY_GATE), the
    documents and token mass the gate would keep out of the
    lang-gate-passed population, in absolute counts and ppm. Read next
    to q_quality_calibration (is the score trustworthy?) — this table
    answers the follow-up: what does each notch of the knob COST in
    training tokens. A cliff between two notches means the score is
    bimodal there (gate safely); a linear slope means every tightening
    buys quality linearly with data loss. Integer-exact: the score is
    floored to micros (one identical per-row IEEE expression), counts
    and token sums are bigint, shares bigint-DIV ppm.

    Scale: ONE corpus pass — map-only scoring, then all
    |thresholds| x 2 conditional sums fold into a SINGLE combinable
    1-row aggregate (no per-threshold rescans, no explode: the grid
    unpivots from that one row via stack). The same pass shape at
    100 TB costs exactly one scan + one 1-row exchange.
    """
    from ..operators.curation import quality_score

    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    toks = tokens(F.col("text"))
    en_ratio = en_stopword_count(toks) / F.size(toks)
    p = d.select(
        en_ratio.alias("en_ratio"),
        F.floor(F.lit(1000000.0) * quality_score(F.col("text")))
        .cast("long")
        .alias("q_micros"),
        F.size(toks).cast("long").alias("n_tokens"),
    ).filter(F.col("en_ratio") >= LANG_GATE_RATIO)
    # coalesce(sum, 0): an all-non-English corpus must yield the full
    # 5-row grid with zero counts (and NULL shares), matching the
    # grid-driven oracle — a global agg over zero rows sums to NULL
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("d_tot"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint").alias("t_tot"),
    ]
    for thr in QUALITY_SWEEP_MICROS:
        kept = F.col("q_micros") >= thr
        aggs.append(
            F.coalesce(F.sum(F.when(kept, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(f"d_{thr}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias(f"t_{thr}")
        )
    one = p.agg(*aggs)
    stack_args = ", ".join(
        f"{thr}, d_{thr}, t_{thr}" for thr in QUALITY_SWEEP_MICROS
    )
    return one.selectExpr(
        f"stack({len(QUALITY_SWEEP_MICROS)}, {stack_args}) "
        "AS (threshold_micros, n_docs, n_tokens)",
        "d_tot",
        "t_tot",
    ).selectExpr(
        "CAST(threshold_micros AS INT) AS threshold_micros",
        "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_tokens AS BIGINT) AS n_tokens",
        # NULLIF: an all-non-English corpus yields NULL shares on both
        # engines instead of an ANSI divide-by-zero abort
        "CAST((1000000 * n_docs) DIV NULLIF(d_tot, 0) AS BIGINT) AS docs_kept_ppm",
        "CAST((1000000 * n_tokens) DIV NULLIF(t_tot, 0) AS BIGINT)"
        " AS tokens_kept_ppm",
    )


@query(
    "q_gate_interaction",
    # q_micros comes from the SHARED _QSCORE_SQL fragment (ADVICE r16:
    # re-inlining the composite score here would silently desync this
    # oracle from the gate the sweeps price if the weights ever move);
    # only the integer stop_cnt/n_toks columns are stated inline.
    oracle=f"""
WITH flags AS (
  SELECT CAST(len(list_filter(string_split(text, ' '),
                              t -> t IN ({_STOP_SQL}))) AS BIGINT) AS stop_cnt,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         CAST(FLOOR(1000000.0 * ({_QSCORE_SQL})) AS BIGINT) AS q_micros
  FROM documents
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS d,
         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS t
  FROM flags
)
SELECT CAST(g.lt AS INT) AS lang_thr_ppm,
       CAST(g.qt AS INT) AS quality_thr_micros,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM flags f
        WHERE 1000000 * f.stop_cnt >= g.lt * f.n_toks
          AND f.q_micros >= g.qt) AS n_docs,
       (SELECT CAST(COALESCE(SUM(f.n_toks), 0) AS BIGINT) FROM flags f
        WHERE 1000000 * f.stop_cnt >= g.lt * f.n_toks
          AND f.q_micros >= g.qt) AS n_tokens,
       CAST((1000000 * (SELECT COALESCE(SUM(f.n_toks), 0) FROM flags f
                        WHERE 1000000 * f.stop_cnt >= g.lt * f.n_toks
                          AND f.q_micros >= g.qt))
            // NULLIF(tot.t, 0) AS BIGINT) AS tokens_kept_ppm
FROM (SELECT lt.lt, qt.qt
      FROM (SELECT UNNEST({list(LANG_SWEEP_PPM)}) AS lt) lt
      CROSS JOIN (SELECT UNNEST({list(QUALITY_SWEEP_MICROS)}) AS qt) qt) g
CROSS JOIN tot
""",
)
def q_gate_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JOINT gate grid that completes the knob story: the two sweeps
    (q_langid_gate_sweep, q_quality_gate_sweep) price each gate with the
    other held at production, but the gates INTERACT — the quality
    score's length and diversity terms correlate with stopword ratio —
    so the pair that hits a token budget is not the pair the marginal
    curves suggest. This is the |lang thresholds| x |quality thresholds|
    retention surface (docs, tokens, token share of the WHOLE corpus in
    ppm) a curation owner reads to place both knobs at once. Integer-
    exact end to end: the language decision is the pure-integer compare
    1e6*stopwords >= thr*tokens, quality is an integer-micros compare,
    counts bigint, shares bigint-DIV ppm with NULLIF degradation.

    Scale: ONE corpus pass — map-only integer flagging, all 25x2
    conditional sums folded into a SINGLE combinable 1-row aggregate,
    the grid unpivoted from that row via stack. Growing either grid
    only widens the aggregate row, never adds a pass.
    """
    from ..operators.curation import quality_score

    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    toks = tokens(F.col("text"))
    flags = d.select(
        en_stopword_count(toks).cast("long").alias("stop_cnt"),
        F.size(toks).cast("long").alias("n_toks"),
        F.floor(F.lit(1000000.0) * quality_score(F.col("text")))
        .cast("long")
        .alias("q_micros"),
    )
    aggs = [
        F.coalesce(F.sum("n_toks"), F.lit(0)).cast("bigint").alias("t_tot")
    ]
    cells = []
    for lt in LANG_SWEEP_PPM:
        for qt in QUALITY_SWEEP_MICROS:
            kept = (
                F.lit(1000000) * F.col("stop_cnt")
                >= F.lit(lt) * F.col("n_toks")
            ) & (F.col("q_micros") >= qt)
            aggs.append(
                F.coalesce(F.sum(F.when(kept, 1).otherwise(0)), F.lit(0))
                .cast("bigint")
                .alias(f"d_{lt}_{qt}")
            )
            aggs.append(
                F.coalesce(
                    F.sum(F.when(kept, F.col("n_toks")).otherwise(0)),
                    F.lit(0),
                )
                .cast("bigint")
                .alias(f"t_{lt}_{qt}")
            )
            cells.append((lt, qt))
    one = flags.agg(*aggs)
    stack_args = ", ".join(
        f"{lt}, {qt}, d_{lt}_{qt}, t_{lt}_{qt}" for lt, qt in cells
    )
    return one.selectExpr(
        f"stack({len(cells)}, {stack_args}) "
        "AS (lang_thr_ppm, quality_thr_micros, n_docs, n_tokens)",
        "t_tot",
    ).selectExpr(
        "CAST(lang_thr_ppm AS INT) AS lang_thr_ppm",
        "CAST(quality_thr_micros AS INT) AS quality_thr_micros",
        "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_tokens AS BIGINT) AS n_tokens",
        "CAST((1000000 * n_tokens) DIV NULLIF(t_tot, 0) AS BIGINT)"
        " AS tokens_kept_ppm",
    )


PRUNE_BUDGET_PPM = 400_000  # keep the best 40% of corpus tokens


@query(
    "q_budget_prune",
    # q_micros comes from the SHARED _QSCORE_SQL fragment (the ADVICE-r16
    # rule: never re-inline the composite score in an oracle).
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         CAST(FLOOR(1000000.0 * ({{qscore}})) AS BIGINT) AS q_micros
  FROM documents
), tot AS (
  SELECT (SUM(n_toks) * {PRUNE_BUDGET_PPM}) // 1000000 AS budget FROM scored
), ordered AS (
  SELECT source, n_toks,
         SUM(n_toks) OVER (ORDER BY q_micros DESC, doc_id ASC
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM scored
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS tokens,
       CAST(SUM(CASE WHEN cum <= t.budget THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN cum <= t.budget THEN n_toks END), 0)
           AS BIGINT) AS tokens_kept,
       CAST((1000000 * COALESCE(SUM(CASE WHEN cum <= t.budget THEN n_toks END), 0))
            // SUM(n_toks) AS BIGINT) AS kept_token_ppm
FROM ordered CROSS JOIN tot t
GROUP BY source
""".format(qscore=_QSCORE_SQL),
)
def q_budget_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUDGET-CONSTRAINED quality pruning — "keep the best 40% of
    tokens" (PRUNE_BUDGET_PPM): rank the corpus by the
    shared quality score (ties on doc_id) and keep documents while the
    running token total fits the budget — the data-pruning move behind
    quality-filtered pretraining cuts, stated as the exact greedy
    knapsack on a TOTAL integer order so both engines keep the
    identical document set. Output is the per-source audit (docs and
    tokens kept vs present, kept share in ppm) — the view that shows
    which feeds the budget squeezes out.

    Scale: the oracle states a global running sum, but the registered
    plan NEVER sorts the corpus on one partition — the
    q_temporal_split_embargo two-phase quantile shape on the quality
    axis: (1) one combinable groupBy(q_micros DIV 1000) rolls the
    corpus to a ≤1001-row bucket relation, (2) a cumulative sum over
    that planner-sized rollup locates the BOUNDARY bucket and its
    remaining budget, (3) a rank window confined to that one
    ~1/1000-of-the-corpus bucket resolves the exact per-doc cut.
    Higher buckets keep wholesale, lower drop wholesale; the boundary
    relation broadcasts back (1 row), the keep flag is a pure map, and
    the audit one combinable groupBy(source). The boundary bucket's
    per-doc keeps fold into a per-SOURCE tally that joins the wholesale
    audit on the |sources|-row key — the boundary never joins back to
    the corpus row-by-row (a corpus/1000-sized broadcast would not
    survive 100 TB)."""
    from ..operators.curation import quality_score

    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    scored = cache_scoped(
        d.select(
            "doc_id",
            "source",
            F.size(tokens(F.col("text"))).cast("long").alias("n_toks"),
            F.floor(F.lit(1000000.0) * quality_score(F.col("text")))
            .cast("long")
            .alias("q_micros"),
        ).withColumn("qb", F.expr("q_micros DIV 1000").cast("long"))
    )
    from pyspark.sql import Window

    buckets = scored.groupBy("qb").agg(F.sum("n_toks").alias("c"))
    wcum = Window.orderBy(F.col("qb").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = buckets.select(
        "qb",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.expr(f"(sum(c) OVER () * {PRUNE_BUDGET_PPM}) DIV 1000000")
        .alias("budget"),
    )
    # the first bucket (quality-descending) that overflows the budget;
    # .agg over the 1-row limit makes the relation ALWAYS 1 row (nulls
    # when the whole corpus fits) so the broadcast never empties out
    boundary = (
        cum.filter(F.col("cum") > F.col("budget"))
        .orderBy(F.col("qb").desc())
        .limit(1)
        .select("qb", (F.col("budget") - (F.col("cum") - F.col("c"))).alias("rem"))
        .agg(F.max("qb").alias("b_star"), F.max("rem").alias("rem"))
    )
    wtie = Window.partitionBy("qb").orderBy(
        F.col("q_micros").desc(), F.col("doc_id").asc()
    )
    boundary_audit = (
        scored.join(F.broadcast(boundary), F.col("qb") == F.col("b_star"))
        .withColumn("wcum", F.sum("n_toks").over(wtie))
        .filter(F.col("wcum") <= F.col("rem"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("b_kept"),
            F.sum("n_toks").cast("long").alias("b_tokens"),
        )
    )
    base = (
        scored.crossJoin(F.broadcast(boundary.select("b_star")))
        .withColumn(
            "high", F.col("b_star").isNull() | (F.col("qb") > F.col("b_star"))
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("tokens"),
            F.sum(F.when(F.col("high"), 1).otherwise(0))
            .cast("long")
            .alias("h_kept"),
            F.coalesce(F.sum(F.when(F.col("high"), F.col("n_toks"))), F.lit(0))
            .cast("long")
            .alias("h_tokens"),
        )
    )
    return base.join(boundary_audit, "source", "left").select(
        "source",
        "n_docs",
        "tokens",
        (F.col("h_kept") + F.coalesce(F.col("b_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_kept"),
        (F.col("h_tokens") + F.coalesce(F.col("b_tokens"), F.lit(0)))
        .cast("bigint")
        .alias("tokens_kept"),
        F.expr(
            "CAST((1000000 * (h_tokens + coalesce(b_tokens, 0)))"
            " DIV tokens AS BIGINT)"
        ).alias("kept_token_ppm"),
    )


@query(
    "q_quality_length_corr",
    # quality comes from the SHARED scored CTE (_CURATION_STAGES_SQL) so
    # the score weights cannot drift between the gate and this audit.
    oracle="WITH "
    + _CURATION_STAGES_SQL
    + """,
per_doc AS (
  SELECT d.source,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS x,
         CAST(FLOOR(1000000.0 * s.quality) AS BIGINT) AS y
  FROM scored s JOIN documents d USING (doc_id)
), sums AS (
  SELECT source,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(y * y) AS HUGEINT) AS syy
  FROM per_doc GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       CAST((1000 * sx) // n AS BIGINT) AS mean_tokens_milli,
       CAST(sy // n AS BIGINT) AS mean_quality_micros,
       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
       END AS corr_lq
FROM sums
""",
)
def q_quality_length_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOES THE QUALITY SCORE JUST PROXY LENGTH? Per source, the Pearson
    correlation between a document's token count and its composite
    quality score (scaled to exact integer micros), plus the per-source
    means. A source whose correlation sits near 1.0 tells the curation
    owner the quality gate is re-implementing a length filter there —
    its diversity/token-length terms add nothing — while a near-zero or
    negative source says the gate carries real signal; that's the check
    to run before tightening QUALITY_GATE corpus-wide.

    Cross-engine exactness: the inputs are integers (token count; quality
    floored to micros — one identical per-row IEEE expression), all six
    sufficient statistics are EXACT integer sums (Spark DECIMAL(38,0)
    accumulators == DuckDB HUGEINT), and the final r is computed from
    those exact integers with one correctly-rounded cast each and single
    IEEE multiply/sqrt/divide ops — bit-identical on both engines with
    no decimal .5-boundary exposure. Zero-variance sources return NULL
    on both sides.

    Scale: one corpus pass, map-only scoring, ONE combinable
    groupBy(source) carrying six numeric accumulators — the same
    shuffle q_mixture_weights costs. The decimal accumulators hold to
    ~1e38, far past 100 TB token masses (sum of y^2 at 1e11 docs is
    ~1e23).
    """
    from ..operators.curation import quality_score

    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    t = tokens(F.col("text"))
    per_doc = d.select(
        "source",
        F.size(t).cast("long").alias("x"),
        F.floor(F.lit(1000000.0) * quality_score(F.col("text")))
        .cast("long")
        .alias("y"),
    )
    dec = "decimal(38,0)"
    sums = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    n_d = F.col("n").cast(dec)
    sx_d = F.col("sx").cast(dec)
    sy_d = F.col("sy").cast(dec)
    cov = n_d * F.col("sxy") - sx_d * sy_d
    varx = n_d * F.col("sxx") - sx_d * sx_d
    vary = n_d * F.col("syy") - sy_d * sy_d
    return sums.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.expr("(1000 * sx) DIV n").cast("bigint").alias("mean_tokens_milli"),
        F.expr("sy DIV n").cast("bigint").alias("mean_quality_micros"),
        F.when(
            (varx == F.lit(0)) | (vary == F.lit(0)),
            F.lit(None).cast("double"),
        )
        .otherwise(
            cov.cast("double")
            / F.sqrt(varx.cast("double") * vary.cast("double"))
        )
        .alias("corr_lq"),
    )


# Shared by q_curation_funnel and s_curation_funnel (streaming.py): the
# stream's per-batch partial counts must re-aggregate to EXACTLY this
# batch funnel, so both sides verify against one oracle text.
CURATION_FUNNEL_ORACLE = "WITH " + _CURATION_STAGES_SQL + f""",
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents),
k1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM scored
       WHERE en_ratio >= {LANG_GATE_RATIO}),
k2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM kept),
k3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM deduped)
SELECT * FROM (
  SELECT 0 AS stage_idx, 'ingest' AS stage, tot.c AS n_docs,
         CAST(0 AS BIGINT) AS n_dropped,
         CAST(1000000 AS BIGINT) AS retained_ppm
  FROM tot
  UNION ALL
  SELECT 1, 'lang_gate', k1.c, tot.c - k1.c,
         CAST((1000000 * k1.c) // tot.c AS BIGINT)
  FROM k1, tot
  UNION ALL
  SELECT 2, 'quality_gate', k2.c, k1.c - k2.c,
         CAST((1000000 * k2.c) // k1.c AS BIGINT)
  FROM k2, k1
  UNION ALL
  SELECT 3, 'exact_dedup', k3.c, k2.c - k3.c,
         CAST((1000000 * k3.c) // k2.c AS BIGINT)
  FROM k3, k2)
"""


@query("q_curation_funnel", oracle=CURATION_FUNNEL_ORACLE)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSS ACCOUNTING for the flagship curation pipeline: how many docs
    each successive stage of q_curation_pipeline keeps (ingest ->
    language gate -> quality gate -> exact dedup), what each stage
    dropped, and the stage-over-stage retention in ppm. This is the
    funnel a pipeline owner watches across crawls — a retention step
    change at one stage localizes a corpus regression (crawler drift, a
    gate threshold gone wrong, a duplicate storm) without diffing the
    output corpus. The gate expressions are the SHARED stage fragments
    of q_curation_pipeline (one copy — thresholds cannot drift between
    the pipeline and its audit).

    Integer-exact: counts are bigint, retention is bigint DIV.
    Scale: ONE corpus pass computes all flags map-only; stages 0-2 fold
    into a single combinable aggregate (conditional sums) and the dedup
    stage is the same 16-byte-digest distinct-count the pipeline itself
    shuffles — approx_count_distinct is the knob to pull at 100 TB if
    the exact count stops being worth its shuffle.
    """
    from ..operators.curation import quality_score

    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    toks = tokens(F.col("text"))
    en_ratio = en_stopword_count(toks) / F.size(toks)
    flags = d.select(
        (en_ratio >= LANG_GATE_RATIO).alias("lang_ok"),
        (quality_score(F.col("text")) >= QUALITY_GATE).alias("q_ok"),
        F.md5("text").alias("h"),
    )
    one = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum(F.when(F.col("lang_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("k1"),
        F.sum(F.when(F.col("lang_ok") & F.col("q_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("k2"),
        F.count_distinct(
            F.when(F.col("lang_ok") & F.col("q_ok"), F.col("h"))
        )
        .cast("bigint")
        .alias("k3"),
    )
    return one.selectExpr(
        """stack(4,
             0, 'ingest',       total, CAST(0 AS BIGINT), CAST(1000000 AS BIGINT),
             1, 'lang_gate',    k1,    total - k1,        (1000000 * k1) DIV total,
             2, 'quality_gate', k2,    k1 - k2,           (1000000 * k2) DIV k1,
             3, 'exact_dedup',  k3,    k2 - k3,           (1000000 * k3) DIV k2
           ) AS (stage_idx, stage, n_docs, n_dropped, retained_ppm)"""
    ).selectExpr(
        "CAST(stage_idx AS INT) AS stage_idx",
        "stage",
        "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_dropped AS BIGINT) AS n_dropped",
        "CAST(retained_ppm AS BIGINT) AS retained_ppm",
    )


# Vocabulary budget for q_vocab_coverage: the fixture corpus draws from
# a ~40-word vocabulary, so a 16-entry budget leaves a meaningful OOV
# tail at every SF; production uses the tokenizer's real vocab size.
VOCAB_BUDGET = 16


@query(
    "q_vocab_coverage",
    oracle=f"""
WITH words AS (
  SELECT d.source, w.word
  FROM documents d, UNNEST(string_split(d.text, ' ')) AS w(word)
  WHERE w.word <> ''
), hist AS (
  SELECT word, COUNT(*) AS c FROM words GROUP BY word
), vocab AS (
  SELECT word FROM (
    SELECT word, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rk FROM hist
  ) WHERE rk <= {VOCAB_BUDGET}
)
SELECT w.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
       CAST((1000000 * SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS oov_ppm,
       CAST(COUNT(DISTINCT CASE WHEN v.word IS NULL THEN w.word END)
            AS BIGINT) AS n_distinct_oov
FROM words w LEFT JOIN vocab v ON w.word = v.word
GROUP BY w.source
""",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary COVERAGE under a fixed budget: take the corpus' top
    {VOCAB_BUDGET} words by frequency as the vocabulary and report, per
    source, total tokens, out-of-vocabulary occurrences, the OOV rate in
    ppm, and how many distinct words fall outside the budget. This is
    the table a tokenizer owner reads next to q_bpe_capacity (how deep
    can the vocab go) and q_bpe_fertility (what each language pays):
    which FEEDS a fixed vocabulary underserves — a source whose OOV rate
    is an outlier either needs vocab budget or is noise. The vocab cut
    is a TOTAL integer order (count DESC, word ASC), so both engines
    pick identical boundary words; shares are bigint-DIV ppm.

    Scale: one combinable word-histogram groupBy (the q_vocab_growth /
    BPE shuffle), a row_number over the VOCABULARY-sized relation (~1e7
    rows at 100 TB — planner-sized next to the corpus), the vocab
    (budget rows) BROADCAST back onto the token stream, then one
    combinable per-source rollup. The corpus never shuffles for the
    membership test.
    """
    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    words = d.select(
        "source", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    hist = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        hist.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.col("c").desc(), "word")),
        )
        .filter(F.col("rk") <= VOCAB_BUDGET)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    tagged = words.join(F.broadcast(vocab), "word", "left")
    return tagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.expr(
            "(1000000 * sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)) "
            "DIV count(1)"
        )
        .cast("bigint")
        .alias("oov_ppm"),
        F.count_distinct(
            F.when(F.col("in_vocab").isNull(), F.col("word"))
        )
        .cast("bigint")
        .alias("n_distinct_oov"),
    )
