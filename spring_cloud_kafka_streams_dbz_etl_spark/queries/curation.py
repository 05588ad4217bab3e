"""Corpus-curation surface over `documents` (north-star extensions beyond
the reference: sampling, sequence packing, chunking for training/RAG).

No reference counterpart (BASELINE.json north star — "the operations a
large-scale training-data pipeline would need"). Everything here is either
a pure map (sampling, chunking: parquet-scan speed, embarrassingly
parallel) or a per-source window + partial agg (packing: one shuffle keyed
on `source`, parallel across sources/shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fan_out, table
from ..session import tune
from . import cache_scoped, query


@query(
    "q_stratified_sample",
    oracle="""
SELECT doc_id, source, rate_permille, bucket
FROM (
  SELECT doc_id, source,
         CAST(100 + (CAST(substr(source, 4, 10) AS INT) * 45) % 900 AS INT) AS rate_permille,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':sample-seed-7'), 1, 8)) AS BIGINT) % 1000 AS INT) AS bucket
  FROM documents)
WHERE bucket < rate_permille
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: each stratum (source) gets its own
    keep-rate; membership is md5(doc_id+seed) bucketing, not an RNG — so the
    sample is identical across runs, engines, partitionings and re-ingests
    (dataset-mixing weights for a training corpus must be reproducible;
    `sample()`/TABLESAMPLE RNGs are engine- and partitioning-specific).

    Scale: pure map + filter over the scan, no shuffle, no state; rates live
    in the expression (or a broadcast dim), so this runs at parquet-scan
    speed on any cluster size.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    rate = (F.lit(100) + (F.substring("source", 4, 10).cast("int") * 45) % 900).cast("int")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sample-seed-7"))), 1, 8), 16, 10)
        .cast("long") % 1000
    ).cast("int")
    return (
        d.select("doc_id", "source", rate.alias("rate_permille"), bucket.alias("bucket"))
        .filter(F.col("bucket") < F.col("rate_permille"))
    )


@query(
    "q_pack_sequences",
    oracle="""
SELECT source, bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM (
  SELECT source, n_tokens,
         CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS bin
  FROM (
    SELECT source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
             OVER (PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
    FROM documents))
GROUP BY source, bin
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: stream each stratum's docs in stable
    doc_id order, accumulate token counts, and assign each doc to the
    512-token bin where its first token lands (contiguous-fill packing —
    the deterministic relational form of example packing for LLM
    pretraining batches). Output is the per-bin manifest (doc count +
    token total), i.e. the packing plan a writer job would execute.

    Scale: one shuffle keyed on `source` for the running-sum window, then a
    partial-agg groupBy on the same key (no second shuffle — the window's
    partitioning is reused). Parallelism is bounded by stratum count; at
    100 TB you pre-shard the window key to (source, doc_id div S) so every
    shard packs independently — the bin formula is unchanged.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    staged = d.select("source", "doc_id", n_tokens.alias("n_tokens")).withColumn(
        "cum", F.sum("n_tokens").over(w)
    )
    return (
        staged.select(
            "source",
            "n_tokens",
            F.floor((F.col("cum") - F.col("n_tokens")) / 512).cast("long").alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
        )
    )


@query(
    "q_doc_chunks",
    oracle="""
SELECT doc_id,
       CAST(u.start / 150 AS INT) AS chunk_id,
       CAST(u.start AS INT) AS chunk_start,
       CAST(LENGTH(substr(text, CAST(u.start AS INT) + 1, 200)) AS INT) AS chunk_len,
       md5(substr(text, CAST(u.start AS INT) + 1, 200)) AS chunk_hash
FROM documents, UNNEST(range(0, GREATEST(1, LENGTH(text)), 150)) AS u(start)
""",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (200-char chunks, 150-char stride,
    50-char overlap) — the RAG / context-window segmentation pass. Emits a
    chunk manifest keyed by (doc_id, chunk_id) with a content hash, the
    form downstream dedup/embedding stages join on.

    Scale: generate-only (sequence + posexplode + substring), zero shuffle;
    output is ~len/stride rows per doc produced streaming from the scan —
    whole-stage codegen end to end, no Python.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    starts = F.sequence(F.lit(0), F.greatest(F.lit(0), F.length("text") - 1), F.lit(150))
    chunk = F.substring(F.col("text"), F.col("start") + 1, 200)
    return (
        d.select("doc_id", "text", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / 150).cast("int").alias("chunk_id"),
            F.col("start").cast("int").alias("chunk_start"),
            F.length(chunk).cast("int").alias("chunk_len"),
            F.md5(chunk).alias("chunk_hash"),
        )
    )


# Benchmark decontamination: documents with doc_id < DECON_BENCH_DOCS act
# as the held-out eval suite; any corpus document sharing a token n-gram
# with it is contamination a training corpus must drop (the n-gram overlap
# rule OpenAI/GPT-3 appendix C and The Pile popularized). 4-grams here
# (the synthetic corpus' ~40-word vocab makes longer grams vanishingly
# rare); real corpora use 8-13.
DECON_BENCH_DOCS = 25
DECON_N = 4


# Shared by q_decontaminate and s_decontaminate (streaming.py): the
# stream's per-batch contaminated-doc partials must re-aggregate to
# EXACTLY this batch pass, so both sides verify against one oracle text.
DECONTAMINATE_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id,
         md5(unnest(list_transform(range(1, len(t) - {DECON_N - 2}),
                                   i -> array_to_string(t[i:i+{DECON_N - 1}], ' ')))) AS gh
  FROM toks WHERE len(t) >= {DECON_N}
),
bench AS (SELECT DISTINCT gh, doc_id AS bench_doc FROM grams WHERE doc_id < {DECON_BENCH_DOCS}),
corpus AS (SELECT DISTINCT doc_id, gh FROM grams WHERE doc_id >= {DECON_BENCH_DOCS})
SELECT c.doc_id,
       CAST(COUNT(DISTINCT c.gh) AS BIGINT) AS n_shared_ngrams,
       CAST(COUNT(DISTINCT b.bench_doc) AS BIGINT) AS n_bench_docs
FROM corpus c JOIN bench b ON c.gh = b.gh
GROUP BY c.doc_id
"""


@query("q_decontaminate", bench=True, oracle=DECONTAMINATE_ORACLE)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag training documents sharing any token
    4-gram with the benchmark set (docs 0..24), with how many distinct
    grams and distinct benchmark docs each one collides with.

    Scale: grams are md5-hashed BEFORE the join, so only 32-byte digests
    shuffle — never gram text; the benchmark side is the eval suite
    (thousands of docs even for a big harness → millions of grams), small
    enough to BROADCAST against a corpus of any size, making the whole
    check a map-side hash probe + one groupBy on contaminated docs only.
    fan_out spreads the gram explode + md5 across the cluster (r17: the
    single-row-group fixture otherwise runs it in ONE task — the same
    compute-heavy-stage rule as q_dedup_docs; a real multi-row-group
    layout makes this a no-op) and lets both gram consumers (bench +
    corpus) reuse one scan exchange instead of re-scanning the parquet.
    """
    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(F.col("t")) - DECON_N),
        lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, DECON_N)),
    )
    g = (
        d.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= DECON_N)
        .select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", F.md5(F.col("gram")).alias("gh"))
    )
    bench = (
        g.filter(F.col("doc_id") < DECON_BENCH_DOCS)
        .select(F.col("gh"), F.col("doc_id").alias("bench_doc"))
        .distinct()
    )
    corpus = g.filter(F.col("doc_id") >= DECON_BENCH_DOCS).distinct()
    return (
        corpus.join(F.broadcast(bench), "gh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gh").alias("n_shared_ngrams"),
            F.countDistinct("bench_doc").alias("n_bench_docs"),
        )
    )


@query(
    "q_eval_gram_coverage",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id,
         md5(unnest(list_transform(range(1, len(t) - {DECON_N - 2}),
                                   i -> array_to_string(t[i:i+{DECON_N - 1}], ' ')))) AS gh
  FROM toks WHERE len(t) >= {DECON_N}
),
bench AS (SELECT DISTINCT doc_id AS bench_doc, gh FROM grams
          WHERE doc_id < {DECON_BENCH_DOCS}),
corpus AS (SELECT DISTINCT gh FROM grams WHERE doc_id >= {DECON_BENCH_DOCS})
SELECT b.bench_doc,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN c.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_covered,
       CAST((1000000 * SUM(CASE WHEN c.gh IS NOT NULL THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS coverage_ppm
FROM bench b LEFT JOIN corpus c ON b.gh = c.gh
GROUP BY b.bench_doc
""",
)
def q_eval_gram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-suite REPRESENTATIVITY — the inverse direction of
    q_decontaminate: for each benchmark document (docs 0..24, the same
    DECON_BENCH_DOCS convention), what fraction of its distinct token
    4-grams appears anywhere in the training corpus. Decontamination
    asks "did eval leak into train?"; this asks "does train even speak
    eval's language?" — a benchmark whose grams the corpus barely covers
    is testing out-of-distribution by accident, and a coverage step
    change across crawl cuts flags domain loss before a training run is
    wasted on it. Integer-exact: counts are bigint, coverage is
    bigint-DIV ppm.

    Scale: grams are md5-hashed before anything joins (16-byte digests,
    never gram text). The bench gram set is eval-suite-sized at any
    corpus scale, so it BROADCASTS; the corpus side is a map-side
    semi-join probe against it, and the only shuffle is the distinct
    over the MATCHED digests — bounded by |bench grams|, not the
    corpus. The per-bench-doc rollup then joins that covered set (also
    broadcast-sized) back. The corpus is read once, shuffles never.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(F.col("t")) - DECON_N),
        lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, DECON_N)),
    )
    g = (
        d.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= DECON_N)
        .select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", F.md5(F.col("gram")).alias("gh"))
    )
    bench = (
        g.filter(F.col("doc_id") < DECON_BENCH_DOCS)
        .select(F.col("doc_id").alias("bench_doc"), "gh")
        .distinct()
    )
    covered = (
        g.filter(F.col("doc_id") >= DECON_BENCH_DOCS)
        .join(F.broadcast(bench.select("gh").distinct()), "gh")
        .select("gh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        bench.join(F.broadcast(covered), "gh", "left")
        .groupBy("bench_doc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_covered"),
        )
        .select(
            "bench_doc",
            "n_grams",
            "n_covered",
            F.expr("(1000000 * n_covered) DIV n_grams")
            .cast("bigint")
            .alias("coverage_ppm"),
        )
    )


DSIR_BUCKETS = 1024
DSIR_TOP = 50


def token_bucket(tok_col) -> "F.Column":
    """The hashed-feature bucket both importance halves share (batch
    query and streaming featurizer — one definition so the feature
    space cannot drift): md5 leading 8 hex digits → bigint → mod
    DSIR_BUCKETS. SQL twin: CAST(('0x' || substr(md5(tok),1,8)) AS
    BIGINT) % DSIR_BUCKETS."""
    return (
        F.conv(F.substring(F.md5(tok_col), 1, 8), 16, 10).cast("long")
        % DSIR_BUCKETS
    )


def importance_rank(cor_counts: DataFrame, tgt: DataFrame) -> DataFrame:
    """Shared scoring tail of q_importance_select / s_importance_select
    (the mix_drift_shares / dup_timeline_rollup precedent — both halves
    re-aggregate through ONE tail and verify against ONE oracle text).
    ``cor_counts``: the featurized corpus (doc_id, b, cnt) — integer
    bucket counts per document; ``tgt``: the frozen target bucket
    counts (b, t_b). Everything downstream is bucket-table-sized or a
    combinable groupBy(doc_id); the top cut is a distributed
    sort-limit, the rank window runs on the DSIR_TOP-row result."""
    B = DSIR_BUCKETS
    totals = tgt.agg(
        F.coalesce(F.sum("t_b"), F.lit(0)).cast("long").alias("t_total")
    ).crossJoin(
        cor_counts.agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("q_total")
        )
    )
    q_b = cor_counts.groupBy("b").agg(F.sum("cnt").cast("long").alias("q_b"))
    ratio = (
        q_b.join(F.broadcast(tgt), "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.expr(
                f"(1000000 * (coalesce(t_b, 0) + 1) * (q_total + {B}))"
                f" DIV ((q_b + 1) * (t_total + {B}))"
            )
            .cast("long")
            .alias("ratio_micros"),
        )
    )
    scored = (
        cor_counts.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_toks"),
            F.sum(F.col("cnt") * F.col("ratio_micros"))
            .cast("long")
            .alias("score_micros"),
        )
        .withColumn("avg_micros", F.expr("score_micros DIV n_toks").cast("long"))
    )
    top = scored.orderBy(
        F.col("avg_micros").desc(), F.col("doc_id").asc()
    ).limit(DSIR_TOP)
    w = Window.partitionBy().orderBy(
        F.col("avg_micros").desc(), F.col("doc_id").asc()
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "doc_id", "n_toks", "score_micros", "avg_micros", "rank"
    )


# Shared by q_importance_select and s_importance_select (streaming.py):
# the stream's featurized per-batch partials must re-aggregate to
# EXACTLY this batch pass, so both halves verify against one oracle.
IMPORTANCE_SELECT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, u.tok,
         CAST(('0x' || substr(md5(u.tok), 1, 8)) AS BIGINT)
           % {DSIR_BUCKETS} AS b
  FROM documents, UNNEST(string_split(text, ' ')) AS u(tok)
), tgt AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS t_b FROM tok
  WHERE doc_id < {DECON_BENCH_DOCS} GROUP BY b
), cor AS (SELECT doc_id, b FROM tok WHERE doc_id >= {DECON_BENCH_DOCS}),
tot AS (
  SELECT (SELECT CAST(COALESCE(SUM(t_b), 0) AS BIGINT) FROM tgt) AS t_total,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cor) AS q_total
), q_b AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS q_b FROM cor GROUP BY b
), ratio AS (
  SELECT q_b.b,
         CAST((1000000 * (COALESCE(tgt.t_b, 0) + 1) * (tot.q_total + {DSIR_BUCKETS}))
              // ((q_b.q_b + 1) * (tot.t_total + {DSIR_BUCKETS})) AS BIGINT)
           AS ratio_micros
  FROM q_b LEFT JOIN tgt ON q_b.b = tgt.b CROSS JOIN tot
), scored AS (
  SELECT c.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_toks,
         CAST(SUM(r.ratio_micros) AS BIGINT) AS score_micros
  FROM cor c JOIN ratio r ON c.b = r.b
  GROUP BY c.doc_id
)
SELECT doc_id, n_toks, score_micros, avg_micros, rank FROM (
  SELECT doc_id, n_toks, score_micros,
         CAST(score_micros // n_toks AS BIGINT) AS avg_micros,
         CAST(ROW_NUMBER() OVER (
           ORDER BY score_micros // n_toks DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored)
WHERE rank <= {DSIR_TOP}
"""


@query("q_importance_select", oracle=IMPORTANCE_SELECT_ORACLE)
def q_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted DATA SELECTION by hashed n-gram importance weighting —
    the DSIR shape (Xie et al. 2023): score every corpus document by
    how much its token distribution looks like a fixed TARGET domain
    sample (the first {DECON_BENCH_DOCS} docs, the bench-docs
    convention) relative to the raw corpus, then keep the top
    {DSIR_TOP}. Features are hashed token buckets (md5 → {DSIR_BUCKETS}
    buckets — DSIR's hashed n-grams); each bucket gets an
    add-one-smoothed target/corpus probability ratio, and a document's
    score is the sum of its token occurrences' bucket ratios,
    length-normalized for the selection key. Deliberately INTEGER
    arithmetic end to end: the ratio is the micro-scaled integer
    quotient (1e6·(t_b+1)·(Q+B)) DIV ((q_b+1)·(T+B)) and the per-doc
    aggregate is a bigint sum — the same libm-free policy that turned
    pow() into repeated multiplies in q_lsh_band_plan, here replacing
    DSIR's log-ratio sum with a rational-ratio sum so both engines
    hash-agree (the ranking intent — up-weight buckets the target
    over-represents — is preserved; the docstring, not the oracle, is
    where the log≈ratio substitution is owned). Completes the mixture
    family: q_mixture_weights re-weights SOURCES, this selects
    DOCUMENTS toward a domain.

    Scale: the bucket tables are ≤{DSIR_BUCKETS} rows — broadcast by
    construction at any corpus size; totals ride a 1-row broadcast. The
    corpus-sized work is one token explode + map-side broadcast joins
    folded into one combinable groupBy(doc_id). The top-{DSIR_TOP} cut
    is a global sort-limit (TakeOrderedAndProject — distributed top-k,
    no single-reducer corpus window); the rank column is computed on
    the {DSIR_TOP}-row result. The featurize → score tail is shared
    verbatim with s_importance_select (token_bucket /
    importance_rank)."""
    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark).select("doc_id", "text")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).select("doc_id", token_bucket(F.col("tok")).alias("b"))
    tgt = (
        tok.filter(F.col("doc_id") < DECON_BENCH_DOCS)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("t_b"))
    )
    cor_counts = cache_scoped(
        tok.filter(F.col("doc_id") >= DECON_BENCH_DOCS)
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return importance_rank(cor_counts, tgt)


@query(
    "q_mixture_weights",
    oracle="""
WITH per_src AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), w AS (
  SELECT source, tokens,
         CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE)) * 1000000) AS BIGINT) AS w_int
  FROM per_src
)
SELECT source, tokens,
       ROUND(CAST(tokens AS DOUBLE) / SUM(tokens) OVER (), 6) AS actual_share,
       ROUND(CAST(w_int AS DOUBLE) / SUM(w_int) OVER (), 6) AS target_share,
       ROUND((CAST(w_int AS DOUBLE) / SUM(w_int) OVER ())
             / (CAST(tokens AS DOUBLE) / SUM(tokens) OVER ()), 6) AS weight
FROM w
""",
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixture planning (temperature resampling, the
    multilingual/multi-source standard, alpha=0.5): per source, the
    corpus' ACTUAL token share and the TARGET share proportional to
    tokens^alpha, and the resulting sampling weight target/actual
    (>1 upsample, <1 downsample) — the table a training loader consumes
    to hit the planned mixture.

    Determinism: sqrt is IEEE-correctly-rounded, but a SUM of 20 doubles
    is accumulation-order-dependent — so the temperature weights are
    floored to integers (floor(sqrt(tokens)*1e6) BIGINT) before the
    global sum, making both totals exact integers; every division is
    then a single deterministic IEEE op on identical operands.

    Scale: one map-side-combinable groupBy(source); the global window
    runs over ONE row per source (mixtures have dozens of sources, not
    millions) — the only all-to-one step is bounded by design."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    per_src = fan_out(d, spark).groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias("tokens")
    )
    w_int = F.floor(F.sqrt(F.col("tokens").cast("double")) * 1000000).cast("long")
    win = Window.partitionBy()
    actual = F.col("tokens").cast("double") / F.sum("tokens").over(win)
    target = F.col("w_int").cast("double") / F.sum("w_int").over(win)
    return (
        per_src.withColumn("w_int", w_int)
        .select(
            "source",
            "tokens",
            F.round(actual, 6).alias("actual_share"),
            F.round(target, 6).alias("target_share"),
            F.round(target / actual, 6).alias("weight"),
        )
    )


@query(
    "q_temperature_sample",
    oracle="""
WITH per_src AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), w AS (
  SELECT source, tokens,
         CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE)) * 1000000) AS BIGINT) AS w_int
  FROM per_src
), rates AS (
  SELECT source,
         CAST(LEAST(1000000, FLOOR(
           1000000.0
           * (CAST(w_int AS DOUBLE) / SUM(w_int) OVER ())
           / (CAST(tokens AS DOUBLE) / SUM(tokens) OVER ()))) AS BIGINT)
         AS keep_ppm
  FROM w
)
SELECT d.doc_id, d.source, r.keep_ppm
FROM documents d JOIN rates r ON d.source = r.source
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp-sample-11'), 1, 12)) AS BIGINT)
      % 1000000 < r.keep_ppm
""",
)
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature resampling EXECUTED (the consumer of
    q_mixture_weights' plan): per-source keep rates proportional to
    weight = target_share/actual_share capped at 1 (downsample-only
    pass; upsampling is the loader's repeat-epoch job), then
    deterministic md5-bucket membership per doc — the same doc is kept
    or dropped identically across runs, engines and partitionings.

    Determinism: the temperature weights are floored to exact integers
    before the global sums (q_mixture_weights' trick), so keep_ppm is a
    single identical double expression floored on both engines; sampling
    is md5 arithmetic, not an RNG.

    Scale: rates are ONE row per source, broadcast onto a map-only
    filter — the corpus scan never shuffles; exactly how you'd thin a
    100 TB crawl to a planned mixture in one pass."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    per_src = fan_out(d, spark).groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias("tokens")
    )
    w_int = F.floor(F.sqrt(F.col("tokens").cast("double")) * 1000000).cast("long")
    win = Window.partitionBy()
    target = F.col("w_int").cast("double") / F.sum("w_int").over(win)
    actual = F.col("tokens").cast("double") / F.sum("tokens").over(win)
    rates = (
        per_src.withColumn("w_int", w_int)
        .select(
            F.col("source").alias("r_source"),
            F.least(
                F.lit(1000000).cast("bigint"),
                F.floor(F.lit(1000000.0) * target / actual).cast("bigint"),
            ).alias("keep_ppm"),
        )
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":temp-sample-11"))),
                1, 12,
            ),
            16, 10,
        ).cast("long") % 1000000
    )
    return (
        d.join(F.broadcast(rates), d.source == rates.r_source)
        .filter(bucket < F.col("keep_ppm"))
        .select("doc_id", "source", "keep_ppm")
    )


RESERVOIR_K = 10


@query(
    "q_reservoir_sample",
    oracle=f"""
SELECT doc_id, source, pick
FROM (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':resv-seed-3'), doc_id
         ) AS BIGINT) AS pick
  FROM documents)
WHERE pick <= {RESERVOIR_K}
""",
)
def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE per-stratum sampling (the reservoir contract — exactly
    k docs per source, vs q_stratified_sample's fixed-RATE contract):
    rank docs by a keyed md5 within each stratum and keep the k
    smallest. Equivalent to a uniform k-reservoir but deterministic:
    the same k docs win on any cluster size, partitioning, or re-run,
    and adding documents only ever displaces the largest hashes
    (bottom-k stability — an eviction is caused only by a new doc
    hashing below the cutoff, never by reordering).

    Scale: one shuffle on the stratum key; at extreme per-stratum
    cardinality the rank window swaps for a partial bottom-k aggregate
    (each partition keeps its local k smallest hashes, the merge keeps
    the global k — combinable, constant-size partials), same contract."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":resv-seed-3")))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).cast("long").alias("pick"))
        .filter(F.col("pick") <= RESERVOIR_K)
    )


@query(
    "q_dataset_card",
    oracle="""
WITH per_doc AS (
  SELECT doc_id, source, lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         md5(text) AS h
  FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
       ROUND(1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE) / COUNT(*), 6) AS dup_rate,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
FROM per_doc
GROUP BY source
""",
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics — the datasheet table every corpus release
    ships (per source: volume, token mass, exact-dup rate, language
    spread, length extremes). This is the reporting face of the curation
    family: one query, one artifact a consumer reads before training.

    Scale: ONE map-side-combinable aggregation keyed on source — tokens
    and hash computed in the scan projection, text never shuffles (the
    16-byte hash rides the exchange for the distinct count). The
    distinct-hash count is the only Expand; at extreme cardinality swap
    it for approx_count_distinct (q_approx_stats' documented trade)."""
    tune(spark)
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    per_doc = d.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.md5("text").alias("h"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.countDistinct("h").alias("n_unique"),
        F.round(
            F.lit(1.0) - F.countDistinct("h").cast("double") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
    )


N_SHUFFLE_SHARDS = 32


@query(
    "q_corpus_shuffle",
    oracle=f"""
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
FROM (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR) || ':shuffle-seed-7') AS h,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuffle-seed-7'), 1, 8)) AS BIGINT) % {N_SHUFFLE_SHARDS} AS INT) AS shard
  FROM documents)
""",
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle — the "randomize the training
    order" primitive: every document gets a stable pseudo-random
    (shard, position) from md5(doc_id + seed), so the written order is
    reproducible across runs, engines and partitionings (the property
    sample()/rand(), whose RNG is engine- and partitioning-specific,
    cannot give). Training readers consume shards round-robin; a new
    seed is a new epoch's permutation at the cost of one map pass.

    Scale: shard assignment is map-only; the position is a row_number
    PARTITIONED BY SHARD — each window partition holds ~|docs|/shards
    rows, so there is no global sort anywhere (at 100 TB this is
    repartition(shard) + sortWithinPartitions(h), the exact physical
    shape of a shuffled-shard corpus write). The md5 sort key is
    engine-exact, ties broken by doc_id."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle-seed-7")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % N_SHUFFLE_SHARDS
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", h.alias("h"), shard.alias("shard"))
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
    )


def _embedding_coverage_oracle() -> str:
    return """
WITH j AS (
  SELECT d.doc_id, d.source, e.vec_id
  FROM documents d FULL OUTER JOIN embeddings e ON e.vec_id = d.doc_id
)
SELECT COALESCE(source, '<no-document>') AS source,
       CAST(SUM(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_embedded,
       CAST(SUM(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing_embedding,
       CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphan_embedding,
       ROUND(CAST(SUM(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(SUM(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END), 0),
             6) AS coverage
FROM j GROUP BY 1
"""


@query("q_embedding_coverage", oracle=_embedding_coverage_oracle())
def q_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-MODALITY referential-integrity audit — the check an
    embedding-dependent pipeline (ANN dedup, semantic decontamination,
    hard-negative mining) runs before trusting its joins: per source,
    documents WITH an embedding, documents missing one (the silent
    recall hole — a doc the SemDeDup pass can never see), and orphan
    embeddings with no document (stale vectors a re-crawl left behind,
    surfaced under the '<no-document>' source). The coverage ratio per
    source localizes an embedding-job failure to the feed that
    suffered it.

    One FULL OUTER equi-join on the shared id — both sides corpus-sized
    so it shuffles on the id (never broadcast, the per-doc-relation
    rule) — then a combinable rollup to |sources|+1 rows. Exact
    integers; one guarded closing division."""
    tune(spark)
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    e = table(spark, sf_dir, "embeddings").select("vec_id")
    j = d.join(e, d["doc_id"] == e["vec_id"], "full_outer")
    both = F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull()
    n_doc = F.sum(F.when(F.col("doc_id").isNotNull(), 1).otherwise(0))
    return (
        j.groupBy(
            F.coalesce(F.col("source"), F.lit("<no-document>")).alias("source")
        )
        .agg(
            F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("n_embedded"),
            F.sum(F.when(F.col("vec_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing_embedding"),
            F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphan_embedding"),
            F.round(
                F.sum(F.when(both, 1).otherwise(0)).cast("double")
                / F.nullif(n_doc, F.lit(0)),
                6,
            ).alias("coverage"),
        )
    )


CTX_LENGTHS = (256, 512, 1024, 2048)


@query(
    "q_context_length_plan",
    oracle="""
WITH e AS (
  SELECT CAST(u.L AS INT) AS ctx_len,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents, UNNEST([256, 512, 1024, 2048]) AS u(L)
), a AS (
  SELECT ctx_len,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens,
         CAST(SUM(CASE WHEN n_tokens > ctx_len THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
         CAST(SUM(GREATEST(n_tokens - ctx_len, 0)) AS BIGINT) AS tokens_truncated,
         CAST(SUM(ctx_len - LEAST(n_tokens, ctx_len)) AS BIGINT) AS naive_pad_tokens,
         CAST(SUM(LEAST(n_tokens, ctx_len)) AS BIGINT) AS kept_tokens
  FROM e GROUP BY ctx_len
)
SELECT ctx_len, n_docs, corpus_tokens, n_truncated, tokens_truncated,
       naive_pad_tokens, kept_tokens,
       CAST((kept_tokens + ctx_len - 1) // ctx_len AS BIGINT) AS packed_sequences,
       CAST(((kept_tokens + ctx_len - 1) // ctx_len) * ctx_len - kept_tokens AS BIGINT) AS packed_tail_waste
FROM a
""",
)
def q_context_length_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length capacity planning: for each candidate training
    context length (256/512/1024/2048), what the corpus costs under the
    two standard batching regimes — one-doc-per-sequence (pad to L,
    truncate overlong) vs concatenate-and-fill packing (q_pack_sequences'
    regime; only the final sequence carries tail padding). Emits, per L,
    the truncation loss (docs clipped + tokens lost) and the padding
    waste of each regime — the table that picks a context length and
    predicts sequence counts before an expensive tokenize-and-pack job
    runs. Integer-exact throughout (counts, sums, integer division);
    no floats to diverge cross-engine.

    Scale: one scan with the 4-length explode fused into it (rows out =
    4x docs, but each row is two ints — no text survives the projection),
    then a partial-agg groupBy on 4 keys: map-side combine reduces every
    partition to <=4 rows before the shuffle, so the 4-key "skew" is
    4 x num_partitions tiny rows at the reducers, not 4 giant groups.
    The derived columns (packed_sequences via integer DIV) are computed
    on the 4-row aggregate."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    e = d.select(
        n_tok.alias("n_tokens"),
        F.explode(F.array(*[F.lit(ctx) for ctx in CTX_LENGTHS])).alias("ctx_len"),
    )
    kept = F.least(F.col("n_tokens"), F.col("ctx_len"))
    a = e.groupBy(F.col("ctx_len").cast("int").alias("ctx_len")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("corpus_tokens"),
        F.sum(F.when(F.col("n_tokens") > F.col("ctx_len"), 1).otherwise(0))
        .cast("long").alias("n_truncated"),
        F.sum(F.greatest(F.col("n_tokens") - F.col("ctx_len"), F.lit(0)))
        .cast("long").alias("tokens_truncated"),
        F.sum(F.col("ctx_len") - kept).cast("long").alias("naive_pad_tokens"),
        F.sum(kept).cast("long").alias("kept_tokens"),
    )
    packed = F.expr("(kept_tokens + ctx_len - 1) DIV ctx_len").cast("long")
    return a.select(
        "ctx_len", "n_docs", "corpus_tokens", "n_truncated",
        "tokens_truncated", "naive_pad_tokens", "kept_tokens",
        packed.alias("packed_sequences"),
        (packed * F.col("ctx_len") - F.col("kept_tokens"))
        .cast("long").alias("packed_tail_waste"),
    )


@query(
    "q_temporal_split_embargo",
    oracle="""
WITH ranked AS (
  SELECT ts, event_id, event_type,
         ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER () AS n
  FROM events
), cut AS (
  SELECT MAX(CASE WHEN rn = CAST(ceil(0.8 * n) AS BIGINT) THEN ts END) AS cut_ts
  FROM ranked
)
SELECT
  CASE WHEN e.ts < c.cut_ts - INTERVAL 1 DAY THEN 'train'
       WHEN e.ts >= c.cut_ts THEN 'test'
       ELSE 'embargo' END AS split,
  e.event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  MIN(e.ts) AS min_ts,
  MAX(e.ts) AS max_ts
FROM events e CROSS JOIN cut c
GROUP BY 1, 2
""",
)
def q_temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe temporal train/test split with an embargo gap: the cut
    is the discrete 80th-percentile event time (nearest-rank over the total
    order ts, event_id — an actual data timestamp, no interpolation), test
    is everything at or after the cut, and the day before the cut is
    EMBARGOED — excluded from train so that models with lagged/windowed
    features cannot see information that overlaps the test period (the
    standard purged/embargoed split from financial ML, the temporal
    counterpart of the hash-based q_leakage_split). Output is the per
    (split, event_type) audit: counts and actual time spans, which is also
    the check that train.max_ts < embargo.min_ts <= cut <= test.min_ts.

    Scale: the exact rank-k timestamp is found WITHOUT a global sort via
    the two-phase distributed quantile shape — (1) a combinable
    groupBy(hour) count rolls the corpus down to a planner-sized |hours|
    relation, (2) a cumulative sum over that rollup locates the bucket
    containing rank k, (3) a rank window PARTITIONED by hour resolves the
    exact row inside the one ~1/|hours|-sized bucket. Nothing data-sized
    is ever sorted on one partition. The cut then broadcasts back as a
    1-row relation, the split label is a pure map, and the audit one
    combinable rollup. At 100 TB steps 1-3 are unchanged (the rollup is
    |hours| rows regardless of volume) — or the cut is simply a policy
    date — and it's the gate the curation pipeline applies before
    q_pack_sequences shards each split.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(hour.alias("h")).agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hourly.select(
        "h",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.ceil(F.lit(0.8) * F.sum("c").over(wall)).cast("long").alias("k"),
    )
    target = (
        cum.filter(F.col("cum") >= F.col("k"))
        .orderBy("h")
        .limit(1)
        .select("h", (F.col("k") - (F.col("cum") - F.col("c"))).alias("j"))
    )
    wtie = Window.partitionBy("h").orderBy("ts", "event_id")
    cut = (
        ev.select("ts", "event_id", hour.alias("h"))
        .join(F.broadcast(target), "h")
        .select("ts", "j", F.row_number().over(wtie).alias("rn"))
        .filter(F.col("rn") == F.col("j"))
        .agg(F.max("ts").alias("cut_ts"))
    )
    labeled = ev.crossJoin(F.broadcast(cut)).select(
        F.when(
            F.col("ts") < F.col("cut_ts") - F.expr("INTERVAL 1 DAY"), "train"
        )
        .when(F.col("ts") >= F.col("cut_ts"), "test")
        .otherwise("embargo")
        .alias("split"),
        "event_type",
        "ts",
    )
    return labeled.groupBy("split", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


# Epoch-repeat cap heuristic for q_epoch_plan: past ~4 epochs over the
# same data, additional repeats return sharply diminishing value
# (public data-constrained-scaling results), so the plan flags any
# source whose target demands more.
EPOCH_REPEAT_CAP = 4


@query(
    "q_epoch_plan",
    # f-string so repeat_risk's threshold tracks EPOCH_REPEAT_CAP — a
    # hardcoded 4 would silently desync oracle vs operator if the cap
    # ever moved (ADVICE r14)
    oracle=f"""
WITH per_src AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), w AS (
  SELECT source, tokens,
         CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE)) * 1000000) AS BIGINT) AS w_int,
         SUM(tokens) OVER () AS budget,
         SUM(CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE)) * 1000000) AS BIGINT))
             OVER () AS sw
  FROM per_src
), plan AS (
  SELECT source, tokens,
         CAST(FLOOR(CAST(budget AS DOUBLE) * w_int / sw) AS BIGINT)
             AS target_tokens
  FROM w
)
SELECT source, tokens, target_tokens,
       CAST(target_tokens // tokens AS BIGINT) AS full_epochs,
       CAST(FLOOR(1000000.0 * (target_tokens % tokens) / tokens) AS BIGINT)
           AS tail_keep_ppm,
       (target_tokens + tokens - 1) // tokens > {EPOCH_REPEAT_CAP}
           AS repeat_risk
FROM plan
""",
)
def q_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch/repeat plan under a fixed token budget — the
    upsampling half that q_temperature_sample's downsample-only pass
    explicitly leaves to "the loader's repeat-epoch job". The budget is
    the corpus' own token total (the plan REDISTRIBUTES the same mass to
    the temperature-alpha=0.5 mixture); each source's target splits into
    full_epochs = target DIV tokens complete passes plus a fractional
    tail expressed as a deterministic keep-rate (ppm — fed to the same
    md5-bucket membership q_temperature_sample uses, so the tail sample
    is reproducible across runs and engines). repeat_risk flags sources
    whose CEILING epoch count exceeds EPOCH_REPEAT_CAP — the
    data-constrained-scaling regime where more repeats stop helping and
    the mixture should be re-weighted instead.

    Determinism: token counts and the w_int temperature weights are
    exact BIGINTs before any global sum (q_mixture_weights' trick);
    target_tokens is then ONE double multiply + ONE divide + floor on
    identical integer operands — each a single correctly-rounded IEEE op,
    bit-identical on both engines (the q_temperature_sample keep_ppm
    pattern). Everything downstream is pure integer arithmetic.

    Scale: one map-side-combinable groupBy(source) over the scan; the
    global-window arithmetic runs on ONE row per source (planner-sized —
    mixtures have dozens of sources). The output IS the loader manifest:
    full_epochs repeat passes + one tail_keep_ppm-filtered pass per
    source, so a 100 TB pretraining run plans its entire sampling
    schedule from a table the size of its source list."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    per_src = fan_out(d, spark).groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias("tokens")
    )
    w_int = F.floor(F.sqrt(F.col("tokens").cast("double")) * 1000000).cast("long")
    win = Window.partitionBy()
    planned = per_src.withColumn("w_int", w_int).select(
        "source",
        "tokens",
        F.floor(
            F.sum("tokens").over(win).cast("double")
            * F.col("w_int")
            / F.sum("w_int").over(win)
        )
        .cast("long")
        .alias("target_tokens"),
    )
    return planned.select(
        "source",
        "tokens",
        "target_tokens",
        F.expr("target_tokens DIV tokens").cast("bigint").alias("full_epochs"),
        F.floor(
            F.lit(1000000.0)
            * (F.col("target_tokens") % F.col("tokens"))
            / F.col("tokens")
        )
        .cast("bigint")
        .alias("tail_keep_ppm"),
        F.expr(
            f"(target_tokens + tokens - 1) DIV tokens > {EPOCH_REPEAT_CAP}"
        ).alias("repeat_risk"),
    )


# Crawl-order slices for q_source_mix_drift: ten id-deciles, the
# coarse-grained "when was it crawled" axis doc_id provides.
MIX_DRIFT_SLICES = 10

# Shared by q_dup_timeline and s_dup_timeline (streaming.py): the
# stream's per-batch digest partials must re-aggregate to EXACTLY this
# batch timeline, so both sides verify against one oracle text.
DUP_TIMELINE_ORACLE = f"""
WITH bounds AS (
  SELECT MAX(doc_id) + 1 AS n FROM documents
), sliced AS (
  SELECT CAST((d.doc_id * {MIX_DRIFT_SLICES}) // b.n AS INT) AS slice_id,
         d.doc_id, md5(d.text) AS h, b.n
  FROM documents d CROSS JOIN bounds b
), cells AS (
  SELECT h, slice_id,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         MIN(slice_id * n + doc_id) AS key
  FROM sliced GROUP BY h, slice_id
), attributed AS (
  SELECT slice_id, cnt,
         CASE WHEN key = MIN(key) OVER (PARTITION BY h)
              THEN cnt - 1 ELSE cnt END AS n_dup
  FROM cells
)
SELECT slice_id,
       CAST(SUM(cnt) AS BIGINT) AS n_docs,
       CAST(SUM(n_dup) AS BIGINT) AS n_dup,
       CAST((1000000 * SUM(n_dup)) // SUM(cnt) AS BIGINT) AS dup_ppm
FROM attributed
GROUP BY slice_id
"""


@query("q_dup_timeline", oracle=DUP_TIMELINE_ORACLE)
def q_dup_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUPLICATE-STORM localization across crawl order — the exact-dup
    axis q_source_mix_drift's mixture monitor doesn't see: the corpus
    split into the same {MIX_DRIFT_SLICES} id-decile slices, and per
    slice the count of documents that are NOT the first occurrence of
    their content digest in (slice, doc_id) order. A re-crawl that
    re-fetches old pages, a mirror that joined the feed, or a scraper
    loop shows up as a dup_ppm spike in its slice — telling the owner
    WHEN the duplication started, which q_dedup_exact's corpus-wide
    count cannot. First-occurrence attribution is a TOTAL integer
    order: key = slice_id * (max_id+1) + min_doc_id, so both engines
    attribute every duplicate to the same slice; counts are bigint,
    rates bigint-DIV ppm.

    Scale: ONE corpus-sized shuffle — the (digest, slice) groupBy on
    16-byte digests; the first-occurrence window partitions by digest
    over that pre-aggregated relation (at most {MIX_DRIFT_SLICES} rows
    per digest group, never a corpus partition), and the closing rollup
    is {MIX_DRIFT_SLICES} keys."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    bounds = d.agg((F.max("doc_id") + 1).alias("n"))
    sliced = d.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"(doc_id * {MIX_DRIFT_SLICES}) DIV n")
        .cast("int")
        .alias("slice_id"),
        "doc_id",
        F.md5("text").alias("h"),
        "n",
    )
    cells = sliced.groupBy("h", "slice_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.min(F.col("slice_id") * F.col("n") + F.col("doc_id")).alias("key"),
    )
    return dup_timeline_rollup(cells)


def dup_timeline_rollup(cells: DataFrame) -> DataFrame:
    """First-occurrence attribution + per-slice rollup over a
    (h, slice_id, cnt, key) cell relation — SHARED by q_dup_timeline and
    its streaming twin s_dup_timeline (one copy, so the attribution rule
    cannot drift between batch and stream). The window partitions by the
    digest over pre-aggregated cells (<= |slices| rows per group)."""
    w_h = Window.partitionBy("h")
    attributed = cells.select(
        "slice_id",
        "cnt",
        F.when(F.col("key") == F.min("key").over(w_h), F.col("cnt") - 1)
        .otherwise(F.col("cnt"))
        .alias("n_dup"),
    )
    return attributed.groupBy("slice_id").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.sum("n_dup").cast("bigint").alias("n_dup"),
    ).select(
        "slice_id",
        "n_docs",
        "n_dup",
        F.expr("(1000000 * n_dup) DIV n_docs").cast("bigint").alias("dup_ppm"),
    )


# Shared by q_source_mix_drift and s_source_mix_drift (streaming.py):
# the stream's per-batch cell partials must re-aggregate to EXACTLY
# this batch monitor, so both sides verify against one oracle text.
SOURCE_MIX_DRIFT_ORACLE = f"""
WITH bounds AS (
  SELECT MAX(doc_id) + 1 AS n FROM documents
), sliced AS (
  SELECT CAST((d.doc_id * {MIX_DRIFT_SLICES}) // b.n AS INT) AS slice_id,
         d.source
  FROM documents d CROSS JOIN bounds b
), cells AS (
  SELECT slice_id, source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM sliced GROUP BY slice_id, source
), shares AS (
  SELECT slice_id, source, n_docs,
         CAST((1000000 * n_docs) //
              SUM(n_docs) OVER (PARTITION BY slice_id) AS BIGINT)
             AS slice_share_ppm,
         CAST((1000000 * SUM(n_docs) OVER (PARTITION BY source)) //
              SUM(n_docs) OVER () AS BIGINT) AS corpus_share_ppm
  FROM cells
)
SELECT slice_id, source, n_docs, slice_share_ppm, corpus_share_ppm,
       CAST(ABS(slice_share_ppm - corpus_share_ppm) AS BIGINT)
           AS drift_ppm
FROM shares
"""


@query("q_source_mix_drift", oracle=SOURCE_MIX_DRIFT_ORACLE)
def q_source_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-MIXTURE drift across crawl order: the corpus split into
    {MIX_DRIFT_SLICES} id-deciles (doc_id as crawl sequence, the
    q_ngram_novelty convention), each slice's source composition in ppm
    against the corpus-wide composition, and the absolute drift per
    cell. This is the crawler-health monitor q_term_drift (vocabulary)
    and q_ngram_novelty (phrase novelty) don't cover: a feed that died
    mid-crawl, a scraper that started flooding, or a re-crawl that
    shifted the mix shows up as a drift spike in its slice — the signal
    to re-run q_mixture_weights before the next training cut. All
    integer: slice assignment is (doc_id * {MIX_DRIFT_SLICES}) DIV
    (max_id + 1), shares are bigint-DIV ppm.

    Scale: the corpus-sized work is ONE combinable groupBy(slice_id,
    source) over the scan (two pruned columns read); every window runs
    on the |slices| x |sources| ~ 200-row cell relation. The max_id
    bound is a 1-row broadcast aggregate, not a collect.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    bounds = d.agg((F.max("doc_id") + 1).alias("n"))
    cells = (
        d.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(f"(doc_id * {MIX_DRIFT_SLICES}) DIV n")
            .cast("int")
            .alias("slice_id"),
            "source",
        )
        .groupBy("slice_id", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return mix_drift_shares(cells)


def mix_drift_shares(cells: DataFrame) -> DataFrame:
    """The share/drift tail over a (slice_id, source, n_docs) cell
    relation — SHARED by q_source_mix_drift and its streaming twin
    s_source_mix_drift (one copy, so the ppm arithmetic cannot drift
    between batch monitor and incremental monitor). All windows run on
    the |slices| x |sources| cell relation (planner-sized)."""
    w_slice = Window.partitionBy("slice_id")
    w_src = Window.partitionBy("source")
    w_all = Window.partitionBy()
    shares = cells.select(
        "slice_id",
        "source",
        "n_docs",
        F.expr("1000000 * n_docs").alias("_sc"),
        F.sum("n_docs").over(w_slice).alias("_slice_total"),
        (F.lit(1_000_000) * F.sum("n_docs").over(w_src)).alias("_src_sc"),
        F.sum("n_docs").over(w_all).alias("_corpus_total"),
    ).select(
        "slice_id",
        "source",
        "n_docs",
        F.expr("_sc DIV _slice_total").cast("bigint").alias(
            "slice_share_ppm"
        ),
        F.expr("_src_sc DIV _corpus_total").cast("bigint").alias(
            "corpus_share_ppm"
        ),
    )
    return shares.select(
        "slice_id",
        "source",
        "n_docs",
        "slice_share_ppm",
        "corpus_share_ppm",
        F.abs(F.col("slice_share_ppm") - F.col("corpus_share_ppm"))
        .cast("bigint")
        .alias("drift_ppm"),
    )
