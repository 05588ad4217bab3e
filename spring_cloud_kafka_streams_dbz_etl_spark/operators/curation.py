"""Composable corpus-curation pipeline (the engine API behind the
flagship `q_curation_pipeline` query).

The oracled queries pin each stage's semantics against DuckDB; this
module is what a USER calls: one config object, stages toggled on/off,
all stages built from the same Column helpers the queries use, so the
composed pipeline inherits their verified semantics. Stage order is
fixed (cheap row-local gates first, the one shuffle last):

    lang gate -> quality gate -> [PII redact] -> [decontaminate]
        -> [exact dedup] -> split assignment

Scale: the gates, redaction, and split are map-only expressions; the
decontamination is a broadcast probe on md5'd n-grams (the benchmark is
eval-suite-sized at any corpus scale); exact dedup is the single
shuffle, on 16-byte digests. Nothing here materializes intermediates —
the whole pipeline is ONE declarative plan Catalyst optimizes end to
end (filters fused into the scan, one exchange total without
decontamination, two with).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import en_stopword_count, token_total_len, tokens
from .pii import redact_pii

# Canonical curation gate thresholds — the SINGLE source for the batch
# pipeline (q_curation_pipeline / q_curation_funnel), the streaming
# funnel kernel (streaming/curation.py::funnel_partials), and the shared
# DuckDB oracle fragments (queries/text.py::_CURATION_STAGES_SQL), so a
# threshold change on any one side desyncs nothing (ADVICE r15).
LANG_GATE_RATIO = 0.05  # English stopword-ratio gate
QUALITY_GATE = 0.5  # composite quality-score gate


@dataclass(frozen=True)
class CurationConfig:
    """Stage toggles. ``None`` disables a stage entirely."""

    lang_stopword_min: float | None = LANG_GATE_RATIO
    quality_min: float | None = QUALITY_GATE
    redact: bool = False  # PII redaction (operators.pii)
    dedup_exact: bool = True  # content-hash keep-first dedup
    decontaminate_ngram: int = 4  # n for the benchmark-overlap gate
    split_seed: str = "split-seed-42"  # deterministic split assignment
    split_bounds: tuple[int, int] | None = (90, 95)  # train/val percentile edges


def quality_score(text_col: F.Column) -> F.Column:
    """The composite quality score q_quality_score oracles: length
    saturation + lexical diversity + mean-token-length saturation."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    return (
        0.4 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.size(F.array_distinct(toks)) / n_tok)
        + 0.3 * F.least((token_total_len(toks).cast("double") / n_tok) / 8.0, F.lit(1.0))
    )


def _gram_hashes(df: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(F.col("__t")) - n),
        lambda i: F.concat_ws(" ", F.slice(F.col("__t"), i + 1, n)),
    )
    return (
        df.select(F.col(id_col), toks.alias("__t"))
        .filter(F.size("__t") >= n)
        .select(F.col(id_col), F.explode(grams).alias("__gram"))
        .select(F.col(id_col), F.md5(F.col("__gram")).alias("__gh"))
    )


def curate(
    df: DataFrame,
    config: CurationConfig = CurationConfig(),
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the configured curation pass over ``df`` (``id_col``,
    ``text_col``, ...). Returns (id_col, quality, split) — or without
    ``split`` when ``split_bounds`` is None.

    ``benchmark``: optional DataFrame of held-out eval documents (same
    id/text columns); any corpus doc sharing a ``decontaminate_ngram``
    token n-gram with it is dropped (q_decontaminate's overlap rule,
    applied as a broadcast anti-join so the corpus side never shuffles).
    """
    cur = df.select(id_col, text_col)
    if config.redact:
        cur = redact_pii(cur, text_col=text_col)
    if config.lang_stopword_min is not None:
        cur = cur.filter(
            en_stopword_count(tokens(F.col(text_col))) / F.size(tokens(F.col(text_col)))
            >= config.lang_stopword_min
        )
    cur = cur.withColumn("quality", quality_score(F.col(text_col)))
    if config.quality_min is not None:
        cur = cur.filter(F.col("quality") >= config.quality_min)
    if benchmark is not None:
        bench_grams = (
            _gram_hashes(benchmark, config.decontaminate_ngram, id_col, text_col)
            .select("__gh")
            .distinct()
        )
        contaminated = (
            _gram_hashes(cur, config.decontaminate_ngram, id_col, text_col)
            .join(F.broadcast(bench_grams), "__gh")
            .select(id_col)
            .distinct()
        )
        cur = cur.join(contaminated, id_col, "left_anti")
    if config.dedup_exact:
        cur = (
            cur.groupBy(F.md5(F.col(text_col)).alias("__h"))
            .agg(F.min(id_col).alias(id_col), F.first("quality").alias("quality"))
            .drop("__h")
        )
    else:
        cur = cur.select(id_col, "quality")
    if config.split_bounds is None:
        return cur
    train_lt, val_lt = config.split_bounds
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{config.split_seed}"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    ).cast("int")
    return cur.select(
        id_col,
        "quality",
        F.when(bucket < train_lt, "train")
        .when(bucket < val_lt, "val")
        .otherwise("test")
        .alias("split"),
    )
