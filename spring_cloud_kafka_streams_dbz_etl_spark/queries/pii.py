"""PII redaction query surface (driver-checkable).

The synthetic corpus contains no PII (zero digits, zero '@' — verified),
so the oracled query INJECTS deterministic doc_id-derived PII into the
documents and then redacts it with the production operator
(operators/pii.py::redact_pii). Both engines build the identical augmented
text, so the oracle exercises the real pattern set end-to-end.

Dialect note: the production patterns use Java-regex lookarounds, which
DuckDB's RE2 lacks. The oracle uses lookaround-free equivalents that match
the SAME spans on the injected shapes (whitespace-delimited, disjoint
classes — the boundary cases the lookarounds guard cannot occur by
construction). The crafted-row pytest suite (tests/test_pii.py) covers the
boundary behavior the oracle can't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..session import tune
from . import query

# doc_id-derived injections, one PII class per residue (mod 5; residue 4
# stays clean). Shapes are chosen so every class matches exactly once and
# no class cross-matches another (verified over the full corpus by the
# oracle comparison itself).
_INJECT_SQL = """
CASE doc_id % 5
  WHEN 0 THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com now'
  WHEN 1 THEN ' call 555-123-' || CAST(1000 + doc_id % 9000 AS STRING) || ' today'
  WHEN 2 THEN ' ssn ' || CAST(100 + doc_id % 900 AS STRING) || '-45-6789 ok'
  WHEN 3 THEN ' host 10.0.' || CAST(doc_id % 256 AS STRING) || '.'
              || CAST(1 + doc_id % 200 AS STRING) || ' up'
  ELSE ''
END
"""

# RE2-safe twins of operators.pii.PII_PATTERNS for the injected shapes.
_RE2 = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ip": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
}


def _pii_oracle() -> str:
    # redaction applies email -> ssn -> phone -> ip, same as redact_pii
    red = "aug"
    for name in ("email", "ssn", "phone", "ip"):
        red = f"regexp_replace({red}, '{_RE2[name]}', '<{name.upper()}>', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(aug, '{_RE2[name]}')) AS INT) AS n_{name}"
        for name in ("email", "phone", "ssn", "ip")
    )
    return f"""
WITH aug AS (
  SELECT doc_id, text || {_INJECT_SQL} AS aug FROM documents
)
SELECT doc_id, {red} AS text, {counts} FROM aug
"""


@query("q_pii_redact", oracle=_pii_oracle())
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the documents corpus (the C4/RefinedWeb-style
    pre-release pass): per-class match counts + '<CLASS>'-token redaction,
    all built-in regexp_count/regexp_replace inside whole-stage codegen —
    map-only, zero shuffle, zero Python, parquet-scan speed at any corpus
    size (see operators/pii.py)."""
    from ..operators.pii import redact_pii

    tune(spark)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.select("doc_id", F.expr(f"text || {_INJECT_SQL}").alias("text"))
    out = redact_pii(aug, text_col="text")
    return out.select("doc_id", "text", "n_email", "n_phone", "n_ssn", "n_ip")


def _pii_risk_oracle() -> str:
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(aug, '{_RE2[name]}')) AS INT) AS n_{name}"
        for name in ("email", "phone", "ssn", "ip")
    )
    unions = " UNION ALL ".join(
        f"SELECT source, '{name}' AS pii_class, n_{name} AS n FROM counted"
        for name in ("email", "phone", "ssn", "ip")
    )
    return f"""
WITH aug AS (
  SELECT doc_id, source, text || {_INJECT_SQL} AS aug FROM documents
), counted AS (
  SELECT doc_id, source, {counts} FROM aug
), long AS ({unions}),
nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source)
SELECT l.source, l.pii_class,
       CAST(SUM(CASE WHEN l.n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_affected,
       CAST(SUM(l.n) AS BIGINT) AS n_hits,
       ROUND(CAST(SUM(CASE WHEN l.n > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / (SELECT n_docs FROM nd WHERE nd.source = l.source), 6) AS doc_rate
FROM long l GROUP BY l.source, l.pii_class
"""


@query("q_pii_risk_report", oracle=_pii_risk_oracle())
def q_pii_risk_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PII TRIAGE table read BEFORE committing a redaction pass:
    per (source, pii_class), documents affected, total hits, and the
    per-source document hit RATE — the view that says which feed is
    leaking which identifier class (a crawler pulling a breach dump
    shows as one source's ssn rate spiking) and whether redaction or
    source-level quarantine is the right response. Same deterministic
    doc_id-derived injection + RE2-safe pattern twins as q_pii_redact,
    rolled up to the (source, class) grain.

    Scale: counting stays map-only codegen on the corpus scan (the
    q_pii_redact shape); the rollup shuffles |sources| x 4 rows. The
    rate divides two exact integers once per output row."""
    from ..operators.pii import redact_pii

    tune(spark)
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    aug = docs.select(
        "doc_id", "source", F.expr(f"text || {_INJECT_SQL}").alias("text")
    )
    counted = redact_pii(aug, text_col="text").select(
        "source", "n_email", "n_phone", "n_ssn", "n_ip"
    )
    longf = None
    for name in ("email", "phone", "ssn", "ip"):
        part = counted.select(
            "source",
            F.lit(name).alias("pii_class"),
            F.col(f"n_{name}").alias("n"),
        )
        longf = part if longf is None else longf.unionAll(part)
    nd = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    agg = longf.groupBy("source", "pii_class").agg(
        F.sum(F.when(F.col("n") > 0, 1).otherwise(0)).cast("long").alias(
            "n_docs_affected"
        ),
        F.sum("n").cast("long").alias("n_hits"),
    )
    return agg.join(F.broadcast(nd), "source").select(
        "source",
        "pii_class",
        "n_docs_affected",
        "n_hits",
        F.round(
            F.col("n_docs_affected").cast("double") / F.col("n_docs"), 6
        ).alias("doc_rate"),
    )
