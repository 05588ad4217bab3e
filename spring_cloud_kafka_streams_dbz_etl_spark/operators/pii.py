"""PII detection / redaction over text columns (north-star curation op:
every training corpus scrubs contact info before release — C4 and
RefinedWeb both document regex-level scrubbing passes).

All patterns run as built-in ``regexp_replace`` / ``regexp_count`` inside
whole-stage codegen — map-only, zero shuffle, zero Python, parquet-scan
speed at any corpus size. The synthetic test corpus contains no PII, so
this surface is pytest-verified on crafted rows rather than oracled (regex
dialects also diverge between engines on \\b and lookarounds, which these
patterns need).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deliberately high-recall, Java-regex patterns (the scrub is a filter
# BEFORE human/model consumption — false positives cost little).
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # +1-555-123-4567 / (555) 123 4567 / 5551234567 (7+ digit runs with
    # separators, guarded against matching inside longer digit runs)
    "phone": r"(?<![0-9])(?:\+?[0-9]{1,3}[-. (]*)?(?:[0-9]{3}[-. )]*)?[0-9]{3}[-. ]?[0-9]{4}(?![0-9])",
    # US SSN shape 123-45-6789
    "ssn": r"(?<![0-9-])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9-])",
    # IPv4
    "ip": r"(?<![0-9.])(?:[0-9]{1,3}\.){3}[0-9]{1,3}(?![0-9.])",
}


def pii_counts(text: Column, classes: list[str] | None = None) -> dict[str, Column]:
    """``{"n_<class>": count}`` per PII class — the single source of the
    count expressions (redact_pii builds on this; don't fork the logic)."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pat)).cast("int")
        for name, pat in PII_PATTERNS.items()
        if classes is None or name in classes
    }


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    classes: list[str] | None = None,
) -> DataFrame:
    """Replace each PII match with ``<CLASS>`` tokens and attach per-class
    match counts (counted BEFORE redaction, so overlapping classes report
    what each pattern saw in the original text).

    Order matters: email runs before phone so digits inside an address
    aren't half-eaten; ssn before phone so 123-45-6789 isn't misclassified.
    """
    order = [c for c in ("email", "ssn", "phone", "ip") if c in PII_PATTERNS]
    selected = [c for c in order if classes is None or c in classes]
    text = F.col(text_col)
    new_cols = pii_counts(text, classes=selected)
    redacted = text
    for name in selected:
        redacted = F.regexp_replace(redacted, PII_PATTERNS[name], f"<{name.upper()}>")
    new_cols[out_col or text_col] = redacted
    return df.withColumns(new_cols)
