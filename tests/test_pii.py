"""PII redaction operator tests (crafted rows — the synthetic corpus has
no PII, and the patterns need lookarounds DuckDB's RE2 lacks, so this
surface is pytest-verified rather than oracled)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spring_cloud_kafka_streams_dbz_etl_spark.operators.pii import redact_pii


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk for details"),
        (2, "call 555-123-4567 or (212) 555 0199 today"),
        (3, "ssn is 123-45-6789 ok"),
        (4, "server at 192.168.0.1 and 10.0.0.255"),
        (5, "clean text with number 42 and year 2024"),
        (6, "mixed: bob@x.io / 555-867-5309 / 1.2.3.4"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_redact_counts_and_tokens(pii_df):
    out = {r.doc_id: r for r in redact_pii(pii_df).collect()}
    assert out[1].n_email == 1 and "<EMAIL>" in out[1].text
    assert "jane" not in out[1].text
    assert out[2].n_phone == 2 and out[2].text.count("<PHONE>") == 2
    assert out[3].n_ssn == 1 and "<SSN>" in out[3].text
    assert "123-45-6789" not in out[3].text
    assert out[4].n_ip == 2 and out[4].text.count("<IP>") == 2
    # clean text untouched, zero counts — 42 and 2024 are not phones
    assert out[5].text == "clean text with number 42 and year 2024"
    assert (out[5].n_email, out[5].n_phone, out[5].n_ssn, out[5].n_ip) == (0, 0, 0, 0)
    # every class in one row
    assert out[6].n_email == 1 and out[6].n_phone == 1 and out[6].n_ip == 1
    for token in ("<EMAIL>", "<PHONE>", "<IP>"):
        assert token in out[6].text


def test_ssn_not_double_counted_as_phone(pii_df):
    """SSN-shaped strings redact as <SSN> (ssn runs before phone)."""
    row = {r.doc_id: r for r in redact_pii(pii_df).collect()}[3]
    assert "<SSN>" in row.text and "<PHONE>" not in row.text


def test_out_col_preserves_original(pii_df):
    out = redact_pii(pii_df, out_col="clean").filter(F.col("doc_id") == 1).first()
    assert "jane.doe" in out.text and "<EMAIL>" in out.clean


def test_redact_is_map_only(pii_df):
    from spring_cloud_kafka_streams_dbz_etl_spark.plans import explain_str

    text = explain_str(redact_pii(pii_df))
    assert "Exchange" not in text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
