"""Multimodal column surface: binary payloads with typed metadata.

The oracle-checked query covers the relational/binary plumbing (payload
bytes, digests, hex prefixes); the decode path (mapInPandas with stubbed
codecs) is exercised by tests/test_multimodal.py since its fake-decode
output is not SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..session import tune
from . import query


@query(
    "q_multimodal_schema",
    oracle="""
SELECT doc_id,
       'text/plain;charset=utf-8' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       substr(hex(encode(text)), 1, 16) AS head_hex
FROM documents
""",
)
def q_multimodal_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata: encode -> byte length,
    content digest, hex head. The same row shape carries image/audio/video
    at scale (payload stays binary end-to-end; only metadata is columnar).
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.lit("text/plain;charset=utf-8").alias("mime"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5("text").alias("payload_md5"),
        F.substring(F.hex(payload), 1, 16).alias("head_hex"),
    )
