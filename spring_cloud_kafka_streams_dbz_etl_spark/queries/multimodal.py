"""Multimodal column surface: binary payloads with typed metadata.

q_multimodal_schema covers the relational/binary plumbing (payload bytes,
digests, hex prefixes). q_media_decode drives the full decode pipeline —
binary payload -> Arrow-batched mapInPandas decode -> explode-based frame
sampling — end-to-end under the DuckDB oracle: the stub decoder's fake
dimensions are a pure function of the payload md5 (operators/
multimodal.py::decode_media), so the oracle replays the same bytes->
dimensions math in SQL and hash-checks the whole path, Arrow plumbing
included. A real Pillow/ffmpeg decoder swaps in behind the same schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.multimodal import attach_binary_payload, decode_media, frame_sample
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


@query(
    "q_media_decode",
    oracle="""
WITH d AS (
  -- md5(text) == md5 of the UTF-8 payload bytes (DuckDB md5 is
  -- VARCHAR-only; encode() is the identity on the byte content here)
  SELECT doc_id,
         CAST(16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 64 AS INT) AS width,
         CAST(16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 64 AS INT) AS height,
         CAST(1 + CAST(('0x' || substr(md5(text), 5, 2)) AS INT) % 8 AS INT) AS n_frames
  FROM documents
)
SELECT doc_id, CAST(fi AS INT) AS frame_idx, width, height
FROM (SELECT doc_id, width, height, unnest(range(0, n_frames)) AS fi FROM d)
WHERE fi % 2 = 0
""",
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal pipeline end-to-end: wrap content as an opaque binary
    payload + metadata struct -> decode via Arrow-batched mapInPandas
    (deterministic stub: dimensions = f(payload md5) where Pillow/ffmpeg
    would run; same schema, batching, and partition parallelism as a real
    codec) -> frame-sample every 2nd frame via sequence+explode. The
    oracle recomputes the stub's md5 math in SQL, so the hash check
    covers the Python decode stage value-for-value.

    Scale: decode is map-only Python scaled by partitions (the one
    legitimately-Python stage class in the engine); frame sampling is
    generate-only built-ins — the 1-8x frame fan-out streams from decode
    into downstream stages without materializing."""
    tune(spark)
    d = table(spark, sf_dir, "documents")
    return frame_sample(decode_media(attach_binary_payload(d)), every_n=2)
