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


@query(
    "q_media_resize",
    oracle="""
WITH d AS (
  SELECT doc_id, text,
         CAST(16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 64 AS INT) AS width,
         CAST(16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 64 AS INT) AS height
  FROM documents
), s AS (
  SELECT doc_id, text, width, height,
         LEAST(1.0, 32.0 / GREATEST(width, height)) AS scale
  FROM d
), r AS (
  SELECT doc_id, text, width, height,
         GREATEST(1, CAST(FLOOR(width * scale) AS INT)) AS out_width,
         GREATEST(1, CAST(FLOOR(height * scale) AS INT)) AS out_height
  FROM s
)
SELECT doc_id, width, height, out_width, out_height,
       CAST(out_width * out_height AS BIGINT) AS out_len,
       md5(text || (out_width || 'x' || out_height)) AS out_head_md5
FROM r
""",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The thumbnail/preprocess stage end-to-end (operators/multimodal.py::
    resize_media): binary payload -> Arrow-batched mapInPandas resize.
    Output dimensions are real aspect-preserving math; the resample is the
    deterministic stub (fake body = md5(payload||'WxH') repeated), so the
    oracle recomputes dims AND the body head in SQL — the hash check
    covers the Python stage value-for-value, Arrow plumbing included.
    The emitted out_len / out_head_md5 are the scalar canonicalization of
    the binary body (the driver's canonicalizer can't hash raw bytes).

    Scale: map-only; resize is the dominant byte-REDUCTION stage — run
    before any shuffle so shuffles carry thumbnails, not originals."""
    from ..operators.multimodal import attach_binary_payload, resize_media

    tune(spark)
    d = table(spark, sf_dir, "documents")
    out = resize_media(attach_binary_payload(d), max_side=32)
    return out.select(
        "doc_id",
        "width",
        "height",
        "out_width",
        "out_height",
        F.length("out_bytes").cast("bigint").alias("out_len"),
        # body = md5 digest cycled to out_len bytes; its 16-byte head IS
        # the digest (out_len >= 36 for every reachable dim pair)
        F.lower(F.hex(F.substring("out_bytes", 1, 16))).alias("out_head_md5"),
    )


@query(
    "q_media_features",
    oracle="""
WITH h AS (
  SELECT doc_id, md5(text) AS x FROM documents
), w AS (
  -- 8 big-endian uint32 words over the digest cycled to 32 bytes
  -- (word i reads hex chars [8*(i%4)+1, 8]); value = u/2^31 - 1 exactly
  SELECT doc_id,
         [CAST(('0x' || substr(x, 8 * (i % 4) + 1, 8)) AS BIGINT) / 2147483648.0 - 1.0
          FOR i IN range(0, 8)] AS v
  FROM h
)
SELECT doc_id, 8 AS dim,
       array_to_string(
         [CAST(FLOOR(CAST(CAST(u AS REAL) AS DOUBLE) * 1000000) AS BIGINT)
          FOR u IN v], ',') AS feat_q6
FROM w
""",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoder stage of a multimodal curation pipeline (operators/
    multimodal.py::extract_features): payload -> Arrow-batched mapInPandas
    -> 8-d embedding (deterministic md5-derived stub where the CLIP
    forward pass would run; identical payloads get identical vectors, so
    exact-dup detection through the embedding path is exercised for
    real). Emitted as floor(x*1e6) integers per dimension — float32
    storage canonicalized identically in both engines (IEEE
    double->float32->double round-trip, then exact integer floor).

    Scale: the real encoder batches onto accelerators per partition with
    exactly this schema/batch shape; output feeds q_embedding_cosine_dup
    / q_semantic_clusters unchanged."""
    from ..operators.multimodal import attach_binary_payload, extract_features

    tune(spark)
    d = table(spark, sf_dir, "documents")
    out = extract_features(attach_binary_payload(d), dim=8)
    q6 = F.transform(
        F.col("feat"),
        lambda x: F.floor(x.cast("double") * 1000000).cast("long").cast("string"),
    )
    return out.select(
        "doc_id",
        F.lit(8).alias("dim"),
        F.array_join(q6, ",").alias("feat_q6"),
    )


FRAME_STRIDE = 17  # stub frame content = 40-char window at idx*stride
FRAME_LEN = 40


@query(
    "q_media_frame_dedup",
    oracle=f"""
WITH d AS (
  SELECT doc_id, text,
         CAST(1 + CAST(('0x' || substr(md5(text), 5, 2)) AS INT) % 8 AS INT) AS n_frames
  FROM documents
), frames AS (
  SELECT doc_id, CAST(fi AS INT) AS frame_idx,
         substr(text, CAST(fi AS INT) * {FRAME_STRIDE} + 1, {FRAME_LEN}) AS ft
  FROM (SELECT doc_id, text, unnest(range(0, n_frames)) AS fi FROM d)
  WHERE fi % 2 = 0
), hashed AS (
  SELECT doc_id, frame_idx, md5(ft) AS frame_hash
  FROM frames WHERE length(ft) = {FRAME_LEN}
)
SELECT frame_hash,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id * 1000 + frame_idx) // 1000 AS BIGINT) AS keep_doc_id,
       CAST(MIN(doc_id * 1000 + frame_idx) % 1000 AS BIGINT) AS keep_frame_idx
FROM hashed
GROUP BY frame_hash
HAVING COUNT(DISTINCT doc_id) >= 2
""",
)
def q_media_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-video duplicate-frame detection — the multimodal dedup
    capstone composing the decode stub with the exact-dedup shape:
    decode (mapInPandas) yields per-payload frame counts, frame-sample
    explodes every 2nd frame, each frame's content (deterministic stub:
    a {FRAME_LEN}-byte window of the payload at frame_idx x
    {FRAME_STRIDE} — where a real pipeline would hash decoded pixels)
    is hashed, and frames shared by >= 2 distinct payloads group into
    dup clusters with an integer-encoded keep-first winner. Shared
    payload substrings = shared frames, so near-dup documents produce
    genuine cross-doc frame collisions.

    Scale: one shuffle on the 16-byte frame hash — frame bytes never
    shuffle (hashed at the scan, the q_dedup_exact policy); the frame
    fan-out streams from decode into the hash without materializing.
    The keep-first winner is MIN over an integer key, combinable."""
    from ..operators.multimodal import attach_binary_payload, decode_media, frame_sample

    tune(spark)
    d = table(spark, sf_dir, "documents")
    frames = frame_sample(decode_media(attach_binary_payload(d)), every_n=2)
    joined = frames.join(d.select("doc_id", "text"), "doc_id")
    ft = F.substring(
        F.col("text"), F.col("frame_idx") * FRAME_STRIDE + 1, FRAME_LEN
    )
    hashed = (
        joined.select(
            "doc_id", "frame_idx", ft.alias("ft")
        )
        .filter(F.length("ft") == FRAME_LEN)
        .select("doc_id", "frame_idx", F.md5("ft").alias("frame_hash"))
    )
    key = F.col("doc_id") * 1000 + F.col("frame_idx")
    return (
        hashed.groupBy("frame_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.floor(F.min(key) / 1000).cast("long").alias("keep_doc_id"),
            (F.min(key) % 1000).cast("long").alias("keep_frame_idx"),
        )
        .filter(F.col("n_docs") >= 2)
    )
