"""Bit-parity of the vectorized transcript kernels (sources/avro_vec.py)
against the row-at-a-time reference codec they replace on the hot path."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
    AvroCodec,
    confluent_frame,
)
from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_vec import (
    decode_enriched_batch,
    default_partition_vec,
    encode_enriched_batch,
    murmur2_be8,
    varint_decode,
    varint_parts,
    zigzag64,
)
from spring_cloud_kafka_streams_dbz_etl_spark.sources.kafka_replay import (
    ENRICHED_RECORD_AVSC,
    default_partition,
    murmur2,
)

FUZZ_ROWS = [
    # (id, user_id, name, segment, event_type, value)
    (0, 0, "", "", None, None),
    (1, 15000, "Customer#000000001", "BUILDING", "click", 1.5),
    (127, 128, "a", "b", "", 0.0),
    (2**31 - 1, 2**31, "héllo wörld", "ünïcode", "sïgnup", -1.25e300),
    (2**62, 1, "x" * 300, "y" * 70, "z" * 130, 1e-300),
    (97, 3, "tab\tnl\n", "qu\"ote", None, float("nan")),  # NaN -> null branch
    (5, 7, "平仮名テキスト", "混合", "類型", -0.0),
    (2**63 - 1, 2**63 - 1, "max", "max", "max", 1.7976931348623157e308),
]


def _fuzz_batch() -> pa.RecordBatch:
    cols = list(zip(*FUZZ_ROWS))
    return pa.RecordBatch.from_arrays(
        [
            pa.array(cols[0], type=pa.int64()),
            pa.array(cols[1], type=pa.int64()),
            pa.array(cols[2], type=pa.string()),
            pa.array(cols[3], type=pa.string()),
            pa.array(cols[4], type=pa.string()),
            pa.array(
                [None if v is not None and math.isnan(v) else v for v in cols[5]],
                type=pa.float64(),
            ),
        ],
        names=["id", "user_id", "name", "segment", "event_type", "value"],
    )


def _reference_values(schema_id: int = 9) -> list[bytes]:
    codec = AvroCodec(ENRICHED_RECORD_AVSC)
    out = []
    for rid, uid, name, seg, et, val in FUZZ_ROWS:
        rec = {
            "id": rid,
            "user_id": uid,
            "name": name,
            "segment": seg,
            "event_type": et,
            "value": None if val is not None and math.isnan(val) else val,
        }
        out.append(confluent_frame(schema_id, codec.encode(rec)))
    return out


def test_varint_roundtrip_extremes():
    vals = np.array(
        [0, 1, -1, 63, 64, -64, -65, 2**31, -(2**31), 2**62, 2**63 - 1, -(2**63)],
        dtype=np.int64,
    )
    mat, lens = varint_parts(zigzag64(vals))
    # flatten into one buffer and decode back
    total = int(lens.sum())
    buf = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    for i in range(len(vals)):
        buf[starts[i] : starts[i] + lens[i]] = mat[i, : lens[i]]
    dec, pos = varint_decode(buf, starts)
    assert (dec == vals).all()
    assert (pos == starts + lens).all()


def test_murmur2_matches_reference():
    rng = np.random.default_rng(7)
    ids = np.concatenate(
        [
            np.array([0, 1, 97, 2**31, 2**62, 2**63 - 1], dtype=np.uint64),
            rng.integers(0, 2**63, size=500, dtype=np.uint64),
        ]
    ).astype(np.int64)
    got = murmur2_be8(ids)
    want = [murmur2(int(i).to_bytes(8, "big")) for i in ids]
    assert got.tolist() == want
    gp = default_partition_vec(ids, 4)
    wp = [default_partition(int(i).to_bytes(8, "big"), 4) for i in ids]
    assert gp.tolist() == wp


def test_encode_bit_identical_to_codec():
    batch = _fuzz_batch()
    enc = encode_enriched_batch(batch, schema_id=9, n_partitions=4, with_rec_id=True)
    want = _reference_values()
    got = enc.column("value").to_pylist()
    assert got == want
    assert enc.column("key").to_pylist() == [
        int(r[0]).to_bytes(8, "big") for r in FUZZ_ROWS
    ]
    assert enc.column("partition").to_pylist() == [
        default_partition(int(r[0]).to_bytes(8, "big"), 4) for r in FUZZ_ROWS
    ]
    assert enc.column("rec_id").to_pylist() == [r[0] for r in FUZZ_ROWS]


def test_decode_roundtrip():
    batch = _fuzz_batch()
    enc = encode_enriched_batch(batch, schema_id=9, n_partitions=4, with_rec_id=False)
    dec = decode_enriched_batch(enc.column("value"))
    assert dec.column("id").to_pylist() == [r[0] for r in FUZZ_ROWS]
    assert dec.column("user_id").to_pylist() == [r[1] for r in FUZZ_ROWS]
    assert dec.column("name").to_pylist() == [r[2] for r in FUZZ_ROWS]
    assert dec.column("segment").to_pylist() == [r[3] for r in FUZZ_ROWS]
    assert dec.column("event_type").to_pylist() == [r[4] for r in FUZZ_ROWS]
    want_vals = [
        None if v is not None and math.isnan(v) else v for (_, _, _, _, _, v) in FUZZ_ROWS
    ]
    assert dec.column("value").to_pylist() == want_vals


def test_decode_rejects_bad_magic():
    bad = pa.array([b"\x01\x00\x00\x00\x09\x00"], type=pa.binary())
    with pytest.raises(ValueError, match="magic"):
        decode_enriched_batch(bad)


def test_empty_batch():
    empty = _fuzz_batch().slice(0, 0)
    enc = encode_enriched_batch(empty, schema_id=9, n_partitions=4, with_rec_id=True)
    assert enc.num_rows == 0
    dec = decode_enriched_batch(enc.column("value"))
    assert dec.num_rows == 0
