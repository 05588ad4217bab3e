"""Vectorized (NumPy/Arrow) kernels for the Kafka-transcript hot path.

The pure-Python :mod:`avro_codec` walks one record at a time through a
recursive encoder — ~13 µs/record — which made the transcript sink/consume
family (s_kafka_txn_sink and friends) pay seconds of single-threaded Python
per micro-batch at sf0.1 (guide §4.2: do the heavy lifting in vectorized
native code inside the Python boundary). These kernels produce BYTE-
IDENTICAL output for the one fixed schema on that hot path — the flat
``EnrichedEvent`` record — by computing every varint/length/offset with
NumPy over whole Arrow batches and assembling the framed payloads into one
contiguous buffer (a binary Arrow column is a data buffer + offsets, so
assembly is O(total bytes) with no per-row Python objects).

Bit-parity with :class:`avro_codec.AvroCodec` and :func:`kafka_replay.murmur2`
is pinned by tests/test_avro_vec.py over fuzzed rows (nulls, NaN, unicode,
empty strings, 64-bit extremes).
"""

from __future__ import annotations

import numpy as np

_M32 = np.uint32(0x5BD1E995)
_SEED = 0x9747B28C


# -- varint / zigzag (vectorized) -------------------------------------------

def zigzag64(v: np.ndarray) -> np.ndarray:
    """Two's-complement int64 -> zigzag uint64 (Avro long encoding)."""
    v = v.astype(np.int64, copy=False)
    return (np.left_shift(v, 1) ^ np.right_shift(v, 63)).view(np.uint64)


def varint_parts(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 zigzag values -> (bytes matrix N x 10 uint8, lengths N).

    Row i's varint encoding is ``mat[i, :lens[i]]`` — low 7 bits first,
    continuation bit on every byte but the last (Avro/protobuf varint).
    """
    z = z.astype(np.uint64, copy=False)
    n = len(z)
    lens = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        lens += (z >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    mat = np.zeros((n, 10), dtype=np.uint8)
    for k in range(10):
        byte = (z >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        more = lens > (k + 1)
        mat[:, k] = byte.astype(np.uint8) | np.where(more, np.uint8(0x80), np.uint8(0))
    return mat, lens


def varint_decode(data: np.ndarray, pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode one zigzag-varint per row from ``data`` starting at ``pos``.

    Returns (int64 values, positions advanced past the varint)."""
    pos = pos.astype(np.int64, copy=True)
    acc = np.zeros(len(pos), dtype=np.uint64)
    active = np.ones(len(pos), dtype=bool)
    shift = np.zeros(len(pos), dtype=np.uint64)
    for _ in range(10):
        if not active.any():
            break
        b = data[pos[active]]
        acc[active] |= (b.astype(np.uint64) & np.uint64(0x7F)) << shift[active]
        pos[active] += 1
        shift[active] += np.uint64(7)
        cont = np.zeros(len(pos), dtype=bool)
        cont[active] = (b & 0x80) != 0
        active = cont
    val = (acc >> np.uint64(1)).astype(np.int64) ^ -((acc & np.uint64(1)).astype(np.int64))
    return val, pos


# -- murmur2 / Kafka default partitioner (vectorized, 8-byte BE keys) --------

def murmur2_be8(ids: np.ndarray) -> np.ndarray:
    """Kafka ``Utils.murmur2`` over each id's 8-byte big-endian key bytes
    (the transcript key layout) — vectorized twin of
    :func:`kafka_replay.murmur2`. Returns signed int32 values."""
    u = ids.astype(np.int64, copy=False).view(np.uint64)
    hi = (u >> np.uint64(32)).astype(np.uint32)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    # data[0:4] little-endian == byteswapped high word; data[4:8] likewise
    k1 = hi.byteswap()
    k2 = lo.byteswap()
    h = np.full(len(u), np.uint32(_SEED ^ 8), dtype=np.uint32)
    with np.errstate(over="ignore"):
        for k in (k1, k2):
            k = (k * _M32).astype(np.uint32)
            k ^= k >> np.uint32(24)
            k = (k * _M32).astype(np.uint32)
            h = (h * _M32).astype(np.uint32)
            h ^= k
        h ^= h >> np.uint32(13)
        h = (h * _M32).astype(np.uint32)
        h ^= h >> np.uint32(15)
    return h.view(np.int32)


def default_partition_vec(ids: np.ndarray, n_partitions: int) -> np.ndarray:
    """Kafka DefaultPartitioner: toPositive(murmur2(key_bytes)) % n."""
    return (
        (murmur2_be8(ids).view(np.uint32) & np.uint32(0x7FFFFFFF))
        % np.uint32(n_partitions)
    ).astype(np.int32)


# -- buffer-assembly helpers -------------------------------------------------

def _string_parts(col) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Arrow string column -> (data uint8, starts, lens, null mask)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    null = pc.is_null(col).to_numpy(zero_copy_only=False)
    # offsets include the array's own slice offset
    off = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    buf = col.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.zeros(0, np.uint8)
    )
    starts = off[:-1]
    lens = off[1:] - off[:-1]
    # a null row's offsets may be anything; normalize to zero-length
    lens = np.where(null, 0, lens)
    return data, starts, lens, null


def _scatter_ranges(
    out: np.ndarray, dst_starts: np.ndarray, src: np.ndarray,
    src_starts: np.ndarray, lens: np.ndarray,
) -> None:
    """out[dst_starts[i] : +lens[i]] = src[src_starts[i] : +lens[i]] for all
    rows at once (repeat+cumsum gather — no per-row Python)."""
    total = int(lens.sum())
    if total == 0:
        return
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(lens)[:-1])), lens
    )
    out[np.repeat(dst_starts, lens) + within] = src[np.repeat(src_starts, lens) + within]


def _scatter_varints(
    out: np.ndarray, dst_starts: np.ndarray, mat: np.ndarray, lens: np.ndarray
) -> None:
    for k in range(int(lens.max()) if len(lens) else 0):
        m = lens > k
        out[dst_starts[m] + k] = mat[m, k]


def _pack_validity(null: np.ndarray):
    import pyarrow as pa

    if not null.any():
        return None
    return pa.py_buffer(np.packbits(~null, bitorder="little").tobytes())


def _binary_array(data: np.ndarray, offsets: np.ndarray):
    import pyarrow as pa

    return pa.Array.from_buffers(
        pa.binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(data.tobytes())],
    )


def _string_array(data: np.ndarray, offsets: np.ndarray, null: np.ndarray):
    import pyarrow as pa

    return pa.Array.from_buffers(
        pa.string(),
        len(offsets) - 1,
        [
            _pack_validity(null),
            pa.py_buffer(offsets.astype(np.int32).tobytes()),
            pa.py_buffer(data.tobytes()),
        ],
    )


# -- EnrichedEvent encode ----------------------------------------------------

def encode_enriched_batch(
    batch, schema_id: int, n_partitions: int, with_rec_id: bool
):
    """One Arrow batch of enriched rows -> (key, value, partition[, rec_id])
    Arrow batch, byte-identical to the AvroCodec/confluent_frame path.

    Field layout (ENRICHED_RECORD_AVSC order): id long, user_id long,
    name string, segment string, event_type union[null,string],
    value union[null,double]; framed as magic 0x00 + 4-byte BE schema id.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n = batch.num_rows
    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    uids = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    name_d, name_s, name_l, name_null = _string_parts(batch.column("name"))
    seg_d, seg_s, seg_l, seg_null = _string_parts(batch.column("segment"))
    et_d, et_s, et_l, et_null = _string_parts(batch.column("event_type"))
    if name_null.any() or seg_null.any():
        raise ValueError("name/segment are non-nullable in ENRICHED_RECORD_AVSC")

    vcol = batch.column("value")
    if isinstance(vcol, pa.ChunkedArray):
        vcol = vcol.combine_chunks()
    vals = vcol.to_numpy(zero_copy_only=False).astype(np.float64)
    # the row-path producer maps BOTH null and NaN to the union's null
    # branch (pd.isna); mirror that exactly (nulls surface as NaN here)
    v_null = pc.is_null(vcol).to_numpy(zero_copy_only=False) | np.isnan(vals)

    id_m, id_l = varint_parts(zigzag64(ids))
    uid_m, uid_l = varint_parts(zigzag64(uids))
    namelen_m, namelen_l = varint_parts(zigzag64(name_l))
    seglen_m, seglen_l = varint_parts(zigzag64(seg_l))
    etlen_m, etlen_l = varint_parts(zigzag64(et_l))

    et_present = ~et_null
    # per-row body length: varints + string bytes + union tag bytes
    body = (
        id_l + uid_l
        + namelen_l + name_l
        + seglen_l + seg_l
        + 1 + np.where(et_present, etlen_l + et_l, 0)
        + 1 + np.where(v_null, 0, 8)
    )
    rec = body + 5  # confluent frame: magic + 4-byte schema id
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(rec, out=offsets[1:])
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)

    cur = offsets[:-1].copy()
    # frame prefix
    out[cur] = 0x00
    sid = np.frombuffer(np.int32(schema_id).byteswap().tobytes(), dtype=np.uint8)
    for k in range(4):
        out[cur + 1 + k] = sid[k]
    cur += 5
    _scatter_varints(out, cur, id_m, id_l); cur += id_l
    _scatter_varints(out, cur, uid_m, uid_l); cur += uid_l
    _scatter_varints(out, cur, namelen_m, namelen_l); cur += namelen_l
    _scatter_ranges(out, cur, name_d, name_s, name_l); cur += name_l
    _scatter_varints(out, cur, seglen_m, seglen_l); cur += seglen_l
    _scatter_ranges(out, cur, seg_d, seg_s, seg_l); cur += seg_l
    # event_type union tag: zigzag(0) = 0x00, zigzag(1) = 0x02
    out[cur] = np.where(et_present, np.uint8(0x02), np.uint8(0x00)); cur += 1
    m = et_present
    _scatter_varints(out[:], cur[m], etlen_m[m], etlen_l[m])
    cur = cur + np.where(m, etlen_l, 0)
    _scatter_ranges(out, cur[m], et_d, et_s[m], et_l[m])
    cur = cur + np.where(m, et_l, 0)
    # value union tag + little-endian double
    out[cur] = np.where(v_null, np.uint8(0x00), np.uint8(0x02)); cur += 1
    vm = ~v_null
    vbytes = vals[vm].astype("<f8").view(np.uint8).reshape(-1, 8)
    for k in range(8):
        out[cur[vm] + k] = vbytes[:, k]

    key_bytes = ids.astype(">i8").view(np.uint8)
    key_offsets = np.arange(n + 1, dtype=np.int64) * 8
    arrays = [
        _binary_array(key_bytes, key_offsets),
        _binary_array(out, offsets),
        pa.array(default_partition_vec(ids, n_partitions), type=pa.int32()),
    ]
    names = ["key", "value", "partition"]
    if with_rec_id:
        arrays.append(pa.array(ids, type=pa.int64()))
        names.append("rec_id")
    return pa.RecordBatch.from_arrays(arrays, names=names)


# -- EnrichedEvent decode ----------------------------------------------------

def decode_enriched_batch(value_col):
    """Framed EnrichedEvent payloads -> Arrow batch (id, user_id, name,
    segment, event_type, value) — the vectorized consumer-side twin."""
    import pyarrow as pa

    if isinstance(value_col, pa.ChunkedArray):
        value_col = value_col.combine_chunks()
    n = len(value_col)
    off_width = np.int32 if pa.types.is_binary(value_col.type) else np.int64
    off = np.frombuffer(value_col.buffers()[1], dtype=off_width)[
        value_col.offset : value_col.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(value_col.buffers()[2], dtype=np.uint8)
    pos = off[:-1].copy()
    if n and (data[pos] != 0).any():
        raise ValueError("bad Confluent magic byte in transcript value")
    pos += 5  # magic + schema id

    ids, pos = varint_decode(data, pos)
    uids, pos = varint_decode(data, pos)

    def read_string(pos):
        lens, pos = varint_decode(data, pos)
        lens = lens.astype(np.int64)
        s_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=s_off[1:])
        buf = np.zeros(int(s_off[-1]), dtype=np.uint8)
        _scatter_ranges(buf, s_off[:-1], data, pos, lens)
        return buf, s_off, pos + lens

    name_buf, name_off, pos = read_string(pos)
    seg_buf, seg_off, pos = read_string(pos)

    et_tag, pos = varint_decode(data, pos)
    et_present = et_tag == 1
    et_lens = np.zeros(n, dtype=np.int64)
    if et_present.any():
        lens_p, pos_p = varint_decode(data, pos[et_present])
        et_lens[et_present] = lens_p
        pos = pos.copy()
        pos[et_present] = pos_p
    et_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(et_lens, out=et_off[1:])
    et_buf = np.zeros(int(et_off[-1]), dtype=np.uint8)
    _scatter_ranges(et_buf, et_off[:-1], data, pos, et_lens)
    pos = pos + et_lens

    v_tag, pos = varint_decode(data, pos)
    v_present = v_tag == 1
    vals = np.full(n, np.nan, dtype=np.float64)
    if v_present.any():
        vb = np.empty((int(v_present.sum()), 8), dtype=np.uint8)
        vp = pos[v_present]
        for k in range(8):
            vb[:, k] = data[vp + k]
        vals[v_present] = vb.reshape(-1).view("<f8")

    return pa.RecordBatch.from_arrays(
        [
            pa.array(ids, type=pa.int64()),
            pa.array(uids, type=pa.int64()),
            _string_array(name_buf, name_off, np.zeros(n, dtype=bool)),
            _string_array(seg_buf, seg_off, np.zeros(n, dtype=bool)),
            _string_array(et_buf, et_off, ~et_present),
            pa.array(vals, type=pa.float64(), mask=~v_present),
        ],
        names=["id", "user_id", "name", "segment", "event_type", "value"],
    )
