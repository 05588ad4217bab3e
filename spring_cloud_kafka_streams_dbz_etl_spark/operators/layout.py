"""Data-layout operators: Z-order (Morton) multi-dimensional clustering.

At 100 TB the scan layer wins or loses on file skipping: parquet
min/max statistics prune row groups only when rows with nearby values
are physically adjacent. A single-column sort gives perfect pruning on
that column and NONE on any other; interleaving the bits of several
columns (the Z-order / Morton curve) gives every indexed column a
bounded value range per file — each file covers a small hyper-rectangle
of the key space, so a selective filter on ANY of the z-ordered columns
skips most files. This is the clustering primitive behind
Delta/Iceberg `OPTIMIZE ZORDER BY`.

Everything here is integer bit arithmetic in built-in expressions
(shiftleft/or/bitwise ops in whole-stage codegen) — exactly mirrorable
in oracle SQL, zero Python, zero shuffle for the z-value itself; the
clustered WRITE is one range repartition on the z-value (the same
single shuffle a plain sort-write costs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integral)
    column into one Morton code: output bit ``i*len(cols)+j`` is bit
    ``i`` of ``cols[j]``. Columns must already be rank/bucket-encoded to
    [0, 2^bits); clamp upstream. 2 cols x 16 bits -> 32-bit code.

    Pure bit arithmetic (shiftright/&1/shiftleft chains) — codegen'd,
    deterministic, engine-portable.
    """
    n = len(cols)
    out: Column | None = None
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftleft(
                F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)),
                i * n + j,
            )
            out = bit if out is None else out.bitwiseOR(bit)
    assert out is not None
    return out


def min_max_bucket(c: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Scale a numeric column into [0, 2^bits) given its min/max (as
    columns so they can come from a 1-row broadcast aggregate): the
    rank-free encoding for z-ordering continuous values."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (c.cast("double") - lo) / span
    scaled = F.floor(frac * ((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), scaled))


def z_file_id(zcol: Column, total_bits: int, n_files: int) -> Column:
    """Map a z-value to its file: the top log2(n_files) bits of the
    code. Each file is then one contiguous z-range — a union of small
    hyper-rectangles in the original key space, which is what bounds
    every z-ordered column's min/max per file (the file-skipping
    property). Map-only and deterministic, unlike sampled
    repartitionByRange boundaries; production writes
    `df.repartitionByRange(n, zcol).sortWithinPartitions(zcol)` and gets
    the same clustering with balanced file sizes (one range shuffle,
    the cost of any sorted write).

    The id space rounds ``n_files`` UP to the next power of two: ids lie
    in [0, 2^ceil(log2(n_files))), so a non-power-of-two request (e.g.
    65) may yield up to ~2x more distinct ids (128) than asked. Pass a
    power of two for an exact file count (callers in this repo do), or
    use the repartitionByRange form above when an exact count matters.
    """
    shift = total_bits - max(1, n_files - 1).bit_length()
    if shift < 0:
        raise ValueError(f"n_files={n_files} needs more than {total_bits} z bits")
    return F.shiftright(zcol, shift).cast("int")
