"""Cross-engine-stable hashing primitives.

Spark's ``hash()``/``xxhash64()`` are Murmur3/xxHash with Spark-specific
seeds — not reproducible in other engines. For operators whose *results*
must be engine-portable (minhash signatures, simhash fingerprints, LSH band
keys, document fingerprints) we build everything from ``md5`` hex strings,
which are identical everywhere:

- ``md5_hex(col)``          — 32-char lowercase hex digest
- ``seeded_md5(seed, col)`` — md5(seed || ':' || col): one cheap "hash
  family" member per integer seed (the classic minhash K-permutation
  approximation)
- ``hex_nibble(hexcol, pos)`` — integer value 0..15 of one hex char
  (drives simhash bit extraction)

Hex-string *ordering* (lexicographic over [0-9a-f]) equals numeric ordering
of the digest, so ``min(md5(...))`` is a valid minhash without any
hex->int conversion. All helpers are built-in-function compositions —
JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column) -> Column:
    return F.md5(col)


def seeded_md5(seed: int, col: Column) -> Column:
    """DuckDB twin: ``md5(<seed> || ':' || col)``."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


def hex_nibble(hexcol: Column, pos: int) -> Column:
    """Value of the hex digit at 1-based ``pos`` as an int in 0..15.

    DuckDB twin: ``strpos('0123456789abcdef', substr(h, pos, 1)) - 1``.
    Spark side uses ``conv(digit, 16, 10)`` — same result for [0-9a-f].
    """
    return F.conv(F.substring(hexcol, pos, 1), 16, 10).cast("int")
