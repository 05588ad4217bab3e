"""Portable helper expressions (all JVM-side Column expressions).

Everything here compiles to built-in Catalyst expressions — no Python UDFs —
so the hot path stays inside whole-stage codegen. Each helper has a
documented DuckDB-SQL twin used by the oracle layer (queries/*.py) so the
same computation is bit-reproducible across engines.
"""

from .scalars import dec_sum, exact_avg, money
from .hashing import md5_hex, seeded_md5, hex_nibble

__all__ = ["dec_sum", "exact_avg", "money", "md5_hex", "seeded_md5", "hex_nibble"]
