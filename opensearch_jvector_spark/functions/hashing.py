"""Portable deterministic hashes — identical in Spark, DuckDB and numpy.

All dedup/fingerprint operators hash through the first 8 hex chars of
md5 (a uint32), because md5 is the one hash all three engines compute
identically. Spark's xxhash64/hash and DuckDB's hash() are different
algorithms — never use them where an oracle comparison happens.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

H32_MOD = 1 << 32
MERSENNE31 = 2147483647


def h32_col(c: Column) -> Column:
    """uint32 hash of a string column (Catalyst)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """Same hash in DuckDB SQL."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def minhash_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod p — shared
    by the Spark operator and the generated oracle SQL."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE31, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, MERSENNE31, size=num_hashes, dtype=np.int64)
    return [(int(x), int(y)) for x, y in zip(a, b)]
