"""Hashing expressions — expression/ext/hashing/hashing_expressions.h.

SupersonicFingerprint (deterministic 64-bit content hash, :28) and
SupersonicHash(e, seed) (:35).  Bit-compatibility with the reference's
Fingerprint/Hash64WithSeed (hashing_evaluators.h:31-60) is explicitly NOT a
goal (SURVEY.md §2.7) — the contract is: deterministic, well-distributed,
64-bit, seedable.  Spark's xxhash64 meets it JVM-side (codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x if isinstance(x, Column) else F.lit(x)


def fingerprint(*cols) -> Column:
    """Deterministic 64-bit hash of the value(s); NULL-insensitive the same
    way the reference folds NULL into a fixed tag."""
    return F.xxhash64(*[_c(c) for c in cols])


def hash_with_seed(col, seed: int) -> Column:
    """SupersonicHash(e, seed).  xxhash64's seed argument is fixed in the
    SQL surface, so mix the seed in as a leading hashed column — same
    determinism/distribution contract."""
    return F.xxhash64(F.lit(seed), _c(col))


def murmur32(*cols) -> Column:
    """32-bit Murmur3 (Spark's `hash`) — used where narrower buckets are
    wanted (e.g. LSH band ids)."""
    return F.hash(*[_c(c) for c in cols])
