"""Portable deterministic hashing, identical in Spark and DuckDB.

The training-data-pipeline operators (MinHash, SimHash, LSH,
fingerprinting) need a hash function that the DuckDB oracle can
reproduce bit-for-bit. Spark's ``F.hash`` (murmur3) and DuckDB's
``hash()`` differ, so we derive a 32-bit unsigned value from the
leading 8 hex chars of MD5 — both engines implement standard MD5 and
hex→int conversion, so ``h32(x)`` == ``duck_h32('x')`` for all
inputs.

At scale this stays JVM-side in Spark (md5/conv/substring are
codegen'd built-ins, no Python round trip).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32(col: Column | str) -> Column:
    """Unsigned 32-bit hash of a string column (fits in a long)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h32_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: hash of ``"{seed}:" || value``. Used to build
    the k independent hash functions of a MinHash signature."""
    c = F.col(col) if isinstance(col, str) else col
    return h32(F.concat(F.lit(f"{seed}:"), c))


def duck_h32(expr: str) -> str:
    """DuckDB SQL fragment equal to :func:`h32` applied to ``expr``."""
    return f"CAST('0x' || substring(md5({expr}), 1, 8) AS BIGINT)"


def duck_h32_seeded(expr: str, seed: int) -> str:
    return duck_h32(f"'{seed}:' || {expr}")


# -- MinHash hash family: one md5 base per value, k affine mixes ------------
#
# Computing k independent md5 hashes per (doc, shingle) makes md5 the
# hot instruction at scale. The standard universal-hashing fix: hash
# each shingle ONCE, then derive the k functions as affine maps
# h_i(x) = (a_i·base(x) + b_i) mod P over a Mersenne prime. base < 2³²
# and a_i < 2³¹ keep every product inside a signed 64-bit long, so
# Spark and DuckDB agree bit-for-bit with no overflow semantics in play.

MIX_P = 2147483647  # 2^31 - 1


def mix_consts(i: int) -> tuple[int, int]:
    """Deterministic (aᵢ, bᵢ) for the i-th affine hash function."""
    a = (1103515245 * (i + 1) + 12345) % MIX_P or 1
    b = (69069 * (i + 1) + 1) % MIX_P
    return a, b


def minhash_mix(base: Column, i: int) -> Column:
    a, b = mix_consts(i)
    return (F.lit(a) * base + F.lit(b)) % F.lit(MIX_P)


def duck_minhash_mix(expr: str, i: int) -> str:
    """DuckDB SQL fragment equal to :func:`minhash_mix` applied to a
    BIGINT base-hash expression."""
    a, b = mix_consts(i)
    return f"(({a} * {expr} + {b}) % {MIX_P})"
