"""Bloom-filter runtime join pruning (the engine's runtime-filter /
dynamic-filtering analog, cf. Trino dynamic filters and Spark's own
InjectRuntimeFilter — reference queries prune fact scans through dim
predicates, e.g. streaming/flink/sql/funnel_fast.sql's dim filters).

Shape: the (filtered) dim side's join keys are folded into ONE
fixed-size bitmap of 64-bit words via a map-side-combinable ``bit_or``
aggregate, then injected into the fact side as a PLAIN SCAN PREDICATE
(a literal array in the filter expression). Because it is an ordinary
predicate, Catalyst keeps it in the fact scan's Filter — BELOW any
later shuffle or join — so at 100 TB the shuffle carries only probable
matches. That is the point of the pattern, and it is why the bitmap is
embedded as a literal rather than joined in declaratively: a one-row
broadcast crossJoin variant was tried first, and Catalyst pushes the
later exact semi-join below the cross join, inverting the
prune-before-shuffle ordering (verified on the executed plan).

The bitmap fetch is bounded control flow, not a data-path collect:
``m_bits/8`` bytes (2 KiB at defaults) regardless of dim or fact size
— the same class as the materializer's watermark probe and the IVF
probe-id fetch.

The filter is semantically transparent: false positives are removed by
the exact (semi-)join that follows, false negatives cannot occur — so
correctness oracles are the plain join, and the Bloom pass is pure
plan optimization.

Sizing: ``m_bits`` should be ~10× the expected dim-key cardinality for
a ~1 % FP rate at k=3. Size m from the dim count at real scale.

Everything per-row is JVM-side: ONE xxhash64 base hash with k affine
mixes, shiftright bit tests — no UDFs. The base is xxhash64, NOT the
md5-backed portable h32 the parity-certified operators use: the Bloom
pass is semantically transparent (see above), so it needs no
cross-engine hash reproducibility — only build/probe lockstep within
Spark — and the interpreted md5→conv→substring chain was the hot
instruction of the injected scan filter (guide §1.2 per-task work:
~µs/row crypto replaced by ~ns/row native hashing; the forall
membership lambda is interpreted, so codegen CSE never rescued the
k-fold md5 re-evaluation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_data_lake_spark.functions.hashing import MIX_P, mix_consts

DEFAULT_M_BITS = 16384
DEFAULT_K = 3

# The k hash functions are affine mixes of ONE base hash: hashing k
# independent full hashes per fact row would make the hash the hot
# instruction of the injected scan filter at scale — the exact trap
# functions/hashing.py documents for MinHash. The base is masked to
# 32 bits so the affine mix (a ≈ 2³⁰, base < 2³²) stays inside long
# range — an unmasked xxhash64 base would overflow a*base under ANSI.
# key.cast("string") parity with the portable hash family is dropped
# on purpose: the key is hashed in its native type (module docstring
# — Bloom needs no cross-engine reproducibility, and the string cast
# was itself per-row work).

_BASE_MASK = 0xFFFFFFFF


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions of a key: one native 64-bit base hash
    masked to 32 bits, k affine mixes. Build side; must stay in
    lockstep with :func:`_pos_sql` (the no-false-negatives property
    test catches drift)."""
    base = F.xxhash64(key).bitwiseAND(F.lit(_BASE_MASK))
    return [((F.lit(a) * base + F.lit(b)) % F.lit(MIX_P)) % F.lit(m_bits)
            for a, b in (mix_consts(i) for i in range(k))]


def _pos_sql(key_col: str, i: int, m_bits: int) -> str:
    """SQL text of the i-th bit position of ``key_col`` — the exact
    arithmetic :func:`_positions` builds via the Column API."""
    a, b = mix_consts(i)
    # Backtick-quote the identifier: the Column-API build side handles
    # any column name, so the SQL probe side must too or the
    # build/probe lockstep silently holds only for identifier-safe
    # names.
    ident = f"`{key_col.replace('`', '``')}`"
    base = f"(xxhash64({ident}) & {_BASE_MASK})"
    return f"((({a} * {base} + {b}) % {MIX_P}) % {m_bits})"


def bloom_bitmap(
    dim: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """ONE-row DataFrame ``(bmap: map<int,long>)``: the Bloom bitmap
    of ``dim[key_col]`` as 64-bit words keyed by word index. Built
    with a map-side-combinable ``bit_or`` aggregate — the shuffle is
    at most ``m_bits/64`` rows regardless of dim size."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    # NULL keys can never match the exact equi-join the Bloom pass
    # pre-filters for, and md5(NULL)=NULL would crash map_from_entries
    # with NULL_MAP_KEY — drop them before hashing.
    words = dim.filter(F.col(key_col).isNotNull()).select(pos).select(
        F.expr("cast(pos div 64 as int)").alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
    )
    bm = words.groupBy("word_idx").agg(F.bit_or("mask").alias("bits"))
    return bm.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "bits"))).alias("bmap")
    )


def bloom_condition(
    key_col: str, dense_words: list[int], m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> Column:
    """Membership-test predicate over a DENSE word list embedded as a
    plan literal. All k bits must be set; missing/zero words fail the
    test naturally.

    The bitmap array literal (``m_bits/64`` longs — 256 at defaults)
    appears EXACTLY ONCE: the k bit tests are a ``forall`` lambda over
    the array of k positions, so expression/codegen size is O(m + k)
    rather than the k·m of chaining k standalone conjuncts each
    re-embedding the array."""
    arr = "array(" + ", ".join(f"{int(w)}L" for w in dense_words) + ")"
    positions = ", ".join(_pos_sql(key_col, i, m_bits) for i in range(k))
    return F.expr(
        f"forall(array({positions}), p -> "
        f"(shiftright(element_at({arr}, cast(p div 64 as int) + 1), "
        f"cast(p % 64 as int)) & 1) = 1)"
    )


def bloom_prefilter(
    fact: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Rows of ``fact`` whose key passes the Bloom membership test.
    May keep false positives — follow with the exact join. The
    bounded one-row bitmap fetch densifies into the scan predicate
    (module docstring explains why injection beats a declarative
    bitmap join here)."""
    rows = bitmap.collect()
    bmap = dict(rows[0].bmap) if rows and rows[0].bmap is not None else {}
    # Ceil-divide: positions run to m_bits-1, so a non-multiple-of-64
    # m needs the final partial word too — truncating it would turn
    # true matches into false NEGATIVES (or an ANSI element_at error).
    dense = [int(bmap.get(w, 0)) for w in range((m_bits + 63) // 64)]
    return fact.filter(bloom_condition(key_col, dense, m_bits, k))
