"""Bloom-filter runtime join pruning (the engine's runtime-filter /
dynamic-filtering analog, cf. Trino dynamic filters and Spark's own
InjectRuntimeFilter — reference queries prune fact scans through dim
predicates, e.g. streaming/flink/sql/funnel_fast.sql's dim filters).

Shape: the (filtered) dim side's join keys are folded into ONE
fixed-size bitmap row — a ``map<int,long>`` of 64-bit words — which
broadcasts to every fact task as a one-row crossJoin (the repo's
scalar-subquery pattern: no driver collect on the data path). The
fact side then tests its k hash positions map-side BEFORE any
shuffle/join, so at 100 TB the shuffle carries only probable matches.
The filter is semantically transparent: false positives are removed
by the exact (semi-)join that follows, false negatives cannot occur —
so correctness oracles are the plain join, and the Bloom pass is pure
plan optimization.

Sizing: ``m_bits`` should be ~10× the expected dim-key cardinality
for a ~1 % FP rate at k=3. The bitmap is m_bits/8 bytes (default
16384 bits = 2 KiB) — broadcast cost is trivial; size m from the dim
count at real scale.

Everything is JVM-side: md5-derived hashes (functions/hashing.h32),
bit_or aggregation, shiftleft/shiftright bit tests — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_data_lake_spark.functions.hashing import h32_seeded

DEFAULT_M_BITS = 16384
DEFAULT_K = 3


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions of a key (hashed via the portable seeded
    32-bit hash so build and probe agree across DataFrames)."""
    s = key.cast("string")
    return [h32_seeded(s, i) % F.lit(m_bits) for i in range(k)]


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
    words = dim.select(pos).select(
        F.expr("cast(pos div 64 as int)").alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
    )
    bm = words.groupBy("word_idx").agg(F.bit_or("mask").alias("bits"))
    return bm.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "bits"))).alias("bmap")
    )


def bloom_prefilter(
    fact: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Rows of ``fact`` whose key passes the Bloom membership test
    (all k bits set). Map-side: the one-row bitmap rides in as a
    broadcast crossJoin; absent words read as 0 via coalesce. May
    keep false positives — follow with the exact join."""
    probed = fact.crossJoin(F.broadcast(bitmap))
    for i, p in enumerate(_positions(F.col(key_col), m_bits, k)):
        probed = probed.withColumn(f"_bf_pos_{i}", p)
    cond = None
    for i in range(k):
        bit = F.expr(
            f"(shiftright(coalesce(element_at(bmap, "
            f"cast(_bf_pos_{i} div 64 as int)), 0L), "
            f"cast(_bf_pos_{i} % 64 as int)) & 1) = 1"
        )
        cond = bit if cond is None else (cond & bit)
    return probed.filter(cond).drop("bmap", *[f"_bf_pos_{i}" for i in range(k)])
