"""Mergeable sketch constructions shared by batch and streaming.

Public-literature basis: HyperLogLog is Flajolet, Fusy, Gandouet,
Meunier, "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm" (AofA 2007), including the small-range
linear-counting fallback; Count-Min is Cormode & Muthukrishnan, "An
improved data stream summary: the count-min sketch and its
applications" (J. Algorithms 2005).

A sketch whose per-key state merges associatively (HLL registers
merge by MAX, Count-Min cells by SUM) is exactly the shape that
works in BOTH execution modes: batch computes it as one two-phase
aggregate, streaming folds micro-batches into the same converged
state through an upsert sink — and because the merge is associative
and duplicate-insensitive (for HLL), the converged streaming table
is bit-identical to the batch result, so one oracle certifies both
paths. All expressions derive from the portable md5 ``h32``
(functions/hashing.py) so DuckDB reproduces every register.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_data_lake_spark.functions.hashing import h32

HLL_M = 64  # 2^6 buckets; h32 leaves 26 bits for the rank pattern
HLL_ALPHA = 0.709  # standard alpha for m=64

#: Linear-counting values m*ln(m/(m-V)) for V = 1..m-1 occupied
#: buckets, precomputed ONCE in Python and compiled as literals into
#: both engines' plans (indexed 1-based by V). ``repr(float)``
#: round-trips exactly, so the Spark literal and the oracle SQL
#: literal denote the identical double — no runtime ln() anywhere.
HLL_LC_TABLE = tuple(HLL_M * math.log(HLL_M / (HLL_M - v)) for v in range(1, HLL_M))


def hll_lc_case_sql(v_expr: str) -> str:
    """The linear-counting lookup as ANSI-SQL (a CASE over the m-1
    possible occupied-bucket counts) for DuckDB oracles — the same
    literals as the Spark plan, so parity is exact by construction."""
    branches = " ".join(
        f"WHEN {v} THEN {val!r}" for v, val in enumerate(HLL_LC_TABLE, start=1)
    )
    return f"CASE {v_expr} {branches} END"


def hll_bucket_and_rho(key: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one hashed key: low 6 bits pick the
    register, the remaining 26 bits' leading-zero rank is rho."""
    hv = h32(key)
    w = F.shiftright(hv, 6)
    rho = F.when(w == 0, F.lit(27)).otherwise(
        F.lit(27) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (hv % HLL_M).alias("bucket"), rho.alias("rho")


def hll_registers(df: DataFrame, group_cols: list[str], key: Column) -> DataFrame:
    """Register table: one row per (group, bucket) holding MAX(rho).
    Map-side combinable, duplicate-insensitive, and merge-associative
    — the properties that make it both a cheap batch aggregate and a
    valid streaming upsert state.

    NULL keys are dropped BEFORE hashing: COUNT(DISTINCT key)
    semantics ignore NULLs, and md5(NULL) = NULL would otherwise emit
    a NULL-bucket register row that inflates n_buckets (skewing the
    estimate) — and, on the streaming path, kills the MERGE sink
    whose keys include the bucket (null-key contract,
    sources/upsert.py). Oracles carry the same IS NOT NULL guard."""
    bucket, rho = hll_bucket_and_rho(key)
    return (
        df.filter(key.isNotNull())
        .select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Per-group cardinality estimate from a register table, with the
    standard small-range linear-counting correction (Flajolet et al.
    2007): below 2.5·m the raw harmonic estimate is biased high, so
    fall back to counting empty buckets.

    No transcendental is evaluated AT RUNTIME in either engine: the
    linear-counting term m·ln(m/(m-V)) has only m-1 possible inputs,
    so the values are precomputed in Python (:data:`HLL_LC_TABLE`)
    and compiled as literals into both the Spark plan and the DuckDB
    oracle — JVM ``Math.log`` and libm ``ln`` may differ in the last
    ulp, the same cross-engine class as the banned ``pow()``
    (verify-skill float rules). Likewise 2^-rho is an exact power of
    two computed as ``1.0 / (1 << rho)`` (correctly-rounded division
    by spec) instead of trusting each engine's ``pow``."""
    est = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        (
            # F.shiftleft takes only a literal shift amount; the SQL
            # form accepts a column for it.
            F.sum(F.expr("1.0 / cast(shiftleft(cast(1 as bigint), m_j) as double)"))
            + (F.lit(HLL_M) - F.count(F.lit(1)))
        ).alias("denom"),
    )
    raw = F.lit(HLL_ALPHA) * HLL_M * HLL_M / F.col("denom")
    # lit_doubles: the 63-entry linear-counting table as ONE
    # driver→JVM call instead of one per element (bit-identical
    # literals — see similarity.lit_doubles).
    from streaming_data_lake_spark.operators.similarity import lit_doubles

    corrected = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("n_buckets") < HLL_M),
        F.element_at(lit_doubles(HLL_LC_TABLE), F.col("n_buckets").cast("int")),
    ).otherwise(raw)
    return est.select(
        *group_cols, "n_buckets", F.round(corrected, 4).alias("hll_estimate")
    )


CMS_D = 4  # hash rows
CMS_W = 256  # buckets per row


def _cms_seed_buckets(token: Column | str) -> Column:
    """Array of (seed, bucket) structs — one per hash row. Given a
    column NAME, the tree (d seeded-hash chains) is memoized per name
    — both sketch passes and every lookup rebuild it otherwise
    (functions/scalar.memo_column)."""
    from streaming_data_lake_spark.functions.hashing import h32_seeded
    from streaming_data_lake_spark.functions.scalar import memo_column

    def build(col: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(s).alias("seed"),
                    (h32_seeded(col, s) % CMS_W).alias("bucket"),
                )
                for s in range(CMS_D)
            ]
        )

    if isinstance(token, str):
        return memo_column(("cms_seed_buckets", token), lambda: build(F.col(token)))
    return build(token)


def cms_cells(tok: DataFrame, token_col: str = "token") -> DataFrame:
    """Count-Min grid from a token stream: one row per (seed, bucket)
    holding the cell count. SUM-merged, map-side combinable — the
    fixed-size (d×w) summary that works identically as a batch
    aggregate and as a streaming upsert state. NULL tokens are
    dropped — the same null-key discipline as hll_registers:
    h32_seeded(NULL) is NULL, so a null token would occupy
    (seed, NULL) cells that no lookup's equi-join can ever reach,
    breaking the estimate >= truth invariant for it."""
    return (
        tok.filter(F.col(token_col).isNotNull())
        .select(F.explode(_cms_seed_buckets(token_col)).alias("sb"))
        .groupBy(F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(cand: DataFrame, cells: DataFrame, token_col: str = "token") -> DataFrame:
    """Point-query the sketch for each candidate token: min over the
    d rows' cells (the Count-Min estimate, always >= truth). The grid
    is at most d×w rows — broadcast it.

    LEFT join + coalesce(0): a cell no stream token ever hit is an
    implicit zero in the grid, so a candidate OUTSIDE the sketched
    stream correctly estimates 0 instead of vanishing from the output
    (an inner join would silently drop it, and min over a partial set
    of cells overestimates)."""
    probes = cand.select(
        "*", F.explode(_cms_seed_buckets(token_col)).alias("sb")
    ).select(
        *cand.columns,
        F.col("sb.seed").alias("seed"),
        F.col("sb.bucket").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["seed", "bucket"], "left")
        .groupBy(*cand.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


CMS_TOPK = 20  # candidate set size for heavy-hitter certification


def cms_topk_candidates(tok: DataFrame, token_col: str = "token", k: int = CMS_TOPK) -> DataFrame:
    """Exact top-k tokens with true counts (deterministic total order:
    count desc, token asc) — the candidate set the sketch estimates
    are exhibited against. Shared by the batch query and the
    streaming pipeline so the candidate definition can never drift
    from the oracle's.

    orderBy+limit, NOT a global row_number window: Spark plans the
    former as a distributed TakeOrderedAndProject (each partition
    keeps k rows, driver merges), while an un-partitioned window
    would drag the whole vocabulary-sized truth table through one
    task. Same deterministic result set. NULL tokens are excluded to
    match cms_cells' null-key discipline (a NULL candidate would
    estimate 0 against any true_n)."""
    truth = (
        tok.filter(F.col(token_col).isNotNull())
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    return truth.orderBy(F.desc("true_n"), F.asc(token_col)).limit(k)
