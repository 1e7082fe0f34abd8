"""Skew-mitigation operators (SURVEY.md §7.6 scale discipline).

AQE's skew-join splitting handles skewed SHUFFLE JOINS at runtime;
these helpers cover the complementary cases:

 - :func:`salted_two_phase_agg` — aggregation onto few heavy keys.
   A direct ``groupBy(key)`` sends every row of a hot key to one
   reducer; salting first aggregates on (key, salt) — fanning each
   hot key across ``n_salts`` reducers — then combines the partial
   aggregates. Only algebraic aggregates (count/sum/min/max) compose
   this way; avg is derived as sum/count at the end.
 - :func:`replicated_skew_join` — joining a skewed fact key against a
   small dimension when broadcast is not possible: replicate the dim
   ``n_salts`` times with a salt column and salt the fact side
   deterministically, so each hot key's rows spread over n reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_expr(unique_col: str | Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): derived from a
    high-cardinality column so re-runs partition identically."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.hash(c), F.lit(n_salts))


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    salt: Column,
    counts: list[tuple[str, str]],
    sums: list[tuple[Column, str]],
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) combine. ``counts`` = [(alias, '*')], ``sums`` =
    [(expr, alias)]; the result matches the direct single-phase
    groupBy exactly (count/sum are algebraic)."""
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__pc"),
        *[F.sum(expr).alias(f"__ps_{alias}") for expr, alias in sums],
    )
    return partial.groupBy(*keys).agg(
        *[F.sum("__pc").alias(alias) for alias, _ in counts],
        *[F.sum(f"__ps_{alias}").alias(alias) for _, alias in sums],
    )


def replicated_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: Column,
    n_salts: int,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: dim rows are replicated once per salt via
    an explode (dim must be small — replication multiplies it), the
    fact side gets a deterministic salt, and the join key becomes
    (key, salt) so hot keys spread across ``n_salts`` reducers.

    Only fact-preserving ``how`` values are accepted: under a
    right/full outer join an unmatched dim key would surface once
    PER SALT (the dim side is replicated), silently multiplying its
    row count by ``n_salts``. Flip the sides (dim as fact) or use an
    unsalted join for dim-preserving semantics."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"replicated_skew_join: how={how!r} is dim-preserving; the "
            f"replicated dim side would emit unmatched dim rows once per "
            f"salt ({n_salts}x)"
        )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_fact = fact.withColumn("__salt", salt.cast("int"))
    return salted_fact.join(salted_dim, [key, "__salt"], how).drop("__salt")
