"""Query registry: the engine's certified query inventory.

Every entry pairs a Spark implementation (``fn(spark, sf_dir) ->
DataFrame``) with, where SQL-expressible, an ANSI-SQL oracle that
DuckDB runs on the same parquet tables. The driver hash-compares the
two — this registry IS the correctness contract (SURVEY.md §2.11
re-expressed on the engine's tables).

Column-name parity rule: every computed/aggregate column is aliased
identically in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate REGISTRY.
    from streaming_data_lake_spark.queries import (  # noqa: F401
        core,
        matq,
        pipeline,
        platform,
        streamq,
    )

    return dict(REGISTRY)
