"""Scalar expression helpers shared by the operator layer.

All are thin compositions of built-in ``pyspark.sql.functions`` —
JVM-side, codegen-eligible, zero Python UDFs (the reference likewise
registers no UDFs anywhere; SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zero_guard_ratio(num: Column, denom: Column) -> Column:
    """Ratio with the reference's zero-guard semantics: returns 0.0
    (not NULL) when the denominator is not positive.

    Reference: funnel_jobs.sql:37-53, aggregation_jobs.sql:90-151 —
    ``CASE WHEN d > 0 THEN CAST(n AS DOUBLE)/CAST(d AS DOUBLE) ELSE 0.0 END``.
    """
    return F.when(denom > 0, num.cast("double") / denom.cast("double")).otherwise(F.lit(0.0))


def decode_priority(col: Column) -> Column:
    """Small-domain decode via a CASE chain — same shape as the
    reference's auction-type decode (scripts/query-examples.sh:73-77)."""
    return (
        F.when(col.startswith("1"), "Critical")
        .when(col.startswith("2"), "High")
        .when(col.startswith("3"), "Medium")
        .otherwise("Low")
    )


def event_class(event_type: Column) -> Column:
    """Multi-branch classification, the device-category CASE analog
    (reference: insert_jobs.sql:92-98)."""
    return (
        F.when(event_type == "purchase", "Revenue")
        .when(event_type.isin("click", "view"), "Engagement")
        .when(event_type == "signup", "Acquisition")
        .when(event_type == "error", "Fault")
        .otherwise("Unknown")
    )
