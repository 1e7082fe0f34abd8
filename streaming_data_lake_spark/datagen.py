"""Deterministic SCD2 dimension seeding (SURVEY.md S8).

The reference seeds 13 dimension tables from a pure-function hierarchy
builder with fixed cardinalities (mock-data-gen/mock_data_gen/
dimension_mapping.py:167-295, seeded by iceberg/seed_dimensions.py:
30-47) and skips seeding when the table already has rows. Same
contract here: a two-level user hierarchy (10 tiers → 3 segments)
derived purely from key arithmetic, so any engine — including the
DuckDB oracle — can regenerate it bit-for-bit, and an idempotent
seeder guarded on table non-emptiness.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession

SEGMENTS = {0: "casual", 1: "regular", 2: "power"}
# TZ-aware UTC: createDataFrame converts NAIVE datetimes through the
# driver OS timezone (TimestampType.toInternal uses time.mktime), so
# a naive literal writes a different instant on a non-UTC host even
# when spark.sql.session.timeZone is pinned. Aware-UTC datetimes pin
# the internal micros regardless of host TZ.
_V0 = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)

TIER_SCHEMA = (
    "bucket long, tier_label string, segment_id long, "
    "valid_from timestamp, valid_to timestamp, is_current boolean"
)
SEGMENT_SCHEMA = (
    "segment_id long, segment_name string, "
    "valid_from timestamp, valid_to timestamp, is_current boolean"
)


def build_dim_tier(spark: SparkSession) -> DataFrame:
    """10 tiers, one SCD2 current version each; segment = bucket % 3."""
    rows = [
        (b, f"tier_{b}", b % 3, _V0, None, True)
        for b in range(10)
    ]
    return spark.createDataFrame(rows, TIER_SCHEMA)


def build_dim_segment(spark: SparkSession) -> DataFrame:
    rows = [(s, name, _V0, None, True) for s, name in SEGMENTS.items()]
    return spark.createDataFrame(rows, SEGMENT_SCHEMA)


def seed_dimensions(spark: SparkSession, lake_dir: str) -> dict[str, str]:
    """Idempotent seeding: write each dim only when absent/empty
    (seed_dimensions.py:70-87's guard). Returns {dim: action}."""
    log = {}
    for name, builder in (
        ("dim_tier", build_dim_tier),
        ("dim_segment", build_dim_segment),
    ):
        path = os.path.join(lake_dir, name)
        if os.path.isdir(path):
            try:
                if not spark.read.parquet(path).isEmpty():
                    log[name] = "skipped (non-empty)"
                    continue
            except Exception:  # noqa: BLE001
                # A dir with no readable parquet (crashed mid-write:
                # only _temporary/ or _SUCCESS inside) raises
                # UNABLE_TO_INFER_SCHEMA — exactly the partial state
                # an idempotent seeder must recover from, not crash
                # on (r10 review finding). Fall through and reseed.
                pass
        builder(spark).write.mode("overwrite").parquet(path)
        log[name] = "seeded"
    return log


# The validity flip sits INSIDE the fact range, so its instant must
# line up with the TZ-naive oracle literal against fixed parquet
# epochs — same aware-UTC rule as _V0 above.
_FLIP = dt.datetime(2024, 1, 15, tzinfo=dt.timezone.utc)


def build_dim_tier_history(spark: SparkSession) -> DataFrame:
    """Two SCD2 versions per tier: labels flip `_v1` -> `_v2` at
    2024-01-15 UTC (mid-corpus, so facts span both validity windows).
    Pure key arithmetic like the other seeds — any engine regenerates
    it bit-for-bit, which is what lets the oracle reproduce the
    point-in-time join without reading the dim."""
    rows = []
    for b in range(10):
        rows.append((b, f"tier_{b}_v1", b % 3, _V0, _FLIP, False))
        rows.append((b, f"tier_{b}_v2", b % 3, _FLIP, None, True))
    return spark.createDataFrame(rows, TIER_SCHEMA)
