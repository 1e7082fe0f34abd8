"""Bare-session portability: the driver's harness builds a plain
``SparkSession.builder.getOrCreate()`` with none of the engine confs
that :func:`session.get_spark` sets. Round-1 regression: 27/50 driver
correctness rows died with PARQUET_TYPE_ILLEGAL because
``load_table`` assumed ``spark.sql.legacy.parquet.nanosAsLong`` was
already on. These tests run the catalog and a slice of events queries
through a session constructed WITHOUT ``get_spark`` — in a separate
process, because ``getOrCreate`` inside this pytest process would
silently reuse the already-configured session and mask the bug.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

# Runs in a fresh interpreter: a deliberately bare session (the only
# non-default bits are local master + small shuffle count for speed —
# neither affects parquet type handling or timezone).
_BARE_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

from streaming_data_lake_spark.catalog import TABLES, load_table
from streaming_data_lake_spark.queries import all_queries

sf = {sf!r}

# 1. Every table loads and its schema resolves under a bare session.
for t in TABLES:
    df = load_table(spark, sf, t)
    df.schema  # force analysis
    assert df.limit(1).count() >= 0, t

# 2. events.ts arrives as a proper timestamp, not long.
ev = load_table(spark, sf, "events")
assert dict(ev.dtypes)["ts"] == "timestamp", dict(ev.dtypes)["ts"]

# 3. Representative events queries run end-to-end (these were the
#    round-1 driver failures).
qs = all_queries()
for name in ("events_clean", "top_busiest_hours", "daily_distinct_users"):
    n = qs[name].fn(spark, sf).count()
    assert n > 0, f"{{name}} returned 0 rows"

print("BARE_SESSION_OK")
"""


def test_bare_session_loads_all_tables_and_runs_events_queries():
    script = _BARE_SCRIPT.format(repo=REPO, sf=SF_DIR)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "BARE_SESSION_OK" in proc.stdout


_BUCKETED_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from streaming_data_lake_spark.queries import all_queries

qs = all_queries()
for name in ("minhash_lsh_near_dups", "bucketed_colocated_join"):
    n = qs[name].fn(spark, {sf!r}).count()
    assert n > 0, name
print("BUCKETED_OK")
"""


def test_bare_session_bucketed_tables_survive_process_reruns(tmp_path):
    """The saveAsTable-based queries must work when TWO bare-session
    processes run from the SAME cwd: a managed-table write would leave
    a warehouse directory the second process's fresh catalog trips
    over (LOCATION_ALREADY_EXISTS) — writes must target unique
    external locations."""
    script = _BUCKETED_SCRIPT.format(repo=REPO, sf=SF_DIR)
    for attempt in range(2):
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=300,
            cwd=tmp_path,
        )
        assert proc.returncode == 0, (
            f"attempt {attempt}:\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
        )
        assert "BUCKETED_OK" in proc.stdout
