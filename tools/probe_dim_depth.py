"""Dim-VERSION depth probe (r15, VERDICT r14 "Next round" #4).

The one scale axis no sweep covers: SCD2 dimensions pass through the
row-scale sweep untouched (fixed-dims/growing-facts is that sweep's
contract), so the PIT join (J7) and the M3 dim-change repair had only
ever run against 1-2 versions per key. A year of real dimension churn
is hundreds of versions per key; the hazards live in shapes that are
O(versions) where they should be O(matching version):

- The PIT join is a broadcast equi-join on the bucket with the
  validity range as a RESIDUAL — every probe row scans its bucket's
  full version list. Correct (validity ranges partition time, so
  exactly one row survives) but the cost is versions-per-key per
  fact; this probe measures it and pins exactness at depth.
- M3's changed-key detection filters `valid_from > wm` over the FULL
  history — deep CLOSED history must not phantom-flag keys, and the
  repair must stay scoped to the keys whose new versions actually
  arrived.

Lanes (both run at K in DEPTHS, default 128 and 512):

1. ``pit``: events(sf0.01) joined to a 10-bucket x K-version dim
   (flip instants spread uniformly across 2024-01-01..2024-02-05,
   first version anchored at 2020-01-01, last open-ended
   is_current). Engine plan is the same broadcast+residual shape as
   the certified ``scd2_point_in_time_enrichment``
   (queries/platform.py:400). The DuckDB oracle runs the identical
   join over the SAME dim rows (registered from Arrow) — full
   rows+values comparison, plus the exactly-one-version invariant.
2. ``m3``: the certified ``materialize_dim_change_repair`` scenario
   (queries/matq.py:233) re-staged with K-1 CLOSED pre-watermark
   versions per bucket, then one post-watermark version for buckets
   0-2 only. Asserts the repair touched exactly those three keys'
   buckets, the deep closed history phantom-flagged nothing, and the
   final table equals the view recomputed from scratch.

Exit 0 and "ALL GREEN" when every lane at every depth holds; this is
a PROBE (the §17 precedent): fold it into a permanent sweep only if
it finds something.
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEPTHS = (128, 512)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_T0 = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)
_SPAN_START = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
_SPAN_SECONDS = 35 * 86400  # flips spread across the fact range

DIM_SCHEMA = (
    "bucket long, tier_label string, valid_from timestamp, "
    "valid_to timestamp, is_current boolean"
)


def deep_dim_rows(k: int, span_seconds: int = _SPAN_SECONDS) -> list[tuple]:
    """10 buckets x k SCD2 versions: version 0 starts at 2020-01-01;
    versions 1..k-1 flip at instants spread uniformly (per-bucket
    phase offset so boundaries differ across buckets) over
    ``span_seconds`` from 2024-01-01; the last version is open-ended
    is_current. Validity ranges PARTITION time per bucket — every
    event time matches exactly one version."""
    rows = []
    for b in range(10):
        flips = [
            _SPAN_START
            + dt.timedelta(seconds=((i * k + b) % (k * 10)) / (k * 10.0) * span_seconds)
            for i in range(1, k)
        ]
        flips.sort()
        starts = [_T0] + flips
        for i, vf in enumerate(starts):
            vt = starts[i + 1] if i + 1 < len(starts) else None
            rows.append((b, f"tier_{b}_v{i + 1}", vf, vt, vt is None))
    return rows


def lane_pit(spark, k: int) -> tuple[bool, str]:
    import duckdb
    from pyspark.sql import functions as F

    from streaming_data_lake_spark.catalog import load_table
    from streaming_data_lake_spark.functions.parity import dsum, finite

    dim = spark.createDataFrame(deep_dim_rows(k), DIM_SCHEMA)
    e = load_table(spark, SF_DIR, "events").withColumn(
        "bucket", F.col("user_id") % 10
    )
    t_start = time.monotonic()
    joined = e.join(
        F.broadcast(dim),
        (e["bucket"] == dim["bucket"])
        & (e["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (e["ts"] < dim["valid_to"])),
    )
    got = {
        r["tier_label"]: (r["n_events"], r["total_value"])
        for r in joined.groupBy("tier_label")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(finite(F.col("value")), "decimal(12,2)").alias("total_value"),
        )
        .collect()
    }
    wall = time.monotonic() - t_start

    # exactly-one-version invariant: joined rows == admissible facts
    n_joined = sum(n for n, _v in got.values())
    n_adm = e.filter(
        F.col("ts") >= F.lit("2020-01-01").cast("timestamp")
    ).filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull()).count()
    if n_joined != n_adm:
        return False, f"K={k}: joined {n_joined} != admissible {n_adm}"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    import pandas as pd

    con.register(
        "dim",
        pd.DataFrame(
            deep_dim_rows(k),
            columns=["bucket", "tier_label", "valid_from", "valid_to", "is_current"],
        ),
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT d.tier_label, count(*) AS n_events,
                   CAST(sum(CAST((CASE WHEN isfinite(e.value) THEN e.value END)
                        AS DECIMAL(12,2))) AS DOUBLE) AS total_value
            FROM (SELECT *, CAST(ts AS TIMESTAMP) AS tsx, user_id % 10 AS bucket
                  FROM events) e
            JOIN dim d ON e.bucket = d.bucket
                 AND e.tsx >= d.valid_from
                 AND (d.valid_to IS NULL OR e.tsx < d.valid_to)
            GROUP BY 1
            """
        ).fetchall()
    }
    if set(got) != set(want):
        return False, f"K={k}: label sets differ ({len(got)} vs {len(want)})"
    for lbl, (n, v) in got.items():
        wn, wv = want[lbl]
        if n != wn or (v is None) != (wv is None) or (
            v is not None and abs(v - wv) > 1e-9
        ):
            return False, f"K={k}: {lbl}: engine ({n},{v}) oracle ({wn},{wv})"
    return True, f"K={k}: {len(got)} labels, {n_joined} facts, {wall:.1f}s"


def lane_m3(spark, k: int) -> tuple[bool, str]:
    from pyspark.sql import functions as F

    from streaming_data_lake_spark.catalog import load_table
    from streaming_data_lake_spark.plans.materialize import (
        DimDependency,
        Materializer,
        MatTarget,
    )

    events = load_table(spark, SF_DIR, "events").select("event_id", "ts", "user_id")
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    batch1 = events.filter(F.col("ts") <= cutoff)
    batch2 = events.filter(F.col("ts") > cutoff)

    lake = tempfile.mkdtemp(prefix=f"dimdepth_{k}_")
    src_dir = os.path.join(lake, "events_src")
    dim_dir = os.path.join(lake, "dim_tier")
    batch1.write.mode("overwrite").parquet(src_dir)

    # Cycle-1 dim: k versions per bucket, ALL starting BEFORE the
    # cycle-1 watermark (flips compressed into 2024-01-01..01-15,
    # facts run to 01-20) — deep history that must not flag. A
    # version starting AFTER the watermark is a legitimate M3 change
    # by contract; the phantom-flag hazard is specifically deep
    # CLOSED history re-flagging every cycle.
    hist = deep_dim_rows(k, span_seconds=14 * 86400)
    spark.createDataFrame(hist, DIM_SCHEMA).write.mode("overwrite").parquet(dim_dir)

    def view(s):
        ev = s.read.parquet(src_dir)
        dim = F.broadcast(s.read.parquet(dim_dir).filter(F.col("is_current")))
        return (
            ev.withColumn("user_bucket", F.col("user_id") % 10)
            .join(dim, F.col("user_bucket") == F.col("bucket"), "left")
            .select("event_id", "ts", "user_id", "user_bucket", "tier_label")
        )

    target = MatTarget(
        name="mat_depth_tiered",
        view=view,
        ts_col="ts",
        dims=(
            DimDependency(
                dim=lambda s: s.read.parquet(dim_dir),
                dim_key="bucket",
                fact_fk="user_bucket",
            ),
        ),
        bucket_col="user_bucket",
    )
    mat = Materializer(spark, lake)
    t_start = time.monotonic()
    log1 = mat.run(target)  # M1 full load under the deep dim
    if "M1" not in log1:
        return False, f"K={k}: expected M1 full load, got {log1}"

    # Cycle 2: NOTHING changed — the deep pre-watermark history must
    # not phantom-flag (the hazard class the r14 year-9999 fix killed
    # on the inadmissible side; this is the deep-but-admissible side).
    log2 = mat.run(target)
    m3_2 = log2.get("M3:user_bucket", "")
    if m3_2 != "no dim change":
        return False, f"K={k}: deep CLOSED history phantom-flagged: {m3_2!r}"

    # Cycle 3: ONLY buckets 0-2 gain a post-watermark version.
    t1 = dt.datetime(2024, 1, 21, tzinfo=dt.timezone.utc)
    new = []
    for b, lbl, vf, vt, cur in hist:
        if b < 3 and cur:
            new.append((b, lbl, vf, t1, False))
            new.append((b, f"tier_{b}_vNEW", t1, None, True))
        else:
            new.append((b, lbl, vf, vt, cur))
    spark.createDataFrame(new, DIM_SCHEMA).write.mode("overwrite").parquet(dim_dir)
    batch2.write.mode("append").parquet(src_dir)

    log3 = mat.run(target)  # M3 must repair exactly buckets 0-2
    wall = time.monotonic() - t_start

    m3_3 = log3.get("M3:user_bucket", "")
    if "repaired changed keys" not in m3_3:
        return False, f"K={k}: cycle-3 repair missing: {m3_3!r}"
    # scoped: 3 changed keys land in at most 3 kb leaves (fewer on a
    # hash collision), never the whole table
    import re as _re

    m = _re.search(r"\((\d+) buckets\)", m3_3)
    if m and not (1 <= int(m.group(1)) <= 3):
        return False, f"K={k}: repair touched {m.group(1)} buckets for 3 keys"

    final = mat.read_mat("mat_depth_tiered", target)
    fresh = view(spark)
    # full-recompute parity, null-safe on tier_label
    diff = final.select("event_id", "tier_label").exceptAll(
        fresh.select("event_id", "tier_label")
    ).count() + fresh.select("event_id", "tier_label").exceptAll(
        final.select("event_id", "tier_label")
    ).count()
    if diff:
        return False, f"K={k}: {diff} rows diverge from full recompute"
    n = final.count()
    return True, f"K={k}: {n} mat rows, repair log {m3_3!r}, {wall:.1f}s"


def main() -> int:
    from streaming_data_lake_spark.session import get_spark

    spark = get_spark("probe-dim-depth")
    ok = True
    for k in DEPTHS:
        for lane, fn in (("pit", lane_pit), ("m3", lane_m3)):
            good, msg = fn(spark, k)
            print(f"{'PASS' if good else 'FAIL'} {lane}: {msg}", flush=True)
            ok = ok and good
    print("ALL GREEN" if ok else "PROBE FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
