"""Interleaved A/B for the semantic_dedup_centroid admission cost
(VERDICT r11 "Next round" #2): the only reproducible r11 perf signal
was 1.52 s (r10) -> 2.23 s with the valid_vectors pre-filter added.

Runs, in ONE session, interleaved A/B/A/B... executions of the query
with the admission filter (live code) and without it (the r10 shape:
raw embeddings straight into ivf_assign), min-of-N each — the same
protocol as the r11 sink conversion A/B. Also times a C variant if
present (any candidate fix), so hoisting experiments slot in.

Usage: python tools/ab_semdedup.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from streaming_data_lake_spark.catalog import load_table
    from streaming_data_lake_spark.operators.similarity import valid_vectors
    from streaming_data_lake_spark.queries.analytics import (
        _SEM_K,
        _SEM_THRESHOLD,
    )
    from streaming_data_lake_spark.operators.similarity import (
        dot,
        ivf_assign,
        occupancy_shards,
    )
    from streaming_data_lake_spark.session import get_spark

    spark = get_spark("ab-semdedup")

    def run(e) -> float:
        cents = e.filter(F.col("vec_id") < _SEM_K)
        t0 = time.monotonic()
        assigned = occupancy_shards(
            ivf_assign(e, cents).select(
                "vec_id", "embedding", "cluster_id", F.col("vec_norm").alias("nrm")
            ),
            max_occupancy=4096,
        ).localCheckpoint()
        a = assigned.select(
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("v_a"),
            F.col("nrm").alias("n_a"),
            "cluster_id",
            "shard",
        )
        b = assigned.select(
            F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("v_b"),
            F.col("nrm").alias("n_b"),
            F.col("cluster_id").alias("cluster_id_b"),
            F.col("shard").alias("shard_b"),
        )
        sim = dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
        out = (
            a.join(
                b,
                (F.col("cluster_id") == F.col("cluster_id_b"))
                & (F.col("shard") == F.col("shard_b"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .select(
                "id_a",
                "id_b",
                F.col("cluster_id").cast("long").alias("cluster_id"),
                sim.alias("cosine_sim"),
            )
            .filter(F.col("cosine_sim") >= _SEM_THRESHOLD)
        )
        cnt = out.count()
        dt = time.monotonic() - t0
        return dt, cnt

    raw = load_table(spark, sf_dir, "embeddings")
    variants = {
        "A-with-admission": lambda: run(valid_vectors(raw)),
        "B-no-admission  ": lambda: run(raw),
    }
    # warm-up: one run each, discarded (JIT, parquet footer cache)
    for fn in variants.values():
        fn()
    times: dict[str, list[float]] = {k: [] for k in variants}
    counts: dict[str, int] = {}
    for i in range(n):
        for name, fn in variants.items():
            dt, cnt = fn()
            times[name].append(dt)
            counts[name] = cnt
    for name, ts in times.items():
        print(
            f"{name}: min {min(ts):.3f}s  median {sorted(ts)[len(ts)//2]:.3f}s  "
            f"all {[round(t, 3) for t in ts]}  rows={counts[name]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
