"""Round-20 adjudication A/Bs for the four driver-measured r19
regressions (VERDICT r19 "Next round" #1) plus the
streaming_funnel_daily noise question (#3).

Protocol (memory: host-noise-methodology): ONE warm session,
interleaved A/B/A/B..., min-of-N per side, the bench's own timed
action (``fn().count()``), host-state probe before and after so a
degraded window is visible in the artifact. Variants toggle inside
the session:

- ``sliding``   sliding_window_metrics with the r19 ``spread()`` (A)
                vs without (B, the r18 shape) — toggled by patching
                ``operators.similarity.spread`` to identity (the
                query imports it function-locally at build time).
- ``tfidf``     tfidf_top_terms window-dfreq form (A, live code) vs
                the r18 groupBy+join form (B, inlined here).
- ``upsert``    streaming_upsert_hourly fused cached init probe (A)
                vs the r18 isEmpty+limit(1) probes (B) — toggled by
                ``sources.upsert._FUSED_INIT_PROBE``.
- ``noise``     dup_clusters_connected + streaming_funnel_daily
                repeated runs (no variant: their bench-time code is
                r18-identical — dup_clusters reads the durable pairs
                artifact, funnel's pipelines.py has no r19 diff);
                the question is only whether the driver's elevated
                numbers reproduce on a quiet host.

Usage: python tools/ab_r20.py <sliding|tfidf|upsert|noise> [sf_dir] [n]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def cpu_probe() -> float:
    t0 = time.monotonic()
    x = 0
    for i in range(2_000_000):
        x += i * i
    _ = x
    return time.monotonic() - t0


def empty_job_floor(spark) -> float:
    t0 = time.monotonic()
    spark.range(1).count()
    return time.monotonic() - t0


def interleave(spark, variants: dict[str, callable], n: int) -> dict[str, list[float]]:
    """Prime every variant once (untimed), then time n interleaved
    rounds of each: A B A B ... Each timing is a fresh build +
    count, the bench's own action."""
    sc = spark.sparkContext
    for name, fn in variants.items():
        sc.setJobDescription(f"prime:{name}")
        fn().count()
    times: dict[str, list[float]] = {name: [] for name in variants}
    for i in range(n):
        for name, fn in variants.items():
            sc.setJobDescription(f"ab:{name}:{i}")
            t0 = time.monotonic()
            fn().count()
            times[name].append(round(time.monotonic() - t0, 3))
    sc.setJobDescription(None)
    return times


def report(times: dict[str, list[float]]) -> None:
    for name, ts in times.items():
        print(f"{name}: min {min(ts):.3f}  med {sorted(ts)[len(ts) // 2]:.3f}  {ts}")


def main() -> int:
    which = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from streaming_data_lake_spark.session import get_spark

    spark = get_spark("ab-r20")
    print(f"host probe: cpu {cpu_probe():.3f}s  empty-job {empty_job_floor(spark):.3f}s")

    if which == "sliding":
        from streaming_data_lake_spark.operators import similarity
        from streaming_data_lake_spark.queries.core import sliding_window_metrics

        real_spread = similarity.spread

        def with_spread():
            similarity.spread = real_spread
            return sliding_window_metrics(spark, sf_dir)

        def without_spread():
            similarity.spread = lambda df: df
            return sliding_window_metrics(spark, sf_dir)

        try:
            times = interleave(
                spark, {"A_spread": with_spread, "B_no_spread": without_spread}, n
            )
        finally:
            similarity.spread = real_spread
        report(times)

    elif which == "tfidf":
        from streaming_data_lake_spark.catalog import load_table
        from streaming_data_lake_spark.operators.corpus import tfidf_top_terms
        from streaming_data_lake_spark.operators.dedup import tokens
        from pyspark.sql import Window

        docs = load_table(spark, sf_dir, "documents")

        def window_form():
            return tfidf_top_terms(docs, k=3).withColumn(
                "rank", F.col("rank").cast("long")
            )

        def join_form():
            # The r18 shape, verbatim: tf/dfreq groupBys + inner
            # equi-join on term (re-derives the tokenize subtree).
            tok = docs.select(
                F.col("doc_id"), F.explode(tokens(F.col("text"))).alias("term")
            )
            tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
            dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
            total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
            scored = (
                tf.join(dfreq, "term")
                .crossJoin(F.broadcast(total))
                .withColumn(
                    "tfidf",
                    F.col("tf").cast("double")
                    * (
                        (F.col("n_docs").cast("double") + F.lit(1.0))
                        / (F.col("doc_freq").cast("double") + F.lit(1.0))
                    ),
                )
            )
            w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
            return (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 3)
                .select("doc_id", "term", "tf", "doc_freq", "tfidf", "rank")
                .withColumn("rank", F.col("rank").cast("long"))
            )

        diff = window_form().exceptAll(join_form()).count() + join_form().exceptAll(
            window_form()
        ).count()
        print(f"equivalence exceptAll both ways: {diff} rows (must be 0)")
        times = interleave(spark, {"A_window": window_form, "B_join": join_form}, n)
        report(times)

    elif which == "upsert":
        # ADJUDICATED (r20): the fused cached init probe won 5/5
        # pairwise (min 1.728 vs 1.899 s, median 1.895 vs 2.121) and
        # the temporary _FUSED_INIT_PROBE toggle was removed from
        # sources/upsert.py. This subcommand now just re-times the
        # live fused path for reproduction.
        from streaming_data_lake_spark.streaming.pipelines import (
            streaming_upsert_hourly,
        )

        times = interleave(
            spark,
            {"A_fused_live": lambda: streaming_upsert_hourly(spark, sf_dir)},
            n,
        )
        report(times)

    elif which == "noise":
        from streaming_data_lake_spark.queries.pipeline import dup_clusters_connected
        from streaming_data_lake_spark.streaming.pipelines import (
            streaming_funnel_daily,
        )

        times = interleave(
            spark,
            {
                "dup_clusters_connected": lambda: dup_clusters_connected(spark, sf_dir),
                "streaming_funnel_daily": lambda: streaming_funnel_daily(spark, sf_dir),
            },
            n,
        )
        report(times)

    else:
        print(f"unknown subcommand {which}", file=sys.stderr)
        return 2

    print(f"host probe (post): cpu {cpu_probe():.3f}s  empty-job {empty_job_floor(spark):.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
