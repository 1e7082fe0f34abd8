"""Interleaved A/B for the embedding_cosine_near_dups GEN-3
admission cost (VERDICT r12 "Next round" #4): the recorded r12 bench
read 1.65 s (1.00x normalized vs r11) but the judge's idle-host rerun
measured 2.01 s (1.38x vs r11's 1.46 s), and the GEN-3 admission
(non-finite-element exclusion in similarity.valid_vectors) touched
this path.

Runs, in ONE session, interleaved A/B/A/B... executions of the
registered query body with the live GEN-3 admission (A) and the r11
GEN-2 shape (B: ``norm > 0`` only — no NaN/Inf-norm conjuncts),
min-of-N each — the same protocol as tools/ab_semdedup.py. Each
variant materializes its signature artifact under its OWN table name
during warm-up, so the timed rounds compare warm verify-join cost,
which is what the bench measures after round 1.

Usage: python tools/ab_embcos.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from streaming_data_lake_spark.catalog import load_table
    from streaming_data_lake_spark.operators import similarity
    from streaming_data_lake_spark.operators.dedup import embedding_cosine_near_dups
    from streaming_data_lake_spark.operators.similarity import norm, valid_vectors
    from streaming_data_lake_spark.queries.pipeline import (
        _EMB_BANDS,
        _EMB_BITS,
        _EMB_DIM,
        _EMB_NEAR_DUP_THRESHOLD,
    )
    from streaming_data_lake_spark.session import get_spark

    spark = get_spark("ab-embcos")
    raw = load_table(spark, sf_dir, "embeddings")
    inputs = [os.path.join(sf_dir, "embeddings.parquet")]

    def gen2(df):
        # the r11 admission shape: norm > 0 only (NULL/empty/zero-norm
        # /NULL-element; no non-finite-element exclusion)
        return df.filter(norm(F.col("embedding")) > 0)

    def run(admitted, table) -> tuple[float, int]:
        t0 = time.monotonic()
        out = embedding_cosine_near_dups(
            admitted,
            threshold=_EMB_NEAR_DUP_THRESHOLD,
            dim=_EMB_DIM,
            num_bits=_EMB_BITS,
            bands=_EMB_BANDS,
            spark=spark,
            table=table,
            inputs=inputs,
        )
        cnt = out.count()
        return time.monotonic() - t0, cnt

    variants = {
        # A = the CURRENT admission (whatever VALID_VEC_GEN is — the
        # artifact tag carries the live gen so cached A/B signatures
        # never cross generations); B = the frozen gen-2 baseline.
        "A-current-admission": lambda: run(
            valid_vectors(raw), f"emb_sig_ab_gen{similarity.VALID_VEC_GEN}"
        ),
        "B-gen2-admission": lambda: run(gen2(raw), "emb_sig_ab_gen2"),
    }
    print(f"VALID_VEC_GEN={similarity.VALID_VEC_GEN} sf_dir={sf_dir} n={n}")
    # warm-up: one run each, discarded (artifact build, JIT, footers)
    for fn in variants.values():
        fn()
    times: dict[str, list[float]] = {k: [] for k in variants}
    counts: dict[str, int] = {}
    for _ in range(n):
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
