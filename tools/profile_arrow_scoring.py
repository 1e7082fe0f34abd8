"""Arrow-scoring entry-condition profile (VERDICT r19 #4, guide §4.2).

The r19 rejection of mapInArrow scoring recorded an entry condition:
apply it only if a profiled workload shows the similarity fold CPU
dominating per-job floors. This builds that workload — a synthetic
corpus ``N x 64`` doubles, far past the sf0.1 table (2,000 rows) —
and times the SAME brute-force top-k cosine two ways in one session:

- ``jvm``    the live operator shape: broadcast queries, join,
             ``zip_with``/``aggregate`` left-fold cosine, top-k window.
- ``arrow``  identical distribution, but the scoring stage is
             ``mapInArrow``: each corpus batch scores against every
             query with an order-preserving NumPy dim-loop
             (``acc += c[:, i] * q[i]`` — the same left-fold add
             order as the JVM expression, so results stay
             bit-comparable), then the same top-k window.

The timed action is a noop sink (guide §1.4). Run at several N to
locate the crossover; equivalence is checked exactly (exceptAll both
ways) at the smallest N.

Usage: python tools/profile_arrow_scoring.py [N ...] (default 2000 50000 200000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

DIM = 64
Q = 32
K = 5


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 50000, 200000]

    from streaming_data_lake_spark.session import get_spark

    spark = get_spark("profile-arrow")
    sc = spark.sparkContext

    for n in sizes:
        # Deterministic synthetic corpus: vec_id, 64 doubles derived
        # from (id, dim) — built distributed, checkpointed so both
        # variants read identical materialized rows.
        base = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {DIM - 1}), "
                f"d -> cast(pmod(hash(id, d), 997) as double) / 997.0)"
            ).alias("embedding"),
        )
        corpus = base.repartition(sc.defaultParallelism).localCheckpoint()
        queries = corpus.filter(F.col("vec_id") < Q).localCheckpoint()
        q_rows = queries.collect()
        q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
        q_mat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
        # query norms with the SAME left-fold order (sequential adds)
        q_norm = np.zeros(len(q_rows))
        for i in range(DIM):
            q_norm += q_mat[:, i] * q_mat[:, i]
        q_norm = np.sqrt(q_norm)

        def jvm_form():
            from streaming_data_lake_spark.operators.similarity import dot

            qd = queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_vec"),
                F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("q_norm"),
            )
            c = corpus.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_vec"),
                F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("c_norm"),
            )
            scored = (
                F.broadcast(qd)
                .join(c, F.col("query_id") != F.col("neighbor_id"))
                .select(
                    "query_id",
                    "neighbor_id",
                    (
                        dot(F.col("q_vec"), F.col("c_vec"))
                        / (F.col("q_norm") * F.col("c_norm"))
                    ).alias("cosine_sim"),
                )
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
            )
            return (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= K)
                .select("query_id", "neighbor_id", "rank", "cosine_sim")
            )

        def arrow_form():
            def score(batches):
                for batch in batches:
                    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
                    emb = np.array(
                        batch.column("embedding").to_pylist(), dtype=np.float64
                    )
                    m = emb.shape[0]
                    # left-fold order preserved: sequential adds over dims
                    c_norm = np.zeros(m)
                    for i in range(DIM):
                        c_norm += emb[:, i] * emb[:, i]
                    c_norm = np.sqrt(c_norm)
                    for qi in range(len(q_ids)):
                        acc = np.zeros(m)
                        qv = q_mat[qi]
                        for i in range(DIM):
                            acc += emb[:, i] * qv[i]
                        sim = acc / (q_norm[qi] * c_norm)
                        mask = ids != q_ids[qi]
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array(
                                    np.full(int(mask.sum()), q_ids[qi]),
                                    type=pa.int64(),
                                ),
                                pa.array(ids[mask], type=pa.int64()),
                                pa.array(sim[mask], type=pa.float64()),
                            ],
                            names=["query_id", "neighbor_id", "cosine_sim"],
                        )

            scored = corpus.select("vec_id", "embedding").mapInArrow(
                score, "query_id long, neighbor_id long, cosine_sim double"
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
            )
            return (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= K)
                .select("query_id", "neighbor_id", "rank", "cosine_sim")
            )

        if n == sizes[0]:
            d1 = jvm_form().exceptAll(arrow_form()).count()
            d2 = arrow_form().exceptAll(jvm_form()).count()
            print(f"N={n}: equivalence exceptAll both ways: {d1} + {d2} (must be 0)")

        variants = {"jvm": jvm_form, "arrow": arrow_form}
        for name, fn in variants.items():
            noop(fn())  # prime
        times = {name: [] for name in variants}
        for _ in range(3):
            for name, fn in variants.items():
                sc.setJobDescription(f"arrow-profile:{name}:N={n}")
                t0 = time.monotonic()
                noop(fn())
                times[name].append(round(time.monotonic() - t0, 3))
        sc.setJobDescription(None)
        for name, ts in times.items():
            print(f"N={n} {name}: min {min(ts):.3f}  {ts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
