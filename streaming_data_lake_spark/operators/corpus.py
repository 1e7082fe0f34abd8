"""Corpus-preparation operators for training-data pipelines:
TF-IDF term scoring, deterministic stratified sampling, and
token-budget sequence packing (SURVEY.md §7.6 family, beyond the
reference's own surface).

All three are pure built-in-function plans (no UDFs): the hot path
stays in whole-stage codegen and every value is reproducible by the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streaming_data_lake_spark.functions.hashing import h32
from streaming_data_lake_spark.operators.dedup import shingles as tokens_shingles
from streaming_data_lake_spark.operators.dedup import tokens


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k highest-scoring terms per document under a smoothed
    *rational* inverse document frequency:

        idf(t)  = (N + 1) / (doc_freq(t) + 1)
        score   = tf(t, d) · idf(t)

    The rational idf (no logarithm) ranks identically to the log
    form for fixed tf and keeps the arithmetic inside IEEE-exact
    +,·,/ so Spark and the DuckDB oracle agree bit-for-bit (libm
    ``ln`` may differ across engines in the last ulp).

    Plan shape at scale: explode → one map-side-combinable groupBy
    (term frequency per doc), then document frequency as a
    ``count(*)`` window over the tf table partitioned by term — the
    tf/dfreq self-join spelled without re-deriving (and re-tokenizing)
    the tf subtree twice, since Spark plans each DataFrame reference
    independently. Row-identical to the join form: ``term`` is never
    NULL (``tokens`` splits to non-null strings and filters empties),
    so the inner equi-join dropped nothing the window keeps, and
    every tf row's doc_freq is exactly the term's tf row count either
    way. Then a broadcast of the single-row corpus count and a
    per-doc top-k window. No driver-side collect.
    """
    tok = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn(
            "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
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
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "tfidf", "rank")
    )


def stratified_sample(
    docs: DataFrame,
    rates_pct: dict[str, int],
    default_pct: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hash-stratified sampling: keep a row iff
    ``h32(id) % 100 < rate_pct(stratum)``.

    The keep-decision is a pure function of the row id, so the
    sample is reproducible across engines, runs and cluster sizes —
    the property that matters when a 100 TB corpus is re-sampled
    incrementally (new data joins the sample without reshuffling old
    decisions). Narrow filter, no shuffle, fully pushdown-friendly.
    """
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == F.lit(stratum), F.lit(pct)).otherwise(rate)
    return docs.filter(h32(F.col(id_col).cast("string")) % 100 < rate)


def pack_token_budget(
    docs: DataFrame,
    capacity: int = 512,
    n_groups: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing by START OFFSET: documents (in
    deterministic id order) land in shard ``floor(prefix_tokens /
    capacity)`` of their pack group. A document straddling a boundary
    stays in the shard where it STARTS, so a shard can overflow
    ``capacity`` by up to one document's tokens (and a doc longer
    than capacity spans several ids) — the offset-bucketing variant
    of packing, chosen because it is a pure running sum (no
    sequential carry between rows beyond the prefix), which is what
    keeps it a single partitioned window at scale. Consumers that
    need a HARD cap truncate at read time. Text must be non-null
    (the driver corpus guarantees it; a NULL text would diverge from
    the oracle's NULL-propagating len()).

    Scale design: packing is a running sum, which is inherently
    sequential — so it runs *per pack group* (``h32(id) % n_groups``),
    making the window partitioned (parallel, bounded memory) instead
    of a single global sort. At 100 TB, n_groups scales with the
    cluster; each group's shards are independent training shards.

    Returns one row per shard: (pack_group, shard_id, n_docs,
    n_tokens).
    """
    with_tok = docs.select(
        F.col(id_col),
        (h32(F.col(id_col).cast("string")) % n_groups).alias("pack_group"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = with_tok.withColumn(
        "shard_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(capacity)),
    )
    return assigned.groupBy("pack_group", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark_ngrams: list[str],
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag documents containing any of the
    benchmark's word n-grams. Returns (doc_id, n_matched_shingles)
    for contaminated docs only.

    Plan shape at scale: the benchmark shingle set is tiny → broadcast
    hash join against the exploded corpus shingles, aggregated with a
    map-side-combinable count. The 100 TB corpus is never shuffled on
    content — only the matched rows reach the aggregate.
    """
    from streaming_data_lake_spark.operators.similarity import spread

    # The input frame's own session — getActiveSession() is
    # thread-local and can be None off the driver thread.
    spark = docs.sparkSession
    bench = F.broadcast(
        spark.createDataFrame([(g,) for g in sorted(set(benchmark_ngrams))], "sng string")
    )
    # spread(): the tokenize+shingle explode is the query's CPU and
    # runs where the doc rows sit — a single-file corpus executes it
    # in one task (measured 1.09 → 0.70 s at sf0.1; no-op at real
    # scale, see similarity.spread).
    sh = spread(docs).select(
        F.col(id_col), F.explode(tokens_shingles(text_col, n)).alias("sng")
    )
    return (
        sh.join(bench, "sng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched_shingles"))
    )
