"""Deduplication operators — exact and near-duplicate, batch + streaming.

Covers the reference's canonicalizing dedup idioms and extends them
with the near-dup family a 100 TB training-data pipeline needs:

 - :func:`dedup_groupby_canonical` — GROUP BY key + per-column
   aggregate canonicalization (A4 — aggregation_jobs.sql:31-50).
 - :func:`dedup_row_number` — ROW_NUMBER()=1 idiom (W3 — the
   reference design doc's dedup pattern, .design:1136-1139).
 - :func:`exact_text_dedup` — hash-groupBy exact dedup.
 - :func:`shingles` / :func:`minhash_signatures` / MinHash-LSH
   candidate generation — scalable near-dup (band-bucket join, no
   all-pairs shuffle).
 - :func:`ngram_jaccard_pairs` — exact shingle-set Jaccard via a
   shared-shingle equi-join (candidate pruning happens in the join:
   pairs with no common shingle never materialize).
 - :func:`simhash32` — 32-bit-vote SimHash fingerprint from token hashes.

Scale notes: all paths are shuffle-on-key joins/aggregations over
deterministic hashes — no driver collection, no all-pairs cartesian.
MinHash-LSH bounds candidate pairs per band-bucket; at 100 TB the
band count / shingle width are the recall/ cost dials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streaming_data_lake_spark.functions.hashing import h32, minhash_mix


def dedup_groupby_canonical(df: DataFrame, keys: list[str], aggs: dict[str, str]) -> DataFrame:
    """Canonicalize duplicate rows per key with explicit per-column
    aggregates, e.g. ``{"value": "max", "ts": "max"}``; the
    reference's pre-join dedup (aggregation_jobs.sql:31-50) uses
    MAX/MIN per column rather than an arbitrary-row ``dropDuplicates``
    so output is deterministic regardless of encounter order."""
    exprs = [getattr(F, fn)(c).alias(c) for c, fn in aggs.items()]
    return df.groupBy(*keys).agg(*exprs)


def dedup_row_number(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep the first row per key under an explicit deterministic
    ordering (W3). The tie-break ordering must reach a unique column
    so the winner is stable across engines and runs."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_text_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: one row per distinct text, keeping
    the smallest id as canonical and counting the duplicates.
    Hash-groupBy: one shuffle on a 32-char key, map-side partial agg.
    NULL-text docs are excluded — md5(NULL)=NULL would otherwise pool
    every null doc into one group and report them as mutual
    duplicates (the module's null-key discipline, cf. hll_registers /
    bloom_bitmap dropping NULL keys before hashing)."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# Bump when tokenize/shingle/jaccard SEMANTICS change: it is part of
# every durable artifact key derived from this module (e.g. the cached
# jaccard pair list), so a semantic change invalidates cached data
# instead of silently serving results computed by old code.
# gen 2: NULL-total shingle guard — NULL-text docs previously carried
# one '' shingle and all-paired with Jaccard 1.0 (edge-sweep finding)
PAIRS_GEN = 2


def _valid_vec_gen() -> int:
    from streaming_data_lake_spark.operators.similarity import VALID_VEC_GEN

    return VALID_VEC_GEN


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empties removed."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def _shingles_of(toks: Column, n: int) -> Column:
    """Shingle array from an already-bound token-array column.

    The short-doc guard must be NULL-total: for NULL text ``k`` is
    NULL, a bare ``when(k <= 0)`` falls through, and
    ``greatest(NULL - 1, 0)`` is 0 (greatest skips NULLs) — so every
    NULL-text doc got ONE empty-string shingle and all of them paired
    with Jaccard 1.0 (the edge sweep found C(16,2)=120 phantom
    near-dup pairs). coalesce pins NULL to the empty branch."""
    k = F.coalesce(F.size(toks) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
    )
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(idx, gram))
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column, as an array of
    strings. Built entirely from higher-order array functions —
    JVM-side, no UDF.

    The tokenization (split + filter) is bound ONCE per row via a
    single-element-array ``transform``: referencing ``tokens(text)``
    directly inside the per-shingle lambda would re-evaluate the
    split for every element (O(tokens²) per doc — measured 16×
    slower at sf0.1)."""
    return F.element_at(
        F.transform(F.array(tokens(text)), lambda t: _shingles_of(t, n)), 1
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signatures via explode → flat seeded hashes → groupBy
    min. One row per doc with columns ``mh_0..mh_{k-1}``.

    Plan shape at scale: the shingle array is computed ONCE per doc,
    exploded, and each (doc, shingle) row projects k flat md5-based
    hashes — a single whole-stage-codegen span. The groupBy(min) is
    map-side combinable, so the shuffle carries one k-wide row per
    doc per input partition, not the shingle fan-out. Docs too short
    to shingle drop out at the explode (empty array → no rows).
    """
    sh = df.select(F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("sng"))
    # One md5 per (doc, shingle), materialized in the projection so
    # the k aggregate expressions reference the column instead of
    # each embedding its own md5 — the mixes are two integer ops.
    based = sh.select(F.col(id_col), h32(F.col("sng")).alias("base"))
    return based.groupBy(id_col).agg(
        *[F.min(minhash_mix(F.col("base"), i)).alias(f"mh_{i}") for i in range(num_hashes)]
    )


def _self_join_band_pairs(banded: DataFrame, id_col: str) -> DataFrame:
    """Self-join a (id, band, band_key) frame into candidate pairs.

    The signature subtree executes once per join side (Spark does not
    reuse subplans through a broadcast join). Measured at sf0.1 that
    is FASTER than persist + eager materialization — the signatures
    are a narrow codegen'd pipeline and one side broadcasts, whereas
    caching forces a materialization barrier and a shuffled join
    (9.0s vs 6.1s end-to-end). On a cluster-scale corpus the right
    structure is different again: write the signature table once,
    then self-join that table — which also makes the band key a
    bucketing column so the join is co-located."""
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def _materialized_band_pairs(
    spark,
    banded: DataFrame,
    table: str,
    id_col: str,
    buckets: int = 8,
    inputs: list[str] | None = None,
    params: dict | None = None,
) -> DataFrame:
    """Candidate pairs via a signature table written ONCE, bucketed by
    the composite band key, then self-joined co-located (no signature
    recompute, no join Exchange) — the 100 TB shape for any banded
    LSH family. ``bkey = band:band_key`` folds both logical join
    columns into the single bucketing column so the bucket-join rule
    applies directly."""
    from streaming_data_lake_spark.plans.bucketing import bucketed_frame

    keyed = banded.select(
        F.col(id_col),
        F.concat_ws(":", F.col("band"), F.col("band_key")).alias("bkey"),
    )
    # Every durable LSH artifact key carries the module generation:
    # signature content derives from tokenize/shingle/hash semantics,
    # so a PAIRS_GEN bump invalidates the cached signature tables too,
    # not just the jaccard pair list.
    sig = bucketed_frame(
        spark,
        keyed,
        table,
        "bkey",
        buckets=buckets,
        inputs=inputs,
        # gen LAST so no caller-supplied key can shadow the module
        # generation — it must stay authoritative for invalidation.
        params={**(params or {}), "gen": PAIRS_GEN},
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.hint("merge")
        .join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def banded_minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Per-doc banded MinHash signature rows ``(id, band, band_key)``
    — one row per band. ``band_key`` is the band's concatenated
    signature slice; (band, band_key) together form the LSH bucket."""
    if bands <= 0 or num_hashes % bands != 0:
        # bands > num_hashes would make every band_key '' (num_hashes
        # // bands == 0 → zero-column concat) — every doc in ONE
        # bucket, an O(N²) all-pairs join presented as LSH; a
        # non-dividing bands silently drops trailing hashes and
        # changes recall from what the parameters claim.
        raise ValueError(
            f"bands ({bands}) must positively divide num_hashes ({num_hashes})"
        )
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("_", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("key"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("band_key"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band of their
    MinHash signature. rows = (id_a, id_b) with id_a < id_b.

    Plan shape at scale: narrow signature computation → explode to
    (band_id, band_hash) → self equi-join on the band key. The join
    key is a hash bucket, so Catalyst uses a shuffled hash/sort-merge
    join on small buckets rather than any all-pairs comparison.
    """
    banded = banded_minhash_signatures(df, id_col, text_col, n, num_hashes, bands)
    return _self_join_band_pairs(banded, id_col)


def minhash_lsh_candidates_materialized(
    spark,
    df: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    buckets: int = 8,
    inputs: list[str] | None = None,
) -> DataFrame:
    """LSH candidates via a materialized signature table — the 100 TB
    shape. :func:`minhash_lsh_candidates` recomputes the full
    shingle+hash pipeline once per self-join side (Spark does not
    share subplans across a join); here the banded signatures are
    written ONCE as a managed table bucketed by the composite band
    key, and the self-join reads co-located buckets: no signature
    recompute, no join Exchange. At cluster scale the signature table
    is the durable artifact every dedup run reuses.

    The composite key ``bkey = band:band_key`` folds both logical
    join columns into the single bucketing column, so bucket-join
    co-location applies directly."""
    banded = banded_minhash_signatures(df, id_col, text_col, n, num_hashes, bands)
    return _materialized_band_pairs(
        spark,
        banded,
        table,
        id_col,
        buckets,
        inputs=inputs,
        params={"family": "minhash", "n": n, "num_hashes": num_hashes, "bands": bands},
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram-shingle Jaccard similarity for all pairs sharing
    ≥1 shingle. Returns (id_a, id_b, jaccard) above threshold.

    Candidate generation = equi-join on the shingle value: only pairs
    with intersection ≥ 1 are ever formed, and the agg that counts
    the intersection is a map-side-combinable groupBy. This is the
    exact-verification stage that MinHash-LSH candidates feed at
    scale; standalone it is correct (not approximate) and still
    avoids the cartesian product.
    """
    sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("sh")
    )
    # Materialize the exploded shingles once: they feed BOTH sides of
    # the self-join plus the per-doc size agg, and Spark does not
    # share subplans across a join — without this the tokenize+
    # shingle+explode pipeline runs three times. (At cluster scale
    # the same role is played by writing the shingle table as a
    # durable artifact, as the LSH signature path does.)
    sh = sh.localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def rh_weights(num_bits: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane weights in [-1, 1],
    derived from the portable md5-based hash so the DuckDB oracle can
    regenerate them bit-for-bit: w(s, d) = ((h32(f"{s}:{d}") % 2001)
    - 1000) / 1000.0."""
    import hashlib

    def h32py(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:8], 16)

    return [
        [((h32py(f"{s}:{d}") % 2001) - 1000) / 1000.0 for d in range(dim)]
        for s in range(num_bits)
    ]


def banded_embedding_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_bits: int = 16,
    bands: int = 2,
) -> DataFrame:
    """Per-vector banded random-hyperplane (sign) LSH signature rows
    ``(id, band, band_key)``: num_bits dot products against broadcast
    literal weight arrays — a narrow per-row projection, no shuffle —
    then explode to one row per band."""
    from streaming_data_lake_spark.operators.similarity import dot

    if bands <= 0 or num_bits % bands != 0:
        # Same degeneracy as banded_minhash_signatures: zero-column
        # concat makes one global '' bucket (all-pairs), non-dividing
        # bands silently drop trailing bits.
        raise ValueError(
            f"bands ({bands}) must positively divide num_bits ({num_bits})"
        )
    weights = rh_weights(num_bits, dim)
    # One F.lit per hyperplane (array literal), not one per component —
    # 16 driver→JVM calls instead of 1024.
    bits = [
        F.when(dot(F.col(vec_col), F.lit(ws)) >= 0, F.lit("1"))
        .otherwise(F.lit("0"))
        .alias(f"b{s}")
        for s, ws in enumerate(weights)
    ]
    sig = df.select(F.col(id_col), *bits)
    rpb = num_bits // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*[F.col(f"b{b * rpb + r}") for r in range(rpb)]).alias("key"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("band_key"))


def embedding_lsh_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_bits: int = 16,
    bands: int = 2,
) -> DataFrame:
    """Sign-LSH candidate pairs: vectors sharing >=1 band of sign
    bits. Same self-join shape as :func:`minhash_lsh_candidates`; no
    all-pairs comparison ever materializes."""
    banded = banded_embedding_signatures(df, id_col, vec_col, dim, num_bits, bands)
    return _self_join_band_pairs(banded, id_col)


def embedding_lsh_candidates_materialized(
    spark,
    df: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_bits: int = 16,
    bands: int = 2,
    buckets: int = 8,
    inputs: list[str] | None = None,
) -> DataFrame:
    """Sign-LSH candidates via the materialized bucketed signature
    table (see :func:`_materialized_band_pairs`): the hyperplane
    signature projection runs once at write time instead of once per
    self-join side."""
    banded = banded_embedding_signatures(df, id_col, vec_col, dim, num_bits, bands)
    return _materialized_band_pairs(
        spark,
        banded,
        table,
        id_col,
        buckets,
        inputs=inputs,
        params={
            "family": "sign_lsh",
            "dim": dim,
            "num_bits": num_bits,
            "bands": bands,
            # versions the valid_vectors admission contract (see
            # similarity.VALID_VEC_GEN) — signatures built before the
            # degenerate-vector filter must not be served.
            "admission": _valid_vec_gen(),
        },
    )


def embedding_cosine_near_dups(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_bits: int = 16,
    bands: int = 2,
    spark=None,
    table: str | None = None,
    inputs: list[str] | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: sign-LSH candidates verified with
    exact cosine ≥ threshold. Returns (id_a, id_b, cosine_sim).
    When ``spark`` and ``table`` are given, candidates come from the
    materialized bucketed signature table (one signature pass)."""
    from streaming_data_lake_spark.operators.similarity import dot, norm

    if spark is not None and table is not None:
        cand = embedding_lsh_candidates_materialized(
            spark, df, table, id_col, vec_col, dim, num_bits, bands, inputs=inputs
        )
    else:
        cand = embedding_lsh_candidates(df, id_col, vec_col, dim, num_bits, bands)
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        norm(F.col(vec_col)).alias("n_a"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        norm(F.col(vec_col)).alias("n_b"),
    )
    sim = dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def simhash32(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SimHash fingerprint over whitespace tokens (32 bit votes —
    the width of the portable cross-engine hash; named for the vote
    width so callers do not assume 64 bits of entropy).

    For each of 32 bit positions, sums +1/-1 votes from each token's
    portable hash bit and sets the bit when the vote is positive.
    Uses the 32-bit portable hash (cross-engine reproducible); the
    fingerprint is returned as a long. Near-dup detection then groups
    on fingerprint or on rotated prefixes.

    Implementation: explode tokens → explode bit positions via
    posexplode of a 32-element sequence → groupBy(id) summing votes →
    reassemble with bit arithmetic. All built-ins; two shuffles on id.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    hashed = tok.select(id_col, h32(F.col("tok")).alias("h"))
    bits = hashed.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit"),
        F.col("h"),
    ).select(
        id_col,
        "bit",
        F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1).alias("vote"),
    )
    votes = bits.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
            .otherwise(F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("simhash")
    )


def connected_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """Union near-dup pairs into clusters: returns (doc_id,
    cluster_id) where cluster_id is the minimum doc id reachable in
    the pair graph — the canonical representative every dedup policy
    keys on ("keep the lowest id of each duplicate cluster").

    Iterative min-label propagation: each round is one equi-join of
    the symmetric edge list with the current labels plus a map-side-
    combinable ``min`` aggregate, converging in O(graph diameter)
    rounds (near-dup graphs are shallow — chains of near-identical
    docs). ``localCheckpoint`` cuts lineage per round so plans stay
    flat; the only driver-side scalar is the convergence probe, the
    same discipline as the materializer's count probes.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    converged = False
    # Labels only ever decrease (min-propagation), so convergence is
    # "sum(label) stopped falling" — a map-side-combinable aggregate
    # over the checkpointed labels instead of a self-join probe.
    _label_sum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_sum = labels.agg(_label_sum).first()[0]
    for _ in range(max_iters):
        nbr = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # Lazy checkpoint + one action: the convergence-probe agg is
        # the job that materializes the checkpoint, so each round
        # runs ONE Spark job (propagate + probe fused) instead of an
        # eager-checkpoint job followed by a separate agg job, while
        # still truncating lineage so per-round plans stay flat.
        new = (
            labels.join(nbr, labels["id"] == nbr["src"], "left")
            .select(
                labels["id"],
                F.least(
                    labels["label"], F.coalesce(F.col("nbr_label"), labels["label"])
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        new_sum = new.agg(_label_sum).first()[0]
        labels = new
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # Silently-wrong labels are worse than failure: a component
        # with diameter > max_iters would keep multiple labels. Note
        # the bound counts the final no-change PROBE round too, so
        # certifying convergence needs max_iters > graph diameter
        # (set it with one round of headroom).
        raise RuntimeError(
            f"connected_dup_clusters did not certify convergence in {max_iters} "
            "rounds; raise max_iters (it must exceed the graph diameter by one)"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def exact_substring_dups(
    df: DataFrame,
    window_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring duplicate pairs: documents sharing ANY
    contiguous run of ``window_tokens`` tokens — the verbatim-overlap
    dedup that hash/MinHash misses when a long copied passage hides
    inside otherwise-different documents.

    Plan shape at scale: the window shingle array is one per-row
    higher-order projection (same machinery as :func:`shingles`, just
    a longer n); candidate pairs come from the shared-window
    equi-join, so cost scales with window-hash bucket occupancy, not
    n². Returns (id_a, id_b, n_shared_windows)."""
    sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), window_tokens)).alias("w")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
    )


def winnowing_fingerprints(
    df: DataFrame,
    n: int = 3,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash all
    word ``n``-grams in order, then keep the minimum hash of every
    sliding window of ``window`` consecutive n-gram hashes; the
    distinct selected hashes are the document's fingerprint set.
    Guarantees any shared run of ``n + window - 1`` tokens yields at
    least one shared fingerprint, with ~2/(window+1) selection density.

    Entirely JVM-side higher-order functions: ORDERED (non-distinct)
    n-grams → portable hashes → per-window array_min via slice —
    one narrow projection, no shuffle, no UDF. Returns one row per
    (doc, fingerprint)."""
    # Bind the token array ONCE via the same single-element-array
    # trick used for `hashes` below: referencing the raw `tokens()`
    # expression inside the per-index gram lambda re-evaluates the
    # WHOLE tokenization (split of the full text) once per n-gram —
    # O(tokens²) work that is invisible on 100-token docs but turns
    # one 1 MB scraped-binary document into a stage that never
    # finishes (r13 huge-doc probe: 20k tokens = 171 s unbound vs
    # 1.1 s bound, identical output; a 225k-token doc hung outright).
    def _grams_of(tk):
        # coalesce: NULL-total short-doc guard, same rationale as
        # _shingles_of (NULL text otherwise yields one '' gram and a
        # phantom fingerprint row per NULL doc — edge-sweep finding)
        k = F.coalesce(F.size(tk) - (n - 1), F.lit(0))  # ordered n-grams
        idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(tk, (i + j + 1).cast("int")) for j in range(n)]
        )
        return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(idx, gram)
        )

    grams = F.element_at(F.transform(F.array(tokens(F.col(text_col))), _grams_of), 1)
    hashes = F.transform(grams, lambda g: h32(g))

    # Bind the computed hash array ONCE via the single-element-array
    # trick: referencing `hashes` directly inside the window lambdas
    # would re-evaluate the whole gram+md5 pipeline per element
    # (O(n^2) md5 calls; measured 53s -> <1s at sf0.01).
    def _select(hs):
        m = F.size(hs) - (window - 1)
        widx = F.sequence(F.lit(0), F.greatest(m - 1, F.lit(0)))
        return F.when(m <= 0, F.array_distinct(hs)).otherwise(
            F.array_distinct(
                F.transform(widx, lambda i: F.array_min(F.slice(hs, i + 1, window)))
            )
        )

    selected = F.element_at(F.transform(F.array(hashes), _select), 1)
    return df.select(F.col(id_col), F.explode(selected).alias("fingerprint"))
