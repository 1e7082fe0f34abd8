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
from streaming_data_lake_spark.schemas import EMBEDDING_DIM


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
# gen 3: jaccard redefined over h32-HASHED shingle sets (prefix-filter
# + array-intersect verification, r14 row-scale finding) — values can
# shift under a within-doc hash collision, so cached pair lists from
# the string-set era must not be served
# gen 4: candidate-stage sizes (n_sh) now counted over the DEDUPED
# hashed set (ADVICE r14) — under a within-doc h32 collision gen 3's
# inflated n_sh could size-filter away a boundary pair the hashed-set
# definition (and the oracle) keeps
PAIRS_GEN = 4


def _valid_vec_gen() -> int:
    from streaming_data_lake_spark.operators.similarity import VALID_VEC_GEN

    return VALID_VEC_GEN


#: Portable whitespace class ↔ ``duckql.DUCK_WS``. Java's default
#: ``\s`` is exactly [ \t\n\x0B\f\r] while RE2's ``\s`` OMITS \x0B
#: (vertical tab) — the r15 control-char probe measured
#: tokens('a\x0Bb') splitting into two tokens in Spark but staying
#: one token in DuckDB, a silent cross-engine divergence on every
#: token-derived query the moment a crawled document carries a VT
#: (real web text does). Both engines now spell the Java set
#: explicitly; never write a bare ``\s`` in a compared expression.
WS_CLASS = r"[ \t\n\r\f\x0B]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empties removed."""
    return F.filter(F.split(F.trim(text), WS_CLASS + "+"), lambda t: t != "")


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


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column, as an array of
    strings. Built entirely from higher-order array functions —
    JVM-side, no UDF.

    The tokenization (split + filter) is bound ONCE per row via a
    single-element-array ``transform``: referencing ``tokens(text)``
    directly inside the per-shingle lambda would re-evaluate the
    split for every element (O(tokens²) per doc — measured 16×
    slower at sf0.1).

    Given a column NAME the tree is memoized per (name, n): it costs
    ~150 py4j round-trips to build and the dedup/text family
    re-derives it on every query build (functions/scalar.memo_column)."""

    def build(col: Column) -> Column:
        return F.element_at(
            F.transform(F.array(tokens(col)), lambda t: _shingles_of(t, n)), 1
        )

    if isinstance(text, str):
        from streaming_data_lake_spark.functions.scalar import memo_column

        return memo_column(("shingles", text, int(n)), lambda: build(F.col(text)))
    return build(text)


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
    sh = df.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("sng"))
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
    banded: "callable",
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
    applies directly.

    ``banded`` is a ZERO-ARG THUNK returning the (id, band, band_key)
    signature frame: on an artifact hit the frame is never built, so
    the caller does not pay signature-expression construction (a real
    driver-time cost per query build — see bucketed_frame) on every
    run of an already-materialized family."""
    from streaming_data_lake_spark.plans.bucketing import bucketed_frame

    def keyed():
        return banded().select(
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
    return _materialized_band_pairs(
        spark,
        lambda: banded_minhash_signatures(df, id_col, text_col, n, num_hashes, bands),
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
    """Exact n-gram-shingle Jaccard similarity: every pair with
    J >= threshold, as (id_a, id_b, jaccard). EXACT output — the
    pruning below is lossless.

    Candidate generation uses PREFIX FILTERING (the AllPairs/PPJoin
    family — Bayardo et al., WWW'07; Xiao et al., WWW'08), not a raw
    shared-shingle self-join. The raw join costs Σ_s df(s)² over
    shingle document-frequencies, and that sum is dominated by a few
    HOT shingles (the r14 row-scale sweep measured 247M join rows on
    ~sf0.6 documents, 59% of them from the top-100 shingles — 23x
    the sf0.1 wall for 6x the rows; at 100 TB the hot-shingle term
    alone is a cluster-killer). Prefix filtering orders each doc's
    shingles by GLOBAL rarity and joins only each doc's
    (n - ceil(t*n) + 2) rarest shingles (the classic prefix plus one
    — K=2): for any pair with J >= t, the K order-earliest elements
    of the intersection provably land in BOTH K-extended prefixes
    (if the j-th earliest didn't fit, the alpha-j intersection
    elements after it would overflow the suffix), so requiring
    min(2, alpha_pair) shared prefix shingles per pair loses nothing,
    while hot shingles fall out of the prefixes of essentially every
    doc and single-shared-mid-frequency pairs — the candidate mass at
    a low threshold — never reach verification. Candidates also get
    the usual lossless size filter (J <= min/max sizes) and are then
    verified with an EXACT intersection count over the full shingle
    sets.

    Both ceil() and the size filter subtract a 1e-9 epsilon before
    comparing: IEEE rounding of t*n one ulp ABOVE an exact integer
    product would otherwise shorten a prefix / reject a boundary
    candidate that exact arithmetic keeps (t=0.12, |A|=3, |B|=25,
    A ⊆ B is a real J=0.12 pair that 0.12*25 -> 3.0000000000000004
    would drop). Deflating can only lengthen prefixes / keep more
    candidates — lossless in the safe direction. And because the
    exact verification stage filters candidates down to the true
    pair set, engine-vs-oracle differences in candidate supersets
    (tie ordering, epsilon landings) can never diverge the output.

    Verification computes |A∩B| per candidate as one
    ``array_intersect`` over per-doc sorted arrays of PORTABLE-HASHED
    shingles (h32, the md5-based hash the minhash oracles already
    share with DuckDB) — a narrow projection, NOT a second
    shingle-level join: aggregating (id_a, id_b) groups out of the
    verification join was the r14-measured bottleneck (105M candidate
    groups, 178 s at ~sf0.6 vs 18 s for the join itself). The arrays
    ride two ordinary equi-joins against the per-doc array table —
    size O(n_docs), never broadcast by hint, so the plan stays valid
    when the corpus outgrows any single executor. Jaccard is hereby
    DEFINED over the hashed shingle sets: a within-doc h32 collision
    (P ≈ |sh|²/2³³ per doc; ~1e-5 at 10k distinct shingles) shifts a
    set size by one identically in both engines, which is the
    documented cost of joining 8-byte ints instead of ~25-byte
    strings at 100 TB.
    """
    from pyspark.sql.window import Window

    from streaming_data_lake_spark.functions.hashing import h32

    from streaming_data_lake_spark.operators.similarity import spread

    # spread() (guide §2.5): the dedupe+checkpoint below EXECUTES this
    # projection eagerly, and on a single-file corpus the whole
    # tokenize+shingle+hash pass ran in ONE task — the same
    # single-task-checkpoint shape fixed in the minhash-verify and
    # crossdoc paths. Scale-adaptive no-op for any corpus wider than
    # the core count. Interleaved A/B at sf0.1 min-of-4:
    # 1.91 -> 1.48 s, results bit-identical.
    sh = spread(df).select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("sh")
    )
    # Hash once, DEDUPE, then materialize: the hashed rows feed the
    # frequency agg, the prefix ranking, and the per-doc array build,
    # and Spark does not share subplans across a join — without the
    # checkpoint the tokenize+shingle+explode pipeline runs three
    # times. (At cluster scale the same role is played by writing the
    # shingle table as a durable artifact, as the LSH signature path
    # does.) dropDuplicates makes the hashed-set definition hold at
    # EVERY stage: under a within-doc h32 collision a bare row count
    # would inflate n_sh by one vs size(arr) and the oracle's
    # DISTINCT-based n, and the size filter below could then prune a
    # boundary pair the oracle keeps (ADVICE r14). Post-dedup,
    # n_sh == size(arr) == the oracle's n exactly, collisions or not.
    sh = (
        sh.select(F.col(id_col), h32("sh").alias("h"))
        .dropDuplicates()
        .localCheckpoint()
    )
    arrays = sh.groupBy(id_col).agg(
        F.sort_array(F.collect_set("h")).alias("arr")
    )
    freq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df_h"))
    byid = Window.partitionBy(id_col)
    ranked = sh.join(freq, "h").select(
        F.col(id_col),
        F.col("h"),
        F.row_number()
        .over(byid.orderBy(F.col("df_h").asc(), F.col("h").asc()))
        .alias("rk"),
        F.count(F.lit(1)).over(byid).alias("n_sh"),
    )
    # K=2 extended prefix: one token beyond the classic prefix. Any
    # pair with |A∩B| >= alpha shares its K order-earliest
    # intersection elements inside both (n - alpha + K)-prefixes (the
    # j-th earliest has alpha-j intersection elements after it, so it
    # sits within the first n - (alpha - j) positions), so requiring
    # n_shared >= min(2, alpha_pair) below is still lossless — and it
    # collapsed the candidate set 34.5M -> 3.1M on the r14 row-scale
    # tables (single-shared-mid-frequency-shingle pairs are the
    # candidate mass at a 0.12 threshold; true pairs share many).
    # alpha_pair = ceil(t/(1+t)*(n_a+n_b)) >= each side's own
    # ceil(t*n) whenever the size filter holds, so the pair-level
    # bound is valid for both prefixes.
    prefix = ranked.filter(
        F.col("rk")
        <= F.col("n_sh")
        - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
        + 2
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    alpha_pair = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b"))
        - F.lit(1e-9)
    )
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(
            F.least(F.col("a.n_sh"), F.col("b.n_sh")).cast("double")
            >= F.lit(threshold)
            * F.greatest(F.col("a.n_sh"), F.col("b.n_sh")).cast("double")
            - F.lit(1e-9)
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= F.least(F.lit(2), alpha_pair))
        .select("id_a", "id_b")
    )
    aa = arrays.select(F.col(id_col).alias("id_a"), F.col("arr").alias("arr_a"))
    ab = arrays.select(F.col(id_col).alias("id_b"), F.col("arr").alias("arr_b"))
    verified = (
        cand.join(aa, "id_a")
        .join(ab, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("arr_a", "arr_b")).alias("n_inter"),
            F.size("arr_a").alias("n_a"),
            F.size("arr_b").alias("n_b"),
        )
    )
    return verified.select(
        "id_a",
        "id_b",
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


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
    dim: int = EMBEDDING_DIM,
    num_bits: int = 16,
    bands: int = 2,
) -> DataFrame:
    """Per-vector banded random-hyperplane (sign) LSH signature rows
    ``(id, band, band_key)``: num_bits dot products against broadcast
    literal weight arrays — a narrow per-row projection, no shuffle —
    then explode to one row per band."""
    from streaming_data_lake_spark.operators.similarity import dot, lit_doubles

    if bands <= 0 or num_bits % bands != 0:
        # Same degeneracy as banded_minhash_signatures: zero-column
        # concat makes one global '' bucket (all-pairs), non-dividing
        # bands silently drop trailing bits.
        raise ValueError(
            f"bands ({bands}) must positively divide num_bits ({num_bits})"
        )
    weights = rh_weights(num_bits, dim)
    # lit_doubles: ONE driver→JVM call per hyperplane. F.lit(list)
    # still issues one py4j call per ELEMENT under the hood — the 16
    # × 64 weight family measured 1.4 s of pure plan-construction
    # time per query build (r19, guide §7.3).
    bits = [
        F.when(dot(F.col(vec_col), lit_doubles(ws)) >= 0, F.lit("1"))
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
    dim: int = EMBEDDING_DIM,
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
    dim: int = EMBEDDING_DIM,
    num_bits: int = 16,
    bands: int = 2,
    buckets: int = 8,
    inputs: list[str] | None = None,
) -> DataFrame:
    """Sign-LSH candidates via the materialized bucketed signature
    table (see :func:`_materialized_band_pairs`): the hyperplane
    signature projection runs once at write time instead of once per
    self-join side."""
    return _materialized_band_pairs(
        spark,
        lambda: banded_embedding_signatures(df, id_col, vec_col, dim, num_bits, bands),
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
    dim: int = EMBEDDING_DIM,
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
    from streaming_data_lake_spark.operators.similarity import spread

    # spread() (guide §2.5): the explode fans every token out x32 bit
    # positions before the vote aggregate's map side, and on a
    # single-file corpus that whole expansion ran in ONE task.
    # Scale-adaptive no-op for any corpus wider than the core count.
    # Interleaved A/B at sf0.1 min-of-4: 1.01 -> 0.34 s, results
    # bit-identical.
    tok = spread(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
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
    from streaming_data_lake_spark.operators.similarity import spread

    # spread() (guide §2.5): the self-join plans the shingle explode
    # TWICE (one per reference), and on a single-file corpus each ran
    # in ONE task. Scale-adaptive no-op for any corpus wider than the
    # core count. Interleaved A/B at sf0.1 min-of-4: 1.40 -> 0.55 s,
    # results bit-identical. (A localCheckpoint of the shingle table
    # measured no further win — the two evaluations already run as
    # parallel stages.)
    sh = spread(df).select(
        F.col(id_col), F.explode(shingles(text_col, window_tokens)).alias("w")
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
    from streaming_data_lake_spark.operators.similarity import spread

    # spread() (guide §2.5): the gram+hash+window-min pipeline is the
    # query's CPU and runs where the doc rows sit — one task on a
    # single-file corpus. Scale-adaptive no-op for any corpus wider
    # than the core count. Interleaved A/B at sf0.1 min-of-4:
    # 0.58 -> 0.18 s, results bit-identical.
    return spread(df).select(F.col(id_col), F.explode(selected).alias("fingerprint"))
