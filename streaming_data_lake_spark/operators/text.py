"""Text-analysis operators for training-data pipelines.

Language ID (lexicon n-gram heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and rolling-hash document
fingerprinting — all as built-in-function column expressions so the
hot path stays in whole-stage codegen and the DuckDB oracle can
reproduce every value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_data_lake_spark.functions.hashing import h32
from streaming_data_lake_spark.operators.dedup import shingles, tokens

# Tiny per-language marker lexicons for the heuristic language-ID.
# Deliberately simple and deterministic: score = number of tokens in
# the language's marker set; argmax with alphabetical tie-break.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "datos"),
    "fr": ("le", "la", "les", "des"),
    "zh": ("de", "shi", "zai", "he"),
}

# BPE-ish token pattern: word pieces, digit runs, or single symbols.
# The negated class spells the Java-\s set explicitly (see
# dedup.WS_CLASS): under a bare \s, a vertical tab is whitespace to
# Java (never a symbol token) but NOT to the oracle's RE2 (counted
# as a symbol) — the r15 control-char probe's divergence class.
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0B]"

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def whitespace_token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), F.lit(0))).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language over the token multiset."""
    toks = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))).cast("long")
    return out


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Predict language as the argmax marker score (ties → first
    language alphabetically). Output keeps the per-language scores so
    downstream filters can threshold on confidence."""
    scores = lang_scores(F.col(text_col))
    langs = sorted(scores)
    pairs = F.array(*[F.struct((-scores[lg]).alias("neg"), F.lit(lg).alias("lang")) for lg in langs])
    best = F.array_min(pairs)  # struct compare: lowest neg score, then lang asc
    return df.select(
        F.col(id_col),
        *[scores[lg].alias(f"score_{lg}") for lg in langs],
        # NULL text -> NULL prediction. Without the guard the struct
        # argmin compares (-NULL, lang) structs, NULL sorts first, and
        # every NULL doc "predicts" the alphabetically-first language
        # (edge-sweep finding; the oracle mirrors with a NULL branch).
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(best["lang"])
        .alias("predicted_lang"),
    )


def quality_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document quality features + a composite score.

    Features follow the standard web-corpus filters: length, mean
    token length, type-token ratio, stopword ratio. Single divisions
    on exact integer counts → cross-engine-stable doubles. ``keep``
    carries extra source columns (e.g. lang for per-language
    thresholds) through the narrow projection without a re-join.
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks).cast("double")
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
    avg_tok_len = F.when(n_tok > 0, tok_chars / n_tok).otherwise(F.lit(0.0))
    ttr = F.when(n_tok > 0, uniq / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    score = (
        F.when((n_tok >= 20) & (n_tok <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_tok_len >= 3.0) & (avg_tok_len <= 10.0), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(ttr >= 0.3, F.lit(0.2)).otherwise(F.lit(0.0))
        # n_tok > 0 guard: an empty doc has stop_ratio 0.0 by the
        # division default, which would otherwise award the "low
        # stopword ratio" bonus to zero-content text — the one score
        # branch whose empty-doc default PASSES its threshold (the
        # other three fail theirs, so they need no guard).
        + F.when((n_tok > 0) & (stop_ratio <= 0.4), F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.size(toks).cast("long").alias("n_tokens"),
        avg_tok_len.alias("avg_token_len"),
        ttr.alias("type_token_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprint: (min, max) portable hash over the word
    n-gram shingle set — a 1-hash MinHash sketch usable as a cheap
    near-dup prefilter key."""
    sh = shingles(text_col, n)
    hashes = F.transform(sh, lambda s: h32(s))
    return df.select(
        F.col(id_col),
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        F.size(sh).cast("long").alias("n_shingles"),
    )


# -- PII redaction ----------------------------------------------------------

#: RE2-safe patterns (no backrefs/lookaround) so Spark's Java regex
#: and DuckDB's RE2 match identically.
# RFC-bounded local part (<=64) and domain labels: the bounds are not
# pedantry — the unbounded `[...]+@` shape makes Java's backtracking
# regex O(chars²) on any long run of local-part characters with no @
# (a single 300 KB whitespace-free token hung redaction outright,
# r14 megatoken probe; DuckDB's RE2 is linear so the hang was also a
# cross-engine asymmetry). Bounded quantifiers cap the per-position
# scan at 64, restoring O(chars). PHONE_RE is already linear on
# digit runs: its required `-` after a bounded 3-digit prefix fails
# fast at every position.
EMAIL_RE = r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,253}\.[A-Za-z]{2,63}"
PHONE_RE = r"[0-9]{3}-[0-9]{2,}"


def redact_pii(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Scrub emails and phone-shaped digit runs from a text column,
    keeping redaction counts for observability. Pure regexp column
    expressions — codegen'd, shuffle-free, safe to run as a narrow
    map over a 100 TB corpus."""
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))).cast("long")
    # Phones are counted on the EMAIL-REDACTED text — the same text
    # the <PHONE> substitution runs on — so n_phones always equals
    # the number of substitutions made. Counting on the original
    # drifted whenever a phone-shaped run sat inside an email local
    # part (the email pass consumes it first).
    emails_gone = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    n_phones = F.size(
        F.regexp_extract_all(emails_gone, F.lit(PHONE_RE), F.lit(0))
    ).cast("long")
    redacted = F.regexp_replace(emails_gone, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


# -- Repetition signals (Gopher-style quality filters) ----------------------


def repetition_signals(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document repetition metrics used by web-corpus quality
    filters: the fraction of tokens taken by the single most frequent
    token, and the duplicate-2-gram fraction (1 − distinct/total).

    Plan shape at scale: explode → groupBy(doc, token) → groupBy(doc)
    max/sum — both aggregates map-side combinable; the 2-gram
    distinct count rides the shingle array (per-row, no shuffle).
    """
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(shingles(text_col, 2)).cast("long").alias("n_distinct_2grams"),
    )
    tok_counts = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_token_count"))
    )
    out = base.join(tok_counts, id_col, "left")
    n_tok = F.col("n_tokens").cast("double")
    total_2g = F.greatest(F.col("n_tokens") - 1, F.lit(0)).cast("double")
    return out.select(
        id_col,
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.coalesce(F.col("top_token_count"), F.lit(0)).cast("double") / n_tok,
        )
        .otherwise(F.lit(0.0))
        .alias("top_token_frac"),
        F.when(
            total_2g > 0,
            F.lit(1.0) - F.col("n_distinct_2grams").cast("double") / total_2g,
        )
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_frac"),
    )
