"""Shared DuckDB oracle fragments.

These strings define the CROSS-ENGINE semantics every parity
certification depends on — tokenization, dot products, and (via
:mod:`streaming_data_lake_spark.functions.hashing`) the portable
32-bit hash. They were previously copy-pasted per query module, so a
semantic tweak in one module silently left the others' oracles on the
old definition (r10 review finding); each fragment now has exactly
one home.

Every fragment mirrors a Spark-side builder 1:1:

- ``DUCK_TOKS``  ↔ ``operators.dedup.tokens`` (whitespace split,
  empties removed)
- ``DUCK_DOT``   ↔ ``operators.similarity.dot`` (pairwise product
  fold in DOUBLE)
- ``hashing.duck_h32`` ↔ ``functions.hashing.h32``
"""

from __future__ import annotations

from streaming_data_lake_spark.schemas import EMBEDDING_DIM

#: Portable whitespace class ↔ ``operators.dedup.WS_CLASS``: Java's
#: default ``\s`` is exactly [ \t\n\x0B\f\r] while RE2's ``\s`` OMITS
#: \x0B (vertical tab) — a bare '\s' in an oracle regex silently
#: diverges from the engine on VT-carrying text (r15 control-char
#: probe). Both engines spell the Java set explicitly.
DUCK_WS = r"[ \t\n\r\f\x0B]"

#: whitespace tokenization with empties removed, over a `text` column
DUCK_TOKS = (
    "list_filter(string_split_regex(trim(text), '"
    + DUCK_WS
    + "+'), t -> t <> '')"
)

#: dot product of two DOUBLE list columns; .format(a=..., b=...)
DUCK_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
)

#: valid-embedding predicate ↔ ``operators.similarity.valid_vectors``:
#: non-NULL, DECLARED length, no NULL elements, FINITE norm > 0.
#: Takes BOTH placeholders: .format(v=<list expr>, dim=<declared
#: dim>). The self-dot is CASE-guarded because DuckDB's list_reduce
#: ERRORS on an empty list where Spark's aggregate folds to the 0.0
#: seed; a NULL element makes the fold NULL and `NULL > 0` drops the
#: row, same as Spark. isfinite: a NaN/Inf element passes a bare
#: `norm > 0` in BOTH engines (NaN-greatest comparison semantics) and
#: then emits NaN-similarity pairs against its whole cluster —
#: FAISS-style admission excludes it (r12 probe; VALID_VEC_GEN 3).
#: len = dim: wrong-dimension vectors (encoder drift, truncated rows)
#: are finite and nonzero, so the norm checks admit them; the
#: declared-dimension conjunct is the corpus-wide FAISS ``d``
#: admission (VALID_VEC_GEN 4; the len > 0 arm of the empty-list
#: guard is subsumed but kept so the fragment stays safe under
#: dim-free reuse).
DUCK_VALID_VEC = (
    "({v} IS NOT NULL AND len({v}) = {dim}"
    " AND (CASE WHEN len({v}) > 0 THEN CASE WHEN isfinite("
    + DUCK_DOT.format(a="{v}", b="{v}")
    + ") THEN " + DUCK_DOT.format(a="{v}", b="{v}")
    + " END END) > 0)"
)

#: drop-in FROM-clause source: the embeddings table restricted to
#: valid vectors of the declared dimension (schemas.EMBEDDING_DIM).
#: Use as f"FROM {DUCK_EMB} AS embeddings" (or any alias) so
#: downstream references are unchanged.
DUCK_EMB = (
    "(SELECT * FROM embeddings WHERE "
    + DUCK_VALID_VEC.format(v="embedding", dim=EMBEDDING_DIM)
    + ")"
)
