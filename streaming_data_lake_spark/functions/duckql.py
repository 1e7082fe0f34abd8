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

#: whitespace tokenization with empties removed, over a `text` column
DUCK_TOKS = r"list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')"

#: dot product of two DOUBLE list columns; .format(a=..., b=...)
DUCK_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
)
