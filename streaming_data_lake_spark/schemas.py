"""Declared schemas for every logical table the engine serves.

The reference keeps three synchronized schema layers (Avro → Flink
DDL → Iceberg YAML; SURVEY.md §1.2). Here the single source of truth
is this module: explicit ``StructType`` contracts used by the drift
checker (catalog.check_drift) and by streaming file sources (which
require a user-supplied schema).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _f(name: str, dt: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dt, nullable)


DECLARED_SCHEMAS: dict[str, T.StructType] = {
    "region": _s(_f("r_regionkey", T.IntegerType()), _f("r_name", T.StringType())),
    "nation": _s(
        _f("n_nationkey", T.IntegerType()),
        _f("n_name", T.StringType()),
        _f("n_regionkey", T.IntegerType()),
    ),
    "customer": _s(
        _f("c_custkey", T.LongType()),
        _f("c_name", T.StringType()),
        _f("c_nationkey", T.IntegerType()),
        _f("c_acctbal", T.DoubleType()),
        _f("c_mktsegment", T.StringType()),
    ),
    "supplier": _s(
        _f("s_suppkey", T.LongType()),
        _f("s_name", T.StringType()),
        _f("s_nationkey", T.IntegerType()),
        _f("s_acctbal", T.DoubleType()),
    ),
    "part": _s(
        _f("p_partkey", T.LongType()),
        _f("p_name", T.StringType()),
        _f("p_brand", T.StringType()),
        _f("p_type", T.StringType()),
        _f("p_size", T.IntegerType()),
        _f("p_retailprice", T.DoubleType()),
    ),
    "orders": _s(
        _f("o_orderkey", T.LongType()),
        _f("o_custkey", T.LongType()),
        _f("o_orderstatus", T.StringType()),
        _f("o_totalprice", T.DoubleType()),
        _f("o_orderdate", T.TimestampType()),
        _f("o_orderpriority", T.StringType()),
    ),
    "lineitem": _s(
        _f("l_orderkey", T.LongType()),
        _f("l_partkey", T.LongType()),
        _f("l_suppkey", T.LongType()),
        _f("l_linenumber", T.IntegerType()),
        _f("l_quantity", T.DoubleType()),
        _f("l_extendedprice", T.DoubleType()),
        _f("l_discount", T.DoubleType()),
        _f("l_tax", T.DoubleType()),
        _f("l_returnflag", T.StringType()),
        _f("l_linestatus", T.StringType()),
        _f("l_shipdate", T.TimestampType()),
    ),
    "events": _s(
        _f("event_id", T.LongType()),
        _f("ts", T.TimestampType()),
        _f("user_id", T.LongType()),
        _f("event_type", T.StringType()),
        _f("value", T.DoubleType()),
        _f("props", T.StringType()),
    ),
    "documents": _s(
        _f("doc_id", T.LongType()),
        _f("text", T.StringType()),
        _f("lang", T.StringType()),
        _f("source", T.StringType()),
        _f("n_chars", T.LongType()),
    ),
    "embeddings": _s(
        _f("vec_id", T.LongType()),
        _f("embedding", T.ArrayType(T.FloatType())),
        _f("label", T.IntegerType()),
    ),
}

#: Declared dimensionality of the ``embeddings.embedding`` column.
#: Spark's ArrayType (like Iceberg's list type) cannot carry a length
#: in the schema, so the vector dimension rides this table-contract
#: constant instead — the same role FAISS's index ``d`` plays at
#: construction. The similarity family's admission
#: (operators.similarity.valid_vectors, VALID_VEC_GEN 4) enforces it
#: corpus-wide: encoder version drift and truncated rows produce
#: finite nonzero vectors of the WRONG length, which the norm-based
#: GEN-3 checks admit and every downstream fold then resolves to
#: NULL similarity (or, in ANSI element_at paths, a job abort).
EMBEDDING_DIM = 64
