"""Kafka + Confluent-Avro streaming source (SURVEY.md S1).

The reference consumes four Kafka topics of Confluent-wire-format
Avro (magic byte 0x0 + 4-byte big-endian schema id + Avro binary —
the standard public wire format) with schemas from a registry
(streaming/flink/sql/create_tables.sql:17-82). The Spark equivalent:

    raw = spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest").load()
    payload = F.expr("substring(value, 6, length(value) - 5)")
    parsed = raw.select(from_avro(payload, schema_json).alias("r")).select("r.*")

This container ships neither the ``spark-sql-kafka`` connector nor the
``spark-avro`` module, so the builder raises a clear error when the
packages are absent; the transformation layer is unaffected because
every downstream operator is a plain DataFrame→DataFrame function
(see ``sources/streams.py`` — the file-source streams exercise the
identical pipeline shape end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: substring is 1-based; the Confluent wire header is 5 bytes.
WIRE_HEADER_BYTES = 5


def strip_confluent_header(value_col: str = "value"):
    """Expression stripping the Confluent wire-format header from a
    binary Kafka ``value`` column, leaving raw Avro bytes."""
    return F.expr(
        f"substring({value_col}, {WIRE_HEADER_BYTES + 1}, "
        f"length({value_col}) - {WIRE_HEADER_BYTES})"
    )


def confluent_schema_id(value_col: str = "value"):
    """Expression extracting the 4-byte big-endian schema id from a
    Confluent-framed binary column (bytes 2-5, after the 0x0 magic
    byte). Lets a consumer route or validate records against the
    registry id without decoding the Avro payload."""
    return F.expr(
        f"cast(conv(hex(substring({value_col}, 2, 4)), 16, 10) as int)"
    )


def is_confluent_framed(value_col: str = "value"):
    """Predicate: the binary value carries a well-formed Confluent
    wire header (leading 0x0 magic byte, the 4-byte schema id, and a
    NON-EMPTY Avro body). Malformed frames should be routed to a
    rejects sink, not fed to ``from_avro`` (which would throw
    mid-stream) — and a 5-byte header-only frame is malformed for
    that purpose too: an empty Avro binary fails FAILFAST decoding
    for any non-empty reader schema (r10 review finding)."""
    return F.expr(
        f"length({value_col}) > {WIRE_HEADER_BYTES} "
        f"AND substring({value_col}, 1, 1) = X'00'"
    )


def _require_avro(spark: SparkSession) -> None:
    try:
        from pyspark.sql.avro.functions import from_avro  # noqa: F401

        # from_avro exists in pyspark even without the jar; probe the JVM side.
        spark._jvm.org.apache.spark.sql.avro.functions  # noqa: B018
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            "Kafka/Avro source requires the spark-avro and "
            "spark-sql-kafka packages (--packages org.apache.spark:"
            "spark-avro_2.13,org.apache.spark:spark-sql-kafka-0-10_2.13); "
            "not present in this environment. Use sources.streams."
            "stream_table for the file-source equivalent."
        ) from exc


def kafka_avro_stream(
    spark: SparkSession,
    servers: str,
    topic: str,
    avro_schema_json: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """``readStream`` over one Confluent-Avro Kafka topic, returning
    the decoded record columns (S1). Raises with guidance when the
    required packages are not on the classpath."""
    _require_avro(spark)
    from pyspark.sql.avro.functions import from_avro

    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # noqa: BLE001 — kafka connector absent
        raise RuntimeError(
            "Kafka source not on the classpath (needs org.apache.spark:"
            "spark-sql-kafka-0-10 via --packages); use sources.streams."
            "stream_table for the file-source equivalent."
        ) from exc
    return raw.select(
        from_avro(strip_confluent_header(), avro_schema_json).alias("r")
    ).select("r.*")
