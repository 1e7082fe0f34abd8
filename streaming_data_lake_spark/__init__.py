"""streaming_data_lake_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference streaming data lake (rkarish/streaming-data-lake, see
SURVEY.md): declarative ingestion transforms, dimension-enriched
views, streaming windowed aggregates with upsert sinks, incremental
materialization, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for streams, Arrow-batched pandas UDFs
only where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from streaming_data_lake_spark.session import get_spark  # noqa: F401
