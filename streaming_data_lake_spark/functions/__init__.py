from streaming_data_lake_spark.functions.hashing import h32, h32_seeded, duck_h32, duck_h32_seeded  # noqa: F401
from streaming_data_lake_spark.functions.scalar import zero_guard_ratio  # noqa: F401
