from data_ingestion_framework_spark.streaming.readers import read_file_stream  # noqa: F401
from data_ingestion_framework_spark.streaming.schema_registry import (  # noqa: F401
    SchemaRegistry,
    read_json_stream_with_rescue,
)
from data_ingestion_framework_spark.streaming.windows import (  # noqa: F401
    dedup_within_watermark,
    session_window_agg,
    stream_stream_interval_join,
)
from data_ingestion_framework_spark.streaming.writers import (  # noqa: F401
    foreach_batch_scd_merge,
    stream_append,
)
