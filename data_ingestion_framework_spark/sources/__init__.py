from data_ingestion_framework_spark.sources.batch import (  # noqa: F401
    CONTROL_COLUMNS,
    add_control_columns,
    read_batch,
    read_csv,
    read_delta_path,
    read_json,
    read_orc,
    read_text,
    read_parquet,
    read_table,
)
from data_ingestion_framework_spark.sources.tablestore import ParquetTable  # noqa: F401
