from data_ingestion_framework_spark.sinks.audit import AuditLogger  # noqa: F401
from data_ingestion_framework_spark.sinks.writers import batch_write  # noqa: F401
