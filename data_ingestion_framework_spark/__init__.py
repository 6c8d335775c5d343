"""data_ingestion_framework_spark — a PySpark-native analytics / ingestion engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities of the reference ingestion framework
(ark-consulting-srini/data-ingestion-framework): config-driven batch +
streaming ingestion with SCD Type 1 / Type 2 merge semantics, CDC delta
detection, data-quality rule evaluation and audit logging — plus
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Design principles (Spark-first, not a port):
- DataFrame / Spark SQL everywhere; Catalyst + AQE pick physical plans.
- No eval()-based dispatch: explicit registries and compiled Column
  expressions (the reference uses ``eval`` in its DQ and transform
  layers; see SURVEY.md §2.11/§2.12).
- Merge semantics are pure DataFrame programs + a pluggable table-store
  commit (local parquet swap here; Delta/Iceberg ``MERGE INTO`` on a
  real lakehouse).
- Every operator is designed for a 1000-executor / 100 TB deployment:
  partition-pruned scans, broadcast of small dims, no driver-side data
  loops, map-side partial aggregation.
"""

__version__ = "0.1.0"

from data_ingestion_framework_spark.session import get_spark  # noqa: F401
