from data_ingestion_framework_spark.plans.pipeline import PipelineBuilder  # noqa: F401
