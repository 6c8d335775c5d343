from data_ingestion_framework_spark.functions.hashes import (  # noqa: F401
    hash_diff,
    hash_key,
    surrogate_key,
    with_hash_keys,
)
