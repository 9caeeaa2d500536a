"""blackroad_feature_store_spark — a PySpark-native feature-store / analytics engine.

A ground-up re-expression of the capabilities of
BlackRoad-Labs/blackroad-feature-store (reference: ``feature_store.py``,
``ollama_router.py``) on Apache Spark: the registry/control plane lives in
small parquet tables, the data plane is an append-only, partitioned
``entity_records`` table queried with DataFrame pipelines (window top-1
as-of reads, one-shuffle point-in-time joins, distributed statistics),
plus the LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB training-data pipeline needs.

Design stance (SURVEY.md §7.0): DataFrame/SQL only, no RDDs, no UDFs on
the hot path; Catalyst does the optimization; everything scales by
partitioning + shuffle, never by driver-side loops.
"""

from blackroad_feature_store_spark.errors import (
    ConcurrentModificationError,
    FeatureStoreError,
    GroupExistsError,
    UnknownFeatureError,
    UnknownGroupError,
)
from blackroad_feature_store_spark.functions.asof_sql import asof_sql
from blackroad_feature_store_spark.store import (
    DTYPES,
    FREQ_BATCH,
    FREQ_STREAMING,
    Feature,
    FeatureGroup,
    FeatureStore,
)

__all__ = [
    "ConcurrentModificationError",
    "DTYPES",
    "FREQ_BATCH",
    "FREQ_STREAMING",
    "Feature",
    "FeatureGroup",
    "FeatureStore",
    "FeatureStoreError",
    "asof_sql",
    "GroupExistsError",
    "UnknownFeatureError",
    "UnknownGroupError",
]

__version__ = "0.1.0"
