"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (point-in-time join of the
customer spine against orders-as-snapshots — the engine's signature
operator) at sf0.001. ``queries()``/``oracle_sql()`` expose the full
operator catalog from ``blackroad_feature_store_spark.plans.
driver_queries`` — one entry per SURVEY.md §2 operator row plus the
LLM-pipeline suite, each paired with a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from blackroad_feature_store_spark.plans import driver_queries as _dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PIT join + as-of top-1 + stats enrichment on sf0.001.

    customer spine LEFT JOIN latest order ≤ cutoff per custkey (the
    reference's point_in_time_join, feature_store.py:411-448, as one
    window + one join), then a per-status aggregate profile — the
    scan → filter → window → join → aggregate signature path.
    """
    from pyspark.sql import functions as F

    from blackroad_feature_store_spark.sources.testdata import sf_dir

    sf = sf_dir("sf0.001")
    pit = _dq.core_pit_join(spark, sf)
    return pit.groupBy("pit_status").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("pit_totalprice"), 6).alias("avg_totalprice"),
        F.min("pit_totalprice").alias("min_totalprice"),
        F.max("pit_totalprice").alias("max_totalprice"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + LLM suite)."""
    return dict(_dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each query. Since r15 this covers
    EVERY key in ``queries()`` — no query takes the driver's weaker
    rows-only check (``mm_image_features`` certifies its
    deterministic fake-decode kernel against a hash-checked oracle;
    real header decodes are pytest-pinned in ``test_codecs.py``)."""
    return dict(_dq.ORACLE)
