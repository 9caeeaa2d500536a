"""SparkSession factory with the engine's standard configuration.

Centralizes the settings every entry point (tests, bench, driver
contract) needs:

* AQE on — runtime re-planning, skew-join splitting, coalesced shuffle
  partitions; the 100 TB insurance policy.
* Arrow on — any `applyInPandas`/`mapInPandas` path (multimodal, optional
  batched HTTP) moves columnar batches, not pickled rows.
* UTC session timezone — timestamps behave identically everywhere and
  match the reference's naive-UTC ISO strings (feature_store.py:351).
* ``parquet.nanosAsLong`` — older testdata generations wrote
  ``events.parquet`` as TIMESTAMP(NANOS), which Spark has no native
  type for; the flag reads it as nanos-since-epoch and
  sources.testdata normalizes. Current generations write micros-NTZ,
  also normalized there (to plain TIMESTAMP under the UTC zone).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "blackroad-feature-store-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master``/``shuffle_partitions`` default from ``SPARK_GRAFT_CPUS``
    so the same code runs under the driver harness (local[32]) and in a
    real cluster (where ``master`` is left to spark-submit).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # MIN/MAX/COUNT over plain parquet can answer from footer
        # statistics without scanning row groups.
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
