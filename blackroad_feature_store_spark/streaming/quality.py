"""Streaming data-quality expectations — the Deequ-on-streams gate an
ingest pipeline runs CONTINUOUSLY instead of per-drop: every
micro-batch lands its own (check, target, total, violations) partial
in a batch_id partition, and the current verdict over everything
ingested so far is a monoid fold, never a rescan of history.

Shares the ENTIRE store machinery of `streaming/stats.py` — dynamic
partition overwrite makes foreachBatch replay idempotent,
:func:`~blackroad_feature_store_spark.streaming.stats.compact_stats`
folds committed prefixes behind the atomic marker (the `_fold`
dispatcher recognizes the expectation schema), and the same
read-consistency caveat applies.

MERGEABILITY is the contract, and it bounds the check catalog:

* row-local checks (not_null / in_range / regex / accepted_values)
  are additive over any batch partition of the data — fold == batch
  recompute, exactly;
* ``foreign_key`` is additive **when the referenced table is
  static** for the stream's lifetime (each row's orphan-ness depends
  only on itself and the ref) — the caller owns that assumption;
* ``unique`` is NOT mergeable (a key can be unique within every
  batch and duplicated across them) — rejected with a ValueError
  pointing at the batch `check_expectations` / a keyed stateful
  dedup instead of silently under-counting.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from blackroad_feature_store_spark.operators.expectations import (
    check_expectations,
)
from blackroad_feature_store_spark.streaming.stats import (
    _fold,
    _live_partials,
)


def _validate_streaming_checks(checks: list[dict[str, Any]]) -> None:
    for spec in checks:
        if spec.get("check") == "unique":
            raise ValueError(
                "'unique' is not mergeable across micro-batches (a key "
                "unique within every batch can still repeat across "
                "them) — run batch check_expectations over the landed "
                "data, or dedup the stream with a keyed stateful "
                "operator first"
            )


def process_expectations_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    checks: list[dict[str, Any]],
) -> None:
    """One micro-batch: evaluate every check on THIS batch only and
    land (check, target, total, violations) in the batch's own
    partition — same replay-idempotent dynamic overwrite as every
    store in `streaming/stats.py`."""
    _validate_streaming_checks(checks)
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    partial = check_expectations(batch_df, checks).drop("passed")
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        partial.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).partitionBy("batch_id").parquet(os.path.join(out_path, "batches"))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def merge_expectations(spark: SparkSession, out_path: str) -> DataFrame:
    """The current verdict over everything ingested so far: fold all
    live partials per (check, target) and re-derive ``passed`` —
    (check, target, total, violations, passed). For the supported
    check catalog this equals a batch `check_expectations` over the
    union of all batches, exactly (integer counts — hash-certified by
    the catalog query)."""
    return _fold(_live_partials(spark, out_path)).select(
        "check",
        "target",
        "total",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def start_expectations_stream(
    records: DataFrame,
    out_path: str,
    checkpoint: str,
    checks: list[dict[str, Any]],
    available_now: bool = False,
) -> StreamingQuery:
    """Maintain the expectation store over a streaming DataFrame;
    read the running verdict any time with :func:`merge_expectations`
    (same transient-listing caveat as the stats store — snapshot
    between micro-batches for an exact cut)."""
    _validate_streaming_checks(checks)
    writer = (
        records.writeStream.foreachBatch(
            lambda batch_df, batch_id: process_expectations_batch(
                batch_df, batch_id, out_path, checks
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
