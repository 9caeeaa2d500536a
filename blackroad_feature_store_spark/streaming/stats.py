"""Streaming incremental feature statistics — the monitoring half of a
feature store at ingest time: per-group running (count, nulls, sum,
min, max, mean) maintained over an unbounded stream of feature
writes, with exactly-once semantics under foreachBatch replay.

Design (reference parity: the batch ``FeatureStore.statistics`` in
``store.py`` recomputes over the full history — fine for a SQLite toy,
O(history) per refresh at 100 TB):

* each micro-batch writes its own MERGEABLE partial aggregate —
  (group, n, n_null, sum, min, max) — into a parquet table
  partitioned by ``batch_id``. Per-batch cost is O(batch), never
  O(history), and the write is a dynamic partition overwrite of the
  batch's own partition, so foreachBatch's replay-after-crash
  re-delivers bit-identical partials instead of double counting;
* the CURRENT stats are the fold of all partials (sum of n/sum,
  min of min, max of max — the classic commutative-monoid shape),
  an O(groups × batches) read-side merge. Because partials form a
  monoid, any prefix of batches can be compacted into one folded
  partition offline without changing the result — the maintenance
  valve when batch counts grow into the millions;
* min/max/count/null-count are exactly associative; ``sum`` over
  doubles reassociates (IEEE), so consumers comparing against a
  batch recomputation should round (the catalog query pins parity at
  6 decimal places, as the rest of the float-agg suite does).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def partial_stats(
    batch: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """The mergeable per-batch partial: one row per group with
    (n, n_null, sum, min, max) of ``value_col``. count/min/max/sum
    all map-side combine, so the only exchange is |groups|-sized."""
    v = F.col(value_col)
    return batch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(v).alias("sum_value"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
    )


def process_stats_batch(
    batch_df: DataFrame,
    batch_id: int,
    stats_path: str,
    group_cols: list[str],
    value_col: str,
) -> None:
    """One micro-batch: write this batch's partial aggregate into its
    own ``batch_id=`` partition. Module-level so replay idempotence is
    directly testable: running it twice with the same ``batch_id``
    (exactly what foreachBatch does after a crash between write and
    checkpoint commit) dynamically overwrites the same partition with
    the same rows — the store never double counts."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    partial = partial_stats(batch_df, group_cols, value_col)
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        partial.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).partitionBy("batch_id").parquet(stats_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def merge_stats(spark: SparkSession, stats_path: str) -> DataFrame:
    """Fold every batch partial into the current per-group statistics:
    (group, n, n_null, sum_value, min_value, max_value, mean_value).
    Monoid fold — order-independent, so any compaction of old
    partitions leaves the result unchanged. Missing store raises
    (there is nothing meaningful to report before the first batch;
    callers wanting empty-on-missing can catch AnalysisException)."""
    try:
        partials = spark.read.parquet(stats_path)
    except AnalysisException as exc:
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            raise AnalysisException(
                f"stats store {stats_path} does not exist yet "
                "(no batch has been processed)"
            ) from exc
        raise
    group_cols = [
        c
        for c in partials.columns
        if c
        not in ("n", "n_null", "sum_value", "min_value", "max_value",
                "batch_id")
    ]
    return (
        partials.groupBy(*group_cols)
        .agg(
            F.sum("n").alias("n"),
            F.sum("n_null").alias("n_null"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn(
            "mean_value",
            F.when(
                F.col("n") - F.col("n_null") > 0,
                F.col("sum_value") / (F.col("n") - F.col("n_null")),
            ),
        )
    )


def start_stats_stream(
    records: DataFrame,
    stats_path: str,
    checkpoint: str,
    group_cols: list[str],
    value_col: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Start (or one-shot drain) the incremental stats maintainer over
    a streaming DataFrame of feature writes. The stats store at
    ``stats_path`` is readable at ANY time via :func:`merge_stats` —
    monitoring never blocks ingest and ingest never recomputes
    history."""
    writer = (
        records.writeStream.foreachBatch(
            lambda batch_df, batch_id: process_stats_batch(
                batch_df,
                batch_id,
                stats_path,
                group_cols=group_cols,
                value_col=value_col,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
