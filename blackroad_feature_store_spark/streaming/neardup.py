"""Streaming NEAR-duplicate detection — the online half of the MinHash
LSH suite (operators/dedup.py), closing the gap the exact
`dedup_stream` documents: a re-worded boilerplate document sails past
a fingerprint check, but still collides in LSH bucket space.

Spark-first shape: `foreachBatch` + a persisted signature store. Each
micro-batch is shingled and signed ONCE
(`incremental_candidate_pairs`), bucket-joined against the accumulated
signature table (new-vs-existing one direction + new-vs-new), and both
outputs append as parquet partitions keyed by `batch_id`:

- per-batch cost is O(|batch| + bucket collisions), INDEPENDENT of
  how many documents have ever streamed through — the property that
  makes this runnable forever (the signature store grows, but only
  its colliding buckets are ever touched via the equi-join);
- idempotent under micro-batch replay: a batch writes its own
  `batch_id=` partition with dynamic partition overwrite, and the
  existing-signature read EXCLUDES the current batch id, so a failed
  attempt's leftovers are both invisible to the retry and overwritten
  by it (the standard foreachBatch exactly-once recipe);
- unlike `dropDuplicatesWithinWatermark` there is no state-store
  eviction horizon: the signature table is plain parquet, so the
  "seen" set is durable across restarts and unbounded in age, while
  Spark's own state store holds NOTHING (foreachBatch is stateless) —
  the right trade for a corpus-build pipeline where late duplicates
  matter more than state bytes.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from blackroad_feature_store_spark.operators.dedup import (
    incremental_candidate_pairs,
)

_SIG_SCHEMA = "band int, sig string, batch_id long"


def _existing_sigs(
    spark: SparkSession, sig_path: str, id_col: str, before_batch: int
) -> DataFrame:
    """All signatures from batches strictly before `before_batch`;
    schema-stable empty frame when the store doesn't exist yet.

    Only a missing store maps to "empty seen-set": the except is
    limited to PATH_NOT_FOUND. A corrupt or transiently unreadable
    signature store must FAIL the micro-batch (it would otherwise be
    silently treated as empty and permanently miss every cross-batch
    pair); foreachBatch replay then retries the batch against the
    intact store.
    """
    try:
        sigs = spark.read.parquet(sig_path)
    except AnalysisException as exc:  # first batch: no store yet
        msg = str(exc)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        return spark.createDataFrame(
            [], f"{id_col} long, {_SIG_SCHEMA}"
        ).drop("batch_id")
    return sigs.where(F.col("batch_id") < before_batch).drop("batch_id")


def process_neardup_batch(
    batch_df: DataFrame,
    batch_id: int,
    sig_path: str,
    pairs_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bands: int = 8,
    shingle_size: int = 3,
) -> None:
    """One micro-batch of the near-dup detector — module-level so the
    replay-idempotence contract is directly testable: calling this
    twice with the same ``batch_id`` (foreachBatch does exactly that
    after a failure between write and checkpoint commit) must leave
    the stores identical to one call, because the existing-signature
    read excludes the current batch and both writes dynamically
    overwrite only their own ``batch_id=`` partition. No emptiness
    probe (r17): an empty batch yields zero signatures and zero
    pairs, so both dynamic overwrites write nothing — one fewer job
    on every batch of every neardup stream."""
    spark = batch_df.sparkSession
    batch = batch_df.select(id_col, text_col)
    existing = _existing_sigs(spark, sig_path, id_col, batch_id)
    # materialize_sigs: the batch is shingled/hashed ONCE (the pairs
    # plan references the signatures three times and the sig-store
    # write is a fourth action over the same lineage)
    pairs, new_sigs = incremental_candidate_pairs(
        batch,
        existing,
        id_col=id_col,
        text_col=text_col,
        num_bands=num_bands,
        shingle_size=shingle_size,
        materialize_sigs=True,
    )
    from blackroad_feature_store_spark.streaming.stats import (
        _write_batch_partition,
    )

    # sig write FIRST: it materializes the lazily-checkpointed batch
    # signatures, so the pairs write reads persisted blocks
    _write_batch_partition(new_sigs, batch_id, sig_path)
    _write_batch_partition(pairs, batch_id, pairs_path)


def start_neardup_stream(
    docs: DataFrame,
    sig_path: str,
    pairs_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bands: int = 8,
    shingle_size: int = 3,
    available_now: bool = False,
) -> StreamingQuery:
    """Start (or one-shot drain) the streaming near-dup detector.

    `docs` is a streaming DataFrame with at least (`id_col`,
    `text_col`). Appends to two parquet tables partitioned by
    `batch_id`: `sig_path` (id, band, sig) — the growing signature
    store — and `pairs_path` (id_a, id_b) — every LSH candidate pair
    whose LATER member arrived in that batch. Downstream, feed the
    pairs table to `duplicate_clusters` / `ngram_jaccard` exactly like
    the batch path.
    """
    writer = (
        docs.writeStream.foreachBatch(
            lambda batch_df, batch_id: process_neardup_batch(
                batch_df,
                batch_id,
                sig_path,
                pairs_path,
                id_col=id_col,
                text_col=text_col,
                num_bands=num_bands,
                shingle_size=shingle_size,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
