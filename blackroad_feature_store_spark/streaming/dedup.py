"""Streaming deduplication — the online half of the batch dedup suite
(operators/dedup.py): drop exact-duplicate documents as they arrive,
before they ever land in the corpus.

Spark-first: this is ``dropDuplicatesWithinWatermark`` over the
normalized content fingerprint — state is bounded by the watermark
horizon (a fingerprint seen longer ago than ``late_threshold`` ages
out of state), which is the only dedup contract that survives an
unbounded stream. Exactly-once-per-fingerprint *within the horizon*;
re-ingesting a duplicate after the horizon passes is the documented
trade-off (run the batch `exact_duplicates` pass downstream for the
long tail — the classic lambda split).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fingerprint(text_col: str = "text"):
    """Normalized content fingerprint — IDENTICAL to the batch
    `exact_duplicates` normalization (trim → collapse whitespace →
    lower → md5) so stream and batch agree on what "same document"
    means."""
    return F.md5(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    )


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    late_threshold: str = "10 minutes",
) -> DataFrame:
    """First-seen-wins streaming exact dedup.

    ``docs`` is a streaming DataFrame with an event-time column and a
    text column. Output carries the input columns plus ``fingerprint``.
    State size is O(distinct fingerprints within the watermark
    horizon), not O(stream) — the property that makes this runnable
    forever.
    """
    return (
        docs.withColumn("fingerprint", fingerprint(text_col))
        .withWatermark(ts_col, late_threshold)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


_DUP_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_dup", T.LongType()),
    ]
)


def duplicate_counts(
    stream: DataFrame, key_col: str
) -> DataFrame:
    """First-seen-wins GLOBAL duplicate accounting over a stream as a
    keyed STATEFUL operator (`applyInPandasWithState`): per
    micro-batch it emits one row per key seen in that batch, ``(key,
    n_rows, n_dup)``, where ``n_dup`` counts the rows that duplicate
    an EARLIER-SEEN occurrence of the key — across batches, not just
    within one. Summing ``n_dup`` over every batch equals the
    whole-history ``count(*) - count(distinct key)``.

    State is one empty-marker entry per distinct key with NO timeout:
    exact global uniqueness inherently needs memory of every key ever
    seen (O(distinct keys) — the same state a shuffle-dedup of the
    full history would hold; a bounded-horizon variant is
    :func:`dedup_stream`, with the documented weaker contract). Keys
    are compared by their string cast.

    COST BOUNDARY: `applyInPandasWithState` invokes the Python worker
    once PER KEY per batch, so this is only the right form when key
    cardinality per batch is modest (10^3-10^4 — e.g. per-entity or
    per-session keys). At 10^5 keys/batch it already measures ~10x
    slower than the all-JVM seen-key-store form
    `streaming/quality.py::process_unique_gate_batch` uses, and the
    gap grows linearly — the uniqueness GATE therefore composes the
    key store, not this operator."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    shaped = stream.select(F.col(key_col).cast("string").alias("key"))

    def mark(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n = sum(len(p) for p in pdfs)
        if n == 0:
            return
        first_seen = 0 if state.exists else 1
        state.update((True,))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_rows": [n],
                "n_dup": [n - first_seen],
            }
        )

    return shaped.groupBy("key").applyInPandasWithState(
        mark,
        outputStructType=_DUP_COUNT_SCHEMA,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
