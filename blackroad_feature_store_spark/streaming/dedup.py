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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
