"""Streaming ingest: gives the reference's ``frequency="streaming"``
label real behavior (it is declared-but-inert in the reference —
SURVEY.md §2.9).

A streaming group accepts a ``readStream`` of snapshots and appends
them to the same ``entity_records`` table the batch path writes, so
every as-of/PIT/stats read works unchanged over streamed data. The
append-only record log is exactly the shape Structured Streaming's
append output mode wants — no watermark needed for ingest (nothing
aggregates); add watermark + windowed aggs only for streaming
*aggregation* features (``windowed_counts`` below shows the pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blackroad_feature_store_spark.store import FeatureStore, FREQ_STREAMING


def records_stream(
    source: DataFrame,
    group_id: str,
    entity_col: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Shape an arbitrary streaming DataFrame into entity_records rows.

    Values are JSON-encoded per cell (to_json keeps int/float/str/bool
    distinctions) matching the batch writer's canonical map form.
    """
    # to_json wraps as {"v": ...}; strip the envelope to the bare value.
    # ignoreNullFields=false keeps {"v":null} so NULL cells decode as
    # JSON null exactly like the batch writer (dropping the field would
    # yield '' and crash decode_value on read).
    fv = F.map_from_arrays(
        F.array(*[F.lit(c) for c in value_cols]),
        F.array(
            *[
                F.regexp_extract(
                    F.to_json(
                        F.struct(F.col(c).alias("v")),
                        {"ignoreNullFields": "false"},
                    ),
                    r'^\{"v":(.*)\}$',
                    1,
                )
                for c in value_cols
            ]
        ),
    )
    return source.select(
        F.expr("uuid()").alias("id"),
        F.lit(group_id).alias("group_id"),
        F.col(entity_col).cast("string").alias("entity_id"),
        fv.alias("feature_values"),
        F.col(ts_col).cast("timestamp").alias("timestamp"),
        F.lit(1).alias("version"),
    )


def start_ingest(
    store: FeatureStore,
    group_id: str,
    source: DataFrame,
    entity_col: str,
    ts_col: str,
    value_cols: list[str],
    checkpoint: str,
    trigger_available_now: bool = False,
    refresh_rollup: str | None = None,
    auto_compact_max_files: int | None = None,
):
    """Start (or one-shot drain, with availableNow) a streaming append
    into the store's record table.

    The sink is ``foreachBatch`` → one commit-log transaction per
    micro-batch, the same shape Delta's streaming sink uses. Exactly
    once end-to-end: the checkpoint replays a failed batch
    (at-least-once delivery), and the commit carries ``(stream_id,
    batch_id)`` so a replayed batch that already committed is detected
    and skipped — a batch lands in the table exactly once. A plain
    parquet streaming sink can't give this over a versioned table: its
    files would bypass the manifest (invisible to readers, reclaimed
    by vacuum).

    ``refresh_rollup`` names a materialized entity rollup
    (:meth:`FeatureStore.refresh_entity_rollup`) to advance after each
    committed batch: the refresh consumes the change feed from the
    rollup's own cursor, so its cost tracks the batch size and a
    replayed (skipped) batch leaves the rollup untouched — the
    serving-side aggregate stays continuously fresh without any
    table rescan.

    ``auto_compact_max_files`` turns on the continuous auto-OPTIMIZE
    loop: after each committed batch,
    :meth:`FeatureStore.maybe_compact` runs with that threshold — a
    commit-log-only check that costs nothing until the partition's
    live file count exceeds it, at which point the small per-batch
    files are rewritten into right-sized ones. This is what keeps a
    long-running per-batch-commit stream from degrading reads with
    thousands of tiny files. Compaction commits are invisible to the
    change feed, so a concurrent ``refresh_rollup`` never
    double-counts.
    """
    import os as _os

    group = store.get_group(group_id)
    if group is None:
        raise ValueError(f"Feature group '{group_id}' not found")
    if group.frequency != FREQ_STREAMING:
        raise ValueError(
            f"Group '{group.name}' has frequency '{group.frequency}'; "
            "streaming ingest requires a streaming group"
        )
    shaped = records_stream(source, group_id, entity_col, ts_col, value_cols)
    stream_id = _os.path.abspath(checkpoint)

    def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if store.stream_batch_committed(stream_id, batch_id):
            return  # checkpoint replay of an already-committed batch
        store._stage_and_commit(
            batch_df,
            op="stream-append",
            meta={"stream_id": stream_id, "batch_id": batch_id},
        )
        store._note_stream_commit(stream_id, batch_id)
        if refresh_rollup is not None:
            store.refresh_entity_rollup(refresh_rollup, group_id)
        if auto_compact_max_files is not None:
            store.maybe_compact(
                group_id, max_files=auto_compact_max_files
            )

    writer = (
        shaped.writeStream.foreachBatch(_commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    source: DataFrame,
    ts_col: str,
    key_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming windowed aggregation pattern (event-time window +
    watermark for late data) — the building block for streaming
    aggregate features beyond the reference's surface."""
    return (
        source.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
    )


def materialize_windowed_features(
    store: FeatureStore,
    group_id: str,
    source: DataFrame,
    ts_col: str,
    key_col: str,
    checkpoint: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    trigger_available_now: bool = False,
):
    """Streaming feature engineering end-to-end: windowed aggregates of
    an event stream land in the store AS FEATURES, timestamped at
    window end, so every as-of read and point-in-time join sees the
    freshest closed window — continuous materialized features, the
    streaming analogue of a batch feature backfill.

    Pipeline: watermark + event-time window agg (`windowed_counts`) →
    entity = the grouping key, timestamp = window END (an aggregate is
    knowable only once its window closes — stamping window start would
    leak future events into as-of reads) → exactly-once commit per
    micro-batch (same replay guard as `start_ingest`). Append output
    mode means a window emits once, finalized, when the watermark
    passes — re-emission/update semantics are not needed because the
    record log is append-only and as-of reads take the latest row.
    """
    import os as _os

    group = store.get_group(group_id)
    if group is None:
        raise ValueError(f"Feature group '{group_id}' not found")
    if group.frequency != FREQ_STREAMING:
        raise ValueError(
            f"Group '{group.name}' has frequency '{group.frequency}'; "
            "streaming ingest requires a streaming group"
        )
    agg = windowed_counts(
        source, ts_col, key_col, window_duration, watermark
    ).select(
        F.col(key_col),
        F.col("window.end").alias("__ts"),
        F.col("n"),
        F.col("sum_value"),
    )
    shaped = records_stream(agg, group_id, key_col, "__ts", ["n", "sum_value"])
    stream_id = _os.path.abspath(checkpoint)

    def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if store.stream_batch_committed(stream_id, batch_id):
            return
        store._stage_and_commit(
            batch_df,
            op="stream-features",
            meta={"stream_id": stream_id, "batch_id": batch_id},
        )
        store._note_stream_commit(stream_id, batch_id)

    writer = (
        shaped.writeStream.foreachBatch(_commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def fold_exact_substr_partials(
    spark,
    idx_store: str,
    before_batch_id: int | None = None,
) -> DataFrame | None:
    """Fold persisted per-batch ExactSubstr index partials (laid out
    as ``idx_store/batch_id=N``, one directory per committed
    micro-batch) into a single history index via
    :func:`~blackroad_feature_store_spark.operators.exactsubstr.fold_exact_substr_index`.

    ``before_batch_id`` bounds history to partials with parsed batch
    id STRICTLY BELOW it — the replay-safety contract (ADVICE r13
    medium): a crash between "partial written" and "checkpoint
    committed" replays batch N with N's own delta already on disk;
    folding it as history would double every window count of the
    batch, so even batch-unique windows read as duplicated and are
    dropped with NO keeper protection. Batch ids are monotone, so
    ``id < batch_id`` is exactly "everything ingested before me".
    Returns ``None`` when no partial qualifies (first batch). The
    index rows carry no L; the caller owns the contract that every
    partial under one ``idx_store`` was built at ONE L (mixing Ls
    would fold apples into oranges silently — keep stores per-L).
    ``idx_store`` must be a plain OS path (local or locally mounted):
    partials are discovered with os-level glob, which is blind to
    hdfs://-style URIs — :func:`_require_local_path` raises on those
    instead of silently returning an empty history."""
    import glob as _g
    import os as _os

    _require_local_path(idx_store, "idx_store")

    from blackroad_feature_store_spark.operators.exactsubstr import (
        fold_exact_substr_index,
    )

    hist: DataFrame | None = None
    for p in sorted(
        _g.glob(_os.path.join(idx_store, "batch_id=*")),
        key=lambda s: int(s.rsplit("=", 1)[1]),
    ):
        pid = int(p.rsplit("=", 1)[1])
        if before_batch_id is not None and pid >= before_batch_id:
            continue
        part = spark.read.parquet(p)
        hist = part if hist is None else fold_exact_substr_index(hist, part)
    return hist


def _footer_col_max(path: str, col: str) -> int | None:
    """Max of ``col`` over every parquet file under ``path``, read from
    FOOTER column statistics only — metadata reads, no Spark job.
    LOCAL-FILESYSTEM ONLY: paths are resolved with ``glob``/pyarrow, so
    on HDFS/S3 this finds nothing and returns None (callers must treat
    None as "fast path unavailable", not "no history")."""
    import glob as _g
    import os as _os

    import pyarrow.parquet as _pq

    hi: int | None = None
    for f in _g.glob(_os.path.join(path, "*.parquet")):
        md = _pq.ParquetFile(f).metadata
        try:
            idx = md.schema.names.index(col)
        except ValueError:
            continue
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is not None and stats.has_min_max:
                m = stats.max
                hi = m if hi is None or m > hi else hi
    return hi


def _sidecar_dir(idx_store: str) -> str:
    # underscore prefix = Hadoop-hidden: a whole-store
    # spark.read.parquet(idx_store) and fold_exact_substr_partials'
    # batch_id=* glob both skip it, so the sidecar never pollutes a
    # fold; it is only read through this explicit path.
    return f"{idx_store}/_maxid"


def _require_local_path(path: str, what: str) -> None:
    """The per-batch partial stores are discovered with os-level
    ``glob`` (fold + gate + sidecar footers), so a scheme'd URI
    (hdfs://, s3a://, even file://) would glob NOTHING and silently
    behave like an empty store — history skipped, gate dark (ADVICE
    r14 low). Fail loudly instead: these helpers take plain OS paths
    (a locally mounted filesystem is fine)."""
    import re as _re

    if _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", path):
        raise ValueError(
            f"{what} must be a plain OS path (local or locally "
            f"mounted filesystem), got URI {path!r}: partial "
            "discovery uses os-level glob, which would silently see "
            "an empty store on a remote filesystem"
        )


def _history_max_ingested_id(
    idx_store: str, before_batch_id: int
) -> int | None:
    """The largest doc id EVER INGESTED into history partials with
    batch id < ``before_batch_id`` — the monotone-arrival gate bound.

    Keeper ids cannot provide this (ADVICE r14 low): a keeper is the
    per-window MINIMUM doc id, so the max keeper can sit well below
    the true max ingested id and an out-of-order batch landing in
    that gap would pass a keeper-based gate silently. Each batch
    therefore persists its true ``max(doc_id)`` in a one-row sidecar
    (``idx_store/_maxid/b=N``), and the gate reads those, in order:

    1. Sidecar parquet footers — metadata only, no Spark job.
    2. Per-batch keeper-id footer max for LEGACY partials that predate
       the sidecar (weaker: per-window minima — kept only so upgraded
       stores retain the old tripwire's strength for old batches).

    Local filesystem only, like the partial layout itself — enforced
    upstream by :func:`_require_local_path`."""
    import glob as _g
    import os as _os

    hi: int | None = None
    covered: set[int] = set()
    for p in _g.glob(_os.path.join(_sidecar_dir(idx_store), "b=*")):
        bid = int(p.rsplit("=", 1)[1])
        if bid >= before_batch_id:
            continue
        m = _footer_col_max(p, "max_ingested_id")
        if m is not None:
            covered.add(bid)
            hi = m if hi is None or m > hi else hi
    for p in _g.glob(_os.path.join(idx_store, "batch_id=*")):
        bid = int(p.rsplit("=", 1)[1])
        if bid >= before_batch_id or bid in covered:
            continue
        m = _footer_col_max(p, "keep_id")
        if m is not None:
            hi = m if hi is None or m > hi else hi
    return hi


def exact_substr_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    idx_store: str,
    out_store: str,
    L: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> None:
    """One ``foreachBatch`` step of ExactSubstr removal AT INGEST:
    rewrite the arriving batch against all history using only the
    maintained (hash-pair → count, keeper) index — history text is
    never re-read — then land the rewritten docs and the batch's
    delta index under deterministic per-batch partitions
    (``.../batch_id=N``), so a crashed-batch replay overwrites its
    own output instead of double-counting.

    Two in-batch contracts fail loudly (both ADVICE r13):

    * History folds ONLY partials with batch id < ``batch_id``
      (:func:`fold_exact_substr_partials`) — a replayed batch never
      sees its own delta as history.
    * Monotone-id arrival: every id in the batch must exceed every id
      EVER INGESTED by an earlier batch (the moment-of-ingest
      exactness precondition of ``exact_substr_batch_rewrite``). Each
      batch persists its true ``max(doc_id)`` in a one-row sidecar
      (``idx_store/_maxid/b=N``, overwrite — replay-idempotent like
      the delta itself), and the gate reads those back
      (:func:`_history_max_ingested_id`): keeper ids alone cannot
      carry the gate, because keepers are per-window MINIMA — a batch
      whose ids fall between the max keeper and the true max ingested
      id would pass a keeper-only check silently (ADVICE r14 low). A
      source that delivers batches out of id order (e.g.
      FileStreamSource breaking mtime ties arbitrarily) raises here
      instead of silently certifying a diverged rewrite.

    ``idx_store``/``out_store`` must be plain OS paths (local or
    locally mounted filesystem): partial discovery, the gate's footer
    reads, and the sidecar all go through os-level glob/pyarrow, which
    are blind to hdfs://-style URIs — a scheme'd path raises
    ``ValueError`` up front rather than silently treating history as
    empty (ADVICE r14 low).
    """
    from blackroad_feature_store_spark.operators.exactsubstr import (
        exact_substr_batch_rewrite,
        exact_substr_index,
    )

    _require_local_path(idx_store, "idx_store")
    _require_local_path(out_store, "out_store")
    sp = batch_df.sparkSession
    # One scalar agg gives both ends of the batch's id range: the min
    # feeds the arrival gate, the max becomes the batch's sidecar.
    lo, batch_max = batch_df.agg(
        F.min(id_col), F.max(id_col)
    ).first()
    hist = fold_exact_substr_partials(
        sp, idx_store, before_batch_id=int(batch_id)
    )
    if hist is None:
        hist = exact_substr_index(
            sp.createDataFrame([], f"{id_col} long, {text_col} string"),
            L=L,
            id_col=id_col,
            text_col=text_col,
        )
    else:
        # Monotone-id arrival check against the TRUE max ingested id
        # (sidecar footers — pure metadata on a local FS, Spark-side
        # fallback elsewhere; see _history_max_ingested_id). An agg
        # over `hist` is deliberately the last resort: it would
        # re-fold the whole history as a second action on the same
        # lineage, doubling the fold cost per batch.
        hi = _history_max_ingested_id(idx_store, int(batch_id))
        if hi is not None and lo is not None and lo <= hi:
            raise AssertionError(
                f"monotone-id arrival violated in batch {batch_id}: "
                f"batch min {id_col}={lo} <= max history ingested id "
                f"{hi} — the source delivered batches out of id "
                f"order, so moment-of-ingest semantics do not hold"
            )
    rewritten, delta = exact_substr_batch_rewrite(
        batch_df,
        hist,
        L=L,
        id_col=id_col,
        text_col=text_col,
        min_count=min_count,
    )
    rewritten.write.mode("overwrite").parquet(
        f"{out_store}/batch_id={int(batch_id)}"
    )
    delta.write.mode("overwrite").parquet(
        f"{idx_store}/batch_id={int(batch_id)}"
    )
    if batch_max is not None:
        # Sidecar LAST: it only ever describes a fully-landed delta
        # (foreachBatch commits the checkpoint after this returns, so
        # a crash anywhere above replays the whole batch and
        # overwrites all three writes deterministically). Written with
        # pyarrow, not a Spark job: the store is guaranteed local by
        # _require_local_path, and a one-row metadata write should not
        # cost a scheduler round-trip per micro-batch.
        import os as _os

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        d = f"{_sidecar_dir(idx_store)}/b={int(batch_id)}"
        _os.makedirs(d, exist_ok=True)
        _pq.write_table(
            _pa.table(
                {
                    "batch_id": _pa.array([int(batch_id)], _pa.int64()),
                    "max_ingested_id": _pa.array(
                        [int(batch_max)], _pa.int64()
                    ),
                }
            ),
            _os.path.join(d, "sidecar.parquet"),
        )
