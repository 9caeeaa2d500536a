"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *key_cols: str, num_partitions: int | None = None) -> DataFrame:
    """Hash-repartition compact rows BEFORE a compute-heavy narrow
    projection.

    Why: a small parquet file is one scan partition (row groups don't
    split), so a per-row-expensive stage (regex profiling, decode
    kernels) inherits single-task parallelism no matter how many cores
    exist. Keying the repartition on the downstream aggregation key
    lets Catalyst reuse the partitioning — a following groupBy(key)
    needs no second exchange.

    Measure before applying: it pays only when per-row compute
    dominates. The regex-heavy text profile cut 35% at sf0.1
    (PLANS_r02.md); the r7 re-measurement moved the minhash signature
    pass and the span-operator gram generation onto it too (2.9s →
    1.1s and 4.1s → 2.5s at sf0.1 — the r2 finding that spread hurt
    those paths predated the shared-key partition reuse in their
    groupBys). mapInPandas decode kernels still measure slower with
    it — the Python-worker fan-out dominates — so those stay on the
    scan partitioning.

    ``num_partitions`` defaults to the cluster's default parallelism
    (total cores). When the input ALREADY has at least that many
    partitions — the normal case for a genuinely large scan — the
    repartition is skipped entirely: coalescing a wide scan down to
    ~#cores partitions would shuffle the full document text for
    nothing and concentrate data into fewer, bigger partitions. The
    guard makes spread() a no-op at scale and a fan-out only for the
    small-file case it exists for.

    CONTRACT NOTE (the guard's trade): when the skip fires, the output
    is NOT hash-partitioned by ``key_cols`` — keyed partitioning is
    best-effort, so a downstream ``groupBy(key)`` pays its own
    exchange in the wide-input case. That is the intended outcome: at
    that scale the scan parallelism already saturates the cluster and
    one aggregation exchange of the (post-projection, compact) rows is
    strictly cheaper than pre-shuffling full document text. Callers
    that need a HARD partitioning guarantee should call
    ``df.repartition(n, *keys)`` directly. The partition-count probe
    is a plan→RDD translation only (no job, no data touched); passing
    ``num_partitions`` explicitly bypasses it.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if num_partitions is None and df.rdd.getNumPartitions() >= n:
        return df
    if key_cols:
        return df.repartition(n, *key_cols)
    return df.repartition(n)


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    key_col: str = "__zkey",
) -> DataFrame:
    """Attach a Z-order (Morton) clustering key over ``cols`` — the
    multi-column layout optimization behind Delta's ``OPTIMIZE ...
    ZORDER BY``: range-partitioning on the interleaved key gives every
    output file locality in EVERY listed column at once, so per-file
    min/max stats and bloom indexes stay selective for predicates on
    any of them. (Lexicographic ``cluster_by`` clustering is perfect
    for the first column and useless for the rest; Z-order trades a
    little per-column locality for locality in all dimensions.)

    Mechanics (all JVM column algebra, no UDFs):

    1. each column is mapped to a rank proxy — numerics/timestamps
       cast to double (ORDER-preserving, so range predicates skip),
       strings/other via ``xxhash64`` (EQUALITY-clustering: equal keys
       co-locate for bloom/point-lookup pruning; string range
       predicates don't benefit);
    2. per-column quantile boundaries (``approxQuantile``, ``2^bits``
       buckets, driver-side and tiny) feed an MLlib ``Bucketizer`` —
       a balanced histogram even under skew, since boundaries are
       quantiles, not value ranges;
    3. bucket ids are bit-interleaved into one long. ``bits * 
       len(cols)`` must stay ≤ 63 (8 bits × up to 7 columns).

    The sampling pass costs one extra scan of ``cols`` only; the key
    column is meant for ``repartitionByRange(key)`` +
    ``sortWithinPartitions(key)`` and then dropped before writing.
    """
    from pyspark.ml.feature import Bucketizer
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DateType,
        NumericType,
        TimestampNTZType,
        TimestampType,
    )

    if bits * len(cols) > 63:
        raise ValueError(
            f"zorder key needs bits*len(cols) <= 63, got {bits}*{len(cols)}"
        )
    nb = 1 << bits
    proxies: list[str] = []
    tmp = df
    for i, c in enumerate(cols):
        dt = tmp.schema[c].dataType
        p = f"__z_proxy_{i}"
        if isinstance(dt, NumericType):
            tmp = tmp.withColumn(p, F.col(c).cast("double"))
        elif isinstance(dt, (TimestampType, TimestampNTZType, DateType)):
            tmp = tmp.withColumn(
                p, F.col(c).cast("timestamp").cast("double")
            )
        else:
            tmp = tmp.withColumn(p, F.xxhash64(F.col(c)).cast("double"))
        proxies.append(p)
    probs = [i / nb for i in range(1, nb)]
    quantiles = tmp.stat.approxQuantile(proxies, probs, 1.0 / (4 * nb))
    splits_arr, bucket_cols = [], []
    for i, qs in enumerate(quantiles):
        uniq = sorted(set(qs))
        splits_arr.append([float("-inf")] + uniq + [float("inf")])
        bucket_cols.append(f"__z_bucket_{i}")
    buck = Bucketizer(
        splitsArray=splits_arr,
        inputCols=proxies,
        outputCols=bucket_cols,
        handleInvalid="keep",
    )
    tmp = buck.transform(tmp)
    k = len(cols)
    z = F.lit(0).cast("long")
    for i, bc in enumerate(bucket_cols):
        # handleInvalid="keep" can emit bucket == nb for nulls; clamp
        # so the interleave never sets a bit outside [0, bits).
        b = F.least(F.col(bc).cast("long"), F.lit(nb - 1))
        for bit in range(bits):
            z = z + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * k + i
            )
    return tmp.withColumn(key_col, z).drop(*proxies, *bucket_cols)
