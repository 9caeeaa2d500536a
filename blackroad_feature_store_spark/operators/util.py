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

    Measure before applying (PLANS_r02.md): it pays only when per-row
    compute dominates — for the regex-heavy text profile it cut 35% at
    sf0.1; for cheap-per-row exploded aggregations (minhash, simhash)
    and mapInPandas kernels the shuffle + Python-worker fan-out
    overhead made it SLOWER, so those stay on the scan partitioning.

    ``num_partitions`` defaults to the cluster's default parallelism
    (total cores), which is also the sane choice on a real cluster.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if key_cols:
        return df.repartition(n, *key_cols)
    return df.repartition(n)
