"""Deterministic global ordering: seeded training-order shuffle and a
scale-correct global sort index.

The reference engine has no ordering surface; this covers the last
step of a training-data pipeline — fixing the epoch order of a corpus
reproducibly (same seed = same order on any cluster, any partitioning)
without a single-reducer global window.

Scale design
------------
``global_sort_index`` never funnels the corpus through one partition:

1. range-repartition on the order key (distributed sort),
2. per-partition counts -> driver-side prefix offsets (one tiny
   collect, bounded by the partition count),
3. within-partition ``row_number`` + broadcast offset join.

The range boundaries Spark samples are nondeterministic, but the
OUTPUT is not: with unique keys, within-partition rank plus the count
of rows in earlier ranges equals the global rank wherever the
boundaries land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["global_sort_index", "global_prefix_sum", "epoch_shuffle"]


def global_sort_index(
    df: DataFrame,
    order_cols: list[str],
    *,
    index_col: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global rank over ``order_cols`` (which must be
    duplicate-free as a tuple) without a global single-partition
    window. Costs one range shuffle + one tiny count job + one
    pid-local window."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint pins ONE materialized partitioning: the range
    # partitioner SAMPLES its boundaries, so without it the counts job
    # and the downstream consumer could each re-execute the shuffle
    # with different boundaries and the offsets would not correspond
    # to the pids the window sees.
    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = ranged.groupBy("__pid").count().collect()
    offsets, running = {}, 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = running
        running += row["count"]
    off = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "__pid int, __off bigint",
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(off), "__pid")
        .withColumn(
            index_col, (F.col("__off") + F.col("__rn")).cast("long")
        )
        .drop("__pid", "__rn", "__off")
    )


def global_prefix_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    *,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running total of ``value_col`` in global ``order_cols`` order
    (ties must be broken by the tuple), without a single-reducer
    window: range-repartition on the order, per-partition value SUMS
    -> driver prefix offsets (tiny collect), within-partition window
    cumsum + broadcast offset. ``order_cols`` may contain column
    names or Column expressions (e.g. ``F.col("q").desc()``).
    ``value_col`` must be an INTEGRAL column (raises otherwise): the
    offsets trick needs an order-independent sum, and a silently
    cast float column would make the driver offsets (sum-then-cast)
    disagree with the within-partition running totals
    (cast-then-sum) — internally inconsistent output, not merely
    truncated. Quantize floats to fixed point upstream."""
    vtype = dict(df.dtypes).get(value_col)
    if vtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"global_prefix_sum: value_col {value_col!r} must be an "
            f"integral column (got {vtype!r}) — quantize floats to "
            "fixed-point integers first; the offset fold is only "
            "order-independent for exact integer sums"
        )
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()  # pin ONE sampled boundary set (see above)
    )
    psums = ranged.groupBy("__pid").agg(
        F.sum(value_col).cast("long").alias("__s")
    ).collect()
    offsets, running = {}, 0
    for row in sorted(psums, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = running
        running += row["__s"] or 0
    off = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "__pid int, __off bigint",
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn(
            "__run", F.sum(F.col(value_col).cast("long")).over(w)
        )
        .join(F.broadcast(off), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__run")).cast("long"))
        .drop("__pid", "__run", "__off")
    )


def epoch_shuffle(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    epoch: str | int = 1,
    index_col: str = "epoch_pos",
) -> DataFrame:
    """Seeded global shuffle for training order: rank by
    ``md5(id || ':' || epoch)`` (id tie-break), reproducible across
    runs, clusters and partitionings. Returns (id_col, index_col).
    ``id_col`` must be unique — duplicate ids produce duplicate order
    tuples and the within-partition row_number between them is then
    arbitrary (the global_sort_index contract)."""
    keyed = df.select(
        F.col(id_col),
        F.md5(
            F.concat(
                F.col(id_col).cast("string"), F.lit(f":{epoch}")
            )
        ).alias("__k"),
    )
    return global_sort_index(
        keyed, ["__k", id_col], index_col=index_col
    ).select(id_col, index_col)
