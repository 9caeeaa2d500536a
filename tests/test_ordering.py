"""Pins for operators/ordering.py: the distributed global index equals
the single-sort rank, is stable across partitionings (the range
boundaries are sampled — the OUTPUT must not move), and epoch seeds
permute reproducibly."""

from pyspark.sql import functions as F

from blackroad_feature_store_spark.operators.ordering import (
    epoch_shuffle,
    global_prefix_sum,
    global_sort_index,
)


def _df(spark, n, parts=1):
    return spark.range(n).select(
        F.col("id").alias("doc_id")
    ).repartition(parts)


def test_global_index_equals_single_sort_rank(spark):
    df = _df(spark, 997, parts=5).withColumn(
        "k", F.md5(F.col("doc_id").cast("string"))
    )
    got = {
        r.doc_id: r.pos
        for r in global_sort_index(
            df, ["k", "doc_id"], num_partitions=7
        ).collect()
    }
    want = {
        r.doc_id: i + 1
        for i, r in enumerate(
            df.orderBy("k", "doc_id").select("doc_id").collect()
        )
    }
    assert got == want


def test_index_stable_across_partition_counts(spark):
    df = _df(spark, 400, parts=3).withColumn(
        "k", F.md5(F.col("doc_id").cast("string"))
    )
    a = {
        r.doc_id: r.pos
        for r in global_sort_index(df, ["k"], num_partitions=2).collect()
    }
    b = {
        r.doc_id: r.pos
        for r in global_sort_index(df, ["k"], num_partitions=13).collect()
    }
    assert a == b


def test_prefix_sum_equals_single_sort_cumsum(spark):
    df = _df(spark, 500, parts=4).withColumn(
        "k", F.md5(F.col("doc_id").cast("string"))
    ).withColumn("v", (F.col("doc_id") % 17 + 1).cast("long"))
    got = {
        r.doc_id: r.cum
        for r in global_prefix_sum(
            df, ["k", "doc_id"], "v", num_partitions=9
        ).collect()
    }
    want, running = {}, 0
    for r in df.orderBy("k", "doc_id").collect():
        running += r.v
        want[r.doc_id] = running
    assert got == want


def test_prefix_sum_desc_order_and_partition_stability(spark):
    df = _df(spark, 300, parts=5).withColumn(
        "q", (F.col("doc_id") % 11).cast("double")
    ).withColumn("v", F.lit(3).cast("long"))
    order = [F.col("q").desc(), F.col("doc_id")]
    a = {
        r.doc_id: r.cum
        for r in global_prefix_sum(df, order, "v", num_partitions=2).collect()
    }
    b = {
        r.doc_id: r.cum
        for r in global_prefix_sum(df, order, "v", num_partitions=11).collect()
    }
    assert a == b
    # constant weights: cum of the global rank-1 row is exactly 3,
    # and the max equals 3*N
    assert min(a.values()) == 3 and max(a.values()) == 900


def test_epoch_shuffle_is_permutation_and_seeded(spark):
    df = _df(spark, 300, parts=4)
    e1 = {r.doc_id: r.epoch_pos for r in epoch_shuffle(df, epoch=1).collect()}
    e1b = {r.doc_id: r.epoch_pos for r in epoch_shuffle(df, epoch=1).collect()}
    e2 = {r.doc_id: r.epoch_pos for r in epoch_shuffle(df, epoch=2).collect()}
    assert sorted(e1.values()) == list(range(1, 301))  # dense 1..N
    assert e1 == e1b  # same seed -> identical order, re-run
    assert e1 != e2  # different epoch -> different order
    assert sorted(e2.values()) == list(range(1, 301))


def test_prefix_sum_rejects_non_integral_values(spark):
    # ADVICE r11: sum-then-cast (driver offsets) and cast-then-sum
    # (within-partition running totals) disagree on floats — the
    # integer-only contract is now enforced, not just documented.
    import pytest

    df = _df(spark, 10).withColumn(
        "v", F.col("doc_id").cast("double") / 2
    )
    with pytest.raises(ValueError, match="integral"):
        global_prefix_sum(df, ["doc_id"], "v")
