"""Bucketed tables: pre-shuffled storage for co-located joins.

THE Spark-native answer to "this join shuffles 100 TB every night":
write both fact tables bucketed (hash-partitioned into a fixed number
of files) on the join key once, and every subsequent equi-join on that
key runs WITHOUT a shuffle on either side — the scan partitioning
satisfies the join's distribution requirement, so the plan is scan →
sort → SortMergeJoin with zero Exchange operators. Paying one shuffle
at write time amortizes it over every downstream join/aggregation on
the same key (the classic warehouse layout for orders ⋈ lineitem).

Buckets also bound memory: a join reads matching bucket pairs, never
whole tables, and ``sortBy`` within buckets lets the merge join stream.

Spark-first notes:

* Bucketing metadata lives in the session catalog (``saveAsTable``) —
  a plain ``.parquet(path)`` write cannot carry it. The tables here
  are EXTERNAL (explicit ``path``), so data lands where the caller
  says and dropping the table never deletes data.
* Both sides must agree on bucket count for a shuffle-free join
  (Spark can't yet coalesce mismatched counts without
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
* ``spark.sql.sources.bucketing.enabled`` is on by default; AQE keeps
  working (it just finds nothing to re-shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed parquet table.

    ``bucket_cols`` is the future join/aggregation key; ``sort_cols``
    (defaults to ``bucket_cols``) pre-sorts within each bucket so merge
    joins skip their sort. One shuffle happens HERE, on purpose —
    it's the last one this key needs.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    # The shuffle the docstring promises: cluster rows by the bucket
    # key into exactly num_buckets partitions BEFORE the write. A
    # bucketBy write alone never shuffles — each input task splits its
    # own rows into per-bucket files, so (a) a single-partition input
    # serializes the whole sort+write into one task (r16: the 600k-row
    # lineitem write ran single-task) and (b) a wide input writes
    # tasks x buckets files, which breaks the one-file-per-bucket
    # condition Spark needs to trust sortBy and stream the merge join.
    # After the repartition: num_buckets parallel writers, exactly one
    # sorted file per bucket at any scale. One-file-per-bucket relies
    # on repartition's HashPartitioning using the same Murmur3 hash as
    # Spark's bucket-id assignment (HashPartitioning.partitionIdExpression
    # = pmod(murmur3, n) — true across all current Spark releases and
    # asserted post-write by the catalog's in-query shuffle-free-join
    # certification, which would see a multi-file bucket as a
    # reintroduced exchange; ADVICE r16). An input already
    # hash-partitioned by the bucket key pays this shuffle again —
    # accepted: Catalyst's outputPartitioning is not visible here, and
    # a redundant repartition of key-clustered rows is cheap next to a
    # silently serialized single-task bucketed write.
    df = df.repartition(num_buckets, *bucket_cols)
    w = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucketing metadata (a direct
    ``spark.read.parquet`` on the same files would lose it and
    reintroduce the shuffle)."""
    return spark.table(table)


def is_shuffle_free_join(joined: DataFrame) -> bool:
    """True when the physical plan contains a join but no shuffle
    exchange — the co-location certificate (used by tests; cheap
    enough to assert in production jobs too)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Join" in plan and "ShuffleExchange" not in plan and (
        "Exchange hashpartitioning" not in plan
    )
