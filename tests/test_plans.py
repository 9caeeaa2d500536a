"""Plan-shape regression tests — pin the physical-plan properties the
100 TB design depends on (pushdown, pruning, broadcast, bucketing), so
a refactor that silently loses one fails CI, not the cluster.
"""

import re

import pytest
from pyspark.sql import functions as F

from blackroad_feature_store_spark.plans import driver_queries as dq

SF = "/root/testdata/sf0.001"


def formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = formatted_plan(dq.core_scan_filter_project(spark, SF))
    # the part-type filter must reach the parquet reader, not sit in a
    # post-scan Filter only
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan


def test_column_pruning_reaches_scan(spark):
    plan = formatted_plan(dq.core_scan_filter_project(spark, SF))
    # ReadSchema must be narrowed to the projected columns — p_retailprice
    # (present in part.parquet) must NOT be read
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and all("p_retailprice" not in ln for ln in read)


def test_small_dims_broadcast(spark):
    plan = formatted_plan(dq.tpch_q5_local_supplier(spark, SF))
    assert "BroadcastHashJoin" in plan  # region/nation never shuffle


def test_asof_top1_uses_window_group_limit(spark):
    # Spark 4 plans top-1-per-key with WindowGroupLimit (map-side top-1
    # before the exchange) — losing it would shuffle every record
    plan = formatted_plan(dq.core_asof_top1(spark, SF))
    assert "WindowGroupLimit" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # Co-located join: both sides bucketed by the join key into the
    # same bucket count — the sort-merge join must read buckets
    # directly with NO Exchange on either side. This is the 100 TB
    # fact-to-fact join strategy (pre-bucket once, join many times).
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .saveAsTable("b_orders")
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .saveAsTable("b_lineitem")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"), "o_orderkey"
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # buckets align: zero shuffle
        # and it actually computes the right thing
        n = joined.count()
        assert n == li.count()  # every lineitem matches its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_group_stats_single_aggregation(spark):
    # statistics() must stay ONE partial+final hash aggregation — a
    # second Exchange would mean a second scan/shuffle crept in
    plan = formatted_plan(dq.core_group_stats(spark, SF))
    assert plan.count("Exchange") <= 2  # 1 shuffle (+1 AQE read marker)


def test_chunks_plan_has_no_exchange(spark):
    # Chunking is a narrow projection + explode: any Exchange appearing
    # here means a refactor added an accidental shuffle.
    plan = formatted_plan(dq.pipeline_chunks(spark, SF))
    assert "Exchange" not in plan


def test_pack_sequences_single_shuffle(spark):
    # One exchange total: the per-source window partition. The grouped
    # agg on (source, bin_id) reuses that partitioning only if the
    # planner sees it — but it must never exceed two.
    plan = formatted_plan(dq.pipeline_pack_sequences(spark, SF))
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
    assert n_exchanges <= 2, plan


def test_decontaminate_corpus_never_shuffle_joins(spark):
    # Both joins against the corpus must be broadcast: a
    # SortMergeJoin/ShuffledHashJoin here means the benchmark or hit
    # set stopped broadcasting and the corpus pays a shuffle.
    plan = formatted_plan(dq.pipeline_decontaminate(spark, SF))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_q10_orders_never_force_broadcast(spark):
    # orders is a date-filtered FACT table: small at test SF, multi-GB
    # at cluster scale. A forced broadcast() on it OOMs at 100× — the
    # only explicit hints allowed are the two dim-side ones (nation,
    # cust×nation); lineitem×orders must be left to AQE.
    analyzed = (
        dq.tpch_q10_returns(spark, SF)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert analyzed.count("ResolvedHint") == 2, analyzed


def test_current_ts_shape_survives_non_utc_driver_tz(spark):
    # The epoch bound is computed driver-side in Python; a naive
    # datetime's .timestamp() is interpreted as LOCAL time, so under a
    # non-UTC TZ the bound would shift by the zone offset and the row
    # would vanish. Pin: 1 row regardless of the driver's zone.
    import os
    import time

    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"  # UTC-4/-5: beyond the 1h bound
    time.tzset()
    try:
        assert dq.core_current_ts_shape(spark, SF).count() == 1
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()


def test_json_props_parse_stays_in_scan_stage(spark):
    # get_json_object must be a projection expression feeding a partial
    # aggregate — no separate shuffle before the parse.
    plan = formatted_plan(dq.core_json_props(spark, SF))
    assert "get_json_object" in plan
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
    assert n_exchanges == 1, plan  # only the groupBy(event_type) shuffle
