"""Guards the driver contract in CI: entry() smoke + a fast subset of
the query catalog compared against its DuckDB oracle at sf0.001 (the
full sweep at sf0.01 is tests/oracle_harness.py / the driver's t2)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from blackroad_feature_store_spark.sources.testdata import TABLES
from tests.oracle_harness import compare

from blackroad_feature_store_spark.sources.testdata import sf_dir as _sf_dir

SF_DIR = _sf_dir("sf0.001")

# Fast, structurally diverse subset (full catalog runs in the driver).
SUBSET = [
    "core_pit_join",
    "core_asof_top1",
    "core_group_stats",
    "core_router_triggers",
    "tpch_q1_pricing",
    "dedup_exact",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_stats_by_source",
    "mm_image_features",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns  # stable schema


def test_every_query_has_an_oracle_or_is_declared():
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(queries)
    assert len(queries) >= 30


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    problems = compare(name, df, duck, entrymod.oracle_sql()[name])
    assert not problems, problems


def test_bench_calibration_unstable_gates_on_both_probes():
    """ADVICE r13 (low) pin: stream_fixed drift alone must flag the
    run — a contention burst confined to the streaming probe window
    skews every stream-query vs_pin ratio without moving spark_fixed."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    stable = {"spark_fixed": 1.5, "stream_fixed": 3.0}
    assert not bench.calibration_is_unstable(
        stable, {"spark_fixed": 1.6, "stream_fixed": 3.1}
    )
    # spark drift alone
    assert bench.calibration_is_unstable(
        stable, {"spark_fixed": 3.0, "stream_fixed": 3.0}
    )
    # stream drift alone — the case the r13 flag missed
    assert bench.calibration_is_unstable(
        stable, {"spark_fixed": 1.5, "stream_fixed": 6.0}
    )
    assert bench.calibration_is_unstable(
        stable, {"spark_fixed": 1.5, "stream_fixed": 2.0}
    )
    # missing/zero probes contribute nothing
    assert not bench.calibration_is_unstable(
        {"spark_fixed": 1.5}, {"spark_fixed": 1.5}
    )
