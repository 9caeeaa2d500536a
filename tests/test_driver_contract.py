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


def test_no_bare_asserts_in_catalog_module():
    """ADVICE r15: runtime certifications in the query catalog (e.g.
    the compacted-path "compaction engaged" gate) must be explicit
    raises, not ``assert`` statements — asserts compile out under
    ``python -O`` and the certification would silently pass. Pin the
    whole module assert-free so the class of defect cannot return."""
    import ast
    import inspect

    from blackroad_feature_store_spark.plans import driver_queries

    tree = ast.parse(inspect.getsource(driver_queries))
    offenders = [
        node.lineno for node in ast.walk(tree) if isinstance(node, ast.Assert)
    ]
    assert not offenders, (
        f"bare assert statements in driver_queries.py at lines "
        f"{offenders}; use explicit raises (survive python -O)"
    )


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
    # 3 snapshots: a lone bursty window is ABSORBED (the median is
    # corroborated by the other two — r15: the burst never entered
    # the ratio arithmetic, so the run is a valid close artifact)
    assert not bench.calibration_is_unstable(
        {"spark_fixed": 1.53, "stream_fixed": 0.28},
        {"spark_fixed": 1.52, "stream_fixed": 0.25},
        {"spark_fixed": 2.17, "stream_fixed": 0.29},
    )
    # 3 snapshots: monotone drift leaves the median uncorroborated
    assert bench.calibration_is_unstable(
        {"spark_fixed": 1.2},
        {"spark_fixed": 1.6},
        {"spark_fixed": 2.1},
    )
    # 3 snapshots: a lone stream-probe outlier is absorbed too, but
    # stream drift with an uncorroborated median still gates
    assert bench.calibration_is_unstable(
        {"spark_fixed": 1.5, "stream_fixed": 0.20},
        {"spark_fixed": 1.5, "stream_fixed": 0.30},
        {"spark_fixed": 1.5, "stream_fixed": 0.45},
    )


def _load_bench():
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def test_bench_rep_policy_floors_multi_second_queries():
    """VERDICT r14 ask #3 pin: no single-sample multi-second row can
    appear in BENCH_FULL.json — the driver's r14 run certified a
    17.36 s reading for pipeline_split_leakage from ONE sample taken
    mid-throttle. Any first sample >= 1 s must yield at least 3 total
    samples regardless of the SPARK_GRAFT_REPS knob; retry-on-outlier
    keeps sampling (bounded) while the best sample exceeds 2x the
    machine-adjusted pin."""
    bench = _load_bench()
    # >= 1 s: floored at 2 extra (3 total) even when reps is lowered
    for t in (1.0, 2.5, 8.0, 17.36):
        for reps in (1, 2, 3):
            assert bench.plan_extra_samples(t, reps) >= 2, (t, reps)
    # env knob can still RAISE the count
    assert bench.plan_extra_samples(5.0, 5) == 4
    # sub-second queries follow the knob
    assert bench.plan_extra_samples(0.4, 3) == 2
    assert bench.plan_extra_samples(0.4, 1) == 0
    # retry-on-outlier: best sample past 2x pin -> resample, bounded
    assert bench.outlier_needs_resample([17.36, 16.0, 15.2], 1.0)
    assert not bench.outlier_needs_resample([17.36, 1.1, 15.2], 1.0)
    assert not bench.outlier_needs_resample(
        [9.0] * bench.MAX_SAMPLES, 1.0
    )  # budget exhausted: certify what we saw
    assert not bench.outlier_needs_resample([3.0], None)  # unpinned


def test_bench_artifact_has_no_single_sample_multi_second_rows():
    """The committed BENCH_FULL.json itself proves the rep policy: for
    rep_policy >= 2 artifacts, every query timed at >= 1 s carries at
    least 3 samples in query_samples."""
    import json as _json

    path = os.path.join(
        os.path.dirname(__file__), "..", "BENCH_FULL.json"
    )
    if not os.path.exists(path):
        pytest.skip("no committed bench artifact")
    with open(path) as f:
        art = _json.load(f)
    if art.get("rep_policy", 1) < 2:
        pytest.skip("artifact predates rep_policy=2")
    offenders = {
        n: ss
        for n, ss in art.get("query_samples", {}).items()
        if art["queries"].get(n, 0) >= 1.0 and len(ss) < 3
    }
    assert not offenders, offenders


def test_bench_stateful_probe_is_measure_only():
    """Round-16 pin: the stateful-drain probe is RECORDED in the
    artifact (snapshots + median, for the r17 multi-run pin decision)
    but participates in no ratio arithmetic — it must not appear in
    calibration_used (the factor source), in lane_factors, or in
    CAL_REF.json (the r11 stream_fixed backfill, corrected r16, is
    the cautionary tale for a self-pinned reference)."""
    import json as _json

    root = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(root, "BENCH_FULL.json")
    if not os.path.exists(path):
        pytest.skip("no committed bench artifact")
    with open(path) as f:
        art = _json.load(f)
    if "stateful_fixed" not in art:
        pytest.skip("artifact predates the stateful probe")
    sf = art["stateful_fixed"]
    assert sf["snapshots"] and sf["median"] > 0
    assert "stateful_fixed" not in art.get("calibration_used", {})
    assert "stateful" not in art.get("lane_factors", {})
    with open(os.path.join(root, "CAL_REF.json")) as f:
        assert "stateful_fixed" not in _json.load(f)


def test_bench_probe_median_is_robust_to_one_bursty_window():
    """VERDICT r14 ask #1 pin: the factor estimator is the per-probe
    MEDIAN of the interleaved start/mid/end snapshots, so one bursty
    probe window (the r13/r14 failure mode) cannot skew the ratios."""
    bench = _load_bench()
    med = bench.probe_median(
        {"spark_fixed": 1.5, "stream_fixed": 3.0},
        {"spark_fixed": 3.2, "stream_fixed": 3.1},  # burst window
        {"spark_fixed": 1.6, "stream_fixed": 2.9},
    )
    assert med["spark_fixed"] == 1.6
    assert med["stream_fixed"] == 3.0
    # zero/missing probes are excluded, not treated as readings
    med2 = bench.probe_median(
        {"spark_fixed": 1.5}, {"spark_fixed": 0.0}, {"spark_fixed": 1.7}
    )
    assert med2["spark_fixed"] == 1.6


def test_bench_lane_tags_and_lane_probe_division():
    """VERDICT r15 ask #9 pin: every query gets a lane tag, each lane's
    vs_pin factor divides by its OWN probe (pandas -> cpu_spin,
    stream -> stream_fixed, jvm/iterative -> spark_fixed), and the
    curated pandas set names only real Arrow-kernel queries."""
    import bench

    assert bench.lane_of("stream_exec_expectations") == "stream"
    assert bench.lane_of("stream_windowed_counts") == "stream"
    assert bench.lane_of("mm_image_features") == "pandas"
    assert bench.lane_of("pipeline_normalize_text") == "pandas"
    assert bench.lane_of("graph_pagerank_trade") == "iterative"
    assert bench.lane_of("tpch_q1_pricing") == "jvm"
    assert bench._LANE_PROBE[bench.lane_of("mm_image_features")] == "cpu_spin"
    assert (
        bench._LANE_PROBE[bench.lane_of("stream_exec_dedup")]
        == "stream_fixed"
    )
    # every curated lane name exists in the catalog (no typo rot)
    for n in bench._PANDAS_LANE | bench._ITERATIVE_LANE:
        assert n in entrymod.queries(), n
    # the committed close artifact, once regenerated, must carry the
    # tags; a pre-r16 artifact is allowed until then
    import json as _json
    import os as _os

    art = _os.path.join(_os.path.dirname(bench.__file__), "BENCH_FULL.json")
    if _os.path.exists(art):
        with open(art) as f:
            data = _json.load(f)
        if "lanes" in data:
            assert set(data["lanes"].values()) <= {
                "jvm",
                "pandas",
                "stream",
                "iterative",
            }
            assert set(data.get("lane_factors", {})) == {
                "jvm",
                "pandas",
                "stream",
                "iterative",
            }


def test_bench_cpu_spin_probed_in_every_snapshot():
    """The pandas lane divides by the cpu_spin MEDIAN, so cpu_spin
    must be re-probed mid/end like the other probes (a start-only
    reading is defeated by this host's turbo cycling), and it must
    gate calibration_unstable."""
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    reprobe = src[src.index("def _reprobe") : src.index("for i, name")]
    assert "cpu_spin" in reprobe
    src_unstable = inspect.getsource(bench.calibration_is_unstable)
    assert '"cpu_spin"' in src_unstable
