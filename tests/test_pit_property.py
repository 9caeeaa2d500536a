"""Property-style point-in-time checks (SURVEY.md §5.2c): random
snapshot histories, assert the engine's as-of results equal a
brute-force Python scan over the same history."""

import random

import pytest

from blackroad_feature_store_spark import FeatureStore
from blackroad_feature_store_spark.store import EntityRecord


def brute_force_asof(history, entity_id, as_of):
    """Latest snapshot dict with ts <= as_of, ties broken by record id
    (the engine's documented tiebreak)."""
    cands = [
        r for r in history
        if r["entity_id"] == entity_id and r["ts"] <= as_of
    ]
    if not cands:
        return None
    best = max(cands, key=lambda r: (r["ts"], r["rid"]))
    return best["values"]


@pytest.fixture(scope="module")
def random_store(spark, tmp_path_factory):
    rng = random.Random(20260813)
    base = str(tmp_path_factory.mktemp("pitprop") / "fs")
    fs = FeatureStore(spark, base)
    for name in ["a", "b", "c"]:
        fs.register_feature(name, "user", "int")
    g = fs.create_group("rand_g", ["a", "b", "c"], "user_id")

    history = []
    recs = []
    for i in range(300):
        entity = f"u{rng.randrange(12)}"
        # coarse timestamps on purpose: plenty of exact-ts ties
        ts = (
            f"2026-{rng.randrange(1, 13):02d}-"
            f"{rng.randrange(1, 28):02d}T{rng.choice([0, 12]):02d}:00:00"
        )
        values = {
            k: rng.randrange(100)
            for k in rng.sample(["a", "b", "c"], rng.randrange(1, 4))
        }
        rec = EntityRecord(
            group_id=g.id, entity_id=entity,
            feature_values=values, timestamp=ts,
        )
        recs.append(rec)
        history.append(
            {"entity_id": entity, "ts": ts, "rid": rec.id, "values": values}
        )
    fs.write_features_batch(recs)
    return fs, g, history


@pytest.mark.parametrize(
    "as_of",
    ["2026-03-15T00:00:00", "2026-06-01T12:00:00", "2026-12-31T23:59:59",
     "2025-12-31T00:00:00"],
)
def test_asof_reads_match_brute_force(random_store, as_of):
    fs, g, history = random_store
    for entity in [f"u{i}" for i in range(12)]:
        expected = brute_force_asof(history, entity, as_of)
        got = fs.get_features(g.id, entity, as_of=as_of)
        assert got == expected, (entity, as_of)


def test_pit_join_matches_brute_force(random_store):
    fs, g, history = random_store
    as_of = "2026-07-01T00:00:00"
    entities = [f"u{i}" for i in range(12)] + ["missing"]
    rows = fs.point_in_time_join(entities, [g.id], as_of)
    assert [r["entity_id"] for r in rows] == entities  # input order
    for row in rows:
        expected = brute_force_asof(history, row["entity_id"], as_of)
        if expected is None:
            # miss → every declared feature null-filled
            assert row == {
                "entity_id": row["entity_id"], "a": None, "b": None, "c": None
            }
        else:
            # hit → the snapshot verbatim (snapshot-wins); declared
            # features the snapshot omits stay ABSENT, exactly like the
            # reference's `if values: row.update(values)` path
            assert row == {"entity_id": row["entity_id"], **expected}


def test_statistics_match_brute_force(random_store):
    fs, g, history = random_store
    st = fs.statistics(g.id)
    assert st["total_records"] == len(history)
    for feat in ["a", "b", "c"]:
        vals = [r["values"][feat] for r in history if feat in r["values"]]
        s = st["features"][feat]
        assert s["count"] == len(vals)
        assert s["null_count"] == len(history) - len(vals)
        assert s["min"] == min(vals)
        assert s["max"] == max(vals)
        assert s["mean"] == round(sum(vals) / len(vals), 6)


def test_as_of_join_pandas_matches_window_form_randomized(spark):
    """The merge_asof execution strategy must produce row-identical
    results to the range-join+window form on random per-row-cutoff
    workloads, including timestamp ties (max-id wins), entities with
    no records, and tolerance bounds. Deterministic seeds."""
    import random
    from datetime import datetime, timedelta

    from blackroad_feature_store_spark.operators.asof import (
        as_of_join,
        as_of_join_pandas,
    )

    for seed, tol in ((5, None), (12, "36 hours")):
        rng = random.Random(seed)
        t0 = datetime(2026, 1, 1)
        recs = []
        rid = 0
        for e in range(8):
            for _ in range(rng.randint(0, 10)):
                recs.append(
                    (
                        f"r{rid:03d}",
                        f"e{e}",
                        rng.randint(0, 99),
                        t0 + timedelta(hours=rng.randint(0, 240)),
                    )
                )
                rid += 1
        # force timestamp ties on one entity: the max id must win
        recs.append(("r900", "e0", 111, t0 + timedelta(hours=5)))
        recs.append(("r901", "e0", 222, t0 + timedelta(hours=5)))
        records = spark.createDataFrame(
            recs, "id string, entity string, val int, timestamp timestamp"
        )
        spine = spark.createDataFrame(
            [
                (f"e{e}", t0 + timedelta(hours=rng.randint(0, 240)))
                for e in range(10)  # e8/e9 have no records at all
                for _ in range(3)
            ],
            "entity string, cutoff timestamp",
        )
        tol_kw = {"tolerance": tol} if tol else {}
        a = as_of_join(
            spine, records, on="entity", ts_col="timestamp",
            as_of="cutoff", **tol_kw,
        ).select("entity", "cutoff", "id", "val", "timestamp")
        b = as_of_join_pandas(
            spine, records, on="entity", as_of_col="cutoff",
            ts_col="timestamp", **tol_kw,
        ).select("entity", "cutoff", "id", "val", "timestamp")
        ka = sorted(map(tuple, a.collect()))
        kb = sorted(map(tuple, b.collect()))
        assert ka == kb, f"seed {seed} tol {tol}"


def test_asof_pandas_null_key_parity(spark):
    """NULL join keys never match in either execution form (SQL
    equality semantics). The window form gets this from its equality
    range-join; the pandas form must drop NULL-key records before the
    merge because merge_asof(by=) WOULD pair None/NaN keys. Both forms
    must agree: NULL-key spine rows survive with NULL payload."""
    from datetime import datetime

    from blackroad_feature_store_spark.operators.asof import (
        as_of_join,
        as_of_join_pandas,
    )

    records = spark.createDataFrame(
        [
            ("r0", None, 10, datetime(2026, 1, 1)),
            ("r1", None, 20, datetime(2026, 1, 3)),
            ("r2", "e1", 30, datetime(2026, 1, 2)),
        ],
        "id string, entity string, val int, timestamp timestamp",
    )
    spine = spark.createDataFrame(
        [
            (None, datetime(2026, 1, 2)),   # NULL key: NULL payload
            (None, datetime(2026, 1, 4)),   # NULL key: NULL payload
            ("e1", datetime(2026, 1, 4)),   # should see r2 (val 30)
            ("e2", datetime(2026, 1, 4)),   # no records: NULL payload
        ],
        "entity string, cutoff timestamp",
    )
    a = as_of_join(
        spine, records, on="entity", ts_col="timestamp", as_of="cutoff"
    ).select("entity", "cutoff", "id", "val")
    b = as_of_join_pandas(
        spine, records, on="entity", as_of_col="cutoff",
        ts_col="timestamp",
    ).select("entity", "cutoff", "id", "val")
    ka = sorted(map(tuple, a.collect()), key=str)
    kb = sorted(map(tuple, b.collect()), key=str)
    assert ka == kb
    by_key = {(r[0], r[1].day): (r[2], r[3]) for r in kb}
    assert by_key[(None, 2)] == (None, None)
    assert by_key[(None, 4)] == (None, None)
    assert by_key[("e1", 4)] == ("r2", 30)
    assert by_key[("e2", 4)] == (None, None)


def test_latest_as_of_forward_direction_brute_force(spark):
    """Forward (label) direction vs a brute-force reference: earliest
    record >= cutoff within tolerance, ascending-id tiebreak."""
    import random
    from datetime import datetime, timedelta

    from blackroad_feature_store_spark.operators.asof import latest_as_of

    rng = random.Random(9)
    t0 = datetime(2026, 1, 1)
    cutoff = t0 + timedelta(hours=100)
    recs = []
    for e in range(6):
        for i in range(rng.randint(0, 12)):
            recs.append(
                (
                    f"r{e}_{i:02d}",
                    f"e{e}",
                    t0 + timedelta(hours=rng.randint(0, 200)),
                )
            )
    # forced tie exactly at the cutoff: min id must win (ASC tiebreak)
    recs.append(("r9_a", "e0", cutoff))
    recs.append(("r9_b", "e0", cutoff))
    df = spark.createDataFrame(recs, "id string, entity string, timestamp timestamp")

    got = {
        r["entity"]: r["id"]
        for r in latest_as_of(
            df, ["entity"], as_of=cutoff, direction="forward",
            tolerance="50 hours",
        ).collect()
    }
    want = {}
    for rid, e, ts in recs:
        if not (cutoff <= ts <= cutoff + timedelta(hours=50)):
            continue
        cur = want.get(e)
        if cur is None or (ts, rid) < cur[1]:
            want[e] = (rid, (ts, rid))
    assert got == {e: v[0] for e, v in want.items()}
    assert got["e0"] == "r9_a"  # the tie broke ascending

    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires as_of"):
        latest_as_of(df, ["entity"], direction="forward")
    with _pytest.raises(ValueError, match="backward|forward"):
        latest_as_of(df, ["entity"], as_of=cutoff, direction="sideways")


def test_as_of_join_auto_picks_and_matches(spark):
    """The auto strategy must (a) pick window for shallow history and
    pandas for deep history, (b) return rows identical to the window
    form either way."""
    from datetime import datetime, timedelta

    from blackroad_feature_store_spark.operators.asof import (
        as_of_join,
        as_of_join_auto,
    )

    t0 = datetime(2026, 1, 1)
    # deep: 2 entities x 40 snapshots (depth 40); shallow: 40 x 2
    deep = spark.createDataFrame(
        [
            (f"r{e}_{i:02d}", f"e{e}", i, t0 + timedelta(hours=i))
            for e in range(2)
            for i in range(40)
        ],
        "id string, entity string, val int, timestamp timestamp",
    )
    shallow = spark.createDataFrame(
        [
            (f"r{e}_{i}", f"e{e}", i, t0 + timedelta(hours=i))
            for e in range(40)
            for i in range(2)
        ],
        "id string, entity string, val int, timestamp timestamp",
    )
    spine = spark.createDataFrame(
        [(f"e{e}", t0 + timedelta(hours=10)) for e in range(40)],
        "entity string, cutoff timestamp",
    )
    for recs in (deep, shallow):
        auto = as_of_join_auto(
            spine, recs, on="entity", as_of_col="cutoff"
        ).select("entity", "cutoff", "id", "val")
        ref = as_of_join(
            spine, recs, on="entity", ts_col="timestamp", as_of="cutoff"
        ).select("entity", "cutoff", "id", "val")
        assert sorted(map(tuple, auto.collect()), key=str) == sorted(
            map(tuple, ref.collect()), key=str
        )
    # strategy pick is observable via plan shape: the pandas path runs
    # FlatMapCoGroupsInPandas, the window path does not.
    deep_plan = as_of_join_auto(
        spine, deep, on="entity", as_of_col="cutoff"
    )._jdf.queryExecution().executedPlan().toString()
    shallow_plan = as_of_join_auto(
        spine, shallow, on="entity", as_of_col="cutoff"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CoGroup" in deep_plan
    assert "CoGroup" not in shallow_plan


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:

    @st.composite
    def _pit_workload(draw):
        from datetime import datetime, timedelta

        t0 = datetime(2026, 1, 1)
        n_ent = draw(st.integers(min_value=1, max_value=5))
        recs = []
        rid = 0
        for e in range(n_ent):
            for _ in range(draw(st.integers(min_value=0, max_value=6))):
                recs.append(
                    (
                        f"r{rid:03d}",
                        f"e{e}",
                        draw(st.integers(min_value=0, max_value=99)),
                        t0 + timedelta(
                            hours=draw(st.integers(min_value=0, max_value=72))
                        ),
                    )
                )
                rid += 1
        spine = [
            (
                f"e{draw(st.integers(min_value=0, max_value=n_ent + 1))}",
                t0 + timedelta(
                    hours=draw(st.integers(min_value=0, max_value=72))
                ),
            )
            for _ in range(draw(st.integers(min_value=1, max_value=6)))
        ]
        tol = draw(st.sampled_from([None, "12 hours", "48 hours"]))
        return recs, spine, tol

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_pit_workload())
    def test_asof_strategies_agree_hypothesis(spark, case):
        """Shrinking fuzz: the window form and the pandas merge_asof
        form must emit identical rows on arbitrary workloads —
        timestamp ties, entities beyond the record set, duplicate
        spine rows, and tolerance bounds included."""
        from blackroad_feature_store_spark.operators.asof import (
            as_of_join,
            as_of_join_pandas,
        )

        recs, spine_rows, tol = case
        records = spark.createDataFrame(
            recs or [("r_none", "e_none", 0, __import__("datetime").datetime(2020, 1, 1))],
            "id string, entity string, val int, timestamp timestamp",
        )
        spine = spark.createDataFrame(
            spine_rows, "entity string, cutoff timestamp"
        )
        kw = {"tolerance": tol} if tol else {}
        a = as_of_join(
            spine, records, on="entity", ts_col="timestamp",
            as_of="cutoff", **kw,
        ).select("entity", "cutoff", "id", "val")
        b = as_of_join_pandas(
            spine, records, on="entity", as_of_col="cutoff",
            ts_col="timestamp", **kw,
        ).select("entity", "cutoff", "id", "val")
        ka = sorted(map(tuple, a.collect()), key=str)
        kb = sorted(map(tuple, b.collect()), key=str)
        assert ka == kb
