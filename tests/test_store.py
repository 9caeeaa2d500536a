"""The reference's 16 feature-store test behaviors, ported assertion-
for-assertion (reference tests/test_feature_store.py:33-152; inventory
in SURVEY.md §5.1), plus a few extras the Spark engine adds (batch
writes, deterministic tie-breaks, open schema round-trip)."""

import pytest

from blackroad_feature_store_spark import (
    FeatureStore,
    GroupExistsError,
    UnknownFeatureError,
    UnknownGroupError,
)


@pytest.fixture()
def store(spark, tmp_path):
    return FeatureStore(spark, str(tmp_path / "fs"))


@pytest.fixture()
def store_with_features(store):
    store.register_feature("age", "user", "int")
    store.register_feature("income", "user", "float")
    store.register_feature("city", "user", "str")
    return store


@pytest.fixture()
def store_with_group(store_with_features):
    g = store_with_features.create_group(
        "user_demographics", ["age", "income", "city"], "user_id"
    )
    return store_with_features, g


# -- init ------------------------------------------------------------------

def test_store_init_creates_layout(store, tmp_path):
    # reference: db file created on init (test_feature_store.py:33-36)
    assert (tmp_path / "fs" / "entity_records").exists()


# -- register / get / list (test_feature_store.py:39-72) --------------------

def test_register_feature_roundtrip(store):
    f = store.register_feature(
        "age", "user", "int", description="years", tags=["demo"]
    )
    assert f.id
    assert f.name == "age"
    assert f.entity_type == "user"
    assert f.dtype == "int"
    assert f.description == "years"
    assert f.tags == ["demo"]
    assert f.is_active is True


def test_register_invalid_dtype(store):
    with pytest.raises(ValueError, match="Invalid dtype"):
        store.register_feature("bad", "user", "decimal")


def test_get_feature_by_name(store_with_features):
    f = store_with_features.get_feature("age")
    assert f is not None and f.dtype == "int"
    assert store_with_features.get_feature("nope") is None


def test_list_features_and_filter(store_with_features):
    store_with_features.register_feature("price", "product", "float")
    all_feats = store_with_features.list_features()
    assert [f.name for f in all_feats] == ["price", "age", "city", "income"]
    users = store_with_features.list_features(entity_type="user")
    assert [f.name for f in users] == ["age", "city", "income"]


def test_register_replaces_by_name(store_with_features):
    old = store_with_features.get_feature("age")
    new = store_with_features.register_feature("age", "user", "float")
    assert new.id != old.id
    assert store_with_features.get_feature("age").dtype == "float"


def test_soft_delete_asymmetry(store_with_features):
    # list_features filters is_active; get_feature does not
    # (reference feature_store.py:243-261; SURVEY.md §2.2 P5)
    store_with_features.deactivate_feature("age")
    assert store_with_features.get_feature("age") is not None
    assert "age" not in [f.name for f in store_with_features.list_features()]


# -- groups (test_feature_store.py:75-86) -----------------------------------

def test_create_group_fields(store_with_group):
    _, g = store_with_group
    assert g.name == "user_demographics"
    assert g.features == ["age", "income", "city"]
    assert g.entity_key == "user_id"
    assert g.frequency == "batch"
    assert g.version == 1


def test_create_group_unknown_feature(store_with_features):
    with pytest.raises(UnknownFeatureError, match="not registered"):
        store_with_features.create_group("g", ["ghost"], "user_id")


def test_create_group_duplicate_version(store_with_group):
    s, _ = store_with_group
    with pytest.raises(GroupExistsError):
        s.create_group("user_demographics", ["age"], "user_id", version=1)
    g2 = s.create_group("user_demographics", ["age"], "user_id", version=2)
    assert g2.version == 2
    assert s.get_group_by_name("user_demographics", version=2).id == g2.id


def test_get_group_lookups(store_with_group):
    s, g = store_with_group
    assert s.get_group(g.id).name == g.name
    assert s.get_group_by_name("user_demographics").id == g.id
    assert s.get_group("missing") is None
    assert s.get_group_by_name("missing") is None
    assert [x.name for x in s.list_groups()] == ["user_demographics"]


# -- write / read (test_feature_store.py:89-102) ----------------------------

def test_write_read_roundtrip(store_with_group):
    s, g = store_with_group
    s.write_features(
        g.id, "user-1", {"age": 25, "income": 60000.0, "city": "NYC"}
    )
    vals = s.get_features(g.id, "user-1")
    assert vals == {"age": 25, "income": 60000.0, "city": "NYC"}
    assert isinstance(vals["age"], int)
    assert isinstance(vals["income"], float)


def test_write_unknown_group(store_with_features):
    with pytest.raises(UnknownGroupError, match="not found"):
        store_with_features.write_features("ghost", "user-1", {"age": 1})


def test_read_missing_entity(store_with_group):
    s, g = store_with_group
    assert s.get_features(g.id, "user-404") is None


# -- point-in-time correctness (test_feature_store.py:105-117) --------------

def test_as_of_between_snapshots(store_with_group):
    s, g = store_with_group
    s.write_features(g.id, "user-1", {"age": 25}, timestamp="2023-01-01T00:00:00")
    s.write_features(g.id, "user-1", {"age": 26}, timestamp="2024-01-01T00:00:00")
    assert s.get_features(g.id, "user-1", as_of="2023-06-01T00:00:00") == {
        "age": 25
    }
    assert s.get_features(g.id, "user-1") == {"age": 26}


def test_snapshot_wins_no_coalesce(store_with_group):
    # Latest record returned verbatim: older record's income must NOT
    # leak into the newer snapshot (SURVEY.md §2.3).
    s, g = store_with_group
    s.write_features(
        g.id, "user-1", {"age": 25, "income": 60000.0},
        timestamp="2023-01-01T00:00:00",
    )
    s.write_features(g.id, "user-1", {"age": 26}, timestamp="2024-01-01T00:00:00")
    assert s.get_features(g.id, "user-1") == {"age": 26}


def test_open_schema_roundtrip(store_with_group):
    # Extra keys outside the group are stored anyway and leak into reads
    # (reference feature_store.py:347-349).
    s, g = store_with_group
    s.write_features(g.id, "user-1", {"age": 30, "shoe_size": 44})
    assert s.get_features(g.id, "user-1") == {"age": 30, "shoe_size": 44}


# -- PIT join (test_feature_store.py:120-133) --------------------------------

def test_point_in_time_join(store_with_group):
    s, g = store_with_group
    s.write_features(
        g.id, "user-1", {"age": 30, "income": 80000.0},
        timestamp="2024-01-01T00:00:00",
    )
    s.write_features(
        g.id, "user-2", {"age": 25, "income": 60000.0},
        timestamp="2024-01-01T00:00:00",
    )
    rows = s.point_in_time_join(
        ["user-1", "user-2", "user-3"], [g.id], timestamp="2024-06-01T00:00:00"
    )
    assert len(rows) == 3
    assert rows[0]["entity_id"] == "user-1" and rows[0]["age"] == 30
    assert rows[1]["entity_id"] == "user-2" and rows[1]["income"] == 60000.0
    assert rows[2]["entity_id"] == "user-3"
    assert rows[2]["age"] is None and rows[2]["income"] is None
    assert rows[2]["city"] is None


def test_pit_join_group_precedence(store_with_features):
    # Later group in the list overwrites earlier on key collision;
    # null-fill never clobbers (feature_store.py:436,442).
    s = store_with_features
    g1 = s.create_group("g1", ["age", "income"], "user_id")
    g2 = s.create_group("g2", ["age"], "user_id")
    s.write_features(g1.id, "u", {"age": 1, "income": 10.0},
                     timestamp="2024-01-01T00:00:00")
    s.write_features(g2.id, "u", {"age": 2}, timestamp="2024-01-01T00:00:00")
    rows = s.point_in_time_join(["u"], [g1.id, g2.id],
                                timestamp="2024-06-01T00:00:00")
    assert rows[0]["age"] == 2          # g2 (later) wins
    assert rows[0]["income"] == 10.0    # g2's null-fill didn't clobber g1


# -- statistics (test_feature_store.py:136-152) ------------------------------

def test_stats_empty_group(store_with_group):
    s, g = store_with_group
    st = s.statistics(g.id)
    assert st["total_records"] == 0
    assert set(st["features"]) == {"age", "income", "city"}
    assert st["features"]["age"]["count"] == 0


def test_stats_unknown_group(store_with_features):
    with pytest.raises(UnknownGroupError):
        store_with_features.statistics("ghost")


def test_stats_values(store_with_group):
    s, g = store_with_group
    recs = [
        {"age": 20 + i, "income": 40000.0 + 1000 * i} for i in range(5)
    ]
    from blackroad_feature_store_spark.store import EntityRecord
    from datetime import datetime

    s.write_features_batch(
        EntityRecord(g.id, f"u{i}", recs[i], datetime(2024, 1, 1 + i))
        for i in range(5)
    )
    st = s.statistics(g.id)
    assert st["total_records"] == 5
    age = st["features"]["age"]
    assert age["count"] == 5
    assert age["mean"] == 22.0
    assert age["min"] == 20 and age["max"] == 24
    # city never written → all nulls
    city = st["features"]["city"]
    assert city["count"] == 0 and city["null_count"] == 5
    assert city["mean"] is None


def test_stats_numeric_only_and_bool_quirk(store_with_group):
    s, g = store_with_group
    s.register_feature("vip", "user", "bool")
    s.write_features(g.id, "u1", {"city": "NYC", "vip": True, "age": 10})
    s.write_features(g.id, "u2", {"city": "LA", "vip": False, "age": None})
    st = s.statistics(g.id)
    city = st["features"]["city"]
    # strings count but produce no numeric stats
    assert city["count"] == 2 and city["mean"] is None
    # explicit JSON null counts as null, not value (feature_store.py:475-479)
    age = st["features"]["age"]
    assert age["count"] == 1 and age["null_count"] == 1


# -- compaction (scale write-path maintenance) -------------------------------

def test_compact_records_preserves_data(store_with_group):
    store, g = store_with_group
    for i in range(10):  # 10 single-record writes → 10 tiny files
        store.write_features(
            g.id, f"u{i % 3}", {"age": 20 + i},
            timestamp=f"2026-01-{i+1:02d}T00:00:00",
        )
    import glob, os
    part = os.path.join(store.base_path, "entity_records", f"group_id={g.id}")
    pre_version = store.current_version
    live_before = store._log.live_files()
    assert len(live_before) >= 10

    assert store.compact_records(g.id) == 10
    # The LIVE file set shrinks (manifest replay), even though the old
    # files stay on disk for time travel until vacuum.
    live_after = store._log.live_files()
    assert len(live_after) < len(live_before)
    assert not set(live_after) & set(live_before)

    # reads unchanged after the commit
    assert store.records_df(g.id).count() == 10
    latest = store.get_features(g.id, "u0")
    assert latest["age"] == 29
    st = store.statistics(g.id)
    assert st["total_records"] == 10

    # Pre-compaction version still reads identically (time travel)...
    old = store.records_df(g.id, version=pre_version)
    assert old.count() == 10

    # ...until vacuum reclaims the superseded files.
    physical_before = len(glob.glob(os.path.join(part, "*.parquet")))
    deleted = store.vacuum(retain_versions=1)
    assert deleted >= 10
    physical_after = len(glob.glob(os.path.join(part, "*.parquet")))
    assert physical_after < physical_before
    assert physical_after == len(
        [f for f in live_after if f.startswith(f"group_id={g.id}/")]
    )
    assert store.records_df(g.id).count() == 10


def test_compact_records_crash_before_commit_is_invisible(store_with_group):
    # Kill the compaction AFTER its data files are written but BEFORE
    # the manifest commits — the worst-case window. The table must be
    # completely unaffected (the new files are unreferenced), and
    # vacuum must reclaim the orphans.
    store, g = store_with_group
    for i in range(6):
        store.write_features(
            g.id, f"u{i}", {"age": 20 + i},
            timestamp=f"2026-01-{i+1:02d}T00:00:00",
        )
    version_before = store.current_version

    from blackroad_feature_store_spark.versioning import CommitLog
    orig_commit = CommitLog.commit

    def exploding_commit(self, *a, **k):
        raise RuntimeError("simulated crash before commit")

    CommitLog.commit = exploding_commit
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            store.compact_records(g.id)
    finally:
        CommitLog.commit = orig_commit

    # Table state is byte-identical: same version, same rows.
    assert store.current_version == version_before
    assert store.records_df(g.id).count() == 6
    assert store.get_features(g.id, "u5")["age"] == 25

    # Orphaned (never-committed) compacted files are vacuumable — but
    # only once past the in-flight-writer grace window. With the
    # default grace these fresh orphans MUST survive (they are
    # indistinguishable from a live writer's absorbed-not-yet-committed
    # files); with grace waived they go.
    assert store.vacuum(retain_versions=1) == 0
    assert store.vacuum(retain_versions=1, orphan_grace_seconds=0.0) >= 1
    assert store.records_df(g.id).count() == 6

    # Reopen + a subsequent compaction completes normally.
    reopened = FeatureStore(store.spark, store.base_path)
    assert reopened.compact_records(g.id) == 6
    assert reopened.records_df(g.id).count() == 6


def test_time_travel_and_history(store_with_group):
    store, g = store_with_group
    store.write_features(g.id, "u1", {"age": 1},
                         timestamp="2026-01-01T00:00:00")
    v0 = store.current_version
    store.write_features(g.id, "u2", {"age": 2},
                         timestamp="2026-01-02T00:00:00")
    v1 = store.current_version
    assert v1 == v0 + 1

    # Each version is a frozen snapshot.
    assert store.records_df(g.id, version=v0).count() == 1
    assert store.records_df(g.id, version=v1).count() == 2
    assert store.records_df(g.id).count() == 2

    # version= and as_of_commit= are mutually exclusive.
    with pytest.raises(ValueError):
        store.records_df(g.id, version=v0, as_of_commit="2026-01-01")

    # as_of_commit pins by COMMIT wall-clock (not record timestamps):
    # a cutoff between the two commits' ts fields sees only the first.
    h = store.history()
    assert [e["version"] for e in h] == [v1, v0]
    assert all(e["op"] == "append" for e in h)
    cutoff = h[-1]["ts"]  # exactly at v0's commit instant
    assert store.records_df(g.id, as_of_commit=cutoff).count() == 1


def test_delete_entity_is_versioned(store_with_group):
    # GDPR delete rewrites the partition in a new version; the purged
    # entity stays readable at the OLD version until vacuum (and after
    # vacuum the old version's files are gone — erasure completes).
    store, g = store_with_group
    store.write_features(g.id, "u1", {"age": 1})
    store.write_features(g.id, "u2", {"age": 2})
    pre = store.current_version
    assert store.delete_entity_records(g.id, "u1") == 1
    assert store.records_df(g.id).count() == 1
    assert store.records_df(g.id, version=pre).count() == 2
    store.vacuum(retain_versions=1)
    assert store.records_df(g.id).count() == 1
    # Old version now points at deleted files — u1 is physically gone.
    import glob, os
    part = os.path.join(store.base_path, "entity_records", f"group_id={g.id}")
    assert len(glob.glob(os.path.join(part, "*.parquet"))) == 1


def test_concurrent_stores_share_commit_log(spark, tmp_path):
    # Two store instances on the same path: appends interleave, both
    # visible, versions strictly increasing (optimistic commit).
    a = FeatureStore(spark, str(tmp_path / "s"))
    a.register_feature("age", "user", "int")
    g = a.create_group("g", features=["age"], entity_key="user_id")
    b = FeatureStore(spark, str(tmp_path / "s"))
    a.write_features(g.id, "u1", {"age": 1})
    b.write_features(g.id, "u2", {"age": 2})
    a.write_features(g.id, "u3", {"age": 3})
    assert a.records_df(g.id).count() == 3
    assert b.records_df(g.id).count() == 3
    versions = [e["version"] for e in a.history()]
    assert versions == sorted(versions, reverse=True)
    assert len(versions) == len(set(versions)) == 3


def test_stats_mixed_int_float_min_max_types(store_with_group):
    # Reference min()/max() preserve the WINNING element's own type
    # (feature_store.py:491-492): [1, 2.5] → min is int 1, max is
    # float 2.5; [0.5, 3] → min float, max int.
    s, g = store_with_group
    s.write_features(g.id, "u1", {"age": 1, "income": 0.5})
    s.write_features(g.id, "u2", {"age": 2.5, "income": 3})
    st = s.statistics(g.id)
    age = st["features"]["age"]
    assert age["min"] == 1 and isinstance(age["min"], int)
    assert age["max"] == 2.5 and isinstance(age["max"], float)
    inc = st["features"]["income"]
    assert inc["min"] == 0.5 and isinstance(inc["min"], float)
    assert inc["max"] == 3 and isinstance(inc["max"], int)


def test_delete_entity_records(store_with_group):
    store, g = store_with_group
    for i in range(4):
        store.write_features(
            g.id, "keep_me", {"age": 30 + i},
            timestamp=f"2026-01-{i+1:02d}T00:00:00",
        )
    store.write_features(
        g.id, "erase_me", {"age": 99}, timestamp="2026-01-05T00:00:00"
    )
    assert store.delete_entity_records(g.id, "erase_me") == 1
    assert store.get_features(g.id, "erase_me") is None
    # the surviving entity is untouched, latest snapshot intact
    assert store.records_df(g.id).count() == 4
    assert store.get_features(g.id, "keep_me")["age"] == 33
    # absent entity → 0, no rewrite
    assert store.delete_entity_records(g.id, "ghost") == 0


def test_delete_entity_records_last_entity_empties_partition(store_with_group):
    store, g = store_with_group
    store.write_features(
        g.id, "only", {"age": 1}, timestamp="2026-01-01T00:00:00"
    )
    assert store.delete_entity_records(g.id, "only") == 1
    assert store.records_df(g.id).count() == 0
    # store still writable afterwards
    store.write_features(
        g.id, "next", {"age": 2}, timestamp="2026-01-02T00:00:00"
    )
    assert store.records_df(g.id).count() == 1


# -- concurrent writers (registry reload-merge) ------------------------------

def test_two_writers_merge_disjoint_features(spark, tmp_path):
    # Two stores on the same base_path writing DIFFERENT names: both
    # must survive (per-key last-writer-wins, not whole-file clobber).
    path = str(tmp_path / "fs")
    s1 = FeatureStore(spark, path)
    s2 = FeatureStore(spark, path)
    s1.register_feature("a", "user", "int")
    s2.register_feature("b", "user", "str")
    s3 = FeatureStore(spark, path)
    assert {f.name for f in s3.list_features()} == {"a", "b"}
    # the merging writer also picked up the other writer's entry
    assert s2.get_feature("a") is not None


def test_two_writers_same_name_last_wins(spark, tmp_path):
    path = str(tmp_path / "fs")
    s1 = FeatureStore(spark, path)
    s2 = FeatureStore(spark, path)
    s1.register_feature("x", "user", "int")
    s2.register_feature("x", "user", "float")  # upsert: later writer wins
    s3 = FeatureStore(spark, path)
    assert s3.get_feature("x").dtype == "float"


def test_two_writers_duplicate_group_version_detected(spark, tmp_path):
    path = str(tmp_path / "fs")
    s1 = FeatureStore(spark, path)
    s1.register_feature("a", "user", "int")
    s2 = FeatureStore(spark, path)
    s1.create_group("g", ["a"], "user_id")
    # s2 doesn't know about s1's group — the in-memory check passes,
    # but the flush-time merge detects the (name, version) collision.
    with pytest.raises(GroupExistsError, match="concurrent writer"):
        s2.create_group("g", ["a"], "user_id")
    s3 = FeatureStore(spark, path)
    assert len(s3.list_groups()) == 1


def test_sql_views(store_with_group):
    store, g = store_with_group
    store.write_features(g.id, "u1", {"age": 30}, timestamp="2026-01-01T00:00:00")
    store.create_views()
    spark = store.spark
    assert spark.sql(
        "SELECT count(*) AS n FROM fs_features WHERE entity_type='user'"
    ).first()["n"] == 3
    assert spark.sql(
        "SELECT entity_key FROM fs_groups WHERE name='user_demographics'"
    ).first()["entity_key"] == "user_id"
    row = spark.sql(
        "SELECT entity_id, feature_values['age'] AS age FROM fs_records"
    ).first()
    assert row["entity_id"] == "u1" and row["age"] == "30"
    hist = spark.sql(
        "SELECT version, op, files_added FROM fs_history ORDER BY version"
    ).collect()
    assert len(hist) == 1 and hist[0]["op"] == "append"
    assert hist[0]["files_added"] >= 1
    # typed wide view: per group, registry-typed columns from pure SQL
    wide = spark.sql(
        "SELECT entity_id, age FROM fs_wide_user_demographics_v1"
    ).first()
    assert wide["entity_id"] == "u1" and wide["age"] == 30  # bigint, not "30"


# -- manifest file statistics / data skipping -------------------------------

def test_manifest_stats_skip_files_on_asof_read(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    # Two commits with disjoint timestamp ranges -> two file sets whose
    # manifest stats don't overlap.
    store.write_features_batch(
        [
            EntityRecord(g.id, "u1", {"age": 30}, datetime(2026, 1, 1)),
            EntityRecord(g.id, "u2", {"age": 40}, datetime(2026, 1, 2)),
        ]
    )
    store.write_features_batch(
        [
            EntityRecord(g.id, "u1", {"age": 31}, datetime(2026, 6, 1)),
            EntityRecord(g.id, "u3", {"age": 50}, datetime(2026, 6, 2)),
        ]
    )
    entries = store._log.live_entries()
    assert all(e.get("min_ts") and e.get("max_ts") for e in entries)

    all_files = set(store.records_df(g.id).inputFiles())
    pruned = set(
        store.records_df(g.id, ts_lte=datetime(2026, 3, 1)).inputFiles()
    )
    # The June commit's files are dropped from the scan entirely.
    assert pruned and pruned < all_files
    june_files = {
        e["path"] for e in entries if e["min_ts"] >= "2026-06-01"
    }
    assert june_files
    assert not any(any(p.endswith(f.split("/")[-1]) for p in pruned)
                   for f in june_files)

    # Correctness is unchanged: as-of before June sees the old snapshot,
    # an unbounded read the new one.
    assert store.get_features(g.id, "u1", as_of=datetime(2026, 3, 1)) == {
        "age": 30
    }
    assert store.get_features(g.id, "u1") == {"age": 31}
    # Boundary: a cutoff exactly equal to a file's min_ts keeps it.
    kept = set(
        store.records_df(g.id, ts_lte=datetime(2026, 6, 1)).inputFiles()
    )
    assert len(kept) > len(pruned)


def test_manifest_stats_survive_compaction(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    store.write_features_batch(
        [EntityRecord(g.id, "u1", {"age": 1}, datetime(2026, 1, 1))]
    )
    store.write_features_batch(
        [EntityRecord(g.id, "u1", {"age": 2}, datetime(2026, 6, 1))]
    )
    store.compact_records(g.id)
    entries = store._log.live_entries()
    assert all(e.get("min_ts") for e in entries)
    # compacted file spans both ranges -> no pruning at an early cutoff,
    # but results stay right
    assert store.get_features(g.id, "u1", as_of=datetime(2026, 2, 1)) == {
        "age": 1
    }


def test_entity_bloom_skips_files_on_point_lookup(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    # Three commits over disjoint entity populations -> three file sets
    # whose manifest blooms don't share ids.
    for batch, ids in enumerate([("a1", "a2"), ("b1", "b2"), ("c1", "c2")]):
        store.write_features_batch(
            [
                EntityRecord(g.id, e, {"age": batch}, datetime(2026, 1, batch + 1))
                for e in ids
            ]
        )
    entries = store._log.live_entries()
    assert all("entity_bloom" in e for e in entries)

    all_files = set(store.records_df(g.id).inputFiles())
    pruned = set(store.records_df(g.id, entity_id="b1").inputFiles())
    # Only the one commit that wrote b1 survives the bloom prune
    # (deterministic: blake2b positions never flake between runs).
    assert len(all_files) >= 3
    assert len(pruned) == 1
    # Pruning never changes the answer.
    assert store.get_features(g.id, "b1") == {"age": 1}
    # An id in NO file prunes the scan to nothing driver-side...
    assert store.records_df(g.id, entity_id="zz").inputFiles() == []
    # ...and the point read still returns the contract's None.
    assert store.get_features(g.id, "zz") is None


def test_entity_bloom_reads_every_file_holding_the_entity(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    # u1 appears in commits 1 and 3; commit 2 is other entities only.
    store.write_features_batch(
        [EntityRecord(g.id, "u1", {"age": 1}, datetime(2026, 1, 1))]
    )
    store.write_features_batch(
        [EntityRecord(g.id, "u9", {"age": 9}, datetime(2026, 1, 2))]
    )
    store.write_features_batch(
        [EntityRecord(g.id, "u1", {"age": 3}, datetime(2026, 1, 3))]
    )
    files = store.records_df(g.id, entity_id="u1").inputFiles()
    assert len(files) == 2
    rows = store.records_df(g.id, entity_id="u1").count()
    assert rows == 2
    assert store.get_features(g.id, "u1") == {"age": 3}


def test_entity_bloom_malformed_or_absent_is_unskippable():
    from blackroad_feature_store_spark.store import (
        _bloom_maybe_contains,
        _file_entity_bloom,
    )

    # Corrupt/garbage blooms must read as "maybe present", never prune.
    assert _bloom_maybe_contains(None, "x") is True
    assert _bloom_maybe_contains({"m": 64}, "x") is True
    assert _bloom_maybe_contains({"m": 64, "k": 7, "bits": "!!"}, "x") is True
    assert _bloom_maybe_contains({"m": -1, "k": 7, "bits": "AA=="}, "x") is True
    # Unreadable file -> no bloom, not an exception.
    assert _file_entity_bloom("/nonexistent/file.parquet") is None


def test_entity_bloom_property_no_false_negatives(tmp_path):
    # Property check (seeded-random, repo style): for ANY set of
    # entity ids written to a parquet file, every member must read as
    # "maybe present" — a false negative would silently drop data from
    # a point lookup. Also sanity-check the FP rate is an index, not a
    # pass-through (absent ids mostly prune).
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from blackroad_feature_store_spark.store import (
        _bloom_maybe_contains,
        _file_entity_bloom,
    )

    rng = random.Random(20260814)
    for trial in range(10):
        n = rng.choice([1, 3, 17, 200, 1500])
        members = {f"e{rng.randrange(10**9)}" for _ in range(n)}
        path = str(tmp_path / f"t{trial}.parquet")
        pq.write_table(
            pa.table({"entity_id": list(members) * 2}), path
        )
        bloom = _file_entity_bloom(path)
        assert bloom is not None
        assert all(_bloom_maybe_contains(bloom, m) for m in members)
        absent = [f"x{rng.randrange(10**9)}" for _ in range(500)]
        fp = sum(_bloom_maybe_contains(bloom, a) for a in absent)
        assert fp < 50  # ~1% expected at 10 bits/key; 10% is the wire


def test_entity_bloom_survives_compaction(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    for day, e in enumerate(["u1", "u2", "u3"], start=1):
        store.write_features_batch(
            [EntityRecord(g.id, e, {"age": day}, datetime(2026, 1, day))]
        )
    store.compact_records(g.id)
    entries = store._log.live_entries()
    # Rewritten files get fresh blooms from the same write path.
    assert entries and all("entity_bloom" in e for e in entries)
    assert store.get_features(g.id, "u2") == {"age": 2}


def test_entity_clustered_compaction_bloom_prunes_to_one_file(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    # 12 tiny writes, entities interleaved across them — before
    # compaction a point lookup may touch many files.
    store.write_features_batch(
        [
            EntityRecord(g.id, f"u{m % 4}", {"age": m}, datetime(2026, 1, m + 1))
            for m in range(12)
        ]
    )
    # OPTIMIZE clustered on entity_id: each rewritten file holds a
    # contiguous entity range, so its bloom covers few distinct ids —
    # clustering is what makes the bloom index selective at scale.
    store.compact_records(g.id, target_rows_per_file=3, cluster_by=["entity_id"])
    files = store.records_df(g.id, entity_id="u2").inputFiles()
    assert len(files) == 1
    rows = store.records_df(g.id, entity_id="u2").count()
    assert rows == 3  # m = 2, 6, 10


def test_entity_rollup_incremental_matches_full_recompute(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    store.write_features_batch(
        [
            EntityRecord(g.id, "a", {"age": 1}, datetime(2026, 1, 1)),
            EntityRecord(g.id, "b", {"age": 2}, datetime(2026, 1, 2)),
        ]
    )
    store.refresh_entity_rollup("roll", g.id)  # cursor at v0
    store.write_features_batch(
        [
            EntityRecord(g.id, "a", {"age": 3}, datetime(2026, 2, 1)),
            EntityRecord(g.id, "c", {"age": 4}, datetime(2026, 2, 2)),
        ]
    )
    store.write_features_batch(
        [EntityRecord(g.id, "a", {"age": 5}, datetime(2026, 3, 1))]
    )
    mv = store.refresh_entity_rollup("roll", g.id)  # delta merge v1-v2
    got = {
        r["entity_id"]: (r["n_records"], r["first_ts"], r["last_ts"])
        for r in mv.collect()
    }
    assert got == {
        "a": (3, datetime(2026, 1, 1), datetime(2026, 3, 1)),
        "b": (1, datetime(2026, 1, 2), datetime(2026, 1, 2)),
        "c": (1, datetime(2026, 2, 2), datetime(2026, 2, 2)),
    }
    # A refresh with no new commits is a no-op snapshot read.
    assert store.refresh_entity_rollup("roll", g.id).count() == 3


def test_entity_rollup_compaction_never_doubles(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    store.write_features_batch(
        [EntityRecord(g.id, "a", {"age": 1}, datetime(2026, 1, 1))]
    )
    store.refresh_entity_rollup("roll", g.id)
    store.write_features_batch(
        [EntityRecord(g.id, "a", {"age": 2}, datetime(2026, 1, 2))]
    )
    # Compaction rewrites BOTH rows into fresh files; the feed must not
    # re-emit them, so the incremental merge stays at 2, not 4.
    store.compact_records(g.id)
    mv = store.refresh_entity_rollup("roll", g.id)
    assert mv.collect()[0]["n_records"] == 2


def test_entity_rollup_delete_forces_full_recompute(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    store.write_features_batch(
        [
            EntityRecord(g.id, "a", {"age": 1}, datetime(2026, 1, 1)),
            EntityRecord(g.id, "b", {"age": 2}, datetime(2026, 1, 2)),
        ]
    )
    store.refresh_entity_rollup("roll", g.id)
    store.delete_entity_records(g.id, "a")
    mv = store.refresh_entity_rollup("roll", g.id)
    got = {r["entity_id"]: r["n_records"] for r in mv.collect()}
    assert got == {"b": 1}
    # And errors are the contract's, not scan failures:
    with pytest.raises(ValueError, match="never been refreshed"):
        store.read_entity_rollup("other")
    with pytest.raises(ValueError, match="Invalid materialized-view name"):
        store.refresh_entity_rollup("../evil", g.id)


def test_clustered_compaction_keeps_files_skippable(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    # Many tiny writes spanning a year...
    store.write_features_batch(
        [
            EntityRecord(g.id, f"u{m}", {"age": m}, datetime(2026, m, 15))
            for m in range(1, 13)
        ]
    )
    # ...compacted into two files CLUSTERED on timestamp.
    store.compact_records(
        g.id, target_rows_per_file=6, cluster_by=["timestamp"]
    )
    entries = store._log.live_entries()
    assert len(entries) == 2
    # Range partitioning makes the two files' ts ranges disjoint...
    a, b = sorted(entries, key=lambda e: e["min_ts"])
    assert a["max_ts"] < b["min_ts"]
    # ...so an early as-of read scans exactly one of them.
    pruned = store.records_df(g.id, ts_lte=datetime(2026, 2, 1)).inputFiles()
    assert len(pruned) == 1
    assert store.get_features(g.id, "u1", as_of=datetime(2026, 2, 1)) == {
        "age": 1
    }


def test_records_df_nonexistent_version_raises(store_with_group):
    from datetime import datetime

    import pytest as _pytest

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    store.write_features_batch(
        [EntityRecord(g.id, "u1", {"age": 1}, datetime(2026, 1, 1))]
    )
    with _pytest.raises(ValueError, match="version 99 does not exist"):
        store.records_df(g.id, version=99)
    # as_of_commit before the first commit is NOT an error: empty table.
    assert store.records_df(
        g.id, as_of_commit=datetime(2000, 1, 1)
    ).count() == 0


def test_concurrent_data_plane_writers_both_commit(spark, tmp_path):
    """Two FeatureStore instances on the same base path appending
    concurrently: the optimistic commit loop must land BOTH commits
    (no lost update, distinct versions, all rows readable)."""
    import threading
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    base = str(tmp_path / "fs_conc")
    a = FeatureStore(spark, base)
    a.register_feature("age", "user", "int")
    g = a.create_group("g", ["age"], "user_id")
    b = FeatureStore(spark, base)

    barrier = threading.Barrier(2)
    errors = []

    def writer(store, lo, hi):
        try:
            barrier.wait(timeout=60)
            store.write_features_batch(
                [
                    EntityRecord(g.id, f"u{i}", {"age": i},
                                 datetime(2026, 1, 1 + (i % 27)))
                    for i in range(lo, hi)
                ]
            )
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    t1 = threading.Thread(target=writer, args=(a, 0, 40))
    t2 = threading.Thread(target=writer, args=(b, 40, 80))
    t1.start(); t2.start(); t1.join(120); t2.join(120)
    assert not errors
    versions = a._log.versions()
    assert len(versions) == 2  # two distinct commits, no clobber
    fresh = FeatureStore(spark, base)
    df = fresh.records_df(g.id)
    assert df.count() == 80
    assert df.select("entity_id").distinct().count() == 80


def test_bitemporal_get_features(store_with_group):
    """Value time (as_of) and commit time (table_version) are
    independent axes: a late-arriving backdated record is visible at
    the latest table version but absent from the earlier one, at the
    SAME value-time cutoff."""
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    store.write_features_batch(
        [EntityRecord(g.id, "u1", {"age": 30}, datetime(2026, 1, 1))]
    )  # table version 0
    # Late arrival: committed later (version 1), but BACKDATED to Jan 2.
    store.write_features_batch(
        [EntityRecord(g.id, "u1", {"age": 31}, datetime(2026, 1, 2))]
    )
    cutoff = datetime(2026, 1, 15)
    # What we believe now about Jan 15: the backdated row counts.
    assert store.get_features(g.id, "u1", as_of=cutoff) == {"age": 31}
    # What the table knew at version 0 about Jan 15: it didn't have it.
    assert store.get_features(
        g.id, "u1", as_of=cutoff, table_version=0
    ) == {"age": 30}


def test_vacuumed_version_raises_clear_error(store_with_group):
    from datetime import datetime

    import pytest as _pytest

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    store.write_features_batch(
        [EntityRecord(g.id, "u1", {"age": 1}, datetime(2026, 1, 1))]
    )  # v0
    store.compact_records(g.id)  # v1 supersedes v0's file
    store.vacuum(retain_versions=1)
    with _pytest.raises(ValueError, match="was vacuumed"):
        store.records_df(g.id, version=0)
    # The retained version still reads fine.
    assert store.records_df(g.id, version=1).count() == 1


def test_concurrent_delete_and_compact_abort_one_side(store_with_group):
    # The ADVICE delete×compact race: a compaction resolves its
    # snapshot, then a concurrent GDPR delete commits first. Replaying
    # both would double every surviving row and resurrect the erased
    # entity via the compaction's add set — the conflict check must
    # abort the compaction instead.
    from blackroad_feature_store_spark.errors import (
        ConcurrentModificationError,
    )
    from blackroad_feature_store_spark.versioning import CommitLog

    store, g = store_with_group
    for i in range(4):
        store.write_features(g.id, f"u{i}", {"age": 20 + i})

    orig_commit = CommitLog.commit
    state = {"injected": False}

    def racing_commit(self, op, add, remove, meta=None):
        if op == "compact" and not state["injected"]:
            state["injected"] = True
            # The concurrent deleter erases u0 (one whole file, since
            # each write_features lands one file) between the
            # compaction's snapshot resolution and its commit.
            store.delete_entity_records(g.id, "u0")
        return orig_commit(self, op, add, remove, meta)

    CommitLog.commit = racing_commit
    try:
        with pytest.raises(ConcurrentModificationError):
            store.compact_records(g.id)
    finally:
        CommitLog.commit = orig_commit

    # The delete won; no doubled rows, no resurrected entity.
    df = store.records_df(g.id)
    assert df.count() == 3
    assert store.get_features(g.id, "u0") is None
    assert df.groupBy("id").count().agg({"count": "max"}).collect()[0][0] == 1

    # A retried compaction re-resolves the snapshot and succeeds.
    assert store.compact_records(g.id) == 3
    assert store.records_df(g.id).count() == 3
    assert store.get_features(g.id, "u0") is None


def test_vacuum_spares_in_flight_writer(store_with_group):
    # The ADVICE vacuum race: _stage_and_commit moves files into the
    # live tree BEFORE the manifest commits; a vacuum running in that
    # window must not delete them. The default orphan grace protects
    # them; the commit then lands and reads back intact.
    from blackroad_feature_store_spark.versioning import CommitLog

    store, g = store_with_group
    store.write_features(g.id, "u1", {"age": 1})

    orig_commit = CommitLog.commit
    state = {"vacuumed_during_write": None}

    def vacuuming_commit(self, op, add, remove, meta=None):
        if state["vacuumed_during_write"] is None:
            # Absorbed-but-uncommitted files are on disk right now.
            state["vacuumed_during_write"] = store.vacuum(retain_versions=1)
        return orig_commit(self, op, add, remove, meta)

    CommitLog.commit = vacuuming_commit
    try:
        store.write_features(g.id, "u2", {"age": 2})
    finally:
        CommitLog.commit = orig_commit

    assert state["vacuumed_during_write"] == 0  # grace spared the files
    assert store.records_df(g.id).count() == 2
    assert store.get_features(g.id, "u2")["age"] == 2


def test_as_of_commit_past_vacuum_watermark_raises(store_with_group):
    # Same contract as version=: an instant resolving below the vacuum
    # horizon raises the clear earliest-travelable error, not a
    # missing-file scan failure.
    store, g = store_with_group
    store.write_features(g.id, "u1", {"age": 1})
    v0_ts = store.history()[-1]["ts"]
    store.compact_records(g.id)
    store.vacuum(retain_versions=1)
    with pytest.raises(ValueError, match="earliest time-travelable"):
        store.records_df(g.id, as_of_commit=v0_ts).count()
    # At-or-after the retained version still reads.
    latest_ts = store.history()[0]["ts"]
    assert store.records_df(g.id, as_of_commit=latest_ts).count() == 1


# -- bulk registration (round-6: one flush per batch) -----------------------

def test_register_features_bulk_single_flush(store, monkeypatch):
    # N individual registrations rewrite the registry parquet N times
    # (O(N^2) bytes over a bulk load); the batch form must flush once.
    flushes = []
    orig = FeatureStore._flush_features
    monkeypatch.setattr(
        FeatureStore, "_flush_features",
        lambda self: (flushes.append(1), orig(self))[1],
    )
    feats = store.register_features(
        [{"name": f"f{i}", "entity_type": "user", "dtype": "int"}
         for i in range(20)]
    )
    assert len(feats) == 20
    assert flushes == [1]
    assert store.get_feature("f7").dtype == "int"


def test_register_features_bulk_invalid_dtype_atomic(store):
    import pytest as _pytest
    from blackroad_feature_store_spark.errors import InvalidDtypeError

    with _pytest.raises(InvalidDtypeError):
        store.register_features([
            {"name": "ok", "entity_type": "user", "dtype": "int"},
            {"name": "bad", "entity_type": "user", "dtype": "decimal"},
        ])
    # all-or-nothing: nothing from the failed batch landed
    assert store.get_feature("ok") is None
    assert store.get_feature("bad") is None


def test_register_features_bulk_two_writer_merge(spark, tmp_path):
    # Batch flush still does the read-merge-write under flock: another
    # writer's features persisted between our load and our flush survive.
    a = FeatureStore(spark, str(tmp_path / "s"))
    b = FeatureStore(spark, str(tmp_path / "s"))
    a.register_feature("from_a", "user", "int")
    b.register_features(
        [{"name": "from_b1", "entity_type": "user", "dtype": "int"},
         {"name": "from_b2", "entity_type": "user", "dtype": "str"}]
    )
    fresh = FeatureStore(spark, str(tmp_path / "s"))
    names = {f.name for f in fresh.list_features()}
    assert {"from_a", "from_b1", "from_b2"} <= names


# -- change data feed (records_changes) -------------------------------------

def _write_batch(store, gid, tag, n, day):
    from blackroad_feature_store_spark.store import EntityRecord
    store.write_features_batch(
        EntityRecord(
            group_id=gid, entity_id=f"{tag}{i}",
            feature_values={"age": i},
            timestamp=f"2026-02-{day:02d}T00:00:00",
        )
        for i in range(n)
    )


def test_records_changes_returns_only_new_commits(store_with_group):
    store, g = store_with_group
    _write_batch(store, g.id, "a", 3, 1)          # version 0
    cursor = store.current_version
    _write_batch(store, g.id, "b", 2, 2)          # version 1
    _write_batch(store, g.id, "c", 4, 3)          # version 2

    feed = store.records_changes(since_version=cursor)
    rows = feed.select("entity_id", "_commit_version").collect()
    assert len(rows) == 6
    by_ver = {}
    for r in rows:
        by_ver.setdefault(r["_commit_version"], set()).add(r["entity_id"])
    assert by_ver == {
        cursor + 1: {"b0", "b1"},
        cursor + 2: {"c0", "c1", "c2", "c3"},
    }
    # full-history feed: since=-1 includes the first commit too
    assert store.records_changes(since_version=-1).count() == 9
    # bounded upper cursor
    assert (
        store.records_changes(
            since_version=cursor, to_version=cursor + 1
        ).count() == 2
    )


def test_records_changes_skips_rewrite_commits(store_with_group):
    store, g = store_with_group
    _write_batch(store, g.id, "a", 5, 1)          # v0: insert
    cursor = store.current_version
    store.compact_records(g.id)                   # v1: rewrite (no new rows)
    _write_batch(store, g.id, "b", 2, 2)          # v2: insert
    store.delete_entity_records(g.id, "a0")       # v3: rewrite
    feed = store.records_changes(since_version=cursor)
    ids = {r["entity_id"] for r in feed.select("entity_id").collect()}
    # only the v2 inserts; neither the compaction's re-added rows nor
    # the delete rewrite appear
    assert ids == {"b0", "b1"}


def test_records_changes_validates_versions(store_with_group):
    store, g = store_with_group
    _write_batch(store, g.id, "a", 2, 1)
    with pytest.raises(ValueError, match="does not exist"):
        store.records_changes(since_version=7)
    with pytest.raises(ValueError, match="does not exist"):
        store.records_changes(since_version=0, to_version=9)


def test_records_changes_raises_below_vacuum_horizon(store_with_group):
    store, g = store_with_group
    _write_batch(store, g.id, "a", 3, 1)          # v0
    _write_batch(store, g.id, "b", 3, 2)          # v1
    store.compact_records(g.id)                   # v2 supersedes v0/v1 files
    store.vacuum(retain_versions=1, orphan_grace_seconds=0.0)
    with pytest.raises(ValueError, match="vacuum horizon"):
        store.records_changes(since_version=0).count()
    # a cursor at/after the horizon still works (no reclaimed files in range)
    assert store.records_changes(since_version=2).count() == 0


def test_records_changes_random_op_sequences_match_ledger(store_with_group):
    """Property check (seeded): over random interleavings of appends,
    compactions, and entity deletes, the feed from ANY cursor equals
    the ledger of inserts made by append commits after it — rewrites
    never re-emit, regardless of where they land in the history."""
    import random as _random

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    rng = _random.Random(20260814)
    ledger = []  # (version, entity_id) per inserted record
    serial = 0
    for _ in range(8):
        op = rng.choice(["append", "append", "append", "compact", "delete"])
        if op == "append":
            n = rng.randrange(1, 4)
            recs = []
            for _i in range(n):
                serial += 1
                recs.append(
                    EntityRecord(
                        group_id=g.id,
                        entity_id=f"e{serial}",
                        feature_values={"age": serial},
                        timestamp=f"2026-03-{(serial % 27) + 1:02d}T00:00:00",
                    )
                )
            store.write_features_batch(recs)
            v = store.current_version
            ledger += [(v, r.entity_id) for r in recs]
        elif op == "compact" and store.current_version is not None:
            store.compact_records(g.id)
        elif op == "delete" and serial:
            store.delete_entity_records(g.id, f"e{rng.randrange(serial) + 1}")
    latest = store.current_version
    for cursor in sorted({-1, 0, latest // 2, latest}):
        if cursor > latest:
            continue
        got = sorted(
            (r["_commit_version"], r["entity_id"])
            for r in store.records_changes(since_version=cursor)
            .select("_commit_version", "entity_id")
            .collect()
        )
        expected = sorted((v, e) for v, e in ledger if v > cursor)
        assert got == expected, f"cursor {cursor}"


def test_records_changes_empty_store_full_history_is_empty(store):
    # -1 is the documented full-history cursor: valid on a store with
    # no commits yet (empty feed, not an error).
    assert store.records_changes(since_version=-1).count() == 0
    with pytest.raises(ValueError, match="does not exist"):
        store.records_changes(since_version=0)


def test_records_changes_includes_migrate_commit(spark, tmp_path):
    # A pre-versioning store adopted via the "migrate" version-0 commit:
    # those rows have never been through the log, so a full-history
    # feed must include them.
    import os
    import shutil

    base = str(tmp_path / "legacy")
    a = FeatureStore(spark, base)
    a.register_feature("age", "user", "int")
    g = a.create_group("g", ["age"], "user_id")
    a.write_features(g.id, "u1", {"age": 1}, timestamp="2026-01-01T00:00:00")
    # strip the commit log → a legacy unversioned layout
    shutil.rmtree(os.path.join(base, "_versions"))
    b = FeatureStore(spark, base)   # re-open runs _migrate_unversioned
    hist = b.history()
    assert hist[-1]["op"] == "migrate"
    feed = b.records_changes(since_version=-1)
    rows = feed.select("entity_id", "_commit_version").collect()
    assert [(r["entity_id"], r["_commit_version"]) for r in rows] == [
        ("u1", 0)
    ]


# -- typed wide view --------------------------------------------------------

def test_typed_records_df_casts_by_registry_dtype(spark, tmp_path):
    store = FeatureStore(spark, str(tmp_path / "fs"))
    store.register_feature("age", "user", "int")
    store.register_feature("score", "user", "float")
    store.register_feature("active", "user", "bool")
    store.register_feature("city", "user", "str")
    store.register_feature("tags", "user", "list")
    g = store.create_group(
        "wide", ["age", "score", "active", "city", "tags"], "user_id"
    )
    store.write_features(
        g.id, "u1",
        {"age": 30, "score": 1.5, "active": True,
         "city": 'Li"s\nbon', "tags": ["a", "b"],
         "undeclared": 7},                      # open schema
        timestamp="2026-01-01T00:00:00",
    )
    store.write_features(
        g.id, "u2",
        {"age": "not-a-number", "city": None},  # dtypes are advisory
        timestamp="2026-01-02T00:00:00",
    )
    wide = store.typed_records_df(g.id)
    types = dict(wide.dtypes)
    assert types["age"] == "bigint" and types["score"] == "double"
    assert types["active"] == "boolean" and types["city"] == "string"
    assert types["tags"] == "array<string>"
    assert types["_extras"] == "map<string,string>"

    rows = {r["entity_id"]: r for r in wide.collect()}
    u1 = rows["u1"]
    assert u1["age"] == 30 and u1["score"] == 1.5 and u1["active"] is True
    assert u1["city"] == 'Li"s\nbon'            # escapes round-trip
    assert u1["tags"] == ["a", "b"]
    assert u1["_extras"] == {"undeclared": "7"}
    u2 = rows["u2"]
    assert u2["age"] is None                    # uncoercible → NULL, no error
    assert u2["city"] is None
    assert u2["_extras"] == {}

    # snapshot semantics piggyback on records_df
    v0 = store.current_version
    store.write_features(g.id, "u3", {"age": 1},
                         timestamp="2026-01-03T00:00:00")
    assert store.typed_records_df(g.id, version=v0).count() == 2
    assert store.typed_records_df(g.id).count() == 3


# -- z-order compaction -----------------------------------------------------


def test_zorder_compaction_skips_on_both_dimensions(store_with_group):
    from datetime import datetime, timedelta

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    # 8 entities x 8 days, independent dimensions, written shuffled.
    recs = [
        EntityRecord(
            g.id,
            f"e{e}",
            {"age": e * 10 + d},
            datetime(2026, 3, 1) + timedelta(days=d),
        )
        for e in range(8)
        for d in range(8)
    ]
    import random

    rng = random.Random(7)
    rng.shuffle(recs)
    for i in range(0, 64, 16):
        store.write_features_batch(recs[i : i + 16])

    n = store.compact_records(
        g.id,
        target_rows_per_file=16,
        cluster_by=["entity_id", "timestamp"],
        zorder=True,
    )
    assert n == 64
    all_files = set(store.records_df(g.id).inputFiles())
    assert len(all_files) >= 4

    # Dimension 1: entity point lookup prunes via the bloom index.
    ent_files = set(store.records_df(g.id, entity_id="e3").inputFiles())
    assert 0 < len(ent_files) < len(all_files)
    # Dimension 2: an early as-of cutoff prunes via ts min/max stats.
    ts_files = set(
        store.records_df(g.id, ts_lte=datetime(2026, 3, 2)).inputFiles()
    )
    assert 0 < len(ts_files) < len(all_files)

    # Pruning never changes answers.
    assert store.get_features(g.id, "e3")["age"] == 37
    assert (
        store.records_df(g.id, ts_lte=datetime(2026, 3, 2))
        .where("timestamp <= timestamp'2026-03-02'")
        .count()
        == 16
    )


def test_zorder_vs_linear_clustering_on_second_dimension(store_with_group):
    """Lexicographic (entity, ts) clustering leaves every file spanning
    the full time range — the second dimension gains nothing. The same
    compaction with zorder=True must prune time-sliced reads."""
    from datetime import datetime, timedelta

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    recs = [
        EntityRecord(
            g.id,
            f"e{e}",
            {"age": e},
            datetime(2026, 3, 1) + timedelta(days=d),
        )
        for e in range(8)
        for d in range(8)
    ]
    store.write_features_batch(recs)

    store.compact_records(
        g.id, target_rows_per_file=16, cluster_by=["entity_id", "timestamp"]
    )
    all_linear = set(store.records_df(g.id).inputFiles())
    linear_ts = set(
        store.records_df(g.id, ts_lte=datetime(2026, 3, 2)).inputFiles()
    )
    # every file holds >= 2 full entity histories -> no ts pruning
    assert linear_ts == all_linear

    store.compact_records(
        g.id,
        target_rows_per_file=16,
        cluster_by=["entity_id", "timestamp"],
        zorder=True,
    )
    all_z = set(store.records_df(g.id).inputFiles())
    z_ts = set(
        store.records_df(g.id, ts_lte=datetime(2026, 3, 2)).inputFiles()
    )
    assert 0 < len(z_ts) < len(all_z)


def test_records_changes_include_deletes_surfaces_removed_rows(
    store_with_group,
):
    store, g = store_with_group
    _write_batch(store, g.id, "a", 3, 1)                   # v0: a0 a1 a2
    _write_batch(store, g.id, "b", 2, 2)                   # v1: b0 b1
    store.delete_entity_records(g.id, "a1")                # v2: rewrite
    feed = store.records_changes(since_version=-1, include_deletes=True)
    rows = feed.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert len(by_type["insert"]) == 5
    deletes = by_type["delete"]
    assert [r["entity_id"] for r in deletes] == ["a1"]
    assert deletes[0]["_commit_version"] == 2
    # Without the flag the schema and content are unchanged (5 inserts,
    # no _change_type column).
    plain = store.records_changes(since_version=-1)
    assert "_change_type" not in plain.columns
    assert plain.count() == 5


def test_records_changes_include_deletes_remove_only_commit(
    store_with_group,
):
    """Deleting the LAST entity in a partition commits remove-only
    (no rewrite files) — every removed row must surface as a delete."""
    store, g = store_with_group
    _write_batch(store, g.id, "solo", 2, 1)
    store.delete_entity_records(g.id, "solo0")
    store.delete_entity_records(g.id, "solo1")  # partition now empty
    feed = store.records_changes(since_version=-1, include_deletes=True)
    deletes = sorted(
        r["entity_id"]
        for r in feed.where("_change_type = 'delete'").collect()
    )
    assert deletes == ["solo0", "solo1"]


def test_records_changes_include_deletes_skips_compaction(store_with_group):
    store, g = store_with_group
    _write_batch(store, g.id, "a", 3, 1)
    _write_batch(store, g.id, "b", 3, 2)
    cursor = store.current_version
    store.compact_records(g.id, target_rows_per_file=10)
    feed = store.records_changes(
        since_version=cursor, include_deletes=True
    )
    # Compaction preserves rows: no inserts, no deletes.
    assert feed.count() == 0


def test_records_changes_deletes_below_vacuum_horizon_raise(
    store_with_group,
):
    store, g = store_with_group
    _write_batch(store, g.id, "a", 3, 1)
    store.delete_entity_records(g.id, "a0")
    _write_batch(store, g.id, "b", 2, 2)
    _write_batch(store, g.id, "c", 2, 3)
    _write_batch(store, g.id, "d", 2, 4)
    store.vacuum(retain_versions=2, orphan_grace_seconds=0)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vacuum horizon"):
        store.records_changes(
            since_version=-1, include_deletes=True
        ).count()


def test_maybe_compact_fires_only_over_threshold(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    for i in range(5):  # 5 commits -> 5 files
        store.write_features_batch(
            [EntityRecord(g.id, f"e{i}", {"age": i}, datetime(2026, 1, 1))]
        )
    # Below threshold: no rewrite, no new commit.
    v_before = store.current_version
    assert store.maybe_compact(g.id, max_files=8) == 0
    assert store.current_version == v_before
    # Over threshold: compacts everything in the partition.
    assert store.maybe_compact(g.id, max_files=3) == 5
    assert store.current_version == v_before + 1
    files = set(store.records_df(g.id).inputFiles())
    assert len(files) == 1
    # Data unchanged.
    assert store.get_features(g.id, "e3") == {"age": 3}


# -- version tags ------------------------------------------------------------


def test_tag_pins_version_and_survives_vacuum(store_with_group):
    store, g = store_with_group
    _write_batch(store, g.id, "a", 2, 1)                    # v0
    store.tag_version("training-set")                       # pins v0
    _write_batch(store, g.id, "b", 2, 2)                    # v1
    store.compact_records(g.id, target_rows_per_file=10)    # v2 rewrite
    _write_batch(store, g.id, "c", 2, 3)                    # v3
    # retention alone would reclaim v0's files...
    store.vacuum(retain_versions=1, orphan_grace_seconds=0)
    # ...but the tag protects them: the tagged read still works and
    # returns exactly the v0 state.
    tagged = store.records_df(g.id, tag="training-set")
    assert sorted(r["entity_id"] for r in tagged.collect()) == ["a0", "a1"]
    assert store.list_tags() == {"training-set": 0}
    # untagged time travel below the watermark still errors
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vacuum"):
        store.records_df(g.id, version=1).count()
    # dropping the tag releases the pin; next vacuum reclaims
    store.delete_tag("training-set")
    store.vacuum(retain_versions=1, orphan_grace_seconds=0)
    with _pytest.raises(ValueError, match="vacuum|not.*exist"):
        store.records_df(g.id, tag="training-set").count()


def test_tag_validation_and_retag(store_with_group):
    import pytest as _pytest

    store, g = store_with_group
    with _pytest.raises(ValueError, match="does not exist"):
        store.tag_version("t")  # empty store
    _write_batch(store, g.id, "a", 1, 1)
    store.tag_version("t")
    _write_batch(store, g.id, "b", 1, 2)
    assert store.tag_version("t") == 1  # retag moves the ref
    assert store.list_tags()["t"] == 1
    with _pytest.raises(ValueError, match="Invalid tag name"):
        store.tag_version("../escape")
    with _pytest.raises(ValueError, match="does not exist"):
        store.tag_version("nope", version=99)
    with _pytest.raises(ValueError, match="alone"):
        store.records_df(g.id, tag="t", version=0)
    # tagging below the vacuum watermark is rejected
    _write_batch(store, g.id, "c", 1, 3)
    store.vacuum(retain_versions=1, orphan_grace_seconds=0)
    with _pytest.raises(ValueError, match="watermark"):
        store.tag_version("old", version=0)


# -- CHECK constraints -------------------------------------------------------


def test_check_constraint_rejects_bad_batch_atomically(store_with_group):
    from datetime import datetime

    from blackroad_feature_store_spark.errors import (
        ConstraintViolationError,
    )
    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    store.add_constraint(
        g.id, "age_nonneg", "TRY_CAST(feature_values['age'] AS INT) >= 0"
    )
    store.add_constraint(g.id, "has_entity", "entity_id IS NOT NULL")
    v_before = store.current_version
    import pytest as _pytest

    with _pytest.raises(ConstraintViolationError, match="age_nonneg"):
        store.write_features_batch(
            [
                EntityRecord(g.id, "ok", {"age": 5}, datetime(2026, 1, 1)),
                EntityRecord(g.id, "bad", {"age": -1}, datetime(2026, 1, 1)),
            ]
        )
    # nothing landed — the whole batch rolled back
    assert store.current_version == v_before
    assert store.get_features(g.id, "ok") is None
    # clean batch goes through
    store.write_features_batch(
        [EntityRecord(g.id, "ok", {"age": 5}, datetime(2026, 1, 1))]
    )
    assert store.get_features(g.id, "ok") == {"age": 5}
    # compaction re-adds existing rows without re-validation cost
    store.compact_records(g.id, target_rows_per_file=10)
    assert store.get_features(g.id, "ok") == {"age": 5}


def test_check_constraint_definition_contract(store_with_group):
    import pytest as _pytest

    store, g = store_with_group
    with _pytest.raises(ValueError, match="does not analyze"):
        store.add_constraint(g.id, "broken", "no_such_column > 0")
    with _pytest.raises(ValueError, match="not found|Unknown"):
        store.add_constraint("nope", "c", "entity_id IS NOT NULL")
    store.add_constraint(g.id, "c1", "entity_id IS NOT NULL")
    assert store.list_constraints(g.id) == {"c1": "entity_id IS NOT NULL"}
    store.drop_constraint(g.id, "c1")
    assert store.list_constraints(g.id) == {}
    with _pytest.raises(ValueError, match="does not exist"):
        store.drop_constraint(g.id, "c1")


def test_corrupt_constraint_file_surfaces_instead_of_disabling(
    store_with_group,
):
    """A corrupted _constraints/<group>.json must raise, not silently
    return {} — returning {} would disable CHECK enforcement and let
    writes that should be rejected land without any signal."""
    import pytest as _pytest

    store, g = store_with_group
    store.add_constraint(g.id, "c1", "entity_id IS NOT NULL")
    path = store._constraints_path(g.id)
    with open(path, "w") as fh:
        fh.write("{not json")
    with _pytest.raises(RuntimeError, match="unreadable or corrupt"):
        store.list_constraints(g.id)
    # absent file still means "no constraints"
    import os as _os

    _os.remove(path)
    assert store.list_constraints(g.id) == {}


def test_check_constraint_null_result_counts_as_violation(
    store_with_group,
):
    """A CHECK evaluating to NULL (e.g. cast failure) must REJECT, not
    silently pass — the strict reading that protects downstream
    consumers from unparseable values."""
    from datetime import datetime

    from blackroad_feature_store_spark.errors import (
        ConstraintViolationError,
    )
    from blackroad_feature_store_spark.store import EntityRecord

    store, g = store_with_group
    store.add_constraint(
        g.id, "age_int", "TRY_CAST(feature_values['age'] AS INT) >= 0"
    )
    import pytest as _pytest

    with _pytest.raises(ConstraintViolationError, match="age_int"):
        store.write_features_batch(
            [
                EntityRecord(
                    g.id, "u1", {"age": "not-a-number"}, datetime(2026, 1, 1)
                )
            ]
        )
