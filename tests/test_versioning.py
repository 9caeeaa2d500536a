"""CommitLog unit tests (no Spark): checkpointed replay, time travel,
and crash/corruption behavior of the record-table version log."""

import json
import os

from blackroad_feature_store_spark.versioning import (
    CHECKPOINT_EVERY,
    CommitLog,
    _checkpoint_name,
)


def _fill(log, n):
    for i in range(n):
        remove = [f"f{i-5}"] if i >= 5 else []
        log.commit("append", add=[{"path": f"f{i}", "min_ts": f"t{i}"}],
                   remove=remove)


def test_checkpoint_written_and_replay_equal(tmp_path):
    log = CommitLog(str(tmp_path / "log"))
    _fill(log, 25)
    cps = log._checkpoint_versions()
    assert cps == [CHECKPOINT_EVERY, 2 * CHECKPOINT_EVERY]

    with_cp = {e["path"] for e in log.live_entries()}
    # Delete every checkpoint: full replay must give the same set.
    for v in cps:
        os.unlink(os.path.join(log.dir, _checkpoint_name(v)))
    assert {e["path"] for e in log.live_entries()} == with_cp
    # Rolling remove of all but the last 5 adds.
    assert with_cp == {f"f{i}" for i in range(20, 25)}


def test_time_travel_crosses_checkpoints(tmp_path):
    log = CommitLog(str(tmp_path / "log"))
    _fill(log, 25)
    # Version 12 = commits 0..12 applied (adds f0..f12, removes f0..f7).
    at_12 = {e["path"] for e in log.live_entries(version=12)}
    assert at_12 == {f"f{i}" for i in range(8, 13)}
    # Stats survive the checkpoint round-trip.
    e = next(x for x in log.live_entries() if x["path"] == "f24")
    assert e["min_ts"] == "t24"


def test_corrupt_checkpoint_falls_back(tmp_path):
    log = CommitLog(str(tmp_path / "log"))
    _fill(log, 12)
    cp = os.path.join(log.dir, _checkpoint_name(CHECKPOINT_EVERY))
    with open(cp, "w") as fh:
        fh.write("{not json")
    assert {e["path"] for e in log.live_entries()} == {
        f"f{i}" for i in range(7, 12)
    }


def test_history_and_version_as_of_unaffected(tmp_path):
    log = CommitLog(str(tmp_path / "log"))
    _fill(log, 11)
    h = log.history()
    assert len(h) == 11 and h[0]["version"] == 10
    # checkpoint files are not manifests
    assert log.versions() == list(range(11))


def test_checkpoint_content_is_live_set(tmp_path):
    log = CommitLog(str(tmp_path / "log"))
    _fill(log, 11)
    with open(os.path.join(log.dir, _checkpoint_name(10))) as fh:
        doc = json.load(fh)
    assert doc["version"] == 10
    assert {e["path"] for e in doc["entries"]} == {
        f"f{i}" for i in range(6, 11)
    }


# -- conflict detection (Delta's DELETE/OPTIMIZE conflict contract) --------

def test_remove_set_conflict_raises(tmp_path):
    from blackroad_feature_store_spark.errors import (
        ConcurrentModificationError,
    )

    log = CommitLog(str(tmp_path / "log"))
    log.commit("append", add=["a", "b"], remove=[])
    # Writer 1 resolves its snapshot (plans to remove a+b), but writer
    # 2's delete of "a" commits first.
    log.commit("delete-entity", add=[], remove=["a"])
    import pytest

    with pytest.raises(ConcurrentModificationError, match="no longer live"):
        log.commit("compact", add=["c"], remove=["a", "b"])
    # The loser landed nothing: live set reflects only the delete, and
    # no version was burned.
    assert {e["path"] for e in log.live_entries()} == {"b"}
    assert log.latest_version() == 1


def test_remove_set_still_live_commits(tmp_path):
    # A concurrent APPEND does not conflict with a compaction: its
    # files are not in the remove set, so both commits replay cleanly.
    log = CommitLog(str(tmp_path / "log"))
    log.commit("append", add=["a"], remove=[])
    log.commit("append", add=["b"], remove=[])  # racing append
    v = log.commit("compact", add=["c"], remove=["a"])
    assert v == 2
    assert {e["path"] for e in log.live_entries()} == {"b", "c"}


def test_remove_from_empty_log_conflicts(tmp_path):
    from blackroad_feature_store_spark.errors import (
        ConcurrentModificationError,
    )
    import pytest

    log = CommitLog(str(tmp_path / "log"))
    with pytest.raises(ConcurrentModificationError):
        log.commit("delete-entity", add=[], remove=["ghost"])


# -- version_as_of under non-monotonic commit timestamps -------------------

def test_version_as_of_non_monotonic_ts(tmp_path):
    # Concurrent writers / clock skew can commit out-of-order ts
    # fields. The contract is max(v where ts(v) <= target) over the
    # FULL log — an early break at the first future ts would wrongly
    # resolve to an older version.
    log = CommitLog(str(tmp_path / "log"))
    for p in ("a", "b", "c"):
        log.commit("append", add=[p], remove=[])

    def _set_ts(version, ts):
        path = os.path.join(log.dir, f"{version:08d}.json")
        with open(path) as fh:
            doc = json.load(fh)
        doc["ts"] = ts
        with open(path, "w") as fh:
            json.dump(doc, fh)

    _set_ts(0, "2026-01-01T00:00:00+00:00")
    _set_ts(1, "2026-01-03T00:00:00+00:00")  # skewed clock: late ts
    _set_ts(2, "2026-01-02T00:00:00+00:00")

    # Target between v2's and v1's ts: v2 qualifies and is the max
    # qualifying version, even though v1's ts is in the future.
    assert log.version_as_of("2026-01-02T00:00:00+00:00") == 2
    assert log.version_as_of("2026-01-01T12:00:00+00:00") == 0
    assert log.version_as_of("2026-01-04T00:00:00+00:00") == 2


def test_referenced_paths_covers_removed(tmp_path):
    log = CommitLog(str(tmp_path / "log"))
    log.commit("append", add=[{"path": "a", "min_ts": "t"}], remove=[])
    log.commit("compact", add=["b"], remove=["a"])
    assert log.referenced_paths() == {"a", "b"}


def test_referenced_paths_reads_only_post_checkpoint_manifests(tmp_path):
    # The added_paths checkpoint sidecar bounds the vacuum scan: after a
    # checkpoint at version 20, referenced_paths() must open only the
    # manifests newer than it — O(new commits), not O(history).
    log = CommitLog(str(tmp_path / "log"))
    _fill(log, 25)  # checkpoints at 10 and 20

    opened = []
    orig_read = CommitLog.read
    CommitLog.read = lambda self, v: (opened.append(v), orig_read(self, v))[1]
    try:
        paths = log.referenced_paths()
    finally:
        CommitLog.read = orig_read
    assert paths == {f"f{i}" for i in range(25)}  # removed ones included
    assert opened and min(opened) > 2 * CHECKPOINT_EVERY


def test_referenced_paths_falls_back_without_sidecar(tmp_path):
    # Pre-sidecar checkpoints (no added_paths key) can't serve the
    # vacuum scan; the full manifest walk must still be correct.
    log = CommitLog(str(tmp_path / "log"))
    _fill(log, 12)  # checkpoint at 10
    cp_path = os.path.join(log.dir, _checkpoint_name(CHECKPOINT_EVERY))
    with open(cp_path) as fh:
        doc = json.load(fh)
    del doc["added_paths"]
    with open(cp_path, "w") as fh:
        json.dump(doc, fh)
    assert log.referenced_paths() == {f"f{i}" for i in range(12)}


def test_added_paths_sidecar_extends_incrementally(tmp_path):
    # The version-20 checkpoint is built from the version-10 sidecar +
    # manifests 11..20, so corrupting checkpoint 10 AFTER 20 exists
    # must not matter, and the sidecar carries removed-then-gone paths.
    log = CommitLog(str(tmp_path / "log"))
    _fill(log, 25)
    cp20 = os.path.join(log.dir, _checkpoint_name(2 * CHECKPOINT_EVERY))
    with open(cp20) as fh:
        doc = json.load(fh)
    assert set(doc["added_paths"]) == {f"f{i}" for i in range(21)}
