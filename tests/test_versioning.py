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
