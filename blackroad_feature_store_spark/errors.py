"""Error contract, mirroring the reference's (SURVEY.md §2.12).

The reference raises bare ``ValueError`` everywhere
(``feature_store.py:217-218,284-286,343-344,460-461``); we keep
``ValueError`` compatibility by subclassing it, while giving callers
typed exceptions to catch.
"""


class FeatureStoreError(ValueError):
    """Base class; subclasses ValueError for reference parity."""


class InvalidDtypeError(FeatureStoreError):
    """Invalid dtype at registration (feature_store.py:217-218)."""


class UnknownFeatureError(FeatureStoreError):
    """Group references an unregistered feature (feature_store.py:284-286)."""


class UnknownGroupError(FeatureStoreError):
    """Write/stats against a missing group (feature_store.py:343-344,460-461)."""


class GroupExistsError(FeatureStoreError):
    """Duplicate (name, version) — the reference surfaces SQLite's UNIQUE
    constraint (feature_store.py:175)."""


class ConcurrentModificationError(FeatureStoreError):
    """A commit's remove set conflicts with a concurrent commit.

    Raised when an optimistic commit (compaction, delete) finds that a
    file it planned to remove is no longer live at the current latest
    version — another writer removed it first. Replaying both commits
    would double the surviving rows (and could resurrect erased
    entities), so the later writer must abort and re-resolve its
    snapshot. This is Delta Lake's published conflict-detection
    contract for DELETE/OPTIMIZE racing each other; the reference gets
    linear history for free from SQLite (feature_store.py:178-186)."""


class ConstraintViolationError(FeatureStoreError):
    """A write batch contained rows violating a table CHECK constraint."""
