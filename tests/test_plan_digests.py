"""Plan-digest regression wire (VERDICT r9 item 3).

``PLANDIGESTS.json`` (written by ``tools/plan_digests.py``) pins a
normalized physical-plan fingerprint for every catalog query. This
test regenerates the digests for a WATCHED SUBSET — the keeper
queries plus the four queries whose r9 bench drift cost a forensic
session — in a subprocess (same session shape as the tool, so
partition counts in Exchange nodes match) and fails if any digest
moved without ``PLANDIGESTS.json`` being regenerated and committed
alongside the change. That makes "plan changed vs machine changed" a
one-line ``git diff`` answer instead of a re-measurement hunt.

On digest mismatch: re-run ``python tools/plan_digests.py`` (full
catalog), eyeball the ``ops`` diff of the moved queries, explain the
movement in the round's PLANS file, and commit the regenerated json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from blackroad_feature_store_spark.sources.testdata import (
    sf_dir as _sf_dir,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WATCHED = [
    # keepers: the signature execution path
    "core_pit_join",
    "core_asof_top1",
    # the r9 drift watch-list (VERDICT r9 "What's wrong" #2)
    "sim_cosine_topk_ivf",
    "text_quality_profile",
    "text_stats_by_source",
    "mm_asset_metadata",
    # a TPC-H classic: scan+agg shape, broad coverage for one plan
    "tpch_q1_pricing",
    # r15 widening (the guard runs in CI now, so watch one
    # representative of each major plan family; all verified
    # construction-only, value-independent on a generated root, and
    # ~2 s each to fingerprint):
    "tpch_q9_product_profit",     # multi-join aggregation
    "dedup_minhash_pairs",        # explode + banded self-join
    "link_blocked_pairs_capped",  # window-truncation blocking
    "core_range_join",            # range-condition join
    "core_salted_join",           # salted skew pattern
    "sim_cosine_topk_gemm",       # column-algebra GEMM
    "pipeline_pack_sequences",    # sequence packing
    "drift_psi",                  # binned distribution compare
    "core_sessionize",            # gaps-and-islands windows
    # r16 widening (VERDICT r15 ask #6): previously realization-
    # sensitive via data-derived literals, now canonicalized by
    # targeted QUERY_SUBS / the uuid-seed normalization in
    # tools/plan_digests.py (verified digest-stable across data
    # realizations); stats_hll_distinct and stream_exec_ivf_maintained
    # stay unwatched — documented in plan_digests.py: their variance
    # IS the signal (join-strategy flip / executed-batch lineage)
    "core_uuid_shape",
    "pipeline_token_budget_select",
    "text_bm25_search",
]


def test_plan_digest_file_covers_whole_catalog():
    """PLANDIGESTS.json must have a non-error digest for EVERY
    catalog query — a query added without regenerating the file
    would silently escape the plan watch."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    with open(os.path.join(REPO, "PLANDIGESTS.json")) as f:
        digests = json.load(f)
    missing = [n for n in entrymod.queries() if n not in digests]
    broken = [n for n, v in digests.items() if not v.get("digest")]
    stale = [n for n in digests if n not in entrymod.queries()]
    assert not missing, f"queries without a plan digest: {missing}"
    assert not broken, f"digest errors recorded: {broken}"
    assert not stale, f"digests for removed queries: {stale}"


def test_watched_plan_digests_match_committed(tmp_path):
    """Runs on GENERATED testdata roots too (VERDICT r14 ask #6: the
    old generated-root skip meant CI never guarded plan shape). The
    watched digests were verified value-independent on a generated
    sf0.1 root in r15 — plans for these construction-only queries
    depend on schema + session shape, not data realization. They DO
    depend on the session's CPU/shuffle-partition count (partition
    counts print in Exchange nodes), so the subprocess pins the
    canonical local[32] shape regardless of the CI machine: digest
    generation for the watched set builds plans without executing
    them, so an oversubscribed local[32] on a 4-core runner is free."""
    committed_path = os.path.join(REPO, "PLANDIGESTS.json")
    assert os.path.exists(committed_path), (
        "PLANDIGESTS.json missing — run: python tools/plan_digests.py"
    )
    with open(committed_path) as f:
        committed = json.load(f)

    out = str(tmp_path / "digests.json")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "plan_digests.py"),
            "--sf",
            _sf_dir("sf0.1"),
            "--out",
            out,
            *WATCHED,
        ],
        check=True,
        cwd=REPO,
        capture_output=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": "32"},
    )
    with open(out) as f:
        fresh = json.load(f)

    moved = {}
    for name in WATCHED:
        assert name in committed, f"{name} absent from PLANDIGESTS.json"
        if fresh[name]["digest"] != committed[name]["digest"]:
            moved[name] = {
                "committed": committed[name],
                "fresh": fresh[name],
            }
    assert not moved, (
        "physical plan changed for watched queries without regenerating "
        "PLANDIGESTS.json — run `python tools/plan_digests.py`, explain "
        f"the movement in PLANS_r*.md, commit the json. Moved: "
        f"{json.dumps(moved, indent=1)}"
    )
