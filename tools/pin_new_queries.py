#!/usr/bin/env python3
"""Pin-at-birth for catalog queries added after the r10 repin
(VERDICT r12 missing #1 / ask #2).

`BASELINE_r10.json` is immutable (policy: BASELINE.md — regenerate
only on harness changes, never to absorb a regression), which left
every query registered since r10 with `vs_pin: null`: the drift
machinery was blind on exactly the newest, least-soaked operators.
This tool records a SUPPLEMENTARY pin for each such query at its
first quiet-machine sf0.1 measurement, into `BASELINE_SUPP.json` —
a separate file so the r10 pin stays untouched. Each entry stores the
pinned seconds TOGETHER WITH the calibration probes of the run that
produced it, so `bench.py` divides that query's future ratios by the
drift measured against ITS OWN pin-time machine state (exactly the
r10 `vs_pin` arithmetic, per entry).

    python tools/pin_new_queries.py --round 13            # from BENCH_FULL.json
    python tools/pin_new_queries.py --round 13 --dry-run
    python tools/pin_new_queries.py --round 13 \
        --extra /tmp/runA.json /tmp/runB.json   # best-of-N across runs

With ``--extra``, the pinned seconds are the per-query MINIMUM across
the given same-epoch bench runs and the recorded calibration is the
per-probe minimum across the same runs — the same best-of estimator
bench.py uses within a run, with N times the samples. Use this when
single runs are jittery (same-session back-to-back runs only; mixing
epochs would pair times and probes from different machine states).

Policy mirror of BASELINE.md: an entry is written ONCE, at the
query's registration round, and never updated to absorb a regression.
Re-running the tool only adds entries for queries that have none.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True,
                    help="round number recorded on new entries")
    ap.add_argument("--bench", default=os.path.join(REPO, "BENCH_FULL.json"),
                    help="bench artifact to pin from (must be sf0.1)")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional same-epoch bench artifacts; pin = "
                         "per-query/per-probe min across all runs")
    ap.add_argument("--repin", nargs="*", default=[],
                    help="existing supplementary entries to REPLACE — "
                         "pin-QUALITY corrections only (BASELINE.md "
                         "round-16 rule: a multi-second stream pin "
                         "taken from one epoch never saw a "
                         "representative machine state); requires "
                         "--extra with >= 2 additional same-epoch runs "
                         "so the new pin is a multi-run minimum")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    if args.repin and len(args.extra) < 2:
        raise SystemExit(
            "--repin requires --extra with >= 2 additional same-epoch "
            "runs (multi-run minima rule, BASELINE.md)"
        )

    with open(args.bench) as f:
        bench = json.load(f)
    assert bench["sf"] == 0.1, "pin only from an sf0.1 run"
    for path in args.extra:
        with open(path) as f:
            other = json.load(f)
        assert other["sf"] == 0.1, f"{path}: pin only from sf0.1 runs"
        for name, t in other.get("queries", {}).items():
            if t > 0 and (bench["queries"].get(name, 0) <= 0
                          or t < bench["queries"][name]):
                bench["queries"][name] = t
        for probe, v in other.get("calibration", {}).items():
            cur = bench.setdefault("calibration", {}).get(probe, 0)
            if v > 0 and (cur <= 0 or v < cur):
                bench["calibration"][probe] = v

    with open(os.path.join(REPO, "BASELINE_r10.json")) as f:
        r10 = set(json.load(f)["queries"])

    supp_path = os.path.join(REPO, "BASELINE_SUPP.json")
    if os.path.exists(supp_path):
        with open(supp_path) as f:
            supp = json.load(f)
    else:
        supp = {
            "policy": "pin-at-birth supplement to BASELINE_r10.json "
                      "(see BASELINE.md) — one entry per query "
                      "registered after the r10 repin, written once at "
                      "its first quiet-machine sf0.1 run with that "
                      "run's calibration probes; never updated to "
                      "absorb a regression",
            "entries": {},
        }

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()

    added = []
    for name, t in bench["queries"].items():
        if name in r10 or t <= 0:
            continue
        if name in supp["entries"] and name not in args.repin:
            continue
        entry = {
            "t": t,
            "calibration": bench.get("calibration", {}),
            "pinned_round": args.round,
            "pinned_commit": commit,
        }
        if name in args.repin and name in supp["entries"]:
            entry["repinned_from"] = {
                "t": supp["entries"][name]["t"],
                "round": supp["entries"][name].get("pinned_round"),
                "reason": "pin-quality correction: multi-run minima "
                          "(BASELINE.md r16 rule)",
            }
        supp["entries"][name] = entry
        added.append(name)

    if args.dry_run:
        print(f"would add {len(added)}: {sorted(added)}")
        return
    with open(supp_path, "w") as f:
        json.dump(supp, f, indent=1)
        f.write("\n")
    print(
        f"added {len(added)} entries (total "
        f"{len(supp['entries'])}) -> {supp_path}"
    )
    for n in sorted(added):
        print(f"  {n}: {supp['entries'][n]['t']}s")


if __name__ == "__main__":
    main()
