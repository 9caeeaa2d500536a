#!/usr/bin/env python3
"""Write BASELINE_r10.json — the calibrated baseline pin — from the
current BENCH_FULL.json (policy: BASELINE.md "Baseline pinning
policy"). The pin stores per-query timings TOGETHER WITH the
calibration probes of the run that produced them, so future ratios
can divide machine drift out (`vs_pin` in bench.py).

Only regenerate when the measurement harness changes — never to
absorb a plan regression.
"""

from __future__ import annotations

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
        bench = json.load(f)
    assert bench["sf"] == 0.1, "pin only from an sf0.1 run"
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    pin = {
        "pinned_round": 10,
        "pinned_commit": commit,
        "policy": "see BASELINE.md — calibrated pin; regenerate only "
                  "on harness changes, never to absorb a regression",
        "calibration": bench["calibration"],
        "queries": bench["queries"],
    }
    out = os.path.join(REPO, "BASELINE_r10.json")
    with open(out, "w") as f:
        json.dump(pin, f, indent=1)
        f.write("\n")
    print(f"pinned {len(pin['queries'])} queries -> {out}")


if __name__ == "__main__":
    main()
