#!/usr/bin/env python3
"""Interleaved A/B benchmark between two repo trees in ONE Spark
session — the repo's gold-standard estimator for "did the code get
slower?" across rounds (BASELINE.md measurement policy; VERDICT r15
ask #3).

Cross-round raw bench totals on this host are ±25% (turbo/throttle on
minute timescales), so old-artifact vs new-artifact comparisons are
uninterpretable. This script removes the host variable: both trees'
query catalogs run ALTERNATELY inside the same session, so every
old/new pair experiences the same machine state to within seconds.
Per-query minima over R rounds (and over multiple sessions — rerun
with --append) are the estimator; the published number for a query is
new_min / old_min.

    python tools/ab_interleave.py --old /tmp/r13tree --new /root/repo \
        --sf /root/testdata/sf0.1 --rounds 3 --out /tmp/ab_r16.json

Each side's ``plans.driver_queries`` is imported fresh per round with
a sys.modules purge (the two trees' package versions must never
coexist); only queries present in BOTH catalogs run. Round order
alternates (old-first on even rounds, new-first on odd) so slow
thermal drift cancels in expectation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _load_queries(tree: str):
    for m in list(sys.modules):
        if m.startswith("blackroad_feature_store_spark") or m == "__spark_entry__":
            del sys.modules[m]
    sys.path.insert(0, tree)
    try:
        import blackroad_feature_store_spark.plans.driver_queries as dq
        return dict(dq.QUERIES)
    finally:
        sys.path.remove(tree)


def _run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True)
    ap.add_argument("--new", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="/tmp/ab_interleave.json")
    ap.add_argument(
        "--append", action="store_true",
        help="merge minima into an existing --out file (multi-session)",
    )
    ap.add_argument("names", nargs="*", help="subset of query names")
    args = ap.parse_args()

    sys.path.insert(0, args.new)
    from blackroad_feature_store_spark.session import get_spark

    sys.path.remove(args.new)
    spark = get_spark(app_name="ab-interleave")

    common = None
    for tree in (args.old, args.new):
        qs = set(_load_queries(tree))
        common = qs if common is None else (common & qs)
    names = sorted(args.names or common)
    skipped = sorted(set(args.names or []) - common) if args.names else []
    if skipped:
        print(f"skipping (not in both trees): {skipped}", file=sys.stderr)
    names = [n for n in names if n in common]
    print(f"{len(names)} common queries, {args.rounds} rounds", file=sys.stderr)

    best: dict[str, dict[str, float]] = {
        n: {"old": float("inf"), "new": float("inf")} for n in names
    }
    if args.append and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f).get("best", {})
        for n, d in prior.items():
            if n in best:
                best[n]["old"] = min(best[n]["old"], d.get("old", float("inf")))
                best[n]["new"] = min(best[n]["new"], d.get("new", float("inf")))

    for r in range(args.rounds):
        sides = [("old", args.old), ("new", args.new)]
        if r % 2:
            sides.reverse()
        for side, tree in sides:
            queries = _load_queries(tree)
            t_side0 = time.time()
            for n in names:
                try:
                    t = _run_once(spark, queries[n], args.sf)
                except Exception as exc:
                    print(f"  {side} {n}: ERROR {exc}", file=sys.stderr)
                    continue
                if t < best[n][side]:
                    best[n][side] = t
            print(
                f"round {r} {side}: {time.time() - t_side0:.1f}s",
                file=sys.stderr,
            )

    ratios = {
        n: round(d["new"] / d["old"], 3)
        for n, d in best.items()
        if d["old"] not in (0, float("inf"))
        and d["new"] != float("inf")
    }
    tot_old = sum(d["old"] for d in best.values() if d["old"] != float("inf"))
    tot_new = sum(d["new"] for d in best.values() if d["new"] != float("inf"))
    out = {
        "old_tree": args.old,
        "new_tree": args.new,
        "sf": args.sf,
        "rounds": args.rounds,
        "best": {
            n: {k: round(v, 3) for k, v in d.items() if v != float("inf")}
            for n, d in best.items()
        },
        "ratios": ratios,
        "total_old": round(tot_old, 2),
        "total_new": round(tot_new, 2),
        "total_ratio": round(tot_new / tot_old, 3) if tot_old else None,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:15]
    print(json.dumps({"total_ratio": out["total_ratio"], "worst": worst}))


if __name__ == "__main__":
    main()
