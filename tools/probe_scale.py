#!/usr/bin/env python3
"""Linearity probe: time catalog queries at sf0.1 and at the
independent-shard synthetic 10×/100× corpora (see
``make_scaled_testdata.py`` for why naive duplication would lie),
best-of-N wall seconds on the current session.

    python tools/probe_scale.py [--reps 2] query [query ...]

Prints one table row per (query, scale): the PLANS_r*.md probe rows.
Scales are taken from the dirs that exist: /root/testdata/sf0.1,
/tmp/sf1_synth (10×), /tmp/sf10_synth (100×).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sf1_synth"),
    ("100x", "/tmp/sf10_synth"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from blackroad_feature_store_spark.session import get_spark

    spark = get_spark(app_name="probe-scale")
    queries = entrymod.queries()
    # warmup (same shape as bench.py)
    spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy(
        "k"
    ).count().write.format("noop").mode("overwrite").save()

    for name in args.names:
        base = None
        for label, d in SCALES:
            if not os.path.isdir(d):
                continue
            best = None
            for _ in range(args.reps):
                t0 = time.time()
                queries[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                t = time.time() - t0
                best = t if best is None else min(best, t)
            ratio = "" if base is None else f"  ratio {best / base:.1f}"
            print(f"{name} {label}: {best:.2f}s{ratio}", flush=True)
            if base is None:
                base = best


if __name__ == "__main__":
    main()
