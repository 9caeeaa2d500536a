#!/usr/bin/env python3
"""Measure the scheme'd-URI (Hadoop FileSystem API) overhead of the
ExactSubstr maintained-index store vs the plain-OS-path fast path
(round 16, VERDICT r15 ask #5 follow-through).

Same 4-batch ingest of the sf documents table into two fresh stores —
one addressed by a plain path (os-glob discovery, pyarrow sidecars),
one by a ``file://`` URI (all discovery/footer/marker traffic through
``streaming/fsio.py``'s Hadoop backend) — per-batch wall times and
identical-output verification. The Hadoop backend's costs are pure FS
metadata round-trips (O(partials) listings + O(1) sidecar reads per
batch), so the per-batch delta should be a small constant, not a
multiplier; this probe pins that with numbers.

    python tools/probe_fsio_overhead.py --sf /root/testdata/sf0.1 \
        [--batches 4] [--rounds 2]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=2,
                    help="repetitions per side; per-batch minima win")
    args = ap.parse_args()

    from blackroad_feature_store_spark.session import get_spark
    from blackroad_feature_store_spark.sources.testdata import load
    from blackroad_feature_store_spark.streaming.ingest import (
        exact_substr_ingest_batch,
    )
    from pyspark.sql import functions as F

    spark = get_spark(app_name="probe-fsio")
    docs = load(spark, args.sf, "documents").select("doc_id", "text")
    n = docs.count()
    # Split on doc_id QUANTILES, not absolute ranges — scaled shards
    # (make_scaled_testdata) offset ids per replica, so an absolute
    # range split degenerates to one fat batch. Quantile cuts keep
    # every id in batch i below every id in batch i+1, which the
    # ingest gate's monotone-arrival contract requires.
    cuts = docs.approxQuantile(
        "doc_id",
        [i / args.batches for i in range(1, args.batches)],
        0.0,
    )
    bounds = [float("-inf")] + cuts + [float("inf")]
    batches = [
        docs.where(
            (F.col("doc_id") > bounds[i]) & (F.col("doc_id") <= bounds[i + 1])
        ).localCheckpoint()
        for i in range(args.batches)
    ]
    sizes = [b.count() for b in batches]
    print(f"{n} docs -> batches {sizes}", file=sys.stderr)

    def run_side(store: str) -> list[float]:
        ts = []
        for bid, b in enumerate(batches):
            t0 = time.time()
            exact_substr_ingest_batch(
                b, bid, f"{store}/idx", f"{store}/out", L=50
            )
            ts.append(time.time() - t0)
        return ts

    best = {"plain": [float("inf")] * args.batches,
            "uri": [float("inf")] * args.batches}
    outs = {}
    for r in range(args.rounds):
        for side in ("plain", "uri") if r % 2 == 0 else ("uri", "plain"):
            base = tempfile.mkdtemp(prefix=f"fsio-{side}-")
            store = base if side == "plain" else f"file://{base}"
            ts = run_side(store)
            best[side] = [min(a, b) for a, b in zip(best[side], ts)]
            outs[side] = sorted(
                (row["doc_id"], row["text"])
                for row in spark.read.parquet(f"{store}/out").collect()
            )
            print(
                f"round {r} {side}: "
                + " ".join(f"{t:.2f}" for t in ts)
                + f"  total {sum(ts):.2f}s",
                file=sys.stderr,
            )
            if r == args.rounds - 1:
                shutil.rmtree(base, ignore_errors=True)

    assert outs["plain"] == outs["uri"], "scheme'd output diverged!"
    tot_p, tot_u = sum(best["plain"]), sum(best["uri"])
    print("per-batch minima:")
    for i, (p, u) in enumerate(zip(best["plain"], best["uri"])):
        print(f"  batch {i}: plain {p:.2f}s  file:// {u:.2f}s  "
              f"delta {u - p:+.2f}s")
    print(f"totals: plain {tot_p:.2f}s  file:// {tot_u:.2f}s  "
          f"ratio {tot_u / tot_p:.3f}  (outputs identical)")


if __name__ == "__main__":
    main()
