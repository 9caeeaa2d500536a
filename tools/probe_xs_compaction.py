#!/usr/bin/env python3
"""Fold-cost growth probe for the ExactSubstr partial store (VERDICT
r14 ask #5's 100 TB concern, measured): ingest N micro-batches through
``exact_substr_ingest_batch`` with and without in-stream compaction
and report the per-batch wall time of the LATE batches. Without
compaction the history fold unions one parquet partial per batch ever
ingested — per-batch cost grows with batch index; with
``compact_every=K`` it reads one snapshot + at most K-1 partials —
per-batch cost plateaus. That plateau is the claim the 100 TB design
rests on, so it is measured, not asserted.

    python tools/probe_xs_compaction.py [--batches 24] [--every 8]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--every", type=int, default=8)
    ap.add_argument("--docs-per-batch", type=int, default=200)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from blackroad_feature_store_spark.session import get_spark
    from blackroad_feature_store_spark.sources.testdata import load, sf_dir
    from blackroad_feature_store_spark.streaming.ingest import (
        exact_substr_ingest_batch,
    )

    spark = get_spark(app_name="probe-xs-compaction")
    docs = (
        load(spark, sf_dir("sf0.1"), "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(args.batches * args.docs_per_batch)
        .collect()
    )
    batches = [
        docs[i * args.docs_per_batch : (i + 1) * args.docs_per_batch]
        for i in range(args.batches)
    ]

    for label, kwargs in (
        ("no-compaction", {}),
        (
            f"compact_every={args.every}",
            {"compact_every": args.every, "compact_witness": False},
        ),
    ):
        base = tempfile.mkdtemp(prefix="xs_cmp_probe_")
        times = []
        try:
            for bid, b in enumerate(batches):
                bdf = spark.createDataFrame(
                    [(r["doc_id"], r["text"]) for r in b],
                    "doc_id long, text string",
                )
                t0 = time.time()
                exact_substr_ingest_batch(
                    bdf, bid, f"{base}/idx", f"{base}/out", L=30,
                    **kwargs,
                )
                times.append(time.time() - t0)
            q = len(times) // 4
            head = sum(times[:q]) / q
            tail = sum(times[-q:]) / q
            print(
                f"{label}: first-{q} mean {head:.2f}s, last-{q} mean "
                f"{tail:.2f}s, growth {tail / head:.2f}x, total "
                f"{sum(times):.1f}s "
                f"(per-batch: {' '.join(f'{t:.2f}' for t in times)})",
                flush=True,
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
