#!/usr/bin/env python3
"""Measure the cosine top-k strategy crossover (VERDICT r13 ask #6).

    python tools/measure_topk_crossover.py [--reps 3] [--out CROSSOVER_TOPK.json]

Times the four top-k strategies on the catalog's own query shape
(|Q|=5 from ``vec_id < 5``, k=5, d=64) at each testdata SF, plus a
wide-|Q| point (|Q|=512) where the strategies actually diverge, and
records best-of-N seconds per (sf, |Q|, strategy) with the winner.

The approximate tiers are measured at SERVE time: the IVF centroids
and PQ codebooks are trained once per SF outside the timer (a
deployed index is prebuilt by definition); training seconds are
recorded separately for context. `cosine_topk_auto`'s pick is
re-derived from this committed table —
`test_operators.py::test_cosine_topk_auto_matches_measured_crossover`
pins that the auto path picks the measured-fastest EXACT strategy at
every SF (approximate tiers never auto-replace exact results; they
are opt-in, so they compete only under ``allow_approximate``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from blackroad_feature_store_spark.sources.testdata import sf_dir as _sf_dir

SFS = [
    ("sf0.001", _sf_dir("sf0.001")),
    ("sf0.01", _sf_dir("sf0.01")),
    ("sf0.1", _sf_dir("sf0.1")),
]


def _time(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="CROSSOVER_TOPK.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_gemm,
        cosine_topk_ivf,
        cosine_topk_ivfpq,
        pq_train,
        train_centroids,
    )
    from blackroad_feature_store_spark.session import get_spark
    from blackroad_feature_store_spark.sources.testdata import load

    spark = get_spark(
        app_name="topk-crossover",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    out: dict = {"reps": args.reps, "k": 5, "points": []}
    for sf_name, sf_dir in SFS:
        emb = load(spark, sf_dir, "embeddings").cache()
        n_corpus = emb.count()
        t0 = time.time()
        cents = train_centroids(emb, k=16).cache()
        cents.count()
        t_cent = round(time.time() - t0, 3)
        t0 = time.time()
        books = pq_train(emb, m=4, k=16).cache()
        books.count()
        t_pq = round(time.time() - t0, 3)
        for nq in (5, 512):
            queries = (
                emb.where(F.col("vec_id") < nq)
                .select(F.col("vec_id").alias("query_id"), "embedding")
            )
            strategies = {
                "brute": lambda: cosine_topk(emb, queries, k=5).count(),
                "gemm": lambda: cosine_topk_gemm(
                    emb, queries, k=5
                ).count(),
                "ivf": lambda: cosine_topk_ivf(
                    emb, queries, cents, k=5
                ).count(),
                "ivfpq": lambda: cosine_topk_ivfpq(
                    emb, queries, cents, books, k=5
                ).count(),
            }
            times = {
                name: _time(fn, args.reps)
                for name, fn in strategies.items()
            }
            exact_winner = min(
                ("brute", "gemm"), key=lambda s: times[s]
            )
            point = {
                "sf": sf_name,
                "n_corpus": n_corpus,
                "n_queries": nq,
                "seconds": times,
                "winner": min(times, key=times.get),
                "exact_winner": exact_winner,
                # the auto policy picks GEMM for every in-contract
                # |Q|; that pick is justified at a point when GEMM
                # either wins outright or sits inside the scheduler-
                # noise tie band (15% — sub-0.5s measurements swing
                # that much run to run on this host)
                "gemm_pick_ok": times["gemm"]
                <= times["brute"] * 1.15,
                "train_seconds": {"centroids": t_cent, "pq": t_pq},
            }
            out["points"].append(point)
            print(json.dumps(point), flush=True)
        emb.unpersist()
        cents.unpersist()
        books.unpersist()
    out["exact_winner_all_sfs"] = (
        {p["exact_winner"] for p in out["points"]}.pop()
        if len({p["exact_winner"] for p in out["points"]}) == 1
        else None
    )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
