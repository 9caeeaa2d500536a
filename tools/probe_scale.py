#!/usr/bin/env python3
"""Linearity probe: time catalog queries at sf0.1 and at the
independent-shard synthetic 10×/100× corpora (see
``make_scaled_testdata.py`` for why naive duplication would lie),
best-of-N wall seconds on the current session.

    python tools/probe_scale.py [--reps 2] query [query ...]

Prints one table row per (query, scale): the PLANS_r*.md probe rows.
Scales are taken from the dirs that exist: /root/testdata/sf0.1,
/tmp/sf1_synth (10×), /tmp/sf10_synth (100×).

Eval-bounded operators (VERDICT r10 missing #2): a decontamination
pass's contract is "corpus scales, eval set does not" — eval sets are
MBs by definition. The generic probe derives every frame from the
scaled dir, so for these queries it used to scale the eval slice WITH
the corpus and publish a superlinear ratio that was a harness
artifact, not a plan property (the 116× footnote in PLANS_r10.md).
``FIXED_EVAL`` queries are therefore rebuilt here with the eval /
benchmark side pinned to the sf0.1 base dir while only the training
corpus scales — the contract-true probe. The similarity family and
``text_bm25_search`` need no entry: their query sides are already
absolute (``vec_id < 5`` — the shard generator offsets replica ids,
so the slice stays 5 rows at every scale — and a fixed query string).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from blackroad_feature_store_spark.sources.testdata import sf_dir as _sf_dir

SCALES = [
    ("sf0.1", _sf_dir("sf0.1")),
    ("10x", "/tmp/sf1_synth"),
    ("100x", "/tmp/sf10_synth"),
]

BASE_DIR = _sf_dir("sf0.1")


def _fixed_eval_decontaminate(word_shingles: bool):
    """Contract-true decontamination probe: train side from the scaled
    dir, benchmark side ALWAYS the sf0.1 doc_id%23 slice (same
    normalize/fingerprint/aggregate shape as the catalog query)."""

    def build(spark, scaled_dir):
        from pyspark.sql import functions as F

        from blackroad_feature_store_spark.operators.corpus import (
            decontaminate,
            decontaminate_winnow,
        )
        from blackroad_feature_store_spark.sources.testdata import load

        from blackroad_feature_store_spark.operators.util import spread

        bench = load(spark, BASE_DIR, "documents").where(
            F.col("doc_id") % 23 == 0
        )
        train = spread(load(spark, scaled_dir, "documents"), "doc_id")
        if word_shingles:
            flagged = decontaminate(train, bench, n=5, id_col="doc_id")
        else:
            flagged = decontaminate_winnow(
                train, bench, id_col="doc_id", k=8, window=4, min_shared=2
            )
        return flagged.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(
                F.when(F.col("contaminated"), 1).otherwise(0)
            ).alias("n_contaminated"),
        )

    return build


def _fixed_eval_stream_decontaminate(spark, scaled_dir):
    """Contract-true STREAMING decontamination probe: eval fingerprints
    from the sf0.1 doc_id%23 slice (static side), the scaled corpus
    streamed through the gate in >= 2 real micro-batches — the same
    drain as the catalog query with only the train side scaling."""
    import tempfile

    from pyspark.sql import functions as F

    from blackroad_feature_store_spark.sources.testdata import load
    from blackroad_feature_store_spark.streaming.quality import (
        eval_winnow_fingerprints,
        merge_expectations,
        start_decontamination_stream,
    )

    fps = eval_winnow_fingerprints(
        load(spark, BASE_DIR, "documents").where(
            F.col("doc_id") % 23 == 0
        ),
        k=8, window=4,
    )
    base = tempfile.mkdtemp(prefix="probe_decon_")
    src = f"{base}/src"
    train = (
        load(spark, scaled_dir, "documents")
        .where(F.col("doc_id") % 23 != 0)
        .select("doc_id", "text")
    )
    train.where(F.col("doc_id") % 2 == 0).repartition(8).write.parquet(src)
    train.where(F.col("doc_id") % 2 != 0).repartition(8).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "8")
        .parquet(src)
    )
    q_ = start_decontamination_stream(
        stream, fps, f"{base}/store", f"{base}/ckpt", id_col="doc_id",
        k=8, window=4, min_shared=2, available_now=True,
    )
    q_.awaitTermination()
    return merge_expectations(spark, f"{base}/store")


def _fixed_eval_stream_exact_substr(spark, scaled_dir):
    """Contract-true STREAMING ExactSubstr gate probe: eval window
    strings from the sf0.1 doc_id%23 slice (static side), the scaled
    corpus streamed through the gate in >= 2 real micro-batches —
    only the train side scales."""
    import tempfile

    from pyspark.sql import functions as F

    from blackroad_feature_store_spark.sources.testdata import load
    from blackroad_feature_store_spark.streaming.quality import (
        eval_exact_substr_grams,
        merge_expectations,
        start_exact_substr_stream,
    )

    grams = eval_exact_substr_grams(
        load(spark, BASE_DIR, "documents").where(
            F.col("doc_id") % 23 == 0
        ),
        L=20,
    )
    base = tempfile.mkdtemp(prefix="probe_exsub_")
    src = f"{base}/src"
    train = (
        load(spark, scaled_dir, "documents")
        .where(F.col("doc_id") % 23 != 0)
        .select("doc_id", "text")
    )
    train.where(F.col("doc_id") % 2 == 0).repartition(8).write.parquet(src)
    train.where(F.col("doc_id") % 2 != 0).repartition(8).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "8")
        .parquet(src)
    )
    q_ = start_exact_substr_stream(
        stream, grams, f"{base}/store", f"{base}/ckpt", id_col="doc_id",
        L=20, min_shared=1, available_now=True,
    )
    q_.awaitTermination()
    return merge_expectations(spark, f"{base}/store")


def _scaled_k_semantic_dedup(spark, scaled_dir):
    """Contract-true SemDeDup probe: the operator's documented scale
    configuration is k ~ sqrt(n) (dedup.py:503), which keeps cluster
    sizes — and hence the quadratic member prune — at O(sqrt(n)). The
    catalog query pins k=8 only so the oracle can replay the trained
    index; probing k=8 at 100x grows clusters linearly and measures
    the toy configuration, not the contract (it exhausts netty direct
    memory around 200k x 25k-member clusters)."""
    import math

    from pyspark.sql import functions as F

    from blackroad_feature_store_spark.operators.clustering import (
        kmeans_fit_predict,
    )
    from blackroad_feature_store_spark.operators.dedup import semantic_dedup
    from blackroad_feature_store_spark.sources.testdata import load

    emb = load(spark, scaled_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    k = max(8, math.isqrt(emb.count()))
    _, cents = kmeans_fit_predict(
        emb, k=k, iterations=3, return_centroids=True
    )
    centroids = cents.select(
        F.col("cid").alias("centroid_id"),
        F.transform("cv", lambda x: x.cast("double")).alias("embedding"),
    )
    return semantic_dedup(emb, centroids, threshold=0.3)


def _exact_substr_removal_L50(spark, scaled_dir):
    """Production-parameter probe (VERDICT r12 ask #7): the ExactSubstr
    rewrite at the advertised L=50 over the scaled corpus. The catalog
    runs L=30 so toy SFs have non-zero violations (right for oracles);
    this row exercises the headline configuration on the 10x/100x
    shards so the production parameter is measured somewhere."""
    from blackroad_feature_store_spark.operators.exactsubstr import (
        exact_substr_removal,
    )
    from blackroad_feature_store_spark.sources.testdata import load

    docs = load(spark, scaled_dir, "documents").select("doc_id", "text")
    return exact_substr_removal(docs, L=50)


FIXED_EVAL = {
    "dedup_exact_substr_L50": _exact_substr_removal_L50,
    "pipeline_decontaminate": _fixed_eval_decontaminate(True),
    "pipeline_decontaminate_winnow": _fixed_eval_decontaminate(False),
    "stream_exec_decontaminate": _fixed_eval_stream_decontaminate,
    "stream_exec_exact_substr_gate": _fixed_eval_stream_exact_substr,
    "dedup_semantic_kmeans": _scaled_k_semantic_dedup,
}

TAGS = {
    "dedup_exact_substr_L50": " [removal at production L=50]",
    "pipeline_decontaminate": " [eval side held at sf0.1]",
    "pipeline_decontaminate_winnow": " [eval side held at sf0.1]",
    "stream_exec_decontaminate": " [eval side held at sf0.1]",
    "stream_exec_exact_substr_gate": " [eval side held at sf0.1]",
    "dedup_semantic_kmeans": " [k scaled ~ sqrt(n), the documented contract]",
}


def exactsubstr_footprint(spark) -> None:
    """Measured persisted-index footprint per tier (VERDICT r14 ask
    #5): windows, parquet bytes, and bytes/window-position for the
    full maintained index (__h,__h2,n,keep_id,keep_start), the
    keeperless rewrite tier (__h,__h2,n — ingest-exact, singletons
    retained) and the singleton-pruned dup tier (n >= 2 —
    detect-only), against the corpus's own text bytes, at every scale
    dir present. L=50 (the production headline parameter)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from blackroad_feature_store_spark.operators.exactsubstr import (
        exact_substr_dup_tier,
        exact_substr_index,
        exact_substr_rewrite_tier,
    )
    from blackroad_feature_store_spark.sources.testdata import load

    def _dir_bytes(p: str) -> int:
        total = 0
        for root, _, files in os.walk(p):
            for f in files:
                if not f.startswith(("_", ".")):
                    total += os.path.getsize(os.path.join(root, f))
        return total

    for label, d in SCALES:
        if not os.path.isdir(d):
            continue
        docs = load(spark, d, "documents").select("doc_id", "text")
        text_bytes = int(
            docs.agg(F.sum(F.octet_length("text"))).first()[0]
        )
        base = tempfile.mkdtemp(prefix="xsfoot_")
        try:
            idx = exact_substr_index(docs, L=50).localCheckpoint()
            n_windows = int(idx.agg(F.sum("n")).first()[0])
            n_rows = idx.count()
            idx.write.parquet(f"{base}/full")
            exact_substr_rewrite_tier(idx).write.parquet(
                f"{base}/rewrite"
            )
            dup = exact_substr_dup_tier(idx).localCheckpoint()
            dup_rows = dup.count()
            dup.write.parquet(f"{base}/dup")
            full_b = _dir_bytes(f"{base}/full")
            rw_b = _dir_bytes(f"{base}/rewrite")
            dup_b = _dir_bytes(f"{base}/dup")
            print(
                f"{label}: corpus {text_bytes / 1e6:.1f} MB text, "
                f"{n_windows} windows ({n_rows} distinct) | "
                f"full {full_b / 1e6:.1f} MB = "
                f"{full_b / max(n_windows, 1):.1f} B/pos "
                f"({full_b / text_bytes:.2f}x text) | "
                f"rewrite-tier {rw_b / 1e6:.1f} MB = "
                f"{rw_b / max(n_windows, 1):.1f} B/pos "
                f"({rw_b / text_bytes:.2f}x text) | "
                f"dup-tier {dup_b / 1e6:.2f} MB, "
                f"{dup_rows} rows "
                f"({100.0 * dup_rows / max(n_rows, 1):.1f}% of full)",
                flush=True,
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--exactsubstr-footprint",
        action="store_true",
        help="measure persisted ExactSubstr index bytes per tier "
        "instead of timing queries",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from blackroad_feature_store_spark.session import get_spark

    spark = get_spark(app_name="probe-scale")
    if args.exactsubstr_footprint:
        exactsubstr_footprint(spark)
        return
    if not args.names:
        ap.error("query names required (or --exactsubstr-footprint)")
    queries = entrymod.queries()
    # warmup (same shape as bench.py)
    spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy(
        "k"
    ).count().write.format("noop").mode("overwrite").save()

    for name in args.names:
        fixed = FIXED_EVAL.get(name)
        tag = TAGS.get(name, "") if fixed else ""
        base = None
        for label, d in SCALES:
            if not os.path.isdir(d):
                continue
            best = None
            for _ in range(args.reps):
                t0 = time.time()
                df = fixed(spark, d) if fixed else queries[name](spark, d)
                df.write.format("noop").mode("overwrite").save()
                t = time.time() - t0
                best = t if best is None else min(best, t)
            ratio = "" if base is None else f"  ratio {best / base:.1f}"
            print(f"{name} {label}: {best:.2f}s{ratio}{tag}", flush=True)
            if base is None:
                base = best


if __name__ == "__main__":
    main()
