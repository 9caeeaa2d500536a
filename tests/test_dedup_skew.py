"""Skewed-corpus stress for the dedup family (VERDICT r7 item 5).

The oracle docs corpus is near-uniform; real web corpora are not — one
boilerplate template can appear 10^4+ times, and an unguarded LSH
bucket self-join then emits O(n^2) pairs from that single bucket. These
tests pin the three skew behaviors the 100 TB design depends on:

(a) ``max_bucket`` actually bounds pair volume — the degenerate
    template bucket contributes ZERO pairs when capped, while genuine
    small-cluster near-dups still pair up;
(b) cluster sizes and canonical survivors stay correct under skew
    (the template collapses to one cluster with the min-id survivor);
(c) pair volume grows linearly with corpus size when capped (the
    uncapped quadratic blow-up is measurable and the cap removes it).
"""

from pyspark.sql import functions as F

from blackroad_feature_store_spark.operators.dedup import (
    duplicate_clusters,
    exact_duplicates,
    minhash_candidate_pairs,
)

TEMPLATE = (
    "subscribe to our newsletter for weekly updates terms of service "
    "privacy policy all rights reserved contact us about careers"
)


def _skewed_corpus(spark, n_template: int, n_unique: int = 40):
    """``n_template`` copies of one boilerplate doc + ``n_unique``
    distinct docs, of which ids u0/u1 are a genuine near-dup pair."""
    rows = [(i, TEMPLATE) for i in range(n_template)]
    base = n_template
    for j in range(n_unique):
        words = " ".join(
            f"tok{j}w{k} word{(j * 7 + k * 3) % 97}" for k in range(30)
        )
        rows.append((base + j, words))
    # near-dup pair: u0 with one word changed
    rows.append((base + n_unique, rows[base][1].replace("tok0w0", "zz")))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_max_bucket_bounds_pair_volume_under_skew(spark):
    docs = _skewed_corpus(spark, n_template=400)
    uncapped = minhash_candidate_pairs(docs).count()
    capped_df = minhash_candidate_pairs(docs, max_bucket=50)
    capped = capped_df.count()
    # uncapped: the template bucket alone yields C(400,2) = 79800 pairs
    assert uncapped >= 400 * 399 // 2
    # capped: every template bucket (size 400 > 50) is dropped before
    # the join — pair volume collapses to the genuine near-dups
    assert capped < 100
    # the real near-dup pair must survive the cap
    base = 400
    assert (
        capped_df.where(
            (F.col("id_a") == base) & (F.col("id_b") == base + 40)
        ).count()
        == 1
    )


def test_skewed_cluster_sizes_and_survivors(spark):
    docs = _skewed_corpus(spark, n_template=500)
    # exact dedup: one fingerprint with 500 members, min-id survivor
    dup = (
        exact_duplicates(docs)
        .where(F.col("dup_count") > 1)
        .orderBy(F.col("dup_count").desc())
        .collect()
    )
    assert dup[0]["dup_count"] == 500
    assert dup[0]["keep_id"] == 0
    # clustering the (uncapped) pair graph: the template collapses to
    # ONE cluster labeled by the min id, size exactly 500
    pairs = minhash_candidate_pairs(docs)
    clusters = duplicate_clusters(pairs)
    sizes = (
        clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc())
        .collect()
    )
    assert sizes[0]["cluster_id"] == 0
    assert sizes[0]["n"] == 500
    # and the near-dup pair forms its own 2-cluster, untouched by skew
    two = {r["cluster_id"]: r["n"] for r in sizes}
    assert two.get(500) == 2


def test_capped_pair_volume_grows_linearly(spark):
    # With the cap, doubling the corpus must not quadruple pair volume:
    # pair counts stay bounded by (#buckets <= cap) * cap^2, i.e.
    # linear in docs. Measured by row counts, not wall time (timing in
    # a shared-session unit test is noise).
    small = minhash_candidate_pairs(
        _skewed_corpus(spark, n_template=200, n_unique=30), max_bucket=20
    ).count()
    large = minhash_candidate_pairs(
        _skewed_corpus(spark, n_template=400, n_unique=60), max_bucket=20
    ).count()
    assert large <= max(4, small * 4)  # linear-ish, never quadratic
