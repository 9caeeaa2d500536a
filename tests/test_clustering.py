"""Pins for operators/clustering.py: parity with a pure-Python replay
of the quantized spherical Lloyd, partition-order independence,
scale-invariance of assignments, empty-cluster vanish semantics."""

import math

from blackroad_feature_store_spark.operators.clustering import (
    kmeans_fit_predict,
    quantize_vectors,
)


def _py_kmeans(vectors, k, iterations, scale=10_000):
    """Reference: identical quantized spherical Lloyd, sum-centroids."""
    q = {
        i: [math.floor(x * scale) for x in v] for i, v in vectors.items()
    }
    n2 = {i: sum(x * x for x in v) for i, v in q.items()}
    cents = {i: list(q[i]) for i in sorted(q)[:k]}

    def score(vid, cid):
        cv = cents[cid]
        cn2 = sum(x * x for x in cv)
        if n2[vid] == 0 or cn2 == 0:
            return -1.0
        d = sum(a * b for a, b in zip(q[vid], cv))
        return float(d) / (math.sqrt(float(n2[vid])) * math.sqrt(float(cn2)))

    assign = {}
    for _ in range(iterations):
        assign = {
            vid: max(sorted(cents), key=lambda c: (score(vid, c), -c))
            for vid in q
        }
        new = {}
        for vid, cid in assign.items():
            acc = new.setdefault(cid, [0] * len(q[vid]))
            for p, x in enumerate(q[vid]):
                acc[p] += x
        cents = new
    return assign, cents


def _vec_df(spark, vectors):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vectors.items()],
        "vec_id bigint, embedding array<double>",
    )


def test_matches_pure_python_reference(spark):
    import random

    rng = random.Random(7)
    vectors = {
        i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(40)
    }
    got, cents_df = kmeans_fit_predict(
        _vec_df(spark, vectors), k=4, iterations=3, return_centroids=True
    )
    want, want_cents = _py_kmeans(vectors, k=4, iterations=3)
    assert {r.vec_id: r.cluster_id for r in got.collect()} == want
    got_cents = {r.cid: list(r.cv) for r in cents_df.collect()}
    assert got_cents == want_cents


def test_partition_order_independence(spark):
    import random

    rng = random.Random(11)
    vectors = {i: [rng.uniform(-1, 1) for _ in range(5)] for i in range(60)}
    df = _vec_df(spark, vectors)
    a = {
        r.vec_id: r.cluster_id
        for r in kmeans_fit_predict(
            df.repartition(1), k=3, iterations=2
        ).collect()
    }
    b = {
        r.vec_id: r.cluster_id
        for r in kmeans_fit_predict(
            df.repartition(7), k=3, iterations=2
        ).collect()
    }
    assert a == b  # integer-exact accumulation: layout can't move it


def test_assignment_is_scale_invariant(spark):
    # Cosine ignores magnitude: doubling a vector (exactly, in the
    # quantized domain) must not change its cluster.
    base = {0: [1.0, 0.0], 1: [0.0, 1.0], 2: [0.5, 0.25], 3: [1.0, 0.5]}
    out = {
        r.vec_id: r.cluster_id
        for r in kmeans_fit_predict(
            _vec_df(spark, base), k=2, iterations=2
        ).collect()
    }
    assert out[3] == out[2]  # [1.0,0.5] is exactly 2x [0.5,0.25]


def test_empty_cluster_vanishes(spark):
    # v0 == v1, so init centroids 0 and 1 are identical; ties go to the
    # smaller cid, cluster 1 receives nothing and vanishes after the
    # first update — deterministically, on both engines.
    vectors = {0: [1.0, 0.0], 1: [1.0, 0.0], 2: [0.0, 1.0]}
    out = {
        r.vec_id: r.cluster_id
        for r in kmeans_fit_predict(
            _vec_df(spark, vectors), k=3, iterations=2
        ).collect()
    }
    assert out == {0: 0, 1: 0, 2: 2}


def test_quantize_floor_semantics(spark):
    df = _vec_df(spark, {0: [0.00015, -0.00015]})
    row = quantize_vectors(df).collect()[0]
    # floor, not round: 1.5 -> 1 and -1.5 -> -2 (unambiguous across
    # engines, unlike round-half conventions).
    assert list(row.qv) == [1, -2]
    assert row.n2 == 5


def test_invalid_k_and_iterations_raise(spark):
    import pytest

    df = _vec_df(spark, {0: [1.0, 0.0], 1: [0.0, 1.0]})
    with pytest.raises(ValueError, match="k must be >= 1"):
        kmeans_fit_predict(df, k=0, iterations=1)
    with pytest.raises(ValueError, match="iterations must be >= 1"):
        kmeans_fit_predict(df, k=2, iterations=0)


def test_centroid_norm_overflow_raises_not_corrupts(spark):
    # ADVICE r11 (medium): cn2 = dot(cv, cv) on sum-centroids wraps
    # int64 around N ~ sqrt(2^63/(dim*scale^2)) members — far below
    # the dot-product bound — and a wrapped-negative norm would turn
    # scores into NaN, which max_by sorts above every real double.
    # The guard must raise loudly instead.
    # Values sized so every pre-guard expression stays in int64
    # (qv = 1.5e9: n2 = 2.25e18, init bound 4*mx^2 = 9e18 <= 2^63-1)
    # while the 6-member sum-centroid (component 9e9) pushes the
    # update-time bound to 3.2e20 — the guard must fire BEFORE the
    # norm evaluates (in ANSI mode the norm itself would otherwise
    # throw an opaque mid-job overflow).
    import pytest

    rows = [(i, [1.5e5, 0.0, 0.0, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    with pytest.raises(ArithmeticError, match="int64"):
        kmeans_fit_predict(df, k=1, iterations=1, scale=10_000)


def test_incremental_reassign_equals_full_and_fold_is_local(spark):
    """VERDICT r11 item 8 machinery: (a) fold_centroid_update changes
    ONLY clusters that received delta sums, bit-identically keeping
    the rest; (b) kmeans_reassign_incremental equals a from-scratch
    kmeans_assign at the updated centroids while the delta hits a
    strict subset of clusters."""
    import random

    from pyspark.sql import functions as F

    from blackroad_feature_store_spark.operators.clustering import (
        fold_centroid_update,
        kmeans_assign,
        kmeans_reassign_incremental,
    )

    rng = random.Random(7)
    # three well-separated axis clusters in 4d
    vectors = {}
    for i in range(30):
        axis = i % 3
        v = [rng.uniform(0.0, 0.05) for _ in range(4)]
        v[axis] = 1.0 + rng.uniform(0.0, 0.1)
        vectors[i] = v
    df = _vec_df(spark, vectors)
    _, cents = kmeans_fit_predict(
        df, k=3, iterations=2, return_centroids=True
    )
    # deployed lists = argmax at the DEPLOYED centroids (the training
    # loop's last assignment is argmax at the previous round's — the
    # incremental contract rejects it)
    q_base = quantize_vectors(df)
    assign = kmeans_assign(q_base, cents)
    # delta: new members near axis 0 ONLY -> exactly one cluster hit
    delta = {1000 + j: [1.0, 0.01, 0.01, 0.01] for j in range(4)}
    ddf = _vec_df(spark, delta)
    dq = quantize_vectors(ddf)
    dassign = kmeans_assign(dq, cents)
    dsums = (
        dassign.join(dq.select("id", "qv"), "id")
        .select(F.col("cid").alias("cluster_id"),
                F.posexplode("qv").alias("pos0", "v"))
        .select("cluster_id", (F.col("pos0") + 1).alias("pos"), "v")
        .groupBy("cluster_id", "pos")
        .agg(F.sum("v").alias("s"))
    )
    changed = [r.cluster_id for r in
               dsums.select("cluster_id").distinct().collect()]
    assert len(changed) == 1  # the delta hit a strict subset
    old = {r.cid: r.cv for r in cents.collect()}
    cents_new = fold_centroid_update(cents, dsums)
    new = {r.cid: r.cv for r in cents_new.collect()}
    for cid in old:
        if cid in changed:
            assert new[cid] != old[cid]
        else:
            assert new[cid] == old[cid]  # untouched = bit-identical
    # incremental reassign == full reassign at the updated centroids
    q_all = quantize_vectors(df).unionByName(dq)
    old_assign = assign.unionByName(dassign)
    inc = kmeans_reassign_incremental(
        q_all, old_assign, cents_new, changed
    )
    full = kmeans_assign(q_all, cents_new)
    got = {r.id: r.cid for r in inc.collect()}
    want = {r.id: r.cid for r in full.collect()}
    assert got == want
    # empty changed set short-circuits to the old assignment
    same = kmeans_reassign_incremental(q_all, old_assign, cents_new, [])
    assert {r.id: r.cid for r in same.collect()} == {
        r.id: r.cid for r in old_assign.collect()
    }


def test_fold_rejects_orphan_cluster_ids(spark):
    # delta sums naming a cluster with no centroid = partials folded
    # against the wrong centroid generation; must raise, not drop mass
    import pytest
    from pyspark.sql import functions as F

    from blackroad_feature_store_spark.operators.clustering import (
        fold_centroid_update,
        kmeans_fit_predict,
    )

    vectors = {i: [1.0, 0.0] for i in range(4)}
    _, cents = kmeans_fit_predict(
        _vec_df(spark, vectors), k=1, iterations=1, return_centroids=True
    )
    bad = spark.createDataFrame(
        [(99, 1, 5), (99, 2, 5)], "cluster_id bigint, pos int, s bigint"
    )
    with pytest.raises(ValueError, match="no centroid"):
        fold_centroid_update(cents, bad)


def test_fold_sparse_delta_lands_on_the_right_component(spark):
    """ADVICE r12 (medium): a SPARSE delta — only some components
    carry a sum — must fold onto exactly the named components via the
    pos-keyed lookup, not slide onto component 1 by array index."""
    from pyspark.sql import functions as F  # noqa: F401

    from blackroad_feature_store_spark.operators.clustering import (
        fold_centroid_update,
        kmeans_fit_predict,
    )

    vectors = {i: [1.0, 2.0, 3.0, 4.0] for i in range(4)}
    _, cents = kmeans_fit_predict(
        _vec_df(spark, vectors), k=1, iterations=1, return_centroids=True
    )
    before = cents.collect()[0].cv
    # delta touches ONLY component 3 (1-based)
    delta = spark.createDataFrame(
        [(0, 3, 70)], "cluster_id bigint, pos int, s bigint"
    )
    after = fold_centroid_update(cents, delta).collect()[0].cv
    assert after[0] == before[0] and after[1] == before[1]
    assert after[2] == before[2] + 70
    assert after[3] == before[3]


def test_fold_rejects_duplicated_and_out_of_range_pos(spark):
    import pytest

    from blackroad_feature_store_spark.operators.clustering import (
        fold_centroid_update,
        kmeans_fit_predict,
    )

    vectors = {i: [1.0, 0.0] for i in range(4)}
    _, cents = kmeans_fit_predict(
        _vec_df(spark, vectors), k=1, iterations=1, return_centroids=True
    )
    # duplicated (cid, pos): the same partials folded twice
    dup = spark.createDataFrame(
        [(0, 1, 5), (0, 1, 5)], "cluster_id bigint, pos int, s bigint"
    )
    with pytest.raises(ValueError, match="malformed delta"):
        fold_centroid_update(cents, dup)
    # pos outside [1, dim]: a positional lookup would drop the mass
    for bad_pos in (0, 3):
        oob = spark.createDataFrame(
            [(0, bad_pos, 5)], "cluster_id bigint, pos int, s bigint"
        )
        with pytest.raises(ValueError, match="malformed delta"):
            fold_centroid_update(cents, oob)


def test_reassign_routes_unwitnessed_vectors_through_full_rescore(spark):
    """ADVICE r12: a vector missing from old_assign must still be
    assigned (full k-centroid rescore) — an inner join would silently
    shrink the index. Checked for both a non-empty and an empty
    changed set."""
    from blackroad_feature_store_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit_predict,
        kmeans_reassign_incremental,
    )

    import random

    rng = random.Random(11)
    vectors = {}
    for i in range(24):
        axis = i % 3
        v = [rng.uniform(0.0, 0.05) for _ in range(4)]
        v[axis] = 1.0 + rng.uniform(0.0, 0.1)
        vectors[i] = v
    df = _vec_df(spark, vectors)
    _, cents = kmeans_fit_predict(
        df, k=3, iterations=2, return_centroids=True
    )
    q = quantize_vectors(df)
    full = kmeans_assign(q, cents)
    # drop a third of the witnesses: those vectors must still appear
    partial = full.where("id % 3 != 0")
    want = {r.id: r.cid for r in full.collect()}
    for changed in ([0], []):
        inc = kmeans_reassign_incremental(q, partial, cents, changed)
        got = {r.id: r.cid for r in inc.collect()}
        assert got == want, f"changed={changed}"


def test_fold_rejects_null_delta_sums(spark):
    # a NULL sum would coalesce to +0 in the dense build — silent
    # mass loss; must raise like every other malformed-delta class
    import pytest

    from blackroad_feature_store_spark.operators.clustering import (
        fold_centroid_update,
        kmeans_fit_predict,
    )

    vectors = {i: [1.0, 0.0] for i in range(4)}
    _, cents = kmeans_fit_predict(
        _vec_df(spark, vectors), k=1, iterations=1, return_centroids=True
    )
    bad = spark.createDataFrame(
        [(0, 1, None), (0, 2, 5)], "cluster_id bigint, pos int, s bigint"
    )
    with pytest.raises(ValueError, match="malformed delta"):
        fold_centroid_update(cents, bad)
