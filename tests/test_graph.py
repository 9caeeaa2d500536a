"""Pins for operators/graph.py: parity with a pure-Python fixed-point
replay, partition independence, near-mass-conservation, and ranking
sanity (the hub outranks spokes)."""

import pytest

from blackroad_feature_store_spark.operators.graph import pagerank

SCALE = 1_000_000_000


def _py_pagerank(edges, iterations, scale=SCALE):
    ew = {}
    for s, d, *w in edges:
        ew[(s, d)] = ew.get((s, d), 0) + (w[0] if w else 1)
    nodes = sorted({s for s, _ in ew} | {d for _, d in ew})
    outw = {}
    for (s, _), w in ew.items():
        outw[s] = outw.get(s, 0) + w
    shares = {e: (w * scale) // outw[e[0]] for e, w in ew.items()}
    n = len(nodes)
    rank = {v: scale // n for v in nodes}
    base = (15 * scale) // (100 * n)
    for _ in range(iterations):
        c = {v: 0 for v in nodes}
        for (s, d), p in shares.items():
            c[d] += (rank[s] * p) // scale
        rank = {v: base + (85 * c[v]) // 100 for v in nodes}
    return rank


EDGES = [
    (1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 5),
    (4, 3, 1), (2, 4, 1), (4, 1, 2), (3, 4, 1),
]


def _edges_df(spark, edges, parts=1):
    return spark.createDataFrame(
        edges, "src bigint, dst bigint, w bigint"
    ).repartition(parts)


def test_matches_pure_python_fixed_point(spark):
    got = {
        r.node: r.rank
        for r in pagerank(
            _edges_df(spark, EDGES), weight_col="w", iterations=3
        ).collect()
    }
    assert got == _py_pagerank(EDGES, 3)


def test_partition_independence(spark):
    a = {
        r.node: r.rank
        for r in pagerank(
            _edges_df(spark, EDGES, parts=1), weight_col="w", iterations=2
        ).collect()
    }
    b = {
        r.node: r.rank
        for r in pagerank(
            _edges_df(spark, EDGES, parts=7), weight_col="w", iterations=2
        ).collect()
    }
    assert a == b


def test_mass_nearly_conserved_on_strongly_connected(spark):
    # No dangling nodes in EDGES: total mass only shrinks by the
    # deterministic per-edge/div truncation — stays within 1% of scale.
    ranks = pagerank(
        _edges_df(spark, EDGES), weight_col="w", iterations=3
    ).collect()
    total = sum(r.rank for r in ranks)
    assert 0.99 * SCALE <= total <= SCALE


def test_hub_outranks_spokes(spark):
    # Star digraph with return edges: everything points at the hub.
    edges = [(i, 0, 1) for i in range(1, 6)] + [(0, i, 1) for i in range(1, 6)]
    ranks = {
        r.node: r.rank
        for r in pagerank(_edges_df(spark, edges), iterations=3).collect()
    }
    assert all(ranks[0] > ranks[i] for i in range(1, 6))


def test_unweighted_counts_parallel_edges(spark):
    # weight_col=None counts duplicate rows as weight.
    dup = [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)]
    got = {
        r.node: r.rank
        for r in pagerank(
            spark.createDataFrame(dup, "src bigint, dst bigint"),
            iterations=2,
        ).collect()
    }
    want = _py_pagerank([(1, 2, 2), (1, 3, 1), (2, 1, 1), (3, 1, 1)], 2)
    assert got == want


def test_empty_edge_set_returns_empty_frame(spark):
    empty = spark.createDataFrame([], "src bigint, dst bigint, w bigint")
    out = pagerank(empty, weight_col="w", iterations=2)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_fractional_weights_raise(spark):
    # ADVICE r11: a float-weighted edge list must not silently
    # truncate (0.9 -> 0 kills a node's outflow through NULL shares).
    import pytest

    df = spark.createDataFrame(
        [(1, 2, 0.9), (2, 1, 1.0)], "src bigint, dst bigint, w double"
    )
    with pytest.raises(ValueError, match="fractional"):
        pagerank(df, weight_col="w", iterations=1)


def test_zero_and_negative_weights_raise(spark):
    import pytest

    for bad in (0, -3):
        df = spark.createDataFrame(
            [(1, 2, bad), (2, 1, 1)], "src bigint, dst bigint, w bigint"
        )
        with pytest.raises(ValueError, match=">= 1"):
            pagerank(df, weight_col="w", iterations=1)


def test_integral_double_weights_pass(spark):
    # doubles that ARE whole numbers cast losslessly and must work
    df = spark.createDataFrame(
        [(1, 2, 3.0), (2, 1, 2.0)], "src bigint, dst bigint, w double"
    )
    got = {r.node: r.rank for r in
           pagerank(df, weight_col="w", iterations=2).collect()}
    assert got == _py_pagerank([(1, 2, 3), (2, 1, 2)], 2)


def test_null_weights_raise(spark):
    # ADVICE r12: NULL post-cast weights slip min/max aggregates (they
    # skip NULLs) and the fractional flag (NULL != NULL is NULL), then
    # vanish through the NULL sum — silent mass loss. Must raise, for
    # both a NULL weight value and a string that casts to NULL.
    import pytest

    df = spark.createDataFrame(
        [(1, 2, None), (2, 1, 5)], "src bigint, dst bigint, w bigint"
    )
    with pytest.raises(ValueError, match="NULL weight"):
        pagerank(df, weight_col="w", iterations=1)
    # (an uncastable STRING weight needs no check of ours: under the
    # session's ANSI default the cast itself throws loudly; non-ANSI
    # sessions fall into the same NULL-weight raise above)


def test_pagerank_driver_path_matches_distributed(spark):
    """VERDICT r14 ask #2 pin: small reduced graphs iterate on the
    driver (bounded collect of the reduced edge list); the exact
    integer fixed-point recurrence must make the two paths
    bit-identical — max_driver_edges=0 forces the distributed
    iteration on the same input."""
    edges = spark.createDataFrame(
        [
            (1, 2, 3),
            (2, 3, 1),
            (3, 1, 2),
            (1, 3, 5),
            (4, 1, 1),  # 4 is dangling-in (no inbound)
            (2, 5, 7),  # 5 is dangling-out (no outbound)
        ],
        ["src", "dst", "w"],
    )
    fast = pagerank(edges, weight_col="w", iterations=4)
    slow = pagerank(
        edges, weight_col="w", iterations=4, max_driver_edges=0
    )
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, slow.collect())
    )
    assert fast.schema == slow.schema
    # validation still fires BEFORE the fast path collects
    import pytest as _pytest

    badw = spark.createDataFrame([(1, 2, 0.9)], ["src", "dst", "w"])
    with _pytest.raises(ValueError, match="fractional"):
        pagerank(badw, weight_col="w")


def test_pagerank_driver_path_string_nodes(spark):
    """The driver path preserves the node column's type (domains are
    strings in the authority-ranking use)."""
    edges = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "a.com"), ("c.com", "a.com")],
        ["src", "dst"],
    )
    out = pagerank(edges)
    assert dict(out.dtypes)["node"] == "string"
    ranks = {r["node"]: r["rank"] for r in out.collect()}
    assert ranks["a.com"] > ranks["c.com"]  # c has no inbound


def test_pagerank_byte_bound_falls_back_to_distributed(spark, monkeypatch):
    """ADVICE r15 pin: the driver-iteration dispatch is BYTE-bounded,
    not only row-count-bounded — long string node ids whose text mass
    exceeds ``max_driver_bytes`` must take the distributed path even
    when the edge count is tiny. Detected by breaking the driver path:
    if the byte bound routes correctly, the poisoned helper is never
    reached."""
    import blackroad_feature_store_spark.operators.graph as graphmod

    edges = spark.createDataFrame(
        [("x" * 200, "y" * 200), ("y" * 200, "x" * 200)],
        ["src", "dst"],
    )

    def _boom(*a, **k):  # pragma: no cover - reached only on a bug
        raise AssertionError("driver path taken despite byte bound")

    monkeypatch.setattr(graphmod, "_pagerank_driver", _boom)
    out = pagerank(edges, iterations=2, max_driver_bytes=100)
    assert out.count() == 2
    # and the same input under the default bound DOES use the driver
    # path (the monkeypatched poison fires)
    with pytest.raises(AssertionError, match="driver path taken"):
        pagerank(edges, iterations=2)


def test_pagerank_out_weight_overflow_raises_on_both_paths(spark):
    """ADVICE r15 pin: out_w * scale > 2**63 raises on BOTH paths —
    without the guard the driver path computes it exactly in Python
    while the distributed BIGINT multiply overflows, breaking the
    bit-identical contract precisely on extreme weights."""
    bound = (2**63 - 1) // 1_000_000_000
    df = spark.createDataFrame(
        [(1, 2, bound + 1)], "src bigint, dst bigint, w bigint"
    )
    with pytest.raises(ValueError, match="exceeds BIGINT range"):
        pagerank(df, weight_col="w", iterations=1)
    with pytest.raises(Exception, match="exceeds BIGINT range"):
        pagerank(
            df, weight_col="w", iterations=1, max_driver_edges=0
        ).collect()
    # just-under-the-bound weights pass on both paths, bit-identical
    ok = spark.createDataFrame(
        [(1, 2, bound), (2, 1, 1)], "src bigint, dst bigint, w bigint"
    )
    fast = pagerank(ok, weight_col="w", iterations=2)
    slow = pagerank(ok, weight_col="w", iterations=2, max_driver_edges=0)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, slow.collect())
    )
