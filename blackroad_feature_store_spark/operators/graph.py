"""Iterative graph analytics in exact fixed-point arithmetic —
certifiable weighted PageRank over edge lists derived from fact
tables.

The reference engine has no graph surface; connected components
already live in `operators/dedup.py::duplicate_clusters`. This module
adds the other workhorse: importance ranking over a weighted digraph
(domain authority for quality weighting, trade-flow centrality,
canonical-pick by centrality inside near-dup families).

Numeric design (same doctrine as `operators/clustering.py`)
-----------------------------------------------------------
Float PageRank sums neighbor contributions in whatever order the
shuffle delivers — not replayable. Here every quantity is an integer:

* ranks live in fixed-point units (``scale``, default 1e9);
* each edge's routing fraction is precomputed ONCE as an integer
  share ``p = (w * scale) div out_w`` (bounded by ``scale``);
* a contribution is ``(rank * p) div scale`` — floor-divided PER EDGE
  (so products stay < 1e18: rank <= scale, p <= scale), then summed
  exactly in any order;
* damping is integer too: ``base + (85 * sum) div 100`` with
  ``base = (15 * scale) div (100 * N)``.

Truncation loses at most 1 unit (1e-9) per edge per round — far below
any ranking-relevant difference — and buys bit-identical results on
any partitioning and a hash-certifiable oracle replay.

Scale design
------------
The expensive part at 100 TB is not the iteration (the reduced graph
is small) but deriving the edge list from facts: that is one
map-side-combined ``groupBy(src, dst)`` after broadcast dim joins.
Each iteration is edges ⨝ ranks (broadcast when the node set is
small, shuffle-join otherwise) + one aggregation by dst; the rank
frame is localCheckpointed per round (tiny) to cut lineage. Dangling
nodes keep their damped base rank; their outflow simply leaks — fine
for ranking uses, replayable by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 3,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Weighted PageRank (damping 0.85) in exact integer fixed-point.

    ``edges``: one row per (src, dst [, weight]); parallel edges are
    combined. Weights must be positive (a zero/negative weight would
    produce nonsensical negative shares — raise upstream). Returns
    (``node``, ``rank``) with rank in ``scale`` units (initial total
    mass = ``scale``, minus deterministic truncation and dangling
    leakage). An EMPTY edge set returns an empty (node, rank) frame
    rather than dividing by a zero node count.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    # The fact-to-graph reduction is the expensive pass — materialize
    # it ONCE; nodes/out-weights/shares all derive from the (small)
    # reduced edge list.
    ew = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            w.alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint()
    )
    nodes = (
        ew.select(F.col("src").alias("node"))
        .unionByName(ew.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outw = ew.groupBy("src").agg(F.sum("w").alias("out_w"))
    shares = (
        ew.join(outw, "src")
        .select(
            "src",
            "dst",
            F.expr(f"(w * CAST({scale} AS BIGINT)) div out_w").alias("p"),
        )
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    base = (15 * scale) // (100 * n)
    ranks = nodes.withColumn("rank", F.lit(scale // n).cast("long"))
    for _ in range(iterations):
        contrib = (
            shares.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .select(
                "dst",
                F.expr(f"(rank * p) div CAST({scale} AS BIGINT)").alias(
                    "c"
                ),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(
                contrib.withColumnRenamed("dst", "node"), "node", "left"
            )
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("(85 * coalesce(c, 0L)) div 100")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
