"""Property pin for the triangle-chunked GEMM pair engine
(`dedup._chunked_cosine_pairs`): on randomized inputs its output must
equal a brute-force O(n^2) Python reference — same pair SET, same
rounded cosines, same extra-column carrying — for any chunk count.

The engine replicates rows across chunk-pair groups; the classic bugs
in that construction are pairs counted twice (a row meeting another in
two groups), pairs missed (wrong lo/hi routing), and orientation flips
(extra_a/extra_b swapped when ids are reordered). Random ids + random
chunk counts exercise all three.
"""

import math
import random

from pyspark.sql import functions as F

from blackroad_feature_store_spark.operators.dedup import (
    _chunked_cosine_pairs,
)


def _round_half_up(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _brute(rows):
    """All within-block unordered pairs with rounded cosine and the
    extras oriented by (id_a < id_b)."""
    out = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            ra, rb = rows[i], rows[j]
            if ra["blk"] is None or ra["blk"] != rb["blk"]:
                continue
            if ra["id"] == rb["id"]:
                continue
            if ra["id"] > rb["id"]:
                ra, rb = rb, ra
            d = sum(x * y for x, y in zip(ra["vec"], rb["vec"]))
            na = math.sqrt(sum(x * x for x in ra["vec"]))
            nb = math.sqrt(sum(x * x for x in rb["vec"]))
            c = _round_half_up(d / (na * nb))
            out[(ra["id"], rb["id"])] = (c, ra["ext"], rb["ext"])
    return out


def test_chunked_pairs_match_brute_force_randomized(spark):
    for seed, chunks in ((3, 1), (7, 2), (11, 5), (19, 8)):
        rng = random.Random(seed)
        n = rng.randint(10, 40)
        rows = [
            {
                "id": rng.randrange(1000),
                "vec": [rng.uniform(-1, 1) for _ in range(6)],
                "blk": rng.choice([0, 1, 2, None]),
                "ext": rng.uniform(0, 1),
            }
            for _ in range(n)
        ]
        # make ids unique (duplicate-id exclusion is tested separately)
        seen = set()
        for r in rows:
            while r["id"] in seen:
                r["id"] += 1000
            seen.add(r["id"])
        df = spark.createDataFrame(
            [(r["id"], r["vec"], r["blk"], r["ext"]) for r in rows],
            "vec_id long, embedding array<double>, label int, ext double",
        )
        got = {
            (r["id_a"], r["id_b"]): (r["cosine"], r["extra_a"], r["extra_b"])
            for r in _chunked_cosine_pairs(
                df, "vec_id", "embedding", "label",
                chunks=chunks, extra_col="ext",
            ).collect()
        }
        want = _brute(rows)
        assert set(got) == set(want), f"seed {seed} chunks {chunks}"
        for k in want:
            gc, ga, gb = got[k]
            wc, wa, wb = want[k]
            assert abs(gc - wc) < 1.5e-6, (k, gc, wc)
            assert ga == wa and gb == wb, f"extras flipped for {k}"


def test_chunked_pairs_duplicate_ids_excluded(spark):
    # two rows with the SAME id in one block: the naive join's
    # a.id < b.id condition excluded the self-pair; so must the engine
    df = spark.createDataFrame(
        [
            (5, [1.0, 0.0], 0),
            (5, [0.9, 0.1], 0),
            (6, [1.0, 0.0], 0),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    pairs = _chunked_cosine_pairs(df, "vec_id", "embedding", "label")
    assert pairs.where(F.col("id_a") == F.col("id_b")).count() == 0
    # the two distinct-id pairings (5,6) survive — one per id-5 row
    assert pairs.where(
        (F.col("id_a") == 5) & (F.col("id_b") == 6)
    ).count() == 2
