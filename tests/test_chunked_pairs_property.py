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
            # zero-norm denominators follow IEEE like the engine (and
            # the naive Spark join): 0/0 -> NaN, d/0 -> +-inf. Python's
            # / raises instead, so special-case.
            den = na * nb
            if den == 0.0:
                c = float("nan") if d == 0.0 else math.copysign(
                    float("inf"), d
                )
            else:
                c = _round_half_up(d / den)
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


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:

    @st.composite
    def _corpus(draw):
        n = draw(st.integers(min_value=2, max_value=25))
        dims = draw(st.integers(min_value=2, max_value=5))
        ids = draw(
            st.lists(
                st.integers(min_value=0, max_value=60),
                min_size=n, max_size=n, unique=True,
            )
        )
        rows = []
        for i in ids:
            vec = draw(
                st.lists(
                    st.floats(
                        min_value=-2.0, max_value=2.0,
                        allow_nan=False, allow_infinity=False,
                    ),
                    min_size=dims, max_size=dims,
                )
            )
            blk = draw(st.sampled_from([0, 1, None]))
            ext = draw(
                st.floats(min_value=0.0, max_value=1.0, allow_nan=False)
            )
            rows.append({"id": i, "vec": vec, "blk": blk, "ext": ext})
        chunks = draw(st.integers(min_value=1, max_value=6))
        return rows, chunks

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_corpus())
    def test_chunked_pairs_hypothesis(spark, case):
        """Shrinking fuzz over the same invariant as the seeded test:
        engine output == brute force for arbitrary ids/blocks/vectors/
        chunk counts (incl. zero vectors, single-element blocks, and
        chunk counts exceeding block sizes)."""
        rows, chunks = case
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
        assert set(got) == set(want)
        for k, (wc, wa, wb) in want.items():
            gc, ga, gb = got[k]
            if math.isnan(wc):
                assert gc is None or math.isnan(gc)
            elif math.isinf(wc):
                assert math.isinf(gc) and (gc > 0) == (wc > 0)
            else:
                assert abs(gc - wc) < 1.5e-6
            assert ga == wa and gb == wb
