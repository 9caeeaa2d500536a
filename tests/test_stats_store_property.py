"""Hypothesis fuzz of the streaming stats store end-to-end: for ANY
sequence of batches (including empties), ANY interleaving of
compactions at committed watermarks, and ANY replayed batch, the
merged statistics must equal one global aggregation of all rows —
the exactly-once + monoid contract that makes O(batch) maintenance
trustworthy.

This is the harness-level pin the unit tests approximate piecewise
(replay idempotence, two crash points, full compaction): shrinking
random interleavings search the space of batch/compaction/replay
orderings for a sequence that double counts, drops, or resurrects
partials.
"""

import math

from pyspark.sql import functions as F

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:

    @st.composite
    def _schedule(draw):
        n_batches = draw(st.integers(min_value=1, max_value=5))
        batches = []
        for _ in range(n_batches):
            rows = draw(
                st.lists(
                    st.tuples(
                        st.sampled_from(["a", "b", "c"]),
                        st.one_of(
                            st.none(),
                            st.floats(
                                min_value=-50,
                                max_value=50,
                                allow_nan=False,
                            ),
                        ),
                    ),
                    min_size=0,
                    max_size=6,
                )
            )
            batches.append(rows)
        # ops: ("batch", i) in order, with optional replays of the
        # JUST-processed batch and compactions at the current watermark
        ops = []
        for i in range(n_batches):
            ops.append(("batch", i))
            if draw(st.booleans()):
                ops.append(("replay", i))
            if draw(st.booleans()):
                ops.append(("compact", i))
        return batches, ops

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_schedule())
    def test_stats_store_any_schedule_equals_global_agg(
        spark, tmp_path_factory, case
    ):
        from blackroad_feature_store_spark.streaming.stats import (
            compact_stats,
            merge_stats,
            process_stats_batch,
        )

        batches, ops = case
        store = str(tmp_path_factory.mktemp("fuzz") / "stats")

        def mk(rows):
            return spark.createDataFrame(
                rows or [], "k string, v double"
            )

        processed_any = False
        for op, i in ops:
            if op == "batch" or op == "replay":
                process_stats_batch(mk(batches[i]), i, store, ["k"], "v")
                processed_any = processed_any or bool(batches[i])
            else:  # compact at the committed watermark
                if processed_any:
                    compact_stats(spark, store, upto_batch=i)

        all_rows = [r for b in batches for r in b]
        if not processed_any:
            return  # nothing ever written; merge_stats raises by contract
        got = {
            r["k"]: r for r in merge_stats(spark, store).collect()
        }
        want = {
            r["k"]: r
            for r in mk(all_rows)
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("v").isNull(), 1).otherwise(0)
                ).alias("n_null"),
                F.sum("v").alias("sum_value"),
                F.min("v").alias("min_value"),
                F.max("v").alias("max_value"),
            )
            .collect()
        }
        assert set(got) == set(want), (got.keys(), want.keys())
        for k in want:
            assert got[k]["n"] == want[k]["n"], (k, ops)
            assert got[k]["n_null"] == want[k]["n_null"], (k, ops)
            assert got[k]["min_value"] == want[k]["min_value"], (k, ops)
            assert got[k]["max_value"] == want[k]["max_value"], (k, ops)
            gs, ws = got[k]["sum_value"], want[k]["sum_value"]
            if ws is None:
                assert gs is None, (k, ops)
            else:
                assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-9), (
                    k, ops,
                )
