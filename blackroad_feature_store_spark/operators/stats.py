"""Distributed per-feature statistics (reference ``statistics``,
``feature_store.py:450-508``).

The reference materializes every record of the group in driver RAM and
aggregates in a Python loop — the scaling cliff called out in
BASELINE.md. Here the same numbers come from one partial+final hash
aggregation: explode the feature map to long form, then
``groupBy(feature).agg(...)``. Nothing touches the driver but the final
per-feature row (O(#features)).

Semantics pinned by the reference tests (SURVEY.md §2.4):

* ``count``      — values present and not JSON-null, ANY type (a string
                   city still counts: feature_store.py:484,488);
* ``null_count`` — records where the key is absent OR JSON-null
                   (feature_store.py:475-479);
* ``mean/min/max`` — numeric subset only; Python's
                   ``isinstance(True, int)`` quirk means booleans
                   participate as 0/1; mean rounded to 6 places
                   (feature_store.py:484-492).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def numeric_value(col: Column) -> Column:
    """Numeric view of a JSON-encoded map cell.

    JSON numbers cast; JSON booleans become 0/1 (the reference's
    bool-as-int quirk); JSON strings/arrays/null → NULL.
    """
    return (
        F.when(col == "true", F.lit(1.0))
        .when(col == "false", F.lit(0.0))
        .otherwise(col.try_cast("double"))
    )


def feature_statistics(
    records: DataFrame,
    feature_names: Sequence[str],
    values_col: str = "feature_values",
) -> DataFrame:
    """Stats DataFrame (feature, count, null_count, mean, min, max,
    min_is_int, max_is_int) — ONE map-side-combinable hash aggregation,
    one scan.

    The group's total record count is derivable as
    ``count + null_count`` of any row (every record contributes one
    long-form row per declared feature), so callers never run a second
    scan. ``min_is_int``/``max_is_int`` say whether the WINNING min/max
    cell was a JSON integer or boolean — the reference's
    ``min(numeric_vals)``/``max`` preserve the winning element's own
    type (feature_store.py:491-492), so a mixed feature like [1, 2.5]
    yields int min 1 and float max 2.5. Ties between an int and a
    float encoding of the same value resolve to int (the reference is
    insertion-order-dependent there; int is the deterministic choice).
    """
    if not feature_names:
        return records.sparkSession.createDataFrame(
            [],
            "feature string, count long, null_count long, "
            "mean double, min double, max double, "
            "min_is_int boolean, max_is_int boolean",
        )

    # Long form: one row per (record, declared feature). element_at
    # returns NULL for absent keys, which is exactly the reference's
    # values.get(fname) semantics.
    long_form = records.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        F.element_at(F.col(values_col), name).alias("value"),
                    )
                    for name in feature_names
                ]
            )
        ).alias("fv")
    ).select("fv.feature", "fv.value")

    present = F.col("value").isNotNull() & (F.col("value") != F.lit("null"))
    num = numeric_value(F.col("value"))
    # A numeric cell whose JSON encoding is not an integer or boolean
    # (e.g. "1.5", "1.0") makes min/max float in the reference.
    is_int_like = F.col("value").rlike("^-?[0-9]+$") | F.col("value").isin(
        "true", "false"
    )
    # Struct min/max order lexicographically (value first, then the
    # int-ness tiebreak flag), so one aggregation yields both the
    # extreme AND whether the winning cell was int-encoded. NULL-num
    # cells map to a NULL struct and are skipped by min/max.
    min_struct = F.min(
        F.when(
            num.isNotNull(),
            F.struct(
                num.alias("v"), (~is_int_like).cast("int").alias("notint")
            ),
        )
    )
    max_struct = F.max(
        F.when(
            num.isNotNull(),
            F.struct(num.alias("v"), is_int_like.cast("int").alias("isint")),
        )
    )
    return (
        long_form.groupBy("feature")
        .agg(
            F.sum(present.cast("long")).alias("count"),
            F.sum((~present).cast("long")).alias("null_count"),
            F.round(F.avg(num), 6).alias("mean"),
            min_struct.alias("__min_s"),
            max_struct.alias("__max_s"),
        )
        .select(
            "feature",
            "count",
            "null_count",
            "mean",
            F.col("__min_s.v").alias("min"),
            F.col("__max_s.v").alias("max"),
            (F.col("__min_s.notint") == 0).alias("min_is_int"),
            (F.col("__max_s.isint") == 1).alias("max_is_int"),
        )
    )


def population_stability(
    df: DataFrame,
    value_col: str,
    key_col: str,
    is_ref: Column,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    eps: float = 0.5,
) -> DataFrame:
    """Population Stability Index per key — the standard feature-drift
    monitor a feature store runs between a reference window (training
    time) and a current window (serving time).

    Values are histogrammed into ``n_bins`` fixed-width bins over
    ``[lo, hi)`` (out-of-range values clamp into the edge bins, so the
    index is total-mass-correct even under range drift); proportions
    are Laplace-smoothed with ``eps`` pseudo-counts per bin so an empty
    bin contributes a finite term; and

        PSI = Σ_bins (p_ref − p_cur) · ln(p_ref / p_cur)

    Conventional reading: <0.1 stable, 0.1–0.25 drifting, >0.25 action.

    Returns one row per key: ``(key, n_ref, n_cur, psi)``. NULL values
    are excluded — Spark's ``greatest(NULL, 0)`` would otherwise fold
    them into bin 0 as phantom mass, so a null-rate difference between
    windows would masquerade as value drift (monitor null rates as
    their own metric; a key whose values are all NULL has no PSI row).

    Scale shape: one map-side-combinable ``groupBy(key, bin)`` with
    conditional counts — a single shuffle of #keys × #bins rows — then
    the bin frame is completed with ``explode(sequence(...))`` over the
    keys already present in the aggregated counts (missing bins MUST
    contribute their smoothed term; aggregating only observed bins
    biases PSI low) and collapsed per key. No driver loop, no second
    scan of the input, no per-key jobs; 10k features × 20 bins is 200k
    post-agg rows at any corpus size.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    width = (hi - lo) / n_bins
    bucket = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(0)
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    counts = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"), bucket.alias("bin"),
            is_ref.alias("__ref"),
        )
        .groupBy("key", "bin")
        .agg(
            F.sum(F.col("__ref").cast("long")).alias("n_ref"),
            F.sum((~F.col("__ref")).cast("long")).alias("n_cur"),
        )
    )
    # Key set from the aggregated counts (#keys × #bins rows), not a
    # second full scan of the raw input.
    frame = (
        counts.select("key")
        .distinct()
        .select("key", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"))
    )
    filled = frame.join(counts, ["key", "bin"], "left").select(
        "key",
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = filled.groupBy("key").agg(
        F.sum("n_ref").alias("tot_ref"), F.sum("n_cur").alias("tot_cur")
    )
    smoothing = float(eps) * n_bins
    j = filled.join(tot, "key")
    p_ref = (F.col("n_ref") + F.lit(float(eps))) / (
        F.col("tot_ref") + F.lit(smoothing)
    )
    p_cur = (F.col("n_cur") + F.lit(float(eps))) / (
        F.col("tot_cur") + F.lit(smoothing)
    )
    return (
        j.groupBy("key")
        .agg(
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_cur"),
            F.round(F.sum((p_ref - p_cur) * F.log(p_ref / p_cur)), 6).alias(
                "psi"
            ),
        )
    )


def hll_sketches(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-key mergeable distinct-count sketches (Apache DataSketches
    HLL via Spark's ``hll_sketch_agg``): one ~2^lgk-byte binary per
    key, persistable next to the data.

    This is how a 100 TB pipeline maintains distinct counts
    incrementally: sketch each ingest partition (day, source, shard)
    ONCE at write time, then answer "distinct over any subset/range"
    by unioning the relevant sketches with :func:`hll_rollup` —
    seconds over kilobytes instead of a full rescan. Unlike
    ``approx_count_distinct`` (whose HLL±± state is internal to one
    aggregation), these sketches are first-class values: storable,
    unionable across jobs, and re-aggregatable to any coarser
    grouping without revisiting the raw data.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias(sketch_col)
    )


def hll_rollup(
    sketches: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Union per-detail-key sketches up to a coarser grouping and
    estimate. Input is :func:`hll_sketches` output (possibly read back
    from storage, possibly from many different jobs); ``keys`` is any
    subset of its key columns — pass ``[]`` for a grand total.

    Estimates carry standard HLL error (~1.6%/sqrt(2^lgk) — about 2.5%
    at lgk=12) and the union path may differ from a direct sketch of
    the union by a further hair (DataSketches promotes HLL_4 state to
    HLL_8 when unioning), so treat results as approximate by contract;
    the tests pin a 3% envelope against exact counts.
    """
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col), F.lit(False))
    ).alias(estimate_col)
    if keys:
        return sketches.groupBy(*keys).agg(agg)
    return sketches.agg(agg)


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimation
# ---------------------------------------------------------------------------

_CMS_MOD = 1 << 56


def _cms_cells(key: Column, depth: int, width: int) -> Column:
    """The sketch cells a key increments: array of ``depth`` column
    indices, one per hash row. Kirsch–Mitzenmacher double hashing over
    one md5 (the minhash family's construction — portable: md5,
    hex→int, and nonnegative mod are identical in every engine):
    cell_j = ((h1 + j·h2) mod 2^56) mod width."""
    h = F.md5(key)
    h1 = F.conv(F.substring(h, 1, 14), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 15, 14), 16, 10).cast("long")
    return F.array(
        *[
            ((h1 + F.lit(j) * h2) % F.lit(_CMS_MOD)) % F.lit(width)
            for j in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch of ``key_col`` frequencies: long-form
    (row, col, n) — at most depth × width rows whatever the input
    cardinality, the fixed-size summary that answers "how often did
    key X occur" within an additive overestimate of ε·N (ε ≈ e/width)
    with probability 1−δ (δ ≈ e^−depth). Overestimates only, never
    under — the min over rows at query time takes the least-collided
    cell.

    Mergeable: sketches with the same (depth, width) union by summing
    cell counts — sum over shards, days, or micro-batches commutes
    with the build (same monoid contract as the histogram partials,
    and `streaming/stats.py`'s store machinery folds this schema
    as-is). NULL keys are excluded (count them separately; a NULL is
    absence, not a frequency). ``weight_col`` makes it a weighted
    sketch (e.g. token counts per doc pre-aggregated upstream).

    Scale shape: weights are pre-aggregated per KEY first (map-side
    combined, |distinct keys|-sized exchange), so the posexplode emits
    depth rows per DISTINCT key — not per input row; on the skewed
    corpora a frequency sketch exists for, that cuts the explode
    volume by the key-duplication factor. The final cell aggregation's
    exchange stays bounded by depth × width whatever the input
    cardinality — the whole point of a sketch. (Construction is
    unchanged: summing per-key then per-cell is the same integer sum,
    so merged sketches remain bit-identical to the row-at-a-time
    build.)"""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    w = F.col(weight_col) if weight_col else F.lit(1)
    per_key = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("__k"))
        .agg(F.sum(w).alias("__w"))
    )
    return (
        per_key.select(
            F.posexplode(
                _cms_cells(F.col("__k"), depth, width)
            ).alias("row", "col"),
            "__w",
        )
        .groupBy("row", "col")
        .agg(F.sum("__w").cast("long").alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches built with the same (depth, width): sum counts
    per cell."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(
        F.sum("n").cast("long").alias("n")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate the frequency of each key in ``keys``:
    min over the key's ``depth`` cells (a missing cell is 0 — the key
    was never seen). Returns (key_col, cms_count). The estimate is
    ≥ the true count always, and exact when none of the key's cells
    collided. The sketch side is depth × width rows at most, so it
    BROADCASTS — estimating any number of keys is one broadcast hash
    join, no shuffle of the key frame."""
    cells = (
        keys.select(
            F.col(key_col),
            F.posexplode(
                _cms_cells(F.col(key_col), depth, width)
            ).alias("row", "col"),
        )
    )
    joined = cells.join(F.broadcast(sketch), ["row", "col"], "left")
    return (
        joined.groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("n"), F.lit(0)))
            .cast("long")
            .alias("cms_count")
        )
    )


def histogram_quantiles(
    hist: DataFrame,
    key_cols: Sequence[str],
    probs: Sequence[float],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Approximate quantiles from fixed-bin histogram counts — the
    read-side query that turns the incrementally-maintained histogram
    store (`streaming/stats.py::merge_histogram`, or any
    (key…, bin, n) frame with the same binning) into a p50/p95/p99
    monitor WITHOUT rescanning raw data. Resolution is the bin width;
    the point is that the input is |keys × bins| rows however large
    the corpus that produced it.

    Definition (deterministic, engine-portable — no float
    tie-breaking): for each probability p, rank = max(1, ceil(p·N));
    the quantile lies in the first bin whose cumulative count reaches
    rank, linearly interpolated inside the bin by item rank:

        q = lo + width · (bin + (rank − cum_before) / n_bin)

    Out-of-range mass sits in the edge bins (the histogram clamps),
    so edge-bin quantiles saturate at [lo, hi] — by construction, the
    same answer the histogram itself can support. Returns one row per
    (key…, prob): (key…, prob, approx_value), value rounded to 6
    decimals. Keys with zero total mass emit no rows.

    Scale shape: one cumulative window per key over ≤ n_bins rows, an
    inline probs explode, and a per-(key, prob) min — everything
    post-histogram is |keys × bins × probs| work.
    """
    from pyspark.sql.window import Window

    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    for p in probs:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"probs must be in (0, 1], got {p}")
    width = (hi - lo) / n_bins
    keys = list(key_cols)
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    base = (
        hist.groupBy(*keys, "bin")
        .agg(F.sum("n").alias("__n"))
        .withColumn("__cum", F.sum("__n").over(w_cum))
        .withColumn("__tot", F.sum("__n").over(w_all))
        .withColumn("__before", F.col("__cum") - F.col("__n"))
        .where(F.col("__tot") > 0)
    )
    prob_arr = F.array(*[F.lit(float(p)) for p in probs])
    exploded = base.select(
        *keys, "bin", "__n", "__cum", "__before", "__tot",
        F.explode(prob_arr).alias("prob"),
    ).withColumn(
        "__rank",
        F.greatest(F.lit(1), F.ceil(F.col("prob") * F.col("__tot"))),
    )
    crossing = exploded.where(F.col("__cum") >= F.col("__rank"))
    w_first = Window.partitionBy(*keys, "prob").orderBy("bin")
    return (
        crossing.withColumn("__rn", F.row_number().over(w_first))
        .where(F.col("__rn") == 1)
        .select(
            *keys,
            "prob",
            F.round(
                F.lit(lo)
                + F.lit(width)
                * (
                    F.col("bin")
                    + (F.col("__rank") - F.col("__before")) / F.col("__n")
                ),
                6,
            ).alias("approx_value"),
        )
    )
