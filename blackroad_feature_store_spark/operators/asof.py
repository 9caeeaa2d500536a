"""As-of (point-in-time) operators.

The signature operator of the reference engine: "latest snapshot with
timestamp <= t per key" (``feature_store.py:391-405``) and the
point-in-time join built on it (``feature_store.py:411-448``). The
reference runs one indexed SQLite point query per (entity × group)
pair; here the same semantics are ONE distributed plan:

    filter(ts <= t)                      -- pushed to the parquet scan
    window row_number over (key, ts desc) == 1   -- top-1 per key
    left join onto the spine             -- broadcast if spine is small

Scale notes (100 TB): the ts filter and key filters reach the scan via
predicate pushdown + partition pruning (records are partitioned by
group_id); the window shuffles once on the key columns, and AQE splits
skewed keys. When the spine is a small entity list, Spark's size
estimate makes it the broadcast side automatically; we also expose
``broadcast_spine`` to force it.
"""

from __future__ import annotations

from datetime import datetime
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_as_of(
    records: DataFrame,
    keys: Sequence[str],
    ts_col: str = "timestamp",
    as_of: datetime | str | Column | None = None,
    tiebreakers: Sequence[str] = ("id",),
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Top-1 snapshot per key: the newest row with ``ts_col <= as_of``.

    Deterministic under timestamp ties via ``tiebreakers`` (the
    reference's ``ORDER BY timestamp DESC LIMIT 1`` leaves ties
    unspecified — SURVEY.md §2.3 pins them down with the record id).

    ``tolerance`` (an interval string like ``"90 days"``, requires
    ``as_of``) additionally excludes snapshots older than
    ``as_of - tolerance`` — pandas ``merge_asof(tolerance=...)``
    semantics: a stale snapshot is treated as no snapshot. The bound
    is a second pushdown-able range predicate, so at scale it PRUNES
    the scan rather than adding work.

    ``direction="forward"`` flips the operator into LABEL extraction:
    the EARLIEST row with ``ts_col >= as_of`` per key (ties by
    ascending tiebreakers), with ``tolerance`` bounding how far ahead
    to look — "the next purchase within 7 days of the cutoff", the
    standard forward-label join of supervised training sets.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    df = records
    if tolerance is not None and as_of is None:
        raise ValueError("tolerance requires as_of")
    if direction == "forward" and as_of is None:
        raise ValueError("direction='forward' requires as_of")
    if as_of is not None:
        as_of_expr = as_of if isinstance(as_of, Column) else F.lit(as_of)
        if direction == "backward":
            df = df.where(F.col(ts_col) <= as_of_expr)
            if tolerance is not None:
                df = df.where(
                    F.col(ts_col)
                    >= as_of_expr.cast("timestamp")
                    - F.expr(f"INTERVAL {tolerance}")
                )
        else:  # forward: the EARLIEST record at or after the cutoff
            df = df.where(F.col(ts_col) >= as_of_expr)
            if tolerance is not None:
                df = df.where(
                    F.col(ts_col)
                    <= as_of_expr.cast("timestamp")
                    + F.expr(f"INTERVAL {tolerance}")
                )
    if direction == "backward":
        order = [F.col(ts_col).desc()] + [
            F.col(c).desc() for c in tiebreakers if c in df.columns
        ]
    else:
        order = [F.col(ts_col).asc()] + [
            F.col(c).asc() for c in tiebreakers if c in df.columns
        ]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def as_of_join(
    spine: DataFrame,
    records: DataFrame,
    on: str | Sequence[str],
    ts_col: str = "timestamp",
    as_of: datetime | str | Column | None = None,
    tiebreakers: Sequence[str] = ("id",),
    how: str = "left",
    broadcast_spine: bool = False,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Join each spine row to the latest record snapshot as of a time
    (``direction="forward"``: to the EARLIEST record at/after it — the
    label join; global-cutoff form only).

    * ``as_of`` a literal → one global cutoff (the reference CLI case).
    * ``as_of`` = a column name present in ``spine`` → per-row cutoff
      (classic training-set point-in-time correctness). Implemented as
      join-then-window so each spine row sees only records at or before
      its own timestamp.
    * ``tolerance`` (interval string) → snapshots older than
      ``as_of - tolerance`` don't match (stale features become NULLs
      under a left join instead of silently serving old data). In the
      per-row branch the bound tightens the range-join condition, which
      SHRINKS the pre-window intermediate — at scale a tolerance makes
      the per-row as-of cheaper, not costlier.
    """
    on_cols = [on] if isinstance(on, str) else list(on)

    if direction != "backward" and isinstance(as_of, str) and as_of in spine.columns:
        raise ValueError(
            "direction='forward' supports the global-cutoff form only "
            "(per-row forward labels: call latest_as_of per cutoff)"
        )
    if isinstance(as_of, str) and as_of in spine.columns:
        # Per-row as-of: range-join then per-spine-row top-1.
        spine_keyed = spine.withColumn(
            "__spine_id", F.monotonically_increasing_id()
        )
        s = F.broadcast(spine_keyed) if broadcast_spine else spine_keyed
        conds = [s[c] == records[c] for c in on_cols] + [
            records[ts_col] <= s[as_of]
        ]
        if tolerance is not None:
            conds.append(
                records[ts_col]
                >= s[as_of].cast("timestamp")
                - F.expr(f"INTERVAL {tolerance}")
            )
        joined = s.join(records, on=conds, how=how)
        order = [records[ts_col].desc()] + [
            records[c].desc() for c in tiebreakers if c in records.columns
        ]
        w = Window.partitionBy("__spine_id").orderBy(*order)
        out = (
            joined.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__spine_id")
        )
        for c in on_cols:
            out = out.drop(records[c])
        return out

    latest = latest_as_of(
        records, on_cols, ts_col, as_of, tiebreakers,
        tolerance=tolerance, direction=direction,
    )
    s = F.broadcast(spine) if broadcast_spine else spine
    return s.join(latest, on=on_cols, how=how)


def gapfill_locf(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    step: str = "INTERVAL 1 HOUR",
    bucket_trunc: str = "hour",
    fill: str = "locf",
) -> DataFrame:
    """Regularize an irregular time series per key: bucket, fill the
    missing buckets, carry the last observation forward (TimescaleDB's
    ``time_bucket_gapfill`` + ``locf``, Pandas' ``resample().ffill()``
    — the step every feature pipeline needs between raw events and a
    fixed-frequency model input).

    Per key the grid spans [min bucket, max bucket] of that key's OWN
    observations (no global range — a key active for a day never emits
    a year of gap rows). Output per (key, bucket):
    ``bucket_value`` (the aggregated observation, NULL on gaps),
    ``filled_value`` (LOCF), ``is_gap`` (1 on synthesized rows).

    ``fill="interp"`` linearly interpolates gaps between the
    surrounding observations instead of carrying the last one forward
    (pandas ``resample().interpolate()``): each gap row gets
    ``v0 + (v1 - v0) * (t - t0) / (t1 - t0)`` from the nearest
    observed buckets on each side. Interior gaps only — a grid always
    starts and ends on observations, so no extrapolation arises.

    Scale shape: one aggregation to buckets (map-side combinable), a
    per-key min/max (same shuffle key, AQE-coalesced), the grid
    generated by ``sequence()`` + ``explode`` INSIDE each key's row —
    no crossJoin against a calendar table — and one window sort per
    key for the fill (two passes for interp: previous and next
    observation). Grid size is Σ per-key span/step; keys partition
    independently, so a 100 TB corpus fills in parallel. Sums run
    through DECIMAL so partial-agg order can't move the filled
    values.
    """
    if fill not in ("locf", "interp"):
        raise ValueError(f"fill must be locf|interp: {fill!r}")
    ks = list(keys)
    dec_sum = F.sum(F.col(value_col).cast("decimal(18,6)"))
    obs = df.groupBy(
        *ks, F.date_trunc(bucket_trunc, F.col(ts_col)).alias("bucket")
    ).agg(
        dec_sum.cast("double").alias("bucket_value"),
        # exact 6dp decimal twin of bucket_value: interp arithmetic
        # runs on THIS (exact numerator, one double division at the
        # end) so FMA/codegen ulp differences between engines cannot
        # flip the rounded output
        dec_sum.cast("decimal(18,6)").alias("__bvd"),
    )
    rng = obs.groupBy(*ks).agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    grid = rng.select(
        *ks,
        F.explode(
            F.sequence(F.col("__b0"), F.col("__b1"), F.expr(step))
        ).alias("bucket"),
    )
    j = grid.join(obs, [*ks, "bucket"], "left")
    w_back = (
        Window.partitionBy(*ks)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if fill == "locf":
        filled = F.last("bucket_value", ignorenulls=True).over(w_back)
    else:
        w_fwd = (
            Window.partitionBy(*ks)
            .orderBy("bucket")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        obs_ts = F.when(
            F.col("bucket_value").isNotNull(), F.col("bucket")
        ).cast("long")
        t0 = F.last(obs_ts, ignorenulls=True).over(w_back)
        v0 = F.last("__bvd", ignorenulls=True).over(w_back)
        t1 = F.first(obs_ts, ignorenulls=True).over(w_fwd)
        v1 = F.first("__bvd", ignorenulls=True).over(w_fwd)
        t = F.col("bucket").cast("long")
        # (v0*(t1-t) + v1*(t-t0)) / (t1-t0): numerator exact in
        # DECIMAL over integer-second deltas. The quotient lands on
        # exact 6dp half-points for round data (2dp values, hour
        # grids), where Spark's decimal-rendering HALF_UP and a
        # binary-double round() disagree — so the 6dp rounding is
        # done HERE in exact integer arithmetic (half away from
        # zero), engine-portably; the division back by 1e6 is exact
        # in both engines.
        # Guarded to gap rows only: on observed rows t1==t0 makes the
        # eagerly-computed __interp6 a DIV-by-zero (an error under
        # Spark ANSI mode even though the outer when() never reads
        # it), so the numerator stays NULL there. The numerator stays
        # DECIMAL end-to-end (precision 38 — no long cast of
        # value×delta×1e6, which silently overflowed for large values
        # times multi-month deltas); only the DIV quotient ≈ value×1e6
        # lands in a long, bounding |value| at ~9.2e12.
        num_i = F.when(
            F.col("bucket_value").isNull(),
            (v0 * (t1 - t) + v1 * (t - t0)) * 1_000_000,
        )
        den = t1 - t0
        pos = F.expr(
            "(2 * __num_i + __den) DIV (2 * __den)"
        )
        interp6 = F.when(
            F.col("__num_i") >= 0, pos
        ).otherwise(-(
            F.expr("(2 * -__num_i + __den) DIV (2 * __den)")
        ))
        filled = F.when(
            F.col("bucket_value").isNotNull(), F.col("bucket_value")
        ).otherwise(F.col("__interp6") / F.lit(1_000_000.0))
    if fill == "interp":
        j = (
            j.withColumn("__num_i", num_i)
            .withColumn("__den", den)
            .withColumn("__interp6", interp6)
        )
    return j.select(
        *ks,
        "bucket",
        F.round("bucket_value", 6).alias("bucket_value"),
        F.round(filled, 6).alias("filled_value"),
        F.when(F.col("bucket_value").isNull(), 1)
        .otherwise(0)
        .alias("is_gap"),
    )


def as_of_join_pandas(
    spine: DataFrame,
    records: DataFrame,
    on: str | Sequence[str],
    as_of_col: str,
    ts_col: str = "timestamp",
    tiebreakers: Sequence[str] = ("id",),
    tolerance: str | None = None,
) -> DataFrame:
    """The per-row point-in-time join on the pandas ``merge_asof``
    path — same contract as :func:`as_of_join` with a per-row
    ``as_of`` column and ``how="left"``, different execution: instead
    of range-join + per-spine-row window top-1 (which materializes
    every candidate (spine, record) pair before pruning), both sides
    cogroup-shuffle ONCE on the key and each group runs pandas'
    O(n log n) sort + linear merge — no pair blow-up. The win grows
    with snapshot depth per entity; the window form wins when groups
    are tiny and the Python worker round-trip dominates. Both produce
    identical rows (ties resolved to max ``tiebreakers`` at equal
    timestamps, matching the window's DESC ordering; pinned by a
    randomized parity test).

    ``tolerance`` accepts a pandas-Timedelta string ("90 days"):
    matches older than ``as_of - tolerance`` become NULLs, inclusive
    at the boundary, same as the window form.

    Grouping granularity: the cogroup keys on HASH BUCKETS of the join
    key (``pmod(xxhash64(key), shuffle_partitions)``), not on the key
    itself, and each bucket runs ONE ``merge_asof(..., by=key)`` over
    all its entities. Per-entity cogrouping would make one Arrow
    batch + one Python call per entity — with millions of small
    entity groups the interpreter round-trips dominate (measured 29s
    → ~2s at sf0.1). Bucketing keeps the call count at the partition
    count while ``by=`` preserves exact per-entity semantics.

    NULL join keys: a NULL-key spine row gets NULL payload (no match)
    in BOTH forms. The window form gets this for free — it starts from
    an equality range-join, and SQL equality never matches NULL. The
    pandas form must enforce it: ``merge_asof(by=...)`` PAIRS
    None/NaN/NA keys (verified for object, float64, and nullable-Int64
    dtypes), so NULL-key records are dropped from the right side
    before the merge. Pinned by ``test_asof_pandas_null_key_parity``.

    Float-NaN key caveat (distinct from NULL): Spark treats NaN = NaN
    as TRUE in equality joins, so the window form matches records
    whose double-typed key is a genuine (non-NULL) NaN. Arrow maps
    Spark NULL in a double column to pandas NaN too, making NULL and
    real NaN indistinguishable here — the ``dropna`` therefore also
    drops real-NaN keys and the two forms diverge for double keys
    containing NaN values. Feature-store entity keys are strings/ints
    in every catalog path; avoid double join keys holding NaN, or use
    the window form for them.
    """
    import pandas as pd
    from pyspark.sql import types as T

    on_cols = [on] if isinstance(on, str) else list(on)
    if as_of_col not in spine.columns:
        raise ValueError(f"spine has no column {as_of_col!r}")
    payload = [c for c in records.columns if c not in on_cols]
    overlap = set(payload) & set(spine.columns)
    if overlap:
        raise ValueError(
            f"column collision between spine and records: {sorted(overlap)}"
        )
    spine_cols = list(spine.columns)
    out_schema = T.StructType(
        [spine.schema[c] for c in spine_cols]
        + [records.schema[c] for c in payload]
    )
    sort_rec = [ts_col] + [t for t in tiebreakers if t in records.columns]
    tol = pd.Timedelta(tolerance) if tolerance is not None else None

    try:
        nb = int(
            spine.sparkSession.conf.get(
                "spark.sql.shuffle.partitions", "200"
            )
        )
    except ValueError:
        # Some platforms set the conf to a non-numeric value (e.g.
        # "auto" under adaptive coalescing); fall back to core count.
        nb = spine.sparkSession.sparkContext.defaultParallelism
    bkt = F.pmod(F.xxhash64(*[F.col(c) for c in on_cols]), F.lit(nb))
    sp = spine.withColumn("__bkt", bkt)
    rc = records.withColumn("__bkt", bkt)

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.drop(columns="__bkt").sort_values(
            as_of_col, kind="mergesort"
        )
        # NULL-key records can never match (SQL equality semantics,
        # matching the window form) — but merge_asof's by= WOULD pair
        # them with NULL-key spine rows, so drop them first.
        right = right.dropna(subset=on_cols)
        if right.empty:
            out = left.copy()
            for c in payload:
                out[c] = None
            return out[spine_cols + payload]
        right = right.drop(columns="__bkt").sort_values(
            sort_rec, kind="mergesort"
        )
        merged = pd.merge_asof(
            left,
            right[on_cols + payload],
            left_on=as_of_col,
            right_on=ts_col,
            by=on_cols,
            direction="backward",
            tolerance=tol,
        )
        return merged[spine_cols + payload]

    return (
        sp.groupBy("__bkt")
        .cogroup(rc.groupBy("__bkt"))
        .applyInPandas(lambda lk, rk: fn(lk, rk), out_schema)
    )


def as_of_join_auto(
    spine: DataFrame,
    records: DataFrame,
    on: str | Sequence[str],
    as_of_col: str,
    ts_col: str = "timestamp",
    tiebreakers: Sequence[str] = ("id",),
    tolerance: str | None = None,
    depth_threshold: float = 16.0,
) -> DataFrame:
    """Per-row point-in-time join with the execution strategy picked
    automatically (callers previously had to choose, and the wrong
    pick at scale is expensive in opposite directions):

    * :func:`as_of_join` (range-join + window top-1) materializes
      every (spine row, record at-or-before) candidate pair before
      pruning — cost grows with mean snapshot DEPTH per entity, but
      everything stays JVM-side in whole-stage codegen.
    * :func:`as_of_join_pandas` (bucketed ``merge_asof``) never builds
      the pair set — each bucket is one O(n log n) sort + linear
      merge — but pays Arrow transfer of both sides and Python
      workers.

    The crossover is history depth: shallow history (few snapshots per
    entity) means a small pair set, so the window form wins; deep
    history means the pair blow-up dominates, so the pandas form wins.
    Depth is estimated as ``count / approx_count_distinct(key)`` in
    ONE column-pruned, map-side-partial aggregation over the records
    side — an HLL-sketch scan whose cost stays bounded at any corpus
    size (only sketches shuffle, never rows). ``depth_threshold``
    defaults to 16: near the threshold both forms are within ~2x of
    each other (sf0.1 measurements, PLANS_r07.md), so the heuristic
    only needs to catch the order-of-magnitude far-from-threshold
    cases.

    Strategy contract: per-row cutoff, ``how="left"``, backward
    direction — the intersection both forms support. Both are proven
    value-identical on randomized workloads (``test_pit_property``).
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    # approx_count_distinct over a struct keeps NULL components
    # distinct: a concat_ws proxy would SKIP NULLs, collapsing
    # ('a', NULL), (NULL, 'a') and ('a',) into one key and deflating
    # the distinct count — a mispicked strategy (perf only) on
    # NULL-heavy composite keys.
    est = records.select(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(
            F.struct(*[F.col(c) for c in on_cols])
        ).alias("d"),
    ).first()
    depth = (est["n"] / est["d"]) if est["d"] else 0.0
    if depth >= depth_threshold:
        return as_of_join_pandas(
            spine, records, on=on_cols, as_of_col=as_of_col,
            ts_col=ts_col, tiebreakers=tiebreakers, tolerance=tolerance,
        )
    return as_of_join(
        spine, records, on=on_cols, ts_col=ts_col, as_of=as_of_col,
        tiebreakers=tiebreakers, tolerance=tolerance,
    )
