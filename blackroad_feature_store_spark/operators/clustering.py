"""Distributed k-means over embedding columns, built to be exactly
replayable: every cross-row accumulation is integer arithmetic, so the
result is independent of partitioning / aggregation order and a SQL
oracle can certify the full iterative run hash-for-hash.

The reference engine has no clustering surface; this powers the
pipeline steps that need trained coarse structure over embeddings —
IVF index training (`operators/similarity.py` takes "any deterministic
centroid" frame; this produces one), SemDeDup-style cluster-then-dedup,
and topic-balanced sampling.

Numeric design (why this is exactly certifiable)
------------------------------------------------
* Vectors are quantized ONCE: ``q_i = floor(x_i * scale)`` as BIGINT
  (floor of an IEEE double is unambiguous — no round-half ties to
  disagree on across engines).
* **Spherical trick**: cosine similarity is scale-invariant, so the
  centroid update can keep the component-wise *SUM* of member vectors
  instead of the mean — no division, all-BIGINT state, exact under any
  aggregation order. Assignments against sum-centroids equal
  assignments against mean-centroids.
* The only floats are the per-(vector, centroid) scores, each computed
  from exact integers by the same IEEE expression on both engines
  (``dot/ (sqrt(n2_v) * sqrt(n2_c))``) — identical inputs + identical
  operation order = identical doubles, so the argmax (ties to the
  smaller centroid id) agrees bit-for-bit.
* Overflow headroom — two distinct bounds, and the TIGHTER one is the
  centroid's own squared norm, not the dot product:
  ``cn2 = dot(c, c) <= dim * (N*scale)^2`` wraps int64 at
  ``N ~ sqrt(2^63 / (dim * scale^2))`` — with ``scale=1e4`` and 64
  dims that is only ~4e4 members per cluster, far below the ~1e9 the
  dot-product bound suggests. A wrapped cn2 is not merely imprecise:
  a negative value would turn the score into sqrt(NaN) which sorts
  ABOVE every real double in ``max_by``, silently corrupting
  assignments. :func:`_guard_centroid_norms` therefore checks every
  update round on the k-row centroid frame (cost: one tiny job) that
  ``dim * max(|component|)^2`` fits in int64 — a bound computed in
  unbounded Python ints, so it cannot itself wrap — and raises with
  the member-count / scale remedy instead of assigning garbage.
  (Component sums themselves stay exact far longer: |sum| <= N*scale
  wraps only past N ~ 9e14 members, so the cn2 guard binds first.)

Scale design
------------
Assignment is a broadcast of k (sum-vector) centroids against the
corpus — one map-side pass, no shuffle; the update is one
``posexplode -> partial-agg -> (cid, pos)`` aggregation (map-side
combine does most of the work: k*dim output rows). Per-iteration
lineage is cut with ``localCheckpoint`` exactly like
``dedup.duplicate_clusters``. Clusters that receive no members vanish
(k shrinks) — deterministic and oracle-replayable; production systems
that prefer re-seeding can split the largest cluster instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "quantize_vectors",
    "kmeans_assign",
    "kmeans_fit_predict",
    "fold_centroid_update",
    "kmeans_reassign_incremental",
]


def _idot(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product (order-independent by exactness)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantize_vectors(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10_000,
) -> DataFrame:
    """(id, qv BIGINT array, n2 BIGINT squared norm): the exact-integer
    working form every other function here consumes."""
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
    )
    return df.select(F.col(id_col).alias("id"), qv.alias("qv")).withColumn(
        "n2", _idot(F.col("qv"), F.col("qv"))
    )


_I64_MAX = (1 << 63) - 1


def _guard_centroid_norms(cents: DataFrame) -> None:
    """Raise before a wrapped centroid norm can corrupt assignments.

    ``cn2 = dot(cv, cv)`` accumulates ``dim`` non-negative terms each
    ``<= max(|component|)^2``, so if ``dim * max(|component|)^2``
    fits in int64 (checked in unbounded Python arithmetic) neither
    the final value NOR any intermediate partial can wrap. Runs on
    the k-row centroid frame — one tiny job per Lloyd round."""
    sel = [
        F.max(
            F.aggregate(
                F.transform("cv", lambda x: F.abs(x)),
                F.lit(0).cast("long"),
                lambda acc, x: F.greatest(acc, x),
            )
        ).alias("mx"),
        F.max(F.size("cv")).alias("dim"),
    ]
    # run BEFORE cn2 is evaluated wherever possible: in ANSI mode an
    # overflowing cn2 throws an opaque mid-job error; with ANSI off it
    # silently wraps — the bound check below turns both into one
    # diagnosable message. When a cn2 column already exists, also
    # catch a wrapped-negative value (non-ANSI sessions).
    has_cn2 = "cn2" in cents.columns
    if has_cn2:
        sel.append(F.min("cn2").alias("mn"))
    row = cents.select(*sel).first()
    if row["mx"] is None:
        return
    if has_cn2 and row["mn"] is not None and row["mn"] < 0:
        raise ArithmeticError(
            "kmeans: centroid squared norm wrapped int64 (cn2 < 0) — "
            "shrink `scale` or the per-cluster member count"
        )
    if row["dim"] * row["mx"] * row["mx"] > _I64_MAX:
        raise ArithmeticError(
            f"kmeans: centroid norm bound dim*max|comp|^2 = "
            f"{row['dim']} * {row['mx']}**2 exceeds int64 — cn2 can "
            "wrap and a negative norm would make scores NaN (which "
            "max_by sorts ABOVE real doubles, silently corrupting "
            "assignments); shrink `scale` (bound: members-per-cluster "
            "N <~ sqrt(2**63 / (dim * scale**2)))"
        )


def _score(qn2: Column, cn2: Column, dot_: Column) -> Column:
    # Zero-norm guard: all-zero vectors sort below every real score.
    return F.when((qn2 == 0) | (cn2 == 0), F.lit(-1.0)).otherwise(
        dot_.cast("double")
        / (F.sqrt(qn2.cast("double")) * F.sqrt(cn2.cast("double")))
    )


def kmeans_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Nearest-centroid assignment by max cosine (ties to the smaller
    centroid id). ``vectors`` is quantize_vectors output; ``centroids``
    carries (cid, cv, cn2). Centroids are broadcast — assignment is a
    single map-side pass over the corpus.

    The argmax is a ``max_by`` AGGREGATE, not a window: the N×k scored
    rows collapse to one row per vector in the map-side combine, so
    the exchange carries N rows instead of N×k — the difference
    between minutes and hours once k reaches the ~sqrt(n) production
    range. ``struct(score, -cid)`` makes the max prefer the smaller
    centroid id on exact ties, identical to the oracle's
    (score DESC, cid) row_number ordering.

    ``carry`` names extra ``vectors`` columns to keep on the output
    (r17): each is per-id constant by construction (the crossJoin
    replicates the vector row), so ``any_value`` re-emits it exactly
    and the caller skips the assign→vectors re-join — which would
    otherwise re-evaluate the whole vector-building subtree a second
    time (the ingest-maintenance paths re-quantized every batch for
    the join side) plus pay the join's exchange."""
    c = F.broadcast(centroids.select("cid", "cv", "cn2"))
    scored = vectors.crossJoin(c).select(
        "id",
        *carry,
        "cid",
        _score(F.col("n2"), F.col("cn2"), _idot(F.col("qv"), F.col("cv"))).alias(
            "__s"
        ),
    )
    return scored.groupBy("id").agg(
        F.expr("max_by(cid, struct(__s, -cid))").alias("cid"),
        *[F.any_value(F.col(c_)).alias(c_) for c_ in carry],
    )


def _update_centroids(assign: DataFrame, vectors: DataFrame) -> DataFrame:
    """Sum-centroids from an assignment: component-wise BIGINT sums
    (spherical k-means — cosine ignores centroid magnitude, so the sum
    stands in for the mean with zero division error)."""
    comp = (
        assign.join(vectors.select("id", "qv"), "id")
        .select("cid", F.posexplode("qv").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.sum("v").cast("long").alias("s"))
    )
    # cn2 is NOT attached here: callers guard the (cid, cv) frame
    # first (see _guard_centroid_norms) and only then evaluate the
    # norm — so an overflowing norm is reported diagnosably instead
    # of throwing mid-job (ANSI) or wrapping silently (non-ANSI).
    return comp.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))),
            lambda x: x["s"],
        ).alias("cv")
    )


def fold_centroid_update(
    centroids: DataFrame,
    delta_sums: DataFrame,
    *,
    cid_col: str = "cluster_id",
    pos_col: str = "pos",
    sum_col: str = "s",
) -> DataFrame:
    """Apply per-(cluster, component) delta SUMS to sum-centroids:
    ``C'_c = C_c + delta_c`` — the payoff of the spherical no-division
    design: ingesting new members into cluster ``c`` updates ONLY
    ``c``'s centroid, exactly, with no rescan of existing members
    (this is what `stream_exec_kmeans_update`'s folded store feeds).
    ``delta_sums`` carries (cid_col, pos_col 1-based, sum_col) and may
    be SPARSE per cluster — components without a delta row fold +0
    (the delta array is built DENSELY via a pos-keyed map lookup, not
    by array index, so a cluster whose delta touched only component 5
    cannot land that mass on component 1). Clusters absent from it
    keep their centroid bit-identically. Three corruption classes
    raise instead of folding: a delta cid with NO matching centroid
    (partials folded against the wrong centroid generation), a
    duplicated (cid, pos) pair (the same partials folded twice), and
    a pos outside [1, dim] (mass that a positional lookup would
    silently drop). Returns updated (cid, cv, cn2), norm-guarded like
    every Lloyd round."""
    dstats = delta_sums.groupBy(F.col(cid_col).alias("cid")).agg(
        F.collect_list(
            F.struct(
                F.col(pos_col).cast("int").alias("pos"),
                F.col(sum_col).cast("long").alias("s"),
            )
        ).alias("__entries"),
        F.count(F.lit(1)).alias("__np"),
        F.count_distinct(F.col(pos_col)).alias("__nd"),
        F.min(F.col(pos_col).cast("int")).alias("__pmin"),
        F.max(F.col(pos_col).cast("int")).alias("__pmax"),
        # a NULL sum would otherwise coalesce to +0 in the dense build
        # — silent mass loss, the exact failure class this validation
        # exists for
        F.max(
            F.when(F.col(sum_col).isNull(), 1).otherwise(0)
        ).alias("__snull"),
    ).localCheckpoint(eager=False)
    # ONE k-bounded validation collect (r17 — was two separate
    # actions, orphans then malformed, each re-aggregating
    # delta_sums): a LEFT join against the centroid frame flags
    # orphans as NULL ``__dim`` rows and malformed deltas by the same
    # predicates as before, and — the lazy-checkpoint pattern — this
    # collect materializes ``dstats`` so the dense fold below reads
    # the persisted blocks instead of re-running the groupBy.
    issues = (
        dstats.join(
            centroids.select("cid", F.size("cv").alias("__dim")),
            "cid",
            "left",
        )
        .where(
            F.col("__dim").isNull()
            | (F.col("__np") != F.col("__nd"))
            | (F.col("__pmin") < 1)
            | (F.col("__pmax") > F.col("__dim"))
            | (F.col("__snull") == 1)
        )
        .select(
            "cid", "__np", "__nd", "__pmin", "__pmax", "__dim", "__snull"
        )
        .collect()  # k-bounded: dstats has at most one row per cluster
    )
    orphans = [r["cid"] for r in issues if r["__dim"] is None]
    if orphans:
        raise ValueError(
            f"fold_centroid_update: delta sums reference cluster ids "
            f"with no centroid ({sorted(orphans)[:5]}...) — the "
            "partials were folded against a different centroid "
            "generation; dropping their mass would corrupt the index"
        )
    malformed = [r for r in issues if r["__dim"] is not None]
    if malformed:
        r = malformed[0]
        raise ValueError(
            f"fold_centroid_update: malformed delta sums for cluster "
            f"{r['cid']} ({len(malformed)} cluster(s) total): "
            f"{r['__np']} rows over {r['__nd']} distinct components, "
            f"pos range [{r['__pmin']}, {r['__pmax']}] vs dim "
            f"{r['__dim']}, null sums={bool(r['__snull'])} — "
            "duplicated (cid, pos) pairs mean the same partials were "
            "folded twice; out-of-range pos or NULL sums would drop "
            "mass silently"
        )
    # dense pos-keyed fold: the map build only evaluates after the
    # duplicate check above, so map_from_entries can never hit a
    # duplicate key mid-job
    dcv = dstats.select(
        "cid", F.map_from_entries("__entries").alias("__dm")
    )
    folded = centroids.join(dcv, "cid", "left").select(
        "cid",
        F.when(F.col("__dm").isNull(), F.col("cv"))
        .otherwise(
            F.zip_with(
                "cv",
                F.transform(
                    F.sequence(F.lit(1), F.size("cv")),
                    lambda i: F.coalesce(
                        F.element_at("__dm", i), F.lit(0).cast("long")
                    ),
                ),
                lambda a, b: a + b,
            )
        )
        .alias("cv"),
    )
    _guard_centroid_norms(folded)  # before the norm evaluates
    return folded.withColumn("cn2", _idot(F.col("cv"), F.col("cv")))


def kmeans_reassign_incremental(
    vectors: DataFrame,
    old_assign: DataFrame,
    centroids: DataFrame,
    changed_cids,
) -> DataFrame:
    """Exact nearest-centroid reassignment after a centroid update
    that touched only ``changed_cids`` — equals
    :func:`kmeans_assign` (vectors, updated centroids) bit-for-bit
    while scoring most vectors against |changed| + 1 centroids
    instead of k.

    Why it is exact: scores against UNCHANGED centroids are
    unchanged, so for a vector whose old assignment ``old_cid`` is
    unchanged, ``old_cid`` still dominates every unchanged centroid
    (it was the min-cid argmax over a superset) — the new argmax can
    only be ``old_cid`` or a CHANGED centroid, and the min-cid
    tie-break over that reduced set equals the full argmax's.
    Vectors whose old assignment IS a changed centroid lost their
    dominance witness and rescore against all k (the "rebuild
    changed lists" term — bounded by the lists the update touched).

    ``vectors`` is quantize_vectors output; ``old_assign`` MUST be
    ``kmeans_assign(vectors, pre_update_centroids)`` — the argmax at
    exactly the centroids the update was folded from. A training
    loop's final assignment does NOT qualify (it is the argmax at the
    PREVIOUS round's centroids; the dominance witness then fails —
    caught by the 100x probe's in-query certificate before it became
    a catalog bug). ``centroids`` is the post-update (cid, cv, cn2)
    frame containing every old cid.

    Every row of ``vectors`` is assigned: a vector MISSING from
    ``old_assign`` has no dominance witness, so it routes through the
    full k-centroid rescore (exact regardless) instead of being
    silently dropped the way an inner join would — a stale or partial
    ``old_assign`` therefore degrades to extra scoring work, never to
    a shrunken index. Rows of ``old_assign`` absent from ``vectors``
    are ignored (the result is an assignment FOR ``vectors``)."""
    changed = sorted(set(changed_cids))
    va = vectors.join(
        old_assign.withColumnRenamed("cid", "__old"), "id", "left"
    )
    if not changed:
        # no centroid moved: witnessed rows keep their assignment;
        # unwitnessed rows still need the full rescore
        missing = va.where(F.col("__old").isNull())
        return va.where(F.col("__old").isNotNull()).select(
            "id", F.col("__old").alias("cid")
        ).unionByName(
            kmeans_assign(missing.select("id", "qv", "n2"), centroids)
        )
    moved = va.where(
        F.col("__old").isNull() | F.col("__old").isin(changed)
    )
    stay = va.where(~F.col("__old").isin(changed))
    m_assign = kmeans_assign(
        moved.select("id", "qv", "n2"), centroids
    )
    own = stay.join(
        F.broadcast(centroids.withColumnRenamed("cid", "__old")),
        "__old",
    ).select(
        "id",
        F.col("__old").alias("cid"),
        _score(
            F.col("n2"), F.col("cn2"), _idot(F.col("qv"), F.col("cv"))
        ).alias("__s"),
    )
    ch = F.broadcast(
        centroids.where(F.col("cid").isin(changed)).select(
            "cid", "cv", "cn2"
        )
    )
    vs_changed = stay.crossJoin(ch).select(
        "id",
        "cid",
        _score(
            F.col("n2"), F.col("cn2"), _idot(F.col("qv"), F.col("cv"))
        ).alias("__s"),
    )
    s_assign = (
        own.unionByName(vs_changed)
        .groupBy("id")
        .agg(F.expr("max_by(cid, struct(__s, -cid))").alias("cid"))
    )
    return s_assign.unionByName(m_assign)


def kmeans_fit_predict(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 3,
    scale: int = 10_000,
    return_centroids: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Lloyd's algorithm, exactly certifiable end-to-end.

    Init: the k records with the smallest ids (deterministic and
    trivially replayable; for dense 0-based ids this is ``id < k``).
    Returns the final assignment (id_col, ``cluster_id``); with
    ``return_centroids=True`` also the post-update sum-centroids
    (cid, cv, cn2) ready for :func:`ivf` index building.

    NULL components (or NULL vectors) are the caller's problem by
    contract — a NULL inside ``vec_col`` propagates to a NULL norm
    and the vector sorts below every real centroid score."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iterations < 1:
        # iterations=0 has no defined output (no assignment exists);
        # the loop below would otherwise fall through to assign=None.
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    # spread BEFORE the checkpoint (r16): localCheckpoint freezes the
    # input partitioning, so a single-row-group scan would pin every
    # Lloyd round's corpus pass (assign dots, update join + explode)
    # to ONE task for the whole fit; no-op on a wide scan.
    from blackroad_feature_store_spark.operators.util import spread

    q = quantize_vectors(
        spread(df, id_col), id_col=id_col, vec_col=vec_col, scale=scale
    ).localCheckpoint()
    cents = (
        q.orderBy("id")
        .limit(k)
        .select(F.col("id").alias("cid"), F.col("qv").alias("cv"),
                F.col("n2").alias("cn2"))
        # lazy: the guard's aggregate below is the materializing
        # action (a global aggregate evaluates every partition, so
        # the persist is complete) — checkpoint + guard are ONE job
        # per round instead of two (VERDICT r16 ask #4)
        .localCheckpoint(eager=False)
    )
    _guard_centroid_norms(cents)  # raw vectors can wrap too (huge x*scale)
    # Per round, only the k-row centroid frame is checkpointed (cut
    # lineage + force one job); the assignment stays LAZY — the final
    # one is evaluated by the consumer against the already-checkpointed
    # previous centroids, so each Lloyd round costs exactly one pass
    # over the corpus instead of three.
    assign = None
    for _ in range(iterations):
        assign = kmeans_assign(q, cents)
        # lazy checkpoint + guard = one job per Lloyd round: the
        # guard's global aggregate computes (and persists) every
        # partition of the round's centroid frame and answers the
        # overflow check from the same action.
        cv_only = _update_centroids(assign, q).localCheckpoint(
            eager=False
        )
        _guard_centroid_norms(cv_only)  # before the norm evaluates
        cents = cv_only.withColumn("cn2", _idot(F.col("cv"), F.col("cv")))
    out = assign.select(
        F.col("id").alias(id_col), F.col("cid").alias("cluster_id")
    )
    if return_centroids:
        return out, cents
    return out
