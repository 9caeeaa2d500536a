"""Deduplication operators for LLM training-data pipelines.

Five families, each a pure DataFrame pipeline:

* **Exact** — hash-groupBy on a normalized fingerprint. One shuffle on
  the hash; at 100 TB this is the cheapest possible dedup.
* **MinHash / LSH** — banded min-shingle signatures via
  Kirsch–Mitzenmacher double hashing: md5(shingle) ONCE, split into
  two 56-bit halves (h1, h2); hash j is (h1 + j·h2) mod 2^56, and a
  band's signature concatenates the minima of its rows_per_band
  hashes. Engine-independent (md5 / hex→int / modular arithmetic are
  identical everywhere), so the DuckDB oracle reproduces candidate
  pairs bit-for-bit. Candidates come from a self-equi-join on
  (band, signature) — the LSH bucket join — NOT an all-pairs
  comparison, so cost scales with bucket sizes, not n².
* **SimHash** — 16-bit signature from per-token md5 nibbles; documents
  agreeing on all 16 bits are near-dup candidates. Same portability
  rationale.
* **N-gram Jaccard** — exact Jaccard over distinct word shingles for a
  candidate pair set (feed it LSH candidates at scale; the oracle uses
  a same-source restriction to stay small).
* **Embedding cosine** — near-dup pairs with cosine ≥ τ, blocked by a
  cheap partition key (label / LSH bucket) to avoid n² at scale.

Skew note: a pathological shingle (e.g. boilerplate) can make one LSH
bucket huge. AQE skew-join splitting is on in session.py; for truly
adversarial corpora, cap bucket size with a count filter before the
self-join (``max_bucket``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from blackroad_feature_store_spark.operators.util import spread
from blackroad_feature_store_spark.operators.text import (
    fingerprint,
    tokens,
    word_shingles,
)


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group documents by normalized-text fingerprint.

    Returns (fingerprint, dup_count, keep_id, doc_ids): ``keep_id`` is
    the canonical survivor (min id — deterministic), ``doc_ids`` the
    sorted members. Filter ``dup_count > 1`` for actual duplicates.
    """
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bands: int = 8,
    shingle_size: int = 3,
    rows_per_band: int = 2,
) -> DataFrame:
    """Banded MinHash signatures: one row per (id, band, signature).

    Hash family (Kirsch–Mitzenmacher double hashing, the standard
    minhash construction in e.g. datasketch): each shingle is md5'd
    ONCE, the digest split into two 56-bit integers (h1, h2), and the
    j-th hash is g_j = (h1 + j·h2) mod 2^56. Band ``b`` takes the
    minima of its ``rows_per_band`` hashes (j = b·r … b·r+r−1) and
    joins them with '|' into the band signature. Engine-portable: md5,
    hex-substring → integer, and nonnegative modular arithmetic are
    identical in every engine, so the DuckDB oracle reproduces
    signatures bit-for-bit. One md5 per shingle (instead of
    bands × rows) is what keeps the signature pass scan-bound.

    ``rows_per_band`` ≥ 2 is what gives LSH its S-curve: with r rows
    a pair collides in a band with probability J^r, so P(candidate) =
    1 − (1 − J^r)^bands. At r=1 the curve is so flat that mildly
    similar pairs (J≈0.3 → 94% at 8 bands) flood the candidate set;
    r=2 drops that to ~53% while J≥0.8 pairs still collide with
    ≥99.9% probability — candidate volume tracks true near-dups, the
    property that keeps the downstream pair verification linear at
    100 TB.

    Plan shape (tuned for 100 TB): explode shingles once, then ONE
    groupBy(id) computing all num_bands × rows_per_band minima as
    separate aggregate columns — map-side combine collapses each
    partition to one row per doc BEFORE the exchange, so shuffle
    volume is |docs| rows of hashes instead of |shingles| ×
    num_bands × rows_per_band rows (the naive
    explode-bands-then-aggregate shape).

    Overflow bound: h1, h2 < 2^56 and j < 16, so h1 + j·h2 < 2^60 —
    exact in a 64-bit long in both engines.
    """
    # Spread compact (id, text) rows across cores BEFORE the
    # shingle-explode + hash stage: a small parquet file arrives as
    # one scan partition, serializing the per-row-expensive hashing.
    # Keyed on id_col so the groupBy below reuses the partitioning
    # (no second exchange). On a many-file 100 TB input the
    # repartition just rebalances — it never concentrates.
    df = spread(df, id_col)
    h = F.md5(F.col("shingle"))
    shingled = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_size)).alias(
            "shingle"
        ),
    ).select(
        id_col,
        F.conv(F.substring(h, 1, 14), 16, 10).cast("long").alias("__h1"),
        F.conv(F.substring(h, 15, 14), 16, 10).cast("long").alias("__h2"),
    )
    mod = F.lit(1 << 56)
    per_band = shingled.groupBy(id_col).agg(
        *[
            F.min(
                (
                    F.col("__h1")
                    + F.lit(b * rows_per_band + i) * F.col("__h2")
                )
                % mod
            ).alias(f"__m{b}_{i}")
            for b in range(num_bands)
            for i in range(rows_per_band)
        ]
    )
    band_sig = [
        F.concat_ws(
            "|",
            *[
                F.col(f"__m{b}_{i}").cast("string")
                for i in range(rows_per_band)
            ],
        )
        for b in range(num_bands)
    ]
    # Unpivot to the canonical (id, band, sig) long form.
    stack = F.explode(
        F.map_from_arrays(
            F.array(*[F.lit(b) for b in range(num_bands)]),
            F.array(*band_sig),
        )
    ).alias("band", "sig")
    return per_band.select(id_col, stack)


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bands: int = 8,
    shingle_size: int = 3,
    max_bucket: int | None = None,
    rows_per_band: int = 2,
) -> DataFrame:
    """LSH candidate pairs: ids sharing any band signature (a < b).

    The self-join keys on (band, sig) — the LSH bucket — so only
    colliding documents are ever compared. ``max_bucket`` drops
    degenerate buckets (boilerplate shingles) before the join;
    ``rows_per_band`` sets the S-curve sharpness (see
    :func:`minhash_signatures`).
    """
    # localCheckpoint: the signature table feeds BOTH sides of the
    # bucket self-join (plus the bucket-size pre-aggregation on the
    # capped path) as canonically distinct subtrees, so without
    # materialization the full shingle->hash->minhash pipeline runs
    # once PER CONSUMER — 2x here, 4x with max_bucket (r16, verified
    # in the committed plan ops). The table is num_bands rows per
    # document of (id, band, sig) — the compact form a production
    # dedup persists before pairing anyway. NOTE (ADVICE r16): the
    # checkpoint is EAGER by design — merely CONSTRUCTING the pairs
    # frame runs the signature job, and the checkpointed blocks are
    # not recoverable on executor loss. Callers composing lazy plans
    # who need construction-time laziness should call
    # minhash_signatures themselves and persist explicitly.
    sigs = minhash_signatures(
        df, id_col, text_col, num_bands, shingle_size, rows_per_band
    ).localCheckpoint()
    if max_bucket is not None:
        bucket_sizes = sigs.groupBy("band", "sig").agg(
            F.count(F.lit(1)).alias("bs")
        )
        sigs = (
            sigs.join(bucket_sizes, ["band", "sig"])
            .where(F.col("bs") <= max_bucket)
            .drop("bs")
        )
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints — the rolling-hash selection of
    Schleimer/Wilkerson/Aiken (SIGMOD '03, the MOSS algorithm), the
    substring-level fingerprint the shingle families here don't give:
    any shared substring of length >= ``k + window - 1`` between two
    documents is GUARANTEED to share at least one fingerprint (the
    winnowing coverage theorem), which token shingles cannot promise
    across tokenization boundaries.

    Construction (engine-portable, same md5/hex→int arithmetic as the
    minhash family): normalize (lowercase, whitespace runs → one
    space, trim), hash every character ``k``-gram to a 56-bit int,
    slide a ``window``-wide window over the hash sequence and keep the
    window MINIMUM; a document's fingerprint set is the DISTINCT
    minima. Documents with fewer than ``k + window - 1`` normalized
    characters have no complete window and emit nothing. Returns
    (id, fingerprint:long), exploded.

    Plan shape at 100 TB: the whole selection is ONE codegen
    projection per row — two nested ``transform``s over ``sequence``
    (no UDF, no shuffle); only the winnowed minima (a ~1/window
    density sample of the grams, deduplicated) ever leave the row.
    Expression work is O(len · window) per document — window is a
    small constant (4–8 in practice).
    """
    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")
    empty = F.array().cast("array<long>")

    # Evaluation discipline: the normalized string and the gram-hash
    # array are LET-BOUND as lambda variables via the
    # ``element_at(transform(array(x), v -> body), 1)`` idiom, which
    # guarantees single evaluation. Staging them as projection
    # columns instead lets CollapseProject inline the O(len) hash
    # build into the per-window lambda — O(len²) md5 calls per
    # document (measured: 21.5s -> ~1s over 5k docs × 300 chars).
    def _windows(h):  # h: let-bound gram-hash array
        n_w = F.size(h) - F.lit(window - 1)
        # guard: sequence(1, 0) DESCENDS — short docs must yield []
        return F.when(
            n_w >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_w),
                    lambda j: F.array_min(F.slice(h, j, F.lit(window))),
                )
            ),
        ).otherwise(empty)

    def _hashes(s):  # s: let-bound normalized text
        n_g = F.length(s) - F.lit(k - 1)
        return F.when(
            n_g >= 1,
            F.transform(
                F.sequence(F.lit(1), n_g),
                lambda i: F.conv(
                    F.substring(F.md5(s.substr(i, F.lit(k))), 1, 14),
                    16,
                    10,
                ).cast("long"),
            ),
        ).otherwise(empty)

    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    )
    fps = F.element_at(
        F.transform(
            F.array(norm),
            lambda s: F.element_at(
                F.transform(F.array(_hashes(s)), _windows), 1
            ),
        ),
        1,
    )
    return df.select(F.col(id_col), F.explode(fps).alias("fingerprint"))


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_bucket: int | None = 50,
) -> DataFrame:
    """Near-dup candidate pairs by SHARED winnowing fingerprints —
    plagiarism/substring-overlap detection: (id_a, id_b, n_shared)
    for pairs sharing >= ``min_shared`` fingerprints, a < b.

    Same bucket-bounded scale discipline as the LSH family, but ONE
    fingerprint pass instead of a three-way self-join plan: ids are
    collected per fingerprint (one exchange — the expensive codegen
    fingerprint projection runs exactly once), ``max_bucket`` retires
    "stop fingerprints" (boilerplate substrings shared by more than
    ``max_bucket`` documents — the analogue of stopword removal, and
    what keeps pair volume linear on skewed corpora), and each
    surviving bucket expands its <= C(max_bucket, 2) pairs IN
    EXPRESSION (nested transform over the sorted id list). Measured
    ~2× faster than the three-scan self-join form at sf0.1 (11.0s →
    5.1s under identical load), identical output.
    """
    fps = winnow_fingerprints(df, id_col, text_col, k, window)
    buckets = fps.groupBy("fingerprint").agg(
        F.sort_array(F.collect_list(id_col)).alias("__ids")
    )
    if max_bucket is not None:
        buckets = buckets.where(F.size("__ids") <= max_bucket)
    ids = F.col("__ids")
    pairs = F.explode(
        F.flatten(
            F.transform(
                ids,
                lambda x, i: F.transform(
                    F.slice(ids, i + F.lit(2), F.size(ids)),
                    lambda y: F.struct(
                        x.alias("id_a"), y.alias("id_b")
                    ),
                ),
            )
        )
    )
    return (
        buckets.select(pairs.alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """Per-document SimHash over whitespace tokens.

    Bit j of the signature is the sign of the sum over tokens of
    (2*b_j - 1), where b_j is the top bit of the j-th hex nibble of
    md5(token) — i.e. nibble in [8..f]. Portable: md5 hex + substring,
    identical in any engine. Returns (id, simhash:long).

    Plan shape (tuned for 100 TB): explode tokens once, then ONE
    groupBy(id) computing all per-bit sums as aggregate columns —
    map-side combine makes shuffle volume |docs| rows of ``bits`` ints
    (the naive explode-bits shape shuffles |tokens| × bits rows through
    two aggregations). The signature assembles from the agg columns
    with static bit weights — no second shuffle.
    """
    # spread: same single-scan-partition hazard as minhash_signatures;
    # the groupBy below reuses the id-keyed partitioning
    toked = spread(df, id_col).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.md5("tok"))
    bit_sums = toked.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.substring("h", j, 1).rlike("[89a-f]"), F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"__s{j}")
            for j in range(1, bits + 1)
        ]
    )
    sig = None
    for j in range(1, bits + 1):
        term = F.when(
            F.col(f"__s{j}") > 0, F.lit(1 << (j - 1)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return bit_sums.select(id_col, sig.alias("simhash"))


def simhash_duplicate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """Pairs with identical SimHash (a < b): one equi-join on the
    signature — hamming-radius-0 LSH. For radius-k matching, band the
    signature into k+1 chunks and equi-join each (same pattern)."""
    s = simhash(df, id_col, text_col, bits)
    a, b = s.alias("a"), s.alias("b")
    return a.join(
        b,
        (F.col("a.simhash") == F.col("b.simhash"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.simhash").alias("simhash"),
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity over distinct word shingles for the
    given (id_a, id_b) candidate pairs.

    Each document's distinct shingle SET is a narrow per-row projection
    (``array_distinct`` of the shingle array — no shuffle at all), and
    |A ∩ B| is ``array_intersect`` evaluated JVM-side per pair;
    |A ∪ B| = |A| + |B| − |A ∩ B|. Total shuffle cost is two hash
    joins keyed on doc id (AQE broadcasts the pair side when it is
    small) — the earlier explode-shingles formulation shuffled
    |shingles| rows through three joins instead and measured the same
    wall time at sf0.1 with a strictly heavier exchange profile
    (PLANS_r03.md §6; per-pair values verified identical). Feed LSH
    candidates to keep the pair set linear in the corpus.
    """
    # spread: the shingle-set projection is per-row-expensive and a
    # small file arrives as one scan partition (see minhash_signatures).
    # r16 note — measured and deliberately NOT restructured: pruning
    # docs to pair-candidate ids (semi-join) and/or localCheckpointing
    # docs_arr both LOST to this shape in interleaved A/B (1.4s vs
    # 2.1-3.8s at sf0.1): the two docs_arr branches evaluate
    # concurrently inside one job on an idle cluster, while pruning
    # re-evaluates the pair subtree per branch and a checkpoint
    # serializes the critical path.
    docs_arr = spread(df, id_col).select(
        F.col(id_col),
        F.array_distinct(
            word_shingles(F.col(text_col), shingle_size)
        ).alias("sset"),
    ).withColumn("n", F.size("sset"))
    a = docs_arr.select(
        F.col(id_col).alias("id_a"),
        F.col("sset").alias("set_a"),
        F.col("n").alias("n_a"),
    )
    b = docs_arr.select(
        F.col(id_col).alias("id_b"),
        F.col("sset").alias("set_b"),
        F.col("n").alias("n_b"),
    )
    n_inter = F.size(F.array_intersect("set_a", "set_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                n_inter.cast("double")
                / (F.col("n_a") + F.col("n_b") - n_inter).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def _chunked_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    chunks: int = 8,
    extra_col: str | None = None,
) -> DataFrame:
    """All within-block unordered row pairs with their rounded cosine —
    the shared execution engine behind :func:`embedding_near_duplicates`
    and :func:`semantic_dedup`.

    Why not a plain self equi-join on ``block_col``: measured at 10x
    data (linearity probe, PLANS_r08.md) the naive join was 112x
    slower, for two reasons that only get worse at scale. (1)
    Parallelism is capped at the number of BLOCKS — a fixed-cardinality
    key like ``label`` leaves all but ~10 cores idle while each block's
    quadratic pair space runs in ONE task. (2) Every candidate pair
    pays an interpreted ``zip_with``/``aggregate`` dot product.

    Triangle-chunked execution instead: each row gets a chunk
    ``hash(id) mod C`` and is replicated to the C unordered chunk-pair
    groups it participates in; ``groupBy (block, lo, hi)`` then
    computes each group's pair set as ONE float64 GEMM (numpy) —
    parallelism becomes #blocks x C(C+1)/2 tasks and the per-pair cost
    is a vectorized FLOP. The pair SET, cosine values, and rounding
    (half away from zero, matching ``F.round``'s HALF_UP) agree with
    the naive join's to the ulp: the GEMM may reassociate the
    dot-product sum (BLAS blocking/FMA) vs a sequential fold, and the
    HALF_UP emulation (``floor(|s|*1e6+0.5)``) runs in float64 — a
    cosine landing within an ulp of a 5e-7 rounding boundary or of
    ``threshold`` could in principle flip pair membership vs a
    sequential-sum oracle. No certified corpus has hit this (the
    hypothesis fuzzer in test_chunked_pairs_property includes
    adversarial magnitudes); residual risk documented rather than
    claimed away. Shuffle
    volume is C x the vectors — the price of spreading a quadratic
    block across tasks; rows with NULL block are dropped up front
    (equality-join semantics: they can never pair).

    At true 100 TB the quadratic pair space WITHIN a block is
    irreducible given these semantics — the blocking key must bound
    block sizes (cluster ids from train_centroids with k ~ sqrt(n), or
    an LSH bucket); this function makes execution scale OUT with
    cores, it cannot make O(|block|^2) linear.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    idt = df.schema[id_col].dataType
    out_fields = [
        T.StructField("id_a", idt),
        T.StructField("id_b", idt),
        T.StructField("cosine", T.DoubleType()),
    ]
    if extra_col is not None:
        ext_t = df.schema[extra_col].dataType
        out_fields += [
            T.StructField("extra_a", ext_t),
            T.StructField("extra_b", ext_t),
        ]
    out_schema = T.StructType(out_fields)

    sel = [
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.col(block_col).alias("__blk"),
    ]
    if extra_col is not None:
        sel.append(F.col(extra_col).alias("__ext"))
    base = (
        df.select(*sel)
        .where(F.col("__blk").isNotNull())
        .withColumn(
            "__chunk", F.pmod(F.xxhash64("__id"), F.lit(chunks)).cast("int")
        )
        .select(
            "*",
            F.explode(
                F.array(*[F.lit(k) for k in range(chunks)])
            ).alias("__k"),
        )
        .select(
            "*",
            F.least("__chunk", "__k").alias("__lo"),
            F.greatest("__chunk", "__k").alias("__hi"),
        )
    )

    has_extra = extra_col is not None

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = pdf["__lo"].iat[0]
        hi = pdf["__hi"].iat[0]
        if lo == hi:
            A = B = pdf
        else:
            A = pdf[pdf["__chunk"] == lo]
            B = pdf[pdf["__chunk"] == hi]
        if A.empty or B.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        Ma = np.array(list(A["__vec"]), dtype=np.float64)
        Mb = Ma if A is B else np.array(list(B["__vec"]), dtype=np.float64)
        na = np.linalg.norm(Ma, axis=1)
        nb = na if A is B else np.linalg.norm(Mb, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            S = (Ma @ Mb.T) / np.outer(na, nb)
        if A is B:
            ii, jj = np.triu_indices(len(A), k=1)
        else:
            ii, jj = np.indices((len(A), len(B))).reshape(2, -1)
        ids_a = A["__id"].to_numpy()[ii]
        ids_b = B["__id"].to_numpy()[jj]
        s = S[ii, jj]
        # drop accidental id self-pairs (duplicate id values) — the
        # naive join's a.id < b.id condition excluded them
        keep = ids_a != ids_b
        ids_a, ids_b, s = ids_a[keep], ids_b[keep], s[keep]
        # normalize to id_a < id_b (cosine is symmetric)
        flip = ids_a > ids_b
        ids_a[flip], ids_b[flip] = ids_b[flip], ids_a[flip].copy()
        # HALF_UP rounding to match Spark F.round / the naive plan
        with np.errstate(invalid="ignore"):
            r = np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6
        out = {"id_a": ids_a, "id_b": ids_b, "cosine": r}
        if has_extra:
            ea = A["__ext"].to_numpy()[ii][keep]
            eb = B["__ext"].to_numpy()[jj][keep]
            ea[flip], eb[flip] = eb[flip], ea[flip].copy()
            out["extra_a"] = ea
            out["extra_b"] = eb
        return pd.DataFrame(out)

    return base.groupBy("__blk", "__lo", "__hi").applyInPandas(
        lambda pdf: kern(pdf), out_schema
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.95,
    chunks: int = 8,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold (a < b).

    ``block_col`` is the blocking key (label, cluster id, or an LSH
    bucket from similarity.lsh_bucket) — pairs are only ever generated
    within blocks, which is what keeps this feasible at 100 TB; it is
    REQUIRED (an unblocked all-pairs cosine join cannot scale).
    Executed by the triangle-chunked GEMM engine — see
    :func:`_chunked_cosine_pairs` for the plan shape and the measured
    112x win over the naive blocked self-join at 10x data.
    """
    if not block_col:
        raise ValueError(
            "embedding_near_duplicates requires a blocking key "
            "(label / cluster id / LSH bucket): an unblocked all-pairs "
            "cosine self-join is O(n^2) and cannot scale"
        )
    return _chunked_cosine_pairs(
        df, id_col, vec_col, block_col, chunks=chunks
    ).where(F.col("cosine") >= threshold)


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then prune
    near-duplicates WITHIN each cluster only — pairwise comparison
    never crosses cluster boundaries, which is what replaces the O(n²)
    all-pairs cosine with Σ O(|cluster|²) and makes embedding dedup
    feasible on a 100 TB corpus (size k ~ √n so clusters stay bounded;
    pass `similarity.train_centroids` output, or any (centroid_id,
    vec) frame — a deterministic sample keeps the result
    oracle-reproducible).

    Within a cluster, a row is dropped when some other member with
    cosine > ``threshold`` outranks it; rank = LOWEST
    cosine-to-centroid first (the paper keeps the example farthest
    from the centroid — the least prototypical, most
    diversity-preserving member), ties by id. The rule is one-shot
    (dominators need not themselves survive), matching the paper's
    single pass over each cluster's similarity matrix. Returns the
    surviving rows: input columns + ``centroid_id`` +
    ``centroid_sim``.

    Plan shape: broadcast centroid assignment (no shuffle), then the
    intra-cluster pair sweep runs on the triangle-chunked GEMM engine
    (:func:`_chunked_cosine_pairs`) — parallelism scales with
    #clusters x chunk-pairs instead of being capped at #clusters, and
    each pair costs a vectorized FLOP, not an interpreted zip_with
    (17.6x at 10x data on the naive join, linearity probe
    PLANS_r08.md). For each unordered pair above the threshold the
    member FARTHER from the centroid (lower cosine-to-centroid, ties
    to the lower id) is the dominator; the closer one is dropped.
    """
    from blackroad_feature_store_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(
        df,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        keep_norm_col="__norm",
        keep_sim_col="__csim",
    )
    pairs = _chunked_cosine_pairs(
        assigned, id_col, vec_col, "centroid_id", extra_col="__csim"
    ).where(F.col("cosine") > threshold)
    # loser of the unordered pair (id_a < id_b): the FARTHER-from-
    # centroid member (LOWER cosine-to-centroid) outranks — the paper
    # keeps the least prototypical example — so the higher-csim member
    # drops; on a csim tie the lower id outranks and the higher drops.
    loser = (
        F.when(F.col("extra_a") > F.col("extra_b"), F.col("id_a"))
        .when(F.col("extra_a") < F.col("extra_b"), F.col("id_b"))
        .otherwise(F.col("id_b"))
    )
    dropped = pairs.select(loser.alias(id_col)).distinct()
    return assigned.join(dropped, id_col, "left_anti").select(
        *df.columns, "centroid_id", F.col("__csim").alias("centroid_sim")
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_col_a: str = "id_a",
    id_col_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over a candidate-pair graph: every document
    in a pair gets a ``cluster_id`` = the minimum doc id reachable
    through pair edges — how near-dup PAIRS become dedup GROUPS (keep
    one representative per cluster).

    Iterative min-label propagation with pointer jumping: each round
    every node adopts the smallest label among itself and its
    neighbors, then additionally adopts its label node's label
    (path doubling), so convergence is O(log diameter) rounds instead
    of O(diameter) — the same round count the large-star/small-star
    formulation achieves, with one extra equi-join per round. Lineage
    is cut with localCheckpoint so plans don't grow with iterations,
    and the convergence probe is a ``__changed`` flag carried INSIDE
    the checkpointed result. r17 (VERDICT r16 ask #4): the checkpoint
    is LAZY and the probe's ``count()`` is the action that
    materializes it — the round's joins, the persist, and the
    convergence answer are ONE job per round instead of the former
    two (eager checkpoint job + probe job); the count is full, not
    ``limit(1)``, precisely so every partition of the round result is
    computed and persisted by that single action.

    If ``max_iterations`` rounds pass without convergence (a pair
    graph with diameter > 2^max_iterations — pathological for
    near-dup data) the function logs a warning and returns the
    partial labels rather than silently presenting them as final.
    """
    import logging

    edges = (
        pairs.select(
            F.col(id_col_a).alias("src"), F.col(id_col_b).alias("dst")
        )
        .unionByName(
            pairs.select(
                F.col(id_col_b).alias("src"), F.col(id_col_a).alias("dst")
            )
        )
        .distinct()
        # lazy: the labels checkpoint below materializes (and
        # persists) the edge list as part of its own job — one setup
        # action instead of two
        .localCheckpoint(eager=False)
    )
    # Initial labels fold propagation round 1 into node enumeration:
    # label(v) = min(v, min neighbor) comes from the same groupBy that
    # would otherwise just distinct the node list (edges are stored
    # bidirectional, so every node appears as src).
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("nmin"))
        .select("node", F.least("node", "nmin").alias("label"))
        .localCheckpoint()
    )
    changed = 1
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("node", "dst"), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        stepped = (
            labels.withColumnRenamed("label", "old")
            .join(neighbor_min, "node", "left")
            .select(
                "node",
                "old",
                F.least(F.col("old"), F.coalesce("nmin", "old")).alias(
                    "mid"
                ),
            )
        )
        # Pointer jump: adopt the current label of your label node.
        # Labels only ever decrease and stay within the component, so
        # jumping through the (previous-round) label map is safe and
        # collapses chains exponentially.
        jump = labels.select(
            F.col("node").alias("mid"), F.col("label").alias("jlabel")
        )
        new_labels = (
            stepped.join(jump, "mid", "left")
            .select(
                "node",
                F.least(
                    F.col("mid"), F.coalesce("jlabel", "mid")
                ).alias("label"),
                (F.least(F.col("mid"), F.coalesce("jlabel", "mid"))
                 != F.col("old")).alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where("__changed").count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    if changed != 0:
        logging.getLogger("blackroad_feature_store_spark").warning(
            "duplicate_clusters: not converged after %d iterations; "
            "returned cluster ids may still be mergeable",
            max_iterations,
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def incremental_candidate_pairs(
    new_docs: DataFrame,
    existing_sigs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bands: int = 8,
    shingle_size: int = 3,
    rows_per_band: int = 2,
    materialize_sigs: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Incremental LSH: near-dup candidates for a NEW batch of
    documents against an already-signed corpus — the daily-ingest path
    that never re-reads old documents.

    ``existing_sigs`` is a persisted :func:`minhash_signatures` table
    (id, band, sig). Only the new batch is shingled and hashed; the
    bucket join runs new-vs-existing (one direction — old-old pairs
    were found when those docs arrived) plus new-vs-new. Returns
    ``(pairs, new_sigs)`` so the caller appends ``new_sigs`` to the
    signature table for the next increment — cost per increment is
    O(|new batch| + collisions), independent of corpus size.

    ``materialize_sigs=True`` localCheckpoints the batch signatures
    before the joins: the pairs plan references them three times (probe
    side, both self-join sides) and callers typically write them as a
    fourth action, so without materialization the batch is shingled
    and hashed up to 4x. The streaming ingest path wants True; leave
    False when the caller will only evaluate one action over the
    result (keeps the plan fully lazy/unchanged). The checkpoint is
    LAZY (r17): construction stays job-free and the caller's FIRST
    action over either returned frame computes + persists the
    signatures once — one job per batch fewer than the eager form,
    same single evaluation.
    """
    new_sigs = minhash_signatures(
        new_docs, id_col, text_col, num_bands, shingle_size, rows_per_band
    )
    if materialize_sigs:
        new_sigs = new_sigs.localCheckpoint(eager=False)
    n = new_sigs.alias("n")
    e = existing_sigs.alias("e")
    vs_existing = (
        n.join(
            e,
            (F.col("n.band") == F.col("e.band"))
            & (F.col("n.sig") == F.col("e.sig")),
        )
        .select(
            F.least(F.col(f"n.{id_col}"), F.col(f"e.{id_col}")).alias("id_a"),
            F.greatest(
                F.col(f"n.{id_col}"), F.col(f"e.{id_col}")
            ).alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
    )
    b = new_sigs.alias("b")
    vs_new = (
        n.join(
            b,
            (F.col("n.band") == F.col("b.band"))
            & (F.col("n.sig") == F.col("b.sig"))
            & (F.col(f"n.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"n.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
    return vs_existing.unionByName(vs_new).distinct(), new_sigs
