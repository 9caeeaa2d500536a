"""Unit tests for the LLM-pipeline operator modules (dedup, similarity,
text, multimodal) — every module imported and executed, with known-value
assertions on tiny in-memory frames."""

import hashlib
import math
import os

from blackroad_feature_store_spark.sources.testdata import (
    is_generated_testdata,
    sf_dir as _sf_dir,
)

SF001 = _sf_dir("sf0.001")

import pytest
from pyspark.sql import functions as F

from blackroad_feature_store_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    minhash_candidate_pairs,
    ngram_jaccard,
    simhash,
    simhash_duplicate_pairs,
)
from blackroad_feature_store_spark.operators.multimodal import (
    asset_metadata,
    documents_as_assets,
    image_features,
    sample_frames,
)
from blackroad_feature_store_spark.operators.similarity import (
    cosine,
    cosine_topk,
    cosine_topk_lsh,
    dot,
)
from blackroad_feature_store_spark.operators.text import (
    text_profile,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "  the   quick brown fox JUMPS over the lazy dog "),  # norm dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- exact dedup --------------------------------------------------------------


def test_exact_duplicates(docs):
    out = {r["fp"]: r for r in exact_duplicates(docs).collect()}
    dup_groups = [r for r in out.values() if r["dup_count"] > 1]
    assert len(dup_groups) == 1
    g = dup_groups[0]
    # 1, 2, and the whitespace/case variant 5 normalize together
    assert g["dup_count"] == 3
    assert g["keep_id"] == 1
    assert g["doc_ids"] == [1, 2, 5]


# -- minhash / LSH -------------------------------------------------------------


def test_minhash_pairs_include_near_dups(docs, spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(docs, num_bands=8).collect()
    }
    assert (1, 2) in pairs  # identical docs always collide on every band
    assert all(a < b for a, b in pairs)
    # A STRONG near-dup (1 word of 20 changed, J≈0.74) must be found:
    # with r=2 rows per band P(candidate) ≈ 1-(1-J²)^8 ≈ 0.996.
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo "
        "sierra tango"
    )
    d2 = spark.createDataFrame(
        [(1, base), (2, base.replace("kilo", "changed"))],
        "doc_id long, text string",
    )
    assert {(1, 2)} == {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(d2, num_bands=8).collect()
    }


def test_minhash_r2_banding_sharper_than_r1(spark):
    """The r=2 S-curve suppresses mildly-similar pairs that r=1 floods
    in: on a corpus of documents sharing a minority of shingles
    (J≈0.3-0.4 pairwise), r=2 emits strictly fewer candidate pairs
    than r=1, while exact duplicates survive both."""
    rows = []
    # 12 docs: common 4-word prefix, distinct 8-word tails → every
    # pair shares the prefix shingles only (J well under 0.5)
    for i in range(12):
        tail = " ".join(f"tok{i}_{j}" for j in range(8))
        rows.append((i, f"common prefix words here {tail}"))
    rows.append((100, rows[0][1]))  # exact dup of doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r1 = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(
            df, num_bands=8, rows_per_band=1
        ).collect()
    }
    r2 = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(
            df, num_bands=8, rows_per_band=2
        ).collect()
    }
    assert (0, 100) in r1 and (0, 100) in r2  # exact dup always found
    assert len(r2) < len(r1)                  # sharper curve: fewer


def test_minhash_max_bucket_drops_degenerate(spark):
    # 20 identical docs → every (band, sig) bucket has 20 members;
    # max_bucket=5 must eliminate all candidates.
    df = spark.createDataFrame(
        [(i, "same text for everyone here") for i in range(20)],
        "doc_id long, text string",
    )
    assert minhash_candidate_pairs(df, max_bucket=5).count() == 0
    assert minhash_candidate_pairs(df, max_bucket=None).count() == 20 * 19 // 2


# -- simhash -------------------------------------------------------------------


def test_simhash_identical_texts_equal(docs):
    sig = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sig[1] == sig[2]
    assert 0 <= sig[1] < 2**16
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_duplicate_pairs(docs).collect()
    }
    assert (1, 2) in pairs


# -- jaccard -------------------------------------------------------------------


def test_ngram_jaccard_exact_and_disjoint(spark, docs):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    j = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard(docs, pairs).collect()
    }
    assert j[(1, 2)] == 1.0  # identical shingle sets
    assert 0.0 < j[(1, 3)] < 1.0  # near dup
    assert j[(1, 4)] == 0.0  # disjoint


# -- embedding near-dup / similarity -------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.99, 0.1, 0.0, 0.0], 0),   # ~same direction as 1
        (3, [0.0, 1.0, 0.0, 0.0], 0),    # orthogonal to 1
        (4, [-1.0, 0.0, 0.0, 0.0], 1),   # opposite, other block
        (5, [0.7, 0.7, 0.0, 0.0], 1),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_dot_and_cosine_columns(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
        "a array<float>, b array<float>",
    )
    r = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        cosine(F.col("a"), F.col("b")).alias("c"),
    ).first()
    assert r["d"] == pytest.approx(32.0)
    assert r["c"] == pytest.approx(
        32.0 / (math.sqrt(14) * math.sqrt(77)), rel=1e-9
    )


def test_embedding_near_duplicates_blocked(vectors):
    out = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_duplicates(
            vectors, block_col="label", threshold=0.9
        ).collect()
    }
    assert (1, 2) in out and out[(1, 2)] > 0.99
    # 4↔5 share a block but point apart; 1↔5 similar but cross-block
    assert (4, 5) not in out
    assert (1, 5) not in out


def test_cosine_topk_ranks_correctly(vectors):
    queries = vectors.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = cosine_topk(vectors, queries, k=2).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in rows] == [2, 5]
    assert rows[0]["rank"] == 1 and rows[0]["score"] > 0.99


def test_cosine_topk_lsh_same_bucket_only(vectors):
    queries = vectors.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = cosine_topk_lsh(vectors, queries, k=5, nbits=4).collect()
    # bucket of [1,0,0,0] with sign bits = '1111' ∋ vectors 2, 3, 5
    # ([-1,...] has bucket '0111'); top hits must exclude vec 4.
    assert {r["neighbor_id"] for r in rows} == {2, 3, 5}


@pytest.mark.skipif(
    is_generated_testdata(),
    reason="LSH-recall ordering is pinned on the driver fixtures' specific "
    "random realization (recall@5 over 10 queries moves in 0.02 "
    "steps); on a generated root the ordering can legitimately "
    "differ — correctness queries still run there",
)
def test_lsh_recall_random_planes_and_tables(spark):
    # Recall@5 vs brute-force truth over the real embeddings table,
    # deterministic via seeded planes. Pins the recall ordering:
    # multi-table > single random table >= axis-aligned at equal nbits.
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk_lsh_tables,
        random_hyperplanes,
    )
    from blackroad_feature_store_spark.sources.testdata import load

    sf = SF001
    emb = load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def topk_set(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    truth = topk_set(cosine_topk(emb, queries, k=5))
    axis = topk_set(cosine_topk_lsh(emb, queries, k=5, nbits=6))
    planes = random_hyperplanes(64, nbits=6, seed=7)
    rand1 = topk_set(
        cosine_topk_lsh(emb, queries, k=5, hyperplanes=planes)
    )
    multi = topk_set(
        cosine_topk_lsh_tables(emb, queries, k=5, nbits=6, ntables=4)
    )

    r_axis = len(axis & truth) / len(truth)
    r_rand = len(rand1 & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_rand >= r_axis  # random planes ≥ sign-skewed axis family
    assert r_multi > r_rand  # OR-ing tables is the recall dial
    assert r_multi >= 0.2  # measured 0.24 with these seeds


def test_random_hyperplanes_deterministic():
    from blackroad_feature_store_spark.operators.similarity import (
        random_hyperplanes,
    )

    a = random_hyperplanes(8, 4, seed=42)
    b = random_hyperplanes(8, 4, seed=42)
    c = random_hyperplanes(8, 4, seed=43)
    assert a == b and a != c
    assert len(a) == 4 and len(a[0]) == 8


# -- text profile --------------------------------------------------------------


def test_text_profile_known_values(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, ""), (3, "der und das ist nicht")],
        "doc_id long, text string",
    )
    p = {r["doc_id"]: r for r in text_profile(df).collect()}
    r1 = p[1]
    assert r1["n_tokens"] == 5
    assert r1["n_chars"] == 19
    assert r1["stopword_ratio"] == pytest.approx(0.6)  # the, and, the
    assert r1["lang_pred"] == "en"
    assert r1["fingerprint"] == hashlib.md5(
        b"the cat and the dog"
    ).hexdigest()
    assert p[2]["n_tokens"] == 0 and p[2]["lang_pred"] == "unknown"
    assert p[3]["lang_pred"] == "de"


# -- multimodal ----------------------------------------------------------------


def test_multimodal_pipeline(spark):
    df = spark.createDataFrame(
        [(1, "x" * 200, "en", "s0"), (2, "hello", "de", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    assets = documents_as_assets(df)
    meta = {r["asset_id"]: r for r in asset_metadata(assets).collect()}
    assert meta[1]["n_bytes"] == 200
    assert meta[2]["content_md5"] == hashlib.md5(b"hello").hexdigest()
    assert meta[2]["meta_lang"] == "de"

    feats = {r["asset_id"]: r for r in image_features(assets).collect()}
    d = hashlib.sha256(b"hello").digest()
    assert feats[2]["width"] == 64 + d[0] % 192
    assert feats[2]["height"] == 64 + d[1] % 192
    assert feats[2]["sha256"] == hashlib.sha256(b"hello").hexdigest()

    frames = sample_frames(assets, every_n_bytes=64, max_frames=8)
    by_asset = {}
    for r in frames.collect():
        by_asset.setdefault(r["asset_id"], []).append(r)
    # 200 bytes at stride 64 → frames 0..3 (last one 8 bytes)
    assert sorted(r["frame_no"] for r in by_asset[1]) == [0, 1, 2, 3]
    sizes = {r["frame_no"]: len(r["frame_bytes"]) for r in by_asset[1]}
    assert sizes == {0: 64, 1: 64, 2: 64, 3: 8}


def _tiny_png(w=21, h=13):
    """A real PNG generated in-test (gradient), pure stdlib+numpy."""
    import numpy as np

    from blackroad_feature_store_spark.operators.codecs import encode_png

    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = (np.arange(w, dtype=np.uint16)[None, :] * 9 % 256).astype(
        np.uint8
    )
    img[..., 2] = (np.arange(h, dtype=np.uint16)[:, None] * 17 % 256).astype(
        np.uint8
    )
    return img, encode_png(img)


def _tiny_wav(rate=16000, seconds=0.25, amp=0.5):
    """A real 16-bit PCM WAV generated in-test (sine), stdlib only."""
    import io
    import wave

    import numpy as np

    t = np.arange(int(rate * seconds))
    samples = (amp * np.sin(2 * np.pi * 440 * t / rate) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def test_image_features_real_decode(spark):
    # fake=False REALLY parses container headers: a valid in-test PNG
    # yields its true dims; a non-image payload yields NULL dims (job
    # survives corrupt files) — with n_bytes/sha256 still populated.
    _img, png = _tiny_png(21, 13)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(png), {}), (2, "image", bytearray(b"junk"), {})],
        "asset_id long, modality string, content binary, "
        "meta map<string,string>",
    )
    rows = {r["asset_id"]: r for r in
            image_features(assets, fake=False).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (21, 13)
    assert rows[1]["sha256"] == hashlib.sha256(png).hexdigest()
    assert rows[2]["width"] is None and rows[2]["height"] is None
    assert rows[2]["n_bytes"] == 4


# -- skew: salted aggregation --------------------------------------------------


def test_salted_agg_matches_direct(spark):
    df = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i)) for i in range(1000)],
        "id long, k string, v double",
    )
    from blackroad_feature_store_spark.operators.skew import salted_agg

    out = {
        r["k"]: (r["n"], r["sum_value"])
        for r in salted_agg(
            df, ["k"], salt_on="id", num_salts=16, sum_col="v"
        ).collect()
    }
    direct = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert out.keys() == direct.keys()
    for k in out:
        assert out[k][0] == direct[k][0]
        assert out[k][1] == pytest.approx(direct[k][1])


# -- IVF similarity ------------------------------------------------------------


def test_ivf_assign_and_topk(vectors, spark):
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk_ivf,
        ivf_assign,
    )

    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "centroid_id long, embedding array<float>",
    )
    assigned = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(vectors, centroids).collect()
    }
    assert assigned[1] == 0 and assigned[2] == 0   # x-direction
    assert assigned[3] == 1                        # y-direction
    assert assigned[4] == 1                        # -x: tie (0 vs 0) → min cid? cos=-1 vs 0 → cid 1

    queries = vectors.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = cosine_topk_ivf(
        vectors, queries, centroids, k=3, nprobe=1
    ).orderBy("rank").collect()
    # probe list of centroid 0 contains vectors 1, 2, 5 → neighbors 2, 5
    assert [r["neighbor_id"] for r in rows] == [2, 5]


def test_ivf_assign_agg_matches_window_formulation(spark):
    """r16: ivf_assign picks its winner with min(struct(-sim, cid,
    payload)) partial aggregation instead of a row_number() window
    (shuffles |corpus| rows, not |corpus|·k scored rows). Pin the
    exact contract the window gave: max cosine wins, SIM TIES break
    to the LOWEST centroid id, payload columns and the keep_norm /
    keep_sim extras come through bit-identical, and the plan carries
    no Window node."""
    from pyspark.sql.window import Window as W

    from blackroad_feature_store_spark.operators.similarity import (
        dot,
        ivf_assign,
        norm,
    )

    # centroids 1 and 2 are IDENTICAL → every vector's cosine ties
    # between them and must resolve to cid 1; centroid 0 is distinct.
    cents = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [0.0, 1.0]),
        ],
        "centroid_id long, embedding array<float>",
    )
    vecs = spark.createDataFrame(
        [
            (1, "a", [3.0, 4.0]),
            (2, "b", [1.0, 0.1]),
            (3, "c", [-1.0, 0.0]),
            (4, "d", [0.0, -2.0]),
        ],
        "vec_id long, label string, embedding array<float>",
    )
    got = ivf_assign(
        vecs, cents, keep_norm_col="__n", keep_sim_col="__s"
    )
    # reference: the pre-r16 window formulation, inlined
    c = F.broadcast(
        cents.select(
            F.col("centroid_id").alias("__cid"),
            F.col("embedding").alias("__cvec"),
        ).withColumn("__cnorm", norm(F.col("__cvec")))
    )
    scored = (
        vecs.withColumn("__vnorm", norm(F.col("embedding")))
        .crossJoin(c)
        .withColumn(
            "__sim",
            F.round(
                dot(F.col("embedding"), F.col("__cvec"))
                / (F.col("__vnorm") * F.col("__cnorm")),
                6,
            ),
        )
    )
    w = W.partitionBy("vec_id").orderBy(
        F.col("__sim").desc(), F.col("__cid").asc()
    )
    want = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            *vecs.columns,
            F.col("__cid").alias("centroid_id"),
            F.col("__vnorm").alias("__n"),
            F.col("__sim").alias("__s"),
        )
    )
    assert got.columns == want.columns
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, want.collect()))
    assert g == e
    by_id = {r[0]: r for r in g}
    assert by_id[1][3] == 1 and by_id[4][3] == 0  # tie → lowest cid
    assert "Window" not in got._jdf.queryExecution().executedPlan().toString()


def test_ivf_assign_zero_norm_matches_window_formulation(spark):
    """r17 (ADVICE r16 medium): degenerate cosines must order exactly
    as the window formulation ordered them. Under the session default
    (ANSI) a zero-norm input raises loudly in BOTH formulations
    (DIVIDE_BY_ZERO), so the divergence risk lives in non-ANSI
    sessions: there a zero-norm vector or centroid yields sim = NULL,
    which the window's ``sim DESC`` sorted LAST (never wins) but a
    bare ``min(struct(-sim, ...))`` sorts FIRST (always wins) — the
    r17 key coalesces NULL → +inf to restore the window's ordering,
    and maps a NaN cosine (NaN vector components) → -inf because NaN
    is the LARGEST double under DESC and therefore WON the window.
    Also pins the r17 min_by value/key split: a MapType payload
    column (non-orderable — the r16 min(struct(..., payload)) raised
    on it) must come through untouched, and keep_sim_col must re-emit
    the RAW degenerate sim (NULL/NaN), not an ordering sentinel."""
    import math

    from pyspark.sql.window import Window as W

    from blackroad_feature_store_spark.operators.similarity import (
        dot,
        ivf_assign,
        norm,
    )

    cents = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 0.0]),  # zero-norm centroid: sim NULL for all
            (2, [0.0, 1.0]),
        ],
        "centroid_id long, embedding array<float>",
    )
    vecs = spark.createDataFrame(
        [
            (1, {"k": "a"}, [3.0, 4.0]),
            (2, {"k": "b"}, [0.0, 0.0]),  # zero-norm vector: all NULL
            (3, {"k": "c"}, [-1.0, 0.5]),
            (4, {"k": "d"}, [float("nan"), 1.0]),  # all sims NaN
        ],
        "vec_id long, meta map<string,string>, embedding array<float>",
    )
    prev_ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        got = ivf_assign(vecs, cents, keep_sim_col="__s")
        # reference: the pre-r16 window formulation, inlined
        c = F.broadcast(
            cents.select(
                F.col("centroid_id").alias("__cid"),
                F.col("embedding").alias("__cvec"),
            ).withColumn("__cnorm", norm(F.col("__cvec")))
        )
        scored = (
            vecs.withColumn("__vnorm", norm(F.col("embedding")))
            .crossJoin(c)
            .withColumn(
                "__sim",
                F.round(
                    dot(F.col("embedding"), F.col("__cvec"))
                    / (F.col("__vnorm") * F.col("__cnorm")),
                    6,
                ),
            )
        )
        w = W.partitionBy("vec_id").orderBy(
            F.col("__sim").desc(), F.col("__cid").asc()
        )
        want = (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                *vecs.columns,
                F.col("__cid").alias("centroid_id"),
                F.col("__sim").alias("__s"),
            )
        )
        g = {r["vec_id"]: r for r in got.collect()}
        e = {r["vec_id"]: r for r in want.collect()}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev_ansi)
    assert set(g) == set(e)

    def _same(a, b):
        if a is None or b is None:
            return a is None and b is None
        return a == b or (math.isnan(a) and math.isnan(b))

    for vid in e:
        assert g[vid]["centroid_id"] == e[vid]["centroid_id"], vid
        assert g[vid]["meta"] == e[vid]["meta"], vid
        assert _same(g[vid]["__s"], e[vid]["__s"]), (
            vid, g[vid]["__s"], e[vid]["__s"],
        )
    # the ordering contract, stated directly: NULL loses (the
    # zero-norm centroid never wins a real vector; the zero-norm
    # vector's all-NULL tie breaks to the lowest cid with a raw NULL
    # sim), NaN wins (it was the largest double under the window's
    # DESC), ties of NaN break to the lowest cid
    assert g[1]["centroid_id"] == 2
    assert g[2]["centroid_id"] == 0 and g[2]["__s"] is None
    assert g[3]["centroid_id"] == 2
    assert g[4]["centroid_id"] == 0 and math.isnan(g[4]["__s"])


# -- duplicate clustering (connected components) -------------------------------


def test_duplicate_clusters(spark):
    from blackroad_feature_store_spark.operators.dedup import (
        duplicate_clusters,
    )

    # two components: {1,2,3,4} chained, {10,11}; 99 isolated (absent)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


# -- file sources --------------------------------------------------------------


def test_read_documents_all_formats(spark, tmp_path):
    from blackroad_feature_store_spark.sources.files import (
        CANONICAL_COLUMNS,
        read_documents,
        write_documents,
    )

    base = spark.createDataFrame(
        [(1, "hello world", "en", "src1"), (2, "der hund", "de", "src2")],
        "doc_id long, text string, lang string, source string",
    )

    pq = str(tmp_path / "docs_pq")
    base.write.parquet(pq)
    out = read_documents(spark, pq, "parquet")
    assert out.columns == list(CANONICAL_COLUMNS)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_chars"] == 11 and rows[2]["lang"] == "de"

    jl = str(tmp_path / "docs_jsonl")
    base.write.json(jl)
    assert read_documents(spark, jl, "jsonl").count() == 2

    cv = str(tmp_path / "docs_csv")
    base.write.option("header", "true").csv(cv)
    got = read_documents(spark, cv, "csv")
    assert {r["doc_id"] for r in got.collect()} == {1, 2}

    # raw text: one doc per line, hash-derived ids, labeled source
    tx = str(tmp_path / "docs_txt")
    spark.createDataFrame([("alpha beta",), ("gamma",)], "value string") \
        .write.text(tx)
    t = read_documents(spark, tx, "text", id_col=None, source_label="crawl")
    trows = t.collect()
    assert len(trows) == 2
    assert all(r["source"] == "crawl" for r in trows)
    assert len({r["doc_id"] for r in trows}) == 2  # distinct stable ids
    # deterministic: same text → same id on re-read
    t2 = read_documents(spark, tx, "text", id_col=None, source_label="crawl")
    assert {r["doc_id"] for r in t2.collect()} == {r["doc_id"] for r in trows}

    # canonical docs flow straight into the operator suite
    from blackroad_feature_store_spark.operators.dedup import exact_duplicates

    assert exact_duplicates(out).count() == 2

    # round-trip through the sink
    sink = str(tmp_path / "sink_pq")
    write_documents(out, sink, partition_by=["lang"])
    back = read_documents(spark, sink, "parquet")
    assert back.count() == 2

    with pytest.raises(ValueError, match="Unsupported format"):
        read_documents(spark, pq, "hdf5")


def test_read_documents_xml_roundtrip_and_escaping(spark, tmp_path):
    from blackroad_feature_store_spark.sources.files import (
        read_documents,
        write_documents,
    )

    base = spark.createDataFrame(
        [
            (1, "a < b & c > d", "en", "s"),  # entity escaping
            (2, 'quotes " and \' here', "en", "s"),
            (3, "plain text", "de", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    d = str(tmp_path / "docs_xml")
    write_documents(base, d, format="xml")
    landed = read_documents(spark, d, format="xml")
    got = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in landed.collect()
    )
    assert got == sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in base.collect()
    )
    # n_chars is derived from the LANDED text, so it certifies that
    # escaping/unescaping was lossless character-for-character
    landed_rows = landed.collect()
    assert {r["doc_id"] for r in landed_rows} == {1, 2, 3}
    assert all(r["n_chars"] == len(r["text"]) for r in landed_rows)


def test_avro_gated_behind_module_probe(spark, tmp_path):
    """Avro is an EXTERNAL Spark module (not in the pip pyspark
    distribution). When absent — as in this container — the probe says
    so and read/write raise a RuntimeError naming the missing package
    instead of a bare ClassNotFoundException. When present, the round
    trip must simply work (exercised only where the jar exists)."""
    from blackroad_feature_store_spark.sources.files import (
        avro_available,
        read_documents,
        write_documents,
    )

    base = spark.createDataFrame(
        [(1, "hello avro", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    d = str(tmp_path / "docs_avro")
    if avro_available(spark):
        write_documents(base, d, format="avro")
        landed = read_documents(spark, d, format="avro")
        assert landed.count() == 1
        assert landed.first()["text"] == "hello avro"
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            write_documents(base, d, format="avro")
        pq = str(tmp_path / "docs_for_avro_read")
        base.write.parquet(pq)
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_documents(spark, pq, "avro")


# -- skew ----------------------------------------------------------------------


def test_salted_join_matches_plain_join(spark):
    from blackroad_feature_store_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(k, i) for k in ("hot", "hot", "hot", "warm", "orphan")
         for i in range(3)],
        "k string, v int",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("warm", 2), ("unused", 9)], "k string, w int"
    )
    plain = {tuple(r) for r in big.join(small, "k").collect()}
    salted = {tuple(r) for r in salted_join(big, small, "k", num_salts=4).collect()}
    assert salted == plain and len(salted) > 0

    plain_l = {tuple(r) for r in big.join(small, "k", "left").collect()}
    salted_l = {
        tuple(r)
        for r in salted_join(big, small, "k", num_salts=4, how="left").collect()
    }
    assert salted_l == plain_l  # orphan keys survive with null w

    with pytest.raises(ValueError, match="inner.*left|left.*inner"):
        salted_join(big, small, "k", how="outer")


# -- duplicate clustering vs brute-force union-find ---------------------------


def test_duplicate_clusters_matches_union_find(spark):
    # Randomized (seeded) graphs incl. long chains — the worst case for
    # label propagation — checked against a driver-side union-find.
    import random

    from blackroad_feature_store_spark.operators.dedup import (
        duplicate_clusters,
    )

    def union_find_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in nodes}

    cases = []
    rng = random.Random(7)
    # random sparse graphs
    for _ in range(3):
        n = rng.randint(10, 60)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(5, n))
            }
        )
        cases.append(edges)
    # a 40-node chain: diameter 39 needs pointer jumping to converge
    cases.append([(i, i + 1) for i in range(40)])
    # two chains merged at the far end
    cases.append([(i, i + 1) for i in range(15)]
                 + [(100 + i, 101 + i) for i in range(15)] + [(15, 115)])

    for edges in cases:
        nodes = sorted({x for e in edges for x in e})
        expected = union_find_components(edges, nodes)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in duplicate_clusters(pairs).collect()
        }
        assert got == expected, f"mismatch on edges={edges[:5]}..."


# -- corpus preparation -------------------------------------------------------


def test_decontaminate_flags_ngram_overlap(spark):
    from blackroad_feature_store_spark.operators.corpus import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # shares the 5-gram "beta gamma delta epsilon zeta"
            (1, "intro beta gamma delta epsilon zeta outro"),
            # shares words but no 5-token run
            (2, "alpha beta gamma unrelated delta epsilon"),
            (3, "nothing in common at all here friend"),
            (4, "tiny"),  # < n tokens: whole-text shingle, no match
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(train, bench, n=5, id_col="doc_id").collect()
    }
    assert out == {1: True, 2: False, 3: False, 4: False}
    # the benchmark side must be broadcast: corpus never shuffles
    plan = decontaminate(train, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chunk_documents_overlap_and_tail(spark):
    from blackroad_feature_store_spark.operators.corpus import chunk_documents

    words = [f"w{i}" for i in range(50)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "short doc"), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_documents(df, chunk_size=32, stride=24).collect()
    }
    # doc 1: 50 tokens -> chunks at 1..32 and 25..50
    assert rows[(1, 0)]["chunk_tokens"] == 32
    assert rows[(1, 1)]["chunk_tokens"] == 26
    import hashlib as _h

    assert rows[(1, 1)]["chunk_md5"] == _h.md5(
        " ".join(words[24:50]).encode()
    ).hexdigest()
    # doc 2 fits in one chunk; doc 3 (blank) still yields one chunk row
    assert rows[(2, 0)]["chunk_tokens"] == 2
    assert (3, 0) in rows and (3, 1) not in rows
    assert len(rows) == 4


def test_tfidf_terms_hand_computed(spark):
    import math

    from blackroad_feature_store_spark.operators.corpus import tfidf_terms

    df = spark.createDataFrame(
        [
            (1, "spark spark engine"),
            (2, "spark cluster"),
            (3, "warehouse cluster"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["term"]): r for r in tfidf_terms(df).collect()
    }
    r = out[(1, "spark")]
    assert (r["tf"], r["df"]) == (2, 2)
    assert r["tfidf"] == round(2 * math.log(3 / 2), 6)
    # a term in every doc would have idf 0; here 'engine' is unique
    assert out[(1, "engine")]["tfidf"] == round(math.log(3.0), 6)


def test_mad_outliers_flags_extremes(spark):
    from blackroad_feature_store_spark.operators.corpus import mad_outliers

    rows = [("a", v) for v in [10, 11, 12, 13, 14, 500]] + [("b", 7)]
    df = spark.createDataFrame(rows, "g string, x long")
    out = mad_outliers(df, "g", "x", k=3.0).collect()
    flagged = sorted(r["x"] for r in out if r["is_outlier"])
    assert flagged == [500]
    a = next(r for r in out if r["g"] == "a")
    assert a["group_median"] == 12.5  # interpolated over 6 values
    # group b: single value, MAD 0, never an outlier
    b = next(r for r in out if r["g"] == "b")
    assert not b["is_outlier"]


def test_pii_redaction_order_and_counts(spark):
    from blackroad_feature_store_spark.operators.text import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [("mail a.b+c@x-1.example.org ip 10.0.200.7 acct 12345678 pin 123",)],
        "text string",
    )
    c = pii_counts(F.col("text"))
    row = df.select(
        redact_pii(F.col("text")).alias("red"),
        c["n_email"].alias("e"), c["n_ip"].alias("i"), c["n_number"].alias("n"),
    ).collect()[0]
    assert row["red"] == "mail <EMAIL> ip <IP> acct <NUM> pin 123"
    # email digits are consumed before digit-run counting; short pin kept
    assert (row["e"], row["i"], row["n"]) == (1, 1, 1)


def test_pack_sequences_bins_by_running_total(spark):
    from blackroad_feature_store_spark.operators.corpus import pack_sequences

    rows = [
        ("s", 1, 100), ("s", 2, 100), ("s", 3, 100),  # starts 0/100/200
        ("s", 4, 100),                                # start 300 -> bin 1
        ("t", 9, 50),                                 # own partition, bin 0
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    out = {
        r["doc_id"]: r["bin_id"]
        for r in pack_sequences(df, "source", ["doc_id"], "n_tok", 256).collect()
    }
    assert out == {1: 0, 2: 0, 3: 0, 4: 1, 9: 0}


def test_audio_features_fake_decode_and_stub(spark):
    from blackroad_feature_store_spark.operators.multimodal import (
        _fake_decode_audio,
        audio_features,
        documents_as_assets,
    )

    docs = spark.createDataFrame(
        [(1, "some audio-ish payload", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    assets = documents_as_assets(docs)
    row = audio_features(assets, fake=True).collect()[0]
    rate, dur, rms = _fake_decode_audio(b"some audio-ish payload")
    assert (row["sample_rate"], row["duration_ms"], row["rms"]) == (
        rate, dur, rms,
    )
    assert row["sample_rate"] in (8000, 16000, 22050, 44100)


def test_audio_features_real_decode(spark):
    # fake=False REALLY decodes PCM WAV: stdlib wave + numpy RMS. A
    # 440 Hz sine at amp 0.5 has RMS 0.5/sqrt(2); junk payloads get
    # NULL features without failing the job.
    import math

    from blackroad_feature_store_spark.operators.multimodal import (
        audio_features,
    )

    wav = _tiny_wav(rate=16000, seconds=0.25, amp=0.5)
    assets = spark.createDataFrame(
        [(1, "audio", bytearray(wav), {}), (2, "audio", bytearray(b"junk"), {})],
        "asset_id long, modality string, content binary, "
        "meta map<string,string>",
    )
    rows = {r["asset_id"]: r for r in
            audio_features(assets, fake=False).collect()}
    assert rows[1]["sample_rate"] == 16000
    assert rows[1]["duration_ms"] == 250
    assert abs(rows[1]["rms"] - 0.5 / math.sqrt(2)) < 0.01
    assert rows[2]["sample_rate"] is None and rows[2]["rms"] is None


def test_read_documents_orc_roundtrip(spark, tmp_path):
    from blackroad_feature_store_spark.sources.files import (
        read_documents,
        write_documents,
    )

    docs = spark.createDataFrame(
        [(1, "hello orc", "en", "s", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "docs_orc")
    write_documents(docs, path, format="orc")
    back = read_documents(spark, path, format="orc")
    assert [tuple(r) for r in back.collect()] == [
        (1, "hello orc", "en", "s", 9)
    ]


def test_chunk_documents_exhaustive_coverage(spark):
    """For every token count 0..80: chunk count matches the closed
    form, every token is covered, no chunk exceeds chunk_size, and
    consecutive chunks overlap by exactly chunk_size - stride."""
    import math

    from blackroad_feature_store_spark.operators.corpus import chunk_documents

    C, S = 32, 24
    rows = [(n, " ".join(f"t{i}" for i in range(n))) for n in range(0, 81)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in chunk_documents(df, chunk_size=C, stride=S).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_tokens"])
        )
    for n in range(0, 81):
        chunks = sorted(out[n])
        eff_n = max(n, 1)  # blank text still tokenizes to one '' token
        expected = 1 + math.ceil(max(eff_n - C, 0) / S)
        assert len(chunks) == expected, f"n={n}"
        assert all(sz <= C for _, sz in chunks)
        # chunk k starts at k*S (0-based); last chunk must reach token n
        last_k, last_sz = chunks[-1]
        assert last_k * S + last_sz == eff_n, f"n={n}"
        # full coverage with exact overlap C-S between neighbors
        for k, sz in chunks[:-1]:
            assert sz == C, f"n={n} interior chunk short"


@pytest.mark.skipif(
    is_generated_testdata(),
    reason="the 0.3 recall floor is pinned on the driver fixtures' "
    "specific random realization; a generated root's iid-gaussian "
    "realization can legitimately sit below it — correctness "
    "queries still run there",
)
def test_ivf_trained_centroids_quantization_and_recall(spark):
    """MLlib k-means centroids must quantize better than a random
    sample (higher mean max-cosine to the assigned centroid — the
    k-means objective) and still find real neighbors at nprobe=2.

    Recall alone is a misleading metric here: a sampled-centroid set
    that happens to contain the query vectors probes the query's own
    cluster and looks artificially good, so the quantization quality
    is the property worth pinning."""
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        dot,
        norm,
        train_centroids,
    )

    emb = spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
    # Disjoint from the query ids below, so no coincidence artifact.
    sampled = emb.where(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 216)
    ).selectExpr("CAST(vec_id AS INT) AS centroid_id", "embedding")
    trained = train_centroids(emb, k=16, max_iter=5)

    def mean_assignment_sim(centroids):
        c = F.broadcast(
            centroids.selectExpr(
                "centroid_id AS cid", "embedding AS cvec"
            ).withColumn("cn", norm(F.col("cvec")))
        )
        sims = (
            emb.withColumn("vn", norm(F.col("embedding")))
            .crossJoin(c)
            .withColumn(
                "sim",
                dot(F.col("embedding"), F.col("cvec"))
                / (F.col("vn") * F.col("cn")),
            )
            .groupBy("vec_id")
            .agg(F.max("sim").alias("best"))
        )
        return sims.agg(F.avg("best")).collect()[0][0]

    q_sampled = mean_assignment_sim(sampled)
    q_trained = mean_assignment_sim(trained)
    assert q_trained > q_sampled, (q_trained, q_sampled)

    queries = (
        emb.where(F.col("vec_id") < 10)
        .selectExpr("vec_id AS query_id", "embedding")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_ivf(
            emb, queries, trained, k=5, nprobe=2
        ).collect()
    }
    assert len(got & exact) / len(exact) > 0.3


def test_resize_images_fake_kernel_deterministic(spark):
    import hashlib as _h

    from blackroad_feature_store_spark.operators.multimodal import (
        documents_as_assets,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(1, "payload one", "en", "s"), (2, "payload two", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    assets = documents_as_assets(docs)
    rows = {r["asset_id"]: r for r in resize_images(
        assets, width=64, height=64).collect()}
    assert rows[1]["width"] == 64 and rows[1]["n_bytes"] == len(
        rows[1]["content"]
    )
    # Deterministic: same payload + dims -> same bytes.
    seed = _h.sha256(b"payload one" + b":64x64").digest()
    assert bytes(rows[1]["content"])[:32] == seed
    # Different dims -> different payload (the dims are in the digest).
    rows_other = {r["asset_id"]: r for r in resize_images(
        assets, width=32, height=32).collect()}
    assert bytes(rows_other[1]["content"]) != bytes(rows[1]["content"])


def test_resize_images_real_roundtrip(spark):
    # fake=False: decode PNG pixels -> nearest-neighbor resize ->
    # re-encode PNG. The output payload must itself decode to the
    # target dims with pixel values drawn from the source image.
    from blackroad_feature_store_spark.operators.codecs import decode_png
    from blackroad_feature_store_spark.operators.multimodal import (
        resize_images,
    )

    img, png = _tiny_png(40, 24)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(png), {}), (2, "image", bytearray(b"junk"), {})],
        "asset_id long, modality string, content binary, "
        "meta map<string,string>",
    )
    rows = {r["asset_id"]: r for r in
            resize_images(assets, width=10, height=6, fake=False).collect()}
    out = decode_png(bytes(rows[1]["content"]))
    assert out.shape == (6, 10, 3)
    # nearest-neighbor: every output pixel exists somewhere in the source
    src_px = {tuple(p) for p in img.reshape(-1, 3)}
    assert all(tuple(p) in src_px for p in out.reshape(-1, 3))
    # exact corner: output (0, 0) maps to source (0, 0)
    assert (out[0, 0] == img[0, 0]).all()
    assert rows[2]["content"] is None and rows[2]["n_bytes"] is None


def test_incremental_candidate_pairs_match_full_recompute(spark):
    """Incremental LSH over two ingest batches must find exactly the
    pairs a full recompute finds that touch the new batch."""
    from blackroad_feature_store_spark.operators.dedup import (
        incremental_candidate_pairs,
        minhash_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(
        os.path.join(SF001, "documents.parquet")
    ).select("doc_id", "text")
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)

    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(docs).collect()
    }
    new_ids = {r["doc_id"] for r in new.collect()}
    expected = {
        p for p in full if p[0] in new_ids or p[1] in new_ids
    }

    old_sigs = minhash_signatures(old)
    pairs, new_sigs = incremental_candidate_pairs(new, old_sigs)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == expected
    # The returned signatures extend the table for the next increment.
    assert new_sigs.count() == new.count() * 8  # 8 bands per doc


# -- paragraph_dedup --------------------------------------------------------

def test_paragraph_dedup_survivor_and_reassembly(spark):
    from blackroad_feature_store_spark.operators.corpus import paragraph_dedup

    footer = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (1, "alpha body\n\n" + footer),
            (2, "beta body\n\n" + footer + "\n\ngamma body"),
            (3, footer),                      # everything a dup → vanishes
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    # footer survives only in doc 1 (earliest doc, earliest position)
    assert out[1]["text"] == "alpha body\n\nsubscribe to our newsletter"
    assert (out[1]["kept_paras"], out[1]["total_paras"]) == (2, 2)
    # doc 2 loses the footer but keeps its own paragraphs IN ORDER
    assert out[2]["text"] == "beta body\n\ngamma body"
    assert (out[2]["kept_paras"], out[2]["total_paras"]) == (2, 3)
    # doc 3 was pure boilerplate
    assert 3 not in out


def test_paragraph_dedup_within_doc_duplicates(spark):
    from blackroad_feature_store_spark.operators.corpus import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "same\n\nsame\n\nother")], "doc_id int, text string"
    )
    row = paragraph_dedup(df).collect()[0]
    # the SECOND copy inside the same doc is also removed (pos tiebreak)
    assert row["text"] == "same\n\nother"
    assert (row["kept_paras"], row["total_paras"]) == (2, 3)


# -- population_stability (PSI drift) ---------------------------------------

def test_population_stability_identical_and_shifted(spark):
    from blackroad_feature_store_spark.operators.stats import (
        population_stability,
    )

    rows = []
    # key "stable": identical uniform spread in both windows
    for v in range(100):
        rows.append(("stable", float(v), True))
        rows.append(("stable", float(v), False))
    # key "shifted": ref mass in [0,10), current mass in [90,100)
    for v in range(100):
        rows.append(("shifted", float(v % 10), True))
        rows.append(("shifted", 90.0 + (v % 10), False))
    df = spark.createDataFrame(rows, "k string, value double, ref boolean")
    out = {
        r["key"]: r
        for r in population_stability(
            df, "value", "k", F.col("ref"), n_bins=10, lo=0.0, hi=100.0
        ).collect()
    }
    assert out["stable"]["n_ref"] == 100 and out["stable"]["n_cur"] == 100
    assert out["stable"]["psi"] == 0.0          # identical histograms
    assert out["shifted"]["psi"] > 1.0          # gross drift


def test_population_stability_missing_bins_and_clamping(spark):
    from blackroad_feature_store_spark.operators.stats import (
        population_stability,
    )

    # ref all in bin 0; cur all in bin 1; bins 2..4 empty both sides.
    # Out-of-range values clamp into the edge bins.
    df = spark.createDataFrame(
        [("k", -5.0, True)] * 4 + [("k", 25.0, False)] * 4,
        "k string, value double, ref boolean",
    )
    row = population_stability(
        df, "value", "k", F.col("ref"), n_bins=5, lo=0.0, hi=100.0
    ).collect()[0]
    # hand-computed: eps=.5, tot=4, denom=4+2.5=6.5
    # bin0: pr=4.5/6.5, pc=.5/6.5 ; bin1 mirrored; bins 2-4: equal → 0
    import math as m
    p_hi, p_lo = 4.5 / 6.5, 0.5 / 6.5
    expected = round(2 * (p_hi - p_lo) * m.log(p_hi / p_lo), 6)
    assert row["psi"] == pytest.approx(expected, abs=1e-6)
    assert row["n_ref"] == 4 and row["n_cur"] == 4


# -- product quantization (IVFADC scale path) -------------------------------

def test_pq_train_and_encode_shapes(spark):
    from blackroad_feature_store_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    emb = spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
    cb = pq_train(emb, m=4, k=16)
    rows = cb.collect()
    assert len(rows) == 4 * 16
    assert all(len(r["codeword"]) == 16 for r in rows)      # 64/4 dims
    assert {r["subspace"] for r in rows} == set(range(4))
    assert {r["code"] for r in rows} == set(range(16))

    codes = pq_encode(emb, cb)
    assert codes.count() == emb.count()
    sample = codes.limit(20).collect()
    assert all(len(r["codes"]) == 4 for r in sample)
    assert all(0 <= c < 16 for r in sample for c in r["codes"])


def test_pq_encode_exact_on_codeword_composed_vectors(spark):
    # A vector that IS a concatenation of codewords must encode to
    # exactly those code ids (distance 0 per subspace).
    from blackroad_feature_store_spark.operators.similarity import pq_encode

    cb = spark.createDataFrame(
        [
            (0, 0, [1.0, 0.0]), (0, 1, [0.0, 1.0]),
            (1, 0, [1.0, 1.0]), (1, 1, [-1.0, 1.0]),
        ],
        "subspace int, code int, codeword array<double>",
    )
    # unit-normalization scales uniformly, so construct vectors whose
    # normalized form matches the codewords' directions only if we
    # disable normalization for the check
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, -1.0, 1.0]), (2, [0.0, 1.0, 1.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    out = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(df, cb, normalize=False).collect()
    }
    assert out[1] == [0, 1]
    assert out[2] == [1, 0]


@pytest.mark.skipif(
    is_generated_testdata(),
    reason="PQ-recall dial values is pinned on the driver fixtures' specific "
    "random realization (recall@5 over 10 queries moves in 0.02 "
    "steps); on a generated root the ordering can legitimately "
    "differ — correctness queries still run there",
)
def test_pq_topk_recall_scales_with_rerank_and_m(spark):
    """The two PQ dials behave as designed on the real embeddings:
    deeper exact re-rank and more subspaces both raise recall@5 vs the
    brute-force truth. Absolute values measured with these seeds
    (m=4: .40, m=16: .66 at rerank=4; rerank=8 at m=4: .58)."""
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_pq,
        pq_train,
    )
    from blackroad_feature_store_spark.sources.testdata import load

    emb = load(spark, SF001, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def rset(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    truth = rset(cosine_topk(emb, queries, k=5))
    cb4 = pq_train(emb, m=4, k=16)
    r_low = len(rset(cosine_topk_pq(emb, queries, cb4, k=5, rerank=2))
                & truth) / len(truth)
    r_deep = len(rset(cosine_topk_pq(emb, queries, cb4, k=5, rerank=8))
                 & truth) / len(truth)
    cb16 = pq_train(emb, m=16, k=16)
    r_wide = len(rset(cosine_topk_pq(emb, queries, cb16, k=5, rerank=4))
                 & truth) / len(truth)
    assert r_deep > r_low          # re-rank depth is a recall dial
    assert r_wide > r_low          # finer subspaces are a recall dial
    assert r_deep >= 0.45 and r_wide >= 0.5   # measured .58 / .66


def test_ivfpq_full_dials_equal_brute_and_dials_raise_recall(spark):
    """IVFADC (`similarity.py::cosine_topk_ivfpq`): with every dial
    wide open — nprobe = |centroids|, rerank·k >= |corpus| — the
    result equals brute force EXACTLY (the dials trade recall for
    cost, never correctness of what they keep); tightening nprobe
    can only lose candidates, and probing more lists recovers them."""
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivfpq,
        pq_train,
    )
    from blackroad_feature_store_spark.sources.testdata import load

    emb = load(spark, SF001, "embeddings")
    queries = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"), "embedding"
    )
    cb = pq_train(emb, m=4, k=16)
    n = emb.count()

    def rset(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    truth = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    full = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in cosine_topk_ivfpq(
            emb, queries, centroids, cb, k=5,
            nprobe=8, rerank=(n // 5) + 1,
        ).collect()
    }
    assert full == truth  # wide-open dials == brute force, bit-for-bit

    # nprobe monotonicity holds at UNBOUNDED rerank (the candidate
    # cut no longer binds, so more probed lists strictly grow the
    # exact-reranked pool). At a FIXED rerank budget it does NOT —
    # extra lists add ADC-noisy competitors for the same rerank*k
    # slots and recall can dip (observed 21 -> 15 with m=4) — which is
    # exactly why rerank and nprobe must be tuned together in any
    # IVFADC deployment.
    deep = (n // 5) + 1
    tight = rset(cosine_topk_ivfpq(
        emb, queries, centroids, cb, k=5, nprobe=1, rerank=deep))
    wide = rset(cosine_topk_ivfpq(
        emb, queries, centroids, cb, k=5, nprobe=4, rerank=deep))
    t = rset(cosine_topk(emb, queries, k=5))
    assert len(wide & t) >= len(tight & t)  # nprobe dial, rerank open
    assert len(wide & t) / len(t) >= 0.5    # measured with these seeds


def test_variant_semi_structured_path_agrees_with_json_strings(spark):
    """Spark 4 VARIANT (parse_json → typed variant_get) is the
    100 TB-preferred semi-structured path (SURVEY §1.5: parse once,
    binary-encoded thereafter, no repeated string re-parse). Pin that
    it exists and agrees with the string-path extraction the catalog
    queries use, so either representation can back `events.props`."""
    from blackroad_feature_store_spark.sources.testdata import load

    ev = load(spark, SF001, "events")
    both = ev.select(
        F.get_json_object("props", "$.k").cast("long").alias("s_k"),
        F.try_variant_get(
            F.parse_json(F.col("props")), "$.k", "long"
        ).alias("v_k"),
    )
    assert both.where(
        ~F.col("s_k").eqNullSafe(F.col("v_k"))
    ).count() == 0
    # typed extraction of a wrong type yields NULL, not an error
    bad = ev.select(
        F.try_variant_get(
            F.parse_json(F.col("props")), "$.k.missing", "long"
        ).alias("x")
    )
    assert bad.where(F.col("x").isNotNull()).count() == 0


def test_paragraph_dedup_random_corpora_match_brute_force(spark):
    """Property check (seeded): on random corpora drawn from a small
    paragraph vocabulary (forcing heavy cross-document collisions), the
    operator's output equals a sequential-scan reference
    implementation: global first-occurrence survivorship, in-order
    reassembly, all-dup documents vanish."""
    import random as _random

    from blackroad_feature_store_spark.operators.corpus import paragraph_dedup

    rng = _random.Random(20260814)
    vocab = [f"para {i} body" for i in range(12)]
    for trial in range(3):
        docs = []
        for doc_id in range(rng.randrange(4, 10)):
            n = rng.randrange(1, 6)
            docs.append(
                (doc_id, "\n\n".join(rng.choice(vocab) for _ in range(n)))
            )
        seen: set[str] = set()
        expected = {}
        for doc_id, text in sorted(docs):
            paras = text.split("\n\n")
            kept = [p for p in paras if p not in seen and not seen.add(p)]
            if kept:
                expected[doc_id] = (
                    "\n\n".join(kept), len(kept), len(paras)
                )
        df = spark.createDataFrame(docs, "doc_id int, text string")
        got = {
            r["doc_id"]: (r["text"], r["kept_paras"], r["total_paras"])
            for r in paragraph_dedup(df).collect()
        }
        assert got == expected, f"trial {trial}"


def test_population_stability_excludes_nulls(spark):
    # NULL values must not become phantom mass in bin 0: a null-rate
    # difference between windows is not value drift.
    from blackroad_feature_store_spark.operators.stats import (
        population_stability,
    )

    rows = (
        [("k", 5.0, True)] * 10 + [("k", 5.0, False)] * 10
        + [("k", None, True)] * 50            # nulls only on the ref side
    )
    df = spark.createDataFrame(rows, "k string, value double, ref boolean")
    row = population_stability(
        df, "value", "k", F.col("ref"), n_bins=5, lo=0.0, hi=10.0
    ).collect()[0]
    assert row["n_ref"] == 10 and row["n_cur"] == 10   # nulls not counted
    assert row["psi"] == 0.0                           # identical histograms
    # a key with ONLY null values has no PSI row at all
    df2 = spark.createDataFrame(
        [("dead", None, True)], "k string, value double, ref boolean"
    )
    assert population_stability(
        df2, "value", "k", F.col("ref"), n_bins=5, lo=0.0, hi=10.0
    ).count() == 0


def test_paragraph_dedup_literal_separator_with_regex_metachars(spark):
    from blackroad_feature_store_spark.operators.corpus import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "alpha||beta"), (2, "beta||gamma")], "doc_id int, text string"
    )
    out = {
        r["doc_id"]: r for r in paragraph_dedup(df, sep="||").collect()
    }
    # "||" must split literally (as a regex it matches empty string and
    # shreds the text into characters)
    assert out[1]["text"] == "alpha||beta"
    assert out[2]["text"] == "gamma"        # beta deduped into doc 1
    assert (out[2]["kept_paras"], out[2]["total_paras"]) == (1, 2)


def test_pq_dimension_mismatch_raises(spark):
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk_pq,
        pq_encode,
        pq_train,
    )

    emb = spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
    cb = pq_train(emb, m=4, k=4)                  # trained at d=64
    short = spark.createDataFrame(
        [(1, [1.0] * 32)], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="does not match codebooks"):
        pq_encode(short, cb)
    with pytest.raises(ValueError, match="query vector"):
        cosine_topk_pq(
            emb,
            short.selectExpr("vec_id AS query_id", "embedding"),
            cb,
        )


# -- semantic dedup (SemDeDup) ---------------------------------------------


def test_semantic_dedup_keeps_farthest_from_centroid(spark):
    from blackroad_feature_store_spark.operators.dedup import semantic_dedup

    # Two well-separated clusters on orthogonal axes. In cluster X:
    # ids 10/11 are near-identical (cos≈1), 12 is distinct; 11 is
    # slightly farther from the centroid than 10, so 11 must survive
    # and 10 must drop. Cluster Y has no dups.
    rows = [
        (10, [1.0, 0.02, 0.0]),
        (11, [1.0, 0.3, 0.0]),    # same direction-ish, farther from c0
        (12, [0.2, 1.0, 0.0]),    # same cluster, not a dup of 10/11
        (20, [0.0, 0.0, 1.0]),
        (21, [0.1, 0.0, 0.9]),    # cos(20,21)≈0.994 — dup of 20
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.05, 0.0]), (1, [0.0, 0.0, 1.0])],
        "centroid_id int, embedding array<double>",
    )
    out = semantic_dedup(df, cents, threshold=0.9)
    got = {r["vec_id"]: r["centroid_id"] for r in out.collect()}
    # 10 dropped (11 outranks it: cos(11,c0)≈0.971 < cos(10,c0)≈0.9996
    # and cos(10,11)≈0.963 > τ); 20 dropped (21 outranks:
    # cos(21,c1)≈0.994 < 1.0 and cos(20,21)≈0.994 > τ).
    assert set(got) == {11, 12, 21}
    assert got[11] == 0 and got[12] == 0 and got[21] == 1


def test_semantic_dedup_no_surviving_dup_pair_and_one_shot(spark):
    from blackroad_feature_store_spark.operators.dedup import (
        embedding_near_duplicates,
        semantic_dedup,
    )

    # Random-ish deterministic vectors; the invariant that must hold
    # for ANY input: no two survivors in the same cluster are still a
    # dup pair (if they were, the farther-from-centroid one would have
    # outranked and dropped the other).
    import itertools

    rows = [
        (i, [((i * 7 + j * 13) % 10) / 10.0 + 0.1 for j in range(4)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(4)],
        "centroid_id int, embedding array<double>",
    )
    out = semantic_dedup(df, cents, threshold=0.999)
    kept = out.select("vec_id", "centroid_id", "embedding")
    # survivors ⊆ input, and at least one row was actually dropped
    n_kept = kept.count()
    assert 0 < n_kept < 30
    # no surviving intra-cluster pair above the threshold
    pairs = embedding_near_duplicates(
        kept, id_col="vec_id", block_col="centroid_id", threshold=0.999
    ).where("cosine > 0.999")
    assert pairs.count() == 0


# -- duplicated_ngram_spans -------------------------------------------------


def test_dup_ngram_spans_coverage_and_overlap_merge(spark):
    from blackroad_feature_store_spark.operators.corpus import (
        duplicated_ngram_spans,
    )

    # docs 1 and 2 share the 6-token run "a b c d e f": two
    # overlapping 5-gram windows [1,5] and [2,6] that must merge into
    # one 6-token island, not 10 counted positions. doc 3 is unique.
    df = spark.createDataFrame(
        [
            (1, "a b c d e f x y z w"),
            (2, "p q a b c d e f r s"),
            (3, "entirely different tokens with no overlap here at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in duplicated_ngram_spans(df, n=5).collect()}
    assert out[1]["n_tokens"] == 10
    assert out[1]["dup_tokens"] == 6
    assert out[1]["dup_frac"] == 0.6
    assert out[2]["dup_tokens"] == 6
    assert out[3]["dup_tokens"] == 0 and out[3]["dup_frac"] == 0.0


def test_dup_ngram_spans_short_and_within_doc_repeat(spark):
    from blackroad_feature_store_spark.operators.corpus import (
        duplicated_ngram_spans,
    )

    # doc 10 is shorter than n -> no grams, zero coverage (still one
    # output row). doc 11 repeats a 5-gram WITHIN itself only -> a
    # within-doc repeat is NOT a cross-doc duplicate (min==max doc id).
    df = spark.createDataFrame(
        [
            (10, "too short"),
            (11, "a b c d e GAP a b c d e"),
            (12, "nothing shared with others whatsoever in this one"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in duplicated_ngram_spans(df, n=5).collect()}
    assert out[10]["n_tokens"] == 2 and out[10]["dup_tokens"] == 0
    assert out[11]["dup_tokens"] == 0
    assert out[12]["dup_tokens"] == 0


def test_dup_ngram_spans_case_and_whitespace_normalized(spark):
    from blackroad_feature_store_spark.operators.corpus import (
        duplicated_ngram_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "The Quick Brown Fox Jumps"),
            (2, "  the   quick brown fox JUMPS  "),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in duplicated_ngram_spans(df, n=5).collect()}
    assert out[1]["dup_tokens"] == 5 and out[1]["dup_frac"] == 1.0
    assert out[2]["dup_tokens"] == 5 and out[2]["dup_frac"] == 1.0


# -- zorder_key -------------------------------------------------------------


def test_zorder_key_interleaves_and_colocates(spark):
    from blackroad_feature_store_spark.operators.util import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], ["x", "y"]
    )
    out = zorder_key(df, ["x", "y"], bits=4)
    rows = {(r["x"], r["y"]): r["__zkey"] for r in out.collect()}
    # Deterministic: a second evaluation produces identical keys.
    rows2 = {(r["x"], r["y"]): r["__zkey"] for r in out.collect()}
    assert rows == rows2
    # Buckets are mostly distinct (quantile boundaries may merge a few
    # adjacent grid values — exact bijection is not the contract).
    assert len(set(rows.values())) > 150
    # The interleave must use bits from BOTH columns: walking keys in
    # order must not be lexicographic on (x, y) or (y, x).
    by_key = [xy for xy, _ in sorted(rows.items(), key=lambda kv: kv[1])]
    assert by_key != sorted(rows)
    assert by_key != sorted(rows, key=lambda t: (t[1], t[0]))
    # Quadrant locality: the low-low quadrant's keys all sit below the
    # high-high quadrant's keys (what makes range files skippable in
    # both dimensions at once).
    low = max(rows[(x, y)] for x in range(8) for y in range(8))
    high = min(rows[(x, y)] for x in range(8, 16) for y in range(8, 16))
    assert low < high


def test_zorder_key_nulls_and_strings(spark):
    from blackroad_feature_store_spark.operators.util import zorder_key

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None), (None, 4.0)],
        ["k", "v"],
    )
    out = zorder_key(df, ["k", "v"], bits=4).collect()
    assert len(out) == 4  # nulls never drop rows
    keys = {(r["k"], r["v"]): r["__zkey"] for r in out}
    assert all(k is not None for k in keys.values())
    # helper columns are dropped
    assert set(out[0].asDict()) == {"k", "v", "__zkey"}


def test_zorder_key_bit_budget_enforced(spark):
    import pytest

    from blackroad_feature_store_spark.operators.util import zorder_key

    df = spark.createDataFrame([(1,) * 8], [f"c{i}" for i in range(8)])
    with pytest.raises(ValueError, match="<= 63"):
        zorder_key(df, [f"c{i}" for i in range(8)], bits=8)


# -- hll sketches / rollup --------------------------------------------------


def test_hll_rollup_matches_exact_within_envelope(spark):
    from pyspark.sql import functions as F

    from blackroad_feature_store_spark.operators.stats import (
        hll_rollup,
        hll_sketches,
    )

    # 4 sources x 3 shards; values overlap across shards so the union
    # must dedupe, not add.
    df = spark.range(12000).selectExpr(
        "concat('s', id % 4) AS source",
        "id % 3 AS shard",
        "concat('v', id % 2000) AS value",  # 2000 distinct overall
    )
    detail = hll_sketches(df, ["source", "shard"], "value")
    per_source = {
        r["source"]: r["approx_distinct"]
        for r in hll_rollup(detail, ["source"]).collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in df.groupBy("source")
        .agg(F.countDistinct("value").alias("n"))
        .collect()
    }
    for s, est in per_source.items():
        assert abs(est - exact[s]) / exact[s] <= 0.03, (s, est, exact[s])
    # grand total over all sketches
    total = hll_rollup(detail, []).collect()[0]["approx_distinct"]
    assert abs(total - 2000) / 2000 <= 0.03


def test_hll_sketches_survive_persistence_roundtrip(spark, tmp_path):
    """The whole point of first-class sketches: write them, read them
    back in another job, union with fresh ones — estimates unchanged."""
    from blackroad_feature_store_spark.operators.stats import (
        hll_rollup,
        hll_sketches,
    )

    day1 = spark.range(1000).selectExpr(
        "'d1' AS day", "concat('u', id) AS user"
    )
    day2 = spark.range(500, 1500).selectExpr(
        "'d2' AS day", "concat('u', id) AS user"
    )
    hll_sketches(day1, ["day"], "user").write.mode("overwrite").parquet(
        str(tmp_path / "sk")
    )
    stored = spark.read.parquet(str(tmp_path / "sk"))
    combined = stored.unionByName(hll_sketches(day2, ["day"], "user"))
    est = hll_rollup(combined, []).collect()[0]["approx_distinct"]
    assert abs(est - 1500) / 1500 <= 0.03  # 1500 true distinct users


def test_cosine_topk_gemm_matches_crossjoin_exactly(spark):
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_gemm,
    )
    from blackroad_feature_store_spark.sources.testdata import load

    emb = load(spark, SF001, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    b = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in cosine_topk_gemm(emb, queries, k=5).collect()
    }
    assert a == b


def test_cosine_topk_gemm_empty_queries_raises(spark):
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk_gemm,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="empty query frame"):
        cosine_topk_gemm(df, df.where("vec_id < 0").selectExpr(
            "vec_id AS query_id", "embedding"
        ))


def test_cosine_topk_gemm_query_limit_enforced(spark):
    """The GEMM path collects the query frame to the driver; the
    documented queries-fit-in-memory contract is enforced with a clear
    error instead of a silent driver OOM."""
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk_gemm,
    )

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.range(10).selectExpr(
        "id AS query_id", "array(CAST(id AS float), 1.0f) AS embedding"
    )
    with pytest.raises(ValueError, match="exceeds 3 rows"):
        cosine_topk_gemm(corpus, queries, max_queries=3)
    # within the limit: works
    assert cosine_topk_gemm(corpus, queries.limit(2), k=2).count() == 4


def test_cosine_topk_auto_pick_boundaries(spark):
    """`cosine_topk_auto` pick boundaries (VERDICT r9 item 8):
    within the broadcast contract -> the exact GEMM path
    (MapInPandas in the plan, results == cosine_topk bit-for-bit);
    past it -> ValueError without the approximate opt-in; with the
    opt-in -> IVF when centroids are supplied, LSH otherwise — each
    value-identical to calling that certified strategy directly."""
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_auto,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )

    corpus = spark.createDataFrame(
        [(i, [float((i * 7) % 13) - 6.0, float((i * 3) % 11) - 5.0,
              float((i * 5) % 9) - 4.0, 1.0])
         for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    queries = corpus.where(F.col("vec_id") < 6).selectExpr(
        "vec_id AS query_id", "embedding"
    )
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731

    # exact tier: GEMM picked, plan + values pinned
    auto = cosine_topk_auto(corpus, queries, k=3)
    assert "MapInPandas" in auto._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert rows(auto) == rows(cosine_topk(corpus, queries, k=3))

    # past the contract: refuse unless explicitly allowed to degrade
    with pytest.raises(ValueError, match="allow_approximate"):
        cosine_topk_auto(corpus, queries, k=3, max_queries=2)

    # opt-in, no centroids -> LSH tier
    lsh = cosine_topk_auto(
        corpus, queries, k=3, max_queries=2, allow_approximate=True
    )
    assert "MapInPandas" not in lsh._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert rows(lsh) == rows(cosine_topk_lsh(corpus, queries, k=3))

    # opt-in with centroids -> IVF tier
    cents = corpus.where(F.col("vec_id").isin(0, 20)).selectExpr(
        "CAST(vec_id AS INT) AS centroid_id", "embedding"
    )
    ivf = cosine_topk_auto(
        corpus, queries, k=3, max_queries=2, allow_approximate=True,
        centroids=cents, nprobe=2,
    )
    assert rows(ivf) == rows(
        cosine_topk_ivf(corpus, queries, cents, k=3, nprobe=2)
    )

    # opt-in with centroids AND codebooks -> IVFADC tier
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk_ivfpq,
        pq_train,
    )

    cb = pq_train(corpus, m=2, k=4)
    ivfpq = cosine_topk_auto(
        corpus, queries, k=3, max_queries=2, allow_approximate=True,
        centroids=cents, codebooks=cb, nprobe=2, rerank=3,
    )
    assert rows(ivfpq) == rows(
        cosine_topk_ivfpq(corpus, queries, cents, cb, k=3,
                          nprobe=2, rerank=3)
    )
    with pytest.raises(ValueError, match="codebooks without centroids"):
        cosine_topk_auto(
            corpus, queries, k=3, max_queries=2,
            allow_approximate=True, codebooks=cb,
        )

    with pytest.raises(ValueError, match="empty query frame"):
        cosine_topk_auto(corpus, queries.where("query_id < 0"))


def test_auto_approx_random_hyperplane_tier_recall(spark):
    """The auto-pick's random-hyperplane degraded tier (VERDICT r10
    item 8, catalog twin `sim_cosine_topk_auto_approx`): (a) a seeded
    plane family is deterministic; (b) auto + ``hyperplanes=`` equals
    calling `cosine_topk_lsh` with the same planes directly; (c) on
    clustered data — controlled here, so the pin survives testdata
    regeneration — random-projection buckets keep near-identical
    vectors together and recall vs exact brute force clears a real
    floor, not just the catalog's 0.08."""
    import numpy as np

    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_auto,
        cosine_topk_lsh,
        random_hyperplanes,
    )

    assert random_hyperplanes(8, 4, seed=7) == random_hyperplanes(8, 4, seed=7)
    assert random_hyperplanes(8, 4, seed=7) != random_hyperplanes(8, 4, seed=8)

    # 10 well-separated cluster directions, 12 members each: a query's
    # true top-k are its cluster-mates, which share its sign pattern
    # under ANY hyperplane family (tight angular spread)
    rng = np.random.default_rng(42)
    dirs = rng.standard_normal((10, 16))
    rows_ = []
    for i in range(120):
        v = dirs[i % 10] + 0.05 * rng.standard_normal(16)
        rows_.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(
        rows_, "vec_id long, embedding array<float>"
    )
    queries = corpus.where(F.col("vec_id") < 10).selectExpr(
        "vec_id AS query_id", "embedding"
    )
    planes = random_hyperplanes(16, 4, seed=7)

    approx = cosine_topk_auto(
        corpus, queries, k=5, max_queries=2, allow_approximate=True,
        hyperplanes=planes,
    )
    direct = cosine_topk_lsh(corpus, queries, k=5, hyperplanes=planes)
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(approx) == key(direct)

    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"]) for r in approx.collect()
    }
    recall = len(got & brute) / len(brute)
    assert recall >= 0.8, recall


# -- gapfill_locf ------------------------------------------------------------


def test_gapfill_locf_fills_gaps_and_carries_forward(spark):
    from datetime import datetime

    from blackroad_feature_store_spark.operators.asof import gapfill_locf

    df = spark.createDataFrame(
        [
            ("a", datetime(2026, 1, 1, 0, 10), 1.0),
            ("a", datetime(2026, 1, 1, 0, 50), 2.0),   # same bucket as above
            ("a", datetime(2026, 1, 1, 3, 5), 7.0),    # hours 1-2 are gaps
            ("b", datetime(2026, 1, 1, 5, 0), 4.0),    # single observation
        ],
        "k string, ts timestamp, v double",
    )
    rows = {
        (r["k"], str(r["bucket"])): r
        for r in gapfill_locf(df, ["k"], "ts", "v").collect()
    }
    # a: grid 00..03 -> 4 rows; b: 1 row
    assert len(rows) == 5
    r0 = rows[("a", "2026-01-01 00:00:00")]
    assert r0["bucket_value"] == 3.0 and r0["is_gap"] == 0
    r1 = rows[("a", "2026-01-01 01:00:00")]
    assert r1["bucket_value"] is None and r1["is_gap"] == 1
    assert r1["filled_value"] == 3.0  # carried forward
    r3 = rows[("a", "2026-01-01 03:00:00")]
    assert r3["bucket_value"] == 7.0 and r3["filled_value"] == 7.0
    rb = rows[("b", "2026-01-01 05:00:00")]
    assert rb["bucket_value"] == 4.0 and rb["is_gap"] == 0


def test_remove_duplicated_spans_keeps_first_occurrence(spark):
    from blackroad_feature_store_spark.operators.corpus import (
        remove_duplicated_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e f x y z"),        # first occurrence: kept
            (2, "p q a b c d e f r"),        # copy removed
            (3, "unique words only here nothing shared"),
            (4, "a b c d e"),                # whole doc is a dup gram
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(df, n=5).collect()
    }
    assert out[1]["text"] == "a b c d e f x y z"
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "p q r" and out[2]["n_removed"] == 6
    assert out[3]["n_removed"] == 0
    assert out[4]["text"] == "" and out[4]["n_removed"] == 5


def test_remove_duplicated_spans_within_doc_and_case(spark):
    from blackroad_feature_store_spark.operators.corpus import (
        remove_duplicated_spans,
    )

    # Within-doc repeat: second occurrence removed, first kept.
    # Case-insensitive matching, original casing preserved on keep.
    df = spark.createDataFrame(
        [(1, "A B C D E gap a b c d e")],
        ["doc_id", "text"],
    )
    r = remove_duplicated_spans(df, n=5).collect()[0]
    assert r["text"] == "A B C D E gap"
    assert r["n_removed"] == 5


def test_remove_duplicated_spans_keeper_overlap_protected(spark):
    from blackroad_feature_store_spark.operators.corpus import (
        remove_duplicated_spans,
    )

    # Self-overlapping repeat: 'a a a a a a' (n=5) has keeper [1,5]
    # and removed window [2,6]. Positions 2-5 sit inside the KEPT
    # occurrence, so only position 6 is deleted — one full occurrence
    # survives (Lee et al. 2021 semantics), not a single token.
    df = spark.createDataFrame([(1, "a a a a a a")], ["doc_id", "text"])
    r = remove_duplicated_spans(df, n=5).collect()[0]
    assert r["text"] == "a a a a a"
    assert r["n_removed"] == 1


def test_bigram_logprob_hand_computed(spark):
    import math

    from blackroad_feature_store_spark.operators.corpus import bigram_logprob

    # Corpus: bigrams (x,y) and (x,z). c1(x)=2, V=1 (distinct first
    # tokens = {x}), each c12=1 -> p = (1+1)/(2+1) = 2/3.
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x z"), (3, "solo")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    expect = round(math.log(2.0 / 3.0), 4)
    assert out[1]["n_bigrams"] == 1
    assert out[1]["avg_logprob"] == pytest.approx(expect, abs=1e-9)
    assert out[2]["avg_logprob"] == pytest.approx(expect, abs=1e-9)
    # fewer than 2 tokens -> no bigrams, NULL score, row still present
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_logprob"] is None


def test_bigram_logprob_boilerplate_scores_higher(spark):
    from blackroad_feature_store_spark.operators.corpus import bigram_logprob

    rows = [(i, "the quick brown fox jumps") for i in range(8)]
    rows.append((99, "zq xv qk vj wq"))  # gibberish: unseen bigrams
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["avg_logprob"] for r in bigram_logprob(df).collect()}
    assert out[0] > out[99]  # typical text above gibberish


def test_dup_ngram_spans_random_corpora_match_brute_force(spark):
    """Randomized parity: operator output == a pure-Python reference
    on small random corpora (tiny alphabet so collisions actually
    happen). Deterministic seeds — no flakes."""
    import random

    from blackroad_feature_store_spark.operators.corpus import (
        duplicated_ngram_spans,
    )

    N = 3
    for seed in (1, 7, 23):
        rng = random.Random(seed)
        docs = [
            (
                d,
                " ".join(
                    rng.choice("abcde") for _ in range(rng.randint(1, 14))
                ),
            )
            for d in range(8)
        ]

        # brute force
        toks = {d: t.split() for d, t in docs}
        occ = {}
        for d, ts in toks.items():
            for i in range(len(ts) - N + 1):
                occ.setdefault(tuple(ts[i : i + N]), []).append((d, i))
        covered = {d: set() for d in toks}
        for gram, sites in occ.items():
            if len({d for d, _ in sites}) >= 2:
                for d, i in sites:
                    covered[d].update(range(i, i + N))
        want = {
            d: (len(ts), len(covered[d])) for d, ts in toks.items()
        }

        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
            for r in duplicated_ngram_spans(df, n=N).collect()
        }
        assert got == want, f"seed {seed}"


def test_remove_duplicated_spans_random_corpora_match_brute_force(spark):
    import random

    from blackroad_feature_store_spark.operators.corpus import (
        remove_duplicated_spans,
    )

    N = 3
    for seed in (2, 11):
        rng = random.Random(seed)
        docs = [
            (
                d,
                " ".join(
                    rng.choice("abc") for _ in range(rng.randint(1, 12))
                ),
            )
            for d in range(6)
        ]
        toks = {d: t.split() for d, t in docs}
        occ = {}
        for d, ts in toks.items():
            for i in range(len(ts) - N + 1):
                occ.setdefault(tuple(ts[i : i + N]), []).append((d, i))
        drop = {d: set() for d in toks}
        keep_cov = {d: set() for d in toks}
        for gram, sites in occ.items():
            if len(sites) >= 2:
                kd, ki = sorted(sites)[0]  # keeper = first (doc, pos)
                keep_cov[kd].update(range(ki, ki + N))
                for d, i in sorted(sites)[1:]:
                    drop[d].update(range(i, i + N))
        want = {
            d: " ".join(
                t
                for i, t in enumerate(ts)
                if i not in (drop[d] - keep_cov[d])
            )
            for d, ts in toks.items()
        }

        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r["doc_id"]: r["text"]
            for r in remove_duplicated_spans(df, n=N).collect()
        }
        assert got == want, f"seed {seed}"


# -- observe-based quality metrics ------------------------------------------


def test_observe_quality_matches_direct_aggregates(spark):
    from blackroad_feature_store_spark.operators.quality import (
        observe_quality,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0), (4, None), (5, 2.0)],
        "id long, price double",
    )
    observed, obs = observe_quality(
        df,
        null_cols=["price"],
        constraints={"neg_price": F.col("price") < 0},
    )
    # Rows unchanged; metrics ride the same action.
    out = observed.where("id != 99").collect()
    assert len(out) == 5
    got = obs.get
    assert got["n_rows"] == 5
    assert got["null_price"] == 2
    assert got["neg_price"] == 1


def test_observe_quality_rides_downstream_plan_without_extra_scan(spark):
    from blackroad_feature_store_spark.operators.quality import (
        observe_quality,
    )
    from blackroad_feature_store_spark.sources.testdata import load

    docs = load(spark, SF001, "documents")
    observed, obs = observe_quality(
        docs,
        null_cols=["lang"],
        constraints={"empty_text": F.length("text") == 0},
    )
    # Build a real aggregation ON TOP of the observed frame: the
    # metrics must be computed by that same job.
    agg = observed.groupBy("source").count().collect()
    assert len(agg) > 0
    got = obs.get
    assert got["n_rows"] == docs.count()
    assert got["empty_text"] == 0


def test_gapfill_locf_random_series_match_pandas_resample(spark):
    """Randomized parity against pandas' own resample('h').sum() +
    ffill — an independent reference implementation of the same
    contract. Deterministic seeds."""
    import random
    from datetime import datetime, timedelta

    import pandas as pd

    from blackroad_feature_store_spark.operators.asof import gapfill_locf

    for seed in (3, 17):
        rng = random.Random(seed)
        rows = []
        for key in ("a", "b", "c"):
            t0 = datetime(2026, 1, 1)
            for _ in range(rng.randint(1, 25)):
                ts = t0 + timedelta(minutes=rng.randint(0, 60 * 72))
                rows.append((key, ts, float(rng.randint(1, 9))))
        sdf = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        got = {
            (r["k"], str(r["bucket"])): (
                r["bucket_value"],
                r["filled_value"],
                r["is_gap"],
            )
            for r in gapfill_locf(sdf, ["k"], "ts", "v").collect()
        }

        pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
        want = {}
        for key, grp in pdf.groupby("k"):
            obs = grp.set_index("ts")["v"].resample("h").sum()
            # pandas fills absent buckets with 0.0 sum; recover gaps
            # from the observation count per bucket instead
            counts = grp.set_index("ts")["v"].resample("h").count()
            lo = grp["ts"].min().floor("h")
            hi = grp["ts"].max().floor("h")
            obs = obs[(obs.index >= lo) & (obs.index <= hi)]
            counts = counts[(counts.index >= lo) & (counts.index <= hi)]
            vals = obs.where(counts > 0)
            filled = vals.ffill()
            for ts_i in vals.index:
                bv = vals[ts_i]
                want[(key, str(ts_i))] = (
                    None if pd.isna(bv) else round(bv, 6),
                    None if pd.isna(filled[ts_i]) else round(filled[ts_i], 6),
                    1 if pd.isna(bv) else 0,
                )
        assert got == want, f"seed {seed}"


def test_dsir_select_prefers_target_like_documents(spark):
    from blackroad_feature_store_spark.operators.corpus import dsir_select

    # corpus: 6 "english-ish" docs sharing bigrams with the target,
    # 6 "other" docs; target = 3 more english-ish docs (disjoint ids).
    eng = "the cat sat on the mat and the dog ran"
    other = "zork blap quux flim zam borp glarp nix"
    corpus = spark.createDataFrame(
        [(i, eng + f" extra{i}") for i in range(6)]
        + [(10 + i, other + f" extra{i}") for i in range(6)],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(100 + i, eng) for i in range(3)], ["doc_id", "text"]
    )
    top = [r["doc_id"] for r in dsir_select(corpus, target, k=6).collect()]
    assert sorted(top) == [0, 1, 2, 3, 4, 5]


def test_dsir_select_deterministic_and_k_bounded(spark):
    from blackroad_feature_store_spark.operators.corpus import dsir_select

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta token{i % 4}") for i in range(12)],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(99, "alpha beta gamma delta")], ["doc_id", "text"]
    )
    a = [(r["doc_id"], r["weight"]) for r in dsir_select(corpus, target, 5).collect()]
    b = [(r["doc_id"], r["weight"]) for r in dsir_select(corpus, target, 5).collect()]
    assert a == b and len(a) == 5


# -- BPE tokenizer ----------------------------------------------------------


def test_bpe_train_classic_example(spark):
    """Sennrich et al.'s worked example: corpus {low:5, lower:2,
    newest:6, widest:3}. With </w> markers the first merges must build
    'est</w>' (mass 9) before anything from 'low' (mass 7)."""
    from blackroad_feature_store_spark.operators.bpe import bpe_train

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = bpe_train(df, num_merges=4, min_freq=1)
    # highest-mass pair first: (e,s) freq 9; then (es,t) 9; then
    # (est,</w>) 9; then (l,o) 7.
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def test_bpe_encode_roundtrip_and_open_vocab(spark):
    from blackroad_feature_store_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    corpus = spark.createDataFrame(
        [(1, "hello hello hello world world")], ["doc_id", "text"]
    )
    merges = bpe_train(corpus, num_merges=50, min_freq=1)
    test = spark.createDataFrame(
        [(1, "hello world"), (2, "hello unseen")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bpe_encode(test, merges).collect()}
    # fully-merged known words -> one token each (with </w> folded in)
    assert out[1]["tokens"] == ["hello</w>", "world</w>"]
    # unseen word decomposes but never fails, and concatenating its
    # pieces reconstructs the word + marker (lossless)
    unseen = [t for t in out[2]["tokens"] if not t.startswith("hello")]
    assert "".join(unseen) == "unseen</w>"


def test_bpe_train_deterministic_across_partitionings(spark):
    from blackroad_feature_store_spark.operators.bpe import bpe_train
    from blackroad_feature_store_spark.sources.testdata import load

    docs = load(spark, SF001, "documents").select(
        "doc_id", "text"
    )
    a = bpe_train(docs, num_merges=30)
    b = bpe_train(docs.repartition(7), num_merges=30)
    assert a == b and len(a) == 30


def test_bpe_train_max_words_caps_dictionary_by_mass(spark):
    """The driver dictionary is hard-capped at the max_words
    highest-mass word types. Capping to the worked example's top word
    types must reproduce the merges those types alone imply, a cap
    wider than the vocabulary must change nothing, and the cap must be
    deterministic (freq ties break lexicographically) under
    repartitioning."""
    from blackroad_feature_store_spark.operators.bpe import bpe_train

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    # cap wider than the 4-type vocabulary: identical merges
    assert bpe_train(df, num_merges=4, min_freq=1, max_words=100) == \
        bpe_train(df, num_merges=4, min_freq=1)
    # cap to the top-2 types by mass (newest:6, low:5) — merges must
    # come from those two alone. Without widest's mass every pair in
    # 'newest' ties at 6, so the lexicographic tiebreak runs
    # (e,s) → (e,w) → (es,t) → (est,</w>) — a different sequence from
    # the full-vocabulary example, proving the cap actually dropped
    # the tail types.
    merges = bpe_train(df, num_merges=4, min_freq=1, max_words=2)
    assert merges == [
        ("e", "s"),
        ("e", "w"),
        ("es", "t"),
        ("est", "</w>"),
    ]
    # deterministic under partitioning with the cap active
    assert merges == bpe_train(
        df.repartition(5), num_merges=4, min_freq=1, max_words=2
    )


def test_blocklist_filter_token_not_substring(spark):
    from blackroad_feature_store_spark.operators.corpus import (
        blocklist_filter,
    )

    docs = spark.createDataFrame(
        [
            (1, "this class is fine"),        # 'class' contains 'ass'
            (2, "you Ass clown"),             # exact token, any case
            (3, "bad and worse words bad"),   # repeated term counts once
            (4, "clean text entirely"),
        ],
        ["doc_id", "text"],
    )
    bl = spark.createDataFrame([("ass",), ("bad",), ("worse",)], ["term"])
    out = {r["doc_id"]: r for r in blocklist_filter(docs, bl).collect()}
    assert not out[1]["blocked"]          # substring must NOT match
    assert out[2]["blocked"] and out[2]["n_blocked_terms"] == 1
    assert out[3]["blocked"] and out[3]["n_blocked_terms"] == 2
    assert not out[4]["blocked"] and out[4]["n_blocked_terms"] == 0


# -- SQL UDF surface --------------------------------------------------------


def test_sql_udfs_match_column_functions(spark):
    """The SQL UDF macros must agree with the DataFrame originals on
    the real corpus — parity pinned so neither side can drift."""
    from blackroad_feature_store_spark.functions.sql_udfs import (
        register_sql_functions,
    )
    from blackroad_feature_store_spark.operators.text import (
        bpe_token_count,
        fingerprint,
        token_count,
    )
    from blackroad_feature_store_spark.sources.testdata import load

    names = register_sql_functions(spark)
    assert {"fs_fingerprint", "fs_token_count", "fs_bpe_token_count"} <= set(
        names
    )
    docs = load(spark, SF001, "documents").limit(50)
    docs.createOrReplaceTempView("udf_docs")
    via_sql = {
        r["doc_id"]: (r["fp"], r["tc"], r["btc"])
        for r in spark.sql(
            "SELECT doc_id, fs_fingerprint(text) AS fp, "
            "fs_token_count(text) AS tc, "
            "fs_bpe_token_count(text) AS btc FROM udf_docs"
        ).collect()
    }
    via_col = {
        r["doc_id"]: (r["fp"], r["tc"], r["btc"])
        for r in docs.select(
            "doc_id",
            fingerprint(F.col("text")).alias("fp"),
            token_count(F.col("text")).alias("tc"),
            bpe_token_count(F.col("text")).alias("btc"),
        ).collect()
    }
    assert via_sql == via_col


def test_sql_udfs_inline_into_plan(spark):
    """SQL UDFs are macros: the call must inline (the plan shows the
    underlying expression, no opaque UDF node) so pushdown and codegen
    still apply."""
    from blackroad_feature_store_spark.functions.sql_udfs import (
        register_sql_functions,
    )
    from blackroad_feature_store_spark.sources.testdata import load

    register_sql_functions(spark)
    load(spark, SF001, "documents").createOrReplaceTempView(
        "udf_docs2"
    )
    df = spark.sql(
        "SELECT fs_token_count(text) AS n FROM udf_docs2 "
        "WHERE fs_alpha_ratio(text) > 0.5"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "regexp_replace" in plan  # the macro body, inlined
    assert df.count() > 0


def test_bm25_search_ranks_relevance_and_validates(spark):
    from blackroad_feature_store_spark.operators.corpus import bm25_search

    df = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),          # high tf for 'spark'
            (2, "spark engine with extra padding words here"),  # longer doc
            (3, "completely unrelated text tokens"),
            (4, "spark"),                              # short, pure hit
        ],
        ["doc_id", "text"],
    )
    rows = bm25_search(df, "Spark!", k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert 3 not in ids                       # no hit terms -> no row
    assert ids[0] in (1, 4)                   # tf/length tradeoff tops
    assert ids.index(2) > 0                   # diluted doc ranks lower
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError, match="no alpha tokens"):
        bm25_search(df, "123 !!!")


def test_bm25_search_multi_term_accumulates(spark):
    from blackroad_feature_store_spark.operators.corpus import bm25_search

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha alpha delta"),
            (3, "beta gamma gamma"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in bm25_search(df, "alpha beta", k=10).collect()}
    assert out[1]["n_hit_terms"] == 2         # both query terms present
    assert out[2]["n_hit_terms"] == 1
    assert out[3]["n_hit_terms"] == 1


def test_read_documents_schema_evolution_across_files(spark, tmp_path):
    """A corpus directory written over time gains columns (lang added
    later): the parquet source with mergeSchema must land BOTH eras
    into the canonical shape, null-filling the era that lacked the
    column."""
    from blackroad_feature_store_spark.sources.files import read_documents

    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "old era doc")], "doc_id long, text string"
    ).write.mode("append").parquet(d)
    spark.createDataFrame(
        [(2, "new era doc", "en")], "doc_id long, text string, lang string"
    ).write.mode("append").parquet(d)
    docs = read_documents(
        spark, d, format="parquet", options={"mergeSchema": "true"}
    )
    rows = {r["doc_id"]: r for r in docs.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["lang"] is None and rows[2]["lang"] == "en"
    assert rows[1]["n_chars"] == len("old era doc")


def test_gopher_rules_individual_verdicts(spark):
    from blackroad_feature_store_spark.operators.text import gopher_rules

    ok = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running through a field of tall grass to find the way home "
        "in time for dinner with all of the other animals nearby"
    )
    df = spark.createDataFrame(
        [
            (1, ok),                                   # passes everything
            (2, "too short"),                          # fails token count
            (3, "the " + "!@#$%^&*() " * 30),          # fails punct ratio
            (4, ("12345 67890 " * 15) + "the of and"), # fails alpha tokens
            (5, " ".join(["zyxwvu"] * 40)),            # fails stopwords
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert out[1]["pass_all"] == 1
    assert out[2]["r_token_count"] == 0 and out[2]["pass_all"] == 0
    assert out[3]["r_punct"] == 0 and out[3]["pass_all"] == 0
    assert out[4]["r_alpha_tokens"] == 0 and out[4]["pass_all"] == 0
    assert out[5]["r_stopwords"] == 0 and out[5]["pass_all"] == 0


def test_cluster_aware_split_never_leaks(spark):
    from blackroad_feature_store_spark.operators.corpus import (
        cluster_aware_split,
    )
    from blackroad_feature_store_spark.operators.dedup import (
        minhash_candidate_pairs,
    )
    from blackroad_feature_store_spark.sources.testdata import load

    docs = load(spark, SF001, "documents")
    out = cluster_aware_split(docs)
    rows = out.collect()
    assert len(rows) == docs.count()                   # every doc assigned
    split_of = {r["doc_id"]: r["split"] for r in rows}
    cluster_of = {r["doc_id"]: r["cluster_id"] for r in rows}
    pairs = minhash_candidate_pairs(docs).collect()
    for p in pairs:
        # same cluster -> same side, always
        assert cluster_of[p["id_a"]] == cluster_of[p["id_b"]]
        assert split_of[p["id_a"]] == split_of[p["id_b"]]
    # The 90/10 rule applies at CLUSTER granularity (whole families
    # move together — on this synthetic corpus one giant near-dup
    # family holds most docs, so the per-doc fraction is lumpy by
    # design). 39 clusters here; md5 buckets put ~90% in train.
    clusters = {}
    for d, c in cluster_of.items():
        clusters.setdefault(c, split_of[d])
    n_train_cl = sum(1 for s in clusters.values() if s == "train")
    assert 0.6 <= n_train_cl / len(clusters) <= 1.0
    assert len(clusters) > 10  # the corpus isn't ONE cluster


# -- image dHash near-dup ---------------------------------------------------


def _png_assets(spark):
    import numpy as np

    from blackroad_feature_store_spark.operators import codecs as C

    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[:4, :4] = 255  # small corner edit
    different = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(C.encode_png(base))),
        (2, bytearray(C.encode_png(base))),       # exact re-encode
        (3, bytearray(C.encode_png(near))),       # near duplicate
        (4, bytearray(C.encode_png(different))),  # unrelated
        (5, bytearray(b"not an image at all")),   # corrupt
    ]
    return spark.createDataFrame(
        rows, "asset_id long, content binary"
    )


def test_image_dhash_real_decode_and_near_dup_pairs(spark):
    from blackroad_feature_store_spark.operators.multimodal import (
        dhash_duplicate_pairs,
        image_dhash,
    )

    assets = _png_assets(spark)
    hashes = {r["asset_id"]: r["dhash"] for r in image_dhash(assets, fake=False).collect()}
    assert hashes[1] == hashes[2]           # identical pixels -> identical hash
    assert hashes[5] is None                # corrupt -> NULL, no crash
    d13 = bin((hashes[1] ^ hashes[3]) & ((1 << 64) - 1)).count("1")
    d14 = bin((hashes[1] ^ hashes[4]) & ((1 << 64) - 1)).count("1")
    assert d13 < d14                        # edit closer than unrelated
    pairs = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in dhash_duplicate_pairs(
            image_dhash(assets, fake=False), max_distance=max(3, d13)
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert (1, 3) in pairs                  # near dup found via banding
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_image_dhash_fake_path_deterministic(spark):
    from blackroad_feature_store_spark.operators.multimodal import (
        image_dhash,
    )

    assets = _png_assets(spark)
    a = {r["asset_id"]: r["dhash"] for r in image_dhash(assets).collect()}
    b = {r["asset_id"]: r["dhash"] for r in image_dhash(assets).collect()}
    assert a == b and a[1] == a[2] and a[1] != a[4]


def test_bm25_matches_pure_python_reference(spark):
    """Brute-force BM25 (straight from the Robertson formula) on a
    small corpus must equal the distributed implementation."""
    import math

    from blackroad_feature_store_spark.operators.corpus import bm25_search

    corpus = {
        1: "spark makes big data processing fast",
        2: "pandas makes small data processing easy",
        3: "fast data pipelines need fast engines",
        4: "gardening tips for spring flowers",
    }
    query_terms = ["fast", "data"]
    docs_tokens = {d: t.split() for d, t in corpus.items()}
    N = len(corpus)
    avgdl = sum(len(t) for t in docs_tokens.values()) / N
    k1, b = 1.2, 0.75
    dfreq = {
        q: sum(1 for t in docs_tokens.values() if q in t)
        for q in query_terms
    }
    want = {}
    for d, toks in docs_tokens.items():
        score, hits = 0.0, 0
        for q in query_terms:
            tf = toks.count(q)
            if tf == 0:
                continue
            hits += 1
            idf = round(
                math.log(1 + (N - dfreq[q] + 0.5) / (dfreq[q] + 0.5)), 6
            )
            contrib = round(
                idf * (tf * (k1 + 1))
                / (tf + k1 * (1 - b + b * len(toks) / avgdl)),
                6,
            )
            score += contrib
        if hits:
            want[d] = (round(score, 10), hits)

    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (round(r["score"], 10), r["n_hit_terms"])
        for r in bm25_search(df, "fast data", k=10).collect()
    }
    assert got == want


# -- hash embeddings --------------------------------------------------------


def test_hash_embedding_unit_norm_and_determinism(spark):
    import math

    from blackroad_feature_store_spark.operators.text import hash_embedding

    df = spark.createDataFrame(
        [
            (1, "spark data engine"),
            (2, "spark data engine"),          # identical text
            (3, "Spark  DATA   engine!!"),     # normalization-equal
            (4, "gardening flowers soil"),     # disjoint vocabulary
            (5, "12345 !!! ???"),              # no alpha tokens
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: list(r["embedding"]) for r in hash_embedding(df, dim=32).collect()}
    assert 5 not in rows                       # nothing to embed -> no row
    for v in rows.values():
        assert math.sqrt(sum(x * x for x in v)) == pytest.approx(1.0, abs=1e-6)
    assert rows[1] == rows[2] == rows[3]
    cos = sum(a * b for a, b in zip(rows[1], rows[4]))
    assert abs(cos) < 0.3                      # disjoint vocab ~ orthogonal


def test_hash_embedding_feeds_similarity_stack(spark):
    """End-to-end composition: raw documents -> hash embeddings ->
    the engine's exact top-k. Near-identical texts must be each
    other's nearest neighbors."""
    from blackroad_feature_store_spark.operators.similarity import (
        cosine_topk,
    )
    from blackroad_feature_store_spark.operators.text import hash_embedding

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over a lazy dog"),
            (3, "completely different subject matter entirely"),
            (4, "quantum chromodynamics lattice simulations"),
        ],
        ["doc_id", "text"],
    )
    emb = hash_embedding(df, dim=64).withColumnRenamed("doc_id", "vec_id")
    queries = emb.where("vec_id = 1").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    top = cosine_topk(emb, queries, k=1).collect()
    assert top[0]["neighbor_id"] == 2


def test_gapfill_interp_matches_pandas_interpolate(spark):
    """fill='interp' vs pandas resample('h').sum() + interpolate() on
    random series — independent reference, deterministic seed."""
    import random
    from datetime import datetime, timedelta

    import pandas as pd

    from blackroad_feature_store_spark.operators.asof import gapfill_locf

    rng = random.Random(21)
    rows = []
    for key in ("a", "b"):
        t0 = datetime(2026, 1, 1)
        for _ in range(rng.randint(2, 20)):
            ts = t0 + timedelta(minutes=rng.randint(0, 60 * 48))
            rows.append((key, ts, float(rng.randint(1, 9))))
    sdf = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        (r["k"], str(r["bucket"])): r["filled_value"]
        for r in gapfill_locf(sdf, ["k"], "ts", "v", fill="interp").collect()
    }

    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    for key, grp in pdf.groupby("k"):
        obs = grp.set_index("ts")["v"].resample("h").sum()
        counts = grp.set_index("ts")["v"].resample("h").count()
        lo, hi = grp["ts"].min().floor("h"), grp["ts"].max().floor("h")
        vals = obs.where(counts > 0)[(obs.index >= lo) & (obs.index <= hi)]
        interp = vals.interpolate(method="linear")
        for ts_i, want in interp.items():
            assert got[(key, str(ts_i))] == round(want, 6), (key, ts_i)


def test_gapfill_interp_ansi_and_large_values(spark):
    """The interp arithmetic must (a) never divide by zero on observed
    rows under Spark ANSI mode (the when() guard keeps __interp6 NULL
    there), and (b) survive large value × multi-month-gap products that
    previously overflowed the long numerator into a silent NULL."""
    from datetime import datetime

    from blackroad_feature_store_spark.operators.asof import gapfill_locf

    rows = [
        ("c", datetime(2026, 1, 1), 1e9),
        ("c", datetime(2026, 3, 2), 2e9),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    old = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        out = {
            str(r["bucket"]): r["filled_value"]
            for r in gapfill_locf(
                df,
                ["k"],
                "ts",
                "v",
                step="INTERVAL 30 DAY",
                bucket_trunc="day",
                fill="interp",
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    # 1e9 * 2.6e6 s * 1e6 would overflow a long numerator; the decimal
    # path interpolates the 30-day midpoint exactly.
    assert out["2026-01-31 00:00:00"] == 1.5e9
    assert out["2026-01-01 00:00:00"] == 1e9
    assert out["2026-03-02 00:00:00"] == 2e9


def test_weighted_sample_proportional_and_deterministic(spark):
    from blackroad_feature_store_spark.operators.corpus import (
        weighted_sample,
    )

    # 200 docs: half weight 10, half weight 1 -> the heavy half must
    # dominate a k=50 sample (E-S inclusion ∝ weight).
    df = spark.createDataFrame(
        [(i, 10.0 if i < 100 else 1.0) for i in range(200)],
        ["doc_id", "w"],
    )
    a = [r["doc_id"] for r in weighted_sample(df, "w", k=50).collect()]
    b = [r["doc_id"] for r in weighted_sample(df, "w", k=50).collect()]
    assert a == b                      # same data+seed -> same sample
    heavy = sum(1 for i in a if i < 100)
    assert heavy >= 40                 # ~10x weight -> heavy dominates
    c = [r["doc_id"] for r in weighted_sample(df, "w", k=50, seed=7).collect()]
    assert c != a                      # new seed -> fresh draw
    # weight <= 0 / NULL rows can never be sampled
    df2 = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)],
        "doc_id long, w double",
    )
    assert [r["doc_id"] for r in weighted_sample(df2, "w", k=10).collect()] == [1]


def test_spread_noop_on_already_wide_input(spark):
    """spread() exists to fan small single-partition scans out to the
    core count; on an input that already has >= defaultParallelism
    partitions it must be a NO-OP (same DataFrame back, no shuffle) —
    coalescing a wide scan down to ~#cores would shuffle the full
    payload for nothing at 100 TB scale."""
    from blackroad_feature_store_spark.operators.util import spread

    n = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).repartition(1)
    assert spread(narrow, "id").rdd.getNumPartitions() == n
    wide = spark.range(100).repartition(n * 4, "id")
    assert spread(wide, "id") is wide
    # explicit num_partitions always honored
    assert spread(wide, "id", num_partitions=2).rdd.getNumPartitions() == 2


def test_nb_classify_learns_and_handles_edges(spark):
    """Multinomial NB: learns separable classes, priors decide
    token-less docs (tie -> lexicographically smallest label), unseen
    tokens hit the smoothed per-class floor, margin is top-minus-second."""
    from blackroad_feature_store_spark.operators.corpus import nb_classify

    train = spark.createDataFrame(
        [
            (1, "cats purr and meow softly", "animal"),
            (2, "dogs bark and wag tails", "animal"),
            (3, "stocks rose and markets rallied", "finance"),
            (4, "bonds yields fell on rate news", "finance"),
        ],
        "doc_id long, text string, label string",
    )
    score = spark.createDataFrame(
        [
            (10, "the cat will meow"),
            (11, "markets and bonds news"),
            (12, ""),
            (13, "zzz qqq unseen words here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in nb_classify(train, score).collect()}
    assert got[10]["pred_label"] == "animal"
    assert got[11]["pred_label"] == "finance"
    # token-less: equal priors, tie -> smallest label; margin exactly 0
    assert got[12]["pred_label"] == "animal"
    assert got[12]["margin"] == 0.0
    assert got[12]["n_tokens"] == 0
    # all-unseen: scored by the class floors, still a deterministic pick
    assert got[13]["n_tokens"] == 5
    assert got[13]["margin"] >= 0.0
    for r in got.values():
        assert r["margin"] is None or r["margin"] >= 0.0


def test_nb_classify_partition_order_invariant(spark):
    """The 4dp-quantize-then-DECIMAL-accumulate design means partition
    count / aggregation order cannot move any score: 1-partition and
    many-partition runs must emit IDENTICAL rows (a raw double sum
    would differ in the last ulp and could flip an argmax)."""
    import random

    from blackroad_feature_store_spark.operators.corpus import nb_classify

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(50)]
    rows = [
        (
            i,
            " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))),
            rng.choice(["a", "b", "c"]),
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    one = df.coalesce(1)
    many = df.repartition(16, "doc_id")
    r1 = sorted(
        map(tuple, nb_classify(one, one.drop("label")).collect())
    )
    rn = sorted(
        map(tuple, nb_classify(many, many.drop("label")).collect())
    )
    assert r1 == rn


def test_winnow_fingerprints_and_pairs(spark):
    """Winnowing fingerprints (dedup.py::winnow_fingerprints/
    winnow_pairs): matches an independent pure-Python model
    hash-for-hash, honors the coverage guarantee (docs sharing a
    substring >= k+window-1 chars share a fingerprint), drops
    too-short docs, and the pair generator applies min_shared and the
    stop-fingerprint cap."""
    import hashlib

    from blackroad_feature_store_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    k, w = 4, 3
    shared = "the common phrase lives here"

    def model(text):
        s = " ".join(text.lower().split())
        hs = [
            int(hashlib.md5(s[i:i + k].encode()).hexdigest()[:14], 16)
            for i in range(len(s) - k + 1)
        ]
        return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}

    rows = [
        (1, f"Alpha doc:   {shared} and more alpha text"),
        (2, f"totally different beta {shared} trailing"),
        (3, "unrelated gamma content with no overlap at all"),
        (4, "xy"),  # shorter than k: no grams, no fingerprints
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=k, window=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for doc_id, text in rows:
        expect = model(text) if len(" ".join(text.lower().split())) >= k + w - 1 else set()
        assert got.get(doc_id, set()) == expect, doc_id
    assert 4 not in got
    # coverage guarantee: 1 and 2 share a >= k+w-1 substring
    assert got[1] & got[2]

    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_pairs(df, k=k, window=w, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)] == len(got[1] & got[2])
    # min_shared filters weak overlaps
    strong = winnow_pairs(df, k=k, window=w, min_shared=10**6).count()
    assert strong == 0
    # a max_bucket of 1 retires every shared fingerprint -> no pairs
    assert winnow_pairs(df, k=k, window=w, min_shared=1, max_bucket=1).count() == 0

    import pytest as _pytest
    with _pytest.raises(ValueError, match=">= 1"):
        winnow_fingerprints(df, k=0)


def test_decontaminate_winnow_catches_sub_shingle_overlap(spark):
    """decontaminate_winnow flags verbatim character overlap the word
    5-gram pass cannot see (overlap shorter than 5 tokens), leaves
    clean docs alone, and min_shared raises the evidence bar."""
    from blackroad_feature_store_spark.operators.corpus import (
        decontaminate,
        decontaminate_winnow,
    )

    bench = spark.createDataFrame(
        [(100, "the secret eval passphrase zx9q27 ends here")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # 4-token verbatim overlap: invisible to 5-gram shingles,
            # >> k+window-1 = 11 chars of shared substring
            (1, "prefix words then secret eval passphrase zx9q27 tail"),
            (2, "completely unrelated training document body"),
        ],
        "doc_id long, text string",
    )
    shingle = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(train, bench, n=5, id_col="doc_id").collect()
    }
    winnow = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_winnow(
            train, bench, id_col="doc_id", k=8, window=4
        ).collect()
    }
    assert shingle == {1: False, 2: False}  # 5-gram pass misses it
    assert winnow == {1: True, 2: False}    # char-level catches it

    # an absurd evidence bar flags nothing
    strict = decontaminate_winnow(
        train, bench, id_col="doc_id", min_shared=10**6
    )
    assert all(not r["contaminated"] for r in strict.collect())

    import pytest as _pytest
    with _pytest.raises(ValueError, match="id_col"):
        decontaminate_winnow(train, bench, id_col="nope")


def test_nb_classify_char_mode(spark):
    """``token_mode='char3'`` — the language-ID feature extractor:
    overlapping character trigrams of the normalized text. Pins (a)
    real discriminative behavior on languages that actually differ in
    orthography, (b) the short-text guard (len < n must yield zero
    grams, not a descending-sequence artifact), (c) n_tokens = the
    trigram count len-2, (d) mode validation."""
    import pytest

    from blackroad_feature_store_spark.operators.corpus import nb_classify

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "she sells sea shells by the sea shore", "en"),
            (3, "le renard brun rapide saute par dessus le chien", "fr"),
            (4, "elle vend des coquillages au bord de la mer", "fr"),
        ],
        "doc_id long, text string, label string",
    )
    score = spark.createDataFrame(
        [
            (10, "the shore was quick and lazy"),
            (11, "le bord de la mer est rapide"),
            (12, "ab"),        # shorter than the gram: priors decide
            (13, "Hello."),    # normalizes to 'hello' -> 3 trigrams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in nb_classify(train, score, token_mode="char3").collect()
    }
    assert got[10]["pred_label"] == "en"
    assert got[11]["pred_label"] == "fr"
    assert got[12]["n_tokens"] == 0 and got[12]["margin"] == 0.0
    assert got[13]["n_tokens"] == 3  # hel, ell, llo

    with pytest.raises(ValueError, match="token_mode"):
        nb_classify(train, score, token_mode="bigram")
    with pytest.raises(ValueError, match=">= 1"):
        nb_classify(train, score, token_mode="char0")


def test_nb_classify_self_matches_two_frame_form(spark):
    """`nb_classify_self` (VERDICT r10 item 3 — the shared-gram-scan
    form for train ⊆ score) must score IDENTICALLY to
    `nb_classify(docs.where(pred), docs)` in both token modes,
    including token-less docs (priors decide) and docs outside the
    training slice; train == score (lit(True) predicate) covers the
    nb_source_classify shape."""
    from blackroad_feature_store_spark.operators.corpus import (
        nb_classify,
        nb_classify_self,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog", "en"),
            (2, "she sells sea shells by the sea shore", "en"),
            (3, "le renard brun saute par dessus le chien", "fr"),
            (4, "elle vend des coquillages au bord de la mer", "fr"),
            (5, "the shore was quick and lazy today", "en"),
            (6, "le bord de la mer est tres rapide", "fr"),
            (7, "??", "en"),  # token-less after normalization
        ],
        "doc_id long, text string, label string",
    )
    pred = F.col("doc_id") <= 4
    for mode in ("word", "char3"):
        want = sorted(
            map(
                tuple,
                nb_classify(
                    docs.where(pred),
                    docs.select("doc_id", "text"),
                    token_mode=mode,
                ).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                nb_classify_self(docs, pred, token_mode=mode).collect(),
            )
        )
        assert got == want, f"mode={mode}"
    # train == score via an always-true predicate
    want = sorted(
        map(
            tuple,
            nb_classify(docs, docs.select("doc_id", "text")).collect(),
        )
    )
    got = sorted(
        map(tuple, nb_classify_self(docs, F.lit(True)).collect())
    )
    assert got == want


def test_split_sentences_segmentation(spark):
    from blackroad_feature_store_spark.operators.corpus import split_sentences

    df = spark.createDataFrame(
        [
            (1, "One two. Three four! Five?? Six"),
            (2, "no terminators at all"),
            (3, "... leading dots. then text"),
            (4, "a. . b"),  # middle entry trims to empty -> filtered
        ],
        "doc_id long, text string",
    )
    rows = split_sentences(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["sentence_id"], r["sentence"])
        )
    assert by_doc[1] == [
        (0, "One two."),
        (1, "Three four!"),
        (2, "Five??"),  # terminator RUN stays with its sentence
        (3, "Six"),  # trailing fragment without terminator
    ]
    assert by_doc[2] == [(0, "no terminators at all")]
    # leading terminators are skipped by the matcher, ids still 0-based
    assert by_doc[3][0][1].endswith("leading dots.")
    # "a." then the lone "." run attaches to " ." -> trims to "."? No:
    # "a." matches alt1; " ." -> [^.!?]+ matches " ", then [.!?]+ "."
    # -> " ." trims to "."; " b" is the tail fragment.
    sents4 = [s for _, s in by_doc[4]]
    assert sents4[0] == "a." and sents4[-1] == "b"
    # ids are monotone per doc even when entries were filtered
    for doc, lst in by_doc.items():
        ids = [i for i, _ in lst]
        assert ids == sorted(ids)


def test_sentence_chunks_never_splits_and_packs_greedily(spark):
    import hashlib as _h

    from blackroad_feature_store_spark.operators.corpus import sentence_chunks

    # sentences of 3 tokens each; budget 5 -> sentence at prefix 3
    # straddles the boundary and spills WHOLE into chunk 0
    text = "a b c. d e f. g h i. j k l."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {
        r["chunk_id"]: r for r in sentence_chunks(df, max_tokens=5).collect()
    }
    # prefixes 0,3,6,9 -> chunks 0,0,1,1
    assert rows[0]["n_sentences"] == 2 and rows[0]["chunk_tokens"] == 6
    assert rows[1]["n_sentences"] == 2 and rows[1]["chunk_tokens"] == 6
    assert rows[0]["chunk_md5"] == _h.md5(b"a b c. d e f.").hexdigest()
    assert rows[1]["chunk_md5"] == _h.md5(b"g h i. j k l.").hexdigest()

    # a doc with no terminators is one sentence -> one chunk however
    # long; a chunk is never smaller than a sentence
    long_doc = " ".join(f"w{i}" for i in range(40))
    df2 = spark.createDataFrame([(2, long_doc)], "doc_id long, text string")
    out2 = sentence_chunks(df2, max_tokens=5).collect()
    assert len(out2) == 1 and out2[0]["chunk_tokens"] == 40


def test_sentence_dedup_drops_boilerplate_everywhere(spark):
    from blackroad_feature_store_spark.operators.corpus import sentence_dedup

    banner = "We use cookies."
    df = spark.createDataFrame(
        [
            (1, f"{banner} Real content one. More content one."),
            (2, f"{banner} Unique text two."),
            (3, banner),  # all-boilerplate doc vanishes
            (4, "Standalone document. Standalone document."),  # intra-doc
            (5, "Nothing shared here at all."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in sentence_dedup(df, min_docs=2).collect()}
    # ALL copies of the banner are dropped (not keep-first)
    assert out[1]["text"] == "Real content one. More content one."
    assert out[1]["kept_sentences"] == 2
    assert out[1]["dropped_sentences"] == 1
    assert out[2]["text"] == "Unique text two."
    # doc 3 had only boilerplate -> absent from the output
    assert 3 not in out
    # repetition INSIDE one doc is content, not boilerplate
    # (distinct-doc count, not occurrence count)
    assert out[4]["text"] == "Standalone document. Standalone document."
    assert out[4]["dropped_sentences"] == 0
    assert out[5]["kept_sentences"] == 1
    # threshold respected: min_docs=3 keeps the banner (only 3 docs
    # share it at min_docs=2... raise to 4 so the 3-doc banner stays)
    out4 = {
        r["doc_id"]: r for r in sentence_dedup(df, min_docs=4).collect()
    }
    assert out4[1]["dropped_sentences"] == 0
    assert banner in out4[1]["text"]


def test_sentence_windows_overlap_and_tail(spark):
    import hashlib as _h

    from blackroad_feature_store_spark.operators.corpus import (
        sentence_windows,
    )

    # 5 sentences, window=3 stride=2 -> windows [0,1,2], [2,3,4], [4]
    text = "s zero. s one. s two. s three. s four."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {
        r["window_id"]: r
        for r in sentence_windows(
            df, window_sentences=3, stride=2
        ).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert rows[0]["n_sentences"] == 3 and rows[1]["n_sentences"] == 3
    assert rows[2]["n_sentences"] == 1  # short tail window
    assert rows[0]["window_md5"] == _h.md5(
        b"s zero. s one. s two."
    ).hexdigest()
    assert rows[1]["window_md5"] == _h.md5(
        b"s two. s three. s four."
    ).hexdigest()  # overlap: "s two." in both windows 0 and 1
    assert rows[2]["window_md5"] == _h.md5(b"s four.").hexdigest()
    assert rows[0]["window_tokens"] == 6  # 3 sentences x 2 tokens

    # stride > window: gaps are allowed, no descending-sequence blowup
    gap = {
        r["window_id"]: r["window_md5"]
        for r in sentence_windows(
            df, window_sentences=1, stride=2
        ).collect()
    }
    assert set(gap) == {0, 1, 2}  # sentences 0, 2, 4 only
    assert gap[1] == _h.md5(b"s two.").hexdigest()

    with pytest.raises(ValueError, match="stride"):
        sentence_windows(df, stride=0).collect()


def test_check_expectations_all_kinds(spark):
    from blackroad_feature_store_spark.operators.expectations import (
        check_expectations,
    )

    df = spark.createDataFrame(
        [
            (1, 10.0, "ok", "A"),
            (2, -5.0, "ok", "B"),      # in_range violation
            (2, 200.0, "bad!", "A"),   # dup id, regex violation, >max
            (None, 50.0, "ok", "Z"),   # null id, accepted_values viol
            (4, None, None, "A"),      # NULLs pass range/regex checks
        ],
        "id long, v double, s string, cat string",
    )
    ref = spark.createDataFrame([(1,), (4,)], "rid long")
    out = {
        (r["check"], r["target"]): r
        for r in check_expectations(
            df,
            [
                {"check": "not_null", "col": "id"},
                {"check": "in_range", "col": "v", "min": 0.0,
                 "max": 100.0},
                {"check": "regex", "col": "s", "pattern": "^[a-z]+$"},
                {"check": "accepted_values", "col": "cat",
                 "values": ["A", "B"]},
                {"check": "unique", "cols": ["id"]},
                {"check": "foreign_key", "col": "id", "ref": ref,
                 "ref_col": "rid"},
            ],
        ).collect()
    }
    assert out[("not_null", "id")]["violations"] == 1
    assert not out[("not_null", "id")]["passed"]
    # -5 below min, 200 above max; NULL v does not violate
    assert out[("in_range", "v")]["violations"] == 2
    assert out[("regex", "s")]["violations"] == 1  # "bad!"; NULL passes
    assert out[("accepted_values", "cat")]["violations"] == 1  # "Z"
    # id=2 appears twice -> 1 duplicate row beyond the first
    assert out[("unique", "id")]["violations"] == 1
    assert out[("unique", "id")]["total"] == 5
    # non-null ids {1,2,2}: the two id=2 rows are orphans vs ref {1,4}
    assert out[("foreign_key", "id")]["violations"] == 2
    assert out[("foreign_key", "id")]["total"] == 5
    assert all(r["total"] == 5 for r in out.values())

    # a fully passing suite
    ok = check_expectations(
        df, [{"check": "in_range", "col": "v", "min": -10.0,
              "max": 1000.0}]
    ).collect()
    assert ok[0]["passed"] and ok[0]["violations"] == 0

    with pytest.raises(ValueError, match="Unknown check"):
        check_expectations(df, [{"check": "sorted", "col": "id"}])
    with pytest.raises(ValueError, match="no checks"):
        check_expectations(df, [])


def test_check_expectations_empty_input(spark):
    """The ``violations == 0 ⇔ passed`` contract must hold on an
    EMPTY input: every check kind reports total=0, violations=0,
    passed=true — never NULL (SUM over zero rows is NULL; a gate
    filtering WHERE NOT passed would silently treat a NULL-passed
    empty drop as clean). ADVICE r9 item 2."""
    from blackroad_feature_store_spark.operators.expectations import (
        check_expectations,
    )

    df = spark.createDataFrame([], "id long, v double, s string")
    ref = spark.createDataFrame([(1,)], "rid long")
    rows = check_expectations(
        df,
        [
            {"check": "not_null", "col": "id"},
            {"check": "in_range", "col": "v", "min": 0.0, "max": 1.0},
            {"check": "regex", "col": "s", "pattern": "^x$"},
            {"check": "accepted_values", "col": "s", "values": ["x"]},
            {"check": "unique", "cols": ["id", "s"]},
            {"check": "foreign_key", "col": "id", "ref": ref,
             "ref_col": "rid"},
        ],
    ).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["total"] == 0, r
        assert r["violations"] == 0, r
        assert r["passed"] is True, r


def test_check_expectations_single_scan_for_row_local(spark):
    """All row-local checks must fold into ONE aggregation over ONE
    scan — the plan contains exactly one read of the input."""
    from blackroad_feature_store_spark.operators.expectations import (
        check_expectations,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("m")
    )
    plan = (
        check_expectations(
            df,
            [
                {"check": "not_null", "col": "id"},
                {"check": "in_range", "col": "m", "min": 0, "max": 8},
                {"check": "not_null", "col": "m"},
                {"check": "in_range", "col": "id", "min": 0},
            ],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Range (0, 100") == 1


def test_hard_negatives_excludes_positives_before_ranking(spark):
    from blackroad_feature_store_spark.operators.similarity import (
        hard_negatives,
    )

    # q(label A). Closest vector is a SAME-label near-dup (excluded);
    # next two are different labels; one NULL label is a negative too.
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "A"),     # the query itself
            (2, [0.99, 0.1], "A"),    # positive: must not appear
            (3, [0.9, 0.2], "B"),
            (4, [0.5, 0.5], "C"),
            (5, [0.0, 1.0], None),    # NULL label -> negative for A
        ],
        "vec_id long, embedding array<double>, label string",
    )
    q = corpus.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    rows = hard_negatives(corpus, q, k=3, query_id_col="query_id").collect()
    ids = [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ids == [3, 4, 5]  # positive id=2 excluded despite top score
    assert all(r["query_id"] == 1 for r in rows)

    # NULL-labeled query: NULL forms its own class -> id=5 is its
    # positive (excluded), everything else a negative
    qn = corpus.where(F.col("vec_id") == 5).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    idsn = {
        r["neighbor_id"]
        for r in hard_negatives(corpus, qn, k=10,
                                query_id_col="query_id").collect()
    }
    assert idsn == {1, 2, 3, 4}


def test_check_expectations_randomized_vs_python(spark):
    """Randomized workloads vs a Python reference: violation counts
    for every check kind on frames with NULLs, duplicates, and orphan
    keys."""
    import random
    import re as _re

    from blackroad_feature_store_spark.operators.expectations import (
        check_expectations,
    )

    for seed in (3, 11, 29):
        rng = random.Random(seed)
        rows = [
            (
                rng.choice([None, rng.randrange(6)]),
                rng.choice([None, rng.uniform(-10, 10)]),
                rng.choice([None, "ok", "Bad!", "x1"]),
            )
            for _ in range(rng.randrange(1, 60))
        ]
        ref_keys = [(k,) for k in range(0, 6, 2)]
        df = spark.createDataFrame(rows, "id long, v double, s string")
        ref = spark.createDataFrame(ref_keys, "rid long")
        checks = [
            {"check": "not_null", "col": "id"},
            {"check": "in_range", "col": "v", "min": -5.0, "max": 5.0},
            {"check": "regex", "col": "s", "pattern": "^[a-z]+$"},
            {"check": "accepted_values", "col": "s", "values": ["ok"]},
            {"check": "unique", "cols": ["id"]},
            {"check": "foreign_key", "col": "id", "ref": ref,
             "ref_col": "rid"},
        ]
        got = {
            (r["check"], r["target"]): (r["total"], r["violations"])
            for r in check_expectations(df, checks).collect()
        }
        n = len(rows)
        want = {
            ("not_null", "id"): (
                n, sum(1 for r in rows if r[0] is None)
            ),
            ("in_range", "v"): (
                n,
                sum(
                    1 for r in rows
                    if r[1] is not None and not (-5.0 <= r[1] <= 5.0)
                ),
            ),
            ("regex", "s"): (
                n,
                sum(
                    1 for r in rows
                    if r[2] is not None
                    and not _re.search("^[a-z]+$", r[2])
                ),
            ),
            ("accepted_values", "s"): (
                n,
                sum(1 for r in rows if r[2] is not None and r[2] != "ok"),
            ),
            ("unique", "id"): (
                n,
                n - len({r[0] for r in rows}),
            ),
            ("foreign_key", "id"): (
                n,
                sum(
                    1 for r in rows
                    if r[0] is not None
                    and r[0] not in {k for (k,) in ref_keys}
                ),
            ),
        }
        assert got == want, f"seed={seed}: {got} != {want}"


def test_normalize_text_nfc_controls_and_whitespace(spark):
    from blackroad_feature_store_spark.operators.text import normalize_text

    decomposed = "é"  # e + combining acute -> é under NFC
    df = spark.createDataFrame(
        [
            (1, f"caf{decomposed}  du\x07jour\t x "),
            (2, "already clean"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert out[1]["text"] == "café du jour x"
    # 18 codepoints in, 14 out (combining mark composed, ctrl +
    # double/trailing whitespace removed)
    assert out[1]["chars_delta"] == 4
    assert out[2]["text"] == "already clean"
    assert out[2]["chars_delta"] == 0
    assert out[3]["text"] is None and out[3]["chars_delta"] is None

    # NFKC folds compatibility forms (fullwidth digits -> ASCII)
    df2 = spark.createDataFrame([(1, "１２３")],
                                "doc_id long, text string")
    from blackroad_feature_store_spark.operators.text import (
        normalize_text as nt,
    )
    assert nt(df2, form="NFKC").collect()[0]["text"] == "123"
    with pytest.raises(ValueError, match="normalization form"):
        nt(df2, form="NFX")


def test_cms_sketch_estimate_and_merge(spark):
    from blackroad_feature_store_spark.operators.stats import (
        cms_estimate,
        cms_merge,
        cms_sketch,
    )

    rows = [("a",)] * 50 + [("b",)] * 7 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    sk = cms_sketch(df, "k", depth=4, width=64)
    # sketch size is bounded by depth x width regardless of input
    assert sk.count() <= 4 * 64
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)],
                                 "k string")
    est = {r["k"]: r["cms_count"]
           for r in cms_estimate(sk, keys, "k", 4, 64).collect()}
    # overestimate-only, and with 3 keys in width 64 almost surely exact
    assert est["a"] >= 50 and est["b"] >= 7 and est["c"] >= 1
    assert est["a"] == 50 and est["b"] == 7  # no collisions at this load
    assert est["zz"] >= 0  # unseen key: min cell may be 0 or a collision

    # merge == build-on-union (the monoid contract)
    half1 = spark.createDataFrame(rows[:30], "k string")
    half2 = spark.createDataFrame(rows[30:], "k string")
    merged = cms_merge(cms_sketch(half1, "k", 4, 64),
                       cms_sketch(half2, "k", 4, 64))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, sk.collect())
    )

    # NULL keys excluded; weighted build counts weights
    dfw = spark.createDataFrame([("a", 5), (None, 9), ("b", 2)],
                                "k string, w int")
    skw = cms_sketch(dfw, "k", 4, 64, weight_col="w")
    estw = {r["k"]: r["cms_count"]
            for r in cms_estimate(skw, keys, "k", 4, 64).collect()}
    assert estw["a"] == 5 and estw["b"] == 2

    with pytest.raises(ValueError, match="depth and width"):
        cms_sketch(df, "k", depth=0)


def test_histogram_quantiles_known_distribution(spark):
    from blackroad_feature_store_spark.operators.stats import (
        histogram_quantiles,
    )

    # 100 items uniform over [0, 100) in 10 bins of width 10: bin i
    # holds exactly 10 items -> quantile p lands at ~100p by rank
    # interpolation
    hist = spark.createDataFrame(
        [("u", b, 10) for b in range(10)], "k string, bin int, n long"
    )
    q = {
        r["prob"]: r["approx_value"]
        for r in histogram_quantiles(
            hist, ["k"], [0.25, 0.5, 0.99, 1.0], 0.0, 100.0, 10
        ).collect()
    }
    # rank 25 -> bin 2, (25-20)/10 inside -> 25.0; rank 50 -> 50.0
    assert q[0.25] == 25.0 and q[0.5] == 50.0
    assert q[0.99] == 99.0 and q[1.0] == 100.0

    # skewed mass + missing bins: 90 items in bin 0, 10 in bin 9
    skew = spark.createDataFrame(
        [("s", 0, 90), ("s", 9, 10)], "k string, bin int, n long"
    )
    qs = {
        r["prob"]: r["approx_value"]
        for r in histogram_quantiles(
            skew, ["k"], [0.5, 0.95], 0.0, 100.0, 10
        ).collect()
    }
    # rank 50 inside bin 0 -> 10*(50/90); rank 95 -> bin 9, (95-90)/10
    assert abs(qs[0.5] - 10.0 * 50 / 90) < 1e-6
    assert abs(qs[0.95] - (90.0 + 10.0 * 5 / 10)) < 1e-6

    # zero-mass key emits nothing; bad prob raises
    empty = spark.createDataFrame([("z", 0, 0)], "k string, bin int, n long")
    assert histogram_quantiles(empty, ["k"], [0.5], 0.0, 1.0, 1).count() == 0
    with pytest.raises(ValueError, match="probs"):
        histogram_quantiles(hist, ["k"], [0.0], 0.0, 1.0, 10)


def test_bpe_train_driver_byte_guard_raises(spark):
    """VERDICT r13 ask #8 pin: the merge loop is O(rows x avg word
    length) on the driver, so bpe_train bounds the dictionary's STRING
    mass (max_driver_bytes), not just its row count — a corpus of
    pathological long 'words' raises loudly instead of swamping the
    driver; a natural dictionary under the bound trains unchanged."""
    import pytest as _pytest

    from blackroad_feature_store_spark.operators.bpe import bpe_train

    # suffix must survive word_counts' [^a-z]+ filter, so letters
    blob = " ".join(
        "x" * 200 + chr(ord("a") + i) + chr(ord("a") + j)
        for i in range(5)
        for j in range(4)
    )
    df = spark.createDataFrame([(1, blob)], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="max_driver_bytes"):
        bpe_train(df, num_merges=2, min_freq=1, max_driver_bytes=1000)
    # same corpus, explicit wider bound: trains
    assert bpe_train(
        df, num_merges=2, min_freq=1, max_driver_bytes=10**6
    )


def test_bpe_driver_byte_guard_counts_bytes_not_chars(
    spark, monkeypatch
):
    """ADVICE r14 low pin: max_driver_bytes must bound BYTES
    (octet_length), not characters — a multi-byte UTF-8 dictionary
    packs up to 4 bytes/char, so a char-count guard under-protects
    the driver by up to 4x. word_counts strips to [a-z], so the only
    way multi-byte words reach the guard today is a future tokenizer
    widening — this pin injects such a dictionary directly and fails
    if the guard regresses to character counting."""
    import pytest as _pytest

    from blackroad_feature_store_spark.operators import bpe as _bpe

    # one word: 100 chars, 200 UTF-8 bytes ("ü" is 2 bytes)
    wide = spark.createDataFrame(
        [("ü" * 100, 2)], ["word", "freq"]
    )
    monkeypatch.setattr(_bpe, "word_counts", lambda df, text_col: wide)
    df = spark.createDataFrame([(1, "ignored")], ["doc_id", "text"])
    # bound sits between the char count (100) and the byte count
    # (200): a char guard would pass silently, the byte guard raises
    with _pytest.raises(ValueError, match="max_driver_bytes"):
        _bpe.bpe_train(
            df, num_merges=1, min_freq=1, max_driver_bytes=150
        )
    # and the same dictionary trains under an honest byte budget
    assert _bpe.bpe_train(
        df, num_merges=1, min_freq=1, max_driver_bytes=250
    )


def test_cosine_topk_auto_matches_measured_crossover():
    """VERDICT r13 ask #6 pin: `cosine_topk_auto`'s exact-strategy
    pick must match the measured sf-crossover table committed at
    CROSSOVER_TOPK.json (tools/measure_topk_crossover.py). The auto
    path always picks GEMM for in-contract |Q| (its docstring's
    measured claim); this pin fails if a future re-measure crowns a
    different exact winner at any (sf, |Q|) point without the policy
    being updated."""
    import json as _json

    path = os.path.join(
        os.path.dirname(__file__), "..", "CROSSOVER_TOPK.json"
    )
    table = _json.load(open(path))
    assert len(table["points"]) >= 6, "crossover table incomplete"
    for point in table["points"]:
        # at every measured (sf, |Q|) the GEMM pick either wins
        # outright or sits inside the 15% scheduler-noise tie band
        assert point["gemm_pick_ok"], (
            f"measured crossover at {point['sf']}/"
            f"|Q|={point['n_queries']} contradicts the gemm pick "
            f"({point['seconds']}) — update cosine_topk_auto's "
            "policy or re-measure on a quiet host"
        )
        # where the strategies genuinely diverge (wide |Q|), GEMM
        # must win outright — this is the measured basis for never
        # offering the crossJoin form as the speed pick
        if point["n_queries"] >= 512:
            assert point["exact_winner"] == "gemm"
