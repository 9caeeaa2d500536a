"""Hypothesis fuzz of MinHash/LSH oracle parity (VERDICT r8 next-round
#8): for random corpora and random (num_bands, rows_per_band,
shingle_size, max_bucket) parameters, the Spark engine's candidate
pair set must equal a DuckDB oracle built from the SAME public
construction — word shingles with whole-text fallback, one md5 per
shingle split into two 56-bit halves, Kirsch–Mitzenmacher double
hashing g_j = (h1 + j*h2) mod 2^56, r-row band signatures, bucket
self-join with an optional bucket-size cap.

The catalog's `dedup_minhash_pairs` oracle pins ONE parameter point
(bands=8, r=2, n=3, no cap) on one corpus; this fuzzer pins the whole
parameter surface, the classic places a rewrite silently diverges:
the short-text fallback boundary (len(toks) vs shingle size), the
band→hash-index mapping (b*r+i), signature concatenation order, the
cap's filter-before-join placement, and duplicate shingles (a set
semantics bug would double-count minima — both engines must treat the
shingle MULTISET identically, which min() does for free).

The oracle SQL here is generated parametrically but is textually the
same construction as `driver_queries._SQL_MINHASH_PAIRS` — a second,
independent spelling would weaken the pin, not strengthen it; what
varies (and what the catalog can't cover) is the parameter surface
and the adversarial corpora hypothesis shrinks to.
"""

import duckdb
import pandas as pd

from blackroad_feature_store_spark.operators.dedup import (
    minhash_candidate_pairs,
)

MOD = 1 << 56  # 72057594037927936


def _oracle_sql(num_bands: int, rows_per_band: int, n: int,
                max_bucket: int | None) -> str:
    """Parametric DuckDB statement over a registered `docs` view."""
    sig = " || '|' || ".join(
        f"CAST(min((h1 + (band * {rows_per_band} + {i}) * h2)"
        f" % {MOD}) AS VARCHAR)"
        for i in range(rows_per_band)
    )
    if max_bucket is not None:
        kept = (
            "kept AS (SELECT bands.* FROM bands JOIN"
            " (SELECT band, sig FROM bands GROUP BY band, sig"
            f"  HAVING count(*) <= {max_bucket}) ok USING (band, sig))"
        )
        src = "kept"
    else:
        kept = "kept AS (SELECT * FROM bands)"
        src = "kept"
    return rf"""
    WITH toks AS (SELECT doc_id,
                         regexp_split_to_array(trim(text), '\s+') AS t
                  FROM docs),
    sh AS (SELECT doc_id,
                  unnest(CASE WHEN len(t) < {n}
                         THEN [array_to_string(t, ' ')]
                         ELSE list_transform(
                                generate_series(1, len(t) - {n - 1}),
                                i -> array_to_string(t[i:i+{n - 1}], ' '))
                         END) AS shingle
           FROM toks),
    hs AS (SELECT doc_id,
                  CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS h1,
                  CAST('0x' || substr(md5(shingle), 15, 14) AS BIGINT) AS h2
           FROM sh),
    bands AS (SELECT doc_id, band, {sig} AS sig
              FROM hs CROSS JOIN
                   (SELECT unnest(generate_series(0, {num_bands - 1}))
                           AS band)
              GROUP BY doc_id, band),
    {kept},
    pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM {src} a JOIN {src} b
                ON a.band = b.band AND a.sig = b.sig
               AND a.doc_id < b.doc_id)
    SELECT id_a, id_b FROM pairs
    """


def _oracle_pairs(corpus, num_bands, rows_per_band, n, max_bucket):
    con = duckdb.connect()
    try:
        docs = pd.DataFrame(corpus, columns=["doc_id", "text"])
        con.register("docs", docs)
        return set(
            map(
                tuple,
                con.execute(
                    _oracle_sql(num_bands, rows_per_band, n, max_bucket)
                ).fetchall(),
            )
        )
    finally:
        con.close()


def _spark_pairs(spark, corpus, num_bands, rows_per_band, n, max_bucket):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    return set(
        map(
            tuple,
            minhash_candidate_pairs(
                df,
                num_bands=num_bands,
                shingle_size=n,
                rows_per_band=rows_per_band,
                max_bucket=max_bucket,
            ).collect(),
        )
    )


# Small vocabulary so random docs actually share shingles (a large
# vocabulary makes every pair set empty and the test vacuous).
_VOCAB = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran"]


def test_minhash_oracle_parity_seeded(spark):
    """Deterministic sweep over the parameter grid on a corpus built
    to hit every semantic edge: exact duplicates, near duplicates,
    short docs below each shingle-size fallback boundary (0..3
    tokens), repeated-shingle docs, and whitespace-only text."""
    base = "the cat sat on a mat while the dog ran on a mat"
    corpus = [
        (1, base),
        (2, base),                       # exact dup
        (3, base + " again"),            # near dup
        (4, "the the the the the"),      # repeated shingles
        (5, ""),                         # empty -> '' shingle
        (6, "   "),                      # whitespace-only
        (7, "cat"),                      # 1 token
        (8, "cat sat"),                  # 2 tokens
        (9, "cat sat on"),               # 3 tokens (== n boundary)
        (10, "dog ran on a mat"),
        (11, "mat a on ran dog"),        # same words, reversed
    ]
    for num_bands, rows_per_band, n, cap in [
        (8, 2, 3, None),    # the catalog's point
        (8, 1, 3, None),    # r=1 (flat S-curve, many more pairs)
        (4, 3, 2, None),
        (2, 2, 1, None),    # unigram shingles
        (1, 4, 3, None),    # single band
        (8, 2, 3, 3),       # tight cap drops the dup bucket
        (8, 2, 4, None),    # n above several doc lengths
    ]:
        got = _spark_pairs(spark, corpus, num_bands, rows_per_band, n, cap)
        want = _oracle_pairs(corpus, num_bands, rows_per_band, n, cap)
        assert got == want, (
            f"bands={num_bands} r={rows_per_band} n={n} cap={cap}: "
            f"spark-only={sorted(got - want)[:5]} "
            f"oracle-only={sorted(want - got)[:5]}"
        )
    # non-vacuity: at least one grid point must produce pairs
    assert _oracle_pairs(corpus, 8, 1, 3, None)


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:

    @st.composite
    def _workload(draw):
        n_docs = draw(st.integers(min_value=2, max_value=14))
        ids = draw(
            st.lists(
                st.integers(min_value=0, max_value=50),
                min_size=n_docs, max_size=n_docs, unique=True,
            )
        )
        corpus = []
        for i in ids:
            words = draw(
                st.lists(
                    st.sampled_from(_VOCAB),
                    min_size=0, max_size=10,
                )
            )
            corpus.append((i, " ".join(words)))
        num_bands = draw(st.sampled_from([1, 2, 4, 8]))
        rows_per_band = draw(st.integers(min_value=1, max_value=3))
        shingle = draw(st.integers(min_value=1, max_value=4))
        cap = draw(st.sampled_from([None, 2, 5]))
        return corpus, num_bands, rows_per_band, shingle, cap

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_workload())
    def test_minhash_oracle_parity_hypothesis(spark, case):
        """Shrinking fuzz over the same invariant as the seeded sweep:
        Spark pair set == DuckDB pair set for arbitrary corpora and
        (bands, rows, shingle, cap) — including empty docs, all-dup
        corpora, and caps small enough to drop every bucket."""
        corpus, num_bands, rows_per_band, n, cap = case
        got = _spark_pairs(spark, corpus, num_bands, rows_per_band, n, cap)
        want = _oracle_pairs(corpus, num_bands, rows_per_band, n, cap)
        assert got == want, (
            f"bands={num_bands} r={rows_per_band} n={n} cap={cap}: "
            f"spark-only={sorted(got - want)[:5]} "
            f"oracle-only={sorted(want - got)[:5]}"
        )
