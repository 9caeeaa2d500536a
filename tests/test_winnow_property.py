"""Hypothesis fuzz of the winnowing family (dedup.py::
winnow_fingerprints / winnow_pairs) against a pure-Python reference
implementing the same public contract: lowercase + whitespace-collapse
normalization, md5-56bit character k-gram hashes, sliding-window
minima, per-document distinct fingerprints, stop-fingerprint cap, and
min_shared pair filtering.

Shrinking fuzz targets the boundary classes the seeded test can miss:
texts exactly k, k+window-2, and k+window-1 characters long after
normalization (zero grams / grams-but-no-window / exactly one
window), whitespace-only texts, duplicate documents (every
fingerprint shared), and caps that retire everything. The winnowing
COVERAGE guarantee — documents sharing a normalized substring of
length >= k + window - 1 share a fingerprint — is asserted explicitly
on every generated pair that has one.
"""

import hashlib
import re

from blackroad_feature_store_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_pairs,
)

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


def _py_fps(text, k, window):
    s = re.sub(r"\s+", " ", text.lower()).strip(" ")
    hs = [
        int(hashlib.md5(s[i:i + k].encode()).hexdigest()[:14], 16)
        for i in range(len(s) - k + 1)
    ]
    return {
        min(hs[j:j + window]) for j in range(len(hs) - window + 1)
    }


def _py_pairs(docs, k, window, min_shared, max_bucket):
    fps = {d: _py_fps(t, k, window) for d, t in docs}
    owners = {}
    for d, s in fps.items():
        for f in s:
            owners.setdefault(f, []).append(d)
    shared = {}
    for f, ds in owners.items():
        if max_bucket is not None and len(ds) > max_bucket:
            continue
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                shared[(a, b)] = shared.get((a, b), 0) + 1
    return {p: n for p, n in shared.items() if n >= min_shared}


if _HAVE_HYPOTHESIS:

    # shared phrases seed guaranteed overlaps; junk pieces and
    # whitespace runs exercise normalization and short-text edges
    _PIECE = st.sampled_from(
        ["the cat sat", "deadbeef", "xyz", " ", "  ", "q", "longword",
         "THE CAT SAT", "\tmixed  WS\n"]
    )

    @st.composite
    def _case(draw):
        n = draw(st.integers(min_value=1, max_value=6))
        docs = []
        for i in range(n):
            text = "".join(draw(st.lists(_PIECE, min_size=0, max_size=6)))
            docs.append((i, text))
        # occasionally duplicate a doc verbatim: all fps shared
        if n >= 2 and draw(st.booleans()):
            docs[-1] = (docs[-1][0], docs[0][1])
        k = draw(st.integers(min_value=2, max_value=6))
        window = draw(st.integers(min_value=1, max_value=5))
        min_shared = draw(st.integers(min_value=1, max_value=3))
        max_bucket = draw(st.sampled_from([None, 1, 3, 50]))
        return docs, k, window, min_shared, max_bucket

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_case())
    def test_winnow_matches_python_reference(spark, case):
        docs, k, window, min_shared, max_bucket = case
        df = spark.createDataFrame(docs, "doc_id long, text string")

        got = {}
        for r in winnow_fingerprints(df, k=k, window=window).collect():
            got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
        for did, text in docs:
            assert got.get(did, set()) == _py_fps(text, k, window), (
                f"fingerprints diverged on doc {did}: {text!r} "
                f"(k={k}, window={window})"
            )

        # coverage guarantee on every pair that shares a long-enough
        # normalized substring (duplicate docs always qualify)
        norm = {
            d: re.sub(r"\s+", " ", t.lower()).strip(" ")
            for d, t in docs
        }
        L = k + window - 1
        for a, ta in norm.items():
            for b, tb in norm.items():
                if a >= b or len(ta) < L:
                    continue
                if any(ta[i:i + L] in tb for i in range(len(ta) - L + 1)):
                    assert got.get(a, set()) & got.get(b, set()), (
                        f"coverage guarantee violated for ({a},{b})"
                    )

        want_pairs = _py_pairs(docs, k, window, min_shared, max_bucket)
        got_pairs = {
            (r["id_a"], r["id_b"]): r["n_shared"]
            for r in winnow_pairs(
                df, k=k, window=window,
                min_shared=min_shared, max_bucket=max_bucket,
            ).collect()
        }
        assert got_pairs == want_pairs


def test_winnow_oracle_norm_edge_whitespace(spark):
    """ADVICE r10 #1 regression: the winnow ORACLES previously trimmed
    BEFORE collapsing whitespace while the Spark side collapses then
    trims — a leading tab yielded ' abc…' in DuckDB vs 'abc…' in
    Spark, shifting every gram hash. The catalog corpus happens to be
    edge-clean, so this pins the fragment on adversarial texts: the
    DuckDB replica of the oracle's norm→hash→window CTE must produce
    the exact fingerprint sets winnow_fingerprints does for docs with
    edge tabs/newlines and interior whitespace runs."""
    import duckdb

    docs = [
        (0, "\tthe quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog\n"),
        (2, "  the   quick\tbrown\nfox jumps over the lazy dog  "),
        (3, "an unrelated document with its own distinct words"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=8, window=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    # docs 0-2 normalize identically -> identical fingerprint sets
    assert got[0] == got[1] == got[2]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, ?)" for d, _ in docs)
        + ") t(doc_id, text)",
        [t for _, t in docs],
    )
    oracle = {}
    for d, f in con.sql(
        r"""
        WITH norm AS (
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
            FROM documents),
        h AS (
            SELECT doc_id,
                   list_transform(range(1, length(s) - 8 + 2),
                       i -> CAST('0x' || substr(md5(substring(
                                s, CAST(i AS INT), 8)), 1, 14) AS BIGINT)
                   ) AS hs
            FROM norm)
        SELECT DISTINCT doc_id,
               list_min(list_slice(hs, CAST(j AS INT),
                                   CAST(j + 4 - 1 AS INT))) AS fingerprint
        FROM h, UNNEST(range(1, len(hs) - 4 + 2)) AS u(j)
        """
    ).fetchall():
        oracle.setdefault(d, set()).add(f)
    assert oracle == got
