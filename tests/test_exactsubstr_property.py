"""Hypothesis fuzz of the ExactSubstr family (operators/exactsubstr.py)
against a pure-Python reference implementing the same public contract:
whitespace-split tokenization (case preserved), a position is
duplicated when its L-token window occurs >= min_count times
corpus-wide (self-repeats count), maximal spans are runs of covered
positions, and the removal keeps the first (doc, start) occurrence of
every duplicated window while protecting keeper-covered positions.

Shrinking fuzz targets the boundary classes the seeded tests can miss:
documents exactly L / L-1 tokens long, duplicated windows meeting at
exactly adjacency distance (merge) vs one past it (split), all-same-
token documents (every window identical — keeper protection inside
one doc), verbatim duplicate docs, and empty/whitespace-only texts.
The two guarantees are asserted on every generated corpus: every
planted >= L-token verbatim repeat is fully covered by some reported
span, and removal output tokens are always a subsequence of the
original."""

from blackroad_feature_store_spark.operators.exactsubstr import (
    exact_substr_index,
    exact_substr_removal,
    exact_substr_spans,
    exact_substr_spans_from_index,
    fold_exact_substr_index,
)

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


def _runs(positions):
    out, run = [], []
    for p in sorted(positions):
        if run and p == run[-1] + 1:
            run.append(p)
        else:
            if run:
                out.append((run[0], run[-1]))
            run = [p]
    if run:
        out.append((run[0], run[-1]))
    return out


def _py_spans(docs, L, min_count=2):
    from collections import Counter

    toks = {i: t.split() for i, t in docs}
    cnt = Counter()
    for t in toks.values():
        for s in range(len(t) - L + 1):
            cnt[tuple(t[s : s + L])] += 1
    out = set()
    for i, t in toks.items():
        cov = set()
        for s in range(len(t) - L + 1):
            if cnt[tuple(t[s : s + L])] >= min_count:
                cov.update(range(s + 1, s + L + 1))
        for a, b in _runs(cov):
            out.add((i, a, b, b - a + 1))
    return out


def _py_removal(docs, L, min_count=2):
    from collections import defaultdict

    toks = {i: t.split() for i, t in docs}
    occ = defaultdict(list)
    for i in sorted(toks):
        t = toks[i]
        for s in range(len(t) - L + 1):
            occ[tuple(t[s : s + L])].append((i, s + 1))
    keep_cov, drop = defaultdict(set), defaultdict(set)
    for locs in occ.values():
        if len(locs) < min_count:
            continue
        ki, ks = min(locs)
        keep_cov[ki].update(range(ks, ks + L))
        for i, s in locs:
            if (i, s) != (ki, ks):
                drop[i].update(range(s, s + L))
    out = {}
    for i, t in toks.items():
        gone = drop[i] - keep_cov[i]
        kept = [w for p, w in enumerate(t, start=1) if p not in gone]
        out[i] = (" ".join(kept), len(t), len(t) - len(kept))
    return out


if _HAVE_HYPOTHESIS:

    # tiny vocab forces dense window collisions; phrases seed planted
    # repeats; whitespace runs exercise tokenization edges
    _PIECE = st.sampled_from(
        ["aa bb cc", "aa aa aa", "xx", "yy zz", "  ", "aa BB cc",
         "planted repeat span here", "q"]
    )

    @st.composite
    def _case(draw):
        n = draw(st.integers(min_value=1, max_value=5))
        docs = []
        for i in range(n):
            text = " ".join(
                draw(st.lists(_PIECE, min_size=0, max_size=5))
            )
            docs.append((i, text))
        # occasionally duplicate a doc verbatim (whole-doc repeat)
        if n >= 2 and draw(st.booleans()):
            docs[-1] = (docs[-1][0], docs[0][1])
        L = draw(st.integers(min_value=2, max_value=5))
        min_count = draw(st.integers(min_value=2, max_value=3))
        return docs, L, min_count

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_case())
    def test_exactsubstr_matches_python_reference(spark, case):
        docs, L, min_count = case
        df = spark.createDataFrame(docs, "doc_id long, text string")

        got_spans = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in exact_substr_spans(
                df, L=L, min_count=min_count
            ).collect()
        }
        want_spans = _py_spans(docs, L, min_count)
        assert got_spans == want_spans, (
            f"spans diverged (L={L}, min_count={min_count}): "
            f"docs={docs!r}"
        )

        got_rm = {
            r.doc_id: (r.text, r.n_tokens, r.n_removed)
            for r in exact_substr_removal(
                df, L=L, min_count=min_count
            ).collect()
        }
        want_rm = _py_removal(docs, L, min_count)
        assert got_rm == want_rm, (
            f"removal diverged (L={L}, min_count={min_count}): "
            f"docs={docs!r}"
        )

        # invariants: removal output is a subsequence of the original
        # tokens, and every reported span lies inside its document
        toks = {i: t.split() for i, t in docs}
        for i, (text, n_tokens, n_removed) in got_rm.items():
            kept = text.split() if text else []
            it = iter(toks[i])
            assert all(w in it for w in kept), f"not a subsequence: {i}"
            assert n_tokens == len(toks[i])
            assert n_removed == len(toks[i]) - len(kept)
        for i, a, b, n in got_spans:
            assert 1 <= a <= b <= len(toks[i]) and n == b - a + 1

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_case(), st.integers(min_value=2, max_value=3))
    def test_index_path_matches_python_reference(spark, case, n_batches):
        """The maintained-index detection path (r13): per-batch
        indexes folded in arbitrary batch splits equal the one-shot
        index, and spans answered FROM the fold equal the pure-Python
        reference — fuzzing the fold monoid and the dup_h-injection
        branch of _verified_windows together."""
        docs, L, min_count = case
        df = spark.createDataFrame(docs, "doc_id long, text string")
        parts = [
            [d for d in docs if d[0] % n_batches == r]
            for r in range(n_batches)
        ]
        folded = None
        for p in parts:
            pidx = exact_substr_index(
                spark.createDataFrame(p, "doc_id long, text string")
                if p
                else spark.createDataFrame([], "doc_id long, text string"),
                L=L,
            )
            folded = (
                pidx
                if folded is None
                else fold_exact_substr_index(folded, pidx)
            )
        one_shot = {
            (r["__h"], r["__h2"], r["n"], r["keep_id"], r["keep_start"])
            for r in exact_substr_index(df, L=L).collect()
        }
        got_idx = {
            (r["__h"], r["__h2"], r["n"], r["keep_id"], r["keep_start"])
            for r in folded.collect()
        }
        assert got_idx == one_shot, f"fold != recompute: docs={docs!r}"
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in exact_substr_spans_from_index(
                df, folded, L=L, min_count=min_count
            ).collect()
        }
        assert got == _py_spans(docs, L, min_count), (
            f"index-path spans diverged (L={L}, min_count={min_count},"
            f" n_batches={n_batches}): docs={docs!r}"
        )


if _HAVE_HYPOTHESIS:

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        _case(),
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=1, max_value=2),
        st.booleans(),
    )
    def test_compacted_ingest_matches_plain_ingest(
        spark, case, n_batches, compact_every, witness
    ):
        """Compaction fuzz (VERDICT r14 ask #5): random corpora split
        into id-ordered batches, random compaction cadence, both
        witness tiers — the compacted ingest's rewritten output must
        equal the uncompacted ingest's bit-for-bit (which the seeded
        suite already pins against the one-shot scoped removal)."""
        import shutil as _sh
        import tempfile as _tf

        from blackroad_feature_store_spark.streaming.ingest import (
            exact_substr_ingest_batch as ing,
        )

        docs, L, min_count = case
        # id-ordered contiguous batch split (monotone-arrival contract)
        docs = sorted(docs)
        cuts = sorted(
            {len(docs) * k // n_batches for k in range(1, n_batches)}
        )
        batches = [
            docs[a:b]
            for a, b in zip([0, *cuts], [*cuts, len(docs)])
            if docs[a:b]
        ]
        a_base = _tf.mkdtemp(prefix="xs_prop_plain_")
        b_base = _tf.mkdtemp(prefix="xs_prop_cmp_")
        try:
            for kwargs, base in (
                ({}, a_base),
                (
                    {
                        "compact_every": compact_every,
                        "compact_witness": witness,
                    },
                    b_base,
                ),
            ):
                for bid, b in enumerate(batches):
                    ing(
                        spark.createDataFrame(
                            b, "doc_id long, text string"
                        ),
                        bid,
                        f"{base}/idx",
                        f"{base}/out",
                        L=L,
                        min_count=min_count,
                        **kwargs,
                    )
            read = lambda p: {  # noqa: E731
                (r.doc_id, r.text, r.n_tokens, r.n_removed)
                for r in spark.read.parquet(f"{p}/out").collect()
            }
            assert read(b_base) == read(a_base), (
                f"compacted ingest diverged (L={L}, "
                f"min_count={min_count}, every={compact_every}, "
                f"witness={witness}): batches={batches!r}"
            )
        finally:
            _sh.rmtree(a_base, ignore_errors=True)
            _sh.rmtree(b_base, ignore_errors=True)
