"""Pins for operators/exactsubstr.py: brute-force parity on random
small-vocab corpora (spans AND removal), the planted-repeat guarantee,
keep-one-occurrence semantics, verbatim (case-sensitive) matching, and
contract errors."""

import random

from pyspark.sql import functions as F

from blackroad_feature_store_spark.operators.exactsubstr import (
    exact_substr_removal,
    exact_substr_spans,
)


def _docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id bigint, text string")


def _brute_covered(docs, L, min_count=2):
    """doc_id -> set of 1-based positions covered by a duplicated
    L-window (occurrences counted corpus-wide incl. self-repeats)."""
    from collections import Counter

    toks = {i: t.split() for i, t in docs}
    cnt = Counter()
    for t in toks.values():
        for s in range(len(t) - L + 1):
            cnt[tuple(t[s : s + L])] += 1
    cov = {}
    for i, t in toks.items():
        c = set()
        for s in range(len(t) - L + 1):
            if cnt[tuple(t[s : s + L])] >= min_count:
                c.update(range(s + 1, s + L + 1))
        cov[i] = c
    return cov


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


def _brute_spans(docs, L, min_count=2):
    cov = _brute_covered(docs, L, min_count)
    return {
        (i, a, b, b - a + 1)
        for i, c in cov.items()
        for (a, b) in _runs(c)
    }


def _brute_removal(docs, L, min_count=2):
    """(doc_id -> (text, n_tokens, n_removed)) under first-(doc,start)
    keeper protection."""
    from collections import defaultdict

    toks = {i: t.split() for i, t in docs}
    occ = defaultdict(list)
    for i in sorted(toks):
        t = toks[i]
        for s in range(len(t) - L + 1):
            occ[tuple(t[s : s + L])].append((i, s + 1))
    keep_cov, drop = defaultdict(set), defaultdict(set)
    for gram, locs in occ.items():
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


def _random_corpus(seed, n_docs=6, vocab=("aa", "bb", "cc")):
    rng = random.Random(seed)
    return [
        (
            i,
            " ".join(
                rng.choice(vocab) for _ in range(rng.randint(4, 14))
            ),
        )
        for i in range(n_docs)
    ]


def test_spans_match_bruteforce_on_random_corpora(spark):
    for seed in range(6):
        docs = _random_corpus(seed)
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in exact_substr_spans(
                _docs_df(spark, docs), L=3
            ).collect()
        }
        assert got == _brute_spans(docs, 3), f"seed={seed}"


def test_removal_matches_bruteforce_on_random_corpora(spark):
    for seed in range(6):
        docs = _random_corpus(seed + 100)
        got = {
            r.doc_id: (r.text, r.n_tokens, r.n_removed)
            for r in exact_substr_removal(
                _docs_df(spark, docs), L=3
            ).collect()
        }
        assert got == _brute_removal(docs, 3), f"seed={seed}"


def test_planted_repeat_is_fully_reported(spark):
    # a 7-token span pasted into two otherwise-distinct documents
    # must come back as ONE maximal span covering all 7 tokens
    span = "the quick brown fox jumps over dogs"
    docs = [
        (1, f"alpha beta {span} gamma delta epsilon zeta"),
        (2, f"one two three four {span} five six"),
    ]
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in exact_substr_spans(_docs_df(spark, docs), L=5).collect()
    }
    assert got == {(1, 3, 9), (2, 5, 11)}


def test_removal_keeps_exactly_one_occurrence(spark):
    body = " ".join(f"w{i}" for i in range(10))
    docs = [(1, body), (2, body), (3, body)]
    got = {
        r.doc_id: (r.text, r.n_removed)
        for r in exact_substr_removal(_docs_df(spark, docs), L=10).collect()
    }
    # first (doc, start) keeper = doc 1; docs 2 and 3 empty out
    assert got[1] == (body, 0)
    assert got[2] == ("", 10) and got[3] == ("", 10)


def test_matching_is_verbatim_case_sensitive(spark):
    docs = [
        (1, "Alpha Beta Gamma Delta"),
        (2, "alpha beta gamma delta"),
    ]
    assert exact_substr_spans(_docs_df(spark, docs), L=4).count() == 0


def test_short_docs_and_no_dup_corpora(spark):
    docs = [(1, "only three tokens"), (2, "four distinct tokens here")]
    assert exact_substr_spans(_docs_df(spark, docs), L=5).count() == 0
    out = {
        r.doc_id: (r.text, r.n_tokens, r.n_removed)
        for r in exact_substr_removal(_docs_df(spark, docs), L=5).collect()
    }
    assert out == {
        1: ("only three tokens", 3, 0),
        2: ("four distinct tokens here", 4, 0),
    }


def test_invalid_L_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="L must be"):
        exact_substr_spans(_docs_df(spark, [(1, "a b")]), L=0)
    with pytest.raises(ValueError, match="L must be"):
        exact_substr_removal(_docs_df(spark, [(1, "a b")]), L=-1)


def test_adjacent_covered_regions_merge_to_one_span(spark):
    # two duplicated windows whose intervals touch (prev_end + 1)
    # must merge into ONE maximal span: doc 3 carries X at 1..3 and
    # Y at 4..6 back-to-back while X and Y each repeat elsewhere.
    x, y = "x1 x2 x3", "y1 y2 y3"
    docs = [
        (1, f"{x} filler1 fillerA fillerB"),
        (2, f"fillerC fillerD {y} fillerE"),
        (3, f"{x} {y}"),
    ]
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in exact_substr_spans(_docs_df(spark, docs), L=3).collect()
    }
    assert (3, 1, 6, 6) in got


def test_null_and_empty_text_report_zero_tokens(spark):
    # F.size(NULL array) is -1 under non-ANSI settings; _tokenized
    # coalesces NULL text to an empty token array so n_tokens /
    # n_removed read 0, not -1, and the rewrite returns empty text.
    docs = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "a b c a b c a b c")],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: r
        for r in exact_substr_removal(docs, L=3).collect()
    }
    assert rows[1].n_tokens == 0 and rows[1].n_removed == 0
    assert rows[1].text == ""
    assert rows[2].n_tokens == 0 and rows[2].n_removed == 0
    assert rows[3].n_tokens == 9 and rows[3].n_removed > 0
    # and the detect path reports no span for NULL/blank docs
    got = exact_substr_spans(docs, L=3).collect()
    assert {r.doc_id for r in got} == {3}


def _index_rows(df):
    return sorted(
        (r["__h"], r["__h2"], r["n"], r["keep_id"], r["keep_start"])
        for r in df.collect()
    )


def test_index_h2_is_reseeded_not_chained(spark):
    """ADVICE r13 (high) pin: ``__h2`` must be
    ``xxhash64(lit(1), window)`` — discriminator FIRST. Spark's
    multi-arg xxhash64 folds children using the running hash as the
    next seed, so the old ``xxhash64(window, lit(1))`` was
    ``hashLong(1, seed=__h)``, a pure function of ``__h``: any 64-bit
    collision on ``__h`` collided on ``__h2`` too, and the (h, h2)
    pair gave only 2^-64 protection on the string-blind
    batch-rewrite path. Discriminator-first re-seeds the window hash
    (effective seed hashLong(1, 42)), making the pair independent."""
    from blackroad_feature_store_spark.operators.exactsubstr import (
        exact_substr_index,
    )

    docs = [(1, "a b c d e"), (2, "c d e f g")]
    idx = {
        (r["__h"], r["__h2"])
        for r in exact_substr_index(_docs_df(spark, docs), L=3).collect()
    }
    windows = ["a b c", "b c d", "c d e", "d e f", "e f g"]
    expect = {
        (r["h"], r["h2"])
        for r in spark.createDataFrame(
            [(w,) for w in windows], "w string"
        )
        .select(
            F.xxhash64("w").alias("h"),
            F.xxhash64(F.lit(1), F.col("w")).alias("h2"),
        )
        .collect()
    }
    chained = {
        (r["h"], r["h2"])
        for r in spark.createDataFrame(
            [(w,) for w in windows], "w string"
        )
        .select(
            F.xxhash64("w").alias("h"),
            F.xxhash64(F.col("w"), F.lit(1)).alias("h2"),
        )
        .collect()
    }
    assert idx == expect
    # the regression being pinned away: the chained (h-seeded) form
    # produces different h2 values, so this pin fails on a revert
    assert idx != chained


def test_index_fold_equals_recompute(spark):
    """VERDICT r12 ask #5 pin: per-batch indexes folded in ANY order
    equal exact_substr_index over the union corpus bit-for-bit (each
    doc arrives whole in one batch)."""
    from blackroad_feature_store_spark.operators.exactsubstr import (
        exact_substr_index,
        fold_exact_substr_index,
    )

    for seed in range(4):
        docs = _random_corpus(seed, n_docs=9)
        batches = [
            [d for d in docs if d[0] % 3 == r] for r in range(3)
        ]
        parts = [
            exact_substr_index(_docs_df(spark, b), L=3) for b in batches
        ]
        folded_fwd = fold_exact_substr_index(
            fold_exact_substr_index(parts[0], parts[1]), parts[2]
        )
        folded_rev = fold_exact_substr_index(
            parts[2], fold_exact_substr_index(parts[1], parts[0])
        )
        want = _index_rows(
            exact_substr_index(_docs_df(spark, docs), L=3)
        )
        assert _index_rows(folded_fwd) == want, f"seed={seed}"
        assert _index_rows(folded_rev) == want, f"seed={seed}"


def test_spans_from_index_equals_batch_spans(spark):
    """Detection answered FROM the maintained index == the one-shot
    batch operator, including on corpora with hash-tier candidates
    that string verification must reject (random small-vocab)."""
    from blackroad_feature_store_spark.operators.exactsubstr import (
        exact_substr_index,
        exact_substr_spans,
        exact_substr_spans_from_index,
    )

    for seed in range(4):
        docs = _random_corpus(seed, n_docs=8)
        df = _docs_df(spark, docs)
        idx = exact_substr_index(df, L=3)
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in exact_substr_spans_from_index(
                df, idx, L=3
            ).collect()
        }
        want = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in exact_substr_spans(df, L=3).collect()
        }
        assert got == want == _brute_spans(docs, 3), f"seed={seed}"


def test_index_keeper_witness_is_global_first_occurrence(spark):
    from blackroad_feature_store_spark.operators.exactsubstr import (
        exact_substr_index,
        fold_exact_substr_index,
    )

    docs = [(1, "x y z w"), (2, "x y z q"), (7, "x y z r")]
    # batch split puts the SMALLEST doc id in the LAST batch: the fold
    # must still return it as the keeper
    b1 = exact_substr_index(_docs_df(spark, docs[1:]), L=3)
    b2 = exact_substr_index(_docs_df(spark, docs[:1]), L=3)
    folded = fold_exact_substr_index(b1, b2)
    row = [r for r in folded.collect() if r["n"] == 3]
    assert len(row) == 1  # "x y z" occurs in all three docs
    assert (row[0]["keep_id"], row[0]["keep_start"]) == (1, 1)


def test_batch_rewrite_equals_removal_at_moment_of_ingest(spark):
    """exact_substr_batch_rewrite's contract: each batch's output ==
    exact_substr_removal(history ∪ batch) restricted to the batch's
    documents AT THAT MOMENT (monotone ids). Deliberately NOT the
    retrospective whole-corpus rewrite — a later duplicate can
    neither reach back to remove nor to protect already-emitted text
    (the docstring's stated difference; random collision-prone
    corpora exercise both directions)."""
    from blackroad_feature_store_spark.operators.exactsubstr import (
        exact_substr_batch_rewrite,
        exact_substr_index,
        fold_exact_substr_index,
    )

    for seed in range(4):
        docs = _random_corpus(seed, n_docs=9)
        # monotone arrival: batches are contiguous id ranges
        batches = [docs[0:3], docs[3:6], docs[6:9]]
        # empty-history bootstrap: index over an empty frame
        index = exact_substr_index(_docs_df(spark, []), L=3)
        seen: list = []
        for b in batches:
            bdf = _docs_df(spark, b)
            rewritten, delta = exact_substr_batch_rewrite(
                bdf, index, L=3
            )
            got = {
                r[0]: (r["text"], r["n_tokens"], r["n_removed"])
                for r in rewritten.collect()
            }
            seen = seen + b
            moment = _brute_removal(seen, 3)
            want = {i: moment[i] for i, _ in b}
            assert got == want, f"seed={seed} batch={[i for i,_ in b]}"
            index = fold_exact_substr_index(index, delta)
        # the folded index after all batches == the one-shot index
        assert _index_rows(index) == _index_rows(
            exact_substr_index(_docs_df(spark, docs), L=3)
        ), f"seed={seed}"


def test_batch_rewrite_drops_history_duplicates_keeps_new(spark):
    from blackroad_feature_store_spark.operators.exactsubstr import (
        exact_substr_batch_rewrite,
        exact_substr_index,
    )

    hist = _docs_df(spark, [(1, "x y z w q")])
    index = exact_substr_index(hist, L=3)
    batch = _docs_df(
        spark,
        [
            (10, "x y z w q"),        # verbatim history copy -> emptied
            (11, "a b c d e"),        # new content -> untouched
            (12, "a b c d e"),        # in-batch dup of 11 -> emptied
        ],
    )
    rewritten, _ = exact_substr_batch_rewrite(batch, index, L=3)
    got = {r[0]: (r["text"], r["n_removed"]) for r in rewritten.collect()}
    assert got[10] == ("", 5)       # history holds the keeper
    assert got[11] == ("a b c d e", 0)  # first in-batch occurrence kept
    assert got[12] == ("", 5)
