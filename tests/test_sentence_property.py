"""Hypothesis fuzz of the sentence family (split / chunk / window /
dedup) against a pure-Python reference implementing the same public
contracts: regex segmentation (engine-portable ``SENTENCE_RE``),
no-lookahead streaming packing, stride-window coverage, and
distinct-doc boilerplate dropping.

Shrinking fuzz is what catches the off-by-one classes the seeded tests
can miss: terminator runs at string edges, whitespace-only fragments
between terminators (filtered AFTER numbering — ids stay stable but
non-contiguous), stride > window gaps, budget exactly equal to a
prefix sum, and all-boilerplate documents vanishing from dedup output.
"""

import hashlib
import re

from blackroad_feature_store_spark.operators.corpus import (
    SENTENCE_RE,
    sentence_chunks,
    sentence_dedup,
    sentence_windows,
    split_sentences,
)

_PY_RE = re.compile(SENTENCE_RE)


def _py_sentences(text):
    """(sentence_id, trimmed sentence) with empties filtered AFTER
    numbering — the split_sentences contract."""
    out = []
    for i, m in enumerate(_PY_RE.findall(text)):
        s = m.strip(" ")
        if s:
            out.append((i, s))
    return out


def _py_chunks(text, budget):
    sents = _py_sentences(text)
    chunks = {}
    cum = 0
    for _sid, s in sents:
        toks = len(re.split(r"\s+", s))  # mirrors F.split(col, r"\s+")
        cid = cum // budget
        chunks.setdefault(cid, []).append((s, toks))
        cum += toks
    return {
        cid: (
            len(items),
            sum(t for _, t in items),
            hashlib.md5(" ".join(s for s, _ in items).encode()).hexdigest(),
        )
        for cid, items in chunks.items()
    }


def _py_windows(text, window, stride):
    sents = [s for _, s in _py_sentences(text)]
    wins = {}
    for wid in range(0, (len(sents) + stride - 1) // stride + 1):
        seg = sents[wid * stride : wid * stride + window]
        if seg and wid * stride < len(sents):
            wins[wid] = (
                len(seg),
                sum(len(re.split(r"\s+", s)) for s in seg),
                hashlib.md5(" ".join(seg).encode()).hexdigest(),
            )
    return wins


def _spark_docs(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:

    # words + terminator runs + spaces, concatenated arbitrarily:
    # exercises leading/trailing terminators, runs like "?!.", multi-
    # space gaps, and fragments that trim to empty
    _PIECE = st.sampled_from(
        ["cat", "dog", "mat", "runs", " ", "  ", ".", "!", "?", "?!",
         "...", ". "]
    )

    @st.composite
    def _corpus(draw):
        n = draw(st.integers(min_value=1, max_value=8))
        docs = []
        for i in range(n):
            text = "".join(
                draw(st.lists(_PIECE, min_size=0, max_size=24))
            )
            docs.append((i, text))
        budget = draw(st.integers(min_value=1, max_value=9))
        window = draw(st.integers(min_value=1, max_value=5))
        stride = draw(st.integers(min_value=1, max_value=5))
        min_docs = draw(st.integers(min_value=2, max_value=3))
        return docs, budget, window, stride, min_docs

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_corpus())
    def test_sentence_family_matches_python_reference(spark, case):
        docs, budget, window, stride, min_docs = case
        df = _spark_docs(spark, docs)

        # --- split ---
        got_split = {}
        for r in split_sentences(df).collect():
            got_split.setdefault(r["doc_id"], []).append(
                (r["sentence_id"], r["sentence"])
            )
        for did, text in docs:
            assert sorted(got_split.get(did, [])) == _py_sentences(text), (
                f"split diverged on doc {did}: {text!r}"
            )

        # --- chunks ---
        got_chunks = {
            (r["doc_id"], r["chunk_id"]): (
                r["n_sentences"], r["chunk_tokens"], r["chunk_md5"]
            )
            for r in sentence_chunks(df, max_tokens=budget).collect()
        }
        want_chunks = {
            (did, cid): v
            for did, text in docs
            for cid, v in _py_chunks(text, budget).items()
        }
        assert got_chunks == want_chunks, (
            f"chunks diverged (budget={budget})"
        )

        # --- windows ---
        got_wins = {
            (r["doc_id"], r["window_id"]): (
                r["n_sentences"], r["window_tokens"], r["window_md5"]
            )
            for r in sentence_windows(
                df, window_sentences=window, stride=stride
            ).collect()
        }
        want_wins = {
            (did, wid): v
            for did, text in docs
            for wid, v in _py_windows(text, window, stride).items()
        }
        assert got_wins == want_wins, (
            f"windows diverged (window={window}, stride={stride})"
        )

        # --- dedup ---
        from collections import Counter

        doc_sets = {
            did: {s for _, s in _py_sentences(text)} for did, text in docs
        }
        freq = Counter(s for ss in doc_sets.values() for s in ss)
        boiler = {s for s, c in freq.items() if c >= min_docs}
        want_dedup = {}
        for did, text in docs:
            kept = [
                s for _, s in _py_sentences(text) if s not in boiler
            ]
            dropped = len(_py_sentences(text)) - len(kept)
            if kept:
                want_dedup[did] = (" ".join(kept), len(kept), dropped)
        got_dedup = {
            r["doc_id"]: (
                r["text"], r["kept_sentences"], r["dropped_sentences"]
            )
            for r in sentence_dedup(df, min_docs=min_docs).collect()
        }
        assert got_dedup == want_dedup, (
            f"dedup diverged (min_docs={min_docs})"
        )
