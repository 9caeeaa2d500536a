#!/usr/bin/env python3
"""Soak-fuzz the ExactSubstr family against the pure-Python reference
with a much larger case budget than the CI-budgeted hypothesis run
(`tests/test_exactsubstr_property.py` runs 12+8 shrinking examples per
suite invocation; this runs hundreds of random corpora in one Spark
session, batching many corpora per Spark job via a composite id).

    python tools/soak_fuzz.py [--cases 300] [--seed 0]

Every case checks, on one random small-vocab corpus:
  * exact_substr_spans  == reference spans
  * exact_substr_removal == reference removal (text, n_tokens, n_removed)
  * per-batch exact_substr_index folds == one-shot index (random split)
  * exact_substr_spans_from_index(fold) == reference spans

Randomization deliberately concentrates on the collision-prone corner:
2-4 token vocabularies make every window a near-collision bucket, so
the hash index's string-verification branch is exercised constantly;
whitespace runs, empty docs, verbatim doc copies, and docs exactly
L±1 tokens long appear with fixed probability. Exit code 1 on the
first divergence, printing the reproducing corpus.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time
from collections import Counter, defaultdict

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


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


def _random_docs(rng: random.Random):
    vocab_n = rng.randint(2, 4)
    vocab = [f"w{j}" for j in range(vocab_n)] + (
        ["W0"] if rng.random() < 0.3 else []  # case sensitivity
    )
    n_docs = rng.randint(1, 10)
    L = rng.randint(2, 6)
    docs = []
    for i in range(n_docs):
        r = rng.random()
        if r < 0.08:
            text = ""  # empty
        elif r < 0.14:
            text = "   "  # whitespace-only
        elif r < 0.25:
            # exactly L-1, L or L+1 tokens — the boundary classes
            n = L + rng.choice([-1, 0, 1])
            text = " ".join(rng.choice(vocab) for _ in range(max(n, 0)))
        else:
            n = rng.randint(1, 18)
            sep = "  " if rng.random() < 0.15 else " "
            text = sep.join(rng.choice(vocab) for _ in range(n))
        docs.append((i, text))
    # verbatim whole-doc copy with some probability
    if n_docs >= 2 and rng.random() < 0.35:
        a, b = rng.sample(range(n_docs), 2)
        docs[b] = (docs[b][0], docs[a][1])
    # adversarial keeper races for the ingest path (VERDICT r13 ask
    # #4): plant a >= L-token span whose FIRST occurrence sits in the
    # lowest-id doc while duplicates arrive in the highest-id docs
    # (late duplicates must drop against the history keeper with no
    # in-batch protection), or two copies ONLY in the last doc (a
    # late in-batch race: the window is history-unseen, so keeper
    # protection must be decided inside the arriving batch).
    if n_docs >= 3 and rng.random() < 0.5:
        span = " ".join(
            rng.choice(vocab) for _ in range(L + rng.randint(0, 2))
        )
        if rng.random() < 0.5:
            docs[0] = (docs[0][0], (docs[0][1] + " " + span).strip())
            lo = n_docs // 2
            for j in rng.sample(
                range(lo, n_docs), min(2, n_docs - lo)
            ):
                docs[j] = (docs[j][0], (span + " " + docs[j][1]).strip())
        else:
            last = n_docs - 1
            docs[last] = (
                docs[last][0],
                (span + " " + docs[last][1] + " " + span).strip(),
            )
    min_count = 2 if rng.random() < 0.8 else 3
    return docs, L, min_count


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from blackroad_feature_store_spark.operators.exactsubstr import (
        exact_substr_batch_rewrite,
        exact_substr_index,
        exact_substr_removal,
        exact_substr_rewrite_tier,
        exact_substr_spans,
        exact_substr_spans_from_index,
        fold_exact_substr_counts,
        fold_exact_substr_index,
    )
    from blackroad_feature_store_spark.session import get_spark

    spark = get_spark(
        app_name="soak-fuzz", master="local[8]", shuffle_partitions=8
    )
    rng = random.Random(args.seed)
    t0 = time.time()
    for case_no in range(args.cases):
        docs, L, min_count = _random_docs(rng)
        df = spark.createDataFrame(docs, "doc_id long, text string")

        got_spans = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in exact_substr_spans(
                df, L=L, min_count=min_count
            ).collect()
        }
        want_spans = _py_spans(docs, L, min_count)
        if got_spans != want_spans:
            print(
                f"SPANS DIVERGED case={case_no} L={L} "
                f"min_count={min_count}\ndocs={docs!r}\n"
                f"got={got_spans}\nwant={want_spans}"
            )
            return 1

        got_rm = {
            r.doc_id: (r.text, r.n_tokens, r.n_removed)
            for r in exact_substr_removal(
                df, L=L, min_count=min_count
            ).collect()
        }
        want_rm = _py_removal(docs, L, min_count)
        if got_rm != want_rm:
            print(
                f"REMOVAL DIVERGED case={case_no} L={L} "
                f"min_count={min_count}\ndocs={docs!r}\n"
                f"got={got_rm}\nwant={want_rm}"
            )
            return 1

        # index path: random batch split, fold, detect from fold
        n_batches = rng.randint(2, 3)
        folded = None
        for b in range(n_batches):
            part = [d for d in docs if d[0] % n_batches == b]
            pdf = spark.createDataFrame(
                part, "doc_id long, text string"
            )
            pidx = exact_substr_index(pdf, L=L)
            folded = (
                pidx
                if folded is None
                else fold_exact_substr_index(folded, pidx)
            )
        one = sorted(
            (r["__h"], r["__h2"], r["n"], r["keep_id"], r["keep_start"])
            for r in exact_substr_index(df, L=L).collect()
        )
        got_idx = sorted(
            (r["__h"], r["__h2"], r["n"], r["keep_id"], r["keep_start"])
            for r in folded.collect()
        )
        if got_idx != one:
            print(
                f"INDEX FOLD DIVERGED case={case_no} L={L} "
                f"n_batches={n_batches}\ndocs={docs!r}"
            )
            return 1
        got_is = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in exact_substr_spans_from_index(
                df, folded, L=L, min_count=min_count
            ).collect()
        }
        if got_is != want_spans:
            print(
                f"INDEX SPANS DIVERGED case={case_no} L={L} "
                f"min_count={min_count} n_batches={n_batches}\n"
                f"docs={docs!r}\ngot={got_is}\nwant={want_spans}"
            )
            return 1

        # rewrite-at-ingest path (VERDICT r13 ask #4): split the
        # corpus into up to 5 CONTIGUOUS id ranges (monotone-arrival
        # contract), rewrite each batch against the folded history
        # index only, and require every batch's output to equal the
        # pure-Python one-shot removal over the documents ingested so
        # far, restricted to the batch — the moment-of-ingest
        # exactness contract, under the planted keeper races above.
        n_ing = (
            rng.randint(4, 5) if len(docs) >= 4 else rng.randint(2, 3)
        )
        cuts = sorted(
            rng.sample(range(1, len(docs)), min(n_ing - 1, len(docs) - 1))
        ) if len(docs) > 1 else []
        bounds = [0] + cuts + [len(docs)]
        # half the cases maintain the KEEPERLESS rewrite tier
        # (__h,__h2,n — r15, VERDICT r14 ask #5): the rewrite must be
        # exact without the keeper witness under every planted keeper
        # race above, folding through fold_exact_substr_counts.
        keeperless = rng.random() < 0.5
        hist = exact_substr_index(
            spark.createDataFrame([], "doc_id long, text string"), L=L
        )
        if keeperless:
            hist = exact_substr_rewrite_tier(hist)
        seen: list = []
        ok = True
        for lo, hi in zip(bounds, bounds[1:]):
            batch = docs[lo:hi]
            bdf = spark.createDataFrame(
                batch, "doc_id long, text string"
            )
            rewritten, delta = exact_substr_batch_rewrite(
                bdf, hist, L=L, min_count=min_count
            )
            got_b = {
                r.doc_id: (r.text, r.n_tokens, r.n_removed)
                for r in rewritten.collect()
            }
            seen += batch
            want_all = _py_removal(seen, L, min_count)
            want_b = {i: want_all[i] for i, _ in batch}
            if got_b != want_b:
                print(
                    f"INGEST REWRITE DIVERGED case={case_no} L={L} "
                    f"min_count={min_count} batches={bounds} "
                    f"keeperless={keeperless}\n"
                    f"docs={docs!r}\nbatch=[{lo}:{hi}]\n"
                    f"got={got_b}\nwant={want_b}"
                )
                ok = False
                break
            if keeperless:
                hist = fold_exact_substr_counts(
                    hist, exact_substr_rewrite_tier(delta)
                )
            else:
                hist = fold_exact_substr_index(hist, delta)
        if not ok:
            return 1

        if (case_no + 1) % 25 == 0:
            print(
                f"{case_no + 1}/{args.cases} ok "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    print(
        f"SOAK PASS: {args.cases} cases, seed {args.seed}, "
        f"{time.time() - t0:.0f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
