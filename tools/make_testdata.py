#!/usr/bin/env python3
"""Generate driver-compatible synthetic testdata from scratch.

    python tools/make_testdata.py --out /path/testdata --sf 0.001 0.01 [0.1]

Reproduces the SHAPE of the driver's fixtures (TESTDATA.md) — same ten
tables, same column names/dtypes (int32 keys, timestamp[us] event
times, float32 embeddings), same scale-factor row counts, compatible
value distributions (5-language document corpus over a ~30-word
vocabulary, Jan-2024 event stream with JSON props, TPC-H-ish star
schema keyed consistently) — so every catalog query, its DuckDB
oracle, and the pytest suite run on a machine without the driver's
originals (the CI workflow does exactly this).

It does NOT reproduce the driver's exact VALUES (different generator,
different stream of randomness). Oracle parity is unaffected — both
engines read the same parquet — but value-pinned artifacts
(PLANDIGESTS.json is pinned on the driver fixtures' file sizes /
statistics) must not be compared against generated data, so the root
is stamped with ``GENERATED.marker`` and
``sources/testdata.py::is_generated_testdata`` lets those tests skip.
Queries that need whole-record duplicates plant their own shifted
copies (the catalog's max(id)+1 convention), so none are baked in.
SPAN-level repetition is different: the driver corpus carries
verbatim >=30-token boilerplate spans (~5%% of its 30-gram windows
are duplicated at sf0.001) that the ExactSubstr/winnowing family
detects — this generator plants the same structure (boilerplate
sequences injected into ~8%% of documents; span count scales with the
corpus so each span lands in ~10 documents at any SF).

Deterministic: one numpy PCG64 stream seeded per (table, sf).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
PNOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.5, 0.15, 0.15, 0.1, 0.1]
VOCAB = (
    "the a data table row column key value join merge sort scan filter "
    "group agg window batch stream spark query part order line customer "
    "hash vector dup small big fast slow"
).split()
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# rows per table at sf=1 (nation/region fixed-size). documents and
# embeddings scale SUB-linearly in the driver fixtures (measured:
# docs 500/500/5000 and embeddings 500/500/2000 at sf0.001/0.01/0.1
# = 50k*sf and 20k*sf, floored at 500) — text/vector operators are
# per-row expensive, so their tables stay smaller than the
# relational ones at every SF.
BASE = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}
MIN_ROWS = {"documents": 500, "embeddings": 500}

US = 1_000_000  # microseconds per second


def _rng(table: str, sf: float) -> np.random.Generator:
    # hashlib, NOT hash(): Python salts str hashes per process
    # (PYTHONHASHSEED), which would quietly break the determinism
    # this module promises — every CI run would synthesize different
    # data and a flaking statistical gate would be irreproducible.
    import hashlib

    digest = hashlib.sha256(
        f"{table}|{round(sf, 6)}|42".encode()
    ).digest()
    return np.random.default_rng(
        int.from_bytes(digest[:8], "little")
    )


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def _ts_us(epoch_seconds: np.ndarray) -> pa.Array:
    return pa.array(
        (epoch_seconds * US).astype("int64"), type=pa.timestamp("us")
    )


def generate_sf(out_root: str, sf: float) -> None:
    n = {
        k: max(int(v * sf), MIN_ROWS.get(k, 5))
        for k, v in BASE.items()
    }
    out = os.path.join(out_root, f"sf{sf:g}")
    os.makedirs(out, exist_ok=True)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    g = _rng("customer", sf)
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n["customer"]), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n["customer"])],
        "c_nationkey": pa.array(
            g.integers(0, 25, n["customer"]), pa.int32()),
        "c_acctbal": np.round(
            g.uniform(-999.99, 9999.99, n["customer"]), 2),
        "c_mktsegment": [
            SEGMENTS[i] for i in g.integers(0, 5, n["customer"])],
    }))

    g = _rng("supplier", sf)
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n["supplier"]), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n["supplier"])],
        "s_nationkey": pa.array(
            g.integers(0, 25, n["supplier"]), pa.int32()),
        "s_acctbal": np.round(
            g.uniform(-999.99, 9999.99, n["supplier"]), 2),
    }))

    g = _rng("part", sf)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(range(n["part"]), pa.int64()),
        "p_name": [
            f"{PADJ[a]} {PNOUN[b]}"
            for a, b in zip(g.integers(0, len(PADJ), n["part"]),
                            g.integers(0, len(PNOUN), n["part"]))],
        "p_brand": [f"Brand#{i}" for i in g.integers(1, 26, n["part"])],
        "p_type": [PTYPES[i] for i in g.integers(0, len(PTYPES), n["part"])],
        "p_size": pa.array(g.integers(1, 51, n["part"]), pa.int32()),
        "p_retailprice": np.round(g.uniform(900, 2000, n["part"]), 2),
    }))

    g = _rng("orders", sf)
    d0 = np.datetime64("1995-01-01").astype("datetime64[s]").astype(int)
    d1 = np.datetime64("2001-12-31").astype("datetime64[s]").astype(int)
    odate = (
        g.integers(d0 // 86_400, d1 // 86_400, n["orders"]) * 86_400
    )
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n["orders"]), pa.int64()),
        "o_custkey": pa.array(
            g.integers(0, n["customer"], n["orders"]), pa.int64()),
        "o_orderstatus": [
            "OFP"[i] for i in g.integers(0, 3, n["orders"])],
        "o_totalprice": np.round(g.uniform(1000, 400000, n["orders"]), 2),
        "o_orderdate": _ts_us(odate),
        "o_orderpriority": [
            PRIORITIES[i] for i in g.integers(0, 5, n["orders"])],
    }))

    g = _rng("lineitem", sf)
    # ~4 lines per order: draw order ids then number lines within
    lkeys = np.sort(g.integers(0, n["orders"], n["lineitem"]))
    # vectorized within-order line numbering: position minus the
    # start offset of each run of equal order keys
    same = np.concatenate([[False], lkeys[1:] == lkeys[:-1]])
    starts = np.flatnonzero(~same)
    run_lens = np.diff(np.append(starts, n["lineitem"]))
    linenum = (
        np.arange(n["lineitem"]) - np.repeat(starts, run_lens) + 1
    )
    lpart = g.integers(0, n["part"], n["lineitem"])
    # ship = the line's order date + 1..120 days (the TPC-H shape):
    # independent uniform ship dates would make any predicate of the
    # form "most of this pair's quantity shipped within one calendar
    # year" (tpch_q20) almost surely empty, because a pair's lines
    # would scatter across the whole 7-year range.
    ship = odate[lkeys] + g.integers(1, 121, n["lineitem"]) * 86_400
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lkeys, pa.int64()),
        "l_partkey": pa.array(lpart, pa.int64()),
        # each part is supplied by a fixed 4-supplier affinity set
        # (TPC-H's partsupp shape): without it, (part, supplier)
        # pairs almost never recur in a uniform draw and any
        # pair-level predicate (tpch_q20's total_qty >= 60 with most
        # shipped in one year) is satisfied by luck, not structure.
        "l_suppkey": pa.array(
            (lpart * 13 + g.integers(0, 4, n["lineitem"]))
            % n["supplier"], pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": g.integers(1, 51, n["lineitem"]).astype("float64"),
        "l_extendedprice": np.round(
            g.uniform(900, 100000, n["lineitem"]), 2),
        "l_discount": np.round(g.uniform(0, 0.10, n["lineitem"]), 2),
        "l_tax": np.round(g.uniform(0, 0.08, n["lineitem"]), 2),
        "l_returnflag": ["RAN"[i] for i in g.integers(0, 3, n["lineitem"])],
        "l_linestatus": ["OF"[i] for i in g.integers(0, 2, n["lineitem"])],
        "l_shipdate": _ts_us(ship),
    }))

    g = _rng("events", sf)
    t0 = np.datetime64("2024-01-01").astype("datetime64[s]").astype(int)
    t1 = np.datetime64("2024-01-31").astype("datetime64[s]").astype(int)
    ets = np.sort(g.uniform(t0, t1, n["events"]))
    n_users = max(int(15_000 * sf), 3)
    _write(out, "events", pa.table({
        "event_id": pa.array(range(n["events"]), pa.int64()),
        "ts": _ts_us(ets),
        "user_id": pa.array(
            g.integers(0, n_users, n["events"]), pa.int64()),
        "event_type": [
            EVENT_TYPES[i] for i in g.integers(0, 5, n["events"])],
        "value": np.round(
            np.minimum(g.exponential(80, n["events"]), 499.9), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in g.integers(0, 100, n["events"])],
    }))

    g = _rng("documents", sf)
    lang_idx = g.choice(len(LANGS), n["documents"], p=LANG_W)
    lens = g.integers(8, 110, n["documents"])
    words = g.integers(0, len(VOCAB), int(lens.sum()))
    # Boilerplate spans: the driver corpus carries verbatim repeated
    # >=30-token spans (~5% of its 30-gram windows are duplicated at
    # sf0.001) — the structure the ExactSubstr family detects and
    # removes. Plant the same shape: a few fixed 34-40-token
    # sequences, each injected into many documents, so span-dedup
    # queries are non-vacuous and the removal plan keeps its
    # non-degenerate join shape on generated data.
    # span count scales with the corpus so each span lands in ~10
    # documents at ANY SF — a fixed handful would concentrate into
    # hot fingerprint buckets that the dedup family's skew caps
    # (max_bucket) rightly drop, making those queries vacuous at
    # larger SFs.
    bp_rng = _rng("boilerplate", sf)
    n_spans = max(4, int(n["documents"] * 0.08 / 10))
    boilerplates = [
        " ".join(
            VOCAB[w]
            for w in bp_rng.integers(0, len(VOCAB), 34 + (b % 4) * 2)
        )
        for b in range(n_spans)
    ]
    bp_mask = g.random(n["documents"]) < 0.08
    bp_pick = g.integers(0, len(boilerplates), n["documents"])
    texts, pos = [], 0
    for i, ln in enumerate(lens):
        t = " ".join(VOCAB[w] for w in words[pos:pos + ln])
        pos += ln
        if bp_mask[i]:
            bp = boilerplates[bp_pick[i]]
            t = f"{t} {bp}" if i % 2 else f"{bp} {t}"
        texts.append(t)
    _write(out, "documents", pa.table({
        "doc_id": pa.array(range(n["documents"]), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in lang_idx],
        "source": [f"src{i}" for i in g.integers(0, 20, n["documents"])],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    g = _rng("embeddings", sf)
    vecs = g.normal(0, 0.15, (n["embeddings"], 64)).astype("float32")
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n["embeddings"]), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(
            g.integers(0, 10, n["embeddings"]), pa.int32()),
    }))
    print(f"sf{sf:g}: wrote 10 tables -> {out}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf", nargs="+", type=float, required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for sf in args.sf:
        generate_sf(args.out, sf)
    with open(os.path.join(args.out, "GENERATED.marker"), "w") as f:
        f.write(
            "synthesized by tools/make_testdata.py — schema-compatible "
            "with the driver fixtures, values differ; value-pinned "
            "artifacts (PLANDIGESTS.json) skip against this root\n"
        )
    print(f"stamped {args.out}/GENERATED.marker")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
