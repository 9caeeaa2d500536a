#!/usr/bin/env python3
"""Synthesize a 10x (sf1-equivalent) copy of the tables the slowest
catalog queries read, for the one-off linearity probe (PLANS_r08.md).

    python tools/make_scaled_testdata.py [--out /tmp/sf1_synth] [--reps 10]

Construction principle: each replica must be an INDEPENDENT shard of
the corpus — within-replica structure (duplicate rate, near-dup
geometry, session shapes) preserved, cross-replica structure absent —
so a linear operator measures ~reps x time and a quadratic one is
exposed. Naive row duplication would instead create reps-1 exact
twins of every doc/vector and densify the pair graph superlinearly,
making LINEAR operators look quadratic.

- documents: every token gets a replica prefix — shingle/fingerprint
  identity is replica-local, within-replica dup structure intact.
- embeddings: replica-specific diagonal +-1 matrix (orthogonal, so
  all within-replica cosines are EXACTLY preserved) decorrelates
  replicas; ids offset.
- events: user/event ids offset per replica — independent users, same
  per-user session shapes and event-time range.

Small dimension tables are copied as-is (the slow queries don't read
them, but the directory stays loadable by every catalog query).
"""

from __future__ import annotations

import argparse
import os
import shutil

import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# one row group = ONE Spark scan task regardless of cores (row groups
# don't split); cap rows per group so scaled shards parallelize like a
# real multi-file dataset would (r11 probe-straggler finding)
ROW_GROUP = 16384

from blackroad_feature_store_spark.sources.testdata import sf_dir as _sf_dir

SRC = _sf_dir("sf0.1")
COPY_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem",
]


def scale_documents(out: str, reps: int) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    n = t.num_rows
    parts = []
    for k in range(reps):
        tk = t
        if k > 0:
            # prefix every token: replica-local shingle identity
            text = pc.replace_substring_regex(
                t["text"], pattern=r"(\S+)", replacement=rf"q{k}\1"
            )
            tk = t.set_column(t.schema.get_field_index("text"), "text", text)
        tk = tk.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(t["doc_id"], k * 10 * n),
        )
        parts.append(tk)
    pq.write_table(pa.concat_tables(parts), f"{out}/documents.parquet",
                   row_group_size=ROW_GROUP)


def scale_embeddings(out: str, reps: int) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    n = t.num_rows
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    rng = np.random.default_rng(20260814)
    parts = []
    for k in range(reps):
        signs = (
            np.ones(dim, dtype=np.float32)
            if k == 0
            else rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        )
        ek = emb * signs  # orthogonal: within-replica cosines preserved
        arr = pa.array(list(ek), type=pa.list_(pa.float32()))
        tk = pa.table(
            {
                "vec_id": pc.add(t["vec_id"], k * 10 * n),
                "embedding": arr,
                "label": t["label"],
            }
        )
        parts.append(tk)
    pq.write_table(pa.concat_tables(parts), f"{out}/embeddings.parquet",
                   row_group_size=ROW_GROUP)


def scale_events(out: str, reps: int) -> None:
    t = pq.read_table(f"{SRC}/events.parquet")
    n = t.num_rows
    max_user = pc.max(t["user_id"]).as_py() + 1
    parts = []
    for k in range(reps):
        tk = t.set_column(
            t.schema.get_field_index("event_id"),
            "event_id",
            pc.add(t["event_id"], k * 10 * n),
        )
        tk = tk.set_column(
            t.schema.get_field_index("user_id"),
            "user_id",
            pc.add(t["user_id"], k * max_user),
        )
        parts.append(tk)
    pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet",
                   row_group_size=ROW_GROUP)


def scale_tpch(out: str, reps: int) -> None:
    """FK-consistent replicas of the TPC-H fact chain: every key
    column (order/cust/part/supp) is offset per replica, so each
    replica is an independent sub-warehouse — join fan-outs stay
    exactly the per-replica fan-outs, and a plan that is linear in
    warehouse size measures ~reps x. Dimension tables nation/region
    stay shared (they are fixed-cardinality in TPC-H too)."""
    tables = {
        t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in ["customer", "orders", "lineitem", "part", "supplier"]
    }
    offs = {
        "cust": pc.max(tables["customer"]["c_custkey"]).as_py() + 1,
        "order": pc.max(tables["orders"]["o_orderkey"]).as_py() + 1,
        "part": pc.max(tables["part"]["p_partkey"]).as_py() + 1,
        "supp": pc.max(tables["supplier"]["s_suppkey"]).as_py() + 1,
    }
    key_cols = {
        "customer": {"c_custkey": "cust"},
        "orders": {"o_orderkey": "order", "o_custkey": "cust"},
        "lineitem": {
            "l_orderkey": "order",
            "l_partkey": "part",
            "l_suppkey": "supp",
        },
        "part": {"p_partkey": "part"},
        "supplier": {"s_suppkey": "supp"},
    }
    for name, t in tables.items():
        parts = []
        for k in range(reps):
            tk = t
            for col, kind in key_cols[name].items():
                tk = tk.set_column(
                    t.schema.get_field_index(col),
                    col,
                    pc.add(t[col], k * offs[kind]),
                )
            parts.append(tk)
        pq.write_table(pa.concat_tables(parts), f"{out}/{name}.parquet",
                       row_group_size=ROW_GROUP)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1_synth")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument(
        "--tpch", action="store_true",
        help="also scale the TPC-H fact chain (FK-consistent offsets)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for tbl in COPY_TABLES:
        shutil.copy(f"{SRC}/{tbl}.parquet", f"{args.out}/{tbl}.parquet")
    scale_documents(args.out, args.reps)
    scale_embeddings(args.out, args.reps)
    scale_events(args.out, args.reps)
    report = ["documents", "embeddings", "events"]
    if args.tpch:
        scale_tpch(args.out, args.reps)
        report += ["customer", "orders", "lineitem", "part", "supplier"]
    for tbl in report:
        print(tbl, pq.ParquetFile(f"{args.out}/{tbl}.parquet").metadata.num_rows)


if __name__ == "__main__":
    main()
