#!/usr/bin/env python3
"""Capture ``explain("formatted")`` for named catalog queries into
``plans/<round>/<query>_<suffix>.txt`` — the optimization-round
evidence files (OPTIMIZATION_r16.md contract: a judge who cannot run
Spark checks plan claims against these committed files).

    python tools/capture_plans.py --suffix before [--round r16] \
        [--sf /root/testdata/sf0.1] query [query ...]

Unlike tools/plan_digests.py (which normalizes + hashes), this writes
the RAW formatted explain so Exchange counts, join strategies,
PushedFilters/ReadSchema and BatchEvalPython/ArrowEvalPython nodes are
readable verbatim. Queries that do eager work while building
(streaming drains, store round-trips) run that work once; the file
then holds the final returned plan — the part the bench times
reproducibly.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from blackroad_feature_store_spark.sources.testdata import sf_dir

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=sf_dir("sf0.1"))
    ap.add_argument("--suffix", required=True, help="before / after")
    ap.add_argument("--round", default="r16")
    ap.add_argument("names", nargs="+", help="query names")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from plan_digests import _explain_formatted

    from blackroad_feature_store_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", args.round)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name=f"capture-plans-{args.suffix}")
    queries = entrymod.queries()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    for name in args.names:
        df = queries[name](spark, args.sf)
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(_explain_formatted(df))
            f.write("\n")
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
