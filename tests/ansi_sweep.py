"""ANSI-mode sweep: execute every catalog query with
``spark.sql.ansi.enabled=true``.

Non-ANSI mode silently NULLs integer division by zero, numeric
overflow, and bad casts — bug classes that then surface as wrong
VALUES instead of errors (the gapfill-interp div-by-zero fixed in r7
was exactly this shape). Running the whole catalog under ANSI proves
no query path relies on silent nulling. Not part of the default pytest
run (it re-executes all 135 queries); invoke directly:

    python tests/ansi_sweep.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blackroad_feature_store_spark.plans import driver_queries as dq
from blackroad_feature_store_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    from blackroad_feature_store_spark.sources.testdata import sf_dir

    ap.add_argument("--sf", default=sf_dir("sf0.001"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark(
        app_name="ansi-sweep",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.ansi.enabled": "true"},
    )
    names = args.names or list(dq.QUERIES)
    failed: list[tuple[str, str]] = []
    for name in names:
        try:
            dq.QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"OK   {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            msg = str(e).splitlines()[0][:160]
            failed.append((name, msg))
            print(f"FAIL {name} -- {msg}", flush=True)
    print(f"\n{len(names) - len(failed)} ok, {len(failed)} failed")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
