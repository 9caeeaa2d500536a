#!/usr/bin/env python3
"""Per-job/stage time attribution for one catalog query (guide §1/§7:
empirical loop — find WHERE the time goes before changing anything).

    python tools/profile_query.py [--sf DIR] [--reps 2] query [query ...]

Runs each query through the noop sink on a UI-enabled session, then
reads the UI REST API (/api/v1) for per-job wall time and the
heaviest stages. Measurement-only: writes nothing into the repo.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> None:
    from blackroad_feature_store_spark.sources.testdata import sf_dir

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=sf_dir("sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from blackroad_feature_store_spark.session import get_spark

    spark = get_spark(
        app_name="profile-query",
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    queries = entrymod.queries()

    # warmup (same as bench.py)
    spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy(
        "k"
    ).count().write.format("noop").mode("overwrite").save()

    for name in args.names:
        for rep in range(args.reps):
            jobs_before = {
                j["jobId"] for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs")
            }
            spark.sparkContext.setJobDescription(f"{name}#rep{rep}")
            t0 = time.time()
            df = queries[name](spark, args.sf)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            jobs = [
                j
                for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            jobs.sort(key=lambda j: j["jobId"])
            print(
                f"\n=== {name} rep{rep}: total {t_total:.3f}s "
                f"(build {t_build:.3f}s), {len(jobs)} jobs ==="
            )
            acc = 0.0
            for j in jobs:
                try:
                    t_sub = time.strptime(
                        j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                    )
                    t_cmp = time.strptime(
                        j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                    )
                    # second resolution only; use GMT fields + ms
                    ms_sub = int(j["submissionTime"][20:23] or 0)
                    ms_cmp = int(j["completionTime"][20:23] or 0)
                    dur = (
                        time.mktime(t_cmp)
                        + ms_cmp / 1000.0
                        - time.mktime(t_sub)
                        - ms_sub / 1000.0
                    )
                except (KeyError, ValueError):
                    dur = -1.0
                acc += max(dur, 0)
                desc = (j.get("description") or j.get("name") or "")[:100]
                print(
                    f"  job {j['jobId']:>4}  {dur:7.3f}s "
                    f"tasks={j.get('numTasks', '?'):>4}  {desc}"
                )
            print(f"  sum of job times: {acc:.3f}s (gaps = driver work)")


if __name__ == "__main__":
    main()
