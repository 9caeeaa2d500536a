"""CLI with the reference's verb surface (feature_store.py:614-666 and
ollama_router.py:137-147), against the Spark-backed store.

Verbs: register, create-group, write, get, join, stats, list-features,
list-groups, route, sql (ad-hoc SQL over the store views, with ASOF
JOIN support). Store location comes from --db, else the
``FEATURE_STORE_DB`` env var (the reference's variable,
feature_store.py:23), else ``~/.blackroad/feature_store_spark``.

Run as ``python -m blackroad_feature_store_spark <verb> ...``.
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime, timezone
from pathlib import Path

from blackroad_feature_store_spark.store import (
    DTYPES,
    FREQ_BATCH,
    FREQ_STREAMING,
    FeatureStore,
    decode_value,
)

DEFAULT_DB = "~/.blackroad/feature_store_spark"


def _store(args) -> FeatureStore:
    from blackroad_feature_store_spark.session import get_spark

    base = args.db or os.environ.get("FEATURE_STORE_DB") or DEFAULT_DB
    spark = get_spark(app_name="feature-store-cli")
    return FeatureStore(spark, str(Path(base).expanduser()))


def cmd_register(args, store: FeatureStore) -> None:
    tags = args.tags.split(",") if args.tags else []
    feature = store.register_feature(
        name=args.name,
        entity_type=args.entity_type,
        dtype=args.dtype,
        source_query=args.source or "",
        description=args.description or "",
        tags=tags,
    )
    print(
        f"✓ Feature registered: {feature.name} [{feature.dtype}] "
        f"on {feature.entity_type}"
    )


def cmd_create_group(args, store: FeatureStore) -> None:
    features = args.features.split(",")
    group = store.create_group(
        name=args.name,
        features=features,
        entity_key=args.entity_key,
        frequency=args.frequency,
        version=args.version,
    )
    print(
        f"✓ Feature group created: {group.name} v{group.version} "
        f"({len(group.features)} features)"
    )
    print(f"  ID: {group.id}")


def cmd_write(args, store: FeatureStore) -> None:
    values = json.loads(args.values)
    store.write_features(
        group_id=args.group_id,
        entity_id=args.entity_id,
        feature_values=values,
        timestamp=getattr(args, "timestamp", None),
    )
    print(
        f"✓ Features written for entity '{args.entity_id}' "
        f"in group {args.group_id[:8]}..."
    )


def cmd_get(args, store: FeatureStore) -> None:
    values = store.get_features(
        group_id=args.group_id,
        entity_id=args.entity_id,
        as_of=getattr(args, "as_of", None),
        table_version=getattr(args, "table_version", None),
    )
    if values is None:
        print(f"No feature values found for entity '{args.entity_id}'.")
        return
    print(f"Features for '{args.entity_id}':")
    for k, v in values.items():
        print(f"  {k}: {v}")


def cmd_delete_entity(args, store: FeatureStore) -> None:
    n = store.delete_entity_records(args.group_id, args.entity_id)
    if n == 0:
        print(f"No records found for entity '{args.entity_id}'.")
    else:
        print(f"✓ Removed {n} record(s) for entity '{args.entity_id}'.")


def cmd_history(args, store: FeatureStore) -> None:
    entries = store.history()
    if not entries:
        print("No commits yet.")
        return
    print(f"{'ver':>5}  {'op':<14} {'added':>6} {'removed':>8}  ts")
    for e in entries:
        print(
            f"{e['version']:>5}  {e['op']:<14} {e['files_added']:>6} "
            f"{e['files_removed']:>8}  {e['ts']}"
        )


def cmd_changes(args, store: FeatureStore) -> None:
    feed = store.records_changes(
        since_version=args.since,
        to_version=args.to_version,
        group_id=args.group,
        include_deletes=args.include_deletes,
    )
    # .limit() IN the plan, not a driver-side rows[:n] slice: the
    # changes feed is unbounded by construction (VERDICT r15 #4 —
    # this was the one driver-side materialization with no bound).
    rows = (
        feed.orderBy("_commit_version", "timestamp", "entity_id")
        .limit(args.limit)
        .collect()
    )
    if not rows:
        print("No changes in range.")
        return
    for r in rows:
        values = {
            k: decode_value(v) for k, v in (r["feature_values"] or {}).items()
        }
        tag = (
            f"  [{r['_change_type']}]" if args.include_deletes else ""
        )
        print(
            f"v{r['_commit_version']}  {r['entity_id']}  "
            f"{r['timestamp'].isoformat()}  "
            f"{json.dumps(values, sort_keys=True)}{tag}"
        )
    if len(rows) == args.limit:
        print(f"… (truncated at --limit {args.limit})")


def cmd_rollup(args, store: FeatureStore) -> None:
    mv = store.refresh_entity_rollup(args.name, args.group_id)
    # Entity count via a scalar agg; only --limit rows ever reach the
    # driver (the .limit() is in the plan, not a rows[:n] slice).
    n_entities = mv.count()
    rows = mv.orderBy("entity_id").limit(args.limit).collect()
    print(f"✓ Rollup '{args.name}' refreshed: {n_entities} entities.")
    for r in rows:
        print(
            f"{r['entity_id']}  n={r['n_records']}  "
            f"first={r['first_ts'].isoformat()}  last={r['last_ts'].isoformat()}"
        )


def cmd_compact(args, store: FeatureStore) -> None:
    n = store.compact_records(
        group_id=args.group_id,
        target_rows_per_file=args.target_rows,
        cluster_by=args.cluster_by.split(",") if args.cluster_by else None,
        zorder=args.zorder,
    )
    print(f"✓ Compacted {n} record(s).")


def cmd_describe(args, store: FeatureStore) -> None:
    """One-screen operational summary of the store."""
    feats = store.list_features()
    groups = store.list_groups()
    hist = store.history()
    tags = store.list_tags()
    v = store.current_version
    files = store._log.live_files(v) if v is not None else []
    print(f"Store: {store.base_path}")
    print(f"Features: {len(feats)}   Groups: {len(groups)}")
    print(
        f"Record table: version {v if v is not None else '—'}, "
        f"{len(hist)} commit(s), {len(files)} live file(s)"
    )
    if tags:
        print("Tags: " + ", ".join(f"{n}→v{ver}" for n, ver in tags.items()))
    for g in groups:
        cons = store.list_constraints(g.id)
        extra = f", {len(cons)} constraint(s)" if cons else ""
        print(
            f"  group {g.name} v{g.version} [{g.id}] "
            f"features={','.join(g.features)}{extra}"
        )


def cmd_tag(args, store: FeatureStore) -> None:
    v = store.tag_version(args.name, version=args.version)
    print(f"✓ Tag '{args.name}' -> version {v}.")


def cmd_tags(args, store: FeatureStore) -> None:
    tags = store.list_tags()
    if not tags:
        print("No tags.")
        return
    for name, v in tags.items():
        print(f"{name}  version {v}")


def cmd_untag(args, store: FeatureStore) -> None:
    store.delete_tag(args.name)
    print(f"✓ Tag '{args.name}' deleted.")


def cmd_vacuum(args, store: FeatureStore) -> None:
    n = store.vacuum(
        retain_versions=args.retain,
        orphan_grace_seconds=args.orphan_grace,
    )
    print(f"✓ Vacuum removed {n} unreferenced data file(s).")


def cmd_join(args, store: FeatureStore) -> None:
    entities = args.entities.split(",")
    groups = args.groups.split(",")
    ts = args.timestamp or datetime.now(timezone.utc).replace(
        tzinfo=None
    ).isoformat()
    result = store.point_in_time_join(entities, groups, ts)
    print(json.dumps(result, indent=2, default=str))


def cmd_stats(args, store: FeatureStore) -> None:
    stats = store.statistics(args.group_id)
    print(f"Group: {stats['group_name']} | Records: {stats['total_records']}")
    print(
        f"{'Feature':<30} {'Count':>8} {'Nulls':>8} "
        f"{'Mean':>12} {'Min':>10} {'Max':>10}"
    )
    print("-" * 80)
    for fname, s in stats["features"].items():
        mean = f"{s['mean']:.4f}" if s["mean"] is not None else "N/A"
        mn = f"{s['min']}" if s["min"] is not None else "N/A"
        mx = f"{s['max']}" if s["max"] is not None else "N/A"
        print(
            f"{fname:<30} {s['count']:>8} {s['null_count']:>8} "
            f"{mean:>12} {mn:>10} {mx:>10}"
        )


def cmd_list_features(args, store: FeatureStore) -> None:
    features = store.list_features(
        entity_type=getattr(args, "entity_type", None)
    )
    if not features:
        print("No features registered.")
        return
    for f in features:
        tags = ", ".join(f.tags) if f.tags else ""
        print(f"  {f.name:<30} [{f.dtype:<6}] {f.entity_type:<15} {tags}")


def cmd_list_groups(args, store: FeatureStore) -> None:
    groups = store.list_groups()
    if not groups:
        print("No feature groups.")
        return
    for g in groups:
        feats = ", ".join(g.features)
        print(f"  {g.name} v{g.version} [{g.frequency}] → {feats}")


def cmd_dedup_spans(args, store: FeatureStore) -> None:
    """ExactSubstr over an external corpus path
    (`operators/exactsubstr.py`): without ``--rewrite``, print the
    span count and the first ``--limit`` spans (doc, start, end,
    tokens); with ``--rewrite OUT``, write the remove-all-but-one
    rewritten corpus as parquet and print the removal totals. The
    store handle is unused (the corpus lives outside the store) but
    its Spark session drives the job."""
    from pyspark.sql import functions as F

    from blackroad_feature_store_spark.operators.exactsubstr import (
        exact_substr_removal,
        exact_substr_spans,
    )
    from blackroad_feature_store_spark.sources.files import read_documents

    docs = read_documents(
        store.spark, args.path, format=args.format
    ).select("doc_id", "text")
    if args.rewrite:
        out = exact_substr_removal(docs, L=args.min_length)
        out.write.mode("overwrite").parquet(args.rewrite)
        tot = store.spark.read.parquet(args.rewrite).agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
            F.sum("n_removed").cast("long").alias("removed"),
        ).first()
        print(
            f"✓ Rewrote {tot['docs']} document(s) to {args.rewrite}: "
            f"removed {tot['removed']} of {tot['tokens']} token(s) "
            f"(L={args.min_length})"
        )
        return
    spans = exact_substr_spans(docs, L=args.min_length)
    rows = spans.orderBy("doc_id", "span_start").limit(args.limit).collect()
    n = spans.count()
    print(f"{n} duplicated span(s) of >= {args.min_length} token(s)")
    for r in rows:
        print(
            f"  doc {r['doc_id']}: tokens {r['span_start']}-"
            f"{r['span_end']} ({r['span_tokens']})"
        )


def cmd_sql(args, store: FeatureStore) -> None:
    """Ad-hoc SQL over the store's views (fs_features / fs_groups /
    fs_records / fs_history), with ``ASOF [LEFT] JOIN`` support — a
    statement containing the keyword routes through the
    `functions/asof_sql.py` front-end, anything else goes straight to
    ``spark.sql``."""
    import re as _re

    from blackroad_feature_store_spark.functions.asof_sql import asof_sql
    from blackroad_feature_store_spark.functions.sql_udfs import (
        register_sql_functions,
    )

    store.create_views()
    register_sql_functions(store.spark)  # fs_fingerprint & friends
    if _re.search(r"\bASOF\s+(LEFT\s+|INNER\s+)?JOIN\b", args.query, _re.I):
        df = asof_sql(store.spark, args.query)
    else:
        df = store.spark.sql(args.query)
    df.show(n=args.max_rows, truncate=False)


def cmd_route(args, _store=None) -> None:
    from blackroad_feature_store_spark.functions.router import (
        DEFAULT_BASE_URL,
        DEFAULT_MODEL,
        OLLAMA_TRIGGERS,
        route,
    )

    result = route(
        args.prompt,
        model=args.model or DEFAULT_MODEL,
        base_url=args.base_url or DEFAULT_BASE_URL,
    )
    if not result["routed"]:
        print(
            "No Ollama trigger found in prompt.\n"
            f"Supported triggers: {', '.join(sorted(OLLAMA_TRIGGERS))}"
        )
        return
    response = result["response"]
    print(response.get("response", json.dumps(response, indent=2)))


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="blackroad_feature_store_spark",
        description="ML Feature Store (PySpark-native)",
    )
    parser.add_argument("--db", help="Override store base path")
    sub = parser.add_subparsers(dest="command", metavar="COMMAND")

    p = sub.add_parser("register", help="Register a feature definition")
    p.add_argument("name", help="Feature name")
    p.add_argument("entity_type", help="Entity type (e.g. user, item)")
    p.add_argument("dtype", choices=sorted(DTYPES))
    p.add_argument("--source", help="Source query")
    p.add_argument("--description", help="Description")
    p.add_argument("--tags", help="Comma-separated tags")
    p.set_defaults(func=cmd_register)

    p = sub.add_parser("create-group", help="Create a feature group")
    p.add_argument("name", help="Group name")
    p.add_argument(
        "--features", required=True, help="Comma-separated feature names"
    )
    p.add_argument("--entity-key", required=True, help="Entity key column")
    p.add_argument(
        "--frequency",
        default=FREQ_BATCH,
        choices=[FREQ_BATCH, FREQ_STREAMING],
    )
    p.add_argument("--version", type=int, default=1)
    p.set_defaults(func=cmd_create_group)

    p = sub.add_parser("write", help="Write feature values for an entity")
    p.add_argument("group_id", help="Feature group ID")
    p.add_argument("entity_id", help="Entity ID")
    p.add_argument("values", help="JSON dict of feature values")
    p.add_argument("--timestamp", help="ISO timestamp override")
    p.set_defaults(func=cmd_write)

    p = sub.add_parser("get", help="Get feature values for an entity")
    p.add_argument("group_id")
    p.add_argument("entity_id")
    p.add_argument("--as-of", help="Point-in-time ISO timestamp")
    p.add_argument(
        "--table-version", type=int, default=None,
        help="Time-travel: read against this record-table version "
             "(commit time), combinable with --as-of (value time)",
    )
    p.set_defaults(func=cmd_get)

    p = sub.add_parser(
        "delete-entity",
        help="Erase all records of one entity from a group (GDPR path)",
    )
    p.add_argument("group_id")
    p.add_argument("entity_id")
    p.set_defaults(func=cmd_delete_entity)

    p = sub.add_parser(
        "history", help="Record-table commit history (versions, ops)"
    )
    p.set_defaults(func=cmd_history)

    p = sub.add_parser(
        "describe", help="One-screen store summary (groups, versions, tags)"
    )
    p.set_defaults(func=cmd_describe)

    p = sub.add_parser(
        "tag", help="Pin a named tag to a record-table version"
    )
    p.add_argument("name")
    p.add_argument(
        "--version", type=int, default=None,
        help="version to pin (default: current)",
    )
    p.set_defaults(func=cmd_tag)

    p = sub.add_parser("tags", help="List version tags")
    p.set_defaults(func=cmd_tags)

    p = sub.add_parser(
        "untag", help="Delete a version tag (releases its vacuum pin)"
    )
    p.add_argument("name")
    p.set_defaults(func=cmd_untag)

    p = sub.add_parser(
        "changes",
        help="Change data feed: records inserted after a version cursor",
    )
    p.add_argument(
        "since", type=int,
        help="exclusive version cursor (-1 for the full history)",
    )
    p.add_argument(
        "--to", dest="to_version", type=int, default=None,
        help="inclusive upper version (default: latest)",
    )
    p.add_argument("--group", default=None, help="restrict to one group id")
    p.add_argument(
        "--include-deletes", action="store_true",
        help="also surface rows removed by delete-entity commits "
             "(adds a _change_type column)",
    )
    p.add_argument(
        "--limit", type=int, default=1000,
        help="max change rows to print (pushed into the plan)",
    )
    p.set_defaults(func=cmd_changes)

    p = sub.add_parser(
        "rollup",
        help="Refresh (incrementally) and print a materialized "
             "per-entity rollup for a group",
    )
    p.add_argument("name", help="rollup name (cursor + data persist under it)")
    p.add_argument("group_id")
    p.add_argument(
        "--limit", type=int, default=20, help="max entities to print"
    )
    p.set_defaults(func=cmd_rollup)

    p = sub.add_parser(
        "compact", help="Rewrite the record table into right-sized files"
    )
    p.add_argument("group_id", nargs="?", default=None)
    p.add_argument(
        "--target-rows", type=int, default=1_000_000,
        help="rows per compacted file",
    )
    p.add_argument(
        "--cluster-by", default=None,
        help="comma-separated columns to range-cluster the rewrite on "
             "(keeps files skippable via manifest stats)",
    )
    p.add_argument(
        "--zorder", action="store_true",
        help="interleave multi-column clustering (Z-order) so files "
             "stay skippable on every clustered column, not just the "
             "first",
    )
    p.set_defaults(func=cmd_compact)

    p = sub.add_parser(
        "vacuum", help="Delete data files no retained version references"
    )
    p.add_argument(
        "--retain", type=int, default=1,
        help="number of most-recent versions to keep time-travelable",
    )
    p.add_argument(
        "--orphan-grace", type=float, default=3600.0,
        help="seconds an unreferenced file must age before deletion "
             "(protects in-flight writers); 0 waives the grace",
    )
    p.set_defaults(func=cmd_vacuum)

    p = sub.add_parser("join", help="Point-in-time join")
    p.add_argument("entities", help="Comma-separated entity IDs")
    p.add_argument("groups", help="Comma-separated group IDs")
    p.add_argument("--timestamp", help="ISO timestamp")
    p.set_defaults(func=cmd_join)

    p = sub.add_parser("stats", help="Feature group statistics")
    p.add_argument("group_id")
    p.set_defaults(func=cmd_stats)

    p = sub.add_parser("list-features", help="List feature definitions")
    p.add_argument("--entity-type", help="Filter by entity type")
    p.set_defaults(func=cmd_list_features)

    p = sub.add_parser("list-groups", help="List feature groups")
    p.set_defaults(func=cmd_list_groups)

    p = sub.add_parser(
        "sql",
        help="Run SQL over the store views (fs_features/fs_groups/"
             "fs_records/fs_history); supports ASOF [LEFT] JOIN",
    )
    p.add_argument("query", help="SQL statement")
    p.add_argument(
        "--max-rows", type=int, default=100,
        help="rows to display (default 100)",
    )
    p.set_defaults(func=cmd_sql)

    p = sub.add_parser(
        "dedup-spans",
        help="ExactSubstr span dedup over a document corpus: report "
             "(or --rewrite away) maximal verbatim repeated spans of "
             ">= L tokens (Lee et al. 2021)",
    )
    p.add_argument("path", help="corpus path (doc_id + text columns)")
    p.add_argument(
        "--format", default="parquet",
        choices=["parquet", "jsonl", "csv", "text", "orc"],
        help="corpus format (sources/files.py::read_documents)",
    )
    p.add_argument("--min-length", type=int, default=50, metavar="L",
                   help="minimum span length in tokens (default 50)")
    p.add_argument(
        "--rewrite", metavar="OUT",
        help="write the remove-all-but-one rewritten corpus (parquet) "
             "to OUT instead of reporting spans",
    )
    p.add_argument("--limit", type=int, default=20,
                   help="spans to print without --rewrite (default 20)")
    p.set_defaults(func=cmd_dedup_spans)

    p = sub.add_parser(
        "route", help="Route an @mention prompt to a local Ollama"
    )
    p.add_argument("prompt", help="Prompt text (may include @mention)")
    p.add_argument("--model", help="Ollama model ($OLLAMA_MODEL or llama3)")
    p.add_argument("--base-url", help="Ollama URL ($OLLAMA_BASE_URL)")
    p.set_defaults(func=cmd_route)

    return parser


def main(argv: list[str] | None = None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    if not args.command:
        parser.print_help()
        return
    if args.func is cmd_route:  # router mode needs no Spark session
        cmd_route(args)
        return
    args.func(args, _store(args))


if __name__ == "__main__":
    main()
