"""Declarative data-quality expectations over any DataFrame — the
Deequ/Great-Expectations-style validation pass a training-data or
feature pipeline runs before trusting a drop of data (reference
parity: the store's per-group ``add_constraint`` covers writes into
the feature store, ``store.py``; this operator validates ARBITRARY
tables — raw corpus drops, TPC-H-shaped facts, landed sources —
before they enter the pipeline at all).

Check catalog (``check`` key of each spec):

* ``not_null``       — ``col`` has no NULLs
* ``in_range``       — ``col`` within [``min``, ``max``] (either
                       bound optional; NULLs don't violate — pair
                       with ``not_null`` to forbid them)
* ``regex``          — ``col`` matches ``pattern`` (unanchored
                       ``rlike`` search semantics — anchor with ^$
                       for a full match; NULLs pass)
* ``accepted_values``— ``col`` ∈ ``values`` (NULLs pass)
* ``unique``         — ``cols`` combination has no duplicate rows
* ``foreign_key``    — every non-NULL ``col`` exists in ``ref_col``
                       of the ``ref`` DataFrame

Execution shape (the part that matters at 100 TB): every ROW-LOCAL
check (not_null / in_range / regex / accepted_values) compiles to one
conditional-sum aggregate and ALL of them run in a SINGLE scan with
map-side partial aggregation — adding a tenth check costs one more
codegen expression, not another pass. ``unique`` adds one hash
aggregation on its key columns (count of over-represented keys);
``foreign_key`` adds one semi/anti-join per referenced table
(broadcast when the ref side is a dimension, AQE decides). Nothing
ever collects row-level violations to the driver — the result is one
row PER CHECK: (check, target, total, violations, passed).

Violation semantics follow the dbt/Deequ convention: ``violations``
counts offending ROWS for row-local and foreign-key checks, and
offending DUPLICATE rows (rows beyond the first of each key) for
``unique`` — so ``violations == 0 ⇔ passed`` for every kind.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ROW_LOCAL = ("not_null", "in_range", "regex", "accepted_values")


def _violation_expr(spec: dict[str, Any]) -> Column:
    """Boolean column: this row violates the row-local check."""
    kind = spec["check"]
    c = F.col(spec["col"])
    if kind == "not_null":
        return c.isNull()
    if kind == "in_range":
        cond = F.lit(False)
        if "min" in spec:
            cond = cond | (c < F.lit(spec["min"]))
        if "max" in spec:
            cond = cond | (c > F.lit(spec["max"]))
        return c.isNotNull() & cond
    if kind == "regex":
        return c.isNotNull() & ~c.rlike(spec["pattern"])
    if kind == "accepted_values":
        return c.isNotNull() & ~c.isin(*spec["values"])
    raise ValueError(f"Unknown row-local check {kind!r}")


def _label(spec: dict[str, Any]) -> str:
    if spec["check"] == "unique":
        return ",".join(spec["cols"])
    return spec["col"]


def check_expectations(
    df: DataFrame, checks: list[dict[str, Any]]
) -> DataFrame:
    """Evaluate every check; one result row per check:
    (check, target, total, violations, passed)."""
    if not checks:
        raise ValueError("no checks given")
    for spec in checks:
        kind = spec.get("check")
        if kind not in _ROW_LOCAL and kind not in ("unique", "foreign_key"):
            raise ValueError(f"Unknown check kind {kind!r}")

    spark = df.sparkSession
    results: list[DataFrame] = []

    row_local = [s for s in checks if s["check"] in _ROW_LOCAL]
    if row_local:
        # coalesce: SUM over zero rows is NULL — an empty input must
        # report violations=0 / passed=true, not NULL (the documented
        # ``violations == 0 ⇔ passed`` contract; a gate filtering
        # WHERE NOT passed would otherwise silently wave an empty
        # drop through with passed=NULL).
        aggs = [F.count(F.lit(1)).alias("__total")] + [
            F.coalesce(
                F.sum(F.when(_violation_expr(s), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__v{i}")
            for i, s in enumerate(row_local)
        ]
        one = df.agg(*aggs)
        # unpivot the single row into (check, target, total, violations)
        pairs: list[Column] = []
        for i, s in enumerate(row_local):
            pairs.append(
                F.struct(
                    F.lit(s["check"]).alias("check"),
                    F.lit(_label(s)).alias("target"),
                    F.col("__total").alias("total"),
                    F.col(f"__v{i}").alias("violations"),
                )
            )
        results.append(
            one.select(F.explode(F.array(*pairs)).alias("r")).select("r.*")
        )

    for s in checks:
        if s["check"] == "unique":
            cols = s["cols"]
            dup = df.groupBy(*[F.col(c) for c in cols]).agg(
                F.count(F.lit(1)).alias("__n")
            )
            results.append(
                dup.agg(
                    F.coalesce(F.sum("__n"), F.lit(0))
                    .cast("long")
                    .alias("total"),
                    F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                    .cast("long")
                    .alias("violations"),
                ).select(
                    F.lit("unique").alias("check"),
                    F.lit(_label(s)).alias("target"),
                    "total",
                    "violations",
                )
            )
        elif s["check"] == "foreign_key":
            # ONE left equi-join (broadcast-able dimension) + one
            # aggregation — total and orphan count in the same pass,
            # no scalar crossJoin in the plan. The ref side is
            # deduplicated so the left join cannot fan out rows.
            ref = s["ref"].select(
                F.col(s["ref_col"]).alias("__ref_key")
            ).distinct()
            keyed = df.select(F.col(s["col"]).alias("__key"))
            joined = keyed.join(
                ref, keyed["__key"] == ref["__ref_key"], "left"
            )
            results.append(
                joined.agg(
                    F.count(F.lit(1)).cast("long").alias("total"),
                    F.coalesce(
                        F.sum(
                            F.when(
                                F.col("__key").isNotNull()
                                & F.col("__ref_key").isNull(),
                                1,
                            ).otherwise(0)
                        ),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("violations"),
                ).select(
                    F.lit("foreign_key").alias("check"),
                    F.lit(_label(s)).alias("target"),
                    "total",
                    "violations",
                )
            )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        "check",
        "target",
        "total",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )
