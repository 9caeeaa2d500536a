"""``ASOF JOIN`` SQL syntax — the optional parser extension from
SURVEY.md §4.2/§7.2.

Spark has no ASOF JOIN in its SQL dialect (the library builder is
``operators/asof.py::as_of_join``). This module adds the SQL spelling
as a Python-level front-end: :func:`asof_sql` recognizes one
``ASOF [LEFT] JOIN`` clause in an otherwise-ordinary SELECT, lowers it
to the same join-then-window-top-1 plan the builder emits, and hands
the rest of the statement to ``spark.sql`` untouched. A true Catalyst
parser extension would need compiled Scala; the survey explicitly
scoped this as optional — the Python front-end covers the user-visible
syntax (DuckDB/Snowflake shape) with zero JVM surface.

Grammar (constrained, documented):

.. code-block:: sql

    SELECT <anything>
    FROM <left_view> [AS] <l>
    ASOF [LEFT] JOIN <right_view> [AS] <r>
      ON l.k1 = r.k1 [AND l.k2 = r.k2 ...] AND l.ts >= r.ts
    [WHERE / GROUP BY / ORDER BY / LIMIT ...]

* both join inputs are table/view names (register temp views first);
* exactly ONE inequality (``>=``/``>``/``<=``/``<`` between the two
  aliases, either side first) — it selects the as-of instant;
* every other ON condition is an alias-qualified equality;
* column references in the rest of the statement must be
  alias-qualified (``l.x``, ``r.y``) — standard practice for a
  two-table join.

Match semantics: per left row, the single right row with the greatest
right-timestamp satisfying the inequality (ties broken by the
remaining right columns, descending, for determinism). ``ASOF JOIN``
is inner (unmatched left rows drop); ``ASOF LEFT JOIN`` keeps them
with NULL right columns — the DuckDB contract, which the catalog pins
query-for-query against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_ASOF_RE = re.compile(
    r"\bFROM\s+(?P<lt>\w+)\s+(?:AS\s+)?(?P<la>\w+)\s+"
    r"ASOF\s+(?P<how>LEFT\s+|INNER\s+)?JOIN\s+"
    r"(?P<rt>\w+)\s+(?:AS\s+)?(?P<ra>\w+)\s+"
    r"ON\s+(?P<on>.*?)"
    r"(?P<rest>\bWHERE\b.*|\bGROUP\s+BY\b.*|\bORDER\s+BY\b.*"
    r"|\bLIMIT\b.*|\Z)",
    re.I | re.S,
)
_EQ_RE = re.compile(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$")
_INEQ_RE = re.compile(r"^\s*(\w+)\.(\w+)\s*(>=|<=|>|<)\s*(\w+)\.(\w+)\s*$")


def asof_sql(spark: SparkSession, query: str) -> DataFrame:
    """Run a SELECT containing one ``ASOF [LEFT] JOIN`` clause."""
    m = _ASOF_RE.search(query)
    if not m:
        raise ValueError(
            "no 'FROM <t> <a> ASOF [LEFT] JOIN <t> <a> ON ...' clause "
            "found (both inputs must be named tables/views with aliases)"
        )
    la, ra = m.group("la"), m.group("ra")
    if la == ra:
        raise ValueError(f"join aliases must differ (both {la!r})")
    how = "left" if (m.group("how") or "").strip().upper() == "LEFT" else "inner"

    eqs: list[tuple[str, str]] = []  # (left col, right col)
    ineq: tuple[str, str, bool] | None = None  # (lts, rts, strict)
    for cond in re.split(r"\bAND\b", m.group("on"), flags=re.I):
        em_ = _EQ_RE.match(cond)
        if em_:
            a1, c1, a2, c2 = em_.groups()
            if {a1, a2} != {la, ra}:
                raise ValueError(f"equality must relate {la} and {ra}: {cond!r}")
            eqs.append((c1, c2) if a1 == la else (c2, c1))
            continue
        im = _INEQ_RE.match(cond)
        if im:
            if ineq is not None:
                raise ValueError("exactly one inequality condition allowed")
            a1, c1, op, a2, c2 = im.groups()
            if {a1, a2} != {la, ra}:
                raise ValueError(
                    f"inequality must relate {la} and {ra}: {cond!r}"
                )
            # Normalize to: right_ts (<|<=) left_ts — "latest right at
            # or before the left instant".
            if a1 == la:  # l.ts OP r.ts
                if op in (">=", ">"):
                    ineq = (c1, c2, op == ">")
                else:
                    raise ValueError(
                        f"unsupported as-of direction {cond!r}: the left "
                        "side must look back (l.ts >= r.ts)"
                    )
            else:  # r.ts OP l.ts
                if op in ("<=", "<"):
                    ineq = (c2, c1, op == "<")
                else:
                    raise ValueError(
                        f"unsupported as-of direction {cond!r}: the right "
                        "side must precede (r.ts <= l.ts)"
                    )
            continue
        raise ValueError(f"unparseable ON condition: {cond!r}")
    if ineq is None:
        raise ValueError("ASOF JOIN needs one inequality (the as-of bound)")
    lts, rts, strict = ineq

    left = spark.table(m.group("lt"))
    right = spark.table(m.group("rt"))
    # Alias-prefix every column (l.x -> l__x) so the two sides can
    # never collide and the outer statement's qualified references
    # rewrite mechanically.
    l2 = left.select(
        *[F.col(c).alias(f"{la}__{c}") for c in left.columns]
    ).withColumn("__asof_rid", F.monotonically_increasing_id())
    r2 = right.select(*[F.col(c).alias(f"{ra}__{c}") for c in right.columns])

    conds = [l2[f"{la}__{lc}"] == r2[f"{ra}__{rc}"] for lc, rc in eqs]
    bound = (
        r2[f"{ra}__{rts}"] < l2[f"{la}__{lts}"]
        if strict
        else r2[f"{ra}__{rts}"] <= l2[f"{la}__{lts}"]
    )
    joined = l2.join(r2, on=conds + [bound], how=how)

    # Top-1 per LEFT ROW: greatest right ts, remaining ORDERABLE right
    # columns as deterministic tiebreakers (maps and other unorderable
    # types are skipped — a records table's feature map must not break
    # the sort). Same shape as as_of_join's per-row branch
    # (operators/asof.py) — Spark plans it as WindowGroupLimit, so the
    # per-key top-1 happens map-side before the exchange.
    from pyspark.sql import types as T

    orderable = (
        T.NumericType, T.StringType, T.TimestampType, T.TimestampNTZType,
        T.DateType, T.BooleanType, T.BinaryType,
    )
    order = [F.col(f"{ra}__{rts}").desc_nulls_last()] + [
        F.col(f.name).desc_nulls_last()
        for f in r2.schema.fields
        if f.name != f"{ra}__{rts}" and isinstance(f.dataType, orderable)
    ]
    top = (
        joined.withColumn(
            "__asof_rn",
            F.row_number().over(
                Window.partitionBy("__asof_rid").orderBy(*order)
            ),
        )
        .where(F.col("__asof_rn") == 1)
        .drop("__asof_rn", "__asof_rid")
    )

    view = f"__asof_{uuid.uuid4().hex[:12]}"
    top.createOrReplaceTempView(view)
    outer = query[: m.start()] + f"FROM {view}\n" + m.group("rest")
    outer = re.sub(rf"\b{la}\.(\w+)", rf"{la}__\1", outer)
    outer = re.sub(rf"\b{ra}\.(\w+)", rf"{ra}__\1", outer)
    return spark.sql(outer)
