"""ASOF JOIN SQL front-end (functions/asof_sql.py) — semantics, join
types, inequality directions, error contract, and plan shape. The
cross-engine pin (vs DuckDB's native ASOF JOIN) is the
`core_asof_sql_join` catalog entry; these tests pin the front-end
itself on hand-computed data."""

import pytest
from pyspark.sql import functions as F

from blackroad_feature_store_spark.functions.asof_sql import asof_sql

TRADES = [
    # (sym, t, qty)
    ("A", 10, 100),
    ("A", 20, 200),
    ("B", 15, 300),
    ("C", 10, 400),  # no quote for C
]
QUOTES = [
    # (sym, t, px)
    ("A", 5, 1.0),
    ("A", 10, 2.0),   # equal-time quote: matched by >=, not by >
    ("A", 18, 3.0),
    ("B", 1, 4.0),
]


@pytest.fixture()
def views(spark):
    spark.createDataFrame(TRADES, "sym string, t long, qty long") \
        .createOrReplaceTempView("asof_t_trades")
    spark.createDataFrame(QUOTES, "sym string, t long, px double") \
        .createOrReplaceTempView("asof_t_quotes")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_left_asof_join_latest_at_or_before(spark, views):
    out = asof_sql(spark, """
        SELECT t.sym AS sym, t.t AS trade_t, q.t AS quote_t, q.px AS px
        FROM asof_t_trades t ASOF LEFT JOIN asof_t_quotes q
          ON t.sym = q.sym AND t.t >= q.t
    """)
    assert _rows(out) == sorted([
        ("A", 10, 10, 2.0),   # equal time wins over t=5
        ("A", 20, 18, 3.0),   # latest of {5, 10, 18}
        ("B", 15, 1, 4.0),
        ("C", 10, None, None),  # LEFT: unmatched row kept
    ])


def test_inner_asof_join_drops_unmatched(spark, views):
    out = asof_sql(spark, """
        SELECT t.sym AS sym, q.px AS px
        FROM asof_t_trades t ASOF JOIN asof_t_quotes q
          ON t.sym = q.sym AND t.t >= q.t
    """)
    assert ("C", None) not in _rows(out)
    assert len(out.collect()) == 3


def test_strict_inequality_excludes_equal_time(spark, views):
    out = asof_sql(spark, """
        SELECT t.sym AS sym, t.t AS trade_t, q.t AS quote_t
        FROM asof_t_trades t ASOF LEFT JOIN asof_t_quotes q
          ON t.sym = q.sym AND t.t > q.t
    """)
    got = {(r["sym"], r["trade_t"]): r["quote_t"] for r in out.collect()}
    assert got[("A", 10)] == 5  # t=10 quote excluded under strict >


def test_flipped_inequality_side_normalizes(spark, views):
    out = asof_sql(spark, """
        SELECT t.sym AS sym, t.t AS trade_t, q.t AS quote_t
        FROM asof_t_trades t ASOF LEFT JOIN asof_t_quotes q
          ON q.t <= t.t AND t.sym = q.sym
    """)
    got = {(r["sym"], r["trade_t"]): r["quote_t"] for r in out.collect()}
    assert got[("A", 20)] == 18


def test_outer_clauses_pass_through(spark, views):
    out = asof_sql(spark, """
        SELECT t.sym AS sym, sum(q.px) AS total_px
        FROM asof_t_trades t ASOF JOIN asof_t_quotes q
          ON t.sym = q.sym AND t.t >= q.t
        WHERE t.qty > 100
        GROUP BY t.sym
        ORDER BY sym
    """)
    assert [tuple(r) for r in out.collect()] == [("A", 3.0), ("B", 4.0)]


def test_plan_uses_window_group_limit(spark, views):
    # The lowered plan must keep the map-side top-1 (WindowGroupLimit),
    # same as the builder — losing it would shuffle every candidate.
    out = asof_sql(spark, """
        SELECT t.sym AS sym, q.px AS px
        FROM asof_t_trades t ASOF JOIN asof_t_quotes q
          ON t.sym = q.sym AND t.t >= q.t
    """)
    plan = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
    assert "WindowGroupLimit" in plan


def test_randomized_parity_with_brute_force(spark):
    # Property-style (same pattern as test_pit_property.py): random
    # spine/record histories, assert the SQL front-end's result equals
    # a brute-force Python scan. Unique (key, t) on the right keeps
    # the expected match unambiguous.
    import random

    rng = random.Random(20260813)
    rights = {}
    for _ in range(200):
        rights[(f"k{rng.randrange(8)}", rng.randrange(1000))] = rng.random()
    right_rows = [(k, t, v) for (k, t), v in rights.items()]
    left_rows = [
        (i, f"k{rng.randrange(10)}", rng.randrange(1100))  # some keys absent
        for i in range(150)
    ]
    spark.createDataFrame(left_rows, "rid long, k string, t long") \
        .createOrReplaceTempView("asof_rand_l")
    spark.createDataFrame(right_rows, "k string, t long, v double") \
        .createOrReplaceTempView("asof_rand_r")

    out = asof_sql(spark, """
        SELECT l.rid AS rid, r.t AS rt, r.v AS rv
        FROM asof_rand_l l ASOF LEFT JOIN asof_rand_r r
          ON l.k = r.k AND l.t >= r.t
    """)
    got = {r["rid"]: (r["rt"], r["rv"]) for r in out.collect()}
    assert len(got) == len(left_rows)
    for rid, k, t in left_rows:
        cands = [(rt, v) for (rk, rt), v in rights.items()
                 if rk == k and rt <= t]
        expect = max(cands) if cands else (None, None)
        assert got[rid] == expect, (rid, k, t)


@pytest.mark.parametrize(
    "bad,msg",
    [
        ("SELECT * FROM asof_t_trades t JOIN asof_t_quotes q ON t.sym = q.sym",
         "no 'FROM"),
        ("SELECT * FROM asof_t_trades t ASOF JOIN asof_t_quotes q ON t.sym = q.sym",
         "one inequality"),
        ("SELECT * FROM asof_t_trades t ASOF JOIN asof_t_quotes q "
         "ON t.sym = q.sym AND t.t >= q.t AND t.qty < q.px",
         "exactly one inequality"),
        ("SELECT * FROM asof_t_trades t ASOF JOIN asof_t_quotes q "
         "ON t.sym = q.sym AND t.t <= q.t",
         "look back"),
    ],
)
def test_error_contract(spark, views, bad, msg):
    with pytest.raises(ValueError, match=msg):
        asof_sql(spark, bad)


# -- round-6 hardening: literals, alias case, subqueries, view leak ---------

def test_alias_rewrite_is_case_insensitive(spark, views):
    # FROM declares alias T; the select list says t.sym — legal SQL
    # (Spark resolves identifiers case-insensitively) and must rewrite.
    out = asof_sql(spark, """
        SELECT t.sym AS sym, Q.px AS px
        FROM asof_t_trades T ASOF JOIN asof_t_quotes q
          ON T.sym = q.sym AND t.t >= Q.t
    """)
    assert ("A", 2.0) in _rows(out)


def test_string_literal_containing_qualified_ref_not_rewritten(spark, views):
    out = asof_sql(spark, """
        SELECT t.sym AS sym, 'literal t.sym stays' AS note, q.px AS px
        FROM asof_t_trades t ASOF JOIN asof_t_quotes q
          ON t.sym = q.sym AND t.t >= q.t
    """)
    assert out.select("note").first()["note"] == "literal t.sym stays"


def test_asof_only_inside_string_literal_rejected(spark, views):
    with pytest.raises(ValueError, match="string literal"):
        asof_sql(
            spark,
            "SELECT 'this mentions ASOF JOIN only' AS s FROM asof_t_trades",
        )


def test_subquery_in_from_rejected_clearly(spark, views):
    with pytest.raises(ValueError, match="subqueries in FROM"):
        asof_sql(spark, """
            SELECT t.sym FROM (SELECT * FROM asof_t_trades) t
            ASOF JOIN asof_t_quotes q ON t.sym = q.sym AND t.t >= q.t
        """)


def test_no_temp_view_leak(spark, views):
    for _ in range(3):
        asof_sql(spark, """
            SELECT t.sym AS sym, q.px AS px
            FROM asof_t_trades t ASOF JOIN asof_t_quotes q
              ON t.sym = q.sym AND t.t >= q.t
        """).collect()
    leaked = [
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("__asof_")
    ]
    assert leaked == []
