"""CLI smoke tests: the reference's verb surface driven end-to-end
against a temp store (register → create-group → write → get → join →
stats → list-*), plus the router prompt mode with mocked HTTP."""

import json
import re
import unittest.mock as mock

import pytest

from blackroad_feature_store_spark import cli


@pytest.fixture()
def run(spark, tmp_path, capsys):
    db = str(tmp_path / "clistore")

    def _run(*argv):
        cli.main(["--db", db, *argv])
        return capsys.readouterr().out

    return _run


def test_cli_full_journey(run):
    out = run("register", "age", "user", "int", "--tags", "demo,core")
    assert "✓ Feature registered: age [int] on user" in out
    run("register", "income", "user", "float")
    run("register", "city", "user", "str")

    out = run(
        "create-group", "user_demographics",
        "--features", "age,income,city", "--entity-key", "user_id",
    )
    assert "✓ Feature group created: user_demographics v1 (3 features)" in out
    gid = re.search(r"ID: (\S+)", out).group(1)

    out = run(
        "write", gid, "u1", json.dumps({"age": 25, "income": 60000.0}),
        "--timestamp", "2026-01-01T00:00:00",
    )
    assert "✓ Features written for entity 'u1'" in out
    run(
        "write", gid, "u1", json.dumps({"age": 26}),
        "--timestamp", "2026-02-01T00:00:00",
    )

    out = run("get", gid, "u1")
    assert "age: 26" in out

    out = run("get", gid, "u1", "--as-of", "2026-01-15T00:00:00")
    assert "age: 25" in out and "income: 60000.0" in out

    out = run("get", gid, "missing")
    assert "No feature values found" in out

    rows = json.loads(run("join", "u1,u2", gid))
    assert rows[0]["entity_id"] == "u1" and rows[0]["age"] == 26
    assert rows[1] == {
        "entity_id": "u2", "age": None, "income": None, "city": None
    }

    out = run("stats", gid)
    assert "Group: user_demographics | Records: 2" in out
    assert re.search(r"age\s+2\s+0", out)

    out = run("list-features")
    assert "age" in out and "[int" in out and "demo, core" in out

    out = run("list-features", "--entity-type", "nosuch")
    assert "No features registered." in out

    out = run("list-groups")
    assert "user_demographics v1 [batch] → age, income, city" in out

    out = run("delete-entity", gid, "u1")
    assert "Removed 2 record(s) for entity 'u1'" in out
    out = run("get", gid, "u1")
    assert "No feature values found" in out
    out = run("delete-entity", gid, "u1")
    assert "No records found" in out


def test_cli_route_no_trigger(run):
    out = run("route", "no mention here")
    assert "No Ollama trigger found" in out
    assert "@blackboxprogramming" in out


def test_cli_route_with_trigger(run):
    fake = {"model": "llama3", "response": "4", "done": True}
    resp = mock.MagicMock()
    resp.read.return_value = json.dumps(fake).encode()
    resp.__enter__ = lambda s: s
    resp.__exit__ = mock.MagicMock(return_value=False)
    with mock.patch("urllib.request.urlopen", return_value=resp):
        out = run("route", "@ollama what is 2+2?")
    assert out.strip() == "4"


def test_cli_history_and_vacuum(run):
    run("register", "age", "user", "int")
    out = run("create-group", "g", "--features", "age",
              "--entity-key", "user_id")
    gid = re.search(r"ID: ([a-f0-9-]+)", out).group(1)

    out = run("history")
    assert "No commits yet." in out

    run("write", gid, "u1", '{"age": 1}')
    run("write", gid, "u2", '{"age": 2}')
    run("delete-entity", gid, "u1")
    out = run("history")
    assert "delete-entity" in out and "append" in out
    # three commits: two appends + one delete, newest first
    assert out.strip().splitlines()[1].split()[0] == "2"

    out = run("vacuum")
    assert re.search(r"Vacuum removed [1-9]\d* unreferenced", out)
    out = run("get", gid, "u2")
    assert "age: 2" in out


def test_cli_compact_clustered(run):
    run("register", "age", "user", "int")
    import re as _re

    gid = _re.search(
        r"ID: (\S+)",
        run("create-group", "g", "--features", "age",
            "--entity-key", "user_id"),
    ).group(1)
    run("write", gid, "u1", '{"age": 1}')
    run("write", gid, "u2", '{"age": 2}')
    out = run("compact", gid, "--cluster-by", "timestamp")
    assert "Compacted 2 record(s)" in out
    assert "compact" in run("history")


def test_cli_sql_plain_and_asof(run):
    run("register", "score", "user", "int")
    out = run("create-group", "sqlg", "--features", "score",
              "--entity-key", "user_id")
    gid = re.search(r"ID: (\S+)", out).group(1)
    run("write", gid, "u1", json.dumps({"score": 1}),
        "--timestamp", "2026-01-01T00:00:00")
    run("write", gid, "u1", json.dumps({"score": 2}),
        "--timestamp", "2026-02-01T00:00:00")

    # plain SQL over the store views
    out = run("sql", "SELECT count(*) AS n FROM fs_records")
    assert re.search(r"\b2\b", out)
    out = run("sql",
              "SELECT name FROM fs_features WHERE dtype = 'int'")
    assert "score" in out


def test_cli_sql_asof_join_end_to_end(run, spark):
    run("register", "v", "user", "int")
    out = run("create-group", "asofg", "--features", "v",
              "--entity-key", "user_id")
    gid = re.search(r"ID: (\S+)", out).group(1)
    run("write", gid, "e1", json.dumps({"v": 10}),
        "--timestamp", "2026-01-01T00:00:00")
    run("write", gid, "e1", json.dumps({"v": 20}),
        "--timestamp", "2026-03-01T00:00:00")
    spark.createDataFrame(
        [("e1", "2026-02-01T00:00:00")], "entity_id string, at string"
    ).selectExpr("entity_id", "CAST(at AS TIMESTAMP) AS at") \
        .createOrReplaceTempView("fs_probes")

    out = run("sql", """
        SELECT p.entity_id AS entity_id,
               date_format(r.timestamp, 'yyyy-MM-dd') AS matched
        FROM fs_probes p ASOF LEFT JOIN fs_records r
          ON p.entity_id = r.entity_id AND p.at >= r.timestamp
    """)
    assert "2026-01-01" in out  # Feb probe matches the Jan snapshot
    assert "2026-03-01" not in out


def test_cli_changes_feed(run):
    import re as _re

    run("register", "age", "user", "int")
    gid = _re.search(
        r"ID: (\S+)",
        run("create-group", "g", "--features", "age",
            "--entity-key", "user_id"),
    ).group(1)
    run("write", gid, "u1", '{"age": 1}')        # version 0
    run("write", gid, "u2", '{"age": 2}')        # version 1
    out = run("changes", "0")
    assert "u2" in out and '{"age": 2}' in out
    assert "u1" not in out                        # before the cursor
    assert out.strip().startswith("v1")
    out = run("changes", "-1")                    # full history
    assert "u1" in out and "u2" in out
    out = run("changes", "1")
    assert "No changes in range." in out


def test_cli_rollup(run):
    run("register", "age", "user", "int")
    out = run("create-group", "g", "--features", "age",
              "--entity-key", "user_id")
    gid = re.search(r"ID: ([a-f0-9-]+)", out).group(1)
    run("write", gid, "u1", '{"age": 1}')
    run("write", gid, "u1", '{"age": 2}')
    run("write", gid, "u2", '{"age": 3}')
    out = run("rollup", "daily", gid)
    assert "refreshed: 2 entities" in out
    assert re.search(r"u1\s+n=2", out)
    assert re.search(r"u2\s+n=1", out)
    # second invocation: separate process, cursor + data reload from
    # disk; no new commits -> same snapshot
    out = run("rollup", "daily", gid)
    assert "refreshed: 2 entities" in out


def test_cli_tag_verbs(run):
    run("register", "age", "user", "int")
    out = run("create-group", "g", "--features", "age",
              "--entity-key", "user_id")
    gid = re.search(r"ID: ([a-f0-9-]+)", out).group(1)
    run("write", gid, "u1", '{"age": 30}')
    assert "version 0" in run("tag", "baseline")
    assert "baseline  version 0" in run("tags")
    run("write", gid, "u2", '{"age": 31}')
    assert "version 1" in run("tag", "baseline")  # retag moves it
    assert "deleted" in run("untag", "baseline")
    assert "No tags." in run("tags")


def test_cli_describe(run):
    run("register", "age", "user", "int")
    out = run("create-group", "g", "--features", "age",
              "--entity-key", "user_id")
    gid = re.search(r"ID: ([a-f0-9-]+)", out).group(1)
    run("write", gid, "u1", '{"age": 1}')
    run("tag", "snap")
    out = run("describe")
    assert "Features: 1" in out and "Groups: 1" in out
    assert "version 0, 1 commit(s), 1 live file(s)" in out
    assert "snap→v0" in out
    assert f"group g v1 [{gid}] features=age" in out


def test_cli_dedup_spans_and_rewrite(run, spark, tmp_path):
    """The dedup-spans verb (ExactSubstr over an external corpus):
    reports maximal spans, and --rewrite writes the remove-all-but-one
    corpus with correct removal totals."""
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "prefix alpha beta gamma delta epsilon zeta eta theta x"),
            (3, "totally unrelated words in this one here"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)

    out = run("dedup-spans", src, "--min-length", "5")
    assert "2 duplicated span(s) of >= 5 token(s)" in out
    assert "doc 1: tokens 1-8 (8)" in out
    assert "doc 2: tokens 2-9 (8)" in out

    clean = str(tmp_path / "clean")
    out = run("dedup-spans", src, "--min-length", "5", "--rewrite", clean)
    assert "Rewrote 3 document(s)" in out
    assert "removed 8 of" in out
    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in spark.read.parquet(clean).collect()
    }
    # keeper = first (doc, start): doc 1 untouched, doc 2 loses the span
    assert got[1][1] == 0 and got[3][1] == 0
    assert got[2] == ("prefix x", 8)


def test_cli_changes_and_rollup_limits_are_in_the_plan(run):
    """VERDICT r15 #4 pin: the `changes` and `rollup` verbs must bound
    the driver-side collect INSIDE the plan (.limit()), never collect
    everything and slice rows[:n] — the one place an unbounded
    materialization existed by construction."""
    import ast
    import inspect

    run("register", "age", "user", "int")
    gid = re.search(
        r"ID: (\S+)",
        run("create-group", "g", "--features", "age",
            "--entity-key", "user_id"),
    ).group(1)
    run("write", gid, "u1", '{"age": 1}')
    run("write", gid, "u2", '{"age": 2}')
    run("write", gid, "u3", '{"age": 3}')

    out = run("changes", "-1", "--limit", "2")
    assert "truncated at --limit 2" in out
    assert len([ln for ln in out.splitlines() if ln.startswith("v")]) == 2

    out = run("rollup", "daily", gid, "--limit", "1")
    assert "refreshed: 3 entities" in out  # count survives the limit
    assert len(re.findall(r"n=\d", out)) == 1

    # plan-level assertion: every .collect() in the two verbs is
    # chained after a .limit(...) call
    for fn in (cli.cmd_changes, cli.cmd_rollup):
        src = inspect.getsource(fn)
        for node in ast.walk(ast.parse(src)):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "collect"
            ):
                continue
            chain, cur = set(), node.func.value
            while isinstance(cur, ast.Call) and isinstance(
                cur.func, ast.Attribute
            ):
                chain.add(cur.func.attr)
                cur = cur.func.value
            assert "limit" in chain, (
                f"unbounded collect in {fn.__name__}: "
                f"{ast.dump(node)[:120]}"
            )
