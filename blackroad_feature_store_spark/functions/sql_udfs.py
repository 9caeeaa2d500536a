"""SQL-surface function library: the engine's text primitives as
Spark 4 SQL UDFs (``CREATE FUNCTION ... RETURN <expr>``), so pure-SQL
users — ``spark.sql`` notebooks, JDBC clients, the CLI ``sql`` verb —
get the same fingerprinting/token-counting/quality primitives the
DataFrame operators use, without touching Python.

SQL UDFs are expression macros, not black boxes: Catalyst inlines the
RETURN expression into the calling plan, so they cost nothing over the
equivalent hand-written SQL, stay inside whole-stage codegen, and
predicates through them remain optimizable. (Contrast with
``spark.udf.register`` Python UDFs — row-at-a-time, opaque to the
optimizer; nothing here uses those.)

Parity with the column-function originals (operators/text.py) is
pinned by tests that run both on the same corpus sample — if either
side drifts, the suite fails.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, return type, body)
_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # md5 of whitespace-normalized, lowercased text (text.fingerprint)
    "fs_fingerprint": (
        "(t STRING)",
        "STRING",
        r"md5(lower(regexp_replace(trim(t), '\\s+', ' ')))",
    ),
    # whitespace token count (text.token_count)
    "fs_token_count": (
        "(t STRING)",
        "INT",
        r"size(filter(split(trim(t), '\\s+'), x -> x != ''))",
    ),
    # BPE-ish token estimate (text.bpe_token_count)
    "fs_bpe_token_count": (
        "(t STRING)",
        "INT",
        r"regexp_count(t, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')",
    ),
    # word n-gram presence key used by dedup (join of 1..n tokens)
    "fs_ngram": (
        "(t STRING, start INT, n INT)",
        "STRING",
        r"""array_join(slice(filter(split(trim(lower(t)), '\\s+'),
                                    x -> x != ''), start, n), ' ')""",
    ),
    # alpha-ratio quality feature (share of [a-z ] chars after lower)
    "fs_alpha_ratio": (
        "(t STRING)",
        "DOUBLE",
        r"""CASE WHEN length(t) > 0
                 THEN round(length(regexp_replace(lower(t), '[^a-z ]', ''))
                            / CAST(length(t) AS DOUBLE), 6)
                 ELSE CAST(NULL AS DOUBLE) END""",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every engine SQL UDF as a TEMPORARY function in the
    session (idempotent: CREATE OR REPLACE). Returns the names."""
    for name, (sig, ret, body) in _FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    return sorted(_FUNCTIONS)
