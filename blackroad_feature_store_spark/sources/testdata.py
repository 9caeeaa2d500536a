"""Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).

All queries go through :func:`load` so schema normalization lives in one
place:

* ``events.parquet`` stores TIMESTAMP(NANOS), which Spark has no native
  type for. We flip ``spark.sql.legacy.parquet.nanosAsLong`` (a runtime
  SQL conf — safe to set on a live session, including the driver's) and
  rebuild a microsecond timestamp. Column set and name stay identical.
* Everything else is read as-is; filters/projections push down to the
  scan (verify with ``.explain`` — PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def testdata_root() -> str:
    """Root directory holding the ``sf*`` testdata dirs.

    Defaults to the driver's fixture location; override with
    ``SPARK_GRAFT_TESTDATA_ROOT`` to run the suite on another machine
    (generate compatible tables with ``tools/make_testdata.py`` —
    value-pinned artifacts like PLANDIGESTS skip automatically when
    the root carries the generator's ``GENERATED.marker``)."""
    return os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")


def sf_dir(sf: str) -> str:
    """Path of one scale-factor dir, e.g. ``sf_dir("sf0.01")``."""
    return os.path.join(testdata_root(), sf)


def is_generated_testdata() -> bool:
    """True when the active testdata was synthesized by
    ``tools/make_testdata.py`` rather than the driver — schemas and
    statistics match, exact values do not, so value-pinned artifacts
    (plan digests pinned on the driver fixtures) must not be compared
    against it."""
    return os.path.exists(os.path.join(testdata_root(), "GENERATED.marker"))


DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", sf_dir("sf0.1"))

# Dimension tables small enough to broadcast at ANY scale factor —
# region/nation are fixed-size in TPC-H-style generators.
BROADCAST_TABLES = ("region", "nation")


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one testdata table with normalized schema."""
    # Every table with timestamps (orders, lineitem, events) is
    # date_format-ed somewhere downstream, and LTZ formatting depends on
    # the session timezone. Pin it unconditionally — not just on the
    # events branch — so results never depend on which table loaded
    # first in an externally created non-UTC session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table == "events":
        # Older generations wrote TIMESTAMP(NANOS) → read as long,
        # convert to micros timestamp.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # Integer division: ns-since-epoch (~1.7e18) exceeds double's
            # 53-bit mantissa, so `/ 1000` would round some stamps ±1µs.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _ntz_to_utc(df)
    return _ntz_to_utc(spark.read.parquet(path))


def _ntz_to_utc(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to plain TIMESTAMP.

    Current testdata generations write parquet TIMESTAMP(MICROS,
    isAdjustedToUTC=false), which Spark 4 reads as TIMESTAMP_NTZ —
    a type `unix_micros`/`window` reject. The session zone is pinned
    UTC one line above, so the cast reinterprets the same wall-clock
    values losslessly, and every downstream operator (and the DuckDB
    oracle, which reads the files as naive timestamps) sees identical
    instants."""
    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
