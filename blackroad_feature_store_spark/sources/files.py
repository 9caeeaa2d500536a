"""Generic document sources: land a corpus from parquet / JSONL / CSV /
raw text into the canonical ``documents`` shape every operator in this
engine consumes (doc_id, text, lang, source, n_chars).

Spark-first: each format maps to the corresponding built-in reader
(``spark.read.json/csv/text/parquet``) so schema inference, predicate
pushdown (parquet), malformed-row handling (PERMISSIVE/DROPMALFORMED)
and partitioned-directory discovery are all the battle-tested Spark
implementations — none of it is reimplemented here. Missing canonical
columns are derived (``n_chars``) or null-filled (``lang``), and
``doc_id`` falls back to a stable hash of the text when the source has
no id column — deterministic across runs, unlike
``monotonically_increasing_id`` which depends on partition layout.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CANONICAL_COLUMNS = ("doc_id", "text", "lang", "source", "n_chars")

#: Default XML row element. Spark 4 ships the XML datasource built in
#: (the former spark-xml package, merged in SPARK-44265), so no extra
#: jar is needed; each ``<doc>...</doc>`` element is one document row.
XML_ROW_TAG = "doc"


def avro_available(spark: SparkSession) -> bool:
    """True when the ``spark-avro`` datasource module is on the
    classpath. Avro has been an EXTERNAL Spark module since 2.4
    (``org.apache.spark:spark-avro``) and is NOT bundled with the pip
    ``pyspark`` distribution — only the core avro-* serialization jars
    are. The probe runs Spark's own provider resolution
    (``DataSource.lookupDataSource``) — no job, no data touched — so
    callers can gate avro round-trip tests/queries with a documented
    skip instead of a deep failure at read time. A mere
    ``Class.forName("...sql.avro.AvroFileFormat")`` is NOT sufficient:
    Spark 4's spark-sql jar ships that class, but the
    ``DataSourceRegister`` service registration (and DefaultSource)
    live only in the external spark-avro jar, so the format string
    "avro" still fails to resolve without it."""
    try:
        jvm = spark._jvm  # noqa: SLF001 — JVM-side probe, no job
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()  # noqa: SLF001
        )
        return True
    except Exception:
        return False


def _read_avro(spark: SparkSession, path: str, opts: dict) -> DataFrame:
    try:
        return spark.read.options(**opts).format("avro").load(path)
    except AnalysisException as exc:
        if "FAILED_TO_FIND_DATA_SOURCE" in str(exc) or (
            "Failed to find data source" in str(exc)
        ):
            raise RuntimeError(
                "Avro support needs the external spark-avro module "
                "(org.apache.spark:spark-avro_2.13) on the classpath; "
                "it is not bundled with the pip pyspark distribution. "
                "Launch with --packages org.apache.spark:spark-avro_"
                "2.13:<spark-version> or add the jar to jars/."
            ) from exc
        raise


def read_documents(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    text_col: str = "text",
    id_col: str | None = "doc_id",
    source_label: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a corpus in any supported format as canonical documents.

    ``format``: parquet | orc | jsonl | csv | text | xml | avro.
    ``text`` mode treats each LINE as one document (the common
    one-example-per-line training-data layout).
    ``xml`` uses Spark 4's built-in XML datasource (one row per
    ``rowTag`` element, default ``doc``); note the reader's
    ``ignoreSurroundingSpaces`` default trims leading/trailing
    whitespace inside elements and a fully empty element lands as
    NULL, so XML is an interchange format, not a byte-exact archive —
    parquet/ORC are. ``avro`` needs the external spark-avro module
    (see :func:`avro_available`); without it the read raises a
    RuntimeError naming the missing package.
    ``id_col=None`` (or a missing column) derives ``doc_id`` from
    ``xxhash64(text)`` — stable across runs and partitionings.
    """
    opts = dict(options or {})
    if format == "parquet":
        df = spark.read.options(**opts).parquet(path)
    elif format == "orc":
        df = spark.read.options(**opts).orc(path)
    elif format == "xml":
        opts.setdefault("rowTag", XML_ROW_TAG)
        df = spark.read.options(**opts).format("xml").load(path)
    elif format == "avro":
        df = _read_avro(spark, path, opts)
    elif format == "jsonl":
        df = spark.read.options(**opts).json(path)
    elif format == "csv":
        opts.setdefault("header", "true")
        opts.setdefault("multiLine", "true")
        opts.setdefault("escape", '"')
        df = spark.read.options(**opts).csv(path)
    elif format == "text":
        df = spark.read.options(**opts).text(path).withColumnRenamed(
            "value", text_col
        )
    else:
        raise ValueError(
            f"Unsupported format '{format}' "
            "(expected parquet, orc, jsonl, csv, text, xml, or avro)"
        )

    if text_col != "text":
        df = df.withColumnRenamed(text_col, "text")
    cols = set(df.columns)
    if "text" not in cols:
        raise ValueError(
            f"Source at {path} has no '{text_col}' column (found: "
            f"{sorted(cols)})"
        )

    if id_col and id_col in cols:
        if id_col != "doc_id":
            df = df.withColumnRenamed(id_col, "doc_id")
        df = df.withColumn("doc_id", F.col("doc_id").cast("long"))
    else:
        df = df.withColumn("doc_id", F.xxhash64("text"))

    if "lang" not in df.columns:
        df = df.withColumn("lang", F.lit(None).cast("string"))
    if "source" not in df.columns:
        df = df.withColumn(
            "source",
            F.lit(source_label)
            if source_label is not None
            else F.input_file_name(),
        )
    df = df.withColumn("n_chars", F.length("text").cast("long"))
    return df.select(*CANONICAL_COLUMNS)


def write_documents(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write documents in the canonical shape. Parquet (columnar,
    splittable, statistics for pushdown) is the right sink for anything
    downstream of ingest; JSONL is offered for interchange."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if format == "parquet":
        w.parquet(path)
    elif format == "orc":
        w.orc(path)
    elif format == "jsonl":
        w.json(path)
    elif format == "xml":
        w.option("rowTag", XML_ROW_TAG).format("xml").save(path)
    elif format == "avro":
        try:
            w.format("avro").save(path)
        except AnalysisException as exc:
            if "FAILED_TO_FIND_DATA_SOURCE" in str(exc) or (
                "Failed to find data source" in str(exc)
            ):
                raise RuntimeError(
                    "Avro support needs the external spark-avro module "
                    "(org.apache.spark:spark-avro_2.13); it is not "
                    "bundled with the pip pyspark distribution."
                ) from exc
            raise
    else:
        raise ValueError(f"Unsupported sink format '{format}'")
