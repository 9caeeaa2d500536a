"""Free-ride data-quality metrics via ``DataFrame.observe``.

The production problem: every pipeline wants row counts, null rates,
and constraint-violation counts on the data it just processed — but a
second ``df.agg(...)`` pass costs a second 100 TB scan. Spark's
observation API attaches aggregate metrics to the EXISTING plan: they
are computed inside the same tasks that produce the query's real
output, published when the action finishes, and cost no extra scan, no
extra shuffle, nothing.

Batch: ``observed, obs = observe_quality(df, checks); obs.get`` after
any action on ``observed``. Streaming: the same ``observe`` call works
on a streaming DataFrame and the metrics arrive per micro-batch in
``StreamingQueryProgress.observedMetrics`` — the standard hook for
live data-quality dashboards over an ingest stream.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def quality_checks(
    df: DataFrame,
    null_cols: list[str] | None = None,
    constraints: Mapping[str, Column] | None = None,
) -> dict[str, Column]:
    """Build the standard metric set: total rows, per-column null
    counts, and violation counts for named boolean constraints
    (``{"neg_price": col("price") < 0}`` counts rows where the
    condition holds — name them for the BAD case so nonzero == alarm).
    """
    metrics: dict[str, Column] = {
        "n_rows": F.count(F.lit(1)).alias("n_rows")
    }
    for c in null_cols or []:
        metrics[f"null_{c}"] = F.sum(
            F.when(F.col(c).isNull(), 1).otherwise(0)
        ).alias(f"null_{c}")
    for name, cond in (constraints or {}).items():
        metrics[name] = F.sum(
            F.when(cond, 1).otherwise(0)
        ).alias(name)
    return metrics


def observe_quality(
    df: DataFrame,
    null_cols: list[str] | None = None,
    constraints: Mapping[str, Column] | None = None,
    name: str = "quality",
) -> tuple[DataFrame, Observation | None]:
    """Attach quality metrics to ``df``'s plan without changing its
    rows.

    Batch: returns ``(observed_df, observation)`` — run any action on
    ``observed_df`` (or anything built on it), then read
    ``observation.get`` for the metric dict. One scan, two outputs.

    Streaming: ``Observation`` objects are batch-only, so the metrics
    are registered under ``name`` instead (second element is None) and
    arrive per micro-batch in
    ``StreamingQueryProgress.observedMetrics[name]``.
    """
    metrics = quality_checks(df, null_cols, constraints)
    if df.isStreaming:
        return df.observe(name, *metrics.values()), None
    obs = Observation(name)
    observed = df.observe(obs, *metrics.values())
    return observed, obs
