"""Skew-mitigation helpers.

AQE's skew-join splitting (on in session.py) handles skewed JOINS at
runtime; skewed AGGREGATIONS over few hot keys still funnel every row
of a hot key through one reducer in the single-stage plan. The classic
fix is salting: aggregate on (key, salt) first — spreading each hot key
over ``num_salts`` reducers — then combine the partials per key. Both
stages are map-side combinable; results are identical to the direct
aggregation for any commutative-associative aggregate.

Spark's partial aggregation already does per-PARTITION combining, so
salting only wins when the number of input partitions is large enough
that per-key partials themselves skew the final exchange — i.e. at real
cluster scale. The helper exists for that case and as the documented
pattern; measure before using it on small data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_on: str | Column,
    num_salts: int = 32,
    count_alias: str = "n",
    sum_col: str | None = None,
    sum_alias: str = "sum_value",
) -> DataFrame:
    """Two-stage count (and optional sum) per ``keys`` with a
    deterministic salt derived from ``salt_on`` (any high-cardinality
    column — hash-pmod keeps the result reproducible, unlike rand()).
    """
    salt_src = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    salt = F.pmod(F.hash(salt_src), F.lit(num_salts)).alias("__salt")

    stage1_aggs = [F.count(F.lit(1)).alias("__pc")]
    if sum_col is not None:
        stage1_aggs.append(F.sum(sum_col).alias("__ps"))
    partial = df.select(*keys, salt, *( [sum_col] if sum_col else [] )).groupBy(
        *keys, "__salt"
    ).agg(*stage1_aggs)

    final_aggs = [F.sum("__pc").alias(count_alias)]
    if sum_col is not None:
        final_aggs.append(F.sum("__ps").alias(sum_alias))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the BIG side's key deterministically,
    replicate the SMALL side once per salt value, and join on
    (key, salt) — each hot key spreads over ``num_salts`` reducers
    instead of funneling through one.

    This is the manual fallback for when AQE's runtime skew splitting
    can't apply (e.g. the skewed side feeds another operator that pins
    the partitioning, or the join is part of a cached plan). The small
    side grows ``num_salts``-fold — use only when
    |small| × num_salts ≪ |big|'s hot-key mass, which is exactly the
    skewed-dimension-join regime. Results are identical to a plain
    join (same key matches, salt is internal).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.hash(F.col(on)), F.lit(num_salts))
    )
    replicated_small = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(num_salts)])),
    )
    out = salted_big.join(replicated_small, [on, "__salt"], how)
    return out.drop("__salt")
