"""Distributed per-feature statistics (reference ``statistics``,
``feature_store.py:450-508``).

The reference materializes every record of the group in driver RAM and
aggregates in a Python loop — the scaling cliff called out in
BASELINE.md. Here the same numbers come from one partial+final hash
aggregation: explode the feature map to long form, then
``groupBy(feature).agg(...)``. Nothing touches the driver but the final
per-feature row (O(#features)).

Semantics pinned by the reference tests (SURVEY.md §2.4):

* ``count``      — values present and not JSON-null, ANY type (a string
                   city still counts: feature_store.py:484,488);
* ``null_count`` — records where the key is absent OR JSON-null
                   (feature_store.py:475-479);
* ``mean/min/max`` — numeric subset only; Python's
                   ``isinstance(True, int)`` quirk means booleans
                   participate as 0/1; mean rounded to 6 places
                   (feature_store.py:484-492).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def numeric_value(col: Column) -> Column:
    """Numeric view of a JSON-encoded map cell.

    JSON numbers cast; JSON booleans become 0/1 (the reference's
    bool-as-int quirk); JSON strings/arrays/null → NULL.
    """
    return (
        F.when(col == "true", F.lit(1.0))
        .when(col == "false", F.lit(0.0))
        .otherwise(col.try_cast("double"))
    )


def feature_statistics(
    records: DataFrame,
    feature_names: Sequence[str],
    values_col: str = "feature_values",
) -> DataFrame:
    """Stats DataFrame (feature, count, null_count, mean, min, max,
    all_int) — ONE map-side-combinable hash aggregation, one scan.

    The group's total record count is derivable as
    ``count + null_count`` of any row (every record contributes one
    long-form row per declared feature), so callers never run a second
    scan. ``all_int`` is true when every numeric value was a JSON
    integer or boolean — callers cast min/max back to int to match the
    reference, which returns ``min(numeric_vals)`` preserving int
    (feature_store.py:491-492).
    """
    if not feature_names:
        return records.sparkSession.createDataFrame(
            [],
            "feature string, count long, null_count long, "
            "mean double, min double, max double, all_int boolean",
        )

    # Long form: one row per (record, declared feature). element_at
    # returns NULL for absent keys, which is exactly the reference's
    # values.get(fname) semantics.
    long_form = records.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        F.element_at(F.col(values_col), name).alias("value"),
                    )
                    for name in feature_names
                ]
            )
        ).alias("fv")
    ).select("fv.feature", "fv.value")

    present = F.col("value").isNotNull() & (F.col("value") != F.lit("null"))
    num = numeric_value(F.col("value"))
    # A numeric cell whose JSON encoding is not an integer or boolean
    # (e.g. "1.5", "1.0") makes min/max float in the reference.
    is_int_like = F.col("value").rlike("^-?[0-9]+$") | F.col("value").isin(
        "true", "false"
    )
    return long_form.groupBy("feature").agg(
        F.sum(present.cast("long")).alias("count"),
        F.sum((~present).cast("long")).alias("null_count"),
        F.round(F.avg(num), 6).alias("mean"),
        F.min(num).alias("min"),
        F.max(num).alias("max"),
        F.min(
            F.when(num.isNotNull(), is_int_like).otherwise(F.lit(True))
        ).alias("all_int"),
    )
