"""As-of join — a custom operator Spark lacks natively.

``asof_join_backward(left, right, ...)`` attaches, to every left row,
the right-side values from the most recent right row with the same key
and ``right_ts <= left_ts`` (inclusive).  The classic use is event ×
slowly-changing price/rate streams.

Spark-first implementation (no UDF, one shuffle): union the two
sides tagged, sort within each key by (ts, side) — right rows first on
ties so "at or before" is inclusive — and carry right values forward
with ``last_value(ignoreNulls=True)`` over an unbounded-preceding
window; then keep only left rows.  Cost = one shuffle on the key +
one in-partition sort: the same price as a sort-merge join, with no
pairwise blow-up, and it scales to arbitrarily many right rows per
key (a per-key ``max_by`` subquery would not).

Note: the reference's FX join is deliberately NOT an as-of join — a
missing exact (date, currency) is a hard error there (reference
transform.py:40-42; SURVEY.md §7.6.4).  This operator is the general
tool for streams where fill-forward IS the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join (backward, inclusive). Right (key, ts) pairs
    should be unique — pre-aggregate if they are not."""
    l_tagged = left.select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l_tagged.schema["__row"].dataType
        ).alias("__row"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__is_left",
        "__row",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__is_left") == 1).select(
        F.col("__row.*"),
        *[F.col(f"__f_{c}").alias(f"asof_{c}") for c in value_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join (forward, inclusive): attach the EARLIEST right
    value at-or-after each left timestamp — the mirror of
    :func:`asof_join_backward` (e.g. "next maintenance event after
    this reading").  Same union+window mechanics, with the ordering
    arranged so a right row at the exact left timestamp is eligible
    (left sorts before right at ties) and the fill runs over the
    FOLLOWING frame."""
    l_tagged = left.select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__row"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
            for c in value_cols
        ],
    )
    r_tagged = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__row"].dataType).alias("__row"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", F.desc("__is_left"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        "__is_left",
        "__row",
        *[
            F.first(f"__v_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__is_left") == 1).select(
        F.col("__row.*"),
        *[F.col(f"__f_{c}").alias(f"asof_{c}") for c in value_cols],
    )
