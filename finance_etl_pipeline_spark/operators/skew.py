"""Skew-mitigation helpers for hot-key aggregations and joins.

AQE's skew-join splitting (on in session.py) handles sort-merge join
skew at runtime; these helpers cover the cases AQE does not:

- ``salted_aggregate``: two-phase aggregation for hot GROUP BY keys —
  phase 1 aggregates on (key, salt) spreading one hot key over
  ``salts`` reducers, phase 2 merges the partials.  Correct for any
  algebraic aggregate expressed as (partial, merge) pairs.
- ``salted_left_join``: replicate-broadcast join for a skewed fact ×
  mid-size dim where the dim is too big to broadcast whole but a
  hot-key subset isn't: the fact side salts, the dim side explodes
  ×salts — each reducer gets 1/salts of every hot key.

At 100 TB these are the difference between a straggler task holding a
1000-executor stage hostage and an even spread.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    salts: int = 16,
) -> DataFrame:
    """Two-phase salted GROUP BY.

    ``partial_aggs`` aggregate within (keys, salt); ``merge_aggs``
    combine the partials per key (e.g. partial sum → merge sum,
    partial count → merge sum). Column aliases must line up."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salts).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_left_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salts: int = 16,
) -> DataFrame:
    """Left join with the dim replicated per salt.

    fact gets a random salt; dim explodes to one copy per salt value;
    the join key becomes (key, salt) so a hot key's rows spread over
    ``salts`` partitions instead of one."""
    fact_s = fact.withColumn("__salt", (F.rand(seed=42) * salts).cast("int"))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = fact_s.join(dim_s, [key, "__salt"], "left")
    return out.drop("__salt")
