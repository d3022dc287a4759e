"""Misra-Gries heavy-hitter sketch — the bounded-memory scale path
for corpus frequency analysis (`hh_top_tokens` is the exact twin).

Why a sketch at 100 TB: the exact top-k needs a full groupBy over the
token stream — fine when the vocabulary fits a shuffle, but a raw
web-scale corpus has an unbounded tail (typos, IDs, URLs).  Misra-
Gries keeps at most ``k`` counters per partition regardless of input
size, and per-partition summaries MERGE by counter addition: summing
two MG summaries keeps the deviation bound additive, so the merged
estimate ``est`` of any token satisfies

    true - N/k  <=  est  <=  true

(N = total token count).  Hence every token with true frequency
> N/k is guaranteed present in the merged summary — the classic
heavy-hitter guarantee (Misra & Gries 1982; merge property from
Agarwal et al., "Mergeable Summaries", PODS 2012).

Implementation shape: ``mapInPandas`` runs the imperative counter
loop once per partition (Arrow-batched in, one tiny summary out), and
the merge is an ordinary map-side-combined groupBy-sum — the shuffle
carries at most ``k × partitions`` rows, independent of data size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_heavy_hitters(tokens: DataFrame, k: int = 64) -> DataFrame:
    """(token, est) lower-bound frequency estimates from a merged
    Misra-Gries sketch over ``tokens.token``; at most k counters per
    partition survive to the merge."""

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf["token"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k:
                    counters[tok] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"token": list(counters), "est": list(counters.values())}
            )

    summaries = tokens.select("token").mapInPandas(
        per_partition, "token string, est long"
    )
    return summaries.groupBy("token").agg(F.sum("est").alias("est"))


def categorical_profile_sketch(
    df: DataFrame, col: str, k: int = 64, rsd: float = 0.05
) -> DataFrame:
    """Bounded-memory profile of a HIGH-cardinality categorical
    column — the sketch path prof_categorical_entropy's docstring
    promises for columns whose exact value-count table would itself
    be a scale problem (user ids, URLs, session keys).

    One row: exact ``n_rows``, ``n_values_approx`` from Spark's HLL
    (approx_count_distinct, relative error ``rsd``), and
    ``top1_est`` / ``top1_share_e6`` from the merged Misra-Gries
    summary.  State is k counters per partition + one HLL register
    set — nothing proportional to the column's cardinality.

    Estimate contract (what the parity test pins):
    - ``top1_est`` is a LOWER bound on the true top-1 count and
      undercounts by at most N/k (MG merge guarantee), so
      ``top1_share_e6`` is a guaranteed floor on dominance;
    - if the column has ≤ k distinct values, no MG counter is ever
      decremented and ``top1_est`` is EXACT — the sketch degrades
      gracefully into the exact profiler on low-cardinality columns;
    - ``n_values_approx`` carries HLL's ~rsd relative error.

    Exact entropy is NOT sketchable in bounded state (it needs every
    n_i); the dominance floor + cardinality estimate are the
    actionable parts of the profile at this scale."""
    vals = df.where(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("token")
    )
    top = mg_heavy_hitters(vals, k).agg(F.max("est").alias("top1_est"))
    return (
        vals.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.approx_count_distinct("token", rsd).alias("n_values_approx"),
        )
        .crossJoin(F.broadcast(top))
        .select(
            F.lit(col).alias("column_name"),
            "n_rows",
            "n_values_approx",
            "top1_est",
            (
                F.floor(
                    F.col("top1_est")
                    / F.col("n_rows").cast("double")
                    * 1_000_000
                )
            )
            .cast("long")
            .alias("top1_share_e6"),
        )
    )
