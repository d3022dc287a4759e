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
