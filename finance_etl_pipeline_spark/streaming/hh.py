"""Streaming Misra-Gries heavy hitters — the streaming twin of
operators/sketch.py.

Sharded by token hash: each shard's keyed state holds at most ``K``
counters (bounded regardless of stream length or vocabulary size),
and because a token lives in exactly one shard, the per-shard MG
guarantee applies directly:

    true - N_shard/(K+1)  <=  est  <=  true

where ``N_shard`` is the total token count routed to that shard.
Every token with true frequency above the shard bound is guaranteed
present — the same heavy-hitter contract as the batch sketch, held
continuously over an unbounded stream.

Scale: state is K counters × N_SHARDS rows total; each micro-batch
shuffles only on the shard key.  Widen N_SHARDS for throughput (the
bound tightens as shards shrink N_shard); production adds a
processing-time timeout if shards can go permanently cold.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_SHARDS = 8
K = 64

OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("token", StringType()),
        StructField("est", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("toks", ArrayType(StringType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        toks, cnts = state.get
        counters = dict(zip(toks, cnts))
    else:
        counters = {}
    for pdf in pdfs:
        ordered = pdf.sort_values(["doc_id", "pos"])
        for tok in ordered["token"]:
            if tok in counters:
                counters[tok] += 1
            elif len(counters) < K:
                counters[tok] = 1
            else:
                dead = []
                for k2 in counters:
                    counters[k2] -= 1
                    if counters[k2] == 0:
                        dead.append(k2)
                for k2 in dead:
                    del counters[k2]
    state.update((list(counters.keys()), list(counters.values())))
    yield pd.DataFrame(
        {
            "shard": [key[0]] * len(counters),
            "token": list(counters.keys()),
            "est": list(counters.values()),
        }
    )


def tokens_with_shard(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, token, shard) token stream; works on batch and
    streaming DataFrames identically (narrow ops only)."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias(
            "pos", "token"
        ),
    ).filter(F.length("token") > 0)
    return toks.withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(N_SHARDS)).cast("int")
    )


def streaming_heavy_hitters(docs_stream: DataFrame) -> DataFrame:
    """Continuously-maintained per-shard MG counters over a document
    stream; each trigger emits every live counter of the shards it
    touched."""
    return (
        tokens_with_shard(docs_stream)
        .groupBy("shard")
        .applyInPandasWithState(
            _update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
