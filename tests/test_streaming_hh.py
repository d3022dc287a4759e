"""Streaming Misra-Gries heavy hitters vs exact batch counts.

The streamed sketch must satisfy the per-shard MG contract against
ground truth computed with identical tokenization and sharding:
never overestimate, never undershoot by more than N_shard/(K+1), and
never miss a token whose true count exceeds that bound.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.schemas import DOCUMENTS
from finance_etl_pipeline_spark.streaming.events import drain_to_memory
from finance_etl_pipeline_spark.streaming.hh import (
    K,
    streaming_heavy_hitters,
    tokens_with_shard,
)
from finance_etl_pipeline_spark.sources.readers import table


@pytest.fixture(scope="module")
def docs_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(os.path.join(sf_dir, "documents.parquet"), d / "part-0.parquet")
    return str(d)


def test_streaming_mg_bounds_vs_exact(spark, sf_dir, docs_dir):
    stream = spark.readStream.schema(DOCUMENTS).parquet(docs_dir)
    sketch = drain_to_memory(
        streaming_heavy_hitters(stream), "t_mg", spark, mode="update"
    ).collect()
    est = {(r["shard"], r["token"]): r["est"] for r in sketch}
    assert est, "sketch emitted nothing"

    toks = tokens_with_shard(table(spark, sf_dir, "documents"))
    truth = {
        (r["shard"], r["token"]): r["n"]
        for r in toks.groupBy("shard", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    shard_tot = {
        r["shard"]: r["n"]
        for r in toks.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # per-shard state bound held
    from collections import Counter

    per_shard_counters = Counter(s for (s, _t) in est)
    assert all(c <= K for c in per_shard_counters.values())

    for (s, t), e in est.items():
        true = truth.get((s, t), 0)
        bound = shard_tot[s] / (K + 1)
        assert e <= true, f"overestimate for {t}: {e} > {true}"
        assert e >= true - bound, f"undershoot beyond bound for {t}"

    # completeness: every token above its shard bound is present
    for (s, t), true in truth.items():
        if true > shard_tot[s] / (K + 1):
            assert (s, t) in est, f"heavy hitter {t} missing from shard {s}"
