"""Cross-validation of the deterministic MinHash pipeline against
stock MLlib MinHashLSH (SURVEY.md §7.4: extensions may use MLlib).

MLlib draws its permutations from a seed, so it can't be
oracle-verified — but with a fixed seed it provides an independent
implementation to corroborate ours: the high-similarity pairs
(Jaccard ≥ 0.7 ground truth) must be recovered by both."""

from __future__ import annotations

import pytest
from pyspark.ml.feature import CountVectorizer, MinHashLSH
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import dedup as D
from finance_etl_pipeline_spark.plans import all_queries
from finance_etl_pipeline_spark.sources.readers import table


def test_mllib_minhash_recovers_same_neardup_pairs(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    sh = D.shingle_table(docs)
    shingle_sets = sh.groupBy("doc_id").agg(
        F.collect_set("s").alias("shingles")
    )
    # MinHashLSH requires ≥1 set bit — every doc has ≥1 shingle here
    shingle_sets = shingle_sets.filter(F.size("shingles") >= 1)
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True
    ).fit(shingle_sets)
    feats = cv.transform(shingle_sets)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)
    # jaccard distance = 1 - similarity; threshold 0.3 ~ sim 0.7
    mllib_pairs = {
        (min(r.a, r.b), max(r.a, r.b))
        for r in lsh.approxSimilarityJoin(feats, feats, 0.3)
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
        )
        .collect()
    }
    ours = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["dd_minhash_lsh_pairs"].fn(spark, sf_dir).collect()
    }
    assert ours, "expected near-dup pairs in the corpus"
    # our exact-verified pairs must be found by MLlib's LSH too
    missing = ours - mllib_pairs
    assert len(missing) <= max(1, len(ours) // 10), (
        f"MLlib missed too many of our verified pairs: {missing}"
    )


def test_connected_components_matches_union_find(spark):
    """Property check: Spark min-label propagation == driver-side
    union-find on randomized graphs (several seeds, varied density)."""
    import random

    from finance_etl_pipeline_spark.operators.dedup import (
        connected_components,
    )

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = 60
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(10, 80))
            }
        )
        # reference: union-find
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {x for e in edges for x in e}
        expected = {}
        for node in touched:
            root = find(node)
            expected[node] = min(x for x in touched if find(x) == root)

        pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        got = {
            r.node: r.lbl for r in connected_components(pairs).collect()
        }
        assert got == expected, f"seed {seed}: CC labels diverge"
