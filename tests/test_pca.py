"""Distributed PCA vs MLlib: same subspace, same explained variance.

MLlib's PCA is the independent implementation (RowMatrix SVD under
the hood); our explode-aggregate scatter + numpy eigh must agree with
it up to per-component sign and float tolerance — the same
cross-validation strategy as tests/test_mllib_crosscheck.py for
MinHashLSH."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.pca import (
    project,
    scatter_stats,
    top_components,
)
from finance_etl_pipeline_spark.sources.readers import table

K = 4


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_pca_matches_mllib(spark, emb):
    means, cov = scatter_stats(emb)
    vals, vecs = top_components(cov, K)

    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    ml_in = emb.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = PCA(k=K, inputCol="features", outputCol="pca").fit(ml_in)
    ml_vecs = model.pc.toArray()  # [d, k]

    # same subspace: each component matches up to sign
    for c in range(K):
        dot = abs(float(np.dot(vecs[:, c], ml_vecs[:, c])))
        assert dot > 0.999, f"component {c} diverges (|cos|={dot})"

    # explained variance proportions agree
    ours = vals / cov.trace()
    theirs = np.array(model.explainedVariance)
    # MLlib uses the n-1 (sample) covariance; proportions are
    # normalization-free so they compare directly
    assert np.allclose(ours, theirs, atol=1e-6)


def test_projection_variance_equals_eigenvalues(spark, emb):
    means, cov = scatter_stats(emb)
    vals, vecs = top_components(cov, K)
    proj = project(emb, means, vecs).collect()
    mat = np.array([[r[f"pc{c}"] for c in range(K)] for r in proj])
    # population variance along each component == its eigenvalue,
    # and components are uncorrelated
    got = np.cov(mat, rowvar=False, bias=True)
    assert np.allclose(np.diag(got), vals, rtol=1e-6)
    off = got - np.diag(np.diag(got))
    assert np.abs(off).max() < 1e-6
