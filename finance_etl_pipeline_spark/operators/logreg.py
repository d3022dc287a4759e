"""Distributed logistic-regression training (full-batch gradient
descent) — the TRAINING step of the fastText-style quality classifier
whose inference shape ships in ``plans/importance.py``
(``tx_linear_classifier``).  A real curation pipeline trains this
gate on labeled seed data (wiki-vs-crawl, lang-vs-other) before
running inference over the corpus; the reference repo has no ML
surface (SURVEY.md §2.10 extension scope).

Spark-first shape, per iteration (same small-model / big-data split
as ``operators/kmeans.py``):

- **The gradient is one aggregate pass.**  Per row, the margin is a
  dot product of the (tiny, literal) weight vector with the feature
  columns — whole-stage codegen, zero shuffle; ``avg((σ(margin) − y)
  · x_j)`` partial-aggregates map-side, so the exchange carries d
  doubles per partition.
- **Driver state is d doubles** (d = 4 here); weights are compiled
  into the next iteration's plan as integer micro-unit literals.

Determinism contract (cross-engine oracle parity): weights are
quantized to the e6 integer grid BETWEEN iterations (the kmeans
centroid pattern) so summation-order ulps in the gradient aggregate
can never compound; every per-row expression (features, sigmoid,
margin) is the identical IEEE op sequence in Spark and DuckDB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.dedup import tokens_expr
from finance_etl_pipeline_spark.operators.text import STOPWORDS, lexicon_hits

ITERATIONS = 3
LR = 1.0
N_FEATURES = 4  # bias, length score, stopword ratio, token-shape score
TARGET_LANG = "en"


def pyigrid6(x: float) -> int:
    """Driver-side twin of functions.scalars.igrid(·, 6)."""
    return math.floor(x * 1_000_000 + 0.5001)


def features(docs: DataFrame) -> DataFrame:
    """(y, x0..x3): the quality_score feature triple + bias, with the
    target-language flag as the label.  NULL-prone ratios (empty
    token arrays) coalesce to 0 so every row trains."""
    t = tokens_expr()
    n_tokens = F.size(t).cast("double")
    stop_ratio = F.coalesce(
        lexicon_hits(t, STOPWORDS).cast("double")
        / F.nullif(n_tokens, F.lit(0.0)),
        F.lit(0.0),
    )
    total_len = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    mean_tok = total_len.cast("double") / F.nullif(n_tokens, F.lit(0.0))
    shape_score = F.coalesce(F.least(mean_tok / 8.0, F.lit(1.0)), F.lit(0.0))
    length_score = F.least(F.length("text").cast("double") / 500.0, F.lit(1.0))
    y = F.when(F.col("lang") == TARGET_LANG, 1.0).otherwise(0.0)
    return docs.select(
        y.alias("y"),
        F.lit(1.0).alias("x0"),
        length_score.alias("x1"),
        stop_ratio.alias("x2"),
        shape_score.alias("x3"),
    )


def margin_expr(w_e6: list[int]):
    """Dot product of the integer micro-unit weight literals with the
    feature columns — one division at the end, so the oracle's
    ``(w0*x0 + … )/1e6`` is the identical IEEE sequence."""
    s = F.lit(float(w_e6[0])) * F.col("x0")
    for j in range(1, N_FEATURES):
        s = s + F.lit(float(w_e6[j])) * F.col(f"x{j}")
    return s / 1_000_000.0


def train(feats: DataFrame) -> list[int]:
    """Full-batch GD: ITERATIONS aggregate passes, weights gridded to
    e6 micro-units between iterations.  Returns the final weights."""
    w_e6 = [0] * N_FEATURES
    for _ in range(ITERATIONS):
        p = 1.0 / (1.0 + F.exp(-margin_expr(w_e6)))
        row = feats.agg(
            *[
                F.avg((p - F.col("y")) * F.col(f"x{j}")).alias(f"g{j}")
                for j in range(N_FEATURES)
            ]
        ).first()
        w_e6 = [
            pyigrid6(w_e6[j] / 1_000_000.0 - LR * row[f"g{j}"])
            for j in range(N_FEATURES)
        ]
    return w_e6
