"""operators/logreg.py vs a pure-numpy twin: the distributed GD must
reproduce the reference implementation's weights EXACTLY (both sides
grid weights to e6 integers between iterations, so there is a single
right answer, not a tolerance band)."""

from __future__ import annotations

import numpy as np

from finance_etl_pipeline_spark.operators import logreg as LR

DOCS = [
    # (lang, text) — mixes stopword-rich English with terse non-English
    ("en", "the cat sat of the mat and a dog in the yard of the house"),
    ("en", "a quick brown fox jumps over the lazy dog and runs in a field"),
    ("en", "the of and in a " * 20),
    ("de", "der hund lief schnell durch den dunklen wald heute"),
    ("fr", "le chat noir dort sur le canape rouge toute la journee"),
    ("de", "kurz"),
    ("en", ""),
]


def _numpy_features():
    import re

    stop = set(LR.STOPWORDS)
    rows = []
    for lang, text in DOCS:
        # Spark's split('\s+') keeps leading/trailing empty strings
        # (Java split with limit=-1) and yields [''] for '' — mirror
        # it exactly with re.split
        toks = re.split(r"\s+", text.lower())
        n = len(toks)
        stop_ratio = sum(1 for t in toks if t in stop) / n if n else 0.0
        mean_tok = sum(len(t) for t in toks) / n if n else 0.0
        rows.append(
            (
                1.0 if lang == LR.TARGET_LANG else 0.0,
                1.0,
                min(len(text) / 500.0, 1.0),
                stop_ratio,
                min(mean_tok / 8.0, 1.0),
            )
        )
    a = np.array(rows, dtype=np.float64)
    return a[:, 0], a[:, 1:]


def _numpy_train(y, x):
    w_e6 = [0] * LR.N_FEATURES
    for _ in range(LR.ITERATIONS):
        w = np.array(w_e6, dtype=np.float64) / 1e6
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        g = ((p - y)[:, None] * x).mean(axis=0)
        w_e6 = [
            LR.pyigrid6(w_e6[j] / 1e6 - LR.LR * g[j])
            for j in range(LR.N_FEATURES)
        ]
    return w_e6


def test_spark_gd_matches_numpy_twin_exactly(spark):
    docs = spark.createDataFrame(
        [(i, lang, t) for i, (lang, t) in enumerate(DOCS)],
        "doc_id long, lang string, text string",
    )
    feats = LR.features(docs)
    got = LR.train(feats)
    y, x = _numpy_features()
    want = _numpy_train(y, x)
    assert got == want

    # direction sanity: stopword density is the en-separator in this
    # fixture, so its weight must be positive after training
    assert got[2] > 0


def test_tokenizer_empty_text_matches_spark(spark):
    # pin the [''] contract the numpy twin assumes
    import pyspark.sql.functions as F

    row = (
        spark.range(1)
        .select(F.split(F.lower(F.lit("")), r"\s+").alias("t"))
        .first()
    )
    assert row.t == [""]
