"""Winnowing guarantee (Schleimer/Wilkerson/Aiken §2): any copied
passage of at least SPAN_W + _WINNOW_W - 1 tokens MUST leave at least
one identical fingerprint hash in both documents — the property that
makes winnowing a detection algorithm rather than a sampler.  Also
pins the density bounds: at least one fingerprint per _WINNOW_W
k-grams (each window selects one), never more than one per k-gram."""

from __future__ import annotations

import random

from finance_etl_pipeline_spark.plans import all_queries

all_queries()  # spans.py composes oracles registered by sibling modules

from finance_etl_pipeline_spark.plans.spans import (  # noqa: E402
    SPAN_W,
    _WINNOW_W,
    winnow_fp,
)

GUARANTEE = SPAN_W + _WINNOW_W - 1  # 11 tokens


def _words(rng, n, prefix):
    return [f"{prefix}{rng.randrange(10_000)}" for _ in range(n)]


def test_copied_passage_always_shares_a_fingerprint(spark):
    rng = random.Random(42)
    passage = _words(rng, GUARANTEE, "shared")
    rows = []
    # doc 0: passage embedded mid-document between unrelated filler
    rows.append((0, " ".join(_words(rng, 30, "a") + passage + _words(rng, 25, "b"))))
    # doc 1: same passage at a different offset among different filler
    rows.append((1, " ".join(_words(rng, 7, "c") + passage + _words(rng, 40, "d"))))
    # doc 2: no copied content — control
    rows.append((2, " ".join(_words(rng, 60, "e"))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    _, fp = winnow_fp(docs)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.h)
    assert by_doc[0] & by_doc[1], "guaranteed-length copy left no shared fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_density_bounds(spark):
    rng = random.Random(7)
    rows = [
        (i, " ".join(_words(rng, 40 + 10 * i, f"w{i}_"))) for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    win, fp = winnow_fp(docs)
    kg = {r.doc_id: r.n for r in win.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    nf = {r.doc_id: r.n for r in fp.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    for d, n_kg in kg.items():
        n_full_windows = n_kg - _WINNOW_W + 1
        assert 1 <= nf[d] <= n_kg
        # every full window selects exactly one position, and one
        # position can serve at most _WINNOW_W windows
        assert nf[d] >= (n_full_windows + _WINNOW_W - 1) // _WINNOW_W
