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


def _py_winnow(text: str):
    """Pure-Python twin of winnow_fp for one document: rolling
    SPAN_W-token k-gram md5-60bit hashes, rightmost-min of every
    _WINNOW_W window; returns the selected (pos, hash) set."""
    import hashlib
    import re

    toks = re.split(r"\s+", text.lower())
    if len(toks) < SPAN_W:
        return set()
    hashes = []
    for i in range(len(toks) - SPAN_W + 1):
        gram = " ".join(toks[i : i + SPAN_W])
        h = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
        hashes.append(h)  # pos = i + 1 (1-based, like the plan)
    out = set()
    for t in range(_WINNOW_W - 1, len(hashes)):
        window = hashes[t - _WINNOW_W + 1 : t + 1]
        mn = min(window)
        # rightmost occurrence of the min within the window
        off = max(j for j, v in enumerate(window) if v == mn)
        pos = (t - _WINNOW_W + 1) + off + 1
        out.add((pos, mn))
    return out


def test_selection_matches_python_twin_exactly(spark):
    rng = random.Random(1234)
    rows = []
    for d in range(8):
        n = rng.randrange(SPAN_W, 120)
        # small vocabulary forces hash ties and repeated k-grams —
        # the tie-break and distinct paths get real exercise
        words = [f"w{rng.randrange(6)}" for _ in range(n)]
        rows.append((d, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    _, fp = winnow_fp(docs)
    got = {}
    for r in fp.collect():
        got.setdefault(r.doc_id, set()).add((r.sel_pos, r.h))
    for d, text in rows:
        assert got.get(d, set()) == _py_winnow(text), f"doc {d}"
