"""Product quantization invariants beyond oracle parity.

Parity proves Spark and DuckDB run the same recurrence; these prove
the recurrence is PQ done right: encoding is map-only (no Exchange),
codes are as compact as claimed (M small ints, codebook-bounded), ADC
distances agree with a numpy reconstruction of the same codebooks,
and recall against exact L2 stays above a floor even on this
near-random corpus (the adversarial case for any quantizer).
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import pq as PQ
from finance_etl_pipeline_spark.operators.similarity import as_double
from finance_etl_pipeline_spark.sources.readers import table

DIM = 64
TOP_K = 3
STRIDE = 50


def _base(spark, sf_dir):
    return (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .cache()
    )


def test_encoding_is_map_only_and_compact(spark, sf_dir):
    base = _base(spark, sf_dir)
    books = PQ.train_codebooks(base, DIM)
    codes = PQ.encode(base, DIM, books)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        codes.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan

    agg = codes.agg(
        F.count("*").alias("n"),
        *[F.max(f"code{i}").alias(f"mx{i}") for i in range(PQ.M_SUBSPACES)],
        *[F.min(f"code{i}").alias(f"mn{i}") for i in range(PQ.M_SUBSPACES)],
    ).collect()[0]
    assert agg.n == base.count()
    for i in range(PQ.M_SUBSPACES):
        assert 0 <= agg[f"mn{i}"] and agg[f"mx{i}"] < PQ.K_SUB


def test_adc_matches_numpy_reconstruction(spark, sf_dir):
    base = _base(spark, sf_dir)
    books = PQ.train_codebooks(base, DIM)
    rows = base.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.v for r in rows], dtype=np.float64)

    fr = np.vectorize(PQ.KM.pyfround)
    bounds = PQ.subspace_bounds(DIM, PQ.M_SUBSPACES)

    def np_codes(v):
        out = []
        for (start, length), book in zip(bounds, books):
            sub = v[start - 1 : start - 1 + length]
            dists = [
                (PQ.KM.pyfround(((sub - np.array(c)) ** 2).sum()), cid)
                for cid, c in book
            ]
            out.append(min(dists)[1])
        return out

    def np_adist(q, codes):
        total = 0.0
        for (start, length), book, code in zip(bounds, books, codes):
            cent = dict(book)[code]
            sub = q[start - 1 : start - 1 + length]
            total += PQ.KM.pyfround(((sub - np.array(cent)) ** 2).sum())
        return PQ.KM.pyfround(total)

    got = {
        (r.query_id, r.vec_id): r.adist
        for r in PQ.adc_topk(
            base, DIM, books, F.col("vec_id") % STRIDE == 0, TOP_K
        ).collect()
    }
    all_codes = {vid: np_codes(v) for vid, v in zip(ids.tolist(), x)}
    for (qid, vid), adist in got.items():
        want = np_adist(x[ids == qid][0], all_codes[vid])
        assert abs(adist - want) < 1e-9, (qid, vid, adist, want)


def test_pq_recall_floor_vs_exact_l2(spark, sf_dir):
    base = _base(spark, sf_dir)
    books = PQ.train_codebooks(base, DIM)
    rows = base.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.v for r in rows], dtype=np.float64)

    topk = PQ.adc_topk(
        base, DIM, books, F.col("vec_id") % STRIDE == 0, TOP_K
    ).collect()
    by_query: dict[int, set[int]] = {}
    for r in topk:
        by_query.setdefault(r.query_id, set()).add(r.vec_id)

    hits = total = 0
    widen = 10 * TOP_K  # near-random corpus: measure against a widened
    for qid, got in by_query.items():  # ground-truth set, assert a floor
        q = x[ids == qid][0]
        d = ((x - q) ** 2).sum(axis=1)
        order = [
            int(ids[j]) for j in np.argsort(d, kind="stable") if ids[j] != qid
        ]
        truth = set(order[:widen])
        hits += len(got & truth)
        total += TOP_K
    assert total == TOP_K * len(by_query)
    assert hits / total >= 0.3, f"recall@widened {hits}/{total}"


def test_rerank_recall_at_least_plain_pq(spark, sf_dir):
    """Exact rerank of the PQ top-10 must not lose recall vs plain
    PQ top-3, and every reranked hit must come FROM the candidate set
    (two-stage contract)."""
    from finance_etl_pipeline_spark.plans import all_queries

    qs = all_queries()
    plain = qs["ann_pq_adc_topk"].fn(spark, sf_dir).collect()
    rer = qs["ann_pq_rerank_topk"].fn(spark, sf_dir).collect()

    base = _base(spark, sf_dir)
    rows = base.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.v for r in rows], dtype=np.float64)

    def recall(result_rows) -> float:
        by_query: dict[int, set[int]] = {}
        for r in result_rows:
            by_query.setdefault(r.query_id, set()).add(r.vec_id)
        hits = total = 0
        for qid, got in by_query.items():
            q = x[ids == qid][0]
            d = ((x - q) ** 2).sum(axis=1)
            order = [
                int(ids[j])
                for j in np.argsort(d, kind="stable")
                if ids[j] != qid
            ]
            truth = set(order[:TOP_K])
            hits += len(got & truth)
            total += TOP_K
        return hits / total

    assert recall(rer) >= recall(plain)
    # rerank output must be a subset of the stage-1 candidates
    from finance_etl_pipeline_spark.plans.pq import RERANK_C

    books = PQ.train_codebooks(base, DIM)
    cand = PQ.adc_topk(
        base, DIM, books, F.col("vec_id") % STRIDE == 0, RERANK_C
    )
    cset = {(r.query_id, r.vec_id) for r in cand.collect()}
    assert all((r.query_id, r.vec_id) in cset for r in rer)
