"""End-to-end curation DAG: the stages compose, survivors shrink
monotonically, and the final corpus is actually clean (no exact dups,
no near-dup pairs above threshold among the kept docs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import dedup as D
from finance_etl_pipeline_spark.operators.curate_pipeline import (
    NEARDUP_THRESHOLD,
    curate,
    exact_dedup_keepers,
    gopher_pass,
    neardup_keepers,
)
from finance_etl_pipeline_spark.sources.readers import table


def _with_forced_dups(docs):
    """The corpus has no exact dups — inject some (new ids, old text)
    so the exact-dedup stage has real work."""
    dups = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return docs.unionByName(dups)


def test_curate_pipeline_counts_and_cleanliness(spark, sf_dir):
    docs = _with_forced_dups(table(spark, sf_dir, "documents"))
    packed, audit = curate(docs)

    rows = {r["stage"]: r["n_docs"] for r in audit.collect()}
    assert rows["raw"] == docs.count()
    assert (
        rows["raw"]
        >= rows["gopher_pass"]
        >= rows["exact_dedup"]
        >= rows["neardup_dedup"]
    )
    # the injected exact dups must all be gone after exact_dedup
    assert rows["gopher_pass"] - rows["exact_dedup"] >= 20

    kept = neardup_keepers(
        exact_dedup_keepers(gopher_pass(docs))
    )
    # 1) no two kept docs share a text
    n_kept = kept.count()
    assert kept.select("text").distinct().count() == n_kept
    # 2) no near-dup pair above threshold survives among kept docs
    sh = D.shingle_table(kept)
    leftover = D.jaccard_pairs(sh, None, NEARDUP_THRESHOLD).count()
    assert leftover == 0, f"{leftover} near-dup pairs survived curation"

    # 3) packing covers every kept doc's chunks exactly once
    from finance_etl_pipeline_spark.operators.curation import chunk_table

    assert packed.count() == chunk_table(kept).count()
    # sequences respect the per-source cumulative structure
    bad = packed.filter(F.col("tokens_before") < 0).count()
    assert bad == 0
    # 4) every packed sequence got a schedule key, and within a source
    # the schedule preserves seq order (stride scheduling is monotone
    # per source)
    assert packed.filter(F.col("schedule_key").isNull()).count() == 0
    seqs = packed.select("source", "seq_id", "schedule_key").distinct()
    inversions = (
        seqs.alias("x")
        .join(
            seqs.alias("y"),
            (F.col("x.source") == F.col("y.source"))
            & (F.col("x.seq_id") < F.col("y.seq_id"))
            & (F.col("x.schedule_key") >= F.col("y.schedule_key")),
        )
        .count()
    )
    assert inversions == 0
