"""Focused regressions for the round-11 optimization rewrites: each
pins the REWRITTEN operator's output bit-equal to the straightforward
reference formulation it replaced (the optimizations must be pure
plan changes, never semantic ones)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import dedup as D
from finance_etl_pipeline_spark.sources.readers import table


def test_simhash_candidate_pairs_equal_distinct_of_banded_join(spark, sf_dir):
    """Band-ownership dedup (first shared band) must emit EXACTLY the
    DISTINCT pair set of the banded self-join it replaced, each pair
    once, with the correct fingerprints attached."""
    sim = D.simhash_table(table(spark, sf_dir, "documents")).localCheckpoint()
    got = D.simhash_candidate_pairs(sim).collect()
    # reference: the old shape — banded join, DISTINCT, join-back
    sbands = sim.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
        "simhash",
    ).select(
        "doc_id",
        "k",
        F.expr("shiftright(simhash, cast(k * 8 as int)) & 255").alias("bv"),
    )
    a = sbands.select(F.col("doc_id").alias("doc_a"), "k", "bv")
    b = sbands.select(F.col("doc_id").alias("doc_b"), "k", "bv")
    ref_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, ["k", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    assert len(got) == len(ref_pairs)  # exactly-once emission
    fp = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert {(r["doc_a"], r["doc_b"]) for r in got} == ref_pairs
    for r in got:  # carried fingerprints are the real ones
        assert r["sha"] == fp[r["doc_a"]] and r["shb"] == fp[r["doc_b"]]


def test_assign_home_cells_equals_window_rank_plus_joinback(spark, sf_dir):
    """The fused min_by home-cell assignment must equal the
    window-rank + join-back formulation it replaced, row for row."""
    from finance_etl_pipeline_spark.operators.ann_index import (
        _assign_cells,
        _assign_home_cells,
        _base,
    )

    emb = table(spark, sf_dir, "embeddings")
    base = _base(emb, "vec_id", "embedding")
    cents = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    got = {
        r["vec_id"]: (r["cell_id"], r["v"], r["nrm"])
        for r in _assign_home_cells(base, cents).collect()
    }
    ref = {
        r["vec_id"]: (r["cell_id"], r["v"], r["nrm"])
        for r in _assign_cells(base, cents, top=1)
        .select("vec_id", "cell_id")
        .join(base, "vec_id")
        .select("vec_id", "v", "nrm", "cell_id")
        .collect()
    }
    assert got == ref


def test_assign_home_cells_zero_norm_centroid(spark, sf_dir):
    """A zero-norm centroid (cn=0 → every sim NULL via the nullif
    guard) must LOSE to every real cell, matching the window's
    desc-NULLS-LAST ordering — the r11 ADVICE regression: struct-field
    ordering is NULLS FIRST, so an uncoalesced −sim made the
    degenerate cell win the argmin for every vector."""
    from finance_etl_pipeline_spark.operators.ann_index import (
        _assign_cells,
        _assign_home_cells,
        _base,
    )

    emb = table(spark, sf_dir, "embeddings")
    base = _base(emb, "vec_id", "embedding")
    dim = len(base.select("v").first()["v"])
    real = base.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    degenerate = spark.createDataFrame(
        [(-1, [0.0] * dim, 0.0)], "cell_id long, cv array<double>, cn double"
    )
    for cents in (
        real.unionByName(degenerate),  # one degenerate among real cells
        degenerate,  # ALL sims NULL → tie-break to smallest cell_id
    ):
        cents = cents.localCheckpoint()
        got = {
            r["vec_id"]: r["cell_id"]
            for r in _assign_home_cells(base, cents).collect()
        }
        ref = {
            r["vec_id"]: r["cell_id"]
            for r in _assign_cells(base, cents, top=1).collect()
        }
        assert got == ref
        assert -1 not in set(got.values()) or cents.count() == 1


def test_winnow_aggregate_equals_window_formulation(spark, sf_dir):
    """max_by-based rightmost-min selection == the min-over-window +
    filter + re-group formulation it replaced."""
    from finance_etl_pipeline_spark.plans import all_queries

    all_queries()  # spans.py needs the full registry at import time
    from finance_etl_pipeline_spark.plans.spans import _WINNOW_W, winnow_fp

    docs = table(spark, sf_dir, "documents").limit(100)
    win, fp = winnow_fp(docs)
    got = {(r["doc_id"], r["sel_pos"], r["h"]) for r in fp.collect()}
    exp = win.select(
        "doc_id",
        "pos",
        "h",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (_WINNOW_W - 1))
        ).alias("t"),
    )
    wsel = Window.partitionBy("doc_id", "t")
    ref = {
        (r["doc_id"], r["sel_pos"], r["h"])
        for r in exp.select(
            "doc_id",
            "t",
            "pos",
            "h",
            F.min("h").over(wsel).alias("minh"),
            F.count(F.lit(1)).over(wsel).alias("n_in"),
        )
        .filter((F.col("h") == F.col("minh")) & (F.col("n_in") == _WINNOW_W))
        .groupBy("doc_id", "t")
        .agg(F.max("pos").alias("sel_pos"), F.min("h").alias("h"))
        .select("doc_id", "sel_pos", "h")
        .distinct()
        .collect()
    }
    assert got == ref


def test_merge_touched_read_opens_only_touched_files(spark, sf_dir, tmp_path):
    """read_version(_only_files=...) must restrict the SCAN to the
    given files (file-granular pruning, not row filtering): reading a
    3-file table with one file's realpath yields exactly that file's
    rows, and an empty set yields an empty frame with the table
    schema."""
    import os

    from finance_etl_pipeline_spark.operators import manifest as M

    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.repartitionByRange(3, "o_orderkey"), t)
    m = M._read_manifest(t, 1)
    d = m["dirs"][0]
    entries = M._dir_entries(t, m, d)
    assert len(entries) == 3
    one = os.path.realpath(os.path.join(t, d, entries[0]["path"]))
    got = M.read_version(spark, t, _only_files={one})
    direct = spark.read.parquet(one)
    assert got.count() == direct.count()
    assert {r["o_orderkey"] for r in got.collect()} == {
        r["o_orderkey"] for r in direct.collect()
    }
    empty = M.read_version(spark, t, _only_files=set())
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "o_orderkey",
        "o_totalprice",
    ]
