"""Structural properties of the curation operators (the oracle checks
values; these check the invariants that make the ops safe to run
blind over a 100 TB corpus)."""

import os

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import curation as C
from finance_etl_pipeline_spark.operators.dedup import tokens_expr
from finance_etl_pipeline_spark.sources.readers import table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_chunks_reconstruct_original_tokens(spark):
    """Dropping each chunk's overlap tail (keeping the first STRIDE
    tokens, all of the last chunk) and concatenating in chunk order
    must reproduce the document's token stream exactly — i.e. the
    windows tile the document with no gap and no loss."""
    docs = table(spark, SF_DIR, "documents")
    orig = {
        r["doc_id"]: r["t"]
        for r in docs.select("doc_id", tokens_expr().alias("t")).collect()
    }
    chunks = C.chunk_table(docs).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(orig)
    for doc_id, rows in by_doc.items():
        rebuilt: list[str] = []
        for i, r in enumerate(rows):
            # unconditional split mirrors Spark's semantics: an empty
            # chunk_text still holds ONE empty token ([''].size == 1)
            toks = r["chunk_text"].split(" ")
            assert len(toks) == r["n_tokens"]
            last = i == len(rows) - 1
            rebuilt.extend(toks if last else toks[: C.CHUNK_STRIDE])
        assert rebuilt == orig[doc_id], f"doc {doc_id} tiles badly"


def test_collapse_repeats_is_idempotent_and_shorter(spark):
    docs = table(spark, SF_DIR, "documents")
    out = C.collapse_repeats(docs)
    bad = out.filter(F.col("n_kept") > F.col("n_tokens")).count()
    assert bad == 0
    # collapsing an already-collapsed stream changes nothing: rebuild
    # each doc from its full collapsed token stream and collapse again
    kept = F.expr("filter(t, (x, i) -> if(i = 0, true, x != t[i - 1]))")
    once = (
        docs.select(F.col("doc_id"), tokens_expr().alias("t"))
        .select("doc_id", F.concat_ws(" ", kept).alias("text"))
    )
    twice = C.collapse_repeats(once)
    diff = (
        twice.filter(F.col("n_kept") != F.col("n_tokens")).count()
    )
    assert diff == 0


def test_curation_operators_on_empty_input(spark):
    """Zero-row input → zero-row output, correct schema, no crash —
    the property that lets these ops run blind in a pipeline whose
    upstream filter may leave nothing."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    empty = spark.createDataFrame(
        [],
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        ),
    )
    assert C.chunk_table(empty).count() == 0
    assert C.collapse_repeats(empty).count() == 0
    assert C.bigram_top_share(empty).count() == 0
    assert set(C.chunk_table(empty).columns) == {
        "doc_id",
        "chunk_idx",
        "n_tokens",
        "chunk_text",
    }


def test_drift_ks_zero_rows_on_all_null_values(spark, tmp_path):
    """Degenerate input (every event value NULL): BOTH engines emit
    zero rows — the Spark global agg must not leak its one all-NULL
    row where the oracle's GROUP BY produces none."""
    import datetime

    import duckdb

    from finance_etl_pipeline_spark.plans import all_queries

    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, i), i % 3, "view", None, None)
        for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    q = all_queries()["drift_ks_value"]
    assert q.fn(spark, str(tmp_path)).count() == 0

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    assert len(con.sql(q.oracle).fetchall()) == 0


def test_bloom_decontaminate_no_false_negatives(spark, sf_dir):
    """Bloom membership can only overcount: per doc, the bloom hit
    count must be >= the exact query's (and equal for most docs at the
    test load factor)."""
    from finance_etl_pipeline_spark.plans import all_queries

    qs = all_queries()
    exact = {
        r["doc_id"]: r["n_hit"]
        for r in qs["tx_decontaminate"].fn(spark, sf_dir).collect()
    }
    bloom = {
        r["doc_id"]: r["n_hit"]
        for r in qs["tx_decontaminate_bloom"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(bloom)
    for d in exact:
        assert bloom[d] >= exact[d], (d, bloom[d], exact[d])
