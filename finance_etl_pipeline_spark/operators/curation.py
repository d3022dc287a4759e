"""Corpus-curation operators for LLM training-data pipelines:
chunking, repetition cleanup, and mixture resampling.

The reference has no equivalent surface (SURVEY.md §2 scope note /
BASELINE.json north_star) — these are the operations a 100 TB
pre-training corpus pass needs between raw documents and tokenized
shards:

- **chunking with overlap**: split each document into fixed-size token
  windows (context-length packing; overlap preserves cross-boundary
  n-grams for retrieval).  A narrow per-row explode — no shuffle at
  all; output rows ∝ corpus tokens / stride.
- **consecutive-repeat collapse**: the cheapest of the Gopher-style
  repetition cleanups (stutter removal) as a pure array expression.
- **temperature-scaled mixture resampling**: re-weight the per-source
  document mix by ``size^alpha`` (alpha<1 upsamples small domains —
  the standard multilingual/domain-balance trick) and select the kept
  set by content-hash rank so the sample is reproducible across
  engines and partitionings.

Everything is built from DataFrame expressions (no UDFs) so each op is
oracle-verifiable and stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.dedup import tokens_expr

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def chunk_table(
    docs: DataFrame,
    chunk: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text): overlapping token
    windows.  Chunk k covers tokens [1+k*stride, 1+k*stride+chunk);
    the last window may be short.  ``sequence``'s inclusive upper
    bound means a start is generated for every position <= len, so
    every token lands in >=1 chunk.

    Scale: narrow map + explode, zero shuffle; at 100 TB this runs
    embarrassingly parallel over whatever partitioning the scan
    produced."""
    from finance_etl_pipeline_spark.sources.readers import spread

    docs = spread(docs)
    toks = tokens_expr()
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride))
    out = docs.select(
        F.col(id_col),
        toks.alias("__t"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    piece = F.slice(F.col("__t"), F.col("__start"), chunk)
    return out.select(
        id_col,
        "chunk_idx",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def collapse_repeats(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, n_kept, cleaned_prefix): drop every token
    equal to its immediate predecessor ("the the" → "the").

    Pure array expression (filter with positional lambda): the
    conditional is an IF so the 0-based back-reference ``t[i-1]`` is
    never evaluated at i=0 (ANSI-safe)."""
    from finance_etl_pipeline_spark.sources.readers import spread

    docs = spread(docs)
    with_t = docs.select(F.col(id_col), tokens_expr().alias("t"))
    kept = F.expr("filter(t, (x, i) -> if(i = 0, true, x != t[i - 1]))")
    return with_t.select(
        id_col,
        F.size("t").alias("n_tokens"),
        F.size(kept).alias("n_kept"),
        F.substring(F.concat_ws(" ", kept), 1, 60).alias("cleaned_prefix"),
    )


def bigram_top_share(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, top2_share): fraction of a document's word-2-grams
    taken by its single most frequent 2-gram — Gopher's repetition
    signal (high share = boilerplate / template text).  The share is
    returned RAW; callers round it under their own contract (the
    oracle-paired plan rounds at 4 dp).

    Two small aggregations keyed by doc_id; at scale both shuffles
    carry one row per distinct (doc, gram), already combined
    map-side."""
    with_t = docs.select(F.col(id_col), tokens_expr().alias("t"))
    grams = F.when(
        F.size("t") >= 2,
        F.expr("transform(sequence(1, size(t) - 1), i -> concat_ws(' ', t[i-1], t[i]))"),
    ).otherwise(F.array().cast("array<string>"))
    g = with_t.select(id_col, F.explode(grams).alias("g"))
    per_gram = g.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy(id_col).agg(
        (F.max("c").cast("double") / F.sum("c")).alias("top2_share")
    )
