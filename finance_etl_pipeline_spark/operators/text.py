"""Text-analysis operators for LLM training-data pipelines.

Language-ID (lexicon n-gram heuristic), quality scoring (length /
stopword / token-shape ratios), token counting, and document
fingerprinting (min-hash of rolling shingles).  All built from
higher-order array functions — JVM-side, no Python UDFs — so they
survive 100 TB scans inside whole-stage codegen and are verifiable
against the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid
from finance_etl_pipeline_spark.operators.dedup import (
    hash60_expr,
    shingles_expr,
    tokens_expr,
)

# Tiny fixed lexicons for the heuristic classifier.  Real language ID
# would ship per-language frequency tables; the synthetic corpus uses
# an English-ish vocabulary, so these are engine-vocabulary buckets —
# the operator shape (lexicon-hit argmax) is what matters.
LEXICONS: dict[str, tuple[str, ...]] = {
    "A": ("the", "a", "fast", "slow", "small"),
    "B": ("scan", "join", "merge", "sort", "filter"),
    "C": ("table", "window", "row", "column", "group"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "in")


def lexicon_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    """How many tokens fall in the lexicon (with multiplicity)."""
    return F.size(
        F.filter(tokens, lambda t: t.isin(*words))
    ).cast("long")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counts + mean token length."""
    t = tokens_expr()
    total_len = F.aggregate(
        F.transform(t, lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct_tokens"),
        igrid(total_len.cast("double") / F.size(t), 4).alias("mean_token_len_e4"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Lexicon-hit argmax with a deterministic A>B>C tie order."""
    t = tokens_expr()
    hits = {k: lexicon_hits(t, v) for k, v in LEXICONS.items()}
    pred = (
        F.when((hits["A"] >= hits["B"]) & (hits["A"] >= hits["C"]), "A")
        .when(hits["B"] >= hits["C"], "B")
        .otherwise("C")
    )
    return docs.select(
        "doc_id",
        hits["A"].alias("hits_a"),
        hits["B"].alias("hits_b"),
        hits["C"].alias("hits_c"),
        pred.alias("predicted_lexicon"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Composite document-quality score in [0, 1]:
    0.4·length + 0.3·stopword-density + 0.3·token-shape."""
    t = tokens_expr()
    n_tokens = F.size(t).cast("double")
    stop_ratio = lexicon_hits(t, STOPWORDS).cast("double") / F.nullif(
        n_tokens, F.lit(0.0)
    )
    total_len = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    mean_tok = total_len.cast("double") / F.nullif(n_tokens, F.lit(0.0))
    length_score = F.least(F.length("text").cast("double") / 500.0, F.lit(1.0))
    shape_score = F.least(mean_tok / 8.0, F.lit(1.0))
    score = 0.4 * length_score + 0.3 * stop_ratio + 0.3 * shape_score
    return docs.select(
        "doc_id",
        igrid(length_score, 4).alias("length_score_e4"),
        igrid(stop_ratio, 4).alias("stopword_ratio_e4"),
        igrid(shape_score, 4).alias("shape_score_e4"),
        igrid(score, 4).alias("quality_score_e4"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Rolling-shingle document fingerprint: the minimum 60-bit hash
    over the doc's word 3-grams (a 1-hash MinHash — equal fingerprints
    are near-dup candidates)."""
    from finance_etl_pipeline_spark.sources.readers import spread

    t = tokens_expr()
    # spread: the testdata docs table is a single small file → one
    # scan partition, which serialized the md5-per-shingle stage on
    # one core (measured 8.3 s → 1.1 s at sf0.1; shingle_table and
    # simhash_table already do this, fingerprints had been missed)
    sh = spread(docs).select("doc_id", F.explode(shingles_expr(t)).alias("s"))
    return sh.groupBy("doc_id").agg(
        F.min(hash60_expr(F.col("s"))).alias("fingerprint")
    )


def compression_ratio(docs: DataFrame) -> DataFrame:
    """Per-document zlib compressibility: compressed/raw byte ratio —
    the cheap entropy proxy curation pipelines use to catch
    templated/looping text that token-level heuristics miss (highly
    compressible ⇒ repetitive).  Arrow-batched ``mapInPandas`` with
    std-lib zlib at a FIXED level (6): deterministic bytes in this
    container, batch-vectorized transfer, no per-row Python overhead
    beyond the compressor itself.  No SQL oracle (DuckDB has no
    zlib); verified by property tests instead."""
    import zlib

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("raw_bytes", LongType()),
            StructField("compressed_bytes", LongType()),
            StructField("ratio_e4", LongType()),
        ]
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            raw = pdf["text"].str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            rawlen = raw.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "raw_bytes": rawlen.astype("int64"),
                    "compressed_bytes": comp.astype("int64"),
                    "ratio_e4": (
                        comp * 10000 // rawlen.clip(lower=1)
                    ).astype("int64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(batches, schema)
