"""End-to-end corpus curation DAG: the composition proof that the
individual operators chain into the actual pre-training pipeline.

    raw docs
      → Gopher quality gate        (narrow filter)
      → exact dedup                (md5 groupBy, min-id keeper)
      → near-dup cluster keeper    (MinHash-LSH → Jaccard → connected
                                    components → component-min keeper)
      → context-window chunking    (narrow explode)
      → sequence packing           (per-source window cumsum)
      → stride-interleave schedule (per-source rank / weight — every
                                    prefix of the stream ≈ the corpus
                                    mixture; plans/curation.py's
                                    s_stride_interleave is the
                                    oracle-checked twin)

Every stage returns DataFrames (nothing collected except the audit
counts), so the whole DAG stays lazy until the caller writes the
packed output.  The audit trail is the lineage record a production
corpus build ships with its shards.

Scale: stages share the doc_id / source keys their shuffles already
use (SCALE.md "Corpus curation"); the only pairwise work is inside
LSH candidate buckets."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finance_etl_pipeline_spark.operators import curation as C
from finance_etl_pipeline_spark.operators import dedup as D

GOPHER_WC_MIN, GOPHER_WC_MAX = 10, 100_000
GOPHER_TOP2_MAX = 0.2
NEARDUP_THRESHOLD = 0.7
PACK_BUDGET = 128  # tokens per packed sequence (= plans/curation.py)


def gopher_pass(docs: DataFrame) -> DataFrame:
    """Docs passing the word-count and repetition rules (the two
    Gopher rules that bind on this corpus — plans/curation.py's
    tx_gopher_flags is the oracle-checked full gate)."""
    with_t = docs.withColumn("__t", D.tokens_expr())
    sized = with_t.filter(
        F.size("__t").between(GOPHER_WC_MIN, GOPHER_WC_MAX)
    ).drop("__t")
    rep = C.bigram_top_share(docs, "doc_id")
    bad = rep.filter(F.col("top2_share") > GOPHER_TOP2_MAX).select("doc_id")
    return sized.join(F.broadcast(bad), "doc_id", "left_anti")


def exact_dedup_keepers(docs: DataFrame) -> DataFrame:
    """One doc per distinct text: the min doc_id of each content hash."""
    keep = (
        docs.groupBy(F.md5("text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


def neardup_keepers(docs: DataFrame) -> DataFrame:
    """Drop every near-dup cluster member except the component-min
    doc (MinHash-LSH candidates → exact Jaccard → connected
    components)."""
    sh_hashed = D.hashed_shingle_rows(docs).localCheckpoint(eager=False)
    cand = D.candidate_pairs(
        D.band_signatures(D.minhash_signatures_hashed(sh_hashed))
        # pinned for jaccard_verify_hashed's three internal consumers
        # (see plans/llm.py dd_minhash_lsh_pairs)
    ).localCheckpoint(eager=False)
    pairs = D.jaccard_verify_hashed(sh_hashed, cand, NEARDUP_THRESHOLD)
    labels = D.connected_components(pairs.select("doc_a", "doc_b"))
    losers = labels.filter(F.col("node") != F.col("lbl")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(F.broadcast(losers), "doc_id", "left_anti")


def schedule_sequences(packed: DataFrame) -> DataFrame:
    """Attach a stride-interleave schedule key to every packed
    sequence: each source emits at stride 1/weight (weight ∝ sqrt of
    its sequence count), so reading sequences in ``schedule_key``
    order yields a stream whose every prefix approximates the corpus
    mixture.  The key is frounded well above double noise and the
    per-source rank is a total order, so the schedule is deterministic
    across engines and partitionings."""
    from finance_etl_pipeline_spark.functions.scalars import fround

    seqs = packed.select("source", "seq_id").distinct()
    w = (
        seqs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_seqs"))
        .select(
            "source", F.sqrt(F.col("n_seqs").cast("double")).alias("wt")
        )
    )
    sw = w.agg(F.sum("wt").alias("sw"))
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy("seq_id")
    )
    keyed = (
        seqs.withColumn("rn", rn)
        .join(F.broadcast(w), "source")
        .crossJoin(F.broadcast(sw))
        .select(
            "source",
            "seq_id",
            fround(
                (F.col("rn") - 0.5) / (F.col("wt") / F.col("sw")), 4
            ).alias("schedule_key"),
        )
    )
    return packed.join(keyed, ["source", "seq_id"])


def curate(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(packed, audit): packed training sequences per source — each
    carrying its stride-interleave ``schedule_key`` — plus a
    stage-by-stage survivor-count audit trail."""
    spark = docs.sparkSession
    stages: list[tuple[str, DataFrame]] = [("raw", docs)]
    stages.append(("gopher_pass", gopher_pass(stages[-1][1])))
    stages.append(("exact_dedup", exact_dedup_keepers(stages[-1][1])))
    stages.append(("neardup_dedup", neardup_keepers(stages[-1][1])))
    kept = stages[-1][1]

    chunks = C.chunk_table(kept)
    cum = (
        Window.partitionBy("source")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        chunks.join(kept.select("doc_id", "source"), "doc_id")
        .withColumn(
            "tokens_before", F.sum("n_tokens").over(cum) - F.col("n_tokens")
        )
        .withColumn("seq_id", F.floor(F.col("tokens_before") / PACK_BUDGET))
    )
    packed = schedule_sequences(packed)

    audit = spark.createDataFrame(
        [(i, name, df.count()) for i, (name, df) in enumerate(stages)],
        "stage_idx int, stage string, n_docs long",
    )
    return packed, audit
