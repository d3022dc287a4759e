"""Distributed BPE (byte-pair-encoding) tokenizer training.

The classic subword-vocabulary learner (Sennrich et al. 2016), shaped
the way industrial trainers (e.g. HuggingFace tokenizers) actually run
at corpus scale: the corpus is reduced ONCE to a (word, freq) table —
the only corpus-sized operation — and every merge iteration operates
on that vocabulary-bounded table.  Pair counting is an explode +
map-side-combined groupBy weighted by word frequency; the argmax merge
rule is a deterministic total order (count desc, then pair lexicographic);
applying a merge is a per-row higher-order fold (greedy leftmost,
non-overlapping — the reference BPE semantics).

No UDFs: the greedy merge is an ``aggregate`` HOF over the symbol
array (small per-row arrays — the regime where HOFs are the right
tool per SCALE.md's MinHash finding), so every step stays JVM-side.

The driver loop runs one action per ``batch`` merges (the argmax→
merge chain is unrolled in-plan, k 1-row argmaxes collected together);
the re-encoded vocab is localCheckpoint'ed at batch boundaries to keep
lineage flat (a cluster deployment uses persist(DISK_ONLY) — same
note as the MinHash shingle index in SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): the single corpus-sized reduction."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def to_symbols(word: Column) -> Column:
    """Split a word into single-character symbols."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substr(word, i, F.lit(1)),
    )


def adjacent_pairs(symbols: Column) -> Column:
    """All adjacent symbol pairs of a word (empty when < 2 symbols)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(symbols) - 1),
        lambda i: F.struct(
            F.element_at(symbols, i).alias("left"),
            F.element_at(symbols, i + 1).alias("right"),
        ),
    )
    return F.when(F.size(symbols) >= 2, grams).otherwise(
        F.array().cast("array<struct<left:string,right:string>>")
    )


def apply_merge(
    symbols: Column, left: str | Column, right: str | Column
) -> Column:
    """Greedy leftmost non-overlapping merge of (left, right) pairs —
    reference BPE semantics.  A fold: if the accumulator's last symbol
    is ``left`` and the incoming one is ``right``, replace the last
    with the concatenation; the concatenated token no longer equals
    ``left`` (it is strictly longer), so a just-merged token can't
    chain into an overlapping second merge — 'aaaa' under (a,a)
    becomes [aa, aa], not [aa, a, a] or [aaa, a].

    ``left``/``right`` may be Columns (the in-plan batched trainer
    feeds the argmax row's columns) or plain strings (driver-known
    rules)."""
    lc = F.lit(left) if isinstance(left, str) else left
    rc = F.lit(right) if isinstance(right, str) else right
    merged = F.concat(lc, rc)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, F.size(acc)) == lc)
            & (x == rc),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _argmax_pair(vocab: DataFrame) -> DataFrame:
    """1-row (left, right, pair_count) argmax over weighted pair counts
    with the deterministic (count desc, pair lexicographic) tiebreak."""
    return (
        vocab.select(
            F.explode(adjacent_pairs(F.col("symbols"))).alias("p"), "freq"
        )
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left", "right")
        .limit(1)
    )


def train_bpe(
    docs: DataFrame, n_merges: int = 10, batch: int = 5
) -> list[dict]:
    """Learn ``n_merges`` BPE merge rules from a document corpus.

    Returns [{'step', 'left', 'right', 'merged', 'pair_count'}, ...]
    in learning order.  Deterministic: the argmax over weighted pair
    counts breaks ties by (left, right) lexicographic order, so the
    merge sequence is independent of partitioning and engine.

    Merges are learned ``batch`` at a time in ONE Spark action: the
    sequential argmax→merge→argmax chain is unrolled into a single
    plan (the same p1/v1/…/pk shape the DuckDB oracle uses) — step
    j's vocab is the previous plan-stage vocab cross-joined with its
    own 1-row argmax, so later argmaxes see earlier merges without a
    driver round-trip.  The k argmax rows are unioned and collected
    together; identical aggregate sub-plans are shared via Spark's
    exchange reuse.  Driver actions: ceil(n_merges / batch) + 1
    (initial vocab checkpoint) instead of one per merge — the
    job-launch latency fix for real vocab sizes; each batch boundary
    re-encodes from driver-known literal rules and re-checkpoints so
    plan depth stays bounded by ``batch``, not ``n_merges``.
    """
    vocab = word_freq_table(docs).withColumn(
        "symbols", to_symbols(F.col("word"))
    )
    vocab = vocab.localCheckpoint(eager=True)
    rules: list[dict] = []
    step = 0
    while step < n_merges:
        k = min(batch, n_merges - step)
        stage = vocab
        arg_dfs: list[DataFrame] = []
        for j in range(k):
            best = _argmax_pair(stage)
            arg_dfs.append(best.select(F.lit(step + j + 1).alias("step"), "*"))
            stage = (
                stage.crossJoin(
                    F.broadcast(
                        best.select(
                            F.col("left").alias("__l"),
                            F.col("right").alias("__r"),
                        )
                    )
                )
                .withColumn(
                    "symbols",
                    apply_merge(F.col("symbols"), F.col("__l"), F.col("__r")),
                )
                .drop("__l", "__r")
            )
        batch_rules = arg_dfs[0]
        for d in arg_dfs[1:]:
            batch_rules = batch_rules.unionByName(d)
        collected = batch_rules.orderBy("step").collect()  # ONE action
        if not collected:
            break
        for row in collected:
            rules.append(
                {
                    "step": row["step"],
                    "left": row["left"],
                    "right": row["right"],
                    "merged": row["left"] + row["right"],
                    "pair_count": row["pair_count"],
                }
            )
        if len(collected) < k:
            break  # corpus exhausted mergeable pairs mid-batch
        step += k
        if step < n_merges:
            enc = F.col("symbols")
            for row in collected:
                enc = apply_merge(enc, row["left"], row["right"])
            # lazy: materializes inside the next batch's collect, so
            # each batch costs exactly ONE driver action
            vocab = vocab.withColumn("symbols", enc).localCheckpoint(
                eager=False
            )
    return rules


def encode_fertility(docs: DataFrame, rules: list[dict]) -> DataFrame:
    """Apply learned merges to the corpus and report tokenizer
    fertility: per-source mean subword tokens per word (lower is
    better; 1.0 = every word is a single token).  A narrow map —
    the merge chain is ``len(rules)`` nested HOF folds over small
    per-word arrays."""
    enc = to_symbols(F.col("word"))
    for r in rules:
        enc = apply_merge(enc, r["left"], r["right"])
    words = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"),
    ).filter(F.length("word") > 0)
    return (
        words.select("source", F.size(enc).alias("n_subwords"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subwords").alias("n_subwords"),
            (F.sum("n_subwords") / F.count(F.lit(1))).alias("fertility"),
        )
        .orderBy("source")
    )
