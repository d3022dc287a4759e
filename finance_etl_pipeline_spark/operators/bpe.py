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

The driver loop runs one tiny action per merge (a 1-row argmax
collect); the re-encoded vocab is localCheckpoint'ed each iteration to
keep lineage flat (a cluster deployment uses persist(DISK_ONLY) —
same note as the MinHash shingle index in SCALE.md).
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


def apply_merge(symbols: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping merge of (left, right) pairs —
    reference BPE semantics.  A fold: if the accumulator's last symbol
    is ``left`` and the incoming one is ``right``, replace the last
    with the concatenation; the concatenated token no longer equals
    ``left`` (it is strictly longer), so a just-merged token can't
    chain into an overlapping second merge — 'aaaa' under (a,a)
    becomes [aa, aa], not [aa, a, a] or [aaa, a]."""
    merged = F.lit(left + right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, F.size(acc)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(docs: DataFrame, n_merges: int = 10) -> list[dict]:
    """Learn ``n_merges`` BPE merge rules from a document corpus.

    Returns [{'step', 'left', 'right', 'merged', 'pair_count'}, ...]
    in learning order.  Deterministic: the argmax over weighted pair
    counts breaks ties by (left, right) lexicographic order, so the
    merge sequence is independent of partitioning and engine.
    """
    vocab = word_freq_table(docs).withColumn(
        "symbols", to_symbols(F.col("word"))
    )
    vocab = vocab.localCheckpoint(eager=True)
    rules: list[dict] = []
    for step in range(1, n_merges + 1):
        best = (
            vocab.select(
                F.explode(adjacent_pairs(F.col("symbols"))).alias("p"), "freq"
            )
            .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        rules.append(
            {
                "step": step,
                "left": row["left"],
                "right": row["right"],
                "merged": row["left"] + row["right"],
                "pair_count": row["pair_count"],
            }
        )
        vocab = vocab.withColumn(
            "symbols", apply_merge(F.col("symbols"), row["left"], row["right"])
        ).localCheckpoint(eager=True)
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
