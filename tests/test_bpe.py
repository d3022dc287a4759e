"""Distributed BPE trainer vs a pure-Python reference twin.

The Spark trainer (operators/bpe.py) must reproduce the exact merge
sequence of a straightforward single-process BPE implementation with
the same tie-break (count desc, then pair lexicographic) — the
strongest check available for an iterative operator with no SQL
oracle: not statistics, the full learned artifact, bit-for-bit.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.bpe import (
    adjacent_pairs,
    apply_merge,
    encode_fertility,
    to_symbols,
    train_bpe,
    word_freq_table,
)
from finance_etl_pipeline_spark.sources.readers import table

N_MERGES = 10


def _python_bpe(word_freqs: dict[str, int], n_merges: int) -> list[dict]:
    vocab = {w: list(w) for w in word_freqs}
    rules = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # argmax: count desc, then (left, right) lexicographic
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        rules.append(
            {
                "step": step,
                "left": left,
                "right": right,
                "merged": left + right,
                "pair_count": n,
            }
        )
        for w, syms in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            vocab[w] = out
    return rules


def test_merge_sequence_matches_python_twin(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    got = train_bpe(docs, n_merges=N_MERGES)

    wf = {
        r["word"]: r["freq"] for r in word_freq_table(docs).collect()
    }
    want = _python_bpe(wf, N_MERGES)
    assert got == want


def test_greedy_merge_is_leftmost_nonoverlapping(spark):
    df = spark.createDataFrame([("aaaa",), ("banana",)], "word: string")
    out = {
        r["word"]: r["m"]
        for r in df.select(
            "word", apply_merge(to_symbols(F.col("word")), "a", "a").alias("m")
        ).collect()
    }
    assert out["aaaa"] == ["aa", "aa"]
    assert out["banana"] == ["b", "a", "n", "a", "n", "a"]

    an = {
        r["word"]: r["m"]
        for r in df.select(
            "word", apply_merge(to_symbols(F.col("word")), "a", "n").alias("m")
        ).collect()
    }
    assert an["banana"] == ["b", "an", "an", "a"]


def test_adjacent_pairs_guard_short_words(spark):
    df = spark.createDataFrame([("x",), ("xy",)], "word: string")
    out = {
        r["word"]: r["p"]
        for r in df.select(
            "word", adjacent_pairs(to_symbols(F.col("word"))).alias("p")
        ).collect()
    }
    assert out["x"] == []
    assert [tuple(p) for p in out["xy"]] == [("x", "y")]


def _py_greedy(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


@settings(max_examples=15, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=8
    ),
    pair=st.tuples(
        st.sampled_from(["a", "b"]), st.sampled_from(["a", "b"])
    ),
)
def test_apply_merge_property(spark, words, pair):
    """The HOF fold implements greedy leftmost non-overlapping merge
    for ANY word/pair over an adversarial 2-letter alphabet (max
    overlap pressure: aa, abab, aaaa...)."""
    left, right = pair
    df = spark.createDataFrame([(w,) for w in words], "word: string")
    got = {
        r["word"]: r["m"]
        for r in df.select(
            "word",
            apply_merge(to_symbols(F.col("word")), left, right).alias("m"),
        ).collect()
    }
    for w in words:
        assert got[w] == _py_greedy(list(w), left, right), (w, left, right)


def test_encoding_roundtrip_reassembles_words(spark, sf_dir):
    """Lossless-tokenization invariant: concatenating a word's subword
    tokens must reproduce the word exactly, for every word in the
    vocabulary, after all 10 merges."""
    docs = table(spark, sf_dir, "documents")
    rules = train_bpe(docs, n_merges=N_MERGES)
    enc = to_symbols(F.col("word"))
    for r in rules:
        enc = apply_merge(enc, r["left"], r["right"])
    bad = (
        word_freq_table(docs)
        .select("word", F.concat_ws("", enc).alias("rejoined"))
        .filter(F.col("word") != F.col("rejoined"))
        .count()
    )
    assert bad == 0


def test_fertility_bounds(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    rules = train_bpe(docs, n_merges=N_MERGES)
    fert = encode_fertility(docs, rules).collect()
    assert len(fert) > 0
    for r in fert:
        # merges only ever shrink the symbol count, never below 1/word
        assert r["fertility"] >= 1.0
        assert r["n_subwords"] >= r["n_words"]
