"""Tokenizer-training prep: corpus word-frequency table and the BPE
first-iteration adjacent-pair statistics (Sennrich et al. 2016) — the
inputs a byte-pair-encoding vocabulary trainer consumes.

Full BPE training is inherently sequential (each merge changes the
next iteration's pair counts), so the iterative loop belongs in the
trainer process over the REDUCED tables this module produces; what a
10^12-page corpus needs from the cluster is exactly these two
aggregations:

- ``word_freqs``: (word, freq) over the corpus — the explode+count
  whose output is VOCABULARY-sized (the classic BPE trick: all further
  pair counting happens per distinct word weighted by freq, never per
  occurrence);
- ``bpe_pair_counts``: adjacent character-pair counts,
  ``Σ_words freq(word) · pairs_in(word)`` — the statistic the first
  merge is chosen from. The char-pair explosion runs over the DISTINCT
  vocabulary (thousands-to-millions of short strings), so the
  higher-order lambda's interpreted cost is bounded by vocab size, not
  corpus size.

No end-of-word marker symbol is appended (classic BPE's ``</w>``):
the pair table here is over raw characters; a trainer wanting
boundary-aware merges adds its marker to the reduced word table
downstream. Counts are BIGINTs throughout — engine/order-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import words_of


def word_freqs(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) corpus table — one explode + count, map-side
    combined; the only corpus-sized pass in tokenizer prep."""
    return (
        docs.select(F.explode(words_of(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    *,
    k: int | None = None,
) -> DataFrame:
    """Adjacent char-pair counts weighted by word frequency:
    ``(pair, n)`` — the argmax is BPE's first merge. With ``k``, the
    top-k candidate merges ride orderBy+limit (TakeOrderedAndProject)
    with a rank column; without, the full pair table returns."""
    wf = word_freqs(docs, text_col)
    pairs = wf.select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))")
        ).alias("pair"),
    ).filter(F.length("pair") == 2)
    counts = pairs.groupBy("pair").agg(F.sum("freq").alias("n"))
    if k is None:
        return counts
    top = counts.orderBy(F.desc("n"), "pair").limit(k)
    w = Window.orderBy(F.desc("n"), "pair")
    return top.select(
        "pair", "n", F.row_number().over(w).cast("long").alias("rank")
    )


def vocab_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    vocab_k: int = 500,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document OOV rate against the corpus's own top-``vocab_k``
    word vocabulary — the tokenizer-sizing / coverage report
    (how much of the corpus does a K-entry word vocab cover; the
    whole-word analog of what BPE fertility measures): documents with
    a high OOV fraction are the ones a word-level model truncates to
    UNK and a subword trainer must budget merges for, and a sudden
    OOV-rate shift per source is the same drift signal
    corpus_drift_report reads from lengths.

    Returns ``(doc_id, n_tokens, n_oov, oov_ppm)`` for every doc with
    at least one non-empty token; ``oov_ppm = n_oov·scale div
    n_tokens`` is exact BIGINT fixed point (both engines truncate).

    Scale shape: the vocabulary is one map-side-combinable word count
    (VOCABULARY-sized output, the word_freqs pass) topped by
    ``orderBy(n desc, word).limit(k)`` — TakeOrderedAndProject
    per-partition heads with a DETERMINISTIC boundary (ties broken by
    the word itself, so the cut never depends on partitioning); the
    corpus pass marks membership through ONE broadcast left join (the
    K-row vocab ships to every executor; the corpus never shuffles for
    the membership test) and folds to the per-doc counts in one
    doc-keyed agg.
    """
    toks = (
        docs.withColumn("_ws", words_of(F.col(text_col)))
        .select(F.col(id_col), F.explode("_ws").alias("word"))
        .filter(F.col("word") != "")
    )
    vocab = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(vocab_k)
        .select("word", F.lit(1).alias("_iv"))
    )
    return (
        toks.join(F.broadcast(vocab), "word", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.coalesce(
                F.sum(F.when(F.col("_iv").isNull(), 1).otherwise(0)), F.lit(0)
            ).alias("n_oov"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            F.expr(f"n_oov * {scale} div n_tokens").alias("oov_ppm"),
        )
    )
