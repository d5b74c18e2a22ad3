"""BPE tokenizer-prep statistics (operators/bpe.py): frequency-weighted
pair counting over the distinct vocabulary, argmax = first merge."""

from gush_spark.operators.bpe import bpe_pair_counts, word_freqs


def test_pair_counts_weighted_by_word_freq(spark):
    docs = spark.createDataFrame(
        # 'abab' x3  -> pairs ab,ba,ab per occurrence
        # 'ab'   x2  -> ab
        # 'x'        -> no pairs (single char)
        [(1, "abab abab abab ab ab x")],
        "doc_id long, text string",
    )
    wf = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert wf == {"abab": 3, "ab": 2, "x": 1}
    counts = {r["pair"]: r["n"] for r in bpe_pair_counts(docs).collect()}
    assert counts == {"ab": 3 * 2 + 2, "ba": 3}


def test_topk_rank_is_first_merge(spark):
    docs = spark.createDataFrame(
        [(1, "aaa aaa bb")], "doc_id long, text string"
    )
    rows = bpe_pair_counts(docs, k=2).collect()
    assert [(r["pair"], r["n"], r["rank"]) for r in rows] == [
        ("aa", 4, 1),  # 2 pairs x freq 2
        ("bb", 1, 2),
    ]
