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


def test_vocab_coverage_exact_and_plan(spark):
    from gush_spark.operators.bpe import vocab_coverage

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),       # with k=2 vocab={'the','cat'}: 1 oov
            (2, "the the dog"),       # 1 oov
            (3, "owl"),               # 1 oov of 1
            (4, "the cat"),           # 0 oov
            (5, None),                # no tokens -> absent
            (6, "   "),               # no tokens -> absent
        ],
        "doc_id long, text string",
    )
    # corpus counts: the x4, cat x2, sat/dog/owl x1 -> top-2 = {cat, the}
    # (count desc, word asc: 'the'(4), 'cat'(2))
    out = vocab_coverage(docs, vocab_k=2).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ppm"]) for r in out}
    assert got == {
        1: (3, 1, 333_333),
        2: (3, 1, 333_333),
        3: (1, 1, 1_000_000),
        4: (2, 0, 0),
    }
    df = vocab_coverage(docs, vocab_k=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan   # vocab cut, no global sort
    assert "BroadcastHashJoin" in plan       # membership never shuffles corpus


def test_vocab_coverage_tie_break_deterministic(spark):
    from gush_spark.operators.bpe import vocab_coverage

    # 'aa' and 'bb' tie at count 2; k=1 must keep 'aa' (word asc)
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb")], "doc_id long, text string"
    )
    for parts in (1, 8):
        got = {
            r["doc_id"]: r["n_oov"]
            for r in vocab_coverage(docs.repartition(parts), vocab_k=1).collect()
        }
        assert got == {1: 1, 2: 1}  # 'bb' is the OOV in both docs
