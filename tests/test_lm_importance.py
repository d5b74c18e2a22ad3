"""Bigram-LM likelihood (operators/lm.py) and DSIR importance
(operators/importance.py) against pure-Python references — including
the double-precision log quantities the DuckDB oracles deliberately
don't cover (the catalog queries compare the exact-integer forms; the
log forms are pinned here instead)."""

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from gush_spark.operators import importance, lm
from gush_spark.operators.dedup import best_per_cluster

DOCS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the cat sat on the mat again and again", "en"),
    (3, "a dog runs fast and the dog barks", "en"),
    (4, "der hund läuft schnell und der hund bellt", "de"),
    (5, "le chat dort sur le tapis", "fr"),
    (6, "", "en"),  # empty -> 0 bigrams, stays in output
    (7, "single", "en"),  # one token -> 0 bigrams
    (8, "the the the the the", "en"),  # degenerate repetition
]


def _norm(s):
    return re.sub(r"\s+", " ", s.lower()).strip()


def _words(s):
    return _norm(s).split(" ")  # split('', ' ') == [''] in both engines


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _bigrams(s):
    ws = _words(s)
    return [(_md5(ws[i]), _md5(_md5(ws[i]) + _md5(ws[i + 1])))
            for i in range(len(ws) - 1)]


def _py_model(ref_rows, prune_min_count=1):
    model, ctx, vocab = Counter(), Counter(), set()
    for _, text, _ in ref_rows:
        for h1, gk in _bigrams(text):
            model[gk] += 1
            ctx[h1] += 1
        vocab.update(_md5(w) for w in _words(text))
    if prune_min_count > 1:
        model = Counter({g: c for g, c in model.items() if c >= prune_min_count})
    return model, ctx, len(vocab)


def _py_scores(rows, model, ctx, V):
    out = {}
    for doc_id, text, _ in rows:
        bgs = _bigrams(text)
        n = len(bgs)
        matched = sum(1 for _, gk in bgs if gk in model)
        sum_p9 = sum(
            ((model.get(gk, 0) + 1) * lm.P9_SCALE) // (ctx.get(h1, 0) + V)
            for h1, gk in bgs
        )
        logs = [
            math.log((model.get(gk, 0) + 1) / (ctx.get(h1, 0) + V))
            for h1, gk in bgs
        ]
        mean_logp = sum(logs) / n if n else None
        out[doc_id] = (n, matched, sum_p9, mean_logp)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def test_lm_scores_match_python_reference(spark, docs_df):
    ref_rows = [r for r in DOCS if r[2] == "en"]
    model, ctx, vocab = lm.train_bigram_lm(
        docs_df.filter(F.col("lang") == "en"), "doc_id", "text"
    )
    got = {
        r["doc_id"]: r
        for r in lm.score_with_bigram_lm(
            docs_df, model, ctx, vocab, "doc_id", "text", with_logprob=True
        ).collect()
    }
    exp = _py_scores(DOCS, *_py_model(ref_rows))
    assert set(got) == {d for d, *_ in DOCS}
    for doc_id, (n, matched, sum_p9, mean_logp) in exp.items():
        row = got[doc_id]
        assert (row["n_bigrams"], row["matched_bigrams"], row["sum_p9"]) == (
            n, matched, sum_p9,
        ), doc_id
        if mean_logp is None:
            assert row["mean_logp"] is None
        else:
            assert row["mean_logp"] == pytest.approx(mean_logp, rel=1e-12)


def test_lm_pruned_broadcast_path(spark, docs_df):
    """prune_min_count=2 + broadcast_model: pruned grams score as
    unseen, context denominators stay exact — vs the same pruning in
    the Python reference."""
    ref_rows = [r for r in DOCS if r[2] == "en"]
    model, ctx, vocab = lm.train_bigram_lm(
        docs_df.filter(F.col("lang") == "en"), "doc_id", "text",
        prune_min_count=2,
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["matched_bigrams"], r["sum_p9"])
        for r in lm.score_with_bigram_lm(
            docs_df, model, ctx, vocab, "doc_id", "text", broadcast_model=True
        ).collect()
    }
    pm, pc, pv = _py_model(ref_rows, prune_min_count=2)
    exp = {d: v[:3] for d, v in _py_scores(DOCS, pm, pc, pv).items()}
    assert got == exp


def test_lm_gate_thresholds_on_mean_logp(spark, docs_df):
    ref_rows = [r for r in DOCS if r[2] == "en"]
    exp_scores = _py_scores(DOCS, *_py_model(ref_rows))
    thr = -3.0
    expected_kept = {
        d for d, (_, _, _, mlp) in exp_scores.items()
        if mlp is not None and mlp >= thr
    }
    assert expected_kept and expected_kept != {d for d, *_ in DOCS}
    model, ctx, vocab = lm.train_bigram_lm(
        docs_df.filter(F.col("lang") == "en"), "doc_id", "text"
    )
    kept = lm.lm_gate(
        docs_df, model, ctx, vocab, "doc_id", "text", min_mean_logp=thr
    )
    assert {r["doc_id"] for r in kept.collect()} == expected_kept
    assert kept.columns == docs_df.columns  # gate returns full rows


# --- DSIR ------------------------------------------------------------------

B = importance.DEFAULT_BUCKETS


def _bucket(md5hex):
    return int(md5hex[:15], 16) % B


def _py_feats(text):
    ws = _words(text)
    feats = [_bucket(_md5(w)) for w in ws]
    feats += [_bucket(gk) for _, gk in _bigrams(text)]
    return feats


def _py_dsir(rows, target_pred):
    tc, rc = Counter(), Counter()
    for _, text, lang in rows:
        for b in _py_feats(text):
            rc[b] += 1
            if target_pred(lang):
                tc[b] += 1
    st = sum(tc.values()) + B
    sr = sum(rc.values()) + B
    out = {}
    for doc_id, text, _ in rows:
        fs = _py_feats(text)
        num = sum((tc.get(b, 0) + 1) * sr for b in fs)
        den = sum((rc.get(b, 0) + 1) * st for b in fs)
        lw = sum(
            math.log((tc.get(b, 0) + 1) / st) - math.log((rc.get(b, 0) + 1) / sr)
            for b in fs
        )
        out[doc_id] = (len(fs), num, den, lw if fs else None)
    return out


def test_dsir_scores_match_python_reference(spark, docs_df):
    counts, tot = importance.fit_bucket_distributions(
        docs_df, F.col("lang") == "en", "doc_id", "text"
    )
    got = {
        r["doc_id"]: r
        for r in importance.importance_scores(
            docs_df, counts, tot, "doc_id", "text", with_logweight=True
        ).collect()
    }
    exp = _py_dsir(DOCS, lambda lang: lang == "en")
    for doc_id, (n, num, den, lw) in exp.items():
        row = got[doc_id]
        assert (row["n_feats"], row["aff_num"], row["aff_den"]) == (n, num, den)
        if lw is None:
            assert row["log_weight"] is None
        else:
            assert row["log_weight"] == pytest.approx(lw, rel=1e-9)


def test_dsir_resample_matches_python_predicate(spark, docs_df):
    exp = _py_dsir(DOCS, lambda lang: lang == "en")
    permille = 1000
    expected_kept = {
        d for d, (n, num, den, _) in exp.items()
        if n > 0 and num * 1000 >= den * permille
    }
    assert expected_kept and expected_kept != {d for d, *_ in DOCS}
    counts, tot = importance.fit_bucket_distributions(
        docs_df, F.col("lang") == "en", "doc_id", "text"
    )
    kept = importance.importance_resample(
        docs_df, counts, tot, "doc_id", "text", min_ratio_permille=permille
    )
    assert {r["doc_id"] for r in kept.collect()} == expected_kept
    assert kept.columns == docs_df.columns


# --- keep-best canonical selection ----------------------------------------


def test_best_per_cluster_argmax_and_ties(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        ["doc_id", "cluster_id"],
    )
    scored = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.3), (6, 0.3)],
        ["doc_id", "score"],
    )
    got = {
        r["cluster_id"]: (r["doc_id"], r["score"], r["n_members"])
        for r in best_per_cluster(clusters, scored, "doc_id", "score").collect()
    }
    # cluster 1: 0.9 tie between 2 and 3 -> smallest id; cluster 5 likewise
    assert got == {1: (2, 0.9, 3), 4: (4, 0.1, 1), 5: (5, 0.3, 2)}

    flagged = best_per_cluster(
        clusters, scored, "doc_id", "score", keep_only=False
    )
    rows = flagged.collect()
    assert len(rows) == 6
    canon = {r["doc_id"] for r in rows if r["is_canonical"]}
    assert canon == {2, 4, 5}
    # per-cluster membership counts agree between the two forms
    assert {(r["cluster_id"], r["n_members"]) for r in rows} == {
        (1, 3), (4, 1), (5, 2),
    }


def test_ccnet_buckets_balanced_and_head_is_in_domain(spark):
    """Per-source tertiles are balanced (ntile semantics: sizes differ
    by at most 1) and the docs written in the reference vocabulary land
    in 'head' while out-of-domain word salad lands in 'tail'."""
    from pyspark.sql import Window

    ref_text = "the model reads the data and the model writes the table"
    rows = []
    for i in range(6):
        rows.append((i, ref_text, "en", "src_a"))
    for i in range(6, 9):
        rows.append((i, f"zz{i} qq{i} ww{i} rr{i} ss{i} tt{i}", "xx", "src_a"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    model, ctx, vocab = lm.train_bigram_lm(
        docs.filter(F.col("lang") == "en"), "doc_id", "text"
    )
    scores = lm.score_with_bigram_lm(docs, model, ctx, vocab, "doc_id", "text")
    means = docs.select("doc_id", "source").join(
        scores.select("doc_id", "n_bigrams", "sum_p9"), on="doc_id"
    ).select(
        "doc_id", "source",
        F.when(F.col("n_bigrams") > 0, F.expr("sum_p9 DIV n_bigrams"))
        .otherwise(F.lit(0)).cast("long").alias("mean_p9"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("mean_p9").desc(), F.col("doc_id")
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in means.select(
            "doc_id", F.ntile(3).over(w).alias("bucket")
        ).collect()
    }
    from collections import Counter

    sizes = Counter(got.values())
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # the three out-of-domain docs all score lower than every in-domain
    # doc, so they fill the tail bucket
    assert {got[i] for i in (6, 7, 8)} == {3}
    assert all(got[i] in (1, 2) for i in range(6))
