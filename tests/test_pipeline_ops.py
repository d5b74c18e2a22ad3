"""Unit tests for the training-data-pipeline operators (dedup,
similarity, text analysis, multimodal plumbing) on tiny hand-built
inputs with hand-checkable expectations. The DuckDB oracle
(tools/verify_oracle.py) is the exhaustive gate; these pin the
semantics on edge cases the synthetic tables don't cover."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from gush_spark.functions import text_analysis as ta
from gush_spark.functions.multimodal import decode_image, with_blob_features
from gush_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "THE  Quick   Brown fox jumps over the lazy dog"),  # ws+case dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (4, "completely different content here entirely unrelated words"),
        (5, "ab"),  # shorter than one shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_norm_text_collapses_case_and_whitespace(spark):
    df = spark.range(1).select(ta.norm_text(F.lit("  A \t B\n\nc ")).alias("t"))
    assert df.first()["t"] == "a b c"


def test_exact_dedup_keeps_lowest_id(docs):
    out = {r["doc_id"]: r for r in dedup.exact_dedup(docs, "doc_id", "text").collect()}
    assert out[1]["is_kept"] and not out[2]["is_kept"]
    assert out[1]["fingerprint"] == out[2]["fingerprint"]
    assert out[3]["is_kept"] and out[4]["is_kept"] and out[5]["is_kept"]


def test_shingles_short_doc_empty(docs):
    out = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", dedup.shingles(F.col("text")).alias("sh")).collect()
    }
    assert out[5] == []
    assert "the quick brown" in out[1]
    # 9 words -> 7 shingles, 'the' appears twice but shingles distinct
    assert len(out[1]) == 7


def test_minhash_identical_for_normalized_duplicates(docs):
    sigs = {r["doc_id"]: r for r in dedup.minhash_signatures(docs, "doc_id", "text").collect()}
    assert 5 not in sigs  # no shingles -> no signature
    for j in range(dedup.MINHASH_K):
        assert sigs[1][f"mh{j}"] == sigs[2][f"mh{j}"]
    # near-dup shares most but not all minhashes
    same = sum(sigs[1][f"mh{j}"] == sigs[3][f"mh{j}"] for j in range(dedup.MINHASH_K))
    assert 0 < same < dedup.MINHASH_K


def test_lsh_finds_exact_and_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(docs, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs  # exact dup: all bands collide
    # unrelated doc 4 never pairs with anything
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard_values(docs):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text").collect()
    }
    assert out[(1, 2)] == 1.0
    if (1, 3) in out:  # 7+7 shingles, 6 shared -> 6/8
        assert abs(out[(1, 3)] - 0.75) < 1e-12


def test_simhash_duplicate_invariance_and_range(docs):
    sims = {r["doc_id"]: r["simhash"] for r in dedup.simhash32(docs, "doc_id", "text").collect()}
    assert sims[1] == sims[2]
    assert all(0 <= v < (1 << 32) for v in sims.values())
    # hamming(1,3) small, hamming(1,4) large
    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(sims[1], sims[3]) < ham(sims[1], sims[4])


def test_cosine_identities(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),
         (2, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
         (3, [1.0, 2.0, 3.0], [-1.0, -2.0, -3.0])],
        ["i", "a", "b"],
    )
    out = {r["i"]: r["c"] for r in df.select(
        "i", similarity.cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert abs(out[1] - 1.0) < 1e-12
    assert abs(out[2]) < 1e-12
    assert abs(out[3] + 1.0) < 1e-12


def test_brute_force_topk_ranks_by_similarity(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.05])],
        ["vec_id", "embedding"],
    )
    out = similarity.brute_force_topk(vecs, vecs.filter("vec_id = 0"), k=2).collect()
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [3, 1]  # closest first, orthogonal vector excluded by k


def test_sign_bucket_deterministic(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0])], ["i", "v"]
    )
    b = df.select(similarity.sign_bucket(F.col("v"), 8).alias("b")).first()["b"]
    assert b == 0b01010101


def test_token_stats_and_quality_bounds(docs):
    stats = docs.select(
        "doc_id", *[c.alias(n) for n, c in ta.quality_features(F.col("text")).items()]
    ).collect()
    for r in stats:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["n_tokens"] > 0


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")], ["i", "t"]
    )
    out = {r["i"]: r for r in df.select(
        "i",
        ta.md5_fingerprint(F.col("t")).alias("md5fp"),
        ta.rolling_fingerprint(F.col("t")).alias("roll"),
    ).collect()}
    assert out[1]["md5fp"] != out[2]["md5fp"]
    assert out[1]["roll"] != out[2]["roll"]
    assert 0 <= out[1]["roll"] < ta.ROLL_MOD


def test_multimodal_blob_features_and_error_row(spark):
    rows = [(1, b"hello"), (2, None)]
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = {r["id"]: r for r in with_blob_features(df, "blob", ["id"]).collect()}
    assert out[1]["blob_len"] == 5
    assert out[1]["blob_md5"] == hashlib.md5(b"hello").hexdigest()
    assert out[1]["decode_error"] is None
    assert out[2]["blob_md5"] is None
    assert out[2]["decode_error"] == "null blob"


def test_multimodal_catalog_query_is_jvm_only_and_equals_plumbing(spark):
    """The catalog query computes blob_len/blob_md5 with F.length/F.md5
    (JVM-expressible work stays JVM-side); the mapInPandas codec
    plumbing must produce identical values — and the catalog plan must
    contain no Python eval node."""
    from gush_spark.queries_pipeline import q_multimodal_blob_features

    jvm = q_multimodal_blob_features(spark, "/root/testdata/sf0.001")
    plan = jvm._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    via_pandas = with_blob_features(
        docs.withColumn("blob", F.encode(F.col("text"), "UTF-8")),
        "blob",
        ["doc_id"],
    ).select("doc_id", "blob_len", "blob_md5")
    assert sorted(map(tuple, jvm.collect())) == sorted(
        map(tuple, via_pandas.collect())
    )


def test_multimodal_codec_stubs_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_multiprobe_recovers_cross_hyperplane_neighbor(spark):
    """A near neighbor one sign-flip away lives in an adjacent bucket:
    single-bucket LSH misses it, one-flip multi-probe finds it."""
    rows = [
        (0, [0.05] + [1.0] * 7 + [0.0]),   # query: coord0 barely positive
        (1, [-0.05] + [1.0] * 7 + [0.0]),  # near-dup across hyperplane 0
        (2, [1.0] * 8 + [5.0]),            # same bucket as query, less similar
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = vecs.filter("vec_id = 0")
    single = {r["neighbor_id"] for r in similarity.lsh_topk(vecs, q, k=2).collect()}
    multi = {
        r["neighbor_id"]
        for r in similarity.lsh_topk_multiprobe(vecs, q, k=2).collect()
    }
    assert 1 not in single  # adjacent-bucket neighbor invisible
    assert multi == {1, 2}  # multiprobe sees both, ranked by cosine


def test_as_of_join_semantics(spark):
    """Inclusive ties, no-match nulls, and null carry-field fidelity
    (the matched row's null must not be skipped for an older value)."""
    from gush_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 20), (2, 7)], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, 4, 40.0), (1, 10, None), (1, 15, 150.0)],
        "k long, rts long, v double",
    )
    out = {
        (r["k"], r["ts"]): (r["asof_rts"], r["asof_v"])
        for r in as_of_join(
            left, right, key="k", left_ts="ts", right_ts="rts", carry=["rts", "v"]
        ).collect()
    }
    assert out[(1, 5)] == (4, 40.0)
    assert out[(1, 10)] == (10, None)   # tie matches; its null v is kept
    assert out[(1, 20)] == (15, 150.0)
    assert out[(2, 7)] == (None, None)  # key with no right rows


def test_containment_detects_subset_doc(spark):
    """A short doc fully quoted inside a long one: its containment is
    1.0 while jaccard stays low — the asymmetric signal jaccard misses."""
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"filler{i} pad{i} more{i}" for i in range(12))
    df = spark.createDataFrame([(1, short), (2, long_)], ["doc_id", "text"])
    rows = dedup.containment_pairs(df, "doc_id", "text").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment_a"] == 1.0   # the short doc is fully contained
    assert r["jaccard"] < 0.2          # jaccard alone would not flag it


def test_containment_hash_keys_equals_string_keys(spark, docs):
    """The crawl-scale hashed-shingle inverted index (hash_keys=True —
    8-byte longs on the shuffle wire) must emit the SAME pair set and
    scores as the oracle-pinned string-keyed form: the exact set-verify
    stage absorbs hash collisions."""
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"filler{i} pad{i} more{i}" for i in range(12))
    mixed = docs.unionByName(
        spark.createDataFrame([(6, short), (7, long_)], ["doc_id", "text"])
    )
    key = lambda r: (r["id_a"], r["id_b"])
    by_string = {
        key(r): (r["containment_a"], r["containment_b"], r["jaccard"])
        for r in dedup.containment_pairs(mixed, "doc_id", "text").collect()
    }
    by_hash = {
        key(r): (r["containment_a"], r["containment_b"], r["jaccard"])
        for r in dedup.containment_pairs(
            mixed, "doc_id", "text", hash_keys=True
        ).collect()
    }
    assert by_string == by_hash
    assert len(by_string) >= 2  # non-trivial: 1-2-3 cluster + 6⊂7


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """Signature-only estimate vs exact shingle Jaccard on the same
    candidate pairs: identical docs estimate exactly 1.0, and every
    near-dup estimate sits within 3 standard errors (k=16) of exact."""
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight").split()
    rows = [(1, " ".join(base)), (2, " ".join(base))]  # identical pair
    for i in range(3, 8):  # near-dups: one word substituted per doc
        w = list(base)
        w[i] = f"sub{i}"
        rows.append((i, " ".join(w)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in dedup.minhash_estimate_pairs(docs, "doc_id", "text").collect()}
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text").collect()}
    assert est, "candidate pairs expected"
    assert set(est) == set(exact), "same LSH candidates on both paths"
    assert est[(1, 2)] == 1.0
    for pair, j in exact.items():
        se = (j * (1 - j) / 16) ** 0.5
        assert abs(est[pair] - j) <= 3 * se + 1e-9, (pair, est[pair], j)


def test_grouped_split_never_straddles_a_source(spark):
    """Leakage-safety invariant of grouped_split_sample: every page of
    a source lands in exactly one split (near-dups cluster within a
    source, so a per-doc split would leak them across train/test)."""
    from gush_spark.queries import all_queries

    out = all_queries()["grouped_split_sample"](spark, "/root/testdata/sf0.001")
    from pyspark.sql import functions as F

    per_source = out.groupBy("source").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_source.where(F.col("n_splits") > 1).count() == 0
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_source_overlap_matrix_finds_mirrors(spark):
    """A syndicated article shared by two sources shows up as the hot
    off-diagonal cell; within-source templating hits the diagonal."""
    from gush_spark.operators.dedup import source_overlap_matrix

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, "wire", base),
            (2, "mirror", base + " extra"),          # near-dup across sources
            (3, "blog", "completely different text about volcanoes erupting"),
            (4, "wire", base + " tail"),             # within-source near-dup
        ],
        "doc_id long, source string, text string",
    )
    cells = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in source_overlap_matrix(
            docs, "doc_id", "text", "source", threshold=0.5, spread=None
        ).collect()
    }
    assert cells.get(("mirror", "wire")) == 2  # docs 1,4 each pair doc 2
    assert cells.get(("wire", "wire")) == 1    # templating diagonal
    assert not any("blog" in k for k in cells)


def test_gopher_rules_word_level(spark):
    """The word-level Gopher rules on hand-built texts: a 60-word
    natural sentence passes everything; too-short, symbol-heavy,
    non-alphabetic and stopword-free texts each trip exactly the rule
    aimed at them (integer-exact threshold comparisons)."""
    good = "the cat and the dog have to be of use with that plan " * 5  # 65 words
    rows = [
        (1, good.strip()),
        (2, "short text only"),  # < 50 words -> r_word_count
        (3, ("num " * 20 + "42 " * 40).strip()),  # 33% numeric -> r_alpha_words
        (4, ("xx " * 30 + "# " * 30).strip()),  # symbol-heavy -> r_symbol_ratio
        (5, ("zz qq ww rr ss tt " * 10).strip()),  # no stopwords -> r_stopwords
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cols = ta.gopher_rules(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[cols[n].alias(n) for n in cols]
        ).collect()
    }
    assert got[1]["keep"] and all(
        got[1][n] for n in got[1].asDict() if n.startswith("r_")
    )
    assert not got[2]["r_word_count"] and not got[2]["keep"]
    assert not got[3]["r_alpha_words"] and got[3]["r_word_count"]
    assert not got[4]["r_symbol_ratio"]
    assert not got[5]["r_stopwords"] and got[5]["r_alpha_words"]


def test_gopher_rules_line_level(spark):
    """The line-level rules (invisible on the newline-free fixture
    corpus): bullet-dominated and ellipsis-terminated line sets fail
    their thresholds; the counters are exact."""
    base = "the cat and the dog have to be of use with that plan " * 5
    bullets = "\n".join(f"- {w}" for w in ["item one", "item two", "item three"])
    ell = "\n".join([base.strip(), "to be continued...", "and more..."])
    rows = [(1, base.strip() + "\n" + bullets), (2, ell)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cols = ta.gopher_rules(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[cols[n].alias(n) for n in cols]
        ).collect()
    }
    # doc 1: 4 lines, 3 bullets -> 10*3 > 4 fails r_bullet_lines
    assert got[1]["n_lines"] == 4 and not got[1]["r_bullet_lines"]
    # doc 2: 3 lines, 2 ellipsis-ended -> 10*2 >= 3*3 fails r_ellipsis_lines
    assert got[2]["n_lines"] == 3 and not got[2]["r_ellipsis_lines"]
    assert got[2]["n_symbols"] >= 2  # '...' counted as symbols too


def test_c4_rules_line_and_page_level(spark):
    """The C4 cleaning pass (invisible on the newline-free fixture
    corpus): each line rule drops exactly the line aimed at it, the
    cleaned text preserves kept-line order, and each page rule trips on
    its targeted fixture."""
    good = "the cat sat on the warm mat today."
    rows = [
        # doc 1: one good line survives; no-terminal / short / javascript
        # lines drop; 3 sentences total via '!' and '?' lines -> keep
        (1, "\n".join([
            good,                                  # kept
            "no terminal punctuation here at all", # dropped: no [.!?"]
            "too short line.",                     # dropped: < 5 words
            "please enable javascript to continue viewing this page.",  # dropped
            "is this the second sentence we keep?",  # kept
            "yes it is the third one!",              # kept
        ])),
        # doc 2: fine lines but a lorem-ipsum marker -> page dropped
        (2, good + "\nlorem ipsum dolor sit amet was pasted here today."),
        # doc 3: fine line but a curly brace -> page dropped
        (3, good + "\nfunction f() { return 1; }"),
        # doc 4: only two sentences survive -> r_min_sentences fails
        (4, good + "\nthe dog barked at the mail truck."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cols = ta.c4_rules(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[cols[n].alias(n) for n in cols]
        ).collect()
    }
    assert got[1]["n_lines"] == 6 and got[1]["n_kept_lines"] == 3
    assert got[1]["cleaned_text"].splitlines() == [
        good,
        "is this the second sentence we keep?",
        "yes it is the third one!",
    ]
    assert got[1]["n_sentences"] == 3 and got[1]["keep"]
    assert got[2]["d_lorem"] and not got[2]["keep"]
    assert got[3]["d_brace"] and not got[3]["keep"]
    assert got[2]["n_kept_lines"] == 2 and got[3]["n_kept_lines"] == 1
    assert (
        got[4]["n_sentences"] == 2
        and not got[4]["r_min_sentences"]
        and not got[4]["keep"]
        and not got[4]["d_lorem"]
        and not got[4]["d_brace"]
    )


def test_trigram_langid_on_real_text(spark):
    """Trained on a few real sentences per language, the Cavnar-Trenkle
    trigram scorer identifies held-out sentences the stopword-profile
    scorer has no hope on (no profile stopword present), and returns an
    explicit NULL for a too-short doc. (The synthetic catalog corpus
    carries no language signal in its text — its lang column is
    metadata — so accuracy there is majority-class noise; THIS is the
    semantics pin.)"""
    from gush_spark.operators import langid

    train = [
        (1, "der hund läuft durch den wald und der vogel singt über dem baum", "de"),
        (2, "die kinder spielen im garten und das wetter ist schön heute", "de"),
        (3, "le chien court dans la forêt et l'oiseau chante sur l'arbre", "fr"),
        (4, "les enfants jouent dans le jardin et le temps est beau aujourd'hui", "fr"),
        (5, "el perro corre por el bosque y el pájaro canta sobre el árbol", "es"),
        (6, "los niños juegan en el jardín y el clima es hermoso hoy", "es"),
        (7, "the dog runs through the forest and the bird sings above the tree", "en"),
        (8, "the children play in the garden and the weather is lovely today", "en"),
    ]
    held_out = [
        (101, "das mädchen liest ein buch über die geschichte der stadt", "de"),
        (102, "la fille lit un livre sur l'histoire de la ville", "fr"),
        (103, "la niña lee un libro sobre la historia de la ciudad", "es"),
        (104, "the girl reads a book about the history of the city", "en"),
        (105, "zz", None),  # shorter than one trigram -> NULL verdict
    ]
    langs = ["de", "en", "es", "fr"]
    tr = langid.with_norm(
        spark.createDataFrame(train, ["doc_id", "text", "lang"])
    )
    profiles = langid.trigram_profiles(tr)
    te = langid.with_norm(
        spark.createDataFrame(
            [(i, t) for i, t, _ in held_out], ["doc_id", "text"]
        )
    )
    got = {
        r["doc_id"]: r["pred_lang"]
        for r in langid.trigram_lang_scores(
            te, profiles, langs
        ).collect()
    }
    for i, _, want in held_out:
        assert got[i] == want, (i, got[i], want)
    # determinism: a rerun produces the identical verdicts
    again = {
        r["doc_id"]: r["pred_lang"]
        for r in langid.trigram_lang_scores(te, profiles, langs).collect()
    }
    assert again == got


def test_edit_distance_pairs_exact_values(spark):
    """Identical docs score 1e6; a one-character edit scores
    (maxlen-1)·1e6 div maxlen; the distance is over the normalized
    256-char prefix (case/whitespace fold first)."""
    from gush_spark.operators.dedup import edit_distance_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, "  ALPHA   beta gamma delta epsilon zeta eta theta iota kappa "),
            (3, base.replace("kappa", "kappb")),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["id_a"], r["id_b"]): r
        for r in edit_distance_pairs(docs, "doc_id", "text", spread=None).collect()
    }
    n = len(base)
    assert rows[(1, 2)]["dist"] == 0  # normalization folds case/whitespace
    assert rows[(1, 2)]["sim_ppm"] == 1_000_000 and rows[(1, 2)]["is_dup"]
    for pair in [(1, 3), (2, 3)]:
        assert rows[pair]["dist"] == 1
        assert rows[pair]["sim_ppm"] == (n - 1) * 1_000_000 // n
        assert rows[pair]["is_dup"]  # 0.98 >> 0.8 threshold
