"""Character-trigram language identification (Cavnar & Trenkle, SDAIR
1994 — "N-Gram-Based Text Categorization", the classic production
lang-ID every web pipeline starts from; fastText's char-ngram features
are its descendant). The stopword-profile scorer
(functions/text_analysis.lang_scores) is the zero-training fallback;
this operator TRAINS per-language trigram profiles from a labeled
slice and scores by profile overlap — robust to short documents and to
languages that share stopwords.

Integer discipline (driver hash gate): profiles are the top-N trigrams
per language by (count DESC, trigram ASC) — a total order, so the
profile is deterministic; a document's score per language is the
number of its DISTINCT trigrams that hit that language's profile
(exact BIGINT); prediction is argmax with language-ascending
tie-break. No floats anywhere.

Scale shape (10^12 docs):
- training is one (lang, trigram) count + a per-language top-N
  (WindowGroupLimit over ~langs x |trigram vocab| rows — the CORPUS
  never enters the window, only the counted profile candidates);
- profiles are langs x N rows (KBs) — broadcast; scoring is one
  explode + broadcast equi-join + one map-side-combinable conditional
  count per language. Zero corpus-sized shuffles beyond the doc_id
  re-aggregation of matched trigrams.

Measured wall at sf0.1 is dominated by the interpreted array lambdas
of the trigram build itself (~1.3 s of the ~4 s query), not by the
joins; a driver-collected literal-array ``array_intersect`` scorer
times about the same (1.5-1.7 s scoring either way) and gives up the
broadcast-join shape that scales past KB profiles, so the join form
stays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import norm_text

TOP_N = 64


def _trigrams(norm_col):
    # char trigrams of the normalized text: positions 1..len-2, built
    # by zipping three shifted slices of the char array — each lambda
    # element is an O(1) concat. The obvious
    # ``transform(sequence(1, len-2), i -> substring(s, i, 3))`` form is
    # O(len) per element (every interpreted substring call rescans the
    # string), i.e. O(len²) per document — measured 1.6x slower at
    # sf0.1 with byte-identical output. The short-text guard must be an
    # explicit CASE: Spark's sequence(1, 0) DESCENDS ([1, 0]) where
    # DuckDB's generate_series(1, 0) is empty — an unguarded series
    # silently diverges between the engines.
    return F.expr(
        """CASE WHEN length({c}) >= 3 THEN
  zip_with(zip_with(slice(split({c}, ''), 1, length({c}) - 2),
                    slice(split({c}, ''), 2, length({c}) - 2),
                    (a, b) -> concat(a, b)),
           slice(split({c}, ''), 3, length({c}) - 2),
           (ab, cc) -> concat(ab, cc))
  ELSE CAST(array() AS array<string>) END""".format(c=norm_col)
    )


def trigram_profiles(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    *,
    top_n: int = TOP_N,
) -> DataFrame:
    """Per-language top-``top_n`` trigram profile ``(lang, tg, rnk)``
    from a labeled corpus slice — counts over ALL trigram occurrences
    (multiplicity matters for ranking, as in the paper), rank order
    total via the (count DESC, trigram ASC) tie-break."""
    tg = (
        docs.select(
            F.col(lang_col).alias("lang"),
            F.explode(_trigrams("_norm")).alias("tg"),
        )
        .groupBy("lang", "tg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("tg"))
    return (
        tg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select("lang", "tg", F.col("rnk").cast("long").alias("rnk"))
    )


def trigram_lang_scores(
    docs: DataFrame,
    profiles: DataFrame,
    langs: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against the broadcast profiles: per
    language the count of the doc's DISTINCT trigrams present in that
    language's profile, plus the argmax prediction (lang-ascending
    tie-break; NULL when no trigram matches any profile — too short /
    out-of-domain is an explicit verdict, not a guess)."""
    doc_tg = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(_trigrams("_norm"))).alias("tg"),
    )
    hits = doc_tg.join(F.broadcast(profiles), on="tg")
    scores = hits.groupBy("_id").agg(
        *[
            F.sum((F.col("lang") == lang).cast("long")).alias(f"score_{lang}")
            for lang in langs
        ]
    )
    out = docs.select(F.col(id_col).alias("_id")).join(
        scores, on="_id", how="left"
    )
    score_cols = {
        lang: F.coalesce(F.col(f"score_{lang}"), F.lit(0)).cast("long")
        for lang in langs
    }
    mx = F.greatest(*score_cols.values())
    pred = F.when(mx <= 0, F.lit(None))
    for lang in sorted(langs):
        pred = pred.when(score_cols[lang] == mx, F.lit(lang))
    return out.select(
        F.col("_id").alias(id_col),
        *[score_cols[lang].alias(f"score_{lang}") for lang in sorted(langs)],
        pred.alias("pred_lang"),
    )


def with_norm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Bind the normalized text once (the trigram lambda reads it many
    times; Catalyst inlines expression args without CSE)."""
    return docs.withColumn("_norm", norm_text(F.col(text_col)))
