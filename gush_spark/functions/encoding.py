"""Mojibake (encoding-artifact) detection and repair.

Web text is full of double-encoded UTF-8: a page authored in UTF-8,
mis-decoded as cp1252/latin-1 somewhere in the serving chain, then
re-encoded — "café" becomes "cafÃ©", "'" becomes "â€™", NBSP becomes
"Â ". Training on it teaches the model the corruption. Real pipelines
run ftfy; this is the Spark-first equivalent, split into the two tiers
the 100 TB plan needs:

- **detection** (``mojibake_markers`` / the ``mojibake_report``
  catalog query): a pure-JVM ``regexp_count`` of the classic artifact
  bigrams — runs inside whole-stage codegen on the scan output, zero
  Python, and is the cheap filter that keeps the repair UDF off the
  overwhelmingly-clean majority (same prefilter-then-parse discipline
  as the extraction pipeline).
- **repair** (``repair_mojibake``): the ftfy core move — re-encode as
  cp1252 and decode as UTF-8, ACCEPTED ONLY IF the artifact count
  strictly drops and the round-trip is lossless, iterated for
  multiply-encoded text. Python-side by necessity (JVM SQL has no
  charset transcoding expression), so it ships as an Arrow-batched
  pandas UDF meant to run BEHIND the detection filter.

Detection is oracle-exact against DuckDB (same regex, RE2/Java agree
on these literal alternations); repair semantics are pinned by pytest
goldens (round-trip pairs, idempotence on clean text, refusal on
false positives) — the byte-level transcoding itself has no SQL
expression.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# The classic UTF-8-read-as-cp1252 artifacts. Literal alternations only
# (no classes, no escapes, every artifact containing exactly one
# alternative hit) so Java regex (Spark) and RE2 (DuckDB) count
# identically regardless of leftmost-first details: "Ã" + continuation
# glyph covers the Latin-1 accent range (é è ñ ü …), the single "â€"
# alternative covers every General-Punctuation artifact (curly quotes,
# dashes, ellipsis, bullet — each contains "â€" exactly once), "Â " is
# the NBSP artifact and "ï»¿" a mid-document UTF-8 BOM.
MOJIBAKE_PATTERN = (
    # double-encoding signatures FIRST (leftmost-first alternation):
    # "Ã©" twice-corrupted becomes "ÃƒÂ©", "â€œ" becomes "Ã¢â‚¬Å“" —
    # these must outscore their once-fixed forms or the repair loop's
    # strictly-decreasing acceptance would reject the correct first
    # round on doubly-encoded text (pinned by test)
    "Ãƒ|Ã¢â‚¬|Ã‚"
    "|Ã©|Ã¨|Ã¡|Ã¢|Ã£|Ã¤|Ã¥|Ã§|Ã­|Ã®|Ã¯|Ã±|Ã³|Ã´|Ãµ|Ã¶|Ãº|Ã»|Ã¼|Ã "
    "|â€|Â |Â°|Â«|Â»|Â§|ï»¿"
)


def mojibake_markers(col: Column) -> Column:
    """Count of artifact hits (long; 0 for clean text, null for null).
    JVM-side regexp_count — the cheap 100 TB prefilter."""
    return F.regexp_count(col, F.lit(MOJIBAKE_PATTERN)).cast("long")


def _sloppy_cp1252_encode(s: str) -> bytes | None:
    """cp1252 encode with the "sloppy" C1 passthrough real mojibake
    needs (ftfy's sloppy-windows-1252): five bytes (0x81 0x8D 0x8F
    0x90 0x9D) are UNDEFINED in cp1252, so a mis-decoding server
    passes them through as their byte value — e.g. the " (U+201D,
    utf-8 E2 80 9D) artifact contains raw 0x9D. Characters outside
    both cp1252 and the C1 range mean the text was never cp1252
    mojibake → None."""
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(ch)
            if 0x80 <= o <= 0x9F:
                out.append(o)
            else:
                return None
    return bytes(out)


def _fix_once(s: str) -> str | None:
    """One sloppy-cp1252→utf-8 round trip; None if not losslessly
    possible."""
    b = _sloppy_cp1252_encode(s)
    if b is None:
        return None
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return None


def repair_text(s: str | None, max_rounds: int = 3) -> str | None:
    """ftfy-lite: undo up to ``max_rounds`` layers of cp1252
    mis-decoding, accepting each round only if it is lossless AND
    strictly reduces the artifact count — a string that merely LOOKS
    like mojibake (legitimate 'Ã' followed by an accent, e.g. in a
    linguistics article) transcodes to fewer-marker text only when it
    really was double-encoded, so false positives come back
    unchanged."""
    import re

    if s is None:
        return None
    pat = re.compile(MOJIBAKE_PATTERN)
    cur, hits = s, len(pat.findall(s))
    for _ in range(max_rounds):
        if hits == 0:
            break
        cand = _fix_once(cur)
        if cand is None:
            break
        cand_hits = len(pat.findall(cand))
        if cand_hits >= hits:
            break
        cur, hits = cand, cand_hits
    return cur


def repair_mojibake_udf():
    """Arrow-batched pandas UDF wrapping ``repair_text``. Run it
    BEHIND the marker filter (``mojibake_markers(col) > 0``) so the
    Python worker only ever sees the corrupt sliver of the corpus."""
    def _repair(col: pd.Series) -> pd.Series:
        return col.map(lambda s: repair_text(s) if s is not None else None)

    # explicit annotations: `from __future__ import annotations` breaks
    # pandas_udf kind inference on stringified hints
    _repair.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_repair, "string")


def with_repaired_text(
    df, text_col: str = "text", out_col: str = "clean_text"
):
    """Detection-gated repair: markers counted JVM-side, then the
    corpus SPLITS — clean rows (the overwhelming majority) take a
    pure-JVM branch and only flagged rows cross into the pandas UDF.

    The split must be a filter-union, NOT ``when(markers > 0,
    udf(...))``: Catalyst extracts Python UDFs out of conditionals
    into an unconditional ArrowEvalPython node, so the when-form would
    ship EVERY row through Arrow and only discard the result — the
    plan audit pins that no ArrowEvalPython sits on the clean branch.
    Cost: two passes over the scan (both map-only, no shuffle);
    persist the input first if it is itself expensive lineage."""
    marked = df.withColumn(
        "mojibake_markers", mojibake_markers(F.col(text_col))
    )
    clean = marked.where(
        F.coalesce(F.col("mojibake_markers"), F.lit(0)) == 0
    ).withColumn(out_col, F.col(text_col))
    dirty = marked.where(F.col("mojibake_markers") > 0).withColumn(
        out_col, repair_mojibake_udf()(F.col(text_col))
    )
    return clean.unionByName(dirty)
