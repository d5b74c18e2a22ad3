"""PII scrubbing — redact emails, phone numbers and IPv4 addresses from
document text before training, reporting per-doc match counts so
downstream filters can drop PII-dense pages entirely.

Every LLM data pipeline runs this pass; it is the content analog of the
reference's config-driven event blacklists
(``/root/reference/src/main/scala/io/simao/gush/util/GushConfig.scala:31-44``)
— a fixed small rule set applied to every record.

Scale design: pure JVM ``regexp_extract_all``/``regexp_replace`` column
expressions — zero shuffles, zero Python, stays inside whole-stage
codegen, trivially map-parallel at any corpus size. Patterns are kept
to the portable regex subset (no lookarounds) so the same pattern text
runs identically under Java regex (Spark) and RE2 (DuckDB oracle).

Redaction is PROGRESSIVE in a fixed order (email -> phone -> ipv4):
each pattern's count is measured on the text as already redacted by the
earlier passes, so digits inside an email never double-count as a phone
and an IP-shaped email domain is attributed to the email rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied strictly in this order.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_columns(text: Column) -> dict[str, Column]:
    """Composable form: ``clean_text`` plus one ``n_<rule>`` count per
    rule and ``n_pii`` — pure column expressions, so streaming stages
    (streaming/pipeline.curation_stream_pipeline) fuse them into the
    same projection as the quality/lang gates."""
    cur: Column = text
    out: dict[str, Column] = {}
    counts: list[Column] = []
    for name, pat, repl in PII_RULES:
        c = F.coalesce(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))), F.lit(0)
        ).cast("long")
        out[f"n_{name}"] = c
        counts.append(c)
        cur = F.regexp_replace(cur, pat, repl)
    out["clean_text"] = cur
    out["n_pii"] = sum(counts[1:], counts[0]).cast("long")
    return out


def scrub_pii(
    df: DataFrame, id_col: str, text_col: str, *, keep_text: bool = True
) -> DataFrame:
    """Per-doc PII redaction report.

    Output: ``id_col``, ``clean_text`` (if ``keep_text``), one
    ``n_<rule>`` count per rule, and ``n_pii`` (total matches). Null
    text scrubs to null with zero counts.
    """
    cols = scrub_columns(F.col(text_col))
    sel = [F.col(id_col)]
    if keep_text:
        sel.append(cols["clean_text"].alias("clean_text"))
    sel += [cols[f"n_{name}"].alias(f"n_{name}") for name, _, _ in PII_RULES]
    sel.append(cols["n_pii"].alias("n_pii"))
    return df.select(*sel)
