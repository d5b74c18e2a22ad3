"""Robots-rules URL gate — RFC 9309 / Google robots.txt matching
semantics applied corpus-wide: for each URL, the most specific
(LONGEST) matching path-prefix rule for its host decides allow/deny;
an allow rule wins a length tie; a URL with no matching rule is
allowed. This is the crawl-frontier admission filter (which fetched
URLs were compliant; which frontier URLs may be fetched) — the rules
complement to the politeness RATE gate (operators/politeness.py) and
the recrawl priority ranking.

Scale shape: a robots rule table is per-host and tiny relative to the
corpus (crawlers cache one robots.txt per host) — it BROADCASTS; the
corpus side is one map-only parse + the broadcast left join on host
(prefix match as a join residual — row multiplication is per-host
rule count, local, never a shuffle), folded by ONE id-keyed
argmin-struct agg over the reduced (id, host, path) frame — raw text
and full URLs never shuffle, and there is no row_number window.
Matching is pure prefix comparison (``startswith``), exact on both
engines; wildcard rules (``*``/``$`` of the Google extension) are a
rule-COMPILATION concern (expand to prefix alternatives upstream),
not a matching concern — documented, not silently approximated.

Determinism: the winner is ``min(struct(-prefix_len, deny_flag))``;
two distinct same-length prefixes cannot both match one path (equal
length + both prefixes of the same string ⇒ equal), so the only
possible tie is allow-vs-deny on the SAME prefix, resolved allow-wins
per the spec.

No reference analog (gush gates rows by config blacklist,
`/root/reference/src/main/scala/io/simao/gush/GushConfig.scala` —
host-exact, unordered); this is the driver brief's web-crawl surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gush_spark.operators.urls import _AUTHORITY_RE, canonicalize_url


def url_host_path(url: Column) -> dict[str, Column]:
    """(host, path) for robots matching: host lowercased with
    www./port stripped (the canonicalize_url convention, so the rule
    table keys match domain rollups), path CASE-PRESERVED with query
    and fragment dropped (robots matching is on the path as sent).
    Garbage without a scheme://authority gets a null host AND null
    path — no rule can match, the gate defaults to allow."""
    host = canonicalize_url(url)["host"]
    rest = F.regexp_replace(F.trim(url), _AUTHORITY_RE, "")
    path = F.regexp_replace(rest, r"[?#].*$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return {"host": host, "path": F.when(host.isNotNull(), path)}


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a robots rule table to a parsed URL frame.

    ``urls``: (id_col, host, path) — from :func:`url_host_path`.
    ``rules``: (host, prefix, allow) — one row per robots.txt line,
    prefix a literal path prefix, allow boolean.

    Returns (id_col, host, path, matched_prefix, allowed): the
    longest-match verdict, allow on length ties, default-allow when
    nothing matches (matched_prefix null).
    """
    r = F.broadcast(
        rules.select(
            F.col("host").alias("_rhost"),
            F.col("prefix").alias("_prefix"),
            F.col("allow").alias("_allow"),
            F.length("prefix").cast("long").alias("_plen"),
        )
    )
    joined = urls.join(
        r,
        (F.col("host") == F.col("_rhost"))
        & F.col("path").startswith(F.col("_prefix")),
        "left",
    )
    best = joined.groupBy(id_col, "host", "path").agg(
        F.min(
            F.when(
                F.col("_prefix").isNotNull(),
                F.struct(
                    (-F.col("_plen")).alias("np"),
                    F.when(F.col("_allow"), 0).otherwise(1).alias("deny"),
                    F.col("_prefix").alias("prefix"),
                    F.col("_allow").alias("allow"),
                ),
            )
        ).alias("_m")
    )
    return best.select(
        id_col,
        "host",
        "path",
        F.col("_m.prefix").alias("matched_prefix"),
        F.coalesce(F.col("_m.allow"), F.lit(True)).alias("allowed"),
    )
