"""Hyperlink extraction + host link graph — the crawl-frontier /
ranking substrate every web-text pipeline builds from raw pages: parse
``<a href>`` tags out of the html, resolve each href against the page
URL, and roll the result into a host-to-host edge frame that feeds the
graph family (operators/graph.py pagerank / components / k-core run
unchanged on these edges) and the recrawl/politeness planners.

Reference analog: gush consumes already-structured binlog rows, so link
extraction has no direct counterpart; it is the webtext-graft step that
turns the raw ``html`` column of the page stream (BASELINE input_hint)
into the edge structure the rest of the engine operates on — the same
role the FoundationParser text extraction plays for the text column
(reference golden-suite analog src/test/.../FoundationParserTest.scala;
here tests/test_links.py pins exact edges for handwritten html).

Extraction rules (common-denominator crawler subset):
- every ``<a ... href="...">anchor</a>`` tag contributes one link; a
  page may repeat the same target — each occurrence counts (link
  multiplicity is the ranking signal);
- absolute ``http(s)://host/...`` hrefs resolve to their own host
  (lowercased, ``www.`` and ``:port`` stripped — same folding as
  operators/urls.canonicalize_url);
- protocol-relative ``//host/...`` hrefs resolve to their own host;
- root-relative (``/path``) and bare-relative (``page.html``) hrefs
  resolve to the SOURCE page's host;
- ANY other scheme-prefixed href (``mailto:``, ``javascript:``,
  ``ftp:``, ``ws:``, app schemes, …) and empty/fragment-only hrefs
  (``#top``) yield NULL dst_host and are dropped from the edge frame —
  garbage hrefs are data, not errors (P10 policy), they just never
  become edges;
- anchor text is the tag's inner text with nested inline markup
  stripped (``<a><b>bold</b> x</a>`` → ``bold x``; an <img>-only
  anchor yields the empty string), whitespace-collapsed.

Scale design: extraction is a per-row chain of regexps + one
``explode`` — whole-stage codegen end to end, no Python anywhere, no
shuffle until the edge aggregation. The html column (the only wide
thing) never survives past the explode's child projection (column
pruning drops it), so only (src_host, dst_host, anchor) cross the one
groupBy exchange — the same bytes-on-the-wire discipline as the dedup
family. Degree/anchor rollups partial-aggregate map-side; top-k
anchors use the rank<=k window Spark rewrites to WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# one <a> tag: attributes before/after href; lazy inner match up to the
# closing tag, so nested inline markup (<a><img></a>, <a><b>x</b> y</a>)
# still yields the link — <a> cannot nest per HTML, so first </a> is
# THE close. Inner tags are stripped from the anchor text afterwards.
_TAG_RE = r'(?is)<a\s[^>]*href="[^"]*"[^>]*>.*?</a>'
_HREF_RE = r'(?i)href="([^"]*)"'
_ANCHOR_RE = r"(?is)>(.*?)</a>$"

# absolute / protocol-relative authority
_ABS_RE = r"(?i)^(?:https?:)?//([^/?#]+)"
# ANY scheme-prefixed href that is not http(s) is non-fetchable for a
# web crawler (mailto:, javascript:, ftp:, ws:, about:, custom app
# schemes, …) — an explicit allowlist would misresolve the long tail
# of unknown schemes to the source host as if they were relative paths
_NONFETCH_RE = r"(?i)^[a-z][a-z0-9+.-]*:"


def _fold_host(host: Column) -> Column:
    """Lowercase, strip ``www.`` and ``:port`` — urls.py host folding."""
    h = F.regexp_replace(F.lower(host), r"^www\.", "")
    return F.regexp_replace(h, r":\d+$", "")


def page_host(url: Column) -> Column:
    """Folded host of a page URL (NULL when there is no authority)."""
    h = _fold_host(F.regexp_extract(url, r"(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)", 1))
    return F.when(h != "", h)


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """One row per resolved link: (*keep, src_host, href, dst_host,
    anchor).

    Pure JVM: regexp_extract_all over the html → explode → per-tag
    href/anchor regexps → host resolution. ``keep`` threads passthrough
    columns (a page id, a crawl ts) through the explode without a
    re-join.
    """
    src = pages.select(
        *keep,
        page_host(F.col(url_col)).alias("src_host"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_TAG_RE), F.lit(0))
        ).alias("tag"),
    )
    href = F.regexp_extract(F.col("tag"), _HREF_RE, 1)
    # inner markup stripped (an <img>-only anchor yields ''), then
    # whitespace collapsed
    inner = F.regexp_extract(F.col("tag"), _ANCHOR_RE, 1)
    anchor = F.trim(
        F.regexp_replace(
            F.regexp_replace(inner, r"<[^>]*>", " "), r"\s+", " "
        )
    )
    abs_host = _fold_host(F.regexp_extract(href, _ABS_RE, 1))
    # order matters: the absolute http(s)/protocol-relative branch must
    # win before the any-scheme non-fetchable drop
    dst = (
        F.when(abs_host != "", abs_host)
        .when(href.rlike(_NONFETCH_RE) | (href == "") | href.startswith("#"), None)
        # root-relative or bare-relative: stays on the source host
        .otherwise(F.col("src_host"))
    )
    return src.select(
        *keep,
        "src_host",
        href.alias("href"),
        dst.alias("dst_host"),
        anchor.alias("anchor"),
    ).where(F.col("dst_host").isNotNull() & F.col("src_host").isNotNull())


def host_link_graph(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    page_id_col: str | None = None,
) -> DataFrame:
    """Host→host edge frame: n_links (tag occurrences) and — when a
    page id column is given — n_pages (distinct linking pages).

    One shuffle, keyed (src_host, dst_host); partial counts combine
    map-side. The output is the input contract of operators/graph.py —
    pagerank over REAL extracted links instead of co-visit edges.
    """
    links = extract_links(
        pages, url_col, html_col, keep=(page_id_col,) if page_id_col else ()
    )
    aggs = [F.count(F.lit(1)).alias("n_links")]
    if page_id_col:
        aggs.append(F.countDistinct(page_id_col).alias("n_pages"))
    return links.groupBy("src_host", "dst_host").agg(*aggs)


def link_degree_report(edges: DataFrame) -> DataFrame:
    """Per-host degree summary over a (src_host, dst_host, n_links)
    edge frame: out/in link counts and distinct out/in neighbor hosts.

    Shape: the edge frame is unioned into (host, role) records and
    aggregated ONCE — a single shuffle keyed by host, no self-join of
    two grouped frames. At web scale the edge frame is already the
    reduced representation (hosts × hosts, not pages × links), so this
    pass is cheap relative to extraction.
    """
    out = edges.select(
        F.col("src_host").alias("host"),
        F.col("n_links").alias("out_links"),
        F.lit(0).cast("long").alias("in_links"),
        F.col("dst_host").alias("out_nbr"),
        F.lit(None).cast("string").alias("in_nbr"),
    )
    inn = edges.select(
        F.col("dst_host").alias("host"),
        F.lit(0).cast("long").alias("out_links"),
        F.col("n_links").alias("in_links"),
        F.lit(None).cast("string").alias("out_nbr"),
        F.col("src_host").alias("in_nbr"),
    )
    return (
        out.unionByName(inn)
        .groupBy("host")
        .agg(
            F.sum("out_links").alias("out_links"),
            F.sum("in_links").alias("in_links"),
            F.countDistinct("out_nbr").alias("out_hosts"),
            F.countDistinct("in_nbr").alias("in_hosts"),
        )
    )


def anchor_text_topk(links: DataFrame, k: int = 3) -> DataFrame:
    """Top-k anchor texts per destination host — the classic anchor
    signal (how the web describes a page, independent of the page's
    own words). Deterministic tie-break (count desc, anchor asc); the
    rank<=k filter compiles to WindowGroupLimit so only k rows per
    host per partition reach the window exchange.
    """
    counts = (
        links.where(F.col("anchor") != "")
        .groupBy("dst_host", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("dst_host").orderBy(F.col("n").desc(), F.col("anchor").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("dst_host", "anchor", "n", "rnk")
    )
