"""Hyperlink extraction goldens: handwritten html pins every resolution
rule (absolute, protocol-relative, root-relative, bare-relative,
non-fetchable schemes, fragment-only, case folding, www/port stripping,
anchor whitespace collapse), plus graph rollup shapes and a
zero-Python-nodes plan assertion.
"""

from __future__ import annotations

from gush_spark.operators.links import (
    anchor_text_topk,
    extract_links,
    host_link_graph,
    link_degree_report,
)

PAGES = [
    # absolute + www/port folding + repeated target + mixed-case tag
    (
        1,
        "https://WWW.Alpha.example:443/home",
        '<html><body>'
        '<A HREF="http://www.beta.example/a">Beta  one </A>'
        '<a href="http://beta.example:80/b">beta two</a>'
        '<a href="HTTPS://Gamma.example/x">gamma</a>'
        "</body></html>",
    ),
    # protocol-relative, root-relative, bare-relative
    (
        2,
        "http://alpha.example/sub/page",
        '<a href="//cdn.example/lib.js">cdn</a>'
        '<a href="/about">about</a>'
        '<a href="next.html">next</a>',
    ),
    # junk hrefs: dropped, never edges — including schemes outside any
    # allowlist (ftp:, ws:) which must NOT fall through to relative
    (
        3,
        "http://beta.example/p",
        '<a href="mailto:x@y.example">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="#top">top</a>'
        '<a href="">empty</a>'
        '<a href="tel:+1555">call</a>'
        '<a href="ftp://mirror.example/f">ftp</a>'
        '<a href="ws://live.example/s">ws</a>',
    ),
    # page with no authority in its url: no src_host, contributes nothing
    (4, "not a url", '<a href="http://beta.example/z">z</a>'),
    # no links at all
    (5, "http://quiet.example/", "<p>nothing here</p>"),
    # nested inline markup inside anchors: the link must still count,
    # anchor text keeps the visible words only
    (
        6,
        "http://nest.example/",
        '<a href="http://img.example/i"><img src="x.png"></a>'
        '<a href="http://bold.example/b"><b>bold</b>\nlink</a>',
    ),
]


def _pages(spark):
    return spark.createDataFrame(PAGES, "doc_id long, url string, html string")


def test_extract_links_resolution_rules(spark):
    rows = sorted(
        extract_links(_pages(spark), keep=("doc_id",)).collect(),
        key=lambda r: (r.doc_id, r.href),
    )
    got = [(r.doc_id, r.src_host, r.dst_host, r.anchor) for r in rows]
    assert got == [
        (1, "alpha.example", "gamma.example", "gamma"),
        (1, "alpha.example", "beta.example", "beta two"),
        (1, "alpha.example", "beta.example", "Beta one"),
        (2, "alpha.example", "cdn.example", "cdn"),
        (2, "alpha.example", "alpha.example", "about"),
        (2, "alpha.example", "alpha.example", "next"),
        (6, "nest.example", "bold.example", "bold link"),
        (6, "nest.example", "img.example", ""),
    ]


def test_host_link_graph_counts(spark):
    got = {
        (r.src_host, r.dst_host): (r.n_links, r.n_pages)
        for r in host_link_graph(_pages(spark), page_id_col="doc_id").collect()
    }
    assert got == {
        ("alpha.example", "beta.example"): (2, 1),
        ("alpha.example", "gamma.example"): (1, 1),
        ("alpha.example", "cdn.example"): (1, 1),
        ("alpha.example", "alpha.example"): (2, 1),
        ("nest.example", "bold.example"): (1, 1),
        ("nest.example", "img.example"): (1, 1),
    }


def test_link_degree_report(spark):
    edges = host_link_graph(_pages(spark))
    got = {
        r.host: (r.out_links, r.in_links, r.out_hosts, r.in_hosts)
        for r in link_degree_report(edges).collect()
    }
    assert got == {
        "alpha.example": (6, 2, 4, 1),
        "beta.example": (0, 2, 0, 1),
        "gamma.example": (0, 1, 0, 1),
        "cdn.example": (0, 1, 0, 1),
        "nest.example": (2, 0, 2, 0),
        "bold.example": (0, 1, 0, 1),
        "img.example": (0, 1, 0, 1),
    }


def test_anchor_text_topk_ties_and_k(spark):
    links = extract_links(_pages(spark))
    got = [
        (r.dst_host, r.anchor, r.n, r.rnk)
        for r in sorted(
            anchor_text_topk(links, k=2).collect(),
            key=lambda r: (r.dst_host, r.rnk),
        )
    ]
    # beta gets two distinct anchors with n=1 each → alphabetical tie-break
    assert got == [
        ("alpha.example", "about", 1, 1),
        ("alpha.example", "next", 1, 2),
        ("beta.example", "Beta one", 1, 1),
        ("beta.example", "beta two", 1, 2),
        # img-only anchor is '' and excluded; nested-markup anchor kept
        ("bold.example", "bold link", 1, 1),
        ("cdn.example", "cdn", 1, 1),
        ("gamma.example", "gamma", 1, 1),
    ]


def test_extraction_plan_is_jvm_only(spark):
    plan = extract_links(_pages(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
    # one Generate (the tag explode) and nothing else row-expanding
    assert "Generate" in plan
