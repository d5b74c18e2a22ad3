"""Hand-checkable URL canonicalization semantics (operators/urls.py);
the DuckDB oracle (url_canonicalize) covers the synthetic corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gush_spark.operators.urls import canonicalize_url


@pytest.fixture(scope="module")
def canon(spark):
    rows = [
        (1, "HTTP://WWW.Site.COM:80/A/b?utm_source=x&b=2&a=1#frag"),
        (2, "https://site.com/A/b?a=1&b=2"),
        (3, "https://sub.domain.example.org:443/"),
        (4, "https://x.io/p?gclid=abc&fbclid=def&utm_campaign=z"),
        (5, "no scheme here?b=2&utm_source=x#f"),
        (6, "https://one.com/path"),
        (7, "  https://pad.com/x  "),
        (8, "http://mixed.com:443/a"),  # NOT http's default: port kept
        (9, "https://svc.example.com:8080/a?x=1"),
        (10, "https://ga.io/p?utm_source_platform=web&a=1"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    cols = canonicalize_url(F.col("url"))
    out = df.select(
        "id",
        cols["canonical_url"].alias("c"),
        cols["host"].alias("h"),
        cols["registered_domain"].alias("d"),
        cols["n_params"].alias("n"),
    )
    return {r["id"]: r for r in out.collect()}


def test_case_port_www_tracking_fragment(canon):
    r = canon[1]
    assert r["c"] == "http://site.com/A/b?a=1&b=2"  # path case KEPT
    assert r["h"] == "site.com"
    assert r["d"] == "site.com"
    assert r["n"] == 2


def test_equivalent_urls_fold_to_same_key(canon):
    # 1 and 2 differ by scheme (http vs https) — host/path/query fold
    assert canon[1]["c"].split("://", 1)[1] == canon[2]["c"].split("://", 1)[1]


def test_bare_slash_and_default_https_port(canon):
    r = canon[3]
    assert r["c"] == "https://sub.domain.example.org"
    assert r["h"] == "sub.domain.example.org"
    assert r["d"] == "example.org"  # last two labels


def test_all_params_tracking(canon):
    assert canon[4]["c"] == "https://x.io/p"
    assert canon[4]["n"] == 0


def test_schemeless_garbage_passes_through(canon):
    r = canon[5]
    assert r["h"] is None and r["d"] is None
    # fragment + tracking still cleaned; the text before '?' is "path"
    assert r["c"] == "no scheme here?b=2"


def test_no_query_untouched_and_trim(canon):
    assert canon[6]["c"] == "https://one.com/path"
    assert canon[7]["c"] == "https://pad.com/x"


def test_non_default_port_is_distinct_origin(canon):
    # :443 is NOT the default for http: it stays in the canonical key
    assert canon[8]["c"] == "http://mixed.com:443/a"
    # ...but host/domain never carry ports
    assert canon[8]["h"] == "mixed.com"
    assert canon[8]["d"] == "mixed.com"
    assert canon[9]["c"] == "https://svc.example.com:8080/a?x=1"
    assert canon[9]["h"] == "svc.example.com"
    assert canon[9]["d"] == "example.com"


def test_underscored_utm_params_are_tracking(canon):
    assert canon[10]["c"] == "https://ga.io/p?a=1"
    assert canon[10]["n"] == 1


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "https://a.io/x")], ["id", "url"])
    cols = canonicalize_url(F.col("url"))
    plan = (
        df.select(cols["canonical_url"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_host_hierarchy_rollup_levels(spark):
    """ROLLUP over (tld, domain, host) in one pass; grouping_id
    separates subtotal nulls from data nulls."""
    from gush_spark.operators.urls import canonicalize_url
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("https://a.example.com/1",),
            ("https://b.example.com/2",),
            ("https://other.net/3",),
            ("garbage-not-a-url",),
        ],
        "url string",
    )
    cols = canonicalize_url(F.col("url"))
    base = (
        df.select(
            cols["host"].alias("host"),
            cols["registered_domain"].alias("registered_domain"),
        )
        .filter(F.col("host").isNotNull())
        .withColumn("tld", F.regexp_extract("host", r"[^.]+$", 0))
    )
    out = (
        base.rollup("tld", "registered_domain", "host")
        .agg(F.count(F.lit(1)).alias("n"),
             F.grouping_id().cast("long").alias("lvl"))
        .collect()
    )
    rows = {(r["tld"], r["registered_domain"], r["host"], r["lvl"]): r["n"]
            for r in out}
    assert rows[(None, None, None, 7)] == 3          # grand total, no garbage
    assert rows[("com", None, None, 3)] == 2          # per-tld
    assert rows[("com", "example.com", None, 1)] == 2  # per-domain
    assert rows[("com", "example.com", "a.example.com", 0)] == 1
    assert rows[("net", "other.net", "other.net", 0)] == 1


def test_robots_gate_longest_match_allow_ties_default(spark):
    """RFC 9309 semantics pinned by hand: longest prefix wins, an
    allow rule beats a deny of the SAME prefix, no match defaults to
    allow, garbage URLs (null host) default to allow."""
    from gush_spark.operators.robots import robots_gate, url_host_path
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [
            (1, "https://www.a.example/Docs/x"),     # /Docs deny
            (2, "https://a.example/Docs/pub/x"),     # /Docs/pub allow (longer)
            (3, "https://a.example/other"),          # no match -> allow
            (4, "https://a.example/tie"),            # /tie allow+deny -> allow
            (5, "not a url"),                        # garbage -> allow
            (6, "https://b.example/Docs/x"),         # other host -> allow
        ],
        "doc_id long, url string",
    )
    hp = url_host_path(F.col("url"))
    urls = raw.select("doc_id", hp["host"].alias("host"), hp["path"].alias("path"))
    rules = spark.createDataFrame(
        [
            ("a.example", "/Docs", False),
            ("a.example", "/Docs/pub", True),
            ("a.example", "/tie", True),
            ("a.example", "/tie", False),
        ],
        "host string, prefix string, allow boolean",
    )
    got = {r["doc_id"]: r for r in robots_gate(urls, rules).collect()}
    assert (got[1]["matched_prefix"], got[1]["allowed"]) == ("/Docs", False)
    assert (got[2]["matched_prefix"], got[2]["allowed"]) == ("/Docs/pub", True)
    assert (got[3]["matched_prefix"], got[3]["allowed"]) == (None, True)
    assert (got[4]["matched_prefix"], got[4]["allowed"]) == ("/tie", True)
    assert got[5]["host"] is None and got[5]["allowed"]
    assert (got[6]["matched_prefix"], got[6]["allowed"]) == (None, True)
    # rules ride a broadcast join; the corpus never shuffles raw urls
    plan = (
        robots_gate(urls, rules)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
