"""URL canonicalization — the normalization pass every crawl pipeline
runs before URL-level dedup and host/domain rollups: the same resource
is fetched as ``HTTP://WWW.Site.COM:80/a?utm_source=x&b=2#frag`` and
``http://site.com/a?b=2`` and must map to one canonical key.

Rules (the common-denominator subset used by web crawlers):
- scheme and host lowercased (path/query case is significant, kept);
- leading ``www.`` stripped from the host;
- the scheme's OWN default port stripped (``:80`` for http, ``:443``
  for https — a non-default explicit port is a different origin and is
  kept in the canonical key, but never in host/registered_domain);
- fragment stripped;
- tracking parameters (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``)
  removed;
- remaining query parameters SORTED (param order is almost never
  semantic; sorting folds permutations into one key);
- a bare ``/`` path collapsed to the empty path.

Also derived: ``host`` and ``registered_domain`` (last two dot-labels
— a deliberate public-suffix-list-free approximation, documented).

Scale design: everything is per-row column expressions — regexps and
native array ops (split / array_sort / array_join) in whole-stage
codegen; the only lambda is the tracking-param filter over a per-URL
array of a handful of elements. Zero shuffles; the downstream URL
dedup is then an exact groupBy on the canonical key (or its md5 at
crawl scale — same discipline as operators/dedup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# matched against each "k=v" pair; anchored prefixes (utm_ names may
# themselves contain underscores/digits, e.g. utm_source_platform)
TRACKING_RE = r"^(utm_\w+|fbclid|gclid|msclkid)="

_AUTHORITY_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)"


def canonicalize_url(url: Column) -> dict[str, Column]:
    """Canonical URL, host and registered domain as column expressions.

    URLs without a ``scheme://authority`` prefix pass through with only
    fragment/tracking cleanup (host/domain null) — garbage in the url
    column is data, not an error (same policy as functions/extract P10).

    Port handling is scheme-aware: ``:80`` is dropped only for http and
    ``:443`` only for https (``http://x:443`` is a DIFFERENT origin and
    must not fold); any other explicit port is kept in the canonical
    key but excluded from ``host``/``registered_domain`` so domain
    rollups never fragment on ports.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _AUTHORITY_RE, 1))
    host0 = F.lower(F.regexp_extract(u, _AUTHORITY_RE, 2))
    hostport = F.regexp_replace(host0, r"^www\.", "")
    host = F.regexp_replace(hostport, r":\d+$", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    canonical_host = F.when(
        (port == "") | default_port, host
    ).otherwise(F.concat(host, F.lit(":"), port))
    # everything after the authority, fragment dropped
    rest = F.regexp_replace(
        F.regexp_replace(u, _AUTHORITY_RE, ""), r"#.*$", ""
    )
    path = F.regexp_extract(rest, r"^[^?]*", 0)
    path = F.when(path == "/", F.lit("")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    canonical_tail = F.concat(
        path,
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
        ).otherwise(F.lit("")),
    )
    # authority requires a non-empty host AFTER stripping www./port:
    # 'http://:80/a' or 'http:///p' have a scheme but no host — they go
    # through the garbage-cleanup path (which IS idempotent; keeping the
    # scheme with an empty canonical host would not be)
    has_authority = host != ""
    canonical = F.when(
        has_authority,
        F.concat(scheme, F.lit("://"), canonical_host, canonical_tail),
    ).otherwise(canonical_tail)
    return {
        "canonical_url": canonical,
        "host": F.when(has_authority, host),
        "registered_domain": F.when(
            has_authority, F.regexp_extract(host, r"[^.]+\.[^.]+$", 0)
        ),
        "n_params": F.size(params).cast("long"),
    }
