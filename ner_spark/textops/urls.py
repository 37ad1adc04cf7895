"""URL canonicalization — the Common-Crawl curation stage that precedes
URL-level dedup and per-domain quotas.

Pure JVM column expressions, zero Python UDFs (the higher-order query
filter sits outside whole-stage codegen but stays expression-evaluated
in the JVM): regexp split into
scheme://authority + tail, array ops for the query string (split /
filter / rejoin — immune to the global-regex rescan pitfalls of
chained regexp_replace on runs of tracking params).  Rules:

  1. scheme and host lowercase; default ports (:80 http, :443 https)
     stripped;
  2. fragment dropped;
  3. tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
     ``msclkid``, ``ref``), other parameters kept in original order;
  4. an emptied query loses its ``?``;
  5. non-absolute-http(s) inputs pass through untouched (rule of least
     surprise for mailto:/relative refs).

Idempotent (property-tested).  The regex subset is Java∩RE2 so the
same semantics replay in DuckDB for the oracle (the PII-scrub
precedent, textops/pii.py).

At 100 TB: narrow map over the page/URL column, zero shuffles; the
downstream consumers (URL dedup = hash-groupBy on the canonical form,
per-domain quotas = source_quota on ``url_domain``) reuse existing
scale-shaped operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEAD_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)="


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL; anything else passes
    through unchanged."""
    url = F.col(url) if isinstance(url, str) else url
    is_abs = F.lower(url).rlike(r"^https?://")
    no_frag = F.regexp_replace(url, r"#.*$", "")
    head = F.lower(F.regexp_extract(no_frag, _HEAD_RE, 0))
    head = F.regexp_replace(head, r"^(http://[^/:?#]*):80$", "$1")
    head = F.regexp_replace(head, r"^(https://[^/:?#]*):443$", "$1")
    tail = F.substring(no_frag,
                       F.length(F.regexp_extract(no_frag, _HEAD_RE, 0))
                       + F.lit(1), F.lit(1 << 30))
    path = F.when(tail.contains("?"), F.substring_index(tail, "?", 1)) \
            .otherwise(tail)
    query = F.when(tail.contains("?"),
                   F.substring(tail, F.length(path) + F.lit(2),
                               F.lit(1 << 30))).otherwise(F.lit(""))
    kept = F.filter(F.split(query, "&"),
                    lambda p: (p != "") & ~F.lower(p).rlike(TRACKING_RE))
    canon = F.concat(
        head, path,
        F.when(F.size(kept) > 0,
               F.concat(F.lit("?"), F.array_join(kept, "&")))
         .otherwise(F.lit("")))
    return F.when(is_abs, canon).otherwise(url)


def url_domain(url: Column | str) -> Column:
    """Lowercased host of an absolute URL ('' otherwise)."""
    url = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^:/?#]*)", 1))
