"""Web-corpus URL operators (r10): canonicalization and URL-level
dedup grouping — the stage every crawl-derived training pipeline runs
BEFORE content dedup (the same page arrives under scheme/host case
variants, default ports, tracking parameters, fragments and trailing
slashes; collapsing them by canonical URL is orders of magnitude
cheaper than hashing their bodies).

Everything is pure ``pyspark.sql.functions`` — regexp/string surgery
stays inside whole-stage codegen, no Python in the hot path, and the
rules are simple enough that a SQL oracle mirrors them verbatim
(RFC 3986 §6 normalization subset + the de-facto tracking-param strip).

100 TB shape: canonicalization is a stateless per-row projection
(zero shuffle); the dedup grouping is one groupBy on the canonical
string — the same slim-key partial-agg shape as exact content dedup,
with canonical URLs far smaller than document bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query keys stripped during canonicalization: the cross-site tracking
# params that vary per click without changing the resource. Anchored to
# the query start or an & boundary (kept via the capture) so substrings
# of LONGER keys (pgclid=, my_fbclid=) are never clipped — unanchored,
# two distinct resources could merge into one canonical group (r10
# review finding). The pattern is applied to the QUERY COMPONENT only
# (r11, caught by the RFC 3986 property model): '&gclid=...' is legal
# inside a path segment (RFC 3986 §3.3 pchar includes sub-delims), and
# a literal '?' inside the query is data, not a parameter boundary —
# so the anchor is ^? (the component's first char) or &, never a
# mid-query '?'.
_TRACKING_RE = r"(^\?|&)(utm_[A-Za-z0-9]+|gclid|fbclid|msclkid)=[^&]*"


def canonicalize_url(url: Column) -> Column:
    """RFC 3986 §6-style canonical form, the subset crawl pipelines
    agree on: drop the fragment, strip tracking query parameters (and
    tidy the leftover ``?``/``&`` separators), lowercase the scheme and
    authority, remove default ports (http:80, https:443), and trim a
    trailing slash from non-root paths. Scheme and non-default ports
    stay significant (http vs https are different resources).

    Pure built-ins — Catalyst keeps the whole chain in codegen.
    Cross-checked against a parse-based pure-Python RFC 3986 model
    (tests/test_corpus_properties.py) per the oracle-mirror caveat."""
    # 1. fragment ('#' is reserved for the fragment in every component)
    u = F.regexp_replace(url, r"#.*$", "")
    # 2. split at the FIRST '?' — everything before is scheme/authority/
    #    path and must not see the tracking strip
    pre = F.regexp_extract(u, r"^([^?]*)", 1)
    qry = F.regexp_replace(u, r"^[^?]*", "")
    # 3. tracking params within the query, then separator tidy-up:
    #    '?utm_x=1&b=2' -> '?&b=2' -> '?b=2'; '?utm_x=1' -> '?' -> ''
    qry = F.regexp_replace(qry, _TRACKING_RE, r"$1")
    qry = F.regexp_replace(qry, r"^\?&+", "?")
    qry = F.regexp_replace(qry, r"&&+", "&")
    qry = F.regexp_replace(qry, r"[?&]$", "")
    u = F.concat(pre, qry)
    # 3. lowercase scheme://authority, keep path/query case
    head = F.lower(F.regexp_extract(u, r"^([^:/?#]+://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[^:/?#]+://[^/?#]*", "")
    # 4. default ports on the lowered authority
    head = F.regexp_replace(head, r"^(http://[^/?#:]*):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^/?#:]*):443$", r"$1")
    # 5. trailing slash on a non-root path (before any query)
    rest = F.regexp_replace(rest, r"^(/[^?]*[^/?])/+(\?|$)", r"$1$2")
    rest = F.regexp_replace(rest, r"^/+(\?|$)", r"/$1")
    return F.concat(head, rest)


def url_dedup_groups(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse rows sharing a canonical URL: one output row per
    canonical URL with the member count and the representative (min
    id) — the URL-level half of crawl dedup (content dedup runs after,
    on far fewer rows). One slim-key groupBy; no content movement."""
    return (
        df.select(canonicalize_url(F.col(url_col)).alias("canonical_url"), F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min(id_col).alias("representative_id"),
        )
    )
