"""Web-corpus curation primitives — URL canonicalization and HTML
boilerplate stripping, the first two transforms of a crawl-ingestion
pipeline (canonical URLs are the join/dedup key for everything
domain-level; tag-free text is what every downstream text operator
expects to see).

Both operators are PURE Catalyst expression chains (regexp_replace /
regexp_extract / split / array_sort — whole-stage-codegen'd, zero
Python, zero shuffle): they add columns to a scan-side projection, so
at 100 TB they ride the ingest scan for free. The registered queries'
oracles deliberately do NOT mirror these regexes in DuckDB — they
construct messy inputs deterministically from real columns and compute
the canonical result as an INDEPENDENT ground-truth expression, so the
regex pipeline is verified against what it must produce, not against a
dialect translation of itself (the stronger check, and immune to
Java-regex vs RE2 dialect drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters dropped by canonicalization: the standard tracking
#: params that make one logical URL crawl as many (utm_* campaign tags,
#: Facebook/Google click ids). Matched against the full ``name=`` prefix.
TRACKING_PARAM_RE = "^(utm_[a-z0-9_]*|fbclid|gclid)="


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    *,
    out_col: str = "canonical_url",
    host_col: str = "host",
) -> DataFrame:
    """Add ``out_col`` (the canonical form) and ``host_col`` (the
    lowercased, ``www.``-stripped host — the domain-aggregation key) to
    ``df``.

    Canonicalization, in order:

    1. trim; drop the ``#fragment`` (never sent to servers);
    2. lowercase the scheme and the host (RFC 3986 §6.2.2.1 — scheme
       and host are case-insensitive, path/query are NOT and are kept
       byte-for-byte);
    3. strip a leading ``www.`` from the host;
    4. drop the port when it is the scheme default (``http:80`` /
       ``https:443``); keep any other explicit port;
    5. strip trailing ``/`` from the path (empty path → ``/``);
    6. drop tracking query params (:data:`TRACKING_PARAM_RE`) and SORT
       the remaining ``name=value`` pairs byte-lexicographically —
       param order is not semantic, and sorting makes permuted crawls
       of the same resource collide.

    Rows whose value does not look like a URL (no ``scheme://``) get a
    NULL canonical form and host — canonicalizing garbage would
    manufacture collisions; filter or route such rows explicitly. NULL
    input stays NULL. Single-line values assumed (crawl frontiers are
    line-oriented; an embedded newline ends the fragment match early).
    """
    u = F.regexp_replace(F.trim(F.col(url_col)), "#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, "^([^/?]+)", 1)
    pathq = F.regexp_replace(rest, "^[^/?]+", "")
    host = F.regexp_replace(
        F.regexp_replace(F.lower(hostport), ":[0-9]+$", ""), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    raw_path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        pathq.contains("?"), F.regexp_replace(pathq, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    q_canon = F.array_join(F.array_sort(params), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q_canon != "", F.concat(F.lit("?"), q_canon)).otherwise(
            F.lit("")
        ),
    )
    is_url = scheme != ""
    return df.withColumn(
        out_col, F.when(is_url, canonical)
    ).withColumn(host_col, F.when(is_url, host))


#: HTML character references decoded by :func:`strip_html`, applied in
#: THIS order — ``&amp;`` strictly LAST, so ``&amp;lt;`` correctly
#: yields the literal text ``&lt;`` instead of double-decoding to ``<``.
HTML_ENTITIES: "tuple[tuple[str, str], ...]" = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def strip_html_expr(col: Column) -> Column:
    """The :func:`strip_html` expression over an arbitrary column —
    exposed separately so pipelines can fuse it into an existing
    projection. Order matters and is fixed: (1) remove ``<script>`` /
    ``<style>`` ELEMENTS including their contents (code/CSS is not
    prose — and a script's ``a < b`` would otherwise shed fake "tags"),
    (2) every remaining tag → one space (block tags are word
    boundaries; ``"a</p><p>b"`` must not fuse to ``"ab"``), (3) decode
    :data:`HTML_ENTITIES` — only AFTER tag removal, so a literal
    ``&lt;div&gt;`` in prose never becomes a strippable tag, (4)
    collapse whitespace runs and trim."""
    t = F.regexp_replace(col, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    t = F.regexp_replace(t, "(?s)<[^>]*>", " ")
    for ent, ch in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def strip_html(
    df: DataFrame, text_col: str = "text", *, out_col: str = "clean_text"
) -> DataFrame:
    """Add ``out_col`` — ``text_col`` with markup removed (see
    :func:`strip_html_expr` for the exact, order-sensitive contract).
    Regex-only by design (the ``clean_text`` discipline: no HTML-parser
    dependency to version-drift under the corpus); malformed markup
    degrades gracefully — an unclosed ``<tag`` eats to the next ``>``
    or survives as text, never errors. NULL in → NULL out."""
    return df.withColumn(out_col, strip_html_expr(F.col(text_col)))
