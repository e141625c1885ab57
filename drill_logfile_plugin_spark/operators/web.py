"""Crawl hygiene: HTML stripping and URL canonicalization, JVM-side.

Web crawl corpora arrive as markup with tracking-parameter-riddled URLs;
before any text operator (quality, dedup, tokenization) can do its job
the markup must go, and before URL-level dedup can work the URLs must be
canonical (``http://example.com/a?utm_source=x&b=1`` and
``https://EXAMPLE.com/a/?b=1`` are the same page to a crawler). Both
operators here are pure Spark expression chains — ``regexp_replace`` /
``parse_url`` / higher-order array functions — so crawl hygiene at 100 TB
is one JVM projection over the scan, not a Python round-trip. (The plan
contract is exchange-free and UDF-free; ``parse_url`` is a
CodegenFallback expression, so the projection may run interpreted rather
than inside a WholeStageCodegen span — still JVM-side, still fused with
the scan stage.)

* :func:`strip_html` — drop script/style/comment blocks, convert
  block-level closers to newlines (paragraph structure survives for the
  chunkers), strip remaining tags, decode the common entities, collapse
  whitespace. A state-machine parser would handle pathological nesting
  better; the regex chain is the documented 95% answer (CCNet/C4 use the
  same class of extraction) and malformed fragments degrade to leaving
  text intact, never to dropping it.
* :func:`canonical_url` — lowercase scheme/host, strip the default port
  and any userinfo, drop ``www.``, collapse duplicate slashes, strip the
  trailing slash, DROP tracking parameters (utm_*, gclid, fbclid, ref…),
  SORT the surviving query params (param order is transport noise), drop
  the fragment. Idempotent (property-tested): canonicalizing twice is the
  identity, so re-ingested canonical URLs never drift.

Reference scope: LLM-pipeline extension tier (SURVEY.md §2 Tier C).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking parameters stripped by canonical_url: the standard analytics /
# click-id families. Matching is on the full parameter NAME (never a
# substring), case-insensitive.
TRACKING_PARAMS = (
    "utm_[a-z0-9_]*",
    "gclid",
    "fbclid",
    "msclkid",
    "mc_eid",
    "igshid",
    "ref",
    "ref_src",
)

_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    # &amp; LAST: decoding it earlier would re-activate entities it was
    # escaping (&amp;lt; means the literal text "&lt;")
    ("&amp;", "&"),
)


def strip_html(col) -> Column:
    """Markup → text as one fused expression chain (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    # script/style/comment blocks vanish WITH their contents
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    # block-level boundaries become newlines so paragraphs survive for
    # the chunking tier; <br> is a boundary in both forms
    c = F.regexp_replace(
        c,
        r"(?i)<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr|/table|/blockquote)\s*>",
        "\n",
    )
    # every remaining tag (incl. openers of the blocks above) is noise
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    # collapse horizontal runs, then 3+ newlines to a paragraph break
    c = F.regexp_replace(c, r"[ \t\x0b\f\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    # trim() strips only spaces; boundary newlines need the regex form
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def _canon_query(qs: Column) -> Column:
    """Drop tracking params, sort the rest — NULL when nothing survives."""
    tracking = "|".join(TRACKING_PARAMS)
    kept = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "")
        & ~F.lower(p).rlike(f"^(?:{tracking})(?:=|$)"),
    )
    return F.when(F.size(kept) > 0, F.array_join(F.array_sort(kept), "&"))


def canonical_url(col) -> Column:
    """Canonical form of a URL column (see module doc). NULL in → NULL
    out; URLs parse_url cannot parse (no scheme, garbage) come back NULL
    — absent-value semantics, countable upstream, never a job failure."""
    u = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    authority = F.lower(F.parse_url(u, F.lit("AUTHORITY")))
    # userinfo off, then host[:port]
    hostport = F.element_at(F.split(authority, "@"), -1)
    host = F.element_at(F.split(hostport, ":"), 1)
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.when(
        F.size(F.split(hostport, ":")) > 1,
        F.element_at(F.split(hostport, ":"), 2),
    )
    # default ports are transport noise; explicit others are identity
    port_sig = F.when(
        port.isNotNull()
        & ~(
            ((scheme == "http") & (port == "80"))
            | ((scheme == "https") & (port == "443"))
        ),
        F.concat(F.lit(":"), port),
    ).otherwise(F.lit(""))
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/$", "")
    query = _canon_query(F.parse_url(u, F.lit("QUERY")))
    q_sig = F.when(
        query.isNotNull(), F.concat(F.lit("?"), query)
    ).otherwise(F.lit(""))
    return F.when(
        scheme.isNotNull() & host.isNotNull(),
        F.concat(scheme, F.lit("://"), host, port_sig, path, q_sig),
    )
