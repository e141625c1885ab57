"""Blocklist curation: term blocklists (the C4 "badwords" stage) and
domain blocklists (the RefinedWeb-style URL curation stage).

Every published web-scale pipeline has this pair of filters in front
of everything else: drop or flag documents containing blocked TERMS
(whole-token matches, not substrings — "class" must not hit "ass"),
and drop documents fetched from blocked DOMAINS (a match on the
registrable suffix: blocking ``example.com`` blocks
``cdn.example.com`` but never ``notexample.com``). The repo had the
quality/langid/dedup tiers but not this first gate.

Scale shapes, chosen by list size:

* **Literal path** (lists up to ~10k entries): the blocklist rides the
  plan as a ``create_map`` literal and matching is one scan-fused
  ``filter``/``size`` over the document's token array — no shuffle,
  no join, no Python (the unigram/WordPiece vocabulary pattern).
* **Join path** (the 1M-entry production lists): explode one row per
  token (or per domain suffix) and BROADCAST-join the blocklist —
  candidate generation is an equi join on a short key, the corpus
  never shuffles. ``term_blocklist_hits_join`` and the domain lane
  both use it; at 100 TB the explode is map-side only and the
  blocklist ships once per executor.

Domain matching: the URL's host (extracted with the same ``parse_url``
lane as ``web.canonical_url``) explodes into its parent suffixes
(``a.b.example.com`` -> itself + ``b.example.com`` + ``example.com`` +
``com``), each an equi-join candidate — suffix semantics without a
prefix/range join. Blocking a bare TLD is legal input (it just blocks
everything under it), matching how production lists treat it.

Tokenization is the engine-wide whitespace split (text.TOKS_SPARK /
TOKS_DUCK), lowercased on BOTH sides — term lists are case-insensitive
by published convention (C4's list is lowercase). The q65 oracle
re-runs the term stats in DuckDB over the same split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import TOKS_SPARK

_MAX_LITERAL_TERMS = 20_000


def _toks_lower(text_col: str) -> Column:
    return F.expr(TOKS_SPARK.format(c=f"lower({text_col})"))


def term_blocklist_hits(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    out_col: str = "blocklist_hits",
) -> DataFrame:
    """Append the count of blocked-token OCCURRENCES per document
    (whole-token, case-insensitive). Literal path: the list rides the
    plan; scan-fused. For lists beyond the literal bound use
    :func:`term_blocklist_hits_join` (enforced, not silent)."""
    if len(terms) > _MAX_LITERAL_TERMS:
        raise ValueError(
            f"term list has {len(terms)} entries — beyond the "
            f"{_MAX_LITERAL_TERMS} literal-plan bound; use "
            "term_blocklist_hits_join (broadcast join path)"
        )
    if not terms:
        return df.withColumn(
            out_col,
            F.when(F.col(text_col).isNotNull(), F.lit(0)),
        )
    tmap = F.create_map(
        *[F.lit(x) for t in sorted({t.lower() for t in terms}) for x in (t, 1)]
    )
    hits = F.size(
        F.filter(
            _toks_lower(text_col),
            lambda t: F.element_at(tmap, t).isNotNull(),
        )
    )
    return df.withColumn(
        out_col, F.when(F.col(text_col).isNotNull(), hits)
    )


def term_blocklist_hits_join(
    df: DataFrame,
    terms_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "blocklist_hits",
) -> DataFrame:
    """The production-list path: ``terms_df`` is a one-column frame
    (``term``); tokens explode map-side and hit-counts come from ONE
    broadcast equi join + a partial-agg'd count keyed by ``id_col``
    (the only shuffle, on the doc key). Documents with zero hits keep
    0 (left join back), NULL text keeps NULL."""
    toks = df.select(
        id_col, F.explode(_toks_lower(text_col)).alias("__tok")
    )
    counts = (
        toks.join(
            F.broadcast(
                terms_df.select(F.lower("term").alias("__tok")).distinct()
            ),
            "__tok",
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
    return (
        df.join(counts, id_col, "left")
        .withColumn(
            out_col,
            F.when(
                F.col(text_col).isNotNull(),
                F.coalesce(F.col(out_col), F.lit(0)),
            ),
        )
    )


def term_blocklist_filter(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """Keep documents with at most ``max_hits`` blocked-token
    occurrences (the C4 policy is ``max_hits=0``). NULL text drops —
    unscorable rows fail a gate, the engine-wide cleaning posture."""
    out = term_blocklist_hits(df, terms, text_col, "__bl_hits")
    return out.where(F.col("__bl_hits") <= max_hits).drop("__bl_hits")


def url_host(col) -> Column:
    """Lowercased host of a URL column (the ``canonical_url`` host
    lane, without the www-strip — blocklists name exact hosts)."""
    u = F.col(col) if isinstance(col, str) else col
    authority = F.lower(F.parse_url(u, F.lit("AUTHORITY")))
    hostport = F.element_at(F.split(authority, "@"), -1)
    return F.element_at(F.split(hostport, ":"), 1)


def _host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host: ``a.b.com`` ->
    [``a.b.com``, ``b.com``, ``com``]."""
    labels = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(
            F.slice(labels, i, F.size(labels)), "."
        ),
    )


def domain_blocklist_mark(
    df: DataFrame,
    domains_df: DataFrame,
    url_col: str = "url",
    out_col: str = "blocked_domain",
) -> DataFrame:
    """Append the blocked registrable suffix that matched the URL's
    host (NULL when unblocked or the URL has no parseable host).
    ``domains_df`` is one column ``domain``. Shape: suffix explode
    (<= host label count per row, map-side) + ONE broadcast equi join
    + a first-match agg on the row key — the corpus never shuffles on
    content. When several listed suffixes match, the most specific
    (longest) wins, deterministically."""
    key = F.monotonically_increasing_id()
    with_key = df.withColumn("__bl_key", key)
    cand = with_key.select(
        "__bl_key",
        F.explode(_host_suffixes(url_host(url_col))).alias("__suffix"),
    )
    hits = (
        cand.join(
            F.broadcast(
                domains_df.select(
                    F.lower("domain").alias("__suffix")
                ).distinct()
            ),
            "__suffix",
        )
        .groupBy("__bl_key")
        .agg(F.max_by("__suffix", F.length("__suffix")).alias(out_col))
    )
    return with_key.join(hits, "__bl_key", "left").drop("__bl_key")


def domain_blocklist_filter(
    df: DataFrame,
    domains_df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose URL host falls under any blocked domain;
    URL-less/unparseable rows are KEPT (a domain list only speaks
    about domains it names — absence of evidence keeps the row; gate
    unparseable URLs separately if the pipeline wants that)."""
    marked = domain_blocklist_mark(df, domains_df, url_col, "__bl_dom")
    return marked.where(F.col("__bl_dom").isNull()).drop("__bl_dom")
