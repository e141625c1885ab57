"""robots.txt parsing + allow/deny evaluation from RFC 9309.

Crawl curation has a politeness half the engine lacked: given the
robots.txt a crawler captured per host (Common Crawl ships them as a
WARC subset) and the corpus's URLs, which documents came from paths
the site disallowed? Pipelines drop or flag those rows. RFC 9309
specifies the whole thing precisely — group structure (consecutive
``user-agent`` lines share one group), case-insensitive product-token
matching with ``*`` fallback, ``allow``/``disallow`` path rules with
``*`` wildcards and the ``$`` end anchor, LONGEST-MATCH-WINS with
allow beating disallow on ties, percent-encoding normalization —
which makes it implementable and testable to the letter.

Two layers:

* :func:`parse_robots` — one robots.txt body -> ``[(agent, allow,
  path_pattern)]`` rules (plus sitemaps), pure Python, directly
  testable against the RFC's own examples.
* :func:`robots_filter_mark` — the Spark lane: a frame of
  ``(host, robots_txt)`` bodies parses ONCE per host (Arrow-batched,
  one row per applicable rule), broadcast-joins the corpus's URL
  hosts, and per URL the matching rules reduce with
  ``max_by(allow, (match_len, allow))`` — longest match wins, allow
  wins ties, no rules/no robots means allowed (the RFC default).
  Rule matching compiles each pattern to an anchored Java regex
  LITERALLY (every char quoted except ``*`` -> ``.*`` and a trailing
  ``$``), evaluated JVM-side on the joined pairs; per-host rule
  counts are small, so the join explodes a bounded factor and the
  corpus never shuffles on content (the blocklist tier's shape).

Scope, stated plainly: ``crawl-delay`` and other non-standard
directives are ignored (RFC 9309 ignores them too); group selection
implements the RFC's specific-agent-else-``*`` rule for ONE
configured product token (the common pipeline case), not multi-token
precedence ladders.
"""

from __future__ import annotations

import re
from urllib.parse import quote

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_RULES_PER_HOST = 1000
_MAX_LINE = 4096


def _normalize_path(p: str) -> str:
    """RFC 9309 §2.2.2 octet comparison: raw non-ASCII characters in
    a rule (``/café``) percent-ENCODE to compare against the encoded
    request path, while EXISTING escapes stay untouched (``%2F`` is a
    distinct octet sequence from ``/`` and must not collapse).
    Idempotent, so applying it on both the parse side and the
    evaluation side is safe."""
    return quote(p, safe="/:?&=@+,;~%*$")


def parse_robots(body: str) -> dict:
    """``{"groups": {agent_lower: [(allow, pattern), ...]},
    "sitemaps": [...]}`` for one robots.txt body. Unknown directives
    and malformed lines are ignored per the RFC; consecutive
    user-agent lines open ONE group; rules before any user-agent line
    are ignored (they belong to no group)."""
    raw_groups: list[tuple[list, list]] = []  # (agents, rules)
    sitemaps: list[str] = []
    in_agent_run = False
    for raw in body.splitlines():
        line = raw[:_MAX_LINE]
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                raw_groups.append(([], []))
                in_agent_run = True
            raw_groups[-1][0].append(value.lower())
            continue
        if field == "sitemap":
            if value:
                sitemaps.append(value)
            in_agent_run = False
            continue
        if field in ("allow", "disallow"):
            in_agent_run = False
            if not raw_groups:
                continue  # rule outside any group
            if field == "disallow" and value == "":
                continue  # empty disallow = allow everything (no rule)
            if not value.startswith("/") and not value.startswith("*"):
                continue  # malformed path per the RFC
            rules = raw_groups[-1][1]
            if len(rules) < _MAX_RULES_PER_HOST:
                rules.append((field == "allow", _normalize_path(value)))
            continue
        in_agent_run = False
    # RFC 9309 §2.2.1: several groups naming the same agent combine
    groups: dict[str, list] = {}
    for agents, rules in raw_groups:
        for a in agents:
            groups.setdefault(a, []).extend(rules)
    return {"groups": groups, "sitemaps": sitemaps}


def rules_for_agent(parsed: dict, agent: str) -> list:
    """The RFC's group selection for one product token: the group
    whose user-agent matches the token case-insensitively, else the
    ``*`` group, else no rules (allowed)."""
    groups = parsed["groups"]
    agent = agent.lower()
    if agent in groups:
        return groups[agent]
    return groups.get("*", [])


def _pattern_to_regex(pattern: str) -> str:
    """Anchored Java-compatible regex for one path pattern: literal
    except ``*`` -> ``.*``; a trailing ``$`` anchors the end."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) if p != "*" else ".*"
             for p in re.split(r"(\*)", pattern) if p != ""]
    return "^" + "".join(parts) + ("$" if anchored else "")


def match_path(rules: list, path: str) -> bool:
    """Pure-Python evaluation (the oracle the Spark lane mirrors):
    longest matching pattern wins; allow wins length ties; no match
    means allowed."""
    path = _normalize_path(path)
    best = None  # (length, allow)
    for allow, pattern in rules:
        if re.match(_pattern_to_regex(pattern), path):
            key = (len(pattern), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def robots_rules_frame(
    robots_df: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(host, allow, pattern, regex, pat_len) — one row per applicable
    rule per host, parsed Arrow-batched once per robots body."""
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("host", StringType()),
            StructField("allow", BooleanType()),
            StructField("pattern", StringType()),
            StructField("regex", StringType()),
            StructField("pat_len", IntegerType()),
        ]
    )

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if body is None:
                    continue
                rules = rules_for_agent(parse_robots(str(body)), agent)
                for allow, pattern in rules:
                    out["host"].append(host)
                    out["allow"].append(allow)
                    out["pattern"].append(pattern)
                    out["regex"].append(_pattern_to_regex(pattern))
                    out["pat_len"].append(len(pattern))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=object) for k, v in out.items()}
            )

    return robots_df.select(host_col, body_col).mapInPandas(parse, schema)


def robots_filter_mark(
    df: DataFrame,
    robots_df: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    out_col: str = "robots_allowed",
) -> DataFrame:
    """Append whether each row's URL is allowed for ``agent`` under
    its host's robots.txt (``robots_df``: (host, robots_txt)). Rows
    whose host has no robots / no matching rules are allowed — the
    RFC default. Shape: rules broadcast, candidate explode bounded by
    per-host rule count, one row-key shuffle for the verdict
    join-back."""
    from .blocklist import url_host

    rules = robots_rules_frame(robots_df, agent)
    key = F.monotonically_increasing_id()
    with_key = df.withColumn("__rb_key", key)
    raw_path = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/[^#]*)", 1
    )
    urls = with_key.select(
        "__rb_key",
        url_host(url_col).alias("__host"),
        # regexp_extract yields '' (not NULL) on no match: a host-only
        # URL matches rules as path "/". Paths match AS-IS — feed
        # canonicalized URLs for exact RFC percent-octet parity (the
        # rule side normalizes; module doc).
        F.when(raw_path == "", F.lit("/")).otherwise(raw_path).alias(
            "__path"
        ),
    )
    cand = urls.join(
        F.broadcast(rules), urls["__host"] == rules["host"], "inner"
    ).where(F.expr("__path rlike regex"))
    verdicts = cand.groupBy("__rb_key").agg(
        F.max_by(
            "allow", F.struct(F.col("pat_len"), F.col("allow"))
        ).alias("__verdict")
    )
    return (
        with_key.join(verdicts, "__rb_key", "left")
        .withColumn(out_col, F.coalesce(F.col("__verdict"), F.lit(True)))
        .drop("__rb_key", "__verdict")
    )


def robots_filter(
    df: DataFrame,
    robots_df: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Keep only rows whose URL the host's robots.txt allows."""
    marked = robots_filter_mark(df, robots_df, agent, url_col, "__rb_ok")
    return marked.where(F.col("__rb_ok")).drop("__rb_ok")


# ------------------------------------------------------------- sitemaps

_MAX_SITEMAP_URLS = 100_000  # the sitemaps.org protocol's own cap is 50k
_MAX_SITEMAP_BYTES = 64 << 20


def parse_sitemap(payload: bytes) -> tuple[str, list[tuple[str, str | None]]]:
    """One sitemap document (the sitemaps.org protocol: ``<urlset>``
    of ``<url><loc/><lastmod/>`` or a ``<sitemapindex>`` of nested
    ``<sitemap><loc/>``; gzip envelopes unwrapped) ->
    ``(kind, [(loc, lastmod), ...])`` with kind ``"urlset"`` or
    ``"index"``. Plain-text sitemaps (one URL per line) parse as a
    urlset with NULL lastmod. Malformed XML is ValueError."""
    import gzip as _gzip
    import xml.etree.ElementTree as ET

    if payload[:2] == b"\x1f\x8b":
        from .multimodal import bounded_decompress_bytes

        payload = bounded_decompress_bytes(
            payload, "gzip", _MAX_SITEMAP_BYTES
        )
    if len(payload) > _MAX_SITEMAP_BYTES:
        raise ValueError("sitemap exceeds the size bound")
    stripped = payload.lstrip()
    if not stripped.startswith(b"<"):
        # the plain-text variant: one URL per line
        out = []
        for line in payload.decode("utf-8", errors="replace").splitlines():
            line = line.strip()
            if line.startswith(("http://", "https://")):
                out.append((line, None))
                if len(out) > _MAX_SITEMAP_URLS:
                    raise ValueError("sitemap exceeds the URL bound")
        return "urlset", out
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as ex:
        raise ValueError(f"sitemap XML malformed: {ex}") from ex
    tag = root.tag.rsplit("}", 1)[-1]
    if tag == "urlset":
        kind, entry_tag = "urlset", "url"
    elif tag == "sitemapindex":
        kind, entry_tag = "index", "sitemap"
    else:
        raise ValueError(f"sitemap root <{tag}> is neither urlset nor index")
    out = []
    for entry in root:
        if entry.tag.rsplit("}", 1)[-1] != entry_tag:
            continue
        loc = None
        lastmod = None
        for child in entry:
            name = child.tag.rsplit("}", 1)[-1]
            if name == "loc" and child.text:
                loc = child.text.strip()
            elif name == "lastmod" and child.text:
                lastmod = child.text.strip()
        if loc:
            out.append((loc, lastmod))
            if len(out) > _MAX_SITEMAP_URLS:
                raise ValueError("sitemap exceeds the URL bound")
    return kind, out


def explode_sitemaps(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "skip",
) -> DataFrame:
    """One row per discovered URL across a frame of sitemap payloads:
    ``(id, kind, loc, lastmod)`` — index entries surface with kind
    ``"index"`` so a pipeline can fetch-and-recurse them explicitly
    (this operator never fetches). Arrow-batched, per-row
    quarantine/strict like the document tier."""
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    if on_error not in ("skip", "strict"):
        raise ValueError(
            f"on_error must be 'skip' or 'strict', got {on_error!r}"
        )
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("kind", StringType()),
            StructField("loc", StringType()),
            StructField("lastmod", StringType()),
        ]
    )

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for rid, blob in zip(pdf[id_col], pdf[payload_col]):
                if blob is None:
                    continue
                try:
                    kind, entries = parse_sitemap(bytes(blob))
                except ValueError as ex:
                    if on_error == "strict":
                        raise ValueError(f"{id_col}={rid}: {ex}") from ex
                    continue
                for loc, lastmod in entries:
                    out[id_col].append(rid)
                    out["kind"].append(kind)
                    out["loc"].append(loc)
                    out["lastmod"].append(lastmod)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=object) for k, v in out.items()}
            )

    return df.select(id_col, payload_col).mapInPandas(parse, schema)
