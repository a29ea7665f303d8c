"""Web-crawl preprocessing: HTML → text, URL normalization, domain gates.

The front of a crawl-derived training pipeline, before any quality or
dedup stage (functions/text.py, operators/curate.py) sees a document:

- :func:`html_to_text` — boilerplate-free visible text from raw HTML.
  A pure Catalyst ``regexp_replace`` chain (whole-stage codegen, no
  Python, no external parser): script/style/comment blocks out first,
  block-level tags become newlines so words don't fuse across
  paragraphs, remaining tags strip, the HTML-4 core entities decode,
  whitespace collapses. It is a CLEANER, not a browser — malformed
  nesting degrades to extra whitespace, never to an error.
- :func:`normalize_url` — canonical dedup key for URLs: lowercased
  scheme/host, default ports and fragments dropped, tracking params
  (utm_*, gclid, fbclid, …) removed, surviving query params SORTED so
  param order never splits a dedup group, trailing slash trimmed.
  Built on ``parse_url`` + array algebra — per-row expressions only.
- :func:`host_suffixes` / :func:`domain_gate` — blocklist/allowlist
  filtering that scales: a host matches an entry when it equals it or
  ends with ``"." + entry``, so each URL explodes into its (bounded,
  ≤ label count) suffix chain and the gate is an EQUI-join against the
  list — a million-domain blocklist stays a join, never a regex scan
  or a per-row ``isin``. AQE broadcasts small lists.

No public-suffix-list dependency: ``domain_gate`` matches suffix chains
exactly, so list entries decide their own granularity ("example.com"
blocks subdomains, "bad.example.com" blocks one). This is how the
reference-free gates stay dependency-free in this container.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that never identify content (trackers) — stripped
#: by normalize_url. Extend per deployment.
TRACKING_PARAMS = r"utm_[^=&]*|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src"

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&#x27;", "'"),
    # &amp; LAST: decoding it earlier would double-decode "&amp;lt;"
    ("&amp;", "&"),
]

#: Tags whose end (or self-closing) marks a visual line break.
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|tr|table|h1|h2|h3|h4|h5|h6|blockquote|pre|section|article|header|footer"
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: Tag-attribute body that tolerates ``>`` inside quoted attribute
#: values (``data-y='<z>'``) — non-quote runs interleaved with quoted
#: spans, the standard linear-time tag regex.
_ATTRS = "[^>\"']*(?:\"[^\"]*\"[^>\"']*|'[^']*'[^>\"']*)*"


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML fragment (see module docstring).
    Block boundaries become single newlines (adjacent block tags never
    stack into blank lines) — downstream text signals count lines and
    words, not typography."""
    t = _c(col)
    # non-content blocks vanish entirely (case-insensitive, dot-all)
    t = F.regexp_replace(
        t, rf"(?is)<(script|style)\b{_ATTRS}>.*?</\1\s*>", " "
    )
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # block boundaries -> newline BEFORE generic tag stripping
    t = F.regexp_replace(t, rf"(?i)</?({_BLOCK_TAGS})\b{_ATTRS}>", "\n")
    t = F.regexp_replace(t, rf"(?s)<{_ATTRS}>", " ")
    for ent, rep in _ENTITIES:
        t = F.regexp_replace(t, ent, rep)
    # collapse: runs of spaces/tabs -> one space, then tidy newlines
    t = F.regexp_replace(t, r"[ \t\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    # trim() strips spaces only — newlines at the edges need the regexp
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def has_noindex(col: Column | str) -> Column:
    """True when the HTML carries a robots noindex directive — a
    ``<meta name="robots|googlebot" content="…noindex…">`` tag (any
    attribute order, any quoting). Publishers use it to opt pages out
    of indexing; a respectful crawl pipeline drops them before any
    text reaches the corpus. One case-insensitive regex over the raw
    HTML — run it BEFORE html_to_text (the tag is markup and would be
    stripped)."""
    h = _c(col)
    # extract every <meta …> tag (the _ATTRS body tolerates '>' inside
    # quoted values — `content="a > b"` must not truncate the tag),
    # then test name= and content= inside the SAME tag — attribute
    # order varies in the wild, so one ordered regex would miss
    # content-before-name tags
    metas = F.regexp_extract_all(
        h, F.lit(rf"(?is)(<meta\b{_ATTRS}>)"), F.lit(1)
    )
    # noindex must sit INSIDE the content attribute's own value (match
    # the quoted span, or the unquoted token, as a unit) — a bare
    # [^>]* scan would run past the closing quote and false-positive on
    # `content="all" data-note="noindex"`. The attribute NAMES anchor
    # on a preceding whitespace/quote/slash, not \b: '-' is a non-word
    # char, so \bname/\bcontent also matched inside data-name/
    # data-content and silently dropped pages the publisher never opted
    # out (r8 review — the same attr-name anchor _ATTR_UNIT already
    # carries). '/' is in the class because HTML5 parsers treat a
    # slash between attributes as a separator (<meta name="robots"/
    # content="noindex">), which the old \b matched (r8 advice).
    content_noindex = (
        r"(?is)[\s\"'/]content\s*=\s*"
        r"(\"[^\"]*\bnoindex\b[^\"]*\""
        r"|'[^']*\bnoindex\b[^']*'"
        r"|[^\s\"'>]*\bnoindex\b[^\s\"'>]*)"
    )
    return F.coalesce(
        F.exists(
            metas,
            lambda tag: tag.rlike(
                r"(?is)[\s\"'/]name\s*=\s*[\"']?\s*(robots|googlebot)\b"
            )
            & tag.rlike(content_noindex),
        ),
        F.lit(False),  # NULL html -> not a noindex page
    )


def normalize_url(col: Column | str, strip_www: bool = True) -> Column:
    """Canonical form of an absolute http(s) URL (see module docstring).
    NULL stays NULL; a URL ``parse_url`` cannot parse yields NULL (the
    gate for a quarantine split, mirroring the CSV reader's contract).
    """
    u = _c(col)
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    if strip_www:
        # (www.)+ — stacked www labels must strip in ONE pass or the
        # canonical form is not a fixed point (www.www.x -> www.x ->
        # x across two normalizations = drifting dedup keys)
        host = F.regexp_replace(host, r"^(www\.)+", "")
    # AUTHORITY carries the explicit port; keep only non-default ones
    auth = F.lower(F.try_parse_url(u, F.lit("AUTHORITY")))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    port_sfx = F.when(
        (port == "")
        | ((proto == "http") & (port == "80"))
        | ((proto == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")
    query = F.try_parse_url(u, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "")
            & ~p.rlike(rf"^(?:{TRACKING_PARAMS})(?:=|$)"),
        )
    )
    query_sfx = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        proto.isin("http", "https") & (host != ""),
        F.concat(proto, F.lit("://"), host, port_sfx, path, query_sfx),
    )  # else NULL


def host_suffixes(host: Column | str) -> Column:
    """array<string> of the host's dot-suffix chain:
    ``a.b.example.com`` → [a.b.example.com, b.example.com, example.com,
    com] — bounded by the label count, the explode side of the
    blocklist equi-join."""
    h = _c(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def domain_gate(
    df: DataFrame,
    domains: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    mode: str = "block",
) -> DataFrame:
    """Filter ``df`` by a domain list, matching any dot-suffix of the
    URL's host. ``mode="block"`` keeps rows whose host matches NO list
    entry; ``mode="allow"`` keeps rows that match at least one.

    Implemented as explode(suffix chain) + left-semi/anti equi-join on
    the domain string — list size only affects join strategy (AQE
    broadcasts small lists), never per-row work. Rows whose URL fails
    to parse have no host: they match nothing, so "block" keeps them
    (route them through normalize_url IS NULL quarantine first) and
    "allow" drops them.
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    match_keys = domain_match_keys(df, domains, url_col, domain_col)
    how = "left_semi" if mode == "allow" else "left_anti"
    return df.join(match_keys, url_col, how)


def domain_match_keys(
    df: DataFrame,
    domains: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """DISTINCT ``url_col`` values whose host dot-suffix chain matches
    any ``domains`` entry — the single implementation of the list-match
    algebra, consumed by :func:`domain_gate` (filter) and
    operators/crawl.py (annotate). Matching runs over distinct URLs (a
    crawl repeats hosts heavily) and the exploded frame never carries
    payload columns; callers semi/anti/left-join the keys back, which
    preserves row multiplicity."""
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    return (
        df.select(url_col)
        .distinct()
        .withColumn("_sfx", F.explode(host_suffixes(host)))
        .join(
            domains.select(
                F.lower(F.col(domain_col)).alias("_sfx")
            ).distinct(),
            "_sfx",
            "left_semi",
        )
        .select(url_col)
        .distinct()
    )


#: one `name=value` attribute as a sequential unit — quoted values are
#: consumed whole, so an `href=` INSIDE another attribute's quoted
#: value (`title="see href=evil"`) can never start a match (the
#: left-to-right scan is already past it), and `data-href`/`xlink:href`
#: are matched under their own full names, not as `href` (the \s
#: anchor; review finding)
_ATTR_UNIT = (
    r"(?is)\s([a-zA-Z0-9:._-]+\s*=\s*"
    r"(?:\"[^\"]*\"|'[^']*'|[^\s\"'>]+))"
)


def extract_links(col: Column | str) -> Column:
    """array<string> of the raw ``href`` values of every rendered
    ``<a>`` tag.

    Non-rendered markup goes first — script/style blocks and HTML
    comments are stripped exactly as :func:`html_to_text` does, so a
    commented-out or script-templated anchor never fabricates a link
    (review finding). Then two-stage like :func:`has_noindex`: extract
    each ``<a …>`` tag as a unit (the ``_ATTRS`` body tolerates '>'
    inside quoted attribute values), tokenize the tag into sequential
    ``name=value`` attribute units, and take the FIRST unit whose name
    is exactly ``href`` (browser semantics) — so another attribute's
    value containing ``href=``, or a ``data-href``/``xlink:href``
    attribute, can neither supply nor displace the real link. Values
    are RAW (relative links, fragments, javascript: pseudo-URLs
    included) — resolution/filtering is the caller's step, normally
    ``normalize_url`` (which yields NULL for anything non-http(s)).
    Empty hrefs are dropped; NULL html → empty array.
    """
    h = _c(col)
    h = F.regexp_replace(
        h, rf"(?is)<(script|style)\b{_ATTRS}>.*?</\1\s*>", " "
    )
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", " ")
    tags = F.regexp_extract_all(h, F.lit(rf"(?is)(<a\b{_ATTRS}>)"), F.lit(1))
    unq = (
        r"(?is)^href\s*=\s*"
        r"(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'>]+))"
    )

    def href_of(tag):
        units = F.regexp_extract_all(tag, F.lit(_ATTR_UNIT), F.lit(1))
        first = F.get(
            F.filter(units, lambda u: u.rlike(r"(?is)^href\s*=")), 0
        )
        return F.coalesce(
            F.nullif(F.regexp_extract(first, unq, 1), F.lit("")),
            F.nullif(F.regexp_extract(first, unq, 2), F.lit("")),
            F.nullif(F.regexp_extract(first, unq, 3), F.lit("")),
        )

    vals = F.transform(tags, href_of)
    return F.coalesce(
        F.filter(vals, lambda v: v.isNotNull()),
        F.expr("CAST(array() AS array<string>)"),
    )
