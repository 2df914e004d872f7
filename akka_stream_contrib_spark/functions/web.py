"""URL analysis for web-corpus curation.

The front half of a Common-Crawl-style pipeline keys everything on the URL:
host extraction feeds per-domain caps (`corpus.domain_cap`), registered
domains feed source mixing, and normalized URLs are the exact-dedup key for
re-crawls. All three are pure column expressions — `parse_url` and regexps
run inside whole-stage codegen, zero shuffles over any corpus size; the
downstream groupBys are the only exchanges.

Reference anchor: none (LLM/web-pipeline extension, same family as
`corpus.domain_cap` / `text.normalize_text`).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_url_parts(url_col: str = "url") -> Callable[[DataFrame], DataFrame]:
    """Decompose ``url_col`` into ``scheme``, ``host``, ``path``,
    ``query_string`` columns (JVM ``parse_url`` — NULL per part when the
    URL is malformed or the part is absent, which is the quarantine
    signal: ``filter(host IS NULL)`` is the bad-URL side). Hosts are
    lowercased (DNS is case-insensitive); schemes likewise."""

    def _apply(df: DataFrame) -> DataFrame:
        clash = sorted({"scheme", "host", "path", "query_string",
                        "query_params"} & set(df.columns))
        if clash:
            # same loud-contract rule as stream_interval_join: a crawl
            # frame often already carries a `host` (the server that served
            # the fetch) — silently replacing it would corrupt downstream
            # per-host aggregation
            raise ValueError(
                f"with_url_parts would overwrite existing column(s) "
                f"{clash} — rename them first")
        u = F.col(url_col)
        # try_parse_url, not parse_url: ANSI parse_url RAISES on the first
        # malformed URL — a 100 TB crawl always contains one, and the
        # contract here is NULL-parts-as-quarantine, not a dead job
        q = F.try_parse_url(u, F.lit("QUERY"))
        return df.withColumns({
            "scheme": F.lower(F.try_parse_url(u, F.lit("PROTOCOL"))),
            "host": F.lower(F.try_parse_url(u, F.lit("HOST"))),
            "path": F.try_parse_url(u, F.lit("PATH")),
            "query_string": q,
            # parsed key->value map for tracking-param analysis
            # (map_filter(query_params, (k, v) -> NOT k LIKE 'utm_%') is
            # the canonical strip); NULL when the URL has no query
            "query_params": F.str_to_map(q, F.lit("&"), F.lit("=")),
        })

    return _apply


def registered_domain(host: Column) -> Column:
    """The last two labels of ``host`` (``a.b.example.com`` →
    ``example.com``) — the per-site aggregation key for domain caps and
    source mixing. Documented simplification: a real public-suffix list
    (``co.uk`` etc.) is a data file, deliberately out of scope under the
    no-third-party constraint; swap the regexp for a PSL lookup table
    broadcast-joined on the suffix when one is available. IP hosts (all
    numeric labels) pass through whole — their "last two labels" are not a
    site. Single-label hosts (``localhost``) also pass through whole."""
    return F.when(
        host.rlike(r"^[0-9.]+$") | ~host.contains("."), host
    ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def normalize_url(url: Column) -> Column:
    """Canonical URL for exact re-crawl dedup: lowercase scheme+host, strip
    the fragment, drop a trailing ``/`` on a bare host. Pure regexp chain —
    the same three rewrites replay in any engine. Conservative by design:
    query strings are preserved (order rewriting changes semantics on some
    sites), default ports are preserved (:80 vs bare is a crawl-source
    artifact better handled at ingest)."""
    # strip #fragment first so host-case rewriting can't touch it
    no_frag = F.regexp_replace(url, r"#.*$", "")
    # lowercase scheme://host (leave path/query case intact)
    lowered = F.concat(
        F.lower(F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(no_frag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""))
    # bare-host trailing slash: "https://x.com/" == "https://x.com"
    return F.regexp_replace(lowered, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", "$1")


def html_text_extract(id_col: str = "doc_id", html_col: str = "html",
                      ) -> Callable[[DataFrame], DataFrame]:
    """HTML → text extraction for a crawl front-end: drop <script>/<style>
    blocks and comments, turn block-level closers into line breaks, strip
    the remaining tags, decode the six ubiquitous entities, collapse
    whitespace. Emits (doc_id, text, n_chars, link_density) where
    ``link_density`` = extracted chars inside <a> anchors / total extracted
    chars — THE boilerplate discriminator (nav/footer pages score near 1,
    content pages low; jusText/CCNet both gate on it).

    Pure regexp/codegen chain — zero shuffles, scales with scan bandwidth.
    Deliberately regex-grade (documented): a DOM parser is a third-party
    dependency; for corpus CURATION the lossy extraction is fed to quality
    gates, not rendered. Same regexes run under Java regex and RE2 (no
    lookbehind/backrefs; (?s) dotall only).
    """

    def _apply(df: DataFrame) -> DataFrame:
        h = F.col(html_col)
        # script/style/comment blocks go first so their text never leaks
        t = F.regexp_replace(h, r"(?is)<script[^>]*>.*?</script>", " ")
        t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
        t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
        # anchor text, measured on the SAME cleaned stream as the
        # denominator (style blocks stripped too) and normalized the same
        # way (inner tags out, entities decoded, whitespace collapsed) —
        # an inconsistent numerator made '&amp;'-bearing nav pages score
        # link_density > 1 (r9 review fix)
        anchors = F.regexp_extract_all(
            t, F.lit(r"(?is)<a[^>]*>(.*?)</a>"), 1)

        def anchor_len(c):
            c = F.regexp_replace(c, r"<[^>]*>", " ")
            for ent, ch in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                            ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&")):
                c = F.replace(c, F.lit(ent), F.lit(ch))
            c = F.regexp_replace(c, r"[ \t\n\x0b\x0c\r]+", " ")
            return F.length(F.trim(c))

        anchor_chars = F.aggregate(
            F.transform(anchors, anchor_len),
            F.lit(0), lambda acc, x: acc + x)

        def strip_tags(c):
            c = F.regexp_replace(c, r"(?i)<(br|/p|/div|/h[1-6]|/li|/tr)[^>]*>",
                                 "\n")
            c = F.regexp_replace(c, r"<[^>]*>", " ")
            for ent, ch in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                            ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&")):
                c = F.replace(c, F.lit(ent), F.lit(ch))
            c = F.regexp_replace(c, r"[ \t\x0b\x0c\r]+", " ")
            c = F.regexp_replace(c, r" ?\n ?", "\n")
            c = F.regexp_replace(c, r"\n{2,}", "\n")
            # trim() strips spaces only; block closers at the document edge
            # leave \n that must go too
            c = F.regexp_replace(c, r"^\n+|\n+$", "")
            return F.trim(c)

        text = strip_tags(t)
        n = F.length(text)
        # least(…, 1) caps residual approximation (regex extraction can
        # still over-count pathological nested markup); the contract is
        # density ∈ [0, 1]
        return df.select(
            F.col(id_col).alias("doc_id"),
            text.alias("text"),
            n.cast("bigint").alias("n_chars"),
            (F.round(F.least(
                F.when(n > 0, anchor_chars / n).otherwise(F.lit(0.0)),
                F.lit(1.0)), 6)
             + F.lit(0.0)).alias("link_density"))

    return _apply
