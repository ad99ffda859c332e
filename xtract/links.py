"""Outlink + anchor-text extraction — the crawl-graph surface.

Web-native extension of the extraction engine (the reference has no
link surface to mirror; this follows public crawl practice — WAT-style
link records): walk the SAME byte-offset tokenizer the content path
uses (``html_tokenizer.tokenize``), collect ``<a href>`` targets with
their visible anchor text, resolve relative hrefs against the page url
(RFC 3986 via ``urljoin`` — deterministic), and emit one row per link:

    (url, rank, href, anchor_text, host)

``rank`` is the link's document-order index.  Anchor text is the
whitespace-normalized text between the ``<a>`` and its matching close
(nested inline markup contributes its text; an unterminated anchor
runs to end-of-document — the tokenizer's recovery rules apply).

Distributed shape: one streaming ``map_batches`` flat explode (Arrow
in / Arrow out, flat builders) — no shuffle.  Per-host aggregation is a
single ``groupby(host).count()`` over the slim link rows.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

import pyarrow as pa

from .html_tokenizer import parse_attrs, tokenize
from .segment import unescape

_WS_RE = re.compile(r"\s+")


def extract_links(html: bytes, base_url: str = "") -> list[tuple[str, str]]:
    """→ ordered [(href, anchor_text)] for every ``<a href=...>`` in
    document order.  Pure function of its arguments (oracle-shared)."""
    out: list[tuple[str, str]] = []
    open_href: "str | None" = None
    anchor_parts: list[str] = []
    base = base_url  # first <base href> (resolved against the page
    # url) rebases every link after its position — the HTML rule a
    # crawler needs; later <base> tags are ignored
    base_seen = False

    def close_anchor() -> None:
        nonlocal open_href, anchor_parts
        if open_href is not None:
            text = _WS_RE.sub(" ", "".join(anchor_parts)).strip()
            href = urljoin(base, open_href) if base else open_href
            out.append((href, text))
        open_href = None
        anchor_parts = []

    for tok in tokenize(html):
        kind = tok[0]
        if kind == "text":
            # script/style/xmp/noscript content never reaches here — the
            # tokenizer drops raw-text element bodies except title/textarea
            if open_href is not None:
                anchor_parts.append(
                    unescape(html[tok[1]:tok[2]].decode("utf-8", "replace")))
        elif kind == "start":
            tag = tok[3]
            if tag == "base" and not base_seen:
                b = parse_attrs(tok[4]).get("href")
                if b:
                    base = urljoin(base_url, b) if base_url else b
                    base_seen = True
            elif tag == "a":
                close_anchor()  # HTML forbids nested <a>: implicit close
                href = parse_attrs(tok[4]).get("href")
                if href is not None and not tok[5]:
                    open_href = href
                elif href is not None:  # self-closing <a/> → empty anchor
                    open_href = href
                    close_anchor()
        elif kind == "end":
            if tok[3] == "a":
                close_anchor()
    close_anchor()  # unterminated anchor runs to EOF
    return out


def host_of(url: str) -> str:
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


LINKS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("rank", pa.int32()),
    ("href", pa.string()),
    ("anchor_text", pa.string()),
    ("host", pa.string()),
])


def outlinks_batch(batch: pa.Table) -> pa.Table:
    """map_batches flat explode: pages rows → link rows (flat builders,
    no per-row dicts)."""
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    c_url: list[str] = []
    c_rank: list[int] = []
    c_href: list[str] = []
    c_text: list[str] = []
    c_host: list[str] = []
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        for i, (href, text) in enumerate(extract_links(html, url)):
            c_url.append(url)
            c_rank.append(i)
            c_href.append(href)
            c_text.append(text)
            c_host.append(host_of(href))
    return pa.Table.from_arrays([
        pa.array(c_url, pa.string()), pa.array(c_rank, pa.int32()),
        pa.array(c_href, pa.string()), pa.array(c_text, pa.string()),
        pa.array(c_host, pa.string())], schema=LINKS_SCHEMA)


def extract_outlinks(ds):
    """pages Dataset → links Dataset (streaming flat explode)."""
    return ds.map_batches(outlinks_batch, batch_format="pyarrow")


HEAD_META_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("canonical_url", pa.string()),
    ("robots_noindex", pa.bool_()),
    ("robots_nofollow", pa.bool_()),
    ("refresh_url", pa.string()),
])

_ROBOTS_SPLIT = re.compile(r"[,\s]+")
_REFRESH_URL = re.compile(r"url\s*=\s*([^;,\s]+)", re.IGNORECASE)


def extract_head_meta_one(html: bytes, base_url: str = ""
                          ) -> tuple["str | None", bool, bool, "str | None"]:
    """→ (canonical_url, noindex, nofollow, refresh_url) for one page:
    first ``<link rel=canonical>`` (rel is a case-insensitive space-
    separated token list), union of all ``<meta name=robots>``
    directives, first ``<meta http-equiv=refresh>`` target — hrefs
    resolved against the page url.  Pure function (oracle-shared)."""
    canonical: "str | None" = None
    refresh: "str | None" = None
    noindex = nofollow = False
    base = base_url
    base_seen = False
    for tok in tokenize(html):
        if tok[0] != "start":
            continue
        tag = tok[3]
        if tag == "base" and not base_seen:
            b = parse_attrs(tok[4]).get("href")
            if b:
                base = urljoin(base_url, b) if base_url else b
                base_seen = True
        elif tag == "link":
            attrs = parse_attrs(tok[4])
            rel = (attrs.get("rel") or "").lower().split()
            href = attrs.get("href")
            if canonical is None and "canonical" in rel and href:
                canonical = urljoin(base, href) if base else href
        elif tag == "meta":
            attrs = parse_attrs(tok[4])
            name = (attrs.get("name") or "").strip().lower()
            content = attrs.get("content") or ""
            if name == "robots":
                directives = {d for d in _ROBOTS_SPLIT.split(content.lower())
                              if d}
                noindex = noindex or "noindex" in directives or \
                    "none" in directives
                nofollow = nofollow or "nofollow" in directives or \
                    "none" in directives
            elif (attrs.get("http-equiv") or "").strip().lower() == "refresh":
                m = _REFRESH_URL.search(content)
                if refresh is None and m:
                    target = m.group(1).strip("'\"")
                    refresh = urljoin(base, target) if base \
                        else target
    return canonical, noindex, nofollow, refresh


def head_meta_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    c_can: list["str | None"] = []
    c_noi: list[bool] = []
    c_nof: list[bool] = []
    c_ref: list["str | None"] = []
    keep_urls: list[str] = []
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        can, noi, nof, ref = extract_head_meta_one(html, url)
        keep_urls.append(url)
        c_can.append(can)
        c_noi.append(noi)
        c_nof.append(nof)
        c_ref.append(ref)
    return pa.Table.from_arrays([
        pa.array(keep_urls, pa.string()), pa.array(c_can, pa.string()),
        pa.array(c_noi, pa.bool_()), pa.array(c_nof, pa.bool_()),
        pa.array(c_ref, pa.string())], schema=HEAD_META_SCHEMA)


def extract_head_meta(ds):
    """pages Dataset → per-page head-metadata Dataset: canonical url
    (near-dup collapse key), robots noindex/nofollow (index-exclusion
    gate), meta-refresh target (soft-redirect edge).  Streaming
    ``map_batches`` — no shuffle; the canonical-collapse consumer is
    `ops.urls.canonical_url_dedup`, the index gate is a plain
    ``filter``."""
    return ds.map_batches(head_meta_batch, batch_format="pyarrow")


def host_link_counts(links_ds):
    """links → Dataset(host, n_links): in-link counts per target host
    (one groupby over slim rows — the crawl-frontier prioritization
    aggregate)."""
    from ray.data.aggregate import Count

    return links_ds.groupby("host").aggregate(Count(alias_name="n_links"))


HREFLANG_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("rank", pa.int64()),
    ("hreflang", pa.string()),
    ("href", pa.string()),
])


def extract_hreflang_one(html: bytes, base_url: str = ""
                         ) -> "list[tuple[str, str]]":
    """→ ordered [(hreflang, href)] for every ``<link rel=alternate
    hreflang=..>`` — the language-edition cluster a multilingual
    pipeline uses to collapse translations of one page before
    per-language sampling.  ``rel`` is the case-insensitive token
    list, hreflang codes lowercase (BCP-47 is case-insensitive),
    hrefs resolve against the page url honoring the first ``<base>``.
    Pure function (oracle-shared)."""
    out: "list[tuple[str, str]]" = []
    base = base_url
    base_seen = False
    for tok in tokenize(html):
        if tok[0] != "start":
            continue
        tag = tok[3]
        if tag == "base" and not base_seen:
            b = parse_attrs(tok[4]).get("href")
            if b:
                base = urljoin(base_url, b) if base_url else b
                base_seen = True
        elif tag == "link":
            attrs = parse_attrs(tok[4])
            rel = (attrs.get("rel") or "").lower().split()
            lang = attrs.get("hreflang")
            href = attrs.get("href")
            if "alternate" in rel and lang and href:
                out.append((lang.lower(),
                            urljoin(base, href) if base else href))
    return out


def hreflang_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    c_url, c_rank, c_lang, c_href = [], [], [], []
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        for i, (lang, href) in enumerate(extract_hreflang_one(html, url)):
            c_url.append(url)
            c_rank.append(i)
            c_lang.append(lang)
            c_href.append(href)
    return pa.Table.from_arrays(
        [pa.array(c_url, pa.string()), pa.array(c_rank, pa.int64()),
         pa.array(c_lang, pa.string()), pa.array(c_href, pa.string())],
        schema=HREFLANG_SCHEMA)


def extract_hreflang(ds):
    """pages Dataset → hreflang alternate rows (streaming flat
    explode); the cluster key for translation-aware dedup is the
    row's ``href`` joined back on page url."""
    return ds.map_batches(hreflang_batch, batch_format="pyarrow")


def extract_rel_next_one(html: bytes, base_url: str = "") -> "str | None":
    """→ the first ``<link rel=next>`` target (resolved through the
    base-href rule) or None — the pagination edge used to stitch
    multi-page articles back into one document before training-data
    assembly.  ``rel`` is the case-insensitive token list.  Pure
    function (oracle-shared)."""
    base = base_url
    base_seen = False
    for tok in tokenize(html):
        if tok[0] != "start":
            continue
        tag = tok[3]
        if tag == "base" and not base_seen:
            b = parse_attrs(tok[4]).get("href")
            if b:
                base = urljoin(base_url, b) if base_url else b
                base_seen = True
        elif tag == "link":
            attrs = parse_attrs(tok[4])
            rel = (attrs.get("rel") or "").lower().split()
            href = attrs.get("href")
            if "next" in rel and href:
                return urljoin(base, href) if base else href
    return None


def rel_next_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    c_url, c_next = [], []
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        nxt = extract_rel_next_one(html, url)
        if nxt is not None:
            c_url.append(url)
            c_next.append(nxt)
    return pa.table({"url": pa.array(c_url, pa.string()),
                     "next_url": pa.array(c_next, pa.string())})


def extract_rel_next(ds):
    """pages Dataset → (url, next_url) pagination edges (streaming
    flat harvest; pages without a next link emit no row).  Chain
    assembly is ``ops/graph.resolve_pointer_chains`` over these
    edges."""
    return ds.map_batches(rel_next_batch, batch_format="pyarrow")


OPENGRAPH_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("rank", pa.int64()),
    ("property", pa.string()),
    ("content", pa.string()),
])

_OG_PREFIXES = ("og:", "twitter:", "article:")


def extract_opengraph_one(html: bytes) -> "list[tuple[str, str]]":
    """→ ordered [(property, content)] for every Open-Graph-family
    ``<meta property=..>`` / ``<meta name=twitter:..>`` tag — the
    social-card metadata layer (og:title/og:image/article:author)
    that doubles as a title/date/quality evidence source when body
    markup is poor.  Property names lowercase; the first occurrence
    of a property wins (the de-facto consumer rule); content is
    entity-unescaped; empty/absent content skipped.  Pure function
    (oracle-shared)."""
    out: "list[tuple[str, str]]" = []
    seen: set[str] = set()
    for tok in tokenize(html):
        if tok[0] != "start" or tok[3] != "meta":
            continue
        attrs = parse_attrs(tok[4])
        prop = (attrs.get("property") or attrs.get("name") or "").lower()
        content = attrs.get("content")
        if (prop.startswith(_OG_PREFIXES) and content
                and prop not in seen):
            seen.add(prop)
            out.append((prop, unescape(content)))
    return out


def opengraph_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    c_url, c_rank, c_prop, c_val = [], [], [], []
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        for i, (p, v) in enumerate(extract_opengraph_one(html)):
            c_url.append(url)
            c_rank.append(i)
            c_prop.append(p)
            c_val.append(v)
    return pa.Table.from_arrays(
        [pa.array(c_url, pa.string()), pa.array(c_rank, pa.int64()),
         pa.array(c_prop, pa.string()), pa.array(c_val, pa.string())],
        schema=OPENGRAPH_SCHEMA)


def extract_opengraph(ds):
    """pages Dataset → Open-Graph property rows (streaming flat
    explode)."""
    return ds.map_batches(opengraph_batch, batch_format="pyarrow")
