"""HTML table extraction — structured data from ``<table>`` markup,
the third extraction surface walked by the SAME byte-offset tokenizer
as the content, link, and head-meta paths (reference analogue: the
content path's block taxonomy has a `table` block type; this surface
materializes the cells).

Emits one row per cell:

    (url, table_idx, row_idx, col_idx, cell_text, is_header)

Semantics (deliberately explicit — the oracle CASE-reconstructs them):

- ``table_idx``: document-order index of each TOP-LEVEL table; a
  nested ``<table>`` inside a cell contributes its text to that cell
  and is not separately indexed (depth-tracked, never confuses the
  outer grid).
- ``row_idx`` / ``col_idx``: 0-based per table / per row, advanced by
  ``<tr>`` and ``<td>/<th>`` starts at table depth 1.  Recovery: a new
  ``<td>/<th>/<tr>`` implicitly closes an unclosed cell (the
  tokenizer-recovery convention the link path uses for ``<a>``).
- ``cell_text``: entity-unescaped text between the cell's bounds,
  whitespace-collapsed and stripped.
- ``is_header``: the cell's own tag is ``<th>``.

Distributed shape: one streaming ``map_batches`` flat explode — Arrow
in / Arrow out, flat builders, no shuffle.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .html_tokenizer import tokenize
from .segment import unescape

_WS_RE = re.compile(r"\s+")

TABLES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("table_idx", pa.int64()),
    ("row_idx", pa.int64()),
    ("col_idx", pa.int64()),
    ("cell_text", pa.string()),
    ("is_header", pa.bool_()),
])


def extract_tables_one(html: bytes) -> list[tuple[int, int, int, str, bool]]:
    """→ ordered [(table_idx, row_idx, col_idx, cell_text, is_header)].
    Pure function (oracle-shared)."""
    out: list[tuple[int, int, int, str, bool]] = []
    depth = 0            # <table> nesting depth
    table_i = -1
    row_i = -1
    col_i = -1
    cell_parts: "list[str] | None" = None
    cell_header = False

    def close_cell() -> None:
        nonlocal cell_parts
        if cell_parts is not None and row_i >= 0 and col_i >= 0:
            text = _WS_RE.sub(" ", "".join(cell_parts)).strip()
            out.append((table_i, row_i, col_i, text, cell_header))
        cell_parts = None

    for tok in tokenize(html):
        kind = tok[0]
        if kind == "text":
            if cell_parts is not None:
                cell_parts.append(
                    unescape(html[tok[1]:tok[2]].decode("utf-8", "replace")))
        elif kind == "start":
            tag = tok[3]
            if tag == "table":
                if depth == 0:
                    table_i += 1
                    row_i = -1
                    col_i = -1
                depth += 1
            elif depth == 1:
                if tag == "tr":
                    close_cell()
                    row_i += 1
                    col_i = -1
                elif tag in ("td", "th"):
                    close_cell()
                    col_i += 1
                    cell_parts = []
                    cell_header = tag == "th"
        elif kind == "end":
            tag = tok[3]
            if tag == "table":
                if depth == 1:
                    close_cell()
                    row_i = -1
                    col_i = -1
                if depth > 0:
                    depth -= 1
            elif depth == 1 and tag in ("td", "th"):
                close_cell()
    close_cell()  # unterminated cell runs to EOF
    return out


def tables_batch(batch: pa.Table) -> pa.Table:
    """map_batches flat explode: pages rows → cell rows."""
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    c_url: list[str] = []
    c_t: list[int] = []
    c_r: list[int] = []
    c_c: list[int] = []
    c_txt: list[str] = []
    c_h: list[bool] = []
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        for t, r, c, txt, hdr in extract_tables_one(html):
            c_url.append(url)
            c_t.append(t)
            c_r.append(r)
            c_c.append(c)
            c_txt.append(txt)
            c_h.append(hdr)
    return pa.Table.from_arrays(
        [pa.array(c_url, pa.string()), pa.array(c_t, pa.int64()),
         pa.array(c_r, pa.int64()), pa.array(c_c, pa.int64()),
         pa.array(c_txt, pa.string()), pa.array(c_h, pa.bool_())],
        schema=TABLES_SCHEMA)


def extract_tables(ds):
    """pages Dataset → cell rows Dataset (streaming flat explode)."""
    return ds.map_batches(tables_batch, batch_format="pyarrow")


HEADINGS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("rank", pa.int64()),
    ("level", pa.int64()),
    ("heading", pa.string()),
])

_H_TAGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


def extract_headings_one(html: bytes) -> list[tuple[int, str]]:
    """→ ordered [(level, text)] for every ``<h1>``–``<h6>`` — the
    document outline (sectioning / quality signal).  Text is the
    entity-unescaped, whitespace-collapsed content up to the matching
    close; a new heading start implicitly closes an open one and an
    unterminated heading runs to EOF (the shared recovery convention).
    Pure function (oracle-shared)."""
    out: list[tuple[int, str]] = []
    level = 0
    parts: list[str] = []

    def close() -> None:
        nonlocal level, parts
        if level:
            out.append((level, _WS_RE.sub(" ", "".join(parts)).strip()))
        level = 0
        parts = []

    for tok in tokenize(html):
        kind = tok[0]
        if kind == "text":
            if level:
                parts.append(
                    unescape(html[tok[1]:tok[2]].decode("utf-8", "replace")))
        elif kind == "start":
            lv = _H_TAGS.get(tok[3])
            if lv is not None:
                close()
                if not tok[5]:  # self-closing <hN/> → empty heading
                    level = lv
                else:
                    out.append((lv, ""))
        elif kind == "end" and _H_TAGS.get(tok[3]) == level:
            close()
    close()
    return out


def headings_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    c_url, c_rank, c_lv, c_tx = [], [], [], []
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        for i, (lv, tx) in enumerate(extract_headings_one(html)):
            c_url.append(url)
            c_rank.append(i)
            c_lv.append(lv)
            c_tx.append(tx)
    return pa.Table.from_arrays(
        [pa.array(c_url, pa.string()), pa.array(c_rank, pa.int64()),
         pa.array(c_lv, pa.int64()), pa.array(c_tx, pa.string())],
        schema=HEADINGS_SCHEMA)


def extract_headings(ds):
    """pages Dataset → heading rows (streaming flat explode)."""
    return ds.map_batches(headings_batch, batch_format="pyarrow")


IMAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("rank", pa.int64()),
    ("src", pa.string()),
    ("alt", pa.string()),
])


def extract_images_one(html: bytes, base_url: str = ""
                       ) -> list[tuple[str, str]]:
    """→ ordered [(src, alt)] for every ``<img src=...>`` — the
    image-URL harvest a multimodal pipeline runs before fetch/decode
    (the media tier's crawl-side complement).  ``src`` resolved
    against the page url (honoring the first ``<base href>``, the
    link-path rule); images without ``src`` are skipped; ``alt``
    defaults to ''.  Pure function (oracle-shared)."""
    from urllib.parse import urljoin

    from .html_tokenizer import parse_attrs

    out: list[tuple[str, str]] = []
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
        elif tag == "img":
            attrs = parse_attrs(tok[4])
            src = attrs.get("src")
            if src:
                out.append((urljoin(base, src) if base else src,
                            unescape(attrs.get("alt", ""))))
    return out


def images_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    c_url, c_rank, c_src, c_alt = [], [], [], []
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        for i, (src, alt) in enumerate(extract_images_one(html, url)):
            c_url.append(url)
            c_rank.append(i)
            c_src.append(src)
            c_alt.append(alt)
    return pa.Table.from_arrays(
        [pa.array(c_url, pa.string()), pa.array(c_rank, pa.int64()),
         pa.array(c_src, pa.string()), pa.array(c_alt, pa.string())],
        schema=IMAGES_SCHEMA)


def extract_images(ds):
    """pages Dataset → image-reference rows (streaming flat explode)."""
    return ds.map_batches(images_batch, batch_format="pyarrow")


LISTS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("list_idx", pa.int64()),
    ("item_idx", pa.int64()),
    ("depth", pa.int64()),
    ("ordered", pa.bool_()),
    ("item_text", pa.string()),
])

_LIST_TAGS = {"ul": False, "ol": True}


def extract_lists_one(html: bytes) -> list[tuple[int, int, int, bool, str]]:
    """→ ordered [(list_idx, item_idx, depth, ordered, item_text)] for
    every ``<li>`` — the sixth extraction surface (FAQ/spec/nav list
    mining) walked by the shared byte-offset tokenizer.

    - ``list_idx``: document-order index of the TOP-LEVEL ``<ul>/<ol>``
      the item belongs to (nested lists share their outer list's idx);
    - ``item_idx``: start-order sequence of the item within that
      top-level list (nested items counted in sequence);
    - ``depth``: list-nesting depth (1 = item of a top-level list);
    - ``ordered``: the item's OWN list tag is ``<ol>``;
    - ``item_text``: unescaped, whitespace-collapsed text from the item
      start up to its close OR the first nested list start (so nested
      items' text is never double-counted).  Recovery: a new ``<li>``
      at the same depth or the list's end implicitly closes an open
      item; an unterminated item runs to EOF (shared convention).
    """
    rows: list[tuple[int, int, int, bool, str]] = []
    stack: list[bool] = []           # open list tags (ordered?)
    items: list[list] = []           # open items: [idx, depth, ord, parts]
    list_count = 0
    cur_list = -1
    item_seq = 0

    def close_item() -> None:
        idx, depth, ordd, parts, lidx, _ = items.pop()
        rows.append((lidx, idx, depth, ordd,
                     _WS_RE.sub(" ", "".join(parts)).strip()))

    for tok in tokenize(html):
        kind = tok[0]
        if kind == "text":
            if items and items[-1][5]:
                items[-1][3].append(
                    unescape(html[tok[1]:tok[2]].decode("utf-8", "replace")))
        elif kind == "start":
            tag = tok[3]
            if tag in _LIST_TAGS:
                if items:
                    items[-1][5] = False  # text stops at nested list
                if not stack:
                    cur_list = list_count
                    list_count += 1
                    item_seq = 0
                if not tok[5]:
                    stack.append(_LIST_TAGS[tag])
            elif tag == "li" and stack:
                while items and items[-1][1] >= len(stack):
                    close_item()
                items.append([item_seq, len(stack), stack[-1], [],
                              cur_list, True])
                item_seq += 1
                if tok[5]:  # self-closing <li/> → empty item
                    close_item()
        elif kind == "end":
            tag = tok[3]
            if tag == "li":
                if items and items[-1][1] == len(stack):
                    close_item()
            elif tag in _LIST_TAGS and stack:
                while items and items[-1][1] >= len(stack):
                    close_item()
                stack.pop()
    while items:
        close_item()
    rows.sort(key=lambda r: (r[0], r[1]))
    return rows


def lists_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    c_url, c_li, c_it, c_dp, c_or, c_tx = [], [], [], [], [], []
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        for li, it, dp, od, tx in extract_lists_one(html):
            c_url.append(url)
            c_li.append(li)
            c_it.append(it)
            c_dp.append(dp)
            c_or.append(od)
            c_tx.append(tx)
    return pa.Table.from_arrays(
        [pa.array(c_url, pa.string()), pa.array(c_li, pa.int64()),
         pa.array(c_it, pa.int64()), pa.array(c_dp, pa.int64()),
         pa.array(c_or, pa.bool_()), pa.array(c_tx, pa.string())],
        schema=LISTS_SCHEMA)


def extract_lists(ds):
    """pages Dataset → list-item rows (streaming flat explode)."""
    return ds.map_batches(lists_batch, batch_format="pyarrow")


CODE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("rank", pa.int64()),
    ("container", pa.string()),
    ("lang", pa.string()),
    ("code_text", pa.string()),
])


def extract_code_one(html: bytes) -> list[tuple[str, str, str]]:
    """→ ordered [(container, lang, code_text)] — the code-block
    harvest (``<pre>`` blocks and inline ``<code>`` outside pre), the
    seventh tokenizer-walk surface: code is the one web payload where
    whitespace is load-bearing, so text is NOT whitespace-collapsed
    (unescape only, concatenated across nested tags).

    - ``container``: 'pre' for ``<pre>`` blocks (a nested ``<code>``
      contributes its text to the pre, never a separate row), 'code'
      for inline code outside any pre;
    - ``lang``: the ``language-*`` class-token suffix from the pre tag
      or its first nested ``<code>`` (the pre's own wins), '' if none;
    - recovery: an unterminated block runs to EOF; a new ``<pre>``
      start implicitly closes an open inline ``<code>``."""
    from .html_tokenizer import parse_attrs

    def lang_of(attr_bytes) -> str:
        cls = parse_attrs(attr_bytes).get("class", "")
        for tok_ in cls.split():
            if tok_.startswith("language-"):
                return tok_[len("language-"):]
        return ""

    out: list[tuple[str, str, str]] = []
    mode = ""          # "" | "pre" | "code"
    depth = 0          # pre nesting depth (nested pre folds into outer)
    lang = ""
    lang_locked = False
    parts: list[str] = []

    def close() -> None:
        nonlocal mode, lang, lang_locked, parts, depth
        if mode:
            out.append((mode, lang, "".join(parts)))
        mode = ""
        depth = 0
        lang = ""
        lang_locked = False
        parts = []

    for tok in tokenize(html):
        kind = tok[0]
        if kind == "text":
            if mode:
                parts.append(
                    unescape(html[tok[1]:tok[2]].decode("utf-8", "replace")))
        elif kind == "start":
            tag = tok[3]
            if tag == "pre":
                if mode == "pre":
                    depth += 1      # nested pre folds into the outer
                    continue
                close()             # implicitly closes inline code
                if tok[5]:
                    out.append(("pre", lang_of(tok[4]), ""))
                else:
                    mode = "pre"
                    depth = 1
                    lang = lang_of(tok[4])
                    lang_locked = bool(lang)
            elif tag == "code":
                if mode == "pre":
                    if not lang_locked:
                        lg = lang_of(tok[4])
                        if lg:
                            lang = lg
                            lang_locked = True
                elif mode != "code":
                    if tok[5]:
                        out.append(("code", lang_of(tok[4]), ""))
                    else:
                        mode = "code"
                        lang = lang_of(tok[4])
                        lang_locked = bool(lang)
        elif kind == "end":
            tag = tok[3]
            if tag == "pre" and mode == "pre":
                depth -= 1
                if depth == 0:
                    close()
            elif tag == "code" and mode == "code":
                close()
    close()
    return out


def code_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    c_url, c_rk, c_ct, c_lg, c_tx = [], [], [], [], []
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        for i, (ct, lg, tx) in enumerate(extract_code_one(html)):
            c_url.append(url)
            c_rk.append(i)
            c_ct.append(ct)
            c_lg.append(lg)
            c_tx.append(tx)
    return pa.Table.from_arrays(
        [pa.array(c_url, pa.string()), pa.array(c_rk, pa.int64()),
         pa.array(c_ct, pa.string()), pa.array(c_lg, pa.string()),
         pa.array(c_tx, pa.string())],
        schema=CODE_SCHEMA)


def extract_code_blocks(ds):
    """pages Dataset → code-block rows (streaming flat explode)."""
    return ds.map_batches(code_batch, batch_format="pyarrow")


FEED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("entry_idx", pa.int64()),
    ("kind", pa.string()),
    ("title", pa.string()),
    ("link", pa.string()),
    ("ts_raw", pa.string()),
])


def parse_feed(body: bytes) -> "list[tuple[str, str, str, str]]":
    """→ ordered [(kind, title, link, ts_raw)] from an RSS 2.0 or Atom
    feed body — the EIGHTH surface walked by the shared tokenizer
    (reference parity anchor: one recognition result projected into
    many formats, src/api.rs:303-548; here one tokenizer serves HTML,
    sitemap and feed XML alike).  kind ∈ {'rss', 'atom'} per entry
    (``<item>`` vs ``<entry>`` container); RSS links are ``<link>``
    text, Atom links the FIRST ``<link href>`` attribute;
    ``ts_raw`` is the raw declared ``<pubDate>``/``<updated>`` string
    ('' when absent).  Titles are entity-unescaped and stripped.
    Never raises; unterminated entries recover at the next entry or
    EOF (channel/feed-level title/link rows are NOT emitted).
    ``<title>`` follows the shared tokenizer's HTML raw-text rule:
    its content runs to the matching close tag, markup included — so
    an unterminated title absorbs what follows (documented contract,
    exercised in tests).
    """
    from .html_tokenizer import parse_attrs

    out: list[tuple[str, str, str, str]] = []
    kind = ""
    field = ""
    title_parts: list[str] = []
    link_parts: list[str] = []
    ts_parts: list[str] = []
    atom_href = ""

    def close_entry() -> None:
        nonlocal title_parts, link_parts, ts_parts, atom_href
        link = atom_href or "".join(link_parts).strip()
        if kind:
            out.append((kind,
                        unescape("".join(title_parts)).strip(),
                        link,
                        "".join(ts_parts).strip()))
        title_parts, link_parts, ts_parts = [], [], []
        atom_href = ""

    for tok in tokenize(body):
        t = tok[0]
        if t == "start":
            tag = tok[3]
            if tag in ("item", "entry"):
                if kind:
                    close_entry()
                kind = "rss" if tag == "item" else "atom"
            elif kind and tag in ("title", "pubdate", "updated"):
                field = tag
            elif kind and tag == "link":
                if kind == "atom":
                    href = parse_attrs(tok[4]).get("href", "")
                    if href and not atom_href:
                        atom_href = href
                else:
                    field = "link"
        elif t == "end":
            tag = tok[3]
            if tag in ("title", "pubdate", "updated", "link"):
                field = ""
            elif tag in ("item", "entry") and kind:
                close_entry()
                kind = ""
        elif t == "text" and field and kind:
            raw = body[tok[1]:tok[2]].decode("utf-8", "replace")
            if field == "title":
                title_parts.append(raw)
            elif field == "link":
                link_parts.append(raw)
            else:
                ts_parts.append(raw)
    if kind:
        close_entry()
    return out


def feed_batch(batch: pa.Table) -> pa.Table:
    urls, idxs, kinds, titles, links, tss = [], [], [], [], [], []
    for url, body in zip(batch["url"].to_pylist(),
                         batch["html"].to_pylist()):
        if not body:
            continue
        for i, (k, t, l, ts) in enumerate(parse_feed(body)):
            urls.append(url)
            idxs.append(i)
            kinds.append(k)
            titles.append(t)
            links.append(l)
            tss.append(ts)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "entry_idx": pa.array(idxs, pa.int64()),
                     "kind": pa.array(kinds, pa.string()),
                     "title": pa.array(titles, pa.string()),
                     "link": pa.array(links, pa.string()),
                     "ts_raw": pa.array(tss, pa.string())})


def extract_feed_entries(ds):
    """feed-body Dataset (url, html) → per-entry rows (streaming flat
    explode, one tokenizer pass per body)."""
    return ds.map_batches(feed_batch, batch_format="pyarrow")


MEDIA_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("rank", pa.int64()),
    ("media_tag", pa.string()),
    ("src", pa.string()),
    ("mime_type", pa.string()),
    ("poster", pa.string()),
])


def extract_media_one(html: bytes, base_url: str = ""
                      ) -> "list[tuple[str, str, str, str]]":
    """→ ordered [(media_tag, src, mime_type, poster)] for every
    ``<video>``/``<audio>`` src and every ``<source>`` INSIDE one —
    the audio/video crawl harvest (the `extract_images_one` sibling
    feeding the media near-dup tier).  ``src`` and ``poster`` resolve
    against the page url honoring the first ``<base href>`` (same
    link-path rule); a ``<source>`` row reports its PARENT element as
    ``media_tag`` and carries its declared ``type`` ('' when absent);
    src-less ``<video>/<audio>`` emit nothing themselves but still
    scope their sources; ``<source>`` outside a media element is
    skipped.  Pure function (oracle-shared), never raises."""
    from urllib.parse import urljoin

    from .html_tokenizer import parse_attrs

    out: list[tuple[str, str, str, str]] = []
    base = base_url
    base_seen = False
    in_media = ""          # 'video' | 'audio' | ''
    media_poster = ""
    for tok in tokenize(html):
        t = tok[0]
        if t == "end":
            if tok[3] in ("video", "audio"):
                in_media, media_poster = "", ""
            continue
        if t != "start":
            continue
        tag = tok[3]
        if tag == "base" and not base_seen:
            b = parse_attrs(tok[4]).get("href")
            if b:
                base = urljoin(base_url, b) if base_url else b
                base_seen = True
        elif tag in ("video", "audio"):
            attrs = parse_attrs(tok[4])
            poster = attrs.get("poster", "")
            if poster:
                poster = urljoin(base, poster) if base else poster
            src = attrs.get("src")
            if src:
                out.append((tag, urljoin(base, src) if base else src,
                            attrs.get("type", ""), poster))
            if not tok[5]:                 # not self-closing: scope
                in_media, media_poster = tag, poster
        elif tag == "source" and in_media:
            attrs = parse_attrs(tok[4])
            src = attrs.get("src")
            if src:
                out.append((in_media,
                            urljoin(base, src) if base else src,
                            attrs.get("type", ""), media_poster))
    return out


def media_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    cols: "list[list]" = [[], [], [], [], [], []]
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        for i, (tag, src, mt, poster) in enumerate(
                extract_media_one(html, url)):
            cols[0].append(url)
            cols[1].append(i)
            cols[2].append(tag)
            cols[3].append(src)
            cols[4].append(mt)
            cols[5].append(poster)
    return pa.Table.from_arrays(
        [pa.array(cols[0], pa.string()), pa.array(cols[1], pa.int64()),
         pa.array(cols[2], pa.string()), pa.array(cols[3], pa.string()),
         pa.array(cols[4], pa.string()), pa.array(cols[5], pa.string())],
        schema=MEDIA_SCHEMA)


def extract_media(ds):
    """pages Dataset → audio/video reference rows (streaming flat
    explode, one tokenizer pass per page)."""
    return ds.map_batches(media_batch, batch_format="pyarrow")


FORMS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("form_idx", pa.int64()),
    ("field_idx", pa.int64()),
    ("action", pa.string()),
    ("method", pa.string()),
    ("field_tag", pa.string()),
    ("field_name", pa.string()),
    ("field_type", pa.string()),
    ("required", pa.bool_()),
])

_FIELD_TAGS = ("input", "select", "textarea", "button")


def extract_forms_one(html: bytes, page_url: str = ""
                      ) -> "list[tuple[int, int, str, str, str, str, str, bool]]":
    """→ ordered [(form_idx, field_idx, action, method, field_tag,
    field_name, field_type, required)] for every form field — the
    interactivity surface a crawler uses to skip search/login pages
    and a quality filter uses as a boilerplate signal.

    Semantics (oracle-shared):

    - ``form_idx``: document-order index of each ``<form>``; a new
      ``<form>`` start implicitly closes an open one (browsers ignore
      nested form tags — the shared recovery convention).
    - ``action``: resolved against the page url honoring the first
      ``<base href>`` (the link-path rule); a form with NO action
      attribute submits to the page url itself (HTML spec), not the
      base.
    - ``method``: lowercased, defaulting to ``get``.
    - fields are ``<input>/<select>/<textarea>/<button>`` starts inside
      a form, 0-indexed per form; ``field_type`` is the lowercased
      ``type`` attribute for ``<input>`` (default ``text``), '' for
      the other tags; ``required`` is the boolean attribute.
    Pure function (oracle-shared)."""
    from urllib.parse import urljoin

    from .html_tokenizer import parse_attrs

    out: "list[tuple[int, int, str, str, str, str, str, bool]]" = []
    base = page_url
    base_seen = False
    form_i = -1
    in_form = False
    action = ""
    method = "get"
    field_i = 0
    for tok in tokenize(html):
        if tok[0] == "end":
            if tok[3] == "form":
                in_form = False
            continue
        if tok[0] != "start":
            continue
        tag = tok[3]
        if tag == "base" and not base_seen:
            b = parse_attrs(tok[4]).get("href")
            if b:
                base = urljoin(page_url, b) if page_url else b
                base_seen = True
        elif tag == "form":
            attrs = parse_attrs(tok[4])
            form_i += 1
            in_form = not tok[5]  # self-closing <form/> holds no fields
            a = attrs.get("action")
            if a:
                action = urljoin(base, a) if base else a
            else:
                action = page_url
            method = attrs.get("method", "get").lower() or "get"
            field_i = 0
        elif in_form and tag in _FIELD_TAGS:
            attrs = parse_attrs(tok[4])
            ftype = attrs.get("type", "text").lower() if tag == "input" else ""
            out.append((form_i, field_i, action, method, tag,
                        attrs.get("name", ""), ftype, "required" in attrs))
            field_i += 1
    return out


def forms_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    cols: "list[list]" = [[], [], [], [], [], [], [], [], []]
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        for row in extract_forms_one(html, url):
            cols[0].append(url)
            for k, v in enumerate(row):
                cols[k + 1].append(v)
    return pa.Table.from_arrays(
        [pa.array(cols[0], pa.string()), pa.array(cols[1], pa.int64()),
         pa.array(cols[2], pa.int64()), pa.array(cols[3], pa.string()),
         pa.array(cols[4], pa.string()), pa.array(cols[5], pa.string()),
         pa.array(cols[6], pa.string()), pa.array(cols[7], pa.string()),
         pa.array(cols[8], pa.bool_())],
        schema=FORMS_SCHEMA)


def extract_forms(ds):
    """pages Dataset → form-field rows (streaming flat explode, one
    tokenizer pass per page)."""
    return ds.map_batches(forms_batch, batch_format="pyarrow")
