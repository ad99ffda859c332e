"""Structured-data extraction: OpenGraph meta + JSON-LD payloads.

Web-native extension of the extraction tier (the reference engine has
no metadata surface; this follows public crawl practice — og:* cards
and schema.org JSON-LD are the highest-signal structured fields a
training-data pipeline mines from HTML).  Same single tokenizer walk
as the content path; ``<script type="application/ld+json">`` bodies
are recovered from the raw-text token pair (the tokenizer emits the
script ``start`` token, skips the body, then emits the ``end`` token
whose start offset is the body's end byte) and parsed with the stdlib
JSON parser — invalid payloads are counted out, never raised.

Distributed shape: one streaming ``map_batches`` over pages, one row
per page out — no shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .html_tokenizer import parse_attrs, tokenize

#: og properties surfaced as columns (the stable core of the protocol)
_OG_KEYS = ("title", "description", "type")


def extract_structured_one(html: bytes) -> dict:
    """→ {og_title, og_description, og_type, n_ldjson, ld_types,
    ld_name} for one page.  First og occurrence wins (HTML5 duplicate
    rule); JSON-LD fields come from valid payloads in document order.
    Pure function (oracle-shared)."""
    og: dict[str, str] = {}
    ld_types: list[str] = []
    ld_name: "str | None" = None
    n_ld = 0
    pending_ld_start: "int | None" = None
    for tok in tokenize(html):
        kind = tok[0]
        if pending_ld_start is not None:
            # the token right after a ld+json <script> start is its
            # end token; the body is the bytes between them
            if kind == "end" and tok[3] == "script":
                body = html[pending_ld_start:tok[1]]
                try:
                    data = json.loads(body.decode("utf-8", "replace"))
                except ValueError:
                    data = None
                if isinstance(data, dict):
                    n_ld += 1
                    t = data.get("@type")
                    if isinstance(t, list):
                        t = t[0] if t else None
                    if isinstance(t, str):
                        ld_types.append(t)
                    name = data.get("name")
                    if ld_name is None and isinstance(name, str):
                        ld_name = name
            pending_ld_start = None
            continue
        if kind != "start":
            continue
        tag = tok[3]
        if tag == "meta":
            attrs = parse_attrs(tok[4])
            prop = (attrs.get("property") or "").strip().lower()
            if prop.startswith("og:"):
                key = prop[3:]
                if key in _OG_KEYS and key not in og:
                    og[key] = attrs.get("content") or ""
        elif tag == "script" and not tok[5]:
            attrs = parse_attrs(tok[4])
            if (attrs.get("type") or "").strip().lower() == \
                    "application/ld+json":
                pending_ld_start = tok[2]
    return {"og_title": og.get("title"),
            "og_description": og.get("description"),
            "og_type": og.get("type"),
            "n_ldjson": n_ld,
            "ld_types": ";".join(ld_types),
            "ld_name": ld_name}


STRUCTURED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("og_title", pa.string()),
    ("og_description", pa.string()),
    ("og_type", pa.string()),
    ("n_ldjson", pa.int64()),
    ("ld_types", pa.string()),
    ("ld_name", pa.string()),
])


def structured_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = (batch["html"].to_pylist() if "html" in batch.column_names
             else [None] * len(urls))
    rows = []
    for url, html in zip(urls, htmls):
        if not url or not html:
            continue
        row = extract_structured_one(html)
        row["url"] = url
        rows.append(row)
    return pa.Table.from_pylist(rows, schema=STRUCTURED_SCHEMA)


def extract_structured(ds):
    """pages Dataset → per-page structured-data Dataset (streaming
    flat map, no shuffle)."""
    return ds.map_batches(structured_batch, batch_format="pyarrow")
