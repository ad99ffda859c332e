"""Deterministic synthesis of the ``pages`` input table.

BASELINE.json's ``input_hint`` fixes the input shape:
``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``.  No external data exists in the sandbox, so pages are
synthesized deterministically (seed folded into doc_id arithmetic — no
RNG state) from the driver's ``documents`` table: each document row
renders into one or more page rows of a fixture family (FIXTURES.md),
covering every extraction path: clean articles, boilerplate-heavy
pages, tables, lists, styled runs, malformed markup, bad encodings,
empty rows, PDF payloads, huge pages (skew bucket) and exact-duplicate
urls.

``pages_from_documents`` is a batch transform (Arrow in/Arrow out) used
inside ``map_batches`` — synthesis itself is distributed and streams.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

import pyarrow as pa

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)
EPOCH_US = 1767225600000000  # 2026-01-01T00:00:00Z in microseconds

#: family weights — article-ish pages dominate like a real crawl
FAMILY_WHEEL = (
    "article", "article", "article", "article", "article",
    "boilerplate", "boilerplate", "boilerplate",
    "table", "lists", "styled", "bilingual", "digits",
    "malformed", "badenc", "empty", "pdf", "huge", "dup", "article",
)

TURKISH_SENTENCES = (
    "Merhaba dünya bu bir deneme cümlesidir ve çok güzeldir.",
    "Bugün hava çok güzel ve ben dışarı çıkmak istiyorum şimdi.",
    "İstanbul şehri iki kıtayı birleştiren büyük bir şehirdir.",
)

_NAV = (
    '<nav class="top"><a href="/">Home</a> <a href="/news">News</a> '
    '<a href="/sports">Sports</a> <a href="/tech">Tech</a> '
    '<a href="/about">About</a> <a href="/contact">Contact</a></nav>'
)
_FOOTER = (
    '<footer><a href="/terms">Terms of Service</a> | '
    '<a href="/privacy">Privacy Policy</a> | '
    '<a href="/sitemap">Sitemap</a><br>Copyright 2026 Example Media Group</footer>'
)
_SIDEBAR = (
    '<aside><h3>Related</h3><ul><li><a href="/a1">Story one link</a></li>'
    '<li><a href="/a2">Story two link</a></li><li><a href="/a3">Story three '
    'link</a></li></ul></aside>'
)


def _paragraphs(text: str, repeat: int = 1) -> list[str]:
    """Split a document's word-bag text into deterministic paragraphs of
    ~12 words, optionally repeated (content scaling for bench/huge)."""
    words = text.split()
    if not words:
        return []
    paras = [" ".join(words[i:i + 12]) for i in range(0, len(words), 12)]
    return paras * repeat


def render_article(doc_id: int, paras: list[str], title: str) -> str:
    body = "\n".join(f"<p>{p}.</p>" for p in paras)
    return (
        f"<!DOCTYPE html><html><head><title>{title}</title>"
        f"<meta charset=\"utf-8\"><style>body{{margin:0}}</style>"
        f"<script>var page={doc_id};</script></head><body>{_NAV}"
        f"<main><h1>{title}</h1>\n{body}\n</main>{_FOOTER}</body></html>"
    )


def render_boilerplate(doc_id: int, paras: list[str], title: str) -> str:
    body = "\n".join(f"<p>{p}.</p>" for p in paras[:3])
    linkfarm = "".join(
        f'<div class="promo"><a href="/x{i}">promo link number {i}</a></div>'
        for i in range(8)
    )
    return (
        f"<html><head><title>{title}</title></head><body>{_NAV}{_SIDEBAR}"
        f"{linkfarm}<div id=\"content\">{body}</div>{_SIDEBAR}{linkfarm}"
        f"{_FOOTER}</body></html>"
    )


def render_table(doc_id: int, paras: list[str], title: str) -> str:
    words = (paras[0] if paras else "empty cell data").split()
    rows = "".join(
        "<tr>" + "".join(f"<td>{words[(r * 3 + c) % len(words)]} value {r * 3 + c}</td>"
                         for c in range(3)) + "</tr>"
        for r in range(4)
    )
    rest = "\n".join(f"<p>{p}.</p>" for p in paras[1:4])
    return (
        f"<html><body>{_NAV}<h1>{title}</h1>"
        f"<table><caption>Summary table for page {doc_id}</caption>{rows}</table>"
        f"{rest}{_FOOTER}</body></html>"
    )


def render_lists(doc_id: int, paras: list[str], title: str) -> str:
    items = "".join(f"<li>{p}</li>" for p in paras[:5])
    quote = paras[5] if len(paras) > 5 else "quoted text goes here for emphasis"
    return (
        f"<html><body><h1>{title}</h1><ol>{items}</ol>"
        f"<blockquote>{quote}.</blockquote>"
        f"<p style=\"text-align:center\">{paras[0] if paras else title} centered.</p>"
        f"{_FOOTER}</body></html>"
    )


def render_styled(doc_id: int, paras: list[str], title: str) -> str:
    p0 = paras[0] if paras else "styled words here"
    w = p0.split()
    styled = (
        f"<p>Normal then <b>{w[0]}</b> bold and <em>{w[min(1, len(w) - 1)]}</em> "
        f"italic with <code>{w[min(2, len(w) - 1)]}()</code> code, E=mc<sup>2</sup> "
        f"and H<sub>2</sub>O formulas in running text of this paragraph.</p>"
    )
    heads = "".join(f"<h{i}>Heading level {i} {w[0]}</h{i}>"
                    f"<p>{paras[min(i, len(paras) - 1)]}.</p>" for i in range(2, 5))
    return f"<html><body><h1>{title}</h1>{styled}{heads}</body></html>"


def render_bilingual(doc_id: int, paras: list[str], title: str) -> str:
    mixed = []
    for i, p in enumerate(paras[:6]):
        mixed.append(f"<p>{p}.</p>")
        mixed.append(f"<p>{TURKISH_SENTENCES[i % len(TURKISH_SENTENCES)]}</p>")
    return f"<html><body><h1>{title} - Hello Dünya</h1>{''.join(mixed)}</body></html>"


def render_digits(doc_id: int, paras: list[str], title: str) -> str:
    nums = " ".join(str((doc_id * 7919 + i * 104729) % 100000) for i in range(24))
    return (
        f"<html><body><h1>Readings {doc_id}</h1><p>{nums}</p>"
        f"<p>{nums[::-1]}</p>{_FOOTER}</body></html>"
    )


def render_malformed(doc_id: int, paras: list[str], title: str) -> str:
    p0 = paras[0] if paras else "recovered text content survives here"
    p1 = paras[1] if len(paras) > 1 else "second run of text also survives"
    return (
        f"<html><body><h1>{title}<p>{p0}. <b>unclosed bold {p1}."
        f"</i><p>mismatched {p0} close</div><p>{p1} tail < 5 literal angle"
    )  # unclosed tags, stray </i>, bare '<' — tokenizer recovery paths


def make_pdf(doc_id: int, paras: list[str], compress: bool) -> bytes:
    lines = []
    for i, p in enumerate(paras[:8]):
        esc = p.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        lines.append(f"0 -14 TD ({esc}.) Tj" if i else f"72 720 Td ({esc}.) Tj")
    content = ("BT /F1 12 Tf " + " ".join(lines) + " ET").encode("latin-1")
    if compress:
        body = zlib.compress(content, 6)
        hdr = f"<< /Length {len(body)} /Filter /FlateDecode >>".encode()
    else:
        body = content
        hdr = f"<< /Length {len(body)} >>".encode()
    return (
        b"%PDF-1.4\n1 0 obj\n" + hdr + b"\nstream\n" + body +
        b"\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )


def synth_page_rows(doc_id: int, text: str, lang: str, repeat: int = 1,
                    variant: int = 0) -> list[dict]:
    """One document (+variant salt) → one or two page rows (dup family
    emits the same url twice).  Pure function of its arguments."""
    vid = doc_id * 997 + variant
    # Knuth multiplicative hash → independent decision bits (no RNG state,
    # fully determined by doc_id+variant)
    salt = (doc_id * 2654435761 + variant * 40503 + 42) & 0xFFFFFFFF
    salt ^= salt >> 13
    family = FAMILY_WHEEL[salt % len(FAMILY_WHEEL)]
    title = f"Document {doc_id} variant {variant}"
    url = f"https://{family}.example.org/p/{doc_id}/{variant}"
    ts = EPOCH_US + vid * 1_000_000
    paras = _paragraphs(text, repeat)
    html: bytes | None
    crawl_text: str | None = text
    if family == "article":
        html = render_article(vid, paras, title).encode()
    elif family == "boilerplate":
        html = render_boilerplate(vid, paras, title).encode()
    elif family == "table":
        html = render_table(vid, paras, title).encode()
    elif family == "lists":
        html = render_lists(vid, paras, title).encode()
    elif family == "styled":
        html = render_styled(vid, paras, title).encode()
    elif family == "bilingual":
        html = render_bilingual(vid, paras, title).encode()
    elif family == "digits":
        html = render_digits(vid, paras, title).encode()
    elif family == "malformed":
        html = render_malformed(vid, paras, title).encode()
    elif family == "badenc":
        if (salt >> 10) % 2:
            # declared legacy charset → transcode path (S3 sniff)
            page = render_article(vid, paras + ["café résumé naïve détail"],
                                  title).replace(
                'charset="utf-8"', 'charset="iso-8859-1"')
            html = page.encode("latin-1")
        else:
            html = render_article(vid, paras, title).encode()
            html = html[:100] + b"\xff\xfe\xfa" + html[100:]  # invalid UTF-8
    elif family == "empty":
        html = None if (salt >> 7) % 2 == 0 else b""
        crawl_text = text if (salt >> 8) % 4 < 2 else None
    elif family == "pdf":
        html = make_pdf(vid, paras, compress=((salt >> 9) % 3 == 0))
    elif family == "huge":
        html = render_article(vid, paras * 40, title).encode()  # skew bucket
    else:  # dup
        html = render_article(vid, paras, title).encode()
    row = {"url": url, "warc_ts": ts, "html": html, "text": crawl_text,
           "lang": lang if (salt >> 11) % 5 else "xx"}  # some wrong hints
    return [row, dict(row)] if family == "dup" else [row]


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def pages_batch_from_documents(batch: pa.Table, repeat: int = 1,
                               expand: int = 1) -> pa.Table:
    """map_batches transform: documents rows → pages rows (×expand
    variants per doc).  Arrow in / Arrow out."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    rows: list[dict] = []
    for d, t, l in zip(doc_ids, texts, langs):
        for v in range(expand):
            rows.extend(synth_page_rows(int(d), t or "", l or "", repeat, v))
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def synth_pages_dataset(sf_dir: str, repeat: int = 1, expand: int = 1,
                        override_num_blocks: int | None = None):
    """documents.parquet → Dataset of pages (distributed synthesis)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"],
                         override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: pages_batch_from_documents(b, repeat=repeat, expand=expand),
        batch_format="pyarrow", batch_size=256,
    )
