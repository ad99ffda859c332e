"""Multi-format output renderers (M3-M7, S5-S7) + pluggable registry.

The reference projects ONE recognition result into 8 formats
(``get_hocr_text`` ``src/api.rs:309-322``, ``get_alto_text`` ``:333-346``,
``get_tsv_text`` ``:357-370``, box variants ``:467-528``,
``get_unlv_text`` ``:535-548``; streaming renderers sharing one
begin/add/end protocol, ``src/result_renderer.rs:25-134``).  Ours render
a document's classified blocks into format strings; the registry lets
users add formats without touching the pipeline (SURVEY §2.10).

Renderers run as a stateless projection stage — no shuffle: the actor
extracts blocks and renders in the same pass.
"""

from __future__ import annotations

import unicodedata
from typing import Callable
from xml.sax.saxutils import escape, quoteattr

from .config import DEFAULT_CONFIG, ExtractionConfig
from .segment import Block


def render_text(url: str, blocks: list[Block]) -> str:
    """Plain text projection (the txt renderer, S5)."""
    return "\n\n".join(b.text for b in blocks if b.is_content)


def render_hocr(url: str, blocks: list[Block]) -> str:
    """hOCR-like XML: structure + spans-as-boxes + confidences
    (``get_hocr_text`` analogue; bbox = byte span)."""
    out = [
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
        f"<html><body><div class='ocr_page' id='page_1' title={quoteattr('url ' + url)}>",
    ]
    for b in blocks:
        out.append(
            f"  <div class='ocr_carea' id='block_{b.block_id}' "
            f"title='bbox {b.span_start} 0 {b.span_end} 1; x_wconf {b.confidence}' "
            f"data-type={quoteattr(b.block_type)} data-content={quoteattr(str(b.is_content).lower())}>"
        )
        for li, line in enumerate(b.text.split("\n")):
            out.append(f"    <span class='ocr_line' id='line_{b.block_id}_{li}'>"
                       f"{escape(line)}</span>")
        out.append("  </div>")
    out.append("</div></body></html>")
    return "\n".join(out)


def render_alto(url: str, blocks: list[Block]) -> str:
    """ALTO-like XML (``get_alto_text`` analogue)."""
    out = [
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
        "<alto><Layout><Page ID=\"P1\">",
    ]
    for b in blocks:
        out.append(f"  <TextBlock ID=\"B{b.block_id}\" HPOS=\"{b.span_start}\" "
                   f"WIDTH=\"{max(0, b.span_end - b.span_start)}\" "
                   f"TYPE={quoteattr(b.block_type)}>")
        for line in b.text.split("\n"):
            words = "".join(f"<String CONTENT={quoteattr(w)}/>" for w in line.split(" ") if w)
            out.append(f"    <TextLine>{words}</TextLine>")
        out.append("  </TextBlock>")
    out.append("</Page></Layout></alto>")
    return "\n".join(out)


def render_tsv(url: str, blocks: list[Block]) -> str:
    """TSV projection: one row per block — literally the blocks table
    (``get_tsv_text`` analogue)."""
    rows = ["block_id\tblock_type\tis_content\tconfidence\tspan_start\tspan_end\ttext"]
    for b in blocks:
        text = b.text.replace("\t", " ").replace("\n", "\\n")
        rows.append(f"{b.block_id}\t{b.block_type}\t{int(b.is_content)}\t"
                    f"{b.confidence}\t{b.span_start}\t{b.span_end}\t{text}")
    return "\n".join(rows)


def render_box(url: str, blocks: list[Block]) -> str:
    """Word box projection (``get_box_text`` family): word, char-span in
    block text, block id."""
    out = []
    for b in blocks:
        cursor = 0
        for w in b.text.replace("\n", " ").split(" "):
            if not w:
                continue
            s = b.text.replace("\n", " ").index(w, cursor)
            e = s + len(w)
            cursor = e
            out.append(f"{w} {s} {e} {b.block_id}")
    return "\n".join(out)


def render_box_lstm(url: str, blocks: list[Block]) -> str:
    """LSTM-style box projection (``get_lstm_box_text`` analogue,
    reference ``src/api.rs:491-509``): one SYMBOL per line carrying its
    text line's span (LSTM training boxes give every char the line
    bbox), with a tab-marked line terminator row per line."""
    out = []
    for b in blocks:
        cursor = 0
        for line in b.text.split("\n"):
            if not line:
                continue
            s = b.text.index(line, cursor)
            e = s + len(line)
            cursor = e
            for ch in line:
                out.append(f"{ch} {s} {e} {b.block_id}")
            out.append(f"\t {s} {e} {b.block_id}")  # line terminator marker
    return "\n".join(out)


def render_box_wordstr(url: str, blocks: list[Block]) -> str:
    """WordStr box projection (``get_wordstr_box_text`` analogue,
    reference ``src/api.rs:511-528``): one row per text line,
    ``WordStr <start> <end> <block> #<line text>``."""
    out = []
    for b in blocks:
        cursor = 0
        for line in b.text.split("\n"):
            if not line:
                continue
            s = b.text.index(line, cursor)
            e = s + len(line)
            cursor = e
            out.append(f"WordStr {s} {e} {b.block_id} #{line}")
    return "\n".join(out)


def render_sidecar(url: str, blocks: list[Block]) -> str:
    """JSON sidecar of (url, text, spans) — the searchable-PDF/sidecar
    sink payload (S7; reference text+pdf renderer pair,
    ``src/result_renderer.rs:69-82``).  Deterministic key order."""
    import json

    content = [b for b in blocks if b.is_content]
    return json.dumps({
        "url": url,
        "text": render_text(url, blocks),
        "spans": [[s, e] for b in content for s, e in b.spans],
        "blocks": [{"id": b.block_id, "type": b.block_type,
                    "span": [b.span_start, b.span_end]} for b in content],
    }, sort_keys=True, ensure_ascii=False)


def render_markdown(url: str, blocks: list[Block]) -> str:
    """Markdown projection of the classified content blocks — the
    web-native rich-output analogue of the reference's renderer family
    (``src/result_renderer.rs:25-134``): heading level → ``#``×n, list
    items → ``- ``, blockquotes → ``> ``, mono blocks → fenced code,
    bold/italic wrappers; non-content (boilerplate) blocks dropped.
    Deterministic — a pure function of the classified blocks."""
    out: list[str] = []
    for b in blocks:
        if not b.is_content:
            continue
        text = b.text
        if b.heading_level:
            out.append("#" * min(b.heading_level, 6) + " "
                       + " ".join(text.split("\n")))
            continue
        if b.is_mono:
            out.append("```\n" + text + "\n```")
            continue
        lines = text.split("\n")
        if b.is_list_item:
            out.append("\n".join("- " + ln for ln in lines))
            continue
        if b.in_blockquote:
            out.append("\n".join("> " + ln for ln in lines))
            continue
        if b.is_bold:
            text = "**" + text + "**"
        elif b.is_italic:
            text = "*" + text + "*"
        out.append(text)
    return "\n\n".join(out)


def render_artifact(url: str, blocks: list[Block]) -> str:
    """Self-contained HTML composite artifact — the TRUE
    rendered-artifact sink (the searchable-PDF renderer analogue,
    reference ``src/result_renderer.rs:69-82``): where the reference
    overlays an invisible text layer on the page image at pixel
    coordinates, this emits one standalone document carrying the
    extracted text layer with every content block ANCHORED at its
    byte-span "coordinates" (``id="s{start}e{end}"``), a navigable
    block index (role, span, confidence) linking into the layer, and
    dropped-boilerplate accounting.  Everything inline (CSS included),
    zero external fetches, deterministic byte output — a pure function
    of the classified blocks, like every renderer in this registry."""
    content = [b for b in blocks if b.is_content]
    dropped = [b for b in blocks if not b.is_content]
    out = [
        "<!DOCTYPE html>",
        "<html><head><meta charset=\"utf-8\">",
        f"<title>xtract artifact: {escape(url)}</title>",
        "<style>body{font-family:sans-serif;max-width:60em;margin:auto}"
        "nav ol{font-size:small}section{border-left:3px solid #ccc;"
        "padding-left:.6em;margin:.8em 0}section h3{font-size:small;"
        "color:#666;margin:0}.lowconf{border-left-color:#c66}"
        "</style></head><body>",
        f"<header><h1>{escape(url)}</h1>"
        f"<p>{len(content)} content blocks kept, "
        f"{len(dropped)} boilerplate blocks dropped</p></header>",
        "<nav><ol>",
    ]
    for b in content:
        out.append(
            f"  <li><a href=\"#s{b.span_start}e{b.span_end}\">"
            f"{escape(b.block_type)} [{b.span_start}..{b.span_end}] "
            f"conf {b.confidence:.0f}</a></li>")
    out.append("</ol></nav><main>")
    for b in content:
        cls = " class=\"lowconf\"" if b.confidence < 50 else ""
        out.append(
            f"<section id=\"s{b.span_start}e{b.span_end}\"{cls} "
            f"data-block={quoteattr(str(b.block_id))} "
            f"data-type={quoteattr(b.block_type)} "
            f"data-span={quoteattr(f'{b.span_start}:{b.span_end}')} "
            f"data-conf={quoteattr(f'{b.confidence:.0f}')}>")
        out.append(f"  <h3>{escape(b.block_type)} "
                   f"#{b.block_id}</h3>")
        for line in b.text.split("\n"):
            out.append(f"  <p>{escape(line)}</p>")
        out.append("</section>")
    out.append("</main><footer><p>dropped spans: "
               + escape(" ".join(f"{b.span_start}:{b.span_end}"
                                 for b in dropped))
               + "</p></footer></body></html>")
    return "\n".join(out)


def render_unlv(url: str, blocks: list[Block]) -> str:
    """UNLV-style projection: accent-folded ASCII-ish text via the
    deterministic NFKD table (``get_unlv_text`` analogue)."""
    text = render_text(url, blocks)
    folded = unicodedata.normalize("NFKD", text)
    return "".join(c for c in folded if ord(c) < 128)


RENDERERS: dict[str, Callable[[str, list[Block]], str]] = {
    "text": render_text,
    "artifact": render_artifact,
    "hocr": render_hocr,
    "alto": render_alto,
    "tsv": render_tsv,
    "box": render_box,
    "box_lstm": render_box_lstm,
    "box_wordstr": render_box_wordstr,
    "sidecar": render_sidecar,
    "unlv": render_unlv,
    "markdown": render_markdown,
}

#: sink self-description (get_extension analogue, src/result_renderer.rs:141-185)
EXTENSIONS = {"text": "txt", "artifact": "html", "hocr": "hocr",
              "alto": "xml", "tsv": "tsv",
              "box": "box", "box_lstm": "box", "box_wordstr": "box",
              "sidecar": "json", "unlv": "unlv", "markdown": "md"}


def register_renderer(name: str, fn: Callable[[str, list[Block]], str],
                      extension: str = "txt") -> None:
    RENDERERS[name] = fn
    EXTENSIONS[name] = extension


class RenderStage:
    """Actor stage: pages → (url, format, payload) — extract + render in
    one pass, no shuffle."""

    def __init__(self, cfg: ExtractionConfig | str = DEFAULT_CONFIG,
                 formats: tuple[str, ...] = ("hocr",)) -> None:
        if isinstance(cfg, str):
            cfg = ExtractionConfig.from_json(cfg)
        self.cfg = cfg
        self.formats = tuple(formats)
        unknown = [f for f in self.formats if f not in RENDERERS]
        if unknown:
            raise ValueError(f"unknown renderers {unknown}; known: {sorted(RENDERERS)}")
        from .langdetect import detector_for

        self.detector = detector_for(cfg)

    def __call__(self, batch):
        import pyarrow as pa

        from .extract import extract_document

        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist() if "html" in batch.column_names else [None] * len(urls)
        texts = batch["text"].to_pylist() if "text" in batch.column_names else [None] * len(urls)
        out = {"url": [], "format": [], "payload": []}
        for url, html, text in zip(urls, htmls, texts):
            if not url:
                continue
            r = extract_document(html, text, None, self.cfg,
                                 detector=self.detector, collect_blocks=True)
            for fmt in self.formats:
                out["url"].append(url)
                out["format"].append(fmt)
                out["payload"].append(RENDERERS[fmt](url, r["blocks"]))
        return pa.table(out)


_WORKER_RENDERERS: dict[tuple, "RenderStage"] = {}


def render_batch_task(batch, cfg_json: str, formats: tuple[str, ...]):
    """Stateless-task variant with warm per-worker renderer state (same
    no-pool-ramp shape as the extract/explode stages)."""
    key = (cfg_json, tuple(formats))
    st = _WORKER_RENDERERS.get(key)
    if st is None:
        st = _WORKER_RENDERERS[key] = RenderStage(cfg_json, tuple(formats))
    return st(batch)


def render_pages(ds, cfg: ExtractionConfig = DEFAULT_CONFIG,
                 formats: tuple[str, ...] = ("hocr",), batch_size: int = 32,
                 concurrency=(2, 8), use_actors: bool = False):
    """pages Dataset → rendered Dataset (url, format, payload).

    Default: warm-task stage (no actor-pool ramp); ``use_actors`` keeps
    the pool shape for heavyweight per-worker state."""
    if use_actors:
        return ds.map_batches(RenderStage,
                              fn_constructor_args=(cfg.to_json(), formats),
                              batch_format="pyarrow", batch_size=batch_size,
                              concurrency=concurrency, num_cpus=1)
    return ds.map_batches(
        render_batch_task,
        fn_kwargs={"cfg_json": cfg.to_json(), "formats": tuple(formats)},
        batch_format="pyarrow", batch_size=batch_size)
