"""The core per-document extraction spec — ONE implementation, shared.

``extract_document`` is the analogue of the reference's canonical
per-document flow (``src/api.rs``: set_image → recognize →
get_utf8_text + iterators; traced in SURVEY §3.2): a pure,
deterministic function of ``(html_bytes, crawl_text, lang_hint,
config)``.  The sequential oracle (oracle.py) and the distributed actor
stage (actors.py) both call THIS function, which is what guarantees
byte-identical ``content_text`` per url under any parallelism level.

Typed per-row outcomes instead of raised errors (reference
``src/error.rs:6-41``): every document yields a row; ``status`` says
what happened.
"""

from __future__ import annotations

import re
import time
from typing import Any, Optional

from .assemble import assemble
from .classify import classify_blocks
from .config import ExtractionConfig
from .langdetect import LangDetector, detect_script, text_direction
from .pdf_fallback import extract_pdf_text, is_pdf
from .segment import Block, segment

_WS_LINE_RE = re.compile(r"[ \t\r\f\v\xa0]+")

_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.I)

#: codecs we accept from a meta declaration (deterministic stdlib codecs)
_KNOWN_CHARSETS = {
    "latin-1": "latin-1", "latin1": "latin-1", "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1", "windows-1252": "cp1252", "cp1252": "cp1252",
    "windows-1251": "cp1251", "cp1251": "cp1251", "iso-8859-2": "iso8859-2",
    "iso-8859-9": "iso8859-9", "koi8-r": "koi8-r", "shift_jis": "shift_jis",
    "shift-jis": "shift_jis", "euc-jp": "euc_jp", "gb2312": "gb2312",
    "gbk": "gbk", "big5": "big5", "euc-kr": "euc_kr",
}


def sniff_charset(html: bytes) -> Optional[str]:
    """Meta-declared charset in the first 2 KiB (S3 charset sniff) —
    returns a Python codec name, or None if absent/unknown/utf-8."""
    m = _META_CHARSET_RE.search(html[:2048])
    if not m:
        return None
    name = m.group(1).decode("ascii", "replace").lower()
    if name in ("utf-8", "utf8"):
        return None
    return _KNOWN_CHARSETS.get(name)


def _filter_plain(text: str, cfg: ExtractionConfig) -> str:
    """Char whitelist/blacklist on non-HTML paths (pdf / crawl-text) — the
    filter applies to every doc kind, as the reference's whitelist applies
    at recognition regardless of input (tests/integration_test.rs:124-148)."""
    if not (cfg.char_whitelist or cfg.char_blacklist):
        return text
    from .assemble import filter_chars

    return filter_chars(text, cfg)

#: status values (the error-taxonomy analogue)
STATUSES = (
    "ok", "empty", "bad_encoding", "unsupported_binary",
    "parse_error", "invalid", "timeout",
)


def _normalize_plain(text: str) -> str:
    """Normalize crawl-provided plain text with the same whitespace rules
    as HTML block text (S2 direct-text path, SURVEY §2.1)."""
    lines = [_WS_LINE_RE.sub(" ", ln).strip() for ln in text.split("\n")]
    return "\n".join(l for l in lines if l)


def _plain_text_block(text: str) -> Block:
    b = Block()
    b.block_id = 0
    b.tag = "#text"
    b.parent_path = "#text[1]"
    b.text = text
    b.span_start = 0
    b.span_end = len(text.encode("utf-8"))
    b.spans = [(b.span_start, b.span_end)]
    b.n_chars = len(text)
    b.n_words = len(text.split())
    b.block_type = "FLOWING_TEXT"
    b.is_content = True
    b.confidence = 70
    return b


def extract_document(
    html: Optional[bytes],
    crawl_text: Optional[str],
    lang_hint: Optional[str],
    cfg: ExtractionConfig,
    detector: Optional[LangDetector] = None,
    collect_blocks: bool = False,
    lenient: bool = False,
    monitor: Optional["Monitor"] = None,
) -> dict[str, Any]:
    """→ dict matching the ``extracted`` output schema (SURVEY §1.2), plus
    ``blocks`` (list[Block]) when ``collect_blocks``.

    ``lenient=True`` is the retry-configuration pass (the
    ``process_pages(retry_config)`` analogue, reference
    ``src/api.rs:844-875``): documents that fail strict UTF-8 validation
    are re-decoded with replacement characters and extracted anyway
    (status ``'ok_lenient'``), instead of stopping at
    ``'bad_encoding'``.

    ``monitor`` (or ``cfg.timeout_ms > 0``) arms a per-document
    deadline that aborts segmentation MID-PARSE (TessMonitor analogue,
    reference ``src/monitor.rs:18-50``) → status ``'timeout'`` with
    deterministic empty content; ``monitor.get_progress()`` reports
    0-100 during the run."""
    t0 = time.monotonic() if cfg.timeout_ms else 0.0
    if monitor is None and cfg.timeout_ms:
        from .monitor import Monitor

        monitor = Monitor(cfg.timeout_ms)
    det = detector or _default_detector(cfg)
    out: dict[str, Any] = {
        "content_text": "", "content_spans": [], "doc_kind": "empty",
        "lang_detected": "und", "lang_conf": 0.0, "text_dir": "ltr",
        "mean_conf": 0.0, "n_blocks_kept": 0, "n_blocks_dropped": 0,
        "script": "Unknown", "script_conf": 0.0,
        "status": "ok", "error": "", "blocks": [],
    }
    # caller-registered deterministic preprocessing hook
    # (preprocess_image analogue, reference tests/common/mod.rs:44-51);
    # the hook NAME rides the config json → hashed into lineage
    # manifests.  Resolved OUTSIDE the per-document try: an
    # unregistered hook is a config bug and must fail the job, not
    # degrade every row to parse_error.
    pre = None
    if cfg.pre_clean:
        from .config import resolve_pre_clean

        pre = resolve_pre_clean(cfg.pre_clean)
    blocks: list[Block] = []
    try:
        if html and pre is not None:
            html = pre(html)
        if html is None or len(html) == 0:
            if crawl_text:
                norm = _filter_plain(_normalize_plain(crawl_text), cfg)
                if norm:
                    out["doc_kind"] = "text"
                    blocks = [_plain_text_block(norm)]
                    out["content_text"] = norm
                    out["content_spans"] = list(blocks[0].spans)
                else:
                    out["status"] = "empty"
            else:
                out["status"] = "empty"
        elif is_pdf(html):
            out["doc_kind"] = "pdf"
            text, spans, st = extract_pdf_text(html)
            text = _filter_plain(text, cfg)
            if st == "ok" and not text:
                st = "empty"
            if st == "ok":
                out["content_text"] = text
                out["content_spans"] = spans
                blocks = [_plain_text_block(text)]
                blocks[0].spans = spans or blocks[0].spans
            else:
                out["status"] = st
        elif b"\x00" in html:
            # non-PDF binary payload (NUL byte cannot occur in HTML text)
            out["doc_kind"] = "binary"
            out["status"] = "unsupported_binary"
        else:
            out["doc_kind"] = "html"
            try:
                html.decode("utf-8", "strict")
            except UnicodeDecodeError as exc:
                charset = sniff_charset(html)
                if charset is not None:
                    # declared non-UTF-8 charset: transcode (deterministic
                    # stdlib codec), keep status ok with a provenance note.
                    # NOTE: content_spans then index the TRANSCODED utf-8
                    # bytes, not the raw legacy bytes (documented contract)
                    html = html.decode(charset, "replace").encode("utf-8")
                    out["error"] = f"transcoded from {charset}"
                elif not lenient:
                    out["status"] = "bad_encoding"
                    out["error"] = f"invalid utf-8 at byte {exc.start}"
                    return _finish(out, blocks, cfg, det, collect_blocks, t0)
                else:
                    # retry-config pass: deterministic replacement decode
                    html = html.decode("utf-8", "replace").encode("utf-8")
                    out["status"] = "ok_lenient"
                    out["error"] = f"lenient decode at byte {exc.start}"
            blocks = segment(html, monitor=monitor)
            if cfg.debug:
                # get_thresholded_image analogue (src/api.rs:445-456):
                # the cleaned intermediate actually fed to classification
                out["cleaned_html"] = "\n".join(b.text for b in blocks)
            if monitor is not None:
                monitor.set_progress(92)
            classify_blocks(blocks, cfg)
            if monitor is not None:
                monitor.set_progress(96)
                monitor.check()
            if cfg.segment_only:
                # analyse_layout analogue: structure only, no text assembly
                out["content_text"] = ""
                out["content_spans"] = []
            else:
                text, spans = assemble(blocks, cfg)
                out["content_text"] = text
                out["content_spans"] = spans
                if not text:
                    out["status"] = "empty"
                elif out["status"] == "ok_lenient":
                    pass  # keep the lenient marker
    except Exception as exc:  # never abort the job for one document
        from .monitor import ExtractionCancelled

        if isinstance(exc, ExtractionCancelled):
            # deadline abort: deterministic empty content (same contract
            # as the reference's cancelled recognition)
            out["status"] = "timeout"
            out["error"] = str(exc)
            out["content_text"] = ""
            out["content_spans"] = []
        else:
            out["status"] = "parse_error"
            out["error"] = f"{type(exc).__name__}: {exc}"
        blocks = []
    if monitor is not None and out["status"] in ("ok", "ok_lenient", "empty"):
        monitor.set_progress(100)
    return _finish(out, blocks, cfg, det, collect_blocks, t0)


def _finish(out, blocks, cfg, det, collect_blocks, t0):
    kept = [b for b in blocks if b.is_content]
    out["n_blocks_kept"] = len(kept)
    out["n_blocks_dropped"] = len(blocks) - len(kept)
    if kept:
        out["mean_conf"] = sum(b.confidence for b in kept) / len(kept)
    text = out["content_text"]
    out["lang_alternatives"] = []
    if text:
        lang, conf, alts = det.detect_full(text[:2000])
        out["lang_detected"] = lang
        out["lang_conf"] = conf
        out["lang_alternatives"] = alts
        out["text_dir"] = text_direction(text)
        out["script"], out["script_conf"] = detect_script(text)
        # per-block language (word_recognition_language analogue) is only
        # needed when blocks are emitted — skipping it in the content path
        # halves extraction cost (profiled)
        if collect_blocks:
            for b in kept:
                b.lang, _ = det.detect(b.text[:400])
    if cfg.timeout_ms and (time.monotonic() - t0) * 1000.0 > cfg.timeout_ms:
        # operational flag only — content stays deterministic (SURVEY C1)
        out["status"] = "timeout"
    if collect_blocks:
        out["blocks"] = blocks
    else:
        out["blocks"] = []
    return out


_DET_CACHE: dict[tuple, LangDetector] = {}


def _default_detector(cfg: ExtractionConfig) -> LangDetector:
    key = (cfg.langs, cfg.lang_conf_margin, cfg.assets_dir)
    d = _DET_CACHE.get(key)
    if d is None:
        from .langdetect import detector_for

        d = _DET_CACHE[key] = detector_for(cfg)
    return d
