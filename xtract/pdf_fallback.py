"""Layout-aware PDF/binary fallback parser (SURVEY §2.3 A14).

The reference's whole OCR engine is "extract text where no markup
exists"; our analogue for binary payloads is a minimal, deterministic
PDF text extractor supporting the subset our fixtures generate plus
common simple PDFs: uncompressed or FlateDecode content streams with
``BT … ET`` text objects and ``Tj`` / ``TJ`` / ``'`` show ops; ``Td``,
``TD``, ``T*`` with negative/line vertical moves produce newlines.
Anything else → typed per-row status ``unsupported_binary`` (mirrors
the reference returning typed errors rather than crashing,
``src/error.rs:6-41``).

Pure function of the bytes — runs inside the stateful actor pool (the
parser's op tables are compiled-regex warm state in the actor).
"""

from __future__ import annotations

import re
import zlib

PDF_MAGIC = b"%PDF-"

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.S)
# text-showing + positioning operators inside a BT/ET block
_OP_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)\s*(?P<op>Tj|')"   # (s) Tj  |  (s) '
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"               # [ ... ] TJ
    rb"|(?P<td>-?[\d.]+)\s+(?P<td2>-?[\d.]+)\s+(?:Td|TD)"
    rb"|(?P<tstar>T\*)",
    re.S,
)
_ARR_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)", re.S)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def is_pdf(data: bytes) -> bool:
    return data[:5] == PDF_MAGIC


def _unescape_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            i += 2  # line continuation / unknown escape: drop backslash
            out += nxt if nxt not in (b"\n", b"\r") else b""
            continue
        out += c
        i += 1
    # our fixture subset is latin-1-safe text; decode deterministically
    return out.decode("latin-1")


def _extract_bt_block(body: bytes) -> list[str]:
    """One BT..ET block → lines of text."""
    lines: list[str] = []
    cur: list[str] = []
    for m in _OP_RE.finditer(body):
        if m.group("lit") is not None:
            s = _unescape_pdf_string(m.group("lit"))
            if m.group("op") == b"'":  # ' = newline then show
                if cur:
                    lines.append("".join(cur))
                    cur = []
            cur.append(s)
        elif m.group("arr") is not None:
            for sm in _ARR_STR_RE.finditer(m.group("arr")):
                cur.append(_unescape_pdf_string(sm.group(0)[1:-1]))
        elif m.group("tstar") is not None:
            if cur:
                lines.append("".join(cur))
                cur = []
        elif m.group("td") is not None:
            try:
                dy = float(m.group("td2"))
            except ValueError:
                dy = 0.0
            if dy != 0.0 and cur:
                lines.append("".join(cur))
                cur = []
    if cur:
        lines.append("".join(cur))
    return lines


def extract_pdf_text(data: bytes) -> tuple[str, list[tuple[int, int]], str]:
    """→ (text, spans, status).  Spans are the byte ranges of the content
    streams the text came from.  status ∈ {'ok', 'empty',
    'unsupported_binary'}."""
    if not is_pdf(data):
        return "", [], "unsupported_binary"
    lines: list[str] = []
    spans: list[tuple[int, int]] = []
    saw_stream = False
    for m in _STREAM_RE.finditer(data):
        hdr, body = m.group(1), m.group(2)
        saw_stream = True
        if b"FlateDecode" in hdr:
            # decompressobj tolerates trailing junk after the deflate
            # stream (the \r\n before `endstream`); NEVER rstrip the body —
            # a compressed stream can legitimately end in 0x0a/0x0d bytes
            try:
                body = zlib.decompressobj().decompress(body)
            except zlib.error:
                return "", [], "unsupported_binary"
        elif re.search(rb"/Filter", hdr):
            # any other filter is out of the supported subset
            return "", [], "unsupported_binary"
        got = False
        for bt in _BT_ET_RE.finditer(body):
            blk = _extract_bt_block(bt.group(1))
            if blk:
                lines.extend(blk)
                got = True
        if got:
            spans.append((m.start(2), m.end(2)))
    text = "\n".join(" ".join(l.split()) for l in lines if l.strip())
    if not text:
        return "", spans, "empty" if saw_stream or data else "empty"
    return text, spans, "ok"
