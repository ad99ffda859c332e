"""Text assembly: kept blocks → content_text + content_spans.

The ``get_utf8_text()`` analogue (reference ``src/api.rs:1303-1328``):
project the classified layout into the final plain-text output, with
the char-class whitelist/blacklist filter applied during assembly
(``tessedit_char_whitelist``, reference ``tests/integration_test.rs:124-148``).
Spans are merged, sorted byte offsets into the raw html — the output
contract's "bounding boxes".
"""

from __future__ import annotations

from .config import ExtractionConfig
from .segment import Block


def filter_chars(text: str, cfg: ExtractionConfig) -> str:
    """Apply char whitelist/blacklist; whitespace always survives; collapse
    any whitespace runs the filtering exposes."""
    if not cfg.char_whitelist and not cfg.char_blacklist:
        return text
    wl = set(cfg.char_whitelist) if cfg.char_whitelist else None
    bl = set(cfg.char_blacklist)
    out = []
    for ch in text:
        if ch in (" ", "\n"):
            out.append(ch)
        elif (wl is None or ch in wl) and ch not in bl:
            out.append(ch)
    s = "".join(out)
    # re-collapse whitespace exposed by removals
    lines = []
    for line in s.split("\n"):
        lines.append(" ".join(line.split()))
    return "\n".join(l for l in lines if l).strip()


def assemble(blocks: list[Block], cfg: ExtractionConfig) -> tuple[str, list[tuple[int, int]]]:
    """→ (content_text, content_spans).

    content_text = kept blocks' text joined by a blank line ('\\n\\n'),
    in document order (the reference's stable pre-order emission
    contract, tests/test_iterators.rs:619-660).  Spans: the kept blocks'
    raw text-run byte ranges, sorted, adjacent/overlapping ranges merged.
    """
    texts: list[str] = []
    spans: list[tuple[int, int]] = []
    for b in blocks:
        if not b.is_content:
            continue
        t = filter_chars(b.text, cfg) if (cfg.char_whitelist or cfg.char_blacklist) else b.text
        if not t:
            continue
        texts.append(t)
        spans.extend(b.spans)
    spans.sort()
    merged: list[tuple[int, int]] = []
    for s, e in spans:
        if merged and s <= merged[-1][1]:
            if e > merged[-1][1]:
                merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    return "\n\n".join(texts), merged
