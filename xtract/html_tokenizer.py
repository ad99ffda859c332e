"""Deterministic byte-offset HTML tokenizer.

Operates directly on the raw ``html`` bytes so every text token carries
its exact byte span in the source for free — spans are the engine's
"bounding boxes" (reference ``bounding_box``,
``src/page_iterator.rs:110-134``).  Error recovery is specified, not
best-effort: a ``<`` that does not start a well-formed tag, comment,
declaration or processing instruction is literal text; an unterminated
comment or raw-text element runs to EOF.  The same tokenizer is used by
the sequential oracle and the distributed stage, so recovery decisions
are identical everywhere (SURVEY §7 hard part (b)).

Tokens are tuples (cheap, no classes):
    ("text", start, end)                      raw text bytes [start, end)
    ("start", start, end, tag, attrs_bytes, self_closing)
    ("end", start, end, tag)
    ("comment" | "decl" | "pi", start, end)   dropped by consumers
Tag names are lower-cased ASCII strings.
"""

from __future__ import annotations

import re
from typing import Iterator

TokenT = tuple

# Tag: optional '/', name, attr soup (quote-aware so '>' inside quotes is
# not a terminator), optional trailing '/'.
_TAG_RE = re.compile(
    rb"<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)"
    rb"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*?)"
    rb"(/?)>"
)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_DECL_RE = re.compile(rb"<![^>]*>")
_PI_RE = re.compile(rb"<\?[^>]*>")

#: Elements whose content is raw text (no markup parsed inside).
RAW_TEXT_ELEMENTS = frozenset({"script", "style", "textarea", "title", "xmp", "noscript"})

#: Raw-text elements whose content is still *text* for extraction
#: (title/textarea); script/style/xmp/noscript content is dropped.
RAW_TEXT_KEPT = frozenset({"title", "textarea"})

_RAW_END_RES: dict[str, re.Pattern] = {
    t: re.compile(rb"</" + t.encode() + rb"(?:\s[^>]*)?>", re.I) for t in RAW_TEXT_ELEMENTS
}


def tokenize(html: bytes) -> Iterator[TokenT]:
    """Yield tokens over ``html`` with byte offsets.  Never raises on
    malformed input (typed per-row errors happen above this layer,
    mirroring reference src/error.rs — parse never aborts the job)."""
    n = len(html)
    pos = 0
    while pos < n:
        lt = html.find(b"<", pos)
        if lt < 0:
            yield ("text", pos, n)
            return
        if lt > pos:
            yield ("text", pos, lt)
        # classify the construct at `lt`
        if html.startswith(b"<!--", lt):
            m = _COMMENT_RE.match(html, lt)
            if m:
                yield ("comment", lt, m.end())
                pos = m.end()
            else:  # unterminated comment → to EOF
                yield ("comment", lt, n)
                return
            continue
        if html.startswith(b"<!", lt):
            m = _DECL_RE.match(html, lt)
            if m:
                yield ("decl", lt, m.end())
                pos = m.end()
            else:
                yield ("decl", lt, n)
                return
            continue
        if html.startswith(b"<?", lt):
            m = _PI_RE.match(html, lt)
            if m:
                yield ("pi", lt, m.end())
                pos = m.end()
            else:
                yield ("pi", lt, n)
                return
            continue
        m = _TAG_RE.match(html, lt)
        if m is None:
            # recovery rule: literal '<' is text
            yield ("text", lt, lt + 1)
            pos = lt + 1
            continue
        closing, name_b, attrs_b, selfclose = m.group(1), m.group(2), m.group(3), m.group(4)
        tag = name_b.decode("ascii").lower()
        pos = m.end()
        if closing:
            yield ("end", lt, m.end(), tag)
            continue
        yield ("start", lt, m.end(), tag, attrs_b, bool(selfclose))
        if tag in RAW_TEXT_ELEMENTS and not selfclose:
            em = _RAW_END_RES[tag].search(html, pos)
            if em is None:  # unterminated raw element → content to EOF
                if tag in RAW_TEXT_KEPT and pos < n:
                    yield ("text", pos, n)
                yield ("end", n, n, tag)
                return
            if tag in RAW_TEXT_KEPT and em.start() > pos:
                yield ("text", pos, em.start())
            yield ("end", em.start(), em.end(), tag)
            pos = em.end()


_ATTR_RE = re.compile(
    rb"([a-zA-Z_:][a-zA-Z0-9_:.-]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]*))?"
)


def parse_attrs(attrs_b: bytes) -> dict[str, str]:
    """Parse an attribute soup on demand (lazy — most tags never need it).
    First occurrence of a name wins (HTML5 rule)."""
    out: dict[str, str] = {}
    for m in _ATTR_RE.finditer(attrs_b):
        name = m.group(1).decode("ascii", "replace").lower()
        if name in out:
            continue
        v = m.group(2)
        if v is None:
            out[name] = ""
        else:
            if len(v) >= 2 and v[:1] in (b'"', b"'") and v[-1:] == v[:1]:
                v = v[1:-1]
            out[name] = v.decode("utf-8", "replace")
    return out
