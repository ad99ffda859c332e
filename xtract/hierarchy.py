"""Hierarchy explosion: blocks → (block|para|line|word) rows.

The relational form of the reference's cursor iterators (SURVEY §2.4):
``RIL_BLOCK > RIL_PARA > RIL_TEXTLINE > RIL_WORD`` levels become rows
with a ``level`` column (``src/enums.rs:48-54``); cursor movement
(``next(level)``, ``src/page_iterator.rs:34-58``) becomes
``filter(level == X)``; the adjacency predicates
``is_at_beginning_of`` / ``is_at_final_element``
(``src/page_iterator.rs:69-99``) become ``is_first_in_parent`` /
``is_last_in_parent`` flags computed at explode time.

Span semantics: block/para/line rows carry byte offsets into the source
html; word rows carry character offsets into the *block's normalized
text* (documented deviation — exact per-word source byte offsets do not
survive entity decoding; invariant ``span_end > span_start`` holds at
every level, mirroring bbox validity tests
``tests/test_iterators.rs:172-211``).
"""

from __future__ import annotations

import re
from typing import Any

from .segment import Block

_NUM_RE = re.compile(r"^[\d.,:%+-]+$")

LEVELS = ("block", "para", "line", "word")


def explode_blocks(
    url: str,
    blocks: list[Block],
    levels: tuple[str, ...] = LEVELS,
    dict_words: frozenset | None = None,
) -> list[dict[str, Any]]:
    """One document's blocks → hierarchy rows (list of plain dicts, cheap
    to column-ify in the batch layer)."""
    want_para = "para" in levels
    want_line = "line" in levels
    want_word = "word" in levels
    rows: list[dict[str, Any]] = []
    nb = len(blocks)
    for bi, b in enumerate(blocks):
        base = {
            "url": url,
            "block_id": b.block_id,
            "parent_path": b.parent_path,
            "block_type": b.block_type,
            "is_content": b.is_content,
            "confidence": float(b.confidence),
            "link_density": (b.n_link_chars / b.n_chars) if b.n_chars else 0.0,
            "text_density": float(b.n_words),
            "depth": b.depth,
            "justification": b.justification,
            "is_list_item": b.is_list_item,
            "is_bold": b.is_bold,
            "is_italic": b.is_italic,
            "is_mono": b.is_mono,
            "has_sup": b.has_sup,
            "has_sub": b.has_sub,
            "heading_level": b.heading_level,
            "lang": b.lang,
        }
        if "block" in levels:
            rows.append({
                **base, "level": "block", "text": b.text,
                "span_start": b.span_start, "span_end": b.span_end,
                "line_id": -1, "word_id": -1,
                "is_first_in_parent": bi == 0, "is_last_in_parent": bi == nb - 1,
                "is_dict_word": False, "is_numeric": False,
            })
        if want_para:
            # our segmentation already yields paragraph-granularity blocks:
            # one para per block, same span (documented 1:1 mapping)
            rows.append({
                **base, "level": "para", "text": b.text,
                "span_start": b.span_start, "span_end": b.span_end,
                "line_id": -1, "word_id": -1,
                "is_first_in_parent": True, "is_last_in_parent": True,
                "is_dict_word": False, "is_numeric": False,
            })
        if want_line or want_word:
            lines = b.text.split("\n")
            nl = len(lines)
            cursor = 0  # char offset into block text
            for li, line in enumerate(lines):
                start = b.text.index(line, cursor)
                end = start + len(line)
                cursor = end
                if want_line and line:
                    rows.append({
                        **base, "level": "line", "text": line,
                        # line-geometry detail: char offsets within the block
                        # (baseline analogue, src/page_iterator.rs:159-175)
                        "span_start": start, "span_end": end,
                        "line_id": li, "word_id": -1,
                        "is_first_in_parent": li == 0,
                        "is_last_in_parent": li == nl - 1,
                        "is_dict_word": False, "is_numeric": False,
                    })
                if want_word and line:
                    words = line.split(" ")
                    nw = len(words)
                    wcur = start
                    for wi, w in enumerate(words):
                        ws = b.text.index(w, wcur) if w else wcur
                        we = ws + len(w)
                        wcur = we
                        if not w:
                            continue
                        rows.append({
                            **base, "level": "word", "text": w,
                            "span_start": ws, "span_end": we,
                            "line_id": li, "word_id": wi,
                            "is_first_in_parent": wi == 0,
                            "is_last_in_parent": wi == nw - 1,
                            "is_dict_word": bool(dict_words) and w.lower().strip(".,;:!?\"'()") in (dict_words or frozenset()),
                            "is_numeric": bool(_NUM_RE.match(w)),
                        })
    return rows


def is_valid_word(word: str, dict_words: frozenset) -> bool:
    """Dictionary membership (``is_valid_word`` analogue, src/api.rs:1003-1010)."""
    return word.lower().strip(".,;:!?\"'()") in dict_words
