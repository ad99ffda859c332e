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

from .classify import type_alternatives
from .langdetect import text_direction
from .segment import Block

_NUM_RE = re.compile(r"^[\d.,:%+-]+$")

LEVELS = ("block", "para", "line", "word")

#: column order of the hierarchy row — must match actors.BLOCKS_SCHEMA
HIERARCHY_COLUMNS = (
    "url", "block_id", "parent_path", "level", "block_type", "text",
    "span_start", "span_end", "is_content", "confidence", "link_density",
    "text_density", "depth", "justification", "is_list_item", "is_bold",
    "is_italic", "is_mono", "has_sup", "has_sub", "heading_level", "lang",
    "dir", "line_id", "word_id", "is_first_in_parent", "is_last_in_parent",
    "is_dict_word", "is_numeric", "alternatives",
)


def new_hierarchy_columns() -> dict[str, list]:
    """Fresh column accumulator for ``explode_blocks_into`` (one per
    batch — the batch layer builds ONE Arrow table from it)."""
    return {name: [] for name in HIERARCHY_COLUMNS}


def explode_blocks_into(
    url: str,
    blocks: list[Block],
    levels: tuple[str, ...],
    cols: dict[str, list],
    dict_words: frozenset | None = None,
    detector=None,
) -> None:
    """One document's blocks → hierarchy rows appended COLUMNARLY into
    ``cols`` — no per-row dicts on the hot path (the round-1
    list-of-dicts + ``from_pylist`` build made the explode stage ~20×
    the cost of extraction; this is the flat-builder pattern the
    Extractor stage already uses)."""
    want_block = "block" in levels
    want_para = "para" in levels
    want_line = "line" in levels
    want_word = "word" in levels
    nb = len(blocks)
    c_url = cols["url"].append
    c_bid = cols["block_id"].append
    c_pp = cols["parent_path"].append
    c_lvl = cols["level"].append
    c_bt = cols["block_type"].append
    c_txt = cols["text"].append
    c_ss = cols["span_start"].append
    c_se = cols["span_end"].append
    c_ic = cols["is_content"].append
    c_cf = cols["confidence"].append
    c_ld = cols["link_density"].append
    c_td = cols["text_density"].append
    c_dp = cols["depth"].append
    c_ju = cols["justification"].append
    c_li = cols["is_list_item"].append
    c_bo = cols["is_bold"].append
    c_it = cols["is_italic"].append
    c_mo = cols["is_mono"].append
    c_sup = cols["has_sup"].append
    c_sub = cols["has_sub"].append
    c_hl = cols["heading_level"].append
    c_lang = cols["lang"].append
    c_dir = cols["dir"].append
    c_lid = cols["line_id"].append
    c_wid = cols["word_id"].append
    c_fst = cols["is_first_in_parent"].append
    c_lst = cols["is_last_in_parent"].append
    c_dw = cols["is_dict_word"].append
    c_num = cols["is_numeric"].append
    c_alt = cols["alternatives"].append
    for bi, b in enumerate(blocks):
        link_density = (b.n_link_chars / b.n_chars) if b.n_chars else 0.0
        text_density = float(b.n_words)
        confidence = float(b.confidence)
        # per-block writing direction (H9 — ParagraphInfo direction
        # analogue, reference src/page_iterator.rs:182-217): a block of
        # RTL script inside an LTR page is flagged at block granularity
        block_dir = text_direction(b.text)

        def emit(level: str, text: str, ss: int, se: int, lid: int,
                 wid: int, first: bool, last: bool, dw: bool, num: bool,
                 lang: "str | None" = None, alt: "list | None" = None,
                 b=b, link_density=link_density, text_density=text_density,
                 confidence=confidence, block_dir=block_dir) -> None:
            c_url(url)
            c_bid(b.block_id)
            c_pp(b.parent_path)
            c_lvl(level)
            c_bt(b.block_type)
            c_txt(text)
            c_ss(ss)
            c_se(se)
            c_ic(b.is_content)
            c_cf(confidence)
            c_ld(link_density)
            c_td(text_density)
            c_dp(b.depth)
            c_ju(b.justification)
            c_li(b.is_list_item)
            c_bo(b.is_bold)
            c_it(b.is_italic)
            c_mo(b.is_mono)
            c_sup(b.has_sup)
            c_sub(b.has_sub)
            c_hl(b.heading_level)
            c_lang(lang if lang is not None else b.lang)
            c_dir(block_dir)
            c_lid(lid)
            c_wid(wid)
            c_fst(first)
            c_lst(last)
            c_dw(dw)
            c_num(num)
            c_alt(alt if alt is not None else [])

        if want_block:
            # per-node classification alternatives (choice-lattice
            # analogue, reference src/choice_iterator.rs:30-71): the
            # runner-up block types with confidences, desc-sorted;
            # first entry == block_type by construction
            alts = [{"label": t, "conf": c} for t, c in type_alternatives(b)]
            emit("block", b.text, b.span_start, b.span_end, -1, -1,
                 bi == 0, bi == nb - 1, False, False, alt=alts)
        if want_para:
            # our segmentation already yields paragraph-granularity blocks:
            # one para per block, same span (documented 1:1 mapping)
            emit("para", b.text, b.span_start, b.span_end, -1, -1,
                 True, True, False, False)
        if want_line or want_word:
            lines = b.text.split("\n")
            nl = len(lines)
            cursor = 0  # char offset into block text
            for li, line in enumerate(lines):
                start = b.text.index(line, cursor)
                end = start + len(line)
                cursor = end
                if want_line and line:
                    # line-geometry detail: char offsets within the block
                    # (baseline analogue, src/page_iterator.rs:159-175)
                    emit("line", line, start, end, li, -1,
                         li == 0, li == nl - 1, False, False)
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
                        # per-word recognition language on mixed-language
                        # pages (reference src/result_iterator.rs:78-89):
                        # a word uniquely claimed by another loaded
                        # language's tables overrides the block label
                        wlang = (detector.word_lang(w, b.lang)
                                 if detector is not None else b.lang)
                        emit("word", w, ws, we, li, wi,
                             wi == 0, wi == nw - 1,
                             bool(dict_words) and w.lower().strip(".,;:!?\"'()") in (dict_words or frozenset()),
                             bool(_NUM_RE.match(w)), lang=wlang)


def explode_blocks(
    url: str,
    blocks: list[Block],
    levels: tuple[str, ...] = LEVELS,
    dict_words: frozenset | None = None,
    detector=None,
) -> list[dict[str, Any]]:
    """Row-dict view of ``explode_blocks_into`` (tests / small inputs —
    the batch layer uses the columnar form directly)."""
    cols = new_hierarchy_columns()
    explode_blocks_into(url, blocks, levels, cols, dict_words, detector)
    names = list(HIERARCHY_COLUMNS)
    return [dict(zip(names, vals)) for vals in zip(*(cols[n] for n in names))]


def is_valid_word(word: str, dict_words: frozenset) -> bool:
    """Dictionary membership (``is_valid_word`` analogue, src/api.rs:1003-1010)."""
    return word.lower().strip(".,;:!?\"'()") in dict_words
