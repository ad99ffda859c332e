"""Block-type taxonomy + keep/drop boilerplate classification.

The analogue of the reference's 16-class ``TessPolyBlockType``
(``src/enums.rs:72-89``) — a "keep/drop + role" labelling of segmented
blocks — driven by text-density / link-density features in the style of
Boilerpipe / Readability (public algorithms; BASELINE.json north rule).

Every decision is an integer / rational comparison — never a float
threshold — so classification is bit-stable across machines and
parallelism levels (SURVEY §4.3 determinism rule).  Confidence is an
integer 0–100 (reference confidence range, ``src/result_iterator.rs:65-71``).
"""

from __future__ import annotations

from .config import ExtractionConfig
from .segment import Block

# Block taxonomy (SURVEY §1.2 blocks schema)
FLOWING_TEXT = "FLOWING_TEXT"
HEADING_TEXT = "HEADING_TEXT"
PULLOUT_TEXT = "PULLOUT_TEXT"   # blockquote
TABLE = "TABLE"
CAPTION_TEXT = "CAPTION_TEXT"
LIST = "LIST"
TITLE = "TITLE"
NAV = "NAV"
BOILERPLATE = "BOILERPLATE"
NOISE = "NOISE"
UNKNOWN = "UNKNOWN"

BLOCK_TYPES = (
    FLOWING_TEXT, HEADING_TEXT, PULLOUT_TEXT, TABLE, CAPTION_TEXT, LIST,
    TITLE, NAV, BOILERPLATE, NOISE, UNKNOWN,
)


def assign_type(b: Block) -> str:
    """Role classification from structural context (pure function)."""
    if b.is_title:
        return TITLE
    if b.heading_level > 0:
        return HEADING_TEXT
    if b.is_caption:
        return CAPTION_TEXT
    if b.in_table:
        return TABLE
    if b.is_list_item:
        return LIST
    if b.in_boiler:
        # link-dominated boiler container → NAV, else generic boilerplate
        return NAV if 2 * b.n_link_chars >= b.n_chars else BOILERPLATE
    if b.in_blockquote:
        return PULLOUT_TEXT
    if b.n_chars == 0:
        return NOISE
    return FLOWING_TEXT


#: priority weights of the classification rules, in ``assign_type``'s
#: if-chain order — strictly descending, so the top-ranked alternative
#: is ALWAYS the assigned type (invariant-tested)
_RULE_WEIGHTS = (
    ("title", 100), ("heading", 90), ("caption", 80), ("table", 70),
    ("list", 60), ("boiler", 50), ("quote", 40), ("noise", 30),
    ("flowing", 20),
)


def type_alternatives(b: Block, k: int = 3) -> list[tuple[str, float]]:
    """Ranked block-type alternatives with confidences, descending —
    the per-node choice-lattice analogue (reference
    ``src/choice_iterator.rs:30-71``: every classifier decision exposes
    its runner-up choices; ordering contract mirrors
    ``tests/test_iterators.rs:736-769``).

    Every structural rule that MATCHES the block contributes a
    candidate scored by its priority weight; conf = weight / total
    (integer weights, one division per candidate).  The first entry is
    exactly ``assign_type(b)`` because weights are strictly descending
    in rule order.  A plain text block yields the single candidate
    ``(FLOWING_TEXT, 1.0)``; structurally ambiguous blocks (e.g. a list
    item inside a nav) yield the runner-ups."""
    cands: list[tuple[str, int]] = []
    for rule, w in _RULE_WEIGHTS:
        if rule == "title" and b.is_title:
            cands.append((TITLE, w))
        elif rule == "heading" and b.heading_level > 0:
            cands.append((HEADING_TEXT, w))
        elif rule == "caption" and b.is_caption:
            cands.append((CAPTION_TEXT, w))
        elif rule == "table" and b.in_table:
            cands.append((TABLE, w))
        elif rule == "list" and b.is_list_item:
            cands.append((LIST, w))
        elif rule == "boiler" and b.in_boiler:
            cands.append((NAV if 2 * b.n_link_chars >= b.n_chars
                          else BOILERPLATE, w))
        elif rule == "quote" and b.in_blockquote:
            cands.append((PULLOUT_TEXT, w))
        elif rule == "noise" and b.n_chars == 0:
            cands.append((NOISE, w))
        elif rule == "flowing" and b.n_chars > 0:
            cands.append((FLOWING_TEXT, w))
    if not cands:
        return [(UNKNOWN, 1.0)]
    total = sum(w for _, w in cands)
    return [(t, w / total) for t, w in cands[:k]]


def is_content(b: Block, cfg: ExtractionConfig) -> bool:
    """Keep/drop decision — integer arithmetic only.

    Link-density rule: drop when
    ``n_link_chars * den > n_chars * num`` (i.e. link density strictly
    greater than num/den); the rational comparison avoids float division
    (SURVEY §4.3)."""
    if cfg.seg_mode == "raw":
        return not b.is_title
    t = b.block_type
    if t == TITLE:
        return False
    if t in (NAV, BOILERPLATE, NOISE):
        return False
    if t == HEADING_TEXT:
        return cfg.keep_headings
    if t == CAPTION_TEXT:
        return cfg.keep_captions
    if t == TABLE and not cfg.keep_tables:
        return False
    if t == LIST and not cfg.keep_lists:
        return False
    # link-density drop (strict rational compare)
    if b.n_link_chars * cfg.max_link_density_den > b.n_chars * cfg.max_link_density_num:
        return False
    # short-block drop — but headings/captions already returned above, and a
    # short block sandwiched by content is kept by the sparse mode only
    if b.n_chars < cfg.min_block_chars:
        return cfg.seg_mode == "sparse"
    if cfg.min_text_density > 0 and b.n_words > 0:
        # text density proxy: average word length * words per "line" of 80
        # chars — integer: chars per line-count where lines = ceil(chars/80)
        lines = (b.n_chars + 79) // 80
        if b.n_chars < cfg.min_text_density * lines:
            return False
    return True


def confidence(b: Block) -> int:
    """Integer confidence 0–100: margin-style score from the same integer
    features the keep/drop rule uses (reference conf range 0-100,
    ``src/api.rs:114-120``)."""
    score = 30
    score += min(40, 2 * b.n_words)
    if b.n_chars > 0 and 3 * b.n_link_chars <= b.n_chars:
        score += 20
    if b.block_type in (FLOWING_TEXT, HEADING_TEXT):
        score += 10
    elif b.block_type in (NAV, BOILERPLATE, NOISE):
        score -= 20
    return max(0, min(100, score))


def _article_refine(blocks: list[Block]) -> None:
    """``seg_mode='article'``: keep only the densest contiguous chain of
    content blocks (Readability-style main-content locate), all in
    integer arithmetic.

    Score per block: +n_chars if kept, −40 per dropped block in a gap.
    The maximum-sum contiguous window (Kadane over block scores) is the
    article body; kept blocks outside it are demoted — headings directly
    adjacent to the window survive."""
    scores = [(b.n_chars if b.is_content else -40) for b in blocks]
    best_sum = cur_sum = 0
    best_lo = best_hi = cur_lo = 0
    for i, s in enumerate(scores):
        if cur_sum <= 0:
            cur_sum = s
            cur_lo = i
        else:
            cur_sum += s
        if cur_sum > best_sum:
            best_sum, best_lo, best_hi = cur_sum, cur_lo, i
    if best_sum <= 0:
        return
    for i, b in enumerate(blocks):
        if b.is_content and not (best_lo <= i <= best_hi):
            # adjacent heading just before the window survives
            if b.block_type == HEADING_TEXT and i == best_lo - 1:
                continue
            b.is_content = False


def classify_blocks(blocks: list[Block], cfg: ExtractionConfig) -> None:
    """Label every block in place: type, keep/drop, confidence.

    ``scope_prefix`` restricts content to a tag-path subtree — the
    ``set_rectangle`` region-of-interest analogue (``src/api.rs:1289-1296``)."""
    for b in blocks:
        b.block_type = assign_type(b)
        b.is_content = is_content(b, cfg)
        if cfg.scope_prefix and not b.parent_path.startswith(cfg.scope_prefix):
            b.is_content = False
        b.confidence = confidence(b)
    if cfg.seg_mode == "article":
        _article_refine(blocks)
