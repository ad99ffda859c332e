"""DOM stack rules: element categories and deterministic implied-close map.

A simplified, fully-specified subset of the HTML5 tree-construction
rules.  We never build a materialized tree — segmentation (segment.py)
is a single-pass stack machine over the token stream — but the *rules*
for what nests where live here so the oracle and the engine agree
byte-for-byte on malformed input (reference analogue: the fixed layout
taxonomy of ``TessPolyBlockType``, ``src/enums.rs:72-89``, and the
strict input validation of ``set_image``, ``src/api.rs:1196-1239``).
"""

from __future__ import annotations

#: Void elements: never pushed on the open stack.
VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

#: Elements that open/close a text block boundary.
BLOCK_ELEMENTS = frozenset(
    (
        "address article aside blockquote body caption center dd details dialog "
        "div dl dt fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 head "
        "header hgroup hr html iframe legend li main menu nav ol option p pre "
        "section select summary table tbody td textarea tfoot th thead title tr ul"
    ).split()
)

#: Start tags that imply </p> when a <p> is open (HTML5 "closes a p element").
CLOSES_P = frozenset(
    (
        "address article aside blockquote center details dialog div dl fieldset "
        "figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr li main "
        "menu nav ol p pre section summary table ul"
    ).split()
)

#: tag -> set of open tags it implicitly closes when one of them is the
#: nearest enclosing element of that family (HTML5 implied end tags,
#: simplified to the cases that matter for segmentation).
IMPLIED_CLOSE: dict[str, frozenset] = {
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr", "td", "th"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "option": frozenset({"option"}),
    "p": frozenset({"p"}),
    "thead": frozenset({"tr", "td", "th", "tbody"}),
    "tbody": frozenset({"tr", "td", "th", "thead"}),
    "tfoot": frozenset({"tr", "td", "th", "tbody"}),
}

#: Scope barriers: an end-tag search for a NON-table tag never crosses
#: these (HTML5 "has an element in table scope", simplified): a stray
#: </div> inside a table cell must not close a div outside the table.
#: Table-family end tags (TABLE_TAGS) cross cells — so a bare </table>
#: still closes through an unclosed <td> — but never html/body.
SCOPE_BARRIERS = frozenset("html body table td th caption".split())

#: Table-family tags whose end-tag search may cross cell boundaries.
TABLE_TAGS = frozenset("table td th tr caption thead tbody tfoot".split())

#: Inline style containers tracked as depth counters during the walk
#: (word_font_attributes analogue, reference src/result_iterator.rs:96-138).
BOLD_TAGS = frozenset({"b", "strong"})
ITALIC_TAGS = frozenset({"i", "em"})
MONO_TAGS = frozenset({"code", "pre", "kbd", "samp", "tt"})
SUP_TAGS = frozenset({"sup"})
SUB_TAGS = frozenset({"sub"})

#: Boilerplate containers (ancestry ⇒ candidate drop).
BOILER_TAGS = frozenset({"nav", "footer", "aside", "header", "menu"})

HEADING_TAGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
CELL_TAGS = frozenset({"td", "th"})
CAPTION_TAGS = frozenset({"caption", "figcaption"})
LIST_ITEM_TAGS = frozenset({"li", "dt", "dd"})
