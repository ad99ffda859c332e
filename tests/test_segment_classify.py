"""Segmentation + classification: block structure, spans, taxonomy,
densities — the invariants family (SURVEY §5.2 item 3, mirroring
reference tests/test_iterators.rs bbox/conf invariants)."""

from xtract.classify import classify_blocks
from xtract.config import DEFAULT_CONFIG, ExtractionConfig
from xtract.segment import segment

PAGE = b"""<html><head><title>T</title></head><body>
<nav><a href=a>A</a> <a href=b>B</a> <a href=c>C</a></nav>
<h2>Heading here</h2>
<p>First paragraph with plenty of words to clear the minimum threshold.</p>
<p align="center">Centered paragraph also has enough words to be kept around.</p>
<ul><li>item one of the list</li><li>item two of the list</li></ul>
<table><caption>Cap text</caption><tr><td>cell a data</td></tr></table>
<blockquote>A quoted passage with sufficient words to be retained fully.</blockquote>
<footer>c 2026 <a href=t>T</a></footer>
</body></html>"""


def _classified(html=PAGE, cfg=DEFAULT_CONFIG):
    blocks = segment(html)
    classify_blocks(blocks, cfg)
    return blocks


def test_block_ids_are_document_ordered():
    blocks = _classified()
    assert [b.block_id for b in blocks] == list(range(len(blocks)))


def test_span_validity():
    # bbox-validity analogue: tests/test_iterators.rs:172-211
    for b in _classified():
        assert 0 <= b.span_start < b.span_end <= len(PAGE)
        for s, e in b.spans:
            assert s < e


def test_taxonomy_assignment():
    types = {b.text[:12]: b.block_type for b in _classified()}
    assert types["T"] == "TITLE"
    assert types["Heading here"] == "HEADING_TEXT"
    assert types["item one of "] == "LIST"
    assert types["Cap text"] == "CAPTION_TEXT"
    assert types["cell a data"] == "TABLE"
    assert types["A quoted pas"] == "PULLOUT_TEXT"
    assert types["A B C"] == "NAV"


def test_confidence_range():
    # conf in [0,100]: tests/test_iterators.rs:64-87 analogue
    for b in _classified():
        assert 0 <= b.confidence <= 100


def test_link_density_drop():
    blocks = _classified()
    nav = next(b for b in blocks if b.block_type == "NAV")
    assert not nav.is_content
    para = next(b for b in blocks if b.text.startswith("First paragraph"))
    assert para.is_content


def test_justification_attr():
    blocks = _classified()
    cent = next(b for b in blocks if b.text.startswith("Centered"))
    assert cent.justification == "CENTER"


def test_list_item_flag():
    li = next(b for b in _classified() if b.block_type == "LIST")
    assert li.is_list_item


def test_raw_mode_keeps_everything_but_title():
    cfg = ExtractionConfig(seg_mode="raw")
    blocks = _classified(cfg=cfg)
    for b in blocks:
        assert b.is_content == (b.block_type != "TITLE")


def test_scope_prefix_restricts():
    cfg = ExtractionConfig(scope_prefix="html[1]/body[1]/ul[1]")
    kept = [b for b in _classified(cfg=cfg) if b.is_content]
    assert kept and all(b.block_type == "LIST" for b in kept)


def test_styled_flags():
    html = (b"<p>plain <b>bold words</b> <em>italic words</em> "
            b"<code>mono()</code> x<sup>2</sup> H<sub>2</sub>O more text here</p>")
    b = segment(html)[0]
    assert b.is_bold and b.is_italic and b.is_mono and b.has_sup and b.has_sub


def test_implied_p_close():
    blocks = segment(b"<p>first para words<p>second para words")
    assert [b.text for b in blocks] == ["first para words", "second para words"]
    assert blocks[1].parent_path.endswith("p[2]")


def test_li_implied_close_and_paths():
    blocks = segment(b"<ul><li>one<li>two</ul>")
    assert [b.text for b in blocks] == ["one", "two"]
    assert blocks[0].parent_path.endswith("li[1]")
    assert blocks[1].parent_path.endswith("li[2]")


def test_br_makes_line_not_block():
    blocks = segment(b"<p>line one<br>line two</p>")
    assert len(blocks) == 1
    assert blocks[0].text == "line one\nline two"


def test_entities_decoded():
    blocks = segment(b"<p>fish &amp; chips &lt;tag&gt; &#65;</p>")
    assert blocks[0].text == "fish & chips <tag> A"


def test_nbsp_is_whitespace():
    blocks = segment(b"<p>a&nbsp;&nbsp;b</p>")
    assert blocks[0].text == "a b"


def test_stray_end_tag_ignored():
    blocks = segment(b"<p>text before</i></div> text after</p>")
    assert blocks[0].text == "text before text after"


def test_whitespace_only_page_yields_no_blocks():
    assert segment(b"  \n\t  <div>   </div>") == []


def test_self_closing_slash_ignored_on_normal_elements():
    # HTML5: <div/> does NOT close — following text is inside the div
    blocks = segment(b'<div/>inside the div words here</div>after div words now')
    assert blocks[0].parent_path.endswith("div[1]")
    assert blocks[0].text == "inside the div words here"
    assert blocks[1].text == "after div words now"


def test_self_closed_script_is_empty():
    blocks = segment(b"<script/>visible words after empty script element")
    assert len(blocks) == 1 and blocks[0].text.startswith("visible words")
