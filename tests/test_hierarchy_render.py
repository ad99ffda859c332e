"""Hierarchy explosion (H1-H17) + renderer projections (M3-M7)."""

import pytest

from xtract.hierarchy import LEVELS, explode_blocks, is_valid_word
from xtract.oracle import oracle_extract
from xtract.render import EXTENSIONS, RENDERERS, register_renderer

HTML = (b"<html><body><h1>Big Title Words</h1>"
        b"<p>First line words<br>second line words 42 here</p>"
        b"<ul><li>item one words</li></ul></body></html>")


def rows(levels=LEVELS):
    r = oracle_extract(HTML, collect_blocks=True)
    return explode_blocks("u", r["blocks"], levels), r


def test_levels_present():
    rs, _ = rows()
    assert {r["level"] for r in rs} == set(LEVELS)


def test_level_filter_is_row_filter():
    rs, _ = rows(levels=("word",))
    assert rs and all(r["level"] == "word" for r in rs)


def test_word_spans_valid_and_text_matches():
    rs, r = rows(levels=("word",))
    bt = {b.block_id: b.text for b in r["blocks"]}
    for w in rs:
        assert w["span_end"] > w["span_start"]  # bbox validity analogue
        assert bt[w["block_id"]][w["span_start"]:w["span_end"]] == w["text"]


def test_first_last_flags():
    rs, _ = rows(levels=("word",))
    line0 = [r for r in rs if r["block_id"] == 1 and r["line_id"] == 0]
    assert line0[0]["is_first_in_parent"] and not line0[0]["is_last_in_parent"]
    assert line0[-1]["is_last_in_parent"]


def test_line_split_on_br():
    rs, _ = rows(levels=("line",))
    blk1 = [r for r in rs if r["block_id"] == 1]
    assert [r["text"] for r in blk1] == ["First line words",
                                        "second line words 42 here"]


def test_numeric_flag():
    rs, _ = rows(levels=("word",))
    w42 = next(r for r in rs if r["text"] == "42")
    assert w42["is_numeric"]


def test_dict_word():
    assert is_valid_word("Words,", frozenset({"words"}))
    assert not is_valid_word("zzz", frozenset({"words"}))


def test_renderers_all_formats():
    r = oracle_extract(HTML, collect_blocks=True)
    for name, fn in RENDERERS.items():
        out = fn("http://u", r["blocks"])
        assert isinstance(out, str) and out, name
        assert name in EXTENSIONS


def test_hocr_has_structure():
    r = oracle_extract(HTML, collect_blocks=True)
    h = RENDERERS["hocr"]("http://u", r["blocks"])
    assert "ocr_carea" in h and "bbox" in h and "x_wconf" in h


def test_tsv_row_count():
    r = oracle_extract(HTML, collect_blocks=True)
    tsv = RENDERERS["tsv"]("u", r["blocks"])
    assert len(tsv.splitlines()) == 1 + len(r["blocks"])


def test_unlv_ascii_only():
    r = oracle_extract("<p>café naïve übermäßig words here</p>".encode(),
                       collect_blocks=True)
    out = RENDERERS["unlv"]("u", r["blocks"])
    assert out and all(ord(c) < 128 for c in out)


def test_register_renderer():
    register_renderer("upper", lambda u, bs: " ".join(
        b.text.upper() for b in bs if b.is_content), "up")
    try:
        r = oracle_extract(HTML, collect_blocks=True)
        out = RENDERERS["upper"]("u", r["blocks"])
        assert "ITEM ONE WORDS" in out and "BIG TITLE WORDS" in out
    finally:
        RENDERERS.pop("upper"), EXTENSIONS.pop("upper")


def test_unknown_renderer_rejected():
    from xtract.render import RenderStage

    with pytest.raises(ValueError):
        RenderStage(formats=("nope",))


def test_markdown_structure():
    html = (b"<html><body><h2>Title Words Here</h2>"
            b"<p>Plain paragraph with many words here</p>"
            b"<ul><li>item one words here</li><li>item two words here</li></ul>"
            b"<blockquote><p>quoted words in the block here</p></blockquote>"
            b"<pre>code words preserved here</pre>"
            b"<p><b>bold words emphasised strongly here</b></p></body></html>")
    r = oracle_extract(html, collect_blocks=True)
    md = RENDERERS["markdown"]("u", r["blocks"])
    assert "## Title Words Here" in md
    assert "- item one words here" in md
    assert "> quoted words in the block here" in md
    assert "```\ncode words preserved here\n```" in md
    assert "**bold words emphasised strongly here**" in md
    assert "Plain paragraph with many words here" in md
    # boilerplate (nav) never reaches markdown
    html2 = (b"<html><body><nav><a href='/a'>nav link</a></nav>"
             b"<p>real content words in this paragraph here</p></body></html>")
    r2 = oracle_extract(html2, collect_blocks=True)
    md2 = RENDERERS["markdown"]("u", r2["blocks"])
    assert "nav link" not in md2 and "real content words" in md2
    assert EXTENSIONS["markdown"] == "md"
