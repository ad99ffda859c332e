"""Render-fidelity rules: ruby annotations and form-widget option
lists never contribute extracted text."""

from xtract.config import ExtractionConfig
from xtract.extract import extract_document


def _raw_text(h: bytes) -> str:
    return extract_document(h, None, None,
                            ExtractionConfig(seg_mode="raw"))["content_text"]


def test_ruby_annotations_dropped_base_kept():
    # <ruby>漢<rt>kan</rt>字<rt>ji</rt></ruby>: base text renders in
    # the prose flow, pronunciation gloss does not
    h = ("<p>x <ruby>K<rp>(</rp><rt>kay</rt><rp>)</rp>"
         "J<rt>jay</rt></ruby> y</p>").encode()
    assert _raw_text(h) == "x KJ y"


def test_select_options_dropped():
    assert _raw_text(
        b"<p>pick</p><select><option>one</option>"
        b"<optgroup label='g'><option>two</option></optgroup></select>"
        b"<p>done</p>") == "pick\n\ndone"


def test_datalist_dropped():
    assert _raw_text(
        b"<p>a</p><datalist><option>x</option></datalist><p>b</p>"
    ) == "a\n\nb"


def test_nested_inert_and_br_suppressed():
    assert _raw_text(
        b"<p>a</p><select><option>x<br>y</option>"
        b"<select><option>z</option></select></select><p>b</p>"
    ) == "a\n\nb"


def test_rt_only_inside_flow_unaffected_siblings():
    assert _raw_text(b"<p><rt>gloss</rt>base</p>") == "base"
