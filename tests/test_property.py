"""Property-based robustness: arbitrary byte soup and malformed markup
must never raise, always yield a valid typed row, hold span invariants,
and be bit-deterministic (SURVEY §5.2 / hard part (b))."""

from hypothesis import given, settings
from hypothesis import strategies as st

from xtract.config import DEFAULT_CONFIG
from xtract.extract import extract_document
from xtract.segment import segment

TAGS = ["p", "div", "b", "i", "ul", "li", "table", "td", "a", "h1", "br",
        "span", "nav", "script", "style", "title", "blockquote"]

markup = st.recursive(
    st.text(max_size=40),
    lambda inner: st.builds(
        lambda tag, body, close: f"<{tag}>" + body + (f"</{tag}>" if close else ""),
        st.sampled_from(TAGS), inner, st.booleans()),
    max_leaves=20,
)


@settings(max_examples=120, deadline=None)
@given(markup)
def test_markup_never_raises_and_deterministic(doc: str):
    data = doc.encode("utf-8")
    a = extract_document(data, None, None, DEFAULT_CONFIG)
    b = extract_document(data, None, None, DEFAULT_CONFIG)
    assert a["status"] in ("ok", "empty", "bad_encoding", "unsupported_binary",
                           "parse_error", "timeout")
    assert a["content_text"] == b["content_text"]
    assert a["content_spans"] == b["content_spans"]
    # spans sorted, non-overlapping, inside the document
    spans = a["content_spans"]
    prev_end = 0
    for s, e in spans:
        assert 0 <= s < e <= len(data)
        assert s >= prev_end
        prev_end = e


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=400))
def test_byte_soup_never_raises(data: bytes):
    r = extract_document(data, None, None, DEFAULT_CONFIG)
    assert isinstance(r["content_text"], str)
    assert r["status"] != "parse_error" or r["error"]


@settings(max_examples=80, deadline=None)
@given(markup)
def test_segment_invariants(doc: str):
    blocks = segment(doc.encode())
    for i, b in enumerate(blocks):
        assert b.block_id == i
        assert b.text.strip(" \n") == b.text
        if b.spans:
            assert b.span_start < b.span_end
        assert b.n_link_chars <= b.n_chars or b.n_chars == 0
