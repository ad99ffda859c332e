"""Tokenizer: byte offsets, recovery rules, raw-text elements."""

from xtract.html_tokenizer import parse_attrs, tokenize


def toks(b: bytes):
    return list(tokenize(b))


def test_offsets_cover_input():
    html = b"<p>hello <b>world</b></p>"
    ts = toks(html)
    # text spans must slice back to the exact source bytes
    assert html[ts[1][1]:ts[1][2]] == b"hello "
    assert [t[0] for t in ts] == ["start", "text", "start", "text", "end", "end"]


def test_literal_lt_is_text():
    ts = toks(b"a < b and a <3 done")
    assert all(t[0] == "text" for t in ts)
    joined = b"".join(b"a < b and a <3 done"[t[1]:t[2]] for t in ts)
    assert joined == b"a < b and a <3 done"


def test_unterminated_comment_to_eof():
    ts = toks(b"x<!-- never closed")
    assert ts[-1][0] == "comment"


def test_script_content_dropped():
    ts = toks(b"<script>var x = '<p>not a tag</p>';</script>after")
    kinds = [t[0] for t in ts]
    assert "text" in kinds
    # the only text token is 'after'
    texts = [t for t in ts if t[0] == "text"]
    assert len(texts) == 1


def test_title_content_kept():
    ts = toks(b"<title>My <Page</title>")
    texts = [t for t in ts if t[0] == "text"]
    assert len(texts) == 1
    assert b"<title>My <Page</title>"[texts[0][1]:texts[0][2]] == b"My <Page"


def test_unterminated_script_to_eof():
    ts = toks(b"<script>forever")
    assert ts[-1][0] == "end" and ts[-1][3] == "script"


def test_attrs_with_gt_in_quotes():
    ts = toks(b'<a href="x>y" title=\'a>b\'>t</a>')
    assert ts[0][0] == "start" and ts[0][3] == "a"
    attrs = parse_attrs(ts[0][4])
    assert attrs["href"] == "x>y" and attrs["title"] == "a>b"


def test_attr_first_occurrence_wins():
    assert parse_attrs(b' id="a" id="b"')["id"] == "a"


def test_self_closing_and_case():
    ts = toks(b"<BR/><IMG src=x>")
    assert ts[0][3] == "br" and ts[0][5] is True
    assert ts[1][3] == "img"
