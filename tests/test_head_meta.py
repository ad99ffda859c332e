"""Head-metadata extraction: canonical / robots / refresh parsing."""

import pyarrow as pa
import ray.data as rd

from xtract.links import extract_head_meta, extract_head_meta_one


def _one(html: str, url: str = "https://h.example.org/p/1"):
    return extract_head_meta_one(html.encode(), url)


def test_defaults_when_no_metadata():
    assert _one("<html><body><p>x</p></body></html>") == \
        (None, False, False, None)


def test_canonical_relative_resolved_and_rel_token_list():
    can, *_ = _one('<head><link rel="alternate CANONICAL" '
                   'href="/c/9"></head>')
    assert can == "https://h.example.org/c/9"


def test_canonical_first_wins():
    can, *_ = _one('<link rel="canonical" href="https://a.example.net/1">'
                   '<link rel="canonical" href="https://b.example.net/2">')
    assert can == "https://a.example.net/1"


def test_link_without_href_or_wrong_rel_ignored():
    can, *_ = _one('<link rel="canonical">'
                   '<link rel="stylesheet" href="/style.css">')
    assert can is None


def test_robots_union_and_none_directive():
    _, noi, nof, _ = _one('<meta name="robots" content="noindex">'
                          '<meta name="ROBOTS" content="NOFOLLOW">')
    assert noi and nof
    _, noi, nof, _ = _one('<meta name="robots" content="none">')
    assert noi and nof
    _, noi, nof, _ = _one('<meta name="robots" content="index, follow">')
    assert not noi and not nof


def test_refresh_target_quoted_and_unquoted():
    *_, ref = _one('<meta http-equiv="refresh" content="0;url=/next">')
    assert ref == "https://h.example.org/next"
    *_, ref = _one("<meta http-equiv='Refresh' "
                   "content=\"5; URL='https://x.example.com/a'\">")
    assert ref == "https://x.example.com/a"


def test_refresh_without_url_is_none():
    *_, ref = _one('<meta http-equiv="refresh" content="30">')
    assert ref is None


def test_dataset_stage_skips_null_html(ray_session):
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["https://a.example.org/", "https://b.example.org/"]),
        "html": pa.array(
            [b'<link rel="canonical" href="/c">', None], pa.binary())}))
    df = extract_head_meta(pages).to_pandas()
    assert len(df) == 1
    assert df.loc[0, "canonical_url"] == "https://a.example.org/c"
    assert not df.loc[0, "robots_noindex"]


def test_base_href_rebases_relative_targets():
    can, _, _, ref = _one(
        '<base href="https://b.example.net/dir/">'
        '<link rel="canonical" href="/c/1">'
        '<meta http-equiv="refresh" content="0;url=sub/x">')
    assert can == "https://b.example.net/c/1"
    assert ref == "https://b.example.net/dir/sub/x"


def test_base_href_first_wins_and_absolute_unaffected():
    can, *_ = _one(
        '<base href="https://b1.example.net/"><base href="https://b2.example.net/">'
        '<link rel="canonical" href="https://abs.example.com/x">')
    assert can == "https://abs.example.com/x"


def test_base_href_in_outlinks():
    from xtract.links import extract_links

    links = extract_links(
        b'<a href="/pre">pre</a><base href="https://b.example.net/d/">'
        b'<a href="rel">rel</a>', "https://h.example.org/p/1")
    assert links == [("https://h.example.org/pre", "pre"),
                     ("https://b.example.net/d/rel", "rel")]


def test_extract_tables_grid_recovery_nesting():
    """Grid indices, entity decode, unclosed-cell recovery, nested
    table folding, second top-level table."""
    from xtract.tables import extract_tables_one

    h = (b"<html><table><tr><th>Name</th><th>Qty</th></tr>"
         b"<tr><td>apples &amp; pears</td><td>3<table><tr><td>inner"
         b"</td></tr></table>x</td>"
         b"<tr><td>unclosed row<td>next cell</table><p>after</p>"
         b"<table><tr><td>second table</td></tr></table>")
    assert extract_tables_one(h) == [
        (0, 0, 0, "Name", True),
        (0, 0, 1, "Qty", True),
        (0, 1, 0, "apples & pears", False),
        (0, 1, 1, "3innerx", False),
        (0, 2, 0, "unclosed row", False),
        (0, 2, 1, "next cell", False),
        (1, 0, 0, "second table", False),
    ]


def test_extract_tables_never_crashes_on_byte_soup():
    import random

    from xtract.tables import extract_tables_one

    rng = random.Random(5)
    frags = [b"<table>", b"</table>", b"<tr>", b"<td>", b"</td>", b"<th>",
             b"txt", b"&amp;", b"<", b">", b"\xff\xfe", b"</tr>", b"<a>"]
    for _ in range(200):
        soup = b"".join(rng.choice(frags)
                        for _ in range(rng.randint(0, 40)))
        for t, r, c, txt, hdr in extract_tables_one(soup):
            assert t >= 0 and r >= 0 and c >= 0


def test_extract_headings_recovery_and_nesting():
    from xtract.tables import extract_headings_one

    h = b"<h1>Top &amp; main</h1><p>x</p><h2>Sec <b>one</b></h2><h3>tail"
    assert extract_headings_one(h) == [
        (1, "Top & main"), (2, "Sec one"), (3, "tail")]
    # a new heading implicitly closes an open one; self-closing is empty
    assert extract_headings_one(b"<h2>a<h3>b</h3><h4/>") == [
        (2, "a"), (3, "b"), (4, "")]
    assert extract_headings_one(b"") == []


def test_extract_images_base_href_and_skip():
    from xtract.tables import extract_images_one

    h = (b"<base href='/imgs/'><img src='a.png' alt='first &amp; best'>"
         b"<img alt='no src'><img src='http://x.com/b.jpg'/>")
    assert extract_images_one(h, "https://h.example.org/p/1") == [
        ("https://h.example.org/imgs/a.png", "first & best"),
        ("http://x.com/b.jpg", ""),
    ]
    assert extract_images_one(b"", "u") == []
