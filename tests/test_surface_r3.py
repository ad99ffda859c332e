"""Round-3 surface: per-word language on mixed-language pages
(reference src/result_iterator.rs:78-89), per-block classification
alternatives (src/choice_iterator.rs:30-71; ordering contract mirrors
tests/test_iterators.rs:736-769), caller-supplied retry config
(src/api.rs:847-854)."""

import pyarrow as pa
import pytest

from xtract.classify import type_alternatives
from xtract.config import DEFAULT_CONFIG, ExtractionConfig
from xtract.hierarchy import explode_blocks
from xtract.langdetect import LangDetector
from xtract.oracle import oracle_extract

BILINGUAL = (b"<html><body><p>the reading words ve bu bir kitap "
             b"hakkinda ama the ending words in peace</p></body></html>")


def _word_rows(html, detector=None):
    r = oracle_extract(html, collect_blocks=True)
    return explode_blocks("u", r["blocks"], ("word",), detector=detector)


# ---------------------------------------------------------------------------
# per-word language
# ---------------------------------------------------------------------------

def test_per_word_lang_mixed_page():
    det = LangDetector()
    rows = _word_rows(BILINGUAL, detector=det)
    by_text = {r["text"]: r["lang"] for r in rows}
    # words uniquely claimed by Turkish tables override the block label
    assert by_text["ve"] == "tr"
    assert by_text["bu"] == "tr"
    assert by_text["bir"] == "tr"
    assert by_text["ama"] == "tr"
    # words uniquely claimed by English tables
    assert by_text["the"] == "en"
    # unknown words inherit the block language (no spurious flips)
    block_lang = next(r["lang"] for r in rows if r["text"] == "reading")
    assert by_text["words"] == block_lang
    # 'in' is a stopword of several languages → ambiguous → block lang
    assert by_text["in"] == block_lang


def test_per_word_lang_without_detector_keeps_block_lang():
    rows = _word_rows(BILINGUAL, detector=None)
    langs = {r["lang"] for r in rows}
    assert len(langs) == 1  # all inherit the (single) block label


def test_per_word_lang_through_ray(ray_session):
    import ray.data as rd

    from xtract.pipeline import explode_pages

    pages = rd.from_arrow(pa.table({
        "url": ["https://x.example.org/1"],
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": [BILINGUAL],
        "text": [None],
        "lang": ["en"],
    }))
    words = explode_pages(pages, levels=("word",)).to_pandas()
    got = dict(zip(words.text, words.lang))
    assert got["ve"] == "tr" and got["the"] == "en"


# ---------------------------------------------------------------------------
# per-block alternatives (choice lattice)
# ---------------------------------------------------------------------------

ALT_HTML = (b"<html><body><h1>Title Words Here</h1>"
            b"<nav><a href='/a'>one</a> <a href='/b'>two</a></nav>"
            b"<ul><li>item one words</li><li>item two words</li></ul>"
            b"<p>plain flowing paragraph of many ordinary words here</p>"
            b"</body></html>")


def test_block_alternatives_ordering_contract():
    """Mirrors reference tests/test_iterators.rs:736-769: alternatives
    exist, are confidence-descending, and the top choice is the
    assigned label."""
    r = oracle_extract(ALT_HTML, collect_blocks=True)
    rows = explode_blocks("u", r["blocks"], ("block",))
    assert rows
    for row in rows:
        alts = row["alternatives"]
        assert alts, row["block_type"]
        confs = [a["conf"] for a in alts]
        assert confs == sorted(confs, reverse=True)
        assert alts[0]["label"] == row["block_type"]
        assert abs(sum(confs)) <= 1.0 + 1e-6
        assert all(0.0 < a["conf"] <= 1.0 for a in alts)


def test_block_alternatives_ambiguous_vs_plain():
    r = oracle_extract(ALT_HTML, collect_blocks=True)
    rows = explode_blocks("u", r["blocks"], ("block",))
    li = next(x for x in rows if x["block_type"] == "LIST")
    # a list item is structurally ambiguous with flowing text
    assert len(li["alternatives"]) >= 2
    assert li["alternatives"][1]["label"] == "FLOWING_TEXT"
    plain = next(x for x in rows if x["block_type"] == "FLOWING_TEXT")
    assert [a["label"] for a in plain["alternatives"]] == ["FLOWING_TEXT"]
    assert plain["alternatives"][0]["conf"] == 1.0


def test_type_alternatives_top_equals_assign_type():
    from xtract.classify import assign_type

    r = oracle_extract(ALT_HTML, collect_blocks=True)
    for b in r["blocks"]:
        assert type_alternatives(b)[0][0] == assign_type(b) == b.block_type


def test_alternatives_levels_other_than_block_empty():
    r = oracle_extract(ALT_HTML, collect_blocks=True)
    rows = explode_blocks("u", r["blocks"], ("word", "line"))
    assert rows and all(row["alternatives"] == [] for row in rows)


# ---------------------------------------------------------------------------
# caller-supplied retry config
# ---------------------------------------------------------------------------

def _retry_pages():
    ok_html = b"<html><body><p>good page words 123 count here ok</p></body></html>"
    bad_html = (b"<html><body><p>broken page words 456 count here bad"
                b"</p></body></html>")
    bad_html = bad_html[:40] + b"\xff\xfe" + bad_html[40:]  # invalid utf-8
    return pa.table({
        "url": ["https://x.example.org/ok", "https://x.example.org/bad"],
        "warc_ts": pa.array([0, 1], pa.timestamp("us")),
        "html": [ok_html, bad_html],
        "text": [None, None],
        "lang": ["en", "en"],
    })


def test_retry_default_config_unchanged(ray_session):
    import ray.data as rd

    from xtract.pipeline import extract_pages_with_retry

    out = extract_pages_with_retry(rd.from_arrow(_retry_pages())).to_pandas()
    st = dict(zip(out.url, out.status))
    assert st["https://x.example.org/ok"] == "ok"
    assert st["https://x.example.org/bad"] == "ok_lenient"
    bad = out[out.url == "https://x.example.org/bad"].iloc[0]
    assert "456" in bad.content_text


def test_retry_with_caller_config(ray_session):
    """The lenient pass runs under the caller's alternate engine config
    (process_pages(retry_config) analogue): a digit-blacklisting retry
    config changes ONLY the retried row."""
    import ray.data as rd

    from xtract.pipeline import extract_pages_with_retry

    retry_cfg = ExtractionConfig(char_blacklist="0123456789")
    out = extract_pages_with_retry(
        rd.from_arrow(_retry_pages()), retry_cfg=retry_cfg).to_pandas()
    ok = out[out.url == "https://x.example.org/ok"].iloc[0]
    bad = out[out.url == "https://x.example.org/bad"].iloc[0]
    assert "123" in ok.content_text            # strict rows keep digits
    assert bad.status == "ok_lenient"
    assert "456" not in bad.content_text       # retry config applied
    assert "broken page words" in bad.content_text
