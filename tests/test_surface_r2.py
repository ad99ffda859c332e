"""Round-2 reference-surface additions: monitor deadline/progress (C1),
language restriction + assets-dir discovery (A13), box variants (M6),
sidecar sink (S7), debug intermediate (M10), per-block direction (H9),
scope barriers, base64 sniffing."""

import json
import os

import pytest

from xtract.config import DEFAULT_CONFIG, ExtractionConfig
from xtract.extract import extract_document
from xtract.monitor import ExtractionCancelled, Monitor


BIG_HTML = ("<html><body>" +
            "".join(f"<p>paragraph number {i} with several words of body "
                    f"text inside</p>" for i in range(4000)) +
            "</body></html>").encode()


# ---------------------------------------------------------------------------
# C1: per-document deadline + progress (TessMonitor analogue)
# ---------------------------------------------------------------------------

def test_deadline_aborts_mid_parse():
    mon = Monitor(deadline_ms=0)
    mon.set_deadline_ms(0)
    mon.deadline_ms = 1
    mon._t0 -= 1.0  # already expired → first check aborts
    r = extract_document(BIG_HTML, None, None, DEFAULT_CONFIG, monitor=mon)
    assert r["status"] == "timeout"
    assert r["content_text"] == ""      # deterministic empty content
    assert "expired" in r["error"]
    assert mon.get_progress() < 100


def test_monitor_progress_reaches_100():
    mon = Monitor()  # no deadline
    r = extract_document(BIG_HTML, None, None, DEFAULT_CONFIG, monitor=mon)
    assert r["status"] == "ok"
    assert mon.get_progress() == 100


def test_monitor_cancel():
    mon = Monitor()
    mon.cancel()
    r = extract_document(BIG_HTML, None, None, DEFAULT_CONFIG, monitor=mon)
    assert r["status"] == "timeout"


def test_monitor_check_raises():
    mon = Monitor(deadline_ms=1)
    mon._t0 -= 1.0
    with pytest.raises(ExtractionCancelled):
        mon.check()


# ---------------------------------------------------------------------------
# A13 / init(language): cfg.langs restriction + assets-dir discovery
# ---------------------------------------------------------------------------

def test_langs_restriction_changes_detection():
    html = b"<html><body><p>the quick brown fox and the lazy dog sit in the warm morning light</p></body></html>"
    full = extract_document(html, None, None, DEFAULT_CONFIG)
    assert full["lang_detected"] == "en"
    restricted = extract_document(html, None, None,
                                  ExtractionConfig(langs=("tr",)))
    assert restricted["lang_detected"] == "und"   # English evidence invisible


def test_loaded_langs_honors_config():
    from xtract.actors import Extractor

    ex = Extractor(ExtractionConfig(langs=("tr", "de")))
    assert ex.loaded_langs() == ("de", "tr")


def test_available_langs_discovery(tmp_path):
    from xtract.langdetect import LANGS, available_langs

    assert available_langs() == tuple(sorted(LANGS))
    (tmp_path / "xx.langdata.json").write_text(
        json.dumps({"stopwords": ["zqx", "wvu", "ppn"]}))
    (tmp_path / "junk.txt").write_text("not a langdata file")
    got = available_langs(str(tmp_path))
    assert "xx" in got and set(LANGS) <= set(got)


def test_assets_dir_language_actually_loads(tmp_path):
    (tmp_path / "xx.langdata.json").write_text(
        json.dumps({"stopwords": ["zqx", "wvu", "ppn", "qqr"]}))
    cfg = ExtractionConfig(langs=("xx", "en"), assets_dir=str(tmp_path))
    html = b"<html><body><p>zqx wvu ppn qqr zqx wvu ppn qqr zqx wvu ppn</p></body></html>"
    r = extract_document(html, None, None, cfg)
    assert r["lang_detected"] == "xx"
    from xtract.actors import Extractor

    ex = Extractor(cfg)
    assert "xx" in ex.available_langs() and "xx" in ex.loaded_langs()


# ---------------------------------------------------------------------------
# M6 box variants + S7 sidecar renderer
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def simple_blocks():
    r = extract_document(
        b"<html><body><p>alpha beta</p><p>gamma<br>delta</p></body></html>",
        None, None, DEFAULT_CONFIG, collect_blocks=True)
    return r["blocks"]


def test_box_lstm_variant(simple_blocks):
    from xtract.render import render_box_lstm

    out = render_box_lstm("u", simple_blocks)
    lines = out.split("\n")
    # one row per character plus a tab terminator per text line
    assert any(l.startswith("a ") for l in lines)
    assert any(l.startswith("\t ") for l in lines)
    # every char of 'alpha beta' appears with the line's span
    assert lines[0].split()[0] == "a"


def test_box_wordstr_variant(simple_blocks):
    from xtract.render import render_box_wordstr

    out = render_box_wordstr("u", simple_blocks)
    assert out.startswith("WordStr ")
    assert "#alpha beta" in out


def test_sidecar_renderer_json(simple_blocks):
    from xtract.render import render_sidecar

    payload = json.loads(render_sidecar("http://u", simple_blocks))
    assert payload["url"] == "http://u"
    assert "alpha beta" in payload["text"]
    assert payload["spans"] and all(e > s for s, e in payload["spans"])
    assert payload["blocks"][0]["id"] == 0


def test_render_registry_has_new_formats():
    from xtract.render import EXTENSIONS, RENDERERS

    for f in ("box_lstm", "box_wordstr", "sidecar"):
        assert f in RENDERERS and f in EXTENSIONS
    assert EXTENSIONS["sidecar"] == "json"


def test_sidecar_job_sink(ray_session, tmp_path):
    import glob

    from xtract.pipeline import run_extraction_job
    from xtract.synth import synth_pages_dataset

    pages = synth_pages_dataset("/root/testdata/sf0.001").limit(40)
    src = str(tmp_path / "src")
    pages.repartition(2).write_parquet(src)
    files = sorted(glob.glob(src + "/*.parquet"))
    out = str(tmp_path / "out")
    run_extraction_job(files, out, DEFAULT_CONFIG, shard_size=4,
                       write_sidecar=True)
    sjs = glob.glob(os.path.join(out, "shard=*", "sidecar", "*.json"))
    assert sjs
    with open(sjs[0]) as f:
        row = json.loads(f.readline())
    assert "url" in row and "content_text" in row and "content_spans" in row


# ---------------------------------------------------------------------------
# M10 debug intermediate
# ---------------------------------------------------------------------------

def test_debug_cleaned_html_column(ray_session):
    import ray.data as rd

    from xtract.pipeline import extract_pages

    pages = rd.from_items([{
        "url": "http://a", "warc_ts": None,
        "html": b"<html><body><nav>menu</nav><p>real body text here for sure</p></body></html>",
        "text": None, "lang": None}])
    plain = extract_pages(pages).to_pandas()
    assert "cleaned_html" not in plain.columns
    dbg = extract_pages(pages, ExtractionConfig(debug=True)).to_pandas()
    assert "cleaned_html" in dbg.columns
    # the debug intermediate includes boilerplate the output dropped
    assert "menu" in dbg.cleaned_html.iloc[0]
    assert "menu" not in dbg.content_text.iloc[0]


# ---------------------------------------------------------------------------
# H9 per-block direction
# ---------------------------------------------------------------------------

def test_per_block_dir_column():
    from xtract.hierarchy import explode_blocks

    html = ("<html><body><p>plain english paragraph with words</p>"
            "<p>שלום עולם "
            "טקסט עברי</p>"
            "</body></html>").encode()
    r = extract_document(html, None, None, DEFAULT_CONFIG, collect_blocks=True)
    rows = explode_blocks("u", r["blocks"], ("block",))
    dirs = {row["text"][:5]: row["dir"] for row in rows}
    assert "ltr" in dirs.values() and "rtl" in dirs.values()


# ---------------------------------------------------------------------------
# scope barriers (malformed nesting)
# ---------------------------------------------------------------------------

def test_stray_end_tag_does_not_cross_table_boundary():
    from xtract.segment import segment

    # the stray </div> inside the cell must not close the outer div:
    # 'after' stays inside the outer div's scope and still flushes
    html = (b"<html><body><div><table><tr><td>cell text here</div></td></tr>"
            b"</table><p>after table paragraph text</p></div></body></html>")
    blocks = segment(html)
    texts = [b.text for b in blocks]
    assert any("cell text" in t for t in texts)
    assert any("after table" in t for t in texts)


def test_table_end_tag_closes_through_open_cell():
    from xtract.segment import segment

    html = (b"<html><body><table><tr><td>cell stuff</table>"
            b"<p>outside paragraph body text</p></body></html>")
    blocks = segment(html)
    # the </table> closed through the unclosed td; the p flushed normally
    assert any("outside paragraph" in b.text for b in blocks)


# ---------------------------------------------------------------------------
# base64 sniffing
# ---------------------------------------------------------------------------

def test_base64_lookalike_text_not_decoded():
    import pyarrow as pa

    from xtract.sources import _normalize_batch

    batch = pa.table({"url": ["http://a", "http://b"],
                      "html": ["Data1234",  # valid base64, but plain text
                               "PGh0bWw+PGJvZHk+aGk8L2JvZHk+PC9odG1sPg=="]})
    out = _normalize_batch(batch)
    hs = out["html"].to_pylist()
    assert hs[0] == b"Data1234"                      # kept as utf-8 text
    assert hs[1] == b"<html><body>hi</body></html>"  # real base64 decoded


def test_explicit_encoding_column_wins():
    import base64

    import pyarrow as pa

    from xtract.sources import _normalize_batch

    payload = base64.b64encode(b"plain words no markup").decode()
    batch = pa.table({"url": ["u1", "u2"],
                      "html": [payload, payload],
                      "html_encoding": ["base64", "text"]})
    out = _normalize_batch(batch)
    hs = out["html"].to_pylist()
    assert hs[0] == b"plain words no markup"
    assert hs[1] == payload.encode()


def test_deadline_through_ray_pipeline(ray_session):
    import ray.data as rd

    from xtract.pipeline import extract_pages

    big = ("<html><body>" +
           "".join(f"<p>paragraph {i} body text with several words</p>"
                   for i in range(20000)) +
           "</body></html>").encode()
    pages = rd.from_items([
        {"url": "http://huge", "warc_ts": None, "html": big,
         "text": None, "lang": None},
        {"url": "http://ok", "warc_ts": None,
         "html": b"<html><body><p>small but sufficient body text</p></body></html>",
         "text": None, "lang": None},
    ])
    out = extract_pages(pages, ExtractionConfig(timeout_ms=1)).to_pandas()
    st = dict(zip(out.url, out.status))
    assert st["http://huge"] == "timeout"
    assert out[out.url == "http://huge"].content_text.iloc[0] == ""
