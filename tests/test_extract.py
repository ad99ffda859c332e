"""Per-document extraction spec: statuses, doc kinds, char filter on
every path, span invariants, reassembly round-trip."""

from xtract.config import DEFAULT_CONFIG, ExtractionConfig
from xtract.oracle import oracle_extract


def test_article_happy_path():
    html = (b"<html><body><h1>Title words</h1><p>This is a sample text for "
            b"OCR testing. Plenty of words follow to keep this block.</p>"
            b"</body></html>")
    r = oracle_extract(html)
    assert r["status"] == "ok" and r["doc_kind"] == "html"
    assert "This is a sample text for OCR testing." in r["content_text"]


def test_spans_sorted_nonoverlapping():
    html = (b"<p>alpha beta gamma delta words</p><p>second block of words "
            b"here too</p>")
    r = oracle_extract(html)
    spans = r["content_spans"]
    assert spans
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s1 < e1 <= s2 < e2
    # spans point at real source text
    assert b"alpha beta" in html[spans[0][0]:spans[0][1]]


def test_reassembly_roundtrip():
    """Joining kept blocks' text == content_text (explode/reassemble
    invariant, SURVEY §5.2 item 3)."""
    html = (b"<h1>Head words here</h1><p>Body paragraph with enough words "
            b"to be kept around.</p><nav><a href=x>L</a></nav>")
    r = oracle_extract(html, collect_blocks=True)
    joined = "\n\n".join(b.text for b in r["blocks"] if b.is_content)
    assert joined == r["content_text"]


def test_bad_encoding_status():
    r = oracle_extract(b"<p>ok</p>\xff\xfe<p>bad</p>")
    assert r["status"] == "bad_encoding" and r["content_text"] == ""
    assert "byte" in r["error"]


def test_empty_inputs():
    assert oracle_extract(None, None)["status"] == "empty"
    assert oracle_extract(b"", None)["status"] == "empty"
    assert oracle_extract(b"   \n  ")["status"] == "empty"


def test_crawl_text_fallback():
    r = oracle_extract(None, "plain   text\n\n with   gaps")
    assert r["doc_kind"] == "text" and r["content_text"] == "plain text\nwith gaps"


def test_binary_payload_unsupported():
    r = oracle_extract(b"\x00\x01\x02\x03" * 8)
    assert r["doc_kind"] == "binary" and r["status"] == "unsupported_binary"


def test_char_whitelist_all_paths():
    cfg = ExtractionConfig(char_whitelist="0123456789")
    html = b"<p>Call 555 1234 now</p>"
    assert oracle_extract(html, cfg=cfg)["content_text"] == "555 1234"
    # crawl-text path honours it too
    assert oracle_extract(None, "abc 77 def 88", cfg=cfg)["content_text"] == "77 88"


def test_char_blacklist():
    cfg = ExtractionConfig(char_blacklist="aeiou")
    r = oracle_extract(b"<p>education nation and administration</p>", cfg=cfg)
    assert r["content_text"] == "dctn ntn nd dmnstrtn"


def test_segment_only_mode():
    cfg = ExtractionConfig(segment_only=True)
    r = oracle_extract(b"<p>words to segment but not assemble</p>", cfg=cfg,
                       collect_blocks=True)
    assert r["content_text"] == "" and r["blocks"]


def test_counters_consistent():
    html = (b"<nav><a href=x>drop me</a></nav><p>keep this block of many "
            b"fine words here</p>")
    r = oracle_extract(html, collect_blocks=True)
    assert r["n_blocks_kept"] + r["n_blocks_dropped"] == len(r["blocks"])
    assert r["n_blocks_kept"] == 1
    assert 0 <= r["mean_conf"] <= 100


def test_determinism_repeated_calls():
    html = (b"<html><body><p>Deterministic content with a fixed set of "
            b"words repeated over runs.</p></body></html>")
    a = oracle_extract(html)
    b = oracle_extract(html)
    assert a["content_text"] == b["content_text"]
    assert a["content_spans"] == b["content_spans"]
    assert a["mean_conf"] == b["mean_conf"]


def test_meta_charset_transcode():
    body = ('<html><head><meta charset="iso-8859-1"></head><body>'
            '<p>café naïve résumé with enough words to keep this block</p>'
            '</body></html>')
    r = oracle_extract(body.encode("latin-1"))
    assert r["status"] == "ok" and "café naïve résumé" in r["content_text"]
    assert r["error"] == "transcoded from latin-1"


def test_unknown_charset_stays_bad():
    body = '<meta charset="x-weird"><p>data \xff here</p>'
    r = oracle_extract(body.encode("latin-1"))
    assert r["status"] == "bad_encoding"
