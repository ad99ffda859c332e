"""PDF fallback parser + language detection units."""

import zlib

from xtract.langdetect import LangDetector, detect_lang, text_direction
from xtract.oracle import oracle_extract
from xtract.pdf_fallback import extract_pdf_text, is_pdf
from xtract.synth import make_pdf


def _pdf(content: bytes, flate: bool = False) -> bytes:
    body = zlib.compress(content) if flate else content
    filt = b" /Filter /FlateDecode" if flate else b""
    return (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode() + filt +
            b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF")


def test_sniff():
    assert is_pdf(b"%PDF-1.7 x") and not is_pdf(b"<html>")


def test_uncompressed_tj():
    text, spans, st = extract_pdf_text(_pdf(b"BT (Hello world) Tj ET"))
    assert st == "ok" and text == "Hello world" and spans


def test_flate_and_lines():
    content = b"BT 72 720 Td (Line one) Tj 0 -14 TD (Line two) Tj T* (Line three) Tj ET"
    text, _, st = extract_pdf_text(_pdf(content, flate=True))
    assert st == "ok" and text == "Line one\nLine two\nLine three"


def test_tj_array_and_escapes():
    text, _, st = extract_pdf_text(_pdf(rb"BT [(a\(b\)) (c\\d) (e\101f)] TJ ET"))
    assert st == "ok" and text == "a(b)c\\deAf"


def test_unknown_filter_unsupported():
    pdf = (b"%PDF-1.4\n<< /Filter /DCTDecode >>\nstream\nxxxx\nendstream")
    assert extract_pdf_text(pdf)[2] == "unsupported_binary"


def test_synth_pdf_through_extract():
    pdf = make_pdf(7, ["first paragraph words", "second paragraph words"], compress=True)
    r = oracle_extract(pdf)
    assert r["doc_kind"] == "pdf" and r["status"] == "ok"
    assert "first paragraph words" in r["content_text"]


def test_langdetect_basics():
    en, _ = detect_lang("the quick brown fox jumps over the lazy dog and it was good")
    tr, _ = detect_lang("bu bir deneme ve çok güzel bir gün İstanbul şehrinde")
    de, _ = detect_lang("der Hund und die Katze sind in dem Haus mit einer Maus")
    assert (en, tr, de) == ("en", "tr", "de")


def test_langdetect_margin_und():
    lang, conf = detect_lang("zzz qqq xxx", margin=2)
    assert lang == "und" and conf == 0.0


def test_langdetect_deterministic():
    d = LangDetector()
    s = "the cat and the dog went to the park and it was the best day"
    assert d.detect(s) == d.detect(s)


def test_text_direction():
    assert text_direction("hello world") == "ltr"
    assert text_direction("שלום עולם") == "rtl"


def test_detect_script():
    from xtract.langdetect import detect_script

    assert detect_script("hello world")[0] == "Latin"
    assert detect_script("你好世界")[0] == "Han"
    assert detect_script("Привет")[0] == "Cyrillic"
    assert detect_script("שלום")[0] == "Hebrew"
    assert detect_script("123 !!!") == ("Unknown", 0.0)
    s, conf = detect_script("hello 你好世界吗吗吗")
    assert s == "Han" and 0 < conf < 1
