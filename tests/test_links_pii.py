"""Outlink/anchor extraction (crawl-graph surface) + PII redaction."""

import pyarrow as pa

from xtract.links import extract_links, host_of
from xtract.ops.pii import redact_pii


def test_extract_links_basic_and_resolution():
    html = (b"<html><body><nav><a href='/a'>Home</a>"
            b" <a href='/news'>News <b>now</b></a></nav>"
            b"<p><a href='https://other.example.com/x?a=1'>ext  link</a></p>"
            b"</body></html>")
    links = extract_links(html, "https://site.example.org/p/1")
    assert links == [
        ("https://site.example.org/a", "Home"),
        ("https://site.example.org/news", "News now"),
        ("https://other.example.com/x?a=1", "ext link"),
    ]


def test_extract_links_recovery_paths():
    # unterminated anchor runs to EOF; nested <a> implicitly closes;
    # missing href is skipped; self-closing <a/> yields empty anchor
    assert extract_links(b"<a href='/u'>tail words", "https://s.org/") == [
        ("https://s.org/u", "tail words")]
    assert extract_links(b"<a href='/x'>outer <a href='/y'>inner</a>",
                         "https://s.org/") == [
        ("https://s.org/x", "outer"), ("https://s.org/y", "inner")]
    assert extract_links(b"<a>no href</a>", "https://s.org/") == []
    assert extract_links(b"<a href='/q'/>after", "https://s.org/") == [
        ("https://s.org/q", "")]


def test_extract_links_entities_and_script_dropped():
    html = (b"<a href='/e'>Fish &amp; Chips</a>"
            b"<script>var a = '<a href=\"/fake\">x</a>';</script>")
    assert extract_links(html, "https://s.org/") == [
        ("https://s.org/e", "Fish & Chips")]


def test_host_of():
    assert host_of("https://WWW.Example.ORG:8080/p") == "www.example.org:8080"
    assert host_of("not a url") == ""


def test_outlinks_through_ray(ray_session):
    from xtract.links import extract_outlinks, host_link_counts
    from xtract.synth import synth_pages_dataset

    links = extract_outlinks(synth_pages_dataset("/root/testdata/sf0.001"))
    df = links.to_pandas()
    assert len(df) > 1000  # nav/footer/sidebar links across families
    # every article page carries the nav Home link, resolved absolute
    assert (df.href.str.startswith("https://")).all()
    home = df[df.anchor_text == "Home"]
    assert len(home) > 0 and (home["rank"] == 0).all()
    hosts = host_link_counts(links).to_pandas()
    assert hosts.n_links.sum() == len(df)


def test_redact_pii_counts_and_order():
    text = ("write to a.user+tag@sub.mail.example.com or 10.1.2.3 "
            "or +44 (0) 1234 5678 done")
    red, counts = redact_pii(text)
    assert counts == {"emails": 1, "ips": 1, "phones": 1}
    assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red
    assert "example.com" not in red and "10.1.2.3" not in red
    # no PII → unchanged
    same, c0 = redact_pii("plain words only")
    assert same == "plain words only" and sum(c0.values()) == 0


def test_redact_pii_batch_columns():
    from xtract.ops.pii import redact_pii_batch

    t = pa.table({"doc_id": [1, 2],
                  "text": ["mail me x@y.example.org", None]})
    out = redact_pii_batch(t).to_pylist()
    assert out[0]["n_emails"] == 1 and "<EMAIL>" in out[0]["text"]
    assert out[1]["text"] == "" and out[1]["n_emails"] == 0
