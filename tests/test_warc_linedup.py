"""WARC source round-trip + corpus-level boilerplate line dedup."""

import gzip

import pytest


def test_warc_roundtrip(ray_session, tmp_path):
    from xtract.pipeline import extract_pages
    from xtract.sources import parse_warc, read_pages_warc, write_warc

    rows = [
        {"url": "https://w1.example/a", "warc_ts": 1767225600000000,
         "html": b"<h1>Warc One</h1><p>first warc document body with words</p>"},
        {"url": "https://w2.example/b", "warc_ts": 1767225700000000,
         "html": "<p>ikinci belge çok güzel kelimeler içeriyor burada</p>".encode()},
    ]
    p = str(tmp_path / "test.warc")
    write_warc(rows, p)
    parsed = parse_warc(open(p, "rb").read())
    assert [r["url"] for r in parsed] == [r["url"] for r in rows]
    assert parsed[0]["html"] == rows[0]["html"]

    # gz variant through the Ray source
    gz = str(tmp_path / "test.warc.gz")
    with open(gz, "wb") as f:
        f.write(gzip.compress(open(p, "rb").read()))
    out = extract_pages(read_pages_warc(gz)).to_pandas().set_index("url")
    assert "first warc document body" in out.loc["https://w1.example/a", "content_text"]
    assert out.loc["https://w1.example/a", "warc_ts"].isoformat().startswith("2026-01-01")


def test_warc_skips_non_response_records():
    from xtract.sources import parse_warc

    rec = (b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://x\r\n"
           b"Content-Length: 4\r\n\r\nGET \r\n\r\n"
           b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://y\r\n"
           b"Content-Length: 10\r\n\r\n<p>body</p>\r\n\r\n")
    # note: Content-Length 10 is wrong on purpose (truncates body) — parser
    # must not crash and must still find the record boundary heuristically
    out = parse_warc(rec)
    assert len(out) == 1 and out[0]["url"] == "https://y"


def test_line_dedup(ray_session):
    import ray.data as rd

    from xtract.ops.linedup import build_line_counts, drop_repeated_lines

    banner = "Accept cookies to continue reading this site"
    docs = [{"url": f"u{i}", "content_text": f"{banner}\nUnique body {i} words"}
            for i in range(8)]
    docs.append({"url": "u9", "content_text": "Totally unique document"})
    ds = rd.from_items(docs)
    counts = build_line_counts(ds).to_pandas()
    assert counts.n_docs.max() == 8
    out = drop_repeated_lines(rd.from_items(docs), max_docs=5).to_pandas()
    assert not out.content_text.str.contains("Accept cookies").any()
    assert (out.set_index("url").loc["u3", "content_text"] == "Unique body 3 words")
    assert out.set_index("url").loc["u3", "n_lines_dropped"] == 1
    assert out.set_index("url").loc["u9", "n_lines_dropped"] == 0


def test_webtext_pipeline(ray_session, sf_dir):
    from xtract.pipelines import webtext_funnel, webtext_pipeline
    from xtract.synth import synth_pages_dataset

    clean, _ = webtext_pipeline(synth_pages_dataset(sf_dir))
    df = clean.to_pandas()
    assert len(df) > 0
    assert df.url.is_unique                       # exact dedup applied
    assert (df.content_text.str.len() >= 80).all()  # quality gate
    assert "content_hash" not in df.columns
    funnel = webtext_funnel(synth_pages_dataset(sf_dir))
    assert funnel["pages_in"] >= funnel["extract_ok"] >= funnel["clean_out"] > 0


def test_dedup_paragraphs(ray_session):
    import ray.data as rd

    from xtract.ops.linedup import dedup_paragraphs

    shared = "this exact paragraph is repeated across many documents"
    docs = rd.from_items([
        {"doc_id": 3, "text": f"{shared}\nunique tail for three goes here"},
        {"doc_id": 1, "text": f"{shared}\nunique tail for one stays here"},
        {"doc_id": 2, "text": "totally distinct document body text here"},
    ])
    out = dedup_paragraphs(docs).to_pandas().set_index("doc_id")
    # owner = min doc_id keeps the shared paragraph; others lose it
    assert shared in out.loc[1, "text"]
    assert shared not in out.loc[3, "text"]
    assert out.loc[3, "n_paras_dropped"] == 1
    assert out.loc[1, "n_paras_dropped"] == 0
    # unique content untouched
    assert "unique tail for three" in out.loc[3, "text"]
    assert out.loc[2, "n_paras_dropped"] == 0
