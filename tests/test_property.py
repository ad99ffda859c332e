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


import numpy as np
from hypothesis import HealthCheck
from hypothesis.extra.numpy import arrays


@settings(max_examples=40, deadline=None)
@given(arrays(np.uint8, st.tuples(st.integers(1, 12), st.integers(1, 12),
                                  st.just(3))))
def test_bmp_roundtrip_property(px):
    from xtract.ops.multimodal import decode_bmp, encode_bmp

    assert (decode_bmp(encode_bmp(px)) == px).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-20000, 20000), min_size=1, max_size=400),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_property(vals, rate):
    from xtract.ops.multimodal import decode_wav, encode_wav

    s = np.asarray(vals, np.int16)
    out, r = decode_wav(encode_wav(s, rate))
    assert r == rate and (out == s).all()


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 5),
                             st.integers(0, 99)), min_size=1, max_size=60))
def test_first_row_per_key_matches_pandas(ray_session, rows):
    """Winner per key under (order_col, tiebreak) must equal the pandas
    reference regardless of block layout."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.agg import first_row_per_key

    df = pd.DataFrame(rows, columns=["k", "o", "payload"])
    # total order inside each key group → deterministic winner
    df["tie"] = range(len(df))
    ds = rd.from_pandas(df).repartition(3)
    got = (first_row_per_key(ds, "k", ("o", "tie"), num_partitions=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.sort_values(["k", "o", "tie"]).groupby("k", sort=True)
            .head(1).reset_index(drop=True))
    assert got[["k", "o", "payload", "tie"]].equals(
        want[["k", "o", "payload", "tie"]])
