"""Vocabulary ops (M14/M15) + worker-cache reset (A8)."""

import pytest

from xtract.ops.vocab import build_vocab, decode_ids, encode_tokens, oov_rate, sql_tokens


@pytest.fixture(scope="module")
def vocab_docs(ray_session):
    import ray.data as rd

    return rd.from_items([
        {"doc_id": 1, "text": "alpha beta gamma alpha alpha"},
        {"doc_id": 2, "text": "beta gamma delta Alpha!"},
        {"doc_id": 3, "text": "zz-unknown word alpha"},
    ])


def test_sql_tokens():
    assert sql_tokens("Hello, World 42 foo_bar") == ["hello", "world", "foo", "bar"]
    assert sql_tokens("") == []


def test_build_vocab_rank_order(vocab_docs):
    v = build_vocab(vocab_docs, size=3)
    toks = v["token"].to_pylist()
    assert toks[0] == "alpha"            # 5 occurrences
    assert v["token_id"].to_pylist() == [0, 1, 2]
    assert toks == sorted(toks, key=lambda t: (-dict(zip(v["token"].to_pylist(), v["n"].to_pylist()))[t], t))


def test_encode_decode_roundtrip(vocab_docs):
    v = build_vocab(vocab_docs, size=10)
    enc = encode_tokens(vocab_docs, v).to_pandas().set_index("doc_id")
    ids = enc.loc[1, "token_ids"]
    assert decode_ids(list(ids), v) == ["alpha", "beta", "gamma", "alpha", "alpha"]
    with pytest.raises(KeyError):
        decode_ids([9999], v)


def test_oov_rate(vocab_docs):
    v = build_vocab(vocab_docs, size=3)  # alpha beta gamma only
    out = oov_rate(vocab_docs, v).to_pandas().set_index("doc_id")
    assert out.loc[1, "oov_rate"] == 0.0
    assert out.loc[3, "oov_rate"] > 0.0


def test_worker_cache_reset():
    from xtract.actors import _WORKER_EXTRACTORS, clear_worker_cache, extract_batch_task
    import pyarrow as pa
    from xtract.config import DEFAULT_CONFIG

    t = pa.table({"url": ["u"], "warc_ts": [0], "html": [b"<p>words here now</p>"],
                  "text": [None], "lang": [None]})
    extract_batch_task(t, DEFAULT_CONFIG.to_json())
    assert len(_WORKER_EXTRACTORS) >= 1
    # determinism: same output before and after reset (cache is derived state)
    a = extract_batch_task(t, DEFAULT_CONFIG.to_json())["content_text"].to_pylist()
    assert clear_worker_cache() >= 1
    b = extract_batch_task(t, DEFAULT_CONFIG.to_json())["content_text"].to_pylist()
    assert a == b
