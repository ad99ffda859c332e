"""BM25 ranking: direct vs persisted-index bit-identity, values vs an
independent naive reference, storage-level bucket pruning."""

import math
import re
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk_docs(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string()),
    }))


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a quick brown dog barks at the slow fox fox fox",
    "data pipelines stream data over the wire",
    "slow and steady wins the race",
    "",                                  # token-less doc: stats must count it
    "fox dog fox dog fox dog quick",
    "completely unrelated words here nothing matches at all",
]


def _naive_bm25(texts, query, k1=1.2, b=0.75):
    """Independent reference: plain dict/loop implementation."""
    tok = lambda t: re.findall(r"[a-z0-9_]+", (t or "").lower())
    qterms = list(dict.fromkeys(tok(query)))
    docs = [tok(t) for t in texts]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    df = {w: sum(1 for d in docs if w in d) for w in qterms}
    out = {}
    for i, d in enumerate(docs):
        s = 0.0
        hit = False
        for w in qterms:
            tf = d.count(w)
            if tf:
                hit = True
            idf = math.log1p((n - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        if hit:
            out[i] = s
    return out


def test_bm25_matches_naive_reference(ray_session):
    from xtract.ops.ranking import bm25_score

    got = bm25_score(_mk_docs(CORPUS), "quick fox data", k=10).to_pandas()
    want = _naive_bm25(CORPUS, "quick fox data")
    assert set(got.doc_id) == set(want)
    order = sorted(want, key=lambda i: (-want[i], i))
    assert list(got.doc_id) == order
    for _, r in got.iterrows():
        assert r.score == pytest.approx(want[r.doc_id], rel=1e-12)
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_bm25_index_bit_identical_to_direct(ray_session, tmp_path):
    from xtract.ops.ranking import (bm25_score, bm25_search_index,
                                    build_text_index)

    direct = bm25_score(_mk_docs(CORPUS), "quick fox data", k=10).to_pandas()
    idx_dir = str(tmp_path / "idx")
    meta = build_text_index(_mk_docs(CORPUS), idx_dir, num_buckets=8)
    assert meta["n_docs"] == len(CORPUS)          # token-less doc counted
    assert meta["sum_dl"] == sum(
        len(re.findall(r"[a-z0-9_]+", t.lower())) for t in CORPUS)
    via_index = bm25_search_index(idx_dir, "quick fox data", k=10).to_pandas()
    pd.testing.assert_frame_equal(direct, via_index, check_dtype=True)


def test_bm25_index_reads_only_query_buckets(ray_session, tmp_path):
    """Deleting every bucket dir EXCEPT the query terms' must not change
    the result — proof the search prunes at storage level."""
    from xtract.ops.ranking import (_term_bucket, bm25_search_index,
                                    build_text_index, query_terms)

    idx_dir = str(tmp_path / "idx")
    build_text_index(_mk_docs(CORPUS), idx_dir, num_buckets=16)
    before = bm25_search_index(idx_dir, "quick fox", k=10).to_pandas()
    keep = {int(x) for x in _term_bucket(query_terms("quick fox"), 16)}
    import os

    removed = 0
    for d in os.listdir(f"{idx_dir}/postings"):
        bk = int(d.split("=")[1])
        if bk not in keep:
            shutil.rmtree(f"{idx_dir}/postings/{d}")
            removed += 1
    assert removed > 0
    after = bm25_search_index(idx_dir, "quick fox", k=10).to_pandas()
    pd.testing.assert_frame_equal(before, after, check_dtype=True)


def test_bm25_no_matching_terms(ray_session, tmp_path):
    from xtract.ops.ranking import (bm25_score, bm25_search_index,
                                    build_text_index)

    out = bm25_score(_mk_docs(CORPUS), "zzz qqq", k=5).to_pandas()
    assert len(out) == 0
    idx_dir = str(tmp_path / "idx")
    build_text_index(_mk_docs(CORPUS), idx_dir, num_buckets=8)
    out2 = bm25_search_index(idx_dir, "zzz qqq", k=5).to_pandas()
    assert len(out2) == 0


def test_bm25_batching_invariance(ray_session):
    """Result independent of block layout (the slim projection and
    partial top-k must not depend on batching)."""
    from xtract.ops.ranking import bm25_score

    one = bm25_score(_mk_docs(CORPUS), "quick fox data", k=10).to_pandas()
    many = bm25_score(_mk_docs(CORPUS).repartition(5),
                      "quick fox data", k=10).to_pandas()
    pd.testing.assert_frame_equal(one, many, check_dtype=True)
