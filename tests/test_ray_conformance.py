"""Distributed conformance: the north-rule invariant.

Pipeline output must be byte-identical per url to the sequential
oracle, the groupby-url corpus checksum must match, and results must be
independent of batching/concurrency choices (the two-parallelism
equality within one session)."""

import pytest

from xtract.config import DEFAULT_CONFIG
from xtract.metrics import corpus_checksum, corpus_metrics, dedup_by_url
from xtract.oracle import corpus_checksum as oracle_checksum
from xtract.oracle import oracle_corpus
from xtract.pipeline import extract_pages, explode_pages
from xtract.synth import synth_pages_dataset


@pytest.fixture(scope="module")
def pages_rows(ray_session, sf_dir):
    return synth_pages_dataset(sf_dir).take_all()


@pytest.fixture(scope="module")
def golden(pages_rows):
    return oracle_corpus(pages_rows)


def _pages(sf_dir):
    return synth_pages_dataset(sf_dir)


def test_byte_identity_per_url(ray_session, sf_dir, golden):
    out = extract_pages(_pages(sf_dir)).to_pandas()
    gmap = {g["url"]: g for g in golden}
    assert len(out) == len(golden)
    for row in out.itertuples():
        g = gmap[row.url]
        assert row.content_text == g["content_text"], row.url
        assert row.status == g["status"], row.url
        assert row.doc_kind == g["doc_kind"], row.url


def test_corpus_checksum_matches_oracle(ray_session, sf_dir, golden):
    uniq = {}
    for g in golden:
        uniq.setdefault(g["url"], g)
    expect = oracle_checksum(uniq.values())
    got = corpus_checksum(extract_pages(_pages(sf_dir)))
    assert got == expect


def test_batching_invariance(ray_session, sf_dir):
    """Different batch sizes / concurrency → identical checksum (the
    in-session analogue of N-vs-4N equality)."""
    a = corpus_checksum(extract_pages(_pages(sf_dir), batch_size=16,
                                      concurrency=(1, 2)))
    b = corpus_checksum(extract_pages(_pages(sf_dir), batch_size=128,
                                      concurrency=(2, 4)))
    assert a == b


def test_dedup_by_url(ray_session, sf_dir):
    ex = extract_pages(_pages(sf_dir))
    deduped = dedup_by_url(ex).to_pandas()
    assert deduped.url.is_unique
    # dup family exists → dedup must remove something
    total = extract_pages(_pages(sf_dir)).count()
    assert len(deduped) < total


def test_blocks_pipeline_invariants(ray_session, sf_dir):
    blocks = explode_pages(_pages(sf_dir).limit(60), levels=("block",)).to_pandas()
    assert (blocks.span_end > blocks.span_start).all()
    assert blocks.confidence.between(0, 100).all()
    # dup-family urls appear twice with identical blocks — dedup first
    uniq = blocks.drop_duplicates(["url", "block_id"])
    assert (uniq.groupby("url").block_id.apply(
        lambda s: (sorted(s) == list(range(len(s)))))).all()


def test_corpus_metrics(ray_session, sf_dir):
    m = corpus_metrics(extract_pages(_pages(sf_dir)))
    assert m["n_docs"] > 0 and m["blocks_kept"] > 0
    assert m["status_counts"].get("ok", 0) > 0
