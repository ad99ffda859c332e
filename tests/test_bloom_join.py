"""Bloom-prefiltered semi/anti join: exactness incl. false positives."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.joins import (_bloom_probe, bloom_semi_join,
                              semi_join_cogroup)


def _sides(n_left=300, n_right=40):
    rng = np.random.default_rng(11)
    left = rd.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 200, n_left), pa.int64()),
        "payload": pa.array(np.arange(n_left), pa.int64())})).repartition(5)
    right = rd.from_arrow(pa.table({
        "k": pa.array(rng.choice(200, n_right, replace=False).astype(np.int64)
                      * 3, pa.int64())})).repartition(3)
    return left, right


def _norm(ds):
    return ds.to_pandas().sort_values(["k", "payload"]) \
             .reset_index(drop=True)


def test_bloom_semi_equals_plain_semi(ray_session):
    left, right = _sides()
    a = _norm(bloom_semi_join(left, right, "k", p_bits=16))
    b = _norm(semi_join_cogroup(left, right, "k"))
    assert a.equals(b) and len(a) > 0


def test_bloom_anti_equals_plain_anti(ray_session):
    left, right = _sides()
    a = _norm(bloom_semi_join(left, right, "k", anti=True, p_bits=16))
    b = _norm(semi_join_cogroup(left, right, "k", anti=True))
    assert a.equals(b) and len(a) > 0
    # semi ∪ anti partitions the left side exactly
    s = _norm(bloom_semi_join(left, right, "k", p_bits=16))
    assert len(a) + len(s) == left.count()


def test_false_positives_are_verified_away(ray_session):
    # p_bits=6 (64 bits) with 40 keys → bloom saturates, nearly every
    # probe is positive; the exact verify must still give exact rows
    left, right = _sides()
    a = _norm(bloom_semi_join(left, right, "k", p_bits=6, k=2))
    b = _norm(semi_join_cogroup(left, right, "k"))
    assert a.equals(b)
    a = _norm(bloom_semi_join(left, right, "k", anti=True, p_bits=6, k=2))
    b = _norm(semi_join_cogroup(left, right, "k", anti=True))
    assert a.equals(b)


def test_string_keys(ray_session):
    left = rd.from_items([{"k": f"u{i % 20}", "payload": i}
                          for i in range(100)])
    right = rd.from_items([{"k": f"u{i * 2}"} for i in range(10)])
    a = bloom_semi_join(left, right, "k", p_bits=14).to_pandas()
    assert set(a["k"]) == {f"u{i * 2}" for i in range(10)}
    assert len(a) == 50  # even residues 0..18 → 5 of each


def test_probe_has_no_false_negatives():
    # direct unit check: every inserted key probes positive
    from xtract.ops.joins import _bloom_hashes

    keys = pa.chunked_array([pa.array(np.arange(1000, dtype=np.int64))])
    h = _bloom_hashes(keys)
    p_bits, k = 12, 4
    m = np.uint64(1 << p_bits)
    bm = np.zeros((1 << p_bits) >> 3, np.uint8)
    h1 = h % m
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    assert _bloom_probe(bm, h, p_bits, k).all()
