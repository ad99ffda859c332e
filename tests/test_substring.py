"""Exact substring (k-token window) dedup statistics."""

import pyarrow as pa
import pytest

from xtract.ops.substring import window_hashes


def test_window_hashes_rolling_equals_direct():
    toks = list("abcdefghij")
    k = 4
    hs = window_hashes(toks, k)
    assert len(hs) == len(toks) - k + 1
    # each window hash equals the hash of that window computed alone
    for i in range(len(hs)):
        assert window_hashes(toks[i:i + k], k) == [hs[i]]
    # sensitive to content and order
    assert window_hashes(list("abdc") , 4) != window_hashes(list("abcd"), 4)


def test_window_hashes_short_input():
    assert window_hashes(["a", "b"], 4) == []
    assert window_hashes([], 4) == []


def _corpus():
    shared = "alpha bravo charlie delta echo foxtrot"  # 6 shared tokens
    return pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            f"unique one text {shared}",     # doc1: shared at pos 3
            f"{shared} unique two tail",     # doc2: shared at pos 0
            "completely different words here with nothing repeated at all",
        ]})


def test_substring_stats_known_values(ray_session):
    import ray.data as rd

    from xtract.ops.substring import substring_dedup_stats

    # k=4: doc1 tokens = 9 (6 windows), doc2 tokens = 9, doc3 tokens = 9
    out = substring_dedup_stats(rd.from_arrow(_corpus()), k=4).to_pandas()
    r = {int(x.doc_id): x for x in out.itertuples()}
    assert r[1].n_tokens == 9 and r[1].n_windows == 6
    # shared 6-token run → 3 exact 4-token windows in both docs;
    # doc1 owns none (packed 1*CAP+3 > ... wait doc1 id < doc2 id) —
    # owner is min (doc_id, pos): doc1 positions 3,4,5 → doc1 owns all
    assert r[1].n_dup_windows == 0 and r[1].n_dup_tokens == 0
    # doc2's occurrences at pos 0,1,2 are non-canonical → merged
    # interval [0, 2+4) = 6 tokens
    assert r[2].n_dup_windows == 3 and r[2].n_dup_tokens == 6
    assert r[3].n_dup_windows == 0 and r[3].n_dup_tokens == 0


def test_substring_partitioning_invariance(ray_session):
    import ray.data as rd

    from xtract.ops.substring import substring_dedup_stats

    ds = rd.from_arrow(_corpus())
    a = substring_dedup_stats(ds, k=4, num_partitions=1).to_pandas()
    b = substring_dedup_stats(ds.repartition(5), k=4,
                              num_partitions=64).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_substring_pos_cap_guard(ray_session):
    import ray.data as rd

    from xtract.ops.substring import POS_CAP, substring_dedup_stats

    big = pa.table({"doc_id": [1], "text": ["w " * (POS_CAP + 4)]})
    with pytest.raises(Exception):  # loud failure, not silent corruption
        substring_dedup_stats(rd.from_arrow(big), k=4).to_pandas()
