"""Versioned store (ops/versioned) + bucket compaction
(ops/bucketed.compact_buckets)."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xtract.ops.versioned import (commit_version, diff_versions,
                                  list_versions, read_version, vacuum)


def _df(lo, hi):
    return pd.DataFrame({"id": np.arange(lo, hi, dtype=np.int64),
                         "v": np.arange(lo, hi, dtype=np.int64) * 10})


def test_commit_append_and_time_travel(ray_session, tmp_path):
    import ray.data as rd

    store = str(tmp_path / "store")
    e1 = commit_version(rd.from_pandas(_df(0, 100)).repartition(3), store)
    assert e1["v"] == 1 and e1["n_rows"] == 100
    e2 = commit_version(rd.from_pandas(_df(100, 250)).repartition(2),
                        store, mode="append")
    assert e2["v"] == 2 and e2["n_rows"] == 250
    # time travel: v1 unchanged by the later commit
    old = read_version(store, 1).to_pandas().sort_values("id")
    assert old["id"].tolist() == list(range(100))
    assert read_version(store).count() == 250
    d = diff_versions(store, 1, 2)
    assert d["rows_added"] == 150 and d["rows_removed"] == 0


def test_overwrite_is_logical(ray_session, tmp_path):
    import ray.data as rd

    store = str(tmp_path / "store")
    commit_version(rd.from_pandas(_df(0, 50)), store)
    commit_version(rd.from_pandas(_df(0, 10)), store, mode="overwrite")
    assert read_version(store, 2).count() == 10
    # the overwritten snapshot stays readable
    assert read_version(store, 1).count() == 50
    assert [v["v"] for v in list_versions(store)] == [1, 2]
    d = diff_versions(store, 1, 2)
    assert d["rows_removed"] == 50 and d["rows_added"] == 10


def test_vacuum_reclaims_and_bounds_travel(ray_session, tmp_path):
    import ray.data as rd

    store = str(tmp_path / "store")
    commit_version(rd.from_pandas(_df(0, 50)), store)
    commit_version(rd.from_pandas(_df(0, 10)), store, mode="overwrite")
    # a crashed commit leaks an unreferenced file — vacuum reclaims it
    leak = os.path.join(store, "data", "part-deadbeef.parquet")
    pa.parquet.write_table(pa.table({"id": pa.array([1], pa.int64()),
                                     "v": pa.array([1], pa.int64())}),
                           leak)
    res = vacuum(store, keep_latest=1)
    assert res["kept_versions"] == [2]
    assert res["files_removed"] >= 2          # v1's files + the leak
    assert not os.path.exists(leak)
    assert read_version(store, 2).count() == 10
    with pytest.raises(ValueError):
        read_version(store, 1)


def test_compact_buckets_preserves_data(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.bucketed import (compact_buckets, lookup_bucketed,
                                     read_bucketed, write_bucketed)

    d = str(tmp_path / "bk")
    df = pd.DataFrame({"k": np.arange(2_000, dtype=np.int64) % 37,
                       "x": np.arange(2_000, dtype=np.int64)})
    write_bucketed(rd.from_pandas(df).repartition(6), d, "k",
                   n_buckets=8)
    frags_before = len(glob.glob(os.path.join(d, "bucket=*",
                                              "*.parquet")))
    assert frags_before > 8                   # over-fragmented
    before = lookup_bucketed(d, [5, 17]).to_pandas().sort_values("x")

    stats = compact_buckets(d, min_fragments=2)
    assert stats["compacted_buckets"] == 8
    frags_after = len(glob.glob(os.path.join(d, "bucket=*",
                                             "*.parquet")))
    assert frags_after == 8                   # exactly one per bucket
    after = lookup_bucketed(d, [5, 17]).to_pandas().sort_values("x")
    pd.testing.assert_frame_equal(before.reset_index(drop=True),
                                  after.reset_index(drop=True))
    assert read_bucketed(d).count() == 2_000
    # idempotent: a second pass finds nothing to do
    assert compact_buckets(d, min_fragments=2)["compacted_buckets"] == 0


def test_upsert_merge_and_bucket_pruning(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.versioned import commit_bucketed, commit_upsert

    store = str(tmp_path / "up")
    base = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "val": np.arange(100, dtype=np.int64)})
    e1 = commit_bucketed(rd.from_pandas(base).repartition(3), store,
                         key="k", n_buckets=16)
    assert e1["n_rows"] == 100

    # updates: replace keys 90..95, insert keys 100..103
    ukeys = list(range(90, 96)) + list(range(100, 104))
    ups = pd.DataFrame({"k": np.array(ukeys, dtype=np.int64),
                        "val": np.array(ukeys, dtype=np.int64) * 1000})
    e2 = commit_upsert(rd.from_pandas(ups).repartition(2), store)
    assert e2["n_rows"] == 104

    got = (read_version(store).to_pandas()
           .sort_values("k").reset_index(drop=True))
    all_k = list(range(100)) + list(range(100, 104))
    want_val = [k * 1000 if k in set(ukeys) else k for k in all_k]
    assert got["k"].tolist() == all_k
    assert got["val"].tolist() == want_val

    # untouched buckets carried BY REFERENCE (same file names as v1)
    touched = {k % 16 for k in ukeys}
    v1_untouched = {f for f, b in zip(e1["files"], e1["file_buckets"])
                    if b not in touched}
    assert v1_untouched and v1_untouched <= set(e2["files"])

    # time travel: v1 still the pre-merge table
    old = (read_version(store, 1).to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert old["val"].tolist() == list(range(100))

    # duplicate update keys are refused, not guessed
    dup = pd.DataFrame({"k": [5, 5], "val": [1, 2]})
    with pytest.raises(Exception):
        commit_upsert(rd.from_pandas(dup), store)


def test_upsert_requires_bucketed_store(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.versioned import commit_upsert

    store = str(tmp_path / "plain")
    commit_version(rd.from_pandas(_df(0, 10)), store)
    with pytest.raises(ValueError):
        commit_upsert(rd.from_pandas(_df(0, 5)), store)


def test_changed_rows_bucketed_cdc(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.versioned import (changed_rows, commit_bucketed,
                                      commit_upsert)

    store = str(tmp_path / "cdc")
    base = pd.DataFrame({"k": np.arange(40, dtype=np.int64),
                         "val": np.arange(40, dtype=np.int64)})
    commit_bucketed(rd.from_pandas(base), store, key="k", n_buckets=8)
    # update 3, insert 2, and one no-op rewrite (same value)
    ups = pd.DataFrame({"k": np.array([3, 11, 19, 40, 41, 5],
                                      dtype=np.int64),
                        "val": np.array([300, 1100, 1900, 4000, 4100,
                                         5], dtype=np.int64)})
    commit_upsert(rd.from_pandas(ups), store)
    got = (changed_rows(store, 1, 2).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = {3: "update", 11: "update", 19: "update",
            40: "insert", 41: "insert"}        # k=5 rewrote same value
    assert dict(zip(got["k"], got["change"])) == want


def test_changed_rows_generic_path(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.versioned import changed_rows, commit_version

    store = str(tmp_path / "cdc2")
    commit_version(rd.from_pandas(_df(0, 30)), store)
    v2 = _df(10, 45)                            # drops 0..9, adds 30..44
    commit_version(rd.from_pandas(v2), store, mode="overwrite")
    got = (changed_rows(store, 1, 2, key="id").to_pandas()
           .sort_values("id").reset_index(drop=True))
    d = dict(zip(got["id"], got["change"]))
    assert all(d[i] == "delete" for i in range(10))
    assert all(d[i] == "insert" for i in range(30, 45))
    assert len(d) == 25                         # 10..29 unchanged


def test_commit_delete_and_cdc(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.versioned import (changed_rows, commit_bucketed,
                                      commit_delete)

    store = str(tmp_path / "del")
    base = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                         "val": np.arange(50, dtype=np.int64)})
    e1 = commit_bucketed(rd.from_pandas(base), store, key="k",
                         n_buckets=8)
    e2 = commit_delete([3, 11, 999], store)     # 999 doesn't exist
    assert e2["n_rows"] == 48
    got = (read_version(store).to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == [k for k in range(50)
                                 if k not in (3, 11)]
    # earlier snapshot intact; CDC reports exactly the two deletes
    assert read_version(store, 1).count() == 50
    cdc = changed_rows(store, 1, 2).to_pandas()
    assert dict(zip(cdc["k"], cdc["change"])) == {3: "delete",
                                                  11: "delete"}
    # untouched buckets carried by reference
    touched = {3 % 8, 11 % 8, 999 % 8}
    v1_untouched = {f for f, b in zip(e1["files"], e1["file_buckets"])
                    if b not in touched}
    assert v1_untouched and v1_untouched <= set(e2["files"])
