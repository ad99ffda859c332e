"""KMV distinct sketch: exact path, estimate accuracy, partition
invariance, merge correctness under duplication."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.kmv import grouped_kmv_distinct


def _ds(keys, vals, blocks=1):
    ds = rd.from_arrow(pa.table({
        "k": keys, "v": np.asarray(vals, np.int64)}))
    return ds.repartition(blocks) if blocks > 1 else ds


def test_exact_below_k(ray_session):
    keys = ["a"] * 100
    vals = list(range(30)) * 3 + [100] * 10  # 31 distinct
    out = grouped_kmv_distinct(_ds(keys, vals), "k", "v",
                               k=64).to_pandas()
    assert out.iloc[0]["n_hashes"] == 31
    assert out.iloc[0]["kth_min"] == 0
    assert out.iloc[0]["est"] == 31


def test_estimate_accuracy_above_k(ray_session):
    rng = np.random.RandomState(0)
    true_n = 20_000
    vals = rng.randint(0, 10**12, true_n)
    keys = ["a"] * true_n
    out = grouped_kmv_distinct(_ds(keys, vals), "k", "v",
                               k=256).to_pandas()
    est = int(out.iloc[0]["est"])
    true_distinct = len(np.unique(vals))
    assert abs(est - true_distinct) / true_distinct < 0.15


def test_partition_invariance_and_dup_merge(ray_session):
    rng = np.random.RandomState(1)
    vals = rng.randint(0, 10**9, 5000)
    keys = [f"t{v % 3}" for v in vals]
    a = grouped_kmv_distinct(_ds(keys, vals), "k", "v",
                             k=32).to_pandas()
    b = grouped_kmv_distinct(_ds(keys, vals, blocks=11), "k", "v",
                             k=32, num_partitions=5).to_pandas()
    key = "k"
    assert (a.sort_values(key).reset_index(drop=True)
            .equals(b.sort_values(key).reset_index(drop=True)))
