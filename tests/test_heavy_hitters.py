"""Misra–Gries heavy hitters: exactness, under-count guarantee, skew."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.sketch import heavy_hitters


def _ds(vals, nparts=4):
    return rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())})) \
             .repartition(nparts)


def test_exact_when_capacity_sufficient(ray_session):
    vals = [f"k{i % 10}" for i in range(200)]
    topk, bound = heavy_hitters(_ds(vals), "v", k=5, capacity=64)
    assert bound == 0
    assert list(topk["n"]) == [20] * 5
    assert list(topk["val"]) == ["k0", "k1", "k2", "k3", "k4"]  # tie by val


def test_undercount_guarantee_under_pressure(ray_session):
    # zipf-ish: one dominant value + a long tail wider than capacity
    rng = np.random.default_rng(3)
    tail = [f"t{i}" for i in rng.integers(0, 500, 2000)]
    vals = ["HOT"] * 800 + tail
    rng.shuffle(vals)
    topk, bound = heavy_hitters(_ds(vals, nparts=8), "v", k=3, capacity=50)
    exact = {}
    for v in vals:
        exact[v] = exact.get(v, 0) + 1
    assert bound > 0
    got = dict(zip(topk["val"], topk["n"]))
    # every reported count under-estimates by at most the bound
    for v, n in got.items():
        assert n <= exact[v] <= n + bound
    # the dominant value (true count ≫ bound) must surface at rank 1
    assert topk.iloc[0]["val"] == "HOT"
    assert got["HOT"] == 800  # HOT survives every block's top-capacity


def test_nulls_ignored_and_counted_nowhere(ray_session):
    ds = rd.from_arrow(pa.table({"v": pa.array(
        ["a", None, "a", "b", None], pa.string())}))
    topk, bound = heavy_hitters(ds, "v", k=10, capacity=10)
    assert bound == 0
    assert dict(zip(topk["val"], topk["n"])) == {"a": 2, "b": 1}


def test_countmin_overestimates_and_is_partition_invariant(ray_session):
    from xtract.ops.sketch import countmin_counts

    rng = np.random.default_rng(13)
    vals = ["HOT"] * 500 + [f"t{i}" for i in rng.integers(0, 3000, 4000)]
    rng.shuffle(vals)
    exact = {}
    for v in vals:
        exact[v] = exact.get(v, 0) + 1
    qs = ["HOT", "t1", "t2", "never-seen"]
    a = countmin_counts(_ds(vals, nparts=3), "v", qs, width_bits=12)
    b = countmin_counts(_ds(vals, nparts=11), "v", qs, width_bits=12)
    assert a == b  # int sums commute → identical at any parallelism
    n = len(vals)
    for q in qs:
        true = exact.get(q, 0)
        assert a[q] >= true  # one-sided guarantee, always
        assert a[q] <= true + 4 * n * 2.72 / 4096  # ε·N slack (loose)


def test_countmin_tight_on_dominant_value(ray_session):
    from xtract.ops.sketch import countmin_counts

    vals = ["x"] * 1000 + ["y"] * 10
    est = countmin_counts(_ds(vals), "v", ["x", "y"], width_bits=14)
    assert est["x"] >= 1000 and est["x"] <= 1010
    assert est["y"] >= 10
