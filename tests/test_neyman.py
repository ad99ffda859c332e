"""Neyman allocation: variance-proportional budgets, selection
determinism, zero-variance gate."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from xtract.ops.neyman import neyman_allocation, neyman_stratified_sample


def _ds(blocks=1, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    i = 0
    # stratum "wide": large spread; "narrow": tiny spread; same size
    for _ in range(300):
        rows.append({"id": i, "s": "wide",
                     "x": int(rng.randint(0, 1000))})
        i += 1
    for _ in range(300):
        rows.append({"id": i, "s": "narrow",
                     "x": 500 + int(rng.randint(0, 10))})
        i += 1
    ds = rd.from_items(rows)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_allocation_favors_variable_stratum(ray_session):
    al = neyman_allocation(_ds(), "s", "x", n_total=100)
    a = dict(zip(al["s"], al["n_alloc"]))
    assert a["wide"] > 5 * a["narrow"]     # σ ~289 vs ~3
    assert a["wide"] + a["narrow"] <= 100  # floor undershoot only


def test_selection_deterministic_across_partitioning(ray_session):
    _, s1 = neyman_stratified_sample(_ds(), "s", "x", "id", 100)
    _, s2 = neyman_stratified_sample(_ds(9), "s", "x", "id", 100,
                                     num_partitions=5)
    a = sorted(map(tuple, (r.values() for r in s1.take_all())))
    b = sorted(map(tuple, (r.values() for r in s2.take_all())))
    assert a == b
    al, _ = neyman_stratified_sample(_ds(), "s", "x", "id", 100)
    per = {}
    for s, _id in a:
        per[s] = per.get(s, 0) + 1
    want = dict(zip(al["s"], al["n_alloc"]))
    assert per == {k: v for k, v in want.items() if v}


def test_zero_variance_gate(ray_session):
    rows = [{"id": i, "s": "a", "x": 7} for i in range(20)]
    with pytest.raises(ValueError, match="zero variance"):
        neyman_allocation(rd.from_items(rows), "s", "x", 10)
