"""Round-5 fixes: broadcast gates auto-route to the bit-identical
distributed paths (``on_gate='auto'`` default, ``'error'`` keeps the
fail-loud raise), and the `conformal_binary` quantile pull gained the
house `max_pull` gate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _edges(src, dst):
    import ray.data as rd
    return rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                   "dst": pa.array(dst, pa.int64())}))


def _rand_edges(seed=7, n_nodes=30, n_edges=160):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n_nodes, n_edges)
    d = rng.integers(0, n_nodes, n_edges)
    keep = s != d
    return _edges(s[keep], d[keep]).repartition(5)


def _sorted_df(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ---------------------------------------------------------------------------
# on_gate='auto': gate trip routes to distributed, bit-identical
# ---------------------------------------------------------------------------

def test_pagerank_gate_auto_routes_bit_identical(ray_session):
    from xtract.ops.graph import pagerank

    e = _rand_edges()
    ref = _sorted_df(pagerank(e, iters=3))
    got = _sorted_df(pagerank(e, iters=3, broadcast_limit=3))
    assert got.equals(ref)


def test_hits_gate_auto_routes_bit_identical(ray_session):
    from xtract.ops.graph import hits

    e = _rand_edges(seed=11)
    ref = _sorted_df(hits(e, iters=2))
    got = _sorted_df(hits(e, iters=2, broadcast_limit=3))
    assert got.equals(ref)


def test_bfs_depth_gate_auto_routes_bit_identical(ray_session):
    from xtract.ops.graph import bfs_depth

    e = _rand_edges(seed=13)
    ref = _sorted_df(bfs_depth(e, [0, 1], max_depth=6))
    # limit=2 trips mid-loop once the reached set outgrows it
    got = _sorted_df(bfs_depth(e, [0, 1], max_depth=6,
                               broadcast_limit=2))
    assert got.equals(ref)


def test_k_core_gate_auto_routes_bit_identical(ray_session):
    from xtract.ops.graph import k_core

    e = _rand_edges(seed=17)
    ref = _sorted_df(k_core(e, k=3))
    got = _sorted_df(k_core(e, k=3, removed_broadcast_limit=1))
    assert got.equals(ref)


def test_sssp_gate_auto_routes_bit_identical(ray_session):
    import ray.data as rd
    from xtract.ops.graph import sssp

    rng = np.random.default_rng(19)
    s = rng.integers(0, 25, 120)
    d = rng.integers(0, 25, 120)
    w = rng.integers(1, 9, 120)
    keep = s != d
    e = rd.from_arrow(pa.table({
        "src": pa.array(s[keep], pa.int64()),
        "dst": pa.array(d[keep], pa.int64()),
        "w": pa.array(w[keep], pa.int64())})).repartition(4)
    ref = _sorted_df(sssp(e, [0]))
    got = _sorted_df(sssp(e, [0], broadcast_limit=2))
    assert got.equals(ref)


def test_label_propagation_gate_auto_routes_bit_identical(ray_session):
    from xtract.ops.graph import label_propagation

    e = _rand_edges(seed=23, n_nodes=20, n_edges=60)
    ref = _sorted_df(label_propagation(e, rounds=3))
    got = _sorted_df(label_propagation(e, rounds=3, broadcast_limit=2))
    assert got.equals(ref)


def test_mis_gate_auto_routes_bit_identical(ray_session):
    from xtract.ops.graph import maximal_independent_set

    e = _rand_edges(seed=29, n_nodes=18, n_edges=50)
    ref = _sorted_df(maximal_independent_set(e))
    got = _sorted_df(maximal_independent_set(e, broadcast_limit=2))
    assert got.equals(ref)


def test_mis_coloring_gate_auto_routes_bit_identical(ray_session):
    from xtract.ops.coloring import mis_coloring

    e = _rand_edges(seed=31, n_nodes=14, n_edges=40)
    ref = _sorted_df(mis_coloring(e))
    got = _sorted_df(mis_coloring(e, broadcast_limit=2))
    assert got.equals(ref)


def test_on_gate_error_still_raises_and_bad_value_rejected(ray_session):
    from xtract.ops.graph import pagerank

    e = _edges([1, 2, 3], [2, 3, 1])
    with pytest.raises(ValueError, match="distributed=True"):
        pagerank(e, iters=1, broadcast_limit=2, on_gate="error")
    with pytest.raises(ValueError, match="on_gate"):
        pagerank(e, iters=1, broadcast_limit=2, on_gate="bogus")


# ---------------------------------------------------------------------------
# conformal_binary: max_pull gate on the quantile pull
# ---------------------------------------------------------------------------

def _scored_ds(n_cal=40, n_test=20):
    import ray.data as rd

    rng = np.random.default_rng(41)
    n = n_cal + n_test
    return rd.from_pandas(pd.DataFrame({
        "y": rng.integers(0, 2, n).astype(np.int64),
        "p": rng.integers(0, 1_000_001, n).astype(np.int64),
        "split": ["calib"] * n_cal + ["test"] * n_test}))


def test_conformal_binary_max_pull_gate(ray_session):
    from xtract.ops.mleval import conformal_binary

    ds = _scored_ds()
    # α=1/10 over 40 calib rows ⇒ pull k2 = n_cal - rank + 1 rows;
    # a max_pull of 1 must trip the gate fail-loud
    with pytest.raises(ValueError, match="max_pull"):
        conformal_binary(ds, "y", "p", "split", max_pull=1)
    # and a roomy gate reproduces the ungated result exactly
    a = conformal_binary(ds, "y", "p", "split")
    b = conformal_binary(ds, "y", "p", "split", max_pull=10_000)
    assert a == b
