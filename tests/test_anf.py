"""Exact neighborhood function vs a sequential BFS reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _edges_ds(rd, edges):
    s = np.array([e[0] for e in edges], np.int64)
    d = np.array([e[1] for e in edges], np.int64)
    return rd.from_arrow(pa.table({
        "src": pa.array(s), "dst": pa.array(d)}))


def _brute_nf(edges, max_r):
    adj = {}
    nodes = set()
    for u, v in edges:
        nodes.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    counts = []
    reach = {n: {n} for n in nodes}
    counts.append(sum(len(s) for s in reach.values()))
    for _ in range(max_r):
        reach = {n: r | set().union(
            *(reach[b] for b in adj.get(n, ()))) if adj.get(n) else r
            for n, r in reach.items()}
        counts.append(sum(len(s) for s in reach.values()))
    return pd.DataFrame({"r": range(max_r + 1),
                         "n_pairs": counts}).astype("int64")


def test_anf_matches_bfs_reference(ray_session):
    import ray.data as rd

    from xtract.ops.anf import neighborhood_function

    rng = np.random.RandomState(7)
    edges = list(zip(rng.randint(0, 40, 120).tolist(),
                     rng.randint(0, 40, 120).tolist()))
    edges = [e for e in edges if e[0] != e[1]]
    got = neighborhood_function(_edges_ds(rd, edges), max_r=5)
    exp = _brute_nf(edges, 5)
    pd.testing.assert_frame_equal(got, exp)


def test_anf_path_graph_shape(ray_session):
    import ray.data as rd

    from xtract.ops.anf import neighborhood_function

    edges = [(i, i + 1) for i in range(6)]  # path of 7 nodes
    out = neighborhood_function(_edges_ds(rd, edges), max_r=6)
    # r=0: 7 self pairs; r=1: +12 (6 undirected edges both ways)
    assert out.n_pairs.tolist()[0] == 7
    assert out.n_pairs.tolist()[1] == 19
    assert out.n_pairs.tolist()[-1] == 49  # fully saturated: 7*7


def test_anf_partition_invariant_and_multiword(ray_session):
    import ray.data as rd

    from xtract.ops.anf import neighborhood_function

    # > 64 nodes forces multiple uint64 words per bitset
    edges = [(i, (i + 1) % 100) for i in range(100)]
    a = neighborhood_function(_edges_ds(rd, edges), max_r=3)
    b = neighborhood_function(
        _edges_ds(rd, edges).repartition(11), max_r=3)
    pd.testing.assert_frame_equal(a, b)
    assert a.n_pairs.tolist() == [100, 300, 500, 700]


def test_anf_gate_fails_loud(ray_session):
    import ray.data as rd

    from xtract.ops.anf import neighborhood_function

    edges = [(0, 1), (1, 2), (2, 3)]
    with pytest.raises(ValueError, match="hyper_anf"):
        neighborhood_function(_edges_ds(rd, edges), max_r=2,
                              broadcast_limit=2)


def _brute_harmonic(edges, max_r):
    import math

    L = math.lcm(*range(1, max_r + 1))
    adj = {}
    nodes = set()
    for u, v in edges:
        nodes.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    out = {}
    for s in nodes:
        dist = {s: 0}
        frontier = [s]
        d = 0
        h = 0
        while frontier and d < max_r:
            d += 1
            nxt = []
            for x in frontier:
                for b in adj.get(x, ()):
                    if b not in dist:
                        dist[b] = d
                        nxt.append(b)
                        h += L // d
            frontier = nxt
        out[s] = h
    return out


def test_harmonic_matches_bfs_reference(ray_session):
    import ray.data as rd

    from xtract.ops.anf import harmonic_centrality

    rng = np.random.RandomState(17)
    edges = [e for e in zip(rng.randint(0, 35, 90).tolist(),
                            rng.randint(0, 35, 90).tolist())
             if e[0] != e[1]]
    got = harmonic_centrality(_edges_ds(rd, edges), max_r=5)
    exp = _brute_harmonic(edges, 5)
    assert {int(r.node): int(r.h_num)
            for r in got.itertuples()} == exp
    assert (got.lcm == 60).all()


def test_harmonic_star_center_wins(ray_session):
    import ray.data as rd

    from xtract.ops.anf import harmonic_centrality

    edges = [(0, i) for i in range(1, 9)]
    out = harmonic_centrality(_edges_ds(rd, edges), max_r=3)
    h = dict(zip(out.node, out.h_num))
    assert h[0] == max(h.values())
    assert all(h[i] == h[1] for i in range(2, 9))
