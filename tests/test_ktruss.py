"""k-truss: brute-force reference agreement, peel behavior, gates."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from xtract.ops.graph import k_truss


def _brute_truss(edges, k):
    E = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    while True:
        adj = {}
        for u, v in E:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in E}
        keep = {e for e in E if sup[e] >= k - 2}
        if keep == E:
            return {e: sup[e] for e in E}
        E = keep


def _ds(edges, blocks=1):
    t = pa.table({"src": [e[0] for e in edges],
                  "dst": [e[1] for e in edges]})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _run(edges, k, blocks=1):
    out = k_truss(_ds(edges, blocks), k=k).to_pandas()
    return {(r.u, r.v): r.support for r in out.itertuples()}


# a 5-clique (4-truss survives) + a pendant triangle chain (peels at 4)
CLIQUE = list(itertools.combinations(range(5), 2))
GRAPH = CLIQUE + [(4, 10), (10, 11), (11, 4), (11, 12)]


@pytest.mark.parametrize("k", [3, 4, 5])
def test_matches_brute_force(ray_session, k):
    assert _run(GRAPH, k) == _brute_truss(GRAPH, k)


def test_pendant_triangle_peeled_at_4(ray_session):
    got = _run(GRAPH, 4)
    assert set(got) == set(CLIQUE)         # only the clique survives
    assert all(s == 3 for s in got.values())


def test_partition_invariance(ray_session):
    rng = np.random.RandomState(4)
    edges = [tuple(sorted(rng.randint(0, 25, 2))) for _ in range(120)]
    assert _run(edges, 3) == _run(edges, 3, blocks=9)
    assert _run(edges, 3) == _brute_truss(edges, 3)


def test_k2_rejected(ray_session):
    with pytest.raises(ValueError, match="k must be"):
        k_truss(_ds(GRAPH), k=2)


def test_everything_peels_to_empty(ray_session):
    out = k_truss(_ds([(0, 1), (1, 2), (2, 3)]), k=3).to_pandas()
    assert len(out) == 0
