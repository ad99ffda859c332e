"""MIS-layered coloring: proper coloring, sequential equality,
partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _edges_ds(rd, edges):
    s = np.array([e[0] for e in edges], np.int64)
    d = np.array([e[1] for e in edges], np.int64)
    return rd.from_arrow(pa.table({
        "src": pa.array(s), "dst": pa.array(d)}))


def _und(edges):
    return sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})


def _brute_coloring(edges):
    from xtract.ops.graph import _luby_pri

    und = _und(edges)
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    uncolored = set(adj)
    color = {}
    c = 0
    while uncolored:
        c += 1
        active = set(uncolored)
        r = 0
        while active:
            r += 1
            rg = (c - 1) * 64 + r
            pri = {n: int(_luby_pri(np.array([n], np.int64), rg)[0])
                   for n in active}
            join = {n for n in active
                    if all(pri[n] < pri[b]
                           for b in adj[n] if b in active)}
            for n in join:
                color[n] = c
            dropped = join | {b for n in join
                              for b in adj[n] if b in active}
            active -= dropped
        uncolored -= {n for n, cc in color.items() if cc == c}
    return color


def test_coloring_matches_sequential(ray_session):
    import ray.data as rd

    from xtract.ops.coloring import mis_coloring

    rng = np.random.RandomState(3)
    edges = [e for e in zip(rng.randint(0, 40, 160).tolist(),
                            rng.randint(0, 40, 160).tolist())
             if e[0] != e[1]]
    out = mis_coloring(_edges_ds(rd, edges)).to_pandas()
    exp = _brute_coloring(edges)
    assert dict(zip(out.node, out.color)) == exp


def test_coloring_is_proper_and_compact(ray_session):
    import ray.data as rd

    from xtract.ops.coloring import mis_coloring

    rng = np.random.RandomState(31)
    edges = [e for e in zip(rng.randint(0, 60, 260).tolist(),
                            rng.randint(0, 60, 260).tolist())
             if e[0] != e[1]]
    out = mis_coloring(_edges_ds(rd, edges)).to_pandas()
    col = dict(zip(out.node, out.color))
    assert all(col[u] != col[v] for u, v in _und(edges))
    assert (out.color >= 1).all()
    # every color class below the max must be nonempty (layers pack)
    used = sorted(set(col.values()))
    assert used == list(range(1, len(used) + 1))


def test_coloring_partition_invariant(ray_session):
    import ray.data as rd

    from xtract.ops.coloring import mis_coloring

    edges = [(i, (i + 1) % 9) for i in range(9)]  # odd cycle → 3 colors
    a = (mis_coloring(_edges_ds(rd, edges)).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (mis_coloring(_edges_ds(rd, edges).repartition(7)).to_pandas()
         .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a.color.max() >= 3
