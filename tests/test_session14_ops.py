"""Session-14 ops: weighted SSSP and the skew-aware equi join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- sssp

def _brute_sssp(edges, sources):
    """Sequential Bellman–Ford reference (positive int weights)."""
    dist = {s: 0 for s in sources}
    changed = True
    while changed:
        changed = False
        for s, d, w in edges:
            if s in dist and dist[s] + w < dist.get(d, 1 << 62):
                dist[d] = dist[s] + w
                changed = True
    return (pd.DataFrame(sorted(dist.items()),
                         columns=["node", "dist"]).astype("int64"))


def _edges_ds(rd, edges):
    s, d, w = (np.array([e[i] for e in edges], np.int64)
               for i in range(3))
    return rd.from_arrow(pa.table({
        "src": pa.array(s), "dst": pa.array(d), "w": pa.array(w)}))


def _rand_graph(seed=3, n_nodes=60, n_edges=400):
    rng = np.random.RandomState(seed)
    return list(zip(
        rng.randint(0, n_nodes, n_edges).tolist(),
        rng.randint(0, n_nodes, n_edges).tolist(),
        rng.randint(1, 9, n_edges).tolist()))


@pytest.mark.parametrize("distributed", [False, True])
def test_sssp_matches_bellman_ford(ray_session, distributed):
    import ray.data as rd

    from xtract.ops.graph import sssp

    edges = _rand_graph()
    got = (sssp(_edges_ds(rd, edges), [0, 7],
                distributed=distributed, num_partitions=8)
           .to_pandas().sort_values("node").reset_index(drop=True)
           .astype("int64"))
    exp = _brute_sssp(edges, [0, 7])
    pd.testing.assert_frame_equal(got, exp)


def test_sssp_shortcut_beats_path(ray_session):
    import ray.data as rd

    from xtract.ops.graph import sssp

    # 0→1→2→3 cost 5 each, shortcut 0→3 cost 4
    edges = [(0, 1, 5), (1, 2, 5), (2, 3, 5), (0, 3, 4)]
    out = sssp(_edges_ds(rd, edges), [0]).to_pandas()
    d = dict(zip(out.node, out.dist))
    assert d == {0: 0, 1: 5, 2: 10, 3: 4}


def test_sssp_broadcast_gate_fails_loud(ray_session):
    import ray.data as rd

    from xtract.ops.graph import sssp

    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1)]
    with pytest.raises(ValueError, match="broadcast_limit"):
        sssp(_edges_ds(rd, edges), [0], broadcast_limit=2, on_gate="error")


def test_sssp_unreachable_nodes_absent(ray_session):
    import ray.data as rd

    from xtract.ops.graph import sssp

    edges = [(0, 1, 2), (5, 6, 1)]  # 5,6 unreachable from 0
    out = sssp(_edges_ds(rd, edges), [0]).to_pandas()
    assert set(out.node) == {0, 1}


# ----------------------------------------------------------- skew_join

def _skew_frames(seed=11, n_left=3000, hot_frac=0.6):
    rng = np.random.RandomState(seed)
    hot = rng.rand(n_left) < hot_frac
    k = np.where(hot, np.int64(42), rng.randint(0, 50, n_left))
    left = pd.DataFrame({"k": k.astype(np.int64),
                         "x": np.arange(n_left, dtype=np.int64)})
    right = pd.DataFrame({
        "rk": np.arange(0, 50, dtype=np.int64),
        "y": (np.arange(0, 50, dtype=np.int64) * 7) % 13})
    return left, right


def _run_skew(rd, left, right, **kw):
    from xtract.ops.joins import skew_join

    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(8)
    rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(4)
    return skew_join(lds, rds, on="k", right_on="rk", **kw)


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_skew_join_matches_pandas_merge(ray_session):
    import ray.data as rd

    left, right = _skew_frames()
    out, stats = _run_skew(rd, left, right, hot_count=200,
                           return_stats=True)
    exp = left.merge(right, left_on="k", right_on="rk").drop(
        columns=["rk"])
    pd.testing.assert_frame_equal(_norm(out.to_pandas()), _norm(exp))
    assert stats["n_hot_keys"] == 1 and stats["hot_keys"] == [42]


def test_skew_join_no_hot_keys_path(ray_session):
    import ray.data as rd

    left, right = _skew_frames(hot_frac=0.0)
    out, stats = _run_skew(rd, left, right, hot_count=10_000,
                           return_stats=True)
    exp = left.merge(right, left_on="k", right_on="rk").drop(
        columns=["rk"])
    pd.testing.assert_frame_equal(_norm(out.to_pandas()), _norm(exp))
    assert stats["n_hot_keys"] == 0


def test_skew_join_int64_keys_exact(ray_session):
    """Keys beyond 2^53 must not collide (the ADVICE float trap)."""
    import ray.data as rd

    big = np.int64(1) << 60
    left = pd.DataFrame({"k": np.array([big, big + 2, big, 5], np.int64),
                         "x": np.arange(4, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.array([big, big + 2, 5], np.int64),
                          "y": np.array([1, 2, 3], np.int64)})
    out = _run_skew(rd, left, right, hot_count=2).to_pandas()
    exp = left.merge(right, left_on="k", right_on="rk").drop(
        columns=["rk"])
    pd.testing.assert_frame_equal(_norm(out), _norm(exp))


def test_skew_join_right_rows_gate(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"k": np.zeros(100, np.int64),
                         "x": np.arange(100, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.zeros(50, np.int64),
                          "y": np.arange(50, dtype=np.int64)})
    with pytest.raises(RuntimeError, match="max_hot_right_rows"):
        _run_skew(rd, left, right, hot_count=10, max_hot_right_rows=5)


# ------------------------------------------- label propagation / modularity

def _undirected(edges):
    s = set()
    for u, v, *_ in edges:
        if u != v:
            s.add((min(u, v), max(u, v)))
    return sorted(s)


def _brute_lp(edges, rounds):
    """Sequential synchronous LP, majority with min-label ties."""
    und = _undirected(edges)
    adj = {}
    for u, v in und:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            cnt = {}
            for b in nbrs:
                cnt[lab[b]] = cnt.get(lab[b], 0) + 1
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        if new == lab:
            break
        lab = new
    return lab


def _brute_modularity(edges, lab):
    und = _undirected(edges)
    m = len(und)
    m_in, d_tot = {}, {}
    for u, v in und:
        if lab[u] == lab[v]:
            m_in[lab[u]] = m_in.get(lab[u], 0) + 1
        d_tot[lab[u]] = d_tot.get(lab[u], 0) + 1
        d_tot[lab[v]] = d_tot.get(lab[v], 0) + 1
    return {c: (m_in.get(c, 0), d_tot[c],
                4 * m * m_in.get(c, 0) - d_tot[c] ** 2)
            for c in d_tot}


def _two_cliques_bridge():
    e = []
    for grp in (range(0, 6), range(10, 16)):
        g = list(grp)
        e += [(a, b, 1) for i, a in enumerate(g) for b in g[i + 1:]]
    e.append((5, 10, 1))
    return e


@pytest.mark.parametrize("distributed", [False, True])
def test_label_propagation_matches_sequential(ray_session, distributed):
    import ray.data as rd

    from xtract.ops.graph import label_propagation

    edges = _rand_graph(seed=9, n_nodes=40, n_edges=180)
    got = (label_propagation(_edges_ds(rd, edges), rounds=4,
                             distributed=distributed, num_partitions=8)
           .to_pandas().sort_values("node").reset_index(drop=True))
    exp = _brute_lp(edges, 4)
    assert dict(zip(got.node, got.lab)) == exp


def test_label_propagation_finds_two_cliques(ray_session):
    import ray.data as rd

    from xtract.ops.graph import label_propagation

    out = (label_propagation(_edges_ds(rd, _two_cliques_bridge()),
                             rounds=4).to_pandas())
    lab = dict(zip(out.node, out.lab))
    assert len({lab[n] for n in range(0, 6)}) == 1
    assert len({lab[n] for n in range(10, 16)}) == 1
    assert lab[0] != lab[10]


def test_modularity_matches_brute(ray_session):
    import ray.data as rd

    from xtract.ops.graph import label_propagation, modularity_stats

    edges = _two_cliques_bridge()
    labels = label_propagation(_edges_ds(rd, edges), rounds=4)
    out = (modularity_stats(_edges_ds(rd, edges), labels)
           .to_pandas().sort_values("lab").reset_index(drop=True))
    lab = _brute_lp(edges, 4)
    exp = _brute_modularity(edges, lab)
    got = {int(r.lab): (int(r.m_in), int(r.d_tot), int(r.q_num))
           for r in out.itertuples()}
    assert got == exp
    # a clean two-clique split has strongly positive modularity
    m = len(_undirected(edges))
    q = sum(v[2] for v in exp.values()) / (4 * m * m)
    assert q > 0.4


# -------------------------------------------------- random projection

def test_random_project_matches_numpy(ray_session):
    import ray.data as rd

    from xtract.ops.similarity import random_project

    rng = np.random.RandomState(4)
    X = rng.randn(50, 12).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(50, dtype=np.int64)),
        "label": pa.array(np.zeros(50, np.int64)),
        "embedding": pa.array(X.tolist(),
                              pa.list_(pa.float32()))})).repartition(6)
    out = random_project(ds, d_out=8).to_pandas()
    # sequential reference
    unit = 1 << 20
    q = np.floor(X.astype(np.float64) * unit).astype(np.int64)
    k = np.arange(12 * 8, dtype=np.int64)
    h = (k * 2654435761 + 12345) % (1 << 32)
    S = np.where((h >> 16) & 1 == 0, 1, -1).reshape(12, 8)
    P = q @ S
    got = out.set_index(["vec_id", "j"])["p"]
    for i in range(50):
        for j in range(8):
            assert got[(i, j)] == P[i, j]
    # sign matrix must not be the degenerate parity stripe
    assert 20 < (S > 0).sum() < 76


def test_random_project_partition_invariant(ray_session):
    import ray.data as rd

    from xtract.ops.similarity import random_project

    rng = np.random.RandomState(6)
    X = rng.randn(40, 5).astype(np.float32)
    mk = lambda p: rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "label": pa.array(np.arange(40, dtype=np.int64) % 3),
        "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
    })).repartition(p)
    a = (random_project(mk(1), d_out=4).to_pandas()
         .sort_values(["vec_id", "j"]).reset_index(drop=True))
    b = (random_project(mk(7), d_out=4).to_pandas()
         .sort_values(["vec_id", "j"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------ maximal independent set

def _brute_luby(edges):
    from xtract.ops.graph import _luby_pri

    und = _undirected(edges)
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    active = set(adj)
    mis = {}
    r = 0
    while active:
        r += 1
        pri = {n: int(_luby_pri(np.array([n], np.int64), r)[0])
               for n in active}
        join = {n for n in active
                if all(pri[n] < pri[b] for b in adj[n] if b in active)}
        for n in join:
            mis[n] = r
        active -= join
        active -= {b for n in join for b in adj[n]}
    return mis, set(adj)


def test_mis_matches_sequential_luby(ray_session):
    import ray.data as rd

    from xtract.ops.graph import maximal_independent_set

    edges = _rand_graph(seed=13, n_nodes=50, n_edges=220)
    out = maximal_independent_set(_edges_ds(rd, edges)).to_pandas()
    mis, all_nodes = _brute_luby(edges)
    got = {int(r.node): int(r.mis_round) for r in out.itertuples()
           if r.in_mis}
    assert got == mis
    assert set(out.node) == all_nodes


def test_mis_is_independent_and_maximal(ray_session):
    import ray.data as rd

    from xtract.ops.graph import maximal_independent_set

    edges = _rand_graph(seed=21, n_nodes=80, n_edges=300)
    out = maximal_independent_set(_edges_ds(rd, edges)).to_pandas()
    m = set(out[out.in_mis == 1].node)
    und = _undirected(edges)
    assert not any(u in m and v in m for u, v in und)  # independent
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for n in set(out.node) - m:                        # maximal
        assert adj[n] & m


def test_mis_partition_invariant(ray_session):
    import ray.data as rd

    from xtract.ops.graph import maximal_independent_set

    edges = _rand_graph(seed=2, n_nodes=30, n_edges=120)
    a = (maximal_independent_set(_edges_ds(rd, edges))
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (maximal_independent_set(_edges_ds(rd, edges).repartition(9))
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
