"""Session-15 ops: salted fragment-replicate join (hot on BOTH
sides), HyperANF registers, exact-integer PCA scatter, decision
stump/tree splits, RRF rank fusion."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------- salted_join

def _both_hot_frames(seed=7, n_left=2000, n_right=900):
    """Key 42 is hot on BOTH sides; a spread of cold keys around it."""
    rng = np.random.RandomState(seed)
    lk = np.where(rng.rand(n_left) < 0.5, np.int64(42),
                  rng.randint(0, 40, n_left))
    rk = np.where(rng.rand(n_right) < 0.4, np.int64(42),
                  rng.randint(0, 40, n_right))
    left = pd.DataFrame({"k": lk.astype(np.int64),
                         "x": np.arange(n_left, dtype=np.int64)})
    right = pd.DataFrame({"rk": rk.astype(np.int64),
                          "y": np.arange(n_right, dtype=np.int64)})
    return left, right


def _run_salted(rd, left, right, lparts=8, rparts=4, **kw):
    from xtract.ops.joins import salted_join

    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(lparts)
    rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(rparts)
    return salted_join(lds, rds, on="k", right_on="rk", **kw)


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_salted_join_matches_pandas_merge(ray_session):
    import ray.data as rd

    left, right = _both_hot_frames()
    out, stats = _run_salted(rd, left, right, hot_count=200,
                             n_salts=4, return_stats=True)
    exp = left.merge(right, left_on="k", right_on="rk").drop(
        columns=["rk"])
    pd.testing.assert_frame_equal(_norm(out.to_pandas()), _norm(exp))
    assert stats["n_hot_keys"] == 1
    # key 42: ~1000 left rows vs ~360 right rows → fragment LEFT
    assert stats["n_frag_left"] == 1 and stats["n_frag_right"] == 0


def test_salted_join_invariant_to_salts_and_partitioning(ray_session):
    import ray.data as rd

    left, right = _both_hot_frames(seed=13)
    a = _run_salted(rd, left, right, hot_count=100, n_salts=3,
                    lparts=2, rparts=9).to_pandas()
    b = _run_salted(rd, left, right, hot_count=100, n_salts=11,
                    lparts=16, rparts=1, num_partitions=5).to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b))


def test_salted_join_fragments_bigger_side_per_key(ray_session):
    """Key 1 hot-left, key 2 hot-right → routed to opposite sides."""
    import ray.data as rd

    left = pd.DataFrame({
        "k": np.array([1] * 50 + [2] * 3 + [7], np.int64),
        "x": np.arange(54, dtype=np.int64)})
    right = pd.DataFrame({
        "rk": np.array([1] * 3 + [2] * 50 + [7], np.int64),
        "y": np.arange(54, dtype=np.int64)})
    out, stats = _run_salted(rd, left, right, hot_count=10, n_salts=4,
                             return_stats=True)
    assert stats["n_frag_left"] == 1 and stats["n_frag_right"] == 1
    exp = left.merge(right, left_on="k", right_on="rk").drop(
        columns=["rk"])
    pd.testing.assert_frame_equal(_norm(out.to_pandas()), _norm(exp))


def test_salted_join_int64_keys_exact(ray_session):
    """Keys beyond 2^53 must not collide (the ADVICE float trap)."""
    import ray.data as rd

    big = np.int64(1) << 60
    left = pd.DataFrame({
        "k": np.array([big] * 20 + [big + 2, 5], np.int64),
        "x": np.arange(22, dtype=np.int64)})
    right = pd.DataFrame({
        "rk": np.array([big] * 15 + [big + 2, 5], np.int64),
        "y": np.arange(17, dtype=np.int64)})
    out = _run_salted(rd, left, right, hot_count=10,
                      n_salts=4).to_pandas()
    exp = left.merge(right, left_on="k", right_on="rk").drop(
        columns=["rk"])
    pd.testing.assert_frame_equal(_norm(out), _norm(exp))


def test_salted_join_no_hot_falls_back(ray_session):
    import ray.data as rd

    left, right = _both_hot_frames(seed=3)
    out, stats = _run_salted(rd, left, right, hot_count=10_000,
                             return_stats=True)
    assert stats["n_hot_keys"] == 0
    exp = left.merge(right, left_on="k", right_on="rk").drop(
        columns=["rk"])
    pd.testing.assert_frame_equal(_norm(out.to_pandas()), _norm(exp))


def test_salted_join_gate(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"k": np.arange(30, dtype=np.int64) % 3,
                         "x": np.arange(30, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(30, dtype=np.int64) % 3,
                          "y": np.arange(30, dtype=np.int64)})
    with pytest.raises(RuntimeError, match="max_hot_keys"):
        _run_salted(rd, left, right, hot_count=5, max_hot_keys=1)


# ------------------------------------------------------------ hyper_anf

def _hanf_edges(rd, edges):
    s = np.array([e[0] for e in edges], np.int64)
    d = np.array([e[1] for e in edges], np.int64)
    return rd.from_arrow(pa.table({
        "src": pa.array(s), "dst": pa.array(d)}))


def _brute_hyper_regsums(edges, max_r, p):
    """Sequential reference: BFS reach sets + the same splitmix64
    bucket/rank rule → exact per-round register sums."""
    from xtract.ops.anf import _node_registers

    adj = {}
    nodes = set()
    for u, v in edges:
        nodes.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    nodes = sorted(nodes)
    idx = {n: i for i, n in enumerate(nodes)}
    base = _node_registers(np.array(nodes, np.int64), p)
    reach = {n: {n} for n in nodes}
    sums = []
    for r in range(max_r + 1):
        if r:
            reach = {n: reach[n] | set().union(
                *(reach[w] for w in adj.get(n, ())))
                for n in nodes}
        m = 1 << p
        total = 0
        for n in nodes:
            regs = np.zeros(m, np.int64)
            for v in reach[n]:
                np.maximum(regs, base[idx[v]], out=regs)
            total += int(regs.sum())
        sums.append(total)
    return sums


def _rand_edges(seed=5, n_nodes=70, n_edges=200):
    rng = np.random.RandomState(seed)
    return list(zip(rng.randint(0, n_nodes, n_edges).tolist(),
                    rng.randint(0, n_nodes, n_edges).tolist()))


def test_hyper_anf_matches_sequential_registers(ray_session):
    import ray.data as rd

    edges = _rand_edges()
    out = __import__("xtract.ops.anf", fromlist=["hyper_anf"]).hyper_anf(
        _hanf_edges(rd, edges), max_r=4, p=4)
    exp = _brute_hyper_regsums(edges, 4, 4)
    assert out["reg_sum"].tolist() == exp


def test_hyper_anf_partition_invariance(ray_session):
    import ray.data as rd

    from xtract.ops.anf import hyper_anf

    edges = _rand_edges(seed=9, n_nodes=40, n_edges=90)
    a = hyper_anf(_hanf_edges(rd, edges).repartition(1), max_r=3, p=4,
                  num_partitions=3)
    b = hyper_anf(_hanf_edges(rd, edges).repartition(13), max_r=3, p=4,
                  num_partitions=17)
    pd.testing.assert_frame_equal(a, b)


def test_hyper_anf_estimate_tracks_exact(ray_session):
    """HLL estimate within the m=64 error band of the exact
    neighborhood function on a connected random graph."""
    import ray.data as rd

    from xtract.ops.anf import hyper_anf, neighborhood_function

    edges = _rand_edges(seed=2, n_nodes=80, n_edges=300)
    ds = _hanf_edges(rd, edges)
    exact = neighborhood_function(ds, max_r=3)
    est = hyper_anf(ds, max_r=3, p=6)
    for r in range(4):
        e = exact.loc[exact.r == r, "n_pairs"].iloc[0]
        h = est.loc[est.r == r, "est_pairs"].iloc[0]
        assert abs(h - e) / e < 0.35, (r, e, h)


def test_hyper_anf_converges_and_saturates(ray_session):
    """Path graph 0-1-2-3: registers stop changing after r=3 and the
    carried-forward rows repeat the fixpoint sum."""
    import ray.data as rd

    from xtract.ops.anf import hyper_anf

    out = hyper_anf(_hanf_edges(rd, [(0, 1), (1, 2), (2, 3)]),
                    max_r=6, p=4)
    assert len(out) == 7
    assert out["reg_sum"].is_monotonic_increasing
    assert out["reg_sum"].iloc[3] == out["reg_sum"].iloc[6]


# ----------------------------------------------------------------- PCA

def _emb_ds(rd, X, ids=None):
    n, d = X.shape
    ids = np.arange(n, dtype=np.int64) if ids is None else ids
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(X.astype(np.float64)),
                              pa.list_(pa.float64(), d))}))


def _brute_scatter(X, unit):
    q = np.floor(X * unit).astype(np.int64)
    n, d = q.shape
    G = q.T @ q
    rows = {(-1, -1): n}
    for i in range(d):
        rows[(i, -1)] = int(q[:, i].sum())
        for j in range(i, d):
            rows[(i, j)] = int(G[i, j])
    return rows


def test_scatter_stats_exact(ray_session):
    import ray.data as rd

    from xtract.ops.pca import scatter_stats

    rng = np.random.RandomState(4)
    X = rng.randn(300, 6)
    out = scatter_stats(_emb_ds(rd, X), unit=1 << 10).to_pandas()
    got = {(int(r.i), int(r.j)): int(r.v) for r in out.itertuples()}
    assert got == _brute_scatter(X, 1 << 10)


def test_scatter_stats_partition_invariance(ray_session):
    import ray.data as rd

    from xtract.ops.pca import scatter_stats

    rng = np.random.RandomState(8)
    X = rng.randn(200, 4)
    a = scatter_stats(_emb_ds(rd, X).repartition(1)).to_pandas()
    b = scatter_stats(_emb_ds(rd, X).repartition(17)).to_pandas()
    key = ["i", "j"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


def test_scatter_stats_headroom_gate(ray_session):
    import ray.data as rd

    from xtract.ops.pca import scatter_stats

    X = np.full((10, 2), 1000.0)
    with pytest.raises(RuntimeError, match="headroom"):
        scatter_stats(_emb_ds(rd, X), unit=1 << 30, headroom_bits=40)


def test_pca_recovers_planted_axis(ray_session):
    """Variance planted along one direction → the top component
    aligns with it and projections match numpy's PCA."""
    import ray.data as rd

    from xtract.ops.pca import pca_components, pca_project, scatter_stats

    rng = np.random.RandomState(11)
    axis = np.array([3.0, 0.0, 4.0]) / 5.0
    X = (rng.randn(400, 1) * 5.0) @ axis[None, :] + rng.randn(400, 3) * 0.1
    ds = _emb_ds(rd, X)
    stats = scatter_stats(ds, unit=1 << 16).to_pandas()
    mean, comps, eig = pca_components(stats, k=2, unit=1 << 16)
    assert abs(abs(float(comps[0] @ axis)) - 1.0) < 1e-3
    assert eig[0] > 20 * eig[1]
    proj = pca_project(ds, mean, comps).to_pandas()
    P = np.stack(proj.sort_values("vec_id")["pc"].to_numpy())
    # numpy reference on the same quantized mean/comps
    exp = (X - mean) @ comps.T
    assert np.allclose(P, exp, atol=1e-9)


def test_pca_sign_rule_deterministic(ray_session):
    import ray.data as rd

    from xtract.ops.pca import pca_components, scatter_stats

    rng = np.random.RandomState(21)
    X = rng.randn(150, 5) * np.array([4.0, 2.0, 1.0, 0.5, 0.1])
    ds = _emb_ds(rd, X)
    s1 = scatter_stats(ds.repartition(2), unit=1 << 14).to_pandas()
    s2 = scatter_stats(ds.repartition(9), unit=1 << 14).to_pandas()
    m1, c1, _ = pca_components(s1, k=3, unit=1 << 14)
    m2, c2, _ = pca_components(s2, k=3, unit=1 << 14)
    assert np.array_equal(c1, c2) and np.array_equal(m1, m2)
    assert all(c1[r, int(np.argmax(np.abs(c1[r])))] > 0
               for r in range(3))


# ------------------------------------------------------- decision tree

def _brute_tree(X, y, depth):
    """Sequential reference with identical split/tie rules."""
    splits, nodes = {}, {0: None}

    def route(row):
        k = 0
        while k in splits:
            f, t = splits[k]
            k = 2 * k + 1 if row[f] <= t else 2 * k + 2
        return k

    for level in range(depth + 1):
        assign = np.array([route(r) for r in X])
        for k in sorted(set(assign.tolist())):
            m = assign == k
            n_k, pos_k = int(m.sum()), int(y[m].sum())
            nodes[k] = (n_k, pos_k)
            if level == depth or n_k == 0:
                continue
            best = None
            for f in range(X.shape[1]):
                vals = np.sort(np.unique(X[m, f]))
                for t in vals[:-1]:
                    lm = m & (X[:, f] <= t)
                    rm = m & (X[:, f] > t)
                    pl, nl = int(y[lm].sum()), int(lm.sum())
                    pr, nr = int(y[rm].sum()), int(rm.sum())
                    err = min(pl, nl - pl) + min(pr, nr - pr)
                    cand = (err, f, int(t))
                    if best is None or cand < best:
                        best = cand
            if best is not None:
                splits[k] = (best[1], best[2])
                nodes.setdefault(2 * k + 1, None)
                nodes.setdefault(2 * k + 2, None)
    leaves = {k: v for k, v in nodes.items()
              if k not in splits and v is not None}
    return splits, leaves


def _tree_ds(rd, X, y):
    cols = {f"x{j}": pa.array(X[:, j], pa.int64())
            for j in range(X.shape[1])}
    cols["y"] = pa.array(y, pa.int64())
    cols["rid"] = pa.array(np.arange(len(y), dtype=np.int64))
    return rd.from_arrow(pa.table(cols))


def _rand_xy(seed=6, n=600, f=3):
    rng = np.random.RandomState(seed)
    X = rng.randint(-8, 9, (n, f)).astype(np.int64)
    y = ((X[:, 0] + 2 * X[:, 1] > 3) ^ (rng.rand(n) < 0.1)).astype(
        np.int64)
    return X, y


def test_train_tree_matches_sequential(ray_session):
    import ray.data as rd

    from xtract.ops.dtree import train_tree

    X, y = _rand_xy()
    tree = train_tree(_tree_ds(rd, X, y).repartition(7),
                      ["x0", "x1", "x2"], "y", depth=2)
    esplits, eleaves = _brute_tree(X, y, 2)
    assert tree["splits"] == esplits
    assert tree["leaves"] == eleaves


def test_train_tree_partition_invariance(ray_session):
    import ray.data as rd

    from xtract.ops.dtree import train_tree

    X, y = _rand_xy(seed=19, n=300)
    a = train_tree(_tree_ds(rd, X, y).repartition(1),
                   ["x0", "x1", "x2"], "y", depth=2)
    b = train_tree(_tree_ds(rd, X, y).repartition(23),
                   ["x0", "x1", "x2"], "y", depth=2,
                   num_partitions=5)
    assert a["splits"] == b["splits"] and a["leaves"] == b["leaves"]


def test_tree_learns_separable_rule(ray_session):
    """Noiseless axis-aligned depth-2 concept → zero training error
    and score_tree reproduces the labels."""
    import ray.data as rd

    from xtract.ops.dtree import score_tree, train_tree

    rng = np.random.RandomState(3)
    X = rng.randint(-10, 11, (500, 3)).astype(np.int64)
    y = ((X[:, 0] <= 2) & (X[:, 2] > -1)).astype(np.int64)
    ds = _tree_ds(rd, X, y)
    tree = train_tree(ds, ["x0", "x1", "x2"], "y", depth=2)
    scored = score_tree(ds, tree, id_cols=("rid", "y")).to_pandas()
    assert (scored["pred"] == scored["y"]).all()


def test_tree_pure_node_stops(ray_session):
    """A node whose features are all constant cannot split — it
    stays a leaf even above the depth limit."""
    import ray.data as rd

    from xtract.ops.dtree import train_tree

    X = np.zeros((40, 2), np.int64)
    y = (np.arange(40) % 2).astype(np.int64)
    tree = train_tree(_tree_ds(rd, X, y), ["x0", "x1"], "y", depth=2)
    assert tree["splits"] == {} and tree["leaves"] == {0: (40, 20)}


def test_tree_hist_gate(ray_session):
    import ray.data as rd

    from xtract.ops.dtree import train_tree

    X, y = _rand_xy(n=200)
    with pytest.raises(RuntimeError, match="max_hist"):
        train_tree(_tree_ds(rd, X, y), ["x0", "x1", "x2"], "y",
                   depth=1, max_hist=3)


# ------------------------------------------------------------ rrf_fuse

def _ranked(rd, ids, ranks):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.array(ids, np.int64)),
        "rank": pa.array(np.array(ranks, np.int64))}))


def test_rrf_fuse_brute_force(ray_session):
    import ray.data as rd

    from xtract.ops.ranking import rrf_fuse

    a = _ranked(rd, [10, 20, 30], [1, 2, 3])
    b = _ranked(rd, [20, 40], [1, 2])
    out = rrf_fuse([a, b], k_const=60, scale=10 ** 6).to_pandas()
    got = {int(r.doc_id): (int(r.rrf_score), int(r.n_lists))
           for r in out.itertuples()}
    s = 10 ** 6
    assert got == {
        10: (s // 61, 1),
        20: (s // 62 + s // 61, 2),
        30: (s // 63, 1),
        40: (s // 62, 1)}


def test_rrf_fuse_partition_invariance(ray_session):
    import ray.data as rd

    from xtract.ops.ranking import rrf_fuse

    rng = np.random.RandomState(2)
    ids = rng.permutation(200)[:50]
    a = _ranked(rd, ids, np.arange(1, 51))
    b = _ranked(rd, ids[::-1], np.arange(1, 51))
    o1 = rrf_fuse([a.repartition(1), b.repartition(1)]).to_pandas()
    o2 = rrf_fuse([a.repartition(9), b.repartition(4)]).to_pandas()
    k = ["doc_id"]
    pd.testing.assert_frame_equal(
        o1.sort_values(k).reset_index(drop=True),
        o2.sort_values(k).reset_index(drop=True))


# ------------------------------------------------- distributed MIS

def test_mis_distributed_matches_broadcast(ray_session):
    import ray.data as rd

    from xtract.ops.graph import maximal_independent_set

    edges = _rand_edges(seed=17, n_nodes=50, n_edges=140)
    ds = _hanf_edges(rd, edges)
    a = maximal_independent_set(ds).to_pandas().sort_values(
        "node").reset_index(drop=True)
    b = maximal_independent_set(
        ds.repartition(7), distributed=True,
        num_partitions=5).to_pandas().sort_values(
        "node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_mis_distributed_properties(ray_session):
    """Independence + maximality hold in distributed mode."""
    import ray.data as rd

    from xtract.ops.graph import maximal_independent_set

    edges = [(u, v) for u, v in _rand_edges(seed=23, n_nodes=30,
                                            n_edges=70) if u != v]
    out = maximal_independent_set(
        _hanf_edges(rd, edges), distributed=True).to_pandas()
    mis = set(out.loc[out.in_mis == 1, "node"])
    und = {(min(u, v), max(u, v)) for u, v in edges}
    assert all(not (u in mis and v in mis) for u, v in und)
    # maximality: every non-member has a MIS neighbor
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nonm = set(out.loc[out.in_mis == 0, "node"])
    assert all(adj.get(n, set()) & mis for n in nonm)


# ------------------------------------------------- distributed k-core

def test_k_core_distributed_matches_broadcast(ray_session):
    import ray.data as rd

    from xtract.ops.graph import k_core

    edges = _rand_edges(seed=31, n_nodes=60, n_edges=250)
    ds = rd.from_arrow(pa.table({
        "src": pa.array(np.array([e[0] for e in edges], np.int64)),
        "dst": pa.array(np.array([e[1] for e in edges], np.int64))}))
    a = k_core(ds, k=4).to_pandas().sort_values(
        "node").reset_index(drop=True)
    b = k_core(ds.repartition(9), k=4, distributed=True,
               num_partitions=5).to_pandas().sort_values(
        "node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------- sampled quantiles

def test_sampled_quantiles_exact_below_s(ray_session):
    """n ≤ s → the sample is the whole column → exact quantiles."""
    import ray.data as rd

    from xtract.ops.quantiles import sampled_quantiles

    rng = np.random.RandomState(5)
    vals = rng.randn(500) * 10
    ds = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(500, dtype=np.int64)),
        "v": pa.array(vals)}))
    out = sampled_quantiles(ds, "id", "v",
                            {"p50": 0.5, "p90": 0.9}, s=4096)
    sv = np.sort(vals)
    assert out.loc[0, "value"] == sv[int(np.ceil(0.5 * 500)) - 1]
    assert out.loc[1, "value"] == sv[int(np.ceil(0.9 * 500)) - 1]


def test_sampled_quantiles_invariance_and_band(ray_session):
    import ray.data as rd

    from xtract.ops.quantiles import sampled_quantiles

    rng = np.random.RandomState(7)
    vals = rng.exponential(5.0, 20_000)
    ids = rng.permutation(20_000).astype(np.int64)
    t = pa.table({"id": pa.array(ids), "v": pa.array(vals)})
    a = sampled_quantiles(rd.from_arrow(t).repartition(1),
                          "id", "v", {"p50": 0.5}, s=2048)
    b = sampled_quantiles(rd.from_arrow(t).repartition(31),
                          "id", "v", {"p50": 0.5}, s=2048)
    pd.testing.assert_frame_equal(a, b)  # bit-identical
    exact = np.sort(vals)[int(np.ceil(0.5 * len(vals))) - 1]
    assert abs(a.loc[0, "value"] - exact) / exact < 0.1


# ------------------------------------------------------- random forest

def _brute_weighted_tree(X, y, w, depth):
    """Sequential weighted reference (zero-weight rows excluded from
    histograms AND threshold candidates, matching train_tree)."""
    keep = w > 0
    X, y, w = X[keep], y[keep], w[keep]
    splits, nodes = {}, {0: None}

    def route(row):
        k = 0
        while k in splits:
            f, t = splits[k]
            k = 2 * k + 1 if row[f] <= t else 2 * k + 2
        return k

    for level in range(depth + 1):
        assign = np.array([route(r) for r in X])
        for k in sorted(set(assign.tolist())):
            m = assign == k
            n_k, pos_k = int(w[m].sum()), int((w[m] * y[m]).sum())
            nodes[k] = (n_k, pos_k)
            if level == depth:
                continue
            best = None
            for f in range(X.shape[1]):
                vals = np.sort(np.unique(X[m, f]))
                for t in vals[:-1]:
                    lm = m & (X[:, f] <= t)
                    rm = m & (X[:, f] > t)
                    pl, nl = int((w[lm] * y[lm]).sum()), int(w[lm].sum())
                    pr, nr = int((w[rm] * y[rm]).sum()), int(w[rm].sum())
                    err = min(pl, nl - pl) + min(pr, nr - pr)
                    cand = (err, f, int(t))
                    if best is None or cand < best:
                        best = cand
            if best is not None:
                splits[k] = (best[1], best[2])
                nodes.setdefault(2 * k + 1, None)
                nodes.setdefault(2 * k + 2, None)
    leaves = {k: v for k, v in nodes.items()
              if k not in splits and v is not None}
    return splits, leaves


def test_forest_matches_sequential_weighted_trees(ray_session):
    import ray.data as rd

    from xtract.ops.bootstrap import _weights
    from xtract.ops.dtree import train_forest

    X, y = _rand_xy(seed=41, n=400)
    ids = np.arange(400, dtype=np.int64)
    cols = {f"x{j}": pa.array(X[:, j]) for j in range(3)}
    cols["y"] = pa.array(y)
    cols["doc_id"] = pa.array(ids)
    ds = rd.from_arrow(pa.table(cols)).repartition(6)
    forest = train_forest(ds, ["x0", "x1", "x2"], "y",
                          id_col="doc_id", n_trees=3, depth=1)
    for t, tree in enumerate(forest):
        w = _weights(ids, t, 3)
        es, el = _brute_weighted_tree(X, y, w, 1)
        assert tree["splits"] == es and tree["leaves"] == el


def test_forest_vote_and_invariance(ray_session):
    import ray.data as rd

    from xtract.ops.dtree import score_forest, train_forest

    rng = np.random.RandomState(9)
    X = rng.randint(-10, 11, (500, 3)).astype(np.int64)
    y = ((X[:, 0] <= 2) & (X[:, 2] > -1)).astype(np.int64)
    cols = {f"x{j}": pa.array(X[:, j]) for j in range(3)}
    cols["y"] = pa.array(y)
    cols["doc_id"] = pa.array(np.arange(500, dtype=np.int64))
    t = pa.table(cols)
    ds1 = rd.from_arrow(t).repartition(1)
    ds2 = rd.from_arrow(t).repartition(17)
    f1 = train_forest(ds1, ["x0", "x1", "x2"], "y",
                      id_col="doc_id", n_trees=5, depth=2)
    f2 = train_forest(ds2, ["x0", "x1", "x2"], "y",
                      id_col="doc_id", n_trees=5, depth=2)
    assert all(a["splits"] == b["splits"] and a["leaves"] == b["leaves"]
               for a, b in zip(f1, f2))
    scored = score_forest(ds1, f1, id_cols=("doc_id", "y")).to_pandas()
    acc = (scored["pred"] == scored["y"]).mean()
    assert acc > 0.93  # bagged noiseless depth-2 concept (bootstrap noise)
