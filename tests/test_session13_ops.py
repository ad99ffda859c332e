"""Session-13 ops: CUSUM changepoint detection (and friends)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_cusum(df, drift, threshold):
    """Sequential reference: the literal Page recursion per key."""
    out = []
    for k, g in df.sort_values(["k", "ts", "i"]).groupby("k"):
        s, smax, alarm = 0, 0, -1
        for _, r in g.iterrows():
            s = max(0, s + int(r.v) - drift)
            smax = max(smax, s)
            if alarm < 0 and s > threshold:
                alarm = int(r.i)
        out.append((k, len(g), smax, alarm))
    return pd.DataFrame(out, columns=["k", "n_events", "max_cusum",
                                      "alarm_id"])


def _to_ds(rd, df):
    return rd.from_arrow(pa.table({
        "k": pa.array(df.k, pa.int64()),
        "ts": pa.array(df.ts, pa.int64()),
        "v": pa.array(df.v, pa.int64()),
        "i": pa.array(df.i, pa.int64())}))


def _run(ray_session, df, drift, threshold, parts):
    import ray.data as rd

    from xtract.ops.changepoint import cusum_alarms

    ds = _to_ds(rd, df)
    out = cusum_alarms(ds, key="k", ts_col="ts", val_col="v",
                       id_col="i", drift=drift, threshold=threshold,
                       num_partitions=parts).to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def _rand_frame(seed=7, n=400, keys=9):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "k": rng.randint(0, keys, n).astype(np.int64),
        "ts": rng.randint(0, 40, n).astype(np.int64),  # many ties
        "v": rng.randint(-50, 120, n).astype(np.int64),
        "i": np.arange(n, dtype=np.int64),
    })


def test_cusum_matches_sequential_reference(ray_session):
    df = _rand_frame()
    got = _run(ray_session, df, drift=30, threshold=200, parts=16)
    exp = (_brute_cusum(df, 30, 200).sort_values("k")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"))
    # non-degenerate: some alarm, some don't
    assert (got.alarm_id >= 0).any() and (got.alarm_id < 0).any()


def test_cusum_partition_invariance(ray_session):
    df = _rand_frame(seed=11)
    a = _run(ray_session, df, drift=25, threshold=150, parts=1)
    b = _run(ray_session, df, drift=25, threshold=150, parts=64)
    pd.testing.assert_frame_equal(a, b)


def test_cusum_never_alarms_below_threshold(ray_session):
    df = pd.DataFrame({
        "k": np.zeros(5, np.int64),
        "ts": np.arange(5, dtype=np.int64),
        "v": np.array([1, 2, 1, 2, 1], np.int64),
        "i": np.arange(5, dtype=np.int64)})
    out = _run(ray_session, df, drift=0, threshold=10**9, parts=4)
    assert out.alarm_id.tolist() == [-1]
    assert out.max_cusum.tolist() == [7]


def test_cusum_resets_at_zero(ray_session):
    # big negative run then a shift: the statistic must restart from 0,
    # not climb out of a deep negative prefix
    df = pd.DataFrame({
        "k": np.zeros(6, np.int64),
        "ts": np.arange(6, dtype=np.int64),
        "v": np.array([-1000, -1000, 50, 50, 50, 50], np.int64),
        "i": np.arange(6, dtype=np.int64)})
    out = _run(ray_session, df, drift=10, threshold=100, parts=2)
    # S after resets: 0,0,40,80,120(alarm at i=4),160
    assert out.alarm_id.tolist() == [4]
    assert out.max_cusum.tolist() == [160]


# ---------------------------------------------------------------------------
# two_sample_ks
# ---------------------------------------------------------------------------

def _brute_ks(va, vb):
    """Reference: evaluate |F_a - F_b| at every pooled value."""
    va, vb = np.asarray(va), np.asarray(vb)
    pool = np.unique(np.concatenate([va, vb]))
    ca = np.searchsorted(np.sort(va), pool, side="right")
    cb = np.searchsorted(np.sort(vb), pool, side="right")
    d_num = np.abs(len(vb) * ca - len(va) * cb).max()
    return int(d_num), d_num / (len(va) * len(vb))


def _ks_ds(rd, va, vb, parts=None):
    t = pa.table({
        "g": pa.array(["a"] * len(va) + ["b"] * len(vb)),
        "v": pa.array(list(va) + list(vb), pa.int64())})
    ds = rd.from_arrow(t)
    if parts:
        ds = ds.repartition(parts)
    return ds


def test_ks_matches_bruteforce(ray_session):
    import ray.data as rd

    from xtract.ops.drift import two_sample_ks

    rng = np.random.RandomState(3)
    va = rng.randint(0, 60, 300)          # many ties
    vb = rng.randint(10, 80, 211)
    out = two_sample_ks(_ks_ds(rd, va, vb), "g", "v", "a", "b")
    d_num, ks = _brute_ks(va, vb)
    assert out.n_a[0] == 300 and out.n_b[0] == 211
    assert out.d_num[0] == d_num
    assert out.ks[0] == ks


def test_ks_disjoint_is_one_identical_is_zero(ray_session):
    import ray.data as rd

    from xtract.ops.drift import two_sample_ks

    out = two_sample_ks(_ks_ds(rd, [1, 2, 3], [10, 11]), "g", "v",
                        "a", "b")
    assert out.ks[0] == 1.0
    same = list(range(50)) * 2
    out2 = two_sample_ks(_ks_ds(rd, same, same), "g", "v", "a", "b")
    assert out2.d_num[0] == 0


def test_ks_block_invariance(ray_session):
    import ray.data as rd

    from xtract.ops.drift import two_sample_ks

    rng = np.random.RandomState(9)
    va = rng.randint(0, 40, 150)
    vb = rng.randint(5, 45, 170)
    a = two_sample_ks(_ks_ds(rd, va, vb, parts=1), "g", "v", "a", "b")
    b = two_sample_ks(_ks_ds(rd, va, vb, parts=23), "g", "v", "a", "b")
    pd.testing.assert_frame_equal(a, b)


def test_ks_empty_group_raises(ray_session):
    import ray.data as rd

    from xtract.ops.drift import two_sample_ks

    with pytest.raises(ValueError):
        two_sample_ks(_ks_ds(rd, [1, 2], []), "g", "v", "a", "b")


# ---------------------------------------------------------------------------
# farthest_first_centers
# ---------------------------------------------------------------------------

def _brute_ff(vecs, ids, k, unit=1 << 20):
    q = np.floor(np.asarray(vecs, np.float64) * unit).astype(np.int64)
    ids = np.asarray(ids, np.int64)
    order = np.argsort(ids)
    q, ids = q[order], ids[order]
    chosen = [0]
    rounds = [(1, int(ids[0]), 0)]
    d = ((q - q[0]) ** 2).sum(axis=1)
    for r in range(2, k + 1):
        w = np.lexsort((ids, -d))[0]
        rounds.append((r, int(ids[w]), int(d[w])))
        chosen.append(w)
        d = np.minimum(d, ((q - q[w]) ** 2).sum(axis=1))
    return pd.DataFrame(rounds, columns=["round", "vec_id", "dist2"])


def _ff_ds(rd, vecs, ids, parts=None):
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts else ds


def test_farthest_first_matches_bruteforce(ray_session):
    import ray.data as rd

    from xtract.ops.similarity import farthest_first_centers

    rng = np.random.RandomState(5)
    vecs = rng.randn(120, 8).astype(np.float32)
    ids = rng.permutation(1000)[:120]
    got = farthest_first_centers(_ff_ds(rd, vecs, ids), k=6)
    exp = _brute_ff(vecs.astype(np.float64), ids, 6)
    pd.testing.assert_frame_equal(got, exp.astype("int64"))
    # coverage radius shrinks (weakly) after round 2
    d = got.dist2.to_numpy()
    assert (np.diff(d[1:]) <= 0).all()


def test_farthest_first_partition_invariance(ray_session):
    import ray.data as rd

    from xtract.ops.similarity import farthest_first_centers

    rng = np.random.RandomState(2)
    vecs = rng.randn(90, 6).astype(np.float32)
    ids = np.arange(90)
    a = farthest_first_centers(_ff_ds(rd, vecs, ids, parts=1), k=4)
    b = farthest_first_centers(_ff_ds(rd, vecs, ids, parts=17), k=4)
    pd.testing.assert_frame_equal(a, b)


def test_farthest_first_covers_planted_clusters(ray_session):
    import ray.data as rd

    from xtract.ops.similarity import farthest_first_centers

    rng = np.random.RandomState(1)
    blobs = [np.array([0.0, 0.0]), np.array([100.0, 0.0]),
             np.array([0.0, 100.0])]
    vecs, labels = [], []
    for li, c in enumerate(blobs):
        vecs.extend((c + rng.randn(30, 2) * 0.1).tolist())
        labels.extend([li] * 30)
    ids = np.arange(90)
    out = farthest_first_centers(_ff_ds(rd, vecs, ids), k=3)
    picked = {labels[int(i)] for i in out.vec_id}
    assert picked == {0, 1, 2}


# ---------------------------------------------------------------------------
# mmr_select
# ---------------------------------------------------------------------------

def _brute_mmr(vecs, ids, qv, k, pool, lam_num=7, lam_den=10,
               unit=1 << 20):
    q = np.floor(np.asarray(vecs, np.float64) * unit).astype(np.int64)
    qq = np.floor(np.asarray(qv, np.float64) * unit).astype(np.int64)
    ids = np.asarray(ids, np.int64)
    rel = q @ qq
    top = np.lexsort((ids, -rel))[:pool]
    q, ids, rel = q[top], ids[top], rel[top]
    sel, rows = [0], [(1, int(ids[0]), int(rel[0]), 0)]
    rem = list(range(1, len(ids)))
    for r in range(2, min(k, len(ids)) + 1):
        best = None
        for i in rem:
            ms = max(int(q[i] @ q[j]) for j in sel)
            mmr = lam_num * int(rel[i]) - (lam_den - lam_num) * ms
            key = (-mmr, int(ids[i]))
            if best is None or key < best[0]:
                best = (key, i, ms)
        _, w, ms = best
        rows.append((r, int(ids[w]), int(rel[w]), ms))
        sel.append(w)
        rem.remove(w)
    return pd.DataFrame(rows, columns=["sel_round", "vec_id", "rel",
                                       "max_sim"])


def test_mmr_matches_bruteforce(ray_session):
    import ray.data as rd

    from xtract.ops.similarity import mmr_select

    rng = np.random.RandomState(8)
    vecs = rng.randn(150, 10).astype(np.float32)
    ids = rng.permutation(900)[:150]
    qv = rng.randn(10)
    got = mmr_select(_ff_ds(rd, vecs, ids), qv, k=6, pool=15)
    exp = _brute_mmr(vecs.astype(np.float64), ids, qv, 6, 15)
    pd.testing.assert_frame_equal(got, exp.astype("int64"))


def test_mmr_partition_invariance_and_diversity(ray_session):
    import ray.data as rd

    from xtract.ops.similarity import mmr_select

    # two tight near-duplicate clusters close to the query plus one
    # farther distinct direction: pure relevance top-3 stays inside
    # cluster A; MMR must mix in the distinct direction.
    rng = np.random.RandomState(4)
    a = np.array([1.0, 0.0]) + rng.randn(20, 2) * 0.01
    bcl = np.array([0.8, 0.59]) + rng.randn(20, 2) * 0.01
    vecs = np.vstack([a, bcl]).astype(np.float32)
    ids = np.arange(40)
    qv = np.array([1.0, 0.2])
    x = mmr_select(_ff_ds(rd, vecs, ids, parts=1), qv, k=3, pool=40,
                   lam_num=1, lam_den=10)
    y = mmr_select(_ff_ds(rd, vecs, ids, parts=13), qv, k=3, pool=40,
                   lam_num=1, lam_den=10)
    pd.testing.assert_frame_equal(x, y)
    picked_clusters = {0 if i < 20 else 1 for i in x.vec_id}
    assert picked_clusters == {0, 1}


def test_mmr_pool_smaller_than_k(ray_session):
    import ray.data as rd

    from xtract.ops.similarity import mmr_select

    vecs = np.eye(3, 4, dtype=np.float32)
    out = mmr_select(_ff_ds(rd, vecs, np.arange(3)),
                     np.ones(4), k=10, pool=10)
    assert len(out) == 3
    assert out.sel_round.tolist() == [1, 2, 3]
