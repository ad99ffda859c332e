"""Gradient-boosted stumps (ops/boost): sequential-reference
equality at any partitioning, learnability, DuckDB ``//`` parity of
the truncating divisions, histogram gate, no-split fallback."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xtract.ops.boost import (_tdiv, boost_table, score_boost,
                              train_boost)

UNIT = 1_000_000


def _frame(n=400, seed=3):
    """Integer features with a noisy separable rule."""
    rng = np.random.RandomState(seed)
    x0 = rng.randint(-20, 21, n).astype(np.int64)
    x1 = rng.randint(0, 50, n).astype(np.int64)
    x2 = rng.randint(-5, 6, n).astype(np.int64)
    y = ((x0 > 3) | ((x1 > 40) & (x2 > 0))).astype(np.int64)
    flip = rng.rand(n) < 0.05
    y[flip] = 1 - y[flip]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "x0": x0, "x1": x1, "x2": x2, "y": y})


def _train_seq(df, feats, rounds=3, lr_num=1, lr_den=2, unit=UNIT):
    """Driver-only sequential reference with Python ints throughout."""
    X = df[feats].to_numpy(np.int64)
    tgt = df["y"].to_numpy(np.int64) * unit
    n = len(df)
    f0 = _tdiv(int(tgt.sum()), n)
    scores = np.full(n, f0, np.int64)
    stumps = []
    for _ in range(rounds):
        r = tgt - scores
        s_total = int(r.sum())
        best = None
        for f in range(len(feats)):
            vals = np.unique(X[:, f])
            for thr in vals[:-1]:
                m = X[:, f] <= thr
                nl, sl = int(m.sum()), int(r[m].sum())
                nr, sr = n - nl, s_total - sl
                gain = (sl * sl) // nl + (sr * sr) // nr
                cand = (-gain, f, int(thr), _tdiv(sl, nl),
                        _tdiv(sr, nr))
                if best is None or cand < best:
                    best = cand
        if best is None:
            v = _tdiv(s_total, n)
            stumps.append((-1, 0, v, v))
            scores = scores + _tdiv(lr_num * v, lr_den)
            continue
        _, f, thr, vl, vr = best
        stumps.append((f, thr, vl, vr))
        contrib = np.where(X[:, f] <= thr, vl, vr)
        q = np.abs(lr_num * contrib) // lr_den
        scores = scores + np.where(lr_num * contrib < 0, -q, q)
    return f0, stumps, scores


def _ds_of(rd, df, parts):
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)


def test_boost_matches_sequential_reference(ray_session):
    import ray.data as rd

    df = _frame()
    feats = ["x0", "x1", "x2"]
    f0, stumps, scores = _train_seq(df, feats)
    for parts in (1, 7):
        m = train_boost(_ds_of(rd, df, parts), feats, rounds=3)
        assert m["f0"] == f0
        assert m["stumps"] == stumps
        out = (score_boost(_ds_of(rd, df, parts), m).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        np.testing.assert_array_equal(
            out["score"].to_numpy(np.int64), scores)


def test_boost_learns_and_improves_over_base(ray_session):
    import ray.data as rd

    df = _frame(seed=11)
    feats = ["x0", "x1", "x2"]
    m = train_boost(_ds_of(rd, df, 5), feats, rounds=4)
    out = (score_boost(_ds_of(rd, df, 5), m).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    acc = (out["pred"].to_numpy() == df["y"].to_numpy()).mean()
    base_pred = int(2 * m["f0"] > UNIT)
    base_acc = (df["y"].to_numpy() == base_pred).mean()
    assert acc >= 0.85 and acc > base_acc


def test_tdiv_matches_duckdb():
    import duckdb

    cases = [(-7, 2), (7, -2), (-7, -2), (7, 2), (0, 5),
             (-1, 3), (-(10**12) - 7, 13)]
    got = [duckdb.sql(f"SELECT {a} // {b}").fetchone()[0]
           for a, b in cases]
    assert got == [_tdiv(a, b) for a, b in cases]


def test_boost_hist_gate(ray_session):
    import ray.data as rd

    df = _frame()
    with pytest.raises(RuntimeError, match="max_hist"):
        train_boost(_ds_of(rd, df, 3), ["x0", "x1", "x2"],
                    rounds=1, max_hist=5)


def test_boost_constant_features_fallback(ray_session):
    import ray.data as rd

    n = 60
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "x0": np.zeros(n, np.int64),
                       "y": (np.arange(n) % 3 == 0).astype(np.int64)})
    m = train_boost(_ds_of(rd, df, 4), ["x0"], rounds=2)
    assert all(f == -1 and vl == vr for f, _, vl, vr in m["stumps"])
    tbl = boost_table(m)
    assert list(tbl.columns) == ["round", "feat", "thr",
                                 "v_left", "v_right"]
    out = score_boost(_ds_of(rd, df, 4), m).to_pandas()
    assert out["score"].nunique() == 1
    # flat rounds converge toward the mean: residual shrinks
    mean_tgt = _tdiv(int(df["y"].sum()) * UNIT, n)
    assert abs(int(out["score"].iloc[0]) - mean_tgt) <= abs(
        m["f0"] - mean_tgt) + 1
