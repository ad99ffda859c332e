"""Distributed logistic regression: learnability, exactness vs a
sequential reference, partition invariance, gates."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from xtract.ops.logreg import _p_micro, _tdiv, score_logreg, train_logreg


def _seq_reference(X, y, steps, lr, w_scale=1_000_000, z_den=10_000,
                   p_scale=1_000_000):
    """Single-process replay of the exact integer GD."""
    W = np.zeros(X.shape[1], np.int64)
    n = len(y)
    for _ in range(steps):
        P = _p_micro(X, W, w_scale, z_den, p_scale)
        G = ((y * p_scale - P)[:, None] * X).sum(axis=0)
        W = np.asarray([W[j] + _tdiv(lr * int(G[j]), n)
                        for j in range(X.shape[1])], np.int64)
    return W


def _synth(n=400, seed=5):
    """Separable-ish synthetic set: y = (3*a - 2*b + noise > 0)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 20, n).astype(np.int64)
    b = rng.randint(0, 20, n).astype(np.int64)
    y = ((3 * a - 2 * b + rng.randint(-5, 6, n)) > 8).astype(np.int64)
    X = np.stack([np.ones(n, np.int64), a - 10, b - 10], axis=1)
    return X, y


def _feats_ds(X, y, blocks=1):
    t = pa.table({"x0": X[:, 0], "x1": X[:, 1], "x2": X[:, 2], "y": y})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_tdiv_matches_duckdb_trunc():
    import duckdb

    con = duckdb.connect()
    for num, den in [(-7, 2), (7, 2), (-7, -2), (0, 3), (123456789, 7),
                     (-123456789, 7)]:
        got = con.execute(f"SELECT CAST({num} AS BIGINT) // {den}"
                          ).fetchone()[0]
        assert _tdiv(num, den) == got, (num, den)


def test_learns_separable_boundary(ray_session):
    X, y = _synth()
    model = train_logreg(_feats_ds(X, y), ["x0", "x1", "x2"], "y",
                         steps=6, lr=64)
    scored = score_logreg(
        _feats_ds(X, y).map_batches(
            lambda t: t.append_column("rid", pa.array(
                np.arange(len(t)), pa.int64())), batch_format="pyarrow"),
        model, ["rid"]).to_pandas().sort_values("rid")
    acc = (scored["pred"].to_numpy() == y).mean()
    assert acc >= 0.95, acc


def test_weights_match_sequential_reference_any_partitioning(ray_session):
    X, y = _synth(n=300, seed=11)
    want = _seq_reference(X, y, steps=5, lr=32)
    for blocks in (1, 7):
        model = train_logreg(_feats_ds(X, y, blocks), ["x0", "x1", "x2"],
                             "y", steps=5, lr=32)
        assert model["w"] == want.tolist(), blocks


def test_max_rows_gate(ray_session):
    X, y = _synth(n=50)
    with pytest.raises(ValueError, match="max_rows"):
        train_logreg(_feats_ds(X, y), ["x0", "x1", "x2"], "y",
                     steps=1, max_rows=10)


def test_scores_are_int_micro_probs(ray_session):
    X, y = _synth(n=100)
    model = train_logreg(_feats_ds(X, y), ["x0", "x1", "x2"], "y",
                         steps=3, lr=32)
    out = score_logreg(_feats_ds(X, y), model, ["y"]).to_pandas()
    assert out["p_micro"].between(0, 1_000_000).all()
    assert set(out["pred"].unique()) <= {0, 1}
