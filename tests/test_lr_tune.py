"""Successive-halving LR tuner: schedule semantics, warm-start
equivalence, loss exactness."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.logreg import (l1_loss, train_logreg,
                               tune_logreg_halving)


def _feats(n=300, seed=11, blocks=1):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 20, n).astype(np.int64)
    b = rng.randint(0, 20, n).astype(np.int64)
    y = ((3 * a - 2 * b + rng.randint(-5, 6, n)) > 8).astype(np.int64)
    t = pa.table({"x0": np.ones(n, np.int64), "x1": a - 10,
                  "x2": b - 10, "y": y})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_warm_start_equals_straight_run(ray_session):
    feats = _feats()
    cols = ["x0", "x1", "x2"]
    m2 = train_logreg(feats, cols, "y", steps=2, lr=64)
    m4_warm = train_logreg(feats, cols, "y", steps=2, lr=64,
                           w0=m2["w"])
    m4 = train_logreg(feats, cols, "y", steps=4, lr=64)
    assert m4_warm["w"] == m4["w"]


def test_winner_has_exactly_two_rungs_of_steps(ray_session):
    feats = _feats()
    cols = ["x0", "x1", "x2"]
    best = tune_logreg_halving(feats, cols, "y",
                               lr_grid=(16, 64), rung_steps=3)
    # 2 candidates -> one rung trains both 3 steps, halving decides:
    # the winner's weights equal a straight 3-step run at its lr
    straight = train_logreg(feats, cols, "y", steps=3,
                            lr=best["best_lr"])
    assert best["w"] == straight["w"]
    assert best["loss"] == l1_loss(feats, straight, cols, "y")


def test_search_partition_invariant(ray_session):
    a = tune_logreg_halving(_feats(), ["x0", "x1", "x2"], "y",
                            lr_grid=(8, 32, 128, 512), rung_steps=2)
    b = tune_logreg_halving(_feats(blocks=7), ["x0", "x1", "x2"], "y",
                            lr_grid=(8, 32, 128, 512), rung_steps=2)
    assert (a["best_lr"], a["loss"], a["w"]) == \
           (b["best_lr"], b["loss"], b["w"])


def test_picks_lower_loss_candidate(ray_session):
    feats = _feats()
    cols = ["x0", "x1", "x2"]
    best = tune_logreg_halving(feats, cols, "y",
                               lr_grid=(1, 256), rung_steps=2)
    # lr=1 barely moves the weights -> higher loss than lr=256
    l_small = l1_loss(feats, train_logreg(feats, cols, "y", steps=2,
                                          lr=1), cols, "y")
    l_big = l1_loss(feats, train_logreg(feats, cols, "y", steps=2,
                                        lr=256), cols, "y")
    assert l_big < l_small
    assert best["best_lr"] == 256
