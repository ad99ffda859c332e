"""Distributed trained logistic-regression classifier (the FineWeb /
CCNet quality-classifier shape: train a cheap linear model on document
features, score the whole corpus with it).

Reference parity: the reference's trainable model surface is its
build-time language models (`build.rs:480-515`) consumed by a stateful
scorer; here the model is TRAINED inside the engine by full-batch
gradient descent expressed as Ray Data passes, then broadcast to a
stateless scoring stage.

Exactness contract (what makes the result partition-invariant AND
DuckDB-oracle-checkable):

- Features and labels are int64; weights live in integer micro-units
  (``w_scale``).  The only floats are the per-row sigmoid evaluation
  — ``z = z_num / (w_scale*z_den)`` (an exact int64 dot product cast
  to double once) and ``p = p_scale/(1+exp(-z))`` — immediately
  re-quantized with ``floor(p + 0.5)`` to an int64 micro-probability.
- The gradient ``sum((y*p_scale - p_micro) * x_j)`` is therefore a
  pure int64 sum: order-free, exact, identical under any partitioning.
- The weight update is truncating integer division (``_tdiv``),
  matching DuckDB's ``//`` semantics so k GD steps are expressible as
  k nested scalar CTEs in the oracle.

Scale shape: each step is ONE streaming pass over the (slim, d+1
int64 columns) feature table emitting a single d+1-value partial per
block into a native Sum — nothing corpus-proportional ever reaches
the driver.  The int64 gradient headroom bounds the training set:
``n_rows * p_scale * max|x|`` must stay below 2^63 (enforced via
``max_rows``; at corpus scale you train the classifier on a sampled
split — the published quality-classifier recipe — and score
everything with the broadcast weights).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tdiv(num: int, den: int) -> int:
    """Truncating integer division (toward zero) on exact ints —
    DuckDB's ``//`` semantics, NOT Python's floor ``//``."""
    q = abs(num) // abs(den)
    return -q if (num < 0) != (den < 0) else q


def _p_micro(X: np.ndarray, W: np.ndarray, w_scale: int, z_den: int,
             p_scale: int) -> np.ndarray:
    """Quantized sigmoid: int64 micro-probabilities for each row.
    ``X @ W`` is exact int64 (caller guarantees headroom); the double
    division / exp / floor sequence is IEEE-identical to the oracle's
    ``FLOOR(p_scale/(1+EXP(-zn/(w_scale*z_den))) + 0.5)``."""
    z = (X @ W).astype(np.float64) / float(w_scale * z_den)
    with np.errstate(over="ignore"):
        p = p_scale / (1.0 + np.exp(-z))
    return np.floor(p + 0.5).astype(np.int64)


def train_logreg(feats, x_cols: list[str], label_col: str,
                 steps: int = 4, lr: int = 32, w_scale: int = 1_000_000,
                 z_den: int = 10_000, p_scale: int = 1_000_000,
                 max_rows: int = 10_000_000,
                 w0: "list[int] | None" = None) -> dict:
    """Full-batch GD from zero weights over int64 feature columns
    (include an all-ones bias column; CENTER features with fixed
    constants — an uncentered large-scale feature starves the bias).
    ``label_col`` is 0/1 int64.  Returns the model dict for
    ``score_logreg``.

    Each step: one map_batches pass (per-block int64 gradient partial,
    one row per block) → native Sum → driver-side integer weight
    update.  d+1 int64s move per block; the driver holds d ints."""
    d = len(x_cols)
    W = list(w0) if w0 is not None else [0] * d
    g_names = [f"g{j}" for j in range(d)]

    for _ in range(steps):
        Wb = np.asarray(W, np.int64)

        def partial(t: pa.Table, Wb=Wb) -> pa.Table:
            X = np.stack([t[c].to_numpy(zero_copy_only=False)
                          for c in x_cols], axis=1).astype(np.int64)
            y = t[label_col].to_numpy(zero_copy_only=False)
            P = _p_micro(X, Wb, w_scale, z_den, p_scale)
            G = ((y * p_scale - P)[:, None] * X).sum(axis=0)
            cols = {g_names[j]: pa.array([int(G[j])], pa.int64())
                    for j in range(d)}
            cols["n"] = pa.array([len(y)], pa.int64())
            return pa.table(cols)

        sums = feats.map_batches(partial, batch_format="pyarrow").sum(
            g_names + ["n"])
        n = int(sums["sum(n)"])
        if n > max_rows:
            raise ValueError(
                f"train_logreg: {n} training rows > max_rows={max_rows} "
                "(int64 gradient headroom) — train on a sampled split")
        if n == 0:
            raise ValueError("train_logreg: empty training set")
        W = [W[j] + _tdiv(lr * int(sums[f"sum(g{j})"]), n)
             for j in range(d)]
        # headroom audit: the NEXT dot product must stay exact int64
        if max(abs(w) for w in W) > (1 << 62) // (max_rows * 64):
            raise OverflowError(
                "train_logreg: weights grew past the int64 dot-product "
                "headroom — lower lr or steps")

    return {"w": W, "x_cols": list(x_cols), "w_scale": w_scale,
            "z_den": z_den, "p_scale": p_scale}


def score_logreg(ds, model: dict, id_cols: list[str],
                 out_prob: str = "p_micro", out_pred: str = "pred"):
    """Stateless scoring pass: broadcast the (tiny) weight vector in
    the task closure, one vectorized sigmoid per batch.
    → (id_cols..., p_micro:int64, pred:int64)."""
    W = np.asarray(model["w"], np.int64)
    x_cols, w_scale = model["x_cols"], model["w_scale"]
    z_den, p_scale = model["z_den"], model["p_scale"]
    half = p_scale // 2

    def score(t: pa.Table) -> pa.Table:
        X = np.stack([t[c].to_numpy(zero_copy_only=False)
                      for c in x_cols], axis=1).astype(np.int64)
        P = _p_micro(X, W, w_scale, z_den, p_scale)
        cols = {c: t[c] for c in id_cols}
        cols[out_prob] = pa.array(P, pa.int64())
        cols[out_pred] = pa.array((P >= half).astype(np.int64), pa.int64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def l1_loss(feats, model: dict, x_cols: list[str], label_col: str) -> int:
    """Exact integer L1 training loss Σ|y·p_scale − p_micro| — the
    tuning objective (order-free int sum, SQL-replayable)."""
    W = np.asarray(model["w"], np.int64)
    p_scale = model["p_scale"]

    def partial(t: pa.Table) -> pa.Table:
        X = np.stack([t[c].to_numpy(zero_copy_only=False)
                      for c in x_cols], axis=1).astype(np.int64)
        y = t[label_col].to_numpy(zero_copy_only=False)
        P = _p_micro(X, W, model["w_scale"], model["z_den"], p_scale)
        return pa.table({"l": pa.array(
            [int(np.abs(y * p_scale - P).sum())], pa.int64())})

    return int(feats.map_batches(partial,
                                 batch_format="pyarrow").sum("l"))


def tune_logreg_halving(feats, x_cols: list[str], label_col: str,
                        lr_grid: "list[int]" = (8, 32, 128, 512),
                        rung_steps: int = 2, **kw) -> dict:
    """Successive halving (Jamieson & Talwalkar 2016, public) over the
    learning rate: train every candidate ``rung_steps`` GD steps,
    keep the best half by exact integer L1 loss (ties → smaller lr),
    continue the survivors another ``rung_steps``, repeat to one
    winner.  Everything — losses, selections, final weights — is a
    pure function of integers, so the whole search replays in SQL.

    Compute shape: Σ over rungs of (candidates·rung_steps) streaming
    passes — the halving schedule does half the full-grid work; each
    pass is the train_logreg partial-Sum pass."""
    cands = sorted(lr_grid)
    models = {lr: {"w": None} for lr in cands}
    state: dict[int, list[int]] = {lr: None for lr in cands}
    while True:
        scored = []
        for lr in cands:
            m = train_logreg(feats, x_cols, label_col,
                             steps=rung_steps, lr=lr,
                             w0=state[lr], **kw)
            state[lr] = m["w"]
            models[lr] = m
            scored.append((l1_loss(feats, m, x_cols, label_col), lr))
        scored.sort()
        keep = scored[:max(1, len(cands) // 2)]
        if len(keep) == 1:
            # the halving decided: the survivor's CURRENT model is the
            # winner (no bonus rung — total steps = rungs·rung_steps)
            loss, lr = keep[0]
            return {"best_lr": lr, "loss": loss, **models[lr]}
        cands = sorted(lr for _, lr in keep)
