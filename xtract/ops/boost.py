"""Gradient-boosted regression stumps with squared loss in EXACT
integer micro-units — the boosting member of the trained-classifier
tier (``ops/logreg`` GD, ``ops/nbayes``, ``ops/dtree`` trees/forest).

Public method: Friedman's gradient boosting specialised to squared
loss, where each round fits a depth-1 stump to the current residuals
and the split criterion is the exact variance-reduction surrogate
``gain = S_L²//n_L + S_R²//n_R`` (maximising it minimises SSE for
fixed leaf means; the floor of each non-negative square keeps the
score an integer so the argmax is replayable with DuckDB HUGEINT
``//``).  Everything stays int64/driver-Python-int exact:

- targets are ``y·unit`` micro-units; the base score is
  ``trunc(Σtarget / n)``;
- round t's residuals ``r = target − F_{t−1}(x)`` are exact int64
  (scores are always integers);
- per round ONE streaming histogram exchange: a per-block
  ``np.unique`` combiner emits ≤1 ``(feat, val, n, Σr)`` row per
  distinct pair per block, a native grouped Sum merges, and the
  driver — behind the same exact-count ``max_hist`` gate as
  ``ops/dtree`` — picks the argmax split with arbitrary-precision
  Python ints (ties: gain desc, then feat, thr ascending);
- leaf values are truncating divisions ``tdiv(S, n)`` (toward zero,
  the DuckDB ``//`` convention shared with ``ops/logreg``), and the
  learning rate applies as ``tdiv(lr_num·v, lr_den)``.

The whole train is therefore bit-identical at any parallelism and a
SQL oracle can replay every round (histogram → window prefix sums →
HUGEINT gain argmax → score update) — see ``doc_quality_boost`` in
``__ray_entry__``.

Scale shape: driver state per round is one gated histogram (bounded
by feature CARDINALITY, not rows) + the O(rounds) stump list; the
residual/score evaluation is a broadcast vectorized routing pass.

Reference parity anchor: tesseract-rs has no training surface
(src/api.rs); this extends the trained-classifier tier the same way
``ops/dtree`` does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — DuckDB ``//``."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _tdiv_vec(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized :func:`_tdiv` for int64 arrays, positive ``b``."""
    q = np.abs(a) // b
    return np.where(a < 0, -q, q)


def _stump_scores(X: np.ndarray, model: dict) -> np.ndarray:
    """Exact int64 model scores for a feature matrix: base score +
    Σ tdiv(lr_num·leaf, lr_den) over the stump list."""
    s = np.full(len(X), model["f0"], np.int64)
    lr_num, lr_den = model["lr_num"], model["lr_den"]
    for feat, thr, vl, vr in model["stumps"]:
        v = (np.full(len(X), vl, np.int64) if feat < 0
             else np.where(X[:, feat] <= thr, vl, vr))
        s += _tdiv_vec(lr_num * v, lr_den)
    return s


def train_boost(ds, feature_cols: "list[str]", label_col: str = "y",
                rounds: int = 3, lr_num: int = 1, lr_den: int = 2,
                unit: int = 1_000_000,
                max_hist: int = 2_000_000) -> dict:
    """→ {"f0": int, "stumps": [(feat, thr, v_left, v_right)],
    "lr_num", "lr_den", "unit", "feature_cols"} — one histogram
    exchange per round.  A round with no valid split (every feature
    single-valued) contributes the flat residual mean as a
    ``feat = −1`` stump."""
    import ray
    from ray.data.aggregate import Count, Sum

    F = len(feature_cols)
    if F == 0:
        raise ValueError("train_boost: feature_cols must be non-empty")
    slim = ds.select_columns(list(feature_cols) + [label_col])

    def base_partial(t: pa.Table) -> pa.Table:
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array([len(y)], pa.int64()),
                         "sy": pa.array([int(y.sum())], pa.int64())})

    base = (slim.map_batches(base_partial, batch_format="pyarrow")
            .aggregate(Sum("n"), Sum("sy")))
    n_total = int(base["sum(n)"] or 0)
    if n_total == 0:
        raise ValueError("train_boost: empty dataset")
    # int64 headroom for per-block Σr partials: residuals can grow by
    # a factor ≤ (1 + lr_num/lr_den) per round (each stump's scaled
    # leaf value is at most the residual magnitude it fits), so the
    # exact worst case after `rounds` rounds is
    # unit·(1 + lr_num/lr_den)^rounds, plus 2·unit truncation slack —
    # NOT unit·(rounds+2), which the old gate assumed and which is
    # exceeded for rounds ≥ 5 at the default lr = 1/2.
    r_bound = (-(-(unit * (lr_den + lr_num) ** rounds)
                 // lr_den ** rounds) + 2 * unit)
    if n_total * r_bound >= (1 << 62):
        raise RuntimeError(
            f"train_boost: n·unit·(1+lr)^rounds = "
            f"{n_total * r_bound} ≥ 2^62; lower unit or rounds")
    f0 = _tdiv(int(base["sum(sy)"]) * unit, n_total)

    model = {"f0": f0, "stumps": [], "lr_num": lr_num,
             "lr_den": lr_den, "unit": unit,
             "feature_cols": list(feature_cols)}

    for _ in range(rounds):
        model_ref = ray.put(dict(model, stumps=list(model["stumps"])))

        def hist_partial(b: pa.Table, _ref=model_ref) -> pa.Table:
            m = ray.get(_ref)
            X = np.stack([b[c].to_numpy(zero_copy_only=False)
                          .astype(np.int64) for c in feature_cols],
                         axis=1)
            y = b[label_col].to_numpy(zero_copy_only=False).astype(
                np.int64)
            r = y * m["unit"] - _stump_scores(X, m)
            outs = {"feat": [], "val": [], "n": [], "sr": []}
            for f in range(F):
                vals, inv = np.unique(X[:, f], return_inverse=True)
                outs["feat"].append(np.full(len(vals), f, np.int64))
                outs["val"].append(vals)
                outs["n"].append(np.bincount(
                    inv, minlength=len(vals)).astype(np.int64))
                sr = np.zeros(len(vals), np.int64)
                np.add.at(sr, inv, r)  # exact int64 (no float pass)
                outs["sr"].append(sr)
            return pa.table({k: pa.array(np.concatenate(v), pa.int64())
                             for k, v in outs.items()})

        hist = (slim.map_batches(hist_partial, batch_format="pyarrow")
                .groupby(["feat", "val"])
                .aggregate(Sum("n", alias_name="n"),
                           Sum("sr", alias_name="sr"))).materialize()
        n_rows = hist.count()
        if n_rows > max_hist:
            raise RuntimeError(
                f"train_boost: histogram has {n_rows} rows > "
                f"max_hist={max_hist}; coarsen the feature "
                f"quantization")
        h = hist.to_pandas().sort_values(
            ["feat", "val"]).reset_index(drop=True)

        # every feature's histogram slice partitions the same rows, so
        # any single slice sums to the global Σr; feature 0 always
        # exists (F ≥ 1 enforced above) and one slice stays inside
        # int64 where the F-slice total F·Σr might not
        s_total = int(h[h.feat == 0]["sr"].sum())
        best = None  # (-gain, feat, thr, vl, vr) — Python ints, exact
        for f in range(F):
            hf = h[h.feat == f]
            if len(hf) < 2:
                continue
            cn = hf["n"].to_numpy(np.int64).cumsum()
            cs = hf["sr"].to_numpy(np.int64).cumsum()
            vals = hf["val"].to_numpy(np.int64)
            for i in range(len(hf) - 1):
                nl, sl = int(cn[i]), int(cs[i])
                nr, sr2 = n_total - nl, s_total - sl
                gain = (sl * sl) // nl + (sr2 * sr2) // nr
                cand = (-gain, f, int(vals[i]),
                        _tdiv(sl, nl), _tdiv(sr2, nr))
                if best is None or cand < best:
                    best = cand
        if best is None:
            v = _tdiv(s_total, n_total)
            model["stumps"].append((-1, 0, v, v))
        else:
            _, f, thr, vl, vr = best
            model["stumps"].append((f, thr, vl, vr))

    return model


def boost_table(model: dict) -> pd.DataFrame:
    """Flatten to (round, feat, thr, v_left, v_right) rows; round 0
    is the base score as (−1, 0, f0, f0)."""
    rows = [(0, -1, 0, model["f0"], model["f0"])]
    rows += [(t + 1, f, thr, vl, vr)
             for t, (f, thr, vl, vr) in enumerate(model["stumps"])]
    return pd.DataFrame(rows, columns=[
        "round", "feat", "thr", "v_left", "v_right"]).astype("int64")


def score_boost(ds, model: dict,
                id_cols: "tuple[str, ...]" = ("doc_id",)):
    """Broadcast the O(rounds) stump list in the task closure; one
    vectorized pass → Dataset(id_cols..., score, pred) with
    pred = [2·score > unit]."""
    feature_cols = model["feature_cols"]
    unit = model["unit"]

    def score(b: pa.Table) -> pa.Table:
        X = np.stack([b[c].to_numpy(zero_copy_only=False)
                      .astype(np.int64) for c in feature_cols], axis=1)
        s = _stump_scores(X, model)
        cols = {ic: b[ic] for ic in id_cols}
        cols["score"] = pa.array(s, pa.int64())
        cols["pred"] = pa.array((2 * s > unit).astype(np.int64),
                                pa.int64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")
