"""Model-evaluation aggregates for the trained-classifier tier: exact
integer confusion/precision/recall and calibration (reliability) bins.

Both are single grouped aggregates over the scored table — the
evaluation passes that close the train→score→EVALUATE loop around
``ops/logreg`` (and any other scorer emitting integer
micro-probabilities).  Precision/recall are exact integer ppm
(truncating division, DuckDB ``//`` semantics); calibration bins carry
(n, n_pos, Σp_micro) so the reliability curve is a driver-side
division of exact sums.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def confusion_stats(ds, label_col: str, pred_col: str):
    """→ single-row Dataset-backed dict {tp, fp, fn, tn,
    precision_ppm, recall_ppm, accuracy_ppm} — one streaming pass of
    4-value partials into a native Sum."""
    def partial(t: pa.Table) -> pa.Table:
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t[pred_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "tp": pa.array([int(((y == 1) & (p == 1)).sum())], pa.int64()),
            "fp": pa.array([int(((y == 0) & (p == 1)).sum())], pa.int64()),
            "fn": pa.array([int(((y == 1) & (p == 0)).sum())], pa.int64()),
            "tn": pa.array([int(((y == 0) & (p == 0)).sum())], pa.int64()),
        })

    s = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["tp", "fp", "fn", "tn"])
    tp, fp = int(s["sum(tp)"]), int(s["sum(fp)"])
    fn, tn = int(s["sum(fn)"]), int(s["sum(tn)"])
    M = 1_000_000
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision_ppm": (M * tp) // (tp + fp) if tp + fp else 0,
        "recall_ppm": (M * tp) // (tp + fn) if tp + fn else 0,
        "accuracy_ppm": (M * (tp + tn)) // (tp + fp + fn + tn),
    }


def calibration_bins(ds, p_col: str, label_col: str,
                     n_bins: int = 10, p_scale: int = 1_000_000):
    """Reliability-diagram bins: bucket the integer micro-probability
    into ``n_bins`` equal-width bins (p == p_scale lands in the top
    bin) → per bin (n, n_pos, sum_p:int64).  ONE grouped Sum over an
    n_bins-bounded key space."""
    from ray.data.aggregate import Sum

    width = p_scale // n_bins

    def partial(t: pa.Table) -> pa.Table:
        p = t[p_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(p // width, n_bins - 1)
        import pandas as pd

        g = (pd.DataFrame({"bin": b, "n": 1, "n_pos": y, "sum_p": p})
             .groupby("bin", sort=False).sum().reset_index())
        return pa.table({
            "bin": pa.array(g["bin"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "n_pos": pa.array(g["n_pos"].to_numpy(np.int64), pa.int64()),
            "sum_p": pa.array(g["sum_p"].to_numpy(np.int64), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("n_pos", alias_name="n_pos"),
                       Sum("sum_p", alias_name="sum_p")))


def conformal_binary(scored, label_col: str, p_col: str,
                     split_col: str, alpha_num: int = 1,
                     alpha_den: int = 10, p_scale: int = 1_000_000):
    """Split conformal prediction (Vovk et al.; Angelopoulos & Bates
    2021 tutorial — public method) for a binary scorer emitting
    integer micro-probabilities: calibrate the nonconformity quantile
    ``q̂`` on the 'calib' split, then report coverage and set sizes on
    the 'test' split.  Nonconformity of class c = p_scale − p(c); the
    prediction set is every class with nonconformity ≤ q̂, giving
    ≥ 1−α marginal coverage for exchangeable data.

    Exact integers throughout: ``rank = ⌈(n_cal+1)(1−α)⌉`` by integer
    ceiling, q̂ is an order statistic fetched as the (n_cal−rank+1)-th
    LARGEST — a sort+limit pull of only ~α·n_cal slim rows — and
    coverage/set-size are one partial-sum pass.

    → dict {qhat, n_cal, rank, n_eval, n_covered, sum_set_size}."""
    import pyarrow.compute as pc

    def nc_batch(t: pa.Table) -> pa.Table:
        p = t[p_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = np.where(y == 1, p_scale - p, p)
        return pa.table({"nc": pa.array(nc, pa.int64())})

    def keep(split):
        return lambda t: t.filter(pc.equal(t[split_col], split))

    calib = scored.map_batches(keep("calib"),
                               batch_format="pyarrow").materialize()
    n_cal = calib.count()
    if n_cal == 0:
        raise ValueError("conformal_binary: empty calibration split")
    rank = -((-(n_cal + 1) * (alpha_den - alpha_num)) // alpha_den)
    rank = min(rank, n_cal)
    k2 = n_cal - rank + 1
    pulled = (calib.map_batches(nc_batch, batch_format="pyarrow")
              .sort("nc", descending=True).limit(k2).to_pandas())
    qhat = int(pulled["nc"].min())

    def eval_partial(t: pa.Table) -> pa.Table:
        p = t[p_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        in1 = (p_scale - p) <= qhat          # class 1 in the set
        in0 = p <= qhat                      # class 0 in the set
        covered = np.where(y == 1, in1, in0)
        return pa.table({
            "n": pa.array([len(p)], pa.int64()),
            "cov": pa.array([int(covered.sum())], pa.int64()),
            "sz": pa.array([int(in1.sum() + in0.sum())], pa.int64())})

    test = scored.map_batches(keep("test"), batch_format="pyarrow")
    s = test.map_batches(eval_partial, batch_format="pyarrow").sum(
        ["n", "cov", "sz"])
    return {"qhat": qhat, "n_cal": n_cal, "rank": rank,
            "n_eval": int(s["sum(n)"]), "n_covered": int(s["sum(cov)"]),
            "sum_set_size": int(s["sum(sz)"])}
