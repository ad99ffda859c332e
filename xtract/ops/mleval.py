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
