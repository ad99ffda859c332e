"""Deterministic Poisson bootstrap: uncertainty for grouped aggregates.

The online/Poisson bootstrap (Oza 2001; Chamandy et al., Google 2012 —
public method) replaces resampling-with-replacement by giving every
row an independent Poisson(1) weight per replica, which needs no
global coordination: each replica's weighted sum is just another
grouped integer aggregate.  The replica weight here is a PURE FUNCTION
of (row id, replica): ``w = InvCDF_Poisson1(splitmix64(id·B + b))``
with the inverse-CDF thresholds precomputed as exact uint64 literals —
so the whole replicate table is bit-identical at any parallelism and
replays in SQL.

Scale shape: one streaming pass; each block emits ≤ keys×B combiner
rows of exact int64 (Σ w·v, Σ w) partials into ONE grouped Sum over
the (key, replica) space — B× a plain grouped sum, nothing
corpus-proportional anywhere.  Downstream, the standard error of any
replica statistic is the spread over the B columns (see tests).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _mix64

#: Poisson(1) inverse-CDF thresholds: T[k] = floor(P(X ≤ k) · 2^64),
#: k = 0..8 (weights cap at 9; P(X > 8) ≈ 1.1e-7).  Shared verbatim by
#: the SQL oracle — both sides compare the SAME integer literals.
POISSON1_THRESHOLDS: tuple[int, ...] = tuple(
    math.floor(sum(math.exp(-1.0) / math.factorial(i)
                   for i in range(k + 1)) * (1 << 64))
    for k in range(9))


def _weights(ids: np.ndarray, b: int, n_replicas: int) -> np.ndarray:
    u = _mix64((ids.astype(np.uint64) * np.uint64(n_replicas))
               + np.uint64(b))
    thr = np.asarray(POISSON1_THRESHOLDS, np.uint64)
    return np.searchsorted(thr, u, side="right").astype(np.int64)


def bootstrap_group_sums(ds, key_col: str, value_col: str, id_col: str,
                         n_replicas: int = 16, unit: int = 100):
    """→ Dataset (key_col, replica:int64, sw:int64, n_eff:int64):
    per (group, replica) the Poisson-weighted integer-unit value sum
    and effective count.  Exact ints end-to-end."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.floor(t[value_col].to_numpy(zero_copy_only=False)
                        * unit + 0.5).astype(np.int64)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        frames = []
        for b in range(n_replicas):
            w = _weights(ids, b, n_replicas)
            frames.append(pd.DataFrame({
                "k": keys, "replica": b, "sw": w * vals, "n_eff": w}))
        g = (pd.concat(frames)
             .groupby(["k", "replica"], sort=False)[["sw", "n_eff"]]
             .sum().reset_index())
        return pa.table({
            key_col: pa.array(g["k"]),
            "replica": pa.array(g["replica"].to_numpy(np.int64),
                                pa.int64()),
            "sw": pa.array(g["sw"].to_numpy(np.int64), pa.int64()),
            "n_eff": pa.array(g["n_eff"].to_numpy(np.int64),
                              pa.int64())})

    return (ds.select_columns([key_col, value_col, id_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, "replica"])
            .aggregate(Sum("sw", alias_name="sw"),
                       Sum("n_eff", alias_name="n_eff")))


def bootstrap_se_of_mean(replicates: pd.DataFrame, key_col: str
                         ) -> pd.DataFrame:
    """Driver-side fold (keys×B rows): bootstrap standard error of the
    per-group mean from the replicate table.  Float on purpose — this
    is the human-facing summary; the exact artifact is the table."""
    out = []
    for k, g in replicates.groupby(key_col, sort=True):
        means = g["sw"].to_numpy(np.float64) / np.maximum(
            g["n_eff"].to_numpy(np.float64), 1.0)
        out.append((k, float(means.mean()), float(means.std(ddof=1))))
    return pd.DataFrame(out, columns=[key_col, "boot_mean", "boot_se"])
