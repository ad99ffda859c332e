"""Distributed PCA over an embedding column, split the way 100 TB
demands: the HEAVY part (second-moment accumulation over every vector)
is an exact-integer streaming pass whose sufficient statistics are
order-free int64 sums — bit-identical at any parallelism and fully
SQL-replayable — while the O(d²) eigendecomposition happens once on
the driver (d is small; the corpus is not).

Pipeline: ``scatter_stats`` (one pass → (i, j, v) long-format moment
table) → ``pca_components`` (driver eigh on the d×d covariance,
deterministic sign rule) → ``pca_project`` (one broadcast-matrix
matmul pass).

Quantization contract: q = floor(x·unit) int64 micro-units — the same
rule as ``ops/similarity.random_project`` / ``distributed_kmeans``, so
oracles share one replay expression.  Int64 headroom is fail-loud: a
slim pre-pass measures n and max|q| exactly and raises before any
overflow could wrap (the ``DRIVER_CC_LIMIT`` pattern applied to
arithmetic).

Reference parity anchor: tesseract-rs has no linear-algebra surface
(src/api.rs); this extends the ANN/embedding tier (knn/IVF/PQ/JL) with
the standard public decorrelation step that precedes them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def scatter_stats(ds, col: str = "embedding", unit: int = 1 << 10,
                  headroom_bits: int = 62):
    """→ Dataset of exact int64 moment rows over q = floor(x·unit):

    - ``(i, j, v)`` with ``0 ≤ i ≤ j < d``: v = Σ_rows q_i·q_j
      (upper-triangle Gram / scatter matrix),
    - ``(i, -1, v)``: v = Σ_rows q_i (per-dimension sum),
    - ``(-1, -1, n)``: the row count.

    One streaming pass, one (d²+3d)/2-row block partial per block,
    ONE native grouped Sum.  The slim pre-pass exact-counts n and
    max|q| and raises if n·max|q|² could exceed 2^``headroom_bits``.
    """
    from ray.data.aggregate import Max, Sum

    def bounds_partial(b: pa.Table) -> pa.Table:
        X = np.asarray(b[col].to_pylist(), np.float64)
        q = np.floor(X * unit).astype(np.int64)
        mx = int(np.abs(q).max()) if q.size else 0
        return pa.table({"n": pa.array([len(b)], pa.int64()),
                         "mx": pa.array([mx], pa.int64())})

    rows = (ds.select_columns([col])
            .map_batches(bounds_partial, batch_format="pyarrow")
            .aggregate(Sum("n", alias_name="n"),
                       Max("mx", alias_name="mx")))
    n_total, max_q = int(rows["n"] or 0), int(rows["mx"] or 0)
    if n_total and n_total * max_q * max_q >= (1 << headroom_bits):
        raise RuntimeError(
            f"scatter_stats: n·max|q|² = {n_total}·{max_q}² exceeds "
            f"2^{headroom_bits} int64 headroom; lower unit={unit}")

    def partial(b: pa.Table) -> pa.Table:
        X = np.asarray(b[col].to_pylist(), np.float64)
        q = np.floor(X * unit).astype(np.int64)
        n, d = q.shape
        G = q.T @ q
        iu, ju = np.triu_indices(d)
        i = np.concatenate([iu, np.arange(d), [-1]])
        j = np.concatenate([ju, np.full(d, -1), [-1]])
        v = np.concatenate([G[iu, ju], q.sum(axis=0), [n]])
        return pa.table({"i": pa.array(i, pa.int64()),
                         "j": pa.array(j, pa.int64()),
                         "v": pa.array(v, pa.int64())})

    return (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["i", "j"]).aggregate(Sum("v", alias_name="v")))


def pca_components(stats_df: pd.DataFrame, k: int = 8,
                   unit: int = 1 << 10):
    """Driver-side finish: moment rows → covariance → top-k principal
    axes.  Deterministic sign rule: each eigenvector's
    largest-|entry| coordinate (lowest index on ties) is made
    positive.  → (mean[d] float64, comps[k, d] float64 rows-as-axes,
    eigvals[k] float64), all in ORIGINAL (un-quantized) units."""
    n = int(stats_df.loc[(stats_df.i == -1) & (stats_df.j == -1),
                         "v"].iloc[0])
    s_rows = stats_df[(stats_df.j == -1) & (stats_df.i >= 0)]
    d = int(s_rows.i.max()) + 1
    s = np.zeros(d, np.float64)
    s[s_rows.i.to_numpy(np.int64)] = s_rows.v.to_numpy(np.float64)
    G = np.zeros((d, d), np.float64)
    g_rows = stats_df[stats_df.j >= 0]
    gi = g_rows.i.to_numpy(np.int64)
    gj = g_rows.j.to_numpy(np.int64)
    gv = g_rows.v.to_numpy(np.float64)
    G[gi, gj] = gv
    G[gj, gi] = gv
    mean_q = s / n
    cov = G / n - np.outer(mean_q, mean_q)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    w, V = w[order], V[:, order].T          # rows = axes
    for r in range(len(V)):
        a = int(np.argmax(np.abs(V[r]) - 1e-12 * np.arange(d)))
        if V[r, a] < 0:
            V[r] = -V[r]
    return mean_q / unit, V, w / (unit * unit)


def pca_project(ds, mean: np.ndarray, comps: np.ndarray,
                col: str = "embedding",
                id_cols: "tuple[str, ...]" = ("vec_id",),
                out_col: str = "pc"):
    """One broadcast-matmul pass: y = (x − mean) · comps^T.  comps is
    a few KB, shipped in the task closure.  → Dataset(id_cols...,
    pc: list<double>[k])."""
    mean = np.asarray(mean, np.float64)
    comps = np.asarray(comps, np.float64)

    def project(b: pa.Table) -> pa.Table:
        X = np.asarray(b[col].to_pylist(), np.float64)
        Y = (X - mean) @ comps.T
        cols = {ic: b[ic] for ic in id_cols}
        cols[out_col] = pa.array(list(Y), pa.list_(pa.float64(),
                                                   comps.shape[0]))
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")
