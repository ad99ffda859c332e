"""Distributed decision-tree training over integer features with the
EXACT misclassification-error split criterion — the
histogram-per-level shape every scalable tree learner uses
(XGBoost/LightGBM's binned split finding, public method), kept
integer-exact so the whole train is bit-identical at any parallelism
and replayable in SQL.

Per level ONE streaming pass builds the (node, feature, value) class
histogram: a per-block ``np.unique`` combiner emits ≤1 row per
distinct triple per block, a native grouped Sum merges, and the
driver — behind an exact-count fail-loud gate — picks each node's
split by minimizing ``errL + errR`` with ``err = min(n_pos, n_neg)``
(prefix sums over the value-sorted histogram).  Misclassification
error never increases under a split, so the argmin is always taken;
ties resolve (error, feature index, threshold) ascending.  Leaves
predict the strict majority (1 iff 2·n_pos > n).

Quantization contract: features are caller-provided int64 (the
``ops/logreg`` featurize convention), so histograms are exact and
bounded by the feature cardinality, not the row count.

Reference parity anchor: tesseract-rs has no training surface
(src/api.rs); this extends the trained-classifier tier
(logreg/nbayes) with the tree family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _route(X: np.ndarray, splits: dict) -> np.ndarray:
    """Vectorized root-to-node assignment: node k splits to 2k+1
    (x_f ≤ thr) / 2k+2."""
    node = np.zeros(len(X), np.int64)
    frontier = [0]
    while frontier:
        nxt = []
        for k in frontier:
            if k not in splits:
                continue
            f, thr = splits[k]
            mask = node == k
            node[mask] = np.where(X[mask, f] <= thr, 2 * k + 1, 2 * k + 2)
            nxt.extend((2 * k + 1, 2 * k + 2))
        frontier = nxt
    return node


def train_tree(ds, feature_cols: "list[str]", label_col: str = "y",
               depth: int = 2, max_hist: int = 2_000_000,
               num_partitions: int = 32,
               weight_col: "str | None" = None) -> dict:
    """→ {"splits": {node: (feat_idx, thr)}, "leaves": {node: (n,
    n_pos)}, "nodes": {node: (n, n_pos)}, "feature_cols": [...]} —
    one histogram exchange per level, driver state = one histogram
    per level (gated) + the O(2^depth) tree.  ``weight_col`` (int64
    ≥ 0) turns every count into a weight sum — the bagging hook for
    :func:`train_forest`; zero-weight rows leave the histogram (and
    the threshold candidate set) entirely."""
    import ray
    from ray.data.aggregate import Sum

    F = len(feature_cols)
    splits: dict = {}
    node_stats: dict = {0: None}

    for level in range(depth + 1):
        splits_ref = ray.put(dict(splits))

        def hist_partial(b: pa.Table, _ref=splits_ref) -> pa.Table:
            sp = ray.get(_ref)
            X = np.stack([b[c].to_numpy(zero_copy_only=False)
                          .astype(np.int64) for c in feature_cols],
                         axis=1)
            y = b[label_col].to_numpy(zero_copy_only=False).astype(
                np.int64)
            if weight_col is not None:
                w = (b[weight_col].to_numpy(zero_copy_only=False)
                     .astype(np.int64))
                keep = w > 0
                X, y, w = X[keep], y[keep], w[keep]
            else:
                w = np.ones(len(y), np.int64)
            node = _route(X, sp)
            outs = {"node": [], "feat": [], "val": [], "n": [],
                    "npos": []}
            for f in range(F):
                keys = np.stack([node, X[:, f]], axis=1)
                uniq, inv = np.unique(keys, axis=0, return_inverse=True)
                n = np.bincount(inv, weights=w,
                                minlength=len(uniq)).astype(np.int64)
                npos = np.bincount(inv, weights=w * y,
                                   minlength=len(uniq)).astype(np.int64)
                outs["node"].append(uniq[:, 0])
                outs["feat"].append(np.full(len(uniq), f, np.int64))
                outs["val"].append(uniq[:, 1])
                outs["n"].append(n.astype(np.int64))
                outs["npos"].append(npos)
            return pa.table({k: pa.array(np.concatenate(v), pa.int64())
                             for k, v in outs.items()})

        proj = list(feature_cols) + [label_col] + (
            [weight_col] if weight_col else [])
        hist = (ds.select_columns(proj)
                .map_batches(hist_partial, batch_format="pyarrow")
                .groupby(["node", "feat", "val"])
                .aggregate(Sum("n", alias_name="n"),
                           Sum("npos", alias_name="npos"))
                ).materialize()
        n_rows = hist.count()
        if n_rows > max_hist:
            raise RuntimeError(
                f"train_tree: level-{level} histogram has {n_rows} "
                f"rows > max_hist={max_hist}; coarsen the feature "
                f"quantization")
        h = hist.to_pandas().sort_values(
            ["node", "feat", "val"]).reset_index(drop=True)

        active = sorted(set(h["node"].tolist()) & set(node_stats))
        new_nodes: dict = {}
        for k in active:
            hk = h[h.node == k]
            n_k = int(hk[hk.feat == 0]["n"].sum()) if len(hk) else 0
            pos_k = int(hk[hk.feat == 0]["npos"].sum()) if len(hk) else 0
            node_stats[k] = (n_k, pos_k)
            if level == depth or n_k == 0:
                continue
            best = None  # (err, feat, thr, ...)
            for f in range(F):
                hf = hk[hk.feat == f]
                if len(hf) < 2:
                    continue
                cn = hf["n"].to_numpy(np.int64).cumsum()
                cp = hf["npos"].to_numpy(np.int64).cumsum()
                vals = hf["val"].to_numpy(np.int64)
                nL, pL = cn[:-1], cp[:-1]
                nR, pR = n_k - nL, pos_k - pL
                err = (np.minimum(pL, nL - pL)
                       + np.minimum(pR, nR - pR))
                a = int(np.argmin(err))  # first min → lowest thr
                cand = (int(err[a]), f, int(vals[a]))
                if best is None or cand < best:
                    best = cand
            if best is None:
                continue
            _, f, thr = best
            splits[k] = (f, thr)
            new_nodes[2 * k + 1] = None
            new_nodes[2 * k + 2] = None
        node_stats.update(new_nodes)

    leaves = {k: v for k, v in node_stats.items()
              if k not in splits and v is not None}
    return {"splits": splits, "leaves": leaves,
            "nodes": {k: v for k, v in node_stats.items()
                      if v is not None},
            "feature_cols": list(feature_cols)}


def tree_table(tree: dict) -> pd.DataFrame:
    """Flatten a trained tree to (node, feat, thr, n, n_pos, pred)
    rows — feat/thr are −1/0 on leaves, pred = strict majority."""
    rows = []
    for k in sorted(tree["nodes"]):
        n, pos = tree["nodes"][k]
        f, thr = tree["splits"].get(k, (-1, 0))
        rows.append((k, f, thr, n, pos, int(2 * pos > n)))
    return pd.DataFrame(rows, columns=[
        "node", "feat", "thr", "n", "n_pos", "pred"]).astype("int64")


def score_tree(ds, tree: dict, id_cols: "tuple[str, ...]" = ("doc_id",)):
    """Broadcast the O(2^depth) tree in the task closure; one
    vectorized routing pass → Dataset(id_cols..., node, pred)."""
    splits = tree["splits"]
    feature_cols = tree["feature_cols"]
    pred_of = {k: int(2 * p > n) for k, (n, p) in tree["leaves"].items()}

    def score(b: pa.Table) -> pa.Table:
        X = np.stack([b[c].to_numpy(zero_copy_only=False)
                      .astype(np.int64) for c in feature_cols], axis=1)
        node = _route(X, splits)
        lut = np.zeros(max(pred_of, default=0) + 1, np.int64)
        for k, p in pred_of.items():
            lut[k] = p
        pred = lut[node]
        cols = {ic: b[ic] for ic in id_cols}
        cols["node"] = pa.array(node, pa.int64())
        cols["pred"] = pa.array(pred, pa.int64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def add_bootstrap_weight(ds, id_col: str, t: int, n_trees: int,
                         out_col: str = "_w"):
    """Deterministic Poisson(1) bagging weight per (row, tree):
    w = InvCDF(splitmix64(id·n_trees + t)) — the
    ``ops/bootstrap`` replica rule, so forests are bit-identical at
    any parallelism and the SQL oracle shares the threshold
    literals."""
    from .bootstrap import _weights

    def attach(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            out_col, pa.array(_weights(ids, t, n_trees), pa.int64()))

    return ds.map_batches(attach, batch_format="pyarrow")


def train_forest(ds, feature_cols: "list[str]", label_col: str = "y",
                 id_col: str = "doc_id", n_trees: int = 5,
                 depth: int = 2, **tree_kw) -> "list[dict]":
    """Bagged random forest: ``n_trees`` misclassification-error
    trees, each trained on a deterministic Poisson(1) bootstrap
    (weighted histograms — no data is copied, resampling is a weight
    column).  Sequential over trees, one histogram exchange per
    (tree, level); everything stays exact-integer → the whole forest
    is bit-identical at any parallelism."""
    forest = []
    for t in range(n_trees):
        wds = add_bootstrap_weight(ds, id_col, t, n_trees)
        forest.append(train_tree(wds, feature_cols, label_col,
                                 depth=depth, weight_col="_w",
                                 **tree_kw))
    return forest


def score_forest(ds, forest: "list[dict]",
                 id_cols: "tuple[str, ...]" = ("doc_id",)):
    """Majority vote over the forest (pred = 1 iff 2·votes >
    n_trees); one broadcast routing pass per batch → Dataset
    (id_cols..., votes, pred)."""
    T = len(forest)
    luts = []
    for tree in forest:
        pred_of = {k: int(2 * p > n)
                   for k, (n, p) in tree["leaves"].items()}
        lut = np.zeros(max(pred_of, default=0) + 1, np.int64)
        for k, p in pred_of.items():
            lut[k] = p
        luts.append((tree["splits"], tree["feature_cols"], lut))

    def score(b: pa.Table) -> pa.Table:
        votes = np.zeros(len(b), np.int64)
        for splits, fcols, lut in luts:
            X = np.stack([b[c].to_numpy(zero_copy_only=False)
                          .astype(np.int64) for c in fcols], axis=1)
            votes += lut[_route(X, splits)]
        cols = {ic: b[ic] for ic in id_cols}
        cols["votes"] = pa.array(votes, pa.int64())
        cols["pred"] = pa.array((2 * votes > T).astype(np.int64),
                                pa.int64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")
