"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact cosine top-k — the query matrix is broadcast
  ONCE via ``ray.put`` and read inside each task; each batch does one
  numpy matmul; per-batch partial top-k rows are merged in a tiny final
  reduction (k × num_queries rows per batch, never the full corpus).
- ``knn_ivf``: the scale path — deterministic k-means coarse quantizer
  (fixed seed, fixed iteration count) partitions vectors into cells;
  queries probe the ``nprobe`` nearest cells only.

Deterministic tie-break everywhere: (-score, vec_id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_bruteforce(ds, queries: np.ndarray, k: int = 10,
                   key: str = "vec_id", col: str = "embedding") -> pa.Table:
    """→ pa.Table(query_id, rank, vec_id, score): exact cosine top-k of
    every query against the dataset."""
    import ray

    q = _unit(np.asarray(queries, np.float64))
    q_ref = ray.put(q)
    nq = q.shape[0]

    def partial_topk(b: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = np.asarray(b[key].to_pylist(), np.int64)
        vecs = _unit(np.asarray(b[col].to_pylist(), np.float64))
        sims = qm @ vecs.T  # (nq, nb)
        kk = min(k, sims.shape[1])
        out = {"query_id": [], key: [], "score": []}
        for qi in range(qm.shape[0]):
            # deterministic top-k: sort by (-score, vec_id)
            idx = np.lexsort((ids, -sims[qi]))[:kk]
            out["query_id"].extend([qi] * len(idx))
            out[key].extend(ids[idx].tolist())
            out["score"].extend(sims[qi][idx].tolist())
        return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                         key: pa.array(out[key], pa.int64()),
                         "score": pa.array(out["score"], pa.float64())})

    parts = ds.select_columns([key, col]).map_batches(
        partial_topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    rows = {"query_id": [], "rank": [], key: [], "score": []}
    for qi in range(nq):
        sub = parts[parts.query_id == qi]
        sub = sub.sort_values(["score", key], ascending=[False, True],
                              kind="mergesort").head(k)
        for r, (_, row) in enumerate(sub.iterrows()):
            rows["query_id"].append(qi)
            rows["rank"].append(r + 1)
            rows[key].append(int(row[key]))
            rows["score"].append(float(row["score"]))
    return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                     "rank": pa.array(rows["rank"], pa.int64()),
                     key: pa.array(rows[key], pa.int64()),
                     "score": pa.array(rows["score"], pa.float64())})


def deterministic_kmeans(vectors: np.ndarray, n_cells: int,
                         iters: int = 8) -> np.ndarray:
    """Fixed-seed, fixed-iteration k-means (no RNG in the loop): init from
    evenly spaced rows of the lexicographically sorted sample."""
    v = _unit(vectors)
    order = np.lexsort(v.T[::-1])
    step = max(1, len(v) // n_cells)
    centers = v[order[::step][:n_cells]].copy()
    for _ in range(iters):
        assign = np.argmax(v @ centers.T, axis=1)
        for c in range(len(centers)):
            members = v[assign == c]
            if len(members):
                centers[c] = members.mean(axis=0)
        centers = _unit(centers)
    return centers


class IVFIndex:
    """IVF state held per actor: centroids broadcast via constructor."""

    def __init__(self, centers: np.ndarray) -> None:
        self.centers = centers

    def assign_batch(self, b: pa.Table, col: str = "embedding") -> pa.Table:
        vecs = _unit(np.asarray(b[col].to_pylist(), np.float64))
        cells = np.argmax(vecs @ self.centers.T, axis=1).astype(np.int64)
        return b.append_column("cell", pa.array(cells, pa.int64()))


def knn_ivf(ds, queries: np.ndarray, k: int = 10, n_cells: int = 16,
            nprobe: int = 4, key: str = "vec_id", col: str = "embedding",
            train_sample: int = 2048) -> pa.Table:
    """IVF-style ANN: train coarse centroids on a deterministic sample
    (ds.limit — first blocks, stable), assign each vector to a cell,
    search only the ``nprobe`` best cells per query."""
    sample = np.asarray(
        [r[col] for r in ds.select_columns([col]).limit(train_sample).take_all()],
        np.float64)
    centers = deterministic_kmeans(sample, n_cells)

    idx = IVFIndex(centers)
    assigned = ds.select_columns([key, col]).map_batches(
        lambda b: idx.assign_batch(b, col), batch_format="pyarrow")

    q = _unit(np.asarray(queries, np.float64))
    probe_cells = np.argsort(-(q @ centers.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = sorted({int(c) for row in probe_cells for c in row})
    import pyarrow.compute as pc

    cand = assigned.map_batches(
        lambda b: b.filter(pc.is_in(b["cell"], value_set=pa.array(wanted, pa.int64()))),
        batch_format="pyarrow")
    # restrict each query to its own probed cells during the merge
    parts = cand.to_pandas()
    rows = {"query_id": [], "rank": [], key: [], "score": []}
    vecs = _unit(np.asarray(parts[col].tolist(), np.float64)) if len(parts) else None
    ids = parts[key].to_numpy(np.int64) if len(parts) else np.empty(0, np.int64)
    cells = parts["cell"].to_numpy(np.int64) if len(parts) else np.empty(0, np.int64)
    for qi in range(q.shape[0]):
        mask = np.isin(cells, probe_cells[qi])
        if vecs is None or not mask.any():
            continue
        sims = vecs[mask] @ q[qi]
        sub_ids = ids[mask]
        order = np.lexsort((sub_ids, -sims))[:k]
        for r, oi in enumerate(order):
            rows["query_id"].append(qi)
            rows["rank"].append(r + 1)
            rows[key].append(int(sub_ids[oi]))
            rows["score"].append(float(sims[oi]))
    return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                     "rank": pa.array(rows["rank"], pa.int64()),
                     key: pa.array(rows[key], pa.int64()),
                     "score": pa.array(rows["score"], pa.float64())})
