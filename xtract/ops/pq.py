"""Product quantization (Jégou, Douze & Schmid 2011, public method)
for the similarity tier: compress each embedding to ``m`` small codes
(one per dimension subspace) and answer top-k queries from the codes
alone via asymmetric distance computation (ADC) — the memory-bound
regime where raw vectors no longer fit the cluster.

Exactness contract: everything rides the ``distributed_kmeans``
integer micro-unit quantization — codebooks are int64, code
assignment is an exact integer argmin (ties → lowest code id), and
ADC distances are exact int64 sums of per-subspace lookup tables, so
search results are bit-identical at any parallelism and the whole
train→encode→search chain replays in SQL.

Scale shape: training = m independent ``distributed_kmeans`` runs
over sliced sub-vectors (each corpus pass streams; nothing
corpus-proportional on the driver).  Encoding = one stateless pass
with the [m, k, subdim] codebook broadcast via ``ray.put``.  Search =
the k×m distance table (tiny) broadcast, per-block partial top-k,
one final sort+limit over ≤ blocks×topk rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _slice_batch(b: pa.Table, col: str, id_col: str, lo: int,
                 hi: int) -> pa.Table:
    m = np.asarray(b[col].to_pylist(), np.float64)[:, lo:hi]
    return pa.table({id_col: b[id_col],
                     col: pa.array(list(m), pa.list_(pa.float64()))})


def train_pq(ds, dim: int, m: int = 2, k: int = 8, iters: int = 2,
             col: str = "embedding", id_col: str = "vec_id",
             unit: int = 1 << 20) -> np.ndarray:
    """→ int64 codebooks [m, k, dim//m] in micro-units.  ``dim`` is
    passed explicitly (no schema-probe driver pull)."""
    from .similarity import distributed_kmeans

    if dim % m:
        raise ValueError("train_pq: dim must divide into m subspaces")
    sub = dim // m
    books = []
    for s in range(m):
        lo, hi = s * sub, (s + 1) * sub
        sub_ds = ds.map_batches(
            lambda b, lo=lo, hi=hi: _slice_batch(b, col, id_col, lo, hi),
            batch_format="pyarrow")
        cen, _ = distributed_kmeans(sub_ds, k=k, iters=iters, col=col,
                                    id_col=id_col, unit=unit)
        books.append(cen)
    return np.stack(books)


def pq_encode(ds, codebooks: np.ndarray, col: str = "embedding",
              id_col: str = "vec_id", unit: int = 1 << 20):
    """→ Dataset (id_col, code_0..code_{m-1}:int64) — one streaming
    pass, codebooks broadcast."""
    import ray

    m, k, sub = codebooks.shape
    ref = ray.put(codebooks)

    def encode(b: pa.Table) -> pa.Table:
        books = ray.get(ref)
        mat = np.floor(np.asarray(b[col].to_pylist(), np.float64)
                       * unit).astype(np.int64)
        cols = {id_col: b[id_col]}
        for s in range(m):
            x = mat[:, s * sub:(s + 1) * sub]
            cen = books[s]
            score = (np.einsum("ij,ij->i", cen, cen)[None, :]
                     - 2 * (x @ cen.T))
            cols[f"code_{s}"] = pa.array(
                np.argmin(score, axis=1).astype(np.int64), pa.int64())
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_search(codes_ds, codebooks: np.ndarray, q_vec: np.ndarray,
              topk: int = 10, id_col: str = "vec_id",
              unit: int = 1 << 20):
    """ADC top-k: exact int64 ``Σ_s ||q_s − c_s,code_s||²`` from the
    broadcast k×m distance table; per-block partial top-k then one
    sort+limit.  → Dataset (id_col, pq_dist:int64), (dist, id) asc."""
    import pyarrow.compute as pc
    import ray

    m, k, sub = codebooks.shape
    q = np.floor(np.asarray(q_vec, np.float64) * unit).astype(np.int64)
    table = np.empty((m, k), np.int64)
    for s in range(m):
        diff = q[s * sub:(s + 1) * sub][None, :] - codebooks[s]
        table[s] = np.einsum("ij,ij->i", diff, diff)
    ref = ray.put(table)

    def score(b: pa.Table) -> pa.Table:
        dt = ray.get(ref)
        n = len(b)
        dist = np.zeros(n, np.int64)
        for s in range(m):
            dist += dt[s][b[f"code_{s}"].to_numpy(zero_copy_only=False)]
        t = pa.table({id_col: b[id_col],
                      "pq_dist": pa.array(dist, pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("pq_dist", "ascending"),
                                            (id_col, "ascending")])
        return t.take(idx[:topk])

    return (codes_ds.map_batches(score, batch_format="pyarrow")
            .sort(["pq_dist", id_col])
            .limit(topk))
