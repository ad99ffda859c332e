"""Neyman-allocation stratified sampling (Neyman 1934, public):
allocate a fixed sample budget across strata ∝ N_h·σ_h — more rows
where the stratum is big AND internally variable — then select
deterministically within each stratum.  The eval-set construction
that beats proportional allocation whenever strata differ in spread.

Exactness: per-stratum sufficient statistics (N, Σx, Σx²) are exact
int64 sums; the floor population variance ``(N·Σx² − (Σx)²) // N²``
is exact integer; σ̂ = floor(IEEE sqrt) of that small integer
(correctly-rounded double sqrt — identical in numpy and DuckDB);
allocation ``n_h = (n_total·N_h·σ̂_h) // Σ(N_j·σ̂_j)`` is truncating
integer division (budget undershoot ≤ #strata by construction),
capped at N_h.  Selection = the n_h smallest (lcg(id), id) per
stratum — the established deterministic-sampling rule.

Scale shape: ONE grouped Sum for the statistics (strata-bounded
driver table), allocation broadcast as a dict, selection via a
per-block top-k combiner → one co-group boundary cut per stratum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _lcg(ids: np.ndarray) -> np.ndarray:
    return ((ids.astype(np.uint64) * np.uint64(2654435761)
             + np.uint64(12345)) % np.uint64(4294967296)).astype(np.int64)


def neyman_allocation(ds, stratum_col: str, value_col: str,
                      n_total: int) -> pd.DataFrame:
    """→ driver DataFrame (stratum, n_rows, sigma_int, n_alloc)."""
    from ray.data.aggregate import Count, Sum

    def partial(b: pa.Table) -> pa.Table:
        x = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({stratum_col: b[stratum_col],
                         "sx": pa.array(x, pa.int64()),
                         "sxx": pa.array(x * x, pa.int64())})

    stats = (ds.select_columns([stratum_col, value_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby(stratum_col)
             .aggregate(Count(alias_name="n_rows"),
                        Sum("sx", alias_name="sx"),
                        Sum("sxx", alias_name="sxx"))
             .to_pandas())
    n = stats["n_rows"].to_numpy(np.int64)
    sx = stats["sx"].to_numpy(np.int64)
    sxx = stats["sxx"].to_numpy(np.int64)
    var_int = (n * sxx - sx * sx) // (n * n)
    sigma = np.floor(np.sqrt(var_int.astype(np.float64))).astype(np.int64)
    a = n * sigma
    total_a = int(a.sum())
    if total_a == 0:
        raise ValueError("neyman_allocation: zero variance everywhere "
                         "— use proportional allocation")
    alloc = np.minimum((n_total * a) // total_a, n)
    return pd.DataFrame({stratum_col: stats[stratum_col],
                         "n_rows": n, "sigma_int": sigma,
                         "n_alloc": alloc.astype(np.int64)})


def neyman_stratified_sample(ds, stratum_col: str, value_col: str,
                             id_col: str, n_total: int,
                             num_partitions: int = 32):
    """→ (allocation DataFrame, Dataset of selected (stratum, id)
    rows — the n_alloc smallest (lcg(id), id) per stratum)."""
    import pyarrow.compute as pc

    from .agg import _hash_part

    alloc = neyman_allocation(ds, stratum_col, value_col, n_total)
    amap = dict(zip(alloc[stratum_col], alloc["n_alloc"].astype(int)))

    def rank_partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({stratum_col: b[stratum_col],
                      id_col: pa.array(ids, pa.int64()),
                      "r": pa.array(_lcg(ids), pa.int64())})
        # block combiner: keep ≤ max-alloc rows per stratum per block
        df = (pd.DataFrame({stratum_col: t[stratum_col].to_pandas(),
                            id_col: ids, "r": _lcg(ids)})
              .sort_values(["r", id_col], kind="mergesort")
              .groupby(stratum_col, sort=False)
              .head(max(amap.values()) if amap else 0))
        out = pa.table({stratum_col: pa.array(df[stratum_col]),
                        id_col: pa.array(df[id_col].to_numpy(np.int64),
                                         pa.int64()),
                        "r": pa.array(df["r"].to_numpy(np.int64),
                                      pa.int64())})
        return out.append_column("_part", pa.array(
            _hash_part(out[stratum_col], num_partitions), pa.int64()))

    def cut(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({stratum_col: t[stratum_col].to_pandas(),
                            id_col: t[id_col].to_pandas(),
                            "r": t["r"].to_pandas()})
              .sort_values(["r", id_col], kind="mergesort"))
        kept = []
        for key, g in df.groupby(stratum_col, sort=False):
            kept.append(g.head(int(amap.get(key, 0))))
        out = (pd.concat(kept) if kept else df.head(0))
        return pa.table({
            stratum_col: pa.array(out[stratum_col]),
            id_col: pa.array(out[id_col].to_numpy(np.int64),
                             pa.int64())})

    sel = (ds.select_columns([stratum_col, id_col])
           .map_batches(rank_partial, batch_format="pyarrow")
           .groupby("_part")
           .map_groups(cut, batch_format="pyarrow"))
    return alloc, sel
