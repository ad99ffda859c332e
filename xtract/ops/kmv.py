"""KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
2002; Beyer et al. 2007 — public method): keep the k smallest values
of a uniform 64-bit hash; the k-th smallest θ estimates the distinct
count as (k−1)·2^64/θ.  Mergeable by union+re-truncate, so per-block
partials compose exactly — and because the hash is the deterministic
``splitmix64``, the SKETCH ITSELF (not just the estimate) is
bit-identical at any parallelism and SQL-replayable.

Below the k threshold the sketch holds every distinct hash and the
estimate is exact (``kth_min = 0`` sentinel marks that path).

Scale shape: per block, per key: unique hashes → partial k smallest
(tiny rows) → ONE co-group by key merges partials with a vectorized
sort — keys×k slim int64 rows total; the estimate is an exact
integer division on the driver-bounded result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _mix64


def grouped_kmv_distinct(ds, key_col: str, val_col: str, k: int = 64,
                         num_partitions: int = 32):
    """→ Dataset (key, n_hashes:int64, kth_min:int64, est:int64):
    ``n_hashes`` = sketch occupancy (= exact distinct count while
    < k), ``kth_min`` = the k-th smallest hash shifted into int64
    range (0 sentinel on the exact path), ``est`` = distinct-count
    estimate (exact below k, (k−1)·2^64/θ above)."""
    from .agg import _hash_part

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        vals = b[val_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _mix64(vals)
        df = (pd.DataFrame({"k": keys, "h": h})
              .drop_duplicates()
              .sort_values(["k", "h"], kind="mergesort")
              .groupby("k", sort=False).head(k))
        t = pa.table({"k": pa.array(df["k"]),
                      "h": pa.array(df["h"].to_numpy(np.uint64),
                                    pa.uint64())})
        return t.append_column("_part", pa.array(
            _hash_part(t["k"], num_partitions), pa.int64()))

    def merge(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"k": t["k"].to_pandas(),
                            "h": t["h"].to_pandas()})
              .drop_duplicates()
              .sort_values(["k", "h"], kind="mergesort")
              .groupby("k", sort=False).head(k))
        out_k, out_n, out_kth, out_est = [], [], [], []
        for key, g in df.groupby("k", sort=True):
            hs = g["h"].to_numpy(np.uint64)
            n = len(hs)
            out_k.append(key)
            out_n.append(n)
            if n < k:
                out_kth.append(0)
                out_est.append(n)
            else:
                kth = int(hs[-1])
                out_kth.append(kth - (1 << 63))  # shift into int64
                out_est.append(((k - 1) << 64) // kth if kth else 0)
        return pa.table({
            key_col: pa.array(out_k),
            "n_hashes": pa.array(out_n, pa.int64()),
            "kth_min": pa.array(out_kth, pa.int64()),
            "est": pa.array(out_est, pa.int64())})

    return (ds.select_columns([key_col, val_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(merge, batch_format="pyarrow"))
