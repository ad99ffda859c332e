"""Distribution-drift audits between corpus slices.

``two_sample_ks`` — the exact two-sample Kolmogorov–Smirnov statistic
between two groups' integer-valued distributions:

    D = max over pooled values v of |F_a(v) − F_b(v)|

computed entirely in integers as ``d_num = max |n_b·C_a(v) −
n_a·C_b(v)|`` (C = cumulative count), so the scan is bit-identical at
any parallelism; the final ``ks = d_num / (n_a·n_b)`` is one IEEE
division both numpy and DuckDB reproduce exactly (all operands below
2^53 — document the bound at extreme corpus sizes).

The drift question this answers on a crawl: "did the length / quality
/ score distribution of source X move between snapshots (or differ
from source Y)?" — the standard refresh-monitoring gate.

Scale shape: one vectorized projection → ONE grouped Sum over
distinct values (pre-summed per block by the groupby's own combiner)
→ a range sort of the DISTINCT-value table (tiny vs the corpus) → a
distributed global prefix scan in two block passes (the
``tag_late_events`` shape: pass 1 emits one partial row per block,
the driver folds n_blocks rows, pass 2 finishes inside each block).
No corpus-proportional driver state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def two_sample_ks(ds, group_col: str, val_col: str,
                  group_a: str, group_b: str) -> pd.DataFrame:
    """Exact KS statistic between ``group_a`` and ``group_b`` rows of
    integer ``val_col``.  → one-row DataFrame (n_a, n_b, d_num, ks)."""
    import ray

    ga, gb = group_a, group_b

    def project(b: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(b[group_col], ga), pc.equal(b[group_col], gb))
        t = b.filter(m)
        isa = pc.cast(pc.equal(t[group_col], ga), pa.int64())
        return pa.table({
            "v": pc.cast(t[val_col], pa.int64()),
            "na": isa,
            "nb": pc.subtract(pa.scalar(1, pa.int64()), isa)})

    from ray.data.aggregate import Sum

    counts = (ds.map_batches(project, batch_format="pyarrow")
              .groupby("v")
              .aggregate(Sum("na", alias_name="na"),
                         Sum("nb", alias_name="nb"))
              .sort("v").materialize())

    def block_meta(b: pa.Table) -> pa.Table:
        return pa.table({
            "first": pa.array([b["v"][0].as_py()], pa.int64()),
            "sa": pa.array([pc.sum(b["na"]).as_py() or 0], pa.int64()),
            "sb": pa.array([pc.sum(b["nb"]).as_py() or 0], pa.int64())})

    meta = (counts.map_batches(block_meta, batch_format="pyarrow",
                               batch_size=None).to_pandas()
            .sort_values("first").reset_index(drop=True))
    if not len(meta):
        raise ValueError("two_sample_ks: no rows in either group")
    firsts = meta["first"].to_numpy(np.int64)
    sa = meta["sa"].to_numpy(np.int64)
    sb = meta["sb"].to_numpy(np.int64)
    n_a, n_b = int(sa.sum()), int(sb.sum())
    if n_a == 0 or n_b == 0:
        raise ValueError(
            f"two_sample_ks: empty group (n_a={n_a}, n_b={n_b})")
    off_a = np.concatenate(([0], np.cumsum(sa)[:-1]))
    off_b = np.concatenate(([0], np.cumsum(sb)[:-1]))
    ref = ray.put((firsts, off_a, off_b, n_a, n_b))

    def block_max(b: pa.Table) -> pa.Table:
        fk, oa, ob, ta, tb = ray.get(ref)
        pos = np.searchsorted(fk, b["v"][0].as_py())
        ca = oa[pos] + np.cumsum(b["na"].to_numpy(zero_copy_only=False))
        cb = ob[pos] + np.cumsum(b["nb"].to_numpy(zero_copy_only=False))
        d = np.abs(tb * ca - ta * cb).max()
        return pa.table({"d": pa.array([int(d)], pa.int64())})

    dmax = (counts.map_batches(block_max, batch_format="pyarrow",
                               batch_size=None).to_pandas()["d"].max())
    d_num = int(dmax)
    return pd.DataFrame({
        "n_a": pa.array([n_a], pa.int64()).to_pandas(),
        "n_b": pa.array([n_b], pa.int64()).to_pandas(),
        "d_num": pa.array([d_num], pa.int64()).to_pandas(),
        "ks": [d_num / (n_a * n_b)],
    })
