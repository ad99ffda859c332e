"""Entity resolution: edit-distance self-join without the O(n²) scan.

FastSS deletion-neighborhood blocking (Bocek, Hunt & Stiller 2007,
public algorithm): if ``lev(a, b) ≤ k`` then the ≤k-deletion variant
sets of ``a`` and ``b`` intersect — so exploding every string into its
deletion neighborhood and co-grouping by variant yields a candidate
superset, verified pair-by-pair with the exact (capped) Levenshtein
kernel.  The complete-blocking guarantee means results equal the full
n² SQL self-join.

Scale shape: explode fanout is C(len, ≤k) per string (≈ len²/2 at
k=2 — size the partition count to len² × rows); candidates co-group
ONCE by hash(variant) with a fail-loud per-variant group cap (a
pathological variant shared by m strings would emit m² candidates),
then pair-dedup + verify in ONE coarse co-group by hash(id_a) — each
distinct candidate pair pays exactly one O(len·k) banded-DP call.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

from .fuzzy import levenshtein


def _deletion_variants(s: str, k: int) -> set[str]:
    out = {s}
    n = len(s)
    for d in range(1, min(k, n) + 1):
        for idx in combinations(range(n), d):
            keep = [c for i, c in enumerate(s) if i not in idx]
            out.add("".join(keep))
    return out


def deletion_neighborhood_pairs(ds, id_col: str, str_col: str,
                                max_dist: int = 2,
                                num_partitions: int = 32,
                                max_group: int = 10_000):
    """→ Dataset (id_a, id_b, dist:int64), id_a < id_b, exact
    ``lev ≤ max_dist`` pairs.  ``id_col`` must be int64 and unique
    per string (dedup strings upstream)."""
    from .agg import _hash_part

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        strs = b[str_col].to_pylist()
        v_ids, v_strs, v_keys = [], [], []
        for i, s in zip(ids, strs):
            s = s or ""
            for v in _deletion_variants(s, max_dist):
                v_ids.append(i)
                v_strs.append(s)
                v_keys.append(v)
        t = pa.table({"key": pa.array(v_keys, pa.string()),
                      "id": pa.array(v_ids, pa.int64()),
                      "s": pa.array(v_strs, pa.string())})
        return t.append_column("_part", pa.array(
            _hash_part(t["key"], num_partitions), pa.int64()))

    def candidates(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"key": t["key"].to_pandas(),
                            "id": t["id"].to_pandas(),
                            "s": t["s"].to_pandas()})
              .drop_duplicates(["key", "id"]))
        sizes = df.groupby("key", sort=False)["id"].transform("size")
        if (sizes > max_group).any():
            raise ValueError(
                "deletion_neighborhood_pairs: a variant is shared by "
                f">{max_group} strings — pre-dedup exact duplicates or "
                "raise max_group")
        m = df.merge(df, on="key")
        m = m[m["id_x"] < m["id_y"]]
        m = m.drop_duplicates(["id_x", "id_y"])
        return pa.table({
            "id_a": pa.array(m["id_x"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(m["id_y"].to_numpy(np.int64), pa.int64()),
            "sa": pa.array(m["s_x"], pa.string()),
            "sb": pa.array(m["s_y"], pa.string())})

    cands = (ds.select_columns([id_col, str_col])
             .map_batches(explode, batch_format="pyarrow")
             .groupby("_part")
             .map_groups(candidates, batch_format="pyarrow"))

    def tag_pairs(b: pa.Table) -> pa.Table:
        return b.append_column("_part", pa.array(
            _hash_part(b["id_a"], num_partitions), pa.int64()))

    def verify(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"id_a": t["id_a"].to_pandas(),
                            "id_b": t["id_b"].to_pandas(),
                            "sa": t["sa"].to_pandas(),
                            "sb": t["sb"].to_pandas()})
              .drop_duplicates(["id_a", "id_b"])
              .sort_values(["id_a", "id_b"]))
        dist = [levenshtein(a, b, cap=max_dist)
                for a, b in zip(df["sa"], df["sb"])]
        df["dist"] = np.asarray(dist, np.int64)
        df = df[df["dist"] <= max_dist]
        return pa.table({
            "id_a": pa.array(df["id_a"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(df["id_b"].to_numpy(np.int64), pa.int64()),
            "dist": pa.array(df["dist"].to_numpy(np.int64), pa.int64())})

    return (cands.map_batches(tag_pairs, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(verify, batch_format="pyarrow"))
