"""Cross-source contamination audit: pairwise distinct-set overlap.

Given a corpus-scale stream of (key, value) rows where ``key`` has
dimension-like cardinality (sources, shards, corpus snapshots) and
``value`` is corpus-scale (winnowing fingerprints, url hashes,
paragraph hashes), compute |A_i ∩ A_j| for every key pair plus |A_i|
— the inputs to a Jaccard / containment contamination matrix between
training-data sources.

Shape: block combiner drop_duplicates → ONE co-group by ``hash(value)``
(same-value rows co-locate, so the per-partition dedup is globally
exact) → per partition one cython self-merge emitting (ka ≤ kb) pair
partials — the DIAGONAL rows double as per-key distinct-count partials
— → one grouped Sum over a ≤ K² key space.  Nothing corpus-
proportional reaches the driver; a fail-loud gate trips if ``key``
turns out not to be dimension-like.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def keyed_set_overlap(ds, key_col: str, val_col: str,
                      num_partitions: int = 32, max_keys: int = 10_000):
    """→ Dataset (ka, kb, inter:int64) with ka ≤ kb; the diagonal
    (ka == kb) rows carry each key's distinct-value count."""
    from ray.data.aggregate import Sum

    from .agg import _hash_part

    def combine(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": b[key_col].to_pandas(),
            "v": b[val_col].to_pandas()}).drop_duplicates()
        t = pa.table({"k": pa.array(df["k"]),
                      "v": pa.array(df["v"])})
        return t.append_column("_part", pa.array(
            _hash_part(t["v"], num_partitions), pa.int64()))

    def per_partition(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": t["k"].to_pandas(),
                           "v": t["v"].to_pandas()}).drop_duplicates()
        if df["k"].nunique() > max_keys:
            raise ValueError(
                f"keyed_set_overlap: >{max_keys} distinct keys in one "
                "partition — the key column is not dimension-like; "
                "use a pairwise-minhash sketch instead")
        m = df.merge(df, on="v")
        m = m[m["k_x"] <= m["k_y"]]
        g = (m.groupby(["k_x", "k_y"], sort=False).size()
             .reset_index(name="n"))
        return pa.table({"ka": pa.array(g["k_x"]),
                         "kb": pa.array(g["k_y"]),
                         "n": pa.array(g["n"].to_numpy(np.int64),
                                       pa.int64())})

    return (ds.map_batches(combine, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(per_partition, batch_format="pyarrow")
            .groupby(["ka", "kb"])
            .aggregate(Sum("n", alias_name="inter")))


def overlap_matrix(overlap_ds) -> pd.DataFrame:
    """Driver-side fold of ``keyed_set_overlap`` output (≤ K² rows):
    → (key_a, key_b, inter, union_n, jaccard_milli) for ka < kb,
    jaccard in exact integer milli-units (truncating division)."""
    df = overlap_ds.to_pandas()
    sizes = dict(zip(
        df.loc[df["ka"] == df["kb"], "ka"],
        df.loc[df["ka"] == df["kb"], "inter"].astype(np.int64)))
    p = df[df["ka"] != df["kb"]].copy()
    na = p["ka"].map(sizes).to_numpy(np.int64)
    nb = p["kb"].map(sizes).to_numpy(np.int64)
    inter = p["inter"].to_numpy(np.int64)
    union = na + nb - inter
    return pd.DataFrame({
        "key_a": p["ka"].to_numpy(),
        "key_b": p["kb"].to_numpy(),
        "inter": inter,
        "union_n": union,
        "jaccard_milli": (1000 * inter) // union,
    }).sort_values(["key_a", "key_b"]).reset_index(drop=True)
