"""count_distinct_per_key and label_centroids vs brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from xtract.ops.agg import count_distinct_per_key
from xtract.ops.similarity import label_centroids


def test_count_distinct_matches_pandas(ray_session):
    rng = np.random.default_rng(5)
    k = rng.integers(0, 6, 500)
    v = rng.integers(0, 40, 500)
    ds = rd.from_arrow(pa.table({
        "k": pa.array([f"t{x}" for x in k], pa.string()),
        "v": pa.array(v, pa.int64())})).repartition(7)
    got = count_distinct_per_key(ds, "k", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = (pd.DataFrame({"k": [f"t{x}" for x in k], "v": v})
            .groupby("k")["v"].nunique().reset_index()
            .rename(columns={"v": "n_distinct"}))
    assert got.equals(want)


def test_count_distinct_null_values_count_as_one(ray_session):
    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a", "b"], pa.string()),
        "v": pa.array([None, None, 1, None], pa.int64())}))
    got = dict(zip(*[count_distinct_per_key(ds, "k", "v").to_pandas()[c]
                     for c in ("k", "n_distinct")]))
    # groupby treats null as its own group value (documented: Arrow
    # group-by semantics, unlike SQL COUNT(DISTINCT) which drops nulls)
    assert got == {"a": 2, "b": 1}


def test_label_centroids_match_numpy(ray_session):
    rng = np.random.default_rng(9)
    labs = rng.integers(0, 3, 60)
    vecs = rng.standard_normal((60, 5)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "label": pa.array(labs, pa.int32()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })).repartition(6)
    got = label_centroids(ds).to_pandas() \
        .sort_values(["label", "dim"]).reset_index(drop=True)
    for lab in range(3):
        sel = vecs[labs == lab].astype(np.float64)
        q = np.floor(sel * 1_000_000).astype(np.int64)
        for d in range(5):
            row = got[(got["label"] == lab) & (got["dim"] == d)].iloc[0]
            assert row["sum_micro"] == q[:, d].sum()
            assert row["n_vecs"] == len(sel)
            assert abs(row["centroid"] - sel[:, d].mean()) < 2e-6


def test_label_centroids_partition_invariant(ray_session):
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((40, 4)).astype(np.float32)
    labs = rng.integers(0, 2, 40)
    t = pa.table({"label": pa.array(labs, pa.int32()),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    a = label_centroids(rd.from_arrow(t).repartition(2)).to_pandas() \
        .sort_values(["label", "dim"]).reset_index(drop=True)
    b = label_centroids(rd.from_arrow(t).repartition(9)).to_pandas() \
        .sort_values(["label", "dim"]).reset_index(drop=True)
    assert a.equals(b)  # bit-identical incl. the float centroid column
