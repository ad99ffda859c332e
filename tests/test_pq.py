"""Product quantization: shapes, determinism, partition invariance,
and retrieval sanity on well-separated clusters."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.pq import pq_encode, pq_search, train_pq


def _clustered(n_per=20, m_clusters=4, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-1, 1, (m_clusters, dim)) * 0.8
    rows = []
    vid = 0
    for c in range(m_clusters):
        for _ in range(n_per):
            v = centers[c] + rng.uniform(-0.02, 0.02, dim)
            rows.append({"vec_id": vid, "embedding": v.tolist(),
                         "cluster": c})
            vid += 1
    return rows


def _ds(rows, blocks=1):
    ds = rd.from_items(rows)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_codebook_shape_and_determinism(ray_session):
    rows = _clustered()
    a = train_pq(_ds(rows), dim=8, m=2, k=4, iters=2)
    b = train_pq(_ds(rows, 7), dim=8, m=2, k=4, iters=2)
    assert a.shape == (2, 4, 4)
    assert (a == b).all()


def test_encode_partition_invariant(ray_session):
    rows = _clustered()
    books = train_pq(_ds(rows), dim=8, m=2, k=4, iters=2)
    a = pq_encode(_ds(rows), books).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    b = pq_encode(_ds(rows, 5), books).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    assert a.equals(b)
    assert set(a.columns) == {"vec_id", "code_0", "code_1"}


def test_search_finds_own_cluster(ray_session):
    rows = _clustered()
    ds = _ds(rows)
    books = train_pq(ds, dim=8, m=2, k=4, iters=3)
    codes = pq_encode(ds, books)
    q = np.asarray(rows[0]["embedding"])  # cluster 0 member
    got = pq_search(codes, books, q, topk=20).to_pandas()
    by_id = {r["vec_id"]: r["cluster"] for r in rows}
    top_clusters = [by_id[v] for v in got["vec_id"]]
    # with tight, well-separated clusters all top-20 are cluster 0
    assert top_clusters == [0] * 20
    assert (got["pq_dist"] >= 0).all()


def test_dim_must_divide(ray_session):
    import pytest

    with pytest.raises(ValueError, match="subspaces"):
        train_pq(_ds(_clustered()), dim=8, m=3)
