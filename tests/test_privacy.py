"""Privacy tier: k-anonymity audit and deterministic discrete-Laplace
noisy counts."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.pii import (_dgeom_thresholds, dp_noisy_counts,
                            k_anonymity_audit)


def test_k_anonymity_flags_only_small_groups(ray_session):
    rows = ([{"a": "x", "b": 1}] * 5 + [{"a": "x", "b": 2}] * 2 +
            [{"a": "y", "b": 1}] * 3)
    out = k_anonymity_audit(rd.from_items(rows), ["a", "b"],
                            k=5).to_pandas()
    got = {(r.a, r.b): r.n for r in out.itertuples()}
    assert got == {("x", 2): 2, ("y", 1): 3}


def test_dgeom_thresholds_shape():
    thr = _dgeom_thresholds(1, 2, 64)
    assert len(thr) == 128
    assert thr == sorted(thr)
    assert thr[-1] < (1 << 64)
    # CDF at g=0 (index 64) should be > 0.5 (median of a symmetric
    # distribution is 0)
    assert thr[64] / 2**64 > 0.5
    assert thr[63] / 2**64 < 0.5


def test_dp_noise_distribution():
    # empirical noise over many keys matches discrete Laplace:
    # mean ~0, Var = 2a/(1-a)^2 with a = exp(-0.5) -> ~7.84
    import math

    from xtract.ops.dedup import _md5_u64, _mix64

    thr = np.asarray(_dgeom_thresholds(1, 2, 64), np.uint64)
    h = np.asarray([_md5_u64(f"key{i}") for i in range(50_000)],
                   np.uint64)
    g = np.searchsorted(thr, _mix64(h), side="right").astype(
        np.int64) - 64
    a = math.exp(-0.5)
    want_var = 2 * a / (1 - a) ** 2
    assert abs(g.mean()) < 0.1
    assert 0.9 * want_var < g.var() < 1.1 * want_var


def test_dp_counts_reproducible_and_consistent(ray_session):
    rows = [{"k": f"t{i % 3}"} for i in range(90)]
    a = dp_noisy_counts(rd.from_items(rows), "k").to_pandas()
    b = dp_noisy_counts(rd.from_items(rows).repartition(7),
                        "k").to_pandas()
    key = "k"
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert (a["n_noisy"] == a["n_true"] + a["noise"]).all()
    assert (a["n_true"] == 30).all()
