"""Split conformal: coverage guarantee on synthetic noise, quantile
rank arithmetic, degenerate splits."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from xtract.ops.mleval import conformal_binary


def _scored(n=2000, noise=0.15, seed=3, blocks=1):
    """Scores correlated with the label but noisy — sets must widen
    enough to cover 90%."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, n)
    p = np.clip(y * 0.8 + 0.1 + rng.normal(0, noise, n), 0.0, 1.0)
    split = np.where(np.arange(n) % 2 == 0, "calib", "test")
    t = pa.table({"y": y.astype(np.int64),
                  "p_micro": (p * 1_000_000).astype(np.int64),
                  "split": split})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_coverage_at_least_target(ray_session):
    s = conformal_binary(_scored(), "y", "p_micro", "split")
    cov = s["n_covered"] / s["n_eval"]
    assert cov >= 0.88          # 0.9 target minus finite-sample slack
    # set sizes are 0..2 per point (empty sets are legitimate where
    # both classes are nonconforming); on average near 1 here
    assert 0 < s["sum_set_size"] <= 2 * s["n_eval"]


def test_rank_is_ceiling_rule(ray_session):
    s = conformal_binary(_scored(n=199), "y", "p_micro", "split")
    # n_cal = 100 -> rank = ceil(101 * 0.9) = 91
    assert s["n_cal"] == 100
    assert s["rank"] == 91


def test_partition_invariance(ray_session):
    a = conformal_binary(_scored(), "y", "p_micro", "split")
    b = conformal_binary(_scored(blocks=9), "y", "p_micro", "split")
    assert a == b


def test_empty_calibration_raises(ray_session):
    t = pa.table({"y": [1], "p_micro": [5], "split": ["test"]})
    with pytest.raises(ValueError, match="empty calibration"):
        conformal_binary(rd.from_arrow(t), "y", "p_micro", "split")
