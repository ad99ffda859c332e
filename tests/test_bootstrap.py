"""Poisson bootstrap: weight distribution, partition invariance, and
SE calibration against the analytic standard error."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.bootstrap import (POISSON1_THRESHOLDS, _weights,
                                  bootstrap_group_sums,
                                  bootstrap_se_of_mean)


def test_thresholds_are_poisson1_cdf():
    import math

    assert len(POISSON1_THRESHOLDS) == 9
    # P(X=0) = e^-1 ~ 0.3679
    assert abs(POISSON1_THRESHOLDS[0] / 2**64 - math.exp(-1)) < 1e-12
    assert POISSON1_THRESHOLDS == tuple(sorted(POISSON1_THRESHOLDS))


def test_weight_distribution_mean_one():
    ids = np.arange(200_000, dtype=np.int64)
    w = _weights(ids, 3, 16)
    assert 0.99 < w.mean() < 1.01       # E[w] = 1
    assert 0.98 < w.var() < 1.02        # Var[w] = 1
    assert w.min() >= 0 and w.max() <= 9


def _ds(n, blocks=1):
    rng = np.random.RandomState(7)
    t = pa.table({"event_id": np.arange(n, dtype=np.int64),
                  "event_type": ["t"] * n,
                  "value": rng.normal(50.0, 10.0, n).round(2)})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_partition_invariance(ray_session):
    a = bootstrap_group_sums(_ds(3000), "event_type", "value",
                             "event_id").to_pandas()
    b = bootstrap_group_sums(_ds(3000, 11), "event_type", "value",
                             "event_id").to_pandas()
    key = ["event_type", "replica"]
    assert (a.sort_values(key).reset_index(drop=True)
            .equals(b.sort_values(key).reset_index(drop=True)))


def test_se_calibrated_to_analytic(ray_session):
    n, sd = 4000, 10.0
    reps = bootstrap_group_sums(_ds(n), "event_type", "value",
                                "event_id", n_replicas=16).to_pandas()
    se = bootstrap_se_of_mean(reps, "event_type")
    got = float(se["boot_se"].iloc[0])          # cents
    want = sd * 100 / np.sqrt(n)                # analytic SE in cents
    assert 0.5 * want < got < 2.0 * want
    assert abs(float(se["boot_mean"].iloc[0]) - 5000) < 100
