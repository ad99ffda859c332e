"""Isotonic (PAV) calibration: minimax brute-force equality with
exact Fractions, partition invariance, monotone-input identity,
single-pool collapse, gate."""

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xtract.ops.mleval import isotonic_calibrate


def _ds_of(rd, df, parts):
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)


def _minimax_reference(scores, ns, pos):
    """ŷ_k = max_{i≤k} min_{j≥k} (P_j−P_{i−1})/(N_j−N_{i−1}) over the
    distinct-score table, exact rationals."""
    order = np.argsort(scores)
    ns, pos = np.asarray(ns)[order], np.asarray(pos)[order]
    m = len(ns)
    P = np.concatenate([[0], np.cumsum(pos)])
    N = np.concatenate([[0], np.cumsum(ns)])
    out = []
    for k in range(m):
        best = None
        for i in range(k + 1):
            mn = min(Fraction(int(P[j + 1] - P[i]),
                              int(N[j + 1] - N[i]))
                     for j in range(k, m))
            if best is None or mn > best:
                best = mn
        out.append(best)
    return out


def _rows(n=300, seed=5):
    rng = np.random.RandomState(seed)
    p = rng.randint(0, 40, n).astype(np.int64) * 25_000
    # noisy but roughly increasing positive rate in score
    y = (rng.rand(n) * 1_000_000 < p * 0.8 + 100_000).astype(np.int64)
    return pd.DataFrame({"p_micro": p, "y": y})


def test_isotonic_matches_minimax_reference(ray_session):
    import ray.data as rd

    df = _rows()
    out = isotonic_calibrate(_ds_of(rd, df, 6), "p_micro", "y")
    agg = (df.groupby("p_micro")["y"].agg(["count", "sum"])
           .reset_index().sort_values("p_micro"))
    ref = _minimax_reference(agg["p_micro"].to_numpy(),
                             agg["count"].to_numpy(),
                             agg["sum"].to_numpy())
    got = [Fraction(int(a), int(b))
           for a, b in zip(out["cal_num"], out["cal_den"])]
    assert got == ref
    # cal_p is the IEEE division of the pooled rational
    np.testing.assert_array_equal(
        out["cal_p"].to_numpy(),
        out["cal_num"].to_numpy(np.int64)
        / out["cal_den"].to_numpy(np.int64))
    assert (np.diff(out["cal_p"].to_numpy()) >= 0).all()


def test_isotonic_partition_invariance(ray_session):
    import ray.data as rd

    df = _rows(seed=9)
    a = isotonic_calibrate(_ds_of(rd, df, 1), "p_micro", "y")
    b = isotonic_calibrate(_ds_of(rd, df, 11), "p_micro", "y")
    pd.testing.assert_frame_equal(a, b)


def test_isotonic_monotone_input_unchanged(ray_session):
    import ray.data as rd

    # rates 0/2, 1/2, 2/2 per score — already isotonic
    df = pd.DataFrame({"p_micro": [1, 1, 2, 2, 3, 3],
                       "y": [0, 0, 1, 0, 1, 1]}).astype("int64")
    out = isotonic_calibrate(_ds_of(rd, df, 3), "p_micro", "y")
    assert out["cal_num"].tolist() == [0, 1, 2]
    assert out["cal_den"].tolist() == [2, 2, 2]


def test_isotonic_equal_rate_neighbours_merge(ray_session):
    import ray.data as rd

    # rates 1/2 and 2/4 are equal → one canonical pool (3, 6)
    df = pd.DataFrame({"p_micro": [1, 1, 2, 2, 2, 2],
                       "y": [1, 0, 1, 1, 0, 0]}).astype("int64")
    out = isotonic_calibrate(_ds_of(rd, df, 3), "p_micro", "y")
    assert out["cal_num"].tolist() == [3, 3]
    assert out["cal_den"].tolist() == [6, 6]


def test_isotonic_decreasing_input_single_pool(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"p_micro": [1, 1, 2, 2],
                       "y": [1, 1, 0, 0]}).astype("int64")
    out = isotonic_calibrate(_ds_of(rd, df, 2), "p_micro", "y")
    assert out["cal_num"].tolist() == [2, 2]
    assert out["cal_den"].tolist() == [4, 4]


def test_isotonic_gate(ray_session):
    import ray.data as rd

    df = _rows()
    with pytest.raises(RuntimeError, match="max_scores"):
        isotonic_calibrate(_ds_of(rd, df, 3), "p_micro", "y",
                           max_scores=3)


def test_apply_isotonic_roundtrip_and_clamp(ray_session):
    import ray.data as rd

    from xtract.ops.mleval import apply_isotonic

    df = _rows(seed=21)
    df["doc_id"] = np.arange(len(df), dtype=np.int64)
    tbl = isotonic_calibrate(_ds_of(rd, df, 5), "p_micro", "y")
    out = (apply_isotonic(_ds_of(rd, df, 5), tbl, "p_micro")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    lut = tbl.set_index("p_micro")
    exp = lut.loc[df["p_micro"], "cal_p"].to_numpy()
    np.testing.assert_array_equal(out["cal_p"].to_numpy(), exp)
    # unseen scores: below-min clamps to first pool, between-scores
    # takes the largest fitted score below, above-max the last pool
    probe = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "p_micro": np.array([-5, int(tbl["p_micro"].iloc[1]) + 1,
                             10**9], np.int64)})
    got = (apply_isotonic(_ds_of(rd, probe, 1), tbl, "p_micro")
           .to_pandas().sort_values("doc_id"))
    assert got["cal_p"].iloc[0] == tbl["cal_p"].iloc[0]
    assert got["cal_p"].iloc[1] == tbl["cal_p"].iloc[1]
    assert got["cal_p"].iloc[2] == tbl["cal_p"].iloc[-1]
