"""Confusion/precision/recall and calibration bins: hand-checked
values and partition invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.mleval import calibration_bins, confusion_stats


def _ds(y, p, probs=None, blocks=1):
    cols = {"y": np.asarray(y, np.int64), "pred": np.asarray(p, np.int64)}
    if probs is not None:
        cols["p_micro"] = np.asarray(probs, np.int64)
    ds = rd.from_arrow(pa.table(cols))
    return ds.repartition(blocks) if blocks > 1 else ds


def test_confusion_hand_case(ray_session):
    y = [1, 1, 1, 0, 0, 0, 1, 0]
    p = [1, 1, 0, 1, 0, 0, 1, 0]
    s = confusion_stats(_ds(y, p), "y", "pred")
    assert (s["tp"], s["fp"], s["fn"], s["tn"]) == (3, 1, 1, 3)
    assert s["precision_ppm"] == 750_000
    assert s["recall_ppm"] == 750_000
    assert s["accuracy_ppm"] == 750_000


def test_confusion_partition_invariant(ray_session):
    rng = np.random.RandomState(2)
    y = rng.randint(0, 2, 500)
    p = rng.randint(0, 2, 500)
    assert (confusion_stats(_ds(y, p), "y", "pred")
            == confusion_stats(_ds(y, p, blocks=9), "y", "pred"))


def test_calibration_bins_edges(ray_session):
    probs = [0, 99_999, 100_000, 950_000, 1_000_000]
    y = [0, 0, 1, 1, 1]
    out = calibration_bins(_ds(y, y, probs), "p_micro", "y").to_pandas()
    got = {r.bin: (r.n, r.n_pos, r.sum_p) for r in out.itertuples()}
    # p=0 and 99_999 -> bin 0; 100_000 -> bin 1; 950_000 and the
    # full-scale 1_000_000 both land in the TOP bin 9
    assert got[0] == (2, 0, 99_999)
    assert got[1] == (1, 1, 100_000)
    assert got[9] == (2, 2, 1_950_000)


def _brute_auc(y, s):
    """Pairwise Mann–Whitney reference with half-credit ties."""
    y = np.asarray(y, np.int64)
    s = np.asarray(s, np.int64)
    sp, sn = s[y == 1], s[y == 0]
    wins = (sp[:, None] > sn[None, :]).sum()
    ties = (sp[:, None] == sn[None, :]).sum()
    return int(2 * wins + ties), (2 * wins + ties) / (
        2 * len(sp) * len(sn))


def test_roc_auc_matches_pairwise_reference(ray_session):
    from xtract.ops.mleval import roc_auc

    rng = np.random.RandomState(5)
    y = rng.randint(0, 2, 600)
    s = rng.randint(0, 40, 600)        # heavy ties
    out = roc_auc(_ds(y, y, s), "p_micro", "y")
    num2, auc = _brute_auc(y, s)
    assert int(out["auc_num2"][0]) == num2
    assert float(out["auc"][0]) == auc
    assert int(out["n_pos"][0]) == int(y.sum())


def test_roc_auc_partition_invariant_and_edges(ray_session):
    import pytest

    from xtract.ops.mleval import roc_auc

    rng = np.random.RandomState(8)
    y = rng.randint(0, 2, 400)
    s = (y * 1000 + rng.randint(0, 1500, 400))  # informative score
    a1 = roc_auc(_ds(y, y, s), "p_micro", "y")
    a9 = roc_auc(_ds(y, y, s, blocks=9), "p_micro", "y")
    assert a1.equals(a9)
    assert float(a1["auc"][0]) > 0.6
    # perfect separation → 1.0; single class → raise
    yp = np.array([0, 0, 1, 1], np.int64)
    assert float(roc_auc(_ds(yp, yp, yp * 10), "p_micro", "y")
                 ["auc"][0]) == 1.0
    with pytest.raises(ValueError, match="both classes"):
        roc_auc(_ds([1, 1], [1, 1], [3, 4]), "p_micro", "y")
