"""K-fold confusion: sequential reference and fold arithmetic."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _feats(rd, n=300, seed=5):
    rng = np.random.RandomState(seed)
    x1 = rng.randint(-5, 6, n).astype(np.int64)
    y = (x1 + rng.randint(-2, 3, n) > 0).astype(np.int64)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "x0": pa.array(np.ones(n, np.int64)),
        "x1": pa.array(x1),
        "y": pa.array(y)})).repartition(5)


def test_kfold_matches_manual_folds(ray_session):
    import ray.data as rd

    from xtract.ops.logreg import score_logreg, train_logreg
    from xtract.ops.mleval import confusion_stats
    from xtract.ops.xval import kfold_confusion

    feats = _feats(rd).materialize()
    got = kfold_confusion(feats, ["x0", "x1"], "y", k=3)
    for fold in range(3):
        tr = feats.filter(lambda r, f=fold: r["doc_id"] % 3 != f)
        te = feats.filter(lambda r, f=fold: r["doc_id"] % 3 == f)
        model = train_logreg(tr, ["x0", "x1"], "y", steps=4, lr=32)
        s = confusion_stats(
            score_logreg(te, model, ["doc_id", "y"]), "y", "pred")
        row = got[got.fold == fold].iloc[0]
        assert (row.tp, row.fp, row.fn, row.tn) == (
            s["tp"], s["fp"], s["fn"], s["tn"])
    # folds partition the corpus
    assert int((got.tp + got.fp + got.fn + got.tn).sum()) == 300


def test_kfold_learns_signal(ray_session):
    import ray.data as rd

    from xtract.ops.xval import kfold_confusion

    got = kfold_confusion(_feats(rd, seed=11), ["x0", "x1"], "y", k=3)
    acc = (got.tp + got.tn) / (got.tp + got.fp + got.fn + got.tn)
    assert (acc > 0.75).all()
