"""K-fold cross-validation around the exact-integer logistic
classifier: deterministic fold assignment (id % k), one full
distributed train per fold on the complement, held-out scoring, exact
confusion counts — the generalization audit the single train/test
split can't give.  Every step reuses the established exact-int ops
(``ops/logreg`` GD passes, ``ops/mleval.confusion_stats``), so the
whole k-fold table is bit-identical at any parallelism and replays in
SQL as k renamed copies of the shared GD CTE body.

Scale shape: k × steps gradient passes over (k−1)/k of the corpus
each — all streaming map_batches → native Sum; nothing but the 4-value
confusion partials and the tiny weight vectors reach the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def kfold_confusion(feats, x_cols, label_col: str,
                    id_col: str = "doc_id", k: int = 3,
                    steps: int = 4, lr: int = 32) -> pd.DataFrame:
    """→ DataFrame (fold 0..k−1, tp, fp, fn, tn) — per-fold held-out
    confusion of the integer-GD model trained on the other folds."""
    from .logreg import score_logreg, train_logreg
    from .mleval import confusion_stats

    def fold_filter(fold: int, held_out: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = (pc.cast(t[id_col], pa.int64())
                   .to_numpy(zero_copy_only=False))
            m = pa.array((ids % k) == fold)
            return t.filter(m if held_out else pc.invert(m))
        return fn

    rows = []
    for fold in range(k):
        train = feats.map_batches(fold_filter(fold, False),
                                  batch_format="pyarrow")
        model = train_logreg(train, x_cols, label_col,
                             steps=steps, lr=lr)
        test = feats.map_batches(fold_filter(fold, True),
                                 batch_format="pyarrow")
        scored = score_logreg(test, model, [id_col, label_col])
        s = confusion_stats(scored, label_col, "pred")
        rows.append((fold, s["tp"], s["fp"], s["fn"], s["tn"]))
    return pd.DataFrame(
        rows, columns=["fold", "tp", "fp", "fn", "tn"]).astype("int64")
