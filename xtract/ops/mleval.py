"""Model-evaluation aggregates for the trained-classifier tier: exact
integer confusion/precision/recall and calibration (reliability) bins.

Both are single grouped aggregates over the scored table — the
evaluation passes that close the train→score→EVALUATE loop around
``ops/logreg`` (and any other scorer emitting integer
micro-probabilities).  Precision/recall are exact integer ppm
(truncating division, DuckDB ``//`` semantics); calibration bins carry
(n, n_pos, Σp_micro) so the reliability curve is a driver-side
division of exact sums.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def confusion_stats(ds, label_col: str, pred_col: str):
    """→ single-row Dataset-backed dict {tp, fp, fn, tn,
    precision_ppm, recall_ppm, accuracy_ppm} — one streaming pass of
    4-value partials into a native Sum."""
    def partial(t: pa.Table) -> pa.Table:
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t[pred_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "tp": pa.array([int(((y == 1) & (p == 1)).sum())], pa.int64()),
            "fp": pa.array([int(((y == 0) & (p == 1)).sum())], pa.int64()),
            "fn": pa.array([int(((y == 1) & (p == 0)).sum())], pa.int64()),
            "tn": pa.array([int(((y == 0) & (p == 0)).sum())], pa.int64()),
        })

    s = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["tp", "fp", "fn", "tn"])
    tp, fp = int(s["sum(tp)"]), int(s["sum(fp)"])
    fn, tn = int(s["sum(fn)"]), int(s["sum(tn)"])
    M = 1_000_000
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision_ppm": (M * tp) // (tp + fp) if tp + fp else 0,
        "recall_ppm": (M * tp) // (tp + fn) if tp + fn else 0,
        "accuracy_ppm": (M * (tp + tn)) // (tp + fp + fn + tn),
    }


def calibration_bins(ds, p_col: str, label_col: str,
                     n_bins: int = 10, p_scale: int = 1_000_000):
    """Reliability-diagram bins: bucket the integer micro-probability
    into ``n_bins`` equal-width bins (p == p_scale lands in the top
    bin) → per bin (n, n_pos, sum_p:int64).  ONE grouped Sum over an
    n_bins-bounded key space."""
    from ray.data.aggregate import Sum

    width = p_scale // n_bins

    def partial(t: pa.Table) -> pa.Table:
        p = t[p_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(p // width, n_bins - 1)
        import pandas as pd

        g = (pd.DataFrame({"bin": b, "n": 1, "n_pos": y, "sum_p": p})
             .groupby("bin", sort=False).sum().reset_index())
        return pa.table({
            "bin": pa.array(g["bin"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "n_pos": pa.array(g["n_pos"].to_numpy(np.int64), pa.int64()),
            "sum_p": pa.array(g["sum_p"].to_numpy(np.int64), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("n_pos", alias_name="n_pos"),
                       Sum("sum_p", alias_name="sum_p")))


def roc_auc(ds, score_col: str, label_col: str):
    """Exact ROC AUC (Mann–Whitney U with midrank tie handling) of an
    integer score column against a 0/1 label — threshold-free ranking
    quality for the trained classifier tier.

    Exact integers end to end:  group the corpus by DISTINCT score v
    into (n_pos(v), n_neg(v)) via ONE grouped Sum (pre-summed per
    block by the groupby's combiner), range-sort the distinct-score
    table (tiny vs the corpus), then a distributed global prefix scan
    of negatives in two block passes (the ``two_sample_ks`` /
    ``tag_late_events`` shape: pass 1 emits one partial row per
    block, the driver folds n_blocks rows, pass 2 finishes inside
    each block).  The doubled numerator

        auc_num2 = Σ_v  2·n_pos(v)·C_neg(<v)  +  n_pos(v)·n_neg(v)

    is an order-free int64 sum, so the statistic is bit-identical at
    any parallelism; the final ``auc = auc_num2 / (2·n_pos·n_neg)``
    is one IEEE division both numpy and DuckDB reproduce exactly
    (operands below 2^53 — document the bound at extreme corpus
    sizes).  → one-row DataFrame (n_pos, n_neg, auc_num2, auc)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def project(b: pa.Table) -> pa.Table:
        y = pc.cast(b[label_col], pa.int64())
        return pa.table({
            "v": pc.cast(b[score_col], pa.int64()),
            "np": y,
            "nn": pc.subtract(pa.scalar(1, pa.int64()), y)})

    counts = (ds.map_batches(project, batch_format="pyarrow")
              .groupby("v")
              .aggregate(Sum("np", alias_name="np"),
                         Sum("nn", alias_name="nn"))
              .sort("v").materialize())

    def block_meta(b: pa.Table) -> pa.Table:
        return pa.table({
            "first": pa.array([b["v"][0].as_py()], pa.int64()),
            "sn": pa.array([pc.sum(b["nn"]).as_py() or 0], pa.int64())})

    meta = (counts.map_batches(block_meta, batch_format="pyarrow",
                               batch_size=None).to_pandas()
            .sort_values("first").reset_index(drop=True))
    if not len(meta):
        raise ValueError("roc_auc: empty input")
    firsts = meta["first"].to_numpy(np.int64)
    sn = meta["sn"].to_numpy(np.int64)
    off_n = np.concatenate(([0], np.cumsum(sn)[:-1]))
    ref = ray.put((firsts, off_n))

    def block_num(b: pa.Table) -> pa.Table:
        fk, on = ray.get(ref)
        pos = np.searchsorted(fk, b["v"][0].as_py())
        npos = b["np"].to_numpy(zero_copy_only=False)
        nneg = b["nn"].to_numpy(zero_copy_only=False)
        cneg = on[pos] + np.cumsum(nneg) - nneg   # negatives STRICTLY below
        num2 = int((2 * npos * cneg + npos * nneg).sum())
        return pa.table({
            "num2": pa.array([num2], pa.int64()),
            "tp": pa.array([int(npos.sum())], pa.int64()),
            "tn": pa.array([int(nneg.sum())], pa.int64())})

    s = (counts.map_batches(block_num, batch_format="pyarrow",
                            batch_size=None).sum(["num2", "tp", "tn"]))
    n_pos, n_neg = int(s["sum(tp)"]), int(s["sum(tn)"])
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"roc_auc: need both classes (n_pos={n_pos}, n_neg={n_neg})")
    num2 = int(s["sum(num2)"])
    return pd.DataFrame({
        "n_pos": pa.array([n_pos], pa.int64()).to_pandas(),
        "n_neg": pa.array([n_neg], pa.int64()).to_pandas(),
        "auc_num2": pa.array([num2], pa.int64()).to_pandas(),
        "auc": [num2 / (2 * n_pos * n_neg)],
    })


def conformal_binary(scored, label_col: str, p_col: str,
                     split_col: str, alpha_num: int = 1,
                     alpha_den: int = 10, p_scale: int = 1_000_000,
                     max_pull: int = 2_000_000):
    """Split conformal prediction (Vovk et al.; Angelopoulos & Bates
    2021 tutorial — public method) for a binary scorer emitting
    integer micro-probabilities: calibrate the nonconformity quantile
    ``q̂`` on the 'calib' split, then report coverage and set sizes on
    the 'test' split.  Nonconformity of class c = p_scale − p(c); the
    prediction set is every class with nonconformity ≤ q̂, giving
    ≥ 1−α marginal coverage for exchangeable data.

    Exact integers throughout: ``rank = ⌈(n_cal+1)(1−α)⌉`` by integer
    ceiling, q̂ is an order statistic fetched as the (n_cal−rank+1)-th
    LARGEST — a sort+limit pull of only ~α·n_cal slim rows, gated by
    ``max_pull`` (exact count, fail-loud) — and coverage/set-size are
    one partial-sum pass.

    → dict {qhat, n_cal, rank, n_eval, n_covered, sum_set_size}."""
    import pyarrow.compute as pc

    def nc_batch(t: pa.Table) -> pa.Table:
        p = t[p_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = np.where(y == 1, p_scale - p, p)
        return pa.table({"nc": pa.array(nc, pa.int64())})

    def keep(split):
        return lambda t: t.filter(pc.equal(t[split_col], split))

    calib = scored.map_batches(keep("calib"),
                               batch_format="pyarrow").materialize()
    n_cal = calib.count()
    if n_cal == 0:
        raise ValueError("conformal_binary: empty calibration split")
    rank = -((-(n_cal + 1) * (alpha_den - alpha_num)) // alpha_den)
    rank = min(rank, n_cal)
    k2 = n_cal - rank + 1
    if k2 > max_pull:
        raise ValueError(
            f"conformal_binary: quantile pull of {k2} rows "
            f"(~α·n_cal, n_cal={n_cal}) exceeds max_pull {max_pull}; "
            "subsample the calibration split or raise max_pull")
    pulled = (calib.map_batches(nc_batch, batch_format="pyarrow")
              .sort("nc", descending=True).limit(k2).to_pandas())
    qhat = int(pulled["nc"].min())

    def eval_partial(t: pa.Table) -> pa.Table:
        p = t[p_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        in1 = (p_scale - p) <= qhat          # class 1 in the set
        in0 = p <= qhat                      # class 0 in the set
        covered = np.where(y == 1, in1, in0)
        return pa.table({
            "n": pa.array([len(p)], pa.int64()),
            "cov": pa.array([int(covered.sum())], pa.int64()),
            "sz": pa.array([int(in1.sum() + in0.sum())], pa.int64())})

    test = scored.map_batches(keep("test"), batch_format="pyarrow")
    s = test.map_batches(eval_partial, batch_format="pyarrow").sum(
        ["n", "cov", "sz"])
    return {"qhat": qhat, "n_cal": n_cal, "rank": rank,
            "n_eval": int(s["sum(n)"]), "n_covered": int(s["sum(cov)"]),
            "sum_set_size": int(s["sum(sz)"])}


def isotonic_calibrate(ds, p_col: str, label_col: str,
                       max_scores: int = 2_000_000):
    """Isotonic-regression (pool-adjacent-violators) calibration of a
    classifier score — the step-function complement to the fixed
    reliability deciles of :func:`calibration_bins` (public method:
    Zadrozny & Elkan's isotonic calibration; Ayer et al.'s PAV).

    Scale shape: the corpus collapses to the DISTINCT-score table via
    one grouped Sum/Count (the ``roc_auc`` cardinality argument —
    bounded by score cardinality, not rows); PAV itself is inherently
    sequential, so it runs driver-side over that table behind an
    exact-count ``max_scores`` fail-loud gate.  Pool merging compares
    empirical rates as INTEGER cross-products (``pos_a·n_b >
    pos_b·n_a`` with Python ints), so the fit is bit-identical at any
    parallelism; the one float is the final IEEE division
    ``cal_p = cal_num/cal_den`` (correctly rounded, so it depends only
    on the pooled rational — the property the SQL minimax oracle
    relies on).

    → pandas DataFrame (``p_col``, n, n_pos, cal_num, cal_den, cal_p)
    sorted by score: one row per distinct score, ``cal_p``
    non-decreasing.  Equal-rate neighbours ARE merged, so the pools
    are the maximal level sets of the (unique) fitted function and
    ``(cal_num, cal_den)`` is canonical too.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        p = t[p_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, inv = np.unique(p, return_inverse=True)
        n = np.bincount(inv, minlength=len(vals)).astype(np.int64)
        npos = np.zeros(len(vals), np.int64)
        np.add.at(npos, inv, y)
        return pa.table({p_col: pa.array(vals, pa.int64()),
                         "n": pa.array(n, pa.int64()),
                         "n_pos": pa.array(npos, pa.int64())})

    d = (ds.select_columns([p_col, label_col])
         .map_batches(partial, batch_format="pyarrow")
         .groupby(p_col)
         .aggregate(Sum("n", alias_name="n"),
                    Sum("n_pos", alias_name="n_pos"))).materialize()
    m = d.count()
    if m == 0:
        raise ValueError("isotonic_calibrate: empty input")
    if m > max_scores:
        raise RuntimeError(
            f"isotonic_calibrate: {m} distinct scores > "
            f"max_scores={max_scores}; quantize the score first")
    df = d.to_pandas().sort_values(p_col).reset_index(drop=True)

    # PAV stack: pools of (n, n_pos, span); merge while the last two
    # are non-increasing (>= keeps equal-rate pools together → pools
    # are the maximal level sets).
    pools: "list[list[int]]" = []
    for n_i, p_i in zip(df["n"].to_numpy(np.int64),
                        df["n_pos"].to_numpy(np.int64)):
        pools.append([int(n_i), int(p_i), 1])
        while (len(pools) > 1 and
               pools[-2][1] * pools[-1][0] >=
               pools[-1][1] * pools[-2][0]):
            b = pools.pop()
            pools[-1][0] += b[0]
            pools[-1][1] += b[1]
            pools[-1][2] += b[2]

    cal_num = np.empty(len(df), np.int64)
    cal_den = np.empty(len(df), np.int64)
    k = 0
    for n_p, p_p, span in pools:
        cal_num[k:k + span] = p_p
        cal_den[k:k + span] = n_p
        k += span
    out = df.copy()
    out["cal_num"] = cal_num
    out["cal_den"] = cal_den
    out["cal_p"] = cal_num / cal_den
    return out


def apply_isotonic(ds, table, p_col: str,
                   id_cols: "tuple[str, ...]" = ("doc_id",),
                   out_col: str = "cal_p"):
    """Score with a fitted :func:`isotonic_calibrate` table: the
    step table is ``ray.put`` once and each batch does ONE
    searchsorted lookup.  Unseen scores take the pool of the largest
    fitted score ≤ p (clamped at the ends) — the standard step-
    function extrapolation, deterministic.  → Dataset(id_cols...,
    ``p_col``, cal_num, cal_den, ``out_col``)."""
    import ray

    scores = np.ascontiguousarray(table[p_col].to_numpy(np.int64))
    num = np.ascontiguousarray(table["cal_num"].to_numpy(np.int64))
    den = np.ascontiguousarray(table["cal_den"].to_numpy(np.int64))
    ref = ray.put((scores, num, den))

    def apply(b: pa.Table, _ref=ref) -> pa.Table:
        sc, nm, dn = ray.get(_ref)
        p = b[p_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.clip(np.searchsorted(sc, p, side="right") - 1,
                      0, len(sc) - 1)
        cols = {ic: b[ic] for ic in id_cols}
        cols[p_col] = pa.array(p, pa.int64())
        cols["cal_num"] = pa.array(nm[idx], pa.int64())
        cols["cal_den"] = pa.array(dn[idx], pa.int64())
        cols[out_col] = pa.array(nm[idx] / dn[idx], pa.float64())
        return pa.table(cols)

    return ds.map_batches(apply, batch_format="pyarrow")
