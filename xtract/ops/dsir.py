"""DSIR-style data selection: importance weights from two unigram LMs.

DSIR (Data Selection via Importance Resampling, Xie et al. 2023,
arXiv:2302.03169 — public method) scores every raw document by
``log p_target(x) − log p_raw(x)`` under cheap bag-of-words language
models estimated from a target subset vs the whole corpus, then keeps
the top slice.  The published recipe uses hashed n-grams; here the
features are the corpus top-K unigrams + one OOV bucket so the weight
table is bounded by config, exact, and DuckDB-replayable.

Exactness: token log-probabilities are integer micro-nats
(``floor(scale·ln(n/d))``, the `nbayes` convention — IEEE-identical to
DuckDB's ``floor(scale * ln(...))`` on the same integers), so the
per-document score is a pure int64 sum: order-free and
partition-invariant.

Scale shape: ONE distributed token-count pass (block combiner →
grouped Sum over (tok)), a distributed top-K vocabulary selection
(block partial top-k → sort + limit — only K rows reach the driver),
then ONE stateless scoring pass with the K-row weight table broadcast
via ``ray.put``.  Nothing corpus-proportional leaves the cluster; the
target subset needs no separate pass (its counts ride the same
aggregate as a filtered Sum).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .nbayes import flat_tokens


def _ilog(num: int, den: int, scale: int) -> int:
    # same int → double → libm ln → floor chain as nbayes._int_log_weight
    return math.floor(scale * math.log((num * 1.0) / den))


def dsir_scores(ds, text_col: str, target_col: str, id_col: str,
                vocab_size: int = 2000, scale: int = 1_000_000):
    """→ Dataset (id_col, dsir_score:int64).  ``target_col`` is a 0/1
    int64 column marking the target-domain rows; documents with no
    tokens score 0."""
    import ray
    from ray.data.aggregate import Sum

    def partial_counts(b: pa.Table) -> pa.Table:
        flat, cnts = flat_tokens(b[text_col])
        tgt = np.repeat(
            b[target_col].to_numpy(zero_copy_only=False), cnts)
        g = (pd.DataFrame({"tok": flat, "tgt": tgt})
             .groupby("tok", sort=False)
             .agg(n_raw=("tgt", "size"), n_tgt=("tgt", "sum"))
             .reset_index())
        return pa.table({
            "tok": pa.array(g["tok"], pa.string()),
            "n_raw": pa.array(g["n_raw"].to_numpy(np.int64), pa.int64()),
            "n_tgt": pa.array(g["n_tgt"].to_numpy(np.int64), pa.int64())})

    counts = (ds.select_columns([text_col, target_col])
              .map_batches(partial_counts, batch_format="pyarrow")
              .groupby("tok")
              .aggregate(Sum("n_raw", alias_name="n_raw"),
                         Sum("n_tgt", alias_name="n_tgt"))).materialize()

    import pyarrow.compute as pc

    def block_topk(t: pa.Table) -> pa.Table:
        if len(t) <= vocab_size:
            return t
        idx = pc.sort_indices(t, sort_keys=[("n_raw", "descending"),
                                            ("tok", "ascending")])
        return t.take(idx[:vocab_size])

    kept = (counts.map_batches(block_topk, batch_format="pyarrow")
            .sort(["n_raw", "tok"], descending=[True, False])
            .limit(vocab_size).to_pandas())
    V = len(kept)
    t_raw = int(kept["n_raw"].sum())
    t_tgt = int(kept["n_tgt"].sum())

    order = np.argsort(kept["tok"].to_numpy(dtype=object))
    vtoks = kept["tok"].to_numpy(dtype=object)[order]
    n_raw = kept["n_raw"].to_numpy(np.int64)[order]
    n_tgt = kept["n_tgt"].to_numpy(np.int64)[order]
    W = np.asarray(
        [_ilog(int(n_tgt[i]) + 1, t_tgt + V, scale)
         - _ilog(int(n_raw[i]) + 1, t_raw + V, scale)
         for i in range(V)], np.int64)
    oov_w = _ilog(1, t_tgt + V, scale) - _ilog(1, t_raw + V, scale)
    ref = ray.put((vtoks, W))

    def score(b: pa.Table) -> pa.Table:
        vt, w = ray.get(ref)
        flat, cnts = flat_tokens(b[text_col])
        n = len(b)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), cnts)
        idx = pd.Index(vt).get_indexer(flat)
        tw = np.where(idx >= 0, w[np.maximum(idx, 0)], oov_w)
        acc = np.zeros(n, np.int64)
        np.add.at(acc, row_ids, tw)
        return pa.table({id_col: b[id_col],
                         "dsir_score": pa.array(acc, pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")
