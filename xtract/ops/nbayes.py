"""Distributed-trained multinomial Naive Bayes text classifier —
the "train a quality/domain/language classifier over the corpus, then
score every document with it" pipeline of a web-scale training-data
build (fastText-style supervision, NB instead of SGD so training is
pure counting: deterministic, order-independent, and expressible as
two grouped aggregates).

Scale shape:

- **train**: per-batch (token,class) partial counts (cython groupby)
  → ONE native groupby Sum over (token,class) → distributed top-V
  vocabulary (per-block partial top-k + sort/limit, the
  ``ops/vocab.build_vocab`` shape) → only V×C count rows ever reach
  the driver (bounded by ``vocab_size``, NOT by corpus size).
- **weights are integers**: ``w = floor(scale · ln((n+1)/(tot_c+V)))``
  computed with ``math.log`` (glibc libm — bit-identical to DuckDB's
  ``ln``, unlike ``np.log``), so per-document scores are exact int64
  sums: order-independent, overflow-free, and hash-matchable against
  a SQL oracle that re-derives the FULL training from scratch.
- **score**: broadcast the V×C weight matrix once (``ray.put``); per
  batch one vectorized pyarrow tokenize (regex replace + split —
  no Python loop over rows), one ``pd.Index.get_indexer`` vocab
  lookup, one cumsum-difference segment sum, one argmax.  Ties break
  to the lexicographically smallest class (argmax over classes sorted
  ascending picks the first maximum).

Reference parity: the classification surface of tesseract-rs
(block-type assignment, ``src/api.rs`` classify hooks) widened to a
corpus-trained model; SURVEY §2 "stateful stages" A1/A2 (broadcast
model state, init-once).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_CLASS = "[^a-z0-9_]+"


def flat_tokens(col) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized tokenizer: lowercase, replace non-[a-z0-9_] runs
    with spaces, split — equivalent to DuckDB
    ``regexp_extract_all(lower(text), '[a-z0-9_]+')``.
    → (flat token array [object], per-row token counts)."""
    s = pc.fill_null(col, "")
    cleaned = pc.replace_substring_regex(
        pc.utf8_lower(s), pattern=TOKEN_CLASS, replacement=" ")
    lists = pc.split_pattern(cleaned, " ").combine_chunks()
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy(zero_copy_only=False)
    values = lists.values
    n = len(lists)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    keep = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
    flat = np.asarray(values.to_pandas(), dtype=object)[keep]
    counts = np.bincount(row_ids[keep], minlength=n).astype(np.int64)
    return flat, counts


def _int_log_weight(num: int, den: int, scale: int) -> int:
    # (num, den) int → double divide → libm ln → double mult → floor:
    # every step IEEE-identical to DuckDB's
    # floor(scale * ln(num/den)) on the same integers
    return math.floor(scale * math.log((num * 1.0) / den))


def train_nb(ds, text_col: str, label_col: str, vocab_size: int = 2000,
             scale: int = 1_000_000) -> dict:
    """Train on ``ds`` (pre-filtered to the training split).  Returns a
    plain-dict model: sorted class list, int64 priors, V×C int64 weight
    matrix, per-class OOV weight, token index."""
    from ray.data.aggregate import Count, Sum

    def partial_counts(b: pa.Table) -> pa.Table:
        flat, cnts = flat_tokens(b[text_col])
        labels = np.repeat(
            np.asarray(b[label_col].to_pylist(), dtype=object), cnts)
        g = (pd.DataFrame({"tok": flat, "cls": labels})
             .groupby(["tok", "cls"], sort=False).size().reset_index(name="n"))
        return pa.table({"tok": pa.array(g["tok"], pa.string()),
                         "cls": pa.array(g["cls"], pa.string()),
                         "n": pa.array(g["n"].to_numpy(), pa.int64())})

    counts = (ds.select_columns([text_col, label_col])
                .map_batches(partial_counts, batch_format="pyarrow")
                .groupby(["tok", "cls"])
                .aggregate(Sum("n", alias_name="n"))).materialize()

    totals = counts.groupby("tok").aggregate(Sum("n", alias_name="nt"))

    def block_topk(t: pa.Table) -> pa.Table:
        if len(t) <= vocab_size:
            return t
        idx = pc.sort_indices(t, sort_keys=[("nt", "descending"),
                                            ("tok", "ascending")])
        return t.take(idx[:vocab_size])

    vocab = (totals.map_batches(block_topk, batch_format="pyarrow")
                   .sort(["nt", "tok"], descending=[True, False])
                   .limit(vocab_size).to_pandas())
    vtoks = sorted(vocab["tok"].tolist())
    V = len(vtoks)

    # counts restricted to the kept vocabulary: ≤ V×C rows — the ONLY
    # corpus-derived table that reaches the driver, bounded by config
    kept = counts.map_batches(
        lambda t: t.filter(pc.is_in(t["tok"], value_set=pa.array(vtoks))),
        batch_format="pyarrow").take_all()

    prior_rows = ds.groupby(label_col).aggregate(
        Count(alias_name="n_docs")).take_all()
    classes = sorted(r[label_col] for r in prior_rows)
    C = len(classes)
    cls_idx = {c: i for i, c in enumerate(classes)}
    n_docs_c = np.zeros(C, np.int64)
    for r in prior_rows:
        n_docs_c[cls_idx[r[label_col]]] = r["n_docs"]
    n_train = int(n_docs_c.sum())

    tok_idx = {t: i for i, t in enumerate(vtoks)}
    cnt = np.zeros((V, C), np.int64)
    for r in kept:
        cnt[tok_idx[r["tok"]], cls_idx[r["cls"]]] = r["n"]
    tot_c = cnt.sum(axis=0)

    W = np.empty((V, C), np.int64)
    oov = np.empty(C, np.int64)
    priors = np.empty(C, np.int64)
    for j in range(C):
        den = int(tot_c[j]) + V
        for i in range(V):
            W[i, j] = _int_log_weight(int(cnt[i, j]) + 1, den, scale)
        oov[j] = _int_log_weight(1, den, scale)
        priors[j] = _int_log_weight(int(n_docs_c[j]), n_train, scale)
    return {"classes": classes, "priors": priors, "W": W, "oov": oov,
            "tokens": vtoks}


def score_nb(ds, model: dict, id_cols: list[str],
             text_col: str = "text",
             pred_col: str = "pred", score_col: str = "nb_score"):
    """Score every document: broadcast the model once, vectorized
    tokenize + segment-sum + argmax per batch.  Output:
    ``id_cols..., pred, nb_score`` (int64 score of the argmax class)."""
    import ray

    ref = ray.put((model["tokens"], model["W"], model["oov"],
                   model["priors"], model["classes"]))

    def score(b: pa.Table) -> pa.Table:
        toks, W, oovw, priors, classes = ray.get(ref)
        index = pd.Index(toks)
        flat, cnts = flat_tokens(b[text_col])
        idx = index.get_indexer(flat) if len(flat) else np.empty(0, np.int64)
        M = np.where((idx >= 0)[:, None], W[np.clip(idx, 0, None)],
                     oovw[None, :]) if len(flat) else np.empty((0, len(oovw)),
                                                               np.int64)
        cs = np.vstack([np.zeros((1, len(oovw)), np.int64),
                        np.cumsum(M, axis=0)])
        ends = np.cumsum(cnts)
        starts = ends - cnts
        doc_scores = cs[ends] - cs[starts] + priors[None, :]
        best = np.argmax(doc_scores, axis=1)
        cols = {c: b[c] for c in id_cols}
        cols[pred_col] = pa.array([classes[j] for j in best], pa.string())
        cols[score_col] = pa.array(
            doc_scores[np.arange(len(best)), best], pa.int64())
        return pa.table(cols)

    return ds.select_columns(list(dict.fromkeys(id_cols + [text_col]))) \
             .map_batches(score, batch_format="pyarrow")
