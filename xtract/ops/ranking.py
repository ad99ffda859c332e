"""BM25 full-text ranking, Ray-Data-first (SURVEY §2 extension: the
text-retrieval analogue of the ANN tier in ``similarity.py``).

Two surfaces with identical results:

- :func:`bm25_score` — direct streaming ranking: ONE tokenize pass
  emits a slim per-doc projection (doc_id, dl, tf-vector over the
  query's terms only); corpus stats (N, Σdl, per-term df) come from
  bounded per-block partial rows; scoring + per-block partial top-k
  keep everything vectorized and only k rows per block leave a task.
- :func:`build_text_index` / :func:`bm25_search_index` — a PERSISTED
  inverted index: postings (term, doc_id, tf) hash-partitioned into
  ``bucket=NN`` parquet directories; a search reads ONLY its query
  terms' buckets (storage-level pruning — the text twin of the
  cell-partitioned IVF index, ``similarity.py`` ``knn_ivf_index``).

Determinism contract: both paths accumulate each document's per-term
score contributions SEQUENTIALLY in query-term order (an explicit
column loop here, a ``np.add.reduceat`` over (doc, term-index)-sorted
postings there), so the two surfaces return bit-identical floats and
tests can assert equality, not closeness.

100-TB notes: the slim projection is corpus-cardinality but ~3 ints
wide (object-store friendly, spills); stats partials are one row per
block; the posting explode never holds more than a batch; the index
search's candidate set is Σ df(query terms) — pruned at storage level
before any compute; the per-doc reassembly uses the repo's coarse
``_part`` co-group pattern (P interpreter calls, not one per doc).
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _md5_u64, _mix64

#: ASCII word tokens — kept SQL-replicable:
#: ``regexp_extract_all(lower(text), '[a-z0-9_]+')``
_TOKEN_RE = re.compile(r"[a-z0-9_]+")


def query_terms(query: str) -> list[str]:
    """Unique query terms, first-occurrence order (the tf-vector and
    scoring order — part of the determinism contract)."""
    seen: dict[str, None] = {}
    for w in _TOKEN_RE.findall(query.lower()):
        seen.setdefault(w)
    return list(seen)


def _batch_tf(texts: list, qindex: dict) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch (dl, tf-matrix) for the query's terms only."""
    n, m = len(texts), len(qindex)
    dl = np.zeros(n, np.int64)
    tf = np.zeros((n, m), np.int64)
    for i, t in enumerate(texts):
        ws = _TOKEN_RE.findall((t or "").lower())
        dl[i] = len(ws)
        for w in ws:
            j = qindex.get(w)
            if j is not None:
                tf[i, j] += 1
    return dl, tf


def _idf(n_docs: int, df: np.ndarray) -> np.ndarray:
    """Robertson–Sparck-Jones idf with the +1 smoothing (Lucene/BM25+
    form — never negative): ln(1 + (N − df + 0.5)/(df + 0.5))."""
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def _scores_seq(tf: np.ndarray, dl: np.ndarray, idf: np.ndarray,
                avgdl: float, k1: float, b: float) -> np.ndarray:
    """Sequential-in-term-order accumulation (NOT np.sum — see module
    docstring's determinism contract)."""
    norm = k1 * (1.0 - b + b * (dl.astype(np.float64) / avgdl))
    s = np.zeros(len(dl), np.float64)
    for j in range(tf.shape[1]):
        tfj = tf[:, j].astype(np.float64)
        s += idf[j] * (tfj * (k1 + 1.0)) / (tfj + norm)
    return s


def _finalize_topk(cands, k: int, key: str):
    """Bounded candidate rows (≤ k per block) → global (rank, …) table."""
    top = (cands.sort(["score", key], descending=[True, False])
           .limit(k).to_pandas())
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return pa.Table.from_pandas(top, preserve_index=False)


def bm25_score(ds, query: str, key: str = "doc_id", col: str = "text",
               k1: float = 1.2, b: float = 0.75, k: int = 20):
    """→ pa.Table(rank, doc_id, score, tf_total, dl): top-k documents
    by BM25 for ``query``.  Docs containing none of the query's terms
    are not candidates.  Ties break by ascending ``key``."""
    qterms = query_terms(query)
    if not qterms:
        raise ValueError("query has no tokens")
    qindex = {w: j for j, w in enumerate(qterms)}
    m = len(qterms)

    def slim(batch: pa.Table) -> pa.Table:
        dl, tf = _batch_tf(batch[col].to_pylist(), qindex)
        return pa.table({
            key: batch[key],
            "dl": pa.array(dl),
            "tf": pa.FixedSizeListArray.from_arrays(
                pa.array(tf.ravel(), pa.int64()), m),
        })

    slim_ds = ds.select_columns([key, col]).map_batches(
        slim, batch_format="pyarrow").materialize()

    def partials(t: pa.Table) -> pa.Table:
        tf = np.asarray(t["tf"].combine_chunks().flatten()).reshape(-1, m)
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "sum_dl": pa.array([int(pc.sum(t["dl"]).as_py() or 0)],
                               pa.int64()),
            "df": pa.array([(tf > 0).sum(axis=0).tolist()],
                           pa.list_(pa.int64(), m)),
        })

    # one bounded row per block reaches the driver
    parts = slim_ds.map_batches(partials, batch_format="pyarrow").take_all()
    n_docs = sum(p["n"] for p in parts)
    if n_docs == 0:
        raise ValueError("empty corpus")
    sum_dl = sum(p["sum_dl"] for p in parts)
    df = np.sum([p["df"] for p in parts], axis=0).astype(np.int64)
    avgdl = sum_dl / n_docs if sum_dl else 1.0
    idf = _idf(n_docs, df)

    def score_topk(t: pa.Table) -> pa.Table:
        tf = np.asarray(t["tf"].combine_chunks().flatten()).reshape(-1, m)
        dl = t["dl"].to_numpy(zero_copy_only=False)
        ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        tf_total = tf.sum(axis=1)
        hit = np.flatnonzero(tf_total > 0)
        s = _scores_seq(tf[hit], dl[hit], idf, avgdl, k1, b)
        order = np.lexsort((ids[hit], -s))[:k]
        sel = hit[order]
        return pa.table({
            key: pa.array(ids[sel], pa.int64()),
            "score": pa.array(s[order], pa.float64()),
            "tf_total": pa.array(tf_total[sel], pa.int64()),
            "dl": pa.array(dl[sel], pa.int64()),
        })

    cands = slim_ds.map_batches(score_topk, batch_format="pyarrow")
    return _finalize_topk(cands, k, key)


# ---------------------------------------------------------------- index

def _term_bucket(terms: list[str], num_buckets: int) -> np.ndarray:
    h = np.array([_md5_u64(w) for w in terms], np.uint64)
    return (_mix64(h) % np.uint64(num_buckets)).astype(np.int64)


def build_text_index(ds, out_dir: str, key: str = "doc_id",
                     col: str = "text", num_buckets: int = 32) -> dict:
    """Persist an inverted index under ``out_dir``:

    - ``postings/bucket=NN/``: (term, doc_id, tf) rows, partitioned by
      ``splitmix64(md5(term)) % num_buckets`` — a search touches only
      its terms' buckets.
    - ``doclens/``: (doc_id, dl) — the per-doc normalization input.
    - ``meta.json``: corpus stats (n_docs, sum_dl, num_buckets).
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def explode_postings(batch: pa.Table) -> pa.Table:
        ids = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        out_t: list[str] = []
        out_id: list[int] = []
        out_tf: list[int] = []
        out_dl: list[int] = []
        for i, t in enumerate(batch[col].to_pylist()):
            ws = _TOKEN_RE.findall((t or "").lower())
            counts: dict[str, int] = {}
            for w in ws:
                counts[w] = counts.get(w, 0) + 1
            if not counts:
                # sentinel keeps token-less docs in the corpus stats
                # ("" can never be produced by the tokenizer, so no
                # query ever matches it)
                counts[""] = 0
            out_t.extend(counts.keys())
            out_id.extend([int(ids[i])] * len(counts))
            out_tf.extend(counts.values())
            out_dl.extend([len(ws)] * len(counts))
        buckets = (_term_bucket(out_t, num_buckets) if out_t
                   else np.empty(0, np.int64))
        # dl rides on each posting row: a search needs no doc-length
        # join at all, and doclens/meta derive from the same one pass
        return pa.table({
            "bucket": pa.array(buckets, pa.int64()),
            "term": pa.array(out_t, pa.string()),
            key: pa.array(out_id, pa.int64()),
            "tf": pa.array(out_tf, pa.int64()),
            "dl": pa.array(out_dl, pa.int64()),
        })

    src = ds.select_columns([key, col])
    src.map_batches(explode_postings, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "postings"), partition_cols=["bucket"])

    # per-doc lengths via a native Max aggregate (dl repeats on every
    # posting row of a doc) — no per-group Python
    dl_ds = (rd.read_parquet(os.path.join(out_dir, "postings"),
                             columns=[key, "dl"])
             .groupby(key).max("dl"))
    dl_ds.map_batches(
        lambda t: t.rename_columns([key, "dl"]),
        batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "doclens"))
    stats = rd.read_parquet(os.path.join(out_dir, "doclens")).aggregate(
        Count(), Sum("dl"))
    meta = {"n_docs": int(stats["count()"]),
            "sum_dl": int(stats["sum(dl)"]),
            "num_buckets": num_buckets, "key": key}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def bm25_search_index(out_dir: str, query: str, k1: float = 1.2,
                      b: float = 0.75, k: int = 20, num_partitions: int = 16):
    """Search the persisted index: reads ONLY the query terms' bucket
    directories, joins doc lengths Dataset-side, reassembles per-doc
    scores with a coarse hash co-group, and returns the same table as
    :func:`bm25_score` (bit-identical — tested)."""
    import ray.data as rd

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    key = meta["key"]
    qterms = query_terms(query)
    if not qterms:
        raise ValueError("query has no tokens")
    qindex = {w: j for j, w in enumerate(qterms)}
    m = len(qterms)
    buckets = sorted({int(x) for x in _term_bucket(qterms,
                                                   meta["num_buckets"])})
    # pruned FILE list = the storage-level partition pruning (same
    # shape as knn_ivf_index's probed-cell read, similarity.py:120)
    files: list[str] = []
    for bk in buckets:
        files.extend(sorted(glob.glob(os.path.join(
            out_dir, "postings", f"bucket={bk}", "*.parquet"))))
    if not files:
        return pa.table({"rank": pa.array([], pa.int64()),
                         key: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64()),
                         "tf_total": pa.array([], pa.int64()),
                         "dl": pa.array([], pa.int64())})
    qarr = pa.array(qterms, pa.string())

    def prune(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["term"], value_set=qarr))
        qi = pa.array([qindex[w] for w in t["term"].to_pylist()], pa.int64())
        h = (t[key].to_numpy(zero_copy_only=False).astype(np.int64)
             % num_partitions)
        return (t.select([key, "tf", "dl"]).append_column("qi", qi)
                .append_column("_part", pa.array(np.abs(h), pa.int64())))

    cand = rd.read_parquet(files).map_batches(
        prune, batch_format="pyarrow").materialize()

    # per-term df: bounded per-block partials (m ints per block)
    def df_partial(t: pa.Table) -> pa.Table:
        qi = t["qi"].to_numpy(zero_copy_only=False)
        return pa.table({"df": pa.array(
            [np.bincount(qi, minlength=m).tolist()], pa.list_(pa.int64(), m))})

    df = np.sum([r["df"] for r in
                 cand.map_batches(df_partial, batch_format="pyarrow")
                 .take_all()] or [np.zeros(m, np.int64)], axis=0)
    n_docs = meta["n_docs"]
    avgdl = meta["sum_dl"] / n_docs if meta["sum_dl"] else 1.0
    idf = _idf(n_docs, np.asarray(df, np.int64))

    def score_partition(g: pa.Table, k1=k1, b=b) -> pa.Table:
        pids = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        pqi = g["qi"].to_numpy(zero_copy_only=False).astype(np.int64)
        ptf = g["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        pdl = g["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(pids) == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64()),
                             "tf_total": pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64())})
        # deterministic accumulation order: (doc, query-term index) —
        # the sequential reduceat then matches bm25_score's per-column
        # loop bit-for-bit
        order = np.lexsort((pqi, pids))
        pids, pqi, ptf, pdl = (pids[order], pqi[order], ptf[order],
                               pdl[order])
        norm = k1 * (1.0 - b + b * (pdl.astype(np.float64) / avgdl))
        tff = ptf.astype(np.float64)
        contrib = idf[pqi] * (tff * (k1 + 1.0)) / (tff + norm)
        starts = np.flatnonzero(np.r_[True, pids[1:] != pids[:-1]])
        s = np.add.reduceat(contrib, starts)
        tf_total = np.add.reduceat(ptf, starts)
        hit = np.lexsort((pids[starts], -s))[:k]
        sel = starts[hit]
        return pa.table({
            key: pa.array(pids[sel], pa.int64()),
            "score": pa.array(s[hit], pa.float64()),
            "tf_total": pa.array(tf_total[hit], pa.int64()),
            "dl": pa.array(pdl[sel], pa.int64()),
        })

    cands = cand.groupby("_part").map_groups(
        lambda g: score_partition(g.drop_columns(["_part"])),
        batch_format="pyarrow")
    return _finalize_topk(cands, k, key)


def tfidf_top_terms(ds, k: int = 3, key: str = "doc_id", col: str = "text",
                    num_partitions: int = 64):
    """Keyword extraction: each document's top-``k`` terms by integer
    TF-IDF — ``score_micro = tf · ⌊10⁶·ln((N+1)/(df+1))⌋`` (the repo's
    ln-micro quantization: DuckDB's libm ln is bit-exact vs numpy's,
    so the oracle reproduces scores exactly).  → (doc_id, rank, token,
    score_micro), rank 1-based under (score desc, token asc).

    Scale shape — TWO slim exchanges, no corpus-wide driver state:

    1. one tokenize pass emits distinct (doc, token, tf) rows;
    2. hash co-group by TOKEN: every posting of a token lands in one
       partition, so df = the group's size — df + idf + score computed
       there with no separate df table or join;
    3. hash co-group by DOC: vectorized rank mask keeps each doc's
       top-k.

    N (corpus row count) is the only driver scalar (metadata count).
    Tokenization is the BM25 one (``[a-z0-9_]+`` on lower) so the SQL
    oracle shares it."""
    import pandas as pd

    n_docs = ds.count()

    def postings(batch: pa.Table) -> pa.Table:
        ids, toks, tfs = [], [], []
        for d, t in zip(batch[key].to_pylist(), batch[col].to_pylist()):
            ws = _TOKEN_RE.findall((t or "").lower())
            if not ws:
                continue
            u, c = np.unique(np.asarray(ws, object), return_counts=True)
            ids.extend([d] * len(u))
            toks.extend(u.tolist())
            tfs.extend(c.tolist())
        t = pa.table({key: pa.array(ids, pa.int64()),
                      "token": pa.array(toks, pa.string()),
                      "tf": pa.array(tfs, pa.int64())})
        part = (pd.util.hash_array(np.asarray(toks, object))
                % num_partitions).astype(np.int64)
        return t.append_column("_part", pa.array(part, pa.int64()))

    def score_by_token(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("token", sort=False)["token"].transform("size") \
              .to_numpy().astype(np.int64)
        idf_micro = np.floor(
            1e6 * np.log((n_docs + 1.0) / (df + 1.0))).astype(np.int64)
        return pd.DataFrame({
            key: g[key].to_numpy(),
            "token": g["token"].to_numpy(),
            "score_micro": g["tf"].to_numpy() * idf_micro,
        })

    def repart_by_doc(t: pa.Table) -> pa.Table:
        ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "_part", pa.array(np.abs(ids) % num_partitions, pa.int64()))

    def topk_by_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "score_micro", "token"],
                          ascending=[True, False, True],
                          kind="mergesort").reset_index(drop=True)
        rank = g.groupby(key, sort=False).cumcount() + 1
        g = g.assign(rank=rank.astype(np.int64))
        g = g[g["rank"] <= k]
        return g[[key, "rank", "token", "score_micro"]]

    scored = (ds.select_columns([key, col])
                .map_batches(postings, batch_format="pyarrow")
                .groupby("_part")
                .map_groups(score_by_token, batch_format="pandas"))
    return (scored.map_batches(repart_by_doc, batch_format="pyarrow")
                  .groupby("_part")
                  .map_groups(topk_by_doc, batch_format="pandas"))


def phrase_search(ds, phrase: str, key: str = "doc_id",
                  col: str = "text"):
    """Exact-phrase (token-adjacency) search → Dataset(key, n_occ)
    for every document containing the phrase's tokens contiguously,
    with the NON-OVERLAPPING left-to-right occurrence count (the
    `str.count` / SQL `replace()` scan rule — ``"a a a"`` contains
    ``"a a"`` once, not twice; documented contract, SQL-replicable as
    ``(length(s) - length(replace(s, p, ''))) / length(p)``).

    Fully vectorized — zero per-row Python: lower + one regex
    normalize (non-token runs → single space) + element-wise pad +
    `count_substring`, all Arrow kernels over zero-copy batches.  The
    phrase-absent rows are filtered batch-side, so only matches leave
    each task.  Null text never matches.

    Reference parity anchor: the text-retrieval twin of
    `bm25_score` (tesseract-rs has no cross-document surface;
    src/api.rs:1003 `is_valid_word` is the closest single-token
    membership op — this is its n-token contiguous generalization).
    """
    toks = _TOKEN_RE.findall(phrase.lower())
    if not toks:
        raise ValueError("phrase_search: phrase has no tokens")
    pat = " " + " ".join(toks) + " "

    def count_batch(t: pa.Table) -> pa.Table:
        lo = pc.utf8_lower(pc.cast(t[col], pa.string()))
        norm = pc.replace_substring_regex(lo, "[^a-z0-9_]+", " ")
        pad = pc.binary_join_element_wise(" ", norm, " ", "")
        n = pc.fill_null(pc.count_substring(pad, pat), 0)
        keep = pc.greater(n, 0)
        return pa.table({key: t[key],
                         "n_occ": pc.cast(n, pa.int64())}).filter(keep)

    return ds.select_columns([key, col]).map_batches(
        count_batch, batch_format="pyarrow")


def rrf_fuse(lists, key: str = "doc_id", rank_col: str = "rank",
             k_const: int = 60, scale: int = 10 ** 12):
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009,
    public method) of N ranked candidate lists: score(d) =
    Σ_lists floor(scale / (k_const + rank_d)) — the float 1/(k+r)
    replaced by exact integer division so fusion is bit-identical at
    any parallelism and SQL-replayable.  Docs absent from a list
    contribute nothing; ``n_lists`` reports coverage.

    Scale shape: each input is a top-k retriever output (bounded by
    construction), so the whole fusion is one union + ONE slim
    grouped Sum/Count — no corpus-cardinality data moves.  → Dataset
    (key, rrf_score:int64, n_lists:int64)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def contrib(b: pa.Table) -> pa.Table:
        r = b[rank_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            key: b[key],
            "_c": pa.array(scale // (k_const + r), pa.int64())})

    tagged = None
    for ds in lists:
        part = ds.map_batches(contrib, batch_format="pyarrow")
        tagged = part if tagged is None else tagged.union(part)
    out = (tagged.groupby(key)
           .aggregate(Sum("_c", alias_name="rrf_score"),
                      Count(alias_name="n_lists")))
    return out.map_batches(
        lambda t: pa.table({
            key: t[key],
            "rrf_score": pc.cast(t["rrf_score"], pa.int64()),
            "n_lists": pc.cast(t["n_lists"], pa.int64())}),
        batch_format="pyarrow")
