"""Sequence packing: documents → fixed-length token-id sequences.

The last mile of a training-data pipeline: tokenized documents are cut
into ``seq_len``-sized training sequences.  Document-level chunking
(each document's tokens are chunked independently, the final chunk
padded) — deterministic regardless of block layout or parallelism, and
embarrassingly parallel: one ``map_batches`` pass, no shuffle.  The
vocabulary rides the object store (``ray.put`` once, read per task —
the A2 broadcast pattern).

Cross-document packing (filling the tail of one doc with the head of
the next) needs a global order and is a different trade; at cluster
scale it is done per-partition after a ``sort``/``repartition`` — this
module documents that choice and implements the order-independent form.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .vocab import sql_tokens

PAD_ID = -1


def pack_documents(ds, vocab: pa.Table, seq_len: int = 128,
                   key: str = "doc_id", col: str = "text"):
    """→ Dataset(doc_id, seq_index, token_ids: fixed list<int64>[seq_len],
    n_tokens, n_pad): each document's in-vocabulary tokens (same
    tokenizer + OOV-drop rule as ``vocab.encode_tokens``) chunked into
    fixed-length sequences; the final chunk is padded with ``PAD_ID``.
    Documents with zero in-vocab tokens emit no rows."""
    import ray

    lookup_ref = ray.put(dict(zip(vocab["token"].to_pylist(),
                                  vocab["token_id"].to_pylist())))

    def pack(b: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        out_key: list[int] = []
        out_seq: list[int] = []
        out_ntok: list[int] = []
        out_pad: list[int] = []
        flat_ids: list[int] = []
        for k, t in zip(b[key].to_pylist(), b[col].to_pylist()):
            ids = [lk[x] for x in sql_tokens(t) if x in lk]
            for si in range(0, len(ids), seq_len):
                chunk = ids[si:si + seq_len]
                pad = seq_len - len(chunk)
                flat_ids.extend(chunk)
                flat_ids.extend([PAD_ID] * pad)
                out_key.append(k)
                out_seq.append(si // seq_len)
                out_ntok.append(len(chunk))
                out_pad.append(pad)
        return pa.table({
            key: pa.array(out_key, pa.int64()),
            "seq_index": pa.array(out_seq, pa.int64()),
            "token_ids": pa.FixedSizeListArray.from_arrays(
                pa.array(np.asarray(flat_ids, np.int64), pa.int64()), seq_len),
            "n_tokens": pa.array(out_ntok, pa.int64()),
            "n_pad": pa.array(out_pad, pa.int64()),
        })

    return ds.select_columns([key, col]).map_batches(
        pack, batch_format="pyarrow")


def packing_stats(ds, vocab: pa.Table, seq_len: int = 128,
                  key: str = "doc_id", col: str = "text"):
    """→ Dataset(doc_id, n_sequences, n_tokens_kept, n_pad): per-document
    packing summary — integer columns only, exactly reproducible in SQL
    (ceil-division over the in-vocab token count)."""
    from ray.data.aggregate import Count, Sum

    packed = pack_documents(ds, vocab, seq_len, key, col)
    out = packed.groupby(key).aggregate(
        Count(alias_name="n_sequences"),
        Sum("n_tokens", alias_name="n_tokens_kept"),
        Sum("n_pad", alias_name="n_pad"))
    return out


_CHUNK_TOKEN_RE = None  # compiled lazily; shared with the SQL oracle


def chunk_documents(ds, size: int = 32, stride: int = 24,
                    key: str = "doc_id", col: str = "text"):
    """RAG/embedding prep: slide a ``size``-token window with
    ``stride`` over each document's normalized token stream and emit
    → (key, chunk_idx, chunk_text, n_tokens) — one row per chunk,
    chunk_text = space-joined tokens (the normalized form an embedder
    sees).  A chunk is emitted while ``chunk_idx·stride < n_tokens``,
    so trailing windows shrink but every token is covered.

    Tokenization is the repo's SQL-replicable ``[a-z0-9_]+`` on lower
    (same as BM25/TF-IDF), so the DuckDB oracle rebuilds every chunk
    with ``list_slice`` + ``array_to_string``.  Streaming flat explode
    — no shuffle; chunk rows are slim and downstream embedding stages
    batch them freely."""
    import re

    global _CHUNK_TOKEN_RE
    if _CHUNK_TOKEN_RE is None:
        _CHUNK_TOKEN_RE = re.compile(r"[a-z0-9_]+")

    def explode(b: pa.Table) -> pa.Table:
        ids, cidx, texts, ntok = [], [], [], []
        for d, t in zip(b[key].to_pylist(), b[col].to_pylist()):
            ws = _CHUNK_TOKEN_RE.findall((t or "").lower())
            n = len(ws)
            c = 0
            while c * stride < n:
                sl = ws[c * stride: c * stride + size]
                ids.append(d)
                cidx.append(c)
                texts.append(" ".join(sl))
                ntok.append(len(sl))
                c += 1
        return pa.table({key: pa.array(ids, pa.int64()),
                         "chunk_idx": pa.array(cidx, pa.int64()),
                         "chunk_text": pa.array(texts, pa.string()),
                         "n_tokens": pa.array(ntok, pa.int64())})

    return ds.select_columns([key, col]).map_batches(
        explode, batch_format="pyarrow")
