"""Vocabulary ops: corpus vocabulary build, token-id decode, dictionary
membership (M14/M15 analogues: ``is_valid_word`` ``src/api.rs:1003-1010``,
``get_unichar`` id→glyph decode ``src/api.rs:1375-1387``).

Tokenization for the SQL-checkable vocabulary is exactly
``regexp_split_to_array(lower(text), '[^a-z]+')`` minus empties, so the
DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

import re

import pyarrow as pa

_SQL_TOKEN_RE = re.compile(r"[^a-z]+")


def sql_tokens(text: str) -> list[str]:
    return [t for t in _SQL_TOKEN_RE.split((text or "").lower()) if t]


def _token_counts_batch(batch: pa.Table, col: str) -> pa.Table:
    """Combiner: per-batch token counts (one row per distinct token per
    batch) — pre-aggregation before the corpus-wide groupby."""
    counts: dict[str, int] = {}
    for t in batch[col].to_pylist():
        for tok in sql_tokens(t):
            counts[tok] = counts.get(tok, 0) + 1
    return pa.table({"token": pa.array(list(counts.keys()), pa.string()),
                     "n": pa.array(list(counts.values()), pa.int64())})


def build_vocab(ds, col: str = "text", size: int = 1000):
    """→ pa.Table(token_id, token, n): top-``size`` tokens by count,
    deterministic tie-break by token; token_id = rank (0-based).

    Shape: per-batch combiner → groupby(token) sum (shuffles one row per
    distinct token per batch, never raw text) → per-block partial top-k
    → Dataset ``sort(n desc, token).limit(size)`` — only ``size`` rows
    ever reach the driver (a web corpus has billions of distinct junk
    tokens; the round-1 version pulled the whole distinct-token table
    into driver pandas)."""
    from ray.data.aggregate import Sum

    counts = ds.select_columns([col]).map_batches(
        lambda b: _token_counts_batch(b, col), batch_format="pyarrow")
    total = counts.groupby("token").aggregate(Sum("n", alias_name="n"))

    def block_topk(t: pa.Table) -> pa.Table:
        # partial top-k per block: the global top-size must be within
        # the union of per-block top-size sets (counts are complete
        # after the groupby)
        import pyarrow.compute as pc

        if len(t) <= size:
            return t
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                            ("token", "ascending")])
        return t.take(idx[:size])

    top = (total.map_batches(block_topk, batch_format="pyarrow")
                .sort(["n", "token"], descending=[True, False])
                .limit(size).to_pandas())
    return pa.table({
        "token_id": pa.array(range(len(top)), pa.int64()),
        "token": pa.array(top["token"], pa.string()),
        "n": pa.array(top["n"].astype("int64"), pa.int64()),
    })


def encode_tokens(ds, vocab: pa.Table, col: str = "text"):
    """Add ``token_ids: list<int64>`` (OOV dropped) — vocab broadcast
    once via ray.put (A2 pattern: state shipped through the object
    store, not re-serialized per task)."""
    import ray

    lookup_ref = ray.put(dict(zip(vocab["token"].to_pylist(),
                                  vocab["token_id"].to_pylist())))

    def enc(b: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        ids = [[lk[t] for t in sql_tokens(x) if t in lk]
               for x in b[col].to_pylist()]
        return b.append_column("token_ids", pa.array(ids, pa.list_(pa.int64())))

    return ds.map_batches(enc, batch_format="pyarrow")


def decode_ids(ids: list[int], vocab: pa.Table) -> list[str]:
    """token_id → token (get_unichar analogue); unknown id raises KeyError
    like the reference's invalid-id error path."""
    table = dict(zip(vocab["token_id"].to_pylist(), vocab["token"].to_pylist()))
    return [table[i] for i in ids]


def oov_rate(ds, vocab: pa.Table, key: str = "doc_id", col: str = "text"):
    """Per-document out-of-vocabulary rate against a broadcast vocab
    (is_valid_word over a corpus)."""
    import ray

    vocab_ref = ray.put(frozenset(vocab["token"].to_pylist()))

    def rate(b: pa.Table) -> pa.Table:
        vs = ray.get(vocab_ref)
        keys, rates, n_toks, n_oovs = [], [], [], []
        for k, t in zip(b[key].to_pylist(), b[col].to_pylist()):
            toks = sql_tokens(t)
            keys.append(k)
            n_toks.append(len(toks))
            oov = sum(1 for x in toks if x not in vs)
            n_oovs.append(oov)
            rates.append(oov / len(toks) if toks else 0.0)
        return pa.table({key: pa.array(keys), "n_tokens_az": pa.array(n_toks, pa.int64()),
                         "n_oov": pa.array(n_oovs, pa.int64()),
                         "oov_rate": pa.array(rates, pa.float64())})

    return ds.select_columns([key, col]).map_batches(rate, batch_format="pyarrow")
