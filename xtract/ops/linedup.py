"""Corpus-level boilerplate line removal + paragraph dedup
(RefinedWeb/CCNet-style public techniques): lines of extracted content
that repeat across many documents (cookie banners, share bars) are
boilerplate the per-document classifier cannot see; duplicated
paragraphs keep exactly one corpus-wide copy.

Both ops are adaptive by EXACT count (the ``DRIVER_CC_LIMIT`` pattern
from ``ops/dedup.py``): the hot-line set / duplicated-paragraph owner
table is counted Dataset-side first —

- **small** (≤ ``BROADCAST_LIMIT`` rows, the common case at bench
  scale): broadcast via ``ray.put`` and filter inside ``map_batches``
  (no shuffle at all);
- **large** (a real crawl, where duplicated paragraphs / boilerplate
  lines are corpus-proportional): a fully-Dataset **double co-group**:
  (1) documents explode to slim ``(hash, key, line_idx)`` rows which
  co-group with the hot/owner rows per hash partition → per-document
  drop indices; (2) the drop indices co-group with the document rows
  per key partition → one vectorized rewrite pass.  Nothing of
  corpus-proportional size ever lands on the driver; the only exchange
  of document text is the single key-partition pass of stage 2.

Both paths produce byte-identical output (tested).  Deterministic:
hashing is blake2b, thresholds are integers.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: hot-set / owner-table row ceiling for the broadcast path; above it
#: the co-group path runs entirely in Datasets.  ~100 B/row → a few
#: hundred MB at most on the driver, and the gate is an exact count.
BROADCAST_LIMIT = 2_000_000


def _line_hash(line: str) -> bytes:
    return hashlib.blake2b(line.strip().lower().encode("utf-8"),
                           digest_size=8).digest()


def _line_counts_batch(batch: pa.Table, col: str) -> pa.Table:
    counts: dict[bytes, int] = {}
    for t in batch[col].to_pylist():
        seen = set()
        for line in (t or "").split("\n"):
            s = line.strip()
            if len(s) < 8:  # short lines are too generic to count
                continue
            h = _line_hash(s)
            if h not in seen:  # count documents, not occurrences
                seen.add(h)
                counts[h] = counts.get(h, 0) + 1
    return pa.table({
        "line_hash": pa.array([h.hex() for h in counts], pa.string()),
        "n_docs": pa.array(list(counts.values()), pa.int64()),
    })


def build_line_counts(ds, col: str = "content_text"):
    """→ Dataset(line_hash, n_docs): document frequency per distinct
    content line (combiner + groupby sum)."""
    from ray.data.aggregate import Sum

    partials = ds.select_columns([col]).map_batches(
        lambda b: _line_counts_batch(b, col), batch_format="pyarrow")
    return partials.groupby("line_hash").aggregate(
        Sum("n_docs", alias_name="n_docs"))


def _pa_type(t) -> pa.DataType:
    """Normalize ``Dataset.schema().types`` entries to Arrow types —
    pandas-block datasets report object-dtype (string) columns as the
    Python ``object`` class, not a ``pa.DataType``."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()


def _resolve_key(ds, key):
    if key is not None:
        return key
    names = ds.schema().names
    for cand in ("url", "doc_id"):
        if cand in names:
            return cand
    raise ValueError("co-group scrub needs a key column (url/doc_id)")


# ---------------------------------------------------------------------------
# co-group machinery shared by line scrub + paragraph dedup
# ---------------------------------------------------------------------------

def _flag_cogroup(explode_ds, flags_ds, hash_col: str, key_col: str,
                  owner_col: "str | None", num_partitions: int):
    """(hash, key, idx) explode rows × (hash[, owner]) flag rows →
    Dataset(key, _drop_idx): the per-document drop list, resolved per
    hash partition (one slim exchange, O(P) Python calls).  With
    ``owner_col``, a match drops only when owner != key."""
    from .agg import _hash_part

    esch = explode_ds.schema()
    etypes = dict(zip(esch.names, esch.types))
    key_t = _pa_type(etypes[key_col])
    hash_t = _pa_type(etypes[hash_col])

    def tag_explode(b: pa.Table) -> pa.Table:
        part = _hash_part(b[hash_col], num_partitions)
        cols = {"_part": pa.array(part, pa.int64()),
                "_flag": pa.array(np.zeros(len(b), np.int8)),
                "h": b[hash_col], "k": b[key_col], "idx": b["idx"]}
        cols["owner"] = (b[owner_col] if owner_col and owner_col in
                         b.column_names else pa.nulls(len(b), key_t))
        return pa.table(cols)

    def tag_flags(b: pa.Table) -> pa.Table:
        part = _hash_part(b[hash_col], num_partitions)
        n = len(b)
        return pa.table({
            "_part": pa.array(part, pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)),
            "h": pc.cast(b[hash_col], hash_t),
            "k": pa.nulls(n, key_t),
            "idx": pa.nulls(n, pa.int64()),
            "owner": (pc.cast(b[owner_col], key_t) if owner_col
                      else pa.nulls(n, key_t)),
        })

    both = explode_ds.map_batches(tag_explode, batch_format="pyarrow").union(
        flags_ds.map_batches(tag_flags, batch_format="pyarrow"))

    def resolve(t: pa.Table) -> pa.Table:
        # split Arrow-side: each side's own columns are null-free, so
        # int64 keys survive the pandas conversion exactly
        fl = t.filter(pc.equal(t["_flag"], 1))
        ex = t.filter(pc.equal(t["_flag"], 0))
        if len(fl) == 0 or len(ex) == 0:
            return pa.table({key_col: pa.array([], key_t),
                             "_drop_idx": pa.array([], pa.int64())})
        edf = pd.DataFrame({"h": ex["h"].to_pandas(),
                            "k": ex["k"].to_pandas(),
                            "idx": ex["idx"].to_pandas()})
        fcols = {"h": fl["h"].to_pandas()}
        if owner_col:
            fcols["owner"] = fl["owner"].to_pandas()
        m = edf.merge(pd.DataFrame(fcols), on="h", how="inner")
        if owner_col:
            m = m[m["owner"] != m["k"]]
        return pa.table({key_col: pa.array(m["k"]).cast(key_t),
                         "_drop_idx": pa.array(m["idx"].to_numpy(np.int64),
                                               pa.int64())})

    return both.groupby("_part").map_groups(resolve, batch_format="pyarrow")


def _apply_index_drops(ds, drops_ds, key_col: str, col: str,
                       dropped_col: str, num_partitions: int):
    """Co-group the (key, _drop_idx) list with the document rows per
    key partition and rewrite ``col`` by dropping those line indices.
    All original columns survive; ``dropped_col`` is appended.  This is
    the single pass where document text crosses a shuffle."""
    from .agg import _hash_part

    sch = ds.schema()
    names = list(sch.names)
    types = {n: _pa_type(t) for n, t in zip(sch.names, sch.types)}

    def tag_doc(b: pa.Table) -> pa.Table:
        cols = {"_part": pa.array(_hash_part(b[key_col], num_partitions),
                                  pa.int64()),
                "_isdrop": pa.array(np.zeros(len(b), np.int8)),
                "_drop_idx": pa.nulls(len(b), pa.int64())}
        for c in names:
            cols[c] = b[c]
        return pa.table(cols)

    def tag_drop(b: pa.Table) -> pa.Table:
        n = len(b)
        cols = {"_part": pa.array(_hash_part(b[key_col], num_partitions),
                                  pa.int64()),
                "_isdrop": pa.array(np.ones(n, np.int8)),
                "_drop_idx": b["_drop_idx"]}
        for c in names:
            cols[c] = b[key_col] if c == key_col else pa.nulls(n, types[c])
        return pa.table(cols)

    both = ds.map_batches(tag_doc, batch_format="pyarrow").union(
        drops_ds.map_batches(tag_drop, batch_format="pyarrow"))

    def rebuild(t: pa.Table) -> pa.Table:
        docs = t.filter(pc.equal(t["_isdrop"], 0))
        drops = t.filter(pc.equal(t["_isdrop"], 1))
        by_key: dict = {}
        if len(drops):
            ddf = pd.DataFrame({
                "k": drops[key_col].to_pandas(),
                "i": drops["_drop_idx"].to_pandas().astype(np.int64)})
            by_key = {k: set(g.tolist())
                      for k, g in ddf.groupby("k", sort=False)["i"]}
        keys = docs[key_col].to_pylist()
        texts = docs[col].to_pylist()
        out, n_dropped = [], np.zeros(len(keys), np.int64)
        for j, (k, txt) in enumerate(zip(keys, texts)):
            idxs = by_key.get(k)
            if not idxs:
                out.append(txt)
                continue
            lines = (txt or "").split("\n")
            kept = [l for i, l in enumerate(lines) if i not in idxs]
            n_dropped[j] = len(lines) - len(kept)
            out.append("\n".join(kept))
        res = {c: docs[c] for c in names}
        res[col] = pa.array(out, pa.string())
        res[dropped_col] = pa.array(n_dropped, pa.int64())
        return pa.table(res)

    return both.groupby("_part").map_groups(rebuild, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus-level repeated-line removal
# ---------------------------------------------------------------------------

def drop_repeated_lines(ds, max_docs: int = 5, col: str = "content_text",
                        line_counts=None, key: "str | None" = None,
                        broadcast_limit: int = BROADCAST_LIMIT,
                        num_partitions: int = 64):
    """Remove lines that appear in more than ``max_docs`` documents.
    Adds ``n_lines_dropped``; rewrites ``col`` in place.

    Adaptive by exact hot-set count: broadcast when small, double
    co-group when corpus-proportional (see module docstring).  Both
    paths byte-identical."""
    import ray

    counts = line_counts if line_counts is not None else build_line_counts(ds, col)
    hot_ds = counts.map_batches(
        lambda b: b.filter(pc.greater(b["n_docs"], max_docs)),
        batch_format="pyarrow").select_columns(["line_hash"]).materialize()
    if hot_ds.count() <= broadcast_limit:
        hot_set = frozenset(r["line_hash"] for r in hot_ds.take_all())
        hot_ref = ray.put(hot_set)

        def scrub(b: pa.Table) -> pa.Table:
            hs = ray.get(hot_ref)
            texts = b[col].to_pylist()
            out, dropped = [], []
            for t in texts:
                kept_lines = []
                d = 0
                for line in (t or "").split("\n"):
                    s = line.strip()
                    if len(s) >= 8 and _line_hash(s).hex() in hs:
                        d += 1
                    else:
                        kept_lines.append(line)
                out.append("\n".join(kept_lines))
                dropped.append(d)
            i = b.column_names.index(col)
            return (b.set_column(i, col, pa.array(out, pa.string()))
                    .append_column("n_lines_dropped",
                                   pa.array(dropped, pa.int64())))

        return ds.map_batches(scrub, batch_format="pyarrow")

    # --- co-group scale path: hot set too big to broadcast ---
    key = _resolve_key(ds, key)

    def explode(b: pa.Table) -> pa.Table:
        hs, ks, idxs = [], [], []
        for k, t in zip(b[key].to_pylist(), b[col].to_pylist()):
            for i, line in enumerate((t or "").split("\n")):
                s = line.strip()
                if len(s) >= 8:
                    hs.append(_line_hash(s).hex())
                    ks.append(k)
                    idxs.append(i)
        return pa.table({"line_hash": pa.array(hs, pa.string()),
                         key: pa.array(ks, b[key].type),
                         "idx": pa.array(idxs, pa.int64())})

    explode_ds = ds.select_columns([key, col]).map_batches(
        explode, batch_format="pyarrow")
    drops = _flag_cogroup(explode_ds, hot_ds, "line_hash", key,
                          owner_col=None, num_partitions=num_partitions)
    return _apply_index_drops(ds, drops, key, col, "n_lines_dropped",
                              num_partitions)


# ---------------------------------------------------------------------------
# paragraph-granularity cross-document dedup
# ---------------------------------------------------------------------------

def _phash(p: str) -> int:
    return int.from_bytes(hashlib.blake2b(
        p.encode("utf-8"), digest_size=8).digest(), "big", signed=False) >> 1


def dedup_paragraphs(ds, key: str = "doc_id", col: str = "text",
                     min_chars: int = 20,
                     broadcast_limit: int = BROADCAST_LIMIT,
                     num_partitions: int = 64):
    """Remove duplicate PARAGRAPHS across documents, keeping exactly one
    copy corpus-wide (in the owner = min ``key`` containing it) — the
    RefinedWeb-style paragraph dedup, complementary to
    ``drop_repeated_lines`` (which drops >max_docs boilerplate lines
    everywhere).

    Shape: per-document paragraph hashes (within-doc deduped by the
    combiner) → native ``groupby(hash).aggregate(Min(key), Count)`` →
    only DUPLICATED paragraphs (count > 1) matter downstream.  Their
    exact count gates the path: ≤ ``broadcast_limit`` broadcasts the
    (hash → owner) map; above it (crawl scale, where duplicated
    paragraphs are corpus-proportional) the double co-group resolves
    drop indices per hash partition and rewrites per key partition —
    no driver dict at all.  Deterministic under any partitioning.
    Adds ``n_paras_dropped``."""
    import ray
    from ray.data.aggregate import Count, Min

    def paras(t: str):
        for p in (t or "").split("\n"):
            s = p.strip()
            if len(s) >= min_chars:
                yield s

    def combine(b: pa.Table) -> pa.Table:
        hs, ks = [], []
        for k, t in zip(b[key].to_pylist(), b[col].to_pylist()):
            seen = set()
            for s in paras(t):
                h = _phash(s)
                if h not in seen:
                    seen.add(h)
                    hs.append(h)
                    ks.append(k)
        return pa.table({"phash": pa.array(hs, pa.int64()),
                         key: pa.array(ks, pa.int64())})

    owners = (ds.select_columns([key, col])
              .map_batches(combine, batch_format="pyarrow")
              .groupby("phash")
              .aggregate(Min(key, alias_name="owner"),
                         Count(alias_name="n_docs")))
    dup_ds = owners.map_batches(
        lambda t: t.filter(pc.greater(t["n_docs"], 1)),
        batch_format="pyarrow").select_columns(["phash", "owner"]).materialize()

    if dup_ds.count() <= broadcast_limit:
        owner_map = {int(r["phash"]): int(r["owner"])
                     for r in dup_ds.take_all()}
        ref = ray.put(owner_map)

        def rewrite(b: pa.Table) -> pa.Table:
            om = ray.get(ref)
            out, dropped = [], []
            for k, t in zip(b[key].to_pylist(), b[col].to_pylist()):
                kept = []
                d = 0
                for p in (t or "").split("\n"):
                    s = p.strip()
                    if len(s) >= min_chars:
                        o = om.get(_phash(s))
                        if o is not None and o != k:
                            d += 1
                            continue
                    kept.append(p)
                out.append("\n".join(kept))
                dropped.append(d)
            i = b.column_names.index(col)
            return (b.set_column(i, col, pa.array(out, pa.string()))
                    .append_column("n_paras_dropped",
                                   pa.array(np.asarray(dropped, np.int64))))

        return ds.map_batches(rewrite, batch_format="pyarrow")

    # --- co-group scale path: owner map too big to broadcast ---
    def explode(b: pa.Table) -> pa.Table:
        hs, ks, idxs = [], [], []
        for k, t in zip(b[key].to_pylist(), b[col].to_pylist()):
            for i, p in enumerate((t or "").split("\n")):
                s = p.strip()
                if len(s) >= min_chars:
                    hs.append(_phash(s))
                    ks.append(k)
                    idxs.append(i)
        return pa.table({"phash": pa.array(hs, pa.int64()),
                         key: pa.array(ks, pa.int64()),
                         "idx": pa.array(idxs, pa.int64())})

    explode_ds = ds.select_columns([key, col]).map_batches(
        explode, batch_format="pyarrow")
    drops = _flag_cogroup(explode_ds, dup_ds, "phash", key,
                          owner_col="owner", num_partitions=num_partitions)
    return _apply_index_drops(ds, drops, key, col, "n_paras_dropped",
                              num_partitions)
