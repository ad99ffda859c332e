"""Corpus-level boilerplate line removal (RefinedWeb/CCNet-style public
technique): lines of extracted content that repeat across many
documents (cookie banners, share bars) are boilerplate the per-document
classifier cannot see.

Two stages, both shuffle-light:

1. ``build_line_counts``: per-batch combiner emits (line_hash, count)
   partials → ``groupby(line_hash)`` sums — the shuffle moves one row
   per distinct line per batch, never document text.
2. ``drop_repeated_lines``: the hot-line set (lines appearing in >
   ``max_docs`` documents — a tiny fraction of distinct lines) is
   broadcast via ``ray.put`` and filtered out inside ``map_batches``.

Deterministic: hashing is blake2b, thresholds are integers.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


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


def drop_repeated_lines(ds, max_docs: int = 5, col: str = "content_text",
                        line_counts=None):
    """Remove lines that appear in more than ``max_docs`` documents.
    Adds ``n_lines_dropped``; rewrites ``col`` in place."""
    import ray

    counts = line_counts if line_counts is not None else build_line_counts(ds, col)
    hot = counts.map_batches(
        lambda b: b.filter(pa.compute.greater(b["n_docs"], max_docs)),
        batch_format="pyarrow").select_columns(["line_hash"]).take_all()
    hot_set = frozenset(r["line_hash"] for r in hot)
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
                .append_column("n_lines_dropped", pa.array(dropped, pa.int64())))

    return ds.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# paragraph-granularity cross-document dedup
# ---------------------------------------------------------------------------

def dedup_paragraphs(ds, key: str = "doc_id", col: str = "text",
                     min_chars: int = 20):
    """Remove duplicate PARAGRAPHS across documents, keeping exactly one
    copy corpus-wide (in the owner = min ``key`` containing it) — the
    RefinedWeb-style paragraph dedup, complementary to
    ``drop_repeated_lines`` (which drops >max_docs boilerplate lines
    everywhere).

    Shape: per-document paragraph hashes (within-doc deduped by the
    combiner) → native ``groupby(hash).aggregate(Min(key), Count)`` →
    only DUPLICATED paragraphs (count > 1; bounded by the duplication
    volume, not the corpus) are broadcast as an (hash → owner) map →
    one rewrite pass keeps a paragraph iff unduplicated or owned.
    Deterministic under any partitioning.  Adds ``n_paras_dropped``."""
    import hashlib

    import numpy as np
    import ray
    from ray.data.aggregate import Count, Min

    def phash(p: str) -> int:
        return int.from_bytes(hashlib.blake2b(
            p.encode("utf-8"), digest_size=8).digest(), "big", signed=False) >> 1

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
                h = phash(s)
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
    dup = owners.map_batches(
        lambda t: t.filter(pa.compute.greater(t["n_docs"], 1)),
        batch_format="pyarrow").select_columns(["phash", "owner"]).take_all()
    owner_map = {int(r["phash"]): int(r["owner"]) for r in dup}
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
                    o = om.get(phash(s))
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
