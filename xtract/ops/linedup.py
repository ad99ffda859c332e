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
