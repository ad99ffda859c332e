"""PII detection + redaction over a text column (training-data hygiene,
public crawl practice: C4/RefinedWeb-style email/IP/phone scrubbing).

RE2-compatible pattern subset ONLY (no backrefs, no lookarounds), so the
DuckDB oracle applies the literally identical regexes with identical
leftmost-first semantics and the redacted text hash-matches bit-for-bit.

Replacement is sequential — emails first, then IPs, then phones — each
pattern running on the previous stage's output (mirrored by nested
``regexp_replace`` in the oracle).  Deterministic; compiled patterns are
module-level (warm per worker process).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: (column suffix, pattern source, replacement token) — pattern sources
#: are shared verbatim with the SQL oracle (one definition, two engines)
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\+\d[\d ()-]{7,}\d", "<PHONE>"),
)

_COMPILED = tuple((name, re.compile(src), repl) for name, src, repl in PII_RULES)


def redact_pii(text: str) -> tuple[str, dict[str, int]]:
    """→ (redacted_text, {rule: n_matches}).  Pure function."""
    counts: dict[str, int] = {}
    for name, rx, repl in _COMPILED:
        text, n = rx.subn(repl, text)
        counts[name] = n
    return text, counts


def redact_pii_batch(batch: pa.Table, key: str = "doc_id",
                     col: str = "text") -> pa.Table:
    """map_batches: rewrite ``col`` with PII tokens + per-rule counts."""
    texts = batch[col].to_pylist()
    n = len(texts)
    out_text: list[str] = []
    count_cols = {name: np.zeros(n, np.int64) for name, _, _ in PII_RULES}
    for i, t in enumerate(texts):
        red, counts = redact_pii(t or "")
        out_text.append(red)
        for name, c in counts.items():
            count_cols[name][i] = c
    res = batch.set_column(batch.column_names.index(col), col,
                           pa.array(out_text, pa.string()))
    for name, _, _ in PII_RULES:
        res = res.append_column(f"n_{name}", pa.array(count_cols[name]))
    return res


def redact_pii_ds(ds, key: str = "doc_id", col: str = "text"):
    """Dataset op: streaming PII redaction (no shuffle)."""
    return ds.map_batches(lambda b: redact_pii_batch(b, key, col),
                          batch_format="pyarrow")


def pseudonymize(ds, columns: "list[str]", salt: str = ""):
    """Replace identifier columns with salted SHA-256 hex digests —
    the GDPR-style pseudonymization pass a shared corpus ships with
    (same value → same token, so joins/groupbys still work; the salt
    keeps rainbow tables out).  digest = sha256(salt ‖ str(value));
    null stays null.  Per-row cost is one C hashlib call (no Python
    arithmetic); everything else stays Arrow.  SQL-replicable as
    ``sha256(salt || CAST(col AS VARCHAR))``."""
    import hashlib

    def mapper(t: pa.Table) -> pa.Table:
        out = {c: t[c] for c in t.column_names}
        for c in columns:
            vals = pc.cast(t[c], pa.string()).to_pylist()
            out[c] = pa.array(
                [None if v is None else
                 hashlib.sha256((salt + v).encode()).hexdigest()
                 for v in vals], pa.string())
        return pa.table(out)

    return ds.map_batches(mapper, batch_format="pyarrow")
