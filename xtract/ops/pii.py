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


def k_anonymity_audit(ds, quasi_cols: "list[str]", k: int = 5):
    """k-anonymity audit over quasi-identifier combinations: a release
    is k-anonymous iff every combination of the quasi columns appears
    ≥ k times.  → Dataset of the VIOLATING combinations
    (quasi_cols..., n:int64, n < k) — empty means the release passes.
    ONE grouped Count over the combo key space; run before
    ``pseudonymize`` to find what pseudonymization alone won't hide."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    counts = (ds.select_columns(list(quasi_cols))
              .groupby(list(quasi_cols))
              .aggregate(Count(alias_name="n")))
    return counts.map_batches(
        lambda t: t.filter(pc.less(t["n"], k)),
        batch_format="pyarrow")


def _dgeom_thresholds(eps_num: int, eps_den: int, bound: int = 64
                      ) -> "list[int]":
    """Inverse-CDF thresholds for the two-sided geometric (discrete
    Laplace) distribution with α = exp(−eps_num/eps_den):
    T[i] = floor(P(G ≤ i − bound) · 2^64) for i = 0..2·bound−1 — the
    top value g = +bound is the ELSE branch (no threshold), so noise =
    (#T ≤ u) − bound stays in [−bound, +bound] and every literal fits
    uint64.  Shared verbatim with the SQL oracle."""
    import math

    a = math.exp(-eps_num / eps_den)
    # P(G = 0) = (1−α)/(1+α); P(G = ±g) = P(0)·α^|g|
    p0 = (1.0 - a) / (1.0 + a)
    cdf, acc = [], 0.0
    for g in range(-bound, bound):
        acc += p0 * (a ** abs(g))
        cdf.append(min(acc, 1.0))
    return [min(math.floor(c * (1 << 64)), (1 << 64) - 1) for c in cdf]


def dp_noisy_counts(ds, key_col: str, eps_num: int = 1,
                    eps_den: int = 2, bound: int = 64):
    """Discrete-Laplace (two-sided geometric) noisy counts per key —
    the ε-DP release mechanism for a histogram, with the noise drawn
    DETERMINISTICALLY from ``splitmix64(md5_number_upper(key))``
    against exact inverse-CDF thresholds so the release is
    reproducible and SQL-replayable.  CAVEAT (documented, not hidden):
    hash-seeded noise gives run-to-run reproducibility for pipeline
    testing; a real privacy release must draw fresh randomness —
    swap the seed source, the mechanism is unchanged.

    → Dataset (key, n_true:int64, noise:int64, n_noisy:int64).
    ONE grouped Count; the noise attach is a stateless map."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Count

    from .dedup import _md5_u64, _mix64

    thr = np.asarray(_dgeom_thresholds(eps_num, eps_den, bound),
                     np.uint64)

    def attach(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        h = np.asarray([_md5_u64(str(k)) for k in keys], np.uint64)
        u = _mix64(h)
        g = (np.searchsorted(thr, u, side="right").astype(np.int64)
             - bound)
        n = t["n_true"].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: t[key_col],
            "n_true": pa.array(n, pa.int64()),
            "noise": pa.array(g, pa.int64()),
            "n_noisy": pa.array(n + g, pa.int64())})

    counts = (ds.select_columns([key_col]).groupby(key_col)
              .aggregate(Count(alias_name="n_true")))
    return counts.map_batches(attach, batch_format="pyarrow")
