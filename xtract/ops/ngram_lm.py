"""Character-ngram language-model quality scoring — the public
CCNet-style perplexity filter (Wenzek et al. 2020) without external
LM dependencies: a corpus-trained char-ngram model assigns each
document bits-per-char; outliers (both gibberish and boilerplate) sit
far from the corpus median and can be gated.

Shapes:

- **train** (``train_char_lm``): n-gram and (n-1)-gram counts are
  gathered with the combiner → ``groupby(gram).sum`` shuffle (one row
  per distinct gram per block); only the top ``max_grams`` rows reach
  the driver (Dataset-side partial top-k + sort, like
  ``vocab.build_vocab``) where the conditional log-probs are computed
  with add-one smoothing and a fixed unseen floor.  Deterministic.
- **score** (``score_bits_per_char``): the log-prob table is broadcast
  once; each batch scores documents with dict lookups over a rolling
  window (one pass per char).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

#: characters outside this set collapse to '\x02' (rare-char bucket;
#: chr(2) not chr(0) so the DuckDB oracle can spell it — NUL is not
#: representable in DuckDB varchars)
_NORM = "abcdefghijklmnopqrstuvwxyz0123456789 .,;:!?'-\n"
_NORM_SET = frozenset(_NORM)

UNSEEN_BITS = 12.0            # floor cost for grams outside the table
UNSEEN_MICRO = 12_000_000     # same, in integer micro-bits


def _normalize(text: str) -> str:
    t = text.lower()
    return "".join(c if c in _NORM_SET else "\x02" for c in t)


def _gram_counts_batch(batch: pa.Table, col: str, order: int) -> pa.Table:
    counts: dict[str, int] = {}
    for t in batch[col].to_pylist():
        s = _normalize(t or "")
        for i in range(len(s) - order + 1):
            g = s[i:i + order]
            counts[g] = counts.get(g, 0) + 1
            p = g[:-1]
            counts["\x01" + p] = counts.get("\x01" + p, 0) + 1
    return pa.table({"gram": pa.array(list(counts.keys()), pa.string()),
                     "n": pa.array(list(counts.values()), pa.int64())})


def train_char_lm(ds, col: str = "text", order: int = 3,
                  max_grams: int = 200_000) -> dict[str, int]:
    """→ {ngram: micro_bits} conditional cost table
    (⌊-10⁶·log₂ P(c | prefix)⌋, add-one smoothed over the kept table).
    INTEGER costs so per-doc totals are order-free int64 sums —
    bit-identical at any parallelism and re-derivable in ANSI SQL
    (the driver oracle).  Only ``max_grams`` rows reach the driver."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    counts = ds.select_columns([col]).map_batches(
        lambda b: _gram_counts_batch(b, col, order), batch_format="pyarrow")
    total = counts.groupby("gram").aggregate(Sum("n", alias_name="n"))

    def block_topk(t: pa.Table) -> pa.Table:
        if len(t) <= max_grams:
            return t
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                            ("gram", "ascending")])
        return t.take(idx[:max_grams])

    top = (total.map_batches(block_topk, batch_format="pyarrow")
                .sort(["n", "gram"], descending=[True, False])
                .limit(max_grams).to_pandas())
    grams = dict(zip(top["gram"], top["n"].astype("int64")))
    vocab_size = len(_NORM) + 1
    table: dict[str, int] = {}
    for g, n in grams.items():
        if g.startswith("\x01"):
            continue
        prefix_n = grams.get("\x01" + g[:-1], 0)
        # the prefix row can miss the max_grams cut while the gram
        # survives it (equal-count boundary); clamp p ≤ 1 so a missing
        # prefix count can never produce a NEGATIVE bit cost
        p = min(1.0, (n + 1) / (prefix_n + vocab_size))
        table[g] = math.floor(-1_000_000.0 * math.log2(p))
    return table


class _Scorer:
    def __init__(self, table_ref, col: str, order: int) -> None:
        import ray

        self.table = (ray.get(table_ref)
                      if not isinstance(table_ref, dict) else table_ref)
        self.col = col
        self.order = order

    def __call__(self, batch: pa.Table) -> pa.Table:
        tab = self.table
        order = self.order
        bpc = np.empty(len(batch), np.float64)
        nch = np.empty(len(batch), np.int64)
        for i, t in enumerate(batch[self.col].to_pylist()):
            s = _normalize(t or "")
            n = len(s) - order + 1
            if n <= 0:
                bpc[i] = UNSEEN_BITS
                nch[i] = 0
                continue
            total = 0  # int micro-bits: sum order can't change the result
            for j in range(n):
                total += tab.get(s[j:j + order], UNSEEN_MICRO)
            bpc[i] = total / (1_000_000.0 * n)
            nch[i] = n
        return (batch.append_column("bits_per_char", pa.array(bpc))
                     .append_column("n_scored_grams", pa.array(nch, pa.int64())))


def score_bits_per_char(ds, table: dict[str, float], col: str = "text",
                        order: int = 3, concurrency=(2, 8)):
    """Add ``bits_per_char`` (lower = more corpus-typical text) — the
    perplexity-proxy quality signal; broadcast table, warm actors."""
    import ray

    ref = ray.put(table)
    return ds.map_batches(_Scorer, fn_constructor_args=(ref, col, order),
                          batch_format="pyarrow", concurrency=concurrency,
                          num_cpus=1)
