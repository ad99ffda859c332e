"""Deterministic BPE subword tokenizer: distributed training data →
merge table → distributed encoding (the public Sennrich et al. 2016
algorithm).

Shapes:

- **train** (``train_bpe``): the corpus-wide word-frequency table is
  built distributed (``vocab.build_vocab``: per-batch combiner →
  groupby sum → Dataset-side top-k), and only the top ``max_words``
  (word, freq) rows reach the driver — the classic BPE training loop
  then runs over that bounded table (the standard practice: merges
  learned from the head of the word distribution capture the mass;
  the cutoff is a documented approximation, not a scale hack).
  Deterministic: ties in pair frequency break by lexicographic pair.
- **encode** (``bpe_encode``): the merge-rank table is broadcast once
  (``ray.put``); each worker keeps a word→subwords cache (crawl
  vocabulary repeats heavily), so the greedy merge loop runs once per
  DISTINCT word per worker, not once per occurrence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .vocab import sql_tokens

END = "</w>"


def _pair_counts(words: list[tuple[tuple[str, ...], int]]) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for sym, freq in words:
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out = []
    i = 0
    joined = pair[0] + pair[1]
    n = len(sym)
    while i < n:
        if i < n - 1 and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(ds, col: str = "text", num_merges: int = 200,
              max_words: int = 100_000, min_pair_freq: int = 2
              ) -> list[tuple[str, str]]:
    """→ ordered merge list (the learned tokenizer).  Word-frequency
    table built distributed; BPE loop over the bounded head of the
    distribution on the driver."""
    from .vocab import build_vocab

    wf = build_vocab(ds, col=col, size=max_words)
    words = [(tuple(w) + (END,), int(n))
             for w, n in zip(wf["token"].to_pylist(), wf["n"].to_pylist())]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(words)
        if not counts:
            break
        # deterministic: max freq, lexicographically smallest pair on tie
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        pair = best[0]
        merges.append(pair)
        words = [(_merge_word(s, pair), f) for s, f in words]
    return merges


def _encode_word(word: str, rank: dict) -> tuple[str, ...]:
    sym = tuple(word) + (END,)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = rank.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym = _merge_word(sym, (sym[best_i], sym[best_i + 1]))
    return sym


class BpeEncoder:
    """Warm per-worker encoder: merge ranks from a broadcast ref, plus a
    word→subwords cache (one greedy merge per distinct word)."""

    def __init__(self, merges_ref, col: str = "text") -> None:
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        self.rank = {tuple(p): i for i, p in enumerate(merges)}
        self.col = col
        self._cache: dict[str, tuple[str, ...]] = {}

    def encode_text(self, text: str) -> list[str]:
        out: list[str] = []
        cache = self._cache
        for w in sql_tokens(text):
            toks = cache.get(w)
            if toks is None:
                toks = _encode_word(w, self.rank)
                if len(cache) < (1 << 20):
                    cache[w] = toks
            out.extend(toks)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.col].to_pylist()
        offsets = np.empty(len(texts) + 1, np.int32)
        offsets[0] = 0
        flat: list[str] = []
        n_sub = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            toks = self.encode_text(t or "")
            flat.extend(toks)
            offsets[i + 1] = len(flat)
            n_sub[i] = len(toks)
        return (batch.append_column(
            "subwords", pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(flat, pa.string())))
            .append_column("n_subwords", pa.array(n_sub, pa.int64())))


def bpe_encode(ds, merges: list[tuple[str, str]], col: str = "text",
               concurrency=(2, 8)):
    """Add ``subwords``/``n_subwords`` columns; merge table broadcast
    once via the object store."""
    import ray

    ref = ray.put([tuple(p) for p in merges])
    return ds.map_batches(BpeEncoder, fn_constructor_args=(ref, col),
                          batch_format="pyarrow", concurrency=concurrency,
                          num_cpus=1)


def decode_subwords(subwords: list[str]) -> str:
    """Inverse of encoding over the tokenized alphabet: join and split
    on the end-of-word marker."""
    return " ".join(w for w in "".join(subwords).split(END) if w)
