"""Bigram collocation mining (PMI) over a ``documents(doc_id, text)``
table — a standard corpus-analysis op for LLM-data curation (find
multi-word expressions worth treating as units, spot templated
boilerplate phrases).

Shape at 100 TB: one streaming pass emits per-block BIGRAM partial
counts (a Python dict combiner per block, so each block contributes at
most |distinct bigrams in block| rows — not one row per token), then a
native ``groupby.aggregate(Sum)`` finishes the exact counts.  Unigram
counts reuse the same combiner.  The unigram table is vocabulary-
bounded, so it broadcasts via ``ray.put`` and each bigram row looks up
``c(a)`` / ``c(b)`` with two vectorized ``searchsorted`` probes — no
second shuffle.  The PMI *score* is computed only on rows that survive
the ``min_count`` filter (bigram-vocabulary-bounded, not corpus-
bounded) with exact Python integers so the result is bit-identical to
a DuckDB HUGEINT oracle; ranking ties break on the bigram itself.

Tokenization is the SQL-mirrorable rule shared with ``ops/vocab``:
split on ``[^a-z]+`` after lowercasing, drop empties; bigram = tokens
adjacent AFTER the drop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .vocab import sql_tokens  # noqa: F401 — the scalar reference rule

#: fixed-point scale for the exact integer PMI ratio output
PPM = 1_000_000


def _flat_tokens(batch: pa.Table, col: str):
    """Vectorized tokenization of a whole batch: ONE regex-split
    kernel + list-flatten + empty mask (no Python loop over rows or
    tokens).  Returns (tokens, parent_row_indices) — flattened order
    preserves within-document order, so adjacency in the flat arrays
    with equal parents IS bigram adjacency after the empty drop
    (identical to ``sql_tokens``)."""
    import pyarrow.compute as pc

    lists = pc.split_pattern_regex(
        pc.utf8_lower(pc.coalesce(batch[col], pa.scalar(""))),
        pattern="[^a-z]+").combine_chunks()
    parents = pc.list_parent_indices(lists)
    flat = pc.list_flatten(lists)
    mask = pc.not_equal(flat, "")
    return flat.filter(mask), parents.filter(mask)


def _bigram_counts_batch(batch: pa.Table, col: str) -> pa.Table:
    import pandas as pd

    toks, parents = _flat_tokens(batch, col)
    t = np.asarray(toks.to_pylist(), dtype=object)
    par = parents.to_numpy(zero_copy_only=False)
    if len(t) < 2:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    adj = par[1:] == par[:-1]
    df = pd.DataFrame({"a": t[:-1][adj], "b": t[1:][adj]})
    g = df.groupby(["a", "b"], sort=False).size().reset_index(name="n")
    return pa.table({
        "a": pa.array(g["a"], pa.string()),
        "b": pa.array(g["b"], pa.string()),
        "n": pa.array(g["n"], pa.int64()),
    })


def _unigram_counts_batch(batch: pa.Table, col: str) -> pa.Table:
    import pandas as pd

    toks, _ = _flat_tokens(batch, col)
    vc = pd.Series(toks.to_pandas()).value_counts(sort=False)
    return pa.table({
        "token": pa.array(vc.index.to_numpy(), pa.string()),
        "n": pa.array(vc.to_numpy(), pa.int64()),
    })


def bigram_pmi(ds, col: str = "text", min_count: int = 5, k: int = 50):
    """→ pandas DataFrame of the top-``k`` bigrams by exact-integer
    PMI ratio: ``ratio_ppm = floor(c_ab * N² * PPM / (M * c_a * c_b))``
    where N = total tokens, M = total bigrams (so the ratio is
    p(ab)/(p(a)p(b)) in parts-per-million; PMI = log of it, monotone).
    Order: ratio_ppm DESC, a, b.  Exact — no floats anywhere."""
    import ray
    from ray.data.aggregate import Sum

    # materialize ONLY the aggregated (bigram-vocabulary-bounded)
    # table so the Sum-of-c_ab pass below doesn't re-read the corpus
    bi = (ds.map_batches(lambda t: _bigram_counts_batch(t, col),
                         batch_format="pyarrow")
            .groupby(["a", "b"]).aggregate(Sum("n", alias_name="c_ab"))
            .materialize())
    uni = (ds.map_batches(lambda t: _unigram_counts_batch(t, col),
                          batch_format="pyarrow")
             .groupby("token").aggregate(Sum("n", alias_name="c")))

    # unigram table is vocabulary-bounded → driver + broadcast
    ut = uni.to_pandas()
    toks = np.asarray(ut["token"].tolist(), dtype=object)
    cs = ut["c"].to_numpy().astype(np.int64)
    order = np.argsort(toks)
    toks, cs = toks[order], cs[order]
    n_total = int(cs.sum())
    uni_ref = ray.put((toks, cs))

    def attach(t: pa.Table) -> pa.Table:
        tk, c = ray.get(uni_ref)

        def look(col_a) -> np.ndarray:
            v = np.asarray(col_a.to_pylist(), dtype=object)
            i = np.searchsorted(tk, v)
            return c[np.clip(i, 0, len(c) - 1)]

        out = t.filter(pa.array(
            t["c_ab"].to_numpy(zero_copy_only=False) >= min_count))
        if len(out) == 0:
            return out.append_column("c_a", pa.array([], pa.int64())) \
                      .append_column("c_b", pa.array([], pa.int64()))
        return (out.append_column("c_a", pa.array(look(out["a"]),
                                                  pa.int64()))
                   .append_column("c_b", pa.array(look(out["b"]),
                                                  pa.int64())))

    filt = bi.map_batches(attach, batch_format="pyarrow")
    # M (total bigrams) exactly: Σ c_ab over the UNfiltered table
    m_total = int(bi.aggregate(Sum("c_ab", alias_name="m"))["m"] or 0)

    def score(t: pa.Table) -> pa.Table:
        # exact big-int arithmetic on the (bounded) filtered rows only
        cab = t["c_ab"].to_pylist()
        ca = t["c_a"].to_pylist()
        cb = t["c_b"].to_pylist()
        nn = n_total * n_total * PPM
        r = [(x * nn) // (m_total * y * z)
             for x, y, z in zip(cab, ca, cb)]
        return t.append_column("ratio_ppm", pa.array(r, pa.int64()))

    scored = filt.map_batches(score, batch_format="pyarrow")
    out = (scored
           .sort(["ratio_ppm", "a", "b"], descending=[True, False, False])
           .limit(k).to_pandas())
    cols = ["a", "b", "c_ab", "c_a", "c_b", "ratio_ppm"]
    if len(out) == 0:  # schema is lost on an empty result
        import pandas as pd

        return pd.DataFrame({c: pd.Series(
            [], dtype=(object if c in ("a", "b") else "int64"))
            for c in cols})
    return out[cols]


#: the SQL-mirrorable entity rule: a capitalized letter run —
#: ``regexp_extract_all(text, '[A-Z][a-z]+')`` in DuckDB
import re as _re

_ENTITY_RE = _re.compile(r"[A-Z][a-z]+")


def entity_cooccurrence(ds, key: str = "doc_id", col: str = "text",
                        max_entities_per_doc: int = 64):
    """Entity co-occurrence counts → Dataset(ent_a, ent_b, n_docs):
    for every unordered pair of DISTINCT heuristic entities
    (capitalized-word rule ``[A-Z][a-z]+`` — deterministic and
    SQL-replicable) appearing in the same document, the number of
    documents containing both.  The knowledge-graph seed op for a
    crawl corpus (which names travel together).

    Shape: one streaming pass; each block emits its DISTINCT
    (ent_a < ent_b) pairs with partial doc counts (np.unique combiner
    — a pair hot across the corpus still contributes ≤1 row per
    block), then ONE native ``groupby.aggregate(Sum)``.  Documents
    with more than ``max_entities_per_doc`` distinct entities are
    DROPPED whole (deterministic, the m² pair-explosion guard — the
    LSH hot-bucket cap pattern); the oracle replicates the same rule.
    """
    from ray.data.aggregate import Sum

    def pairs_partial(t: pa.Table) -> pa.Table:
        pair_a: list[str] = []
        pair_b: list[str] = []
        for txt in t[col].to_pylist():
            if not txt:
                continue
            ents = sorted(set(_ENTITY_RE.findall(txt)))
            if len(ents) < 2 or len(ents) > max_entities_per_doc:
                continue
            for i in range(len(ents) - 1):
                for j in range(i + 1, len(ents)):
                    pair_a.append(ents[i])
                    pair_b.append(ents[j])
        if not pair_a:
            return pa.table({"ent_a": pa.array([], pa.string()),
                             "ent_b": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64())})
        # entities are letter-only ([A-Z][a-z]+), so a space joint
        # key is unambiguous (numpy str arrays cannot hold NUL)
        joint = np.char.add(np.char.add(np.asarray(pair_a, object)
                                        .astype(str), " "),
                            np.asarray(pair_b, object).astype(str))
        u, cnt = np.unique(joint, return_counts=True)
        split = np.char.partition(u, " ")
        return pa.table({
            "ent_a": pa.array(split[:, 0], pa.string()),
            "ent_b": pa.array(split[:, 2], pa.string()),
            "n_docs": pa.array(cnt.astype(np.int64), pa.int64())})

    return (ds.select_columns([key, col])
            .map_batches(pairs_partial, batch_format="pyarrow")
            .groupby(["ent_a", "ent_b"])
            .aggregate(Sum("n_docs", alias_name="n_docs")))
