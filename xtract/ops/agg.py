"""Vectorized grouped-winner aggregation (no per-group Python).

``first_row_per_key`` is the scale-safe replacement for the round-1
``groupby(key).map_groups(first)`` pattern, which paid one interpreter
call (plus one tiny Arrow table) per distinct key — measured 2× the
cost of the extract stage itself on the checksum path.

Shape (combiner → coarse co-group):

1. **block combiner**: inside every input block, keep only each key's
   winner row (one ``pc.sort_indices`` + a shifted not-equal mask —
   fully vectorized, works with nested payload columns via
   ``Table.take``).  After this, a hot key contributes at most ONE row
   per block to the shuffle — no explicit salting needed.
2. **coarse partition**: tag rows with ``part = hash(key) % P``
   (``pandas.util.hash_array`` — vectorized siphash, stable across
   processes/machines) and ``groupby(part)`` — P interpreter calls
   total, not one per key.
3. **partition winner**: same vectorized winner mask over the whole
   partition; every key's surviving rows are co-located, so the result
   is exact.

The winner is the row minimizing ``order_cols`` (then arbitrary-but-
deterministic among full ties because the combiner sort is stable and
block order is deterministic — pass enough order columns for a total
order when byte-determinism matters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _hash_part(col: pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    if pa.types.is_integer(col.type):
        ids = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return np.abs(ids) % np.int64(num_partitions)
    vals = np.asarray(col.to_pylist(), dtype=object)
    return (pd.util.hash_array(vals) % num_partitions).astype(np.int64)


def _top_rows(t: pa.Table, key: str, order_cols: tuple[str, ...],
              k: int) -> pa.Table:
    """Keep each key's first ``k`` rows under sort order
    (key, *order_cols) — vectorized rank-within-run mask."""
    if len(t) <= 1:
        return t
    sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_cols]
    idx = pc.sort_indices(t, sort_keys=sort_keys)
    t = t.take(idx)
    karr = t[key].combine_chunks()
    if pa.types.is_integer(karr.type):
        kv = karr.to_numpy(zero_copy_only=False)
        change = np.ones(len(t), bool)
        change[1:] = kv[1:] != kv[:-1]
    else:
        kv = np.asarray(karr.to_pylist(), dtype=object)
        change = np.ones(len(t), bool)
        change[1:] = kv[1:] != kv[:-1]
    # rank within run: index − index-of-run-start
    starts = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    rank = np.arange(len(t)) - starts[run_id]
    return t.filter(pa.array(rank < k))


def first_row_per_key(ds, key: str, order_cols: tuple[str, ...] = (),
                      num_partitions: int = 32):
    """→ Dataset with exactly one (winner) row per distinct ``key``.

    Winner = min under (order_cols) within the key group.  Nested
    payload columns survive (pyarrow ``take``/``filter`` only)."""
    return top_k_per_key(ds, key, order_cols, 1, num_partitions)


def top_k_per_key(ds, key: str, order_cols: tuple[str, ...] = (),
                  k: int = 1, num_partitions: int = 32):
    """→ Dataset with each key's first ``k`` rows under (order_cols) —
    the grouped-top-N operator (e.g. best N documents per domain),
    same combiner + coarse co-group shape as ``first_row_per_key``:
    blocks pre-prune to ≤k rows per key, the partition pass finishes
    exactly."""
    order_cols = tuple(order_cols)

    def combine(t: pa.Table) -> pa.Table:
        return _top_rows(t, key, order_cols, k)

    def add_part(t: pa.Table) -> pa.Table:
        part = _hash_part(t[key], num_partitions)
        return t.append_column("_part", pa.array(part, pa.int64()))

    def finish(g: pa.Table) -> pa.Table:
        return _top_rows(g, key, order_cols, k).drop_columns(["_part"])

    return (ds.map_batches(combine, batch_format="pyarrow")
              .map_batches(add_part, batch_format="pyarrow")
              .groupby("_part")
              .map_groups(finish, batch_format="pyarrow"))


def deterministic_sample(ds, key: str, every: int = 20):
    """Deterministic 1/``every`` sample: keep rows where
    ``hashless key % every == 0`` — partition-independent,
    reproducible, and stratified across the id space (the inspection /
    debugging sample; for id spaces that are not uniform use a hashed
    variant).  SURVEY §2.6 sampling surface."""
    def keep(t: pa.Table) -> pa.Table:
        ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % every == 0))

    return ds.map_batches(keep, batch_format="pyarrow")


def priority_sample(ds, k: int, id_col: str, weight_col: str,
                    a: int = 2654435761, c: int = 12345,
                    m: int = 2 ** 32):
    """Deterministic WEIGHTED sample without replacement — bottom-k
    priority sampling (Efraimidis-Spirakis shape with a reproducible
    LCG in place of RNG): each row's priority is ``lcg(id) / weight``,
    the k smallest win, so a row's selection odds scale with its
    weight while staying bit-reproducible under ANY partitioning (no
    RNG state, no seed plumbing).  Scale shape: each block keeps its
    own k best (vectorized argsort + slice on SLIM columns), then ONE
    small sort+limit over ≤ k·n_blocks rows — the corpus never
    shuffles.  Ties on the float priority break by id, so the sample
    is total-order deterministic.  The single IEEE division makes the
    selection decidable identically in SQL (``CAST(h AS DOUBLE)/w``),
    which is what the driver oracle checks."""
    def part(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids * np.int64(a) + np.int64(c)) % np.int64(m)
        p = h.astype(np.float64) / w
        order = np.lexsort((ids, p))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         weight_col: pa.array(w[order], pa.int64()),
                         "h": pa.array(h[order], pa.int64()),
                         "_p": pa.array(p[order], pa.float64())})

    sel = (ds.map_batches(part, batch_format="pyarrow")
           .sort(["_p", id_col]).limit(k))
    return sel.map_batches(lambda t: t.drop_columns(["_p"]),
                           batch_format="pyarrow")


def stratified_sample(ds, stratum_col: str, key: str,
                      rates: dict, default_every: int = 1):
    """Deterministic per-stratum downsampling (the data-MIXING surface:
    e.g. keep 1/1 of English, 1/5 of each other language when
    rebalancing a training corpus).  A row survives iff
    ``key % rates.get(stratum, default_every) == 0`` — reproducible
    under any partitioning, no shuffle, no RNG state.  Vectorized: one
    dictionary-decode + take per batch."""
    strata = sorted(rates)
    evs = np.array([int(rates[s]) for s in strata] + [int(default_every)],
                   np.int64)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.fill_null(
            pc.index_in(t[stratum_col], value_set=pa.array(strata)),
            len(strata)).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % evs[idx] == 0))

    return ds.map_batches(keep, batch_format="pyarrow")


_LCG_A, _LCG_C, _LCG_M = 2654435761, 12345, 2 ** 32


def _lcg(ids: np.ndarray) -> np.ndarray:
    """The repo's reproducible per-id hash (same constants as
    `priority_sample`, mirrored in SQL as
    ``(id * 2654435761 + 12345) % 4294967296``)."""
    return (ids * np.int64(_LCG_A) + np.int64(_LCG_C)) % np.int64(_LCG_M)


def upsample_mixture(ds, stratum_col: str, key: str, factors: dict,
                     copy_col: str = "copy_idx"):
    """Deterministic FRACTIONAL upsampling to a target mixture (the
    complement of `stratified_sample`: epoch-weighting a training mix,
    e.g. 2.5 epochs of curated text against 1 epoch of crawl).  A row
    in stratum s with factor f gets ``floor(f)`` copies plus one more
    iff ``lcg(key) % 10^6 < round(frac(f)·10^6)`` — reproducible under
    ANY partitioning (no RNG state), and every copy is tagged with
    ``copy_idx`` (0‥n−1) so downstream shuffles/packing can
    de-correlate copies.  Unlisted strata keep factor 1.0; factor 0
    drops the stratum.

    Scale shape: embarrassingly parallel — one dictionary-decode + one
    ``np.repeat``/``take`` per batch, no shuffle, no driver state.
    """
    strata = sorted(factors)
    base = np.array([int(factors[s]) for s in strata] + [1], np.int64)
    frac_micro = np.array(
        [int(round((float(factors[s]) - int(factors[s])) * 1_000_000))
         for s in strata] + [0], np.int64)

    def expand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        if strata:
            idx = pc.fill_null(
                pc.index_in(t[stratum_col], value_set=pa.array(strata)),
                len(strata)).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        else:  # no factors: every row ×1 (still tags copy_idx = 0)
            idx = np.zeros(len(t), np.int64)
        reps = base[idx] + (_lcg(ids) % 1_000_000 < frac_micro[idx])
        row_idx = np.repeat(np.arange(len(t), dtype=np.int64), reps)
        ends = np.cumsum(reps)
        copy_idx = np.arange(int(ends[-1]) if len(ends) else 0,
                             dtype=np.int64) - np.repeat(ends - reps, reps)
        return t.take(pa.array(row_idx)).append_column(
            copy_col, pa.array(copy_idx, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")


def sample_per_key(ds, stratum_col: str, id_col: str, k: int,
                   num_partitions: int = 32):
    """Deterministic k-PER-KEY sample (e.g. ≤k documents per source
    for a balanced eval slice): rows are ranked within each stratum by
    ``(lcg(id), id)`` — a reproducible random order — and the first k
    win.  Same grouped-top-N machinery as `top_k_per_key` (block
    combiner prunes to ≤k per stratum per block before the exchange);
    no RNG state, stable under any partitioning."""
    def pri(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_pri", pa.array(_lcg(ids), pa.int64()))

    out = top_k_per_key(ds.map_batches(pri, batch_format="pyarrow"),
                        key=stratum_col, order_cols=("_pri", id_col),
                        k=k, num_partitions=num_partitions)
    return out.map_batches(lambda t: t.drop_columns(["_pri"]),
                           batch_format="pyarrow")


def weighted_downsample(ds, key: str, weight_col: str, scale: int,
                        micro: int = 1_000_000):
    """Deterministic PER-ROW soft downsampling: keep a row with
    probability ``min(1, weight/scale)`` — the quality-score sampling
    step of a curation pipeline (keep all of the best documents, a
    score-proportional fraction of the middle, almost none of the
    worst) — decided as ``lcg(key) % micro < weight·micro // scale``,
    so the choice is reproducible under any partitioning, stable
    across corpus versions, and exactly replayable in SQL.  Integer
    weights only (floor semantics documented by the formula).  The
    per-stratum hard-rate complement is `stratified_sample`; the
    upsampling complement is `upsample_mixture`.  No shuffle."""
    def keep(t: pa.Table) -> pa.Table:
        ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        thresh = np.minimum(w * np.int64(micro) // np.int64(scale),
                            np.int64(micro))
        return t.filter(pa.array(_lcg(ids) % micro < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_split(ds, key: str, val_bps: int = 500, test_bps: int = 500,
               split_col: str = "split"):
    """Deterministic train/val/test assignment: ``lcg(key) % 10000``
    lands in [0, val_bps) → 'val', [val_bps, val_bps+test_bps) →
    'test', else 'train'.  Basis-point thresholds, reproducible under
    any partitioning and STABLE ACROSS CORPUS VERSIONS (a document
    keeps its split when other documents come and go — the property a
    random split lacks and leakage audits need).  No shuffle; one
    vectorized kernel per batch."""
    names = np.array(["val", "test", "train"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        bp = _lcg(ids) % 10_000
        which = np.where(bp < val_bps, 0,
                         np.where(bp < val_bps + test_bps, 1, 2))
        return t.append_column(
            split_col, pa.array(names[which], pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def content_split(ds, text_col: str = "text", val_bps: int = 500,
                  test_bps: int = 500, split_col: str = "split"):
    """LEAK-PROOF train/val/test assignment: the split is a pure
    function of the CONTENT hash (md5-prefix 64 bits), so
    byte-identical duplicates land in the same split by construction —
    no dedup pass required first, no shuffle, stable across corpus
    versions AND across id-space changes (the property `hash_split`
    on ids cannot give when duplicates carry different ids).  For
    NEAR-dup leak-proofness attach `ops/dedup` cluster labels and
    `hash_split` on the cluster id instead.  Same basis-point
    thresholds and LCG as `hash_split`; the SQL mirror is
    ``CAST(('0x' || left(md5(text), 16)) AS UBIGINT)``."""
    import hashlib

    names = np.array(["val", "test", "train"])

    def assign(t: pa.Table) -> pa.Table:
        hs = np.fromiter(
            (int.from_bytes(
                hashlib.md5((x or "").encode()).digest()[:8], "big",
                signed=True) for x in t[text_col].to_pylist()),
            np.int64, len(t))
        bp = _lcg(hs) % 10_000
        which = np.where(bp < val_bps, 0,
                         np.where(bp < val_bps + test_bps, 1, 2))
        return t.append_column(
            split_col, pa.array(names[which], pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def count_distinct_per_key(ds, key: str, val: str):
    """→ Dataset(key, n_distinct): exact grouped COUNT(DISTINCT val).

    Two-level shape — no value set is ever collected anywhere:

    1. block combiner: ``np.unique`` over the block's (key, val) pairs
       → each distinct pair contributes ≤1 slim row per block (a hot
       pair dedups locally before the shuffle);
    2. ``groupby(key, val).count`` finishes the global pair dedup,
       then ``groupby(key).count`` counts the survivors.

    Both exchanges move (key, val) / (key) rows only.  SURVEY §2.5
    aggregation surface, the distinct-cardinality analogue of the HLL
    sketch (`ops/sketch.approx_distinct`) when exactness is required.
    """
    from ray.data.aggregate import Count

    def pair_combine(t: pa.Table) -> pa.Table:
        sub = t.select([key, val])
        # np.unique over a structured view needs uniform dtype; use the
        # vectorized sort+shift-mask instead (works for any Arrow type)
        idx = pc.sort_indices(sub, sort_keys=[(key, "ascending"),
                                              (val, "ascending")])
        sub = sub.take(idx)
        if len(sub) <= 1:
            return sub
        k_ne = pc.not_equal(sub[key].slice(1), sub[key].slice(0, len(sub) - 1))
        v_ne = pc.not_equal(sub[val].slice(1), sub[val].slice(0, len(sub) - 1))
        change = pc.fill_null(pc.or_kleene(k_ne, v_ne), True)
        mask = np.concatenate([[True],
                               change.to_numpy(zero_copy_only=False)
                               .astype(bool)])
        return sub.filter(pa.array(mask))

    pairs = (ds.map_batches(pair_combine, batch_format="pyarrow")
             .groupby([key, val]).aggregate(Count(alias_name="_n"))
             .select_columns([key]))
    return pairs.groupby(key).aggregate(Count(alias_name="n_distinct"))


def grouped_concat_stats(ds, key: str, distinct_col: str, concat_col: str,
                         sep: str = "|", num_partitions: int = 32):
    """→ Dataset(key, n_rows, n_distinct, concat): per key, the total
    row count, COUNT(DISTINCT distinct_col), and the sorted-distinct
    values of ``concat_col`` joined by ``sep`` (deterministic — order
    never depends on partitioning).

    Shape: a block combiner first collapses each block to its distinct
    (key, distinct_col, concat_col) triples carrying a partial row
    count ``_n`` (a hot key's repeats dedup locally before the
    shuffle), then ONE coarse hash co-group finishes: sum the partials,
    nunique the distinct column, sort-unique-join the concat column.
    The exchange moves slim distinct triples only.  The web-pipeline
    instance is anchor-text aggregation per link target (n_links /
    n_source_pages / distinct anchors)."""
    def combine(t: pa.Table) -> pa.Table:
        sub = t.select([key, distinct_col, concat_col])
        df = sub.to_pandas()
        g = (df.groupby([key, distinct_col, concat_col], sort=False,
                        dropna=False)
               .size().rename("_n").reset_index())
        out = pa.Table.from_pandas(g, preserve_index=False)
        part = _hash_part(out[key], num_partitions)
        return out.append_column("_part", pa.array(part, pa.int64()))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        grp = df.drop(columns=["_part"]).groupby(key, sort=False)
        return pd.DataFrame({
            key: grp.size().index,
            "n_rows": grp["_n"].sum().to_numpy().astype(np.int64),
            "n_distinct": grp[distinct_col].nunique().to_numpy()
                             .astype(np.int64),
            "concat": grp[concat_col]
                .agg(lambda s: sep.join(sorted(set(s.dropna()))))
                .to_numpy(),
        })

    return (ds.map_batches(combine, batch_format="pyarrow")
              .groupby("_part")
              .map_groups(finish, batch_format="pandas"))


def rollup_counts(ds, dims: "tuple[str, ...]", cents_col: str,
                  all_label: str = "ALL"):
    """Multi-level aggregate in ONE exchange (``GROUP BY ROLLUP``):
    → Dataset(dims..., n_rows, total_cents) with one output row per
    prefix grouping level — (d1, d2), (d1, ALL), (ALL, ALL) for two
    dims.  Rolled-up dimensions carry ``all_label`` (a sentinel, never
    NULL — Ray's hash groupby on nullable string keys is unsafe, and
    the label keeps the SQL oracle a plain COALESCE).

    Shape: the block combiner emits each level's partial (dims → n,
    cents) rows — a block with B rows contributes ≤ distinct(level
    groups) slim rows per level — then ONE ``groupby(dims)`` with two
    native Sums finishes all levels together.  No per-level pass over
    the input, no driver state.  Assumes dim columns are non-null
    strings (pre-coalesce upstream if not)."""
    from ray.data.aggregate import Sum

    dims = tuple(dims)

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({d: t[d].to_pandas() for d in dims})
        df["_c"] = t[cents_col].to_numpy(zero_copy_only=False) \
                               .astype(np.int64)
        outs = []
        for level in range(len(dims), -1, -1):
            keep = list(dims[:level])
            if keep:
                g = (df.groupby(keep, sort=False)["_c"]
                       .agg(["size", "sum"]).reset_index())
            else:
                g = pd.DataFrame({"size": [len(df)],
                                  "sum": [int(df["_c"].sum())]})
            for d in dims[level:]:
                g[d] = all_label
            outs.append(g[[*dims, "size", "sum"]])
        out = pd.concat(outs, ignore_index=True)
        return pa.table({**{d: pa.array(out[d], pa.string())
                            for d in dims},
                         "_n": pa.array(out["size"].to_numpy()
                                        .astype(np.int64)),
                         "_cents": pa.array(out["sum"].to_numpy()
                                            .astype(np.int64))})

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([*dims, "n_rows", "total_cents"])

    return (ds.map_batches(combine, batch_format="pyarrow")
              .groupby(list(dims))
              .aggregate(Sum("_n", alias_name="n_rows"),
                         Sum("_cents", alias_name="total_cents"))
              .map_batches(rename, batch_format="pyarrow"))


def grouped_mode(ds, key: str, val: str, num_partitions: int = 32):
    """→ Dataset(key, mode, n): each key's most frequent value (ties →
    lexicographically smallest value) and its count.

    Composition of existing shapes: the (key, val) pair counts come
    from a block combiner + ONE groupby Sum (a hot pair contributes ≤1
    row per block), then ``first_row_per_key`` picks the winner under
    (−n, val) without a second full shuffle of the data — only the
    distinct-pair table moves."""
    from ray.data.aggregate import Sum

    def pair_counts(t: pa.Table) -> pa.Table:
        df = (t.select([key, val]).to_pandas()
               .groupby([key, val], sort=False).size()
               .rename("_n").reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    counted = (ds.map_batches(pair_counts, batch_format="pyarrow")
                 .groupby([key, val])
                 .aggregate(Sum("_n", alias_name="n")))

    def neg(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_neg", pc.multiply(pc.cast(t["n"], pa.int64()),
                                pa.scalar(-1, pa.int64())))

    win = first_row_per_key(counted.map_batches(neg, batch_format="pyarrow"),
                            key, ("_neg", val),
                            num_partitions=num_partitions)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({key: t[key], "mode": t[val],
                         "n": pc.cast(t["n"], pa.int64())})

    return win.map_batches(fin, batch_format="pyarrow")


def unpivot(ds, id_cols: "list[str]", value_cols: "list[str]",
            var_name: str = "variable", value_name: str = "value",
            value_type: "pa.DataType | None" = None):
    """UNPIVOT / melt: wide → long, one output row per (input row ×
    value column) — pure per-batch reshaping, zero shuffle, zero
    Python per row (each value column contributes one `pc.cast` and
    one column slice per batch).

    ``value_type`` unifies the value columns' types (default: the
    first value column's type; pass explicitly when mixing int/float
    — the cast is checked, so a lossy mix fails loudly rather than
    silently truncating).
    """
    import pyarrow.compute as _pc

    def mapper(t: pa.Table) -> pa.Table:
        vt = value_type or t.schema.field(value_cols[0]).type
        pieces = []
        for c in value_cols:
            cols = {ic: t[ic] for ic in id_cols}
            cols[var_name] = pa.array([c] * len(t), pa.string())
            cols[value_name] = _pc.cast(t[c], vt)
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    return ds.select_columns(list(id_cols) + list(value_cols)) \
             .map_batches(mapper, batch_format="pyarrow")


def _tagged_side_counts(ds_a, ds_b, columns: "list[str]"):
    from ray.data.aggregate import Sum

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            cols = {c: t[c] for c in columns}
            n = len(t)
            cols["_a"] = pa.array(
                np.full(n, 1 - side, np.int64), pa.int64())
            cols["_b"] = pa.array(np.full(n, side, np.int64),
                                  pa.int64())
            return pa.table(cols)
        return f

    both = (ds_a.select_columns(columns)
            .map_batches(tag(0), batch_format="pyarrow")
            .union(ds_b.select_columns(columns)
                   .map_batches(tag(1), batch_format="pyarrow")))
    return both.groupby(columns).aggregate(
        Sum("_a", alias_name="_na"), Sum("_b", alias_name="_nb"))


def intersect_distinct(ds_a, ds_b, columns: "list[str]"):
    """SQL ``INTERSECT`` (set semantics): distinct rows present in
    BOTH datasets over ``columns`` — ONE tagged groupby exchange, no
    driver materialization (the relational set-op the engine lacked;
    ``union`` Ray has natively, EXCEPT is the sibling below)."""
    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(t["_na"], 0), pc.greater(t["_nb"], 0))
        return t.filter(m).select(columns)

    return _tagged_side_counts(ds_a, ds_b, columns).map_batches(
        keep, batch_format="pyarrow")


def except_distinct(ds_a, ds_b, columns: "list[str]"):
    """SQL ``EXCEPT`` (set semantics): distinct rows of A absent from
    B over ``columns`` — same single tagged exchange."""
    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(t["_na"], 0), pc.equal(t["_nb"], 0))
        return t.filter(m).select(columns)

    return _tagged_side_counts(ds_a, ds_b, columns).map_batches(
        keep, batch_format="pyarrow")


def grouped_ordered_concat(ds, key: str, val_col: str, order_cols,
                           sep: str = "|", num_partitions: int = 32):
    """Per-key ORDERED string aggregation — SQL's
    ``string_agg(val, sep ORDER BY order_cols)`` (the event-path /
    breadcrumb builder).  → (key, path:string, n_items:int64).

    Shape: ONE coarse hash co-group; per partition one mergesort +
    one cython ``groupby.agg(join)`` — Python runs P times.  Ordering
    must be made unique by ``order_cols`` (include a tiebreaker id)
    or cross-run determinism is lost; the mergesort keeps equal keys
    stable as a last resort.  Partitioning assumption: one key's rows
    fit in one partition."""
    import pandas as pd

    from .joins import _add_key_part

    order_cols = list(order_cols)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + order_cols,
                          kind="mergesort").reset_index(drop=True)
        gb = g.groupby(key, sort=False)[val_col]
        out = gb.agg(lambda s: sep.join(s.astype(str))).reset_index()
        out.columns = [key, "path"]
        out["n_items"] = gb.size().to_numpy()
        return out

    cols = list(dict.fromkeys([key, val_col] + order_cols))
    return (ds.select_columns(cols)
            .map_batches(lambda b: _add_key_part(b, key, num_partitions),
                         batch_format="pyarrow")
            .groupby("_part")
            .map_groups(per_partition, batch_format="pandas")
            .select_columns([key, "path", "n_items"]))


def grouped_value_profile(ds, key: str, val: str, num_partitions: int = 32):
    """→ Dataset(key, n_rows, n_values, mode, mode_n): each key's full
    categorical-distribution profile — row count, distinct-value
    count, and most frequent value (ties → lexicographically smallest)
    with its count — in ONE pass more than :func:`grouped_mode` would
    give (which returns only the winner).

    Shape: block combiner + ONE groupby Sum produces the slim distinct
    (key, val, n) table (a hot pair contributes ≤1 row per block); a
    single coarse co-group over ``key`` then computes all three
    statistics per partition with one cython pandas kernel — the
    multi-stat-per-exchange discipline (tag once, compute everything
    inside that partition)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def pair_counts(t: pa.Table) -> pa.Table:
        df = (t.select([key, val]).to_pandas()
               .groupby([key, val], sort=False).size()
               .rename("_n").reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    counted = (ds.map_batches(pair_counts, batch_format="pyarrow")
                 .groupby([key, val])
                 .aggregate(Sum("_n", alias_name="n")))

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_part", pa.array(
            _hash_part(b[key], num_partitions), pa.int64()))

    def profile(g: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": g[key].to_pandas(),
            "v": g[val].to_pandas(),
            "n": g["n"].to_numpy(zero_copy_only=False).astype("int64")})
        tot = df.groupby("k", sort=False)["n"].agg(["sum", "size"])
        # winner under (-n, v): sort once, take first per key
        w = (df.sort_values(["k", "v"])
               .sort_values(["k", "n"], kind="mergesort",
                            ascending=[True, False])
               .drop_duplicates("k"))
        w = w.set_index("k")
        return pa.table({
            key: pa.array(tot.index, g[key].type),
            "n_rows": pa.array(tot["sum"].to_numpy(), pa.int64()),
            "n_values": pa.array(tot["size"].to_numpy(), pa.int64()),
            "mode": pa.array(w.loc[tot.index, "v"], g[val].type),
            "mode_n": pa.array(
                w.loc[tot.index, "n"].to_numpy(), pa.int64())})

    return (counted.map_batches(tag, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(profile, batch_format="pyarrow"))


def take_until_budget(ds, key: str, order_col: str, weight_col: str,
                      budget: int, id_col: str,
                      num_partitions: int = 32):
    """Per-key budgeted selection (the curation step that fills a
    per-source token budget with the best documents first): within
    each key, rows order by (``order_col`` DESC, ``id_col`` ASC) and
    are kept while the INCLUSIVE running ``weight_col`` sum stays
    ≤ ``budget``.  Deterministic, exact integers; emits the kept rows
    with their running total (``cum_weight``).

    Shape: slim (key, order, weight, id) projection → ONE coarse
    co-group over ``key`` → per-partition vectorized lexsort +
    run-offset cumsum + mask.  Partitioning assumption (documented
    co-group rule): one key's rows materialize in one partition.
    """
    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": b[key],
            "o": b[order_col].cast(pa.int64()),
            "w": b[weight_col].cast(pa.int64()),
            "i": b[id_col].cast(pa.int64()),
            "_part": pa.array(_hash_part(b[key], num_partitions),
                              pa.int64())})

    def pick(g: pa.Table) -> pa.Table:
        k = np.asarray(g["k"].to_pylist(), dtype=object)
        o = g["o"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = g["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = g["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, -o, k))
        k, o, w, i = k[order], o[order], w[order], i[order]
        change = np.ones(len(k), bool)
        change[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        cum = np.cumsum(w)
        base = np.repeat(cum[starts] - w[starts],
                         np.diff(np.append(starts, len(k))))
        run = cum - base
        keep = run <= budget
        cols = {key: pa.array(k[keep], g["k"].type),
                id_col: pa.array(i[keep], pa.int64()),
                order_col: pa.array(o[keep], pa.int64())}
        # order and weight may be the SAME column — dict dedupes
        cols[weight_col] = pa.array(w[keep], pa.int64())
        cols["cum_weight"] = pa.array(run[keep], pa.int64())
        return pa.table(cols)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_part").map_groups(pick, batch_format="pyarrow"))
