"""Exact distributed quantiles (discrete / type-1, the
``quantile_disc`` rule: sorted value at 1-based index ``ceil(q*n)``).

Two shapes, matching the two data layouts:

- ``grouped_quantiles``: per-key quantiles via the coarse hash
  co-group every other keyed op here uses (``_part = hash(key) % P``) —
  one vectorized numpy pass per partition (sort + run-offsets + index
  pick), P interpreter calls total.  Partitioning assumption: one
  key's rows fit in one partition.
- ``exact_quantiles_global``: whole-dataset quantiles over an INTEGER
  column with NO global sort: iterative histogram refinement.  Each
  round is one streaming pass that bins values against a broadcast
  edge table (``np.searchsorted`` per batch → per-batch ``bincount``
  partials → native groupby Sum, so only ≤n_bins rows ever reach the
  driver), after which every quantile's candidate range shrinks by
  ~n_bins×.  Integer values ⇒ ranges hit width 1 in
  O(log_bins(range)) rounds (2 for 32-bit-ish ranges) and the answer
  is EXACT — the scale-safe alternative to ``Dataset.sort`` + driver
  rank scan, which moves every row through an all-to-all.

Reference parity: widens the reference's scalar aggregate surface
(mean confidence, min/max counters — src/api.rs metrics) to the
distribution statistics a corpus-quality report needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _disc_index(n: np.ndarray | int, q: float) -> np.ndarray | int:
    """1-based ceil(q*n) clamped to [1, n], returned 0-based."""
    idx = np.ceil(q * np.asarray(n, dtype=np.float64)).astype(np.int64)
    return np.maximum(idx, 1) - 1


def grouped_quantiles(ds, key: str, value_col: str, qs: dict[str, float],
                      num_partitions: int = 32):
    """→ one row per key: ``key, <name>...`` with the exact discrete
    quantile of ``value_col`` for each ``name: q`` requested."""
    names = list(qs)

    def add_part(b: pa.Table) -> pa.Table:
        from .agg import _hash_part

        part = _hash_part(b[key], num_partitions)
        return pa.table({key: b[key], value_col: b[value_col],
                         "_part": pa.array(part, pa.int64())})

    def per_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending"),
                                            (value_col, "ascending")])
        t = t.take(idx)
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False)
        change = np.ones(len(t), bool)
        change[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, len(t)))
        cols = {key: pa.array(k[starts])}
        for name in names:
            pick = starts + _disc_index(counts, qs[name])
            cols[name] = pa.array(v[pick])
        return pa.table(cols)

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("_part")
              .map_groups(per_partition, batch_format="pyarrow"))


def _range_histogram(ds, col: str, edges: np.ndarray) -> np.ndarray:
    """One streaming pass: count of values per interval
    ``[edges[i], edges[i+1])`` (values outside [edges[0], edges[-1])
    are ignored).  Per-batch ``searchsorted`` + ``bincount`` partials,
    reduced by a native groupby Sum — ≤len(edges) rows to the driver."""
    import ray
    from ray.data.aggregate import Sum

    n_bins = len(edges) - 1
    ref = ray.put(edges)

    def partial(b: pa.Table) -> pa.Table:
        e = ray.get(ref)
        v = b[col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(e, v, side="right") - 1
        ok = (pos >= 0) & (pos < n_bins)
        cnt = np.bincount(pos[ok], minlength=n_bins)
        nz = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bin").aggregate(Sum("n", alias_name="n"))
              .take_all())
    out = np.zeros(n_bins, np.int64)
    for r in rows:
        out[r["bin"]] = r["n"]
    return out


def exact_quantiles_global(ds, col: str, qs: dict[str, float],
                           n_bins: int = 4096,
                           max_rounds: int = 12) -> dict[str, int]:
    """Exact discrete quantiles of an integer column, whole dataset.
    Pass floats through an integer scaling first (e.g. cents)."""
    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(Min(col, alias_name="lo"),
                         Max(col, alias_name="hi"),
                         Count(alias_name="n"))
    lo, hi, n = int(stats["lo"]), int(stats["hi"]), int(stats["n"])
    if n == 0:
        raise ValueError("empty dataset")
    # per-quantile state: rank (0-based, within [lo, hi]) + candidate
    # range [lo_q, hi_q] + count of dataset values below lo_q
    state = {name: {"rank": int(_disc_index(n, q)), "lo": lo, "hi": hi,
                    "below": 0} for name, q in qs.items()}
    for _ in range(max_rounds):
        open_names = [m for m, s in state.items() if s["lo"] < s["hi"]]
        if not open_names:
            break
        # one shared edge table over the union of open ranges
        edge_set: set[int] = set()
        for m in open_names:
            s = state[m]
            width = s["hi"] - s["lo"] + 1
            step = max(1, -(-width // n_bins))
            edge_set.update(range(s["lo"], s["hi"] + 1, step))
            edge_set.add(s["hi"] + 1)
        edges = np.array(sorted(edge_set), np.int64)
        counts = _range_histogram(ds, col, edges)
        cum = np.concatenate([[0], np.cumsum(counts)])
        for m in open_names:
            s = state[m]
            i0 = int(np.searchsorted(edges, s["lo"]))
            # rank relative to values ≥ current lo
            want = s["rank"] - s["below"]
            # find the interval containing the wanted rank
            rel = cum - cum[i0]
            j = int(np.searchsorted(rel, want, side="right")) - 1
            j = min(j, len(edges) - 2)
            s["below"] += int(rel[j])
            s["lo"] = int(edges[j])
            s["hi"] = int(edges[j + 1]) - 1
    out = {}
    for m, s in state.items():
        if s["lo"] != s["hi"]:
            raise RuntimeError(f"quantile {m} did not converge "
                               f"({s['lo']}..{s['hi']})")
        out[m] = s["lo"]
    return out


def quantile_report(ds, col: str, qs: dict[str, float],
                    scale: int = 1, n_bins: int = 4096) -> pd.DataFrame:
    """One-row DataFrame of global exact quantiles; ``scale`` converts
    a fixed-point float column to integers first (e.g. 100 = cents)."""
    if scale != 1:
        def to_int(b: pa.Table) -> pa.Table:
            v = b[col].to_numpy(zero_copy_only=False)
            return pa.table({col: pa.array(
                np.round(v * scale).astype(np.int64), pa.int64())})

        ds = ds.map_batches(to_int, batch_format="pyarrow")
    vals = exact_quantiles_global(ds, col, qs, n_bins=n_bins)
    return pd.DataFrame({m: [vals[m]] for m in qs})


def global_rank(ds, key: str, col: str, max_distinct: int = 2_000_000):
    """Exact global ``RANK() OVER (ORDER BY col)`` (SQL RANK: ties
    share the rank of the group's first row) over an integer-valued
    column with NO global sort.

    ``Dataset.sort`` + a driver rank scan would move every row through
    an all-to-all; instead ONE grouped count per distinct value runs
    (native groupby Count — combiner-backed), the bounded
    (value, count) table is cumulative-summed on the driver and
    broadcast, and each batch attaches its rank via one vectorized
    ``np.searchsorted``.  Exact-count gate (the DRIVER_CC_LIMIT
    pattern): raises if distinct values exceed ``max_distinct`` rather
    than OOMing the driver — ranks over a *measurement* column (length,
    score, count) have bounded distinct values by construction.

    → (key, col, rnk, n_rows), all int64."""
    import ray
    from ray.data.aggregate import Count

    counts = ds.groupby(col).aggregate(Count(alias_name="_n")).materialize()
    n_distinct = counts.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"global_rank: {n_distinct} distinct values of {col!r} exceed "
            f"max_distinct={max_distinct}; rank over a bounded-cardinality "
            "column or raise the gate")
    df = counts.to_pandas().sort_values(col, kind="mergesort")
    vals = df[col].to_numpy(np.int64)
    ns = df["_n"].to_numpy(np.int64)
    total = int(ns.sum())
    ranks = np.ones(len(ns), np.int64)
    ranks[1:] = 1 + np.cumsum(ns[:-1])
    ref = ray.put((vals, ranks))

    def attach(b: pa.Table) -> pa.Table:
        v_sorted, r_sorted = ray.get(ref)
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(v_sorted, v)
        return pa.table({
            key: b[key], col: b[col],
            "rnk": pa.array(r_sorted[idx]),
            "n_rows": pa.array(np.full(len(b), total, np.int64)),
        })

    return ds.map_batches(attach, batch_format="pyarrow")


def grouped_weighted_median(ds, key: str, val: str, weight: str,
                            num_partitions: int = 32):
    """Exact per-key LOWER WEIGHTED MEDIAN of an integer value column:
    the smallest ``v`` whose running weight reaches ``(W+1)//2``
    (odd/even deterministic, no float midpoints) — the robust center
    a skew-heavy corpus statistic wants when rows carry multiplicity
    (bytes, quantities, repeat counts) and an unweighted median would
    over-count light rows.

    Shape: per-block (key, val) weight pre-sum combiner → ONE native
    groupby Sum (a hot value contributes ≤1 row per block) → one
    coarse co-group over ``key`` → per-partition vectorized sort +
    run-offset cumsum + searchsorted pick.  Only the distinct
    (key, val) table crosses the wire.

    → Dataset(key, wmedian int64, total_w int64).
    """
    from ray.data.aggregate import Sum

    from .agg import _hash_part  # shared coarse-partition helper

    def pre(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t[key].to_pandas(),
            "v": t[val].to_numpy(zero_copy_only=False).astype("int64"),
            "w": t[weight].to_numpy(zero_copy_only=False).astype("int64")})
        g = df.groupby(["k", "v"], sort=False)["w"].sum().reset_index()
        return pa.table({key: pa.array(g["k"], t[key].type),
                         val: pa.array(g["v"], pa.int64()),
                         "w": pa.array(g["w"], pa.int64())})

    counted = (ds.map_batches(pre, batch_format="pyarrow")
               .groupby([key, val]).aggregate(Sum("w", alias_name="w")))

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_part", pa.array(
            _hash_part(b[key], num_partitions), pa.int64()))

    def pick(g: pa.Table) -> pa.Table:
        k = g[key].to_numpy(zero_copy_only=False)
        v = g[val].to_numpy(zero_copy_only=False).astype(np.int64)
        w = g["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, k))
        k, v, w = k[order], v[order], w[order]
        change = np.ones(len(k), bool)
        change[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(k))
        cum = np.cumsum(w)
        base = np.repeat(cum[starts] - w[starts], ends - starts)
        run_cum = cum - base                      # per-key running weight
        totals = run_cum[ends - 1]
        tgt = (totals + 1) // 2
        # first index in each run where run_cum >= tgt
        med_idx = np.empty(len(starts), np.int64)
        for i, (s, e) in enumerate(zip(starts, ends)):
            med_idx[i] = s + np.searchsorted(run_cum[s:e], tgt[i])
        return pa.table({
            key: pa.array(k[starts], g[key].type),
            "wmedian": pa.array(v[med_idx], pa.int64()),
            "total_w": pa.array(totals, pa.int64())})

    return (counted.map_batches(tag, batch_format="pyarrow")
            .groupby("_part").map_groups(pick, batch_format="pyarrow"))


def sampled_quantiles(ds, id_col: str, val_col: str,
                      qs: "dict[str, float]", s: int = 4096):
    """Approximate global quantiles from an ORDER-INVARIANT uniform
    sample: keep the ``s`` rows with the smallest splitmix64(id)
    priorities (a bottom-k sketch — deterministic, mergeable by min,
    bit-identical at any parallelism, the same invariance argument as
    ``ops/kmv``), then read each quantile off the sorted sampled
    values with the discrete ceil(q·n) rule.

    The crawl-scale path when ``exact_quantiles_global``'s integer
    histogram refinement doesn't apply (float/unbounded values) and a
    full ``Dataset.sort`` is off the table: error is the usual
    O(1/√s) sampling band, but — unlike KLL/t-digest, whose output
    depends on merge order — the selected SAMPLE is a pure function
    of the id set, so results replay exactly in SQL and never drift
    across parallelism.

    Shape: one streaming pass with a per-block partial bottom-``s``
    (≤ s rows leave each block), one sort+limit over the ≤ s·n_blocks
    partials, one driver-side selection over s rows.  → DataFrame
    (name, value) in ``qs`` insertion order."""
    from .dedup import _mix64

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pri = _mix64(ids.astype(np.uint64))
        vals = b[val_col].to_numpy(zero_copy_only=False)
        k = min(s, len(ids))
        sel = np.argpartition(pri, k - 1)[:k] if k < len(ids) else \
            np.arange(len(ids))
        # sign-flip keeps uint64 order under the int64 Dataset sort
        pri_sortable = (pri[sel] ^ np.uint64(1 << 63)).astype(np.int64)
        return pa.table({
            "pri": pa.array(pri_sortable, pa.int64()),
            "val": pa.array(vals[sel])})

    top = (ds.select_columns([id_col, val_col])
           .map_batches(partial, batch_format="pyarrow")
           .sort("pri").limit(s).to_pandas())
    vals = np.sort(top["val"].to_numpy())
    n = len(vals)
    out = [(name, vals[_disc_index(n, q)]) for name, q in qs.items()]
    return pd.DataFrame(out, columns=["name", "value"])
