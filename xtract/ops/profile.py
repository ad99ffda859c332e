"""Dataset profiling — the data-quality summary a pipeline run ships
with its manifests (per-column null counts, ranges, cardinalities).

Shape: ONE streaming pass computes every column's per-block partials
(null count via Arrow metadata, typed min/max via ``pc.min_max``) into
one slim row per block; a single ``.aggregate(...)`` call with one
Min/Max/Sum per column folds them — the whole profile costs one scan
regardless of column count.  Exact distinct counts are optional
(``distinct=True``) because each needs its own groupby exchange; the
one-pass default pairs with `ops.sketch.approx_distinct` when an
estimate suffices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _to_str(v) -> "str | None":
    if v is None:
        return None
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return str(v)


def profile_dataset(ds, columns=None, distinct: bool = False):
    """→ pandas DataFrame (column, dtype, n_rows, n_nulls, min_val,
    max_val[, n_distinct]) — min/max rendered as strings (typed
    comparison happens in Arrow; rendering is presentation only)."""
    import pandas as pd

    schema = ds.schema()
    names = list(columns) if columns else list(schema.names)
    types = dict(zip(schema.names, schema.types))
    ds = ds.select_columns(names)

    def block_partial(t: pa.Table) -> pa.Table:
        cols: dict = {"_n": pa.array([len(t)], pa.int64())}
        for c in names:
            arr = t[c]
            cols[c + "__nulls"] = pa.array([arr.null_count], pa.int64())
            valid = arr.drop_null()
            if len(valid):
                mm = pc.min_max(valid)
                cols[c + "__min"] = pa.array([mm["min"].as_py()], types[c])
                cols[c + "__max"] = pa.array([mm["max"].as_py()], types[c])
            else:
                cols[c + "__min"] = pa.nulls(1, types[c])
                cols[c + "__max"] = pa.nulls(1, types[c])
        return pa.table(cols)

    def fold(t: pa.Table) -> pa.Table:
        """Merge partial rows (typed pc.min_max, null-safe — the native
        Min/Max aggregates trip on nullable string partials)."""
        if len(t) == 0:
            return t
        cols: dict = {"_n": pa.array(
            [pc.sum(t["_n"]).as_py() or 0], pa.int64())}
        for c in names:
            cols[c + "__nulls"] = pa.array(
                [pc.sum(t[c + "__nulls"]).as_py() or 0], pa.int64())
            for side, red in (("__min", "min"), ("__max", "max")):
                valid = t[c + side].drop_null()
                if len(valid):
                    v = pc.min_max(valid)[red].as_py()
                    cols[c + side] = pa.array([v], types[c])
                else:
                    cols[c + side] = pa.nulls(1, types[c])
        return pa.table(cols)

    rows = (ds.map_batches(block_partial, batch_format="pyarrow")
            .map_batches(fold, batch_format="pyarrow", batch_size=4096)
            .take_all())  # ≤ n_blocks/4096 one-row partials
    merged = fold(pa.Table.from_pylist(rows, schema=pa.schema(
        [("_n", pa.int64())]
        + [f for c in names for f in
           ((c + "__nulls", pa.int64()), (c + "__min", types[c]),
            (c + "__max", types[c]))])))
    row = merged.to_pylist()[0]

    n_rows = int(row["_n"] or 0)
    out = {"column": [], "dtype": [], "n_rows": [], "n_nulls": [],
           "min_val": [], "max_val": []}
    for c in names:
        out["column"].append(c)
        out["dtype"].append(str(types[c]))
        out["n_rows"].append(n_rows)
        out["n_nulls"].append(int(row[c + "__nulls"] or 0))
        out["min_val"].append(_to_str(row[c + "__min"]))
        out["max_val"].append(_to_str(row[c + "__max"]))
    df = pd.DataFrame(out)
    if distinct:
        from ray.data.aggregate import Count

        nd = []
        for c in names:
            # exact: block-unique combiner → one slim groupby per
            # column (documented extra pass).  Nulls are dropped before
            # the exchange (Ray's groupby sort can't compare None) and
            # counted back as one group, matching Arrow group-by
            # semantics (null is its own distinct value).
            def uniq(t: pa.Table, c=c) -> pa.Table:
                return pa.table({c: t[c].combine_chunks()
                                 .drop_null().unique()})

            n = (ds.select_columns([c])
                 .map_batches(uniq, batch_format="pyarrow")
                 .groupby(c).aggregate(Count(alias_name="_c")).count())
            nd.append(n + (1 if df.loc[df["column"] == c,
                                       "n_nulls"].iloc[0] > 0 else 0))
        df["n_distinct"] = pd.Series(nd, dtype="int64")
    return df


def fd_candidates(ds, columns, sep: str = "\x1f"):
    """Exact functional-dependency discovery over ``columns`` →
    Dataset(col_a, col_b, n_lhs, n_pairs, fd_holds) for every ordered
    pair: ``fd_holds`` iff A → B (each distinct A value maps to
    exactly one B value, i.e. COUNT(DISTINCT A) == COUNT(DISTINCT
    (A, B))) — the data-quality rule miner that belongs next to
    `profile_dataset` (is url → host? is orderkey → custkey?).

    Shape: ONE streaming pass emits each block's DISTINCT
    (pair, A-value, B-value) string rows (np.unique combiner — a hot
    value contributes ≤1 row per block per pair), then one
    ``groupby`` finishes global distinctness and two slim aggregates
    fold to per-pair counts.  The exchange is Σ|distinct (A,B)| over
    the pairs — the inherent cost of EXACT FD mining (values travel
    as strings, no hash-collision risk).  Null values render as the
    string 'None' (deterministic; pick non-null columns or treat the
    sentinel as a value).  ``sep`` (default unit-separator \\x1f) must
    not occur inside the LEFT column's rendered values — the joint-key
    encoding splits on its first occurrence.
    """
    from ray.data.aggregate import Count, Max, Sum

    names = list(columns)
    pairs = [(a, b) for a in names for b in names if a != b]
    pair_id = {p: i for i, p in enumerate(pairs)}

    def partial(t: pa.Table) -> pa.Table:
        arrs = {c: pc.cast(t[c], pa.string()).to_numpy(
            zero_copy_only=False).astype(str) for c in names}
        pid_out, va_out, vb_out = [], [], []
        for (a, b), pid in pair_id.items():
            joint = np.char.add(np.char.add(arrs[a], sep), arrs[b])
            u = np.unique(joint)
            sp = np.char.partition(u, sep)
            pid_out.append(np.full(len(u), pid, np.int64))
            va_out.append(sp[:, 0])
            vb_out.append(sp[:, 2])
        return pa.table({
            "pid": pa.array(np.concatenate(pid_out), pa.int64()),
            "va": pa.array(np.concatenate(va_out).tolist(), pa.string()),
            "vb": pa.array(np.concatenate(vb_out).tolist(), pa.string())})

    distinct_ab = (ds.select_columns(names)
                   .map_batches(partial, batch_format="pyarrow")
                   .groupby(["pid", "va", "vb"])
                   .aggregate(Count(alias_name="_c"))
                   .select_columns(["pid", "va"]))
    per_lhs = distinct_ab.groupby(["pid", "va"]).aggregate(
        Count(alias_name="n_b"))
    per_pair = per_lhs.groupby("pid").aggregate(
        Count(alias_name="n_lhs"),
        Sum("n_b", alias_name="n_pairs"),
        Max("n_b", alias_name="max_b"))

    def finish(t: pa.Table) -> pa.Table:
        pid = t["pid"].to_numpy(zero_copy_only=False)
        return pa.table({
            "col_a": pa.array([pairs[i][0] for i in pid], pa.string()),
            "col_b": pa.array([pairs[i][1] for i in pid], pa.string()),
            "n_lhs": pc.cast(t["n_lhs"], pa.int64()),
            "n_pairs": pc.cast(t["n_pairs"], pa.int64()),
            "fd_holds": pc.equal(t["max_b"], pa.scalar(1, pa.int64()))})

    return per_pair.map_batches(finish, batch_format="pyarrow")
