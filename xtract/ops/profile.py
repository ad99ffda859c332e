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
