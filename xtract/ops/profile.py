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


def expectation_report(ds, rules: "list[dict]", num_partitions: int = 32):
    """Data-quality assertion audit (the expectations gate a corpus
    pipeline runs before committing a snapshot): evaluate declarative
    rules and return one row per rule with its violation count —
    counts, not booleans, so regressions are quantifiable.

    Rule kinds (each a dict with ``name``, ``kind``, ``col`` + extras):

    - ``not_null``: violations = null rows;
    - ``in_range`` (``lo``/``hi`` inclusive): non-null rows outside;
    - ``regex_match`` (``pattern``): non-null rows NOT fully matching;
    - ``accepted_values`` (``values``): non-null rows outside the set;
    - ``unique``: rows participating in any duplicated value (Σ n over
      values with n > 1).

    Shape: every non-unique rule evaluates in ONE shared streaming
    pass (vectorized Arrow kernels, per-block partial counts → native
    Sum); each ``unique`` rule adds one slim pre-counted groupby over
    its value column.  → Dataset(rule, n_violations, n_checked).
    """
    from ray.data.aggregate import Sum

    scan_rules = [r for r in rules if r["kind"] != "unique"]
    uniq_rules = [r for r in rules if r["kind"] == "unique"]
    cols = sorted({r["col"] for r in rules})

    def scan(b: pa.Table) -> pa.Table:
        names, viols, checked = [], [], []
        n = len(b)
        for r in scan_rules:
            c = b[r["col"]]
            nulls = pc.is_null(c)
            n_null = int(pc.sum(pc.cast(nulls, pa.int64())).as_py() or 0)
            kind = r["kind"]
            if kind == "not_null":
                bad = n_null
            elif kind == "in_range":
                ok = pc.and_(pc.greater_equal(c, r["lo"]),
                             pc.less_equal(c, r["hi"]))
                n_ok = int(pc.sum(pc.cast(
                    pc.fill_null(ok, False), pa.int64())).as_py() or 0)
                bad = n - n_null - n_ok
            elif kind == "regex_match":
                ok = pc.match_substring_regex(
                    c, "^(?:" + r["pattern"] + ")$")
                n_ok = int(pc.sum(pc.cast(
                    pc.fill_null(ok, False), pa.int64())).as_py() or 0)
                bad = n - n_null - n_ok
            elif kind == "accepted_values":
                ok = pc.is_in(c, value_set=pa.array(r["values"]))
                n_ok = int(pc.sum(pc.cast(
                    pc.fill_null(ok, False), pa.int64())).as_py() or 0)
                bad = n - n_null - n_ok
            else:
                raise ValueError(f"unknown rule kind {kind!r}")
            names.append(r["name"])
            viols.append(bad)
            checked.append(n)
        return pa.table({"rule": pa.array(names, pa.string()),
                         "n_violations": pa.array(viols, pa.int64()),
                         "n_checked": pa.array(checked, pa.int64())})

    parts = [ds.select_columns(cols).map_batches(
        scan, batch_format="pyarrow")] if scan_rules else []

    for r in uniq_rules:
        col = r["col"]

        def pre(b: pa.Table, _c=col) -> pa.Table:
            vals = b[_c].drop_null()
            un, cnt = np.unique(
                np.asarray(vals.to_pylist(), dtype=object),
                return_counts=True)
            nulls = len(b) - len(vals)
            t = pa.table({"v": pa.array(un.astype(str), pa.string()),
                          "n": pa.array(cnt, pa.int64()),
                          "rows": pa.array(
                              np.full(len(un), 0, np.int64), pa.int64())})
            # carry the block's row count on a sentinel row so
            # n_checked sums exactly once per block
            s = pa.table({"v": pa.array(["\x00rows"], pa.string()),
                          "n": pa.array([0], pa.int64()),
                          "rows": pa.array([len(b)], pa.int64())})
            _ = nulls
            return pa.concat_tables([t, s])

        counted = (ds.select_columns([col])
                   .map_batches(pre, batch_format="pyarrow")
                   .groupby("v")
                   .aggregate(Sum("n", alias_name="n"),
                              Sum("rows", alias_name="rows")))

        def fin(b: pa.Table, _name=r["name"]) -> pa.Table:
            n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            rows = int(b["rows"].to_numpy(
                zero_copy_only=False).astype(np.int64).sum())
            dup_rows = int(n[n > 1].sum())
            return pa.table({
                "rule": pa.array([_name], pa.string()),
                "n_violations": pa.array([dup_rows], pa.int64()),
                "n_checked": pa.array([rows], pa.int64())})

        # grouped distinct-value table is partition-bounded; the final
        # fold is one row — safe single-batch repartition
        parts.append(counted.repartition(1).map_batches(
            fin, batch_format="pyarrow"))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.groupby("rule").aggregate(
        Sum("n_violations", alias_name="n_violations"),
        Sum("n_checked", alias_name="n_checked"))
