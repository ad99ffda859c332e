"""Relational composition ops Ray Data lacks natively: broadcast hash
join, as-of join, windowed aggregates over an event log.

Partitioning assumptions (documented per the custom-operator rule):

- ``broadcast_join``: the right side fits in the object store on every
  node (dimension tables).  One ``ray.put``, lookups per batch — no
  shuffle.
- ``asof_join_broadcast``: same broadcast assumption; the right side is
  pre-sorted per key ONCE in the driver, each batch does a vectorized
  ``np.searchsorted`` per key group.  For a large right side, the scale
  path is bucket-by-key + ``merge_asof`` inside ``map_groups``
  (both sides hash-partitioned on the key, sorted by ts within bucket).
- ``tumbling_window``: keyless time bucketing is embarrassingly
  parallel (a strftime/floor inside map_batches); the groupby that
  follows shuffles only (window, key, partial) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _as_pa_type(t) -> pa.DataType:
    """Schema type → Arrow DataType.  A Dataset whose blocks are pandas
    (e.g. the output of another co-group join) reports numpy dtypes and
    ``object`` for strings in ``schema().types``; normalize so the
    null-pad / dtype-restore paths always hold real Arrow types (flat
    columns only, per the join contract — ``object`` means string)."""
    if isinstance(t, pa.DataType):
        return t
    if t is object or t is str:
        return pa.string()
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError, ValueError):
        return pa.string()


def _to_nullable(series: "pd.Series", pa_type) -> "pd.Series":
    """Cast a possibly-NaN-upcast column to the pandas NULLABLE dtype
    matching its true Arrow type (Int64/Int32/... survive missing rows
    without a float64 upcast and round-trip to Arrow as int + null)."""
    if pa.types.is_integer(pa_type):
        name = ("UInt" if pa.types.is_unsigned_integer(pa_type)
                else "Int") + str(pa_type.bit_width)
        try:
            return series.astype(name)
        except (TypeError, ValueError):
            return series
    try:
        return series.astype(pa_type.to_pandas_dtype())
    except (TypeError, ValueError):
        return series


def broadcast_join(ds, right_df: "pd.DataFrame", left_key: str, right_key: str,
                   columns: list[str]):
    """Left join a small dimension table onto a Dataset without a
    shuffle: ship once via ray.put, dict-lookup per batch."""
    import ray

    lookup = {k: tuple(vals) for k, *vals in
              right_df[[right_key] + columns].itertuples(index=False)}
    ref = ray.put(lookup)

    def attach(b: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        keys = b[left_key].to_pylist()
        rows = [lk.get(k) for k in keys]
        out = b
        for ci, cname in enumerate(columns):
            out = out.append_column(
                cname, pa.array([r[ci] if r else None for r in rows]))
        return out

    return ds.map_batches(attach, batch_format="pyarrow")


def asof_join_broadcast(ds, right_df: "pd.DataFrame", left_key: str,
                        left_ts: str, right_key: str, right_ts: str,
                        value_cols: list[str], suffix: str = "_asof"):
    """As-of join: for each left row, the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same key.  Right side is
    broadcast; per key the timestamps are pre-sorted so each batch is a
    vectorized searchsorted."""
    import ray

    prepared: dict = {}
    for k, g in right_df.sort_values(right_ts).groupby(right_key):
        prepared[k] = (g[right_ts].to_numpy(),
                       {c: g[c].to_numpy() for c in value_cols})
    ref = ray.put(prepared)

    def attach(b: pa.Table) -> pa.Table:
        pre = ray.get(ref)
        keys = b[left_key].to_pylist()
        tss = b[left_ts].to_pylist()
        out_vals: dict[str, list] = {c: [] for c in value_cols}
        for k, t in zip(keys, tss):
            entry = pre.get(k)
            if entry is None:
                for c in value_cols:
                    out_vals[c].append(None)
                continue
            ts_arr, cols = entry
            i = int(np.searchsorted(ts_arr, np.datetime64(t, "us")
                                    if not isinstance(t, (int, float)) else t,
                                    side="right")) - 1
            for c in value_cols:
                out_vals[c].append(cols[c][i] if i >= 0 else None)
        out = b
        for c in value_cols:
            out = out.append_column(c + suffix, pa.array(out_vals[c]))
        return out

    return ds.map_batches(attach, batch_format="pyarrow")


def asof_join_cogroup(left_ds, right_ds, key: str, left_ts: str,
                      right_ts: str, value_cols: list[str],
                      suffix: str = "_asof", num_partitions: int = 32):
    """As-of join where BOTH sides are large (no broadcast): for each
    left row, the right row with the greatest ``right_ts`` ≤
    ``left_ts`` within the same key.

    Shape: both sides are tagged with ``part = hash(key) % P`` (one
    hash exchange each — only the join key, timestamp, and requested
    value columns move) and co-grouped; each partition runs ONE
    ``pandas.merge_asof(by=key)`` — a cython merge over every key in
    the partition.  P interpreter calls total.  Tie rule: among right
    rows sharing (key, ts) the last under a (ts, *value_cols) sort
    wins (deterministic).

    Left columns all survive; matched values arrive as
    ``<col><suffix>``.  This is the scale path the broadcast variant's
    docstring promises for big right sides."""
    left_schema = left_ds.schema()
    left_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    rs = right_ds.schema()
    right_types = dict(zip(rs.names, rs.types))
    out_names = left_cols + [c + suffix for c in value_cols]

    def tag_left(b: pa.Table) -> pa.Table:
        from .agg import _hash_part

        part = _hash_part(b[key], num_partitions)
        cols = {"_part": pa.array(part, pa.int64()),
                "_side": pa.array(np.zeros(len(b), np.int8)),
                "_ts": b[left_ts]}
        for c in left_cols:
            cols["l_" + c] = b[c]
        for c in value_cols:
            cols["r_" + c] = pa.nulls(len(b), right_types[c])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        from .agg import _hash_part

        part = _hash_part(b[key], num_partitions)
        cols = {"_part": pa.array(part, pa.int64()),
                "_side": pa.array(np.ones(len(b), np.int8)),
                "_ts": pc.cast(b[right_ts], left_types[left_ts])}
        for c in left_cols:
            if c == key:
                cols["l_" + c] = b[key]
            else:
                cols["l_" + c] = pa.nulls(len(b), left_types[c])
        for c in value_cols:
            cols["r_" + c] = b[c]
        return pa.table(cols)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.select_columns(
            list(dict.fromkeys([key, right_ts] + value_cols))).map_batches(
            tag_right, batch_format="pyarrow"))

    def per_partition(t: pa.Table) -> pa.Table:
        # Split sides ARROW-side, then convert each side's OWN columns
        # to pandas: those are null-free, so int64 survives exactly.
        # (Converting the unioned table to pandas first would upcast
        # null-padded int columns to float64 and silently truncate
        # 64-bit keys/values beyond 2^53.)
        kcol = "l_" + key
        side = t["_side"]
        Lt = t.filter(pc.equal(side, 0))
        Rt = t.filter(pc.equal(side, 1))
        L = pd.DataFrame({"_ts": Lt["_ts"].to_pandas(),
                          **{"l_" + c: Lt["l_" + c].to_pandas()
                             for c in left_cols}})
        R = pd.DataFrame({"_ts": Rt["_ts"].to_pandas(),
                          kcol: Rt[kcol].to_pandas(),
                          **{"r_" + c: Rt["r_" + c].to_pandas()
                             for c in value_cols}})
        L = L.sort_values("_ts", kind="mergesort")
        R = R.sort_values(["_ts"] + ["r_" + c for c in value_cols],
                          kind="mergesort")
        if len(R):
            merged = pd.merge_asof(
                L[[kcol, "_ts"] + ["l_" + c for c in left_cols if c != key]],
                R[[kcol, "_ts"] + ["r_" + c for c in value_cols]],
                on="_ts", by=kcol, direction="backward")
        else:
            merged = L.copy()
            for c in value_cols:
                merged["r_" + c] = None
        out = {}
        for c in left_cols:
            out[c] = merged[("l_" + c) if c != key else kcol]
        # the left ts column round-trips through _ts
        out[left_ts] = merged["_ts"]
        for c in value_cols:
            out[c + suffix] = merged["r_" + c]
        res = pd.DataFrame({n: out[n] for n in out_names})
        # the union pads left columns with nulls on right-side rows,
        # which upcasts ints to float64 in pandas; the left rows
        # themselves are null-free, so restore the true dtypes
        for c in left_cols:
            try:
                res[c] = res[c].astype(left_types[c].to_pandas_dtype())
            except (TypeError, ValueError):
                pass
        # unmatched left rows hold null matches: pin integer value
        # columns to pandas nullable ints so the dtype is stable across
        # partitions (int64 + null in Arrow, never a float64 upcast)
        for c in value_cols:
            res[c + suffix] = _to_nullable(res[c + suffix], right_types[c])
        return res

    return (both.groupby("_part")
            .map_groups(per_partition, batch_format="pyarrow"))


def equi_join_cogroup(left_ds, right_ds, on: str, right_on: str | None = None,
                      how: str = "inner", num_partitions: int = 32,
                      suffix: str = "_r"):
    """Large-×-large equi-join via hash co-group — the robust
    alternative to native ``Dataset.join`` (which crashes on Ray 2.49
    when a partition gets zero blocks for one side): both sides tag
    ``part = hash(key) % P``, union, and each partition runs ONE cython
    ``pandas.merge``.  Flat columns only (project nested payloads out
    first); left columns keep their names, clashing right columns get
    ``suffix``."""
    right_on = right_on or on
    lnames = list(left_ds.schema().names)
    rnames = list(right_ds.schema().names)
    ltypes = dict(zip(lnames, map(_as_pa_type, left_ds.schema().types)))
    rtypes = dict(zip(rnames, map(_as_pa_type, right_ds.schema().types)))

    def tag(b: pa.Table, side: int, key: str) -> pa.Table:
        from .agg import _hash_part

        part = _hash_part(b[key], num_partitions)
        n = len(b)
        cols = {"_part": pa.array(part, pa.int64()),
                "_side": pa.array(np.full(n, side, np.int8))}
        for c in lnames:
            cols["l_" + c] = b[c] if side == 0 else pa.nulls(n, ltypes[c])
        for c in rnames:
            cols["r_" + c] = b[c] if side == 1 else pa.nulls(n, rtypes[c])
        return pa.table(cols)

    both = left_ds.map_batches(lambda b: tag(b, 0, on),
                               batch_format="pyarrow").union(
        right_ds.map_batches(lambda b: tag(b, 1, right_on),
                             batch_format="pyarrow"))

    out_right = [c for c in rnames if c != right_on]

    def per_partition(t: pa.Table) -> pd.DataFrame:
        # Split sides ARROW-side, then convert each side's OWN columns
        # to pandas: those are null-free, so dtypes (incl. 64-bit int
        # keys beyond 2^53) survive exactly.  Converting the unioned
        # table to pandas first would upcast the null-padded key
        # columns to float64 and silently collide distinct 64-bit keys.
        side = t["_side"]
        Lt = t.filter(pc.equal(side, 0))
        Rt = t.filter(pc.equal(side, 1))
        L = pd.DataFrame({c: Lt["l_" + c].to_pandas() for c in lnames})
        R = pd.DataFrame({c: Rt["r_" + c].to_pandas() for c in rnames})
        if how in ("outer", "right") and right_on != on and on not in rnames:
            # merge on ONE shared key name so pandas coalesces the key
            # natively (union of both sides, dtype preserved — int64
            # keys beyond 2^53 survive; a combine_first after the merge
            # would round-trip unmatched keys through float64)
            merged = L.merge(R.rename(columns={right_on: on}), how=how,
                             on=on, suffixes=("", suffix))
        else:
            merged = L.merge(R, how=how, left_on=on, right_on=right_on,
                             suffixes=("", suffix))
            if right_on != on and right_on in merged.columns:
                if how in ("outer", "right"):
                    merged[on] = merged[on].combine_first(merged[right_on])
                    merged[on] = _to_nullable(merged[on], ltypes[on])
                merged = merged.drop(columns=[right_on])
        if how != "inner":
            # unmatched rows reintroduce nulls in right columns; pin
            # integer columns to pandas nullable ints so the block
            # schema is stable across partitions (a partition where
            # every row matched would otherwise emit int64 while its
            # neighbor emits float64)
            for c in out_right:
                name = c if c in merged.columns else c + suffix
                if name in merged.columns:
                    merged[name] = _to_nullable(merged[name], rtypes[c])
            if how in ("outer", "right"):
                # right-unmatched rows null-pad LEFT columns symmetrically
                for c in lnames:
                    if c != on and c in merged.columns:
                        merged[c] = _to_nullable(merged[c], ltypes[c])
        return merged

    return both.groupby("_part").map_groups(per_partition,
                                            batch_format="pyarrow")


def tumbling_window(ds, ts_col: str, every: str = "day",
                    keys: list[str] | None = None, aggs=None):
    """Tumbling event-time window: bucket ts (strftime) inside
    map_batches, then a small grouped aggregate over (window, keys)."""
    from ray.data.aggregate import Count

    fmt = {"hour": "%Y-%m-%d %H:00", "day": "%Y-%m-%d",
           "month": "%Y-%m"}[every]

    def bucket(b: pa.Table) -> pa.Table:
        return b.append_column("window", pc.strftime(b[ts_col], format=fmt))

    g = ds.map_batches(bucket, batch_format="pyarrow").groupby(
        ["window"] + (keys or []))
    return g.aggregate(*(aggs or [Count(alias_name="n_events")]))


def _us_i64(col) -> pa.ChunkedArray:
    """Timestamp column → int64 MICROseconds regardless of the stored
    unit (pandas-origin datasets carry ns, parquet carries us)."""
    t = col.type
    if pa.types.is_timestamp(t) and t.unit != "us":
        col = pc.cast(col, pa.timestamp("us", tz=t.tz))
    return pc.cast(col, pa.int64())


def hopping_window(ds, ts_col: str, width_minutes: int, hop_minutes: int,
                   keys: list[str] | None = None, aggs=None):
    """Hopping (sliding) event-time window: width W, hop H, W % H == 0.
    Each event belongs to exactly W/H windows; the replication is a
    vectorized ``np.repeat`` fanout inside ``map_batches`` (no shuffle
    amplification beyond the k× partial rows), then ONE grouped
    aggregate over (window_start, keys).  ``window_start`` = epoch
    seconds of the window's left edge (int64) — hash-stable across
    engines, format driver-side if a human string is wanted.

    Scale shape: the fanout factor k = W/H is a constant (4 for 1h/15m);
    the shuffle after it moves (window, keys, partial) rows only, same
    as ``tumbling_window``.  Reference parity: the window surface of
    tesseract-rs job metrics (src/api.rs progress windows) widened to
    the standard streaming hop semantics."""
    from ray.data.aggregate import Count

    if width_minutes % hop_minutes:
        raise ValueError("width must be a multiple of hop")
    k = width_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    def explode(b: pa.Table) -> pa.Table:
        us = _us_i64(b[ts_col]).to_numpy(zero_copy_only=False)
        n = len(b)
        rep = np.repeat(np.arange(n, dtype=np.int64), k)
        base = (us // hop_us) * hop_us
        starts = base[rep] - np.tile(np.arange(k, dtype=np.int64), n) * hop_us
        out = b.take(pa.array(rep))
        return out.append_column("window_start",
                                 pa.array(starts // 1_000_000, pa.int64()))

    g = ds.map_batches(explode, batch_format="pyarrow").groupby(
        ["window_start"] + (keys or []))
    return g.aggregate(*(aggs or [Count(alias_name="n_events")]))


def interval_join_count(left_ds, left_ts: str, right_ds, right_start: str,
                        width_minutes: int, id_cols: list[str],
                        out_col: str = "n_matches"):
    """Keyless interval/range join, count form: for every left row,
    how many right intervals ``[start, start + width)`` contain
    ``left_ts``.  (With a shared equi key, use ``equi_join_cogroup`` +
    a range filter instead; this operator is for the no-key case Ray
    Data cannot express at all.)

    Shape: bucket time by DAY.  Left rows go to their single bucket;
    each right interval is replicated to every day bucket it touches
    (variable-count ``np.repeat`` — fanout ≤ ceil(width/1d)+1, a
    constant).  ONE co-group by bucket, then a per-partition
    two-``searchsorted`` count over the sorted right starts:
    ``#(start ≤ ts) − #(start ≤ ts − width)``.  No pair materialization
    — a left row in a bucket with a million open intervals still costs
    O(log m).  Partitioning assumption: one day's rows fit a partition;
    finer time skew needs a smaller bucket unit."""
    width_us = width_minutes * 60 * 1_000_000
    day_us = 86_400 * 1_000_000

    def tag_left(b: pa.Table) -> pa.Table:
        us = _us_i64(b[left_ts])
        u = us.to_numpy(zero_copy_only=False)
        cols = {"_bucket": pa.array(u // day_us, pa.int64()),
                "_side": pa.array(np.zeros(len(b), np.int8)),
                "_us": us}
        for c in id_cols:
            cols["l_" + c] = b[c]
        return pa.table(cols)

    left_types = dict(zip(left_ds.schema().names, left_ds.schema().types))

    def tag_right(b: pa.Table) -> pa.Table:
        u = _us_i64(b[right_start]).to_numpy(zero_copy_only=False)
        d0 = u // day_us
        d1 = (u + width_us) // day_us
        counts = (d1 - d0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        # offset within each run: index − run start
        starts_of_run = np.repeat(np.cumsum(counts) - counts, counts)
        off = np.arange(len(rep), dtype=np.int64) - starts_of_run
        cols = {"_bucket": pa.array(d0[rep] + off, pa.int64()),
                "_side": pa.array(np.ones(len(rep), np.int8)),
                "_us": pa.array(u[rep], pa.int64())}
        for c in id_cols:
            cols["l_" + c] = pa.nulls(len(rep), left_types[c])
        return pa.table(cols)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.select_columns([right_start]).map_batches(
            tag_right, batch_format="pyarrow"))

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t["_side"]
        Lt = t.filter(pc.equal(side, 0))
        Rt = t.filter(pc.equal(side, 1))
        ts = Lt["_us"].to_numpy(zero_copy_only=False)
        starts = np.sort(Rt["_us"].to_numpy(zero_copy_only=False))
        n = (np.searchsorted(starts, ts, side="right")
             - np.searchsorted(starts, ts - width_us, side="right"))
        cols = {c: Lt["l_" + c] for c in id_cols}
        cols[out_col] = pa.array(n.astype(np.int64), pa.int64())
        return pa.table(cols)

    return both.groupby("_bucket").map_groups(per_bucket,
                                              batch_format="pyarrow")


def semi_join_cogroup(left_ds, right_ds, on: str, right_on: str | None = None,
                      anti: bool = False, num_partitions: int = 32):
    """Large-×-large semi / anti join: keep left rows whose key does
    (semi) or does not (anti) appear on the right — the blocklist /
    allowlist filter shape when the right side is too big to broadcast.

    Only the right KEY column moves (slim projection); both sides tag
    ``part = hash(key) % P`` and each partition runs one vectorized
    ``pc.is_in`` over the partition-local right key set.  For a small
    right side prefer ``anti_join_broadcast`` (no shuffle at all)."""
    right_on = right_on or on
    lnames = list(left_ds.schema().names)

    def tag_left(b: pa.Table) -> pa.Table:
        from .agg import _hash_part

        part = _hash_part(b[on], num_partitions)
        cols = {"_part": pa.array(part, pa.int64()),
                "_side": pa.array(np.zeros(len(b), np.int8))}
        for c in lnames:
            cols[c] = b[c]
        return pa.table(cols)

    ltypes = dict(zip(lnames, left_ds.schema().types))

    def tag_right(b: pa.Table) -> pa.Table:
        from .agg import _hash_part

        part = _hash_part(b[right_on], num_partitions)
        n = len(b)
        cols = {"_part": pa.array(part, pa.int64()),
                "_side": pa.array(np.ones(n, np.int8))}
        for c in lnames:
            cols[c] = (pc.cast(b[right_on], ltypes[on]) if c == on
                       else pa.nulls(n, ltypes[c]))
        return pa.table(cols)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.select_columns([right_on]).map_batches(
            tag_right, batch_format="pyarrow"))

    def per_partition(t: pa.Table) -> pa.Table:
        side = t["_side"]
        Lt = t.filter(pc.equal(side, 0))
        rkeys = t.filter(pc.equal(side, 1))[on]
        member = pc.fill_null(pc.is_in(Lt[on], value_set=pc.unique(
            rkeys.combine_chunks())), False)
        keep = pc.invert(member) if anti else member
        return Lt.filter(keep).drop_columns(["_part", "_side"])

    return both.groupby("_part").map_groups(per_partition,
                                            batch_format="pyarrow")


def _bloom_hashes(col: pa.ChunkedArray) -> np.ndarray:
    """Stable uint64 hashes of a key column (splitmix64 for ints,
    vectorized siphash for strings) — shared by build and probe."""
    import pandas as pd

    from .dedup import _mix64

    if pa.types.is_integer(col.type):
        # nulls → sentinel 0 (they can only ever create a false
        # positive, which the exact verify pass then eliminates)
        return _mix64(pc.fill_null(pc.cast(col, pa.int64()), 0)
                      .to_numpy(zero_copy_only=False).astype(np.uint64))
    vals = np.asarray(col.to_pylist(), dtype=object)
    return _mix64(pd.util.hash_array(vals).astype(np.uint64))


def _bloom_probe(bitmap: np.ndarray, h: np.ndarray, p_bits: int,
                 k: int) -> np.ndarray:
    """Vectorized membership test: True = possibly present."""
    m = np.uint64(1 << p_bits)
    h1 = h % m
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd → full-cycle stride
    hit = np.ones(len(h), bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        bits = (bitmap[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        hit &= bits.astype(bool)
    return hit


def bloom_semi_join(left_ds, right_ds, on: str, right_on: str | None = None,
                    anti: bool = False, p_bits: int = 24, k: int = 4,
                    num_partitions: int = 32):
    """Semi / anti join with a Bloom prefilter: EXACT results (the
    bloom only prunes; survivors are verified by the co-group join),
    but the broadcast is a FIXED-SIZE bitmap — 2^p_bits bits (2 MiB at
    the default) no matter how many keys the right side has, unlike a
    broadcast key set.  The scale shape for highly selective joins:

    1. build: one streaming pass over the right KEY column sets k bits
       per key into a per-block bitmap (``np.bitwise_or`` folds); an
       OR-reduction tree (``map_batches`` over bitmap rows) hands the
       driver O(n_blocks/fold) rows, the final OR ships once via
       ``ray.put``.
    2. prefilter: one vectorized probe per left batch.  semi: only
       bloom-positive rows (true matches + ε false positives) enter
       the co-group exchange — the shuffle shrinks from |left| to
       ~|matches|.  anti: bloom-NEGATIVE rows are definitely
       unmatched and short-circuit out with NO shuffle at all; only
       the positives go through the exact anti co-group.
    3. verify: ``semi_join_cogroup`` on the survivors — false
       positives are eliminated, so the result equals the plain join.

    False-positive rate ≈ (1 − e^(−k·n/2^p_bits))^k — size p_bits to
    the right key cardinality (24 → <1% at 2 M keys)."""
    import ray

    right_on = right_on or on
    nbytes = (1 << p_bits) >> 3
    m = np.uint64(1 << p_bits)

    def block_bitmap(t: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, np.uint8)
        h = _bloom_hashes(t[right_on].combine_chunks().drop_null())
        h1 = h % m
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % m
            np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (pos & np.uint64(7))
                             .astype(np.uint8))
        return pa.table({"bm": pa.FixedSizeListArray.from_arrays(
            pa.array(bm, pa.uint8()), nbytes)})

    def or_fold(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        mat = (t["bm"].combine_chunks().flatten()
               .to_numpy(zero_copy_only=False).reshape(len(t), nbytes))
        return pa.table({"bm": pa.FixedSizeListArray.from_arrays(
            pa.array(np.bitwise_or.reduce(mat, axis=0), pa.uint8()),
            nbytes)})

    rows = (right_ds.select_columns([right_on])
            # explicit large batch: one bitmap per ~256k keys, NOT one
            # per input block — small filtered blocks otherwise emit
            # thousands of 2 MiB bitmap rows (measured 6× slowdown)
            .map_batches(block_bitmap, batch_format="pyarrow",
                         batch_size=262_144)
            .map_batches(or_fold, batch_format="pyarrow", batch_size=64)
            .map_batches(or_fold, batch_format="pyarrow", batch_size=64)
            .take_all())  # two fold levels: ≤ n_keys/256k/4096 rows
    # reach the driver (2 MiB each at the default p_bits — bounded
    # even at millions of input blocks)
    bitmap = np.zeros(nbytes, np.uint8)
    for r in rows:
        bitmap |= np.asarray(r["bm"], np.uint8)
    ref = ray.put(bitmap)

    def prefilter(t: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        hit = _bloom_probe(bm, _bloom_hashes(t[on].combine_chunks()),
                           p_bits, k)
        return t.filter(pa.array(hit))

    def negatives(t: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        hit = _bloom_probe(bm, _bloom_hashes(t[on].combine_chunks()),
                           p_bits, k)
        return t.filter(pa.array(~hit))

    positives = left_ds.map_batches(prefilter, batch_format="pyarrow")
    verified = semi_join_cogroup(positives, right_ds, on, right_on,
                                 anti=anti, num_partitions=num_partitions)
    if not anti:
        return verified
    # anti: definite non-members (no shuffle) ∪ verified false positives
    return left_ds.map_batches(negatives,
                               batch_format="pyarrow").union(verified)


def anti_join_broadcast(ds, col: str, keys, max_keys: int = 5_000_000,
                        semi: bool = False):
    """Broadcast anti/semi filter: ship the (small, gate-checked) key
    set once via ``ray.put``, one vectorized ``pc.is_in`` per batch —
    no shuffle.  Refuses loudly above ``max_keys`` (the exact-count
    gate pattern) instead of OOMing the object store."""
    import ray

    keys = list(keys)
    if len(keys) > max_keys:
        raise ValueError(
            f"broadcast key set has {len(keys)} entries (> {max_keys}); "
            "use semi_join_cogroup for corpus-scale right sides")
    ref = ray.put(pa.array(sorted(keys)))

    def keep(b: pa.Table) -> pa.Table:
        member = pc.is_in(b[col], value_set=ray.get(ref))
        return b.filter(member if semi else
                        pc.invert(pc.fill_null(member, False)))

    return ds.map_batches(keep, batch_format="pyarrow")


def _add_key_part(b: pa.Table, key: str, num_partitions: int) -> pa.Table:
    from .agg import _hash_part

    part = _hash_part(b[key], num_partitions)
    return b.append_column("_part", pa.array(part, pa.int64()))


def session_windows(ds, key: str, ts_col: str, gap_minutes: int = 30,
                    num_partitions: int = 32):
    """Session windows over an event log: per key, events sorted by
    (ts, event_id); a gap > ``gap_minutes`` starts a new session.
    → (key, session_id, n_events).

    Shape: hash co-group by ``key`` into P coarse partitions, then ONE
    pandas pass per partition — sort by (key, ts, event_id), flag gaps,
    per-key cumulative session ids via cython ``groupby.cumsum`` — so
    the interpreter runs P times, not once per key (the round-1
    per-key ``map_groups`` was a Python call per user).  Partitioning
    assumption: one key's events live in one partition (guaranteed by
    the hash); a pathologically hot key needs ts-range pre-bucketing."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, "event_id"],
                          kind="mergesort").reset_index(drop=True)
        ts = g[ts_col].to_numpy()
        k = g[key].to_numpy()
        new_s = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            same_key = k[1:] == k[:-1]
            new_s[1:] = (~same_key | (np.diff(ts) > gap)).astype(np.int64)
        g = pd.DataFrame({key: k, "new_s": new_s})
        g["session_id"] = g.groupby(key, sort=False)["new_s"].cumsum()
        out = (g.groupby([key, "session_id"], sort=True)
               .size().rename("n_events").reset_index())
        return out

    return (ds.map_batches(lambda b: _add_key_part(b, key, num_partitions),
                           batch_format="pyarrow")
              .groupby("_part")
              .map_groups(per_partition, batch_format="pandas"))


def windowed_running(ds, key: str, ts_col: str, value_col: str,
                     round_to: int = 2, num_partitions: int = 32):
    """Per-key ordered running aggregate (row_number + cumulative sum) —
    same coarse co-group shape as ``session_windows``: one vectorized
    pandas pass (cython ``cumcount``/``cumsum``) per partition covers
    every key in it."""
    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, "event_id"],
                          kind="mergesort").reset_index(drop=True)
        grp = g.groupby(key, sort=False)
        return pd.DataFrame({
            key: g[key],
            "event_id": g["event_id"],
            "seq": grp.cumcount().to_numpy() + 1,
            "running_value": grp[value_col].cumsum().round(round_to),
        })

    return (ds.map_batches(lambda b: _add_key_part(b, key, num_partitions),
                           batch_format="pyarrow")
              .groupby("_part")
              .map_groups(per_partition, batch_format="pandas"))


def lag_lead_gaps(ds, key: str, ts_col: str, num_partitions: int = 32):
    """Per-key LAG/LEAD: time gap to the previous and next event in
    integer microseconds — the offset-window-function pair
    (``session_windows`` covers gap *sessionization*, ``windowed_running``
    covers cumulative frames; this exposes the raw offsets).
    → (key, event_id, gap_prev_us, gap_next_us), null at each key's
    first/last event.

    Shape: the same coarse hash co-group as every keyed window here —
    ``_part = hash(key) % P``, ONE pandas pass per partition (sort by
    (key, ts, event_id), cython ``groupby.shift(±1)`` on nullable Int64
    microseconds), so the interpreter runs P times.  Integer µs keeps
    the arithmetic bit-exact vs the SQL ``epoch_us`` oracle (no float
    timestamps anywhere).  Partitioning assumption: one key's events
    fit in one partition."""
    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, "event_id"],
                          kind="mergesort").reset_index(drop=True)
        us = pd.Series(g[ts_col].to_numpy().astype("datetime64[us]")
                       .astype(np.int64)).astype("Int64")
        grp = us.groupby(g[key].to_numpy(), sort=False)
        return pd.DataFrame({
            key: g[key],
            "event_id": g["event_id"],
            "gap_prev_us": us - grp.shift(1),
            "gap_next_us": grp.shift(-1) - us,
        })

    return (ds.map_batches(lambda b: _add_key_part(b, key, num_partitions),
                           batch_format="pyarrow")
              .groupby("_part")
              .map_groups(per_partition, batch_format="pandas"))


def rolling_window_sum(ds, key: str, ts_col: str, value_col: str,
                       window_rows: int, num_partitions: int = 32):
    """Per-key FIXED-size rolling frame (``ROWS BETWEEN k-1 PRECEDING
    AND CURRENT ROW``) — the bounded-frame complement of
    ``windowed_running``'s unbounded cumulative frame.
    → (key, event_id, roll_sum_cents, n_in_window).

    Bit-exactness: values go to integer cents up front
    (``round(v*100) → int64``) and the rolling sum is the cumsum
    difference ``cs[i] − cs[i−k]`` per key — pure int64 arithmetic, no
    float accumulation order to diverge from the SQL oracle.  Same
    coarse hash co-group as every keyed window here; one cython
    ``groupby.cumsum``/``shift`` pass per partition.  Partitioning
    assumption: one key's events fit in one partition."""
    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, "event_id"],
                          kind="mergesort").reset_index(drop=True)
        cents = pd.Series(
            np.round(g[value_col].to_numpy() * 100).astype(np.int64))
        grp = cents.groupby(g[key].to_numpy(), sort=False)
        cs = grp.cumsum()
        lagged = cs.groupby(g[key].to_numpy(), sort=False) \
                   .shift(window_rows).fillna(0).astype(np.int64)
        seq = grp.cumcount().to_numpy()
        return pd.DataFrame({
            key: g[key],
            "event_id": g["event_id"],
            "roll_sum_cents": (cs - lagged).astype(np.int64),
            "n_in_window": np.minimum(seq + 1, window_rows)
                             .astype(np.int64),
        })

    return (ds.map_batches(lambda b: _add_key_part(b, key, num_partitions),
                           batch_format="pyarrow")
              .groupby("_part")
              .map_groups(per_partition, batch_format="pandas"))


def range_window_sum(ds, key: str, ts_col: str, value_col: str,
                     width_minutes: int, num_partitions: int = 32):
    """Per-key TIME-RANGE rolling frame (``RANGE BETWEEN INTERVAL w
    PRECEDING AND CURRENT ROW`` — inclusive both ends, peers with the
    current timestamp included), the interval complement of
    ``rolling_window_sum``'s row frame.
    → (key, event_id, range_sum_cents, n_in_range).

    Fully vectorized per partition — NO per-key Python: rows sorted by
    (key, ts) are encoded onto one monotonic int64 axis
    ``code·SPAN + (ts − ts_min)`` (key runs occupy disjoint ranges), so
    ONE pair of ``np.searchsorted`` calls finds every row's frame
    bounds, and the sum is a prefix-sum difference in integer cents.
    The window-start probe clips at the key's own origin, so a frame
    can never leak into the previous key's range."""
    w_us = np.int64(width_minutes) * 60 * 1_000_000

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, "event_id"],
                          kind="mergesort").reset_index(drop=True)
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.round(g[value_col].to_numpy() * 100).astype(np.int64)
        codes = pd.factorize(g[key].to_numpy(), sort=False)[0] \
                  .astype(np.int64)
        us_min = us.min()
        span = np.int64(us.max() - us_min + 2)
        comb = codes * span + (us - us_min)
        probe = codes * span + (np.maximum(us - w_us, us_min) - us_min)
        lo = np.searchsorted(comb, probe, side="left")
        hi = np.searchsorted(comb, comb, side="right")
        cs = np.concatenate([[0], np.cumsum(cents)])
        return pd.DataFrame({
            key: g[key],
            "event_id": g["event_id"],
            "range_sum_cents": (cs[hi] - cs[lo]).astype(np.int64),
            "n_in_range": (hi - lo).astype(np.int64),
        })

    return (ds.map_batches(lambda b: _add_key_part(b, key, num_partitions),
                           batch_format="pyarrow")
              .groupby("_part")
              .map_groups(per_partition, batch_format="pandas"))


def ranked_ntile(ds, key: str, ts_col: str, n_tiles: int = 4,
                 num_partitions: int = 32):
    """Per-key rank + NTILE bucket (SQL semantics: with n rows and k
    tiles, the first ``n % k`` tiles hold ``n//k + 1`` rows).
    → (key, event_id, rank, tile), rank 1-based under (ts, event_id).
    One cython cumcount + vectorized bucket arithmetic per partition."""
    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, "event_id"],
                          kind="mergesort").reset_index(drop=True)
        grp = g.groupby(key, sort=False)
        rank = grp.cumcount().to_numpy().astype(np.int64)       # 0-based
        n = grp[ts_col].transform("size").to_numpy().astype(np.int64)
        size, rem = n // n_tiles, n % n_tiles
        big = rem * (size + 1)
        tile = np.where(rank < big,
                        rank // np.maximum(size + 1, 1),
                        np.where(size > 0, rem + (rank - big) // size, rank))
        return pd.DataFrame({
            key: g[key],
            "event_id": g["event_id"],
            "rank": rank + 1,
            "tile": tile.astype(np.int64) + 1,
        })

    return (ds.map_batches(lambda b: _add_key_part(b, key, num_partitions),
                           batch_format="pyarrow")
              .groupby("_part")
              .map_groups(per_partition, batch_format="pandas"))


def range_lookup_broadcast(ds, value_col: str, ranges, lo_col: str = "lo",
                           hi_col: str = "hi", label_col: str = "label",
                           out_col: str | None = None,
                           default: str | None = None):
    """Non-equi broadcast range join: attach the label of the (unique)
    half-open range ``[lo, hi)`` containing ``value_col``.

    The classic enrichment lookup (IP→geo blocks, value→price band,
    ts→release window) that SQL writes as ``JOIN r ON v >= lo AND
    v < hi``.  Partitioning assumption: the ranges table is a
    *dimension* (thousands of rows, not corpus-scale) and is broadcast
    once via ``ray.put``; ranges must be non-overlapping.  Per batch
    the probe is ONE vectorized ``np.searchsorted`` — no shuffle, no
    per-row Python.

    ``ranges``: pandas DataFrame / pyarrow Table with lo/hi/label
    columns.  Rows whose value falls in no range get ``default``
    (None → null)."""
    import ray

    if isinstance(ranges, pa.Table):
        ranges = ranges.to_pandas()
    r = ranges.sort_values(lo_col, kind="mergesort")
    lo = r[lo_col].to_numpy()
    hi = r[hi_col].to_numpy()
    if (hi[:-1] > lo[1:]).any() if len(r) > 1 else False:
        raise ValueError("range_lookup_broadcast: overlapping ranges")
    labels = r[label_col].to_numpy(dtype=object)
    ref = ray.put((lo, hi, labels))
    out_name = out_col or label_col

    def attach(b: pa.Table) -> pa.Table:
        lo_a, hi_a, lab_a = ray.get(ref)
        v = b[value_col].to_numpy(zero_copy_only=False)
        if len(lo_a) == 0:
            out = np.full(len(b), default, dtype=object)
        else:
            idx = np.searchsorted(lo_a, v, side="right") - 1
            safe = np.clip(idx, 0, len(lo_a) - 1)
            inside = (idx >= 0) & (v < hi_a[safe])
            out = np.where(inside, lab_a[safe], default)
        return b.append_column(out_name, pa.array(out.tolist(), pa.string()))

    return ds.map_batches(attach, batch_format="pyarrow")


def gap_filled_daily_counts(ds, ts_col: str, key_col: str):
    """Calendar gap fill: daily counts per key with EVERY day of the
    corpus's [min, max] date range present for EVERY key (missing
    days = 0) — the dense series a trend/anomaly stage needs.

    Shape: ONE distributed grouped Count over (key, epoch-day) — the
    only corpus-scale pass — then the dense (keys × days) grid is
    constructed from that bounded aggregate (dimension tables, not
    data tables) and counts are stitched in with a vectorized
    searchsorted.  Nothing corpus-proportional leaves the cluster.
    → pandas DataFrame (key, day 'YYYY-MM-DD', n_events int64).
    """
    import datetime

    from ray.data.aggregate import Count

    def to_day(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "k": b[key_col],
            "d": pa.array(us // 86_400_000_000, pa.int64())})

    days = ds.map_batches(to_day, batch_format="pyarrow")
    counts = (days.groupby(["k", "d"])
              .aggregate(Count(alias_name="n")).to_pandas())
    if len(counts) == 0:
        return pd.DataFrame({"k": pd.Series([], dtype=object),
                             "day": pd.Series([], dtype=object),
                             "n_events": pd.Series([], dtype="int64")})
    lo, hi = int(counts["d"].min()), int(counts["d"].max())
    keys = np.sort(counts["k"].unique())
    drange = np.arange(lo, hi + 1, dtype=np.int64)
    grid_k = np.repeat(keys, len(drange))
    grid_d = np.tile(drange, len(keys))
    # stitch counts into the grid: exact-match searchsorted on the
    # (key_idx, day) composite
    kidx = {k: i for i, k in enumerate(keys)}
    comp_grid = (np.arange(len(keys), dtype=np.int64)
                 .repeat(len(drange)) * (hi - lo + 1) + (grid_d - lo))
    comp_cnt = (counts["k"].map(kidx).to_numpy(np.int64)
                * (hi - lo + 1) + (counts["d"].to_numpy(np.int64) - lo))
    order = np.argsort(comp_cnt)
    comp_cnt = comp_cnt[order]
    nvals = counts["n"].to_numpy(np.int64)[order]
    pos = np.searchsorted(comp_cnt, comp_grid)
    pos_c = np.minimum(pos, len(comp_cnt) - 1)
    hit = comp_cnt[pos_c] == comp_grid
    n = np.zeros(len(comp_grid), np.int64)
    n[hit] = nvals[pos_c[hit]]
    epoch = datetime.date(1970, 1, 1)
    day_str = np.array([(epoch + datetime.timedelta(days=int(d)))
                        .isoformat() for d in drange], dtype=object)
    return pd.DataFrame({
        "k": grid_k,
        "day": np.tile(day_str, len(keys)),
        "n_events": n})


def cumulative_distinct(ds, key: str, ts_col: str, val_col: str,
                        id_col: str = "event_id",
                        num_partitions: int = 32):
    """Running COUNT(DISTINCT val) per key — at each event, how many
    distinct values the key has produced SO FAR (inclusive).  The
    exploration-breadth window (how many distinct event types has
    this user touched by time t) that plain frames can't express.

    → (key, id_col, n_distinct_so_far:int64).  Determinism: events
    order by (ts, id) within a key; a value's FIRST occurrence flags
    1, duplicates 0, and the running sum is the answer — exactly the
    ``SUM(first_flag) OVER (...)`` rewrite the DuckDB oracle uses
    (COUNT(DISTINCT) OVER is not a thing in most engines).

    Shape: ONE coarse hash co-group; per partition one mergesort +
    one ``duplicated()`` + one grouped ``cumsum`` (all cython) —
    Python runs P times.  Partitioning assumption: one key's events
    fit in one partition.
    """
    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        first = ~g.duplicated([key, val_col])
        run = first.astype("int64").groupby(
            g[key].to_numpy(), sort=False).cumsum()
        return pd.DataFrame({
            key: g[key],
            id_col: g[id_col],
            "n_distinct_so_far": run.astype("int64"),
        })

    return (ds.select_columns([key, ts_col, val_col, id_col])
            .map_batches(lambda b: _add_key_part(b, key, num_partitions),
                         batch_format="pyarrow")
            .groupby("_part")
            .map_groups(per_partition, batch_format="pandas")
            .select_columns([key, id_col, "n_distinct_so_far"]))


def skew_join(left_ds, right_ds, on: str, right_on: str | None = None,
              hot_count: int = 100_000, max_hot_keys: int = 100_000,
              max_hot_right_rows: int = 2_000_000,
              num_partitions: int = 32, suffix: str = "_r",
              return_stats: bool = False):
    """Skew-aware large×large INNER equi-join.

    A plain hash co-group sends every row of a hot key to ONE
    partition: a key holding 10% of a 10^12-row fact table turns a
    32-way co-group into a single straggler doing 10^11-row merges.
    This operator splits the key space by measured LEFT-side frequency:

    - **Cold keys** (< ``hot_count`` rows) take the normal
      ``equi_join_cogroup`` path.
    - **Hot keys** (≥ ``hot_count``) never enter the shuffle — the
      RIGHT side's rows for exactly those keys (small by the usual
      fact×dimension skew shape) are broadcast once via ``ray.put``,
      and hot left rows merge against them inside ``map_batches``,
      spread over ALL partitions instead of piling onto one.

    Both paths produce rows identical to
    ``equi_join_cogroup(how="inner")``; the union is the full join in
    arbitrary order.  Frequency measurement is itself skew-proof: a
    per-block ``value_counts`` combiner emits ≤1 row per (block, key)
    before the slim ``groupby(key).Sum`` exchange.

    Fail-loud gates (the ``DRIVER_CC_LIMIT`` pattern): the number of
    hot keys is bounded by n_left / hot_count by construction, but
    both the hot-key list (``max_hot_keys``) and the broadcast right
    rows (``max_hot_right_rows``) are exact-counted BEFORE any
    ``take_all`` and raise instead of OOMing the driver.

    Reference parity anchor: the skew mechanism of
    ``pipeline.extract_pages`` (oversized-document salting) applied to
    the relational tier; tesseract-rs has no join surface
    (src/api.rs processes documents independently).
    """
    import ray
    from ray.data.aggregate import Sum

    right_on = right_on or on
    lnames = list(left_ds.schema().names)
    rnames = list(right_ds.schema().names)

    def count_partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b[on])
        return pa.table({on: vc.field("values"),
                         "_n": pc.cast(vc.field("counts"), pa.int64())})

    freq = (left_ds.select_columns([on])
            .map_batches(count_partial, batch_format="pyarrow")
            .groupby(on).aggregate(Sum("_n", alias_name="_n")))
    hot = freq.map_batches(
        lambda b: b.filter(pc.greater_equal(b["_n"],
                                            pa.scalar(int(hot_count)))),
        batch_format="pyarrow")
    n_hot = hot.count()
    stats = {"n_hot_keys": int(n_hot)}
    if n_hot == 0:
        out = equi_join_cogroup(left_ds, right_ds, on=on,
                                right_on=right_on, how="inner",
                                num_partitions=num_partitions,
                                suffix=suffix)
        return (out, stats) if return_stats else out
    if n_hot > max_hot_keys:
        raise RuntimeError(
            f"skew_join: {n_hot} hot keys exceeds max_hot_keys="
            f"{max_hot_keys}; raise hot_count or the gate")
    hot_keys = pa.array(
        sorted(r[on] for r in hot.take_all()),
        type=_as_pa_type(left_ds.schema().types[lnames.index(on)]))
    stats["hot_keys"] = hot_keys.to_pylist()

    right_hot_ds = right_ds.map_batches(
        lambda b: b.filter(pc.is_in(b[right_on], value_set=hot_keys)),
        batch_format="pyarrow")
    n_rh = right_hot_ds.count()
    stats["n_hot_right_rows"] = int(n_rh)
    if n_rh > max_hot_right_rows:
        raise RuntimeError(
            f"skew_join: {n_rh} right rows on hot keys exceeds "
            f"max_hot_right_rows={max_hot_right_rows}; the hot side "
            f"is large on BOTH sides — use salted_join instead")
    # column-wise conversion keeps int64 keys exact (no null-pad here,
    # but mirror equi_join_cogroup's dtype discipline)
    rh_tbl = pa.concat_tables(
        list(right_hot_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=65536)),
        promote_options="default") if n_rh else None
    R_hot = (pd.DataFrame({c: rh_tbl[c].to_pandas() for c in rnames})
             if n_rh else pd.DataFrame(
                 {c: pd.Series(dtype="object") for c in rnames}))
    ref = ray.put(R_hot)

    def merge_hot(b: pa.Table) -> pd.DataFrame:
        keep = b.filter(pc.is_in(b[on], value_set=hot_keys))
        L = pd.DataFrame({c: keep[c].to_pandas() for c in lnames})
        R = ray.get(ref)
        merged = L.merge(R, how="inner", left_on=on, right_on=right_on,
                         suffixes=("", suffix))
        if right_on != on and right_on in merged.columns:
            merged = merged.drop(columns=[right_on])
        return merged

    left_cold = left_ds.map_batches(
        lambda b: b.filter(
            pc.invert(pc.is_in(b[on], value_set=hot_keys))),
        batch_format="pyarrow")
    right_cold = right_ds.map_batches(
        lambda b: b.filter(
            pc.invert(pc.is_in(b[right_on], value_set=hot_keys))),
        batch_format="pyarrow")
    hot_joined = left_ds.map_batches(merge_hot, batch_format="pyarrow")
    cold_joined = equi_join_cogroup(left_cold, right_cold, on=on,
                                    right_on=right_on, how="inner",
                                    num_partitions=num_partitions,
                                    suffix=suffix)
    out = hot_joined.union(cold_joined)
    return (out, stats) if return_stats else out


def salted_join(left_ds, right_ds, on: str, right_on: str | None = None,
                hot_count: int = 100_000, n_salts: int = 16,
                max_hot_keys: int = 100_000, num_partitions: int = 32,
                suffix: str = "_r", return_stats: bool = False):
    """Fragment-replicate ("salted") INNER equi-join for keys hot on
    BOTH sides — the path :func:`skew_join` raises toward when the
    right side's hot rows are too large to broadcast.

    Public technique (Pig's skewed join / Spark salting): every hot
    key picks a **fragment side** (its LARGER side by measured
    frequency) and a **replicate side** (the smaller).  Fragment rows
    carry one salt in ``0..n_salts-1``; replicate rows are emitted
    once per salt.  Cold keys carry salt 0 on both sides.  ONE hash
    co-group on ``(key, salt)`` then runs a cython ``pandas.merge``
    per partition, so a hot key's work spreads over ``n_salts``
    partitions and per-partition memory is bounded by the SMALLER
    side's rows per hot key — never the product.  Each (left-row,
    right-row) pair meets in exactly one partition, so the output
    multiset equals ``equi_join_cogroup(how="inner")`` at any
    parallelism and any ``n_salts``.

    Frequency measurement is the skew-proof combiner shape
    (per-block ``value_counts`` → slim ``groupby().Sum``); the hot-key
    table is exact-counted against ``max_hot_keys`` BEFORE any
    ``take_all`` (the ``DRIVER_CC_LIMIT`` pattern).

    Reference parity anchor: generalizes ``pipeline.extract_pages``'s
    oversized-document salting to the relational tier; tesseract-rs
    has no join surface (src/api.rs processes documents
    independently)."""
    import ray
    from ray.data.aggregate import Sum

    from .agg import _hash_part

    right_on = right_on or on
    lnames = list(left_ds.schema().names)
    rnames = list(right_ds.schema().names)
    ltypes = dict(zip(lnames, map(_as_pa_type, left_ds.schema().types)))
    rtypes = dict(zip(rnames, map(_as_pa_type, right_ds.schema().types)))
    key_type = ltypes[on]

    def freq_of(ds, key: str):
        def count_partial(b: pa.Table) -> pa.Table:
            vc = pc.value_counts(b[key])
            return pa.table({"k": pc.cast(vc.field("values"), key_type),
                             "_n": pc.cast(vc.field("counts"), pa.int64())})
        return (ds.select_columns([key])
                .map_batches(count_partial, batch_format="pyarrow")
                .groupby("k").aggregate(Sum("_n", alias_name="_n")))

    lfreq = freq_of(left_ds, on).materialize()
    rfreq = freq_of(right_ds, right_on).materialize()

    def hot_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["_n"],
                                         pa.scalar(int(hot_count))))

    lhot = lfreq.map_batches(hot_only, batch_format="pyarrow").materialize()
    rhot = rfreq.map_batches(hot_only, batch_format="pyarrow").materialize()
    n_hot = lhot.count() + rhot.count()  # upper bound (union may overlap)
    if n_hot > max_hot_keys:
        raise RuntimeError(
            f"salted_join: {n_hot} hot-key rows exceed max_hot_keys="
            f"{max_hot_keys}; raise hot_count or the gate")
    ln_map = {r["k"]: int(r["_n"]) for r in lhot.take_all()}
    hot_keys = set(ln_map)
    rn_map: dict = {}
    for r in rhot.take_all():
        rn_map[r["k"]] = int(r["_n"])
        hot_keys.add(r["k"])
    if not hot_keys:
        out = equi_join_cogroup(left_ds, right_ds, on=on,
                                right_on=right_on, how="inner",
                                num_partitions=num_partitions,
                                suffix=suffix)
        stats = {"n_hot_keys": 0, "n_frag_left": 0, "n_frag_right": 0}
        return (out, stats) if return_stats else out
    # exact counts for hot keys missing from one side's hot table
    # (hot on the OTHER side only) come from the full freq tables,
    # pulled via a bounded is_in filter — never a full take_all.
    for freq, m in ((lfreq, ln_map), (rfreq, rn_map)):
        need = [k for k in hot_keys if k not in m]
        if need:
            na = pa.array(sorted(need), type=key_type)
            got = freq.map_batches(
                lambda b, _na=na: b.filter(pc.is_in(b["k"], value_set=_na)),
                batch_format="pyarrow").take_all()
            for r in got:
                m[r["k"]] = int(r["_n"])
    # fragment the LARGER side (ties fragment left)
    frag_left = sorted(k for k in hot_keys
                       if ln_map.get(k, 0) >= rn_map.get(k, 0))
    frag_right = sorted(k for k in hot_keys
                        if ln_map.get(k, 0) < rn_map.get(k, 0))
    fl_arr = pa.array(frag_left, type=key_type)
    fr_arr = pa.array(frag_right, type=key_type)
    stats = {"n_hot_keys": len(hot_keys),
             "n_frag_left": len(frag_left),
             "n_frag_right": len(frag_right)}
    route_ref = ray.put((fl_arr, fr_arr))
    S = int(n_salts)

    def tag(b: pa.Table, side: int, key: str) -> pa.Table:
        fl, fr = ray.get(route_ref)
        frag_arr = fl if side == 0 else fr   # this side fragments
        repl_arr = fr if side == 0 else fl   # this side replicates
        is_repl = pc.is_in(b[key], value_set=repl_arr)
        single = b.filter(pc.invert(is_repl))
        n1 = len(single)
        salt1 = np.where(
            pc.is_in(single[key], value_set=frag_arr)
            .to_numpy(zero_copy_only=False),
            np.arange(n1, dtype=np.int64) % S, 0)
        pieces, salts = [single], [salt1]
        repl = b.filter(is_repl)
        if len(repl):
            for s in range(S):
                pieces.append(repl)
                salts.append(np.full(len(repl), s, np.int64))
        full = pa.concat_tables(pieces, promote_options="none")
        salt = np.concatenate(salts)
        hp = _hash_part(full[key], num_partitions)
        part = (hp + salt) % np.int64(num_partitions)
        n = len(full)
        cols = {"_part": pa.array(part, pa.int64()),
                "_salt": pa.array(salt, pa.int64()),
                "_side": pa.array(np.full(n, side, np.int8))}
        for c in lnames:
            cols["l_" + c] = full[c] if side == 0 else pa.nulls(n, ltypes[c])
        for c in rnames:
            cols["r_" + c] = full[c] if side == 1 else pa.nulls(n, rtypes[c])
        return pa.table(cols)

    both = left_ds.map_batches(lambda b: tag(b, 0, on),
                               batch_format="pyarrow").union(
        right_ds.map_batches(lambda b: tag(b, 1, right_on),
                             batch_format="pyarrow"))

    def per_partition(t: pa.Table) -> pd.DataFrame:
        side = t["_side"]
        Lt = t.filter(pc.equal(side, 0))
        Rt = t.filter(pc.equal(side, 1))
        L = pd.DataFrame({c: Lt["l_" + c].to_pandas() for c in lnames})
        L["_salt"] = Lt["_salt"].to_pandas()
        R = pd.DataFrame({c: Rt["r_" + c].to_pandas() for c in rnames})
        R["_salt"] = Rt["_salt"].to_pandas()
        merged = L.merge(R, how="inner", left_on=[on, "_salt"],
                         right_on=[right_on, "_salt"],
                         suffixes=("", suffix))
        merged = merged.drop(columns=["_salt"])
        if right_on != on and right_on in merged.columns:
            merged = merged.drop(columns=[right_on])
        return merged

    out = both.groupby("_part").map_groups(per_partition,
                                           batch_format="pyarrow")
    return (out, stats) if return_stats else out
