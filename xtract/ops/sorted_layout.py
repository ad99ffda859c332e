"""Range-pruned sorted parquet layout: pay ONE global sort at write
time, then every range query reads only the files whose [min, max]
envelope overlaps the predicate — the sort-key/zone-map pattern
(Iceberg sort orders, parquet row-group statistics) and the
time-series complement of ``ops/bucketed`` (hash buckets prune point
lookups; sorted zones prune RANGE scans).

- ``write_sorted(ds, out_dir, col)``: ``ds.sort(col)`` (the one
  all-to-all, paid once) then a streaming writer pass; each block
  lands as one file and reports its (lo, hi, n) envelope.  The
  manifest is one JSON of per-file envelopes — a few hundred bytes
  per file, driver-safe at any corpus size.
- ``plan_range(out_dir, lo, hi)``: pure manifest math — the file
  subset a ``[lo, hi)`` predicate can touch.
- ``read_range(out_dir, lo, hi)``: Dataset over ONLY the planned
  files, then an exact vectorized filter (envelopes admit, the filter
  proves).  Files outside the range are never opened.

Timestamps are carried in the manifest as int64 epoch-microseconds
(JSON-safe); the exact filter runs on the native column type.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MANIFEST = "_sorted.json"


def _to_key(v, typ: pa.DataType):
    """Manifest-safe scalar: timestamps → epoch micros, else as-is."""
    if pa.types.is_timestamp(typ):
        return pc.cast(pa.scalar(v, typ), pa.int64()).as_py()
    return v


def _bound_scalar(v, typ: pa.DataType) -> pa.Scalar:
    if pa.types.is_timestamp(typ) and isinstance(v, int):
        return pc.cast(pa.scalar(v, pa.int64()), typ)
    return pa.scalar(v, typ)


def write_sorted(ds, out_dir: str, col: str) -> dict:
    """Sort once, write one file per block, record envelopes."""
    os.makedirs(out_dir, exist_ok=True)
    sch = ds.schema()
    typ = dict(zip(sch.names, sch.types))[col]

    key_typ = pa.int64() if pa.types.is_timestamp(typ) else typ

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "lo": pa.array([], key_typ),
                             "hi": pa.array([], key_typ),
                             "n": pa.array([], pa.int64())})
        mm = pc.min_max(t[col])
        tag = os.urandom(8).hex()
        name = f"part-{tag}.parquet"
        pq.write_table(t, os.path.join(out_dir, name))
        return pa.table({
            "file": pa.array([name], pa.string()),
            "lo": pa.array([_to_key(mm["min"].as_py(), typ)], key_typ),
            "hi": pa.array([_to_key(mm["max"].as_py(), typ)], key_typ),
            "n": pa.array([len(t)], pa.int64())})

    rows = (ds.sort(col)
            .map_batches(write_block, batch_format="pyarrow")
            .take_all())  # one tiny row per written file
    files = sorted(({"file": r["file"], "lo": r["lo"],
                     "hi": r["hi"], "n": int(r["n"])} for r in rows),
                   key=lambda r: (r["lo"], r["hi"], r["file"]))
    man = {"col": col, "timestamp": bool(pa.types.is_timestamp(typ)),
           "files": files, "n_rows": int(sum(f["n"] for f in files))}
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))
    return man


def _manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, MANIFEST)) as f:
        return json.load(f)


def _key_of(v, man: dict):
    """Normalize a query bound to manifest key space."""
    if man["timestamp"] and not isinstance(v, int):
        return pc.cast(pa.scalar(v, pa.timestamp("us")),
                       pa.int64()).as_py()
    return v


def plan_range(out_dir: str, lo=None, hi=None) -> "list[str]":
    """Files a half-open ``[lo, hi)`` range can touch (manifest only —
    no parquet is opened)."""
    man = _manifest(out_dir)
    lo_k = None if lo is None else _key_of(lo, man)
    hi_k = None if hi is None else _key_of(hi, man)
    out = []
    for f in man["files"]:
        if lo_k is not None and f["hi"] < lo_k:
            continue
        if hi_k is not None and f["lo"] >= hi_k:
            continue
        out.append(f["file"])
    return out


def read_range(out_dir: str, lo=None, hi=None):
    """→ Dataset of exactly the rows with ``lo <= col < hi``; only the
    envelope-overlapping files are read."""
    import ray.data as rd

    man = _manifest(out_dir)
    names = plan_range(out_dir, lo, hi)
    if not names:
        # preserve schema from any one file, yield zero rows
        any_f = man["files"][0]["file"] if man["files"] else None
        if any_f is None:
            raise ValueError(f"sorted layout at {out_dir} is empty")
        empty = pq.read_table(os.path.join(out_dir, any_f)).slice(0, 0)
        return rd.from_arrow(empty)
    ds = rd.read_parquet([os.path.join(out_dir, n) for n in names])
    col = man["col"]

    def exact(t: pa.Table) -> pa.Table:
        mask = None
        c = t[col]
        if lo is not None:
            mask = pc.greater_equal(c, _bound_scalar(
                _key_of(lo, man) if man["timestamp"] else lo, c.type))
        if hi is not None:
            m2 = pc.less(c, _bound_scalar(
                _key_of(hi, man) if man["timestamp"] else hi, c.type))
            mask = m2 if mask is None else pc.and_(mask, m2)
        return t if mask is None else t.filter(mask)

    return ds.map_batches(exact, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Z-ORDER (2-D) layout: one Morton-key sort co-locates rows close in
# BOTH dimensions, so per-file (min, max) envelopes on each column
# prune 2-D box queries — the multi-dimension generalization of the
# sort-key zone map above (Delta Lake/Iceberg ``ZORDER BY`` shape).
# The Morton bucketing only steers placement; envelopes are exact, so
# pruning is always sound regardless of scaling precision.
# ---------------------------------------------------------------------------

ZMANIFEST = "_zorder.json"
CMANIFEST = "_clustered.json"


def _doc_minhash(texts: pa.ChunkedArray) -> "object":
    """One 64-bit 3-token-shingle MinHash per document, fully
    vectorized: regex-split → one hash_array over ALL tokens →
    consecutive-triple mix within each document → per-doc min via
    ``np.minimum.at`` on list-parent indices.  Shingles (not unigrams)
    so a universally-shared stopword can't collapse the whole corpus
    onto one key; near-duplicate and same-boilerplate documents still
    collide or land adjacent after a sort on this key."""
    import numpy as np
    import pandas as pd

    lo = pc.utf8_lower(pc.fill_null(texts, ""))
    toks = pc.split_pattern_regex(lo, "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False)
    n = len(texts)
    out = np.full(n, np.iinfo(np.uint64).max, np.uint64)
    if len(flat):
        h = pd.util.hash_array(
            np.asarray(flat.to_pylist(), dtype=object))
        keep = np.asarray(
            pc.not_equal(flat, "").to_numpy(zero_copy_only=False))
        h, p = h[keep], parents[keep]
        if len(h) >= 3:
            same = (p[:-2] == p[2:])          # triple inside one doc
            tri = (h[:-2] * np.uint64(0x9E3779B97F4A7C15)
                   ^ h[1:-1] * np.uint64(0xC2B2AE3D27D4EB4F)
                   ^ h[2:])[same]
            np.minimum.at(out, p[:-2][same], tri)
        # short documents (<3 tokens) fall back to the unigram min
        short = np.flatnonzero(out == np.iinfo(np.uint64).max)
        if len(short):
            mask = np.isin(p, short)
            if mask.any():
                np.minimum.at(out, p[mask], h[mask])
    return out.view(np.int64)


def write_clustered(ds, out_dir: str, text_col: str,
                    rows_per_file: int = 65_536) -> dict:
    """Similarity-clustered write layout: ONE sort by a per-document
    MinHash key places near-duplicate / shared-boilerplate documents
    in the same files and pages, so parquet's dictionary and
    general-purpose compression see them together — a measurably
    smaller corpus at rest with zero semantic change (read-back is the
    same multiset of rows; order was never part of the contract).  The
    sort is the one all-to-all, paid at write time — the compression
    twin of ``write_sorted`` (zone maps) and ``write_zorder`` (2-D
    pruning)."""
    os.makedirs(out_dir, exist_ok=True)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_ckey", pa.array(_doc_minhash(t[text_col]), pa.int64()))

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "bytes": pa.array([], pa.int64())})
        t = t.drop_columns(["_ckey"])
        name = f"part-{os.urandom(8).hex()}.parquet"
        path = os.path.join(out_dir, name)
        pq.write_table(t, path)
        return pa.table({"file": pa.array([name], pa.string()),
                         "n": pa.array([len(t)], pa.int64()),
                         "bytes": pa.array([os.path.getsize(path)],
                                           pa.int64())})

    rows = (ds.map_batches(add_key, batch_format="pyarrow")
            .sort("_ckey")
            .map_batches(write_block, batch_format="pyarrow",
                         batch_size=rows_per_file)
            .take_all())  # one tiny accounting row per file
    files = sorted(({"file": r["file"], "n": int(r["n"]),
                     "bytes": int(r["bytes"])} for r in rows),
                   key=lambda r: r["file"])
    man = {"text_col": text_col, "files": files,
           "n_rows": int(sum(f["n"] for f in files)),
           "bytes": int(sum(f["bytes"] for f in files))}
    tmp = os.path.join(out_dir, CMANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(out_dir, CMANIFEST))
    return man


def as_i64(c):
    """Column → int64 key space (timestamps normalized to epoch us
    whatever the stored unit, so envelopes and query bounds agree)."""
    t = c.type
    if pa.types.is_timestamp(t) and t.unit != "us":
        c = pc.cast(c, pa.timestamp("us", tz=t.tz))
    return pc.cast(c, pa.int64())


def _spread16(x):
    """Spread the low 16 bits of a uint32 to even bit positions."""
    import numpy as np

    x = x.astype(np.uint32)
    x = (x | (x << np.uint32(8))) & np.uint32(0x00FF00FF)
    x = (x | (x << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    x = (x | (x << np.uint32(2))) & np.uint32(0x33333333)
    x = (x | (x << np.uint32(1))) & np.uint32(0x55555555)
    return x


def _morton(av, bv, a_mn, a_mx, b_mn, b_mx):
    """Vectorized 2×16-bit Morton key from raw int64 dims (float64
    scaling — bucket-approximate is fine, envelopes stay exact)."""
    import numpy as np

    def q16(v, mn, mx):
        span = float(mx - mn) or 1.0
        q = np.floor((v.astype(np.float64) - float(mn))
                     / span * 65535.0)
        return np.clip(q, 0, 65535).astype(np.uint32)

    return (_spread16(q16(av, a_mn, a_mx))
            | (_spread16(q16(bv, b_mn, b_mx)) << np.uint32(1))
            ).astype("int64")


def write_zorder(ds, out_dir: str, col_a: str, col_b: str,
                 rows_per_file: int = 65_536) -> dict:
    """Z-order ``ds`` by two numeric/timestamp columns: one cheap
    global Min/Max pass, one Morton-key sort (the single all-to-all,
    paid at write time), then a streaming writer; the manifest records
    each file's exact 2-D envelope."""
    import numpy as np
    from ray.data.aggregate import Max, Min

    os.makedirs(out_dir, exist_ok=True)
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    ts_a = pa.types.is_timestamp(types[col_a])
    ts_b = pa.types.is_timestamp(types[col_b])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table({"_a": as_i64(t[col_a]), "_b": as_i64(t[col_b])})

    mm = (ds.map_batches(slim, batch_format="pyarrow")
          .aggregate(Min("_a"), Max("_a"), Min("_b"), Max("_b")))
    a_mn, a_mx = mm["min(_a)"], mm["max(_a)"]
    b_mn, b_mx = mm["min(_b)"], mm["max(_b)"]

    def add_z(t: pa.Table) -> pa.Table:
        av = as_i64(t[col_a]).to_numpy()
        bv = as_i64(t[col_b]).to_numpy()
        return t.append_column(
            "_z", pa.array(_morton(av, bv, a_mn, a_mx, b_mn, b_mx),
                           pa.int64()))

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "env": pa.array([], pa.list_(pa.int64()))})
        t = t.drop_columns(["_z"])
        ma = pc.min_max(as_i64(t[col_a]))
        mb = pc.min_max(as_i64(t[col_b]))
        name = f"part-{os.urandom(8).hex()}.parquet"
        pq.write_table(t, os.path.join(out_dir, name))
        env = [ma["min"].as_py(), ma["max"].as_py(),
               mb["min"].as_py(), mb["max"].as_py()]
        return pa.table({"file": pa.array([name], pa.string()),
                         "n": pa.array([len(t)], pa.int64()),
                         "env": pa.array([env], pa.list_(pa.int64()))})

    rows = (ds.map_batches(add_z, batch_format="pyarrow")
            .sort("_z")
            .map_batches(write_block, batch_format="pyarrow",
                         batch_size=rows_per_file)
            .take_all())  # one tiny row per written file
    files = sorted(({"file": r["file"], "n": int(r["n"]),
                     "env": [int(v) for v in r["env"]]} for r in rows),
                   key=lambda r: (r["env"], r["file"]))
    man = {"col_a": col_a, "col_b": col_b,
           "ts_a": bool(ts_a), "ts_b": bool(ts_b), "files": files,
           "n_rows": int(sum(f["n"] for f in files))}
    tmp = os.path.join(out_dir, ZMANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(out_dir, ZMANIFEST))
    return man


def _zmanifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, ZMANIFEST)) as f:
        return json.load(f)


def _zkey(v, is_ts: bool):
    if is_ts and not isinstance(v, int):
        return pc.cast(pa.scalar(v, pa.timestamp("us")), pa.int64()).as_py()
    return v


def plan_box(out_dir: str, a_lo=None, a_hi=None, b_lo=None,
             b_hi=None) -> "list[str]":
    """Files a 2-D half-open box can touch (manifest math only)."""
    man = _zmanifest(out_dir)
    bounds = [None if v is None else _zkey(v, ts) for v, ts in
              ((a_lo, man["ts_a"]), (a_hi, man["ts_a"]),
               (b_lo, man["ts_b"]), (b_hi, man["ts_b"]))]
    al, ah, bl, bh = bounds
    out = []
    for f in man["files"]:
        amn, amx, bmn, bmx = f["env"]
        if al is not None and amx < al:
            continue
        if ah is not None and amn >= ah:
            continue
        if bl is not None and bmx < bl:
            continue
        if bh is not None and bmn >= bh:
            continue
        out.append(f["file"])
    return out


def read_box(out_dir: str, a_lo=None, a_hi=None, b_lo=None, b_hi=None):
    """→ Dataset of exactly the rows inside the box; only
    envelope-intersecting files are opened."""
    import ray.data as rd

    man = _zmanifest(out_dir)
    names = plan_box(out_dir, a_lo, a_hi, b_lo, b_hi)
    if not names:
        any_f = man["files"][0]["file"] if man["files"] else None
        if any_f is None:
            raise ValueError(f"zorder layout at {out_dir} is empty")
        empty = pq.read_table(os.path.join(out_dir, any_f)).slice(0, 0)
        return rd.from_arrow(empty)
    ds = rd.read_parquet([os.path.join(out_dir, n) for n in names])

    def exact(t: pa.Table) -> pa.Table:
        mask = pa.array([True] * len(t))
        for col, ts, lo, hi in ((man["col_a"], man["ts_a"], a_lo, a_hi),
                                (man["col_b"], man["ts_b"], b_lo, b_hi)):
            c = as_i64(t[col]) if ts else t[col]
            if lo is not None:
                mask = pc.and_(mask, pc.greater_equal(
                    c, pa.scalar(_zkey(lo, ts), c.type)))
            if hi is not None:
                mask = pc.and_(mask, pc.less(
                    c, pa.scalar(_zkey(hi, ts), c.type)))
        return t.filter(mask)

    return ds.map_batches(exact, batch_format="pyarrow")


def sorted_join(dir_a: str, dir_b: str, suffix: str = "_r"):
    """Zero-shuffle SORT-MERGE join of two range-sorted stores
    (`write_sorted` layout) on their sort columns → Dataset of inner-
    joined rows.  The range-layout complement of
    `bucketed.bucketed_join`: no exchange ever happens — the join
    plan pairs each LEFT file with exactly the RIGHT files whose
    key envelopes overlap it (manifest zone maps), and one Ray task
    per left file reads only that slice of the right side.

    Correctness: every left row lives in exactly one left file, so
    each (left, right) match is emitted exactly once; right files
    overlapping several left envelopes are re-read per overlap (cost
    bounded by key-range skew, the documented trade of range layout —
    rebalance with `write_sorted` if a store develops hot ranges).
    Left files whose envelope overlaps NO right file are never even
    opened at join time.
    """
    import pandas as pd
    import ray.data as rd

    ma, mb = _manifest(dir_a), _manifest(dir_b)
    key_a, key_b = ma["col"], mb["col"]

    plan = []
    for fa in ma["files"]:
        bs = [fb["file"] for fb in mb["files"]
              if fb["lo"] <= fa["hi"] and fb["hi"] >= fa["lo"]]
        if bs:
            plan.append({"a": fa["file"], "b": "\x1f".join(bs)})
    if not plan:
        # no overlapping envelopes: empty result, schema preserved
        # from zero-row slices of each side when files exist
        if ma["files"] and mb["files"]:
            A = pq.read_table(os.path.join(
                dir_a, ma["files"][0]["file"])).slice(0, 0).to_pandas()
            B = pq.read_table(os.path.join(
                dir_b, mb["files"][0]["file"])).slice(0, 0).to_pandas()
            m = A.merge(B, how="inner", left_on=key_a, right_on=key_b,
                        suffixes=("", suffix))
        else:
            m = pd.DataFrame()
        # go through Arrow: from_pandas drops a 0-row frame's schema
        return rd.from_arrow(pa.Table.from_pandas(
            m, preserve_index=False))

    def join_one(t: pa.Table) -> pd.DataFrame:
        out = []
        for a_file, b_join in zip(t["a"].to_pylist(),
                                  t["b"].to_pylist()):
            A = pq.read_table(os.path.join(dir_a, a_file)).to_pandas()
            B = pa.concat_tables(
                [pq.read_table(os.path.join(dir_b, f))
                 for f in b_join.split("\x1f")]).to_pandas()
            m = A.merge(B, how="inner", left_on=key_a, right_on=key_b,
                        suffixes=("", suffix))
            if len(m):
                out.append(m)
        if not out:
            return pd.DataFrame()
        return pd.concat(out, ignore_index=True)

    items = rd.from_items(plan, override_num_blocks=len(plan))
    return items.map_batches(join_one, batch_format="pyarrow")
