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
