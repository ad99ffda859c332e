"""Bucketed parquet storage: write a table hash-partitioned by a join
key so LATER joins on that key are storage-co-located — zero shuffle,
zero exchange, each bucket joins independently (the Hive/Iceberg
bucketed-table pattern, the single biggest join lever at 100 TB: pay
the partition pass once at write time, never again).

- ``write_bucketed(ds, out_dir, key, n_buckets)``: one streaming pass;
  every block splits into per-bucket parquet fragments under
  ``bucket=NNNN/`` directories (fragments carry a content hash in the
  name so concurrent writers never collide; readers glob the dir).
- ``read_bucketed(out_dir)``: plain Dataset over all buckets.
- ``bucketed_join(dir_a, dir_b, on, right_on)``: one Ray task per
  bucket reads ONLY that bucket's fragments from both sides and runs a
  local pandas merge — the join never moves a row between buckets.
  Both inputs must be bucketed with the same ``n_buckets`` (validated
  from the manifest).

The bucket function is the shared `_hash_part` (abs(int64) % B for
integer keys), so a table bucketed here co-locates with every other
op in the engine that hash-partitions on the same key.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .agg import _hash_part

MANIFEST = "_bucketed.json"


def write_bucketed(ds, out_dir: str, key: str, n_buckets: int = 32):
    """One streaming pass; returns the manifest dict."""
    os.makedirs(out_dir, exist_ok=True)
    for b in range(n_buckets):
        os.makedirs(os.path.join(out_dir, f"bucket={b:04d}"),
                    exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        part = _hash_part(t[key], n_buckets)
        order = np.argsort(part, kind="stable")
        t2 = t.take(pa.array(order))
        ps = part[order]
        change = np.ones(len(ps), bool)
        if len(ps) > 1:
            change[1:] = ps[1:] != ps[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(ps))
        # fragment names are writer-unique (urandom), like Ray's own
        # write_parquet: two blocks feeding one bucket never collide
        tag = os.urandom(8).hex()
        for s, e in zip(starts, ends):
            frag = t2.slice(s, e - s)
            path = os.path.join(out_dir, f"bucket={ps[s]:04d}",
                                f"frag-{tag}-{s}.parquet")
            pq.write_table(frag, path)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    total = sum(r["n"] for r in
                ds.map_batches(write_block, batch_format="pyarrow")
                .take_all())
    man = {"key": key, "n_buckets": n_buckets, "n_rows": int(total)}
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(man, f)
    return man


def _manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, MANIFEST)) as f:
        return json.load(f)


def read_bucketed(out_dir: str):
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(out_dir, "bucket=*",
                                          "*.parquet")))
    return rd.read_parquet(files)


def bucketed_join(dir_a: str, dir_b: str, on: str,
                  right_on: str | None = None, how: str = "inner"):
    """Storage-co-located join: one task per bucket, no exchange.
    → Dataset of merged rows."""
    import ray.data as rd

    right_on = right_on or on
    ma, mb = _manifest(dir_a), _manifest(dir_b)
    if ma["n_buckets"] != mb["n_buckets"]:
        raise ValueError(
            f"bucket counts differ: {ma['n_buckets']} vs "
            f"{mb['n_buckets']} — rebucket one side")
    if ma["key"] != on or mb["key"] != right_on:
        raise ValueError(
            f"tables are bucketed by ({ma['key']}, {mb['key']}), "
            f"join asked for ({on}, {right_on})")
    nb = ma["n_buckets"]

    def join_bucket(t: pa.Table) -> pd.DataFrame:
        out = []
        for b in t["bucket"].to_pylist():
            fa = sorted(glob.glob(os.path.join(
                dir_a, f"bucket={b:04d}", "*.parquet")))
            fb = sorted(glob.glob(os.path.join(
                dir_b, f"bucket={b:04d}", "*.parquet")))
            if not fa or (how == "inner" and not fb):
                continue
            A = pa.concat_tables([pq.read_table(f) for f in fa]) \
                .to_pandas()
            B = (pa.concat_tables([pq.read_table(f) for f in fb])
                 .to_pandas() if fb else None)
            if B is None or len(B) == 0:
                if how == "inner":
                    continue
                m = A.copy()
            else:
                m = A.merge(B, how=how, left_on=on, right_on=right_on,
                            suffixes=("", "_r"))
            out.append(m)
        if not out:
            return pd.DataFrame()
        return pd.concat(out, ignore_index=True)

    buckets = rd.from_items([{"bucket": b} for b in range(nb)],
                            override_num_blocks=nb)
    return buckets.map_batches(join_bucket, batch_format="pyarrow")


def compact_buckets(out_dir: str, min_fragments: int = 2) -> dict:
    """Small-file compaction — the storage-maintenance pass a long-
    lived bucketed table needs at 100 TB (every incremental append
    adds a fragment per touched bucket; reads degrade as open() count,
    not bytes).  One Ray task per over-fragmented bucket rewrites its
    fragments as ONE file: write tmp → atomic rename → delete olds.
    Buckets below ``min_fragments`` are not touched (their bytes stay
    byte-identical — cheap incremental maintenance).  Buckets are
    independent, so the pass is embarrassingly parallel and restart-
    safe per bucket; like Iceberg's rewrite-files action it assumes no
    CONCURRENT reader mid-bucket (pair with ``ops/versioned`` when
    readers need snapshot isolation).  Returns per-bucket stats."""
    import ray

    man = _manifest(out_dir)
    todo = []
    for b in range(man["n_buckets"]):
        frags = sorted(glob.glob(os.path.join(
            out_dir, f"bucket={b:04d}", "*.parquet")))
        if len(frags) >= min_fragments:
            todo.append((b, frags))

    @ray.remote
    def compact(b: int, frags: "list[str]") -> dict:
        t = pa.concat_tables([pq.read_table(f) for f in frags])
        bdir = os.path.join(out_dir, f"bucket={b:04d}")
        name = f"frag-compact-{os.urandom(8).hex()}.parquet"
        tmp = os.path.join(bdir, name + ".tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(bdir, name))
        for f in frags:
            os.remove(f)
        return {"bucket": b, "fragments_merged": len(frags),
                "n_rows": len(t)}

    stats = ray.get([compact.remote(b, f) for b, f in todo])
    return {"compacted_buckets": len(stats),
            "fragments_merged": int(sum(s["fragments_merged"]
                                        for s in stats)),
            "buckets": stats}


def lookup_bucketed(out_dir: str, values) -> pa.Table:
    """Point lookup with storage-level pruning: hash the probe values,
    read ONLY the buckets they can live in (usually 1 of N), filter
    exactly.  The parquet that never matches is never opened — same
    pruning shape as the persisted IVF index.  → pa.Table of matching
    rows (driver-side; probe sets are small by definition)."""
    import pyarrow.compute as pc

    man = _manifest(out_dir)
    key, nb = man["key"], man["n_buckets"]
    vals = np.asarray(list(values), np.int64)
    probe = pa.chunked_array([pa.array(vals, pa.int64())])
    need = np.unique(_hash_part(probe, nb))
    out = []
    vset = pa.array(np.unique(vals), pa.int64())
    for b in need:
        for f in sorted(glob.glob(os.path.join(
                out_dir, f"bucket={int(b):04d}", "*.parquet"))):
            t = pq.read_table(f)
            m = t.filter(pc.is_in(t[key], value_set=vset))
            if len(m):
                out.append(m)
    if not out:
        any_file = sorted(glob.glob(os.path.join(
            out_dir, "bucket=*", "*.parquet")))
        if not any_file:
            raise ValueError(f"{out_dir}: bucketed table has no rows")
        return pq.read_table(any_file[0]).slice(0, 0)
    return pa.concat_tables(out)


def rendezvous_shard(ds, key: str, n_shards: int,
                     out_col: str = "shard"):
    """Rendezvous (highest-random-weight) shard assignment: each key
    goes to ``argmax_node score(key, node)`` — the consistent-hashing
    rule under which GROWING the shard set only moves keys ONTO new
    shards (old→old moves never happen), so an N→4N cluster resize
    relocates ≈ 3/4 · |keys| instead of rehashing everything, and a
    bucketed store stays mostly valid across resizes.

    ``score`` is a squared LCG mix (SQL-replayable, the
    ``doc_weighted_sample`` oracle precedent — the square makes it
    NONLINEAR in the node id, which a bare LCG is not):
    ``m = (key·2654435761 + node·40503 + 7) mod 2^32;  score = m²
    mod 2^32``; ties break to the smaller node id.  Vectorized: one
    (rows × shards) uint64 matrix + argmax per batch, no shuffle.
    """
    def assign(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        nodes = np.arange(n_shards, dtype=np.uint64)
        m = (k[:, None] * np.uint64(2654435761)
             + nodes[None, :] * np.uint64(40503)
             + np.uint64(7)) & np.uint64(0xFFFFFFFF)
        scores = (m * m) & np.uint64(0xFFFFFFFF)
        return b.append_column(out_col, pa.array(
            np.argmax(scores, axis=1).astype(np.int64), pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def rendezvous_shard_2level(ds, key: str, n_groups: int,
                            shards_per_group: int,
                            out_col: str = "shard"):
    """Two-level HRW for THOUSANDS of shards — the scale path the flat
    ``rendezvous_shard`` docstring reserves: the flat rule's per-batch
    score matrix is rows × n_shards, which at 4096 shards is 32 MB per
    1k rows; here each key argmaxes over ``n_groups`` group scores,
    then over ``shards_per_group`` member scores — rows × (G + S)
    work/memory for G·S shards.

    Resize semantics (tested): adding a GROUP only moves keys onto the
    new group's shards (level-1 HRW), and widening one group only
    moves that group's keys onto its new members (level-2 HRW) —
    old→old moves never happen at either level.

    Scores are the flat op's squared-LCG family (SQL-replayable),
    salted per level (+7 / +11) so the two argmaxes are decoupled.
    Level 2 scores the pair (group, MEMBER INDEX) with independent
    multipliers — deliberately NOT the global shard id, which would
    renumber every member on a width change and break the
    widening-monotonicity guarantee.  Ties break to the smaller id."""
    def assign(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        mask = np.uint64(0xFFFFFFFF)
        groups = np.arange(n_groups, dtype=np.uint64)
        m1 = (k[:, None] * np.uint64(2654435761)
              + groups[None, :] * np.uint64(40503) + np.uint64(7)) & mask
        g = np.argmax((m1 * m1) & mask, axis=1).astype(np.uint64)
        members = np.arange(shards_per_group, dtype=np.uint64)
        m2 = (k[:, None] * np.uint64(2654435761)
              + g[:, None] * np.uint64(40503)
              + members[None, :] * np.uint64(69069) + np.uint64(11)) & mask
        s = np.argmax((m2 * m2) & mask, axis=1).astype(np.uint64)
        shard = (g * np.uint64(shards_per_group) + s).astype(np.int64)
        return b.append_column(out_col, pa.array(shard, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")
