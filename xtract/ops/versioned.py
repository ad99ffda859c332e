"""Versioned parquet store: atomic snapshot commits, time travel,
diff, vacuum — the Delta/Iceberg transaction-log shape reduced to its
load-bearing core, so a 100-TB corpus can be APPENDED to while every
downstream job keeps reading a frozen, named snapshot.

Mechanics (all public-knowledge lakehouse patterns):

- Data files land under ``data/`` with writer-unique names — invisible
  to every reader until a manifest references them, so a crashed
  commit leaks only unreferenced files (reclaimed by ``vacuum``),
  never a torn snapshot.
- The manifest (one JSON listing each version's file set) is replaced
  by ATOMIC RENAME: readers see the old complete snapshot or the new
  complete snapshot, nothing in between.  Single-committer assumption
  documented (serialize writers externally; readers need nothing).
- ``read_version`` is pure manifest math + ``read_parquet`` over
  exactly that snapshot's files: later commits never perturb an open
  reader, and time travel to any retained version is O(1).
- Commits never delete data files — ``vacuum(keep_latest=k)`` drops
  versions older than the kept window and removes files no kept
  version references.

Scale notes: the manifest carries file names + row counts only
(bytes per file, driver-safe at any corpus size); the data write is
one streaming ``map_batches`` pass (one tiny accounting row per file
reaches the driver, same shape as ``ops/bucketed``/``sorted_layout``).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "_versions.json"


def _load(store: str) -> dict:
    p = os.path.join(store, MANIFEST)
    if not os.path.exists(p):
        return {"versions": []}
    with open(p) as f:
        return json.load(f)


def _save(store: str, man: dict) -> None:
    tmp = os.path.join(store, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(store, MANIFEST))


def commit_version(ds, store: str, mode: str = "append") -> dict:
    """Write ``ds`` as a new snapshot.  ``append`` = parent's files +
    the new ones; ``overwrite`` = new files only (the parent snapshot
    stays readable — overwrite is logical, not physical).  Returns the
    committed version entry."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown commit mode {mode!r}")
    data_dir = os.path.join(store, "data")
    os.makedirs(data_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        name = f"part-{os.urandom(8).hex()}.parquet"
        pq.write_table(t, os.path.join(data_dir, name))
        return pa.table({"file": pa.array([name], pa.string()),
                         "n": pa.array([len(t)], pa.int64())})

    rows = (ds.map_batches(write_block, batch_format="pyarrow")
            .take_all())  # one tiny accounting row per written file
    new_files = sorted({r["file"]: int(r["n"]) for r in rows}.items())

    man = _load(store)
    parent = man["versions"][-1] if man["versions"] else None
    base = (list(zip(parent["files"], parent["file_rows"]))
            if (mode == "append" and parent) else [])
    files = base + new_files
    entry = {"v": (parent["v"] + 1 if parent else 1), "mode": mode,
             "files": [f for f, _ in files],
             "file_rows": [n for _, n in files],
             "n_rows": int(sum(n for _, n in files))}
    man["versions"].append(entry)
    _save(store, man)
    return entry


def commit_bucketed(ds, store: str, key: str,
                    n_buckets: int = 32) -> dict:
    """Initial commit of a KEY-BUCKETED snapshot (the layout
    ``commit_upsert`` needs): every data file holds exactly one hash
    bucket of ``key``, so an upsert rewrites only the buckets its keys
    touch.  One streaming pass, same accounting shape as
    ``commit_version``."""
    from .agg import _hash_part

    data_dir = os.path.join(store, "data")
    os.makedirs(data_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import numpy as np

        if len(t) == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        part = _hash_part(t[key], n_buckets)
        order = np.argsort(part, kind="stable")
        t2 = t.take(pa.array(order))
        ps = part[order]
        change = np.ones(len(ps), bool)
        if len(ps) > 1:
            change[1:] = ps[1:] != ps[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(ps))
        tag = os.urandom(8).hex()
        names, bks, ns = [], [], []
        for s, e in zip(starts, ends):
            name = f"b{ps[s]:04d}-part-{tag}-{s}.parquet"
            pq.write_table(t2.slice(s, e - s),
                           os.path.join(data_dir, name))
            names.append(name)
            bks.append(int(ps[s]))
            ns.append(int(e - s))
        return pa.table({"file": pa.array(names, pa.string()),
                         "bucket": pa.array(bks, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    rows = (ds.map_batches(write_block, batch_format="pyarrow")
            .take_all())
    triples = sorted((r["file"], int(r["bucket"]), int(r["n"]))
                     for r in rows)
    man = _load(store)
    if man["versions"]:
        raise ValueError("commit_bucketed must be the FIRST commit "
                         "of a store (found existing versions)")
    entry = {"v": 1, "mode": "bucketed", "key": key,
             "n_buckets": n_buckets,
             "files": [f for f, _, _ in triples],
             "file_buckets": [b for _, b, _ in triples],
             "file_rows": [n for _, _, n in triples],
             "n_rows": int(sum(n for _, _, n in triples))}
    man["versions"].append(entry)
    _save(store, man)
    return entry


def commit_upsert(updates, store: str) -> dict:
    """MERGE (upsert) commit against a bucketed snapshot: rows whose
    key matches an update are REPLACED, new keys are inserted, and —
    the scale property — only the buckets the update keys hash into
    are rewritten; every untouched bucket's file is carried into the
    new version by reference, bytes unread and untouched.  The rewrite
    fans out as one grouped task per touched bucket (each reads just
    its bucket's parent files).  Update keys must be unique per commit
    (validated per bucket — first-wins ambiguity is refused, not
    guessed)."""
    from .agg import _hash_part

    parent = _entry(store, None)
    if parent.get("mode") not in ("bucketed", "upsert"):
        raise ValueError("commit_upsert needs a bucketed store "
                         "(commit_bucketed first)")
    key, nb = parent["key"], parent["n_buckets"]
    data_dir = os.path.join(store, "data")
    by_bucket: dict = {}
    for f, b in zip(parent["files"], parent["file_buckets"]):
        by_bucket.setdefault(b, []).append(f)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(_hash_part(t[key], nb), pa.int64()))

    def rewrite(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = int(t["_bucket"][0].as_py())
        up = t.drop_columns(["_bucket"])
        ks = up[key]
        if len(pc.unique(ks)) != len(up):
            raise ValueError(
                f"duplicate update keys in bucket {b} — upsert "
                "requires one row per key per commit")
        olds = [pq.read_table(os.path.join(data_dir, f))
                for f in by_bucket.get(b, [])]
        if olds:
            base = pa.concat_tables(olds)
            keep = base.filter(pc.invert(pc.is_in(
                base[key], value_set=ks.combine_chunks())))
            merged = pa.concat_tables(
                [keep, up.select(base.column_names)])
        else:
            merged = up
        name = f"b{b:04d}-part-{os.urandom(8).hex()}.parquet"
        pq.write_table(merged, os.path.join(data_dir, name))
        return pa.table({"file": pa.array([name], pa.string()),
                         "bucket": pa.array([b], pa.int64()),
                         "n": pa.array([len(merged)], pa.int64())})

    rows = (updates.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(rewrite, batch_format="pyarrow")
            .take_all())  # one accounting row per TOUCHED bucket
    new = {int(r["bucket"]): (r["file"], int(r["n"])) for r in rows}
    files, bks, ns = [], [], []
    for f, b, n in zip(parent["files"], parent["file_buckets"],
                       parent["file_rows"]):
        if b not in new:                      # untouched: by reference
            files.append(f)
            bks.append(b)
            ns.append(n)
    for b in sorted(new):
        f, n = new[b]
        files.append(f)
        bks.append(b)
        ns.append(n)
    man = _load(store)
    entry = {"v": parent["v"] + 1, "mode": "upsert", "key": key,
             "n_buckets": nb, "files": files, "file_buckets": bks,
             "file_rows": ns, "n_rows": int(sum(ns))}
    man["versions"].append(entry)
    _save(store, man)
    return entry


def commit_delete(keys, store: str) -> dict:
    """Key-delete commit against a bucketed snapshot (the GDPR /
    retention path): rewrites ONLY the buckets the keys hash into,
    dropping matching rows; untouched files carry by reference; every
    earlier snapshot stays readable until ``vacuum``.  ``keys`` is a
    small driver-side iterable (deletion lists are bounded by nature;
    for corpus-scale deletes express the predicate as an upsert job)."""
    import numpy as np
    import pyarrow.compute as pc

    from .agg import _hash_part

    parent = _entry(store, None)
    if parent.get("mode") not in ("bucketed", "upsert", "delete"):
        raise ValueError("commit_delete needs a bucketed store "
                         "(commit_bucketed first)")
    key, nb = parent["key"], parent["n_buckets"]
    data_dir = os.path.join(store, "data")
    kvals = np.unique(np.asarray(list(keys), np.int64))
    karr = pa.chunked_array([pa.array(kvals, pa.int64())])
    touched = np.unique(_hash_part(karr, nb))
    by_bucket: dict = {}
    for f, b, n in zip(parent["files"], parent["file_buckets"],
                       parent["file_rows"]):
        by_bucket.setdefault(b, []).append((f, n))

    files, bks, ns = [], [], []
    vset = pa.array(kvals, pa.int64())
    for b, fl in sorted(by_bucket.items()):
        if b not in touched:
            for f, n in fl:
                files.append(f)
                bks.append(b)
                ns.append(n)
            continue
        t = pa.concat_tables([pq.read_table(
            os.path.join(data_dir, f)) for f, _ in fl])
        kept = t.filter(pc.invert(pc.is_in(t[key], value_set=vset)))
        if len(kept) == len(t):              # nothing deleted here:
            for f, n in fl:                  # carry by reference
                files.append(f)
                bks.append(b)
                ns.append(n)
            continue
        if len(kept):
            name = f"b{b:04d}-part-{os.urandom(8).hex()}.parquet"
            pq.write_table(kept, os.path.join(data_dir, name))
            files.append(name)
            bks.append(b)
            ns.append(len(kept))

    man = _load(store)
    entry = {"v": parent["v"] + 1, "mode": "delete", "key": key,
             "n_buckets": nb, "files": files, "file_buckets": bks,
             "file_rows": ns, "n_rows": int(sum(ns))}
    man["versions"].append(entry)
    _save(store, man)
    return entry


def changed_rows(store: str, v_old: int, v_new: int,
                 key: "str | None" = None):
    """Row-level CDC between two snapshots: → Dataset of
    ``(key, change)`` with change ∈ insert / delete / update — what an
    incremental consumer replays instead of re-reading the corpus.

    Scale shape: on a BUCKETED store only the buckets whose file sets
    differ are read at all (manifest math prunes the rest — an upsert
    that touched 3 of 4096 buckets costs 3 bucket reads); each changed
    bucket compares old vs new with one vectorized pandas merge.  On
    unbucketed stores both snapshots co-group by key hash first (one
    all-to-all over slim rows).  ``key`` defaults to the store's
    bucket key."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    a, b = _entry(store, v_old), _entry(store, v_new)
    key = key or a.get("key") or b.get("key")
    if key is None:
        raise ValueError("changed_rows needs a key column "
                         "(unbucketed store: pass key=...)")
    data_dir = os.path.join(store, "data")

    def _diff_frames(old: "pd.DataFrame", new: "pd.DataFrame"):
        cols = [c for c in new.columns if c != key]
        m = old.merge(new, how="outer", on=key,
                      suffixes=("_o", "_n"), indicator=True)
        out = pd.DataFrame({key: m[key]})
        change = np.where(
            m["_merge"] == "left_only", "delete",
            np.where(m["_merge"] == "right_only", "insert", "same"))
        both = m["_merge"] == "both"
        if both.any() and cols:
            diff = np.zeros(len(m), bool)
            for c in cols:
                o, n = m[c + "_o"], m[c + "_n"]
                neq = (o != n) & ~(o.isna() & n.isna())
                diff |= neq.to_numpy()
            change = np.where(both & diff, "update", change)
        out["change"] = change
        return out[out["change"] != "same"]

    if ("file_buckets" in a and "file_buckets" in b
            and a.get("n_buckets") == b.get("n_buckets")
            and a.get("key") == b.get("key") and key == a.get("key")):
        fa: dict = {}
        fb: dict = {}
        for f, bk in zip(a["files"], a["file_buckets"]):
            fa.setdefault(bk, []).append(f)
        for f, bk in zip(b["files"], b["file_buckets"]):
            fb.setdefault(bk, []).append(f)
        changed = sorted(bk for bk in set(fa) | set(fb)
                         if sorted(fa.get(bk, ()))
                         != sorted(fb.get(bk, ())))
        if not changed:
            return rd.from_arrow(pa.table({
                key: pa.array([], pa.int64()),
                "change": pa.array([], pa.string())}))

        def diff_bucket(t: pa.Table) -> "pd.DataFrame":
            outs = []
            for bk in t["bucket"].to_pylist():
                old = [pq.read_table(os.path.join(data_dir, f))
                       for f in fa.get(bk, ())]
                new = [pq.read_table(os.path.join(data_dir, f))
                       for f in fb.get(bk, ())]
                o = (pa.concat_tables(old).to_pandas() if old
                     else None)
                n = (pa.concat_tables(new).to_pandas() if new
                     else None)
                if o is None:
                    o = n.iloc[0:0]
                if n is None:
                    n = o.iloc[0:0]
                outs.append(_diff_frames(o, n))
            return (pd.concat(outs, ignore_index=True) if outs
                    else pd.DataFrame({key: [], "change": []}))

        buckets = rd.from_items([{"bucket": bk} for bk in changed],
                                override_num_blocks=len(changed))
        return buckets.map_batches(diff_bucket, batch_format="pyarrow")

    # generic path: co-group both snapshots by key hash
    from .agg import _hash_part

    old_ds, new_ds = read_version(store, v_old), read_version(store,
                                                              v_new)
    names = new_ds.schema().names

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return (t.select(names)
                    .append_column("_side", pa.array(
                        np.full(len(t), side, np.int8)))
                    .append_column("_part", pa.array(
                        _hash_part(t[key], 64), pa.int64())))
        return f

    both = old_ds.map_batches(tag(0), batch_format="pyarrow").union(
        new_ds.map_batches(tag(1), batch_format="pyarrow"))

    def diff_part(t: pa.Table) -> "pd.DataFrame":
        o = t.filter(pc.equal(t["_side"], 0)).select(names).to_pandas()
        n = t.filter(pc.equal(t["_side"], 1)).select(names).to_pandas()
        return _diff_frames(o, n)

    return both.groupby("_part").map_groups(diff_part,
                                            batch_format="pyarrow")


def list_versions(store: str) -> "list[dict]":
    return [{"v": e["v"], "mode": e["mode"], "n_rows": e["n_rows"],
             "n_files": len(e["files"])} for e in
            _load(store)["versions"]]


def _entry(store: str, v: "int | None") -> dict:
    vs = _load(store)["versions"]
    if not vs:
        raise ValueError(f"versioned store at {store} has no commits")
    if v is None:
        return vs[-1]
    for e in vs:
        if e["v"] == v:
            return e
    raise ValueError(f"version {v} not found (have "
                     f"{[e['v'] for e in vs]} — vacuumed?)")


def read_version(store: str, v: "int | None" = None):
    """→ Dataset over exactly snapshot ``v``'s files (latest when
    ``v`` is None).  Later commits never affect this reader."""
    import ray.data as rd

    e = _entry(store, v)
    if not e["files"]:
        raise ValueError(f"version {e['v']} is empty")
    return rd.read_parquet(
        [os.path.join(store, "data", f) for f in e["files"]])


def diff_versions(store: str, v_old: int, v_new: int) -> dict:
    """Manifest-only diff: which files (and how many rows) ``v_new``
    added/removed relative to ``v_old``."""
    a, b = _entry(store, v_old), _entry(store, v_new)
    fa = dict(zip(a["files"], a["file_rows"]))
    fb = dict(zip(b["files"], b["file_rows"]))
    added = sorted(set(fb) - set(fa))
    removed = sorted(set(fa) - set(fb))
    return {"added_files": added, "removed_files": removed,
            "rows_added": int(sum(fb[f] for f in added)),
            "rows_removed": int(sum(fa[f] for f in removed))}


def vacuum(store: str, keep_latest: int = 1) -> dict:
    """Drop versions older than the kept window and delete data files
    no kept version references (incl. leaked files from crashed
    commits).  Time travel remains valid within the window."""
    man = _load(store)
    kept = man["versions"][-keep_latest:] if keep_latest else []
    live = {f for e in kept for f in e["files"]}
    data_dir = os.path.join(store, "data")
    removed = 0
    if os.path.isdir(data_dir):
        for name in os.listdir(data_dir):
            if name not in live and name.endswith(".parquet"):
                os.remove(os.path.join(data_dir, name))
                removed += 1
    _save(store, {"versions": kept})
    return {"kept_versions": [e["v"] for e in kept],
            "files_removed": removed}
