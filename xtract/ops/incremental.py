"""Incremental grouped aggregation with persisted mergeable state —
the delta-ingest pattern: pay the full corpus pass ONCE, then fold
each new day's data in at cost proportional to the DELTA (plus the
touched state buckets), never recomputing history.

At 100 TB the difference is structural: a daily crawl refresh over a
petabyte-year of history re-aggregates ~0.3% of the data instead of
100%.  The state is a hash-bucketed parquet directory of PARTIAL
aggregates (sum / count / min / max — all mergeable by construction;
mean et al. finalize from them), so every merge is:

1. **combiner** — one ``map_batches`` pass over the delta reduces each
   block to ≤ one partial row per key (the same combiner-before-
   exchange shape every groupby in this engine uses);
2. **fragment write** — partial rows land as fragment files in their
   key-hash bucket (writer-unique names, concurrent-safe);
3. **bucket compaction** — one Ray task per TOUCHED bucket merges
   ``state + fragments`` with a vectorized pandas groupby and commits
   a new per-bucket generation.  Buckets the delta never touched are
   never read, never rewritten.

Crash safety is a miniature transaction log: each bucket's state file
is ``state-g<N>.parquet`` plus a ``state-g<N>.json`` sidecar recording
the fragment tags ALREADY folded in.  Compaction skips consumed tags,
so a crash between state commit and fragment garbage-collection can
never double-count a delta; the directory-level manifest (atomic
``os.replace``) is the single commit point for the new generations.

Semantics target (reference parity): the reference engine's counters
accumulate across ``process_pages`` calls within a job
(/root/reference/src/api.rs job-level counter accumulation); this op
generalizes that to persisted, restart-surviving aggregate state.
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

MANIFEST = "_aggstate.json"
KINDS = ("sum", "count", "min", "max")
# merging two partials of a kind uses this pandas agg
_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST)


def _read_manifest(out_dir: str) -> dict:
    with open(_manifest_path(out_dir)) as f:
        return json.load(f)


def _write_manifest(out_dir: str, man: dict) -> None:
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, _manifest_path(out_dir))  # atomic commit point


def _bucket_dir(out_dir: str, b: int) -> str:
    return os.path.join(out_dir, f"bucket={int(b):04d}")


def _partial_frame(t: pa.Table, key: str, specs: dict) -> pd.DataFrame:
    """Block combiner: ≤ one partial row per distinct key (vectorized
    pandas groupby — C kernels, no per-key Python)."""
    cols = {key: t[key].to_numpy(zero_copy_only=False)}
    for out, (col, kind) in specs.items():
        if kind != "count":
            cols[out] = t[col].to_numpy(zero_copy_only=False)
    df = pd.DataFrame(cols)
    g = df.groupby(key, sort=False)
    parts = {}
    for out, (col, kind) in specs.items():
        parts[out] = g.size() if kind == "count" else g[out].agg(kind)
    return pd.DataFrame(parts).reset_index()


def _merge_partials(frames: "list[pd.DataFrame]", key: str,
                    specs: dict) -> pd.DataFrame:
    """Merge partial rows: count partials add, min/max re-extremize."""
    df = pd.concat(frames, ignore_index=True)
    g = df.groupby(key, sort=False)
    out = pd.DataFrame({o: g[o].agg(_MERGE[k])
                        for o, (_, k) in specs.items()}).reset_index()
    return out.sort_values(key).reset_index(drop=True)


def _ingest_fragments(ds, out_dir: str, key: str, specs: dict,
                      n_buckets: int) -> "tuple[set[int], int]":
    """One streaming pass over ``ds``: combine each block to partials,
    split by key-hash, append fragment files.  → (touched buckets,
    rows ingested).  Only combiner OUTPUT rows are written — a hot key
    contributes ≤ 1 row per input block."""

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        part_df = _partial_frame(t, key, specs)
        pt = (pa.Table.from_pandas(part_df, preserve_index=False)
              .replace_schema_metadata(None))
        part = _hash_part(pt[key], n_buckets)
        order = np.argsort(part, kind="stable")
        pt = pt.take(pa.array(order))
        ps = part[order]
        change = np.ones(len(ps), bool)
        if len(ps) > 1:
            change[1:] = ps[1:] != ps[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(ps))
        tag = os.urandom(8).hex()
        touched = []
        for s, e in zip(starts, ends):
            b = int(ps[s])
            os.makedirs(_bucket_dir(out_dir, b), exist_ok=True)
            pq.write_table(pt.slice(s, e - s),
                           os.path.join(_bucket_dir(out_dir, b),
                                        f"frag-{tag}.parquet"))
            touched.append(b)
        n = np.zeros(len(touched), np.int64)
        n[0] = len(t)
        return pa.table({"bucket": pa.array(touched, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    rows = (ds.map_batches(write_block, batch_format="pyarrow")
            .take_all())  # ≤ n_buckets rows per input block
    touched = {int(r["bucket"]) for r in rows}
    return touched, int(sum(r["n"] for r in rows))


def _compact_bucket(out_dir: str, b: int, key: str, specs: dict,
                    gen: int) -> "dict | None":
    """Merge one bucket's current state with its UNCONSUMED fragments
    and commit generation ``gen+1``.  Returns the cleanup record (old
    files to GC after the manifest commit) or None if nothing new."""
    bd = _bucket_dir(out_dir, b)
    state_pq = os.path.join(bd, f"state-g{gen}.parquet")
    sidecar = os.path.join(bd, f"state-g{gen}.json")
    consumed: set = set()
    frames = []
    if gen >= 0 and os.path.exists(state_pq):
        frames.append(pq.read_table(state_pq).to_pandas())
        with open(sidecar) as f:
            consumed = set(json.load(f)["consumed"])
    frags = {os.path.basename(p)[5:-8]: p          # tag → path
             for p in glob.glob(os.path.join(bd, "frag-*.parquet"))}
    fresh = {t: p for t, p in frags.items() if t not in consumed}
    if not fresh:
        return None
    for p in sorted(fresh.values()):
        frames.append(pq.read_table(p).to_pandas())
    merged = _merge_partials(frames, key, specs)
    new_gen = gen + 1
    # consumed set is trimmed to tags still on disk + the new batch,
    # so it stays bounded after GC succeeds
    new_consumed = sorted((consumed & set(frags)) | set(fresh))
    out_pq = os.path.join(bd, f"state-g{new_gen}.parquet")
    pq.write_table(pa.Table.from_pandas(merged, preserve_index=False)
                   .replace_schema_metadata(None), out_pq)
    with open(os.path.join(bd, f"state-g{new_gen}.json"), "w") as f:
        json.dump({"consumed": new_consumed}, f)
    return {"bucket": b, "gen": new_gen,
            "gc": ([state_pq, sidecar] if frames and gen >= 0
                   and os.path.exists(state_pq) else [])
            + sorted(fresh.values())}


def _compact(out_dir: str, man: dict, touched: "set[int]") -> None:
    """Compact the touched buckets (one Ray task each), then commit
    the new generations in ONE atomic manifest replace, then GC."""
    import ray.data as rd

    key, specs = man["key"], {k: tuple(v) for k, v in
                              man["specs"].items()}
    gens = man["gen"]

    def run(t: pa.Table) -> pa.Table:
        recs = []
        for b in t["bucket"].to_pylist():
            r = _compact_bucket(out_dir, int(b), key, specs,
                                int(gens.get(str(b), -1)))
            if r is not None:
                recs.append(json.dumps(r))
        return pa.table({"rec": pa.array(recs, pa.string())})

    items = sorted(touched)
    done = (rd.from_items([{"bucket": b} for b in items],
                          override_num_blocks=min(len(items), 16))
            .map_batches(run, batch_format="pyarrow").take_all()
            ) if items else []
    cleanup = []
    for r in done:
        rec = json.loads(r["rec"])
        gens[str(rec["bucket"])] = rec["gen"]
        cleanup.extend(rec["gc"])
    _write_manifest(out_dir, man)         # commit point
    for p in cleanup:                     # GC — safe to fail/redo
        try:
            os.remove(p)
        except OSError:
            pass


def init_agg_state(ds, out_dir: str, key: str,
                   specs: "dict[str, tuple[str, str]]",
                   n_buckets: int = 32) -> dict:
    """Build the persisted state from the base corpus.

    ``specs``: out_col → (in_col, kind) with kind ∈ sum/count/min/max.
    For bit-exact float money use integer quantization upstream (the
    engine-wide cents idiom).  → manifest dict."""
    for out, (_, kind) in specs.items():
        if kind not in KINDS:
            raise ValueError(f"{out}: unknown agg kind {kind!r}")
    os.makedirs(out_dir, exist_ok=True)
    man = {"key": key, "n_buckets": int(n_buckets),
           "specs": {k: list(v) for k, v in specs.items()},
           "gen": {}, "n_rows": 0}
    _write_manifest(out_dir, man)
    return merge_delta(out_dir, ds)


def merge_delta(out_dir: str, delta_ds) -> dict:
    """Fold a delta into the state: combiner pass over the delta,
    fragment append, compaction of ONLY the touched buckets."""
    man = _read_manifest(out_dir)
    specs = {k: tuple(v) for k, v in man["specs"].items()}
    touched, n = _ingest_fragments(delta_ds, out_dir, man["key"],
                                   specs, man["n_buckets"])
    man["n_rows"] = int(man["n_rows"]) + n
    _compact(out_dir, man, touched)
    return _read_manifest(out_dir)


def read_agg_state(out_dir: str):
    """→ Dataset of the committed state rows (one row per key)."""
    import ray.data as rd

    man = _read_manifest(out_dir)
    files = [os.path.join(_bucket_dir(out_dir, int(b)),
                          f"state-g{g}.parquet")
             for b, g in man["gen"].items()]
    if not files:
        raise ValueError(f"agg state at {out_dir} is empty")
    return rd.read_parquet(sorted(files))
