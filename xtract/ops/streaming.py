"""Event-time streaming window aggregate with watermark semantics —
the documented custom-operator carve-out for semantics Ray Data's
batch model genuinely can't express (an UNBOUNDED ordered stream
processed with BOUNDED state), mirroring the reference's progress /
deadline monitor family (reference ``src/api.rs`` monitor callbacks)
lifted to stream processing.

Semantics (the standard Beam/Flink keyed-stream contract):

- Rows are routed to ``n_shards`` window actors by ``hash(key)``; a
  key's rows all visit ONE actor in stream arrival order, so each
  shard carries its own watermark (exactly keyed-stream semantics —
  cross-key ordering is irrelevant by construction).
- Watermark per shard = ``max event ts seen − allowed_lateness``.
- A window ``[w, w+width)`` FINALIZES (emits + frees its state) when
  the shard watermark reaches ``w+width``; a row whose window already
  finalized is dropped and counted late.  Out-of-order rows inside the
  allowance land in their still-open window — byte-identical totals
  to the batch groupby when nothing exceeds the allowance.
- State per actor = open windows only: O(keys_in_shard ×
  (lateness/width + 2)), NOT O(stream length) — the property that
  makes the operator viable on an unbounded crawl feed.

Scale shape: the driver loop is a ROUTER only — one vectorized hash
partition + ≤ n_shards small object-store sends per batch, with
bounded in-flight backpressure (``ray.wait``); all accumulation is in
the actors.  On a real cluster the ordered source would be N ordered
partitions (one router per Kafka-style partition feeding the same
shard actors); arrival order only matters per key, which sharding
preserves.  Per-batch actor work is one cython groupby — Python cost
∝ distinct (window, key) pairs, not rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .agg import _hash_part
from .joins import _us_i64


class _WindowShard:
    """One hash-shard of the keyed window state (Ray actor body)."""

    def __init__(self, width_us: int, lateness_us: int,
                 dedup: bool = False):
        self.width = int(width_us)
        self.late = int(lateness_us)
        self.dedup = bool(dedup)
        # (win_start_us, key) -> [n, vsum] (+ seen-id set when dedup)
        self.open: dict = {}
        self.done: list = []          # finalized (win, key, n, vsum)
        self.max_ts: "int | None" = None
        self.n_late = 0
        self.n_dup = 0
        self.key_type: "pa.DataType | None" = None

    def _finalize_through(self, wm: int) -> None:
        closed = [wk for wk in self.open if wk[0] + self.width <= wm]
        for wk in closed:
            st = self.open.pop(wk)   # frees the seen-set with the window
            self.done.append((wk[0], wk[1], int(st[0]), float(st[1])))

    def ingest(self, t: pa.Table) -> int:
        if self.key_type is None:
            self.key_type = t["_key"].type
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        win = (ts // self.width) * self.width
        # watermark at batch start (deterministic given per-shard
        # arrival order): rows whose window already finalized drop late
        if self.max_ts is not None:
            wm = self.max_ts - self.late
            late = (win + self.width) <= wm
            if late.any():
                self.n_late += int(late.sum())
                keep = ~late
                t = t.filter(pa.array(keep))
                ts, win = ts[keep], win[keep]
        if len(t):
            if self.dedup:
                self._ingest_dedup(t, win)
            else:
                g = (pd.DataFrame({"_w": win,
                                   "_k": t["_key"].to_pandas(),
                                   "_v": t["_val"].to_numpy(
                                       zero_copy_only=False)})
                     .groupby(["_w", "_k"], sort=False)["_v"]
                     .agg(["count", "sum"]))
                for (w, k), row in g.iterrows():
                    st = self.open.get((w, k))
                    if st is None:
                        self.open[(w, k)] = [int(row["count"]),
                                             row["sum"]]
                    else:
                        st[0] += int(row["count"])
                        st[1] += row["sum"]
            mx = int(ts.max())
            self.max_ts = mx if self.max_ts is None else max(self.max_ts, mx)
            self._finalize_through(self.max_ts - self.late)
        return len(self.open)

    def _ingest_dedup(self, t: pa.Table, win) -> None:
        """Exactly-once accumulation over an at-least-once feed: each
        open window keeps the ids it has counted; redelivered rows are
        recognized and dropped.  The seen-set lives and dies WITH its
        window (freed at finalize), so state is bounded by the open-
        window span, never the stream.  Per-batch Python cost ∝
        distinct (window, key) groups, not rows."""
        df = pd.DataFrame({"_w": win, "_k": t["_key"].to_pandas(),
                           "_v": t["_val"].to_numpy(
                               zero_copy_only=False),
                           "_i": t["_id"].to_numpy(
                               zero_copy_only=False)})
        before = len(df)
        df = df.drop_duplicates(subset=["_w", "_k", "_i"],
                                keep="first")
        self.n_dup += before - len(df)
        for (w, k), sub in df.groupby(["_w", "_k"], sort=False):
            st = self.open.get((w, k))
            if st is None:
                st = self.open[(w, k)] = [0, 0.0, set()]
            ids = sub["_i"].to_numpy()
            if st[2]:
                seen = np.fromiter(st[2], dtype=ids.dtype,
                                   count=len(st[2]))
                fresh = ~np.isin(ids, seen)
            else:
                fresh = np.ones(len(ids), bool)
            self.n_dup += int((~fresh).sum())
            st[0] += int(fresh.sum())
            st[1] += float(sub["_v"].to_numpy()[fresh].sum())
            st[2].update(ids[fresh].tolist())

    def state_size(self) -> int:
        return len(self.open)

    def flush(self):
        """Close every remaining window; return (table, n_late)."""
        self._finalize_through(2 ** 62)
        if self.done:
            w, k, n, s = zip(*self.done)
        else:
            w, k, n, s = (), (), (), ()
        ktype = self.key_type if self.key_type is not None else pa.string()
        tbl = pa.table({"window_start_us": pa.array(w, pa.int64()),
                        "key": pa.array(list(k), ktype),
                        "n_events": pa.array(n, pa.int64()),
                        "value_sum": pa.array(s, pa.float64())})
        return tbl, self.n_late, self.n_dup


class _SessionShard:
    """One hash-shard of keyed SESSION state (Ray actor body).

    Contract: the feed is per-key time-ordered (a globally time-
    ordered stream satisfies this for every key).  Rows that arrive
    out of order for their key are dropped and counted — sessions are
    order-defined, so the operator refuses to guess.  A session
    finalizes when the shard watermark passes ``last_ts + gap`` (no
    ordered row can extend it anymore); its state is freed then, so
    open state is O(keys with a live session), plus one int per seen
    key (the session counter)."""

    def __init__(self, gap_us: int, lateness_us: int):
        self.gap = int(gap_us)
        self.late = int(lateness_us)
        self.open: dict = {}      # key -> [start_us, last_ts, n]
        self.next_id: dict = {}   # key -> next session ordinal (1-based)
        self.done: list = []      # (key, session_id, n, start, end)
        self.max_ts: "int | None" = None
        self.n_disordered = 0
        self.key_type: "pa.DataType | None" = None

    def _finalize_key(self, k) -> None:
        st = self.open.pop(k)
        sid = self.next_id.get(k, 1)
        self.next_id[k] = sid + 1
        self.done.append((k, sid, int(st[2]), int(st[0]), int(st[1])))

    def _finalize_through(self, wm: int) -> None:
        closed = [k for k, st in self.open.items()
                  if st[1] + self.gap <= wm]
        for k in closed:
            self._finalize_key(k)

    def ingest(self, t: pa.Table) -> int:
        if self.key_type is None:
            self.key_type = t["_key"].type
        df = pd.DataFrame({"_k": t["_key"].to_pandas(),
                           "_ts": t["_ts"].to_numpy(
                               zero_copy_only=False)})
        # Python cost ∝ sessions touched, never rows: per key, segment
        # boundaries come from one vectorized gap diff
        for k, sub in df.groupby("_k", sort=False):
            ts = np.sort(sub["_ts"].to_numpy())
            st = self.open.get(k)
            if st is not None:
                cut = int(np.searchsorted(ts, st[1]))
                self.n_disordered += cut   # per-key order violations
                ts = ts[cut:]
                if len(ts) == 0:
                    continue
            bnd = np.empty(len(ts), bool)
            bnd[0] = st is None or (ts[0] - st[1] > self.gap)
            if len(ts) > 1:
                bnd[1:] = (ts[1:] - ts[:-1]) > self.gap
            starts = np.flatnonzero(bnd)
            if len(starts) == 0:           # whole batch extends the
                st[1] = int(ts[-1])        # open session
                st[2] += len(ts)
                continue
            first = int(starts[0])
            if first > 0:                  # prefix extends, then break
                st[1] = int(ts[first - 1])
                st[2] += first
            ends = np.append(starts[1:], len(ts))
            for s0, e0 in zip(starts, ends):
                if k in self.open:
                    self._finalize_key(k)
                self.open[k] = [int(ts[s0]), int(ts[e0 - 1]),
                                int(e0 - s0)]
        mx = int(df["_ts"].max())
        self.max_ts = mx if self.max_ts is None else max(self.max_ts,
                                                         mx)
        self._finalize_through(self.max_ts - self.late)
        return len(self.open)

    def flush(self):
        for k in list(self.open):
            self._finalize_key(k)
        if self.done:
            k, sid, n, s, e = zip(*self.done)
        else:
            k, sid, n, s, e = (), (), (), (), ()
        ktype = self.key_type if self.key_type is not None else pa.string()
        tbl = pa.table({"key": pa.array(list(k), ktype),
                        "session_id": pa.array(sid, pa.int64()),
                        "n_events": pa.array(n, pa.int64()),
                        "start_us": pa.array(s, pa.int64()),
                        "end_us": pa.array(e, pa.int64())})
        return tbl, self.n_disordered


def stream_session_aggregate(batches, ts_col: str, key_col: str,
                             gap_s: int = 1800, lateness_s: int = 0,
                             n_shards: int = 4,
                             max_inflight_per_shard: int = 4):
    """Streaming SESSION windows (gap-based, the Flink session-window
    shape): consume a per-key time-ordered feed through sharded
    session actors; a key's session closes when the shard watermark
    passes its last event + gap, so results stream out while the feed
    is still running and state stays bounded by LIVE sessions.

    Returns ``(pa.Table(key, session_id, n_events, start_us, end_us),
    n_disordered_dropped)``.  On an ordered feed the output equals the
    batch lag/gap sessionization exactly (the driver oracle checks
    this against the same SQL as the batch ``user_sessions``)."""
    import ray

    gap_us = int(gap_s) * 1_000_000
    late_us = int(lateness_s) * 1_000_000
    Shard = ray.remote(_SessionShard)
    actors = [Shard.remote(gap_us, late_us) for _ in range(n_shards)]
    inflight: list = []
    cap = max_inflight_per_shard * n_shards
    for b in batches:
        if len(b) == 0:
            continue
        slim = pa.table({"_ts": _us_i64(b[ts_col]),
                         "_key": b[key_col]})
        part = _hash_part(slim["_key"], n_shards)
        for s in np.unique(part):
            sub = slim.filter(pa.array(part == s))
            inflight.append(actors[int(s)].ingest.remote(sub))
        while len(inflight) > cap:
            _, inflight = ray.wait(inflight, num_returns=1)
    if inflight:
        ray.get(inflight)
    parts = ray.get([a.flush.remote() for a in actors])
    for a in actors:
        ray.kill(a)
    tbl = pa.concat_tables([p for p, _ in parts])
    return tbl, int(sum(n for _, n in parts))


def stream_window_aggregate(batches, ts_col: str, key_col: str,
                            val_col: str, width_s: int = 3600,
                            lateness_s: int = 0, n_shards: int = 4,
                            max_inflight_per_shard: int = 4,
                            dedup_col: "str | None" = None):
    """Consume an ordered iterable of Arrow batches (e.g.
    ``ds.iter_batches(batch_format="pyarrow")`` or a live feed) through
    sharded watermark-window actors.

    Returns ``(pa.Table(window_start_us, key, n_events, value_sum),
    stats)`` with ``stats = {"n_late": …, "n_dup": …}``.  With
    ``lateness_s`` covering the stream's maximum disorder the table
    equals the batch tumbling-window groupby exactly (tested); with a
    finite allowance, too-late rows are dropped and counted — the
    streaming trade the batch engine cannot express.

    ``dedup_col`` names a unique-id column and turns the operator
    EXACTLY-ONCE over an at-least-once feed: redelivered rows (same
    id, same window) are recognized inside the still-open window and
    counted once; the per-window seen-set is freed when the window
    finalizes, so dedup state is bounded by the lateness horizon, not
    the stream.
    """
    import ray

    width_us = int(width_s) * 1_000_000
    late_us = int(lateness_s) * 1_000_000
    Shard = ray.remote(_WindowShard)
    actors = [Shard.remote(width_us, late_us, dedup_col is not None)
              for _ in range(n_shards)]
    inflight: list = []
    cap = max_inflight_per_shard * n_shards
    for b in batches:
        if len(b) == 0:
            continue
        cols = {"_ts": _us_i64(b[ts_col]),
                "_key": b[key_col],
                "_val": b[val_col]}
        if dedup_col is not None:
            cols["_id"] = b[dedup_col]
        slim = pa.table(cols)
        part = _hash_part(slim["_key"], n_shards)
        for s in np.unique(part):
            sub = slim.filter(pa.array(part == s))
            inflight.append(actors[int(s)].ingest.remote(sub))
        while len(inflight) > cap:          # backpressure, bounded RAM
            _, inflight = ray.wait(inflight, num_returns=1)
    if inflight:
        ray.get(inflight)
    parts = ray.get([a.flush.remote() for a in actors])
    for a in actors:
        ray.kill(a)
    tbl = pa.concat_tables([p for p, _, _ in parts])
    return tbl, {"n_late": int(sum(l for _, l, _ in parts)),
                 "n_dup": int(sum(d for _, _, d in parts))}


class _EnrichShard:
    """One enrichment shard: owns the dimension buckets ``b`` with
    ``b % n_shards == shard_id``, loaded ONCE at init (sorted-key
    arrays), then joins every routed feed batch locally."""

    def __init__(self, dim_dir: str, shard_id: int, n_shards: int,
                 key_col: str, val_cols: "list[str]"):
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        frags = []
        for d in sorted(_glob.glob(_os.path.join(dim_dir, "bucket=*"))):
            b = int(d.rsplit("=", 1)[1])
            if b % n_shards != shard_id:
                continue
            frags += sorted(_glob.glob(_os.path.join(d, "*.parquet")))
        cols = [key_col] + val_cols
        if frags:
            t = pa.concat_tables([_pq.read_table(f, columns=cols)
                                  for f in frags])
        else:
            t = pa.table({c: pa.array([]) for c in cols})
        k = t[key_col].to_numpy(zero_copy_only=False)
        o = np.argsort(k, kind="stable")
        self.keys = k[o]
        if len(self.keys) > 1 and (self.keys[1:] == self.keys[:-1]).any():
            raise ValueError(
                "stream_enrich: duplicate dimension keys in shard "
                f"{shard_id}; dedup the dimension first")
        self.vals = t.take(pa.array(o)).select(val_cols)
        self.key_col, self.val_cols = key_col, val_cols

    def enrich(self, t: pa.Table):
        probe = t[self.key_col].to_numpy(zero_copy_only=False)
        n = len(self.keys)
        if n:
            pos = np.minimum(np.searchsorted(self.keys, probe), n - 1)
            hit = self.keys[pos] == probe
        else:
            pos = np.zeros(len(probe), np.int64)
            hit = np.zeros(len(probe), bool)
        out = {c: t[c] for c in t.column_names}
        # null out the miss indices (take(null) -> null), vectorized
        idx = pc.if_else(pa.array(hit),
                         pa.array(np.where(hit, pos, 0).astype(np.int64),
                                  pa.int64()),
                         pa.scalar(None, pa.int64()))
        for c in self.val_cols:
            out[c] = self.vals[c].combine_chunks().take(idx)
        return pa.table(out), int((~hit).sum())


def stream_enrich(batches, dim_dir: str, key_col: str,
                  val_cols: "list[str]", n_shards: int = 4,
                  max_inflight_per_shard: int = 4):
    """Stream-table join: enrich a live feed against a BUCKETED
    dimension store (``ops/bucketed.write_bucketed`` /
    ``ops/versioned.commit_bucketed`` layout) — the lookup side of a
    streaming pipeline (user → segment, host → crawl policy).

    Each of ``n_shards`` actors loads ONLY its share of the
    dimension's buckets once at init (dimension_bytes / n_shards per
    actor — never broadcast whole, never re-read per batch); feed
    batches hash-route rows to the owning shard (the SAME `_hash_part`
    the store was written with, so routing and storage agree), join
    locally against sorted-key arrays, and stream enriched rows back
    under the inflight cap (backpressure, like the window actors).

    LEFT-join semantics: unmatched feed rows keep nulls in the
    dimension columns and are counted.  Returns
    ``(pa.Table(feed_cols + val_cols), n_unmatched)``.  Duplicate
    dimension keys fail loudly at actor init.
    """
    import ray

    man_bucket = None
    import json as _json
    import os as _os
    with open(_os.path.join(dim_dir, "_bucketed.json")) as f:
        man = _json.load(f)
    if man["key"] != key_col:
        raise ValueError(
            f"stream_enrich: store is bucketed by {man['key']!r}, "
            f"not {key_col!r}")
    n_buckets = int(man["n_buckets"])
    man_bucket = n_buckets

    Shard = ray.remote(_EnrichShard)
    actors = [Shard.remote(dim_dir, s, n_shards, key_col, val_cols)
              for s in range(n_shards)]
    inflight: list = []
    ordered: list = []
    cap = max_inflight_per_shard * n_shards
    for b in batches:
        if len(b) == 0:
            continue
        bucket = _hash_part(b[key_col], man_bucket)
        shard = bucket % n_shards
        for s in np.unique(shard):
            sub = b.filter(pa.array(shard == s))
            ref = actors[int(s)].enrich.remote(sub)
            inflight.append(ref)
            ordered.append(ref)
        while len(inflight) > cap:
            _, inflight = ray.wait(inflight, num_returns=1)
    parts = ray.get(ordered)
    for a in actors:
        ray.kill(a)
    if not parts:
        return pa.table({}), 0
    tbl = pa.concat_tables([p for p, _ in parts])
    return tbl, int(sum(n for _, n in parts))


def tag_late_events(ds, order_col: str, ts_col: str, lateness_us: int,
                    out_col: str = "late"):
    """Replay-time watermark audit over a STORED event log: flag every
    row whose event time sits more than ``lateness_us`` behind the
    watermark its arrival position implies — ``late_i = ts_i <
    max_{arrival<i}(ts) − L``, arrival order = ``order_col``.  The
    batch-side complement of the actor-based ``stream_window_aggregate``
    (which drops late rows live): run this over yesterday's log to SIZE
    the allowed-lateness knob before deploying it.

    Shape — a distributed GLOBAL prefix scan (the one aggregate shape
    the keyed co-groups here can't express, since every row depends on
    ALL earlier rows): sort by arrival → materialize (pins block
    boundaries, so both passes see identical blocks with
    ``batch_size=None``) → pass 1 emits one (first_key, max_ts) row
    per block (driver holds n_blocks rows) → driver folds the
    EXCLUSIVE running max across blocks → pass 2 broadcasts that
    breakpoint table and finishes the scan inside each block with one
    ``np.maximum.accumulate``.  First event overall is never late
    (empty prefix), matching the SQL window's NULL comparison.
    """
    import ray

    s = ds.sort(order_col).materialize()

    def block_meta(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts_col], pa.int64())
        return pa.table({
            "first": pa.array([b[order_col][0].as_py()], pa.int64()),
            "mx": pa.array([pc.max(us).as_py()], pa.int64())})

    meta = (s.map_batches(block_meta, batch_format="pyarrow",
                          batch_size=None).to_pandas()
            .sort_values("first").reset_index(drop=True))
    # exclusive prefix max per block, keyed by the block's first order
    firsts = meta["first"].to_numpy(np.int64)
    mx = meta["mx"].to_numpy(np.int64)
    # sentinel well below any epoch-µs timestamp but safe against the
    # int64 underflow that iinfo.min − lateness would wrap into
    sentinel = -(np.int64(1) << 62)
    incoming = np.empty(len(mx), np.int64)
    run = sentinel
    for i in range(len(mx)):
        incoming[i] = run
        run = max(run, mx[i])
    ref = ray.put((firsts, incoming))

    def tag(b: pa.Table) -> pa.Table:
        fk, inc = ray.get(ref)
        us = pc.cast(b[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(fk, b[order_col][0].as_py())
        prev = np.empty(len(us), np.int64)
        prev[0] = inc[pos]
        if len(us) > 1:
            np.maximum.accumulate(us[:-1], out=prev[1:])
            prev[1:] = np.maximum(prev[1:], inc[pos])
        late = (us < prev - lateness_us).astype(np.int64)
        return pa.table({order_col: b[order_col],
                         out_col: pa.array(late, pa.int64())})

    return s.map_batches(tag, batch_format="pyarrow", batch_size=None)
