"""Distributed link-graph analytics over crawl host graphs.

``pagerank`` is the canonical "iterate a joined aggregate to fixpoint"
operator the web-crawl side of an extraction engine needs (host
authority for crawl prioritization / spam demotion).  The reference
engine has no graph surface — this extends the tier the way its job
metrics extend to windows (reference parity anchor: tesseract-rs
processes documents independently; host-level signals are the natural
corpus-scale complement, same role as `metrics.corpus_checksum`).

Design for 100 TB:

- **Integer arithmetic throughout** (micro-units): ranks are int64,
  contribution = ``rank // out_degree`` (floor), update =
  ``base + damping_pct * inflow // 100``.  No float sum-order
  nondeterminism — results are bit-identical across parallelism levels
  AND reproducible in ANSI SQL (the driver oracle unrolls the same
  iterations as CTEs).  Dangling-node mass is dropped (documented,
  deterministic) rather than redistributed.
- **Edges never leave the cluster.**  Per iteration the edge Dataset
  is scanned once; a per-block combiner (`np.add.at` over the block's
  unique dst values) emits ≤1 row per (block, dst) before the
  ``groupby(dst).Sum`` exchange, so a hot page (every crawl has one)
  costs one slim int64 row per block, not one per in-link.
- **Rank state placement is gated, like `cc.attach_labels`**: node
  tables up to ``broadcast_limit`` (exact count, fail-loud) live as
  two sorted numpy arrays in the object store (`ray.put` once per
  iteration, `searchsorted` lookup inside every map task).  Above the
  gate, `distributed=True` keeps ranks as a Dataset and resolves the
  edge⋈rank join per hash partition (union + ``groupby(part)`` —
  one co-group shuffle per iteration).  Both paths are bit-identical.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_log = logging.getLogger("xtract.ops.graph")


def _gate(op: str, detail: str, on_gate: str) -> None:
    """Broadcast-gate policy for ops with a bit-identical distributed
    mode.  ``on_gate='auto'`` (the default) emits ONE log line and the
    caller falls through to the co-group/Dataset-state path — a 100-TB
    operator never has to hand-flip ``distributed=True`` on gate trip.
    ``on_gate='error'`` preserves the fail-loud raise for callers that
    want the trip surfaced (e.g. to re-plan partitioning first)."""
    if on_gate == "error":
        raise ValueError(f"{op}: {detail}; pass distributed=True")
    if on_gate != "auto":
        raise ValueError(
            f"{op}: on_gate must be 'auto' or 'error', got {on_gate!r}")
    _log.warning("%s: %s — auto-routing to the bit-identical "
                 "distributed path", op, detail)


def _sorted_lookup(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray,
                   default: np.int64) -> np.ndarray:
    """Vectorized exact-match lookup probe→vals over sorted keys."""
    out = np.full(len(probe), default, np.int64)
    if len(keys):
        pos = np.searchsorted(keys, probe)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = keys[pos_c] == probe
        out[hit] = vals[pos_c[hit]]
    return out


def _block_sum(dst: np.ndarray, contrib: np.ndarray) -> pa.Table:
    """Combiner: collapse a block's contributions to one row per
    distinct dst (``np.add.at`` — no Python loop, no m² anything)."""
    u, inv = np.unique(dst, return_inverse=True)
    s = np.zeros(len(u), np.int64)
    np.add.at(s, inv, contrib)
    return pa.table({"node": pa.array(u, pa.int64()),
                     "inflow": pa.array(s, pa.int64())})


def _degrees(edges_ds, src: str):
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[src], pa.int64()).to_numpy(zero_copy_only=False)
        u, cnt = np.unique(ids, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(cnt.astype(np.int64), pa.int64())})

    return (edges_ds.select_columns([src])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("node").aggregate(Sum("deg", alias_name="deg")))


def _node_set(edges_ds, src: str, dst: str, nodes_ds):
    """Distinct node table: endpoints of every edge ∪ optional
    explicit node list (isolated hosts still get a rank)."""
    def ends(t: pa.Table) -> pa.Table:
        a = pc.cast(t[src], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t[dst], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            np.unique(np.concatenate([a, b])), pa.int64())})

    ds = edges_ds.map_batches(ends, batch_format="pyarrow")
    if nodes_ds is not None:
        def one(t: pa.Table) -> pa.Table:
            return pa.table({"node": pa.array(np.unique(
                pc.cast(t["node"], pa.int64())
                .to_numpy(zero_copy_only=False)), pa.int64())})
        ds = ds.union(nodes_ds.map_batches(one, batch_format="pyarrow"))
    # distinct via groupby(node).count — slim int64 exchange
    from ray.data.aggregate import Count
    return ds.groupby("node").aggregate(Count(alias_name="_n")) \
             .select_columns(["node"])


def pagerank(edges_ds, src: str = "src", dst: str = "dst", iters: int = 5,
             damping_pct: int = 85, unit: int = 1_000_000,
             nodes_ds=None, distributed: bool = False,
             broadcast_limit: int = 2_000_000, num_partitions: int = 32,
             on_gate: str = "auto"):
    """→ Dataset(node:int64, pagerank_micro:int64) after ``iters``
    integer power-iteration rounds.  r₀ = ``unit`` for every node;
    rₖ₊₁(v) = base + damping_pct·Σ_{(u,v)∈E} (rₖ(u) // deg(u)) // 100
    with base = (100−damping_pct)·unit // 100.  Deterministic and
    bit-identical at any parallelism (integer floor ops only).
    Past ``broadcast_limit`` nodes the rank state auto-routes to the
    bit-identical co-group path (``on_gate='error'`` raises instead).
    """
    import ray
    from ray.data.aggregate import Sum

    # The slim (src, dst) edge projection is pinned once (object store,
    # spill-backed): every iteration re-scans it, and an unpinned
    # Dataset would re-execute its whole upstream per iteration.
    base = (100 - damping_pct) * unit // 100
    deg_ds = _degrees(edges_ds, src).materialize()
    nodes = _node_set(edges_ds, src, dst, nodes_ds).materialize()
    n_nodes = nodes.count()
    if not distributed and n_nodes > broadcast_limit:
        _gate("pagerank", f"{n_nodes} nodes exceed broadcast_limit "
              f"{broadcast_limit}", on_gate)
        distributed = True

    edges = edges_ds.select_columns([src, dst]).materialize()

    if not distributed:
        ndf = nodes.to_pandas()  # ≤ broadcast_limit by the gate above
        node_arr = np.sort(ndf["node"].to_numpy().astype(np.int64))
        ddf = deg_ds.to_pandas()
        dk = ddf["node"].to_numpy().astype(np.int64)
        dv = ddf["deg"].to_numpy().astype(np.int64)
        o = np.argsort(dk, kind="stable")
        deg_ref = ray.put((dk[o], dv[o]))
        ranks = np.full(len(node_arr), unit, np.int64)

        for _ in range(iters):
            r_ref = ray.put(ranks)
            n_ref = ray.put(node_arr)

            def contrib(t: pa.Table, _r=r_ref, _n=n_ref, _d=deg_ref
                        ) -> pa.Table:
                nk = ray.get(_n)
                rv = ray.get(_r)
                dkk, dvv = ray.get(_d)
                s = pc.cast(t[src], pa.int64()).to_numpy(
                    zero_copy_only=False)
                d = pc.cast(t[dst], pa.int64()).to_numpy(
                    zero_copy_only=False)
                r_src = _sorted_lookup(nk, rv, s, np.int64(0))
                deg = _sorted_lookup(dkk, dvv, s, np.int64(1))
                return _block_sum(d, r_src // deg)

            # fold-tree reduction instead of a groupby exchange: the
            # combiner already caps each batch at ≤ n_nodes slim rows,
            # so one in-Dataset fold + a driver np.add.at finishes the
            # sum with NO all-to-all per iteration (integer sums
            # commute — exactness is unaffected)
            def sum_fold(t: pa.Table) -> pa.Table:
                return _block_sum(
                    t["node"].to_numpy(zero_copy_only=False),
                    t["inflow"].to_numpy(zero_copy_only=False))

            rows = (edges.map_batches(contrib, batch_format="pyarrow",
                                      batch_size=262_144)
                    .map_batches(sum_fold, batch_format="pyarrow",
                                 batch_size=1 << 20)
                    .take_all())
            if rows:
                nk = np.fromiter((r["node"] for r in rows), np.int64,
                                 len(rows))
                nv = np.fromiter((r["inflow"] for r in rows), np.int64,
                                 len(rows))
                u, inv = np.unique(nk, return_inverse=True)
                s = np.zeros(len(u), np.int64)
                np.add.at(s, inv, nv)
                got = _sorted_lookup(u, s, node_arr, np.int64(0))
            else:
                got = np.zeros(len(node_arr), np.int64)
            ranks = base + damping_pct * got // 100

        return ray.data.from_arrow(pa.table({
            "node": pa.array(node_arr, pa.int64()),
            "pagerank_micro": pa.array(ranks, pa.int64())}))

    # ---- distributed ranks: co-group edges⋈(rank,deg) on src ----
    def start_ranks(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"node": t["node"],
                         "pagerank_micro": pa.array(
                             np.full(n, unit, np.int64), pa.int64())})

    ranks_ds = nodes.map_batches(start_ranks, batch_format="pyarrow") \
                    .materialize()

    def part_of(ids: np.ndarray) -> np.ndarray:
        return np.abs(ids) % np.int64(num_partitions)

    for _ in range(iters):
        def tag_edges(t: pa.Table) -> pa.Table:
            s = pc.cast(t[src], pa.int64()).to_numpy(zero_copy_only=False)
            d = pc.cast(t[dst], pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(s), pa.int64()),
                "a": pa.array(s, pa.int64()),
                "b": pa.array(d, pa.int64()),
                "_side": pa.array(np.zeros(len(s), np.int8))})

        def tag_state(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "b": t["pagerank_micro"],
                "_side": pa.array(np.ones(len(n), np.int8))})

        def tag_deg(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "b": t["deg"],
                "_side": pa.array(np.full(len(n), 2, np.int8))})

        both = (edges.map_batches(tag_edges, batch_format="pyarrow")
                .union(ranks_ds.map_batches(tag_state,
                                            batch_format="pyarrow"))
                .union(deg_ds.map_batches(tag_deg,
                                          batch_format="pyarrow")))

        def per_part(g: pa.Table) -> pa.Table:
            side = g["_side"].to_numpy(zero_copy_only=False)
            a = g["a"].to_numpy(zero_copy_only=False)
            b = g["b"].to_numpy(zero_copy_only=False)
            rk, rv = a[side == 1], b[side == 1]
            o = np.argsort(rk, kind="stable")
            rk, rv = rk[o], rv[o]
            dk, dv = a[side == 2], b[side == 2]
            o = np.argsort(dk, kind="stable")
            dk, dv = dk[o], dv[o]
            es, ed = a[side == 0], b[side == 0]
            if not len(es):
                return pa.table({"node": pa.array([], pa.int64()),
                                 "inflow": pa.array([], pa.int64())})
            r_src = _sorted_lookup(rk, rv, es, np.int64(0))
            deg = _sorted_lookup(dk, dv, es, np.int64(1))
            return _block_sum(ed, r_src // deg)

        from ray.data.aggregate import Sum
        inflow = (both.groupby("_part")
                  .map_groups(per_part, batch_format="pyarrow")
                  .groupby("node").aggregate(
                      Sum("inflow", alias_name="inflow")))

        # attach base to EVERY node (also in-degree-0 ones): co-group
        # nodes ∪ inflow by node hash, vectorized lookup per partition
        def tag_nodes(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "b": pa.array(np.zeros(len(n), np.int64), pa.int64()),
                "_side": pa.array(np.zeros(len(n), np.int8))})

        def tag_inflow(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "b": t["inflow"],
                "_side": pa.array(np.ones(len(n), np.int8))})

        def apply_update(g: pa.Table) -> pa.Table:
            side = g["_side"].to_numpy(zero_copy_only=False)
            a = g["a"].to_numpy(zero_copy_only=False)
            b = g["b"].to_numpy(zero_copy_only=False)
            ik, iv = a[side == 1], b[side == 1]
            o = np.argsort(ik, kind="stable")
            nodes_here = a[side == 0]
            got = _sorted_lookup(ik[o], iv[o], nodes_here, np.int64(0))
            return pa.table({
                "node": pa.array(nodes_here, pa.int64()),
                "pagerank_micro": pa.array(
                    base + damping_pct * got // 100, pa.int64())})

        ranks_ds = (nodes.map_batches(tag_nodes, batch_format="pyarrow")
                    .union(inflow.map_batches(tag_inflow,
                                              batch_format="pyarrow"))
                    .groupby("_part")
                    .map_groups(apply_update, batch_format="pyarrow")
                    .materialize())

    return ranks_ds


def snapshot_diff(old_ds, new_ds, key: str = "url",
                  digest: str = "digest", num_partitions: int = 32):
    """Crawl-dump diff: → Dataset(key, status) with status ∈
    {'added','removed','changed','unchanged'} comparing two snapshots
    by content digest — the incremental-recrawl planning step (process
    only added/changed urls next job, the Dataset-native complement of
    `ops.dedup_index`'s actor-based cross-job seen-set).

    Shape: both sides project to slim (key, digest) rows, tag
    ``part = hash(key) % P`` (stable `pandas.util.hash_array`), ONE
    co-group, per-partition vectorized classification via a pandas
    merge (cython hash join — no Python per-row work).  Assumes keys
    are unique within each snapshot (crawl dumps are url-deduped; the
    winner rule for raw dumps is `agg.first_row_per_key`).
    """
    import pandas as pd

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            vals = np.asarray(t[key].to_pylist(), dtype=object)
            part = (pd.util.hash_array(vals)
                    % num_partitions).astype(np.int64)
            return pa.table({
                "_part": pa.array(part, pa.int64()),
                key: t[key],
                digest: t[digest],
                "_side": pa.array(np.full(len(t), side, np.int8))})
        return f

    both = (old_ds.select_columns([key, digest])
            .map_batches(tag(0), batch_format="pyarrow")
            .union(new_ds.select_columns([key, digest])
                   .map_batches(tag(1), batch_format="pyarrow")))

    def classify(g: pa.Table) -> pa.Table:
        df = g.select([key, digest, "_side"]).to_pandas()
        old = df[df["_side"] == 0]
        new = df[df["_side"] == 1]
        m = old.merge(new, on=key, how="outer", suffixes=("_o", "_n"))
        d_o, d_n = m[digest + "_o"], m[digest + "_n"]
        status = np.where(
            d_o.isna(), "added",
            np.where(d_n.isna(), "removed",
                     np.where(d_o == d_n, "unchanged", "changed")))
        return pa.table({key: pa.array(m[key], pa.string()),
                         "status": pa.array(status, pa.string())})

    return both.groupby("_part").map_groups(classify,
                                            batch_format="pyarrow")


def reciprocal_host_pairs(links_ds, src_url_col: str = "url",
                          dst_host_col: str = "host"):
    """Host pairs that link to each other in BOTH directions — the
    crawl-graph mutual-citation / link-farm signal.

    Shape: one vectorized map turns each link row into a slim unordered
    pair row ``(host_a < host_b, fwd, bwd)`` DEDUPED per block (a block
    with a million links between two hosts contributes ONE row), then
    ONE native groupby(a, b) Max/Max and a filter — the shuffle moves
    at most (distinct pairs per block) rows, never per-link rows.
    Self-links are dropped.

    → (host_a, host_b), host_a < host_b."""
    import pandas as pd
    from ray.data.aggregate import Max

    from ..links import host_of

    def pair_rows(b: pa.Table) -> pa.Table:
        src = np.asarray([host_of(u or "")
                          for u in b[src_url_col].to_pylist()], dtype=object)
        dst = np.asarray(
            [h or "" for h in b[dst_host_col].to_pylist()], dtype=object)
        keep = (src != dst) & (src != "") & (dst != "")
        src, dst = src[keep], dst[keep]
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        fwd = (src < dst).astype(np.int64)
        df = pd.DataFrame({"host_a": lo, "host_b": hi, "fwd": fwd,
                           "bwd": 1 - fwd}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (links_ds.map_batches(pair_rows, batch_format="pyarrow")
           .groupby(["host_a", "host_b"])
           .aggregate(Max("fwd", alias_name="fwd"),
                      Max("bwd", alias_name="bwd")))

    def only_mutual(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["fwd"], 1), pc.equal(t["bwd"], 1))
        return t.filter(m).select(["host_a", "host_b"])

    return agg.map_batches(only_mutual, batch_format="pyarrow")


def triangle_counts(edges_ds, src: str = "src", dst: str = "dst",
                    num_partitions: int = 32,
                    broadcast_limit: int = 2_000_000):
    """Per-node triangle counts over an (unweighted, possibly directed
    / duplicated) edge list — the compact-community signal used to
    find template farms and link rings in a crawl graph.

    Classic degree-ordered node-iterator (Schank & Wagner 2005, public
    algorithm), expressed in Ray Data:

    1. **distinct undirected edges**: per-block unordered-pair dedup →
       native ``groupby(u,v).aggregate(Count)`` (count discarded);
    2. **degree orientation**: each edge points from the endpoint with
       (degree, id) smaller to larger — bounds per-node out-degree by
       O(√E), so step 3's pair explosion is O(E^1.5) TOTAL, not
       O(Σ deg²) (the hot-node mitigation).  Degrees are node-bounded;
       they attach via broadcast below ``broadcast_limit`` nodes
       (exact-count gate) or a hash co-group above it;
    3. **wedges**: co-group oriented edges by source; each group emits
       candidate pairs (v, w) of out-neighbors as a composite int key;
    4. **closure**: ``semi_join_cogroup`` of wedges against oriented
       edges on the composite key — surviving wedges are triangles;
    5. explode each triangle to its 3 corners → grouped Count.

    → Dataset(node int64, n_triangles int64), only nodes in ≥1
    triangle.  Node ids must fit in 31 bits (composite key packing).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    from .agg import _hash_part
    from .joins import semi_join_cogroup

    def undirect(b: pa.Table) -> pa.Table:
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        key = lo * (np.int64(1) << 31) + hi
        key = np.unique(key)
        return pa.table({
            "u": pa.array(key >> 31, pa.int64()),
            "v": pa.array(key & ((1 << 31) - 1), pa.int64())})

    edges = (edges_ds.map_batches(undirect, batch_format="pyarrow")
             .groupby(["u", "v"]).aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"])
             .materialize())  # distinct-edge table, reused 3×

    # degrees over BOTH endpoints (undirected)
    def deg_partial(b: pa.Table) -> pa.Table:
        ids = np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)])
        un, cnt = np.unique(ids, return_counts=True)
        return pa.table({"node": pa.array(un, pa.int64()),
                         "d": pa.array(cnt, pa.int64())})

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("d", alias_name="d")))

    # gate + pull in ONE execution: limit(N+1) bounds the driver pull
    # even when the node table is huge; >N rows back → co-group path
    dt = deg.limit(broadcast_limit + 1).to_pandas()
    if len(dt) <= broadcast_limit:
        dn = dt["node"].to_numpy().astype(np.int64)
        dd = dt["d"].to_numpy().astype(np.int64)
        order = np.argsort(dn)
        deg_ref = ray.put((dn[order], dd[order]))

        def orient(b: pa.Table) -> pa.Table:
            nodes, ds_ = ray.get(deg_ref)
            u = b["u"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            du = ds_[np.searchsorted(nodes, u)]
            dv = ds_[np.searchsorted(nodes, v)]
            # orient from (deg, id)-smaller to larger
            fwd = (du < dv) | ((du == dv) & (u < v))
            a = np.where(fwd, u, v)
            z = np.where(fwd, v, u)
            return pa.table({"a": pa.array(a, pa.int64()),
                             "z": pa.array(z, pa.int64())})

        oriented = edges.map_batches(orient, batch_format="pyarrow")
    else:
        # co-group attach: edges ⋈ deg on u, then on v — node-bounded
        # exchange only (slim int64 columns)
        from .joins import equi_join_cogroup

        e1 = equi_join_cogroup(
            edges, deg.map_batches(
                lambda t: t.rename_columns(["node", "du"]),
                batch_format="pyarrow"),
            on="u", right_on="node", num_partitions=num_partitions)
        e2 = equi_join_cogroup(
            e1, deg.map_batches(
                lambda t: t.rename_columns(["node", "dv"]),
                batch_format="pyarrow"),
            on="v", right_on="node", num_partitions=num_partitions)

        def orient2(b: pa.Table) -> pa.Table:
            u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            du = b["du"].to_numpy(zero_copy_only=False).astype(np.int64)
            dv = b["dv"].to_numpy(zero_copy_only=False).astype(np.int64)
            fwd = (du < dv) | ((du == dv) & (u < v))
            a = np.where(fwd, u, v)
            z = np.where(fwd, v, u)
            return pa.table({"a": pa.array(a, pa.int64()),
                             "z": pa.array(z, pa.int64())})

        oriented = e2.map_batches(orient2, batch_format="pyarrow")

    oriented = oriented.materialize()  # reused: wedge source + closure

    def tag(b: pa.Table) -> pa.Table:
        part = _hash_part(b["a"], num_partitions)
        return b.append_column("_part", pa.array(part, pa.int64()))

    def wedges(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        z = g["z"].to_numpy(zero_copy_only=False)
        order = np.lexsort((z, a))
        a, z = a[order], z[order]
        # run boundaries per source node
        change = np.ones(len(a), bool)
        change[1:] = a[1:] != a[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(a))
        us, vs, ws = [], [], []
        for s, e in zip(starts, ends):
            nb = z[s:e]
            m = len(nb)
            if m < 2:
                continue
            iu, iw = np.triu_indices(m, k=1)  # out-degree ≤ O(√E)
            us.append(np.full(len(iu), a[s], np.int64))
            vs.append(nb[iu])
            ws.append(nb[iw])
        if not us:
            return pa.table({"tri_u": pa.array([], pa.int64()),
                             "wkey": pa.array([], pa.int64())})
        u_all = np.concatenate(us)
        v_all = np.concatenate(vs).astype(np.int64)
        w_all = np.concatenate(ws).astype(np.int64)
        return pa.table({
            "tri_u": pa.array(u_all, pa.int64()),
            "wkey": pa.array(v_all * (np.int64(1) << 31) + w_all,
                             pa.int64())})

    wedge_ds = (oriented.map_batches(tag, batch_format="pyarrow")
                .groupby("_part")
                .map_groups(wedges, batch_format="pyarrow"))

    def ekey(b: pa.Table) -> pa.Table:
        # probe keys come from the UNDIRECTED (id-ordered u<v) edge
        # table — wedge keys are id-normalized, while `oriented` may
        # point either way under degree order
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"wkey": pa.array(u * (np.int64(1) << 31) + v,
                                          pa.int64())})

    closed = semi_join_cogroup(
        wedge_ds, edges.map_batches(ekey, batch_format="pyarrow"),
        on="wkey", num_partitions=num_partitions)

    def corners(b: pa.Table) -> pa.Table:
        u = b["tri_u"].to_numpy(zero_copy_only=False)
        k = b["wkey"].to_numpy(zero_copy_only=False)
        v = k >> 31
        w = k & ((1 << 31) - 1)
        return pa.table({"node": pa.array(
            np.concatenate([u, v, w]), pa.int64())})

    return (closed.map_batches(corners, batch_format="pyarrow")
            .groupby("node").aggregate(Count(alias_name="n_triangles")))


def jaccard_pairs(ds, set_col: str, member_col: str,
                  min_overlap: int = 1,
                  max_member_fanout: int | None = None,
                  num_partitions: int = 32,
                  broadcast_limit: int = 2_000_000,
                  emit_sizes: bool = False):
    """Pairwise Jaccard similarity between SETS from a flat membership
    table (set_id, member) — e.g. hosts by shared outlink targets,
    users by shared items.  Exact integers only: the similarity is the
    fraction ``jac_num / jac_den`` with num = |A∩B|,
    den = |A|+|B|−|A∩B|.

    Shape: distinct memberships (native groupby) → per-member pair
    explode in a coarse co-group (vectorized run-detect + triu, the
    wedge kernel) → ONE grouped Count per pair → set sizes attached by
    broadcast below an exact-count gate, else co-group.

    ``max_member_fanout`` drops members shared by more than that many
    sets before pairing (the standard stop-member rule: a member in m
    sets emits m(m−1)/2 pairs, so one viral member can dominate the
    exchange; dropped members also leave the den sizes — callers that
    need exact Jaccard must leave it None).
    """
    import ray
    from ray.data.aggregate import Count

    from .agg import _hash_part

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({"s": pc.cast(b[set_col], pa.int64()),
                         "m": pc.cast(b[member_col], pa.int64())})

    memb = (ds.map_batches(slim, batch_format="pyarrow")
            .groupby(["s", "m"]).aggregate(Count(alias_name="_c"))
            .drop_columns(["_c"]))

    memb = memb.materialize()  # reused: sizes + pairing (+fanout)

    if max_member_fanout is not None:
        def fanout_partial(b: pa.Table) -> pa.Table:
            un, cnt = np.unique(
                b["m"].to_numpy(zero_copy_only=False), return_counts=True)
            return pa.table({"m": pa.array(un, pa.int64()),
                             "fan": pa.array(cnt, pa.int64())})

        from ray.data.aggregate import Sum

        hot = (memb.map_batches(fanout_partial, batch_format="pyarrow")
               .groupby("m").aggregate(Sum("fan", alias_name="fan"))
               .filter(lambda r: r["fan"] > max_member_fanout))
        hot_set = frozenset(r["m"] for r in hot.take_all())
        hot_ref = ray.put(hot_set)

        def drop_hot(b: pa.Table) -> pa.Table:
            hs = ray.get(hot_ref)
            if not hs:
                return b
            mask = ~np.isin(b["m"].to_numpy(zero_copy_only=False),
                            np.fromiter(hs, np.int64))
            return b.filter(pa.array(mask))

        paired_src = memb.map_batches(drop_hot, batch_format="pyarrow")
    else:
        paired_src = memb

    # set sizes (AFTER the stop-member drop, so den matches num's view
    # of the world when a fanout cap is set)
    def size_partial(b: pa.Table) -> pa.Table:
        un, cnt = np.unique(
            b["s"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"s": pa.array(un, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    from ray.data.aggregate import Sum

    sizes = (paired_src.map_batches(size_partial, batch_format="pyarrow")
             .groupby("s").aggregate(Sum("n", alias_name="n")))

    def tag(b: pa.Table) -> pa.Table:
        part = _hash_part(b["m"], num_partitions)
        return b.append_column("_part", pa.array(part, pa.int64()))

    def pairs(g: pa.Table) -> pa.Table:
        m = g["m"].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, m))
        m, s = m[order], s[order]
        change = np.ones(len(m), bool)
        change[1:] = m[1:] != m[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(m))
        aa, bb = [], []
        for lo, hi in zip(starts, ends):
            run = s[lo:hi]
            if len(run) < 2:
                continue
            ia, ib = np.triu_indices(len(run), k=1)
            aa.append(run[ia])
            bb.append(run[ib])
        if not aa:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(aa), pa.int64()),
                         "b": pa.array(np.concatenate(bb), pa.int64())})

    co = (paired_src.map_batches(tag, batch_format="pyarrow")
          .groupby("_part").map_groups(pairs, batch_format="pyarrow")
          .groupby(["a", "b"]).aggregate(Count(alias_name="jac_num")))

    # gate + pull in ONE execution (bounded driver pull)
    st = sizes.limit(broadcast_limit + 1).to_pandas()
    if len(st) > broadcast_limit:
        raise ValueError(
            f">{broadcast_limit} sets exceed broadcast_limit; "
            "attach sizes via ops.joins.equi_join_cogroup instead")
    sn = st["s"].to_numpy().astype(np.int64)
    sz = st["n"].to_numpy().astype(np.int64)
    order = np.argsort(sn)
    size_ref = ray.put((sn[order], sz[order]))

    def attach(t: pa.Table) -> pa.Table:
        nodes, szs = ray.get(size_ref)
        t = t.filter(pc.greater_equal(t["jac_num"],
                                      pa.scalar(min_overlap)))
        if len(t) == 0:
            cols = {"a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "jac_num": pa.array([], pa.int64()),
                    "jac_den": pa.array([], pa.int64())}
            if emit_sizes:
                cols["n_a"] = pa.array([], pa.int64())
                cols["n_b"] = pa.array([], pa.int64())
            return pa.table(cols)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        co_ = t["jac_num"].to_numpy(zero_copy_only=False)
        sa = szs[np.searchsorted(nodes, a)]
        sb = szs[np.searchsorted(nodes, b)]
        den = sa + sb - co_
        cols = {"a": t["a"], "b": t["b"],
                "jac_num": t["jac_num"],
                "jac_den": pa.array(den, pa.int64())}
        if emit_sizes:
            cols["n_a"] = pa.array(sa, pa.int64())
            cols["n_b"] = pa.array(sb, pa.int64())
        return pa.table(cols)

    return co.map_batches(attach, batch_format="pyarrow")


def resolve_pointer_chains(state_ds, partitions: int = 16,
                           max_rounds: int = 64):
    """Functional-graph contraction by POINTER DOUBLING.

    ``state_ds`` holds one row per node: ``d`` (node id), ``ptr``
    (its successor — itself iff terminal), ``hops`` (1 for a source,
    0 for a terminal) and ``src`` (1 iff the node redirects).  Each
    round joins the table with itself via one hash co-group
    (``ptr ← ptr[ptr]``, ``hops ← hops + hops[ptr]``), so a chain of
    length L resolves in ⌈log₂ L⌉ all-to-alls instead of L BFS rounds
    — the shape that matters when crawl redirect chains are thousands
    of hops of URL-shortener spam.  Termination is an exact
    driver-checked aggregate (#rows whose pointer is still a source),
    not a fixed round count.

    Returns the converged state Dataset (columns d/ptr/hops/src).
    Beyond-reference training-data op (redirect/alias resolution for
    crawl curation); no direct analogue in the reference surface.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .agg import _hash_part

    def double(t: pa.Table) -> pa.Table:
        q = t.filter(pc.equal(t["_flag"], 1))
        g = t.filter(pc.equal(t["_flag"], 0))
        Q = pd.DataFrame({"d": q["d"].to_pandas(),
                          "ptr": q["ptr"].to_pandas(),
                          "hops": q["hops"].to_pandas(),
                          "src": q["src"].to_pandas()})
        G = pd.DataFrame({"ptr": g["d"].to_pandas(),
                          "ptr2": g["ptr"].to_pandas(),
                          "hops2": g["hops"].to_pandas(),
                          "src2": g["src"].to_pandas()})
        m = Q.merge(G, on="ptr")
        moving = m["src2"].to_numpy() == 1
        new_ptr = np.where(moving, m["ptr2"].to_numpy(),
                           m["ptr"].to_numpy())
        new_hops = m["hops"].to_numpy() + np.where(
            moving, m["hops2"].to_numpy(), 0)
        return pa.table({
            "d": pa.array(m["d"], pa.int64()),
            "ptr": pa.array(new_ptr, pa.int64()),
            "hops": pa.array(new_hops, pa.int64()),
            "src": pa.array(m["src"], pa.int64()),
            "moving": pa.array(moving.astype(np.int64), pa.int64())})

    def tag_both(b: pa.Table) -> pa.Table:
        # ONE scan emits the query copy (hashed by ptr) and the
        # target copy (hashed by d) — no second pass, no union
        n = len(b)
        cols = {"d": b["d"], "ptr": b["ptr"], "hops": b["hops"],
                "src": b["src"]}
        q = pa.table({
            "_part": pa.array(_hash_part(b["ptr"], partitions),
                              pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)), **cols})
        g = pa.table({
            "_part": pa.array(_hash_part(b["d"], partitions),
                              pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)), **cols})
        return pa.concat_tables([q, g])

    state = state_ds.materialize()
    for _round in range(max_rounds):
        nxt = (state.map_batches(tag_both, batch_format="pyarrow")
               .groupby("_part")
               .map_groups(double, batch_format="pyarrow")
               .materialize())
        still = int(nxt.aggregate(Sum("moving", alias_name="m"))["m"]
                    or 0)
        state = nxt  # 'moving' is ignored by tag_both; dropped at end
        if still == 0:
            break
    else:
        # a redirect CYCLE has no terminal: pointers keep moving
        # forever (64 doublings cover any acyclic chain of length
        # < 2^64, so exhaustion ⇒ cycles).  Fail loud rather than
        # return half-doubled pointers/hops (round 4).
        raise RuntimeError(
            f"resolve_pointer_chains: {still} pointers still moving "
            f"after {max_rounds} doubling rounds — redirect cycles "
            f"have no terminal; break cycles upstream (drop one edge "
            f"per cycle) before resolving")
    return state.drop_columns(["moving"])


# ---------------------------------------------------------------------------
# anchor-text harvest (per-target link-description profile)
# ---------------------------------------------------------------------------

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<h>[^/?#]+)"


def anchor_text_profile(links_ds, target_col: str = "href",
                        anchor_col: str = "anchor_text",
                        src_url_col: str = "url",
                        cross_host_only: bool = True,
                        num_partitions: int = 64):
    """→ Dataset(target, n_links, n_hosts, n_distinct_anchors,
    top_anchor, top_anchor_links): the classic web-corpus anchor-text
    harvest — for every link TARGET, how other sites describe it
    (MS-MARCO / anchor-corpus construction; also the strongest
    relevance signal a crawl-side ranker has).  Reference parity
    anchor: tesseract-rs has no link surface; this extends
    `links.extract_outlinks` the way `pagerank` extends the host graph.

    Semantics: with ``cross_host_only`` (default) only CROSS-HOST
    links with non-empty anchor text count (intra-host nav/boilerplate
    anchors describe layout, not content).  ``top_anchor`` is the
    modal anchor string per target, ties broken lexicographically —
    total-order deterministic.

    Scale shape (no broadcast, ONE all-to-all):

    1. vectorized filter: target + source hosts via TWO Arrow
       `extract_regex` kernels (`links.extract_outlinks`'s ``host``
       column is the TARGET's host; the source host comes from the
       page url);
    2. block combiner: distinct (target, anchor, src_host) triples +
       partial counts via one sort + run-length pass — a viral anchor
       dedups into counts before the exchange;
    3. ONE coarse hash co-group by target: every per-target statistic
       (pair counts, modal anchor, distinct hosts) is then local to
       its partition and computed with cython pandas kernels.  The
       first design ran pair-groupby + distinct + top-1 + two joins —
       7 exchanges whose per-stage scheduling floor dominated wall
       time 5× over the data cost.
    """
    def cross_host(t: pa.Table) -> pa.Table:
        th = pc.struct_field(
            pc.extract_regex(t[target_col], _HOST_RE), "h")
        sh = pc.struct_field(
            pc.extract_regex(t[src_url_col], _HOST_RE), "h")
        keep = pc.not_equal(pc.fill_null(t[anchor_col], ""), "")
        if cross_host_only:
            keep = pc.and_kleene(keep, pc.not_equal(
                pc.fill_null(th, ""), pc.fill_null(sh, "")))
        mask = pc.fill_null(keep, False)
        out = t.filter(mask)
        return pa.table({
            "target": out[target_col].cast(pa.string()),
            "anchor": out[anchor_col].cast(pa.string()),
            "src_host": sh.filter(mask).cast(pa.string())})

    def _rollup(t: pa.Table, counts: bool) -> pa.Table:
        # collapse to distinct (target, anchor, host) triples + count —
        # sort + run-length, no Python loop; a hot (viral) anchor
        # contributes ≤1 row per block
        idx = pc.sort_indices(t, sort_keys=[("target", "ascending"),
                                            ("anchor", "ascending"),
                                            ("src_host", "ascending")])
        t = t.take(idx)
        change = np.zeros(len(t), bool)
        change[0] = True
        for c in ("target", "anchor", "src_host"):
            ne = pc.not_equal(t[c].slice(1), t[c].slice(0, len(t) - 1))
            change[1:] |= pc.fill_null(ne, True).to_numpy(
                zero_copy_only=False).astype(bool)
        starts = np.flatnonzero(change)
        if counts:
            # re-fold: sum the existing partial counts per run
            cs = np.r_[np.int64(0),
                       np.cumsum(t["n"].to_numpy(zero_copy_only=False))]
            ends = np.r_[starts[1:], len(t)]
            n = cs[ends] - cs[starts]
            t = t.drop_columns(["n"])
        else:
            n = np.diff(np.r_[starts, len(t)])
        return t.take(pa.array(starts)).append_column(
            "n", pa.array(n.astype(np.int64), pa.int64()))

    def combine(t: pa.Table) -> pa.Table:
        t = cross_host(t)
        if len(t) == 0:
            return t.append_column("n", pa.array([], pa.int64()))
        return _rollup(t, counts=False)

    def refold(t: pa.Table) -> pa.Table:
        # fold-tree consolidation: merge many tiny combiner blocks into
        # a few large ones BEFORE the exchange — Ray's sort-shuffle
        # floor scales with input block count (measured 7.3 s over 208
        # near-empty blocks vs <1 s after folding)
        if len(t) == 0:
            return t
        return _rollup(t, counts=True)

    def add_part(t: pa.Table) -> pa.Table:
        from .agg import _hash_part
        return t.append_column(
            "_part", pa.array(_hash_part(t["target"], num_partitions),
                              pa.int64()))

    def finish(g: pa.Table) -> pa.Table:
        # all rows of a target are in this partition: pair counts, the
        # modal anchor, and distinct hosts are all local, vectorized
        df = g.to_pandas()
        pair = (df.groupby(["target", "anchor"], sort=False)["n"]
                .sum().reset_index())
        agg = pair.groupby("target", sort=False)["n"] \
            .agg(n_links="sum", n_distinct_anchors="count").reset_index()
        top = (pair.sort_values(["target", "n", "anchor"],
                                ascending=[True, False, True],
                                kind="mergesort")
               .drop_duplicates("target")
               .rename(columns={"anchor": "top_anchor",
                                "n": "top_anchor_links"}))
        hosts = (df[["target", "src_host"]].drop_duplicates()
                 .groupby("target", sort=False).size()
                 .rename("n_hosts").reset_index())
        out = agg.merge(hosts, on="target").merge(
            top[["target", "top_anchor", "top_anchor_links"]], on="target")
        return pa.table({
            "target": pa.array(out["target"], pa.string()),
            "n_links": pa.array(out["n_links"].to_numpy(np.int64)),
            "n_hosts": pa.array(out["n_hosts"].to_numpy(np.int64)),
            "n_distinct_anchors": pa.array(
                out["n_distinct_anchors"].to_numpy(np.int64)),
            "top_anchor": pa.array(out["top_anchor"], pa.string()),
            "top_anchor_links": pa.array(
                out["top_anchor_links"].to_numpy(np.int64))})

    out = (links_ds.map_batches(combine, batch_format="pyarrow")
           .map_batches(refold, batch_format="pyarrow",
                        batch_size=1 << 16, num_cpus=0.5)
           .map_batches(add_part, batch_format="pyarrow")
           .groupby("_part")
           .map_groups(finish, batch_format="pyarrow"))
    # ONE all-to-all total (vs pair-groupby + distinct + top-1 + two
    # joins ≈ 7 exchanges: each costs a scheduling floor regardless of
    # volume).  Seed the 6-column schema with an empty block instead
    # of probing `out.schema()` — the probe would execute the whole
    # upstream once and the consumer would run it AGAIN (measured 2×
    # wall on the bench corpus).
    import ray
    seed = ray.data.from_arrow(pa.table({
        "target": pa.array([], pa.string()),
        "n_links": pa.array([], pa.int64()),
        "n_hosts": pa.array([], pa.int64()),
        "n_distinct_anchors": pa.array([], pa.int64()),
        "top_anchor": pa.array([], pa.string()),
        "top_anchor_links": pa.array([], pa.int64())}))
    return seed.union(out)


# ---------------------------------------------------------------------------
# HITS (hubs & authorities)
# ---------------------------------------------------------------------------

def hits(edges_ds, src: str = "src", dst: str = "dst", iters: int = 3,
         unit: int = 1_000_000, nodes_ds=None, distributed: bool = False,
         broadcast_limit: int = 2_000_000, num_partitions: int = 32,
         on_gate: str = "auto"):
    """→ Dataset(node:int64, hub_micro:int64, auth_micro:int64) after
    ``iters`` HITS rounds — the hubs/authorities complement of
    `pagerank` (link-directory vs destination quality; the pair is the
    classic crawl-frontier scoring duo).  Integer arithmetic
    throughout: per round  authᵣₐᵥ(v) = Σ_{(u,v)∈E} hub(u)  then
    auth = authᵣₐᵥ·unit // max(authᵣₐᵥ)  (max-normalization — exact in
    int64 and replayable in SQL), and symmetrically for hubs over
    out-edges.  Bit-identical at any parallelism.

    Scale shape (same contract as `pagerank`): below
    ``broadcast_limit`` (exact node count, fail-loud) node state is
    two int64 arrays, edges are pinned once and re-scanned per
    half-step with the `_block_sum` per-block combiner (a hot node
    costs ≤1 row per block), and the fold-tree reduction finishes each
    sum with NO all-to-all.  Above the gate, ``distributed=True``
    keeps hub/auth as Datasets and resolves the edge⋈state join per
    hash partition (two co-group exchanges + one native Max per
    half-step); both paths are bit-identical.

    Overflow guard: normalization computes ``raw · unit`` in int64 —
    the hottest node's raw inflow must stay below 2⁶³/unit (≈9.2e12
    micro-units ⇒ ~9.2M unit-weight in-links).  Checked, fail-loud.
    """
    import ray

    nodes = _node_set(edges_ds, src, dst, nodes_ds).materialize()
    n_nodes = nodes.count()
    if not distributed and n_nodes > broadcast_limit:
        _gate("hits", f"{n_nodes} nodes exceed broadcast_limit "
              f"{broadcast_limit}", on_gate)
        distributed = True
    edges = edges_ds.select_columns([src, dst]).materialize()

    if distributed:
        return _hits_distributed(edges, nodes, src, dst, iters, unit,
                                 num_partitions)

    node_arr = np.sort(
        nodes.to_pandas()["node"].to_numpy().astype(np.int64))
    n_ref = ray.put(node_arr)

    def propagate(weights: np.ndarray, from_col: str, to_col: str
                  ) -> np.ndarray:
        """Σ over edges of weight(from) grouped by to — one pinned-edge
        scan: block combiner + fold tree + driver add.at finish."""
        w_ref = ray.put(weights)

        def contrib(t: pa.Table, _w=w_ref, _n=n_ref) -> pa.Table:
            nk = ray.get(_n)
            wv = ray.get(_w)
            f = pc.cast(t[from_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            to = pc.cast(t[to_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            return _block_sum(to, _sorted_lookup(nk, wv, f, np.int64(0)))

        def sum_fold(t: pa.Table) -> pa.Table:
            return _block_sum(
                t["node"].to_numpy(zero_copy_only=False),
                t["inflow"].to_numpy(zero_copy_only=False))

        rows = (edges.map_batches(contrib, batch_format="pyarrow",
                                  batch_size=262_144)
                .map_batches(sum_fold, batch_format="pyarrow",
                             batch_size=1 << 20)
                .take_all())  # ≤ n_nodes slim rows after the fold tree
        out = np.zeros(len(node_arr), np.int64)
        if rows:
            nk = np.fromiter((r["node"] for r in rows), np.int64,
                             len(rows))
            nv = np.fromiter((r["inflow"] for r in rows), np.int64,
                             len(rows))
            u, inv = np.unique(nk, return_inverse=True)
            s = np.zeros(len(u), np.int64)
            np.add.at(s, inv, nv)
            out = _sorted_lookup(u, s, node_arr, np.int64(0))
        return out

    def normalize(raw: np.ndarray) -> np.ndarray:
        mx = int(raw.max()) if len(raw) else 0
        if mx <= 0:
            return raw
        if mx > (2 ** 63 - 1) // unit:
            raise OverflowError(
                "hits: raw inflow too hot for int64 normalization; "
                "lower `unit` or pre-aggregate the hot node")
        return raw * np.int64(unit) // np.int64(mx)

    hub = np.full(len(node_arr), unit, np.int64)
    auth = np.zeros(len(node_arr), np.int64)
    for _ in range(iters):
        auth = normalize(propagate(hub, src, dst))
        hub = normalize(propagate(auth, dst, src))

    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr, pa.int64()),
        "hub_micro": pa.array(hub, pa.int64()),
        "auth_micro": pa.array(auth, pa.int64())}))


def _hits_distributed(edges, nodes, src: str, dst: str, iters: int,
                      unit: int, num_partitions: int):
    """HITS with state as Datasets — the above-gate path: per
    half-step, ONE co-group resolves the edge⋈state join (weights
    looked up per hash partition), ONE slim grouped Sum finishes the
    inflow, ONE co-group attaches zeros for inflow-less nodes, and the
    normalization max is a native aggregate.  All exchanges move
    (int64, int64) rows only; bit-identical to the broadcast path."""
    import ray
    from ray.data.aggregate import Sum

    def part_of(ids: np.ndarray) -> np.ndarray:
        return np.abs(ids) % np.int64(num_partitions)

    def propagate(state_ds, from_col: str, to_col: str):
        def tag_edges(t: pa.Table) -> pa.Table:
            f = pc.cast(t[from_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            to = pc.cast(t[to_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(f), pa.int64()),
                "a": pa.array(f, pa.int64()),
                "b": pa.array(to, pa.int64()),
                "_side": pa.array(np.zeros(len(f), np.int8))})

        def tag_state(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "b": t["w"],
                "_side": pa.array(np.ones(len(n), np.int8))})

        def per_part(g: pa.Table) -> pa.Table:
            side = g["_side"].to_numpy(zero_copy_only=False)
            a = g["a"].to_numpy(zero_copy_only=False)
            b = g["b"].to_numpy(zero_copy_only=False)
            wk, wv = a[side == 1], b[side == 1]
            o = np.argsort(wk, kind="stable")
            ef, et = a[side == 0], b[side == 0]
            if not len(ef):
                return pa.table({"node": pa.array([], pa.int64()),
                                 "inflow": pa.array([], pa.int64())})
            return _block_sum(et, _sorted_lookup(wk[o], wv[o], ef,
                                                 np.int64(0)))

        inflow = (edges.map_batches(tag_edges, batch_format="pyarrow")
                  .union(state_ds.map_batches(tag_state,
                                              batch_format="pyarrow"))
                  .groupby("_part")
                  .map_groups(per_part, batch_format="pyarrow")
                  .groupby("node")
                  .aggregate(Sum("inflow", alias_name="inflow")))

        # attach 0 for nodes that received nothing (every node keeps a
        # row, like pagerank's apply_update co-group)
        def tag_nodes(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "b": pa.array(np.zeros(len(n), np.int64), pa.int64()),
                "_side": pa.array(np.zeros(len(n), np.int8))})

        def tag_inflow(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "b": t["inflow"],
                "_side": pa.array(np.ones(len(n), np.int8))})

        def attach(g: pa.Table) -> pa.Table:
            side = g["_side"].to_numpy(zero_copy_only=False)
            a = g["a"].to_numpy(zero_copy_only=False)
            b = g["b"].to_numpy(zero_copy_only=False)
            ik, iv = a[side == 1], b[side == 1]
            o = np.argsort(ik, kind="stable")
            nh = a[side == 0]
            return pa.table({
                "node": pa.array(nh, pa.int64()),
                "raw": pa.array(_sorted_lookup(ik[o], iv[o], nh,
                                               np.int64(0)), pa.int64())})

        return (nodes.map_batches(tag_nodes, batch_format="pyarrow")
                .union(inflow.map_batches(tag_inflow,
                                          batch_format="pyarrow"))
                .groupby("_part")
                .map_groups(attach, batch_format="pyarrow")
                .materialize())

    def normalize(raw_ds):
        mx = raw_ds.max("raw")
        mx = int(mx) if mx is not None else 0
        if mx > 0 and mx > (2 ** 63 - 1) // unit:
            raise OverflowError(
                "hits: raw inflow too hot for int64 normalization; "
                "lower `unit` or pre-aggregate the hot node")

        def scale(t: pa.Table, _mx=mx) -> pa.Table:
            raw = t["raw"].to_numpy(zero_copy_only=False)
            w = (raw * np.int64(unit) // np.int64(_mx)
                 if _mx > 0 else raw)
            return pa.table({"node": t["node"],
                             "w": pa.array(w, pa.int64())})

        return raw_ds.map_batches(scale,
                                  batch_format="pyarrow").materialize()

    def const_state(v: int):
        def f(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table({"node": t["node"],
                             "w": pa.array(np.full(n, v, np.int64),
                                           pa.int64())})
        return nodes.map_batches(f, batch_format="pyarrow").materialize()

    hub_ds = const_state(unit)
    auth_ds = const_state(0)
    for _ in range(iters):
        auth_ds = normalize(propagate(hub_ds, src, dst))
        hub_ds = normalize(propagate(auth_ds, dst, src))

    from .joins import equi_join_cogroup
    out = equi_join_cogroup(
        hub_ds.map_batches(lambda t: pa.table(
            {"node": t["node"], "hub_micro": t["w"]}),
            batch_format="pyarrow"),
        auth_ds.map_batches(lambda t: pa.table(
            {"node": t["node"], "auth_micro": t["w"]}),
            batch_format="pyarrow"),
        on="node", num_partitions=num_partitions)
    return out.select_columns(["node", "hub_micro", "auth_micro"])


def _member(sorted_keys: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Vectorized membership test probe ∈ sorted_keys (bool mask)."""
    if not len(sorted_keys) or not len(probe):
        return np.zeros(len(probe), bool)
    pos = np.minimum(np.searchsorted(sorted_keys, probe),
                     len(sorted_keys) - 1)
    return sorted_keys[pos] == probe


def bfs_depth(edges_ds, seeds, src: str = "src", dst: str = "dst",
              max_depth: int = 15, distributed: bool = False,
              broadcast_limit: int = 2_000_000, num_partitions: int = 32,
              on_gate: str = "auto"):
    """Multi-source BFS hop distance over a directed link graph →
    Dataset(node:int64, depth:int64) for every node whose min-hop
    distance from ANY seed is ≤ ``max_depth`` (crawl-depth estimation:
    how many link hops from the seed list each host sits at).

    Reference parity anchor: tesseract-rs has no graph surface
    (documents are independent, src/api.rs); crawl-depth is the
    frontier-expansion complement of `pagerank`/`hits` in this tier.

    Scale shapes (both bit-identical — BFS min-hop is deterministic):

    - default: the visited/frontier sets live as sorted int64 numpy
      arrays broadcast per round (`ray.put`), edges re-scanned once per
      round with a per-block unique-dst combiner; the reached-set size
      is gated by ``broadcast_limit`` (exact count, fail-loud).
    - ``distributed=True``: frontier and visited stay Datasets; each
      round is TWO slim co-group exchanges (edges⋈frontier on
      hash(src), then candidates⋈visited anti-join on hash(node)) —
      nothing corpus-proportional ever reaches the driver.

    Rounds: ≤ ``max_depth`` either way; each round's exchange carries
    int64 pairs only.  Seeds absent from the edge set still appear at
    depth 0 (a seed host with no out-links is itself reached).
    """
    import ray

    edges = edges_ds.select_columns([src, dst]).materialize()

    if hasattr(seeds, "map_batches"):  # a Dataset with a 'node' column
        seed_arr = np.unique(
            seeds.to_pandas()["node"].to_numpy().astype(np.int64))
    else:
        seed_arr = np.unique(np.asarray(list(seeds), np.int64))

    if not distributed:
        visited = seed_arr.copy()  # sorted (np.unique)
        depth = np.zeros(len(seed_arr), np.int64)
        frontier = seed_arr
        d = 0
        while len(frontier) and d < max_depth:
            if len(visited) > broadcast_limit:
                _gate("bfs_depth", f"{len(visited)} reached nodes "
                      f"exceed broadcast_limit {broadcast_limit}",
                      on_gate)
                # restart in Dataset-state mode (bit-identical; the
                # driver-held visited/frontier arrays cannot be
                # handed over mid-flight)
                return bfs_depth(
                    edges, seed_arr, src=src, dst=dst,
                    max_depth=max_depth, distributed=True,
                    broadcast_limit=broadcast_limit,
                    num_partitions=num_partitions)
            f_ref = ray.put(np.sort(frontier))

            def step(t: pa.Table, _f=f_ref) -> pa.Table:
                f = ray.get(_f)
                s = pc.cast(t[src], pa.int64()).to_numpy(
                    zero_copy_only=False)
                dd = pc.cast(t[dst], pa.int64()).to_numpy(
                    zero_copy_only=False)
                return pa.table({"node": pa.array(
                    np.unique(dd[_member(f, s)]), pa.int64())})

            def fold(t: pa.Table) -> pa.Table:
                return pa.table({"node": pa.array(np.unique(
                    t["node"].to_numpy(zero_copy_only=False)),
                    pa.int64())})

            rows = (edges.map_batches(step, batch_format="pyarrow",
                                      batch_size=262_144)
                    .map_batches(fold, batch_format="pyarrow",
                                 batch_size=1 << 20)
                    .take_all())
            cand = (np.unique(np.fromiter((r["node"] for r in rows),
                                          np.int64, len(rows)))
                    if rows else np.empty(0, np.int64))
            new = cand[~_member(np.sort(visited), cand)]
            d += 1
            visited = np.concatenate([visited, new])
            depth = np.concatenate([depth, np.full(len(new), d, np.int64)])
            frontier = new
        o = np.argsort(visited, kind="stable")
        return ray.data.from_arrow(pa.table({
            "node": pa.array(visited[o], pa.int64()),
            "depth": pa.array(depth[o], pa.int64())}))

    # ---- distributed: frontier/visited stay Datasets ----
    def part_of(ids: np.ndarray) -> np.ndarray:
        return np.abs(ids) % np.int64(num_partitions)

    def mk_state(arr: np.ndarray, d: int):
        return ray.data.from_arrow(pa.table({
            "node": pa.array(arr, pa.int64()),
            "depth": pa.array(np.full(len(arr), d, np.int64),
                              pa.int64())}))

    visited_ds = mk_state(seed_arr, 0).materialize()
    frontier_ds = visited_ds
    d = 0
    while d < max_depth:
        def tag_edges(t: pa.Table) -> pa.Table:
            s = pc.cast(t[src], pa.int64()).to_numpy(zero_copy_only=False)
            dd = pc.cast(t[dst], pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(s), pa.int64()),
                "a": pa.array(s, pa.int64()),
                "b": pa.array(dd, pa.int64()),
                "_side": pa.array(np.zeros(len(s), np.int8))})

        def tag_front(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "b": pa.array(np.zeros(len(n), np.int64), pa.int64()),
                "_side": pa.array(np.ones(len(n), np.int8))})

        both = (edges.map_batches(tag_edges, batch_format="pyarrow")
                .union(frontier_ds.map_batches(tag_front,
                                               batch_format="pyarrow")))

        def expand(g: pa.Table) -> pa.Table:
            side = g["_side"].to_numpy(zero_copy_only=False)
            a = g["a"].to_numpy(zero_copy_only=False)
            b = g["b"].to_numpy(zero_copy_only=False)
            f = np.sort(a[side == 1])
            es, ed = a[side == 0], b[side == 0]
            return pa.table({"node": pa.array(
                np.unique(ed[_member(f, es)]), pa.int64())})

        from ray.data.aggregate import Count
        cand = (both.groupby("_part").map_groups(
                    expand, batch_format="pyarrow")
                .groupby("node").aggregate(Count(alias_name="_n"))
                .select_columns(["node"]))

        # anti-join candidates vs visited per hash partition
        def tag_cand(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "_side": pa.array(np.zeros(len(n), np.int8))})

        def tag_vis(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "_side": pa.array(np.ones(len(n), np.int8))})

        pair = (cand.map_batches(tag_cand, batch_format="pyarrow")
                .union(visited_ds.map_batches(tag_vis,
                                              batch_format="pyarrow")))
        d += 1

        def anti(g: pa.Table, _d=d) -> pa.Table:
            side = g["_side"].to_numpy(zero_copy_only=False)
            a = g["a"].to_numpy(zero_copy_only=False)
            seen = np.sort(a[side == 1])
            c = a[side == 0]
            new = np.unique(c[~_member(seen, c)])
            return pa.table({
                "node": pa.array(new, pa.int64()),
                "depth": pa.array(np.full(len(new), _d, np.int64),
                                  pa.int64())})

        frontier_ds = (pair.groupby("_part").map_groups(
            anti, batch_format="pyarrow")).materialize()
        if frontier_ds.count() == 0:
            break
        visited_ds = visited_ds.union(frontier_ds).materialize()

    return visited_ds.sort("node")


def k_core(edges_ds, k: int, src: str = "src", dst: str = "dst",
           max_rounds: int = 30, removed_broadcast_limit: int = 2_000_000,
           distributed: bool = False, num_partitions: int = 32,
           on_gate: str = "auto"):
    """k-core decomposition by iterative peeling → the subgraph in
    which every node has UNDIRECTED degree ≥ ``k`` (distinct
    neighbors; self-loops dropped).  Returns
    Dataset(node:int64, deg:int64) of surviving nodes with their
    degree INSIDE the core subgraph.  The crawl use: a host's k-core
    membership separates organically-linked cores from pendant spam
    farms that peel away.

    Shape per round: one slim degree aggregation (per-block unique
    combiner → ``groupby(node).Sum``) + one edge filter against THIS
    round's removed-node set, broadcast via ``ray.put`` — peeling
    removes few nodes per round on real graphs; the per-round set is
    gated by ``removed_broadcast_limit`` (exact count, fail-loud — the
    `DRIVER_CC_LIMIT` pattern).  Edges shrink monotonically and are
    re-materialized per round (object-store, spill-backed).
    Deterministic: peeling is order-free within a round.  Raises if
    not converged after ``max_rounds`` (like `hits` overflow —
    fail-loud, never silent wrong answers).

    ``distributed=True`` drops each round's peel set via TWO hash
    co-group anti-joins (edges⋈low on hash(a), then on hash(b))
    instead of the broadcast — no per-round driver set at all, same
    edges surviving (peeling is order-free), for graphs where a
    single round peels more than the broadcast gate allows.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    def norm(t: pa.Table) -> pa.Table:
        a = pc.cast(t[src], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t[dst], pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        m = lo != hi
        if not m.any():
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        u = np.unique(np.stack([lo[m], hi[m]], 1), axis=0)
        return pa.table({"a": pa.array(u[:, 0], pa.int64()),
                         "b": pa.array(u[:, 1], pa.int64())})

    e = (edges_ds.select_columns([src, dst])
         .map_batches(norm, batch_format="pyarrow")
         .groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
         .select_columns(["a", "b"]).materialize())

    def deg_partial(t: pa.Table) -> pa.Table:
        ids = np.concatenate([
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False)])
        u, cnt = np.unique(ids, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(cnt.astype(np.int64),
                                         pa.int64())})

    def degrees(e_ds):
        return (e_ds.map_batches(deg_partial, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("deg", alias_name="deg")))

    def low_only(t: pa.Table, _k=k) -> pa.Table:
        return t.filter(pc.less(t["deg"], pa.scalar(_k, pa.int64())))

    converged = False
    for _ in range(max_rounds):
        low = degrees(e).map_batches(
            low_only, batch_format="pyarrow").materialize()
        n_low = low.count()
        if not n_low:
            converged = True
            break
        if distributed:
            e = _drop_endpoints_cogroup(e, low, num_partitions)
            continue
        if n_low > removed_broadcast_limit:
            _gate("k_core", f"{n_low} nodes peel in one round, over "
                  f"removed_broadcast_limit {removed_broadcast_limit}",
                  on_gate)
            # flip to co-group peeling for this and all later rounds
            # (edge state is already a Dataset — no restart needed)
            distributed = True
            e = _drop_endpoints_cogroup(e, low, num_partitions)
            continue
        rows = low.take_all()
        removed = np.sort(np.fromiter((r["node"] for r in rows),
                                      np.int64, len(rows)))
        r_ref = ray.put(removed)

        def drop(t: pa.Table, _r=r_ref) -> pa.Table:
            rem = ray.get(_r)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            keep = ~_member(rem, a) & ~_member(rem, b)
            return t.filter(pa.array(keep))

        e = e.map_batches(drop, batch_format="pyarrow").materialize()

    if not converged:
        # one more degree pass to check the fixpoint actually holds
        if degrees(e).map_batches(
                low_only, batch_format="pyarrow").count():
            raise ValueError(
                f"k_core: not converged after {max_rounds} rounds; "
                "raise max_rounds")

    return degrees(e)


def strongly_connected_components(edges_ds, src: str = "src",
                                  dst: str = "dst",
                                  nodes_ds=None,
                                  max_rounds: int = 30,
                                  max_iters: int = 100,
                                  broadcast_limit: int = 2_000_000):
    """Strongly connected components of a DIRECTED link graph →
    Dataset(node:int64, scc_label:int64) with label = min node id in
    the SCC.  The web-graph use: reciprocal-linking farms and genuine
    communities are dense SCCs; a crawl frontier's DAG condensation
    needs them.

    Algorithm (Fleischer FW–BW by min-label, chunk-refined): per
    round, compute WITHIN each live chunk the min FORWARD-reachable
    label mf(v) and min BACKWARD-reachable label mb(v) (two directed
    min-label fixpoints — each inner iteration is one distributed
    edge scan against broadcast state, the `pagerank` shape);
    ``mf(v) == mb(v) == x`` proves v and x reach each other, so those
    nodes finalize with label x; the rest re-chunk by the (mf, mb)
    pair — edges crossing chunks can never sit inside an SCC, so
    chunks refine independently and a path graph resolves in two
    rounds, not n.

    State is driver-held sorted arrays gated by ``broadcast_limit``
    (exact node count, fail-loud — the repo's gated-broadcast
    placement; at cluster scale chunks would shard across the same
    co-group machinery as `pagerank(distributed=True)`).  Edges are
    scanned once per inner iteration and never leave the cluster;
    per-block combiners emit ≤1 row per (block, node).  Raises when
    not converged inside ``max_rounds``/``max_iters`` — never a
    silent wrong answer.
    """
    import ray

    nodes = _node_set(edges_ds, src, dst, nodes_ds).materialize()
    n_nodes = nodes.count()
    if n_nodes > broadcast_limit:
        raise ValueError(
            f"strongly_connected_components: {n_nodes} nodes exceed "
            f"broadcast_limit {broadcast_limit}")
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "scc_label": pa.array([], pa.int64())}))
    node_arr = np.sort(nodes.to_pandas()["node"].to_numpy()
                       .astype(np.int64))
    edges = edges_ds.select_columns([src, dst]).materialize()

    chunk = np.zeros(n_nodes, np.int64)
    final = np.zeros(n_nodes, bool)
    label = np.full(n_nodes, -1, np.int64)

    def minlabel_fixpoint(forward: bool) -> np.ndarray:
        """Min-label propagation within chunks, over live nodes.
        forward=True: m(v) = min label reachable FROM v (pull along
        v→w); forward=False: min label that reaches v (push along
        v→w)."""
        m = node_arr.copy()
        m[final] = -1  # finalized nodes never participate
        for _ in range(max_iters):
            m_ref = ray.put(m)
            c_ref = ray.put(chunk)
            f_ref = ray.put(final)
            n_ref = ray.put(node_arr)

            def step(t: pa.Table, _m=m_ref, _c=c_ref, _f=f_ref,
                     _n=n_ref, _fwd=forward) -> pa.Table:
                nk = ray.get(_n)
                mv = ray.get(_m)
                cv = ray.get(_c)
                fv = ray.get(_f)
                s = pc.cast(t[src], pa.int64()).to_numpy(
                    zero_copy_only=False)
                d = pc.cast(t[dst], pa.int64()).to_numpy(
                    zero_copy_only=False)
                si = np.searchsorted(nk, s)
                di = np.searchsorted(nk, d)
                ok = (~fv[si] & ~fv[di] & (cv[si] == cv[di])
                      & (s != d))
                si, di = si[ok], di[ok]
                if _fwd:
                    tgt, val = si, mv[di]
                else:
                    tgt, val = di, mv[si]
                if not len(tgt):
                    return pa.table({
                        "i": pa.array([], pa.int64()),
                        "m": pa.array([], pa.int64())})
                u, inv = np.unique(tgt, return_inverse=True)
                best = np.full(len(u), np.iinfo(np.int64).max,
                               np.int64)
                np.minimum.at(best, inv, val)
                return pa.table({"i": pa.array(u, pa.int64()),
                                 "m": pa.array(best, pa.int64())})

            rows = edges.map_batches(step, batch_format="pyarrow",
                                     batch_size=262_144).take_all()
            if not rows:
                break
            ii = np.fromiter((r["i"] for r in rows), np.int64,
                             len(rows))
            vv = np.fromiter((r["m"] for r in rows), np.int64,
                             len(rows))
            u, inv = np.unique(ii, return_inverse=True)
            best = np.full(len(u), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(best, inv, vv)
            new = m.copy()
            imp = best < new[u]
            new[u[imp]] = best[imp]
            if (new == m).all():
                return m
            m = new
        else:
            raise ValueError(
                "strongly_connected_components: min-label fixpoint "
                f"not reached in max_iters={max_iters}")
        return m

    for _ in range(max_rounds):
        mf = minlabel_fixpoint(True)
        mb = minlabel_fixpoint(False)
        done = ~final & (mf == mb)
        label[done] = mf[done]
        final |= done
        if final.all():
            break
        # re-chunk the survivors by their (chunk, mf, mb) signature
        live = ~final
        sig = np.stack([chunk[live], mf[live], mb[live]], 1)
        _, new_ids = np.unique(sig, axis=0, return_inverse=True)
        chunk[live] = new_ids
    if not final.all():
        raise ValueError(
            "strongly_connected_components: not converged after "
            f"max_rounds={max_rounds}")

    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr, pa.int64()),
        "scc_label": pa.array(label, pa.int64())}))


def containment_pairs(ds, set_col: str, member_col: str,
                      min_contain_ppm: int = 500_000,
                      min_overlap: int = 1,
                      max_member_fanout: "int | None" = None,
                      num_partitions: int = 32,
                      broadcast_limit: int = 2_000_000):
    """ASYMMETRIC set containment between sets of a membership table:
    → (a, b, shared, n_a, n_b, contain_ppm) where
    ``contain_ppm = 1_000_000 · |A∩B| // min(|A|, |B|)`` — the
    smaller set's coverage.  Jaccard misses near-SUPERSET pairs (a
    quote inside a long page scores low Jaccard but full
    containment); this is the dedup-tier op that catches them.
    Same machinery and gates as `jaccard_pairs` (one pair-count
    exchange, stop-member cap, gated size broadcast); exact integers
    only.
    """
    pairs = jaccard_pairs(ds, set_col, member_col,
                          min_overlap=min_overlap,
                          max_member_fanout=max_member_fanout,
                          num_partitions=num_partitions,
                          broadcast_limit=broadcast_limit,
                          emit_sizes=True)

    def finish(t: pa.Table) -> pa.Table:
        num = t["jac_num"].to_numpy(zero_copy_only=False)
        na = t["n_a"].to_numpy(zero_copy_only=False)
        nb = t["n_b"].to_numpy(zero_copy_only=False)
        small = np.minimum(na, nb)
        ppm = np.where(small > 0, 1_000_000 * num // np.maximum(
            small, 1), 0).astype(np.int64)
        out = pa.table({"a": t["a"], "b": t["b"],
                        "shared": t["jac_num"],
                        "n_a": t["n_a"], "n_b": t["n_b"],
                        "contain_ppm": pa.array(ppm, pa.int64())})
        return out.filter(pc.greater_equal(
            out["contain_ppm"], pa.scalar(min_contain_ppm, pa.int64())))

    return pairs.map_batches(finish, batch_format="pyarrow")


def neighbor_aggregate(edges_ds, feats_ds, hops: int = 1,
                       src: str = "src", dst: str = "dst",
                       node_col: str = "node", feat_col: str = "f",
                       num_partitions: int = 32):
    """K-hop neighborhood feature aggregation (the GNN-prep /
    label-propagation-feature op): per node, the Sum and Count of its
    IN-neighBORS' features, iterated ``hops`` times (hop k aggregates
    hop k−1's sums — the standard message-passing unroll).  →
    Dataset(node, agg_sum:int64, agg_cnt:int64) for nodes with ≥1
    in-edge at the final hop.

    Shape per hop: ONE co-group equi join (edges ⋈ features on src,
    `ops.joins.equi_join_cogroup` — large×large safe, no broadcast)
    + ONE grouped Sum/Count exchange.  Integer features only —
    deterministic at any parallelism.
    """
    from ray.data.aggregate import Count, Sum

    from .joins import equi_join_cogroup

    edges = edges_ds.select_columns([src, dst]).materialize()

    def as_feats(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pc.cast(t[node_col], pa.int64()),
            "f": pc.cast(t[feat_col], pa.int64())})

    state = feats_ds.map_batches(as_feats, batch_format="pyarrow")
    for _ in range(hops):
        def tag(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": pc.cast(t[src], pa.int64()),
                "dst": pc.cast(t[dst], pa.int64())})

        joined = equi_join_cogroup(
            edges.map_batches(tag, batch_format="pyarrow"), state,
            on="node", num_partitions=num_partitions)
        # pandas suffixes right columns only on collision; "f" is
        # unique here so it keeps its name through the join
        agg = (joined.groupby("dst").aggregate(
            Sum("f", alias_name="agg_sum"),
            Count(alias_name="agg_cnt")))
        state = agg.map_batches(
            lambda t: pa.table({
                "node": pc.cast(t["dst"], pa.int64()),
                "f": pc.cast(t["agg_sum"], pa.int64())}),
            batch_format="pyarrow")
        last = agg
    return last.map_batches(
        lambda t: pa.table({
            "node": pc.cast(t["dst"], pa.int64()),
            "agg_sum": pc.cast(t["agg_sum"], pa.int64()),
            "agg_cnt": pc.cast(t["agg_cnt"], pa.int64())}),
        batch_format="pyarrow")


def pagerank_weighted(edges_ds, weight_col: str = "w",
                      src: str = "src", dst: str = "dst",
                      iters: int = 5, damping_pct: int = 85,
                      unit: int = 1_000_000, nodes_ds=None,
                      broadcast_limit: int = 2_000_000):
    """Edge-WEIGHTED integer PageRank → Dataset(node, pagerank_micro):
    a source's rank splits across its out-edges in proportion to the
    edge weight — contribution over edge e = ``rank(u) · w_e //
    Σw(out(u))`` (exact floor per edge, so results are bit-identical
    at any parallelism, same contract as `pagerank`).  Zero/negative
    weights are rejected.  The crawl use: anchor-count-weighted host
    authority instead of the unweighted link count.

    Same shapes and gates as `pagerank`'s broadcast path (state
    arrays gated by exact node count; per-iteration one distributed
    edge scan with a per-block `np.add.at` combiner); at cluster
    scale the state shards over the identical co-group machinery —
    `pagerank(distributed=True)` is the template.
    """
    import ray
    from ray.data.aggregate import Sum

    base = (100 - damping_pct) * unit // 100
    nodes = _node_set(edges_ds, src, dst, nodes_ds).materialize()
    n_nodes = nodes.count()
    if n_nodes > broadcast_limit:
        raise ValueError(
            f"pagerank_weighted: {n_nodes} nodes exceed "
            f"broadcast_limit {broadcast_limit}")
    edges = edges_ds.select_columns(
        [src, dst, weight_col]).materialize()

    def wsum_partial(t: pa.Table) -> pa.Table:
        w = pc.cast(t[weight_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(w) and w.min() <= 0:
            raise ValueError("pagerank_weighted: weights must be > 0")
        s = pc.cast(t[src], pa.int64()).to_numpy(zero_copy_only=False)
        u, inv = np.unique(s, return_inverse=True)
        acc = np.zeros(len(u), np.int64)
        np.add.at(acc, inv, w)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "wsum": pa.array(acc, pa.int64())})

    wdf = (edges.map_batches(wsum_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("wsum", alias_name="wsum"))
           .to_pandas())
    wk = wdf["node"].to_numpy().astype(np.int64)
    wv = wdf["wsum"].to_numpy().astype(np.int64)
    o = np.argsort(wk, kind="stable")
    w_ref = ray.put((wk[o], wv[o]))

    node_arr = np.sort(nodes.to_pandas()["node"].to_numpy()
                       .astype(np.int64))
    ranks = np.full(len(node_arr), unit, np.int64)

    for _ in range(iters):
        r_ref = ray.put(ranks)
        n_ref = ray.put(node_arr)

        def contrib(t: pa.Table, _r=r_ref, _n=n_ref, _w=w_ref
                    ) -> pa.Table:
            nk = ray.get(_n)
            rv = ray.get(_r)
            wkk, wvv = ray.get(_w)
            s = pc.cast(t[src], pa.int64()).to_numpy(
                zero_copy_only=False)
            d = pc.cast(t[dst], pa.int64()).to_numpy(
                zero_copy_only=False)
            w = pc.cast(t[weight_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            r_src = _sorted_lookup(nk, rv, s, np.int64(0))
            wsum = _sorted_lookup(wkk, wvv, s, np.int64(1))
            return _block_sum(d, r_src * w // wsum)

        def fold(t: pa.Table) -> pa.Table:
            return _block_sum(
                t["node"].to_numpy(zero_copy_only=False),
                t["inflow"].to_numpy(zero_copy_only=False))

        rows = (edges.map_batches(contrib, batch_format="pyarrow",
                                  batch_size=262_144)
                .map_batches(fold, batch_format="pyarrow",
                             batch_size=1 << 20)
                .take_all())
        got = np.zeros(len(node_arr), np.int64)
        if rows:
            nk = np.fromiter((r["node"] for r in rows), np.int64,
                             len(rows))
            nv = np.fromiter((r["inflow"] for r in rows), np.int64,
                             len(rows))
            u, inv = np.unique(nk, return_inverse=True)
            acc = np.zeros(len(u), np.int64)
            np.add.at(acc, inv, nv)
            got = _sorted_lookup(u, acc, node_arr, np.int64(0))
        ranks = base + damping_pct * got // 100

    import ray as _ray
    return _ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr, pa.int64()),
        "pagerank_micro": pa.array(ranks, pa.int64())}))


def clustering_coefficients(edges_ds, src: str = "src", dst: str = "dst",
                            num_partitions: int = 32,
                            broadcast_limit: int = 2_000_000):
    """Per-node local clustering over the distinct undirected edge set,
    as EXACT integers: ``n_triangles`` and ``n_wedges`` = C(degree, 2).
    The coefficient is their ratio; keeping numerator/denominator
    integral sidesteps float nondeterminism across engines.  Dense
    local clustering with low degree is the template-farm / link-ring
    density signal that complements raw ``triangle_counts``.

    Shape: one distinct-edge dedup (block-local unordered-pair combiner
    → native groupby), materialized ONCE and feeding both the degree
    Sum and :func:`triangle_counts`; the final attach is a tagged
    union → a single grouped Sum — no join stage.

    → Dataset(node int64, n_triangles int64, n_wedges int64), one row
    per node with degree ≥ 2 (n_triangles may be 0).
    """
    from ray.data.aggregate import Count, Sum

    def undirect(b: pa.Table) -> pa.Table:
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        key = np.unique(lo * (np.int64(1) << 31) + hi)
        return pa.table({
            "u": pa.array(key >> 31, pa.int64()),
            "v": pa.array(key & ((1 << 31) - 1), pa.int64())})

    edges = (edges_ds.map_batches(undirect, batch_format="pyarrow")
             .groupby(["u", "v"]).aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"])
             .materialize())  # reused: degrees + triangle kernel

    tri = triangle_counts(edges, "u", "v",
                          num_partitions=num_partitions,
                          broadcast_limit=broadcast_limit)

    def deg_partial(b: pa.Table) -> pa.Table:
        ids = np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)])
        un, cnt = np.unique(ids, return_counts=True)
        return pa.table({"node": pa.array(un, pa.int64()),
                         "d": pa.array(cnt, pa.int64())})

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("d", alias_name="d")))

    def wedge_rows(b: pa.Table) -> pa.Table:
        n = b["node"].to_numpy(zero_copy_only=False)
        d = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = d >= 2
        n, d = n[keep], d[keep]
        return pa.table({
            "node": pa.array(n, pa.int64()),
            "n_triangles": pa.array(np.zeros(len(n), np.int64)),
            "n_wedges": pa.array(d * (d - 1) // 2, pa.int64())})

    def tri_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["node"],
            "n_triangles": b["n_triangles"].cast(pa.int64()),
            "n_wedges": pa.array(
                np.zeros(len(b), np.int64))})

    # tagged union → ONE grouped Sum; triangle corners always have
    # degree ≥ 2, so the union introduces no extra nodes
    return (deg.map_batches(wedge_rows, batch_format="pyarrow")
            .union(tri.map_batches(tri_rows, batch_format="pyarrow"))
            .groupby("node")
            .aggregate(Sum("n_triangles", alias_name="n_triangles"),
                       Sum("n_wedges", alias_name="n_wedges")))


def butterfly_counts(ds, group_col: str, item_col: str,
                     num_partitions: int = 64,
                     max_group_items: int = 8192,
                     oversized: str = "error"):
    """Per-item butterfly (bipartite 4-cycle) counts over the
    group–item bipartite graph: butterflies(p) = Σ_q C(co(p,q), 2)
    where co(p,q) = #groups containing both items — the bipartite
    clustering signal (recommendation density, template co-occurrence)
    that pairwise co-occurrence counts alone don't capture.

    Scale shape: distinct (group, item) dedup per block → coarse
    group co-group (every row of a group lands in ONE of
    ``num_partitions`` partitions) → per-partition vectorized
    self-merge emits item pairs with LOCAL counts → ONE native Sum
    over the pair key → each pair explodes to its two endpoints with
    C(n,2) → grouped Sum.  Per-group pair blowup is quadratic in
    group size; because the coarse co-group lands EVERY row of a
    group in one partition, the distinct item count per group is
    known exactly in-partition BEFORE any pair is materialized, and
    groups above ``max_group_items`` are gated there:

    - ``oversized="error"`` (default): fail loudly naming the group
      and the cap — one viral group (a template item in 10⁶ crawled
      pages) would otherwise emit ~10¹² pairs in one partition (the
      `HOT_RUN_CAP` hazard of ``ops/dedup``, where a star cap is
      sound for connectivity but would CHANGE these exact counts).
    - ``oversized="drop"``: exclude oversized groups entirely and
      count exactly over the rest — the web-scale discipline (a
      group that big is boilerplate/template co-occurrence, not
      signal).  Retained pair emission is then bounded by
      Σ C(min(m_g, cap), 2).

    All counts exact integers.

    → Dataset(item int64, n_butterflies int64), rows with ≥1
    butterfly.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .agg import _hash_part

    if oversized not in ("error", "drop"):
        raise ValueError(
            f"butterfly_counts: oversized={oversized!r} not in "
            f"('error', 'drop')")

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            "o": b[group_col].cast(pa.int64()),
            "p": b[item_col].cast(pa.int64()),
            "_part": pa.array(_hash_part(b[group_col], num_partitions),
                              pa.int64())})

    def pairs(g: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o": g["o"].to_numpy(zero_copy_only=False),
            "p": g["p"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        # exact per-group distinct-item gate BEFORE the m² self-merge:
        # the coarse co-group guarantees this partition holds the
        # ENTIRE group, so the count is global, not a per-block guess
        vc = df["o"].value_counts()
        big = vc[vc > max_group_items]
        if len(big):
            if oversized == "error":
                raise ValueError(
                    f"butterfly_counts: group {int(big.index[0])} has "
                    f"{int(big.iloc[0])} distinct items > "
                    f"max_group_items={max_group_items}; raise the cap "
                    f"or pass oversized='drop' to exclude such groups")
            df = df[~df["o"].isin(big.index)]
        m = df.merge(df, on="o")
        m = m[m["p_x"] < m["p_y"]]
        # pack (p1, p2) into ONE int64 key (ids must fit 31 bits — the
        # triangle-kernel packing) and pre-count within the partition
        key = (m["p_x"].to_numpy(np.int64) << np.int64(31)) \
            + m["p_y"].to_numpy(np.int64)
        un, cnt = np.unique(key, return_counts=True)
        t = pa.table({"pk": pa.array(un, pa.int64()),
                      "n": pa.array(cnt, pa.int64())})
        return t.append_column("_p2", pa.array(
            (un % num_partitions).astype(np.int64), pa.int64()))

    def sum_pairs(g: pa.Table) -> pa.Table:
        # vectorized run-sum per pair key (3× the native composite
        # aggregate's speed at 1M+ distinct pairs, measured)
        pk = g["pk"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="mergesort")
        pk, n = pk[order], n[order]
        change = np.ones(len(pk), bool)
        change[1:] = pk[1:] != pk[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(pk))
        cs = np.cumsum(n)
        tot = cs[ends - 1] - np.append(0, cs[starts[1:] - 1])
        return pa.table({"pk": pa.array(pk[starts], pa.int64()),
                         "n": pa.array(tot, pa.int64())})

    pair_counts = (ds.map_batches(tag, batch_format="pyarrow")
                   .groupby("_part")
                   .map_groups(pairs, batch_format="pyarrow")
                   .groupby("_p2")
                   .map_groups(sum_pairs, batch_format="pyarrow"))

    def endpoints(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        bf = n * (n - 1) // 2
        keep = bf > 0
        pk = b["pk"].to_numpy(zero_copy_only=False)[keep]
        p1 = pk >> 31
        p2 = pk & ((1 << 31) - 1)
        bf = bf[keep]
        return pa.table({
            "item": pa.array(np.concatenate([p1, p2]), pa.int64()),
            "b": pa.array(np.concatenate([bf, bf]), pa.int64())})

    return (pair_counts.map_batches(endpoints, batch_format="pyarrow")
            .groupby("item")
            .aggregate(Sum("b", alias_name="n_butterflies")))


def bipartite_components(edges_ds, src: str = "src", dst: str = "dst",
                         num_partitions: int = 8, max_rounds: int = 12):
    """Per-component bipartiteness (odd-cycle detection) — the
    two-sidedness test that separates genuine two-tier structures
    (hubs ↔ leaves, mirrors ↔ origins) from odd-cycle link rings.

    Classic doubled-graph reduction, ONE distributed CC run: every
    edge (u,v) becomes (2u, 2v+1) and (2u+1, 2v); an original
    component is non-bipartite iff some node's two parity copies land
    in the same doubled component (an odd cycle connects the parity
    layers).  The original component id recovers as
    ``min(label(2u), label(2u+1)) // 2`` — no second CC run.

    → Dataset(component int64, is_bipartite bool, n_nodes int64),
    components keyed by their min node id; isolated nodes (no edges)
    are not emitted, matching ``connected_components_ds``.
    """
    from ray.data.aggregate import Count, Max, Min

    from .cc import connected_components_ds

    def double(b: pa.Table) -> pa.Table:
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({
            "a": pa.array(np.concatenate([2 * u, 2 * u + 1]), pa.int64()),
            "b": pa.array(np.concatenate([2 * v + 1, 2 * v]), pa.int64())})

    labels = connected_components_ds(
        edges_ds.map_batches(double, batch_format="pyarrow"),
        num_partitions=num_partitions, max_rounds=max_rounds)

    def fold(b: pa.Table) -> pa.Table:
        n = b["node"].to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(n >> 1, pa.int64()),
                         "label": b["label"].cast(pa.int64())})

    per_node = (labels.map_batches(fold, batch_format="pyarrow")
                .groupby("u")
                .aggregate(Min("label", alias_name="lab_min"),
                           Max("label", alias_name="lab_max")))

    def comp_rows(b: pa.Table) -> pa.Table:
        lo = b["lab_min"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["lab_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "component": pa.array(lo >> 1, pa.int64()),
            "bip": pa.array((lo != hi).astype(np.int64), pa.int64())})

    agg = (per_node.map_batches(comp_rows, batch_format="pyarrow")
           .groupby("component")
           .aggregate(Min("bip", alias_name="bip"),
                      Count(alias_name="n_nodes")))
    return agg.map_batches(
        lambda t: pa.table({
            "component": t["component"],
            "is_bipartite": pc.equal(t["bip"], 1),
            "n_nodes": t["n_nodes"].cast(pa.int64())}),
        batch_format="pyarrow")


def degree_mixing_sums(edges_ds, src: str = "src", dst: str = "dst",
                       broadcast_limit: int = 2_000_000):
    """Exact integer sufficient statistics for DEGREE ASSORTATIVITY
    (Newman 2002, public) over the distinct undirected edge set:
    ``n_edges``, ``sum_prod`` = Σ dᵤ·dᵥ, ``sum_deg`` = Σ (dᵤ+dᵥ),
    ``sum_sq`` = Σ (dᵤ²+dᵥ²).  The coefficient is
    ``(4m·sum_prod − sum_deg²) / (2m·sum_sq − sum_deg²)`` — keeping
    the sums integral leaves the one float division to the caller.
    Positive assortativity (hubs linking hubs) is the organic-web
    signature; link farms skew strongly negative.

    Shape: distinct-edge dedup → node-bounded degree table attached
    by broadcast under an exact-count gate (the ``triangle_counts``
    rule) → per-block integer partials → ONE native global Sum.
    → Dataset with a single row.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    def undirect(b: pa.Table) -> pa.Table:
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        key = np.unique(lo * (np.int64(1) << 31) + hi)
        return pa.table({
            "u": pa.array(key >> 31, pa.int64()),
            "v": pa.array(key & ((1 << 31) - 1), pa.int64())})

    edges = (edges_ds.map_batches(undirect, batch_format="pyarrow")
             .groupby(["u", "v"]).aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"])
             .materialize())

    def deg_partial(b: pa.Table) -> pa.Table:
        ids = np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)])
        un, cnt = np.unique(ids, return_counts=True)
        return pa.table({"node": pa.array(un, pa.int64()),
                         "d": pa.array(cnt, pa.int64())})

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("d", alias_name="d")))
    dt = deg.limit(broadcast_limit + 1).to_pandas()
    if len(dt) > broadcast_limit:
        raise ValueError(
            f"degree table exceeds broadcast gate ({broadcast_limit}); "
            "shard the graph or raise the limit")
    dn = dt["node"].to_numpy(np.int64)
    dd = dt["d"].to_numpy(np.int64)
    order = np.argsort(dn)
    deg_ref = ray.put((dn[order], dd[order]))

    def partials(b: pa.Table) -> pa.Table:
        nodes, ds_ = ray.get(deg_ref)
        du = ds_[np.searchsorted(nodes, b["u"].to_numpy(
            zero_copy_only=False))]
        dv = ds_[np.searchsorted(nodes, b["v"].to_numpy(
            zero_copy_only=False))]
        return pa.table({
            "n_edges": pa.array([len(du)], pa.int64()),
            "sum_prod": pa.array([int((du * dv).sum())], pa.int64()),
            "sum_deg": pa.array([int((du + dv).sum())], pa.int64()),
            "sum_sq": pa.array([int((du * du + dv * dv).sum())],
                               pa.int64())})

    parts = edges.map_batches(partials, batch_format="pyarrow")
    row = parts.aggregate(Sum("n_edges", alias_name="n_edges"),
                          Sum("sum_prod", alias_name="sum_prod"),
                          Sum("sum_deg", alias_name="sum_deg"),
                          Sum("sum_sq", alias_name="sum_sq"))
    import ray.data as rd

    return rd.from_items([{k: int(row[k]) for k in
                           ("n_edges", "sum_prod", "sum_deg",
                            "sum_sq")}])


def triangle_edge_incidences(edges_ds, src: str = "u", dst: str = "v",
                             num_partitions: int = 32,
                             broadcast_limit: int = 2_000_000):
    """One (u, v) row per (triangle, edge) incidence over a DISTINCT
    undirected (u<v) edge Dataset — the per-EDGE sibling of
    ``triangle_counts``'s per-corner explode (same degree-ordered
    wedge/closure machinery, Schank & Wagner 2005): grouping this by
    (u, v) with a Count gives each edge's triangle support, the peel
    signal of truss decomposition.  Node ids must fit 31 bits."""
    import ray
    from ray.data.aggregate import Sum

    from .agg import _hash_part
    from .joins import semi_join_cogroup

    edges = edges_ds.materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        ids = np.concatenate([
            b[src].to_numpy(zero_copy_only=False),
            b[dst].to_numpy(zero_copy_only=False)])
        un, cnt = np.unique(ids, return_counts=True)
        return pa.table({"node": pa.array(un, pa.int64()),
                         "d": pa.array(cnt, pa.int64())})

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("d", alias_name="d")))
    dt = deg.limit(broadcast_limit + 1).to_pandas()
    if len(dt) > broadcast_limit:
        raise ValueError(
            f"triangle_edge_incidences: >{broadcast_limit} nodes — "
            "attach degrees via the triangle_counts co-group path")
    dn = dt["node"].to_numpy().astype(np.int64)
    dd = dt["d"].to_numpy().astype(np.int64)
    order = np.argsort(dn)
    deg_ref = ray.put((dn[order], dd[order]))

    def orient(b: pa.Table) -> pa.Table:
        nodes, ds_ = ray.get(deg_ref)
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        du = ds_[np.searchsorted(nodes, u)]
        dv = ds_[np.searchsorted(nodes, v)]
        fwd = (du < dv) | ((du == dv) & (u < v))
        return pa.table({
            "a": pa.array(np.where(fwd, u, v), pa.int64()),
            "z": pa.array(np.where(fwd, v, u), pa.int64())})

    oriented = edges.map_batches(orient, batch_format="pyarrow")

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_part", pa.array(
            _hash_part(b["a"], num_partitions), pa.int64()))

    def wedges(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        z = g["z"].to_numpy(zero_copy_only=False)
        order = np.lexsort((z, a))
        a, z = a[order], z[order]
        change = np.ones(len(a), bool)
        change[1:] = a[1:] != a[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(a))
        us, vs, ws = [], [], []
        for s, e in zip(starts, ends):
            nb = z[s:e]
            if len(nb) < 2:
                continue
            iu, iw = np.triu_indices(len(nb), k=1)
            us.append(np.full(len(iu), a[s], np.int64))
            vs.append(nb[iu])
            ws.append(nb[iw])
        if not us:
            return pa.table({"tri_u": pa.array([], pa.int64()),
                             "wkey": pa.array([], pa.int64())})
        v_all = np.concatenate(vs).astype(np.int64)
        w_all = np.concatenate(ws).astype(np.int64)
        return pa.table({
            "tri_u": pa.array(np.concatenate(us), pa.int64()),
            "wkey": pa.array(v_all * (np.int64(1) << 31) + w_all,
                             pa.int64())})

    wedge_ds = (oriented.map_batches(tag, batch_format="pyarrow")
                .groupby("_part")
                .map_groups(wedges, batch_format="pyarrow"))

    def ekey(b: pa.Table) -> pa.Table:
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"wkey": pa.array(u * (np.int64(1) << 31) + v,
                                          pa.int64())})

    closed = semi_join_cogroup(
        wedge_ds, edges.map_batches(ekey, batch_format="pyarrow"),
        on="wkey", num_partitions=num_partitions)

    def tri_edges(b: pa.Table) -> pa.Table:
        tu = b["tri_u"].to_numpy(zero_copy_only=False)
        k = b["wkey"].to_numpy(zero_copy_only=False)
        v = (k >> 31).astype(np.int64)
        w = (k & ((1 << 31) - 1)).astype(np.int64)
        # three canonical (min, max) edges per triangle
        e1u, e1v = np.minimum(tu, v), np.maximum(tu, v)
        e2u, e2v = np.minimum(tu, w), np.maximum(tu, w)
        return pa.table({
            "u": pa.array(np.concatenate([e1u, e2u, v]), pa.int64()),
            "v": pa.array(np.concatenate([e1v, e2v, w]), pa.int64())})

    return closed.map_batches(tri_edges, batch_format="pyarrow")


def k_truss(edges_ds, k: int = 3, src: str = "src", dst: str = "dst",
            num_partitions: int = 32, broadcast_limit: int = 2_000_000,
            max_rounds: int = 10):
    """k-truss decomposition (Cohen 2008, public): the maximal
    subgraph where every edge sits in ≥ k−2 triangles — the
    community-core filter stricter than k-core.  Iterative peel: each
    round recomputes per-edge triangle support over the surviving
    edges (``triangle_edge_incidences`` → grouped Count) and drops
    edges below k−2; fixpoint when no edge drops (kept ⊆ current, so
    a count match IS set equality).  Fail-loud after ``max_rounds``.

    → Dataset (u, v, support:int64), u<v, support within the truss.
    Scale: each round is one wedge/closure pass + one grouped Count;
    real graphs converge in a handful of rounds."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    if k < 3:
        # 0-support edges never appear in the incidence stream, so
        # k=2 (keep everything) would silently drop them
        raise ValueError("k_truss: k must be >= 3")

    def undirect(b: pa.Table) -> pa.Table:
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        key = np.unique(np.minimum(u, v) * (np.int64(1) << 31)
                        + np.maximum(u, v))
        return pa.table({"u": pa.array(key >> 31, pa.int64()),
                         "v": pa.array(key & ((1 << 31) - 1), pa.int64())})

    cur = (edges_ds.map_batches(undirect, batch_format="pyarrow")
           .groupby(["u", "v"]).aggregate(Count(alias_name="_c"))
           .drop_columns(["_c"]).materialize())
    n_prev = cur.count()
    for _ in range(max_rounds):
        inc = triangle_edge_incidences(
            cur, num_partitions=num_partitions,
            broadcast_limit=broadcast_limit)
        kept = (inc.groupby(["u", "v"])
                .aggregate(Count(alias_name="support"))
                .map_batches(
                    lambda t: t.filter(
                        pc.greater_equal(t["support"], k - 2)),
                    batch_format="pyarrow")
                .materialize())
        n = kept.count()
        if n == 0:
            return kept
        if n == n_prev:
            return kept
        n_prev = n
        cur = kept.drop_columns(["support"]).materialize()
    raise RuntimeError(f"k_truss: no fixpoint within {max_rounds} rounds")


def sssp(edges_ds, sources, src: str = "src", dst: str = "dst",
         weight: str = "w", max_rounds: int = 50,
         distributed: bool = False, broadcast_limit: int = 2_000_000,
         num_partitions: int = 32, on_gate: str = "auto"):
    """Weighted single/multi-source shortest paths (POSITIVE integer
    weights) → Dataset(node:int64, dist:int64) for every reachable
    node — the weighted complement of `bfs_depth` (hop counts) when
    links carry costs (latency, crawl budget, click distance).

    Reference parity anchor: tesseract-rs has no graph surface
    (src/api.rs processes documents independently); this extends the
    crawl-graph tier the way `pagerank`/`bfs_depth` do.

    Delta-stepping-flavoured Bellman–Ford with a FRONTIER: only nodes
    whose distance improved last round relax their out-edges, so late
    rounds touch a shrinking edge subset and termination is exact
    (frontier empty ⇔ no tense edge; positive weights ⇒ ≤ n rounds,
    fail-loud at ``max_rounds``).  Bit-identical at any parallelism
    (integer min is commutative) and across both modes:

    - default: the distance table lives as two sorted int64 numpy
      arrays broadcast per round (``ray.put``), gated by
      ``broadcast_limit`` (exact count, fail-loud — the
      `pagerank`/`bfs_depth` state-placement pattern).  Each round
      scans edges once; a per-block lexsort+reduceat combiner emits
      ≤1 (dst, min cand) row per block before the driver fold, so a
      hot dst costs one slim row per block, not one per in-edge.
    - ``distributed=True``: state stays a Dataset; each round is TWO
      slim co-group exchanges (edges⋈frontier on hash(src) to relax,
      then candidates⋈dist on hash(node) to fold the min) — nothing
      node-proportional reaches the driver.
    """
    import ray

    edges = edges_ds.select_columns([src, dst, weight]).materialize()
    seed_arr = np.unique(np.asarray(list(sources), np.int64))

    def block_min(nodes: np.ndarray, dists: np.ndarray) -> pa.Table:
        """(node, dist) rows → one (node, min dist) row per node."""
        if not len(nodes):
            return pa.table({"node": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        o = np.lexsort((dists, nodes))
        n, d = nodes[o], dists[o]
        first = np.ones(len(n), bool)
        first[1:] = n[1:] != n[:-1]
        return pa.table({"node": pa.array(n[first], pa.int64()),
                         "dist": pa.array(d[first], pa.int64())})

    if not distributed:
        nodes = seed_arr.copy()          # sorted
        dist = np.zeros(len(seed_arr), np.int64)
        f_nodes, f_dist = nodes, dist    # frontier (sorted by node)
        for _ in range(max_rounds):
            if len(nodes) > broadcast_limit:
                _gate("sssp", f"{len(nodes)} reached nodes exceed "
                      f"broadcast_limit {broadcast_limit}", on_gate)
                # restart in Dataset-state mode (bit-identical)
                return sssp(edges, seed_arr, src=src, dst=dst,
                            weight=weight, max_rounds=max_rounds,
                            distributed=True,
                            broadcast_limit=broadcast_limit,
                            num_partitions=num_partitions)
            f_ref = ray.put((f_nodes, f_dist))

            def relax(t: pa.Table, _f=f_ref) -> pa.Table:
                fn, fd = ray.get(_f)
                s = pc.cast(t[src], pa.int64()).to_numpy(
                    zero_copy_only=False)
                dd = pc.cast(t[dst], pa.int64()).to_numpy(
                    zero_copy_only=False)
                w = pc.cast(t[weight], pa.int64()).to_numpy(
                    zero_copy_only=False)
                m = _member(fn, s)
                pos = np.searchsorted(fn, s[m])
                return block_min(dd[m], fd[pos] + w[m])

            rows = (edges.map_batches(relax, batch_format="pyarrow",
                                      batch_size=262_144)
                    .take_all())
            if rows:
                cn = np.fromiter((r["node"] for r in rows), np.int64,
                                 len(rows))
                cd = np.fromiter((r["dist"] for r in rows), np.int64,
                                 len(rows))
                folded = block_min(cn, cd)
                cn = folded["node"].to_numpy(zero_copy_only=False)
                cd = folded["dist"].to_numpy(zero_copy_only=False)
            else:
                cn = np.empty(0, np.int64)
                cd = np.empty(0, np.int64)
            # merge candidates into the settled table; keep improvers
            known = _member(nodes, cn)
            pos = np.searchsorted(nodes, cn[known])
            better = cd[known] < dist[pos]
            dist[pos[better]] = cd[known][better]
            new_n = cn[~known]
            new_d = cd[~known]
            f_nodes = np.concatenate([cn[known][better], new_n])
            f_dist = np.concatenate([cd[known][better], new_d])
            if not len(f_nodes):
                o = np.argsort(nodes, kind="stable")
                return ray.data.from_arrow(pa.table({
                    "node": pa.array(nodes[o], pa.int64()),
                    "dist": pa.array(dist[o], pa.int64())}))
            nodes = np.concatenate([nodes, new_n])
            dist = np.concatenate([dist, new_d])
            o = np.argsort(nodes, kind="stable")
            nodes, dist = nodes[o], dist[o]
            fo = np.argsort(f_nodes, kind="stable")
            f_nodes, f_dist = f_nodes[fo], f_dist[fo]
        raise RuntimeError(f"sssp: no fixpoint within {max_rounds} rounds")

    # ---- distributed: dist/frontier stay Datasets ----
    def part_of(ids: np.ndarray) -> np.ndarray:
        return np.abs(ids) % np.int64(num_partitions)

    def mk_state(n: np.ndarray, d: np.ndarray):
        return ray.data.from_arrow(pa.table({
            "node": pa.array(n, pa.int64()),
            "dist": pa.array(d, pa.int64())}))

    dist_ds = mk_state(seed_arr,
                       np.zeros(len(seed_arr), np.int64)).materialize()
    frontier_ds = dist_ds
    for _ in range(max_rounds):
        def tag_edges(t: pa.Table) -> pa.Table:
            s = pc.cast(t[src], pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(s), pa.int64()),
                "a": pa.array(s, pa.int64()),
                "b": pc.cast(t[dst], pa.int64()),
                "c": pc.cast(t[weight], pa.int64()),
                "_side": pa.array(np.zeros(len(s), np.int8))})

        def tag_front(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "b": pa.array(np.zeros(len(n), np.int64), pa.int64()),
                "c": pc.cast(t["dist"], pa.int64()),
                "_side": pa.array(np.ones(len(n), np.int8))})

        both = (edges.map_batches(tag_edges, batch_format="pyarrow")
                .union(frontier_ds.map_batches(tag_front,
                                               batch_format="pyarrow")))

        def relax_part(g: pa.Table) -> pa.Table:
            side = g["_side"].to_numpy(zero_copy_only=False)
            a = g["a"].to_numpy(zero_copy_only=False)
            b = g["b"].to_numpy(zero_copy_only=False)
            c = g["c"].to_numpy(zero_copy_only=False)
            fm = side == 1
            fn, fd = a[fm], c[fm]
            fo = np.argsort(fn, kind="stable")
            fn, fd = fn[fo], fd[fo]
            es, ed, ew = a[~fm], b[~fm], c[~fm]
            m = _member(fn, es)
            pos = np.searchsorted(fn, es[m])
            return block_min(ed[m], fd[pos] + ew[m])

        cand = (both.groupby("_part")
                .map_groups(relax_part, batch_format="pyarrow"))

        def tag_cand(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "c": pc.cast(t["dist"], pa.int64()),
                "_side": pa.array(np.zeros(len(n), np.int8))})

        def tag_dist(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "c": pc.cast(t["dist"], pa.int64()),
                "_side": pa.array(np.ones(len(n), np.int8))})

        pair = (cand.map_batches(tag_cand, batch_format="pyarrow")
                .union(dist_ds.map_batches(tag_dist,
                                           batch_format="pyarrow")))

        def fold(g: pa.Table) -> pa.Table:
            """Per hash(node) partition: min(settled, candidates);
            emit the FULL updated rows for this partition plus an
            _improved flag for the frontier split."""
            side = g["_side"].to_numpy(zero_copy_only=False)
            a = g["a"].to_numpy(zero_copy_only=False)
            c = g["c"].to_numpy(zero_copy_only=False)
            sm = side == 1
            sn, sd = a[sm], c[sm]
            so = np.argsort(sn, kind="stable")
            sn, sd = sn[so], sd[so]
            cn, cd = a[~sm], c[~sm]
            ct = block_min(cn, cd)
            cn = ct["node"].to_numpy(zero_copy_only=False)
            cd = ct["dist"].to_numpy(zero_copy_only=False)
            known = _member(sn, cn)
            pos = np.searchsorted(sn, cn[known])
            sd = sd.copy()
            improved_mask = cd[known] < sd[pos]
            sd[pos[improved_mask]] = cd[known][improved_mask]
            new_n, new_d = cn[~known], cd[~known]
            imp = np.zeros(len(sn), bool)
            imp[pos[improved_mask]] = True
            return pa.table({
                "node": pa.array(np.concatenate([sn, new_n]), pa.int64()),
                "dist": pa.array(np.concatenate([sd, new_d]), pa.int64()),
                "_improved": pa.array(np.concatenate(
                    [imp, np.ones(len(new_n), bool)]))})

        merged = (pair.groupby("_part")
                  .map_groups(fold, batch_format="pyarrow")
                  .materialize())
        frontier_ds = merged.map_batches(
            lambda t: t.filter(t["_improved"]).drop_columns(["_improved"]),
            batch_format="pyarrow").materialize()
        dist_ds = merged.map_batches(
            lambda t: t.drop_columns(["_improved"]),
            batch_format="pyarrow").materialize()
        if frontier_ds.count() == 0:
            return dist_ds.sort("node")
    raise RuntimeError(f"sssp: no fixpoint within {max_rounds} rounds")


def _undirected_distinct(edges_ds, src: str, dst: str):
    """Distinct undirected edge set (u < v, self-loops dropped) —
    block-local unordered-pair combiner → ONE native groupby (the
    `clustering_coefficients` dedup shape).  Node ids must fit 31
    bits for the packed combiner key (documented across this tier)."""
    from ray.data.aggregate import Count

    def undirect(b: pa.Table) -> pa.Table:
        u = pc.cast(b[src], pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.cast(b[dst], pa.int64()).to_numpy(zero_copy_only=False)
        keep = u != v
        u, v = u[keep], v[keep]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        key = np.unique(lo * (np.int64(1) << 31) + hi)
        return pa.table({
            "u": pa.array(key >> 31, pa.int64()),
            "v": pa.array(key & ((1 << 31) - 1), pa.int64())})

    return (edges_ds.map_batches(undirect, batch_format="pyarrow")
            .groupby(["u", "v"]).aggregate(Count(alias_name="_c"))
            .drop_columns(["_c"]).materialize())


def _lab_majority(nodes: np.ndarray, labs: np.ndarray,
                  ns: np.ndarray):
    """(node, lab, n) rows → per node the lab with max Σn, ties to the
    SMALLEST lab (the determinism rule) — one lexsort + reduceat."""
    o = np.lexsort((labs, nodes))
    nd, lb, nn = nodes[o], labs[o], ns[o]
    pair_first = np.ones(len(nd), bool)
    pair_first[1:] = (nd[1:] != nd[:-1]) | (lb[1:] != lb[:-1])
    starts = np.flatnonzero(pair_first)
    psum = np.add.reduceat(nn, starts) if len(starts) else nn[:0]
    pn, pl = nd[starts], lb[starts]
    # per node: argmax count, tie → min lab.  lexsort keys: node asc,
    # count desc, lab asc → first row of each node run wins.
    o2 = np.lexsort((pl, -psum, pn))
    pn, pl = pn[o2], pl[o2]
    node_first = np.ones(len(pn), bool)
    node_first[1:] = pn[1:] != pn[:-1]
    return pn[node_first], pl[node_first]


def label_propagation(edges_ds, rounds: int = 4, src: str = "src",
                      dst: str = "dst", distributed: bool = False,
                      broadcast_limit: int = 2_000_000,
                      num_partitions: int = 32, on_gate: str = "auto"):
    """Synchronous label-propagation communities (Raghavan et al. 2007,
    public method) over the DISTINCT UNDIRECTED edge set →
    Dataset(node:int64, lab:int64).  Every node starts as its own
    label; each round every node adopts the most frequent label among
    its neighbors, ties to the SMALLEST label — fully deterministic,
    bit-identical at any parallelism, and exactly ``rounds`` rounds of
    the synchronous update (early-stop when a round changes nothing is
    a pure optimization: further rounds are the identity).  Host-level
    community detection is the crawl-tier grouping for domain-aware
    sampling/dedup that plain connected components over-merges.

    Reference parity anchor: tesseract-rs has no graph surface
    (src/api.rs — documents independent); this extends the
    `pagerank`/`bfs_depth`/`k_core` crawl-graph tier.

    Scale shapes (both produce identical labels):

    - default: the label table lives as two sorted int64 arrays
      broadcast per round (``ray.put``), gated by ``broadcast_limit``
      (exact count, fail-loud).  Each round: one edge scan emitting
      per-block pre-counted (node, neighbor-lab, n) partials → ONE
      hash(node) co-group running the vectorized majority kernel →
      a node-proportional label pull (inside the same gate).
    - ``distributed=True``: labels stay a Dataset; each round is TWO
      slim co-group exchanges (edges⋈labels on hash(src) to emit
      neighbor labels, then candidates⋈labels on hash(node) to fold
      the majority) — nothing node-proportional reaches the driver.
    """
    import ray

    edges = _undirected_distinct(edges_ds, src, dst)

    def node_partial(b: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(ids, pa.int64())})

    def count_pairs(dstv: np.ndarray, labv: np.ndarray) -> pa.Table:
        """(node, lab) occurrences → pre-counted slim partial rows."""
        o = np.lexsort((labv, dstv))
        d, l = dstv[o], labv[o]
        first = np.ones(len(d), bool)
        first[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
        starts = np.flatnonzero(first)
        n = (np.add.reduceat(np.ones(len(d), np.int64), starts)
             if len(starts) else np.empty(0, np.int64))
        return pa.table({"node": pa.array(d[starts], pa.int64()),
                         "lab": pa.array(l[starts], pa.int64()),
                         "n": pa.array(n, pa.int64())})

    if not distributed:
        rows = (edges.map_batches(node_partial, batch_format="pyarrow")
                .take_all())
        nodes = np.unique(np.fromiter((r["node"] for r in rows),
                                      np.int64, len(rows)))
        if len(nodes) > broadcast_limit:
            _gate("label_propagation", f"{len(nodes)} nodes exceed "
                  f"broadcast_limit {broadcast_limit}", on_gate)
            return label_propagation(
                edges_ds, rounds=rounds, src=src, dst=dst,
                distributed=True, broadcast_limit=broadcast_limit,
                num_partitions=num_partitions)
        labs = nodes.copy()
        for _ in range(rounds):
            ref = ray.put((nodes, labs))

            def emit(t: pa.Table, _r=ref) -> pa.Table:
                nn, ll = ray.get(_r)
                u = t["u"].to_numpy(zero_copy_only=False)
                v = t["v"].to_numpy(zero_copy_only=False)
                lu = ll[np.searchsorted(nn, u)]
                lv = ll[np.searchsorted(nn, v)]
                return count_pairs(np.concatenate([u, v]),
                                   np.concatenate([lv, lu]))

            def tag(t: pa.Table) -> pa.Table:
                n = t["node"].to_numpy(zero_copy_only=False)
                part = np.abs(n) % np.int64(num_partitions)
                return t.append_column("_part",
                                       pa.array(part, pa.int64()))

            def majority(g: pa.Table) -> pa.Table:
                pn, pl = _lab_majority(
                    g["node"].to_numpy(zero_copy_only=False),
                    g["lab"].to_numpy(zero_copy_only=False),
                    g["n"].to_numpy(zero_copy_only=False))
                return pa.table({"node": pa.array(pn, pa.int64()),
                                 "lab": pa.array(pl, pa.int64())})

            upd = (edges.map_batches(emit, batch_format="pyarrow",
                                     batch_size=262_144)
                   .map_batches(tag, batch_format="pyarrow")
                   .groupby("_part")
                   .map_groups(majority, batch_format="pyarrow")
                   .to_pandas())
            un = upd["node"].to_numpy(np.int64)
            ul = upd["lab"].to_numpy(np.int64)
            new_labs = labs.copy()
            new_labs[np.searchsorted(nodes, un)] = ul
            if np.array_equal(new_labs, labs):
                break
            labs = new_labs
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "lab": pa.array(labs, pa.int64())}))

    # ---- distributed: the label table stays a Dataset ----
    def part_of(ids: np.ndarray) -> np.ndarray:
        return np.abs(ids) % np.int64(num_partitions)

    from ray.data.aggregate import Count

    labels_ds = (edges.map_batches(node_partial, batch_format="pyarrow")
                 .groupby("node").aggregate(Count(alias_name="_c"))
                 .drop_columns(["_c"])
                 .map_batches(lambda t: pa.table({
                     "node": pc.cast(t["node"], pa.int64()),
                     "lab": pc.cast(t["node"], pa.int64())}),
                     batch_format="pyarrow")
                 .materialize())
    for _ in range(rounds):
        def tag_edges(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            a = np.concatenate([u, v])      # label-lookup key (src)
            b = np.concatenate([v, u])      # receiver
            return pa.table({
                "_part": pa.array(part_of(a), pa.int64()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "_side": pa.array(np.zeros(len(a), np.int8))})

        def tag_labels(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "a": pa.array(n, pa.int64()),
                "b": pc.cast(t["lab"], pa.int64()),
                "_side": pa.array(np.ones(len(n), np.int8))})

        both = (edges.map_batches(tag_edges, batch_format="pyarrow")
                .union(labels_ds.map_batches(tag_labels,
                                             batch_format="pyarrow")))

        def relay(g: pa.Table) -> pa.Table:
            side = g["_side"].to_numpy(zero_copy_only=False)
            a = g["a"].to_numpy(zero_copy_only=False)
            b = g["b"].to_numpy(zero_copy_only=False)
            lm = side == 1
            ln, ll = a[lm], b[lm]
            o = np.argsort(ln, kind="stable")
            ln, ll = ln[o], ll[o]
            es, er = a[~lm], b[~lm]
            lab = ll[np.searchsorted(ln, es)]
            return count_pairs(er, lab)

        cand = (both.groupby("_part").map_groups(
            relay, batch_format="pyarrow"))

        def tag_cand(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "node": pc.cast(t["node"], pa.int64()),
                "lab": pc.cast(t["lab"], pa.int64()),
                "n": pc.cast(t["n"], pa.int64()),
                "_side": pa.array(np.zeros(len(n), np.int8))})

        def tag_cur(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "node": pc.cast(t["node"], pa.int64()),
                "lab": pc.cast(t["lab"], pa.int64()),
                "n": pa.array(np.zeros(len(n), np.int64), pa.int64()),
                "_side": pa.array(np.ones(len(n), np.int8))})

        pair = (cand.map_batches(tag_cand, batch_format="pyarrow")
                .union(labels_ds.map_batches(tag_cur,
                                             batch_format="pyarrow")))

        def fold(g: pa.Table) -> pa.Table:
            side = g["_side"].to_numpy(zero_copy_only=False)
            nd = g["node"].to_numpy(zero_copy_only=False)
            lb = g["lab"].to_numpy(zero_copy_only=False)
            nn = g["n"].to_numpy(zero_copy_only=False)
            cm = side == 0
            pn, pl = _lab_majority(nd[cm], lb[cm], nn[cm])
            on, ol = nd[~cm], lb[~cm]
            o = np.argsort(on, kind="stable")
            on, ol = on[o], ol[o]
            upd = _member(pn, on)
            out = ol.copy()
            out[upd] = pl[np.searchsorted(pn, on[upd])]
            return pa.table({"node": pa.array(on, pa.int64()),
                             "lab": pa.array(out, pa.int64())})

        labels_ds = (pair.groupby("_part")
                     .map_groups(fold, batch_format="pyarrow")
                     .materialize())
    return labels_ds


def modularity_stats(edges_ds, labels_ds, src: str = "src",
                     dst: str = "dst", node_col: str = "node",
                     lab_col: str = "lab",
                     broadcast_limit: int = 2_000_000):
    """Exact integer Newman modularity sufficient statistics per
    community over the distinct undirected edge set →
    Dataset(lab:int64, m_in:int64, d_tot:int64, q_num:int64) where

        q_num(c) = 4·m·m_in(c) − d_tot(c)²        (m = |edges|)

    and global modularity Q = Σ_c q_num(c) / (4·m²) — the partition-
    quality score for ``label_propagation`` output, exact ints so the
    SQL oracle replays it bit-for-bit.  The label table is broadcast
    (sorted-array searchsorted attach) behind an exact-count
    fail-loud gate; both passes are block combiner → native Sum."""
    import ray
    from ray.data.aggregate import Sum

    edges = _undirected_distinct(edges_ds, src, dst)
    m = edges.count()
    n_lab = labels_ds.count()
    if n_lab > broadcast_limit:
        raise ValueError(
            f"modularity_stats: {n_lab} label rows exceed "
            f"broadcast_limit {broadcast_limit}; attach labels with "
            "ops/cc.attach_labels (co-group) and pre-aggregate")
    lt = labels_ds.select_columns([node_col, lab_col]).to_pandas()
    ln = lt[node_col].to_numpy(np.int64)
    ll = lt[lab_col].to_numpy(np.int64)
    o = np.argsort(ln, kind="stable")
    ref = ray.put((ln[o], ll[o]))

    def partial(b: pa.Table) -> pa.Table:
        nn, ll2 = ray.get(ref)
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        lu = ll2[np.searchsorted(nn, u)]
        lv = ll2[np.searchsorted(nn, v)]
        # intra-community edges per lab + degree mass per lab
        labs = np.concatenate([lu[lu == lv], lu, lv])
        kinds = np.concatenate([
            np.zeros((lu == lv).sum(), np.int64),
            np.ones(len(lu) * 2, np.int64)])
        o2 = np.lexsort((kinds, labs))
        la, ki = labs[o2], kinds[o2]
        first = np.ones(len(la), bool)
        first[1:] = (la[1:] != la[:-1]) | (ki[1:] != ki[:-1])
        starts = np.flatnonzero(first)
        cnt = (np.add.reduceat(np.ones(len(la), np.int64), starts)
               if len(starts) else np.empty(0, np.int64))
        la, ki = la[starts], ki[starts]
        return pa.table({
            "lab": pa.array(la, pa.int64()),
            "m_in": pa.array(np.where(ki == 0, cnt, 0), pa.int64()),
            "d_tot": pa.array(np.where(ki == 1, cnt, 0), pa.int64())})

    agg = (edges.map_batches(partial, batch_format="pyarrow")
           .groupby("lab")
           .aggregate(Sum("m_in", alias_name="m_in"),
                      Sum("d_tot", alias_name="d_tot")))

    def finish(t: pa.Table) -> pa.Table:
        mi = pc.cast(t["m_in"], pa.int64()).to_numpy(zero_copy_only=False)
        dt = pc.cast(t["d_tot"], pa.int64()).to_numpy(zero_copy_only=False)
        q = 4 * np.int64(m) * mi - dt * dt
        return pa.table({
            "lab": pc.cast(t["lab"], pa.int64()),
            "m_in": pa.array(mi, pa.int64()),
            "d_tot": pa.array(dt, pa.int64()),
            "q_num": pa.array(q, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def _luby_pri(nodes: np.ndarray, r: int) -> np.ndarray:
    """Deterministic per-round Luby priority: splitmix64 of
    node + r·GOLD (uint64 wraparound) — a bijection per round, so no
    ties ever; identical constant set replays in SQL via the shared
    mix64 CTE chain."""
    from .dedup import _mix64

    gold = np.uint64(0x9E3779B97F4A7C15)
    return _mix64(nodes.astype(np.uint64) + np.uint64(r) * gold)


def maximal_independent_set(edges_ds, src: str = "src",
                            dst: str = "dst", max_rounds: int = 64,
                            broadcast_limit: int = 2_000_000,
                            distributed: bool = False,
                            num_partitions: int = 32,
                            on_gate: str = "auto"):
    """Deterministic Luby maximal independent set (Luby 1986, public
    method) over the distinct undirected edge set →
    Dataset(node:int64, in_mis:int64, mis_round:int64) for every edge
    endpoint (mis_round = the round a node joined, 0 for non-members).
    The crawl-tier use: pick one representative per dense mirror /
    template cluster such that no two picked hosts are directly
    linked — a conflict-free sample the greedy sequential rule can't
    produce distributedly.

    Each round every ACTIVE node joins the MIS iff its splitmix64
    priority (`_luby_pri` — tie-free by bijection) is strictly below
    every active neighbor's; joiners and their neighbors deactivate.
    Expected O(log n) rounds; fail-loud at ``max_rounds``.  The
    active-set/MIS state lives as sorted driver arrays behind an
    exact-count ``broadcast_limit`` gate (the `bfs_depth` placement);
    both per-round passes are distributed edge scans emitting ≤1 slim
    row per (block, node).  ``distributed=True`` keeps active/MIS
    state as Datasets instead — four slim hash co-groups per round
    (messages, join decision, joiner neighbors, deactivation), nothing
    node-proportional on the driver, bit-identical to the broadcast
    mode (same priorities, same rounds).

    Reference parity anchor: tesseract-rs has no graph surface
    (src/api.rs — documents independent); extends the
    `pagerank`/`bfs_depth`/`label_propagation` crawl-graph tier.
    """
    import ray

    edges = _undirected_distinct(edges_ds, src, dst)
    if distributed:
        return _mis_distributed(edges, max_rounds, num_partitions)

    def node_partial(b: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(ids, pa.int64())})

    rows = (edges.map_batches(node_partial, batch_format="pyarrow")
            .take_all())
    nodes = np.unique(np.fromiter((r["node"] for r in rows),
                                  np.int64, len(rows)))
    if len(nodes) > broadcast_limit:
        _gate("maximal_independent_set", f"{len(nodes)} nodes exceed "
              f"broadcast_limit {broadcast_limit}", on_gate)
        return _mis_distributed(edges, max_rounds, num_partitions)
    active = nodes.copy()
    mis_nodes: list = []
    mis_rounds: list = []

    for r in range(1, max_rounds + 1):
        if not len(active):
            break
        act_ref = ray.put(active)

        def min_nbr(t: pa.Table, _a=act_ref, _r=r) -> pa.Table:
            act = ray.get(_a)
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            both = _member(act, u) & _member(act, v)
            u, v = u[both], v[both]
            nd = np.concatenate([u, v])
            npri = np.concatenate([_luby_pri(v, _r), _luby_pri(u, _r)])
            if not len(nd):
                return pa.table({"node": pa.array([], pa.int64()),
                                 "mn": pa.array([], pa.uint64())})
            o = np.lexsort((npri, nd))
            n2, p2 = nd[o], npri[o]
            first = np.ones(len(n2), bool)
            first[1:] = n2[1:] != n2[:-1]
            return pa.table({"node": pa.array(n2[first], pa.int64()),
                             "mn": pa.array(p2[first], pa.uint64())})

        got = (edges.map_batches(min_nbr, batch_format="pyarrow",
                                 batch_size=262_144).to_pandas())
        mn = np.full(len(active), np.iinfo(np.uint64).max, np.uint64)
        if len(got):
            gn = got["node"].to_numpy(np.int64)
            gp = got["mn"].to_numpy(np.uint64)
            o = np.lexsort((gp, gn))
            gn, gp = gn[o], gp[o]
            first = np.ones(len(gn), bool)
            first[1:] = gn[1:] != gn[:-1]
            gn, gp = gn[first], gp[first]
            pos = np.searchsorted(active, gn)
            mn[pos] = gp
        joiners = active[_luby_pri(active, r) < mn]
        mis_nodes.append(joiners)
        mis_rounds.append(np.full(len(joiners), r, np.int64))
        j_ref = ray.put(joiners)  # sorted (subset of sorted active)

        def nbrs(t: pa.Table, _j=j_ref) -> pa.Table:
            J = ray.get(_j)
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            out = np.unique(np.concatenate(
                [v[_member(J, u)], u[_member(J, v)]]))
            return pa.table({"node": pa.array(out, pa.int64())})

        nb_rows = (edges.map_batches(nbrs, batch_format="pyarrow",
                                     batch_size=262_144).take_all())
        nb = (np.unique(np.fromiter((r2["node"] for r2 in nb_rows),
                                    np.int64, len(nb_rows)))
              if nb_rows else np.empty(0, np.int64))
        drop = np.union1d(joiners, nb)
        active = active[~_member(drop, active)]
    else:
        if len(active):
            raise RuntimeError(
                f"maximal_independent_set: not converged within "
                f"{max_rounds} rounds")

    mn_all = (np.concatenate(mis_nodes) if mis_nodes
              else np.empty(0, np.int64))
    mr_all = (np.concatenate(mis_rounds) if mis_rounds
              else np.empty(0, np.int64))
    o = np.argsort(mn_all, kind="stable")
    mn_all, mr_all = mn_all[o], mr_all[o]
    in_mis = _member(mn_all, nodes).astype(np.int64)
    rnd = np.zeros(len(nodes), np.int64)
    hit = in_mis == 1
    rnd[hit] = mr_all[np.searchsorted(mn_all, nodes[hit])]
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "in_mis": pa.array(in_mis, pa.int64()),
        "mis_round": pa.array(rnd, pa.int64())}))


def _consolidate(ds, num_partitions: int):
    """Consolidate iterated-state Datasets before the next round
    consumes them: ``groupby(...).map_groups`` emits EMPTY blocks with
    empty schemas for group-less partitions, and re-consuming such a
    dataset in later unions degrades catastrophically (measured ~6×
    PER LAYER in `mis_coloring`'s color loop — 14 nodes took minutes).
    One `repartition(P)` rebuilds clean uniform blocks and restores
    constant per-round cost; P = the co-group partition count, so the
    block count stays scale-appropriate (never a single driver-sized
    block)."""
    return ds.repartition(num_partitions).materialize()


def _mis_tag_edges(edges, num_partitions: int):
    """Distinct undirected edges → the doubled giver/receiver rows
    `_mis_distributed`'s co-groups consume (materialized; tag once,
    reuse across MIS layers)."""
    P = np.int64(num_partitions)

    def tag_edges(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        g = np.concatenate([u, v])
        rcv = np.concatenate([v, u])
        return pa.table({
            "_part": pa.array(np.abs(g) % P, pa.int64()),
            "_side": pa.array(np.ones(len(g), np.int8)),
            "g": pa.array(g, pa.int64()),
            "rcv": pa.array(rcv, pa.int64()),
            "pri": pa.array(np.zeros(len(g), np.uint64), pa.uint64())})

    return edges.map_batches(
        tag_edges, batch_format="pyarrow").materialize()


def _mis_distributed(edges, max_rounds: int, num_partitions: int,
                     round_offset: int = 0, nodes_ds=None,
                     edges_tagged=None):
    """Dataset-state Luby MIS: per round four slim co-groups —
    (A) active⋈edges on hash(giver) → per-partition min active-nbr
    priority per receiver, (B) messages⋈active on hash(node) → the
    join decision (no-message active nodes join too), (C)
    joiners⋈edges on hash(giver) → joiner neighborhoods, (D)
    active⋈(joiners ∪ nbrs) anti-join → the surviving active set.
    Same ``_luby_pri`` priorities as the broadcast mode →
    bit-identical output.

    ``round_offset`` shifts the priority round index (round r draws
    priorities at ``round_offset + r``) and ``nodes_ds`` overrides
    the initial active set (a distinct ``node:int64`` Dataset) — the
    two hooks `ops/coloring.mis_coloring(distributed=True)` needs to
    replay its per-color layers (color c uses offset (c−1)·64 over
    the still-uncolored nodes) bit-identically to its broadcast mode.
    Edges whose endpoints are not in ``nodes_ds`` are ignored: givers
    outside it send nothing, receivers outside it drop messages."""
    import ray
    from ray.data.aggregate import Count

    P = np.int64(num_partitions)

    def part_of(ids: np.ndarray) -> np.ndarray:
        return np.abs(ids) % P

    def node_partial(b: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(ids, pa.int64())})

    if nodes_ds is None:
        nodes_ds = (edges.map_batches(node_partial,
                                      batch_format="pyarrow")
                    .groupby("node").aggregate(Count(alias_name="_n"))
                    .select_columns(["node"])).materialize()
    else:
        nodes_ds = _consolidate(nodes_ds, num_partitions)

    def tag_nodes(t: pa.Table, side: int) -> pa.Table:
        n = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "_part": pa.array(part_of(n), pa.int64()),
            "_side": pa.array(np.full(len(n), side, np.int8)),
            "g": pa.array(n, pa.int64()),
            "rcv": pa.array(np.zeros(len(n), np.int64), pa.int64()),
            "pri": pa.array(np.zeros(len(n), np.uint64), pa.uint64())})

    if edges_tagged is None:
        # callers looping over MIS layers (mis_coloring) pass the
        # tagged edge table in so it materializes ONCE, not per layer
        edges_tagged = _mis_tag_edges(edges, num_partitions)

    active = nodes_ds
    mis_parts: list = []
    converged = False
    for r in range(1, max_rounds + 1):
        if active.count() == 0:
            converged = True
            break

        def send(t: pa.Table, _r=round_offset + r) -> pa.Table:
            st = t.filter(pc.equal(t["_side"], 0))
            ed = t.filter(pc.equal(t["_side"], 1))
            act = np.sort(st["g"].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
            g = ed["g"].to_numpy(zero_copy_only=False).astype(np.int64)
            rcv = ed["rcv"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            keep = _member(act, g)
            g, rcv = g[keep], rcv[keep]
            if not len(g):
                return pa.table({"node": pa.array([], pa.int64()),
                                 "mn": pa.array([], pa.uint64())})
            pri = _luby_pri(g, _r)
            o = np.lexsort((pri, rcv))
            r2, p2 = rcv[o], pri[o]
            first = np.ones(len(r2), bool)
            first[1:] = r2[1:] != r2[:-1]
            return pa.table({"node": pa.array(r2[first], pa.int64()),
                             "mn": pa.array(p2[first], pa.uint64())})

        msgs = (active.map_batches(lambda b: tag_nodes(b, 0),
                                   batch_format="pyarrow")
                .union(edges_tagged)
                .groupby("_part")
                .map_groups(send, batch_format="pyarrow"))

        def tag_msgs(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(part_of(n), pa.int64()),
                "_side": pa.array(np.ones(len(n), np.int8)),
                "g": pa.array(n, pa.int64()),
                "rcv": pa.array(np.zeros(len(n), np.int64), pa.int64()),
                "pri": t["mn"]})

        def decide(t: pa.Table, _r=round_offset + r,
                   _rl=r) -> pa.Table:
            st = t.filter(pc.equal(t["_side"], 0))
            ms = t.filter(pc.equal(t["_side"], 1))
            act = np.sort(st["g"].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
            if not len(act):
                return pa.table({"node": pa.array([], pa.int64()),
                                 "mis_round": pa.array([], pa.int64())})
            mn = np.full(len(act), np.iinfo(np.uint64).max, np.uint64)
            gn = ms["g"].to_numpy(zero_copy_only=False).astype(np.int64)
            gp = ms["pri"].to_numpy(zero_copy_only=False).astype(
                np.uint64)
            keep = _member(act, gn)
            gn, gp = gn[keep], gp[keep]
            if len(gn):
                o = np.lexsort((gp, gn))
                gn, gp = gn[o], gp[o]
                first = np.ones(len(gn), bool)
                first[1:] = gn[1:] != gn[:-1]
                np.minimum.at(mn, np.searchsorted(act, gn[first]),
                              gp[first])
            joiners = act[_luby_pri(act, _r) < mn]
            return pa.table({
                "node": pa.array(joiners, pa.int64()),
                "mis_round": pa.array(
                    np.full(len(joiners), _rl, np.int64))})

        joiners_ds = (msgs.map_batches(tag_msgs, batch_format="pyarrow")
                      .union(active.map_batches(
                          lambda b: tag_nodes(b, 0),
                          batch_format="pyarrow"))
                      .groupby("_part")
                      .map_groups(decide, batch_format="pyarrow"))
        # consumed 3× per round — consolidate (see _consolidate)
        joiners_ds = _consolidate(joiners_ds, num_partitions)
        mis_parts.append(joiners_ds)

        def nbrs_of(t: pa.Table) -> pa.Table:
            st = t.filter(pc.equal(t["_side"], 0))
            ed = t.filter(pc.equal(t["_side"], 1))
            J = np.sort(st["g"].to_numpy(zero_copy_only=False)
                        .astype(np.int64))
            g = ed["g"].to_numpy(zero_copy_only=False).astype(np.int64)
            rcv = ed["rcv"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            out = np.unique(rcv[_member(J, g)])
            return pa.table({"node": pa.array(out, pa.int64())})

        nbrs_ds = (joiners_ds.map_batches(
                       lambda b: tag_nodes(b, 0),
                       batch_format="pyarrow")
                   .union(edges_tagged)
                   .groupby("_part")
                   .map_groups(nbrs_of, batch_format="pyarrow"))

        def anti(t: pa.Table) -> pa.Table:
            st = t.filter(pc.equal(t["_side"], 0))
            dr = t.filter(pc.equal(t["_side"], 1))
            act = st["g"].to_numpy(zero_copy_only=False).astype(np.int64)
            drop = np.sort(np.unique(
                dr["g"].to_numpy(zero_copy_only=False).astype(np.int64)))
            keep = act[~_member(drop, act)]
            return pa.table({"node": pa.array(keep, pa.int64())})

        drop_ds = joiners_ds.select_columns(["node"]).union(nbrs_ds)
        active = (active.map_batches(lambda b: tag_nodes(b, 0),
                                     batch_format="pyarrow")
                  .union(drop_ds.map_batches(
                      lambda b: tag_nodes(b, 1),
                      batch_format="pyarrow"))
                  .groupby("_part")
                  .map_groups(anti, batch_format="pyarrow"))
        active = _consolidate(active, num_partitions)
    else:
        converged = active.count() == 0
    if not converged:
        raise RuntimeError(
            f"maximal_independent_set: not converged within "
            f"{max_rounds} rounds")

    if not mis_parts:  # empty graph
        import ray.data
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "in_mis": pa.array([], pa.int64()),
            "mis_round": pa.array([], pa.int64())}))
    mis_all = mis_parts[0]
    for extra in mis_parts[1:]:
        mis_all = mis_all.union(extra)

    def attach(t: pa.Table) -> pa.Table:
        st = t.filter(pc.equal(t["_side"], 0))
        ms = t.filter(pc.equal(t["_side"], 1))
        n = st["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        jn = np.sort(ms["g"].to_numpy(zero_copy_only=False)
                     .astype(np.int64))
        jr = ms["pri"].to_numpy(zero_copy_only=False).astype(np.int64)[
            np.argsort(ms["g"].to_numpy(zero_copy_only=False)
                       .astype(np.int64), kind="stable")]
        hit = _member(jn, n)
        rnd = np.zeros(len(n), np.int64)
        rnd[hit] = jr[np.searchsorted(jn, n[hit])]
        return pa.table({
            "node": pa.array(n, pa.int64()),
            "in_mis": pa.array(hit.astype(np.int64), pa.int64()),
            "mis_round": pa.array(rnd, pa.int64())})

    def tag_mis(t: pa.Table) -> pa.Table:
        n = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "_part": pa.array(part_of(n), pa.int64()),
            "_side": pa.array(np.ones(len(n), np.int8)),
            "g": pa.array(n, pa.int64()),
            "rcv": pa.array(np.zeros(len(n), np.int64), pa.int64()),
            "pri": pa.array(t["mis_round"].to_numpy(
                zero_copy_only=False).astype(np.uint64), pa.uint64())})

    out = (nodes_ds.map_batches(lambda b: tag_nodes(b, 0),
                                batch_format="pyarrow")
           .union(mis_all.map_batches(tag_mis, batch_format="pyarrow"))
           .groupby("_part")
           .map_groups(attach, batch_format="pyarrow"))
    return out.sort("node")


def _drop_endpoints_cogroup(e, low_ds, num_partitions: int):
    """Drop every edge touching a node in ``low_ds`` via two slim
    hash co-group anti-joins (one per endpoint column) — the
    distributed alternative to broadcasting the peel set."""
    P = np.int64(num_partitions)

    def one_side(e_ds, col: str):
        other = "b" if col == "a" else "a"

        def tag_e(t: pa.Table) -> pa.Table:
            key = t[col].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(np.abs(key) % P, pa.int64()),
                "_side": pa.array(np.zeros(len(key), np.int8)),
                "x": pa.array(key, pa.int64()),
                "y": pc.cast(t[other], pa.int64())})

        def tag_low(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_part": pa.array(np.abs(n) % P, pa.int64()),
                "_side": pa.array(np.ones(len(n), np.int8)),
                "x": pa.array(n, pa.int64()),
                "y": pa.array(np.zeros(len(n), np.int64), pa.int64())})

        def anti(t: pa.Table, _col=col, _other=other) -> pa.Table:
            ed = t.filter(pc.equal(t["_side"], 0))
            lo = t.filter(pc.equal(t["_side"], 1))
            drop = np.sort(lo["x"].to_numpy(zero_copy_only=False)
                           .astype(np.int64))
            x = ed["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = ed["y"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = ~_member(drop, x)
            return pa.table({_col: pa.array(x[keep], pa.int64()),
                             _other: pa.array(y[keep], pa.int64())})

        return (e_ds.map_batches(tag_e, batch_format="pyarrow")
                .union(low_ds.map_batches(tag_low,
                                          batch_format="pyarrow"))
                .groupby("_part")
                .map_groups(anti, batch_format="pyarrow"))

    return one_side(one_side(e, "a"), "b").materialize()
