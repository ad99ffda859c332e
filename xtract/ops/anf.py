"""Neighborhood function / effective-diameter audit over the host
graph: N(r) = the number of ordered (u, v) pairs with hop distance
d(u, v) ≤ r (self-pairs included, so N(0) = |V|).  The curve's knee is
the crawl graph's effective diameter — the "how many hops until the
frontier saturates" planning number for seed selection and crawl-depth
budgets.

``neighborhood_function`` is the EXACT small/medium-graph variant: one
bitset of reached nodes per node, propagated r rounds as synchronous
OR over neighbors — deterministic, bit-identical at any parallelism,
and replayable in SQL as r unrolled reachability joins.  The reached-
set matrix lives on the driver behind an exact-count fail-loud gate
(n ≤ ``broadcast_limit`` nodes → n²/8 bytes); every round's heavy work
(the per-edge OR) is a distributed edge scan emitting ≤1 slim partial
row per (block, node).

At crawl scale the public method is HyperANF (Boldi, Rosa & Vigna
2011): swap each exact bitset for an HLL register array and the OR for
register-wise max — same propagation shape, O(n·2^p) state that can
stay sharded.  This module keeps the exact variant because it is the
one an SQL oracle can replay bit-for-bit; :func:`hyper_anf` below IS
the register swap (sharded Dataset state, no driver gate).

Reference parity anchor: tesseract-rs has no graph surface
(src/api.rs — documents independent); this extends the
`pagerank`/`bfs_depth`/`label_propagation` crawl-graph tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_POP = np.array([bin(i).count("1") for i in range(256)], np.int64)


def _popcount(words: np.ndarray) -> int:
    return int(_POP[words.view(np.uint8)].sum())


def neighborhood_function(edges_ds, max_r: int = 6,
                          src: str = "src", dst: str = "dst",
                          broadcast_limit: int = 8192) -> pd.DataFrame:
    """→ DataFrame (r 0..max_r, n_pairs) — exact ordered-pair counts
    within hop distance r over the distinct undirected edge set.
    Early-converged graphs carry the saturated count forward."""
    import ray

    from .graph import _member, _undirected_distinct

    edges = _undirected_distinct(edges_ds, src, dst)

    def node_partial(b: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(ids, pa.int64())})

    rows = (edges.map_batches(node_partial, batch_format="pyarrow")
            .take_all())
    nodes = np.unique(np.fromiter((r["node"] for r in rows),
                                  np.int64, len(rows)))
    n = len(nodes)
    if n > broadcast_limit:
        raise ValueError(
            f"neighborhood_function: {n} nodes exceed broadcast_limit "
            f"{broadcast_limit} (exact bitsets are n²/8 bytes); use "
            "hyper_anf (the register swap) for crawl-scale graphs")
    words = (n + 63) // 64
    B = np.zeros((n, words), np.uint64)
    idx = np.arange(n)
    B[idx, idx // 64] = np.uint64(1) << np.uint64(idx % 64)

    out = [(0, _popcount(B))]
    for r in range(1, max_r + 1):
        ref = ray.put((nodes, B))

        def or_scan(t: pa.Table, _ref=ref) -> pa.Table:
            nn, bb = ray.get(_ref)
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            pu = np.searchsorted(nn, u)
            pv = np.searchsorted(nn, v)
            recv = np.concatenate([pu, pv])
            give = np.concatenate([pv, pu])
            o = np.argsort(recv, kind="stable")
            recv, give = recv[o], give[o]
            first = np.ones(len(recv), bool)
            first[1:] = recv[1:] != recv[:-1]
            starts = np.flatnonzero(first)
            acc = np.bitwise_or.reduceat(bb[give], starts, axis=0)
            return pa.table({
                "node": pa.array(nn[recv[starts]], pa.int64()),
                "bits": pa.array(
                    [w.tobytes() for w in acc], pa.binary())})

        got = (edges.map_batches(or_scan, batch_format="pyarrow",
                                 batch_size=262_144).to_pandas())
        newB = B.copy()
        if len(got):
            gn = got["node"].to_numpy(np.int64)
            gw = np.stack([np.frombuffer(b, np.uint64)
                           for b in got["bits"]])
            pos = np.searchsorted(nodes, gn)
            np.bitwise_or.at(newB, pos, gw)
        if np.array_equal(newB, B):
            out.extend((rr, out[-1][1]) for rr in range(r, max_r + 1))
            break
        B = newB
        out.append((r, _popcount(B)))
    return pd.DataFrame(out, columns=["r", "n_pairs"]).astype("int64")


def harmonic_centrality(edges_ds, max_r: int = 6,
                        src: str = "src", dst: str = "dst",
                        broadcast_limit: int = 8192) -> pd.DataFrame:
    """Truncated harmonic centrality H(u) = Σ_{v≠u, d(u,v) ≤ max_r}
    1/d(u,v), the bounded-radius influence score (Boldi & Vigna 2014,
    public axioms-of-centrality line) — which hosts reach the most of
    the graph in the fewest hops.

    EXACT integers: per bitset round the NEW bits are exactly the
    nodes at distance r, so H(u)·lcm(1..max_r) = Σ_r new_r(u)·(L/r)
    with L = lcm(1..max_r) — no float division anywhere, bit-identical
    at any parallelism, SQL-replayable via unrolled reachability
    deltas.  Same gated bitset propagation as
    :func:`neighborhood_function` (HyperANF register swap at crawl
    scale).  → DataFrame (node, h_num:int64, lcm:int64) sorted by
    node; H(u) = h_num / lcm."""
    import math

    import ray

    from .graph import _undirected_distinct

    L = math.lcm(*range(1, max_r + 1))
    edges = _undirected_distinct(edges_ds, src, dst)

    def node_partial(b: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(ids, pa.int64())})

    rows = (edges.map_batches(node_partial, batch_format="pyarrow")
            .take_all())
    nodes = np.unique(np.fromiter((r["node"] for r in rows),
                                  np.int64, len(rows)))
    n = len(nodes)
    if n > broadcast_limit:
        raise ValueError(
            f"harmonic_centrality: {n} nodes exceed broadcast_limit "
            f"{broadcast_limit} (exact bitsets are n²/8 bytes); use "
            "hyper_anf (the register swap) for crawl-scale graphs")
    words = (n + 63) // 64
    B = np.zeros((n, words), np.uint64)
    idx = np.arange(n)
    B[idx, idx // 64] = np.uint64(1) << np.uint64(idx % 64)
    per_node = _POP[B.view(np.uint8)].reshape(n, -1).sum(axis=1)
    h = np.zeros(n, np.int64)

    for r in range(1, max_r + 1):
        ref = ray.put((nodes, B))

        def or_scan(t: pa.Table, _ref=ref) -> pa.Table:
            nn, bb = ray.get(_ref)
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            pu = np.searchsorted(nn, u)
            pv = np.searchsorted(nn, v)
            recv = np.concatenate([pu, pv])
            give = np.concatenate([pv, pu])
            o = np.argsort(recv, kind="stable")
            recv, give = recv[o], give[o]
            first = np.ones(len(recv), bool)
            first[1:] = recv[1:] != recv[:-1]
            starts = np.flatnonzero(first)
            acc = np.bitwise_or.reduceat(bb[give], starts, axis=0)
            return pa.table({
                "node": pa.array(nn[recv[starts]], pa.int64()),
                "bits": pa.array(
                    [w.tobytes() for w in acc], pa.binary())})

        got = (edges.map_batches(or_scan, batch_format="pyarrow",
                                 batch_size=262_144).to_pandas())
        newB = B.copy()
        if len(got):
            gn = got["node"].to_numpy(np.int64)
            gw = np.stack([np.frombuffer(b, np.uint64)
                           for b in got["bits"]])
            pos = np.searchsorted(nodes, gn)
            np.bitwise_or.at(newB, pos, gw)
        new_per = _POP[newB.view(np.uint8)].reshape(n, -1).sum(axis=1)
        h += (new_per - per_node) * (L // r)
        if np.array_equal(newB, B):
            break
        B, per_node = newB, new_per
    return pd.DataFrame({
        "node": nodes, "h_num": h,
        "lcm": np.full(n, L, np.int64)}).astype("int64")


# ---------------------------------------------------------------------------
# HyperANF — the crawl-scale register swap the exact-bitset gate names
# ---------------------------------------------------------------------------

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _fsb_np(col, m: int) -> np.ndarray:
    """Zero-copy view of a fixed-size-binary column as (n, m) uint8."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):  # zero chunks edge
        arr = pa.concat_arrays(arr.chunks or
                               [pa.array([], pa.binary(m))])
    buf = arr.buffers()[1]
    a = np.frombuffer(buf, np.uint8)
    off = arr.offset * m
    return a[off: off + len(arr) * m].reshape(len(arr), m)


def _fsb_arr(mat: np.ndarray, m: int) -> pa.Array:
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(m), len(mat), [None, pa.py_buffer(
            np.ascontiguousarray(mat, np.uint8).tobytes())])


def _node_registers(nodes: np.ndarray, p: int) -> np.ndarray:
    """Each node contributes ONE HLL element: splitmix64(node) →
    bucket = low p bits, rank = trailing zeros of the remaining bits
    + 1 (capped at 64 − p + 1 when they are all zero) — the
    trailing-zero form is what a DuckDB oracle can replay with
    bit_count(xor(x, x−1))."""
    from .dedup import _mix64

    m = 1 << p
    h = _mix64(nodes.astype(np.uint64))
    bucket = (h & np.uint64(m - 1)).astype(np.int64)
    x = h >> np.uint64(p)
    nz = x != 0
    # vectorized trailing zeros: popcount((x ^ (x-1)) >> 1)
    pop = _POP[((x ^ (x - np.uint64(1))) >> np.uint64(1))
               .view(np.uint8).reshape(len(x), 8)].sum(axis=1)
    rank = np.where(nz, pop + 1, np.int64(64 - p + 1)).astype(np.uint8)
    regs = np.zeros((len(nodes), m), np.uint8)
    regs[np.arange(len(nodes)), bucket] = rank
    return regs


def hyper_anf(edges_ds, max_r: int = 6, p: int = 4,
              src: str = "src", dst: str = "dst",
              num_partitions: int = 32) -> pd.DataFrame:
    """HyperANF (Boldi, Rosa & Vigna 2011): the neighborhood function
    at crawl scale — each node's reached-set is an HLL register array
    (m = 2^p bytes), propagated ``max_r`` synchronous rounds as
    register-wise max over neighbors.  → DataFrame (r, reg_sum,
    est_pairs): ``reg_sum`` = Σ_nodes Σ_buckets M (an exact int64 —
    the register-state checksum an SQL oracle replays bit-for-bit),
    ``est_pairs`` = Σ_nodes HLL estimate of |reached(u)| with the
    standard small-range linear-counting correction.

    Scale shape (NO driver gate — this is the swap
    :func:`neighborhood_function`'s gate names): state lives as a
    Dataset of (node, regs fixed_size_binary(m)) — O(n·m) sharded,
    never collected; each round is TWO slim hash co-groups (state ⋈
    edges on the giver, then a register-wise-max merge by receiver),
    with per-partition vectorized ``np.maximum.reduceat`` pre-merges.
    Register max is commutative/idempotent, so results are
    bit-identical at any parallelism and reg_sum is strictly
    monotone until the fixpoint (equal sum ⇔ converged).
    """
    import math

    import ray.data  # noqa: F401  (Dataset ops)

    from .agg import _hash_part
    from .graph import _undirected_distinct

    m = 1 << p
    alpha = _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))
    edges = _undirected_distinct(edges_ds, src, dst).materialize()

    def node_partial(b: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(ids, pa.int64())})

    from ray.data.aggregate import Count

    nodes_ds = (edges.map_batches(node_partial, batch_format="pyarrow")
                .groupby("node").aggregate(Count(alias_name="_n")))

    def init_regs(b: pa.Table) -> pa.Table:
        ids = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(ids, pa.int64()),
                         "regs": _fsb_arr(_node_registers(ids, p), m)})

    from .graph import _consolidate

    state = _consolidate(nodes_ds.map_batches(init_regs,
                                              batch_format="pyarrow"),
                         num_partitions)

    def stats_partial(b: pa.Table) -> pa.Table:
        regs = _fsb_np(b["regs"], m)
        s = int(regs.sum(dtype=np.int64))
        pow2 = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
        est = alpha * m * m / pow2
        zeros = (regs == 0).sum(axis=1)
        small = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            lin = m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1),
                                      1.0))
        est = np.where(small, lin, est)
        return pa.table({"reg_sum": pa.array([s], pa.int64()),
                         "est": pa.array([float(est.sum())], pa.float64())})

    def stats_of(st) -> tuple[int, float]:
        rows = st.map_batches(stats_partial,
                              batch_format="pyarrow").take_all()
        return (sum(r["reg_sum"] for r in rows),
                float(sum(r["est"] for r in rows)))

    def tag_state(b: pa.Table) -> pa.Table:
        part = _hash_part(b["node"], num_partitions)
        return pa.table({
            "_part": pa.array(part, pa.int64()),
            "_side": pa.array(np.zeros(len(b), np.int8)),
            "g": b["node"], "rcv": b["node"], "regs": b["regs"]})

    def tag_edges(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        g = np.concatenate([u, v])
        rcv = np.concatenate([v, u])
        part = np.abs(g) % np.int64(num_partitions)
        n = len(g)
        return pa.table({
            "_part": pa.array(part, pa.int64()),
            "_side": pa.array(np.ones(n, np.int8)),
            "g": pa.array(g, pa.int64()),
            "rcv": pa.array(rcv, pa.int64()),
            "regs": pa.nulls(n, pa.binary(m))})

    edges_tagged = edges.map_batches(
        tag_edges, batch_format="pyarrow").materialize()

    def send(t: pa.Table) -> pa.Table:
        st = t.filter(pc.equal(t["_side"], 0))
        ed = t.filter(pc.equal(t["_side"], 1))
        if len(st) == 0 or len(ed) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "regs": pa.array([], pa.binary(m))})
        sn = st["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(sn, kind="stable")
        sn = sn[order]
        sregs = _fsb_np(st["regs"], m)[order]
        g = ed["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        rcv = ed["rcv"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(sn, g)
        gathered = sregs[pos]
        # pre-merge per receiver before the wire
        o = np.argsort(rcv, kind="stable")
        rcv, gathered = rcv[o], gathered[o]
        first = np.ones(len(rcv), bool)
        first[1:] = rcv[1:] != rcv[:-1]
        starts = np.flatnonzero(first)
        merged = np.maximum.reduceat(gathered, starts, axis=0)
        return pa.table({"node": pa.array(rcv[starts], pa.int64()),
                         "regs": _fsb_arr(merged, m)})

    def merge(t: pa.Table) -> pa.Table:
        n_ = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        regs = _fsb_np(t["regs"], m)
        o = np.argsort(n_, kind="stable")
        n_, regs = n_[o], regs[o]
        first = np.ones(len(n_), bool)
        first[1:] = n_[1:] != n_[:-1]
        starts = np.flatnonzero(first)
        merged = np.maximum.reduceat(regs, starts, axis=0)
        return pa.table({"node": pa.array(n_[starts], pa.int64()),
                         "regs": _fsb_arr(merged, m)})

    reg_sum, est = stats_of(state)
    out = [(0, reg_sum, est)]
    for r in range(1, max_r + 1):
        tagged = state.map_batches(tag_state, batch_format="pyarrow")
        msgs = (tagged.union(edges_tagged)
                .groupby("_part")
                .map_groups(send, batch_format="pyarrow"))

        def part_by_node(b: pa.Table) -> pa.Table:
            part = _hash_part(b["node"], num_partitions)
            return b.append_column("_part", pa.array(part, pa.int64()))

        # iterated state: consolidate before the next round consumes
        # it (graph._consolidate — map_groups' empty-schema blocks
        # degrade re-consumption catastrophically; this loop went
        # 187 s → seconds at sf0.1 when consolidated)
        new_state = _consolidate(
            msgs.union(state)
            .map_batches(part_by_node, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(lambda t: merge(t.drop_columns(["_part"])),
                        batch_format="pyarrow"), num_partitions)
        state = new_state
        new_sum, new_est = stats_of(state)
        out.append((r, new_sum, new_est))
        if new_sum == reg_sum:
            out.extend((rr, new_sum, new_est)
                       for rr in range(r + 1, max_r + 1))
            break
        reg_sum = new_sum
    df = pd.DataFrame(out, columns=["r", "reg_sum", "est_pairs"])
    df["r"] = df["r"].astype("int64")
    df["reg_sum"] = df["reg_sum"].astype("int64")
    return df
