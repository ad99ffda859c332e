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
one an SQL oracle can replay bit-for-bit; the gate names the swap.

Reference parity anchor: tesseract-rs has no graph surface
(src/api.rs — documents independent); this extends the
`pagerank`/`bfs_depth`/`label_propagation` crawl-graph tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

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
            "the HyperANF register swap for crawl-scale graphs")
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
            "the HyperANF register swap for crawl-scale graphs")
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
