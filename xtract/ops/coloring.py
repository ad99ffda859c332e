"""Distributed graph coloring by iterated Luby MIS layers: color 1 is
a maximal independent set of the whole graph, color 2 an MIS of what
remains, and so on (Luby 1986 / Jones–Plassmann line, public methods).
No two adjacent nodes share a color, so each color class is a
conflict-free batch — the crawl-tier use is scheduling host fetch
waves such that directly-linked (same-infrastructure / mirror) hosts
never land in the same wave.

Deterministic end to end: round priorities come from ``_luby_pri`` at
a globally unique round index (color−1)·64 + round, so the whole
layering is bit-identical at any parallelism and replays in SQL as
nested unrolled Luby rounds through the shared mix64 CTE chain.

State shape: the uncolored/active sets are sorted driver arrays behind
an exact-count ``broadcast_limit`` gate (the `bfs_depth` placement);
every per-round pass is a distributed edge scan emitting ≤1 slim row
per (block, node).

Reference parity anchor: tesseract-rs has no graph surface
(src/api.rs — documents independent); extends the
`maximal_independent_set`/`label_propagation` crawl-graph tier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def mis_coloring(edges_ds, src: str = "src", dst: str = "dst",
                 max_colors: int = 64, max_rounds: int = 64,
                 broadcast_limit: int = 2_000_000):
    """→ Dataset(node:int64, color:int64 ≥ 1) for every edge endpoint;
    adjacent nodes always differ.  Fail-loud at ``max_colors`` /
    ``max_rounds`` (expected O(Δ) colors, O(log n) rounds each)."""
    import ray

    from .graph import _luby_pri, _member, _undirected_distinct

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
    if len(nodes) > broadcast_limit:
        raise ValueError(
            f"mis_coloring: {len(nodes)} nodes exceed broadcast_limit "
            f"{broadcast_limit}")
    uncolored = nodes.copy()
    color = np.zeros(len(nodes), np.int64)

    for c in range(1, max_colors + 1):
        if not len(uncolored):
            break
        active = uncolored.copy()
        mis_parts = []
        for r in range(1, max_rounds + 1):
            if not len(active):
                break
            rg = (c - 1) * 64 + r
            act_ref = ray.put(active)

            def min_nbr(t: pa.Table, _a=act_ref, _r=rg) -> pa.Table:
                act = ray.get(_a)
                u = t["u"].to_numpy(zero_copy_only=False)
                v = t["v"].to_numpy(zero_copy_only=False)
                both = _member(act, u) & _member(act, v)
                u, v = u[both], v[both]
                nd = np.concatenate([u, v])
                npri = np.concatenate(
                    [_luby_pri(v, _r), _luby_pri(u, _r)])
                if not len(nd):
                    return pa.table({
                        "node": pa.array([], pa.int64()),
                        "mn": pa.array([], pa.uint64())})
                o = np.lexsort((npri, nd))
                n2, p2 = nd[o], npri[o]
                first = np.ones(len(n2), bool)
                first[1:] = n2[1:] != n2[:-1]
                return pa.table({
                    "node": pa.array(n2[first], pa.int64()),
                    "mn": pa.array(p2[first], pa.uint64())})

            got = (edges.map_batches(min_nbr, batch_format="pyarrow",
                                     batch_size=262_144).to_pandas())
            mn = np.full(len(active), np.iinfo(np.uint64).max,
                         np.uint64)
            if len(got):
                gn = got["node"].to_numpy(np.int64)
                gp = got["mn"].to_numpy(np.uint64)
                o = np.lexsort((gp, gn))
                gn, gp = gn[o], gp[o]
                first = np.ones(len(gn), bool)
                first[1:] = gn[1:] != gn[:-1]
                gn, gp = gn[first], gp[first]
                mn[np.searchsorted(active, gn)] = gp
            joiners = active[_luby_pri(active, rg) < mn]
            mis_parts.append(joiners)
            j_ref = ray.put(joiners)

            def nbrs(t: pa.Table, _j=j_ref, _a=act_ref) -> pa.Table:
                J = ray.get(_j)
                act = ray.get(_a)
                u = t["u"].to_numpy(zero_copy_only=False)
                v = t["v"].to_numpy(zero_copy_only=False)
                out = np.unique(np.concatenate(
                    [v[_member(J, u) & _member(act, v)],
                     u[_member(J, v) & _member(act, u)]]))
                return pa.table({"node": pa.array(out, pa.int64())})

            nb_rows = (edges.map_batches(nbrs, batch_format="pyarrow",
                                         batch_size=262_144)
                       .take_all())
            nb = (np.unique(np.fromiter(
                (r2["node"] for r2 in nb_rows), np.int64,
                len(nb_rows))) if nb_rows else np.empty(0, np.int64))
            drop = np.union1d(joiners, nb)
            active = active[~_member(drop, active)]
        else:
            raise RuntimeError(
                f"mis_coloring: color {c} MIS not converged within "
                f"{max_rounds} rounds")
        mis = (np.concatenate(mis_parts) if mis_parts
               else np.empty(0, np.int64))
        color[np.searchsorted(nodes, np.sort(mis))] = c
        uncolored = uncolored[~_member(np.sort(mis), uncolored)]
    else:
        if len(uncolored):
            raise RuntimeError(
                f"mis_coloring: not colored within {max_colors} colors")
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "color": pa.array(color, pa.int64())}))
