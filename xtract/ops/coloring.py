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
                 broadcast_limit: int = 2_000_000,
                 distributed: bool = False,
                 num_partitions: int = 32, on_gate: str = "auto"):
    """→ Dataset(node:int64, color:int64 ≥ 1) for every edge endpoint;
    adjacent nodes always differ.  Fail-loud at ``max_colors`` /
    ``max_rounds`` (expected O(Δ) colors, O(log n) rounds each).

    ``distributed=True`` routes each color layer through the
    Dataset-state Luby MIS (`ops/graph._mis_distributed` with
    round_offset (c−1)·64 over the still-uncolored node set) —
    nothing node-proportional on the driver, bit-identical colors to
    the broadcast mode (same priorities, same layer order); use it
    past ``broadcast_limit`` (web-scale host graphs exceed 2M nodes
    routinely)."""
    import ray

    from .graph import _luby_pri, _member, _undirected_distinct

    edges = _undirected_distinct(edges_ds, src, dst)
    if distributed:
        return _mis_coloring_distributed(edges, max_colors, max_rounds,
                                         num_partitions)

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
        from .graph import _gate
        _gate("mis_coloring", f"{len(nodes)} nodes exceed "
              f"broadcast_limit {broadcast_limit}", on_gate)
        return _mis_coloring_distributed(edges, max_colors, max_rounds,
                                         num_partitions)
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


def _mis_coloring_distributed(edges, max_colors: int, max_rounds: int,
                              num_partitions: int):
    """Dataset-state MIS layering: color c = one
    `graph._mis_distributed` run at round_offset (c−1)·64 over the
    still-uncolored node set (so priorities — and therefore colors —
    are bit-identical to the broadcast mode), then one slim hash
    co-group anti-join drops the new color class from the uncolored
    set.  The tagged edge table materializes ONCE and is reused by
    every layer.  Driver state: per-color exact counts only."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    from .graph import (_consolidate, _member, _mis_distributed,
                        _mis_tag_edges)

    P = np.int64(num_partitions)
    edges_tagged = _mis_tag_edges(edges, num_partitions)

    def node_partial(b: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(ids, pa.int64())})

    uncolored = _consolidate(
        edges.map_batches(node_partial, batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="_n"))
        .select_columns(["node"]), num_partitions)

    def tag_nodes(t: pa.Table, side: int) -> pa.Table:
        n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "_part": pa.array(np.abs(n) % P, pa.int64()),
            "_side": pa.array(np.full(len(n), side, np.int8)),
            "node": pa.array(n, pa.int64())})

    def anti(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.equal(t["_side"], 0))
        drop = t.filter(pc.equal(t["_side"], 1))
        k = keep["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.sort(np.unique(
            drop["node"].to_numpy(zero_copy_only=False)
            .astype(np.int64)))
        return pa.table({"node": pa.array(k[~_member(d, k)],
                                          pa.int64())})

    colored_parts: list = []
    for c in range(1, max_colors + 1):
        if uncolored.count() == 0:
            break
        mis = _mis_distributed(edges, max_rounds, num_partitions,
                               round_offset=(c - 1) * 64,
                               nodes_ds=uncolored,
                               edges_tagged=edges_tagged)
        members = _consolidate(mis.map_batches(
            lambda t: t.filter(pc.equal(t["in_mis"], 1))
            .select(["node"]), batch_format="pyarrow"), num_partitions)
        colored_parts.append(members.map_batches(
            lambda t, _c=c: pa.table({
                "node": t["node"],
                "color": pa.array(np.full(len(t), _c, np.int64))}),
            batch_format="pyarrow").materialize())
        # iterated state: consolidate before the next layer consumes
        # it (see graph._consolidate — map_groups' empty-schema blocks
        # degrade re-consumption catastrophically)
        uncolored = _consolidate(uncolored.map_batches(
            lambda b: tag_nodes(b, 0), batch_format="pyarrow")
            .union(members.map_batches(
                lambda b: tag_nodes(b, 1), batch_format="pyarrow"))
            .groupby("_part")
            .map_groups(anti, batch_format="pyarrow"), num_partitions)
    else:
        if uncolored.count():
            raise RuntimeError(
                f"mis_coloring: not colored within {max_colors} "
                f"colors")

    if not colored_parts:  # empty graph
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "color": pa.array([], pa.int64())}))
    out = colored_parts[0]
    for extra in colored_parts[1:]:
        out = out.union(extra)
    return out.sort("node")
