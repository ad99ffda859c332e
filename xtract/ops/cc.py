"""Distributed connected components by min-label propagation.

The scale path for near-dup clustering (MinHash/SimHash/embedding LSH
produce candidate-pair edge lists; clusters = connected components).
Everything stays in Datasets — no driver-side edge list, no
corpus-cardinality ``to_pandas()``.

Formulated join-free (``Dataset.join`` fails on schema-less empty
partitions in Ray 2.49, and a join per round would be two shuffles
anyway) as a **co-group over coarse hash partitions**:

  adjacency: every edge (a,b) → rows (a→b) and (b→a)
  labels:    node → label (init: own id)
  round:     tag label rows and adjacency rows with
             ``part = node % P``; ``groupby(part)`` co-locates a node's
             label with its outgoing edges; ONE vectorized numpy pass
             per partition (searchsorted label lookup + per-dest
             partial min) emits (dest, label) messages;
             ``groupby(node).aggregate(Min(label))`` combines.
  stop:      Σ labels unchanged (labels only decrease → cheap fixpoint
             check, no diff join)

Per round: two hash-partitioned exchanges over (node:int64,
label/neighbor:int64) rows — no document payloads, no driver state,
and O(P) Python calls instead of O(nodes) (the round-1 per-node
``map_groups`` was the scale bottleneck; this is its vectorized
replacement).  Min-label propagation converges in O(component
diameter) rounds; near-dup components are shallow (stars/cliques), so
few rounds suffice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SENTINEL = np.int64(np.iinfo(np.int64).max)


def _part_of(arr: np.ndarray, num_partitions: int) -> np.ndarray:
    # ids may be any int64; abs-mod keeps the partition id in range
    return np.abs(arr) % np.int64(num_partitions)


def connected_components_ds(edges_ds, num_partitions: int = 8,
                            max_rounds: int = 30, jump_after: int = 3):
    """edges Dataset(a:int64, b:int64) → Dataset(node:int64, label:int64)
    with label = min node id of the component.

    Each round is ONE neighbor min-propagation exchange; from round
    ``jump_after`` on, a pointer-jumping exchange follows (label ←
    label[label], the classic shortcutting step — public
    Shiloach–Vishkin line), so convergence is O(log diameter) rounds,
    not O(diameter): a 4000-node chain converges in ~15 rounds where
    plain propagation needs 4000 (round 4: the old loop silently
    returned UNCONVERGED labels past ``max_rounds`` — 3960 bogus
    components on that chain).  The first ``jump_after`` rounds skip
    the jump so the common shallow case (near-dup stars/cliques,
    which finish in 1–3 rounds) pays nothing extra.  Exhausting
    ``max_rounds`` without reaching the fixpoint now FAILS LOUD.

    The edge list is materialized once at entry — it is consumed every
    round, and without pinning each round would re-execute the whole
    upstream pipeline (e.g. LSH candidate generation)."""
    from ray.data.aggregate import Min, Sum

    adj = edges_ds.map_batches(
        lambda t: pa.table({
            "node": pa.concat_arrays([
                pc.cast(t["a"].combine_chunks(), pa.int64()),
                pc.cast(t["b"].combine_chunks(), pa.int64())]),
            "neighbor": pa.concat_arrays([
                pc.cast(t["b"].combine_chunks(), pa.int64()),
                pc.cast(t["a"].combine_chunks(), pa.int64())]),
        }), batch_format="pyarrow").materialize()
    if adj.count() == 0:
        return adj.map_batches(
            lambda t: pa.table({"node": pa.array([], pa.int64()),
                                "label": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    labels = adj.map_batches(
        lambda t: pa.table({"node": t["node"]}), batch_format="pyarrow"
    ).groupby("node").aggregate(Min("node", alias_name="label")).materialize()
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    # adjacency rows carry label=SENTINEL; label rows carry
    # neighbor=SENTINEL — all-int64 tables union cleanly (no nulls, so
    # numpy views are zero-copy)
    def tag_lbl(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(_part_of(node, num_partitions), pa.int64()),
            "node": t["node"],
            "label": t["label"],
            "neighbor": pa.array(np.full(len(t), _SENTINEL), pa.int64()),
        })

    def tag_adj(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(_part_of(node, num_partitions), pa.int64()),
            "node": t["node"],
            "label": pa.array(np.full(len(t), _SENTINEL), pa.int64()),
            "neighbor": t["neighbor"],
        })

    def propagate_part(g: pa.Table) -> pa.Table:
        """One partition's label + adjacency rows → (dest, label)
        messages, partial-min'd per dest.  Fully vectorized."""
        node = g["node"].to_numpy(zero_copy_only=False)
        label = g["label"].to_numpy(zero_copy_only=False)
        neigh = g["neighbor"].to_numpy(zero_copy_only=False)
        is_lbl = neigh == _SENTINEL
        lbl_nodes = node[is_lbl]
        lbl_vals = label[is_lbl]
        order = np.argsort(lbl_nodes, kind="stable")
        ln, lv = lbl_nodes[order], lbl_vals[order]
        adj_src = node[~is_lbl]
        # every adjacency source has a label row in the same partition
        # (identical part function) → searchsorted lookup is total
        src_lab = lv[np.searchsorted(ln, adj_src)]
        dest = np.concatenate([lbl_nodes, neigh[~is_lbl]])
        labs = np.concatenate([lbl_vals, src_lab])
        # per-dest partial min BEFORE the combine shuffle
        ud, inv = np.unique(dest, return_inverse=True)
        mins = np.full(len(ud), _SENTINEL, np.int64)
        np.minimum.at(mins, inv, labs)
        return pa.table({"node": pa.array(ud, pa.int64()),
                         "label": pa.array(mins, pa.int64())})

    def tag_query(t: pa.Table) -> pa.Table:
        # pointer-jump queries: keyed by the LABEL value, so each query
        # co-locates with the provider row whose node == that label
        # (labels are node ids and every node has a label row)
        lab = t["label"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(_part_of(lab, num_partitions), pa.int64()),
            "node": t["node"],
            "label": pa.array(np.full(len(t), _SENTINEL), pa.int64()),
            "neighbor": t["label"],
        })

    def shortcut_part(g: pa.Table) -> pa.Table:
        """label ← label[label]: providers (node→label) resolve each
        query's current label to that label-node's own label."""
        node = g["node"].to_numpy(zero_copy_only=False)
        label = g["label"].to_numpy(zero_copy_only=False)
        neigh = g["neighbor"].to_numpy(zero_copy_only=False)
        is_prov = neigh == _SENTINEL
        pn, pl = node[is_prov], label[is_prov]
        order = np.argsort(pn, kind="stable")
        pn, pl = pn[order], pl[order]
        qn, ql = node[~is_prov], neigh[~is_prov]
        # total lookup: every queried label id has a provider row here
        new = pl[np.searchsorted(pn, ql)]
        return pa.table({"node": pa.array(qn, pa.int64()),
                         "label": pa.array(new, pa.int64())})

    adj_rows = adj.map_batches(tag_adj, batch_format="pyarrow").materialize()
    converged = False
    for r in range(max_rounds):
        lbl_rows = labels.map_batches(tag_lbl, batch_format="pyarrow")
        msgs = lbl_rows.union(adj_rows).groupby("part").map_groups(
            propagate_part, batch_format="pyarrow")
        labels = msgs.groupby("node").aggregate(
            Min("label", alias_name="label")).materialize()
        if r + 1 >= jump_after:
            # pointer jumping (one co-group; output repartitioned — the
            # iterated-state consolidation discipline, see SCALE.md)
            labels = (labels.map_batches(tag_query,
                                         batch_format="pyarrow")
                      .union(labels.map_batches(tag_lbl,
                                                batch_format="pyarrow"))
                      .groupby("part")
                      .map_groups(shortcut_part, batch_format="pyarrow")
                      .repartition(num_partitions)).materialize()
        new_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if new_sum == prev_sum:  # labels only decrease → fixpoint reached
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components_ds: not converged within "
            f"{max_rounds} rounds (O(log diameter) with pointer "
            f"jumping — raise max_rounds)")
    return labels


def attach_labels(ds, labels_ds, key: str, out_col: str = "cluster_id",
                  default_own_id: bool = True, broadcast_limit: int = 2_000_000,
                  num_partitions: int = 32):
    """→ Dataset(key, out_col): assign each row its component label,
    Dataset-side (the round-1 version pulled every id to the driver).

    Two shapes by label cardinality:

    - **broadcast** (labels ≤ broadcast_limit — the common near-dup
      case: only docs that had a candidate pair carry a label):
      ``ray.put`` two sorted int64 arrays once, ``searchsorted`` lookup
      inside every map_batches task.  No shuffle at all.
    - **co-group** (labels too big to broadcast): tag both sides with
      ``part = id % P`` and resolve inside ``groupby(part)`` with the
      same vectorized searchsorted — one hash exchange of slim int64
      rows, O(P) Python calls.
    """
    import ray

    labels_ds = labels_ds.materialize()
    n_labels = labels_ds.count()
    if n_labels <= broadcast_limit:
        if n_labels == 0:
            # Ray 2.49 empty datasets can drop their schema entirely
            # (to_pandas → zero columns) — short-circuit: every row
            # keeps its own id
            nodes = np.empty(0, np.int64)
            labs = np.empty(0, np.int64)
        else:
            ldf = labels_ds.to_pandas()  # small by check
            nodes = ldf["node"].to_numpy().astype(np.int64)
            labs = ldf["label"].to_numpy().astype(np.int64)
        order = np.argsort(nodes, kind="stable")
        ref = ray.put((nodes[order], labs[order]))

        def assign(t: pa.Table) -> pa.Table:
            sn, sl = ray.get(ref)
            ids = pc.cast(t[key], pa.int64()).to_numpy(zero_copy_only=False)
            out = ids.copy() if default_own_id else np.full(
                len(ids), _SENTINEL, np.int64)
            if len(sn):
                pos = np.searchsorted(sn, ids)
                pos_c = np.minimum(pos, len(sn) - 1)
                hit = sn[pos_c] == ids
                out[hit] = sl[pos_c[hit]]
            return pa.table({key: pa.array(ids, pa.int64()),
                             out_col: pa.array(out, pa.int64())})

        return ds.map_batches(assign, batch_format="pyarrow")

    def tag_ids(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[key], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(_part_of(ids, num_partitions), pa.int64()),
            "id": pa.array(ids, pa.int64()),
            "label": pa.array(np.full(len(ids), _SENTINEL), pa.int64()),
            "is_lbl": pa.array(np.zeros(len(ids), bool)),
        })

    def tag_lbls(t: pa.Table) -> pa.Table:
        ids = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(_part_of(ids, num_partitions), pa.int64()),
            "id": t["node"],
            "label": t["label"],
            "is_lbl": pa.array(np.ones(len(ids), bool)),
        })

    def resolve(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy(zero_copy_only=False)
        labs = g["label"].to_numpy(zero_copy_only=False)
        is_lbl = g["is_lbl"].to_numpy(zero_copy_only=False)
        ln = ids[is_lbl]
        lv = labs[is_lbl]
        order = np.argsort(ln, kind="stable")
        ln, lv = ln[order], lv[order]
        rows = ids[~is_lbl]
        out = rows.copy() if default_own_id else np.full(
            len(rows), _SENTINEL, np.int64)
        if len(ln):
            pos = np.searchsorted(ln, rows)
            pos_c = np.minimum(pos, len(ln) - 1)
            hit = ln[pos_c] == rows
            out[hit] = lv[pos_c[hit]]
        return pa.table({key: pa.array(rows, pa.int64()),
                         out_col: pa.array(out, pa.int64())})

    both = ds.select_columns([key]).map_batches(
        tag_ids, batch_format="pyarrow").union(
        labels_ds.map_batches(tag_lbls, batch_format="pyarrow"))
    return both.groupby("part").map_groups(resolve, batch_format="pyarrow")


def hash_join(left_ds, right_ds, on: str, right_on: str | None = None,
              num_partitions: int = 16, join_type: str = "inner"):
    """Thin wrapper over the native hash-partitioned ``Dataset.join``
    (both sides large — when one side is small, prefer
    ``joins.broadcast_join``).  Caveat observed on Ray 2.49: a partition
    that receives no blocks for one side makes the underlying pyarrow
    join fail — size num_partitions well below the expected distinct-key
    count."""
    return left_ds.join(right_ds, join_type, num_partitions,
                        on=(on,), right_on=((right_on or on),))
