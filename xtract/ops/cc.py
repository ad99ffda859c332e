"""Distributed connected components by min-label propagation.

The scale path for near-dup clustering (MinHash/SimHash/embedding LSH
produce candidate-pair edge lists; clusters = connected components).
The driver-side union-find in dedup.py is right when the edge list is
provably small; THIS version keeps everything in Datasets.

Formulated as a co-group (NO ``Dataset.join`` — pyarrow's hash join
fails on schema-less empty partitions in Ray 2.49, and a join per round
would be two shuffles anyway):

  adjacency: every edge (a,b) → messages (a→b) and (b→a)
  labels:    node → label (init: own id)
  round:     groupby(node) over (labels ∪ adjacency): take the node's
             current label, forward it to every neighbour; then
             groupby(node).min(label)
  stop:      Σ labels unchanged (labels only decrease → cheap fixpoint
             check, no diff join)

Each round = two hash-partitioned groupbys over (node, label/neighbor)
int rows — no document payloads, no driver state.  Min-label
propagation converges in O(component diameter) rounds; near-dup
components are shallow (stars/cliques), so few rounds suffice.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def connected_components_ds(edges_ds, num_partitions: int = 8,
                            max_rounds: int = 10):
    """edges Dataset(a:int64, b:int64) → Dataset(node:int64, label:int64)
    with label = min node id of the component.

    The edge list is materialized once at entry — it is consumed every
    round, and without pinning each round would re-execute the whole
    upstream pipeline (e.g. LSH candidate generation)."""
    from ray.data.aggregate import Min, Sum

    adj = edges_ds.map_batches(
        lambda t: pa.table({
            "node": pa.concat_arrays([t["a"].combine_chunks(),
                                      t["b"].combine_chunks()]),
            "neighbor": pa.concat_arrays([t["b"].combine_chunks(),
                                          t["a"].combine_chunks()]),
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

    def propagate(g: pa.Table) -> pa.Table:
        # group = one node's label row(s) + its adjacency rows
        lbl = pc.min(g["label"]).as_py()
        node = g["node"][0].as_py()
        neigh = g["neighbor"].drop_null()
        out_nodes = [node] + neigh.to_pylist()
        return pa.table({"node": pa.array(out_nodes, pa.int64()),
                         "label": pa.array([lbl] * len(out_nodes), pa.int64())})

    for _ in range(max_rounds):
        lbl_rows = labels.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "label": t["label"],
                "neighbor": pa.nulls(len(t), pa.int64()),
            }), batch_format="pyarrow")
        adj_rows = adj.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "label": pa.nulls(len(t), pa.int64()),
                "neighbor": t["neighbor"],
            }), batch_format="pyarrow")
        msgs = lbl_rows.union(adj_rows).groupby("node").map_groups(
            propagate, batch_format="pyarrow")
        labels = msgs.groupby("node").aggregate(
            Min("label", alias_name="label")).materialize()
        new_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if new_sum == prev_sum:  # labels only decrease → fixpoint reached
            break
        prev_sum = new_sum
    return labels


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
