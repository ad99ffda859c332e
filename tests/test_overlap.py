"""keyed_set_overlap: exact intersections, diagonal sizes, partition
invariance, non-dimension gate."""

import pyarrow as pa
import pytest
import ray.data as rd

from xtract.ops.overlap import keyed_set_overlap, overlap_matrix


def _ds(rows, blocks=1):
    ds = rd.from_arrow(pa.table({
        "k": [r[0] for r in rows], "v": [r[1] for r in rows]}))
    return ds.repartition(blocks) if blocks > 1 else ds


ROWS = ([("a", i) for i in range(10)] +
        [("b", i) for i in range(5, 15)] +     # |a∩b| = 5
        [("c", 0), ("c", 100)] +               # |a∩c| = 1, |b∩c| = 0
        [("a", 3), ("b", 7)])                  # duplicates, no effect


def test_exact_counts_and_sizes(ray_session):
    out = overlap_matrix(keyed_set_overlap(_ds(ROWS), "k", "v"))
    m = {(r.key_a, r.key_b): (r.inter, r.union_n, r.jaccard_milli)
         for r in out.itertuples()}
    assert m[("a", "b")] == (5, 15, 333)
    assert m[("a", "c")] == (1, 11, 90)
    assert ("b", "c") not in m  # empty intersections don't emit


def test_partition_invariance(ray_session):
    a = overlap_matrix(keyed_set_overlap(_ds(ROWS), "k", "v"))
    b = overlap_matrix(keyed_set_overlap(_ds(ROWS, 9), "k", "v",
                                         num_partitions=7))
    assert a.equals(b)


def test_max_keys_gate(ray_session):
    rows = [(f"k{i}", 1) for i in range(30)]
    with pytest.raises(Exception, match="dimension-like"):
        keyed_set_overlap(_ds(rows), "k", "v", num_partitions=1,
                          max_keys=10).to_pandas()
