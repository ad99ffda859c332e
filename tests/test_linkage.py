"""Deletion-neighborhood edit-distance self-join: completeness vs the
n² reference, partition invariance, gates."""

import itertools

import pyarrow as pa
import pytest
import ray.data as rd

from xtract.ops.fuzzy import levenshtein
from xtract.ops.linkage import (_deletion_variants,
                                deletion_neighborhood_pairs)

WORDS = ["red bolt", "old bolt", "red bolts", "blue gear", "blue bear",
         "xylophone", "red colt", "", "a", "ab"]


def _ds(blocks=1):
    t = pa.table({"id": list(range(len(WORDS))), "s": WORDS})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _reference(max_dist):
    out = []
    for (i, a), (j, b) in itertools.combinations(enumerate(WORDS), 2):
        d = levenshtein(a, b)
        if d <= max_dist:
            out.append((i, j, d))
    return sorted(out)


def test_variants_include_self_and_deletions():
    v = _deletion_variants("abc", 2)
    assert v == {"abc", "ab", "ac", "bc", "a", "b", "c"}


@pytest.mark.parametrize("max_dist", [1, 2])
def test_matches_full_quadratic_reference(ray_session, max_dist):
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in deletion_neighborhood_pairs(
            _ds(), "id", "s", max_dist=max_dist).take_all())
    assert got == _reference(max_dist)


def test_partition_invariance(ray_session):
    a = sorted(map(tuple, (r.values() for r in
               deletion_neighborhood_pairs(_ds(), "id", "s", 2)
               .take_all())))
    b = sorted(map(tuple, (r.values() for r in
               deletion_neighborhood_pairs(_ds(5), "id", "s", 2,
                                           num_partitions=7)
               .take_all())))
    assert a == b


def test_hot_variant_gate(ray_session):
    rows = pa.table({"id": list(range(40)),
                     "s": [f"x{i}" for i in range(40)]})
    # every "x?" string deletes to "x" — a shared variant of size 40
    with pytest.raises(Exception, match="variant is shared"):
        deletion_neighborhood_pairs(
            rd.from_arrow(rows), "id", "s", max_dist=1,
            num_partitions=1, max_group=10).take_all()
