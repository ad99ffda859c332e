"""Two-level HRW: resize monotonicity at both levels, balance, and
agreement with a sequential reference."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.bucketed import rendezvous_shard_2level


def _assign(n_groups, spg, n=4000, blocks=1):
    ds = rd.from_arrow(pa.table({"k": np.arange(n, dtype=np.int64)}))
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = rendezvous_shard_2level(ds, "k", n_groups, spg).to_pandas()
    return out.sort_values("k")["shard"].to_numpy()


def test_partition_invariance(ray_session):
    assert (_assign(4, 4) == _assign(4, 4, blocks=9)).all()


def test_balance(ray_session):
    s = _assign(8, 8, n=20_000)
    counts = np.bincount(s, minlength=64)
    assert counts.min() > 0
    assert counts.max() < 3 * counts.mean()


def test_adding_group_only_moves_onto_new_group(ray_session):
    before = _assign(4, 8)
    after = _assign(5, 8)
    moved = before != after
    # every moved key landed on the NEW group's shards [32, 40)
    assert (after[moved] >= 32).all() and (after[moved] < 40).all()
    assert 0.05 < moved.mean() < 0.4  # ~1/5 of keys move


def test_widening_groups_only_moves_within_or_onto_new_members(
        ray_session):
    g, s0, s1 = 4, 4, 6
    before = _assign(g, s0)
    after = _assign(g, s1)
    # map shard ids back to (group, member)
    gb, mb = before // s0, before % s0
    ga, ma = after // s1, after % s1
    # level-1 choice is untouched by widening
    assert (gb == ga).all()
    moved = (mb != ma)
    # moved keys went to a NEW member index (>= old width)
    assert (ma[moved] >= s0).all()
