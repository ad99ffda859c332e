"""Property tests: graph/join ops vs brute-force pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xtract.ops.graph import snapshot_diff
from xtract.ops.joins import bloom_semi_join

_slow = settings(max_examples=10, deadline=None,
                 suppress_health_check=list(HealthCheck))


@_slow
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 3)),
                min_size=0, max_size=60),
       st.lists(st.tuples(st.integers(0, 30), st.integers(0, 3)),
                min_size=0, max_size=60))
def test_snapshot_diff_matches_set_logic(ray_session, old_rows, new_rows):
    # unique keys per snapshot: last write wins in the reference dict
    old = {f"u{k}": f"d{v}" for k, v in old_rows}
    new = {f"u{k}": f"d{v}" for k, v in new_rows}
    if not old and not new:
        return
    old_ds = rd.from_arrow(pa.table({
        "url": pa.array(list(old) or [], pa.string()),
        "digest": pa.array(list(old.values()) or [], pa.string())}))
    new_ds = rd.from_arrow(pa.table({
        "url": pa.array(list(new) or [], pa.string()),
        "digest": pa.array(list(new.values()) or [], pa.string())}))
    got = dict(zip(*[snapshot_diff(old_ds, new_ds, num_partitions=4)
                     .to_pandas()[c] for c in ("url", "status")]))
    for u in set(old) | set(new):
        if u not in old:
            want = "added"
        elif u not in new:
            want = "removed"
        elif old[u] == new[u]:
            want = "unchanged"
        else:
            want = "changed"
        assert got[u] == want, u


@_slow
@given(st.lists(st.integers(0, 40), min_size=1, max_size=80),
       st.lists(st.integers(0, 40), min_size=0, max_size=20),
       st.booleans())
def test_bloom_join_matches_pandas(ray_session, lkeys, rkeys, anti):
    left = rd.from_arrow(pa.table({
        "k": pa.array(lkeys, pa.int64()),
        "i": pa.array(range(len(lkeys)), pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array(rkeys, pa.int64())}))
    got = bloom_semi_join(left, right, "k", anti=anti, p_bits=10,
                          num_partitions=3).to_pandas()
    ldf = pd.DataFrame({"k": lkeys, "i": range(len(lkeys))})
    member = ldf["k"].isin(set(rkeys))
    want = ldf[~member if anti else member] \
        .sort_values(["k", "i"]).reset_index(drop=True)
    if len(want) == 0 or len(got) == 0:
        # empty Ray results can drop their schema — compare counts only
        assert len(want) == len(got)
        return
    got = got.sort_values(["k", "i"]).reset_index(drop=True)
    assert got.equals(want)
