"""Global prefix-scan watermark tagging: sequential-reference
agreement, partition invariance, first-event and underflow edges."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.streaming import tag_late_events


def _reference(order, us, lateness):
    idx = np.argsort(order)
    run = None
    late = np.zeros(len(us), np.int64)
    for i in idx:
        if run is not None and us[i] < run - lateness:
            late[i] = 1
        run = us[i] if run is None else max(run, us[i])
    return late


def _run(order, us, lateness, blocks=1):
    t = pa.table({"o": order.astype(np.int64),
                  "ts": pa.array(us.astype("datetime64[us]"),
                                 pa.timestamp("us"))})
    ds = rd.from_arrow(t)
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = tag_late_events(ds, "o", "ts", lateness).to_pandas()
    out = out.sort_values("o")
    return out["late"].to_numpy(np.int64)


def test_matches_sequential_reference(ray_session):
    rng = np.random.RandomState(9)
    n = 2000
    order = rng.permutation(n)
    us = rng.randint(0, 10**9, n)
    for blocks in (1, 13):
        got = _run(order, us, 10**6, blocks=blocks)
        want = _reference(order, us, 10**6)
        # got is ordered by `o`; reference indexed by row → align
        assert (got == want[np.argsort(order)]).all()


def test_first_event_never_late(ray_session):
    order = np.array([5, 1, 9])
    us = np.array([0, 10**15, 1])  # arrival: o=1 first (huge ts)
    late = _run(order, us, 0)
    # rows come back ordered by o: o=1 is the first arrival → not late
    assert late[0] == 0
    # o=5 (ts 0) arrives after the huge ts → late
    assert late[1] == 1


def test_monotone_stream_has_no_late(ray_session):
    n = 500
    order = np.arange(n)
    us = np.arange(n) * 1000
    assert _run(order, us, 0).sum() == 0
