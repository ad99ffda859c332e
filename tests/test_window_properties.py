"""Property tests: hopping window & interval join vs brute force."""

import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xtract.ops.joins import hopping_window, interval_join_count

_slow = settings(max_examples=8, deadline=None,
                 suppress_health_check=list(HealthCheck))


def _ts_table(us_list):
    return pa.table({"ts": pa.array(us_list, pa.timestamp("us")),
                     "event_id": pa.array(range(len(us_list)), pa.int64())})


@_slow
@given(st.lists(st.integers(0, 10 ** 7), min_size=1, max_size=120))
def test_hopping_window_counts_match_bruteforce(ray_session, us):
    width_min, hop_min = 4, 2
    hop_us = hop_min * 60 * 1_000_000
    k = width_min // hop_min
    ds = rd.from_arrow(_ts_table(us)).repartition(3)
    got = {int(r["window_start"]): int(r["n_events"])
           for r in hopping_window(ds, "ts", width_min, hop_min)
           .to_pandas().to_dict("records")}
    want: dict = {}
    for t in us:
        base = (t // hop_us) * hop_us
        for i in range(k):
            ws = (base - i * hop_us) // 1_000_000
            want[ws] = want.get(ws, 0) + 1
    assert got == want


@_slow
@given(st.lists(st.integers(0, 5 * 10 ** 8), min_size=1, max_size=80),
       st.lists(st.integers(0, 5 * 10 ** 8), min_size=0, max_size=80))
def test_interval_join_count_matches_bruteforce(ray_session, lts, rts):
    width_min = 90  # crosses day buckets when ts spread is large
    width_us = width_min * 60 * 1_000_000
    left = rd.from_arrow(_ts_table(lts)).repartition(2)
    right = rd.from_arrow(pa.table(
        {"ts": pa.array(rts, pa.timestamp("us"))})).repartition(2)
    got = {int(r["event_id"]): int(r["n_matches"])
           for r in interval_join_count(left, "ts", right, "ts",
                                        width_min, ["event_id"])
           .to_pandas().to_dict("records")}
    r = np.asarray(rts, np.int64)
    for i, t in enumerate(lts):
        want = int(((r <= t) & (t < r + width_us)).sum())
        assert got[i] == want, (i, t)


@_slow
@given(st.lists(st.tuples(st.integers(0, 4),          # user_id (few keys)
                          st.integers(0, 10 ** 9)),   # ts µs (dup-prone)
                min_size=1, max_size=120))
def test_lag_lead_gaps_match_bruteforce(ray_session, rows):
    from xtract.ops.joins import lag_lead_gaps

    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([ts for _, ts in rows], pa.timestamp("us")),
        "event_id": pa.array(range(len(rows)), pa.int64()),
    })
    got = {int(r["event_id"]): (r["gap_prev_us"], r["gap_next_us"])
           for r in lag_lead_gaps(rd.from_arrow(t).repartition(3),
                                  "user_id", "ts")
           .to_pandas().to_dict("records")}
    assert len(got) == len(rows)
    per_key: dict = {}
    for eid, (u, ts) in enumerate(rows):
        per_key.setdefault(u, []).append((ts, eid))
    for seq in per_key.values():
        seq.sort()
        for i, (ts, eid) in enumerate(seq):
            prev = ts - seq[i - 1][0] if i > 0 else None
            nxt = seq[i + 1][0] - ts if i + 1 < len(seq) else None
            gp, gn = got[eid]
            gp = None if gp is None or gp != gp else int(gp)
            gn = None if gn is None or gn != gn else int(gn)
            assert (gp, gn) == (prev, nxt), eid


@_slow
@given(st.lists(st.tuples(st.integers(0, 3),                 # user_id
                          st.integers(0, 10 ** 8),           # ts µs
                          st.integers(-10 ** 6, 10 ** 6)),   # cents
                min_size=1, max_size=100))
def test_rolling_window_sum_matches_bruteforce(ray_session, rows):
    from xtract.ops.joins import rolling_window_sum

    k = 4
    t = pa.table({
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "ts": pa.array([ts for _, ts, _ in rows], pa.timestamp("us")),
        "value": pa.array([c / 100.0 for _, _, c in rows], pa.float64()),
        "event_id": pa.array(range(len(rows)), pa.int64()),
    })
    got = {int(r["event_id"]): (int(r["roll_sum_cents"]),
                                int(r["n_in_window"]))
           for r in rolling_window_sum(
               rd.from_arrow(t).repartition(3), "user_id", "ts", "value", k)
           .to_pandas().to_dict("records")}
    assert len(got) == len(rows)
    per_key: dict = {}
    for eid, (u, ts, c) in enumerate(rows):
        per_key.setdefault(u, []).append((ts, eid, c))
    for seq in per_key.values():
        seq.sort()
        for i, (_, eid, _) in enumerate(seq):
            window = seq[max(0, i - k + 1): i + 1]
            want = (sum(int(np.round((c / 100.0) * 100)) for _, _, c in window),
                    len(window))
            assert got[eid] == want, eid


@_slow
@given(st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                          st.sampled_from(["d1", "d2"]),
                          st.integers(-10 ** 6, 10 ** 6)),
                min_size=1, max_size=90),
       st.integers(1, 5))
def test_rollup_counts_matches_bruteforce_any_partitioning(ray_session,
                                                           rows, nparts):
    from xtract.ops.agg import rollup_counts

    t = pa.table({
        "k1": pa.array([a for a, _, _ in rows], pa.string()),
        "k2": pa.array([b for _, b, _ in rows], pa.string()),
        "cents": pa.array([c for _, _, c in rows], pa.int64()),
    })
    out = rollup_counts(rd.from_arrow(t).repartition(nparts),
                        ("k1", "k2"), "cents").to_pandas()
    got = {(r["k1"], r["k2"]): (int(r["n_rows"]), int(r["total_cents"]))
           for r in out.to_dict("records")}
    want: dict = {}
    for a, b, c in rows:
        for key in [(a, b), (a, "ALL"), ("ALL", "ALL")]:
            n, s = want.get(key, (0, 0))
            want[key] = (n + 1, s + c)
    assert got == want


@_slow
@given(st.lists(st.tuples(st.integers(0, 5),                # user
                          st.integers(0, 10 ** 7),          # ts µs
                          st.sampled_from(["a", "b", "c", "x"])),
                min_size=1, max_size=120),
       st.integers(1, 4))
def test_funnel_counts_match_bruteforce(ray_session, rows, nparts):
    from xtract.ops.behavior import funnel_counts

    steps = ("a", "b", "c")
    t = pa.table({
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "ts": pa.array([ts for _, ts, _ in rows], pa.timestamp("us")),
        "event_type": pa.array([e for _, _, e in rows], pa.string()),
    })
    out = funnel_counts(rd.from_arrow(t).repartition(nparts),
                        "user_id", "ts", steps).to_pandas()
    got = {int(r["step"]): int(r["n_users"]) for r in out.to_dict("records")}
    want = {1: 0, 2: 0, 3: 0}
    for u in set(r[0] for r in rows):
        evs = sorted((ts, e) for uu, ts, e in rows if uu == u)
        reach = None
        for i, s in enumerate(steps):
            cand = [ts for ts, e in evs
                    if e == s and (reach is None or ts > reach)]
            if not cand:
                break
            reach = min(cand)
            want[i + 1] += 1
    assert got == want


@_slow
@given(st.lists(st.tuples(st.integers(0, 2),                 # user (dup-heavy)
                          st.integers(0, 500),               # ts µs small → peers
                          st.integers(-10 ** 4, 10 ** 4)),
                min_size=1, max_size=80))
def test_range_window_sum_matches_bruteforce(ray_session, rows):
    from xtract.ops.joins import range_window_sum

    w_min = 1  # 60e6 µs — with ts ≤ 500 everything is in range; also
    # exercise the tight case below with width scaled to data
    t = pa.table({
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "ts": pa.array([ts for _, ts, _ in rows], pa.timestamp("us")),
        "value": pa.array([c / 100.0 for _, _, c in rows], pa.float64()),
        "event_id": pa.array(range(len(rows)), pa.int64()),
    })
    got = {int(r["event_id"]): (int(r["range_sum_cents"]),
                                int(r["n_in_range"]))
           for r in range_window_sum(rd.from_arrow(t).repartition(3),
                                     "user_id", "ts", "value", w_min)
           .to_pandas().to_dict("records")}
    w_us = w_min * 60 * 1_000_000
    for eid, (u, ts, c) in enumerate(rows):
        in_frame = [cc for uu, tt, cc in rows
                    if uu == u and ts - w_us <= tt <= ts]
        want = (sum(int(np.round((cc / 100.0) * 100)) for cc in in_frame),
                len(in_frame))
        assert got[eid] == want, eid


@_slow
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(0, 10 ** 9),            # wide ts
                          st.integers(-10 ** 4, 10 ** 4)),
                min_size=1, max_size=80))
def test_range_window_sum_tight_width(ray_session, rows):
    from xtract.ops.joins import range_window_sum

    t = pa.table({
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "ts": pa.array([ts for _, ts, _ in rows], pa.timestamp("us")),
        "value": pa.array([c / 100.0 for _, _, c in rows], pa.float64()),
        "event_id": pa.array(range(len(rows)), pa.int64()),
    })
    w_min = 2  # 120e6 µs against a 1e9 µs spread → partial frames
    got = {int(r["event_id"]): (int(r["range_sum_cents"]),
                                int(r["n_in_range"]))
           for r in range_window_sum(rd.from_arrow(t).repartition(4),
                                     "user_id", "ts", "value", w_min)
           .to_pandas().to_dict("records")}
    w_us = w_min * 60 * 1_000_000
    for eid, (u, ts, c) in enumerate(rows):
        in_frame = [cc for uu, tt, cc in rows
                    if uu == u and ts - w_us <= tt <= ts]
        want = (sum(int(np.round((cc / 100.0) * 100)) for cc in in_frame),
                len(in_frame))
        assert got[eid] == want, eid


@_slow
@given(st.lists(st.tuples(st.integers(0, 4), st.integers(0, 10 ** 6)),
                min_size=1, max_size=60),
       st.integers(1, 6))
def test_ranked_ntile_matches_sql_semantics(ray_session, rows, k):
    from xtract.ops.joins import ranked_ntile

    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([ts for _, ts in rows], pa.timestamp("us")),
        "event_id": pa.array(range(len(rows)), pa.int64()),
    })
    got = {int(r["event_id"]): (int(r["rank"]), int(r["tile"]))
           for r in ranked_ntile(rd.from_arrow(t).repartition(3),
                                 "user_id", "ts", n_tiles=k)
           .to_pandas().to_dict("records")}
    per_key: dict = {}
    for eid, (u, ts) in enumerate(rows):
        per_key.setdefault(u, []).append((ts, eid))
    for seq in per_key.values():
        seq.sort()
        n = len(seq)
        size, rem = divmod(n, k)
        # SQL NTILE: first `rem` tiles have size+1 rows
        tiles = []
        for tile_i in range(1, k + 1):
            tiles.extend([tile_i] * (size + (1 if tile_i <= rem else 0)))
        for i, (_, eid) in enumerate(seq):
            assert got[eid] == (i + 1, tiles[i]), (eid, n, k)


def test_cogroup_windows_hot_key_stress(ray_session):
    """ONE key owning every row (the documented worst case for the
    coarse co-group partitioning): 60k events for a single user must
    flow through the row-window, range-window, ntile, and lag/lead
    kernels without quadratic blowup — spot-check exact values."""
    import numpy as np

    from xtract.ops.joins import (lag_lead_gaps, range_window_sum,
                                  ranked_ntile, rolling_window_sum)

    n = 60_000
    t = pa.table({
        "user_id": pa.array(np.zeros(n, np.int64)),
        "ts": pa.array((np.arange(n, dtype=np.int64) * 1_000_000)
                       .view("datetime64[us]")),
        "value": pa.array(np.ones(n)),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
    })
    ds = rd.from_arrow(t).repartition(8)

    roll = rolling_window_sum(ds, "user_id", "ts", "value", 10).to_pandas()
    assert len(roll) == n
    byid = roll.set_index("event_id")
    assert int(byid.loc[0, "roll_sum_cents"]) == 100
    assert int(byid.loc[n - 1, "roll_sum_cents"]) == 1000

    # 1 event/sec, 1-minute range frame → 61 rows in-frame mid-stream
    rng_w = range_window_sum(ds, "user_id", "ts", "value", 1).to_pandas()
    byid = rng_w.set_index("event_id")
    assert int(byid.loc[n - 1, "n_in_range"]) == 61

    nt = ranked_ntile(ds, "user_id", "ts", n_tiles=4).to_pandas()
    assert int(nt["tile"].max()) == 4
    assert (nt.groupby("tile").size() == n // 4).all()

    gaps = lag_lead_gaps(ds, "user_id", "ts").to_pandas()
    mid = gaps.set_index("event_id").loc[1000]
    assert int(mid["gap_prev_us"]) == 1_000_000
