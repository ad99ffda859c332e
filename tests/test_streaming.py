"""Streaming watermark window (ops/streaming) + full-outer co-group
join (ops/joins) — the round-3 session-8 additions."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ev(ts_s, keys, vals):
    return pa.table({
        "ts": pa.array([int(t) * 1_000_000 for t in ts_s],
                       pa.timestamp("us")),
        "k": pa.array(keys, pa.string()),
        "v": pa.array(vals, pa.float64())})


def test_stream_window_matches_batch_groupby(ray_session):
    from xtract.ops.streaming import stream_window_aggregate

    rng = np.random.default_rng(7)
    n = 5_000
    ts = rng.integers(0, 50_000, n)          # ~14 hourly windows at 3600s
    keys = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    vals = rng.normal(10.0, 3.0, n)
    t = _ev(ts, keys.tolist(), vals)
    batches = [t.slice(i, 500) for i in range(0, n, 500)]

    out, stats = stream_window_aggregate(
        batches, ts_col="ts", key_col="k", val_col="v",
        width_s=3600, lateness_s=10 ** 9, n_shards=3)
    assert stats["n_late"] == 0

    got = (out.to_pandas()
           .sort_values(["window_start_us", "key"]).reset_index(drop=True))
    want = (pd.DataFrame({"w": (ts.astype(np.int64) * 1_000_000
                                // 3_600_000_000) * 3_600_000_000,
                          "k": keys, "v": vals})
            .groupby(["w", "k"], as_index=False)
            .agg(n_events=("v", "size"), value_sum=("v", "sum"))
            .sort_values(["w", "k"]).reset_index(drop=True))
    assert got["window_start_us"].tolist() == want["w"].tolist()
    assert got["key"].tolist() == want["k"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    np.testing.assert_allclose(got["value_sum"], want["value_sum"],
                               rtol=1e-12)


def test_stream_window_drops_too_late(ray_session):
    from xtract.ops.streaming import stream_window_aggregate

    # width 60s, zero lateness: batch1 advances the watermark to 120,
    # closing [0,60) and [60,120); batch2's ts=30 is too late (dropped),
    # ts=130 lands in the open [120,180) window.
    b1 = _ev([5, 50, 70, 120], ["a"] * 4, [1.0, 2.0, 3.0, 4.0])
    b2 = _ev([30, 130], ["a", "a"], [9.0, 5.0])
    out, stats = stream_window_aggregate(
        [b1, b2], ts_col="ts", key_col="k", val_col="v",
        width_s=60, lateness_s=0, n_shards=1)
    assert stats["n_late"] == 1
    d = {r["window_start_us"] // 1_000_000: (r["n_events"], r["value_sum"])
         for r in out.to_pylist()}
    assert d == {0: (2, 3.0), 60: (1, 3.0), 120: (2, 9.0)}


def test_stream_window_late_within_allowance_included(ray_session):
    from xtract.ops.streaming import stream_window_aggregate

    # max ts 119 with 60s allowance → watermark 59: [0,60) still open,
    # so the out-of-order ts=30 in batch2 is INCLUDED.
    b1 = _ev([5, 119], ["a", "a"], [1.0, 2.0])
    b2 = _ev([30], ["a"], [10.0])
    out, stats = stream_window_aggregate(
        [b1, b2], ts_col="ts", key_col="k", val_col="v",
        width_s=60, lateness_s=60, n_shards=1)
    assert stats["n_late"] == 0
    d = {r["window_start_us"] // 1_000_000: (r["n_events"], r["value_sum"])
         for r in out.to_pylist()}
    assert d == {0: (2, 11.0), 60: (1, 2.0)}


def test_stream_window_state_stays_bounded(ray_session):
    import ray

    from xtract.ops.streaming import _WindowShard

    # 1,000 sequential hourly windows, zero lateness: open-window state
    # must stay O(1) per key, never O(windows seen).
    Shard = ray.remote(_WindowShard)
    a = Shard.remote(3_600_000_000, 0)
    peak = 0
    for h in range(1_000):
        t = pa.table({"_ts": pa.array([h * 3_600_000_000 + 10], pa.int64()),
                      "_key": pa.array(["k"], pa.string()),
                      "_val": pa.array([1.0], pa.float64())})
        peak = max(peak, ray.get(a.ingest.remote(t)))
    assert peak <= 2
    tbl, n_late, n_dup = ray.get(a.flush.remote())
    assert n_late == 0 and n_dup == 0
    assert tbl.num_rows == 1_000
    ray.kill(a)


def test_stream_window_empty_shard_schema(ray_session):
    from xtract.ops.streaming import stream_window_aggregate

    # one key, 4 shards: 3 shards never see data; concat must still work
    b = _ev([10, 20], ["only", "only"], [1.0, 2.0])
    out, stats = stream_window_aggregate(
        [b], ts_col="ts", key_col="k", val_col="v",
        width_s=60, lateness_s=0, n_shards=4)
    assert stats["n_late"] == 0 and out.num_rows == 1
    assert out["key"].type == pa.string()


def test_equi_join_cogroup_full_outer_matches_pandas(ray_session):
    import ray.data as rd

    from xtract.ops.joins import equi_join_cogroup

    left = pd.DataFrame({"k": [1, 2, 3, 5], "lx": [10, 20, 30, 50]})
    right = pd.DataFrame({"rk": [2, 3, 4, 6], "ry": [200, 300, 400, 600]})
    got = (equi_join_cogroup(rd.from_pandas(left).repartition(2),
                             rd.from_pandas(right).repartition(2),
                             on="k", right_on="rk", how="outer",
                             num_partitions=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (left.merge(right.rename(columns={"rk": "k"}), how="outer",
                       on="k").sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == want["k"].tolist()
    assert got["lx"].astype("float").where(got["lx"].notna()).tolist() \
        == pytest.approx(want["lx"].tolist(), nan_ok=True)
    assert got["ry"].astype("float").where(got["ry"].notna()).tolist() \
        == pytest.approx(want["ry"].tolist(), nan_ok=True)
    # unmatched rows exist on BOTH sides and ints stayed nullable ints
    assert got["lx"].isna().sum() == 2 and got["ry"].isna().sum() == 2
    assert str(got["lx"].dtype) == "Int64"
    assert str(got["ry"].dtype) == "Int64"


def test_equi_join_cogroup_outer_keeps_64bit_keys(ray_session):
    import ray.data as rd

    from xtract.ops.joins import equi_join_cogroup

    big = 2 ** 60
    left = pd.DataFrame({"k": [big, big + 2], "lx": [1, 2]})
    right = pd.DataFrame({"rk": [big + 2, big + 4], "ry": [3, 4]})
    got = (equi_join_cogroup(rd.from_pandas(left), rd.from_pandas(right),
                             on="k", right_on="rk", how="outer",
                             num_partitions=2)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # 2^60 and 2^60+2 collide if the key round-trips through float64
    assert got["k"].tolist() == [big, big + 2, big + 4]


def test_stream_window_exactly_once_dedup(ray_session):
    from xtract.ops.streaming import stream_window_aggregate

    def _evi(ts_s, ids, vals):
        return pa.table({
            "ts": pa.array([int(t) * 1_000_000 for t in ts_s],
                           pa.timestamp("us")),
            "id": pa.array(ids, pa.int64()),
            "k": pa.array(["a"] * len(ids), pa.string()),
            "v": pa.array(vals, pa.float64())})

    b1 = _evi([5, 50, 70], [1, 2, 3], [1.0, 2.0, 3.0])
    # redelivery of b1 plus one genuinely new event
    b2 = _evi([5, 50, 70, 80], [1, 2, 3, 4], [1.0, 2.0, 3.0, 7.0])
    out, stats = stream_window_aggregate(
        [b1, b2], ts_col="ts", key_col="k", val_col="v",
        width_s=60, lateness_s=600, n_shards=1, dedup_col="id")
    assert stats["n_dup"] == 3 and stats["n_late"] == 0
    d = {r["window_start_us"] // 1_000_000: (r["n_events"], r["value_sum"])
         for r in out.to_pylist()}
    assert d == {0: (2, 3.0), 60: (2, 10.0)}

    # duplicates INSIDE one batch are also recognized
    b3 = _evi([5, 5], [9, 9], [4.0, 4.0])
    out3, st3 = stream_window_aggregate(
        [b3], ts_col="ts", key_col="k", val_col="v",
        width_s=60, lateness_s=600, n_shards=1, dedup_col="id")
    assert st3["n_dup"] == 1
    assert out3.to_pylist()[0]["n_events"] == 1


def _sess_brute(df, gap_s):
    out = {}
    for k, sub in df.sort_values(["k", "ts"]).groupby("k"):
        ts = sub["ts"].to_numpy()
        sid, n, last = 1, 0, None
        for x in ts:
            if last is not None and x - last > gap_s * 1_000_000:
                out[(k, sid)] = n
                sid, n = sid + 1, 0
            n += 1
            last = x
        out[(k, sid)] = n
    return out


def test_stream_sessions_match_batch(ray_session):
    from xtract.ops.streaming import stream_session_aggregate

    rng = np.random.default_rng(11)
    n = 4_000
    ts = np.sort(rng.integers(0, 10 ** 7, n)) * 1_000_000  # ordered feed
    keys = rng.integers(0, 25, n)
    t = pa.table({"ts": pa.array(ts, pa.int64()),
                  "k": pa.array(keys, pa.int64())})
    batches = [t.slice(i, 500) for i in range(0, n, 500)]
    out, n_dis = stream_session_aggregate(
        batches, ts_col="ts", key_col="k", gap_s=1800, lateness_s=0,
        n_shards=3)
    assert n_dis == 0
    got = {(r["key"], r["session_id"]): r["n_events"]
           for r in out.to_pylist()}
    want = _sess_brute(pd.DataFrame({"k": keys, "ts": ts}), 1800)
    assert got == want


def test_stream_sessions_disorder_dropped_and_state_bounded(ray_session):
    import ray

    from xtract.ops.streaming import _SessionShard

    Shard = ray.remote(_SessionShard)
    a = Shard.remote(60 * 1_000_000, 0)
    peak = 0
    for i in range(500):                   # 500 well-separated sessions
        t = pa.table({"_ts": pa.array([i * 3600 * 1_000_000],
                                      pa.int64()),
                      "_key": pa.array([7], pa.int64())})
        peak = max(peak, ray.get(a.ingest.remote(t)))
    assert peak <= 1                       # one live session at a time
    # a row behind the key's last ts is dropped and counted
    t_old = pa.table({"_ts": pa.array([5], pa.int64()),
                      "_key": pa.array([7], pa.int64())})
    ray.get(a.ingest.remote(t_old))
    tbl, n_dis = ray.get(a.flush.remote())
    assert n_dis == 1
    assert tbl.num_rows == 500
    assert tbl["session_id"].to_pylist() == list(range(1, 501))
    ray.kill(a)


# ---------------------------------------------------------------------------
# stream_enrich (stream-table join against a bucketed dimension)
# ---------------------------------------------------------------------------

def _mk_dim(tmp, keys, labs, n_buckets=8):
    import ray.data as rd

    from xtract.ops.bucketed import write_bucketed

    dim = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "lab": pa.array(labs, pa.string())}))
    write_bucketed(dim, tmp, "k", n_buckets)
    return tmp


def test_stream_enrich_matches_batch_left_join(ray_session, tmp_path):
    import pandas as pd

    from xtract.ops.streaming import stream_enrich

    rng = np.random.default_rng(31)
    dim_keys = list(range(0, 40, 2))          # even keys only
    d = _mk_dim(str(tmp_path), dim_keys, [f"L{k}" for k in dim_keys])
    feed_keys = rng.integers(0, 40, 300)
    feed = [pa.table({"k": pa.array(feed_keys[i:i + 50], pa.int64()),
                      "x": pa.array(range(i, i + 50), pa.int64())})
            for i in range(0, 300, 50)]
    tbl, miss = stream_enrich(iter(feed), d, "k", ["lab"], n_shards=3)
    got = tbl.to_pandas().sort_values(["x"]).reset_index(drop=True)
    want = pd.DataFrame({"k": feed_keys, "x": range(300)}).merge(
        pd.DataFrame({"k": dim_keys, "lab": [f"L{k}" for k in dim_keys]}),
        on="k", how="left").sort_values(["x"]).reset_index(drop=True)
    assert got[["k", "x"]].equals(want[["k", "x"]])
    assert got["lab"].fillna("-").tolist() == \
        want["lab"].fillna("-").tolist()
    assert miss == int(want["lab"].isna().sum())


def test_stream_enrich_shard_count_invariance(ray_session, tmp_path):
    from xtract.ops.streaming import stream_enrich

    d = _mk_dim(str(tmp_path), [1, 2, 3], ["a", "b", "c"])
    feed = lambda: iter([pa.table({  # noqa: E731
        "k": pa.array([3, 1, 7], pa.int64()),
        "x": pa.array([1, 2, 3], pa.int64())})])
    a, ma = stream_enrich(feed(), d, "k", ["lab"], n_shards=2)
    b, mb = stream_enrich(feed(), d, "k", ["lab"], n_shards=5)
    pa_sort = lambda t: t.to_pandas().sort_values(  # noqa: E731
        ["x"]).reset_index(drop=True)
    assert pa_sort(a).equals(pa_sort(b)) and ma == mb == 1


def test_stream_enrich_duplicate_dim_key_raises(ray_session, tmp_path):
    from xtract.ops.streaming import stream_enrich

    d = _mk_dim(str(tmp_path), [1, 1, 2], ["a", "b", "c"])
    feed = iter([pa.table({"k": pa.array([1], pa.int64())})])
    with pytest.raises(Exception, match="duplicate dimension keys"):
        stream_enrich(feed, d, "k", ["lab"], n_shards=1)


def test_stream_enrich_wrong_key_raises(ray_session, tmp_path):
    from xtract.ops.streaming import stream_enrich

    d = _mk_dim(str(tmp_path), [1], ["a"])
    with pytest.raises(ValueError, match="bucketed by"):
        stream_enrich(iter([]), d, "wrong", ["lab"])


def test_stream_enrich_empty_feed(ray_session, tmp_path):
    from xtract.ops.streaming import stream_enrich

    d = _mk_dim(str(tmp_path), [1], ["a"])
    tbl, miss = stream_enrich(iter([]), d, "k", ["lab"])
    assert tbl.num_rows == 0 and miss == 0
