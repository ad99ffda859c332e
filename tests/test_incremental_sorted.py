"""Incremental aggregate state (ops/incremental) and range-pruned
sorted layout (ops/sorted_layout)."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xtract.ops import incremental as inc
from xtract.ops.sorted_layout import plan_range, read_range, write_sorted

SPECS = {
    "n_rows": ("v", "count"),
    "v_sum": ("v", "sum"),
    "v_min": ("v", "min"),
    "v_max": ("v", "max"),
    "tag_max": ("tag", "max"),
}


def _frame(seed: int, n: int) -> pd.DataFrame:
    r = np.random.RandomState(seed)
    return pd.DataFrame({
        "k": r.randint(0, 40, n).astype(np.int64),
        "v": r.randint(-1000, 1000, n).astype(np.int64),
        "tag": [f"t{x:03d}" for x in r.randint(0, 500, n)],
    })


def _oneshot(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby("k")
    out = pd.DataFrame({
        "n_rows": g.size(),
        "v_sum": g["v"].sum(),
        "v_min": g["v"].min(),
        "v_max": g["v"].max(),
        "tag_max": g["tag"].max(),
    }).reset_index().sort_values("k").reset_index(drop=True)
    return out


def _state_df(d: str) -> pd.DataFrame:
    got = (inc.read_agg_state(d).to_pandas()
           .sort_values("k").reset_index(drop=True))
    return got[["k", "n_rows", "v_sum", "v_min", "v_max", "tag_max"]]


def test_incremental_equals_oneshot(ray_session, tmp_path):
    import ray.data as rd

    base, d1, d2 = _frame(1, 4000), _frame(2, 900), _frame(3, 50)
    d = str(tmp_path / "state")
    inc.init_agg_state(rd.from_pandas(base).repartition(4), d, "k",
                       SPECS, n_buckets=8)
    pd.testing.assert_frame_equal(_state_df(d), _oneshot(base),
                                  check_dtype=False)
    inc.merge_delta(d, rd.from_pandas(d1).repartition(3))
    inc.merge_delta(d, rd.from_pandas(d2))
    full = pd.concat([base, d1, d2], ignore_index=True)
    pd.testing.assert_frame_equal(_state_df(d), _oneshot(full),
                                  check_dtype=False)
    man = inc._read_manifest(d)
    assert man["n_rows"] == len(full)


def test_untouched_buckets_not_rewritten(ray_session, tmp_path):
    import ray.data as rd

    d = str(tmp_path / "state")
    inc.init_agg_state(rd.from_pandas(_frame(4, 3000)), d, "k",
                       SPECS, n_buckets=8)
    gens0 = dict(inc._read_manifest(d)["gen"])
    # delta touches exactly one key → exactly one bucket
    delta = pd.DataFrame({"k": np.array([7, 7], np.int64),
                          "v": np.array([1, 2], np.int64),
                          "tag": ["zz", "aa"]})
    b7 = int(np.abs(np.int64(7)) % 8)
    inc.merge_delta(d, rd.from_pandas(delta))
    gens1 = inc._read_manifest(d)["gen"]
    assert gens1[str(b7)] == gens0[str(b7)] + 1
    for b, g in gens0.items():
        if b != str(b7):
            assert gens1[b] == g            # untouched: same generation
            assert os.path.exists(os.path.join(
                d, f"bucket={int(b):04d}", f"state-g{g}.parquet"))


def test_leftover_fragment_not_double_counted(ray_session, tmp_path):
    """Crash between state commit and fragment GC: a consumed fragment
    left on disk must be skipped by the next compaction."""
    import ray.data as rd

    d = str(tmp_path / "state")
    base = _frame(5, 2000)
    inc.init_agg_state(rd.from_pandas(base), d, "k", SPECS,
                       n_buckets=4)
    before = _state_df(d)
    man = inc._read_manifest(d)
    # resurrect a consumed fragment in bucket 0 (simulated failed GC)
    b0 = os.path.join(d, "bucket=0000")
    g = man["gen"]["0"]
    with open(os.path.join(b0, f"state-g{g}.json")) as f:
        consumed = json.load(f)["consumed"]
    assert consumed
    ghost = os.path.join(b0, f"frag-{consumed[0]}.parquet")
    state_t = pq.read_table(os.path.join(b0, f"state-g{g}.parquet"))
    pq.write_table(state_t, ghost)          # same tag, now on disk
    inc._compact(d, inc._read_manifest(d), {0})
    man2 = inc._read_manifest(d)
    assert man2["gen"]["0"] == g            # no new generation
    pd.testing.assert_frame_equal(_state_df(d), before)
    # and a real delta afterwards still lands exactly once
    delta = _frame(6, 300)
    inc.merge_delta(d, rd.from_pandas(delta))
    pd.testing.assert_frame_equal(
        _state_df(d),
        _oneshot(pd.concat([base, delta], ignore_index=True)),
        check_dtype=False)


def test_bad_spec_kind_rejected(ray_session, tmp_path):
    import ray.data as rd

    with pytest.raises(ValueError):
        inc.init_agg_state(rd.from_pandas(_frame(7, 10)),
                           str(tmp_path / "s"), "k",
                           {"x": ("v", "avg")})


# ---------------------------------------------------------------- sorted


def test_sorted_range_pruning_and_exactness(ray_session, tmp_path):
    import ray.data as rd

    r = np.random.RandomState(11)
    df = pd.DataFrame({"x": r.randint(0, 100_000, 20_000).astype(np.int64),
                       "p": np.arange(20_000, dtype=np.int64)})
    d = str(tmp_path / "sorted")
    man = write_sorted(rd.from_pandas(df).repartition(8), d, "x")
    assert man["n_rows"] == len(df)
    n_files = len(man["files"])
    assert n_files > 1
    lo, hi = 20_000, 30_000
    planned = plan_range(d, lo, hi)
    assert 0 < len(planned) < n_files      # genuine pruning
    got = (read_range(d, lo, hi).to_pandas()
           .sort_values(["x", "p"]).reset_index(drop=True))
    want = (df[(df.x >= lo) & (df.x < hi)]
            .sort_values(["x", "p"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["x", "p"]], want)
    # open bounds
    assert read_range(d).count() == len(df)
    assert (read_range(d, hi=lo).count()
            == int((df.x < lo).sum()))
    # empty range keeps the schema
    empty = read_range(d, 10**9, 2 * 10**9)
    assert empty.count() == 0
    assert set(empty.schema().names) == {"x", "p"}


def test_sorted_timestamp_range(ray_session, sf_dir, tmp_path):
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts"])
    d = str(tmp_path / "ev_sorted")
    write_sorted(ev.repartition(6), d, "ts")
    lo = pd.Timestamp("2024-01-10")
    hi = pd.Timestamp("2024-01-15")
    got = read_range(d, lo, hi).to_pandas()
    raw = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["event_id", "ts"]).to_pandas()
    want = raw[(raw.ts >= lo) & (raw.ts < hi)]
    assert sorted(got.event_id) == sorted(want.event_id)
    assert 0 < len(plan_range(d, lo, hi)) < 6 or len(want) == 0


def test_zorder_box_pruning_and_exactness(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.sorted_layout import plan_box, read_box, write_zorder

    r = np.random.RandomState(3)
    df = pd.DataFrame({"x": r.randint(0, 10_000, 20_000).astype(np.int64),
                       "y": r.randint(0, 10_000, 20_000).astype(np.int64),
                       "p": np.arange(20_000, dtype=np.int64)})
    d = str(tmp_path / "zo")
    man = write_zorder(rd.from_pandas(df).repartition(8), d, "x", "y",
                       rows_per_file=1_024)
    assert man["n_rows"] == len(df)
    n_files = len(man["files"])
    assert n_files > 4
    planned = plan_box(d, 1_000, 3_000, 4_000, 6_000)
    assert 0 < len(planned) < n_files      # genuine 2-D pruning
    got = (read_box(d, 1_000, 3_000, 4_000, 6_000).to_pandas()
           .sort_values("p").reset_index(drop=True))
    want = (df[(df.x >= 1_000) & (df.x < 3_000)
               & (df.y >= 4_000) & (df.y < 6_000)]
            .sort_values("p").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["x", "y", "p"]], want)
    # half-open box on one dim only
    got1 = read_box(d, a_hi=500).count()
    assert got1 == int((df.x < 500).sum())
    # empty box keeps schema
    empty = read_box(d, 10**8, 2 * 10**8)
    assert empty.count() == 0
    assert set(empty.schema().names) == {"x", "y", "p"}


def test_zorder_prunes_better_than_single_sort_on_second_dim(
        ray_session, tmp_path):
    """The point of z-order: a box selective in BOTH dims prunes files
    even though neither dim alone was globally sorted."""
    import ray.data as rd

    from xtract.ops.sorted_layout import plan_box, write_zorder

    r = np.random.RandomState(5)
    df = pd.DataFrame({"x": r.randint(0, 1 << 20, 40_000).astype(np.int64),
                       "y": r.randint(0, 1 << 20, 40_000).astype(np.int64)})
    d = str(tmp_path / "zo2")
    man = write_zorder(rd.from_pandas(df).repartition(8), d, "x", "y",
                       rows_per_file=1_024)
    n = len(man["files"])
    w = 1 << 17                            # 1/8 of the range per dim
    frac = len(plan_box(d, 0, w, 0, w)) / n
    assert frac < 0.5                      # tiny box touches a minority


def test_zorder_timestamp_dim(ray_session, sf_dir, tmp_path):
    import ray.data as rd

    from xtract.ops.sorted_layout import read_box, write_zorder

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    d = str(tmp_path / "zo_ev")
    write_zorder(ev, d, "user_id", "ts", rows_per_file=512)
    raw = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["event_id", "user_id", "ts"]).to_pandas()
    u_lo = int(raw.user_id.quantile(0.2))
    u_hi = int(raw.user_id.quantile(0.6)) + 1
    lo = pd.Timestamp("2024-01-10")
    hi = pd.Timestamp("2024-01-15")
    got = read_box(d, u_lo, u_hi, lo, hi).to_pandas()
    want = raw[(raw.user_id >= u_lo) & (raw.user_id < u_hi)
               & (raw.ts >= lo) & (raw.ts < hi)]
    assert len(want) > 0
    assert sorted(got.event_id) == sorted(want.event_id)


def test_clustered_write_compresses_better(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from xtract.ops.sorted_layout import write_clustered

    # 60 boilerplate families x 40 near-identical variants, shuffled:
    # a similarity-clustered layout must compress markedly better than
    # the arrival-order layout
    r = np.random.RandomState(7)
    rows = []
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "theta", "kappa", "lambda", "sigma"]
    for fam in range(60):
        base = " ".join(words[(fam + i) % len(words)]
                        for i in range(60)) + f" family{fam}"
        for v in range(40):
            rows.append(base + f" v{v % 4}")
    r.shuffle(rows)
    t = pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                  "text": pa.array(rows, pa.string())})

    plain_dir = tmp_path / "plain"
    plain_dir.mkdir()
    plain_bytes = 0
    for i in range(0, len(t), 400):
        p = plain_dir / f"part-{i}.parquet"
        pq.write_table(t.slice(i, 400), p)
        plain_bytes += os.path.getsize(p)

    man = write_clustered(rd.from_arrow(t).repartition(4),
                          str(tmp_path / "clustered"), "text",
                          rows_per_file=400)
    assert man["n_rows"] == len(t)
    assert man["bytes"] < 0.9 * plain_bytes

    # zero semantic change: read-back is the same multiset of rows
    import ray.data as rd2
    back = rd2.read_parquet(
        [str(tmp_path / "clustered" / f["file"]) for f in man["files"]]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == list(range(len(t)))
    assert sorted(back["text"].tolist()) == sorted(rows)
