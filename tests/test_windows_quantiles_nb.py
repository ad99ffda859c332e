"""Unit tests for the round-3 relational additions: hopping windows,
keyless interval join, semi/anti joins, exact quantiles, Naive Bayes."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


# ---------- hopping window ----------

def test_hopping_window_membership(ray_session):
    from ray.data.aggregate import Count

    from xtract.ops.joins import hopping_window

    ts = pd.to_datetime(["2024-01-01 00:07:00", "2024-01-01 00:16:00",
                         "2024-01-01 23:59:59", "2024-01-02 00:00:00"])
    df = pd.DataFrame({"ts": ts, "k": ["a", "a", "b", "b"]})
    out = hopping_window(_ds(df), "ts", 60, 15, keys=["k"]).to_pandas()
    # every event lands in exactly 4 windows
    assert out["n_events"].sum() == 4 * len(df)
    # event at 00:07 belongs to starts 00:00, -00:15, -00:30, -00:45
    base = pd.Timestamp("2024-01-01").value // 1000 // 1_000_000
    a = sorted(out[out.k == "a"].window_start)
    assert base in a and (base - 45 * 60) in a
    # midnight boundary event 00:00:00 day2 owns start exactly at midnight
    day2 = base + 86400
    assert day2 in set(out[out.k == "b"].window_start)


def test_hopping_window_rejects_bad_hop(ray_session):
    from xtract.ops.joins import hopping_window

    with pytest.raises(ValueError):
        hopping_window(_ds(pd.DataFrame({"ts": []})), "ts", 60, 25)


# ---------- interval join ----------

def test_interval_join_vs_bruteforce(ray_session):
    from xtract.ops.joins import interval_join_count

    rng = np.random.default_rng(7)
    # events clustered around midnight so intervals cross day buckets
    base = pd.Timestamp("2024-03-01 22:00:00").value // 1000
    lus = base + rng.integers(0, 8 * 3600 * 10**6, 300)
    rus = base + rng.integers(0, 8 * 3600 * 10**6, 200)
    left = pd.DataFrame({"event_id": np.arange(300),
                         "ts": pd.to_datetime(lus, unit="us")})
    right = pd.DataFrame({"ts": pd.to_datetime(rus, unit="us")})
    out = interval_join_count(_ds(left), "ts", _ds(right), "ts", 90,
                              ["event_id"], out_col="n").to_pandas()
    w = 90 * 60 * 10**6
    expect = {i: int(((rus <= t) & (t < rus + w)).sum())
              for i, t in zip(left.event_id, lus)}
    got = dict(zip(out.event_id, out.n))
    assert got == expect


# ---------- semi / anti ----------

def test_semi_anti_cogroup_and_broadcast(ray_session):
    from xtract.ops.joins import anti_join_broadcast, semi_join_cogroup

    left = pd.DataFrame({"k": np.arange(100) % 17, "v": np.arange(100)})
    right = pd.DataFrame({"rk": [1, 5, 9, 9, 13, 99]})
    semi = semi_join_cogroup(_ds(left), _ds(right), "k", "rk").to_pandas()
    anti = semi_join_cogroup(_ds(left), _ds(right), "k", "rk",
                             anti=True).to_pandas()
    keep = left.k.isin(right.rk)
    assert sorted(semi.v) == sorted(left[keep].v)
    assert sorted(anti.v) == sorted(left[~keep].v)
    bc = anti_join_broadcast(_ds(left), "k", [1, 5, 9, 13, 99]).to_pandas()
    assert sorted(bc.v) == sorted(left[~keep].v)
    bs = anti_join_broadcast(_ds(left), "k", [1, 5], semi=True).to_pandas()
    assert sorted(bs.v) == sorted(left[left.k.isin([1, 5])].v)


def test_anti_broadcast_gate(ray_session):
    from xtract.ops.joins import anti_join_broadcast

    with pytest.raises(ValueError, match="broadcast key set"):
        anti_join_broadcast(_ds(pd.DataFrame({"k": [1]})), "k",
                            range(100), max_keys=10)


def test_semi_join_64bit_keys(ray_session):
    # keys beyond 2^53 must not collide (float upcast regression guard)
    from xtract.ops.joins import semi_join_cogroup

    a, b = 2**60, 2**60 + 2
    left = pd.DataFrame({"k": [a, b], "v": [1, 2]})
    right = pd.DataFrame({"k": [a]})
    out = semi_join_cogroup(_ds(left), _ds(right), "k").to_pandas()
    assert out.v.tolist() == [1]


# ---------- quantiles ----------

def _disc(vals, q):
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


def test_grouped_quantiles_vs_rule(ray_session):
    from xtract.ops.quantiles import grouped_quantiles

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 23, 2000),
                       "v": rng.integers(-500, 500, 2000)})
    out = grouped_quantiles(_ds(df), "k", "v",
                            {"p10": 0.1, "p50": 0.5, "p95": 0.95}).to_pandas()
    assert len(out) == df.k.nunique()
    for _, row in out.iterrows():
        vals = df[df.k == row.k].v.tolist()
        assert row.p10 == _disc(vals, 0.1)
        assert row.p50 == _disc(vals, 0.5)
        assert row.p95 == _disc(vals, 0.95)


def test_global_quantiles_exact_with_negatives_and_dups(ray_session):
    from xtract.ops.quantiles import exact_quantiles_global

    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.integers(-10**7, 10**7, 5000),
                           np.full(3000, 42)])  # heavy duplicate mass
    ds = _ds(pd.DataFrame({"v": vals}))
    got = exact_quantiles_global(ds, "v",
                                 {"p01": 0.01, "p50": 0.5, "p99": 0.99},
                                 n_bins=64)
    assert got == {"p01": _disc(vals, 0.01), "p50": _disc(vals, 0.5),
                   "p99": _disc(vals, 0.99)}


def test_global_quantiles_single_value(ray_session):
    from xtract.ops.quantiles import exact_quantiles_global

    ds = _ds(pd.DataFrame({"v": [7, 7, 7]}))
    assert exact_quantiles_global(ds, "v", {"p50": 0.5}) == {"p50": 7}


# ---------- naive bayes ----------

def test_nb_learns_separable_classes(ray_session):
    from xtract.ops.nbayes import score_nb, train_nb

    rows = []
    for i in range(120):
        cls = ["spam", "ham"][i % 2]
        word = "viagra offer click" if cls == "spam" else "meeting agenda notes"
        rows.append({"doc_id": i, "text": f"{word} common filler", "y": cls})
    df = pd.DataFrame(rows)
    model = train_nb(_ds(df), "text", "y", vocab_size=50)
    assert model["classes"] == ["ham", "spam"]
    assert model["W"].dtype == np.int64
    pred = score_nb(_ds(df), model, ["doc_id"], "text").to_pandas()
    merged = pred.merge(df, on="doc_id")
    assert (merged.pred == merged.y).all()


def test_nb_zero_token_doc_and_tie_break(ray_session):
    from xtract.ops.nbayes import score_nb, train_nb

    # symmetric corpus → all-tied scores; argmax must break to the
    # lexicographically smallest class; empty doc scores prior only
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["tok", "tok"],
                       "y": ["b", "a"]})
    model = train_nb(_ds(df), "text", "y", vocab_size=10)
    sc = score_nb(_ds(pd.DataFrame({"doc_id": [9, 10],
                                    "text": ["tok", "...!!!"]})),
                  model, ["doc_id"], "text").to_pandas()
    assert sc.pred.tolist() == ["a", "a"]
    prior_a = model["priors"][model["classes"].index("a")]
    assert int(sc[sc.doc_id == 10].nb_score.iloc[0]) == int(prior_a)


def test_nb_tokenizer_matches_regex(ray_session):
    from xtract.ops.nbayes import flat_tokens
    import re

    texts = ["Hello, World_1!", "", None, "  a  b\tc\nd ", "ÉÀ über ZH中文 x9"]
    arr = pa.chunked_array([pa.array(texts, pa.string())])
    flat, counts = flat_tokens(arr)
    expect = [re.findall(r"[a-z0-9_]+", (t or "").lower()) for t in texts]
    assert counts.tolist() == [len(e) for e in expect]
    assert flat.tolist() == [t for e in expect for t in e]
