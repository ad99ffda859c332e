"""Property tests for the exact-semantics helpers that back the
SQL-checked queries: discrete quantiles must match DuckDB's
``quantile_disc`` bit-for-bit, and the vectorized 2-D skyline must
equal brute-force strict dominance."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(-1000, 1000),
                          st.integers(1, 5)),
                min_size=1, max_size=40),
       st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]))
def test_disc_quantile_matches_duckdb(items, q):
    from __ray_entry__ import _disc_quantile

    vals = np.array([v for v, _ in items], np.int64)
    wts = np.array([w for _, w in items], np.int64)
    expanded = np.repeat(vals, wts).tolist()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)",
                    [(int(v),) for v in expanded])
    want = con.execute(
        f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
    assert _disc_quantile(vals, wts, q) == want


def _brute_skyline(day, cents):
    pts = sorted(set(zip(day.tolist(), cents.tolist())))
    keep = []
    for d1, c1 in pts:
        dominated = any(
            d2 <= d1 and c2 >= c1 and (d2 < d1 or c2 > c1)
            for d2, c2 in pts)
        if not dominated:
            keep.append((d1, c1))
    return sorted(keep)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=1, max_size=60))
def test_pareto_2d_matches_bruteforce(pts):
    from __ray_entry__ import _pareto_2d

    day = np.array([d for d, _ in pts], np.int64)
    cents = np.array([c for _, c in pts], np.int64)
    d, c = _pareto_2d(day, cents)
    assert sorted(zip(d.tolist(), c.tolist())) == _brute_skyline(
        day, cents)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10), st.integers(0, 10)),
                min_size=2, max_size=40))
def test_pareto_2d_partial_skyline_composition(pts):
    """Skyline(skyline(A) ∪ skyline(B)) == skyline(A ∪ B) — the
    block-combiner property the distributed query relies on."""
    from __ray_entry__ import _pareto_2d

    day = np.array([d for d, _ in pts], np.int64)
    cents = np.array([c for _, c in pts], np.int64)
    half = len(pts) // 2
    d1, c1 = _pareto_2d(day[:half], cents[:half])
    d2, c2 = _pareto_2d(day[half:], cents[half:])
    dm, cm = _pareto_2d(np.concatenate([d1, d2]),
                        np.concatenate([c1, c2]))
    df, cf = _pareto_2d(day, cents)
    assert sorted(zip(dm.tolist(), cm.tolist())) == sorted(
        zip(df.tolist(), cf.tolist()))
