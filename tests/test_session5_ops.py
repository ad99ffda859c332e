"""Round-3 session-5 operators: triangle counting, list extraction,
bigram PMI collocations, split assignment, anti co-group join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- lists

def test_extract_lists_nested_and_recovery():
    from xtract.tables import extract_lists_one

    h = (b"<html><body><ul><li>alpha 1</li>"
         b"<li>b &amp; 2<ul><li>nested 0</li></ul></li></ul>"
         b"<ol><li>one 3</li><li>two</ol></body></html>")
    assert extract_lists_one(h) == [
        (0, 0, 1, False, "alpha 1"),
        (0, 1, 1, False, "b & 2"),      # text stops at nested list
        (0, 2, 2, False, "nested 0"),   # nested item, same list_idx
        (1, 0, 1, True, "one 3"),
        (1, 1, 1, True, "two"),         # unterminated li → list end
    ]


def test_extract_lists_selfclosing_eof_and_stray_li():
    from xtract.tables import extract_lists_one

    assert extract_lists_one(b"<ul><li/><li>tail") == [
        (0, 0, 1, False, ""), (0, 1, 1, False, "tail")]
    # li outside any list is ignored
    assert extract_lists_one(b"<li>orphan</li>") == []
    assert extract_lists_one(b"no lists at all") == []


def test_extract_lists_batch_schema(ray_session):
    import ray.data as rd

    from xtract.tables import LISTS_SCHEMA, extract_lists

    pages = rd.from_arrow(pa.table({
        "url": ["u1", "u2", None],
        "html": [b"<ol><li>x</li></ol>", b"", None]}))
    out = extract_lists(pages)
    assert out.schema().base_schema == LISTS_SCHEMA
    rows = out.take_all()
    assert rows == [{"url": "u1", "list_idx": 0, "item_idx": 0,
                     "depth": 1, "ordered": True, "item_text": "x"}]


# ------------------------------------------------------------ triangles

def _k4_plus_noise():
    edges = []
    for u in range(4):
        for v in range(u + 1, 4):
            edges.append((u, v))
            edges.append((v, u))      # reversed duplicates
    edges += [(4, 5), (4, 5), (2, 2)]  # path + dup + self-loop
    return pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                     "dst": pa.array([e[1] for e in edges], pa.int64())})


def test_triangle_counts_k4(ray_session):
    import ray.data as rd

    from xtract.ops.graph import triangle_counts

    out = (triangle_counts(rd.from_arrow(_k4_plus_noise()))
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out["n_triangles"].tolist() == [3, 3, 3, 3]


def test_triangle_counts_cogroup_path_matches(ray_session):
    import ray.data as rd

    from xtract.ops.graph import triangle_counts

    ds = rd.from_arrow(_k4_plus_noise())
    a = (triangle_counts(ds).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (triangle_counts(ds, broadcast_limit=0).to_pandas()
         .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_triangle_counts_vs_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from xtract.ops.graph import triangle_counts

    rng = np.random.default_rng(7)
    src = rng.integers(0, 30, 400)
    dst = rng.integers(0, 30, 400)
    ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                 "dst": pa.array(dst, pa.int64())}))
    got = dict(triangle_counts(ds).to_pandas()
               .itertuples(index=False, name=None))
    eset = {(min(u, v), max(u, v)) for u, v in zip(src, dst) if u != v}
    want: dict = {}
    for a, b, c in itertools.combinations(range(30), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want


# ------------------------------------------------------------ PMI

def test_bigram_pmi_exact(ray_session):
    import ray.data as rd

    from xtract.ops.collocations import bigram_pmi

    docs = rd.from_arrow(pa.table({
        "text": ["the fast key order sort"] * 6
                + ["fast key join small", "key order, batch"]}))
    df = bigram_pmi(docs, min_count=2, k=10)
    # hand-checked: N=37 tokens (30+4+3), M=29 bigrams (24+3+2)
    assert df[["a", "b", "c_ab"]].values.tolist() == [
        ["order", "sort", 6], ["the", "fast", 6],
        ["fast", "key", 7], ["key", "order", 7]]
    # exact integer ratio: c_ab * N^2 * 1e6 // (M * c_a * c_b)
    row = df.iloc[0]  # (order, sort): c_a=7, c_b=6
    assert row["ratio_ppm"] == (6 * 37 * 37 * 10**6) // (29 * 7 * 6)


def test_bigram_pmi_empty_and_min_count(ray_session):
    import ray.data as rd

    from xtract.ops.collocations import bigram_pmi

    docs = rd.from_arrow(pa.table({"text": ["solo", "", None]}))
    df = bigram_pmi(docs, min_count=1, k=5)
    assert len(df) == 0


# ------------------------------------------------------------ split

def test_assign_split_deterministic_and_covering():
    import hashlib

    from xtract.ops.textstats import assign_split_batch

    texts = [f"doc number {i} body" for i in range(400)] + [None]
    t = pa.table({"text": pa.array(texts, pa.string())})
    out1 = assign_split_batch(t)["split"].to_pylist()
    out2 = assign_split_batch(t)["split"].to_pylist()
    assert out1 == out2
    assert set(out1) == {"train", "val", "test"}
    # the rule is the literal hex comparison
    for txt, s in zip(texts, out1):
        h = hashlib.md5((txt or "").encode()).hexdigest()
        assert s == ("train" if h < "cc" else "val" if h < "e6" else "test")
    # ~80/10/10
    frac = out1.count("train") / len(out1)
    assert 0.7 < frac < 0.9


# ------------------------------------------------------------ anti join

def test_anti_cogroup_complements_semi(ray_session):
    import ray.data as rd

    from xtract.ops.joins import semi_join_cogroup

    left = rd.from_arrow(pa.table({"k": list(range(20)),
                                   "x": list(range(100, 120))}))
    right = rd.from_arrow(pa.table({"rk": [1, 3, 5, 5, 40]}))
    semi = semi_join_cogroup(left, right, "k", "rk").to_pandas()
    anti = semi_join_cogroup(left, right, "k", "rk",
                             anti=True).to_pandas()
    assert sorted(semi["k"]) == [1, 3, 5]
    assert sorted(anti["k"]) == [k for k in range(20) if k not in (1, 3, 5)]
    assert len(semi) + len(anti) == 20


# ------------------------------------------------------------ code blocks

def test_extract_code_pre_code_inline():
    from xtract.tables import extract_code_one

    h = (b'<html><body><pre><code class="language-py">def f(1):\n'
         b'    return 2</code></pre><p>x</p><code>inline 3</code>'
         b'</body></html>')
    assert extract_code_one(h) == [
        ("pre", "py", "def f(1):\n    return 2"),
        ("code", "", "inline 3"),
    ]


def test_extract_code_recovery_and_lang_priority():
    from xtract.tables import extract_code_one

    # unterminated pre runs to EOF; entities unescaped; no ws collapse
    assert extract_code_one(b"<pre>raw &amp;  1") == [("pre", "", "raw &  1")]
    # pre's own language class beats the nested code's
    assert extract_code_one(
        b'<pre class="language-rs"><code class="language-py">x</code></pre>'
    ) == [("pre", "rs", "x")]
    # a new pre implicitly closes an open inline code
    assert extract_code_one(b"<code>a<pre>b</pre>") == [
        ("code", "", "a"), ("pre", "", "b")]
    # nested pre folds into the outer block
    assert extract_code_one(b"<pre>a<pre>b</pre>c</pre>") == [
        ("pre", "", "abc")]


# ------------------------------------------------------------ jaccard

def test_jaccard_pairs_exact(ray_session):
    import ray.data as rd

    from xtract.ops.graph import jaccard_pairs

    rows = [(1, 10), (1, 11), (1, 12), (2, 11), (2, 12), (2, 13),
            (3, 99), (1, 10)]  # dup membership must not double-count
    ds = rd.from_arrow(pa.table({
        "s": pa.array([r[0] for r in rows], pa.int64()),
        "m": pa.array([r[1] for r in rows], pa.int64())}))
    out = (jaccard_pairs(ds, "s", "m").to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    assert out.values.tolist() == [[1, 2, 2, 4]]  # |∩|=2, |∪|=3+3-2


def test_jaccard_pairs_fanout_cap(ray_session):
    import ray.data as rd

    from xtract.ops.graph import jaccard_pairs

    # member 5 is in all four sets (a stop-member); cap drops it
    rows = [(s, 5) for s in (1, 2, 3, 4)] + [(1, 7), (2, 7)]
    ds = rd.from_arrow(pa.table({
        "s": pa.array([r[0] for r in rows], pa.int64()),
        "m": pa.array([r[1] for r in rows], pa.int64())}))
    out = (jaccard_pairs(ds, "s", "m", max_member_fanout=3).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    # only member 7 pairs; den uses post-drop sizes (1 each)
    assert out.values.tolist() == [[1, 2, 1, 1]]


def test_left_cogroup_fill_zero(ray_session):
    import pyarrow.compute as pc
    import ray.data as rd

    from xtract.ops.joins import equi_join_cogroup

    left = rd.from_arrow(pa.table({"k": [1, 2, 3]}))
    right = rd.from_arrow(pa.table({"rk": [1, 1, 3], "n": [5, 6, 7]}))
    j = equi_join_cogroup(left, right, on="k", right_on="rk", how="left")
    out = (j.map_batches(
        lambda t: pa.table({
            "k": t["k"],
            "n": pc.cast(pc.fill_null(t["n"], 0), pa.int64())}),
        batch_format="pyarrow")
        .to_pandas().sort_values(["k", "n"]).reset_index(drop=True))
    # key 2 is unmatched → one row with n=0; key 1 matches twice
    assert out.values.tolist() == [[1, 5], [1, 6], [2, 0], [3, 7]]


# ------------------------------------------------------------ gap fill

def test_gap_filled_daily_counts(ray_session):
    import ray.data as rd

    from xtract.ops.joins import gap_filled_daily_counts

    ts = pa.array([0, 0, 3 * 86_400_000_000, 86_400_000_000],
                  pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({"ts": ts,
                                 "k": ["a", "a", "a", "b"]}))
    out = (gap_filled_daily_counts(ds, "ts", "k")
           .sort_values(["k", "day"]).reset_index(drop=True))
    # range = 1970-01-01..04 for BOTH keys, zeros filled
    assert out["day"].tolist() == [
        "1970-01-01", "1970-01-02", "1970-01-03", "1970-01-04"] * 2
    assert out[out["k"] == "a"]["n_events"].tolist() == [2, 0, 0, 1]
    assert out[out["k"] == "b"]["n_events"].tolist() == [0, 1, 0, 0]


def test_gap_filled_empty(ray_session):
    import ray.data as rd

    from xtract.ops.joins import gap_filled_daily_counts

    ds = rd.from_arrow(pa.table({
        "ts": pa.array([], pa.timestamp("us")),
        "k": pa.array([], pa.string())}))
    assert len(gap_filled_daily_counts(ds, "ts", "k")) == 0
