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


# ------------------------------------------------------------ kmeans

def _kmeans_reference(vecs, ids, k, iters, unit=1 << 20):
    """Pure-numpy replica of distributed_kmeans' exact integer
    algorithm (same init, same update, same tie-break)."""
    q = np.floor(np.asarray(vecs, np.float64) * unit).astype(np.int64)
    order = np.argsort(ids)
    centers = q[order[:k]].copy()

    def assign(m, cen):
        xc = m @ cen.T
        c2 = np.einsum("ij,ij->i", cen, cen)
        return np.argmin(c2[None, :] - 2 * xc, axis=1)

    for _ in range(iters):
        a = assign(q, centers)
        new = centers.copy()
        for c in range(k):
            mask = a == c
            if mask.any():
                new[c] = q[mask].sum(axis=0) // mask.sum()
        centers = new
    return centers, assign(q, centers)


def test_distributed_kmeans_matches_reference(ray_session):
    import ray.data as rd

    from xtract.ops.similarity import distributed_kmeans

    rng = np.random.default_rng(11)
    a = rng.normal(0, 0.05, (40, 8)) + 1.0
    b = rng.normal(0, 0.05, (40, 8)) - 1.0
    vecs = np.vstack([a, b])
    ids = np.arange(len(vecs))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))}))
    # float32 storage: quantize what the engine actually reads
    stored = np.asarray(
        [np.asarray(v, np.float32).tolist() for v in vecs], np.float64)
    centers, labels = distributed_kmeans(ds, k=2, iters=3)
    want_c, want_a = _kmeans_reference(stored, ids, 2, 3)
    assert (centers == want_c).all()
    got = (labels.to_pandas().sort_values("vec_id")
           .reset_index(drop=True)["cluster"].to_numpy())
    assert (got == want_a).all()
    # the two planted blobs separate perfectly
    assert len(set(got[:40])) == 1 and len(set(got[40:])) == 1
    assert got[0] != got[40]


def test_distributed_kmeans_parallelism_invariant(ray_session):
    import ray.data as rd

    from xtract.ops.similarity import distributed_kmeans

    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 1, (60, 4))
    t = pa.table({
        "vec_id": pa.array(np.arange(60), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))})
    c1, _ = distributed_kmeans(rd.from_arrow(t), k=4, iters=4)
    c2, _ = distributed_kmeans(
        rd.from_arrow(t).repartition(7), k=4, iters=4)
    assert (c1 == c2).all()  # bit-identical across block layouts


# ------------------------------------------------------------ artifacts

def test_artifact_roundtrips(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.artifacts import (load_bpe_merges, load_lm_table,
                                      load_vocab, save_bpe_merges,
                                      save_lm_table, save_vocab)
    from xtract.ops.bpe import bpe_encode, train_bpe
    from xtract.ops.ngram_lm import score_bits_per_char, train_char_lm
    from xtract.ops.vocab import build_vocab

    docs = rd.from_arrow(pa.table({
        "doc_id": list(range(6)),
        "text": ["the quick brown fox jumps", "the quick fox",
                 "brown fox fox", "quick quick the", "jumps over",
                 "the fox jumps"]}))

    merges = train_bpe(docs, num_merges=20)
    p = str(tmp_path / "bpe.parquet")
    save_bpe_merges(merges, p)
    assert load_bpe_merges(p) == merges
    enc1 = bpe_encode(docs, merges).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    enc2 = bpe_encode(docs, load_bpe_merges(p)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(enc1.astype(str), enc2.astype(str))

    vocab = build_vocab(docs, size=10)
    pv = str(tmp_path / "vocab.parquet")
    save_vocab(vocab, pv)
    lv = load_vocab(pv)
    assert lv.to_pydict() == vocab.select(
        ["token_id", "token", "n"]).to_pydict()

    lm = train_char_lm(docs, order=2)
    pl = str(tmp_path / "lm.parquet")
    save_lm_table(lm, pl)
    assert load_lm_table(pl) == lm
    s1 = score_bits_per_char(docs, lm, order=2).to_pandas() \
        .sort_values("doc_id")["bits_per_char"].tolist()
    s2 = score_bits_per_char(docs, load_lm_table(pl), order=2) \
        .to_pandas().sort_values("doc_id")["bits_per_char"].tolist()
    assert s1 == s2


def test_artifact_kind_mismatch(tmp_path):
    import pytest as _pytest

    from xtract.ops.artifacts import load_vocab, save_lm_table

    p = str(tmp_path / "x.parquet")
    save_lm_table({"ab": 5}, p)
    with _pytest.raises(ValueError, match="kind"):
        load_vocab(p)


# ------------------------------------------------------------ bucketed

def test_bucketed_write_join_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.bucketed import (bucketed_join, read_bucketed,
                                     write_bucketed)
    from xtract.ops.joins import equi_join_cogroup

    rng = np.random.default_rng(5)
    A = pa.table({"k": pa.array(rng.integers(0, 50, 300), pa.int64()),
                  "x": pa.array(np.arange(300), pa.int64())})
    B = pa.table({"rk": pa.array(rng.integers(0, 50, 200), pa.int64()),
                  "y": pa.array(np.arange(200, 400), pa.int64())})
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    ma = write_bucketed(rd.from_arrow(A).repartition(5), da, "k", 8)
    mb = write_bucketed(rd.from_arrow(B).repartition(3), db, "rk", 8)
    assert ma["n_rows"] == 300 and mb["n_rows"] == 200

    # read-back preserves every row
    back = read_bucketed(da).to_pandas()
    assert sorted(back["x"]) == list(range(300))

    got = (bucketed_join(da, db, on="k", right_on="rk").to_pandas()
           [["k", "x", "y"]]
           .sort_values(["k", "x", "y"]).reset_index(drop=True))
    want = (equi_join_cogroup(rd.from_arrow(A), rd.from_arrow(B),
                              on="k", right_on="rk").to_pandas()
            [["k", "x", "y"]]
            .sort_values(["k", "x", "y"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_bucketed_join_validates_manifest(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.bucketed import bucketed_join, write_bucketed

    t = pa.table({"k": pa.array([1, 2], pa.int64())})
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(rd.from_arrow(t), da, "k", 4)
    write_bucketed(rd.from_arrow(t), db, "k", 8)
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucketed_join(da, db, on="k")


def test_lookup_bucketed_pruned(ray_session, tmp_path):
    import ray.data as rd

    from xtract.ops.bucketed import lookup_bucketed, write_bucketed

    t = pa.table({"k": pa.array(list(range(100)), pa.int64()),
                  "v": pa.array(list(range(1000, 1100)), pa.int64())})
    d = str(tmp_path / "t")
    write_bucketed(rd.from_arrow(t).repartition(4), d, "k", 8)
    hit = lookup_bucketed(d, [7, 42, 99]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert hit["k"].tolist() == [7, 42, 99]
    assert hit["v"].tolist() == [1007, 1042, 1099]
    miss = lookup_bucketed(d, [100000])
    assert len(miss) == 0 and miss.schema.names == ["k", "v"]


# ------------------------------------------------------------ grouped HLL

def test_grouped_approx_distinct(ray_session):
    import ray.data as rd

    from xtract.ops.sketch import grouped_approx_distinct

    rng = np.random.default_rng(13)
    keys, vals = [], []
    truth = {"a": 500, "b": 50, "c": 1}
    for k, n in truth.items():
        ids = rng.integers(0, n, n * 4)  # repeats; n distinct max
        truth[k] = len(np.unique(ids))
        keys += [k] * len(ids)
        vals += [f"user{i}" for i in ids]
    ds = rd.from_arrow(pa.table({"host": keys, "user": vals}))
    out = (grouped_approx_distinct(ds, "host", "user", p=10)
           .to_pandas().set_index("host")["approx_distinct"].to_dict())
    assert set(out) == set(truth)
    for k, t in truth.items():
        assert abs(out[k] - t) <= max(2, 0.15 * t), (k, out[k], t)

    # partition-independent: same result on a different block layout
    out2 = (grouped_approx_distinct(ds.repartition(9), "host", "user",
                                    p=10)
            .to_pandas().set_index("host")["approx_distinct"].to_dict())
    assert out == out2


def test_triangle_counts_star_hub_bounded(ray_session):
    """A 10^4-leaf star: naive wedge emission from the hub would be
    ~5·10^7 pairs; degree orientation points every edge INTO the hub
    (leaves have the smaller (deg, id)), so the hub emits ZERO wedges
    and the run completes instantly with no triangles."""
    import ray.data as rd

    from xtract.ops.graph import triangle_counts

    n = 10_000
    hub = n + 7
    t = pa.table({"src": pa.array(list(range(n)), pa.int64()),
                  "dst": pa.array([hub] * n, pa.int64())})
    out = triangle_counts(rd.from_arrow(t)).to_pandas()
    assert len(out) == 0
