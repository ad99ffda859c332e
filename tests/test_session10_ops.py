"""Session-10 ops: phrase_search, entity_cooccurrence, bfs/k-core are
in test_graph.py."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


# ---------------------------------------------------------------------------
# phrase_search
# ---------------------------------------------------------------------------

def _phrase_brute(texts, phrase):
    import re
    tok = re.compile(r"[a-z0-9_]+")
    pat = " " + " ".join(tok.findall(phrase.lower())) + " "
    out = {}
    for i, t in enumerate(texts):
        if t is None:
            continue
        s = " " + " ".join(tok.findall(t.lower())) + " "
        n = s.count(pat)
        if n:
            out[i] = n
    return out


def test_phrase_search_vs_brute(ray_session):
    from xtract.ops.ranking import phrase_search

    texts = ["the quick brown fox", "Quick, brown! fox quick brown",
             "quick brownie", None, "", "a quick  brown\tthing",
             "brown quick"]
    df = phrase_search(_docs(texts), "quick brown").to_pandas()
    got = dict(zip(df["doc_id"], df["n_occ"]))
    assert got == _phrase_brute(texts, "quick brown")
    assert got == {0: 1, 1: 2, 5: 1}


def test_phrase_search_nonoverlapping_rule(ray_session):
    from xtract.ops.ranking import phrase_search

    # "a a a" contains "a a" ONCE under the left-to-right scan rule
    # (consecutive matches share the delimiter space, so even four
    # a's count 1 — five are needed for a second disjoint match; the
    # brute-force twin uses str.count, the same rule as SQL replace)
    texts = ["a a a", "a a a a", "a a a a a"]
    df = phrase_search(_docs(texts), "a a").to_pandas()
    got = dict(zip(df["doc_id"], df["n_occ"]))
    assert got == _phrase_brute(texts, "a a") == {0: 1, 1: 1, 2: 2}


def test_phrase_search_punctuation_and_case(ray_session):
    from xtract.ops.ranking import phrase_search

    df = phrase_search(_docs(["END. Table,table! start"]),
                       "Table ... TABLE").to_pandas()
    assert dict(zip(df["doc_id"], df["n_occ"])) == {0: 1}


def test_phrase_search_empty_phrase_raises(ray_session):
    from xtract.ops.ranking import phrase_search

    with pytest.raises(ValueError, match="no tokens"):
        phrase_search(_docs(["x"]), "!!!")


def test_phrase_search_single_token(ray_session):
    from xtract.ops.ranking import phrase_search

    df = phrase_search(_docs(["x y x", "y"]), "x").to_pandas()
    assert dict(zip(df["doc_id"], df["n_occ"])) == {0: 2}


# ---------------------------------------------------------------------------
# entity_cooccurrence
# ---------------------------------------------------------------------------

def _cooc_brute(texts, cap=64):
    import re
    ent = re.compile(r"[A-Z][a-z]+")
    out = {}
    for t in texts:
        if not t:
            continue
        es = sorted(set(ent.findall(t)))
        if len(es) < 2 or len(es) > cap:
            continue
        for a, b in itertools.combinations(es, 2):
            out[(a, b)] = out.get((a, b), 0) + 1
    return out


def test_entity_cooccurrence_vs_brute(ray_session):
    from xtract.ops.collocations import entity_cooccurrence

    texts = ["Alice met Bob, said Alice near Carol",
             "Bob saw Alice", "only lowercase here", None,
             "Solo", "Alice Bob Alice Bob"]
    df = entity_cooccurrence(_docs(texts)).to_pandas()
    got = {(r.ent_a, r.ent_b): r.n_docs for r in df.itertuples()}
    assert got == _cooc_brute(texts)
    assert got[("Alice", "Bob")] == 3


def test_entity_cooccurrence_cap_drops_doc(ray_session):
    from xtract.ops.collocations import entity_cooccurrence

    big = " ".join(f"Name{chr(97 + i)}x" for i in range(26))
    # Namea..Namez: regex matches e.g. 'Namea' (capital + lowercase
    # run); 26 entities > cap 10 -> doc dropped whole
    texts = [big, "Alice Bob"]
    df = entity_cooccurrence(_docs(texts),
                             max_entities_per_doc=10).to_pandas()
    got = {(r.ent_a, r.ent_b): r.n_docs for r in df.itertuples()}
    assert got == {("Alice", "Bob"): 1}


def test_entity_cooccurrence_partition_invariance(ray_session):
    from xtract.ops.collocations import entity_cooccurrence

    rng = np.random.default_rng(23)
    names = ["Alice", "Bob", "Carol", "Dave", "Erin"]
    texts = [" ".join(rng.choice(names, rng.integers(0, 5)))
             for _ in range(60)]
    a = entity_cooccurrence(_docs(texts).repartition(1)).to_pandas() \
        .sort_values(["ent_a", "ent_b"]).reset_index(drop=True)
    b = entity_cooccurrence(_docs(texts).repartition(9)).to_pandas() \
        .sort_values(["ent_a", "ent_b"]).reset_index(drop=True)
    assert a.equals(b)
    got = {(r.ent_a, r.ent_b): r.n_docs for r in a.itertuples()}
    assert got == _cooc_brute(texts)


# ---------------------------------------------------------------------------
# fd_candidates
# ---------------------------------------------------------------------------

def _fd_brute(rows, names):
    out = {}
    for a in names:
        for b in names:
            if a == b:
                continue
            lhs = {str(r[a]) for r in rows}
            pairs = {(str(r[a]), str(r[b])) for r in rows}
            out[(a, b)] = (len(lhs), len(pairs), len(lhs) == len(pairs))
    return out


def test_fd_candidates_vs_brute(ray_session):
    from xtract.ops.profile import fd_candidates

    rows = [{"k": i, "g": i % 3, "lab": f"L{i % 3}"} for i in range(30)]
    # k -> g holds, k -> lab holds, g <-> lab holds both ways,
    # g -> k fails
    ds = rd.from_arrow(pa.table({
        "k": pa.array([r["k"] for r in rows], pa.int64()),
        "g": pa.array([r["g"] for r in rows], pa.int64()),
        "lab": pa.array([r["lab"] for r in rows], pa.string())}))
    df = fd_candidates(ds, ["k", "g", "lab"]).to_pandas()
    got = {(r.col_a, r.col_b): (r.n_lhs, r.n_pairs, r.fd_holds)
           for r in df.itertuples()}
    assert got == _fd_brute(rows, ["k", "g", "lab"])
    assert got[("k", "g")][2] and got[("g", "lab")][2]
    assert not got[("g", "k")][2]


def test_fd_candidates_partition_invariance(ray_session):
    from xtract.ops.profile import fd_candidates

    rng = np.random.default_rng(29)
    t = pa.table({"x": pa.array(rng.integers(0, 12, 200), pa.int64()),
                  "y": pa.array(rng.integers(0, 5, 200), pa.int64())})
    a = fd_candidates(rd.from_arrow(t).repartition(1),
                      ["x", "y"]).to_pandas() \
        .sort_values(["col_a", "col_b"]).reset_index(drop=True)
    b = fd_candidates(rd.from_arrow(t).repartition(8),
                      ["x", "y"]).to_pandas() \
        .sort_values(["col_a", "col_b"]).reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# change_rate
# ---------------------------------------------------------------------------

def _change_brute(rows):
    """rows: (url, ts, fp) — dict url -> (n_obs, n_changes, ppm)."""
    by = {}
    for u, ts, fp in rows:
        by.setdefault(u, []).append((ts, fp))
    out = {}
    for u, obs in by.items():
        obs.sort()
        ch = sum(1 for i in range(1, len(obs))
                 if obs[i][1] != obs[i - 1][1])
        ppm = 0 if len(obs) == 1 else 1_000_000 * ch // (len(obs) - 1)
        out[u] = (len(obs), ch, ppm)
    return out


def test_change_rate_vs_brute(ray_session):
    from xtract.ops.urls import change_rate

    rng = np.random.default_rng(41)
    rows = [(int(rng.integers(0, 20)), int(ts), int(rng.integers(0, 3)))
            for ts in range(300)]
    rows.append((99, 0, 7))             # single-observation url
    ds = rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "fingerprint": pa.array([r[2] for r in rows], pa.int64())}))
    df = change_rate(ds).to_pandas()
    got = {r.url: (r.n_obs, r.n_changes, r.change_rate_ppm)
           for r in df.itertuples()}
    assert got == _change_brute(rows)
    assert got[99] == (1, 0, 0)


def test_change_rate_partition_invariance(ray_session):
    from xtract.ops.urls import change_rate

    rng = np.random.default_rng(43)
    t = pa.table({
        "url": pa.array(rng.integers(0, 15, 200), pa.int64()),
        "ts": pa.array(rng.permutation(200), pa.int64()),
        "fingerprint": pa.array(rng.integers(0, 2, 200), pa.int64())})
    a = change_rate(rd.from_arrow(t).repartition(1),
                    num_partitions=3).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    b = change_rate(rd.from_arrow(t).repartition(8),
                    num_partitions=17).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# cumulative_distinct
# ---------------------------------------------------------------------------

def _cumdist_brute(rows):
    """rows: (key, ts, val, id) -> {id: n_distinct_so_far}."""
    out = {}
    by = {}
    for k, ts, v, i in sorted(rows, key=lambda r: (r[0], r[1], r[3])):
        seen = by.setdefault(k, set())
        seen.add(v)
        out[i] = len(seen)
    return out


def test_cumulative_distinct_vs_brute(ray_session):
    from xtract.ops.joins import cumulative_distinct

    rng = np.random.default_rng(47)
    rows = [(int(rng.integers(0, 10)), int(rng.integers(0, 50)),
             int(rng.integers(0, 4)), i) for i in range(250)]
    ds = rd.from_arrow(pa.table({
        "user": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "etype": pa.array([r[2] for r in rows], pa.int64()),
        "event_id": pa.array([r[3] for r in rows], pa.int64())}))
    df = cumulative_distinct(ds, "user", "ts", "etype").to_pandas()
    got = dict(zip(df["event_id"], df["n_distinct_so_far"]))
    assert got == _cumdist_brute(rows)


def test_cumulative_distinct_partition_invariance(ray_session):
    from xtract.ops.joins import cumulative_distinct

    rng = np.random.default_rng(53)
    t = pa.table({
        "user": pa.array(rng.integers(0, 8, 150), pa.int64()),
        "ts": pa.array(rng.permutation(150), pa.int64()),
        "etype": pa.array(rng.integers(0, 3, 150), pa.int64()),
        "event_id": pa.array(range(150), pa.int64())})
    a = cumulative_distinct(rd.from_arrow(t).repartition(1),
                            "user", "ts", "etype",
                            num_partitions=2).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    b = cumulative_distinct(rd.from_arrow(t).repartition(7),
                            "user", "ts", "etype",
                            num_partitions=13).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# homograph_groups
# ---------------------------------------------------------------------------

def test_homograph_groups_detects_spoof(ray_session):
    from xtract.ops.urls import homograph_groups

    hosts = ["example.org", "exаmple.org",   # Cyrillic а spoof
             "example.org",                        # dup of the real one
             "unique.net", "bank.com", "bαnk.com"]  # Greek α
    ds = rd.from_arrow(pa.table({"host": pa.array(hosts, pa.string())}))
    df = homograph_groups(ds).to_pandas()
    got = {(r.skeleton, r.host): r.n_hosts for r in df.itertuples()}
    assert got == {
        ("example.org", "example.org"): 2,
        ("example.org", "exаmple.org"): 2,
        ("bank.com", "bank.com"): 2,
        ("bank.com", "bαnk.com"): 2,
    }


def test_homograph_groups_case_fold_not_flagged_alone(ray_session):
    from xtract.ops.urls import homograph_groups

    # case variants fold to DIFFERENT... no: lower() folds them to the
    # SAME raw? skeleton equal but raw hosts differ -> flagged; a
    # single host (any case) is never flagged
    ds = rd.from_arrow(pa.table({"host": pa.array(
        ["Only.One.org", "only.one.org", "solo.net"], pa.string())}))
    df = homograph_groups(ds).to_pandas()
    got = {(r.skeleton, r.host) for r in df.itertuples()}
    assert got == {("only.one.org", "Only.One.org"),
                   ("only.one.org", "only.one.org")}


def test_homograph_groups_partition_invariance(ray_session):
    from xtract.ops.urls import homograph_groups

    hosts = (["example.org", "exаmple.org"] * 10
             + [f"h{i}.net" for i in range(30)])
    a = homograph_groups(rd.from_arrow(pa.table(
        {"host": pa.array(hosts, pa.string())})).repartition(1)) \
        .to_pandas().sort_values(["skeleton", "host"]) \
        .reset_index(drop=True)
    b = homograph_groups(rd.from_arrow(pa.table(
        {"host": pa.array(hosts, pa.string())})).repartition(6)) \
        .to_pandas().sort_values(["skeleton", "host"]) \
        .reset_index(drop=True)
    assert a.equals(b) and len(a) == 2


# ---------------------------------------------------------------------------
# parse_feed / extract_feed_entries (8th tokenizer-walk surface)
# ---------------------------------------------------------------------------

def test_parse_feed_rss_and_atom():
    from xtract.tables import parse_feed

    rss = (b"<?xml version='1.0'?><rss><channel><title>Chan</title>"
           b"<link>https://chan</link>"
           b"<item><title>A &amp; B</title><link>https://x/1</link>"
           b"<pubDate>Mon, 01 Jan 2024</pubDate></item>"
           b"<item><title>Two</title><link>https://x/2</link></item>"
           b"</channel></rss>")
    assert parse_feed(rss) == [
        ("rss", "A & B", "https://x/1", "Mon, 01 Jan 2024"),
        ("rss", "Two", "https://x/2", "")]
    atom = (b"<feed><title>F</title>"
            b"<entry><title>E1</title><link href='https://a/1'/>"
            b"<updated>2024-01-01</updated></entry>"
            b"<entry><link rel='alt' href='https://a/2'/>"
            b"<link href='https://ignored'/><title>E2</title></entry>"
            b"</feed>")
    assert parse_feed(atom) == [
        ("atom", "E1", "https://a/1", "2024-01-01"),
        ("atom", "E2", "https://a/2", "")]


def test_parse_feed_recovery():
    from xtract.tables import parse_feed

    # unterminated entry recovers at EOF; <title> follows the shared
    # tokenizer's HTML raw-text rule (absorbs markup until its close
    # tag — documented contract); garbage never raises
    assert parse_feed(b"<rss><item><title>T1"
                      b"<item><title>T2</title></item>") == [
        ("rss", "T1<item><title>T2", "", "")]
    assert parse_feed(b"<rss><item><title>T1</title>"
                      b"<item><title>T2</title></item>") == [
        ("rss", "T1", "", ""), ("rss", "T2", "", "")]
    assert parse_feed(b"") == []
    assert parse_feed(b"<<<>not xml &&& <entry>") == [
        ("atom", "", "", "")]
    # channel-level title/link never emit rows
    assert parse_feed(b"<rss><channel><title>C</title>"
                      b"<link>https://c</link></channel></rss>") == []


def test_extract_feed_entries_dataset(ray_session):
    from xtract.tables import extract_feed_entries

    pages = rd.from_arrow(pa.table({
        "url": pa.array(["u1", "u2"], pa.string()),
        "html": pa.array(
            [b"<rss><item><title>X</title><link>l1</link></item></rss>",
             None], pa.binary())}))
    df = extract_feed_entries(pages).to_pandas()
    assert len(df) == 1
    assert df.iloc[0].tolist() == ["u1", 0, "rss", "X", "l1", ""]


# ---------------------------------------------------------------------------
# extract_media (audio/video reference harvest)
# ---------------------------------------------------------------------------

def test_extract_media_one_scoping_and_base():
    from xtract.tables import extract_media_one

    h = (b"<html><head><base href='/m/'></head><body>"
         b"<video poster='p.jpg'><source src='a.mp4' type='video/mp4'>"
         b"<source src='b.webm'></video>"
         b"<audio src='s.ogg'></audio>"
         b"<source src='orphan.mp4'>"
         b"<video src='direct.mp4' type='video/mp4'/></body>")
    assert extract_media_one(h, "https://x.org/page") == [
        ("video", "https://x.org/m/a.mp4", "video/mp4",
         "https://x.org/m/p.jpg"),
        ("video", "https://x.org/m/b.webm", "",
         "https://x.org/m/p.jpg"),
        ("audio", "https://x.org/m/s.ogg", "", ""),
        ("video", "https://x.org/m/direct.mp4", "video/mp4", ""),
    ]


def test_extract_media_dataset(ray_session):
    from xtract.tables import extract_media

    pages = rd.from_arrow(pa.table({
        "url": pa.array(["u1", "u2"], pa.string()),
        "html": pa.array(
            [b"<audio><source src='x.ogg' type='audio/ogg'></audio>",
             None], pa.binary())}))
    df = extract_media(pages).to_pandas()
    assert len(df) == 1
    assert df.iloc[0].tolist() == ["u1", 0, "audio", "x.ogg",
                                   "audio/ogg", ""]


# ---------------------------------------------------------------------------
# registrable_domain / add_site_column
# ---------------------------------------------------------------------------

def test_registrable_domain_rules():
    from xtract.ops.urls import registrable_domain as r

    assert r("A.B.co.uk") == "b.co.uk"
    assert r("x.y.example.org") == "example.org"
    assert r("example.org") == "example.org"
    assert r("org") == "org"
    assert r("deep.user.github.io") == "user.github.io"
    assert r("host.example.org.") == "example.org"


def test_add_site_column(ray_session):
    from xtract.ops.urls import add_site_column

    ds = rd.from_arrow(pa.table({"host": pa.array(
        ["www.shop.co.uk", "cdn.shop.co.uk", "m.news.org", None],
        pa.string())}))
    df = add_site_column(ds).to_pandas()
    assert df["site"].tolist() == ["shop.co.uk", "shop.co.uk",
                                   "news.org", ""]


# ---------------------------------------------------------------------------
# unpivot
# ---------------------------------------------------------------------------

def test_unpivot_matches_manual(ray_session):
    from xtract.ops.agg import unpivot

    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "a": pa.array([10, 20], pa.int64()),
                  "b": pa.array([30, 40], pa.int64())})
    df = unpivot(rd.from_arrow(t), ["k"], ["a", "b"]).to_pandas() \
        .sort_values(["k", "variable"]).reset_index(drop=True)
    assert df.to_dict("records") == [
        {"k": 1, "variable": "a", "value": 10},
        {"k": 1, "variable": "b", "value": 30},
        {"k": 2, "variable": "a", "value": 20},
        {"k": 2, "variable": "b", "value": 40}]


def test_unpivot_type_unification(ray_session):
    from xtract.ops.agg import unpivot

    t = pa.table({"k": pa.array([1], pa.int64()),
                  "a": pa.array([2], pa.int64()),
                  "b": pa.array([2.5], pa.float64())})
    df = unpivot(rd.from_arrow(t), ["k"], ["a", "b"],
                 value_type=pa.float64()).to_pandas()
    assert sorted(df["value"].tolist()) == [2.0, 2.5]


# ---------------------------------------------------------------------------
# sorted_join (zero-shuffle sort-merge join over range-sorted stores)
# ---------------------------------------------------------------------------

def _sorted_store(tmp, name, keys, vals, vname):
    import os

    import ray.data as rdd

    from xtract.ops.sorted_layout import write_sorted

    d = os.path.join(str(tmp), name)
    ds = rdd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        vname: pa.array(vals, pa.int64())})).repartition(4)
    write_sorted(ds, d, "k")
    return d


def test_sorted_join_matches_pandas(ray_session, tmp_path):
    import pandas as pd

    from xtract.ops.sorted_layout import sorted_join

    rng = np.random.default_rng(59)
    ka = rng.integers(0, 60, 200)
    kb = rng.integers(30, 90, 150)   # partial key overlap
    da = _sorted_store(tmp_path, "a", ka, np.arange(200), "va")
    db = _sorted_store(tmp_path, "b", kb, np.arange(150) * 10, "vb")
    got = sorted_join(da, db).to_pandas() \
        .sort_values(["k", "va", "vb"]).reset_index(drop=True)
    want = (pd.DataFrame({"k": ka, "va": np.arange(200)})
            .merge(pd.DataFrame({"k": kb, "vb": np.arange(150) * 10}),
                   on="k", how="inner")
            .sort_values(["k", "va", "vb"]).reset_index(drop=True))
    # column order may differ; right key column name collides to k
    assert sorted(got.columns) == sorted(want.columns)
    assert got[want.columns.tolist()].equals(want)


def test_sorted_join_no_overlap_empty_with_schema(ray_session,
                                                  tmp_path):
    from xtract.ops.sorted_layout import sorted_join

    da = _sorted_store(tmp_path, "a2", [1, 2, 3], [1, 2, 3], "va")
    db = _sorted_store(tmp_path, "b2", [100, 101], [5, 6], "vb")
    out = sorted_join(da, db)
    # Dataset keeps the merged schema; (to_pandas on a 0-row Dataset
    # drops columns — a Ray quirk, so assert on the Dataset schema)
    assert set(out.schema().names) >= {"k", "va", "vb"}
    assert out.count() == 0


def test_sorted_join_duplicate_keys_multiplicity(ray_session,
                                                 tmp_path):
    from xtract.ops.sorted_layout import sorted_join

    da = _sorted_store(tmp_path, "a3", [5, 5, 7], [1, 2, 3], "va")
    db = _sorted_store(tmp_path, "b3", [5, 5, 9], [10, 20, 30], "vb")
    df = sorted_join(da, db).to_pandas()
    # 2 left fives x 2 right fives = 4 rows
    assert len(df) == 4 and (df["k"] == 5).all()


# ---------------------------------------------------------------------------
# intersect_distinct / except_distinct / pseudonymize
# ---------------------------------------------------------------------------

def test_set_ops_match_python_sets(ray_session):
    from xtract.ops.agg import except_distinct, intersect_distinct

    a = rd.from_arrow(pa.table({
        "x": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "y": pa.array(["a", "a", "b", "c", "d"], pa.string())}))
    b = rd.from_arrow(pa.table({
        "x": pa.array([2, 3, 3, 9], pa.int64()),
        "y": pa.array(["b", "zzz", "c", "j"], pa.string())}))
    inter = intersect_distinct(a, b, ["x", "y"]).to_pandas()
    got_i = {tuple(r) for r in inter.itertuples(index=False)}
    assert got_i == {(2, "b"), (3, "c")}
    ex = except_distinct(a, b, ["x", "y"]).to_pandas()
    got_e = {tuple(r) for r in ex.itertuples(index=False)}
    assert got_e == {(1, "a"), (4, "d")}


def test_set_ops_partition_invariance(ray_session):
    from xtract.ops.agg import intersect_distinct

    rng = np.random.default_rng(61)
    ta = pa.table({"x": pa.array(rng.integers(0, 40, 300), pa.int64())})
    tb = pa.table({"x": pa.array(rng.integers(20, 60, 300), pa.int64())})
    a1 = intersect_distinct(rd.from_arrow(ta).repartition(1),
                            rd.from_arrow(tb).repartition(1),
                            ["x"]).to_pandas().sort_values("x") \
        .reset_index(drop=True)
    a2 = intersect_distinct(rd.from_arrow(ta).repartition(7),
                            rd.from_arrow(tb).repartition(5),
                            ["x"]).to_pandas().sort_values("x") \
        .reset_index(drop=True)
    assert a1.equals(a2)


def test_pseudonymize_stable_and_null_safe(ray_session):
    import hashlib

    from xtract.ops.pii import pseudonymize

    ds = rd.from_arrow(pa.table({
        "uid": pa.array([7, 7, None, 9], pa.int64()),
        "keep": pa.array([1, 2, 3, 4], pa.int64())}))
    df = pseudonymize(ds, ["uid"], salt="s").to_pandas()
    want7 = hashlib.sha256(b"s7").hexdigest()
    assert df["uid"].tolist()[:2] == [want7, want7]
    assert df["uid"].isna().tolist() == [False, False, True, False]
    assert df["keep"].tolist() == [1, 2, 3, 4]


# ---------------------------------------------------------------------------
# grouped_ordered_concat
# ---------------------------------------------------------------------------

def test_grouped_ordered_concat_vs_brute(ray_session):
    from xtract.ops.agg import grouped_ordered_concat

    rng = np.random.default_rng(71)
    rows = [(int(rng.integers(0, 8)), int(ts),
             ["a", "b", "c"][int(rng.integers(0, 3))])
            for ts in range(120)]
    ds = rd.from_arrow(pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "ev": pa.array([r[2] for r in rows], pa.string())}))
    df = grouped_ordered_concat(ds, "u", "ev", ["ts"]).to_pandas()
    got = {r.u: (r.path, r.n_items) for r in df.itertuples()}
    want = {}
    for u, ts, ev in sorted(rows, key=lambda r: (r[0], r[1])):
        p, n = want.get(u, ("", 0))
        want[u] = (p + ("|" if p else "") + ev, n + 1)
    assert got == want


def test_grouped_ordered_concat_partition_invariance(ray_session):
    from xtract.ops.agg import grouped_ordered_concat

    rng = np.random.default_rng(73)
    t = pa.table({
        "u": pa.array(rng.integers(0, 6, 100), pa.int64()),
        "ts": pa.array(rng.permutation(100), pa.int64()),
        "ev": pa.array([str(x) for x in rng.integers(0, 4, 100)],
                       pa.string())})
    a = grouped_ordered_concat(rd.from_arrow(t).repartition(1),
                               "u", "ev", ["ts"],
                               num_partitions=2).to_pandas() \
        .sort_values("u").reset_index(drop=True)
    b = grouped_ordered_concat(rd.from_arrow(t).repartition(7),
                               "u", "ev", ["ts"],
                               num_partitions=11).to_pandas() \
        .sort_values("u").reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# association_rules
# ---------------------------------------------------------------------------

def _assoc_brute(rows, cap=64):
    baskets = {}
    for k, i in rows:
        baskets.setdefault(k, set()).add(i)
    nk = len(baskets)
    sup = {}
    for items in baskets.values():
        for i in items:
            sup[i] = sup.get(i, 0) + 1
    out = {}
    for items in baskets.values():
        if len(items) < 2 or len(items) > cap:
            continue
        for a in items:
            for b in items:
                if a != b:
                    out[(a, b)] = out.get((a, b), 0) + 1
    return {
        (a, b): (c, sup[a], sup[b], nk,
                 1_000_000 * c // sup[a],
                 1_000_000 * c * nk // (sup[a] * sup[b]))
        for (a, b), c in out.items()}


def test_association_rules_vs_brute(ray_session):
    from xtract.ops.behavior import association_rules

    rng = np.random.default_rng(79)
    rows = [(int(rng.integers(0, 25)),
             ["x", "y", "z", "w"][int(rng.integers(0, 4))])
            for _ in range(300)]
    ds = rd.from_arrow(pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "it": pa.array([r[1] for r in rows], pa.string())}))
    df = association_rules(ds, "u", "it").to_pandas()
    got = {(r.item_a, r.item_b): (r.n_both, r.n_a, r.n_b, r.n_keys,
                                  r.conf_ppm, r.lift_ppm)
           for r in df.itertuples()}
    assert got == _assoc_brute(rows)


def test_association_rules_basket_cap(ray_session):
    from xtract.ops.behavior import association_rules

    rows = ([(1, f"i{k}") for k in range(10)]   # oversized basket
            + [(2, "a"), (2, "b"), (3, "a"), (3, "b")])
    ds = rd.from_arrow(pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "it": pa.array([r[1] for r in rows], pa.string())}))
    df = association_rules(ds, "u", "it",
                           max_items_per_key=5).to_pandas()
    got = {(r.item_a, r.item_b) for r in df.itertuples()}
    assert got == {("a", "b"), ("b", "a")}
    # n_keys still counts the dropped basket (support semantics)
    assert set(df["n_keys"]) == {3}


# ---------------------------------------------------------------------------
# decayed_counts
# ---------------------------------------------------------------------------

def test_decayed_counts_vs_brute(ray_session):
    from xtract.ops.behavior import decayed_counts

    ref = 1_000_000 * 86_400 * 100          # day 100, epoch us
    rng = np.random.default_rng(97)
    rows = [(int(rng.integers(0, 6)),
             int(ref - rng.integers(0, 50) * 86_400 * 1_000_000),
             int(rng.integers(1, 5))) for _ in range(200)]
    ds = rd.from_arrow(pa.table({
        "h": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "v": pa.array([r[2] for r in rows], pa.int64())}))
    df = decayed_counts(ds, "h", "ts", ref, value_col="v",
                        age_cap=30).to_pandas()
    got = {r.h: (r.decayed, r.n_rows) for r in df.itertuples()}
    want = {}
    for h, ts, v in rows:
        age = min((ref - ts) // (86_400 * 1_000_000), 30)
        s, n = want.get(h, (0, 0))
        want[h] = (s + (v << (30 - age)), n + 1)
    assert got == want


def test_decayed_counts_partition_invariance(ray_session):
    from xtract.ops.behavior import decayed_counts

    ref = 86_400 * 1_000_000 * 10
    t = pa.table({
        "h": pa.array([1, 1, 2, 2, 2] * 20, pa.int64()),
        "ts": pa.array([ref - i * 3_600_000_000 for i in range(100)],
                       pa.timestamp("us"))})
    a = decayed_counts(rd.from_arrow(t).repartition(1), "h", "ts",
                       ref).to_pandas().sort_values("h") \
        .reset_index(drop=True)
    b = decayed_counts(rd.from_arrow(t).repartition(9), "h", "ts",
                       ref).to_pandas().sort_values("h") \
        .reset_index(drop=True)
    assert a.equals(b)
