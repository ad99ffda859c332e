"""Round-3 session-4 ops: robots.txt crawl policy, sentence explode,
broadcast range lookup."""

import numpy as np
import pyarrow as pa

from xtract.ops.robots import (apply_robots, parse_robots, robots_allowed,
                               split_host_path)
from xtract.ops.textstats import split_sentences_batch

ROBOTS = """\
# crawl policy
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp

User-agent: otherbot
User-agent: xbot
Disallow: /xonly/   # inline comment
Allow: /

Sitemap: https://example.org/sitemap.xml
"""


def test_parse_robots_group_selection():
    star = parse_robots(ROBOTS, "randombot")
    assert ("/private/", False) in star and ("/tmp", False) in star
    assert ("/private/ok/", True) in star
    # specific group wins outright (star rules do NOT leak in)
    xbot = parse_robots(ROBOTS, "XBot")
    assert xbot == [("/", True), ("/xonly/", False)]
    # stacked user-agent lines share the group
    assert parse_robots(ROBOTS, "otherbot") == xbot
    # no groups at all → allow everything
    assert parse_robots("Sitemap: https://x/s.xml", "xbot") == []
    # rules before any user-agent line are ignored; empty values too
    assert parse_robots("Disallow: /a\nUser-agent: *\nDisallow:", "z") == []


def test_robots_longest_match_and_ties():
    rules = parse_robots(ROBOTS, "randombot")
    paths = np.asarray(
        ["/", "/private/x", "/private/ok/y", "/tmpfile", "/other"], dtype=str)
    assert robots_allowed(rules, paths).tolist() == [
        True, False, True, False, True]
    # equal-length allow vs disallow → allow wins
    tie = parse_robots("User-agent: *\nDisallow: /abc\nAllow: /abc", "z")
    assert robots_allowed(tie, np.asarray(["/abcd"], dtype=str)).tolist() == [
        True]


def test_split_host_path():
    assert split_host_path("https://H3.Example.org/p/9?q=1") == (
        "h3.example.org", "/p/9?q=1")
    assert split_host_path("https://example.org") == ("example.org", "/")


def test_apply_robots_cogroup(ray_session):
    import ray.data as rd

    pages = rd.from_arrow(pa.table({
        "url": [
            "https://a.org/private/1",      # denied by a.org
            "https://a.org/private/ok/2",   # allowed (longer Allow)
            "https://a.org/free",           # allowed (no match)
            "https://b.org/private/1",      # allowed (no robots row)
            "https://c.org/anything",       # denied (xbot group Disallow /)
        ]}))
    robots = rd.from_arrow(pa.table({
        "host": ["a.org", "c.org"],
        "robots_txt": [
            "User-agent: *\nDisallow: /private/\nAllow: /private/ok/",
            "User-agent: xbot\nDisallow: /",
        ]}))
    out = apply_robots(pages, robots, agent="xbot").to_pandas()
    got = dict(zip(out["url"], out["crawl_allowed"]))
    assert got == {
        "https://a.org/private/1": False,
        "https://a.org/private/ok/2": True,
        "https://a.org/free": True,
        "https://b.org/private/1": True,
        "https://c.org/anything": False,
    }
    assert set(out.columns) == {"url", "host", "path", "crawl_allowed"}


def test_split_sentences_batch_rule():
    b = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["Hello. World!! Are you ok? yes",
                           "...abc", None, "???"]})
    out = split_sentences_batch(b).to_pydict()
    assert out["sentence"] == ["Hello.", "World!!", "Are you ok?", "yes",
                               "abc"]
    assert out["sent_idx"] == [0, 1, 2, 3, 0]
    assert out["n_chars"] == [6, 7, 11, 3, 3]
    assert out["doc_id"] == [1, 1, 1, 1, 2]


def test_range_lookup_broadcast(ray_session):
    import pandas as pd
    import ray.data as rd

    from xtract.ops.joins import range_lookup_broadcast

    ds = rd.from_arrow(pa.table({"v": [-5, 0, 499, 500, 1999, 5000, 10**9]}))
    bands = pd.DataFrame({"lo": [0, 500, 2000], "hi": [500, 2000, 5000],
                          "label": ["micro", "small", "mid"]})
    out = range_lookup_broadcast(ds, "v", bands,
                                 default="other").to_pandas()
    assert out.sort_values("v")["label"].tolist() == [
        "other", "micro", "micro", "small", "small", "other", "other"]
    # overlap detection
    bad = pd.DataFrame({"lo": [0, 400], "hi": [500, 600],
                        "label": ["a", "b"]})
    import pytest

    with pytest.raises(ValueError):
        range_lookup_broadcast(ds, "v", bad)


def test_extract_sitemaps(ray_session):
    import ray.data as rd

    from xtract.ops.robots import extract_sitemaps

    robots = rd.from_arrow(pa.table({
        "host": ["a.org", "b.org", "c.org"],
        "robots_txt": [
            "User-agent: *\nDisallow: /x\nSitemap: https://a.org/s1.xml\n"
            "Sitemap: https://a.org/s2.xml  # comment",
            "User-agent: *\nAllow: /",
            None,
        ]}))
    out = extract_sitemaps(robots).to_pandas().sort_values(
        ["host", "rank"]).reset_index(drop=True)
    assert out["host"].tolist() == ["a.org", "a.org"]
    assert out["rank"].tolist() == [0, 1]
    assert out["sitemap_url"].tolist() == ["https://a.org/s1.xml",
                                           "https://a.org/s2.xml"]


def test_global_rank_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from xtract.ops.quantiles import global_rank

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 40, size=500)         # heavy ties
    t = pa.table({"doc_id": np.arange(500, dtype=np.int64),
                  "n": vals.astype(np.int64)})
    out = (global_rank(rd.from_arrow(t).repartition(7), "doc_id", "n")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    expect = pd.Series(vals).rank(method="min").astype(np.int64)
    assert out["rnk"].tolist() == expect.tolist()
    assert (out["n_rows"] == 500).all()
    # exact-count gate fails loudly
    import pytest

    with pytest.raises(ValueError):
        global_rank(rd.from_arrow(t), "doc_id", "doc_id", max_distinct=10)


def test_apply_robots_salted_identical(ray_session):
    import ray.data as rd

    from xtract.ops.robots import apply_robots

    # one hot host with many urls + one cold host
    urls = [f"https://hot.org/p{i % 3}/x/{i}" for i in range(300)] + [
        "https://cold.org/private/1"]
    pages = rd.from_arrow(pa.table({"url": urls})).repartition(5)
    robots = rd.from_arrow(pa.table({
        "host": ["hot.org", "cold.org"],
        "robots_txt": ["User-agent: *\nDisallow: /p1/\nAllow: /p1/x",
                       "User-agent: *\nDisallow: /private/"]}))
    plain = apply_robots(pages, robots, agent="bot").to_pandas()
    salted = apply_robots(pages, robots, agent="bot",
                          num_salts=4).to_pandas()
    key = ["url", "host", "path", "crawl_allowed"]
    a = plain[key].sort_values("url").reset_index(drop=True)
    b = salted[key].sort_values("url").reset_index(drop=True)
    assert a.equals(b)
    # sanity on the rules themselves: /p1/x... allowed (longer Allow)
    got = dict(zip(a["url"], a["crawl_allowed"]))
    assert got["https://hot.org/p1/x/1"]
    assert not got["https://cold.org/private/1"]
    assert got["https://hot.org/p0/x/0"]


def test_rfm_segments_scores(ray_session):
    import ray.data as rd

    from xtract.ops.behavior import rfm_segments

    n = 64
    t = pa.table({
        "user_id": np.arange(n, dtype=np.int64),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 10**6,
                       pa.timestamp("us")),
        "value": (np.arange(n, dtype=np.float64) + 1) / 4.0,
    })
    out = (rfm_segments(rd.from_arrow(t).repartition(5))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert len(out) == n
    for c in ("r_score", "f_score", "m_score"):
        assert out[c].between(1, 4).all()
    # distinct monotone metrics → exactly 16 users per quartile bucket
    assert out["r_score"].value_counts().tolist() == [16, 16, 16, 16]
    assert out["m_score"].value_counts().tolist() == [16, 16, 16, 16]
    # one event per user → every f_score identical
    assert out["f_score"].nunique() == 1
    # monotone: later users (more recent, higher spend) score higher
    assert (out["rfm"].to_numpy()[1:] >= out["rfm"].to_numpy()[:-1]).all()


def test_range_lookup_empty_ranges(ray_session):
    import pandas as pd
    import ray.data as rd

    from xtract.ops.joins import range_lookup_broadcast

    ds = rd.from_arrow(pa.table({"v": [1, 2, 3]}))
    empty = pd.DataFrame({"lo": [], "hi": [], "label": []})
    out = range_lookup_broadcast(ds, "v", empty, default="none").to_pandas()
    assert out["label"].tolist() == ["none"] * 3
