"""Session-11 ops: form-field extraction and exact local clustering
coefficients."""

import itertools

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.tables import extract_forms_one

# ---------------------------------------------------------------------------
# extract_forms_one (pure function)
# ---------------------------------------------------------------------------

PAGE = "https://h.example.org/p/1"


def test_forms_basic_resolution_and_defaults():
    h = (b"<html><head><base href='/app/'></head><body>"
         b"<form action='go' method='POST'>"
         b"<input name='q' type='Text' required>"
         b"<select name='s'></select>"
         b"<textarea name='t'></textarea>"
         b"<button name='b' type='submit'></button>"
         b"</form></body></html>")
    rows = extract_forms_one(h, PAGE)
    assert rows == [
        (0, 0, "https://h.example.org/app/go", "post", "input", "q",
         "text", True),
        (0, 1, "https://h.example.org/app/go", "post", "select", "s",
         "", False),
        (0, 2, "https://h.example.org/app/go", "post", "textarea", "t",
         "", False),
        (0, 3, "https://h.example.org/app/go", "post", "button", "b",
         "", False),
    ]


def test_forms_missing_action_submits_to_page_url_not_base():
    h = (b"<html><head><base href='/app/'></head><body>"
         b"<form><input name='x'></form></body></html>")
    rows = extract_forms_one(h, PAGE)
    assert rows == [(0, 0, PAGE, "get", "input", "x", "text", False)]


def test_forms_fields_outside_any_form_skipped():
    h = b"<body><input name='loose'><form action='a'><input name='in'></form>"
    rows = extract_forms_one(h, PAGE)
    assert [r[5] for r in rows] == ["in"]


def test_forms_new_form_start_closes_open_one():
    # browsers ignore nested <form> tags: the second start takes over
    h = (b"<form action='one'><input name='a'>"
         b"<form action='two'><input name='b'></form>")
    rows = extract_forms_one(h, PAGE)
    assert rows[0][:3] == (0, 0, "https://h.example.org/p/one")
    assert rows[1][0] == 1 and rows[1][2] == "https://h.example.org/p/two"
    assert rows[1][1] == 0  # field_idx restarts per form


def test_forms_self_closing_form_holds_no_fields():
    h = b"<form action='a'/><input name='x'>"
    assert extract_forms_one(h, PAGE) == []


def test_forms_input_type_default_and_lowering():
    h = b"<form action='a'><input name='u' type='EMAIL'><input name='v'></form>"
    rows = extract_forms_one(h, PAGE)
    assert [(r[5], r[6]) for r in rows] == [("u", "email"), ("v", "text")]


def test_forms_after_close_fields_skipped():
    h = b"<form action='a'><input name='in'></form><input name='out'>"
    rows = extract_forms_one(h, PAGE)
    assert [r[5] for r in rows] == ["in"]


def test_forms_dataset_explode(ray_session):
    from xtract.tables import extract_forms

    pages = rd.from_arrow(pa.table({
        "url": pa.array([PAGE, "https://h2.example.org/"], pa.string()),
        "html": pa.array(
            [b"<form action='a'><input name='x' required></form>",
             b"<p>no forms</p>"], pa.binary())}))
    out = extract_forms(pages).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["url"], r["field_name"], bool(r["required"])) == (
        PAGE, "x", True)
    assert r["action"] == "https://h.example.org/p/a"


# ---------------------------------------------------------------------------
# clustering_coefficients
# ---------------------------------------------------------------------------

def _brute_clustering(edges):
    """Exact (node -> (tri, wedges)) over distinct undirected edges."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for n, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        tri = sum(1 for a, b in itertools.combinations(sorted(nb), 2)
                  if tuple(sorted((a, b))) in und)
        out[n] = (tri, d * (d - 1) // 2)
    return out


def _run_cc(edges, ray_session, **kw):
    from xtract.ops.graph import clustering_coefficients

    src = pa.array([e[0] for e in edges], pa.int64())
    dst = pa.array([e[1] for e in edges], pa.int64())
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    df = clustering_coefficients(ds, **kw).to_pandas()
    return {int(r.node): (int(r.n_triangles), int(r.n_wedges))
            for r in df.itertuples()}


def test_clustering_triangle_plus_pendant(ray_session):
    # triangle 1-2-3 plus pendant 3-4: node 3 has deg 3 -> 3 wedges
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    got = _run_cc(edges, ray_session)
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 3)}


def test_clustering_dupes_direction_selfloops_ignored(ray_session):
    edges = [(1, 2), (2, 1), (1, 1), (2, 3), (3, 1), (1, 2), (1, 2)]
    got = _run_cc(edges, ray_session)
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 1)}


def test_clustering_vs_brute_random(ray_session):
    rng = np.random.default_rng(7)
    edges = [tuple(x) for x in rng.integers(0, 25, size=(200, 2))]
    got = _run_cc(edges, ray_session)
    assert got == _brute_clustering(edges)


def test_clustering_cogroup_path_matches_broadcast(ray_session):
    rng = np.random.default_rng(11)
    edges = [tuple(x) for x in rng.integers(0, 20, size=(120, 2))]
    a = _run_cc(edges, ray_session)
    b = _run_cc(edges, ray_session, broadcast_limit=1)  # force co-group
    assert a == b


# ---------------------------------------------------------------------------
# butterfly_counts
# ---------------------------------------------------------------------------

def _brute_butterflies(pairs):
    """pairs = [(group, item)] -> {item: butterflies} exact."""
    from collections import defaultdict

    groups = defaultdict(set)
    for o, p in pairs:
        groups[o].add(p)
    co = defaultdict(int)
    for items in groups.values():
        for a, b in itertools.combinations(sorted(items), 2):
            co[(a, b)] += 1
    out = defaultdict(int)
    for (a, b), n in co.items():
        bf = n * (n - 1) // 2
        if bf:
            out[a] += bf
            out[b] += bf
    return dict(out)


def _run_bf(pairs, ray_session, **kw):
    from xtract.ops.graph import butterfly_counts

    ds = rd.from_arrow(pa.table({
        "g": pa.array([p[0] for p in pairs], pa.int64()),
        "i": pa.array([p[1] for p in pairs], pa.int64())}))
    df = butterfly_counts(ds, "g", "i", **kw).to_pandas()
    return {int(r.item): int(r.n_butterflies) for r in df.itertuples()}


def test_butterflies_single_square(ray_session):
    # two groups each containing items {1, 2} -> one butterfly each
    pairs = [(10, 1), (10, 2), (20, 1), (20, 2), (30, 3)]
    assert _run_bf(pairs, ray_session) == {1: 1, 2: 1}


def test_butterflies_duplicates_collapse(ray_session):
    # duplicated (group, item) rows must not inflate counts
    pairs = [(10, 1), (10, 1), (10, 2), (20, 1), (20, 2), (20, 2)]
    assert _run_bf(pairs, ray_session) == {1: 1, 2: 1}


def test_butterflies_vs_brute_random(ray_session):
    rng = np.random.default_rng(13)
    pairs = [tuple(x) for x in np.column_stack([
        rng.integers(0, 40, 300), rng.integers(0, 15, 300)])]
    got = _run_bf(pairs, ray_session, num_partitions=7)
    assert got == _brute_butterflies(pairs)


# ---------------------------------------------------------------------------
# param_cardinality
# ---------------------------------------------------------------------------

def test_param_cardinality_counts(ray_session):
    from xtract.ops.urls import param_cardinality

    urls = [
        "https://A.example.org/x?sid=1&page=1",
        "https://a.example.org/y?sid=2&page=1",   # host case-folds
        "https://a.example.org/z?sid=3&page=2&empty=",
        "https://b.example.org/?sid=9",
        None, "",                                  # skipped
        "https://a.example.org/k",                 # no query
    ]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    df = param_cardinality(ds).to_pandas()
    got = {(r.host, r.param): (int(r.n_values), int(r.n_urls))
           for r in df.itertuples()}
    assert got == {
        ("a.example.org", "sid"): (3, 3),
        ("a.example.org", "page"): (2, 3),
        ("a.example.org", "empty"): (1, 1),   # blank value kept
        ("b.example.org", "sid"): (1, 1),
    }


def test_param_cardinality_repeated_values_counted_once(ray_session):
    from xtract.ops.urls import param_cardinality

    urls = ["https://h.org/?v=1"] * 5 + ["https://h.org/?v=2"]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    df = param_cardinality(ds).to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert (int(r.n_values), int(r.n_urls)) == (2, 6)


# ---------------------------------------------------------------------------
# extract_hreflang
# ---------------------------------------------------------------------------

def test_hreflang_basics():
    from xtract.links import extract_hreflang_one

    h = (b"<html><head><base href='/l/'>"
         b"<link rel='Alternate' hreflang='EN-us' href='en'>"
         b"<link rel='alternate' hreflang='de' href='/de/x'>"
         b"<link rel='alternate' href='feed.xml'>"
         b"<link hreflang='fr' href='no-rel'>"
         b"<link rel='canonical' href='c'></head></html>")
    rows = extract_hreflang_one(h, "https://h.org/p/1")
    assert rows == [("en-us", "https://h.org/l/en"),
                    ("de", "https://h.org/de/x")]


def test_hreflang_dataset_explode(ray_session):
    from xtract.links import extract_hreflang

    pages = rd.from_arrow(pa.table({
        "url": pa.array(["https://a.org/", "https://b.org/"], pa.string()),
        "html": pa.array(
            [b"<link rel='alternate' hreflang='ES' href='s'>",
             b"<p>none</p>"], pa.binary())}))
    out = extract_hreflang(pages).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["url"], int(r["rank"]), r["hreflang"], r["href"]) == (
        "https://a.org/", 0, "es", "https://a.org/s")


# ---------------------------------------------------------------------------
# extract_rel_next
# ---------------------------------------------------------------------------

def test_rel_next_first_wins_and_resolution():
    from xtract.links import extract_rel_next_one

    h = (b"<html><head><base href='/a/'>"
         b"<link rel='Next' href='6'><link rel='next' href='7'>"
         b"</head></html>")
    assert extract_rel_next_one(h, "https://h.org/p/5") == "https://h.org/a/6"
    assert extract_rel_next_one(b"<link rel='prev' href='4'>",
                                "https://h.org/p/5") is None


def test_rel_next_dataset_pages_without_next_emit_no_row(ray_session):
    from xtract.links import extract_rel_next

    pages = rd.from_arrow(pa.table({
        "url": pa.array(["https://h.org/p/1", "https://h.org/p/2"],
                        pa.string()),
        "html": pa.array([b"<link rel='next' href='2'>", b"<p>end</p>"],
                         pa.binary())}))
    out = extract_rel_next(pages).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["next_url"] == "https://h.org/p/2"


# ---------------------------------------------------------------------------
# extract_opengraph
# ---------------------------------------------------------------------------

def test_opengraph_first_wins_unescape_and_filter():
    from xtract.links import extract_opengraph_one

    h = (b"<meta property='og:Title' content='A &amp; B'>"
         b"<meta property='og:title' content='dup'>"
         b"<meta name='twitter:card' content='summary'>"
         b"<meta property='article:author' content='x'>"
         b"<meta property='og:image' content=''>"
         b"<meta name='description' content='not og'>")
    assert extract_opengraph_one(h) == [
        ("og:title", "A & B"), ("twitter:card", "summary"),
        ("article:author", "x")]


def test_opengraph_dataset_explode(ray_session):
    from xtract.links import extract_opengraph

    pages = rd.from_arrow(pa.table({
        "url": pa.array(["https://a.org/"], pa.string()),
        "html": pa.array([b"<meta property='og:type' content='web'>"],
                         pa.binary())}))
    out = extract_opengraph(pages).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["property"], out.iloc[0]["content"]) == (
        "og:type", "web")


# ---------------------------------------------------------------------------
# grouped_value_profile
# ---------------------------------------------------------------------------

def _brute_profile(pairs):
    from collections import Counter, defaultdict

    byk = defaultdict(list)
    for k, v in pairs:
        byk[k].append(v)
    out = {}
    for k, vals in byk.items():
        c = Counter(vals)
        mode = min(c, key=lambda v: (-c[v], v))
        out[k] = (len(vals), len(c), mode, c[mode])
    return out


def _run_profile(pairs, ray_session, **kw):
    from xtract.ops.agg import grouped_value_profile

    ds = rd.from_arrow(pa.table({
        "k": pa.array([p[0] for p in pairs], pa.string()),
        "v": pa.array([p[1] for p in pairs], pa.string())}))
    df = grouped_value_profile(ds, "k", "v", **kw).to_pandas()
    return {r.k: (int(r.n_rows), int(r.n_values), r.mode, int(r.mode_n))
            for r in df.itertuples()}


def test_profile_tie_breaks_lexicographic(ray_session):
    pairs = [("a", "y"), ("a", "x"), ("b", "q"), ("b", "p"),
             ("b", "q"), ("b", "p")]
    got = _run_profile(pairs, ray_session)
    assert got == {"a": (2, 2, "x", 1), "b": (4, 2, "p", 2)}


def test_profile_vs_brute_random(ray_session):
    rng = np.random.default_rng(17)
    pairs = [(f"k{int(a)}", f"v{int(b)}") for a, b in np.column_stack(
        [rng.integers(0, 12, 400), rng.integers(0, 6, 400)])]
    got = _run_profile(pairs, ray_session, num_partitions=5)
    assert got == _brute_profile(pairs)


# ---------------------------------------------------------------------------
# grouped_weighted_median
# ---------------------------------------------------------------------------

def _brute_wmedian(rows):
    from collections import defaultdict

    byk = defaultdict(list)
    for k, v, w in rows:
        byk[k].append((v, w))
    out = {}
    for k, vw in byk.items():
        agg = defaultdict(int)
        for v, w in vw:
            agg[v] += w
        total = sum(agg.values())
        tgt = (total + 1) // 2
        cum = 0
        for v in sorted(agg):
            cum += agg[v]
            if cum >= tgt:
                out[k] = (v, total)
                break
    return out


def _run_wm(rows, ray_session, **kw):
    from xtract.ops.quantiles import grouped_weighted_median

    ds = rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.string()),
        "v": pa.array([r[1] for r in rows], pa.int64()),
        "w": pa.array([r[2] for r in rows], pa.int64())}))
    df = grouped_weighted_median(ds, "k", "v", "w", **kw).to_pandas()
    return {r.k: (int(r.wmedian), int(r.total_w)) for r in df.itertuples()}


def test_wmedian_heavy_row_dominates(ray_session):
    rows = [("a", 1, 1), ("a", 2, 1), ("a", 100, 1),
            ("b", 5, 10), ("b", 7, 1)]
    assert _run_wm(rows, ray_session) == {"a": (2, 3), "b": (5, 11)}


def test_wmedian_even_total_takes_lower(ray_session):
    # W=4 -> tgt=2 -> running weight hits 2 at v=1
    rows = [("a", 1, 2), ("a", 9, 2)]
    assert _run_wm(rows, ray_session) == {"a": (1, 4)}


def test_wmedian_vs_brute_random(ray_session):
    rng = np.random.default_rng(23)
    rows = [(f"k{int(a)}", int(b), int(c)) for a, b, c in np.column_stack(
        [rng.integers(0, 8, 300), rng.integers(-50, 50, 300),
         rng.integers(1, 9, 300)])]
    got = _run_wm(rows, ray_session, num_partitions=5)
    assert got == _brute_wmedian(rows)


# ---------------------------------------------------------------------------
# bipartite_components
# ---------------------------------------------------------------------------

def _brute_bipartite(edges):
    """{component_min_node: (is_bipartite, n_nodes)} by BFS 2-coloring."""
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    seen, out = set(), {}
    for s in sorted(adj):
        if s in seen:
            continue
        color = {s: 0}
        comp = [s]
        ok = True
        q = deque([s])
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in color:
                    color[y] = color[x] ^ 1
                    comp.append(y)
                    q.append(y)
                elif color[y] == color[x]:
                    ok = False
        seen.update(comp)
        out[min(comp)] = (ok, len(comp))
    return out


def _run_bip(edges, ray_session, **kw):
    from xtract.ops.graph import bipartite_components

    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())}))
    df = bipartite_components(ds, **kw).to_pandas()
    return {int(r.component): (bool(r.is_bipartite), int(r.n_nodes))
            for r in df.itertuples()}


def test_bipartite_shapes(ray_session):
    edges = [(1, 2), (2, 3), (3, 1),            # triangle: odd
             (10, 11), (11, 12), (12, 13), (13, 10),  # square: even
             (20, 21)]                           # path: even
    assert _run_bip(edges, ray_session) == {
        1: (False, 3), 10: (True, 4), 20: (True, 2)}


def test_bipartite_selfloop_and_dupes_ignored(ray_session):
    edges = [(5, 5), (5, 6), (6, 5), (5, 6)]
    assert _run_bip(edges, ray_session) == {5: (True, 2)}


def test_bipartite_vs_brute_random(ray_session):
    rng = np.random.default_rng(31)
    edges = [tuple(x) for x in rng.integers(0, 30, size=(60, 2))]
    edges = [e for e in edges if e[0] != e[1]]
    assert _run_bip(edges, ray_session) == _brute_bipartite(edges)


# ---------------------------------------------------------------------------
# winnow_fingerprints
# ---------------------------------------------------------------------------

def _brute_winnow(text, k, w):
    from xtract.ops.textstats import rolling_hashes

    hv = rolling_hashes(text.encode(), k)
    if len(hv) < w:
        return set()
    sel = set()
    for e in range(w - 1, len(hv)):
        lo = e - w + 1
        m = min(hv[lo:e + 1])
        pos = max(i for i in range(lo, e + 1) if hv[i] == m)
        sel.add((pos + k - 1, hv[pos]))
    return sel


def _run_winnow(texts, ray_session, k, w):
    from xtract.ops.textstats import winnow_fingerprints

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    df = winnow_fingerprints(ds, k=k, w=w).to_pandas()
    if df.empty:
        return {i: set() for i in range(len(texts))}
    return {i: {(int(r.pos), int(r.fp)) for r in df[df.doc_id == i]
                .itertuples()} for i in range(len(texts))}


def test_winnow_vs_brute(ray_session):
    texts = ["abracadabra abracadabra xyz repeated phrase here",
             "the quick brown fox jumps over the lazy dog again and again"]
    got = _run_winnow(texts, ray_session, k=4, w=3)
    for i, t in enumerate(texts):
        assert got[i] == _brute_winnow(t, 4, 3)


def test_winnow_short_doc_emits_nothing(ray_session):
    # len < k+w-1 -> fewer than w hashes -> no selections
    got = _run_winnow(["abcde"], ray_session, k=4, w=3)
    assert got[0] == set()


def test_winnow_shared_substring_shares_fingerprint(ray_session):
    # the guarantee: a shared substring of length >= k+w-1 yields a
    # common (fp) value across both docs
    shared = "zqxwvutsrqponmlk"  # 16 chars >= 4+3-1
    got = _run_winnow(["AAA " + shared + " BBB",
                       "CCCCC " + shared + " DD"], ray_session, k=4, w=3)
    fps0 = {fp for _, fp in got[0]}
    fps1 = {fp for _, fp in got[1]}
    assert fps0 & fps1


# ---------------------------------------------------------------------------
# pure-kernel property tests (no Ray)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 7), min_size=1, max_size=60),
       st.integers(1, 6))
def test_winnow_select_matches_bruteforce(hashes, w):
    from xtract.ops.textstats import winnow_select

    hv = np.array(hashes, np.uint64)
    got = winnow_select(hv, w).tolist()
    sel = set()
    for e in range(w - 1, len(hv)):
        lo = e - w + 1
        m = min(hashes[lo:e + 1])
        sel.add(max(i for i in range(lo, e + 1) if hashes[i] == m))
    assert got == sorted(sel)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 7), min_size=1, max_size=60),
       st.integers(1, 6))
def test_winnow_select_density_and_coverage(hashes, w):
    # every window must contain >= 1 selection (the coverage guarantee)
    from xtract.ops.textstats import winnow_select

    hv = np.array(hashes, np.uint64)
    got = set(winnow_select(hv, w).tolist())
    if len(hv) < w:
        assert got == set()
        return
    for e in range(w - 1, len(hv)):
        assert got & set(range(e - w + 1, e + 1))


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_forms_extractor_never_raises_on_garbage(blob):
    from xtract.tables import extract_forms_one

    rows = extract_forms_one(blob, "https://h.org/p/1")
    # invariants: form_idx nondecreasing; field_idx restarts per form
    last_form = -1
    expect_field = 0
    for r in rows:
        if r[0] != last_form:
            assert r[0] > last_form
            last_form = r[0]
            expect_field = 0
        assert r[1] == expect_field
        expect_field += 1


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_hreflang_opengraph_relnext_never_raise(blob):
    from xtract.links import (extract_hreflang_one, extract_opengraph_one,
                              extract_rel_next_one)

    extract_hreflang_one(blob, "https://h.org/")
    extract_opengraph_one(blob)
    extract_rel_next_one(blob, "https://h.org/")


# ---------------------------------------------------------------------------
# read_union_evolved
# ---------------------------------------------------------------------------

def test_union_evolved_widen_and_null_fill(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from xtract.sources import read_union_evolved

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    pq.write_table(pa.table({
        "id": pa.array([1, 2], pa.int32()),
        "v": pa.array([1.5, 2.5], pa.float64())}), a / "p.parquet")
    pq.write_table(pa.table({
        "id": pa.array([3], pa.int64()),
        "v": pa.array([3.5], pa.float64()),
        "extra": pa.array(["x"], pa.string())}), b / "p.parquet")
    out = read_union_evolved([str(a), str(b)]).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert list(out.columns) == ["id", "v", "extra"]
    assert out["id"].tolist() == [1, 2, 3]
    assert out["extra"].tolist()[:2] == [None, None]
    assert out["extra"].tolist()[2] == "x"


def test_union_evolved_int_float_widens_to_double(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from xtract.sources import read_union_evolved

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}),
                   a / "p.parquet")
    pq.write_table(pa.table({"x": pa.array([0.5], pa.float32())}),
                   b / "p.parquet")
    ds = read_union_evolved([str(a), str(b)])
    out = ds.to_pandas()
    assert sorted(out["x"].tolist()) == [0.5, 1.0]


def test_union_evolved_incompatible_types_fail_loudly(ray_session,
                                                      tmp_path):
    import pyarrow.parquet as pq
    import pytest as _pytest

    from xtract.sources import read_union_evolved

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}),
                   a / "p.parquet")
    pq.write_table(pa.table({"x": pa.array(["s"], pa.string())}),
                   b / "p.parquet")
    with _pytest.raises(ValueError, match="cannot unify"):
        read_union_evolved([str(a), str(b)])


# ---------------------------------------------------------------------------
# <template> inert-content rule (segmenter)
# ---------------------------------------------------------------------------

def _raw_text(h: bytes) -> str:
    from xtract.config import ExtractionConfig
    from xtract.extract import extract_document

    return extract_document(h, None, None,
                            ExtractionConfig(seg_mode="raw"))["content_text"]


def test_template_content_inert():
    h = (b"<p>before</p><template><p>hidden</p><br>"
         b"<div>also hidden</div></template><p>after</p>")
    assert _raw_text(h) == "before\n\nafter"


def test_template_nested_and_tail_recovery():
    nested = (b"<p>a</p><template><template><p>x</p></template>"
              b"<p>y</p></template><p>b</p>")
    assert _raw_text(nested) == "a\n\nb"
    # unterminated template suppresses the remainder (the unterminated-
    # comment recovery convention)
    assert _raw_text(b"<p>a</p><template><p>x</p>") == "a"


def test_template_oracle_pipeline_agree(ray_session):
    import ray.data as rd

    from xtract.config import ExtractionConfig
    from xtract.oracle import oracle_corpus
    from xtract.pipeline import extract_pages

    rows = [{"url": f"https://t.org/{i}",
             "warc_ts": None,
             "html": (f"<p>keep {i}</p><template><p>drop {i}</p>"
                      "</template>").encode(),
             "text": None, "lang": None} for i in range(8)]
    pages = rd.from_items(rows)
    cfg = ExtractionConfig(seg_mode="raw")
    dist = {r.url: r.content_text
            for r in extract_pages(pages, cfg).to_pandas().itertuples()}
    gold = {g["url"]: g["content_text"]
            for g in oracle_corpus(rows, cfg)}
    assert dist == gold
    assert all(v == f"keep {i}" for i, v in
               enumerate(dist[f"https://t.org/{i}"] for i in range(8)))


def test_hidden_attribute_content_dropped():
    assert _raw_text(
        b"<p>a</p><div hidden><p>x</p></div><p>b</p>") == "a\n\nb"
    assert _raw_text(
        b"<p>a</p><div aria-hidden='true'>x</div><p>b</p>") == "a\n\nb"
    # aria-hidden must be exactly 'true'; class substrings don't count
    assert _raw_text(
        b"<p>a</p><div aria-hidden='false'>x</div><p>b</p>") == "a\n\nx\n\nb"
    assert _raw_text(
        b"<p>a</p><div class='hidden-x'>x</div><p>b</p>") == "a\n\nx\n\nb"


def test_hidden_nested_and_inline():
    assert _raw_text(b"<div hidden><div hidden><p>x</p></div>"
                     b"<p>y</p></div><p>b</p>") == "b"
    assert _raw_text(b"<p>a</p><span hidden>x</span><p>b</p>") == "a\n\nb"


def test_dialog_renders_only_when_open():
    assert _raw_text(b"<p>a</p><dialog><p>x</p></dialog><p>b</p>") == \
        "a\n\nb"
    assert _raw_text(b"<p>a</p><dialog open><p>x</p></dialog>"
                     b"<p>b</p>") == "a\n\nx\n\nb"


# ---------------------------------------------------------------------------
# expectation_report
# ---------------------------------------------------------------------------

def test_expectations_all_kinds(ray_session):
    from xtract.ops.profile import expectation_report

    t = pa.table({"id": [1, 2, 2, 3, None],
                  "v": [5.0, 50.0, None, 200.0, 7.0],
                  "s": ["1-URGENT", "9-BAD", "2-HIGH", None, "3-MEDIUM"]})
    rules = [
        {"name": "id_not_null", "kind": "not_null", "col": "id"},
        {"name": "id_unique", "kind": "unique", "col": "id"},
        {"name": "v_range", "kind": "in_range", "col": "v",
         "lo": 0, "hi": 100},
        {"name": "s_pattern", "kind": "regex_match", "col": "s",
         "pattern": "[1-5]-[A-Z]+"},
        {"name": "s_accepted", "kind": "accepted_values", "col": "s",
         "values": ["1-URGENT", "2-HIGH", "3-MEDIUM"]},
    ]
    out = expectation_report(rd.from_arrow(t), rules).to_pandas()
    got = {r.rule: (int(r.n_violations), int(r.n_checked))
           for r in out.itertuples()}
    assert got == {"id_not_null": (1, 5), "id_unique": (2, 5),
                   "v_range": (1, 5), "s_pattern": (1, 5),
                   "s_accepted": (1, 5)}


def test_expectations_unknown_kind_fails(ray_session):
    import pytest as _pytest

    from xtract.ops.profile import expectation_report

    ds = rd.from_arrow(pa.table({"x": [1]}))
    with _pytest.raises(Exception):
        expectation_report(
            ds, [{"name": "r", "kind": "nope", "col": "x"}]).to_pandas()


# ---------------------------------------------------------------------------
# rendezvous_shard
# ---------------------------------------------------------------------------

def test_rendezvous_hrw_growth_property(ray_session):
    """Growing the shard set must only move keys ONTO new shards."""
    from xtract.ops.bucketed import rendezvous_shard

    ds = rd.from_arrow(pa.table({"k": pa.array(range(2000), pa.int64())}))
    df = rendezvous_shard(
        rendezvous_shard(ds, "k", 8, out_col="s8"),
        "k", 32, out_col="s32").to_pandas()
    moved = df[df.s8 != df.s32]
    assert (moved.s32 >= 8).all()
    assert df.s8.between(0, 7).all() and df.s32.between(0, 31).all()
    # a same-size assignment is stable (determinism)
    df2 = rendezvous_shard(ds, "k", 8, out_col="s8").to_pandas()
    assert (df2.s8.to_numpy() == df.s8.to_numpy()).all()


def test_rendezvous_reasonable_balance(ray_session):
    from xtract.ops.bucketed import rendezvous_shard

    ds = rd.from_arrow(pa.table({"k": pa.array(range(4000), pa.int64())}))
    df = rendezvous_shard(ds, "k", 8).to_pandas()
    load = df["shard"].value_counts()
    assert len(load) == 8
    assert load.max() < 2 * load.min()


# ---------------------------------------------------------------------------
# take_until_budget
# ---------------------------------------------------------------------------

def _brute_budget(rows, budget):
    from collections import defaultdict

    byk = defaultdict(list)
    for k, o, w, i in rows:
        byk[k].append((o, w, i))
    out = []
    for k, items in byk.items():
        cum = 0
        for o, w, i in sorted(items, key=lambda x: (-x[0], x[2])):
            if cum + w > budget:
                break
            cum += w
            out.append((k, i, cum))
    return sorted(out)


def test_budget_selection_vs_brute(ray_session):
    rng = np.random.default_rng(41)
    rows = [(f"s{int(a)}", int(b), int(c), i) for i, (a, b, c) in
            enumerate(np.column_stack([rng.integers(0, 4, 80),
                                       rng.integers(0, 100, 80),
                                       rng.integers(1, 30, 80)]))]
    from xtract.ops.agg import take_until_budget

    ds = rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.string()),
        "q": pa.array([r[1] for r in rows], pa.int64()),
        "w": pa.array([r[2] for r in rows], pa.int64()),
        "i": pa.array([r[3] for r in rows], pa.int64())}))
    df = take_until_budget(ds, "k", "q", "w", budget=60, id_col="i",
                           num_partitions=3).to_pandas()
    got = sorted((r.k, int(r.i), int(r.cum_weight))
                 for r in df.itertuples())
    assert got == _brute_budget(rows, 60)


def test_budget_stops_at_first_overflow_not_skips(ray_session):
    # greedy prefix rule: the first item that would overflow STOPS the
    # key (no skip-and-continue knapsack behavior)
    from xtract.ops.agg import take_until_budget

    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a"] * 3, pa.string()),
        "q": pa.array([3, 2, 1], pa.int64()),
        "w": pa.array([5, 10, 1], pa.int64()),
        "i": pa.array([1, 2, 3], pa.int64())}))
    df = take_until_budget(ds, "k", "q", "w", budget=7, id_col="i")
    assert df.to_pandas()["i"].tolist() == [1]


# ---------------------------------------------------------------------------
# degree_mixing_sums
# ---------------------------------------------------------------------------

def test_degree_mixing_vs_brute(ray_session):
    from xtract.ops.graph import degree_mixing_sums

    rng = np.random.default_rng(47)
    edges = [tuple(x) for x in rng.integers(0, 20, size=(80, 2))]
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    want = (len(und),
            sum(deg[u] * deg[v] for u, v in und),
            sum(deg[u] + deg[v] for u, v in und),
            sum(deg[u] ** 2 + deg[v] ** 2 for u, v in und))
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())}))
    out = degree_mixing_sums(ds).to_pandas().iloc[0]
    assert (int(out.n_edges), int(out.sum_prod), int(out.sum_deg),
            int(out.sum_sq)) == want


def test_embedding_norm_rounding_rule(ray_session):
    # half-away-from-zero at the .5 micro boundary, both signs
    emb = rd.from_arrow(pa.table({
        "label": pa.array([0, 0], pa.int64()),
        "embedding": pa.array([[0.0000015, 0.0], [-0.0000015, 0.0]],
                              pa.list_(pa.float64()))}))
    import __ray_entry__  # noqa: F401  (the slim kernel lives there)
    import numpy as np_

    m = np.stack(emb.to_pandas()["embedding"].tolist())
    s = m * 1_000_000
    q = np_.where(s >= 0, np_.floor(s + 0.5),
                  np_.ceil(s - 0.5)).astype(np_.int64)
    assert q[0, 0] == 2 and q[1, 0] == -2  # away from zero
