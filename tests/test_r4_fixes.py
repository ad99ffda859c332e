"""Round-4 fixes: butterfly_counts oversized-group gate, distributed
mis_coloring routing, embedding_dedup in-task planes, boost headroom
gate."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# butterfly_counts: exact per-group gate before the m² self-merge
# ---------------------------------------------------------------------------

def _bf(pairs, ray_session, **kw):
    import ray.data as rd

    from xtract.ops.graph import butterfly_counts

    ds = rd.from_arrow(pa.table({
        "g": pa.array([p[0] for p in pairs], pa.int64()),
        "i": pa.array([p[1] for p in pairs], pa.int64())}))
    df = butterfly_counts(ds, "g", "i", **kw).to_pandas()
    return {int(r.item): int(r.n_butterflies) for r in df.itertuples()}


def _brute_bf(pairs):
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


def test_butterflies_oversized_group_fails_loud(ray_session):
    # one viral group with 300 distinct items > cap=100 → loud error
    # naming the cap, BEFORE any m² pair materialization
    pairs = [(7, i) for i in range(300)] + [(1, 1), (1, 2), (2, 1),
                                            (2, 2)]
    with pytest.raises(Exception, match="max_group_items"):
        _bf(pairs, ray_session, max_group_items=100)


def test_butterflies_oversized_drop_exact_over_rest(ray_session):
    # drop policy: viral group excluded, every other count exact
    small = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 2), (3, 5), (4, 2),
             (4, 5)]
    viral = [(99, i) for i in range(250)]
    got = _bf(small + viral, ray_session, max_group_items=100,
              oversized="drop")
    assert got == _brute_bf(small)


def test_butterflies_pathological_group_bounded(ray_session):
    # a 10⁴-item group: default cap (8192) rejects it; drop completes
    # with bounded pair emission and exact counts over the remainder
    viral = [(5, i) for i in range(10_000)]
    small = [(10, 1), (10, 2), (20, 1), (20, 2)]
    with pytest.raises(Exception, match="max_group_items"):
        _bf(viral + small, ray_session)
    got = _bf(viral + small, ray_session, oversized="drop")
    assert got == {1: 1, 2: 1}


def test_butterflies_bad_policy_rejected(ray_session):
    with pytest.raises(ValueError, match="oversized"):
        _bf([(1, 1)], ray_session, oversized="star")


def test_butterflies_under_cap_unchanged(ray_session):
    rng = np.random.default_rng(41)
    pairs = [tuple(x) for x in np.column_stack([
        rng.integers(0, 30, 250), rng.integers(0, 12, 250)])]
    assert _bf(pairs, ray_session, num_partitions=5) == _brute_bf(pairs)


# ---------------------------------------------------------------------------
# mis_coloring distributed routing
# ---------------------------------------------------------------------------

def _edges_ds(edges):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())}))


def _und(edges):
    return sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})


def test_coloring_distributed_past_broadcast_gate(ray_session):
    # one graph covers all three contracts (each distributed color
    # layer costs several Ray executions — keep the graph small):
    # (1) broadcast mode refuses past its gate, naming distributed=True;
    # (2) distributed completes past the gate with colors BIT-IDENTICAL
    #     to the ungated broadcast mode;
    # (3) the coloring is proper.
    from xtract.ops.coloring import mis_coloring

    rng = np.random.RandomState(23)
    edges = [e for e in zip(rng.randint(0, 14, 26).tolist(),
                            rng.randint(0, 14, 26).tolist())
             if e[0] != e[1]]
    with pytest.raises(ValueError, match="distributed=True"):
        mis_coloring(_edges_ds(edges), broadcast_limit=5, on_gate="error")
    got = (mis_coloring(_edges_ds(edges), distributed=True,
                        num_partitions=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    ref = (mis_coloring(_edges_ds(edges)).to_pandas()
           .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)
    col = dict(zip(got.node, got.color))
    assert all(col[u] != col[v] for u, v in _und(edges))


def test_coloring_distributed_partition_invariant(ray_session):
    from xtract.ops.coloring import mis_coloring

    edges = [(i, (i + 1) % 9) for i in range(9)]  # odd cycle
    a = (mis_coloring(_edges_ds(edges), distributed=True).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (mis_coloring(_edges_ds(edges).repartition(7),
                      distributed=True, num_partitions=3).to_pandas()
         .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a.color.max() >= 3


# ---------------------------------------------------------------------------
# connected_components_ds: pointer jumping + fail-loud convergence
# ---------------------------------------------------------------------------

def test_cc_deep_chain_converges(ray_session):
    # a 600-node path has diameter 599: plain min-label propagation at
    # the old default (10 rounds) silently returned ~590 bogus
    # components; pointer jumping converges in O(log n) rounds
    import ray.data as rd

    from xtract.ops.cc import connected_components_ds

    N = 600
    ds = rd.from_arrow(pa.table({
        "a": pa.array(np.arange(N - 1), pa.int64()),
        "b": pa.array(np.arange(1, N), pa.int64())}))
    df = connected_components_ds(ds, num_partitions=4).to_pandas()
    assert len(df) == N
    assert (df.label == 0).all()


def test_cc_unconverged_fails_loud(ray_session):
    # exhausting max_rounds without the fixpoint must RAISE, never
    # silently return wrong labels
    import ray.data as rd

    from xtract.ops.cc import connected_components_ds

    N = 200
    ds = rd.from_arrow(pa.table({
        "a": pa.array(np.arange(N - 1), pa.int64()),
        "b": pa.array(np.arange(1, N), pa.int64())}))
    with pytest.raises(RuntimeError, match="not converged"):
        # jump disabled (jump_after > max_rounds) → diameter-bound
        connected_components_ds(ds, num_partitions=4, max_rounds=4,
                                jump_after=99)


# ---------------------------------------------------------------------------
# embedding_dedup: in-task planes, dim assert, no driver probe
# ---------------------------------------------------------------------------

def test_embedding_dedup_dim_mismatch_raises(ray_session):
    import ray.data as rd

    from xtract.ops.dedup import embedding_dedup

    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((10, 8))
    ds = rd.from_items([{"vec_id": i, "embedding": vecs[i].tolist()}
                        for i in range(10)])
    with pytest.raises(Exception, match="declared dim"):
        embedding_dedup(ds, dim=16).to_pandas()
    # correct declared dim passes
    out = embedding_dedup(ds, dim=8).to_pandas()
    assert len(out) == 10


# ---------------------------------------------------------------------------
# set_input_image / get_input_image parity (reference src/api.rs:675-697)
# ---------------------------------------------------------------------------

def _mini_pages():
    import ray.data as rd

    html0 = (b"<html><body><p>" + b"hello input round trip " * 3
             + b"</p></body></html>")
    return rd.from_arrow(pa.table({
        "url": pa.array(["https://a.example.org/x",
                         "https://a.example.org/null"], pa.string()),
        "warc_ts": pa.array([None, None], pa.timestamp("us")),
        "html": pa.array([html0, None], pa.binary()),
        "text": pa.array([None, "plain text fallback"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string())}))


def test_input_bytes_round_trip(ray_session):
    from xtract.config import ExtractionConfig
    from xtract.pipeline import extract_pages, get_input_bytes

    cfg = ExtractionConfig(keep_input=True)
    out = extract_pages(_mini_pages(), cfg=cfg)
    got = {r["url"]: r["input_bytes"]
           for r in get_input_bytes(out).take_all()}
    assert got["https://a.example.org/x"].startswith(b"<html>")
    assert b"hello input round trip" in got["https://a.example.org/x"]
    # null input rides through as null (per-row NullPointerError
    # analogue), the row itself survives
    assert got["https://a.example.org/null"] is None


def test_get_input_bytes_requires_keep_input(ray_session):
    from xtract.pipeline import extract_pages, get_input_bytes

    out = extract_pages(_mini_pages())
    with pytest.raises(ValueError, match="keep_input"):
        get_input_bytes(out)


def test_keep_input_round_trips_config(ray_session):
    from xtract.config import ExtractionConfig

    cfg = ExtractionConfig().with_variable("keep_input", True)
    assert cfg.keep_input is True
    cfg2 = ExtractionConfig.from_json(cfg.to_json())
    assert cfg2.keep_input is True


# ---------------------------------------------------------------------------
# artifact renderer (true rendered-artifact sink, result_renderer.rs:69-82)
# ---------------------------------------------------------------------------

_ARTIFACT_HTML = (
    b"<html><head><title>T</title></head><body>"
    b"<nav><a href='/a'>home</a> <a href='/b'>about</a> "
    b"<a href='/c'>contact</a> <a href='/d'>more</a></nav>"
    b"<h1>A real heading here</h1>"
    b"<p>" + b"This paragraph carries the actual article content. " * 4
    + b"</p></body></html>")


def test_artifact_renderer_structure(ray_session):
    import re

    from xtract.extract import extract_document
    from xtract.config import DEFAULT_CONFIG
    from xtract.render import render_artifact

    r = extract_document(_ARTIFACT_HTML, None, "en", DEFAULT_CONFIG,
                         collect_blocks=True)
    art = render_artifact("https://x.example.org/p", r["blocks"])
    assert art.startswith("<!DOCTYPE html>")
    assert "https://x.example.org/p" in art
    # self-contained: no external fetches
    assert "http" not in re.sub(r"https://x\.example\.org/p", "", art) \
        or "src=" not in art
    # every nav link targets an existing section anchor
    links = re.findall(r'href="#(s\d+e\d+)"', art)
    ids = set(re.findall(r'id="(s\d+e\d+)"', art))
    assert links and set(links) <= ids
    # anchors are the blocks' real byte spans
    kept = [b for b in r["blocks"] if b.is_content]
    assert {f"s{b.span_start}e{b.span_end}" for b in kept} == ids
    # dropped-boilerplate accounting present
    assert "boilerplate blocks dropped" in art
    # deterministic
    assert art == render_artifact("https://x.example.org/p", r["blocks"])


def test_artifact_in_render_pages(ray_session):
    import ray.data as rd

    from xtract.render import render_pages

    pages = rd.from_arrow(pa.table({
        "url": pa.array(["https://x.example.org/p"], pa.string()),
        "warc_ts": pa.array([None], pa.timestamp("us")),
        "html": pa.array([_ARTIFACT_HTML], pa.binary()),
        "text": pa.array([None], pa.string()),
        "lang": pa.array(["en"], pa.string())}))
    out = render_pages(pages, formats=("artifact",)).to_pandas()
    assert list(out["format"]) == ["artifact"]
    assert out["payload"][0].startswith("<!DOCTYPE html>")


# ---------------------------------------------------------------------------
# boost: tightened headroom gate + empty-feature raise
# ---------------------------------------------------------------------------

def test_boost_empty_features_raises(ray_session):
    import ray.data as rd

    from xtract.ops.boost import train_boost

    ds = rd.from_items([{"y": 1}, {"y": 0}])
    with pytest.raises(ValueError, match="feature_cols"):
        train_boost(ds, [], label_col="y")


def test_boost_headroom_gate_geometric(ray_session):
    import ray.data as rd

    from xtract.ops.boost import train_boost

    ds = rd.from_items([{"x": i % 3, "y": i % 2} for i in range(50)])
    # lr=1 doubles the residual bound per round: 50·1e6·(2^40 + 2)
    # ≈ 5.5e19 ≥ 2^62 — the old (rounds+2) gate would have passed this
    with pytest.raises(RuntimeError, match="2\\^62"):
        train_boost(ds, ["x"], label_col="y", rounds=40,
                    lr_num=1, lr_den=1)
    # modest config still trains
    m = train_boost(ds, ["x"], label_col="y", rounds=3)
    assert len(m["stumps"]) == 3
