"""Round-3 ops: Gopher repetition signals, stratified mixing sample."""

import pyarrow as pa

from xtract.ops.textstats import gopher_repetition_batch


def test_gopher_repetition_known_values():
    text = "\n".join([
        "alpha beta gamma",     # unique line
        "repeat me now",        # dup line (×2)
        "repeat me now",
        "",                     # empty — not a line
        "  ",                   # whitespace-only — not a line
        "tail words here",
    ])
    t = pa.table({"doc_id": [1], "text": [text]})
    r = gopher_repetition_batch(t).to_pylist()[0]
    assert r["n_lines"] == 4
    assert r["n_dup_lines"] == 2
    assert r["n_line_chars"] == len("alpha beta gamma") + 2 * len(
        "repeat me now") + len("tail words here")
    assert r["n_dup_line_chars"] == 2 * len("repeat me now")
    # tokens: alpha beta gamma repeat me now repeat me now tail words here
    assert r["n_bigrams"] == 11
    # 'repeat me' and 'me now' both occur twice
    assert r["top_bigram_count"] == 2


def test_gopher_repetition_empty_doc():
    t = pa.table({"doc_id": [1, 2], "text": ["", None]})
    rows = gopher_repetition_batch(t).to_pylist()
    for r in rows:
        assert r["n_lines"] == 0 and r["n_bigrams"] == 0
        assert r["top_bigram_count"] == 0 and r["n_dup_line_chars"] == 0


def test_stratified_sample(ray_session):
    import ray.data as rd

    from xtract.ops.agg import stratified_sample

    t = pa.table({
        "doc_id": list(range(100)),
        "lang": (["en", "de", "zh", "fr"] * 25),
    })
    out = stratified_sample(rd.from_arrow(t), "lang", "doc_id",
                            {"en": 1, "de": 2}, default_every=5).to_pandas()
    by = out.groupby("lang").size().to_dict()
    # en: doc_ids 0,4,...96 (25 rows, every=1 keeps all)
    assert by["en"] == 25
    # de: doc_ids 1,5,...97 → odd ids, every=2 keeps none
    assert by.get("de", 0) == 0
    # zh: ids 2,6,..98 ≡ 2 mod 4; every=5 keeps ids ≡0 mod 5 → lcm ids
    zh = set(out[out.lang == "zh"].doc_id)
    assert zh == {i for i in range(2, 100, 4) if i % 5 == 0}
    # deterministic under different partitioning
    out2 = stratified_sample(
        rd.from_arrow(t).repartition(7), "lang", "doc_id",
        {"en": 1, "de": 2}, default_every=5).to_pandas()
    assert sorted(out2.doc_id) == sorted(out.doc_id)


def test_semdedup_planted_pairs(ray_session):
    import numpy as np
    import ray.data as rd

    from xtract.ops.dedup import semdedup

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((40, 16))
    vecs[21] = vecs[20] + 0.001            # near-identical pair
    vecs[35] = vecs[34] * 2.0              # same direction, scaled
    ds = rd.from_items([{"vec_id": i, "embedding": vecs[i].tolist()}
                        for i in range(40)])
    out = semdedup(ds, threshold=0.99, n_clusters=4,
                   train_sample=40).to_pandas()
    c = dict(zip(out.vec_id, out.cluster_id))
    assert len(c) == 40
    assert c[20] == c[21] == 20            # min-id label
    assert c[34] == c[35] == 34            # cosine ignores magnitude
    assert len(set(c.values())) == 38


def test_semdedup_no_pairs(ray_session):
    import numpy as np
    import ray.data as rd

    from xtract.ops.dedup import semdedup

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((20, 16))
    ds = rd.from_items([{"vec_id": i, "embedding": vecs[i].tolist()}
                        for i in range(20)])
    out = semdedup(ds, threshold=0.9999, n_clusters=3,
                   train_sample=20).to_pandas()
    assert len(set(out.cluster_id)) == 20


def test_webtext_pipeline_repetition_gate_and_pii(ray_session):
    import ray.data as rd

    from xtract.pipelines import webtext_pipeline

    good = ("<html><body><main>" + "".join(
        f"<p>ordinary paragraph number {i} with enough distinct words "
        f"to pass the length gate write to a.user@mail.example.org</p>"
        for i in range(6)) + "</main></body></html>").encode()
    # >30% of line mass is one repeated line → Gopher gate drops it
    spam = ("<html><body><main>" +
            "<p>buy cheap widgets now best price</p>" * 30 +
            "<p>one distinct paragraph of filler text here</p>"
            "</body></main></html>").encode()
    pages = pa.table({
        "url": ["https://a.example.org/good", "https://a.example.org/spam"],
        "warc_ts": pa.array([0, 1], pa.timestamp("us")),
        "html": [good, spam],
        "text": [None, None],
        "lang": ["en", "en"],
    })
    clean, _ = webtext_pipeline(rd.from_arrow(pages), min_chars=40,
                                line_dedup_max_docs=20)
    df = clean.to_pandas()
    assert list(df.url) == ["https://a.example.org/good"]
    row = df.iloc[0]
    assert "<EMAIL>" in row.content_text
    assert "a.user@mail.example.org" not in row.content_text
    assert row.n_emails == 6
    # gate off → spam survives
    clean2, _ = webtext_pipeline(rd.from_arrow(pages), min_chars=40,
                                 max_dup_line_ratio=None, redact_pii=False)
    df2 = clean2.to_pandas()
    assert set(df2.url) == {"https://a.example.org/good",
                            "https://a.example.org/spam"}
    assert "a.user@mail.example.org" in df2.set_index("url").loc[
        "https://a.example.org/good"].content_text


def test_priority_sample_exact_and_partition_invariant(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from xtract.ops.agg import priority_sample

    r = np.random.RandomState(9)
    n = 5_000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "w": r.randint(1, 500, n).astype(np.int64)})
    # brute force: bottom-k of lcg(id)/w with id tie-break
    h = (df.id.values * np.int64(2654435761) + 12345) % np.int64(2 ** 32)
    p = h.astype(np.float64) / df.w.values
    order = np.lexsort((df.id.values, p))[:100]
    want = sorted(df.id.values[order].tolist())

    for parts in (1, 7):
        got = (priority_sample(rd.from_pandas(df).repartition(parts),
                               k=100, id_col="id", weight_col="w")
               .to_pandas())
        assert sorted(got["id"].tolist()) == want
        assert set(got.columns) == {"id", "w", "h"}

    # weighting is real: a huge-weight row is near-certain to be chosen
    df2 = df.copy()
    df2.loc[42, "w"] = 10 ** 9
    got2 = priority_sample(rd.from_pandas(df2).repartition(4), k=100,
                           id_col="id", weight_col="w").to_pandas()
    assert 42 in set(got2["id"].tolist())
