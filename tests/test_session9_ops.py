"""Session-9 ops: mixture upsampling, hash split, SQ8 quantized ANN."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from xtract.ops.agg import _lcg, hash_split, upsample_mixture


def _docs_tbl(n=200):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "source": pa.array([f"src{i % 4}" for i in range(n)], pa.string()),
        "payload": pa.array([[i, i + 1] for i in range(n)],
                            pa.list_(pa.int64())),
    }))


def test_upsample_brute_force(ray_session):
    factors = {"src0": 2.5, "src1": 0.25, "src2": 0}
    out = (upsample_mixture(_docs_tbl(), "source", "doc_id", factors)
           .to_pandas().sort_values(["doc_id", "copy_idx"])
           .reset_index(drop=True))
    # sequential reference
    exp = []
    for i in range(200):
        src = f"src{i % 4}"
        f = factors.get(src, 1.0)
        reps = int(f) + (int(_lcg(np.array([i], np.int64))[0]) % 1_000_000
                         < round((f - int(f)) * 1_000_000))
        exp.extend((i, src, c) for c in range(reps))
    assert list(map(tuple, out[["doc_id", "source", "copy_idx"]]
                    .itertuples(index=False))) == exp
    # nested payload survives the repeat/take
    assert out["payload"].iloc[0] is not None


def test_upsample_partition_invariance(ray_session):
    f = {"src0": 3.0, "src3": 0.5}
    a = (upsample_mixture(_docs_tbl(), "source", "doc_id", f)
         .to_pandas().sort_values(["doc_id", "copy_idx"])
         .reset_index(drop=True))
    b = (upsample_mixture(_docs_tbl().repartition(7), "source", "doc_id", f)
         .to_pandas().sort_values(["doc_id", "copy_idx"])
         .reset_index(drop=True))
    assert a[["doc_id", "source", "copy_idx"]].equals(
        b[["doc_id", "source", "copy_idx"]])


def test_upsample_hits_target_mix(ray_session):
    # 10k rows, one stratum ×2.5 → realized factor within 3%
    n = 10_000
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "source": pa.array(["a" if i % 2 else "b" for i in range(n)],
                           pa.string())}))
    out = upsample_mixture(ds, "source", "doc_id", {"a": 2.5}).to_pandas()
    na = (out["source"] == "a").sum()
    assert abs(na / 5000 - 2.5) < 0.075
    assert (out["source"] == "b").sum() == 5000


def test_hash_split_deterministic_and_stable(ray_session):
    out = hash_split(_docs_tbl(), "doc_id").to_pandas()
    bp = _lcg(out["doc_id"].to_numpy().astype(np.int64)) % 10_000
    exp = np.where(bp < 500, "val", np.where(bp < 1000, "test", "train"))
    assert (out["split"].to_numpy() == exp).all()
    # stability: a doc keeps its split in a grown corpus
    big = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(400)), pa.int64()),
        "source": pa.array(["x"] * 400, pa.string())}))
    out2 = hash_split(big, "doc_id").to_pandas().set_index("doc_id")
    small = out.set_index("doc_id")
    assert (small["split"] == out2.loc[small.index, "split"]).all()


def test_hash_split_proportions(ray_session):
    n = 20_000
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(list(range(n)),
                                                    pa.int64())}))
    out = hash_split(ds, "doc_id", val_bps=1000, test_bps=1000).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["val"] - 0.10) < 0.02
    assert abs(frac["test"] - 0.10) < 0.02


def _emb_ds(n=3000, dim=32, seed=3):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(list(range(n)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in v],
                              pa.list_(pa.float64()))})), v


def test_knn_sq8_matches_bruteforce(ray_session):
    from xtract.ops.similarity import knn_bruteforce, knn_sq8

    ds, v = _emb_ds()
    q = v[:3] + 0.01
    exact = knn_bruteforce(ds, q, k=10).to_pandas()
    quant = knn_sq8(ds, q, k=10).to_pandas()
    # rescore margin makes the compressed path exact on this data
    assert exact[["query_id", "rank", "vec_id"]].equals(
        quant[["query_id", "rank", "vec_id"]])
    # scores are the exact float64 rescored values
    assert np.allclose(exact["score"], quant["score"])


def test_knn_sq8_codebook_reuse(ray_session):
    from xtract.ops.similarity import knn_sq8, train_sq8

    ds, v = _emb_ds(n=500)
    cb = train_sq8(ds)
    a = knn_sq8(ds, v[:1], k=5, codebook=cb).to_pandas()
    b = knn_sq8(ds, v[:1], k=5).to_pandas()
    assert a.equals(b)


def test_weighted_downsample_brute_force(ray_session):
    from xtract.ops.agg import weighted_downsample
    n = 5000
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "score": pa.array([(i * 37) % 200 for i in range(n)], pa.int64())}))
    out = weighted_downsample(ds, "doc_id", "score", scale=100).to_pandas()
    ids = np.arange(n, dtype=np.int64)
    w = (ids * 37) % 200
    thresh = np.minimum(w * 1_000_000 // 100, 1_000_000)
    exp = ids[_lcg(ids) % 1_000_000 < thresh]
    assert (out["doc_id"].to_numpy() == exp).all()
    # weight >= scale rows are ALL kept
    kept = set(out["doc_id"])
    assert all(i in kept for i in ids[w >= 100])


def test_weighted_downsample_partition_invariance(ray_session):
    from xtract.ops.agg import weighted_downsample
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(1000)), pa.int64()),
        "score": pa.array([i % 50 for i in range(1000)], pa.int64())}))
    a = weighted_downsample(ds, "doc_id", "score", 40).to_pandas()
    b = weighted_downsample(ds.repartition(7), "doc_id", "score",
                            40).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert a.sort_values("doc_id").reset_index(drop=True).equals(b)


def test_politeness_schedule(ray_session):
    from xtract.ops.urls import politeness_schedule
    rows = [("h1", "https://h1/b"), ("h1", "https://h1/a"),
            ("h2", "https://h2/x"), ("h1", "https://h1/c")]
    ds = rd.from_arrow(pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "url": pa.array([r[1] for r in rows], pa.string())}))
    out = politeness_schedule(ds).to_pandas().sort_values(
        ["host", "fetch_wave"]).reset_index(drop=True)
    # wave k has at most one url per host; ranks follow url order
    assert list(out[out["host"] == "h1"]["url"]) == [
        "https://h1/a", "https://h1/b", "https://h1/c"]
    assert list(out[out["host"] == "h1"]["fetch_wave"]) == [0, 1, 2]
    assert list(out[out["host"] == "h2"]["fetch_wave"]) == [0]
    # politeness invariant: (host, wave) unique
    assert not out.duplicated(["host", "fetch_wave"]).any()


def test_politeness_schedule_partition_invariance(ray_session):
    from xtract.ops.urls import politeness_schedule
    n = 500
    ds = rd.from_arrow(pa.table({
        "host": pa.array([f"h{i % 7}" for i in range(n)], pa.string()),
        "url": pa.array([f"https://h{i % 7}/p/{i}" for i in range(n)],
                        pa.string())}))
    a = politeness_schedule(ds).to_pandas().sort_values(
        ["host", "url"]).reset_index(drop=True)
    b = politeness_schedule(ds.repartition(9)).to_pandas().sort_values(
        ["host", "url"]).reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# perceptual image hashing / near-dup clustering
# ---------------------------------------------------------------------------

def _bmp_media(specs):
    """specs: list of (media_id, pixels) → media table rows."""
    from xtract.ops.multimodal import encode_bmp
    return rd.from_arrow(pa.table({
        "media_id": pa.array([s[0] for s in specs], pa.int64()),
        "kind": pa.array(["image"] * len(specs), pa.string()),
        "payload": pa.array([encode_bmp(s[1]) for s in specs],
                            pa.binary())}))


def test_average_hash_noise_invariant_and_discriminative():
    from xtract.ops.multimodal import average_hash
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    noisy = base.astype(np.int16).copy()
    noisy[::7, ::5] += 3                       # mild noise
    noisy = noisy.clip(0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    h0, h1, h2 = (average_hash(x) for x in (base, noisy, other))
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h0, h1) <= 6
    assert ham(h0, h2) > 10


def test_image_near_dups_clusters(ray_session):
    from xtract.ops.multimodal import image_near_dups, resize_nearest
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    a_big = resize_nearest(a, 64, 64)          # scaled copy of a
    b = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    ds = _bmp_media([(1, a), (2, a_big), (3, b)])
    out = image_near_dups(ds).to_pandas()
    lab = dict(zip(out["media_id"], out["cluster_id"]))
    assert lab[1] == lab[2]                    # scale-invariant dup
    assert lab[3] != lab[1]


def test_image_hash_stage_bad_payload(ray_session):
    from xtract.ops.multimodal import ImageHashStage
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([7], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([b"not a bmp"], pa.binary())}))
    out = ds.map_batches(ImageHashStage, batch_size=4, concurrency=1,
                         batch_format="pyarrow").to_pandas()
    assert out.iloc[0]["hash_status"] == "unsupported_codec"


def test_audio_fingerprint_volume_invariant(ray_session):
    from xtract.ops.multimodal import audio_fingerprint
    rng = np.random.default_rng(4)
    clip = (rng.normal(0, 3000, 8000)).astype(np.int16)
    half = (clip.astype(np.int64) // 2).astype(np.int16)   # volume scale
    other = (rng.normal(0, 3000, 8000)).astype(np.int16)
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(audio_fingerprint(clip), audio_fingerprint(half)) <= 4
    assert ham(audio_fingerprint(clip), audio_fingerprint(other)) > 10


def test_audio_near_dups_clusters(ray_session):
    from xtract.ops.multimodal import audio_near_dups, encode_wav
    rng = np.random.default_rng(8)
    a = (rng.normal(0, 3000, 8000)).astype(np.int16)
    a_quiet = (a.astype(np.int64) * 3 // 4).astype(np.int16)
    b = (rng.normal(0, 3000, 8000)).astype(np.int16)
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["audio"] * 3, pa.string()),
        "payload": pa.array([encode_wav(x, 8000) for x in (a, a_quiet, b)],
                            pa.binary())}))
    out = audio_near_dups(ds).to_pandas()
    lab = dict(zip(out["media_id"], out["cluster_id"]))
    assert lab[1] == lab[2] and lab[3] != lab[1]


def test_video_fingerprint_framerate_invariant(ray_session):
    from xtract.ops.multimodal import (encode_bmp, video_fingerprint,
                                       _synth_pixels)
    frames = [encode_bmp(_synth_pixels(40 + i // 2, 24, 24))
              for i in range(24)]
    halved = frames[::2]                      # frame-rate change
    other = [encode_bmp(_synth_pixels(900 + i, 24, 24))
             for i in range(12)]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(video_fingerprint(frames), video_fingerprint(halved)) <= 8
    assert ham(video_fingerprint(frames), video_fingerprint(other)) > 10


def test_video_near_dups_clusters(ray_session):
    from xtract.ops.multimodal import (encode_bmp, encode_xraw,
                                       video_near_dups, _synth_pixels)
    mk = lambda seed, n, step=1: encode_xraw(
        [encode_bmp(_synth_pixels(seed + i, 20, 20))
         for i in range(0, n, step)])
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["video"] * 3, pa.string()),
        "payload": pa.array([mk(5, 16), mk(5, 16, 2), mk(333, 16)],
                            pa.binary())}))
    out = video_near_dups(ds).to_pandas()
    lab = dict(zip(out["media_id"], out["cluster_id"]))
    assert lab[1] == lab[2] and lab[3] != lab[1]


def test_sample_per_key(ray_session):
    from xtract.ops.agg import sample_per_key
    out = sample_per_key(_docs_tbl(), "source", "doc_id", k=5).to_pandas()
    assert (out.groupby("source").size() == 5).all()
    # deterministic and partition-invariant
    out2 = sample_per_key(_docs_tbl().repartition(7), "source",
                          "doc_id", k=5).to_pandas()
    a = out.sort_values(["source", "doc_id"]).reset_index(drop=True)
    b = out2.sort_values(["source", "doc_id"]).reset_index(drop=True)
    assert a[["doc_id", "source"]].equals(b[["doc_id", "source"]])
    # matches the brute-force lcg ranking
    ids = np.arange(200, dtype=np.int64)
    for s in range(4):
        mine = sorted(out[out["source"] == f"src{s}"]["doc_id"])
        sub = ids[ids % 4 == s]
        exp = sorted(sub[np.lexsort((sub, _lcg(sub)))][:5].tolist())
        assert mine == exp


def _long_text(seed_word):
    return (" ".join(f"{seed_word} token{i} content" for i in range(20))
            + " trailing sentinel words close the document")


def test_neardup_index_cross_job(ray_session):
    from xtract.ops.dedup_index import NearDupIndex
    base = _long_text("alpha")
    near = base.replace("token7", "tokenX")       # one-word edit, j≈0.95
    far = _long_text("omega").replace("token", "unit")
    idx = NearDupIndex(num_shards=3, sim_threshold=0.5, bands=16)

    job1 = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([base, far], pa.string())}))
    kept1 = idx.filter_new(job1, concurrency=1).to_pandas()
    assert sorted(kept1["doc_id"]) == [1, 2]

    # job 2: a near-dup of job-1 content must be dropped; new survives
    job2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([3, 4], pa.int64()),
        "text": pa.array([near, "entirely novel musings on tokenizer "
                          "vocabularies and sampling temperature"],
                         pa.string())}))
    kept2 = idx.filter_new(job2, concurrency=1).to_pandas()
    assert sorted(kept2["doc_id"]) == [4]
    assert idx.total() > 0


def test_neardup_index_within_batch_first_wins(ray_session):
    from xtract.ops.dedup_index import NearDupIndex
    t = _long_text("beta")
    near = t.replace("token11", "tokenY")          # one-word edit
    idx = NearDupIndex(num_shards=2, sim_threshold=0.5, bands=16)
    job = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array([t, t, near], pa.string())}))
    kept = idx.filter_new(job, concurrency=1).to_pandas()
    assert list(kept["doc_id"]) == [10]


# ---------------------------------------------------------------------------
# property tests: sampling ops vs brute force
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=60,
                    unique=True),
       f_int=st.integers(0, 3), f_frac=st.integers(0, 999_999))
def test_upsample_property_vs_bruteforce(ray_session, ids, f_int, f_frac):
    from xtract.ops.agg import upsample_mixture
    factor = f_int + f_frac / 1_000_000
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "source": pa.array(["s"] * len(ids), pa.string())}))
    out = upsample_mixture(ds, "source", "doc_id", {"s": factor}) \
        .to_pandas()
    exp = []
    for i in sorted(ids):
        reps = f_int + (int(_lcg(np.array([i], np.int64))[0]) % 1_000_000
                        < round((factor - f_int) * 1_000_000))
        exp.extend((i, c) for c in range(reps))
    if not exp:
        assert len(out) == 0   # empty to_pandas drops columns (Ray quirk)
        return
    out = out.sort_values(["doc_id", "copy_idx"])
    got = list(map(tuple, out[["doc_id", "copy_idx"]]
                   .itertuples(index=False)))
    assert got == exp


@settings(max_examples=20, deadline=None)
@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=60,
                    unique=True),
       vb=st.integers(0, 5000), tb=st.integers(0, 4999))
def test_hash_split_property(ray_session, ids, vb, tb):
    from xtract.ops.agg import hash_split
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    out = hash_split(ds, "doc_id", val_bps=vb, test_bps=tb).to_pandas()
    bp = _lcg(out["doc_id"].to_numpy().astype(np.int64)) % 10_000
    exp = np.where(bp < vb, "val", np.where(bp < vb + tb, "test", "train"))
    assert (out["split"].to_numpy() == exp).all()


def test_neardup_index_hot_bucket_capped(ray_session):
    """500 near-identical docs: one survivor, and the stored state is
    bounded by bands x bucket_cap, not by corpus duplication."""
    from xtract.ops.dedup_index import NearDupIndex
    base = _long_text("gamma")
    idx = NearDupIndex(num_shards=2, sim_threshold=0.5, bands=16,
                       bucket_cap=4)
    job = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(500)), pa.int64()),
        "text": pa.array([base] * 500, pa.string())}))
    kept = idx.filter_new(job, concurrency=1, batch_size=100).to_pandas()
    assert list(kept["doc_id"]) == [0]
    assert idx.total() <= 16 * 4


# ---------------------------------------------------------------------------
# IVF-SQ8 persisted index
# ---------------------------------------------------------------------------

def test_ivfsq_index_recall_and_compression(ray_session, tmp_path):
    from xtract.ops.similarity import (build_ivfsq_index, knn_bruteforce,
                                       knn_ivfsq_index)
    import glob, os
    ds, v = _emb_ds(n=2000, dim=32, seed=7)
    out = str(tmp_path / "ivfsq")
    build_ivfsq_index(ds, out, n_cells=8)
    q = v[:4] + 0.01
    got = knn_ivfsq_index(out, q, k=10, nprobe=8).to_pandas()  # all cells
    exact = knn_bruteforce(ds, q, k=10).to_pandas()
    # probing ALL cells + exact rescore reproduces brute force exactly
    assert got[["query_id", "rank", "vec_id"]].equals(
        exact[["query_id", "rank", "vec_id"]])
    assert np.allclose(got["score"], exact["score"])
    # the code files really are much smaller than the full vectors
    sz = lambda d: sum(os.path.getsize(p) for p in glob.glob(
        os.path.join(out, d, "**", "*.parquet"), recursive=True))
    assert sz("codes") < sz("full") / 3


def test_ivfsq_index_pruned_probe(ray_session, tmp_path):
    from xtract.ops.similarity import (build_ivfsq_index, knn_bruteforce,
                                       knn_ivfsq_index)
    ds, v = _emb_ds(n=2000, dim=32, seed=13)
    out = str(tmp_path / "ivfsq2")
    build_ivfsq_index(ds, out, n_cells=8)
    q = v[:5] + 0.01
    got = knn_ivfsq_index(out, q, k=10, nprobe=4).to_pandas()
    exact = knn_bruteforce(ds, q, k=10).to_pandas()
    # pruned probe: high recall@10 (deterministic on this seed)
    hits = 0
    for qi in range(5):
        a = set(got[got.query_id == qi]["vec_id"])
        b = set(exact[exact.query_id == qi]["vec_id"])
        hits += len(a & b)
    assert hits >= 40  # >= 0.8 recall over 50


def test_content_split_dups_colocate(ray_session):
    from xtract.ops.agg import content_split
    texts = ["alpha doc", "beta doc", "alpha doc", "gamma doc",
             "alpha doc", "beta doc"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = content_split(ds, val_bps=3000, test_bps=3000).to_pandas()
    by_text = out.groupby("text")["split"].nunique()
    assert (by_text == 1).all()      # identical text -> identical split
    # id-based split CANNOT guarantee this (sanity: ids differ)
    assert out["doc_id"].nunique() == 6


def test_url_template_profile(ray_session):
    from xtract.ops.urls import url_template_profile
    urls = ["https://h.org/a/1/x", "https://h.org/a/22/x",
            "https://h.org/a/333/x", "https://h.org/static/about",
            "https://g.org/p?id=77"]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    out = url_template_profile(ds).to_pandas().sort_values(
        ["host", "template"]).reset_index(drop=True)
    t = out[out["template"] == "/a/N/x"].iloc[0]
    assert t["host"] == "h.org" and t["n_urls"] == 3
    assert t["min_url"] == "https://h.org/a/1/x"
    assert (out[out["host"] == "g.org"]["template"] == "/p?id=N").all()


def test_waterfill_allocation_exact(ray_session):
    from xtract.ops.urls import waterfill_allocation
    counts = [1, 2, 3, 100, 50, 7]
    ds = rd.from_arrow(pa.table({
        "host": pa.array([f"h{i}" for i in range(6)], pa.string()),
        "n_urls": pa.array(counts, pa.int64())}))
    for budget in (0, 3, 6, 17, 63, 120, 163, 200, 1000):
        tau, out = waterfill_allocation(ds, budget)
        # brute-force tau
        best = 0
        for t in range(0, 101):
            if sum(min(c, t) for c in counts) <= budget:
                best = t
        assert tau == best, (budget, tau, best)
        df = out.to_pandas()
        assert (df["alloc"] == np.minimum(df["n_urls"], tau)).all()
        assert df["alloc"].sum() <= budget


def test_mirror_host_pairs(ray_session):
    from xtract.ops.urls import mirror_host_pairs
    rows = []
    # m1/m2 mirror 4 contents; m2 has one extra; u is unrelated;
    # 'everywhere' content appears on ALL hosts (excluded by the cap)
    for i in range(4):
        rows.append((f"https://m1.org/{i}", f"content {i}"))
        rows.append((f"https://m2.org/{i}", f"content {i}"))
    rows.append(("https://m2.org/x", "only on m2"))
    rows.append(("https://u.org/1", "unique u"))
    for h in ("m1.org", "m2.org", "u.org", "v.org"):
        rows.append((f"https://{h}/foot", "everywhere"))
    ds = rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string())}))
    out = mirror_host_pairs(ds, max_hosts_per_content=3).to_pandas()
    out = out.sort_values(["host_a", "host_b"]).reset_index(drop=True)
    m = out[(out["host_a"] == "m1.org") & (out["host_b"] == "m2.org")]
    assert len(m) == 1
    r = m.iloc[0]
    # shared=4 ('everywhere' excluded); |A|=5, |B|=6 incl. 'everywhere'
    assert r["shared"] == 4 and r["jacc_num"] == 4
    assert r["jacc_den"] == 5 + 6 - 4
    assert not ((out["host_a"] == "u.org") | (out["host_b"] == "u.org")
                ).any() or out[(out["host_a"] == "u.org") |
                               (out["host_b"] == "u.org")].empty


def test_mirror_host_pairs_partition_invariance(ray_session):
    from xtract.ops.urls import mirror_host_pairs
    n = 400
    ds = rd.from_arrow(pa.table({
        "url": pa.array([f"https://host{i % 7}.example.org/p/{i}"
                         for i in range(n)], pa.string()),
        "text": pa.array([f"mirror {i % 29}" for i in range(n)],
                         pa.string())}))
    cols = ["host_a", "host_b", "shared", "jacc_num", "jacc_den"]
    a = mirror_host_pairs(ds).to_pandas()[cols].sort_values(
        ["host_a", "host_b"]).reset_index(drop=True)
    b = mirror_host_pairs(ds.repartition(9)).to_pandas()[cols] \
        .sort_values(["host_a", "host_b"]).reset_index(drop=True)
    assert a.equals(b)
    # brute force one pair
    import itertools
    sets = {}
    for i in range(n):
        sets.setdefault(f"host{i % 7}.example.org", set()).add(i % 29)
    ha, hb = "host0.example.org", "host1.example.org"
    sh = len(sets[ha] & sets[hb])
    r = a[(a["host_a"] == ha) & (a["host_b"] == hb)].iloc[0]
    assert r["shared"] == sh
    assert r["jacc_den"] == len(sets[ha]) + len(sets[hb]) - sh


def test_parse_crawl_delay_groups_and_fractions():
    from xtract.ops.robots import parse_crawl_delay
    txt = ("User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
           "User-agent: mybot\nCrawl-delay: 1.5\nAllow: /\n")
    assert parse_crawl_delay(txt, "mybot") == 1500
    assert parse_crawl_delay(txt, "otherbot") == 2000
    assert parse_crawl_delay("User-agent: *\nDisallow: /", "b") is None
    # last crawl-delay in a group wins; comments stripped
    t2 = "User-agent: *\nCrawl-delay: 9\nCrawl-delay: 3 # faster\n"
    assert parse_crawl_delay(t2, "x") == 3000


def test_extract_crawl_delays(ray_session):
    from xtract.ops.robots import extract_crawl_delays
    ds = rd.from_arrow(pa.table({
        "host": pa.array(["a.org", "b.org"], pa.string()),
        "robots_txt": pa.array([
            "User-agent: *\nCrawl-delay: 0.25\n",
            "User-agent: *\nDisallow: /\n"], pa.string())}))
    out = extract_crawl_delays(ds, default_ms=100).to_pandas() \
        .set_index("host")
    assert out.loc["a.org", "crawl_delay_ms"] == 250
    assert out.loc["b.org", "crawl_delay_ms"] == 100


def test_parse_sitemap_xml():
    from xtract.ops.robots import parse_sitemap_xml
    body = (b'<?xml version="1.0"?>\n'
            b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            b"<url><loc>https://a.org/1</loc>"
            b"<lastmod>2026-01-02</lastmod></url>"
            b"<url><loc> https://a.org/2 </loc></url>"
            b"<url><lastmod>2026-01-03</lastmod></url>"   # no loc: dropped
            b"<url><loc>https://a.org/3</loc>")           # unterminated
    got = parse_sitemap_xml(body)
    assert got == [("url", "https://a.org/1", "2026-01-02"),
                   ("url", "https://a.org/2", ""),
                   ("url", "https://a.org/3", "")]
    idx = (b"<sitemapindex><sitemap><loc>https://a.org/s1.xml</loc>"
           b"</sitemap></sitemapindex>")
    assert parse_sitemap_xml(idx) == [("sitemap", "https://a.org/s1.xml", "")]
    assert parse_sitemap_xml(b"") == []
    assert parse_sitemap_xml(b"\x00garbage<<<") == []


def test_extract_sitemap_entries(ray_session):
    from xtract.ops.robots import extract_sitemap_entries
    ds = rd.from_arrow(pa.table({
        "host": pa.array(["a.org"], pa.string()),
        "sitemap_xml": pa.array(
            ["<urlset><url><loc>https://a.org/p</loc></url></urlset>"],
            pa.string())}))
    out = extract_sitemap_entries(ds).to_pandas()
    assert list(out.itertuples(index=False)) == [
        ("a.org", "url", "https://a.org/p", "")]
