"""Lenient retry pass (C2), choice alternatives (H18), as-of join,
windows, alternative sources, CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xtract.config import DEFAULT_CONFIG
from xtract.extract import extract_document


def test_lenient_decode_recovers():
    bad = b"<p>good words before</p>\xff\xfe<p>and more good words after</p>"
    strict = extract_document(bad, None, None, DEFAULT_CONFIG)
    lenient = extract_document(bad, None, None, DEFAULT_CONFIG, lenient=True)
    assert strict["status"] == "bad_encoding" and strict["content_text"] == ""
    assert lenient["status"] == "ok_lenient"
    assert "good words before" in lenient["content_text"]


def test_lang_alternatives_descending():
    # ChoiceIterator ordering contract (tests/test_iterators.rs:736-769)
    r = extract_document(
        b"<p>the cat and the dog bir deneme ve der und die words</p>",
        None, None, DEFAULT_CONFIG)
    alts = r["lang_alternatives"]
    assert alts and alts[0][0] == r["lang_detected"]
    confs = [c for _, c in alts]
    assert confs == sorted(confs, reverse=True)


def test_retry_pipeline(ray_session, sf_dir):
    from xtract.pipeline import extract_pages, extract_pages_with_retry
    from xtract.synth import synth_pages_dataset

    strict = extract_pages(synth_pages_dataset(sf_dir)).to_pandas()
    n_bad = (strict.status == "bad_encoding").sum()
    assert n_bad > 0
    out = extract_pages_with_retry(synth_pages_dataset(sf_dir)).to_pandas()
    assert len(out) == len(strict)
    assert (out.status == "bad_encoding").sum() == 0
    assert (out.status == "ok_lenient").sum() == n_bad
    # lenient rows recovered real content
    assert (out[out.status == "ok_lenient"].content_text.str.len() > 0).all()


def test_asof_join(ray_session):
    import ray.data as rd

    from xtract.ops.joins import asof_join_broadcast

    right = pd.DataFrame({
        "k": [1, 1, 2], "ts": pd.to_datetime(["2026-01-01", "2026-02-01",
                                              "2026-01-15"]),
        "v": [10, 20, 30]})
    left = rd.from_items([
        {"event_id": 1, "k": 1, "ets": pd.Timestamp("2026-01-20")},
        {"event_id": 2, "k": 1, "ets": pd.Timestamp("2026-03-01")},
        {"event_id": 3, "k": 1, "ets": pd.Timestamp("2025-12-01")},
        {"event_id": 4, "k": 9, "ets": pd.Timestamp("2026-01-20")},
    ])
    out = asof_join_broadcast(left, right, "k", "ets", "k", "ts",
                              ["v"]).to_pandas().set_index("event_id")
    assert out.loc[1, "v_asof"] == 10
    assert out.loc[2, "v_asof"] == 20
    assert pd.isna(out.loc[3, "v_asof"])
    assert pd.isna(out.loc[4, "v_asof"])


def test_tumbling_window(ray_session, sf_dir):
    import ray.data as rd

    from xtract.ops.joins import tumbling_window

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    out = tumbling_window(ev, "ts", every="day").to_pandas()
    assert out.n_events.sum() == ev.count()
    assert out.window.str.match(r"\d{4}-\d{2}-\d{2}$").all()


def test_windowed_running(ray_session, sf_dir):
    import ray.data as rd

    from xtract.ops.joins import windowed_running

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])
    out = windowed_running(ev, "user_id", "ts", "value").to_pandas()
    one = out[out.user_id == out.user_id.iloc[0]].sort_values("seq")
    assert (one.seq.to_numpy() == np.arange(1, len(one) + 1)).all()
    assert one.running_value.is_monotonic_increasing or (ev.count() > 0)


def test_json_source_roundtrip(ray_session, tmp_path):
    import base64

    from xtract.sources import read_pages_json

    rows = [{"url": "https://a", "html": base64.b64encode(b"<p>hello from json source</p>").decode(),
             "text": None, "lang": "en"},
            {"url": "https://b", "html": "<p>plain utf8 html text here</p>",
             "text": None, "lang": None}]
    p = tmp_path / "pages.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = read_pages_json(str(p))
    df = ds.to_pandas()
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang"}
    assert df.html.iloc[0] == b"<p>hello from json source</p>"

    from xtract.pipeline import extract_pages

    out = extract_pages(read_pages_json(str(p))).to_pandas()
    assert "hello from json source" in out.set_index("url").loc["https://a", "content_text"]


def test_files_source(ray_session, tmp_path):
    from xtract.pipeline import extract_pages
    from xtract.sources import read_pages_files

    (tmp_path / "a.html").write_bytes(b"<h1>File Doc</h1><p>file-based page with words</p>")
    out = extract_pages(read_pages_files(str(tmp_path))).to_pandas()
    assert len(out) == 1 and out.url.iloc[0].startswith("file://")
    assert "file-based page" in out.content_text.iloc[0]


def test_cli_end_to_end(ray_session, sf_dir, tmp_path):
    """CLI runs as a subprocess (owns its own Ray session)."""
    from xtract.synth import synth_pages_dataset

    in_dir = str(tmp_path / "in")
    synth_pages_dataset(sf_dir).limit(60).repartition(2).write_parquet(in_dir)
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    res = subprocess.run(
        [sys.executable, "-m", "xtract", "--input", in_dir, "--out", out_dir,
         "--num-cpus", "2", "--set", "min_block_chars=5"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["n_rows"] > 0
    assert os.path.exists(os.path.join(out_dir, "shard=00000", "manifest.json"))


def test_cli_rejects_unknown_variable(tmp_path):
    from xtract.cli import main

    with pytest.raises(SystemExit):
        main(["--input", "/nonexistent*", "--out", str(tmp_path)])


def test_session_windows(ray_session):
    import pandas as pd
    import ray.data as rd

    from xtract.ops.joins import session_windows

    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = [
        {"user_id": 1, "event_id": 1, "ts": base},
        {"user_id": 1, "event_id": 2, "ts": base + pd.Timedelta(minutes=10)},
        {"user_id": 1, "event_id": 3, "ts": base + pd.Timedelta(hours=2)},
        {"user_id": 2, "event_id": 4, "ts": base},
    ]
    out = session_windows(rd.from_items(rows), "user_id", "ts").to_pandas()
    u1 = out[out.user_id == 1].sort_values("session_id")
    assert u1.n_events.tolist() == [2, 1]          # gap > 30min splits
    assert out[out.user_id == 2].n_events.tolist() == [1]


def test_article_mode_keeps_densest_chain():
    from xtract.config import ExtractionConfig
    from xtract.oracle import oracle_extract

    farm = b"".join(b'<div><a href="/x%d">promo link %d</a></div>' % (i, i)
                    for i in range(6))
    html = (b"<p>Unrelated teaser far away from the body with many words filling space.</p>"
            + farm + b"<div>" + b"".join(
                b"<p>Main article paragraph %d with plenty of running text words here.</p>" % i
                for i in range(6)) + b"</div>" + farm +
            b"<p>Lone trailing promo with a few words passing the base filter.</p>")
    auto = oracle_extract(html, cfg=ExtractionConfig(seg_mode="auto"))
    art = oracle_extract(html, cfg=ExtractionConfig(seg_mode="article"))
    assert "Main article paragraph 0" in art["content_text"]
    assert auto["n_blocks_kept"] > art["n_blocks_kept"]


def test_quality_gopher_signals(ray_session):
    import pyarrow as pa

    from xtract.ops.textstats import QualityScorer

    q = QualityScorer()
    t = pa.table({"text": [
        "the cat sat on the mat and it was a good day for all of the cats in town",
        "spam spam spam spam spam spam spam spam spam spam",
        "",
    ]})
    out = q(t).to_pydict()
    assert out["max_word_run"][1] >= 10
    assert out["compression_ratio"][1] < out["compression_ratio"][0]
    assert out["quality_score"][0] > out["quality_score"][1]


def test_asof_join_cogroup_matches_broadcast(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from xtract.ops.joins import asof_join_broadcast, asof_join_cogroup

    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "event_id": np.arange(200),
        "user_id": rng.integers(0, 12, 200),
        "ts": [base + pd.Timedelta(minutes=int(m))
               for m in rng.integers(0, 5000, 200)],
    })
    right = pd.DataFrame({
        "user_id": rng.integers(0, 12, 80),
        "rts": [base + pd.Timedelta(minutes=int(m))
                for m in rng.integers(0, 5000, 80)],
        "val": rng.integers(0, 1000, 80),
    })
    lds = rd.from_pandas(left).repartition(3)
    bc = asof_join_broadcast(lds, right.rename(columns={"rts": "ts_r"}),
                             "user_id", "ts", "user_id", "ts_r",
                             ["val"]).to_pandas()
    cg = asof_join_cogroup(lds, rd.from_pandas(right).repartition(2),
                           "user_id", "ts", "rts", ["val"],
                           num_partitions=4).to_pandas()
    bcs = bc.sort_values("event_id").reset_index(drop=True)
    cgs = cg.sort_values("event_id").reset_index(drop=True)
    assert bcs.val_asof.fillna(-1).astype("int64").tolist() == \
        cgs.val_asof.fillna(-1).astype("int64").tolist()
    assert cgs.event_id.tolist() == bcs.event_id.tolist()


def test_equi_join_cogroup_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from xtract.ops.joins import equi_join_cogroup

    rng = np.random.default_rng(21)
    left = pd.DataFrame({"k": rng.integers(0, 30, 200),
                         "x": rng.integers(0, 1000, 200)})
    right = pd.DataFrame({"kk": np.arange(25), "y": np.arange(25) * 10})
    got = equi_join_cogroup(rd.from_pandas(left).repartition(3),
                            rd.from_pandas(right).repartition(2),
                            "k", "kk", num_partitions=4).to_pandas()
    want = left.merge(right, left_on="k", right_on="kk").drop(columns=["kk"])
    gs = got.sort_values(["k", "x"]).reset_index(drop=True)[["k", "x", "y"]]
    ws = want.sort_values(["k", "x"]).reset_index(drop=True)[["k", "x", "y"]]
    assert gs.astype("int64").equals(ws.astype("int64"))
