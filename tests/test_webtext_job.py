"""run_webtext_job: checkpointed two-phase resumability."""

import json
import os
import shutil

import pyarrow.parquet as pq
import ray.data as rd

from xtract.pipelines import run_webtext_job
from xtract.synth import pages_batch_from_documents


def _write_inputs(tmp_path, n_files=4):
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.map_batches(
        lambda b: pages_batch_from_documents(b), batch_format="pyarrow")
    files = []
    tables = pages.map_batches(lambda t: t, batch_format="pyarrow") \
                  .to_pandas()
    import pyarrow as pa

    t = pa.Table.from_pandas(tables, preserve_index=False)
    per = max(1, len(t) // n_files)
    for i in range(n_files):
        part = t.slice(i * per, per if i < n_files - 1 else len(t))
        p = str(tmp_path / f"in_{i}.parquet")
        pq.write_table(part, p)
        files.append(p)
    return files


def test_webtext_job_runs_resumes_and_detects_stale(ray_session, tmp_path):
    files = _write_inputs(tmp_path)
    out = str(tmp_path / "job")

    ex_m, clean_m = run_webtext_job(files, out, shard_size=1)
    assert clean_m["complete"] and clean_m["n_rows"] > 0
    assert len(ex_m) == len(files)
    assert clean_m["funnel"]["clean_out_rows"] <= \
        clean_m["funnel"]["extract_ok_rows"]
    n_first = clean_m["n_rows"]
    data_files = sorted(os.listdir(os.path.join(out, "clean", "data")))

    # rerun: everything up to date → clean manifest returned as-is,
    # clean data untouched (same file listing)
    ex_m2, clean_m2 = run_webtext_job(files, out, shard_size=1)
    assert clean_m2["extract_checksums"] == clean_m["extract_checksums"]
    assert sorted(os.listdir(os.path.join(out, "clean", "data"))) == \
        data_files

    # delete one extraction shard → only it recomputes, and the clean
    # phase detects the (re-)extracted input and rebuilds
    shutil.rmtree(os.path.join(out, "extract", "shard=00001"))
    ex_m3, clean_m3 = run_webtext_job(files, out, shard_size=1)
    assert clean_m3["complete"] and clean_m3["n_rows"] == n_first
    # checksums identical content-wise (deterministic re-extract)
    assert clean_m3["extract_checksums"] == clean_m["extract_checksums"]

    # corrupt the clean manifest → rebuild instead of crash
    with open(os.path.join(out, "clean", "manifest.json"), "w") as f:
        f.write("{broken")
    _, clean_m4 = run_webtext_job(files, out, shard_size=1)
    assert clean_m4["complete"] and clean_m4["n_rows"] == n_first


def test_webtext_job_stale_checksum_forces_rebuild(ray_session, tmp_path):
    files = _write_inputs(tmp_path, n_files=2)
    out = str(tmp_path / "job")
    _, clean_m = run_webtext_job(files, out, shard_size=1)

    # tamper with a recorded upstream checksum → phase must re-run
    mp = os.path.join(out, "clean", "manifest.json")
    with open(mp) as f:
        m = json.load(f)
    m["extract_checksums"]["00000"] = "deadbeef"
    with open(mp, "w") as f:
        json.dump(m, f)
    _, clean_m2 = run_webtext_job(files, out, shard_size=1)
    assert clean_m2["extract_checksums"]["00000"] != "deadbeef"
    assert clean_m2["n_rows"] == clean_m["n_rows"]


def test_cli_webtext_end_to_end(ray_session, tmp_path):
    # CLI owns its own Ray session in a subprocess (ray job submit shape)
    import subprocess
    import sys

    files = _write_inputs(tmp_path, n_files=2)
    out = str(tmp_path / "cli_job")
    r = subprocess.run(
        [sys.executable, "-m", "xtract", "--input",
         str(tmp_path / "*.parquet"), "--out", out, "--webtext",
         "--shard-size", "1", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["clean_out_rows"] > 0
    assert os.path.isdir(os.path.join(out, "clean", "data"))


def test_orphan_tmp_dirs_swept(ray_session, tmp_path):
    files = _write_inputs(tmp_path, n_files=2)
    out = str(tmp_path / "job")
    os.makedirs(os.path.join(out, "extract"), exist_ok=True)
    orphan_e = os.path.join(out, "extract", ".shard-00000-dead")
    orphan_c = os.path.join(out, ".clean-dead")
    os.makedirs(orphan_e)
    os.makedirs(orphan_c)
    open(os.path.join(orphan_e, "junk.parquet"), "w").write("x")
    _, clean_m = run_webtext_job(files, out, shard_size=1)
    assert clean_m["complete"]
    assert not os.path.exists(orphan_e)
    assert not os.path.exists(orphan_c)


def test_curation_job_splits_resume_and_mixture(ray_session, tmp_path):
    from xtract.pipelines import run_curation_job

    files = _write_inputs(tmp_path)
    out = str(tmp_path / "cjob")
    ex_m, clean_m, cur_m = run_curation_job(
        files, out, shard_size=2, val_bps=1500, test_bps=1500,
        mixture={"en": 2.0})
    assert cur_m["complete"]
    counts = cur_m["counts"]
    assert counts["train"] > 0 and counts["val"] > 0 and counts["test"] > 0

    # splits are disjoint by url; copy_idx only on train
    frames = {s: rd.read_parquet(
        os.path.join(out, "curate", f"split={s}")).to_pandas()
        for s in ("train", "val", "test")}
    urls = [set(frames[s]["url"]) for s in ("train", "val", "test")]
    assert not (urls[0] & urls[1]) and not (urls[0] & urls[2]) \
        and not (urls[1] & urls[2])
    assert "copy_idx" in frames["train"].columns
    # en docs in train are doubled (factor 2.0 exactly)
    en = frames["train"][frames["train"]["lang_detected"] == "en"]
    if len(en):
        assert (en.groupby("url").size() == 2).all()

    # rerun: clean unchanged → curate phase skipped verbatim
    listing = sorted(os.listdir(os.path.join(out, "curate")))
    _, _, cur_m2 = run_curation_job(
        files, out, shard_size=2, val_bps=1500, test_bps=1500,
        mixture={"en": 2.0})
    assert cur_m2["counts"] == counts
    assert sorted(os.listdir(os.path.join(out, "curate"))) == listing


def test_curation_job_split_stability(ray_session, tmp_path):
    """A document keeps its split when the corpus shrinks (the
    leakage-audit property: split is a pure function of doc_key)."""
    from xtract.pipelines import run_curation_job

    files = _write_inputs(tmp_path)
    out_all = str(tmp_path / "all")
    _, _, m_all = run_curation_job(files, out_all, shard_size=2,
                                   val_bps=2000, test_bps=2000)
    out_half = str(tmp_path / "half")
    _, _, m_half = run_curation_job(files[:2], out_half, shard_size=2,
                                    val_bps=2000, test_bps=2000)
    split_all = {}
    for s in ("train", "val", "test"):
        df = rd.read_parquet(
            os.path.join(out_all, "curate", f"split={s}"),
            columns=["url"]).to_pandas()
        split_all.update({u: s for u in df["url"]})
    for s in ("train", "val", "test"):
        df = rd.read_parquet(
            os.path.join(out_half, "curate", f"split={s}"),
            columns=["url"]).to_pandas()
        for u in df["url"]:
            assert split_all[u] == s
