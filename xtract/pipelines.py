"""Composed end-to-end training-data pipeline: the full webtext chain.

``webtext_pipeline`` strings together everything a Common-Crawl-scale
training-data job runs, Ray-Data-first, every stage streaming:

    read pages → validate → extract (warm workers, typed errors)
      → corpus-level repeated-line scrub      (ops.linedup)
      → quality gate (length / lang-conf)     (vectorized filter)
      → Gopher repetition gate (dup-line mass) (integer rational compare)
      → PII redaction (email/IP/phone)        (ops.pii)
      → exact dedup by content hash           (salted groupby)
      → final columns ready for tokenization

Returns the surviving documents plus a funnel report (rows in/out per
stage) — the numbers a data-engineering run is judged by.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from . import __version__
from .config import DEFAULT_CONFIG, ExtractionConfig
from .pipeline import extract_pages


def webtext_pipeline(
    pages_ds,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    min_chars: int = 80,
    line_dedup_max_docs: int = 20,
    require_lang: tuple[str, ...] = (),
    pin_extracted: bool = True,
    max_dup_line_ratio: "tuple[int, int] | None" = (3, 10),
    redact_pii: bool = True,
):
    """→ (clean_ds, funnel: dict[str, int]).

    ``clean_ds`` streams (url, warc_ts, content_text, lang_detected,
    quality flags); ``funnel`` counts survivors per stage (each count
    consumes the lazy stage once — acceptable for reporting; pass the
    returned ds on for the actual write).
    """
    funnel: dict[str, int] = {}
    extracted = extract_pages(pages_ds, cfg)
    ok = extracted.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok")),
        batch_format="pyarrow")
    # (funnel counts are filled below only where free — i.e. on the
    # pinned intermediate; webtext_funnel adds the rest)

    slim = ok.select_columns(["url", "warc_ts", "content_text",
                              "lang_detected", "lang_conf"])
    if pin_extracted:
        # the line scrub consumes its input twice (document-frequency
        # pass + rewrite pass); unpinned, each pass re-runs the whole
        # read+extract.  Pin the slim projection once (object store,
        # spillable).  Disable only when even extracted text dwarfs
        # local spill capacity — then prefer the job driver's
        # write-then-read shape (pipelines.run_webtext_job).
        slim = slim.materialize()
        funnel["extract_ok"] = slim.count()  # free on the pinned data
    return clean_extracted(
        slim, min_chars=min_chars,
        line_dedup_max_docs=line_dedup_max_docs,
        require_lang=require_lang,
        max_dup_line_ratio=max_dup_line_ratio,
        redact_pii=redact_pii), funnel


def clean_extracted(
    slim,
    min_chars: int = 80,
    line_dedup_max_docs: int = 20,
    require_lang: tuple[str, ...] = (),
    max_dup_line_ratio: "tuple[int, int] | None" = (3, 10),
    redact_pii: bool = True,
):
    """The post-extraction half of the webtext funnel over an
    already-extracted slim Dataset (url, warc_ts, content_text,
    lang_detected, lang_conf): corpus line scrub → quality gate →
    Gopher repetition gate → PII redaction → exact content dedup.
    Factored out so `run_webtext_job` can run it against the
    CHECKPOINTED extraction output (a crash in the corpus-global
    cleaning phase never re-extracts)."""
    from .ops.dedup import add_content_hash
    from .ops.linedup import drop_repeated_lines

    scrubbed = drop_repeated_lines(slim, max_docs=line_dedup_max_docs)

    def quality_gate(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(pc.utf8_length(t["content_text"]), min_chars)
        if require_lang:
            mask = pc.and_(mask, pc.is_in(
                t["lang_detected"], value_set=pa.array(list(require_lang))))
        return t.filter(mask)

    gated = scrubbed.map_batches(quality_gate, batch_format="pyarrow")

    if max_dup_line_ratio is not None:
        # Gopher-style repetition gate: drop documents whose duplicate-
        # line character mass exceeds num/den of all line characters
        # (strict rational compare — no float thresholds, SURVEY §4.3)
        from .ops.textstats import gopher_repetition_batch

        num, den = max_dup_line_ratio

        def repetition_gate(t: pa.Table) -> pa.Table:
            rep = gopher_repetition_batch(t, key="url", col="content_text")
            dup = rep["n_dup_line_chars"].to_numpy(zero_copy_only=False)
            tot = rep["n_line_chars"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(dup * den <= tot * num))

        gated = gated.map_batches(repetition_gate, batch_format="pyarrow")

    if redact_pii:
        from .ops.pii import redact_pii_batch

        gated = gated.map_batches(
            lambda t: redact_pii_batch(t, key="url", col="content_text"),
            batch_format="pyarrow")

    hashed = gated.map_batches(
        lambda t: add_content_hash(t, "content_text"), batch_format="pyarrow")

    from .ops.agg import first_row_per_key

    deduped = first_row_per_key(
        hashed, "content_hash", ("url",)).drop_columns(["content_hash"])
    return deduped


def webtext_funnel(pages_ds, cfg: ExtractionConfig = DEFAULT_CONFIG, **kw):
    """Run the pipeline and materialize the per-stage funnel counts.
    With the default ``pin_extracted=True`` extraction runs EXACTLY
    once: ``extract_ok`` falls out of the pinned intermediate, and
    ``clean_out`` re-reads only the (cheap) pinned slim columns —
    the round-1 version re-ran the whole read+extract per stage."""
    clean, funnel = webtext_pipeline(pages_ds, cfg, **kw)
    funnel["clean_out"] = clean.count()
    funnel["pages_in"] = pages_ds.count()
    if "extract_ok" not in funnel:  # pin disabled → pay the extra pass
        ex = extract_pages(pages_ds, cfg)
        funnel["extract_ok"] = ex.map_batches(
            lambda t: t.filter(pc.equal(t["status"], "ok")),
            batch_format="pyarrow").count()
    return {"pages_in": funnel["pages_in"],
            "extract_ok": funnel["extract_ok"],
            "clean_out": funnel["clean_out"]}


def run_webtext_job(
    input_files,
    out_dir: str,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    shard_size: int = 8,
    **clean_kw,
):
    """End-to-end resumable training-data job — the production shape
    of ``webtext_pipeline`` with a durable checkpoint at the phase
    boundary:

    1. **extract** (per-shard resumable): `pipeline.run_extraction_job`
       into ``out/extract/shard=*`` — a rerun skips completed shards.
    2. **clean** (corpus-global): `clean_extracted` over the WRITTEN
       extraction output (line scrub / gates / PII / exact dedup are
       corpus-wide, so this phase is one unit) into ``out/clean`` with
       an atomically-renamed data dir + manifest.  The manifest pins
       the extraction shard checksums it consumed: a rerun skips the
       phase when they match and rebuilds it when any shard was
       re-extracted (stale-input detection, not just a done-flag).

    A crash anywhere re-runs at most one extraction shard + the clean
    phase — never a full re-extract.  Returns (extract_manifests,
    clean_manifest).
    """
    import shutil
    import tempfile as _tf

    from .pipeline import (_sweep_orphan_tmp, read_extracted,
                           run_extraction_job)

    ex_dir = os.path.join(out_dir, "extract")
    manifests = run_extraction_job(input_files, ex_dir, cfg,
                                   shard_size=shard_size)
    upstream = {m["shard_id"]: m["checksum"] for m in manifests}

    clean_dir = os.path.join(out_dir, "clean")
    man_p = os.path.join(clean_dir, "manifest.json")
    if os.path.exists(man_p):
        try:
            with open(man_p) as f:
                prev = json.load(f)
            if prev.get("complete") and \
                    prev.get("extract_checksums") == upstream:
                return manifests, prev  # fully up to date
        except (json.JSONDecodeError, OSError):
            pass  # corrupt manifest → rebuild

    t0 = time.monotonic()
    slim = read_extracted(ex_dir, columns=[
        "url", "warc_ts", "content_text", "lang_detected", "lang_conf",
        "status"])
    ok = slim.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok"))
                   .drop_columns(["status"]),
        batch_format="pyarrow")
    clean = clean_extracted(ok, **clean_kw)

    os.makedirs(out_dir, exist_ok=True)
    _sweep_orphan_tmp(out_dir)
    tmp = _tf.mkdtemp(prefix=".clean-", dir=out_dir)
    clean.write_parquet(os.path.join(tmp, "data"))
    import ray.data as rd

    n_out = rd.read_parquet(os.path.join(tmp, "data"),
                            columns=["url"]).count()
    wall = round(time.monotonic() - t0, 3)
    manifest = {
        "phase": "clean",
        "n_rows": n_out,
        "extract_checksums": upstream,
        "funnel": {"extract_ok_rows": sum(m["n_rows"] for m in manifests),
                   "clean_out_rows": n_out},
        "clean_kw": {k: (list(v) if isinstance(v, tuple) else v)
                     for k, v in clean_kw.items()},
        "config_hash": cfg.config_hash(),
        "engine_version": __version__,
        "wall_s": wall,
        "complete": True,
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(clean_dir):  # stale output from a dead/old run
        shutil.rmtree(clean_dir)
    os.rename(tmp, clean_dir)
    return manifests, manifest


def run_curation_job(
    input_files,
    out_dir: str,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    shard_size: int = 8,
    val_bps: int = 500,
    test_bps: int = 500,
    quality_scale: "int | None" = None,
    mixture: "dict | None" = None,
    **clean_kw,
):
    """Three-phase training-data CURATION job — the full story on top
    of ``run_webtext_job`` (extract → clean), adding the curate phase:

    3. **curate** (corpus-global, resumable): over the WRITTEN clean
       output — (a) a stable ``doc_key`` (64-bit url digest) so every
       later decision is reproducible and corpus-version-stable;
       (b) optional quality-weighted downsampling (keep probability
       min(1, n_chars/quality_scale), `ops/agg.weighted_downsample`);
       (c) deterministic train/val/test assignment
       (`ops/agg.hash_split`, basis points); (d) optional per-language
       epoch mixture on the TRAIN split only
       (`ops/agg.upsample_mixture` — val/test are never upsampled).
       Output: ``out/curate/split=train|val|test`` parquet + manifest
       pinning the clean phase's identity (extract checksums + row
       count) — a rerun skips the phase when clean is unchanged and
       rebuilds it when any upstream shard was re-extracted.

    Every decision is a pure function of ``doc_key`` — re-running the
    job on a grown corpus keeps every surviving document's split and
    sampling fate (the leakage-audit property).
    Returns (extract_manifests, clean_manifest, curate_manifest)."""
    import hashlib
    import shutil
    import tempfile as _tf

    import ray.data as rd

    from .ops.agg import hash_split, upsample_mixture, weighted_downsample
    from .pipeline import _sweep_orphan_tmp

    manifests, clean_m = run_webtext_job(
        input_files, out_dir, cfg, shard_size=shard_size, **clean_kw)
    clean_key = {"extract_checksums": clean_m["extract_checksums"],
                 "n_rows": clean_m["n_rows"]}

    curate_dir = os.path.join(out_dir, "curate")
    man_p = os.path.join(curate_dir, "manifest.json")
    if os.path.exists(man_p):
        try:
            with open(man_p) as f:
                prev = json.load(f)
            if prev.get("complete") and prev.get("clean_key") == clean_key:
                return manifests, clean_m, prev
        except (json.JSONDecodeError, OSError):
            pass

    t0 = time.monotonic()
    clean = rd.read_parquet(os.path.join(out_dir, "clean", "data"))

    def add_key(t: pa.Table) -> pa.Table:
        keys = [int.from_bytes(
            hashlib.md5((u or "").encode()).digest()[:8], "big",
            signed=True) for u in t["url"].to_pylist()]
        n_chars = pc.utf8_length(
            pc.fill_null(t["content_text"], "")).cast(pa.int64())
        return (t.append_column("doc_key", pa.array(keys, pa.int64()))
                .append_column("n_chars", n_chars))

    ds = clean.map_batches(add_key, batch_format="pyarrow")
    if quality_scale:
        ds = weighted_downsample(ds, "doc_key", "n_chars", quality_scale)
    ds = hash_split(ds, "doc_key", val_bps=val_bps, test_bps=test_bps)
    # pin: three split filters + counts below consume this multiple
    # times; unpinned each pass re-reads + re-derives
    ds = ds.materialize()

    os.makedirs(out_dir, exist_ok=True)
    _sweep_orphan_tmp(out_dir)
    tmp = _tf.mkdtemp(prefix=".curate-", dir=out_dir)
    counts = {}
    for split in ("train", "val", "test"):
        part = ds.map_batches(
            lambda t, _s=split: t.filter(pc.equal(t["split"], _s)),
            batch_format="pyarrow")
        if split == "train" and mixture:
            part = upsample_mixture(part, "lang_detected", "doc_key",
                                    mixture)
        d = os.path.join(tmp, f"split={split}")
        part.write_parquet(d)
        counts[split] = rd.read_parquet(d, columns=["doc_key"]).count()

    manifest = {
        "phase": "curate",
        "clean_key": clean_key,
        "counts": counts,
        "val_bps": val_bps, "test_bps": test_bps,
        "quality_scale": quality_scale,
        "mixture": mixture,
        "engine_version": __version__,
        "wall_s": round(time.monotonic() - t0, 3),
        "complete": True,
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(curate_dir):
        shutil.rmtree(curate_dir)
    os.rename(tmp, curate_dir)
    return manifests, clean_m, manifest
