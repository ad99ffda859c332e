"""CLI job driver: ``python -m xtract --input pages/ --out out/``.

The ``ray job submit`` entry point (SURVEY §3.1): builds the frozen
ExtractionConfig, runs the resumable sharded extraction job, prints the
run metrics.  Owns its Ray session (library code never calls
ray.init — the session belongs to entry points only)."""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

from .config import DEFAULT_CONFIG, ExtractionConfig
from .pipeline import run_extraction_job


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m xtract",
        description="Distributed web-text main-content extraction over "
                    "Parquet pages tables (url, warc_ts, html, text, lang).")
    p.add_argument("--input", required=True,
                   help="input parquet file, directory, or glob")
    p.add_argument("--out", required=True, help="output directory (sharded)")
    p.add_argument("--config", help="ExtractionConfig JSON file")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="override a config variable (repeatable; "
                        "unknown keys are rejected)")
    p.add_argument("--shard-size", type=int, default=8,
                   help="input files per output shard (resume granularity)")
    p.add_argument("--blocks", action="store_true",
                   help="also write the blocks hierarchy table per shard")
    p.add_argument("--retry-failed", action="store_true",
                   help="after base shards commit, lenient-re-extract "
                        "bad_encoding/parse_error rows into shard=retry/")
    p.add_argument("--sidecar", action="store_true",
                   help="also write the JSON text+spans sidecar per shard "
                        "(S7 searchable-sidecar sink)")
    p.add_argument("--webtext", action="store_true",
                   help="run the FULL training-data job (checkpointed "
                        "extract phase + corpus-global clean phase: line "
                        "scrub, quality+repetition gates, PII redaction, "
                        "exact dedup) instead of extraction only")
    p.add_argument("--min-chars", type=int, default=80,
                   help="webtext: minimum extracted chars to keep a doc")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    return p


def resolve_inputs(spec: str) -> list[str]:
    if os.path.isdir(spec):
        files = sorted(glob.glob(os.path.join(spec, "*.parquet")))
    elif any(c in spec for c in "*?["):
        files = sorted(glob.glob(spec))
    else:
        files = [spec]
    if not files:
        raise SystemExit(f"no input parquet files match {spec!r}")
    return files


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = DEFAULT_CONFIG
    if args.config:
        with open(args.config) as f:
            cfg = ExtractionConfig.from_json(f.read())
    for kv in args.set:
        key, _, value = kv.partition("=")
        cfg = cfg.with_variable(key, value)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        if args.webtext:
            from .pipelines import run_webtext_job

            manifests, clean_m = run_webtext_job(
                resolve_inputs(args.input), args.out, cfg,
                shard_size=args.shard_size, min_chars=args.min_chars)
            summary = {
                "shards": len(manifests),
                "extract_ok_rows": clean_m["funnel"]["extract_ok_rows"],
                "clean_out_rows": clean_m["funnel"]["clean_out_rows"],
                "config_hash": cfg.config_hash(),
                "out": args.out,
                "engine_version": clean_m["engine_version"],
            }
            print(json.dumps(summary))
            return 0
        manifests = run_extraction_job(
            resolve_inputs(args.input), args.out, cfg,
            shard_size=args.shard_size, write_blocks=args.blocks,
            write_sidecar=args.sidecar, retry_failed=args.retry_failed)
        summary = {
            "shards": len(manifests),
            "n_rows": sum(m["n_rows"] for m in manifests),
            "config_hash": cfg.config_hash(),
            "out": args.out,
            "engine_version": manifests[0]["engine_version"] if manifests else None,
        }
        print(json.dumps(summary))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
