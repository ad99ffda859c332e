#!/usr/bin/env python
"""10×-scale soak (round-5 verdict item 2): every published number is
sf0.1 (≈42k pages / 358 MB html), so synthesize an sf1-equivalent
corpus — the SAME 13 fixture families, seed-folded, ×10 volume — and
run the flagship extract + checksum plus the five most expensive timed
pipelines at 32 CPUs in one fresh session.  Reports wall times,
docs/s vs the sf0.1 rate, peak object-store usage and spill bytes
(the zero-spill-stall check).  Prints ONE JSON line.

Inputs (both cached under /tmp, deterministic):
- pages: `synth_pages_dataset(sf0.1, repeat=10, expand=80)` — 80
  seed-folded variants per document ⇒ ~420k pages / ~3.6 GB html.
- tables: each sf0.1 table replicated ×10 into disjoint key-offset
  "worlds" (every id/key column shifted by copy×10⁸, int32 dimension
  keys by copy×10⁵) so joins and group-bys behave identically within
  each copy and the distributions 10× cleanly.

Usage: python tools/soak_sf1.py  (env: RAY_GRAFT_CPUS, default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

SRC_SF = os.environ.get("XTRACT_SOAK_SRC", "/root/testdata/sf0.1")
PAGES_DIR = "/tmp/xtract_soak_pages_e80_r10"
TABLES_DIR = "/tmp/xtract_soak_sf1_tables"
COPIES = 10
OFF64 = 100_000_000  # > any int64 key in sf0.1
OFF32 = 100_000      # int32 dimension keys (nation/region)

# key columns to shift per copy (column → width)
_KEYS = {
    "customer": {"c_custkey": 64, "c_nationkey": 32},
    "documents": {"doc_id": 64},
    "embeddings": {"vec_id": 64},
    "events": {"event_id": 64, "user_id": 64},
    "lineitem": {"l_orderkey": 64, "l_partkey": 64, "l_suppkey": 64},
    "nation": {"n_nationkey": 32, "n_regionkey": 32},
    "orders": {"o_orderkey": 64, "o_custkey": 64},
    "part": {"p_partkey": 64},
    "region": {"r_regionkey": 32},
    "supplier": {"s_suppkey": 64, "s_nationkey": 32},
}


def build_tables() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    done = os.path.join(TABLES_DIR, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(TABLES_DIR, exist_ok=True)
    for name, keys in _KEYS.items():
        src = pq.read_table(f"{SRC_SF}/{name}.parquet")
        copies = []
        for k in range(COPIES):
            t = src
            for col, width in keys.items():
                off = k * (OFF64 if width == 64 else OFF32)
                idx = t.schema.get_field_index(col)
                typ = t.schema.field(col).type
                shifted = pc.cast(
                    pc.add(pc.cast(t[col], pa.int64()), off), typ)
                t = t.set_column(idx, col, shifted)
            copies.append(t)
        pq.write_table(pa.concat_tables(copies),
                       f"{TABLES_DIR}/{name}.parquet")
    with open(done, "w") as f:
        f.write("ok")


def build_pages() -> None:
    done = os.path.join(PAGES_DIR, "_SYNTH_DONE")
    if os.path.exists(done):
        return
    from xtract.synth import synth_pages_dataset

    synth_pages_dataset(SRC_SF, repeat=10, expand=80).write_parquet(
        PAGES_DIR)
    with open(done, "w") as f:
        f.write("ok")


def _mem_summary() -> dict:
    """Spill counters + object-store peak from the raylet's own log
    (the grpc-backed state API is unavailable in this container)."""
    import glob
    import re

    out: dict = {"spill_callbacks": 0}
    try:
        logs = sorted(glob.glob("/tmp/ray/*/session_latest/logs/"
                                "raylet.out")
                      + glob.glob("/tmp/ray/session_latest/logs/"
                                  "raylet.out"))
        txt = open(logs[-1]).read() if logs else ""
        sp = re.findall(r"num object spill callbacks queued: (\d+)", txt)
        if sp:
            out["spill_callbacks"] = max(int(s) for s in sp)
        created = re.findall(r"num bytes created total: (\d+)", txt)
        if created:
            out["bytes_created_gb"] = round(int(created[-1]) / 1e9, 1)
    except OSError as e:
        out["error"] = str(e)
    return out


def main() -> None:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    build_pages()
    build_tables()

    import ray

    if ray.is_initialized():  # pages synthesis auto-inits Ray Data
        ray.shutdown()
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    import __ray_entry__ as _E
    from xtract.metrics import corpus_checksum
    from xtract.pipeline import extract_pages, read_pages

    stats = read_pages(PAGES_DIR).map_batches(
        lambda b: pa.table({
            "n": [len(b)],
            "bytes": [int(pc.sum(pc.binary_length(b["html"])).as_py()
                          or 0)]}),
        batch_format="pyarrow").to_pandas()
    n_docs, html_bytes = int(stats.n.sum()), int(stats.bytes.sum())

    report: dict = {
        "metric": "10x soak: extract + top-5 pipelines at sf1-equiv",
        "num_cpus": ncpu, "n_pages": n_docs,
        "html_gb": round(html_bytes / 1e9, 2),
        "stages": {}, "mem": {},
    }

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = round(time.perf_counter() - t0, 2)
        report["stages"][name] = dt
        report["mem"][name] = _mem_summary()
        print(f"# {name}: {dt}s {report['mem'][name]}",
              file=sys.stderr, flush=True)
        return out

    n_out = timed("extract",
                  lambda: extract_pages(read_pages(PAGES_DIR)).count())
    report["n_out"] = n_out
    report["docs_per_s"] = round(n_out / report["stages"]["extract"], 1)
    report["mb_html_per_s"] = round(
        html_bytes / 1e6 / report["stages"]["extract"], 2)
    timed("extract_checksum",
          lambda: corpus_checksum(extract_pages(read_pages(PAGES_DIR))))

    qs = _E.queries()
    for name, qname in [
        ("skew_join", "orders_skew_join"),
        ("salted_join", "event_type_salted_join"),
        ("anf_hll", "host_anf_hll"),
        ("bucketed_agg", "customer_spend_bucketed"),
        ("market_share", "nation_market_share"),
    ]:
        def run(q=qname):
            out = qs[q](TABLES_DIR)
            if "ray" in type(out).__module__:  # a Dataset
                return int(out.count())
            return len(out)

        report["stages"][name + "_rows"] = timed(name, run)

    report["spill_callbacks_total"] = max(
        (m.get("spill_callbacks", 0) for m in report["mem"].values()
         if isinstance(m, dict)), default=0)
    ray.shutdown()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
