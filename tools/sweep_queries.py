"""Full driver-contract sweep: run EVERY query in __ray_entry__.py
against its DuckDB oracle at a given scale factor, in one fresh Ray
session, with a stricter-than-driver comparison (column names +
string values after sorted-merge ordering).

    python tools/sweep_queries.py [sf_dir]     # default sf0.01

Prints one JSON line: {"ok": N, "rows_only": N, "bad": [...],
"err": [...], "sec": S}.  This script OWNS its Ray session (library
code never calls ray.init)."""

import json
import sys
import time

import duckdb
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")


def _df(x):
    import ray.data

    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


qs, osql = E.queries(), E.oracle_sql()
ok, bad, err, rows_only = 0, [], [], 0
t0 = time.time()
for name in sorted(qs):
    try:
        mine = _df(qs[name](sf))
        if name not in osql:
            rows_only += 1
            continue
        theirs = con.execute(osql[name]).fetchdf()
        cols = sorted(mine.columns)
        a = mine[cols].astype(str).sort_values(
            cols, kind="mergesort").reset_index(drop=True)
        b = theirs[sorted(theirs.columns)].astype(str).sort_values(
            sorted(theirs.columns), kind="mergesort").reset_index(drop=True)
        if list(a.columns) != list(b.columns) or not a.equals(b):
            bad.append(name)
        else:
            ok += 1
    except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
        err.append((name, repr(e)[:150]))
print(json.dumps({"ok": ok, "rows_only": rows_only, "bad": bad,
                  "err": err, "sec": round(time.time() - t0, 1)}))
ray.shutdown()
