"""Check ONE driver query against its DuckDB oracle at one or more SFs.

    python tools/check_query.py <name> [sf_dir ...]

Defaults to sf0.001 AND sf0.01.  Same comparison discipline as
tools/sweep_queries.py (sorted columns, sorted rows, string values).
Owns its Ray session (library code never calls ray.init)."""

import sys
import time

import duckdb
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E  # noqa: E402

name = sys.argv[1]
sfs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
qs, osql = E.queries(), E.oracle_sql()


def _df(x):
    import ray.data

    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def norm(df):
    df = df[sorted(df.columns)]
    return (df.sort_values(list(df.columns))
            .reset_index(drop=True).astype(str))


rc = 0
for sf in sfs:
    t0 = time.time()
    r = norm(_df(qs[name](sf)))
    if name not in osql:
        print(f"{sf}: rows_only {r.shape} {time.time()-t0:.1f}s")
        continue
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    o = norm(con.execute(osql[name]).df())
    if r.shape == o.shape and list(r.columns) == list(o.columns) \
            and r.equals(o):
        print(f"{sf}: MATCH {r.shape} {time.time()-t0:.1f}s")
    else:
        rc = 1
        print(f"{sf}: MISMATCH ray={r.shape} oracle={o.shape}")
        merged = r.merge(o, how="outer", indicator=True)
        diff = merged[merged["_merge"] != "both"]
        print(diff.head(12).to_string())
ray.shutdown()
sys.exit(rc)
