"""Driver-contract smoke: entry() runs, queries()/oracle_sql() agree on a
sampled subset (full sweep runs in the driver at sf0.01)."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as E

    return E


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _df(x):
    import pyarrow as pa
    import ray.data

    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def test_entry_runs(entry_mod):
    ds = entry_mod.entry()
    df = _df(ds)
    assert len(df) > 0 and "content_text" in df.columns


def test_every_query_has_callable(entry_mod):
    qs = entry_mod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name
    # every oracle key has a query
    assert set(entry_mod.oracle_sql()) <= set(qs)


def _oracle_names():
    """Every SQL-checked query, discovered from the module itself —
    new oracles are covered automatically (no manual list to rot)."""
    import __ray_entry__ as E

    return sorted(E.oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(entry_mod, sf_dir, name):
    con = _con(sf_dir)
    mine = _df(entry_mod.queries()[name](sf_dir))
    theirs = con.execute(entry_mod.oracle_sql()[name]).fetchdf()
    a = mine[sorted(mine.columns)].astype(str).sort_values(
        sorted(mine.columns), kind="mergesort").reset_index(drop=True)
    b = theirs[sorted(theirs.columns)].astype(str).sort_values(
        sorted(theirs.columns), kind="mergesort").reset_index(drop=True)
    assert a.equals(b), name
