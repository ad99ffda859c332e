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


@pytest.mark.parametrize("name", ["doc_lang_histogram", "doc_token_stats",
                                  "doc_exact_dedup", "embedding_knn",
                                  "simhash_dedup", "paragraph_dedup",
                                  "line_dedup", "canonical_url_dedup",
                                  "doc_langid", "doc_rolling_fp",
                                  "doc_repetition", "doc_mixture_sample",
                                  "page_outlinks", "doc_pii_redact",
                                  "substring_dedup", "minhash_dedup",
                                  "ngram_dedup", "doc_quality",
                                  "embedding_dedup", "bm25_top20",
                                  "bm25_index_top20", "events_hopping",
                                  "events_last_hour", "orders_semi_events",
                                  "orders_blocklist",
                                  "customer_order_quantiles",
                                  "order_price_quantiles",
                                  "nb_lang_classify", "host_pagerank",
                                  "crawl_snapshot_diff",
                                  "doc_bits_per_char",
                                  "page_head_meta",
                                  "heavy_hitter_hosts",
                                  "lineitem_bloom_semi",
                                  "page_structured",
                                  "doc_length_gate"])
def test_query_matches_oracle(entry_mod, sf_dir, name):
    con = _con(sf_dir)
    mine = _df(entry_mod.queries()[name](sf_dir))
    theirs = con.execute(entry_mod.oracle_sql()[name]).fetchdf()
    a = mine[sorted(mine.columns)].astype(str).sort_values(
        sorted(mine.columns), kind="mergesort").reset_index(drop=True)
    b = theirs[sorted(theirs.columns)].astype(str).sort_values(
        sorted(theirs.columns), kind="mergesort").reset_index(drop=True)
    assert a.equals(b), name
