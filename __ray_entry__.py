"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline; ``queries()`` exposes
one callable per implemented operator/pipeline (SURVEY.md §2 + the
training-data ops); ``oracle_sql()`` gives DuckDB-equivalent SQL for the
SQL-expressible ones (extraction / LSH / ANN entries are non-SQL →
rows-only check).

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/ray.shutdown() here or in the library code these use.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _pages(sf_dir: str):
    from xtract.synth import synth_pages_dataset

    return synth_pages_dataset(sf_dir)


def entry() -> Any:
    """Flagship: synthesize Common-Crawl-style pages from sf0.001 and run
    the full extraction pipeline (validate → skew split → actor-pool
    extract).  Returns the extracted Dataset."""
    from xtract.pipeline import extract_pages

    return extract_pages(_pages("/root/testdata/sf0.001"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_doc_lang_histogram(sf_dir: str):
    from ray.data.aggregate import Count

    out = _docs(sf_dir, ["lang"]).groupby("lang").aggregate(
        Count(alias_name="n_docs"))
    return out.to_pandas()


def _q_doc_source_stats(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum

    return _docs(sf_dir, ["source", "n_chars"]).groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    ).to_pandas()


def _q_doc_token_stats(sf_dir: str):
    from xtract.ops.textstats import text_stats_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        text_stats_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_alpha", "n_digit", "n_punct", "n_upper"])


def _q_doc_fingerprint(sf_dir: str):
    from xtract.ops.textstats import text_stats_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        text_stats_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"])


def _q_doc_exact_dedup(sf_dir: str):
    from xtract.ops.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def _q_events_by_type(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    df = ev.groupby("event_type").aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="total_value")
    ).to_pandas()
    df["total_value"] = df["total_value"].round(2)
    return df


def _q_events_daily(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    ev = ev.map_batches(
        lambda b: pa.table({"day": pc.strftime(b["ts"], format="%Y-%m-%d")}),
        batch_format="pyarrow")
    return ev.groupby("day").aggregate(Count(alias_name="n_events")).to_pandas()


def _q_lineitem_pricing(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    df = li.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_price"),
        Count(alias_name="n_rows"),
    ).to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["sum_price"] = df["sum_price"].round(2)
    return df


def _q_top_customers(sf_dir: str):
    """Broadcast hash join: customer is the small side — shipped once via
    ray.put, looked up per batch (no shuffle join; SURVEY §2.5)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"]).to_pandas()
    lookup_ref = ray.put(dict(zip(cust.c_custkey.astype("int64"), cust.c_name)))

    def attach(b: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        keys = b["o_custkey"].to_pylist()
        return b.append_column("c_name", pa.array([lk.get(k) for k in keys],
                                                  pa.string()))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    df = orders.map_batches(attach, batch_format="pyarrow").groupby(
        ["o_custkey", "c_name"]).aggregate(
        Sum("o_totalprice", alias_name="total_spend"),
        Count(alias_name="n_orders"),
    ).to_pandas()
    df = df.rename(columns={"o_custkey": "c_custkey"})
    df["total_spend"] = df["total_spend"].round(2)
    df = df.sort_values(["total_spend", "c_custkey"],
                        ascending=[False, True], kind="mergesort").head(10)
    return df.reset_index(drop=True)


def _q_part_brand_stats(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Mean

    pt = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_brand", "p_retailprice", "p_size"])
    df = pt.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Mean("p_retailprice", alias_name="avg_price"),
        Max("p_size", alias_name="max_size"),
    ).to_pandas()
    df["avg_price"] = df["avg_price"].round(2)
    return df


def _q_supplier_nation(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"]).to_pandas()
    lookup_ref = ray.put(dict(zip(nat.n_nationkey.astype("int64"), nat.n_name)))

    def attach(b: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        return pa.table({"n_name": pa.array(
            [lk.get(k) for k in b["s_nationkey"].to_pylist()], pa.string())})

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey"])
    return sup.map_batches(attach, batch_format="pyarrow").groupby(
        "n_name").aggregate(Count(alias_name="n_suppliers")).to_pandas()


def _q_embedding_knn(sf_dir: str):
    """Brute-force cosine top-10 of the vec_id=0 embedding (exact ANN
    baseline; float scores excluded from the compared output)."""
    from xtract.ops.similarity import knn_bruteforce

    emb = _emb(sf_dir)
    q0 = [r["embedding"] for r in emb.take(1)][0]
    out = knn_bruteforce(emb, np.asarray([q0], np.float64), k=10).to_pandas()
    return out[["rank", "vec_id"]]


def _q_knn_sq8(sf_dir: str):
    """Scalar-quantized (int8) ANN (``ops/similarity.knn_sq8``):
    candidate generation over 8×-compressed codes + exact float64
    rescore inside each batch.  Same query/top-10 as `embedding_knn`
    and the SAME SQL oracle — the rescore margin (rescore=8) makes the
    compressed path land the exact answer on this corpus, which is the
    check."""
    from xtract.ops.similarity import knn_sq8

    emb = _emb(sf_dir)
    q0 = [r["embedding"] for r in emb.take(1)][0]
    out = knn_sq8(emb, np.asarray([q0], np.float64), k=10).to_pandas()
    return out[["rank", "vec_id"]]


def _q_doc_upsample_mix(sf_dir: str):
    """Deterministic fractional upsampling to a target mixture
    (``ops/agg.upsample_mixture``): src0 ×2.5, src1 ×0.25, src2
    dropped, everything else ×1 — per-row repeat counts are a pure
    function of (source, lcg(doc_id)), so the exact copy multiset is
    SQL-reconstructible.  No shuffle; one repeat/take kernel per
    batch."""
    from xtract.ops.agg import upsample_mixture

    docs = _docs(sf_dir, ["doc_id", "source"])
    out = upsample_mixture(docs, "source", "doc_id",
                           {"src0": 2.5, "src1": 0.25, "src2": 0})
    return out


def _q_doc_hash_split(sf_dir: str):
    """Deterministic train/val/test split (``ops/agg.hash_split``):
    lcg(doc_id) basis points → 5% val / 5% test / 90% train; a
    document keeps its split across corpus versions (leakage-audit
    property)."""
    from xtract.ops.agg import hash_split

    return hash_split(_docs(sf_dir, ["doc_id"]), "doc_id")


def _q_doc_content_split(sf_dir: str):
    """Leak-proof content-hash split (``ops/agg.content_split``):
    byte-identical documents land in the same split BY CONSTRUCTION
    (split = f(md5-prefix of text), not of the id) — zero shuffle."""
    from xtract.ops.agg import content_split

    return content_split(_docs(sf_dir, ["doc_id", "text"])) \
        .select_columns(["doc_id", "split"])


_CONTENT_SPLIT_SQL = (
    "WITH h AS (SELECT doc_id, "
    "CAST(('0x' || left(md5(coalesce(text, '')), 16)) AS UBIGINT) AS hu "
    "FROM documents), "
    "b AS (SELECT doc_id, (CAST(hu AS HUGEINT) * 2654435761 + 12345) "
    "% 4294967296 % 10000 AS bp FROM h) "
    "SELECT doc_id, CASE WHEN bp < 500 THEN 'val' "
    "WHEN bp < 1000 THEN 'test' ELSE 'train' END AS split "
    "FROM b ORDER BY doc_id")


def _q_doc_quality_sample(sf_dir: str):
    """Per-row soft quality sampling (``ops/agg.weighted_downsample``):
    keep probability min(1, n_chars/4000) decided by lcg(doc_id) —
    deterministic, shuffle-free, SQL-replayable."""
    from xtract.ops.agg import weighted_downsample

    return weighted_downsample(_docs(sf_dir, ["doc_id", "n_chars"]),
                               "doc_id", "n_chars", scale=4000)


def _q_doc_sample_per_source(sf_dir: str):
    """Balanced per-stratum sample (``ops/agg.sample_per_key``): ≤3
    documents per source, ranked by (lcg(doc_id), doc_id) — the
    eval-slice construction; block combiner prunes before the one
    co-group exchange."""
    from xtract.ops.agg import sample_per_key

    return sample_per_key(_docs(sf_dir, ["doc_id", "source"]),
                          "source", "doc_id", k=3)


def _q_doc_curation_pipeline(sf_dir: str):
    """Capstone composition: quality-weighted downsample → hash split
    → per-source mixture upsampling on the TRAIN split only — the
    in-memory shape of ``pipelines.run_curation_job``, SQL-checked
    end-to-end (the three ops compose as pure functions of
    lcg(doc_id), so the chained oracle is exact)."""
    from xtract.ops.agg import (hash_split, upsample_mixture,
                                weighted_downsample)

    ds = weighted_downsample(_docs(sf_dir, ["doc_id", "source",
                                            "n_chars"]),
                             "doc_id", "n_chars", scale=4000)
    ds = hash_split(ds, "doc_id")
    train = ds.map_batches(
        lambda t: t.filter(pc.equal(t["split"], "train")),
        batch_format="pyarrow")
    rest = ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["split"], "train")),
        batch_format="pyarrow")
    train = upsample_mixture(train, "source", "doc_id", {"src0": 2})
    rest = upsample_mixture(rest, "source", "doc_id", {})  # copy_idx=0
    out = train.union(rest)
    return out.select_columns(["doc_id", "source", "split", "copy_idx"])


_LCG_SQL = "((doc_id * 2654435761 + 12345) % 4294967296)"


def _curation_pipeline_sql() -> str:
    return (
        "WITH kept AS (SELECT doc_id, source, n_chars FROM documents "
        f"WHERE {_LCG_SQL} % 1000000 < "
        "least(n_chars * 1000000 // 4000, 1000000)), "
        f"sp AS (SELECT doc_id, source, CASE WHEN {_LCG_SQL} % 10000 "
        "< 500 THEN 'val' WHEN "
        f"{_LCG_SQL} % 10000 < 1000 THEN 'test' ELSE 'train' END "
        "AS split FROM kept), "
        "r AS (SELECT doc_id, source, split, "
        "CASE WHEN split = 'train' AND source = 'src0' THEN 2 ELSE 1 "
        "END AS reps FROM sp) "
        "SELECT doc_id, source, split, "
        "CAST(t.copy_idx AS BIGINT) AS copy_idx "
        "FROM r, UNNEST(range(r.reps)) AS t(copy_idx) "
        "ORDER BY doc_id, copy_idx")


def _sample_per_source_sql() -> str:
    return (
        f"WITH r AS (SELECT doc_id, source, {_LCG_SQL} AS pri, "
        "row_number() OVER (PARTITION BY source "
        f"ORDER BY {_LCG_SQL}, doc_id) AS rn FROM documents) "
        "SELECT doc_id, source FROM r WHERE rn <= 3 "
        "ORDER BY source, doc_id")


def _quality_sample_sql() -> str:
    return (
        "SELECT doc_id, n_chars FROM documents "
        f"WHERE {_LCG_SQL} % 1000000 < "
        "least(n_chars * 1000000 // 4000, 1000000) ORDER BY doc_id")


def _upsample_mix_sql() -> str:
    return (
        "WITH r AS (SELECT doc_id, source, "
        "CASE WHEN source = 'src0' THEN 2 + (CASE WHEN "
        f"{_LCG_SQL} % 1000000 < 500000 THEN 1 ELSE 0 END) "
        "WHEN source = 'src1' THEN (CASE WHEN "
        f"{_LCG_SQL} % 1000000 < 250000 THEN 1 ELSE 0 END) "
        "WHEN source = 'src2' THEN 0 ELSE 1 END AS reps "
        "FROM documents) "
        "SELECT doc_id, source, CAST(t.copy_idx AS BIGINT) AS copy_idx "
        "FROM r, UNNEST(range(r.reps)) AS t(copy_idx) "
        "ORDER BY doc_id, copy_idx")


def _hash_split_sql() -> str:
    return (
        f"WITH b AS (SELECT doc_id, {_LCG_SQL} % 10000 AS bp "
        "FROM documents) "
        "SELECT doc_id, CASE WHEN bp < 500 THEN 'val' "
        "WHEN bp < 1000 THEN 'test' ELSE 'train' END AS split "
        "FROM b ORDER BY doc_id")


def _q_orders_priority_histogram(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    return rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_orderpriority"]).groupby(
        "o_orderpriority").aggregate(Count(alias_name="n_orders")).to_pandas()


def _q_discount_revenue(sf_dir: str):
    """TPC-H Q6 shape: filtered single-row aggregate, filter pushed into
    the vectorized batch predicate."""
    import ray.data as rd

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice", "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        mask = pc.and_(pc.greater_equal(b["l_discount"], 0.05),
                       pc.less(b["l_quantity"], 24.0))
        f = b.filter(mask)
        part = pc.sum(pc.multiply(f["l_extendedprice"], f["l_discount"]))
        return pa.table({"partial": [part.as_py() or 0.0],
                         "n": [len(f)]})

    parts = li.map_batches(rev, batch_format="pyarrow").to_pandas()
    import pandas as pd

    return pd.DataFrame({"revenue": [round(parts.partial.sum(), 2)],
                         "n_rows": [int(parts.n.sum())]})


def _q_nation_customer_balance(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"]).to_pandas()
    ref = ray.put(dict(zip(nat.n_nationkey.astype("int64"), nat.n_name)))

    def attach(b: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        return pa.table({
            "n_name": pa.array([lk.get(k) for k in
                                b["c_nationkey"].to_pylist()], pa.string()),
            "c_acctbal": b["c_acctbal"],
        })

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_nationkey", "c_acctbal"])
    df = cust.map_batches(attach, batch_format="pyarrow").groupby(
        "n_name").aggregate(Count(alias_name="n_customers"),
                            Sum("c_acctbal", alias_name="total_balance")).to_pandas()
    df["total_balance"] = df["total_balance"].round(2)
    return df


def _q_events_hourly_by_type(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.joins import tumbling_window

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    df = tumbling_window(ev, "ts", every="hour", keys=["event_type"],
                         aggs=[Count(alias_name="n_events"),
                               Sum("value", alias_name="total_value")]).to_pandas()
    df["total_value"] = df["total_value"].round(2)
    return df


def _q_user_running_total(sf_dir: str):
    import ray.data as rd

    from xtract.ops.joins import windowed_running

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])
    return windowed_running(ev, "user_id", "ts", "value")


def _q_last_order_before_event(sf_dir: str):
    """As-of join: each event matched to the user's most recent order at
    or before the event time (custom operator — broadcast + per-key
    searchsorted; SURVEY §2.5 note on joins)."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.joins import asof_join_broadcast

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"]).to_pandas()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    joined = asof_join_broadcast(ev, orders, "user_id", "ts",
                                 "o_custkey", "o_orderdate", ["o_orderdate"])

    def fmt(b: pa.Table) -> pa.Table:
        dates = b["o_orderdate_asof"].to_pylist()
        return pa.table({
            "event_id": b["event_id"],
            "last_order_date": pa.array(
                [None if d is None else pd.Timestamp(d).strftime("%Y-%m-%d")
                 for d in dates], pa.string()),
        })

    return joined.map_batches(fmt, batch_format="pyarrow")


def _q_user_sessions(sf_dir: str):
    import ray.data as rd

    from xtract.ops.joins import session_windows

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    return session_windows(ev, "user_id", "ts", gap_minutes=30)


def _q_event_gaps(sf_dir: str):
    """Per-user LAG/LEAD offsets: integer-µs gap to the previous and
    next event.  The library op yields nulls at each user's first/last
    event; the query maps those to -1 so the output stays non-null
    int64 end-to-end (Arrow int64-with-nulls would round-trip to
    float64 in pandas and break the driver's value compare)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from xtract.ops.joins import lag_lead_gaps

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])

    def seal(b: pa.Table) -> pa.Table:
        for c in ("gap_prev_us", "gap_next_us"):
            # rebuild from numpy so the field drops its validity
            # bitmap — pandas then sees plain int64, not nullable Int64
            v = pc.fill_null(b[c].cast(pa.int64()), -1)
            arr = pa.array(v.to_numpy(zero_copy_only=False)
                           .astype(np.int64))
            b = b.set_column(b.column_names.index(c), c, arr)
        return b

    return lag_lead_gaps(ev, "user_id", "ts").map_batches(
        seal, batch_format="pyarrow")


def _q_user_rolling_window(sf_dir: str):
    """Per-user fixed 10-row rolling sum in integer cents (bounded
    window frame — the moving-average building block)."""
    import ray.data as rd

    from xtract.ops.joins import rolling_window_sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])
    return rolling_window_sum(ev, "user_id", "ts", "value", window_rows=10)


def _q_source_doc_cap(sf_dir: str):
    """Domain balancing: keep at most 5 documents per source, preferring
    the longest (then smallest doc_id) — the per-domain cap every crawl
    pipeline applies before mixing (composition of
    ``ops/agg.top_k_per_key``)."""
    import pyarrow.compute as pc

    from xtract.ops.agg import top_k_per_key

    docs = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def neg(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_neg", pc.multiply(t["n_chars"], pa.scalar(-1, pa.int64())))

    capped = top_k_per_key(docs.map_batches(neg, batch_format="pyarrow"),
                           "source", ("_neg", "doc_id"), k=5)
    return capped.select_columns(["doc_id", "source", "n_chars"])


def _q_target_anchor_stats(sf_dir: str):
    """Anchor-text aggregation per link target (crawl-graph quality
    signal): total in-links, distinct source pages, sorted distinct
    anchor texts — over the same planted outlink pages as
    ``page_outlinks``."""
    from xtract.links import extract_outlinks
    from xtract.ops.agg import grouped_concat_stats

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _outlink_pages_batch, batch_format="pyarrow")
    links = extract_outlinks(pages)
    st = grouped_concat_stats(links, "href", "url", "anchor_text")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["target", "n_links", "n_pages", "anchors"])

    return st.map_batches(rename, batch_format="pyarrow")


def _q_doc_exact_dedup_best(sf_dir: str):
    """Keep-BEST-representative exact dedup: one winner per identical
    text, preferred by (source, doc_id) — the quality-aware variant of
    ``doc_exact_dedup``'s min-id winner (composition of
    ``ops/agg.first_row_per_key`` over the content hash)."""
    import hashlib

    from xtract.ops.agg import first_row_per_key

    docs = _docs(sf_dir, ["doc_id", "text", "source"])

    def h(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5((x or "").encode()).hexdigest()
              for x in t["text"].to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()),
                         "doc_id": t["doc_id"], "source": t["source"]})

    best = first_row_per_key(docs.map_batches(h, batch_format="pyarrow"),
                             "h", ("source", "doc_id"))
    return best.select_columns(["doc_id", "source"])


def _dirty_text_batch(t: pa.Table) -> pa.Table:
    """Append deterministic Unicode mess to each doc (combining acute,
    NBSP, zero-widths, CR/LF, trailing spaces); the SQL oracle
    chr()-constructs the identical string."""
    texts = t["text"].to_pylist()
    mess = (" cafe\u0301\u00a0x\u200by\r\n tail\ufeff  ")
    return pa.table({"doc_id": t["doc_id"],
                     "text": pa.array([(x or "") + mess for x in texts],
                                      pa.string())})


def _q_doc_normalize(sf_dir: str):
    """Unicode normalization (NFC + zero-width scrub + NBSP map +
    whitespace collapse) over planted dirty docs — SQL-checked byte for
    byte including the ``changed`` flag."""
    from xtract.ops.textnorm import normalize_text

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _dirty_text_batch, batch_format="pyarrow")
    return normalize_text(docs)


def _events_day_cents_batch(t: pa.Table) -> pa.Table:
    import numpy as np
    import pyarrow.compute as pc

    cents = np.round(t["value"].to_numpy(zero_copy_only=False) * 100) \
              .astype("int64")
    return pa.table({"event_type": t["event_type"],
                     "day": pc.strftime(t["ts"], format="%Y-%m-%d"),
                     "cents": pa.array(cents)})


def _q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day) in one exchange — per-(type,
    day) cells, per-type totals, and the grand total, rolled-up dims
    labeled 'ALL' (``ops/agg.rollup_counts``)."""
    import ray.data as rd

    from xtract.ops.agg import rollup_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    return rollup_counts(ev.map_batches(_events_day_cents_batch,
                                        batch_format="pyarrow"),
                         ("event_type", "day"), "cents")


def _q_event_type_anomalies(sf_dir: str):
    """Traffic-anomaly cells: (event_type, day) whose count exceeds
    1.2× that type's daily mean — exact integer rule
    ``5 · n_day · n_days > 6 · total`` (no float thresholds), per-type
    totals broadcast (≤ #types rows) instead of a second shuffle."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    cells = (ev.map_batches(_events_day_cents_batch,
                            batch_format="pyarrow")
               .groupby(["event_type", "day"])
               .aggregate(Count(alias_name="n_events")))
    from ray.data.aggregate import Sum

    # cells is small (types × days) and consumed twice — pin it so Ray
    # doesn't re-run the upstream exchange per consumer
    cells = cells.materialize()
    per_type = {
        r["event_type"]: (int(r["total"]), int(r["n_days"]))
        for r in cells.groupby("event_type").aggregate(
            Sum("n_events", alias_name="total"),
            Count(alias_name="n_days")).take_all()
    }

    def flag(t: pa.Table) -> pa.Table:
        import numpy as np

        types = t["event_type"].to_pylist()
        n = t["n_events"].to_numpy(zero_copy_only=False).astype("int64")
        tot = np.array([per_type[x][0] for x in types], np.int64)
        nd = np.array([per_type[x][1] for x in types], np.int64)
        return t.filter(pa.array(5 * n * nd > 6 * tot))

    return cells.map_batches(flag, batch_format="pyarrow")


_IVF_INT = dict(k=10, n_cells=8, nprobe=3, iters=4, train_mod=2,
                qids=(0, 7), dim=64)


def _q_knn_ivf_int(sf_dir: str):
    """Integer IVF ANN (train → assign → probe → score, all int64) —
    the SQL-checkable twin of ``knn_ivf``: the oracle re-derives the
    whole index with unrolled k-means CTEs and hash-matches
    (query_id, vec_id, d) exactly."""
    from xtract.ops.similarity import knn_ivf_int

    p = _IVF_INT
    return knn_ivf_int(_emb(sf_dir), list(p["qids"]), k=p["k"],
                       n_cells=p["n_cells"], nprobe=p["nprobe"],
                       iters=p["iters"], train_mod=p["train_mod"])


def _ivf_prefix_sql(p=None) -> str:
    """Shared oracle prefix for the integer-k-means family: quantize
    (floor(x·65536)+65536), init centroids from evenly spaced rows of
    the id-ordered training sample, ``iters`` unrolled Lloyd rounds
    (argmin squared-L2 assignment, ``sum // count`` update, empty
    cells keep their centroid), then assign EVERY vector → ``vasg``.
    Ends mid-WITH (trailing comma) so callers append their own CTEs.
    ``p`` overrides the `_IVF_INT` parameter set (the second
    SemDeDup configuration uses its own cells/iters/stride)."""
    if p is None:
        p = _IVF_INT
    q = (f"WITH idx AS (SELECT unnest(range({p['dim']})) AS j), "
         "emb_e AS (SELECT vec_id, j, "
         "CAST(floor(embedding[j + 1] * 65536) AS BIGINT) + 65536 AS q "
         "FROM embeddings, idx), "
         "train_ids AS (SELECT vec_id, "
         "row_number() OVER (ORDER BY vec_id) - 1 AS rn FROM embeddings "
         f"WHERE vec_id % {p['train_mod']} = 0), "
         "prm AS (SELECT greatest(1, count(*) // "
         f"{p['n_cells']}) AS step FROM train_ids), "
         "cent0 AS (SELECT CAST(t.rn // p.step AS BIGINT) AS cell, e.j, "
         "e.q FROM train_ids t, prm p, emb_e e "
         "WHERE e.vec_id = t.vec_id AND t.rn % p.step = 0 "
         f"AND t.rn // p.step < {p['n_cells']}), ")
    for i in range(1, p["iters"] + 1):
        q += (
            f"dist{i} AS (SELECT e.vec_id, c.cell, "
            "sum((e.q - c.q) * (e.q - c.q)) AS d FROM emb_e e "
            "JOIN train_ids t ON e.vec_id = t.vec_id "
            f"JOIN cent{i - 1} c ON c.j = e.j GROUP BY e.vec_id, c.cell), "
            f"asg{i} AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, "
            "row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) "
            f"AS rnk FROM dist{i}) WHERE rnk = 1), "
            f"cent{i} AS (SELECT a.cell, e.j, sum(e.q) // count(*) AS q "
            f"FROM asg{i} a JOIN emb_e e ON e.vec_id = a.vec_id "
            "GROUP BY a.cell, e.j "
            f"UNION ALL SELECT c.cell, c.j, c.q FROM cent{i - 1} c "
            f"WHERE c.cell NOT IN (SELECT DISTINCT cell FROM asg{i})), ")
    fin = f"cent{p['iters']}"
    q += (
        "vdist AS (SELECT e.vec_id, c.cell, "
        f"sum((e.q - c.q) * (e.q - c.q)) AS d FROM emb_e e JOIN {fin} c "
        "ON c.j = e.j GROUP BY e.vec_id, c.cell), "
        "vasg AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, "
        "row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) "
        "AS rnk FROM vdist) WHERE rnk = 1), ")
    return q


def _ivf_int_sql() -> str:
    """Oracle for knn_ivf_int: the shared integer-k-means prefix, then
    probe the ``nprobe`` nearest cells per query and rank candidates
    by (d, vec_id)."""
    p = _IVF_INT
    fin = f"cent{p['iters']}"
    qv = " UNION ALL ".join(
        f"SELECT CAST({qi} AS BIGINT) AS query_id, "
        f"CAST({vid} AS BIGINT) AS vec_id"
        for qi, vid in enumerate(p["qids"]))
    q = _ivf_prefix_sql()
    q += (
        f"qv AS ({qv}), "
        "qe AS (SELECT qv.query_id, e.j, e.q FROM qv "
        "JOIN emb_e e ON e.vec_id = qv.vec_id), "
        "qd AS (SELECT qe.query_id, c.cell, "
        f"sum((qe.q - c.q) * (qe.q - c.q)) AS d FROM qe JOIN {fin} c "
        "ON c.j = qe.j GROUP BY qe.query_id, c.cell), "
        "probes AS (SELECT query_id, cell FROM (SELECT query_id, cell, "
        "row_number() OVER (PARTITION BY query_id ORDER BY d, cell) "
        f"AS rnk FROM qd) WHERE rnk <= {p['nprobe']}), "
        "cand AS (SELECT p.query_id, v.vec_id FROM probes p "
        "JOIN vasg v ON v.cell = p.cell), "
        "sc AS (SELECT c.query_id, c.vec_id, "
        "sum((qe.q - e.q) * (qe.q - e.q)) AS d FROM cand c "
        "JOIN qe ON qe.query_id = c.query_id "
        "JOIN emb_e e ON e.vec_id = c.vec_id AND e.j = qe.j "
        "GROUP BY c.query_id, c.vec_id) "
        "SELECT query_id, vec_id, CAST(d AS BIGINT) AS d FROM ("
        "SELECT query_id, vec_id, d, row_number() OVER ("
        "PARTITION BY query_id ORDER BY d, vec_id) AS rnk FROM sc) "
        f"WHERE rnk <= {p['k']}")
    return q


_SEMDEDUP_EPS = 5_500_000_000  # squared-L2 in quantized units (~0.5th
                               # pair-distance percentile at sf0.01)


def _q_semantic_dedup_int(sf_dir: str):
    """Integer SemDeDup: duplicate iff an earlier-id member of the same
    k-means cell lies within eps — same integer centroids as
    ``knn_ivf_int``, fully re-derived by the SQL oracle."""
    from xtract.ops.similarity import semantic_dedup_int

    p = _IVF_INT
    return semantic_dedup_int(_emb(sf_dir), eps=_SEMDEDUP_EPS,
                              n_cells=p["n_cells"], iters=p["iters"],
                              train_mod=p["train_mod"])


def _semantic_dedup_int_sql() -> str:
    """Oracle for semantic_dedup_int: shared integer-k-means prefix →
    within-cell earlier-id pairs → pairwise squared-L2 → dup flag."""
    q = _ivf_prefix_sql()
    q += (
        "pairs AS (SELECT a.vec_id AS xa, b.vec_id AS xb FROM vasg a "
        "JOIN vasg b ON a.cell = b.cell AND b.vec_id < a.vec_id), "
        "pd AS (SELECT p.xa, p.xb, "
        "sum((ea.q - eb.q) * (ea.q - eb.q)) AS d FROM pairs p "
        "JOIN emb_e ea ON ea.vec_id = p.xa "
        "JOIN emb_e eb ON eb.vec_id = p.xb AND eb.j = ea.j "
        "GROUP BY p.xa, p.xb), "
        f"dup AS (SELECT DISTINCT xa AS vec_id FROM pd "
        f"WHERE d <= {_SEMDEDUP_EPS}) "
        "SELECT e.vec_id, e.vec_id IN (SELECT vec_id FROM dup) AS is_dup "
        "FROM embeddings e")
    return q


_FUNNEL_STEPS = ("view", "click", "purchase")


def _q_event_funnel(sf_dir: str):
    """Greedy first-occurrence funnel view → click → purchase
    (``ops/behavior.funnel_counts``)."""
    import ray.data as rd

    from xtract.ops.behavior import funnel_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel_counts(ev, "user_id", "ts", _FUNNEL_STEPS)


def _q_cohort_retention(sf_dir: str):
    """Cohort retention matrix: first-active-day cohorts × integer day
    offset, exact distinct-user counts
    (``ops/behavior.cohort_retention``)."""
    import ray.data as rd

    from xtract.ops.behavior import cohort_retention

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return cohort_retention(ev, "user_id", "ts")


def _q_user_dominant_event(sf_dir: str):
    """Grouped MODE: each user's most frequent event type (ties → the
    lexicographically smallest type) with its count
    (``ops/agg.grouped_mode``)."""
    import ray.data as rd

    from xtract.ops.agg import grouped_mode

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    return grouped_mode(ev, "user_id", "event_type")


def _q_doc_keywords(sf_dir: str):
    """TF-IDF keyword extraction: top-3 terms per document by integer
    micro-ln score (``ops/ranking.tfidf_top_terms``)."""
    from xtract.ops.ranking import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir, ["doc_id", "text"]), k=3)


def _q_user_range_window(sf_dir: str):
    """Per-user 60-minute TIME-RANGE rolling sum in integer cents
    (``ops/joins.range_window_sum`` — peers at the current timestamp
    included, matching SQL RANGE frame semantics)."""
    import ray.data as rd

    from xtract.ops.joins import range_window_sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])
    return range_window_sum(ev, "user_id", "ts", "value",
                            width_minutes=60)


def _q_user_event_ntile(sf_dir: str):
    """Per-user rank + NTILE(4) bucket over the event stream
    (``ops/joins.ranked_ntile``, exact SQL NTILE fill semantics)."""
    import ray.data as rd

    from xtract.ops.joins import ranked_ntile

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    return ranked_ntile(ev, "user_id", "ts", n_tiles=4)


def _q_user_event_pivot(sf_dir: str):
    """Pivot to wide: per-user event counts as one column per type
    (fixed small domain) — indicator columns built in the map stage,
    ONE groupby with native Sums (no co-group needed)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    types = ["click", "error", "purchase", "signup", "view"]
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def indicators(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty in types:
            cols[f"n_{ty}"] = pc.cast(
                pc.equal(t["event_type"], ty), pa.int64())
        return pa.table(cols)

    return (ev.map_batches(indicators, batch_format="pyarrow")
              .groupby("user_id")
              .aggregate(*[Sum(f"n_{ty}", alias_name=f"n_{ty}")
                           for ty in types]))


def _q_corpus_refresh_dedup(sf_dir: str):
    """Incremental corpus refresh: union an UPDATED slice (every 4th
    doc, text suffixed '[v2]', priority 0) with the full base corpus
    (priority 1) and keep one row per doc_id preferring the update —
    ``Dataset.union`` + ``first_row_per_key`` on (priority, source).
    The SQL oracle rebuilds the same union with CASE."""
    import ray.data as rd

    from xtract.ops.agg import first_row_per_key

    base = _docs(sf_dir, ["doc_id", "text"])

    def updated(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % 4 == 0
        sub = t.filter(pa.array(keep))
        texts = [(x or "") + " [v2]" for x in sub["text"].to_pylist()]
        return pa.table({"doc_id": sub["doc_id"],
                         "text": pa.array(texts, pa.string()),
                         "priority": pa.array([0] * len(sub), pa.int64())})

    def tag_base(t: pa.Table) -> pa.Table:
        return t.append_column("priority",
                               pa.array([1] * len(t), pa.int64()))

    upd = base.map_batches(updated, batch_format="pyarrow")
    merged = upd.union(base.map_batches(tag_base, batch_format="pyarrow"))
    return first_row_per_key(merged, "doc_id", ("priority",)) \
        .select_columns(["doc_id", "text", "priority"])


_FUZZY_CANON = ["alpha stream report", "beta window digest",
                "gamma join summary"]


def _fuzzy_titles_batch(t: pa.Table) -> pa.Table:
    """doc_id → a deterministically mutated canonical title (identity /
    first-char drop / first-char swap / suffix) with every 5th doc a
    no-match garbage string; the SQL oracle CASE-builds the same."""
    ids = t["doc_id"].to_pylist()
    out = []
    for d in ids:
        if d % 5 == 0:
            out.append("zzzz qqqq wwww")
            continue
        c = _FUZZY_CANON[d % 3]
        m = d % 4
        out.append(c if m == 0 else c[1:] if m == 1
                   else "x" + c[1:] if m == 2 else c + "x")
    return pa.table({"doc_id": t["doc_id"],
                     "title": pa.array(out, pa.string())})


def _q_fuzzy_title_match(sf_dir: str):
    """Fuzzy entity normalization: nearest canonical title by
    Levenshtein ≤ 2 over broadcast candidates
    (``ops/fuzzy.fuzzy_match``)."""
    from xtract.ops.fuzzy import fuzzy_match

    docs = _docs(sf_dir, ["doc_id"]).map_batches(
        _fuzzy_titles_batch, batch_format="pyarrow")
    return fuzzy_match(docs, "title", _FUZZY_CANON, max_dist=2)


def _fuzzy_sql() -> str:
    cands = ", ".join(f"'{c}'" for c in _FUZZY_CANON)
    canon = ("CASE doc_id % 3 " +
             " ".join(f"WHEN {i} THEN '{c}'"
                      for i, c in enumerate(_FUZZY_CANON)) + " END")
    return (
        f"WITH t AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN "
        f"'zzzz qqqq wwww' WHEN doc_id % 4 = 0 THEN {canon} "
        f"WHEN doc_id % 4 = 1 THEN substr({canon}, 2) "
        f"WHEN doc_id % 4 = 2 THEN 'x' || substr({canon}, 2) "
        f"ELSE {canon} || 'x' END AS title FROM documents), "
        f"c AS (SELECT unnest([{cands}]) AS cand), "
        "d AS (SELECT t.doc_id, c.cand, levenshtein(t.title, c.cand) "
        "AS d FROM t, c), "
        "best AS (SELECT doc_id, cand, d, row_number() OVER ("
        "PARTITION BY doc_id ORDER BY d, cand) AS rn FROM d) "
        "SELECT doc_id, CASE WHEN d <= 2 THEN cand ELSE '' END "
        "AS best_match, CAST(CASE WHEN d <= 2 THEN d ELSE -1 END "
        "AS BIGINT) AS dist FROM best WHERE rn = 1")


def _table_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a page with one 3-row table (headers, an entity, a
    mod-valued cell, an unclosed cell) and for doc_id%4==0 a second
    table; the SQL oracle CASE-constructs the expected cell rows."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://host{d % 6}.example.org/p/{d}")
        h = ("<html><body><table><tr><th>k</th><th>v</th></tr>"
             f"<tr><td>row{d % 3}</td><td>{d % 7}</td></tr>"
             f"<tr><td>a &amp; b<td>{d % 5}</table>")
        if d % 4 == 0:
            h += f"<table><tr><td>x{d % 2}</td></tr></table>"
        h += "</body></html>"
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_page_tables(sf_dir: str):
    """HTML table extraction (structured-data surface): tokenizer walk
    → one row per cell with (table, row, col) grid indices, recovery
    for unclosed cells (``xtract/tables.py``)."""
    from xtract.tables import extract_tables

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _table_pages_batch, batch_format="pyarrow")
    return extract_tables(pages)


def _page_tables_sql() -> str:
    page = ("'https://host' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org/p/' || CAST(doc_id AS VARCHAR)")
    rows = [
        ("0", "0", "0", "'k'", "true", None),
        ("0", "0", "1", "'v'", "true", None),
        ("0", "1", "0", "'row' || CAST(doc_id % 3 AS VARCHAR)", "false",
         None),
        ("0", "1", "1", "CAST(doc_id % 7 AS VARCHAR)", "false", None),
        ("0", "2", "0", "'a & b'", "false", None),
        ("0", "2", "1", "CAST(doc_id % 5 AS VARCHAR)", "false", None),
        ("1", "0", "0", "'x' || CAST(doc_id % 2 AS VARCHAR)", "false",
         "doc_id % 4 = 0"),
    ]
    parts = []
    for t, r, c, txt, hdr, cond in rows:
        q = (f"SELECT {page} AS url, CAST({t} AS BIGINT) AS table_idx, "
             f"CAST({r} AS BIGINT) AS row_idx, CAST({c} AS BIGINT) "
             f"AS col_idx, {txt} AS cell_text, {hdr} AS is_header "
             "FROM documents")
        if cond:
            q += f" WHERE {cond}"
        parts.append(q)
    return " UNION ALL ".join(parts)


def _q_doc_chunks(sf_dir: str):
    """Sliding-window document chunking for embedding/RAG prep
    (``ops/packing.chunk_documents``, 32-token windows, stride 24)."""
    from xtract.ops.packing import chunk_documents

    return chunk_documents(_docs(sf_dir, ["doc_id", "text"]),
                           size=32, stride=24)


def _heading_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a page with an h1, a nested-markup h2, and for
    doc_id%6==0 an unterminated h3 (recovery path)."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://host{d % 6}.example.org/p/{d}")
        h = (f"<html><body><h1>Title &amp; {d % 5}</h1><p>body</p>"
             f"<h2>Sec <b>{d % 3}</b></h2>")
        if d % 6 == 0:
            h += f"<h3>tail {d % 2}"
        h += "</body></html>"
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_page_headings(sf_dir: str):
    """Document-outline extraction: one row per h1–h6 heading in
    document order (``xtract/tables.extract_headings``)."""
    from xtract.tables import extract_headings

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _heading_pages_batch, batch_format="pyarrow")
    return extract_headings(pages)


def _page_headings_sql() -> str:
    page = ("'https://host' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org/p/' || CAST(doc_id AS VARCHAR)")
    return (
        f"SELECT {page} AS url, CAST(0 AS BIGINT) AS rank, "
        "CAST(1 AS BIGINT) AS level, "
        "'Title & ' || CAST(doc_id % 5 AS VARCHAR) AS heading "
        "FROM documents "
        f"UNION ALL SELECT {page}, 1, 2, "
        "'Sec ' || CAST(doc_id % 3 AS VARCHAR) FROM documents "
        f"UNION ALL SELECT {page}, 2, 3, "
        "'tail ' || CAST(doc_id % 2 AS VARCHAR) FROM documents "
        "WHERE doc_id % 6 = 0")


def _image_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a page with a base-href-relative img (alt with an
    entity), an absolute img with empty alt, and for doc_id%3==0 a
    src-less img that must be skipped."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://host{d % 6}.example.org/p/{d}")
        h = (f"<html><head><base href='/imgs{d % 2}/'></head><body>"
             f"<img src='pic{d % 4}.png' alt='cat &amp; dog {d % 3}'>")
        if d % 3 == 0:
            h += "<img alt='no src'>"
        h += (f"<img src='https://cdn{d % 5}.example.com/x.jpg'/>"
              "</body></html>")
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_page_images(sf_dir: str):
    """Image-reference harvest (multimodal crawl surface): one row per
    ``<img src>`` with base-href-resolved src and unescaped alt
    (``xtract/tables.extract_images``)."""
    from xtract.tables import extract_images

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _image_pages_batch, batch_format="pyarrow")
    return extract_images(pages)


def _page_images_sql() -> str:
    page = ("'https://host' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org/p/' || CAST(doc_id AS VARCHAR)")
    root = ("'https://host' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org/imgs' || CAST(doc_id % 2 AS VARCHAR) || '/'")
    return (
        f"SELECT {page} AS url, CAST(0 AS BIGINT) AS rank, "
        f"{root} || 'pic' || CAST(doc_id % 4 AS VARCHAR) || '.png' AS src, "
        "'cat & dog ' || CAST(doc_id % 3 AS VARCHAR) AS alt "
        "FROM documents "
        f"UNION ALL SELECT {page}, 1, "
        "'https://cdn' || CAST(doc_id % 5 AS VARCHAR) || "
        "'.example.com/x.jpg', '' FROM documents")


def _q_user_value_trend(sf_dir: str):
    """Per-user least-squares value-vs-time trend as EXACT integer
    slope numerator/denominator (``ops/behavior.trend_per_key``)."""
    import ray.data as rd

    from xtract.ops.behavior import trend_per_key

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    return trend_per_key(ev, "user_id", "ts", "value")


def _q_host_components(sf_dir: str):
    """Distributed connected components (the dedup tier's CC engine,
    `ops/cc.connected_components_ds`) over a planted 97-host graph of
    THIRTY ~3-hop chains — edges (h, h−30) — so min-label propagation
    needs several rounds (not a single-hop star) at a cost the
    correctness sweep can afford; expected labels are provably
    h % 30."""
    import numpy as np

    from xtract.ops.cc import connected_components_ds

    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        h = np.unique(t["doc_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % 97)
        h = h[h >= 30]
        return pa.table({"a": pa.array(h), "b": pa.array(h - 30)})

    e = docs.map_batches(edges, batch_format="pyarrow")
    return connected_components_ds(e, max_rounds=10)


def _q_doc_phrase_search(sf_dir: str):
    """Exact token-adjacency phrase search (`ops/ranking.phrase_search`)
    — fully-vectorized Arrow normalize + count_substring; the oracle
    replays the non-overlapping scan rule via replace()-length
    arithmetic on the identically-normalized token string."""
    from xtract.ops.ranking import phrase_search

    return phrase_search(_docs(sf_dir, ["doc_id", "text"]),
                         "table table").sort("doc_id")


_ENTITY_NAMES = ["Alice", "Bob", "Carol", "Dave", "Erin", "Frank",
                 "Grace", "Heidi"]


def _entity_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a sentence mentioning three planted names (with one
    repeated, so per-doc distinctness is exercised)."""
    ids, texts = [], []
    for d in t["doc_id"].to_pylist():
        n1 = _ENTITY_NAMES[d % 8]
        n2 = _ENTITY_NAMES[(d * 3 + 1) % 8]
        n3 = _ENTITY_NAMES[(d * 5 + 2) % 8]
        ids.append(d)
        texts.append(f"{n1} met {n2} and {n3}, said {n1}.")
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _q_entity_cooccurrence(sf_dir: str):
    """Entity co-occurrence pairs (`ops/collocations.entity_cooccurrence`)
    over planted name sentences; the oracle rebuilds the same distinct
    per-doc name sets from doc_id with list indexing."""
    from xtract.ops.collocations import entity_cooccurrence

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _entity_pages_batch, batch_format="pyarrow")
    return entity_cooccurrence(pages).sort(["ent_a", "ent_b"])


def _feed_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → an RSS body (even ids, two items, entity in the first
    title) or an Atom body (odd ids, one entry with a decoy second
    <link href>)."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://feeds.example.org/{d}")
        if d % 2 == 0:
            h = (f"<rss><channel><title>chan</title>"
                 f"<item><title>P{d} &amp; x</title>"
                 f"<link>https://h{d % 5}.org/{d}/0</link>"
                 f"<pubDate>D{d % 9}</pubDate></item>"
                 f"<item><title>Q{d}</title>"
                 f"<link>https://h{d % 5}.org/{d}/1</link></item>"
                 f"</channel></rss>")
        else:
            h = (f"<feed><entry><title>E{d}</title>"
                 f"<link href='https://a{d % 3}.net/{d}'/>"
                 f"<link href='https://decoy'/>"
                 f"<updated>U{d % 7}</updated></entry></feed>")
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_feed_entries(sf_dir: str):
    """RSS/Atom feed parsing (`xtract/tables.parse_feed`) — the eighth
    tokenizer-walk surface; planted mixed-kind bodies, closed-form
    oracle."""
    from xtract.tables import extract_feed_entries

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _feed_pages_batch, batch_format="pyarrow")
    return extract_feed_entries(pages)


def _feed_entries_sql() -> str:
    url = "'https://feeds.example.org/' || CAST(doc_id AS VARCHAR)"
    return (
        f"SELECT {url} AS url, CAST(0 AS BIGINT) AS entry_idx, "
        "'rss' AS kind, "
        "'P' || CAST(doc_id AS VARCHAR) || ' & x' AS title, "
        "'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.org/' || "
        "CAST(doc_id AS VARCHAR) || '/0' AS link, "
        "'D' || CAST(doc_id % 9 AS VARCHAR) AS ts_raw "
        "FROM documents WHERE doc_id % 2 = 0 "
        f"UNION ALL SELECT {url}, 1, 'rss', "
        "'Q' || CAST(doc_id AS VARCHAR), "
        "'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.org/' || "
        "CAST(doc_id AS VARCHAR) || '/1', '' "
        "FROM documents WHERE doc_id % 2 = 0 "
        f"UNION ALL SELECT {url}, 0, 'atom', "
        "'E' || CAST(doc_id AS VARCHAR), "
        "'https://a' || CAST(doc_id % 3 AS VARCHAR) || '.net/' || "
        "CAST(doc_id AS VARCHAR), "
        "'U' || CAST(doc_id % 7 AS VARCHAR) "
        "FROM documents WHERE doc_id % 2 = 1")


def _media_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a page with a base-href video carrying two sources
    (one typed), a direct-src audio, and for doc_id % 4 == 0 an
    orphan <source> that must be skipped."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://m{d % 6}.example.org/v/{d}")
        h = (f"<html><head><base href='/mm{d % 2}/'></head><body>"
             f"<video poster='po{d % 3}.jpg'>"
             f"<source src='v{d % 4}.mp4' type='video/mp4'>"
             f"<source src='v{d % 4}.webm'></video>"
             f"<audio src='a{d % 5}.ogg'></audio>")
        if d % 4 == 0:
            h += "<source src='orphan.mp4'>"
        h += "</body></html>"
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_page_media(sf_dir: str):
    """Audio/video reference harvest (`xtract/tables.extract_media`)
    — the media-tier crawl surface: source scoping, parent tag,
    poster/base resolution; closed-form planted oracle."""
    from xtract.tables import extract_media

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _media_pages_batch, batch_format="pyarrow")
    return extract_media(pages)


def _page_media_sql() -> str:
    url = ("'https://m' || CAST(doc_id % 6 AS VARCHAR) || "
           "'.example.org/v/' || CAST(doc_id AS VARCHAR)")
    root = ("'https://m' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org/mm' || CAST(doc_id % 2 AS VARCHAR) || '/'")
    poster = f"{root} || 'po' || CAST(doc_id % 3 AS VARCHAR) || '.jpg'"
    return (
        f"SELECT {url} AS url, CAST(0 AS BIGINT) AS rank, "
        f"'video' AS media_tag, {root} || 'v' || "
        "CAST(doc_id % 4 AS VARCHAR) || '.mp4' AS src, "
        f"'video/mp4' AS mime_type, {poster} AS poster FROM documents "
        f"UNION ALL SELECT {url}, 1, 'video', {root} || 'v' || "
        "CAST(doc_id % 4 AS VARCHAR) || '.webm', '', "
        f"{poster} FROM documents "
        f"UNION ALL SELECT {url}, 2, 'audio', {root} || 'a' || "
        "CAST(doc_id % 5 AS VARCHAR) || '.ogg', '', '' FROM documents")


def _q_user_freshness_score(sf_dir: str):
    """Exponential time-decay activity score per user
    (`ops/behavior.decayed_counts`, half-life 1 day, exact power-of-
    two integer weights); the reference instant is the corpus max ts
    (deterministic), and the oracle replays the shift arithmetic."""
    import ray.data as rd

    from xtract.ops.behavior import decayed_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    ref = ev.max("ts")
    import pandas as pd

    ref_us = int(pd.Timestamp(ref).value // 1_000)
    return decayed_counts(ev, "user_id", "ts", ref_us,
                          half_life_s=86_400, age_cap=30) \
        .sort("user_id")


def _q_host_pagerank_weighted(sf_dir: str):
    """Edge-weighted integer PageRank
    (`ops/graph.pagerank_weighted`, 2 iterations) on a planted
    weighted host graph; the oracle unrolls both iterations as CTEs
    with the same per-edge floor rule."""
    from ray.data.aggregate import Count

    from xtract.ops.graph import pagerank_weighted

    docs = _docs(sf_dir, ["doc_id"])

    def res(t: pa.Table) -> pa.Table:
        h = np.unique(t["doc_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % 50)
        return pa.table({"h": pa.array(h)})

    hs = (docs.map_batches(res, batch_format="pyarrow")
          .groupby("h").aggregate(Count(alias_name="_n"))
          .select_columns(["h"]))

    def edges(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([h, h])),
            "dst": pa.array(np.concatenate([(h + 7) % 50,
                                            (h + 1) % 50])),
            "w": pa.array(np.concatenate([1 + h % 4,
                                          np.full(len(h), 2,
                                                  np.int64)]))})

    return pagerank_weighted(
        hs.map_batches(edges, batch_format="pyarrow"),
        iters=2).sort("node")


def _pagerank_weighted_sql(iters: int = 2) -> str:
    parts = [
        "WITH hs AS (SELECT DISTINCT CAST(doc_id % 50 AS BIGINT) "
        "AS h FROM documents), "
        "e AS (SELECT h AS s, (h + 7) % 50 AS d, 1 + h % 4 AS w "
        "FROM hs UNION ALL SELECT h, (h + 1) % 50, 2 FROM hs), "
        "ws AS (SELECT s, SUM(w) AS t FROM e GROUP BY s), "
        "n AS (SELECT DISTINCT x AS node FROM "
        "(SELECT s AS x FROM e UNION SELECT d FROM e)), "
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n)"]
    for k in range(iters):
        parts.append(
            f", i{k + 1} AS (SELECT e.d AS node, "
            f"SUM(r{k}.r * e.w // ws.t) AS inflow FROM e "
            f"JOIN r{k} ON r{k}.node = e.s "
            f"JOIN ws ON ws.s = e.s GROUP BY 1)"
            f", r{k + 1} AS (SELECT n.node, 150000 + 85 * "
            f"COALESCE(i{k + 1}.inflow, 0) // 100 AS r "
            f"FROM n LEFT JOIN i{k + 1} USING (node))")
    parts.append(
        f" SELECT node, CAST(r AS BIGINT) AS pagerank_micro "
        f"FROM r{iters} ORDER BY node")
    return "".join(parts)


def _q_host_neighbor_features(sf_dir: str):
    """Two-hop neighborhood feature aggregation
    (`ops/graph.neighbor_aggregate`) over a planted host graph; edge
    duplicates are removed with a global distinct first (sums are
    duplicate-sensitive, unlike the CC plants)."""
    from ray.data.aggregate import Count

    from xtract.ops.graph import neighbor_aggregate

    docs = _docs(sf_dir, ["doc_id"])

    def res(t: pa.Table) -> pa.Table:
        h = np.unique(t["doc_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % 40)
        return pa.table({"h": pa.array(h)})

    hs = (docs.map_batches(res, batch_format="pyarrow")
          .groupby("h").aggregate(Count(alias_name="_n"))
          .select_columns(["h"]))

    def edges(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([h, h])),
            "dst": pa.array(np.concatenate([(h + 1) % 40,
                                            (h + 13) % 40]))})

    def feats(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(h),
                         "f": pa.array((h * h) % 101)})

    return neighbor_aggregate(
        hs.map_batches(edges, batch_format="pyarrow"),
        hs.map_batches(feats, batch_format="pyarrow"),
        hops=2).sort("node")


def _neighbor_features_sql() -> str:
    return (
        "WITH hs AS (SELECT DISTINCT CAST(doc_id % 40 AS BIGINT) "
        "AS h FROM documents), "
        "e AS (SELECT h AS src, (h + 1) % 40 AS dst FROM hs "
        "UNION ALL SELECT h, (h + 13) % 40 FROM hs), "
        "f0 AS (SELECT h AS node, (h * h) % 101 AS f FROM hs), "
        "a1 AS (SELECT e.dst AS node, SUM(f0.f) AS s "
        "FROM e JOIN f0 ON f0.node = e.src GROUP BY 1), "
        "a2 AS (SELECT e.dst AS node, SUM(a1.s) AS s, "
        "COUNT(*) AS c FROM e JOIN a1 ON a1.node = e.src "
        "GROUP BY 1) "
        "SELECT node, CAST(s AS BIGINT) AS agg_sum, "
        "CAST(c AS BIGINT) AS agg_cnt FROM a2 ORDER BY node")


def _q_event_type_rules(sf_dir: str):
    """Market-basket association rules
    (`ops/behavior.association_rules`) over per-user event-type
    baskets — exact integer confidence and lift."""
    import ray.data as rd

    from xtract.ops.behavior import association_rules

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    return association_rules(ev, "user_id", "event_type") \
        .sort(["item_a", "item_b"])


def _assoc_rules_sql() -> str:
    return (
        "WITH mem AS (SELECT DISTINCT user_id AS k, event_type AS i "
        "FROM events), "
        "nk AS (SELECT COUNT(DISTINCT k) AS n FROM mem), "
        "sup AS (SELECT i, COUNT(*) AS n FROM mem GROUP BY i), "
        "pr AS (SELECT a.i AS item_a, b.i AS item_b, "
        "COUNT(*) AS n_both FROM mem a JOIN mem b "
        "ON a.k = b.k AND a.i <> b.i GROUP BY 1, 2) "
        "SELECT item_a, item_b, CAST(n_both AS BIGINT) AS n_both, "
        "CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b, "
        "CAST((SELECT n FROM nk) AS BIGINT) AS n_keys, "
        "CAST(1000000 * n_both // sa.n AS BIGINT) AS conf_ppm, "
        "CAST(1000000 * n_both * (SELECT n FROM nk) // "
        "(sa.n * sb.n) AS BIGINT) AS lift_ppm "
        "FROM pr JOIN sup sa ON sa.i = item_a "
        "JOIN sup sb ON sb.i = item_b ORDER BY 1, 2")


def _q_user_event_paths(sf_dir: str):
    """Ordered per-key string aggregation
    (`ops/agg.grouped_ordered_concat`) — each user's full event-type
    breadcrumb in (ts, event_id) order; oracle = string_agg with
    ORDER BY."""
    import ray.data as rd

    from xtract.ops.agg import grouped_ordered_concat

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    return grouped_ordered_concat(ev, "user_id", "event_type",
                                  ["ts", "event_id"]).sort("user_id")


def _q_doc_set_containment(sf_dir: str):
    """Asymmetric set containment (`ops/graph.containment_pairs`) —
    the near-SUPERSET detector Jaccard misses; planted membership
    table with per-set domain sizes so small sets sit inside big
    ones; the oracle brute-forces the same pairs in SQL."""
    from xtract.ops.graph import containment_pairs

    docs = _docs(sf_dir, ["doc_id"])

    def members(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = d % 20
        m = (d // 20) % (2 + s % 5)
        return pa.table({"s": pa.array(s), "m": pa.array(m)})

    return containment_pairs(
        docs.map_batches(members, batch_format="pyarrow"), "s", "m",
        min_contain_ppm=800_000).sort(["a", "b"])


def _containment_sql() -> str:
    return (
        "WITH mem AS (SELECT DISTINCT CAST(doc_id % 20 AS BIGINT) "
        "AS s, CAST((doc_id // 20) % (2 + (doc_id % 20) % 5) "
        "AS BIGINT) AS m FROM documents), "
        "sz AS (SELECT s, COUNT(*) AS n FROM mem GROUP BY s), "
        "pr AS (SELECT x.s AS a, y.s AS b, COUNT(*) AS shared "
        "FROM mem x JOIN mem y ON x.m = y.m AND x.s < y.s "
        "GROUP BY 1, 2) "
        "SELECT pr.a, pr.b, shared, sa.n AS n_a, sb.n AS n_b, "
        "1000000 * shared // LEAST(sa.n, sb.n) AS contain_ppm "
        "FROM pr JOIN sz sa ON sa.s = pr.a "
        "JOIN sz sb ON sb.s = pr.b "
        "WHERE 1000000 * shared // LEAST(sa.n, sb.n) >= 800000 "
        "ORDER BY 1, 2")


def _q_customers_no_events_except(sf_dir: str):
    """Relational EXCEPT (`ops/agg.except_distinct`): customers who
    never produced an event, as one tagged groupby exchange; oracle =
    SQL EXCEPT."""
    import ray.data as rd

    from xtract.ops.agg import except_distinct

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"]).map_batches(
        lambda b: pa.table({"c_custkey": b["user_id"]}),
        batch_format="pyarrow")
    return except_distinct(cust, ev, ["c_custkey"]).sort("c_custkey")


def _q_events_users_intersect(sf_dir: str):
    """Relational INTERSECT (`ops/agg.intersect_distinct`): user ids
    present in BOTH the events feed and the customer table."""
    import ray.data as rd

    from xtract.ops.agg import intersect_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"]).map_batches(
        lambda b: pa.table({"user_id": b["c_custkey"]}),
        batch_format="pyarrow")
    return intersect_distinct(ev, cust, ["user_id"]).sort("user_id")


def _q_events_pseudonymized(sf_dir: str):
    """Salted-SHA256 pseudonymization (`ops/pii.pseudonymize`) of the
    events user ids; oracle = DuckDB sha256 over the same rendering."""
    import ray.data as rd

    from xtract.ops.pii import pseudonymize

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id"])
    return pseudonymize(ev, ["user_id"], salt="corpus1")


def _q_orders_sorted_join(sf_dir: str):
    """Zero-shuffle sort-merge join (`ops/sorted_layout.sorted_join`):
    orders and customer each written once as range-sorted stores, the
    join plan pairs files by envelope overlap and never exchanges a
    row; oracle = plain inner join."""
    import tempfile

    import ray.data as rd

    from xtract.ops.sorted_layout import sorted_join, write_sorted

    base = tempfile.mkdtemp(prefix="sorted_join_")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    write_sorted(orders.repartition(8), f"{base}/orders", "o_custkey")
    write_sorted(cust.repartition(4), f"{base}/customer", "c_custkey")
    return sorted_join(f"{base}/orders", f"{base}/customer")


def _q_site_doc_counts(sf_dir: str):
    """Registrable-domain (eTLD+1) aggregation
    (`ops/urls.add_site_column`): planted hosts across PSL suffixes
    with www/cdn prefixes collapse to one site each; closed-form
    oracle."""
    from ray.data.aggregate import Count

    from xtract.ops.urls import add_site_column

    docs = _docs(sf_dir, ["doc_id"])

    def hosts(t: pa.Table) -> pa.Table:
        sufs = ["co.uk", "org", "github.io", "com.au", "net"]
        out = []
        for d in t["doc_id"].to_pylist():
            pre = "www." if d % 3 == 0 else ("cdn." if d % 3 == 1
                                             else "")
            out.append(f"{pre}s{d % 10}.{sufs[d % 5]}")
        return pa.table({"host": pa.array(out, pa.string())})

    sites = add_site_column(docs.map_batches(hosts,
                                             batch_format="pyarrow"))
    return sites.groupby("site").aggregate(Count(alias_name="n_docs"))


def _site_counts_sql() -> str:
    site = ("'s' || CAST(doc_id % 10 AS VARCHAR) || '.' || "
            "CASE doc_id % 5 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'org' "
            "WHEN 2 THEN 'github.io' WHEN 3 THEN 'com.au' "
            "ELSE 'net' END")
    return (f"SELECT {site} AS site, COUNT(*) AS n_docs "
            "FROM documents GROUP BY 1 ORDER BY 1")


def _q_lineitem_unpivot(sf_dir: str):
    """Generic UNPIVOT/melt (`ops/agg.unpivot`) of three lineitem
    measures to long form (sampled keys); oracle = UNION ALL."""
    import ray.data as rd

    from xtract.ops.agg import unpivot

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_discount", "l_tax"])
    li = li.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(
            pc.cast(b["l_orderkey"], pa.int64()), pa.scalar(31)), 0)),
        batch_format="pyarrow")
    return unpivot(li, ["l_orderkey", "l_linenumber"],
                   ["l_quantity", "l_discount", "l_tax"],
                   value_type=pa.float64())


def _lineitem_unpivot_sql() -> str:
    base = ("FROM lineitem WHERE (l_orderkey & 31) = 0")
    parts = []
    for c in ("l_quantity", "l_discount", "l_tax"):
        parts.append(
            f"SELECT l_orderkey, l_linenumber, '{c}' AS variable, "
            f"CAST({c} AS DOUBLE) AS value {base}")
    return " UNION ALL ".join(parts)


def _q_host_homographs(sf_dir: str):
    """Homograph host detection (`ops/urls.homograph_groups`) over
    planted hosts where every doc_id % 7 == 0 row spoofs its site's
    'example' with a Cyrillic а; the oracle folds the same confusable
    table with a replace() chain."""
    from xtract.ops.urls import homograph_groups

    docs = _docs(sf_dir, ["doc_id"])

    def hosts(t: pa.Table) -> pa.Table:
        out = []
        for d in t["doc_id"].to_pylist():
            dom = "exаmple" if d % 7 == 0 else "example"
            out.append(f"site{d % 20}.{dom}.org")
        return pa.table({"host": pa.array(out, pa.string())})

    return homograph_groups(
        docs.map_batches(hosts, batch_format="pyarrow")) \
        .sort(["skeleton", "host"])


def _homograph_sql() -> str:
    from xtract.ops.urls import CONFUSABLES

    expr = "lower(host)"
    for k, v in CONFUSABLES.items():
        expr = f"replace({expr}, '{k}', '{v}')"
    return (
        "WITH hosts AS (SELECT DISTINCT CASE WHEN doc_id % 7 = 0 "
        "THEN 'site' || CAST(doc_id % 20 AS VARCHAR) || "
        "'.exаmple.org' "
        "ELSE 'site' || CAST(doc_id % 20 AS VARCHAR) || "
        "'.example.org' END AS host FROM documents), "
        f"sk AS (SELECT host, {expr} AS skeleton FROM hosts), "
        "g AS (SELECT skeleton, COUNT(DISTINCT host) AS n_hosts "
        "FROM sk GROUP BY skeleton) "
        "SELECT s.skeleton, s.host, CAST(g.n_hosts AS BIGINT) "
        "AS n_hosts FROM sk s JOIN g USING (skeleton) "
        "WHERE g.n_hosts >= 2 ORDER BY 1, 2")


def _q_user_event_breadth(sf_dir: str):
    """Running COUNT(DISTINCT event_type) per user
    (`ops/joins.cumulative_distinct`) — the window family's
    exploration-breadth member; oracle = SUM-of-first-flag window
    rewrite."""
    import ray.data as rd

    from xtract.ops.joins import cumulative_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "event_id"])
    return cumulative_distinct(ev, "user_id", "ts", "event_type")


def _q_url_change_rate(sf_dir: str):
    """Recrawl change-rate estimation (`ops/urls.change_rate`) over a
    planted 10-visit history per url (url_id = doc_id % 50, fp cycles
    at a per-url cadence); the oracle replays it with a LAG window."""
    from xtract.ops.urls import change_rate

    docs = _docs(sf_dir, ["doc_id"])

    def hist(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "url_id": pa.array(d % 50),
            "ts": pa.array(d),
            "fingerprint": pa.array(
                ((d // 50) // (1 + (d % 50) % 3)) % 4)})

    return change_rate(docs.map_batches(hist, batch_format="pyarrow"),
                       key="url_id").sort("url_id")


def _q_host_scc(sf_dir: str):
    """Strongly connected components
    (`ops/graph.strongly_connected_components`) over a planted DAG of
    3-cycles: block b = {3b, 3b+1, 3b+2} is one cycle (one SCC), with
    one-way bridges 3b → 3b+3 between consecutive blocks — so the
    provable label is 3·(node // 3) (bridge targets whose block is
    absent are singletons, for which the same closed form holds)."""
    from xtract.ops.graph import strongly_connected_components

    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        h = np.unique(t["doc_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % 90)
        b = np.unique(h // 3)
        base = b * 3
        s = np.concatenate([base, base + 1, base + 2])
        d = np.concatenate([base + 1, base + 2, base])
        bb = b[b < 29]
        return pa.table({
            "src": pa.array(np.concatenate([s, bb * 3])),
            "dst": pa.array(np.concatenate([d, bb * 3 + 3]))})

    return strongly_connected_components(
        docs.map_batches(edges, batch_format="pyarrow")).sort("node")


def _q_events_stream_enrich(sf_dir: str):
    """Stream-table join (`ops/streaming.stream_enrich`): the events
    feed streams through sharded lookup actors that each own a slice
    of a BUCKETED customer dimension (written once with
    `ops/bucketed.write_bucketed`); LEFT-join semantics — events
    whose user has no customer row keep a null nation.  Oracle: the
    same LEFT JOIN in SQL."""
    import tempfile

    import ray.data as rd

    from xtract.ops.bucketed import write_bucketed
    from xtract.ops.streaming import stream_enrich

    dim_dir = tempfile.mkdtemp(prefix="stream_dim_")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda b: pa.table({"user_id": b["c_custkey"],
                            "c_nationkey": b["c_nationkey"]}),
        batch_format="pyarrow")
    write_bucketed(cust, dim_dir, "user_id", 16)
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id"])
    tbl, _miss = stream_enrich(
        ev.iter_batches(batch_format="pyarrow", batch_size=2048),
        dim_dir, "user_id", ["c_nationkey"], n_shards=4)
    return tbl


def _q_orders_fd_audit(sf_dir: str):
    """Exact functional-dependency mining (`ops/profile.fd_candidates`)
    over three orders columns: o_orderkey → * holds (key), the
    reverse directions fail."""
    import ray.data as rd

    from xtract.ops.profile import fd_candidates

    cols = ["o_orderkey", "o_custkey", "o_orderpriority"]
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)
    return fd_candidates(orders, cols).sort(["col_a", "col_b"])


def _fd_audit_sql() -> str:
    cols = ["o_orderkey", "o_custkey", "o_orderpriority"]
    blocks = []
    for a in cols:
        for b in cols:
            if a == b:
                continue
            n_lhs = f"(SELECT COUNT(DISTINCT {a}) FROM orders)"
            n_pairs = ("(SELECT COUNT(*) FROM (SELECT DISTINCT "
                       f"{a}, {b} FROM orders))")
            blocks.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"{n_lhs} AS n_lhs, {n_pairs} AS n_pairs, "
                f"{n_lhs} = {n_pairs} AS fd_holds")
    return " UNION ALL ".join(blocks)


def _phrase_search_sql() -> str:
    p = " table table "
    return (
        "WITH s AS (SELECT doc_id, ' ' || array_to_string("
        "regexp_extract_all(lower(text), '[a-z0-9_]+'), ' ') || ' ' "
        "AS s FROM documents) "
        f"SELECT doc_id, CAST((length(s) - length(replace(s, '{p}', "
        f"''))) / length('{p}') AS BIGINT) AS n_occ "
        f"FROM s WHERE position('{p}' IN s) > 0 ORDER BY doc_id")


def _entity_cooc_sql() -> str:
    lst = "[" + ", ".join(f"'{n}'" for n in _ENTITY_NAMES) + "]"
    return (
        f"WITH ns AS (SELECT doc_id, {lst} AS a FROM documents), "
        "d AS (SELECT doc_id, a[(doc_id % 8) + 1] AS e FROM ns "
        "UNION SELECT doc_id, a[((doc_id * 3 + 1) % 8) + 1] FROM ns "
        "UNION SELECT doc_id, a[((doc_id * 5 + 2) % 8) + 1] FROM ns) "
        "SELECT x.e AS ent_a, y.e AS ent_b, COUNT(*) AS n_docs "
        "FROM d x JOIN d y ON x.doc_id = y.doc_id AND x.e < y.e "
        "GROUP BY 1, 2 ORDER BY 1, 2")


def _crawl_depth_sql() -> str:
    """Recursive-CTE replay of the planted BFS: UNION dedups visited
    (node, d) pairs, the d < 12 bound terminates the walk, and
    MIN(d) per node equals the BFS min-hop depth."""
    return (
        "WITH RECURSIVE hs AS (SELECT DISTINCT CAST(doc_id % 60 AS "
        "BIGINT) AS h FROM documents), "
        "edges AS (SELECT h AS src, h + 1 AS dst FROM hs WHERE h < 59 "
        "UNION ALL SELECT h, h + 9 FROM hs "
        "WHERE h % 4 = 0 AND h + 9 < 60), "
        "walk(node, d) AS ("
        "SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT) "
        "UNION SELECT CAST(37 AS BIGINT), CAST(0 AS BIGINT) "
        "UNION SELECT e.dst, w.d + 1 FROM walk w "
        "JOIN edges e ON e.src = w.node WHERE w.d < 12) "
        "SELECT node, MIN(d) AS depth FROM walk GROUP BY node "
        "ORDER BY node")


def _k_core_sql(rounds: int = 5) -> str:
    """The k=2 peel unrolled as CTEs: the planted graph converges in
    three rounds, so five unrolled rounds reach the same fixpoint the
    op iterates to."""
    parts = [
        "WITH hs AS (SELECT DISTINCT CAST(doc_id % 40 AS BIGINT) AS h "
        "FROM documents), "
        "raw AS (SELECT h, CASE WHEN h < 10 THEN (h + 1) % 10 "
        "ELSE h - 10 END AS o FROM hs), "
        "e0 AS (SELECT LEAST(h, o) AS a, GREATEST(h, o) AS b FROM raw "
        "WHERE h <> o GROUP BY 1, 2)"]
    for i in range(rounds):
        parts.append(
            f", d{i} AS (SELECT node, COUNT(*) AS deg FROM "
            f"(SELECT a AS node FROM e{i} "
            f"UNION ALL SELECT b FROM e{i}) GROUP BY node)"
            f", e{i + 1} AS (SELECT e.a, e.b FROM e{i} e "
            f"JOIN d{i} da ON da.node = e.a "
            f"JOIN d{i} db ON db.node = e.b "
            f"WHERE da.deg >= 2 AND db.deg >= 2)")
    parts.append(
        f" SELECT node, COUNT(*) AS deg FROM "
        f"(SELECT a AS node FROM e{rounds} "
        f"UNION ALL SELECT b FROM e{rounds}) GROUP BY node "
        "ORDER BY node")
    return "".join(parts)


def _q_host_crawl_depth(sf_dir: str):
    """Multi-source BFS crawl depth (`ops/graph.bfs_depth`) over a
    planted host graph: residues h = doc_id % 60, path edges h→h+1
    plus shortcut edges h→h+9 for h % 4 == 0, seeds {0, 37}.  The
    DuckDB oracle replays it as a recursive CTE with MIN(depth)."""
    from xtract.ops.graph import bfs_depth

    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        h = np.unique(t["doc_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % 60)
        s1, d1 = h[h < 59], h[h < 59] + 1
        sh = h[(h % 4 == 0) & (h + 9 < 60)]
        return pa.table({"src": pa.array(np.concatenate([s1, sh])),
                         "dst": pa.array(np.concatenate([d1, sh + 9]))})

    e = docs.map_batches(edges, batch_format="pyarrow")
    return bfs_depth(e, [0, 37], max_depth=12)


def _q_host_k_core(sf_dir: str):
    """k-core peeling (`ops/graph.k_core`, k=2) over a planted host
    graph: a 10-cycle (the surviving core) with a 3-deep pendant chain
    hanging off every cycle node — the chains peel one layer per round
    (three cascading rounds).  Oracle: the peel unrolled as CTEs."""
    from xtract.ops.graph import k_core

    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        h = np.unique(t["doc_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % 40)
        other = np.where(h < 10, (h + 1) % 10, h - 10)
        return pa.table({"src": pa.array(h), "dst": pa.array(other)})

    return k_core(docs.map_batches(edges, batch_format="pyarrow"),
                  k=2).sort("node")


def _q_last_order_before_event_cogroup(sf_dir: str):
    """Same as-of semantics via the LARGE-×-LARGE co-group path (hash
    co-partition + one pandas merge_asof per partition) — no broadcast:
    the scale shape when the right side doesn't fit in the object
    store.  Verified against the identical SQL oracle."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.joins import asof_join_cogroup

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    orders = orders.map_batches(
        lambda b: pa.table({"user_id": b["o_custkey"],
                            "o_orderdate": b["o_orderdate"]}),
        batch_format="pyarrow")
    joined = asof_join_cogroup(ev, orders, "user_id", "ts",
                               "o_orderdate", ["o_orderdate"])

    def fmt(b: pa.Table) -> pa.Table:
        dates = b["o_orderdate_asof"].to_pylist()
        return pa.table({
            "event_id": b["event_id"],
            "last_order_date": pa.array(
                [None if d is None or (isinstance(d, float) and d != d)
                 else pd.Timestamp(d).strftime("%Y-%m-%d")
                 for d in dates], pa.string()),
        })

    return joined.map_batches(fmt, batch_format="pyarrow")


def _q_vocab_top_tokens(sf_dir: str):
    from xtract.ops.vocab import build_vocab

    return build_vocab(_docs(sf_dir, ["text"]), size=100)


# -- non-SQL (rows-only check) ----------------------------------------------

def _q_extract_retry(sf_dir: str):
    from xtract.pipeline import extract_pages_with_retry

    return extract_pages_with_retry(_pages(sf_dir)).select_columns(
        ["url", "doc_kind", "status", "content_text"])


def _q_webtext_pipeline(sf_dir: str):
    """Composed training-data chain: extract → line scrub → quality gate
    → exact dedup (the flagship end-to-end showpiece)."""
    from xtract.pipelines import webtext_pipeline

    clean, _ = webtext_pipeline(_pages(sf_dir))
    return clean


def _q_extract_pages(sf_dir: str):
    from xtract.pipeline import extract_pages

    return extract_pages(_pages(sf_dir)).select_columns(
        ["url", "doc_kind", "status", "lang_detected", "text_dir",
         "script", "n_blocks_kept", "n_blocks_dropped", "content_text"])


def _q_extract_blocks(sf_dir: str):
    from xtract.pipeline import explode_pages

    return explode_pages(_pages(sf_dir), levels=("block",))


def _q_extract_words(sf_dir: str):
    from xtract.pipeline import explode_pages

    ds = _pages(sf_dir).limit(200)
    return explode_pages(ds, levels=("line", "word"))


def _q_corpus_checksum(sf_dir: str):
    from xtract.metrics import corpus_checksum
    from xtract.pipeline import extract_pages

    c = corpus_checksum(extract_pages(_pages(sf_dir)))
    n, digest = c.split(":")
    return pa.table({"n_urls": pa.array([int(n)], pa.int64()),
                     "checksum": pa.array([digest], pa.string())})


def _q_render_formats(sf_dir: str):
    from xtract.render import render_pages

    return render_pages(_pages(sf_dir).limit(40),
                        formats=("hocr", "tsv", "alto", "markdown",
                                 "artifact"))


def _q_minhash_dedup(sf_dir: str):
    """MinHash+LSH near-dup clustering, fully SQL-checked: md5-based
    word hashes, splitmix64 shingle folds, the (a·h+b) mod 2^61−1
    permutation mins, band-bucket folds, the ≥4/5 signature-equality
    verify and connected components are ALL recomputed independently in
    DuckDB (see ``_minhash_sql`` — wraparound uint64 arithmetic via
    HUGEINT hi/lo splits)."""
    from xtract.ops.dedup import minhash_lsh_dedup

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _simhash_mutate, batch_format="pyarrow")
    return minhash_lsh_dedup(docs)


def _simhash_mutate(t: pa.Table) -> pa.Table:
    """Plant near-dup template groups (doc_id%5==0 rows collapse to six
    template variants) so the clustering path has real work; the SQL
    oracle applies the same mutation."""
    ids = t["doc_id"].to_pylist()
    txt = t["text"].to_pylist()
    out = []
    for d, x in zip(ids, txt):
        if d % 5 == 0:
            w = "alpha" if d % 2 == 0 else "beta"
            out.append("shared template page content about topic "
                       f"{d % 3} with {w} extra tail words here")
        else:
            out.append(x or "")
    return pa.table({"doc_id": t["doc_id"], "text": pa.array(out, pa.string())})


def _q_simhash_dedup(sf_dir: str):
    """SimHash near-dup clustering, fully SQL-checked: the 64-bit
    SimHash (md5_number_upper word hashes), 4×16-bit band candidates,
    Hamming≤3 verify and min-label connected components are all
    recomputed independently in DuckDB (see oracle_sql)."""
    from xtract.ops.dedup import simhash_dedup

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _simhash_mutate, batch_format="pyarrow")
    return simhash_dedup(docs)


def _q_ngram_dedup(sf_dir: str):
    """Char-5-gram Jaccard variant of the MinHash pipeline — same fully
    SQL-checked contract as ``minhash_dedup`` (distinct 5-grams of the
    whitespace-collapsed text replace the word shingles)."""
    from xtract.ops.dedup import minhash_lsh_dedup

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _simhash_mutate, batch_format="pyarrow")
    return minhash_lsh_dedup(docs, char_ngrams=True, k=5)


def _q_embedding_dedup(sf_dir: str):
    """Hyperplane-LSH cosine near-dup clustering — SQL-checked: the
    synthetic embeddings table has no near-dup pairs (max off-diagonal
    cosine ≈ 0.51), so the query unions power-of-two-scaled copies of
    every 7th vector (scaling by 2 is float-EXACT: unit vectors, LSH
    bucket codes and verify cosines are bit-identical to the
    original's, so LSH recall of each planted pair is guaranteed, not
    probabilistic).  The oracle recomputes the semantic contract
    independently: exact all-pairs cosine ≥ 0.95 + transitive-closure
    min-label components."""
    from xtract.ops.dedup import embedding_dedup

    base = _emb(sf_dir).select_columns(["vec_id", "embedding"])

    def scaled_copies(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 7 == 0))
        arr = t["embedding"].combine_chunks()
        vals = pc.multiply(arr.values, pa.scalar(2.0, arr.values.type))
        return pa.table({
            "vec_id": pc.add(t["vec_id"], pa.scalar(100000, pa.int64())),
            "embedding": pa.ListArray.from_arrays(arr.offsets, vals),
        })

    aug = base.union(base.map_batches(scaled_copies, batch_format="pyarrow"))
    return embedding_dedup(aug)


_SEMDEDUP2 = dict(n_cells=4, iters=2, train_mod=3, dim=64,
                  eps=8_000_000_000)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup at a SECOND integer configuration (4 cells, 2 Lloyd
    rounds, stride-3 training sample, wider eps) — SQL-checked like
    its `semantic_dedup_int` sibling via the parameterized
    k-means-replay oracle (round 4: this slot previously ran the
    float `ops/dedup.semdedup`, which stays in the library with its
    planted-pair pytest coverage; float cell assignment is not
    SQL-replayable, so the query surface now exercises the integer
    path at a distinct config instead of reporting rows-only)."""
    from xtract.ops.similarity import semantic_dedup_int

    p = _SEMDEDUP2
    return semantic_dedup_int(_emb(sf_dir), eps=p["eps"],
                              n_cells=p["n_cells"], iters=p["iters"],
                              train_mod=p["train_mod"])


def _semantic_dedup2_sql() -> str:
    """Oracle for the second SemDeDup configuration: the SAME
    parameterized integer-k-means prefix at `_SEMDEDUP2`'s params →
    within-cell earlier-id pairs → squared-L2 → dup flag."""
    p = dict(_IVF_INT, **{k: v for k, v in _SEMDEDUP2.items()
                          if k != "eps"})
    q = _ivf_prefix_sql(p)
    q += (
        "pairs AS (SELECT a.vec_id AS xa, b.vec_id AS xb FROM vasg a "
        "JOIN vasg b ON a.cell = b.cell AND b.vec_id < a.vec_id), "
        "pd AS (SELECT p.xa, p.xb, "
        "sum((ea.q - eb.q) * (ea.q - eb.q)) AS d FROM pairs p "
        "JOIN emb_e ea ON ea.vec_id = p.xa "
        "JOIN emb_e eb ON eb.vec_id = p.xb AND eb.j = ea.j "
        "GROUP BY p.xa, p.xb), "
        f"dup AS (SELECT DISTINCT xa AS vec_id FROM pd "
        f"WHERE d <= {_SEMDEDUP2['eps']}) "
        "SELECT e.vec_id, e.vec_id IN (SELECT vec_id FROM dup) AS is_dup "
        "FROM embeddings e")
    return q


def _q_knn_ivfsq(sf_dir: str):
    """Persisted IVF-SQ8 ANN (``ops/similarity.build_ivfsq_index`` +
    ``knn_ivfsq_index``): coarse cells + int8 codes at rest (8×
    smaller candidate reads), two-phase query with storage-level cell
    pruning and row-group-pruned exact rescore.  nprobe = n_cells here
    so the result is the EXACT brute-force top-10 (rows-only: the
    pipeline is storage-layout-dependent; exactness is pytest-covered
    incl. the pruned-probe recall bound)."""
    import shutil
    import tempfile

    from xtract.ops.similarity import build_ivfsq_index, knn_ivfsq_index

    emb = _emb(sf_dir)
    q0 = [r["embedding"] for r in emb.take(1)][0]
    d = tempfile.mkdtemp(prefix="ivfsq-")
    try:
        build_ivfsq_index(emb, d, n_cells=8)
        out = knn_ivfsq_index(d, np.asarray([q0], np.float64), k=10,
                              nprobe=8).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out[["rank", "vec_id"]]


def _q_knn_ivf(sf_dir: str):
    """Float IVF ANN (stratified-sample k-means cells + streaming
    per-cell partial top-k).  Probes ALL cells (nprobe = n_cells) so
    the result is the EXACT brute-force top-10 → SQL-checked against
    the brute-force cosine oracle (the `knn_ivfsq` precedent, round
    4; sub-full-nprobe recall is pytest-covered)."""
    from xtract.ops.similarity import knn_ivf

    emb = _emb(sf_dir)
    q0 = [r["embedding"] for r in emb.take(1)][0]
    out = knn_ivf(emb, np.asarray([q0], np.float64), k=10,
                  n_cells=8, nprobe=8).to_pandas()
    return out[["rank", "vec_id"]]


_BM25_QUERY = "data stream join window dup"


def _q_bm25_top20(sf_dir: str):
    """BM25 top-20 over documents.text for a fixed query — SQL-checked
    on (rank, doc_id, tf_total, dl); the float score is excluded from
    the compared output (embedding_knn precedent) but the integer
    tf/df/dl pipeline fully determines the ranking the oracle
    recomputes."""
    from xtract.ops.ranking import bm25_score

    out = bm25_score(_docs(sf_dir, ["doc_id", "text"]),
                     _BM25_QUERY).to_pandas()
    return out[["rank", "doc_id", "tf_total", "dl"]]


def _q_bm25_index_top20(sf_dir: str):
    """The same ranking through the PERSISTED hash-partitioned inverted
    index (build → prune-read only the query terms' buckets → search).
    Bit-identical to the direct path, so it shares its SQL oracle."""
    import shutil
    import tempfile

    from xtract.ops.ranking import bm25_search_index, build_text_index

    d = tempfile.mkdtemp(prefix="bm25idx_", dir="/tmp")
    try:
        build_text_index(_docs(sf_dir, ["doc_id", "text"]), d)
        out = bm25_search_index(d, _BM25_QUERY).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out[["rank", "doc_id", "tf_total", "dl"]]


def _q_doc_quality(sf_dir: str):
    from xtract.ops.textstats import QualityScorer

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pyarrow", concurrency=2,
        num_cpus=1).select_columns(
        ["doc_id", "quality_score", "stopword_ratio", "mean_word_len"])


def _q_doc_langid(sf_dir: str):
    """Language-ID over documents.text — SQL-checked: the oracle embeds
    the SAME stopword tables (one definition, two engines) and
    recomputes the integer scoring, margin and alphabetical tie-break.
    (Oracle valid for this ASCII ≤400-token input domain; the engine
    additionally caps at 400 tokens / 2000 chars and scores non-ASCII
    evidence chars.)"""
    from xtract.ops.textstats import DocLangId

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        DocLangId, batch_format="pyarrow", concurrency=2,
        num_cpus=1).select_columns(["doc_id", "lang_detected", "lang_conf"])


def _q_doc_rolling_fp(sf_dir: str):
    from xtract.ops.textstats import fingerprint_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "rolling_fp"])


def _q_doc_oov_rate(sf_dir: str):
    # integer columns only → exactly hash-comparable against the SQL
    # oracle (no float division on either side)
    from xtract.ops.vocab import build_vocab, oov_rate

    docs = _docs(sf_dir, ["doc_id", "text"])
    vocab = build_vocab(docs, size=50)
    return oov_rate(docs, vocab).select_columns(
        ["doc_id", "n_tokens_az", "n_oov"])


def _q_doc_sample(sf_dir: str):
    """Deterministic 1/20 inspection sample (SURVEY §2.6 sampling)."""
    from xtract.ops.agg import deterministic_sample

    return deterministic_sample(
        _docs(sf_dir, ["doc_id", "source", "lang", "n_chars"]),
        "doc_id", every=20)


def _q_customer_spend_cogroup(sf_dir: str):
    """Per-customer spend via the LARGE-×-LARGE co-group equi-join
    (hash co-partition + one pandas merge per partition) — the robust
    path when neither side broadcasts."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.joins import equi_join_cogroup

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    # integer cents → the sum is exact and order-independent, so the
    # float result is bit-identical to the SQL oracle
    orders = orders.map_batches(
        lambda t: pa.table({
            "o_custkey": t["o_custkey"],
            "cents": pa.compute.cast(pa.compute.round(
                pa.compute.multiply(t["o_totalprice"], 100)), pa.int64()),
        }), batch_format="pyarrow")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    joined = equi_join_cogroup(orders, cust, "o_custkey", "c_custkey")
    out = joined.groupby(["o_custkey", "c_name"]).aggregate(
        Sum("cents", alias_name="total_cents"),
        Count(alias_name="n_orders"))
    return out.map_batches(
        lambda t: pa.table({
            "c_custkey": t["o_custkey"],
            "c_name": t["c_name"],
            "total_spend": pa.compute.divide(
                pa.compute.cast(t["total_cents"], pa.float64()), 100.0),
            "n_orders": t["n_orders"],
        }), batch_format="pyarrow")


def _q_orders_skew_join(sf_dir: str):
    """Skew-aware join (``ops/joins.skew_join``): a planted hot key —
    70% of orders land on sk=0 — would pile one co-group partition;
    the op measures left-key frequency with a per-block combiner,
    broadcasts the right rows of keys ≥ ``hot_count``, and co-groups
    only the cold tail.  Oracle = the same join in SQL (the split is
    an internal routing decision, rows are identical)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min, Sum

    from xtract.ops.joins import skew_join

    def mk_left(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = np.where(ok % 10 < 7, np.int64(0), 1 + ck % 997)
        return pa.table({"sk": pa.array(sk, pa.int64()),
                         "okey": pa.array(ok, pa.int64())})

    def mk_right(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "rk": pa.array(ck % 998, pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                t["c_acctbal"], 100)), pa.int64())})

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"]).map_batches(
        mk_left, batch_format="pyarrow")
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal"]).map_batches(
        mk_right, batch_format="pyarrow").groupby("rk").aggregate(
        Min("cents", alias_name="bal_cents"))
    joined = skew_join(orders, cust, on="sk", right_on="rk",
                       hot_count=500)
    out = joined.groupby("sk").aggregate(
        Count(alias_name="n"),
        Sum("okey", alias_name="sum_okey"),
        Min("bal_cents", alias_name="bal_cents"))
    return out.map_batches(
        lambda t: pa.table({
            "sk": pc.cast(t["sk"], pa.int64()),
            "n": pc.cast(t["n"], pa.int64()),
            "sum_okey": pc.cast(t["sum_okey"], pa.int64()),
            "bal_cents": pc.cast(t["bal_cents"], pa.int64())}),
        batch_format="pyarrow").sort("sk")


def _orders_skew_join_sql() -> str:
    return (
        "WITH l AS (SELECT CASE WHEN o_orderkey % 10 < 7 THEN 0 "
        "ELSE 1 + o_custkey % 997 END AS sk, o_orderkey AS okey "
        "FROM orders), "
        "r AS (SELECT c_custkey % 998 AS rk, "
        "MIN(CAST(round(c_acctbal * 100) AS BIGINT)) AS bal_cents "
        "FROM customer GROUP BY 1) "
        "SELECT CAST(sk AS BIGINT) AS sk, COUNT(*) AS n, "
        "CAST(SUM(okey) AS BIGINT) AS sum_okey, MIN(bal_cents) AS "
        "bal_cents FROM l JOIN r ON l.sk = r.rk "
        "GROUP BY 1 ORDER BY 1")


def _q_nation_trade_flows(sf_dir: str):
    """TPC-H Q7-style bi-nation trade volume by order year: the
    supplier's nation × the customer's nation × year with EXACT
    integer revenue (cents × basis-point discount → int64).  Scale
    shape: nation + supplier are dimension tables (broadcast once via
    ``ray.put``); customer and lineitem attach to orders through TWO
    large-×-large co-group equi-joins (hash co-partition + one pandas
    merge per partition); names attach in the same slim pass; ONE
    native grouped Sum finishes."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from xtract.ops.joins import equi_join_cogroup

    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"]).to_pandas()
    nat = nat.sort_values("n_nationkey")
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup.sort_values("s_suppkey")
    dims_ref = ray.put((
        nat.n_nationkey.to_numpy(np.int64), nat.n_name.to_numpy(),
        sup.s_suppkey.to_numpy(np.int64),
        sup.s_nationkey.to_numpy(np.int64)))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64())}),
        batch_format="pyarrow")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    oc = equi_join_cogroup(orders, cust, "o_custkey", "c_custkey")

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]).map_batches(
        lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_suppkey": t["l_suppkey"],
            "rev": pc.multiply(
                pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100)),
                        pa.int64()),
                pc.subtract(
                    pa.scalar(10000, pa.int64()),
                    pc.cast(pc.round(pc.multiply(t["l_discount"], 10000)),
                            pa.int64())))}),
        batch_format="pyarrow")
    lo = equi_join_cogroup(li, oc, "l_orderkey", "o_orderkey")

    def attach(b: pa.Table) -> pa.Table:
        # vectorized sorted-array lookups — no per-row Python
        nk, nname, sk_sorted, snat = ray.get(dims_ref)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_nat = snat[np.searchsorted(sk_sorted, sk)]
        return pa.table({
            "supp_nation": pa.array(nname[np.searchsorted(nk, s_nat)],
                                    pa.string()),
            "cust_nation": pa.array(nname[np.searchsorted(nk, ck)],
                                    pa.string()),
            "o_year": b["o_year"].cast(pa.int64()),
            "rev": b["rev"].cast(pa.int64())})

    return (lo.map_batches(attach, batch_format="pyarrow")
            .groupby(["supp_nation", "cust_nation", "o_year"])
            .aggregate(Sum("rev", alias_name="revenue_micro")))


def _nation_trade_flows_sql() -> str:
    return (
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
        "CAST(year(o_orderdate) AS BIGINT) AS o_year, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
        "(10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS BIGINT) "
        "AS revenue_micro "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation sn ON s_nationkey = sn.n_nationkey "
        "JOIN nation cn ON c_nationkey = cn.n_nationkey "
        "GROUP BY 1, 2, 3")


def _q_decontaminate(sf_dir: str):
    """13-gram benchmark decontamination: the first 20 documents stand
    in as the 'benchmark set'; every document is flagged for n-gram
    overlap with it (the flagged set naturally includes those 20)."""
    import pyarrow.compute as pc

    from xtract.ops.textstats import decontaminate

    docs = _docs(sf_dir, ["doc_id", "text"])
    bench = docs.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 20)), batch_format="pyarrow")
    return decontaminate(docs, bench, n=13)


def _chunked_lines_batch(t: pa.Table, tail_fmt: str, mod: int) -> pa.Table:
    """Word-bag documents → multi-line text: 12-word chunk lines plus
    one shared tail line (``tail_fmt.format(doc_id % mod)``).  The SQL
    oracles rebuild the exact same text with list slicing, so the
    line/paragraph dedup queries hash-check end to end (rewritten text
    included)."""
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    out = []
    for d, txt in zip(ids, texts):
        ws = (txt or "").split()
        lines = [" ".join(ws[i:i + 12]) for i in range(0, len(ws), 12)]
        lines.append(tail_fmt.format(int(d) % mod))
        out.append("\n".join(lines))
    return pa.table({"doc_id": t["doc_id"],
                     "text": pa.array(out, pa.string())})


_PARA_TAIL = "this exact shared paragraph appears in many documents variant {}"
_LINE_TAIL = "subscribe to our newsletter today edition {}"


def _q_paragraph_dedup(sf_dir: str):
    """Cross-document paragraph dedup (one surviving copy per distinct
    paragraph, owner = min doc_id).  SQL-checked including the
    rewritten text."""
    from xtract.ops.linedup import dedup_paragraphs

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: _chunked_lines_batch(t, _PARA_TAIL, 7),
        batch_format="pyarrow")
    return dedup_paragraphs(docs).select_columns(
        ["doc_id", "text", "n_paras_dropped"])


def _q_doc_repetition(sf_dir: str):
    """Gopher-style within-doc repetition signals over the chunked
    multi-line text (integer numerators/denominators only → exact SQL
    hash check)."""
    from xtract.ops.textstats import gopher_repetition_batch

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: _chunked_lines_batch(t, _PARA_TAIL, 7),
        batch_format="pyarrow")
    return docs.map_batches(gopher_repetition_batch, batch_format="pyarrow")


def _q_doc_mixture_sample(sf_dir: str):
    """Deterministic per-language downsampling (data-mixing surface):
    keep all English, 1/2 of German/Spanish, 1/5 of everything else."""
    from xtract.ops.agg import stratified_sample

    docs = _docs(sf_dir, ["doc_id", "lang", "source", "n_chars"])
    return stratified_sample(docs, "lang", "doc_id",
                             {"en": 1, "de": 2, "es": 2}, default_every=5)


def _outlink_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a small html page with deterministic links (relative
    nav link, absolute external link with query, and for doc_id%7==0 an
    unterminated trailing anchor — the tokenizer-recovery path).  The
    SQL oracle CASE-constructs the expected link rows."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://host{d % 6}.example.org/p/{d}")
        h = (f"<html><body><nav><a href='/nav{d % 4}'>Nav {d % 4}</a></nav>"
             f"<p>see <a href=\"https://ext{d % 5}.example.com/x?q={d % 3}\">"
             f"External <b>Link</b> {d % 3}</a> here</p>")
        if d % 7 == 0:
            h += f"<a href='/tail{d % 2}'>tail"
        h += "</body></html>"
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_page_outlinks(sf_dir: str):
    """Outlink + anchor-text extraction (crawl-graph surface): tokenizer
    walk, href resolution against the page url, document-order ranks.
    SQL-checked against CASE-constructed expected rows."""
    from xtract.links import extract_outlinks

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _outlink_pages_batch, batch_format="pyarrow")
    return extract_outlinks(pages)


def _pii_text_batch(t: pa.Table) -> pa.Table:
    """Append deterministic PII (email / IPv4 / phone) to each doc's
    text; the SQL oracle builds the same strings."""
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    out = []
    for d, x in zip(ids, texts):
        out.append(f"{x or ''} contact user{d % 10}@mail{d % 7}.example.com "
                   f"or +1 555 000 {1000 + d % 9000} and "
                   f"host 10.0.{d % 256}.{d % 100} end")
    return pa.table({"doc_id": t["doc_id"],
                     "text": pa.array(out, pa.string())})


def _q_doc_pii_redact(sf_dir: str):
    """PII redaction (emails → IPs → phones, sequential RE2-compatible
    regexes).  SQL-checked including the rewritten text."""
    from xtract.ops.pii import redact_pii_ds

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _pii_text_batch, batch_format="pyarrow")
    return redact_pii_ds(docs)


_SHARED_PASSAGE = ("the quick brown fox jumps over the lazy dog while the "
                   "rain falls softly on the quiet green hills beyond the "
                   "river")


def _substring_docs_batch(t: pa.Table) -> pa.Table:
    """Append a shared 22-token passage (+ 1 variant word) to every
    fourth doc so exact k-token windows repeat across the corpus; the
    SQL oracle constructs the same text."""
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    out = []
    for d, x in zip(ids, texts):
        if d % 4 == 0:
            v = ("alpha", "beta", "gamma")[d % 3]
            out.append(f"{x or ''} {_SHARED_PASSAGE} {v}")
        else:
            out.append(x or "")
    return pa.table({"doc_id": t["doc_id"],
                     "text": pa.array(out, pa.string())})


def _q_substring_dedup(sf_dir: str):
    """Exact substring (20-token window) dedup statistics, Lee et al.
    2021 style — duplicated-window detection, canonical-occurrence
    exclusion, per-doc interval merge.  Fully SQL-checked (the oracle
    recomputes the rolling polynomial hashes from md5_number_upper
    token hashes and the interval merge with window functions)."""
    from xtract.ops.substring import substring_dedup_stats

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _substring_docs_batch, batch_format="pyarrow")
    return substring_dedup_stats(docs, k=20)


def _q_doc_bits_per_char(sf_dir: str):
    """CCNet-style perplexity-proxy quality signal: a char-ngram LM
    trained on the corpus itself scores each document's bits-per-char.
    Integer micro-bit costs (⌊-10⁶·log₂p⌋) make the whole train→score
    pipeline SQL-re-derivable bit-exactly (DuckDB log2 == libm)."""
    from xtract.ops.ngram_lm import score_bits_per_char, train_char_lm

    docs = _docs(sf_dir, ["doc_id", "text"])
    lm = train_char_lm(docs, order=3, max_grams=100_000)
    return score_bits_per_char(docs, lm).select_columns(
        ["doc_id", "bits_per_char", "n_scored_grams"])


def _q_bpe_subword_stats(sf_dir: str):
    """Trained-BPE tokenization (train on the corpus head, broadcast
    merges, encode distributed) — per-doc subword counts.  SQL-checked
    (round 4): the oracle replays the ENTIRE training loop as 120
    unrolled merge rounds (adjacent-pair counts → freq-desc/lex-asc
    argmax → leftmost-nonoverlap merge application via island parity)
    and reads each word's encoding off the final training table —
    valid because (a) the 20k-word training head covers every distinct
    corpus word here, so training's word table IS the corpus
    vocabulary, and (b) greedy min-rank encoding equals in-order
    single-pass merge application when all merge output strings are
    distinct (guaranteed structurally by BPE training; asserted for
    this corpus in tests/test_r4_fixes.py)."""
    from xtract.ops.bpe import bpe_encode, train_bpe

    docs = _docs(sf_dir, ["doc_id", "text"])
    merges = train_bpe(docs, num_merges=120, max_words=20_000)
    return bpe_encode(docs, merges).select_columns(["doc_id", "n_subwords"])


def _bpe_subword_stats_sql(num_merges: int = 120,
                           max_words: int = 20_000) -> str:
    """DuckDB replay of `train_bpe` + `bpe_encode` (see
    `_q_bpe_subword_stats` docstring for the equivalence argument).
    Per round t: pc_t adjacent-pair counts (f-weighted, overlapping
    positions included, exactly `_pair_counts`), bp_t the argmax pair
    (count desc, then lexicographic x,y — UTF-8 byte order = Python
    code-point order here), c_t candidate positions, k_t the kept
    (leftmost-nonoverlapping) ones via consecutive-run parity, s_t the
    merged symbol table renumbered.  An empty bp_t (max pair count
    < min_pair_freq=2) makes every later round a no-op — the unrolled
    twin of Python's `break`."""
    parts = [
        "WITH toks AS MATERIALIZED (SELECT doc_id, unnest(regexp_split_to_array("
        "lower(coalesce(text,'')), '[^a-z]+')) AS w FROM documents), "
        "occ AS MATERIALIZED (SELECT doc_id, w FROM toks WHERE w != ''), "
        f"wf AS MATERIALIZED (SELECT w, count(*) AS f FROM occ GROUP BY 1 "
        f"ORDER BY f DESC, w LIMIT {max_words}), "
        "s0 AS MATERIALIZED (SELECT w, f, p, CASE WHEN p <= len(w) THEN "
        "substr(w, CAST(p AS INT), 1) ELSE '</w>' END AS s FROM ("
        "SELECT w, f, unnest(range(1, len(w) + 2)) AS p FROM wf))"]
    for t in range(1, num_merges + 1):
        q = t - 1
        parts.append(
            f"pc{t} AS MATERIALIZED (SELECT a.s AS x, b.s AS y, sum(a.f) AS c "
            f"FROM s{q} a JOIN s{q} b ON b.w = a.w AND b.p = a.p + 1 "
            f"GROUP BY 1, 2), "
            f"bp{t} AS MATERIALIZED (SELECT x, y FROM pc{t} WHERE c >= 2 "
            f"ORDER BY c DESC, x, y LIMIT 1), "
            f"c{t} AS MATERIALIZED (SELECT a.w, a.p FROM s{q} a "
            f"JOIN s{q} b ON b.w = a.w AND b.p = a.p + 1 "
            f"JOIN bp{t} m ON a.s = m.x AND b.s = m.y), "
            f"k{t} AS MATERIALIZED (SELECT w, p FROM (SELECT w, p, "
            f"p - row_number() OVER (PARTITION BY w ORDER BY p) AS isl "
            f"FROM c{t}) QUALIFY (p - min(p) OVER "
            f"(PARTITION BY w, isl)) % 2 = 0), "
            f"s{t} AS MATERIALIZED (SELECT w, f, row_number() OVER "
            f"(PARTITION BY w ORDER BY p) AS p, s FROM ("
            f"SELECT a.w, a.f, a.p, CASE WHEN k.p IS NOT NULL THEN "
            f"a.s || (SELECT y FROM bp{t}) ELSE a.s END AS s "
            f"FROM s{q} a LEFT JOIN k{t} k ON k.w = a.w AND k.p = a.p "
            f"WHERE NOT EXISTS (SELECT 1 FROM k{t} k2 "
            f"WHERE k2.w = a.w AND k2.p = a.p - 1)))")
    parts.append(
        f"ns AS MATERIALIZED (SELECT w, count(*) AS n FROM s{num_merges} GROUP BY 1) "
        "SELECT d.doc_id, CAST(coalesce(sum(ns.n), 0) AS BIGINT) "
        "AS n_subwords FROM documents d "
        "LEFT JOIN occ o ON o.doc_id = d.doc_id "
        "LEFT JOIN ns ON ns.w = o.w GROUP BY 1 ORDER BY 1")
    return ", ".join(parts[:-1]) + ", " + parts[-1]


def _q_top_parts_per_brand(sf_dir: str):
    """Grouped top-N (3 cheapest parts per brand, deterministic
    p_partkey tie-break) via the combiner + coarse co-group operator
    ``ops.agg.top_k_per_key``."""
    import ray.data as rd

    from xtract.ops.agg import top_k_per_key

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_retailprice"])
    return top_k_per_key(part, "p_brand", ("p_retailprice", "p_partkey"), 3)


def _q_doc_packing_stats(sf_dir: str):
    from xtract.ops.packing import packing_stats
    from xtract.ops.vocab import build_vocab

    docs = _docs(sf_dir, ["doc_id", "text"])
    vocab = build_vocab(docs, size=100)
    return packing_stats(docs, vocab, seq_len=32)


def _q_doc_stopword_counts(sf_dir: str):
    from xtract.langdetect import STOPWORDS
    from xtract.ops.textstats import stopword_counts_batch

    stop = STOPWORDS["en"]
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: stopword_counts_batch(b, stop), batch_format="pyarrow")


def _q_lowest_confidence_docs(sf_dir: str):
    from xtract.metrics import lowest_confidence
    from xtract.pipeline import extract_pages

    return lowest_confidence(extract_pages(_pages(sf_dir)), k=20)


def _q_extract_warc(sf_dir: str):
    """WARC ingest path: synthesize a WARC file from pages rows, then run
    the ingest → extract pipeline over it (Common-Crawl container
    format)."""
    import os
    import tempfile

    from xtract.pipeline import extract_pages
    from xtract.sources import read_pages_warc, write_warc

    rows = [r for r in _pages(sf_dir).limit(100).take_all()
            if r["html"] is not None]
    d = tempfile.mkdtemp(prefix="xtract_warc_")
    write_warc(rows, os.path.join(d, "sample.warc"))
    return extract_pages(read_pages_warc(os.path.join(d, "sample.warc"))
                         ).select_columns(["url", "doc_kind", "status",
                                           "content_text"])


def _q_line_dedup(sf_dir: str):
    """Corpus-level repeated-line removal (doc-frequency > max_docs →
    boilerplate, dropped everywhere).  SQL-checked including the
    rewritten text.  (The same op also runs over extracted content
    inside webtext_pipeline.)"""
    from xtract.ops.linedup import drop_repeated_lines

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: _chunked_lines_batch(t, _LINE_TAIL, 4),
        batch_format="pyarrow")
    return drop_repeated_lines(docs, max_docs=20, col="text")


def _url_variants_batch(t: pa.Table) -> pa.Table:
    """doc_id → a decorated crawl url (tracking params / case / ports /
    fragments / duplicate slashes); groups of 3 consecutive doc_ids
    share a base so canonicalization collapses them.  The SQL oracle
    constructs the same urls and their expected canonical forms."""
    urls = []
    for d in t["doc_id"].to_pylist():
        g, m = d // 3, d % 6
        base = f"https://site{g}.example.org/a/b"
        if m == 0:
            u = base + "?utm_source=rss&ref=tw"
        elif m == 1:
            u = f"https://SITE{g}.Example.ORG/a/b/"
        elif m == 2:
            u = base + "#frag"
        elif m == 3:
            u = base + "?b=2&a=1"
        elif m == 4:
            u = f"https://site{g}.example.org//a//b"
        else:
            u = f"https://site{g}.example.org:443/a/b"
        urls.append(u)
    return pa.table({"url": pa.array(urls, pa.string())})


def _q_canonical_url_dedup(sf_dir: str):
    """Canonical-url exact dedup (lowercase host, strip default ports /
    fragments / tracking params, sort query, collapse slashes), min url
    kept per canonical.  SQL-checked."""
    from xtract.ops.urls import dedup_by_canonical_url

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _url_variants_batch, batch_format="pyarrow")
    return dedup_by_canonical_url(pages)


def _q_media_features(sf_dir: str):
    from xtract.ops.multimodal import decode_media, synth_media_batch

    media = _docs(sf_dir, ["doc_id"]).map_batches(
        synth_media_batch, batch_format="pyarrow")
    return decode_media(media).select_columns(
        ["media_id", "kind", "decode_status"])


def _media_hash_suffix_sql(hx: str = "hx") -> str:
    """Shared oracle tail for the media near-dup family: 4×16-bit
    banding of the 64-bit fingerprint, bucket-pair candidates, exact
    hamming ≤ 6 verify (``bit_count(xor(...))``), recursive
    transitive closure, min-id cluster labels — the SQL replay of
    ``ops/dedup.simhash_dedup(precomputed=True)`` (bucket runs stay
    far below `HOT_RUN_CAP` on this corpus, so the star cap never
    engages and all-pairs is the exact pipeline)."""
    return (
        f"bnd AS (SELECT mid, fp, b, (fp >> (b * 16)) & 65535 AS chunk "
        f"FROM {hx}, unnest(range(4)) AS ub(b)), "
        "prs AS (SELECT DISTINCT a.mid AS a, b.mid AS b "
        "FROM bnd a JOIN bnd b ON a.b = b.b AND a.chunk = b.chunk "
        "AND a.mid < b.mid "
        "WHERE bit_count(xor(a.fp, b.fp)) <= 6), "
        "edges AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs), "
        "reach(s, d) AS (SELECT a, b FROM edges UNION "
        "SELECT r.s, e.b FROM reach r JOIN edges e ON r.d = e.a), "
        "lbl AS (SELECT s AS mid, least(min(d), s) AS cl "
        "FROM reach GROUP BY s) "
        f"SELECT {hx}.mid AS media_id, "
        f"CAST(coalesce(l.cl, {hx}.mid) AS BIGINT) AS cluster_id "
        f"FROM {hx} LEFT JOIN lbl l ON l.mid = {hx}.mid")


def _ahash_bits_sql(src: str) -> str:
    """aHash replay over ``src(vid, seed, w, h)`` rows → ``abits(vid,
    i, bit)``: the synthetic ramp pixels (``_synth_pixels``), exact
    3·gray cell sums, and the cross-multiplied integer threshold of
    the round-4 exact `average_hash` (weights A/a_c in HUGEINT;
    ``product()`` returns a double but cell extents ≤ 2^53 keep it
    exact)."""
    return (
        "px AS (SELECT vid, w, h, y, x, "
        "(x * 7 + seed) % 256 + (y * 11 + 3 * seed) % 256 + "
        "((x + y) * 5 + 7 * seed) % 256 AS g3 "
        f"FROM {src}, unnest(range(h)) AS uy(y), "
        "unnest(range(w)) AS ux(x)), "
        "cells AS (SELECT vid, (8 * y + 7) // h AS r, "
        "(8 * x + 7) // w AS c, sum(g3) AS s FROM px GROUP BY 1, 2, 3), "
        f"dyt AS (SELECT vid, r, ((r + 1) * h) // 8 - (r * h) // 8 "
        f"AS dy FROM {src}, unnest(range(8)) AS ur(r)), "
        f"dxt AS (SELECT vid, c, ((c + 1) * w) // 8 - (c * w) // 8 "
        f"AS dx FROM {src}, unnest(range(8)) AS uc(c)), "
        "pyv AS (SELECT vid, CAST(product(dy) AS HUGEINT) AS prod_y "
        "FROM dyt GROUP BY 1), "
        "pxv AS (SELECT vid, CAST(product(dx) AS HUGEINT) AS prod_x "
        "FROM dxt GROUP BY 1), "
        "terms AS (SELECT ce.vid, ce.r, ce.c, "
        "CAST(ce.s AS HUGEINT) * (pyv.prod_y // dyt.dy) * "
        "(pxv.prod_x // dxt.dx) AS t "
        "FROM cells ce JOIN dyt ON dyt.vid = ce.vid AND dyt.r = ce.r "
        "JOIN dxt ON dxt.vid = ce.vid AND dxt.c = ce.c "
        "JOIN pyv ON pyv.vid = ce.vid JOIN pxv ON pxv.vid = ce.vid), "
        "tot AS (SELECT vid, sum(t) AS total FROM terms GROUP BY 1), "
        "abits AS (SELECT t.vid, t.r * 8 + t.c AS i, "
        "CASE WHEN 64 * t.t > tot.total THEN 1 ELSE 0 END AS bit "
        "FROM terms t JOIN tot ON tot.vid = t.vid)")


_PACK_SIGNED = (
    "sum(CASE WHEN i = 0 THEN -9223372036854775808 * bit "
    "ELSE bit * (CAST(1 AS BIGINT) << (63 - i)) END)")


def _image_near_dups_sql() -> str:
    """Full-pipeline oracle for image_near_dups: synth-generator
    replay → exact-integer aHash → banding/hamming/CC (see
    `_media_hash_suffix_sql`)."""
    return (
        "WITH RECURSIVE src AS (SELECT doc_id AS vid, doc_id AS seed, "
        "8 + (doc_id % 32) AS w, 8 + (doc_id * 7 % 32) AS h "
        "FROM documents WHERE doc_id % 3 = 0), "
        + _ahash_bits_sql("src") + ", "
        "hx AS (SELECT vid AS mid, CAST(" + _PACK_SIGNED + " AS BIGINT) "
        "AS fp FROM abits GROUP BY vid), "
        + _media_hash_suffix_sql())


def _video_near_dups_sql() -> str:
    """Full-pipeline oracle for video_near_dups: per-frame aHash over
    the XRAW frame seeds (stride is always 1 here — n_frames ≤ 24 →
    ≤ 16 kept frames are simply the first min(n_frames, 16)), bitwise
    majority with ties→1, then the shared banding/hamming/CC tail."""
    return (
        "WITH RECURSIVE vids AS (SELECT doc_id AS mid, "
        "8 + (doc_id % 32) AS w, 8 + (doc_id * 7 % 32) AS h, "
        "least(1 + doc_id % 24, 16) AS n_picked "
        "FROM documents WHERE doc_id % 3 = 2), "
        "src AS (SELECT mid * 32 + fi AS vid, mid + fi AS seed, w, h "
        "FROM vids, unnest(range(n_picked)) AS uf(fi)), "
        + _ahash_bits_sql("src") + ", "
        "mbits AS (SELECT vid // 32 AS mid, i, sum(bit) AS nb "
        "FROM abits GROUP BY 1, 2), "
        "vbits AS (SELECT m.mid, m.i, CASE WHEN 2 * m.nb >= "
        "v.n_picked THEN 1 ELSE 0 END AS bit "
        "FROM mbits m JOIN vids v ON v.mid = m.mid), "
        "hx AS (SELECT mid, CAST(" + _PACK_SIGNED + " AS BIGINT) AS fp "
        "FROM vbits GROUP BY mid), "
        + _media_hash_suffix_sql())


def _audio_near_dups_sql() -> str:
    """Full-pipeline oracle for audio_near_dups: synth sine replay
    (same IEEE op order as the numpy generator — validated
    fingerprint-exact over every clip), integer energy-delta
    fingerprint, shared banding/hamming/CC tail."""
    return (
        "WITH RECURSIVE aud AS (SELECT doc_id AS mid, "
        "800 + (doc_id % 7) * 160 AS n, "
        "110.0 + (doc_id % 40) * 13.0 AS freq "
        "FROM documents WHERE doc_id % 3 = 1), "
        "samp AS (SELECT mid, (65 * t + 64) // n AS k, "
        "CAST(trunc(sin(2 * pi() * freq * t / 16000.0) * 12000) "
        "AS BIGINT) AS s FROM aud, unnest(range(n)) AS u(t)), "
        "en AS (SELECT mid, k, sum(s * s) AS e FROM samp "
        "GROUP BY mid, k), "
        "fbits AS (SELECT a.mid, a.k - 1 AS i, "
        "CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit "
        "FROM en a JOIN en b ON b.mid = a.mid AND b.k = a.k - 1 "
        "WHERE a.k >= 1), "
        "hx AS (SELECT mid, CAST(" + _PACK_SIGNED + " AS BIGINT) AS fp "
        "FROM fbits GROUP BY mid), "
        + _media_hash_suffix_sql())


def _q_image_near_dups(sf_dir: str):
    """Perceptual image near-dup clusters
    (``ops/multimodal.image_near_dups``): BMP decode → 64-bit
    exact-integer aHash in an actor-pool stage → the SHARED simhash
    banding / capped pair / hamming-verify / CC pipeline
    (`precomputed=True`).  SQL-checked (round 4): the oracle replays
    generator → aHash → banding → hamming → closure end-to-end."""
    from xtract.ops.multimodal import image_near_dups, synth_media_batch

    media = _docs(sf_dir, ["doc_id"]).map_batches(
        synth_media_batch, batch_format="pyarrow")
    images = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")),
        batch_format="pyarrow")
    return image_near_dups(images)


def _q_audio_near_dups(sf_dir: str):
    """Audio near-dup clusters (``ops/multimodal.audio_near_dups``):
    WAV decode → energy-delta fingerprint (volume-invariant) → the
    shared precomputed-hash dedup pipeline.  SQL-checked (round 4):
    the oracle replays sine-generator → integer energy fingerprint →
    banding → hamming → closure end-to-end."""
    from xtract.ops.multimodal import audio_near_dups, synth_media_batch

    media = _docs(sf_dir, ["doc_id"]).map_batches(
        synth_media_batch, batch_format="pyarrow")
    audio = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "audio")),
        batch_format="pyarrow")
    return audio_near_dups(audio)


def _q_video_near_dups(sf_dir: str):
    """Video near-dup clusters (``ops/multimodal.video_near_dups``):
    XRAW frame decode → majority-of-frame-aHash clip fingerprint
    (frame-rate and rescale invariant) → the shared precomputed-hash
    dedup pipeline.  SQL-checked (round 4): the oracle replays
    per-frame exact aHash → bitwise majority → banding → hamming →
    closure end-to-end."""
    from xtract.ops.multimodal import synth_media_batch, video_near_dups

    media = _docs(sf_dir, ["doc_id"]).map_batches(
        synth_media_batch, batch_format="pyarrow")
    video = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "video")),
        batch_format="pyarrow")
    return video_near_dups(video)


def _q_events_hopping(sf_dir: str):
    """Hopping (sliding) 60-min window, 15-min hop, per event type —
    the streaming-window surface tumbling_window lacks.  Window key is
    the epoch-second of the window start (hash-stable)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.joins import hopping_window

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    df = hopping_window(ev, "ts", 60, 15, keys=["event_type"],
                        aggs=[Count(alias_name="n_events"),
                              Sum("value", alias_name="total_value")]
                        ).to_pandas()
    df["total_value"] = df["total_value"].round(2)
    return df


def _q_events_last_hour(sf_dir: str):
    """Keyless interval join (count form): for every event, the number
    of events — any user — in the preceding 60 minutes (inclusive of
    itself).  Day-bucket co-group + two-searchsorted counts; no pair
    materialization."""
    import ray.data as rd

    from xtract.ops.joins import interval_join_count

    left = rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["event_id", "ts"])
    right = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    return interval_join_count(left, "ts", right, "ts", 60,
                               ["event_id"], out_col="n_last_hour")


def _q_orders_semi_events(sf_dir: str):
    """Large-×-large SEMI join: orders whose customer appears in the
    event log (only the right KEY column shuffles)."""
    import ray.data as rd

    from xtract.ops.joins import semi_join_cogroup

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return semi_join_cogroup(orders, ev, "o_custkey", "user_id")


def _q_orders_blocklist(sf_dir: str):
    """Broadcast ANTI join: drop orders whose customer is on a (small,
    gate-checked) blocklist — the allow/deny-list filter shape."""
    import ray.data as rd

    from xtract.ops.joins import anti_join_broadcast

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    return anti_join_broadcast(orders, "o_custkey", range(0, 100000, 7))


def _q_customer_order_quantiles(sf_dir: str):
    """Per-customer exact discrete quantiles of order value (integer
    cents) — grouped_quantiles co-group, one vectorized pass per
    partition."""
    import numpy as np
    import ray.data as rd

    from xtract.ops.quantiles import grouped_quantiles

    o = rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": b["o_custkey"],
                         "cents": pa.array(np.round(v * 100).astype(np.int64))})

    oc = o.map_batches(to_cents, batch_format="pyarrow")
    return grouped_quantiles(oc, "o_custkey", "cents",
                             {"p25": 0.25, "p50": 0.5, "p75": 0.75})


def _q_order_price_quantiles(sf_dir: str):
    """Whole-corpus exact quantiles WITHOUT a global sort: iterative
    histogram refinement (one streaming bin-count pass per round,
    ≤n_bins rows to the driver)."""
    import ray.data as rd

    from xtract.ops.quantiles import quantile_report

    o = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    return quantile_report(o, "o_totalprice",
                           {"p10": 0.1, "p50": 0.5, "p90": 0.9, "p99": 0.99},
                           scale=100, n_bins=256)


def _q_nb_lang_classify(sf_dir: str):
    """Distributed-trained multinomial Naive Bayes: train token/class
    counts on the doc_id%5!=0 split, integer-log weights (bit-exact vs
    the SQL oracle's ln), score EVERY document with the broadcast
    model.  The full train→score pipeline is re-derived independently
    by the oracle."""
    import numpy as np

    from xtract.ops.nbayes import score_nb, train_nb

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def tr(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 5 != 0))

    model = train_nb(docs.map_batches(tr, batch_format="pyarrow"),
                     "text", "lang", vocab_size=2000)
    return score_nb(docs, model, ["doc_id"], "text",
                    pred_col="pred_lang", score_col="nb_score")


def _q_host_pagerank(sf_dir: str):
    """Integer PageRank over the deterministic host link graph
    (host = doc_id % 97; each doc emits doc_id % 4 out-links to
    (host*31 + 17*j + doc_id) % 97).  5 power-iteration rounds in
    int64 micro-units — bit-identical at any parallelism and fully
    re-derived by the SQL oracle's unrolled CTEs."""
    from xtract.ops.graph import pagerank

    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = ids % 97
        nl = (ids % 4).astype(np.int64)
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), nl)
        run_start = np.repeat(np.cumsum(nl) - nl, nl)
        j = np.arange(len(rep), dtype=np.int64) - run_start
        return pa.table({
            "src": pa.array(h[rep], pa.int64()),
            "dst": pa.array((h[rep] * 31 + 17 * j + ids[rep]) % 97,
                            pa.int64())})

    def hosts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(ids % 97), pa.int64())})

    e = docs.map_batches(edges, batch_format="pyarrow")
    nodes = docs.map_batches(hosts, batch_format="pyarrow")
    return pagerank(e, iters=5, nodes_ds=nodes)


def _head_meta_pages_batch(t: pa.Table) -> pa.Table:
    """Deterministic pages with planted head metadata (canonical link
    — relative and absolute, mixed case — robots directives, meta
    refresh); the SQL oracle CASE-constructs the expected rows."""
    from xtract.synth import PAGES_SCHEMA

    rows = []
    for d in t["doc_id"].to_pylist():
        d = int(d)
        url = f"https://m{d % 6}.example.org/p/{d}"
        head = ""
        if d % 9 == 3:
            # <base> rebases every RELATIVE href after it (d%9==3 ⟹
            # d%3==0 ⟹ the canonical below is the relative variant)
            head += f'<base href="https://base{d % 7}.example.net/dir/">'
        if d % 11 != 7:
            if d % 3 == 0:
                head += f'<link rel="Canonical" href="/canon/{d % 50}">'
            else:
                head += ('<link rel="alternate canonical" '
                         f'href="https://c{d % 5}.example.net/p/{d}">')
        rb = d % 4
        if rb == 1:
            head += '<meta name="robots" content="NOINDEX">'
        elif rb == 2:
            head += '<meta name="ROBOTS" content="nofollow, archive">'
        elif rb == 3:
            head += '<meta name="robots" content="noindex, nofollow">'
        else:
            head += '<meta name="robots" content="index, follow">'
        if d % 13 == 1:
            head += ('<meta http-equiv="Refresh" '
                     f'content="3; url=/next/{d}">')
        html = (f"<html><head><title>T</title>{head}</head>"
                f"<body><p>body {d}</p></body></html>")
        rows.append({"url": url, "warc_ts": 0, "html": html.encode(),
                     "text": None, "lang": "en"})
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def _q_page_head_meta(sf_dir: str):
    """Head-metadata extraction through the real tokenizer: canonical
    link (rel token list, case-insensitive, relative hrefs resolved),
    robots noindex/nofollow union, meta-refresh soft-redirect target.
    SQL-checked against the planted construction."""
    from xtract.links import extract_head_meta

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _head_meta_pages_batch, batch_format="pyarrow")

    def no_nulls(t: pa.Table) -> pa.Table:
        # absent targets → '' on both sides (driver hash-compare safety)
        for c in ("canonical_url", "refresh_url"):
            t = t.set_column(t.column_names.index(c), c,
                             pc.fill_null(t[c], ""))
        return t

    return extract_head_meta(pages).map_batches(
        no_nulls, batch_format="pyarrow")


def _head_meta_sql() -> str:
    base = "'https://m' || CAST(doc_id % 6 AS VARCHAR) || '.example.org"
    return (
        f"SELECT {base}/p/' || CAST(doc_id AS VARCHAR) AS url, "
        "coalesce(CASE WHEN doc_id % 11 = 7 THEN NULL "
        "WHEN doc_id % 3 = 0 AND doc_id % 9 = 3 THEN "
        "'https://base' || CAST(doc_id % 7 AS VARCHAR) || "
        "'.example.net/canon/' || CAST(doc_id % 50 AS VARCHAR) "
        f"WHEN doc_id % 3 = 0 THEN {base}/canon/' || "
        "CAST(doc_id % 50 AS VARCHAR) "
        "ELSE 'https://c' || CAST(doc_id % 5 AS VARCHAR) || "
        "'.example.net/p/' || CAST(doc_id AS VARCHAR) END, '') "
        "AS canonical_url, "
        "(doc_id % 4 = 1 OR doc_id % 4 = 3) AS robots_noindex, "
        "(doc_id % 4 = 2 OR doc_id % 4 = 3) AS robots_nofollow, "
        "coalesce(CASE WHEN doc_id % 13 = 1 AND doc_id % 9 = 3 THEN "
        "'https://base' || CAST(doc_id % 7 AS VARCHAR) || "
        "'.example.net/next/' || CAST(doc_id AS VARCHAR) "
        "WHEN doc_id % 13 = 1 THEN "
        f"{base}/next/' || CAST(doc_id AS VARCHAR) END, '') AS refresh_url "
        "FROM documents")


def _structured_pages_batch(t: pa.Table) -> pa.Table:
    """Deterministic pages with planted OpenGraph cards and JSON-LD
    blocks (valid, multiple, malformed, absent — by doc_id residue)."""
    from xtract.synth import PAGES_SCHEMA

    rows = []
    for d in t["doc_id"].to_pylist():
        d = int(d)
        url = f"https://s{d % 6}.example.org/p/{d}"
        head = f'<meta property="og:type" content="article">'
        if d % 2 == 0:
            head += f'<meta property="OG:Title" content="OG Title {d}">'
        if d % 5 == 0:
            head += ('<meta property="og:description" '
                     f'content="Desc {d % 40}">')
        body = ""
        r = d % 4
        if r == 1:
            body += ('<script type="application/ld+json">'
                     f'{{"@type": "Article", "name": "N{d}"}}</script>')
        elif r == 2:
            body += ('<script type="APPLICATION/LD+JSON">'
                     f'{{"@type": "Article", "name": "N{d}"}}</script>'
                     '<script type="application/ld+json">'
                     '{"@type": ["Product", "Thing"]}</script>')
        elif r == 3:
            body += ('<script type="application/ld+json">'
                     '{not valid json</script>')
        html = (f"<html><head><title>T</title>{head}</head>"
                f"<body>{body}<p>content {d}</p></body></html>")
        rows.append({"url": url, "warc_ts": 0, "html": html.encode(),
                     "text": None, "lang": "en"})
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def _q_page_structured(sf_dir: str):
    """OpenGraph + JSON-LD structured-data extraction through the
    tokenizer (script bodies recovered from the raw-text token pair,
    stdlib JSON parse, malformed payloads counted out).  SQL-checked
    against the planted construction."""
    from xtract.structured import extract_structured

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _structured_pages_batch, batch_format="pyarrow")

    def no_nulls(t: pa.Table) -> pa.Table:
        for c in ("og_title", "og_description", "ld_name"):
            t = t.set_column(t.column_names.index(c), c,
                             pc.fill_null(t[c], ""))
        return t

    return extract_structured(pages).map_batches(
        no_nulls, batch_format="pyarrow")


def _q_doc_length_gate(sf_dir: str):
    """Corpus-quantile quality gate (composition): compute the exact
    global p10 of document length with the shuffle-free iterative
    histogram op, broadcast the scalar threshold, one vectorized
    filter pass — the data-driven analogue of a fixed min-length
    cut."""
    from xtract.ops.quantiles import quantile_report

    docs = _docs(sf_dir, ["doc_id", "n_chars"])
    p10 = int(quantile_report(docs, "n_chars", {"p10": 0.10},
                              n_bins=256)["p10"][0])
    return docs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_chars"], p10)),
        batch_format="pyarrow")


def _q_event_type_unique_users(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): unique users per event type via
    the two-level pair-dedup shape (block combiner → pair groupby →
    key groupby) — no value set collected anywhere."""
    import ray.data as rd

    from xtract.ops.agg import count_distinct_per_key

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return count_distinct_per_key(ev, "event_type", "user_id")


def _q_nation_revenue(sf_dir: str):
    """Three-table star join (orders ⋈ customer co-group, nation
    broadcast) → revenue per nation in integer cents (bit-exact
    grouped sums)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.joins import equi_join_cogroup

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": t["o_custkey"],
                         "cents": pa.array(np.round(v * 100)
                                           .astype(np.int64), pa.int64())})

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    joined = equi_join_cogroup(orders.map_batches(cents,
                                                  batch_format="pyarrow"),
                               cust, "o_custkey", "c_custkey")
    ndf = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"]).to_pandas()
    ref = ray.put(dict(zip(ndf["n_nationkey"].astype(int), ndf["n_name"])))

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = t["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([m[int(k)] for k in keys], pa.string()),
            "cents": pc.cast(t["cents"], pa.int64())})

    return (joined.map_batches(attach, batch_format="pyarrow")
            .groupby("n_name")
            .aggregate(Sum("cents", alias_name="revenue_cents"),
                       Count(alias_name="n_orders")))


def _q_label_centroids(sf_dir: str):
    """Per-class embedding centroids via integer micro-unit sums —
    exact, order-free, fully SQL-re-derived (parallel UNNEST zip)."""
    from xtract.ops.similarity import label_centroids

    return label_centroids(_emb(sf_dir), "embedding", "label")


def _q_host_noindex_rates(sf_dir: str):
    """Crawl-policy aggregate composed over the head-meta surface:
    per host, pages seen / noindex'd / canonicalized-elsewhere —
    integer counts from one groupby over slim derived rows."""
    from ray.data.aggregate import Count, Sum

    from xtract.links import extract_head_meta, host_of

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _head_meta_pages_batch, batch_format="pyarrow")

    def derive(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        cans = t["canonical_url"].to_pylist()
        hosts = [host_of(u) for u in urls]
        off = [1 if (c and host_of(c) != h) else 0
               for c, h in zip(cans, hosts)]
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "noindex": pc.cast(t["robots_noindex"], pa.int64()),
            "canonical_offhost": pa.array(off, pa.int64())})

    return (extract_head_meta(pages)
            .map_batches(derive, batch_format="pyarrow")
            .groupby("host")
            .aggregate(Count(alias_name="n_pages"),
                       Sum("noindex", alias_name="n_noindex"),
                       Sum("canonical_offhost",
                           alias_name="n_canonical_offhost")))


def _q_doc_readability(sf_dir: str):
    """LIX-style readability signals (sentence/word/long-word counts +
    integer-milli LIX) — bit-exact vs the SQL re-derivation."""
    from xtract.ops.textstats import readability_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        readability_batch, batch_format="pyarrow")


def _q_documents_profile(sf_dir: str):
    """One-pass per-column dataset profile (nulls, typed min/max,
    exact distinct) — the data-quality summary shipped with job
    manifests.  SQL-checked long-format."""
    from xtract.ops.profile import profile_dataset

    return profile_dataset(
        _docs(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"]),
        distinct=True)


def _profile_sql() -> str:
    def one(c, dtype):
        return (
            f"SELECT '{c}' AS \"column\", '{dtype}' AS dtype, "
            "(SELECT count(*) FROM documents) AS n_rows, "
            f"count(*) - count({c}) AS n_nulls, "
            f"CAST(min({c}) AS VARCHAR) AS min_val, "
            f"CAST(max({c}) AS VARCHAR) AS max_val, "
            f"count(DISTINCT {c}) + (CASE WHEN count(*) > count({c}) "
            "THEN 1 ELSE 0 END) AS n_distinct FROM documents")

    cols = [("doc_id", "int64"), ("text", "string"), ("lang", "string"),
            ("source", "string"), ("n_chars", "int64")]
    return " UNION ALL ".join(one(c, d) for c, d in cols)


def _q_lineitem_bloom_semi(sf_dir: str):
    """Bloom-prefiltered large-×-large SEMI join: lineitem rows whose
    order is a high-value order.  The 2^22-bit bloom broadcast prunes
    the left side before the co-group exchange; survivors are exactly
    verified, so the result equals the plain semi join (one shared
    SQL oracle semantics)."""
    import ray.data as rd

    from xtract.ops.joins import bloom_semi_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey"])
    big = rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_totalprice"]) \
            .map_batches(lambda t: t.filter(
                pc.greater(t["o_totalprice"], 200000.0)),
                batch_format="pyarrow") \
            .select_columns(["o_orderkey"])
    return bloom_semi_join(li, big, "l_orderkey", "o_orderkey",
                           p_bits=22)


def _q_heavy_hitter_hosts(sf_dir: str):
    """Bounded-memory frequent-hosts summary (Misra–Gries family) over
    a deterministic skewed host column (each doc emits its host
    1 + doc_id%5 times).  capacity ≫ distinct hosts → the summary is
    exact (max_undercount 0, asserted) and the top-20 is SQL-checked;
    under capacity pressure the same op degrades to the documented
    under-count-≤-bound guarantee (pytest-covered)."""
    from xtract.ops.sketch import heavy_hitters

    docs = _docs(sf_dir, ["doc_id"])

    def hosts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        rep = np.repeat(ids, (1 + ids % 5).astype(np.int64))
        return pa.table({"host": pa.array(
            [f"h{h}.example.org" for h in rep % 199], pa.string())})

    topk, bound = heavy_hitters(
        docs.map_batches(hosts, batch_format="pyarrow"), "host",
        k=20, capacity=4096)
    assert bound == 0  # capacity ≥ distinct hosts ⇒ exact
    return topk


def _pagerank_sql(iters: int = 5) -> str:
    """Unrolled integer power iteration — CTE r{k} re-derives exactly
    the op's  base + 85·Σ(r//deg) // 100  update each round."""
    step = ("r{k} AS (SELECT n.node, CAST(150000 + "
            "(85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS r "
            "FROM nodes n LEFT JOIN ("
            "SELECT e.dst AS node, sum(r{p}.r // d.d) AS c "
            "FROM e JOIN deg d ON d.src = e.src "
            "JOIN r{p} ON r{p}.node = e.src GROUP BY e.dst) s "
            "ON s.node = n.node)")
    ctes = ", ".join(step.format(k=k, p=k - 1) for k in range(1, iters + 1))
    return (
        "WITH e AS (SELECT (doc_id % 97) AS src, "
        "((doc_id % 97) * 31 + 17 * j + doc_id) % 97 AS dst "
        "FROM documents, UNNEST(range(0, doc_id % 4)) AS t(j)), "
        "nodes AS (SELECT DISTINCT (doc_id % 97) AS node FROM documents "
        "UNION SELECT DISTINCT dst FROM e), "
        "deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1), "
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes), "
        + ctes +
        f" SELECT node, r AS pagerank_micro FROM r{iters}")


def _q_host_hits(sf_dir: str):
    """Integer HITS (hubs/authorities, ``ops/graph.hits``) over the
    SAME planted host graph as `host_pagerank`: 3 rounds of
    max-normalized int64 half-steps, bit-identical at any parallelism,
    fully re-derived by the SQL oracle's unrolled CTEs."""
    from xtract.ops.graph import hits

    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = ids % 97
        nl = (ids % 4).astype(np.int64)
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), nl)
        run_start = np.repeat(np.cumsum(nl) - nl, nl)
        j = np.arange(len(rep), dtype=np.int64) - run_start
        return pa.table({
            "src": pa.array(h[rep], pa.int64()),
            "dst": pa.array((h[rep] * 31 + 17 * j + ids[rep]) % 97,
                            pa.int64())})

    def hosts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(ids % 97), pa.int64())})

    e = docs.map_batches(edges, batch_format="pyarrow")
    nodes = docs.map_batches(hosts, batch_format="pyarrow")
    return hits(e, iters=3, nodes_ds=nodes)


def _hits_sql(iters: int = 3) -> str:
    """Unrolled integer HITS — per round: auth raw = Σ hub over
    in-edges, max-normalized to micro-units with the same int64 floor
    division as the op; then hubs symmetrically over out-edges."""
    step = (
        "ar{k} AS (SELECT n.node, coalesce(s.c, 0) AS raw "
        "FROM nodes n LEFT JOIN (SELECT e.dst AS node, sum(h{p}.h) AS c "
        "FROM e JOIN h{p} ON h{p}.node = e.src GROUP BY e.dst) s "
        "ON s.node = n.node), "
        "a{k} AS (SELECT node, CAST(raw * 1000000 // "
        "greatest((SELECT max(raw) FROM ar{k}), 1) AS BIGINT) AS a "
        "FROM ar{k}), "
        "hr{k} AS (SELECT n.node, coalesce(s.c, 0) AS raw "
        "FROM nodes n LEFT JOIN (SELECT e.src AS node, sum(a{k}.a) AS c "
        "FROM e JOIN a{k} ON a{k}.node = e.dst GROUP BY e.src) s "
        "ON s.node = n.node), "
        "h{k} AS (SELECT node, CAST(raw * 1000000 // "
        "greatest((SELECT max(raw) FROM hr{k}), 1) AS BIGINT) AS h "
        "FROM hr{k})")
    ctes = ", ".join(step.format(k=k, p=k - 1) for k in range(1, iters + 1))
    return (
        "WITH e AS (SELECT (doc_id % 97) AS src, "
        "((doc_id % 97) * 31 + 17 * j + doc_id) % 97 AS dst "
        "FROM documents, UNNEST(range(0, doc_id % 4)) AS t(j)), "
        "nodes AS (SELECT DISTINCT (doc_id % 97) AS node FROM documents "
        "UNION SELECT DISTINCT dst FROM e), "
        "h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes), "
        + ctes +
        f" SELECT h{iters}.node, h{iters}.h AS hub_micro, "
        f"a{iters}.a AS auth_micro FROM h{iters} "
        f"JOIN a{iters} ON a{iters}.node = h{iters}.node")


def _q_host_authority_profile(sf_dir: str):
    """Composition: PageRank over the planted host graph JOINED to
    per-host document counts — the crawl-prioritization enrichment
    shape (graph signal attached to a corpus aggregate via one hash
    co-group).  Exercises pagerank → groupby → equi_join_cogroup
    end-to-end in one query."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from xtract.ops.graph import pagerank
    from xtract.ops.joins import equi_join_cogroup

    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = ids % 97
        nl = (ids % 4).astype(np.int64)
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), nl)
        run_start = np.repeat(np.cumsum(nl) - nl, nl)
        j = np.arange(len(rep), dtype=np.int64) - run_start
        return pa.table({
            "src": pa.array(h[rep], pa.int64()),
            "dst": pa.array((h[rep] * 31 + 17 * j + ids[rep]) % 97,
                            pa.int64())})

    def hosts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(ids % 97, pa.int64())})

    pr = pagerank(docs.map_batches(edges, batch_format="pyarrow"),
                  iters=3,
                  nodes_ds=docs.map_batches(hosts,
                                            batch_format="pyarrow"))
    ndocs = (docs.map_batches(hosts, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="n_docs")))
    out = equi_join_cogroup(ndocs, pr, on="node")
    return out.select_columns(["node", "n_docs", "pagerank_micro"])


def _host_authority_sql() -> str:
    return (
        f"WITH pr AS ({_pagerank_sql(3)}), "
        "nd AS (SELECT (doc_id % 97) AS node, "
        "CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1) "
        "SELECT nd.node, nd.n_docs, pr.pagerank_micro "
        "FROM nd JOIN pr ON pr.node = nd.node ORDER BY nd.node")


def _q_crawl_schedule(sf_dir: str):
    """Politeness-aware crawl-frontier scheduling
    (``ops/urls.politeness_schedule``): wave k holds ≤1 url per host —
    one coarse co-group by host, vectorized within-host rank."""
    import ray.data as rd

    from xtract.ops.urls import politeness_schedule

    docs = _docs(sf_dir, ["doc_id"])

    def urls(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hosts = [f"host{int(i) % 11}.example.org" for i in ids]
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "url": pa.array([f"https://{h}/p/{int(i)}"
                             for h, i in zip(hosts, ids)], pa.string())})

    return politeness_schedule(
        docs.map_batches(urls, batch_format="pyarrow"))


def _q_url_templates(sf_dir: str):
    """URL-pattern mining (``ops/urls.url_template_profile``): digit
    runs collapse to N, one grouped Count/Min per (host, template) —
    the template-farm / crawler-trap detector."""
    from xtract.ops.urls import url_template_profile

    docs = _docs(sf_dir, ["doc_id"])

    def urls(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"url": pa.array(
            [f"https://host{int(i) % 5}.example.org/"
             f"{('news', 'shop')[int(i) % 2]}/{int(i)}/page"
             for i in ids], pa.string())})

    return url_template_profile(docs.map_batches(urls,
                                                 batch_format="pyarrow"))


_URL_TEMPLATES_SQL = (
    "WITH u AS (SELECT 'host' || CAST(doc_id % 5 AS VARCHAR) || "
    "'.example.org' AS host, "
    "CASE WHEN doc_id % 2 = 0 THEN 'news' ELSE 'shop' END AS sec, "
    "doc_id FROM documents) "
    "SELECT host, '/' || sec || '/N/page' AS template, "
    "CAST(count(*) AS BIGINT) AS n_urls, "
    "min('https://' || host || '/' || sec || '/' || "
    "CAST(doc_id AS VARCHAR) || '/page') AS min_url "
    "FROM u GROUP BY 1, 2 ORDER BY 1, 2")


def _q_host_crawl_waterfill(sf_dir: str):
    """Crawl-budget waterfilling (``ops/urls.waterfill_allocation``):
    skewed per-host url counts (host = ⌊√doc_id⌋ → host k holds ~2k+1
    docs), global budget = half the corpus; τ* found by batched binary
    search (streaming scans, no shuffle), allocation = min(count, τ*)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from xtract.ops.urls import waterfill_allocation

    docs = _docs(sf_dir, ["doc_id"])
    budget = docs.count() // 2

    def hosts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"host": pa.array(
            np.floor(np.sqrt(ids.astype(np.float64))).astype(np.int64),
            pa.int64())})

    counts = (docs.map_batches(hosts, batch_format="pyarrow")
              .groupby("host").aggregate(Count(alias_name="n_urls")))
    _tau, out = waterfill_allocation(counts, budget)
    return out


# τ* via closed-form segment analysis: between consecutive distinct
# count values, f(t) = Σ min(c,t) is affine (S + A·t); the max feasible
# integer t of each feasible segment is a candidate, τ* = their max
# (a = 0 is the t ≥ max(count) plateau, feasible only when the whole
# demand fits the budget — τ then caps at max(count), like the op).
_HOST_CRAWL_WATERFILL_SQL = (
    "WITH c AS (SELECT CAST(floor(sqrt(doc_id)) AS BIGINT) AS host, "
    "CAST(count(*) AS BIGINT) AS n_urls FROM documents GROUP BY 1), "
    "p AS (SELECT (SELECT count(*) // 2 FROM documents) AS b), "
    "seg AS (SELECT v AS lo, lead(v) OVER (ORDER BY v) AS nxt FROM "
    "(SELECT 0 AS v UNION SELECT DISTINCT n_urls FROM c)), "
    "stats AS (SELECT seg.lo, seg.nxt, "
    "(SELECT coalesce(sum(n_urls), 0) FROM c WHERE n_urls <= seg.lo) "
    "AS s, (SELECT count(*) FROM c WHERE n_urls > seg.lo) AS a "
    "FROM seg), "
    "cand AS (SELECT CASE WHEN a = 0 THEN lo "
    "ELSE least(nxt - 1, (b - s) // a) END AS t, lo "
    "FROM stats, p WHERE (a = 0 AND s <= b) "
    "OR (a > 0 AND s + a * lo <= b)), "
    "tau AS (SELECT coalesce(max(t), 0) AS t FROM cand WHERE t >= lo) "
    "SELECT c.host, c.n_urls, CAST(least(c.n_urls, tau.t) AS BIGINT) "
    "AS alloc FROM c, tau ORDER BY c.host")


def _q_host_mirror_pairs(sf_dir: str):
    """Content-mirror host pairs (``ops/urls.mirror_host_pairs``):
    planted mirrors — page d on host{d%7} carries content d%97
    (gcd(97,7)=1 spreads every content across hosts) — exact integer
    Jaccard per host pair over distinct shared contents."""
    from xtract.ops.urls import mirror_host_pairs

    docs = _docs(sf_dir, ["doc_id"])

    def pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "url": pa.array([f"https://host{int(i) % 7}.example.org"
                             f"/p/{int(i)}" for i in ids], pa.string()),
            "text": pa.array([f"mirror {int(i) % 97}" for i in ids],
                             pa.string())})

    return mirror_host_pairs(docs.map_batches(pages,
                                              batch_format="pyarrow"))


_HOST_MIRROR_SQL = (
    "WITH dt AS (SELECT DISTINCT 'host' || CAST(doc_id % 7 AS VARCHAR) "
    "|| '.example.org' AS host, (doc_id % 97) AS c FROM documents), "
    "grp AS (SELECT c, count(*) AS m FROM dt GROUP BY c), "
    "ok AS (SELECT dt.host, dt.c FROM dt JOIN grp USING (c) "
    "WHERE m BETWEEN 2 AND 64), "
    "pr AS (SELECT a.host AS host_a, b.host AS host_b, "
    "count(*) AS shared FROM ok a JOIN ok b "
    "ON a.c = b.c AND a.host < b.host GROUP BY 1, 2), "
    "tot AS (SELECT host, count(*) AS n FROM dt GROUP BY host) "
    "SELECT pr.host_a, pr.host_b, CAST(shared AS BIGINT) AS shared, "
    "CAST(shared AS BIGINT) AS jacc_num, "
    "CAST(ta.n + tb.n - shared AS BIGINT) AS jacc_den "
    "FROM pr JOIN tot ta ON ta.host = pr.host_a "
    "JOIN tot tb ON tb.host = pr.host_b ORDER BY 1, 2")


def _q_host_crawl_delays(sf_dir: str):
    """Per-host Crawl-delay harvest (``ops/robots.extract_crawl_delays``
    through the REAL REP parser): planted robots bodies — host h
    declares ``Crawl-delay: {h%4}.{h%10}`` for ``*`` and a faster
    mybot group that must NOT win for the default agent."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from xtract.ops.robots import extract_crawl_delays

    docs = _docs(sf_dir, ["doc_id"])

    def hosts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"host": pa.array(
            [f"host{int(i) % 9}.example.org" for i in ids], pa.string())})

    def robots(t: pa.Table) -> pa.Table:
        hs = t["host"].to_pylist()
        bodies = []
        for h in hs:
            k = int(h.split(".")[0][4:])
            bodies.append(
                f"User-agent: mybot\nCrawl-delay: 0.1\n\n"
                f"User-agent: *\nDisallow: /private\n"
                f"Crawl-delay: {k % 4}.{k % 10}  # planted\n")
        return pa.table({"host": t["host"],
                         "robots_txt": pa.array(bodies, pa.string())})

    per_host = (docs.map_batches(hosts, batch_format="pyarrow")
                .groupby("host").aggregate(Count(alias_name="_n"))
                .select_columns(["host"])
                .map_batches(robots, batch_format="pyarrow"))
    return extract_crawl_delays(per_host)


_HOST_CRAWL_DELAYS_SQL = (
    "SELECT DISTINCT 'host' || CAST(doc_id % 9 AS VARCHAR) || "
    "'.example.org' AS host, "
    "CAST((doc_id % 9) % 4 * 1000 + (doc_id % 9) % 10 * 100 AS BIGINT) "
    "AS crawl_delay_ms FROM documents ORDER BY host")


def _q_sitemap_entries(sf_dir: str):
    """Sitemap XML explode (``ops/robots.extract_sitemap_entries``
    through the REAL tokenizer): planted per-host sitemap bodies —
    host h lists ⌈(h%3)+1⌉ urls with lastmod 2026-01-(h%9+1); a
    loc-less entry and an unterminated trailing entry prove the
    recovery rules."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from xtract.ops.robots import extract_sitemap_entries

    docs = _docs(sf_dir, ["doc_id"])

    def hosts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"host": pa.array(
            [f"host{int(i) % 8}.example.org" for i in ids], pa.string())})

    def bodies(t: pa.Table) -> pa.Table:
        hs = t["host"].to_pylist()
        xs = []
        for h in hs:
            k = int(h.split(".")[0][4:])
            urls = "".join(
                f"<url><loc>https://{h}/p/{j}</loc>"
                f"<lastmod>2026-01-{k % 9 + 1:02d}</lastmod></url>"
                for j in range(k % 3 + 1))
            xs.append(f"<urlset>{urls}<url><lastmod>x</lastmod></url>"
                      f"<url><loc>https://{h}/tail</loc>")
        return pa.table({"host": t["host"],
                         "sitemap_xml": pa.array(xs, pa.string())})

    per_host = (docs.map_batches(hosts, batch_format="pyarrow")
                .groupby("host").aggregate(Count(alias_name="_n"))
                .select_columns(["host"])
                .map_batches(bodies, batch_format="pyarrow"))
    return extract_sitemap_entries(per_host)


_SITEMAP_ENTRIES_SQL = (
    "WITH h AS (SELECT DISTINCT (doc_id % 8) AS k FROM documents), "
    "e AS (SELECT k, t.j FROM h, UNNEST(range(0, k % 3 + 1)) AS t(j)) "
    "SELECT 'host' || CAST(k AS VARCHAR) || '.example.org' AS host, "
    "'url' AS kind, "
    "'https://host' || CAST(k AS VARCHAR) || '.example.org/p/' || "
    "CAST(j AS VARCHAR) AS loc, "
    "'2026-01-' || lpad(CAST(k % 9 + 1 AS VARCHAR), 2, '0') AS lastmod "
    "FROM e "
    "UNION ALL "
    "SELECT 'host' || CAST(k AS VARCHAR) || '.example.org', 'url', "
    "'https://host' || CAST(k AS VARCHAR) || '.example.org/tail', '' "
    "FROM h ORDER BY host, loc")


def _q_crawl_plan(sf_dir: str):
    """Capstone crawl-tier composition: per-host counts →
    `waterfill_allocation` (global budget = 40% of urls) →
    `politeness_schedule` → keep each host's first ``alloc`` waves —
    a budgeted, politeness-ordered frontier in one pipeline.  The
    alloc attach is one hash co-group join; everything upstream is the
    ops' own scale shapes."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from xtract.ops.joins import equi_join_cogroup
    from xtract.ops.urls import politeness_schedule, waterfill_allocation

    docs = _docs(sf_dir, ["doc_id"])
    budget = docs.count() * 2 // 5

    def urls(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hosts = [f"host{int(i) % 13}.example.org" for i in ids]
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "url": pa.array([f"https://{h}/p/{int(i):06d}"
                             for h, i in zip(hosts, ids)], pa.string())})

    pages = docs.map_batches(urls, batch_format="pyarrow").materialize()
    counts = pages.groupby("host").aggregate(Count(alias_name="n_urls"))
    _tau, alloc = waterfill_allocation(counts, budget)
    sched = politeness_schedule(pages)
    j = equi_join_cogroup(sched, alloc.select_columns(["host", "alloc"]),
                          on="host")

    def keep(t: pa.Table) -> pa.Table:
        w = t["fetch_wave"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = t["alloc"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = t.filter(pa.array(w < a))
        return pa.table({
            "host": out["host"].cast(pa.string()),
            "url": out["url"].cast(pa.string()),
            "fetch_wave": out["fetch_wave"].cast(pa.int64())})

    return j.map_batches(keep, batch_format="pyarrow")


_CRAWL_PLAN_SQL = (
    "WITH u AS (SELECT 'host' || CAST(doc_id % 13 AS VARCHAR) || "
    "'.example.org' AS host, "
    "'https://host' || CAST(doc_id % 13 AS VARCHAR) || "
    "'.example.org/p/' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS url "
    "FROM documents), "
    "c AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls "
    "FROM u GROUP BY 1), "
    "p AS (SELECT (SELECT count(*) * 2 // 5 FROM documents) AS b), "
    "seg AS (SELECT v AS lo, lead(v) OVER (ORDER BY v) AS nxt FROM "
    "(SELECT 0 AS v UNION SELECT DISTINCT n_urls FROM c)), "
    "stats AS (SELECT seg.lo, seg.nxt, "
    "(SELECT coalesce(sum(n_urls), 0) FROM c WHERE n_urls <= seg.lo) "
    "AS s, (SELECT count(*) FROM c WHERE n_urls > seg.lo) AS a "
    "FROM seg), "
    "cand AS (SELECT CASE WHEN a = 0 THEN lo "
    "ELSE least(nxt - 1, (b - s) // a) END AS t, lo "
    "FROM stats, p WHERE (a = 0 AND s <= b) "
    "OR (a > 0 AND s + a * lo <= b)), "
    "tau AS (SELECT coalesce(max(t), 0) AS t FROM cand WHERE t >= lo), "
    "sched AS (SELECT host, url, CAST(row_number() OVER "
    "(PARTITION BY host ORDER BY url) - 1 AS BIGINT) AS fetch_wave "
    "FROM u) "
    "SELECT sched.host AS host, sched.url, sched.fetch_wave "
    "FROM sched, c, tau WHERE c.host = sched.host "
    "AND sched.fetch_wave < least(c.n_urls, tau.t) "
    "ORDER BY sched.host, sched.fetch_wave")


_CRAWL_SCHEDULE_SQL = (
    "WITH u AS (SELECT 'host' || CAST(doc_id % 11 AS VARCHAR) || "
    "'.example.org' AS host, "
    "'https://host' || CAST(doc_id % 11 AS VARCHAR) || '.example.org/p/' "
    "|| CAST(doc_id AS VARCHAR) AS url FROM documents) "
    "SELECT host, url, CAST(row_number() OVER "
    "(PARTITION BY host ORDER BY url) - 1 AS BIGINT) AS fetch_wave "
    "FROM u ORDER BY host, url")


def _q_crawl_snapshot_diff(sf_dir: str):
    """Crawl-dump diff: urls added/removed/changed/unchanged between
    two deterministic snapshots of the corpus (old = doc_id%7 != 3,
    new = doc_id%11 != 5 with text edited where doc_id%5 == 0), by
    md5 content digest.  One slim co-group — SQL oracle is a FULL
    OUTER JOIN on the same construction."""
    import hashlib

    from xtract.ops.graph import snapshot_diff

    docs = _docs(sf_dir, ["doc_id", "text"])

    def snap(new: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = (ids % 11 != 5) if new else (ids % 7 != 3)
            t = t.filter(pa.array(keep))
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            urls, digs = [], []
            for i, txt in zip(ids, t["text"].to_pylist()):
                txt = txt or ""
                if new and i % 5 == 0:
                    txt += " v2"
                urls.append(f"https://h{i % 97}.example.com/d/{i}")
                digs.append(hashlib.md5(txt.encode()).hexdigest())
            return pa.table({"url": pa.array(urls, pa.string()),
                             "digest": pa.array(digs, pa.string())})
        return f

    old = docs.map_batches(snap(False), batch_format="pyarrow")
    new = docs.map_batches(snap(True), batch_format="pyarrow")
    return snapshot_diff(old, new)


def _q_host_robots_filter(sf_dir: str):
    """robots.txt crawl-policy application (``ops/robots.apply_robots``):
    planted per-host robots files (a ``*`` group everywhere; an agent-
    specific ``xbot`` group on even hosts that REPLACES it per the REP
    spec) co-grouped by host against planted urls exercising longest-
    prefix, Allow-override, prefix-without-slash and no-match cases.
    Expected decision is closed-form in (doc_id%7, doc_id%5)."""
    import ray.data as rd

    from xtract.ops.robots import apply_robots

    def pages_batch(t: pa.Table) -> pa.Table:
        urls = []
        for d in t["doc_id"].to_pylist():
            d = int(d)
            h, r = d % 7, d % 5
            path = {0: f"/a/{d}", 1: f"/p{h}/x/{d}", 2: f"/p{h}/pub/{d}",
                    3: f"/tmp{d}"}.get(r, f"/x{h}/{d}")
            urls.append(f"https://r{h}.example.org{path}")
        return pa.table({"url": pa.array(urls, pa.string())})

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        pages_batch, batch_format="pyarrow")
    robots_rows = []
    for h in range(7):
        txt = (f"# host r{h}\nUser-agent: *\nDisallow: /p{h}/\n"
               f"Allow: /p{h}/pub/\nDisallow: /tmp\n")
        if h % 2 == 0:
            txt += f"\nUser-agent: xbot\nDisallow: /x{h}/\nAllow: /\n"
        robots_rows.append({"host": f"r{h}.example.org", "robots_txt": txt})
    robots = rd.from_arrow(pa.Table.from_pylist(robots_rows))
    return apply_robots(pages, robots, agent="xbot")


def _q_doc_sentences(sf_dir: str):
    """Sentence explode (``ops/textstats.split_sentences``) under the
    deterministic RE2-compatible rule, over planted punctuation-bearing
    text (the synthetic documents corpus has no terminators): multi-
    sentence, leading-terminator-skip, single-run and trailing-
    whitespace-segment cases by doc_id residue."""
    from xtract.ops.textstats import split_sentences

    def with_punct(t: pa.Table) -> pa.Table:
        texts = []
        for d in t["doc_id"].to_pylist():
            d = int(d)
            r = d % 4
            if r == 0:
                texts.append(f"Alpha {d}. Beta {d % 9}!! Gamma? tail")
            elif r == 1:
                texts.append(f"...{d} leading")
            elif r == 2:
                texts.append(f"One sentence {d}")
            else:
                texts.append(f"Tail spaces {d}.   ")
        return pa.table({"doc_id": t["doc_id"],
                         "text": pa.array(texts, pa.string())})

    docs = _docs(sf_dir, ["doc_id"]).map_batches(
        with_punct, batch_format="pyarrow")
    return split_sentences(docs)


def _q_event_value_bands(sf_dir: str):
    """Non-equi broadcast range join (``ops/joins.
    range_lookup_broadcast``): integer-cents event values bucketed into
    half-open price bands (the SQL ``JOIN ON v >= lo AND v < hi``
    enrichment shape) — one searchsorted per batch, then ONE grouped
    Count/Sum over the bands."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.joins import range_lookup_broadcast

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.round(t["value"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        return pa.table({"cents": pa.array(c)})

    bands = pd.DataFrame({
        "lo": [0, 1000, 2500, 7500], "hi": [1000, 2500, 7500, 20000],
        "label": ["micro", "small", "mid", "large"]})
    banded = range_lookup_broadcast(
        ev.map_batches(cents, batch_format="pyarrow"), "cents", bands,
        out_col="band", default="whale")
    return (banded.groupby("band")
            .aggregate(Count(alias_name="n_events"),
                       Sum("cents", alias_name="sum_cents")))


def _q_doc_length_rank(sf_dir: str):
    """Exact global ``RANK() OVER (ORDER BY n_chars)`` with NO global
    sort (``ops/quantiles.global_rank``): one grouped count per
    distinct value, bounded cumulative table broadcast, searchsorted
    rank attach per batch."""
    from xtract.ops.quantiles import global_rank

    docs = _docs(sf_dir, ["doc_id", "n_chars"])
    return global_rank(docs, "doc_id", "n_chars")


def _q_host_sitemaps(sf_dir: str):
    """Sitemap harvest from per-host robots.txt bodies
    (``ops/robots.extract_sitemaps``): planted 0/1/2-sitemap files by
    doc_id residue, with comments and rule lines interleaved."""
    from xtract.ops.robots import extract_sitemaps

    def robots_batch(t: pa.Table) -> pa.Table:
        hosts, txts = [], []
        for d in t["doc_id"].to_pylist():
            d = int(d)
            host = f"s{d}.example.org"
            txt = f"# robots for {host}\nUser-agent: *\nDisallow: /p/\n"
            if d % 3 >= 1:
                txt += f"Sitemap: https://{host}/sm0.xml\n"
            if d % 3 == 2:
                txt += f"Allow: /p/ok/\nSitemap: https://{host}/sm1.xml\n"
            hosts.append(host)
            txts.append(txt)
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "robots_txt": pa.array(txts, pa.string())})

    robots = _docs(sf_dir, ["doc_id"]).map_batches(
        robots_batch, batch_format="pyarrow")
    return extract_sitemaps(robots)


def _reciprocal_pages_batch(t: pa.Table) -> pa.Table:
    """Planted link graph through the REAL tokenizer: every page on
    host h{d%4} links to h{(d+2)%4} (mod-4 +2 shift ⟹ 0↔2 and 1↔3 are
    mutual) plus a one-way link to ow{d%3}.example.net (never links
    back)."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        d = int(d)
        urls.append(f"https://h{d % 4}.example.org/p/{d}")
        h = (f"<html><body><p>see "
             f"<a href=\"https://h{(d + 2) % 4}.example.org/in/{d}\">x</a>"
             f" and <a href=\"https://ow{d % 3}.example.net/z\">y</a>"
             f"</p></body></html>")
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_host_reciprocal_links(sf_dir: str):
    """Mutual host-level links (``ops/graph.reciprocal_host_pairs``):
    per-block deduped unordered-pair combiner → ONE grouped Max/Max →
    filter.  Expected pairs are provably (h0,h2) and (h1,h3)."""
    from xtract.links import extract_outlinks
    from xtract.ops.graph import reciprocal_host_pairs

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _reciprocal_pages_batch, batch_format="pyarrow")
    return reciprocal_host_pairs(extract_outlinks(pages))


def _anchor_pages_batch(t: pa.Table) -> pa.Table:
    """Planted cross-host anchor fan-in through the REAL tokenizer:
    page d (on host{d%6}) links to target t{d%7} with anchor
    'topic {d%5}' and to t{(3d+1)%7} with anchor 'see {d%3}'; an
    intra-host nav link and an empty-anchor link are planted too and
    must be filtered out by the op."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        d = int(d)
        urls.append(f"https://host{d % 6}.example.org/p/{d}")
        h = ("<html><body><p>"
             f"<a href=\"https://t{d % 7}.example.org/\">topic {d % 5}</a> "
             f"<a href=\"https://t{(3 * d + 1) % 7}.example.org/\">"
             f"see {d % 3}</a> "
             f"<a href=\"https://host{d % 6}.example.org/nav\">home</a> "
             f"<a href=\"https://t{d % 7}.example.org/\"></a>"
             "</p></body></html>")
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_anchor_text_profile(sf_dir: str):
    """Anchor-text harvest (``ops/graph.anchor_text_profile``): per
    link TARGET, total cross-host in-links, distinct referring hosts,
    distinct anchor strings, and the modal anchor (ties
    lexicographic).  Scale shape: slim (target, anchor) pair groupby
    with block combiners, exact distinct-host pair dedup, grouped
    top-1 for the mode, two hash co-group joins — no broadcast."""
    from xtract.links import extract_outlinks
    from xtract.ops.graph import anchor_text_profile

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _anchor_pages_batch, batch_format="pyarrow")
    return anchor_text_profile(extract_outlinks(pages))


def _anchor_profile_sql() -> str:
    link1 = ("SELECT 'https://t' || CAST(doc_id % 7 AS VARCHAR) || "
             "'.example.org/' AS target, "
             "'topic ' || CAST(doc_id % 5 AS VARCHAR) AS anchor, "
             "'host' || CAST(doc_id % 6 AS VARCHAR) || '.example.org' "
             "AS src_host FROM documents")
    link2 = ("SELECT 'https://t' || CAST((3 * doc_id + 1) % 7 AS VARCHAR) "
             "|| '.example.org/', "
             "'see ' || CAST(doc_id % 3 AS VARCHAR), "
             "'host' || CAST(doc_id % 6 AS VARCHAR) || '.example.org' "
             "FROM documents")
    return (
        f"WITH l AS ({link1} UNION ALL {link2}), "
        "p AS (SELECT target, anchor, count(*) AS n FROM l "
        "GROUP BY 1, 2), "
        "agg AS (SELECT target, CAST(sum(n) AS BIGINT) AS n_links, "
        "CAST(count(*) AS BIGINT) AS n_distinct_anchors FROM p "
        "GROUP BY 1), "
        "top AS (SELECT target, anchor AS top_anchor, "
        "CAST(n AS BIGINT) AS top_anchor_links, "
        "row_number() OVER (PARTITION BY target "
        "ORDER BY n DESC, anchor) AS rn FROM p), "
        "h AS (SELECT target, CAST(count(DISTINCT src_host) AS BIGINT) "
        "AS n_hosts FROM l GROUP BY 1) "
        "SELECT agg.target, n_links, n_hosts, n_distinct_anchors, "
        "top_anchor, top_anchor_links "
        "FROM agg JOIN top USING (target) JOIN h USING (target) "
        "WHERE rn = 1 ORDER BY target")


def _q_lineitem_weighted_discount(sf_dir: str):
    """Exact-integer grouped WEIGHTED AVERAGE (price-weighted discount)
    as a num/den fraction — no float accumulation order anywhere: one
    vectorized map to integer cents/bps products, ONE native grouped
    Sum pair."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_discount"])

    def to_int(b: pa.Table) -> pa.Table:
        price = np.round(b["l_extendedprice"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        disc = np.round(b["l_discount"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "wd_num": pa.array(price * disc),
                         "wd_den": pa.array(price)})

    return (li.map_batches(to_int, batch_format="pyarrow")
              .groupby("l_returnflag")
              .aggregate(Sum("wd_num", alias_name="wd_num"),
                         Sum("wd_den", alias_name="wd_den")))


def _q_user_rfm_segments(sf_dir: str):
    """RFM user segmentation (``ops/behavior.rfm_segments``): one
    grouped aggregate → exact global quartile thresholds via histogram
    refinement (no sort) → vectorized 1–4 scores."""
    import ray.data as rd

    from xtract.ops.behavior import rfm_segments

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    return rfm_segments(ev)


def _list_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a page with a nested <ul> (text-stops-at-nested-list
    + shared-list_idx semantics) and, for doc_id%4==0, an <ol> whose
    last item is unterminated (recovery)."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://host{d % 6}.example.org/p/{d}")
        h = (f"<html><body><ul><li>alpha {d % 3}</li>"
             f"<li>b &amp; {d % 5}<ul><li>nested {d % 2}</li></ul></li>"
             "</ul>")
        if d % 4 == 0:
            h += f"<ol><li>one {d % 7}</li><li>two {d % 3}</ol>"
        h += "</body></html>"
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_page_lists(sf_dir: str):
    """List-item extraction (``xtract/tables.extract_lists``): the
    sixth tokenizer-walk surface — one row per <li> with top-level
    list index, in-list sequence, nesting depth and ordered flag."""
    from xtract.tables import extract_lists

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _list_pages_batch, batch_format="pyarrow")
    return extract_lists(pages)


def _page_lists_sql() -> str:
    page = ("'https://host' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org/p/' || CAST(doc_id AS VARCHAR)")
    rows = [
        ("0", "0", "1", "false", "'alpha ' || CAST(doc_id % 3 AS VARCHAR)",
         None),
        ("0", "1", "1", "false", "'b & ' || CAST(doc_id % 5 AS VARCHAR)",
         None),
        ("0", "2", "2", "false", "'nested ' || CAST(doc_id % 2 AS VARCHAR)",
         None),
        ("1", "0", "1", "true", "'one ' || CAST(doc_id % 7 AS VARCHAR)",
         "doc_id % 4 = 0"),
        ("1", "1", "1", "true", "'two ' || CAST(doc_id % 3 AS VARCHAR)",
         "doc_id % 4 = 0"),
    ]
    parts = []
    for li, it, dp, od, txt, cond in rows:
        q = (f"SELECT {page} AS url, CAST({li} AS BIGINT) AS list_idx, "
             f"CAST({it} AS BIGINT) AS item_idx, CAST({dp} AS BIGINT) "
             f"AS depth, {od} AS ordered, {txt} AS item_text "
             "FROM documents")
        if cond:
            q += f" WHERE {cond}"
        parts.append(q)
    return " UNION ALL ".join(parts)


def _q_bigram_pmi(sf_dir: str):
    """Bigram collocation mining by exact-integer PMI ratio
    (``ops/collocations.bigram_pmi``): distributed bigram/unigram
    combiner counts, vocabulary-bounded broadcast lookup, big-int
    scoring on the filtered survivors only."""
    from xtract.ops.collocations import bigram_pmi

    return bigram_pmi(_docs(sf_dir, ["text"]), min_count=5, k=50)


def _bigram_pmi_sql() -> str:
    return (
        "WITH toks AS (SELECT doc, tok, row_number() OVER "
        "(PARTITION BY doc ORDER BY pos) AS rn FROM ("
        "SELECT doc_id AS doc, unnest(regexp_split_to_array(lower("
        "coalesce(text,'')), '[^a-z]+')) AS tok, "
        "unnest(range(1, len(regexp_split_to_array(lower("
        "coalesce(text,'')), '[^a-z]+')) + 1)) AS pos FROM documents) "
        "WHERE tok != ''), "
        "bi AS (SELECT t1.tok AS a, t2.tok AS b, count(*) AS c_ab "
        "FROM toks t1 JOIN toks t2 ON t2.doc = t1.doc "
        "AND t2.rn = t1.rn + 1 GROUP BY 1, 2), "
        "uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1), "
        "n AS (SELECT sum(c) AS n FROM uni), "
        "m AS (SELECT sum(c_ab) AS m FROM bi) "
        "SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab, "
        "CAST(ua.c AS BIGINT) AS c_a, CAST(ub.c AS BIGINT) AS c_b, "
        "CAST((c_ab * (SELECT n FROM n)::HUGEINT * (SELECT n FROM n) "
        "* 1000000) // ((SELECT m FROM m) * ua.c * ub.c) AS BIGINT) "
        "AS ratio_ppm "
        "FROM bi JOIN uni ua ON ua.tok = a JOIN uni ub ON ub.tok = b "
        "WHERE c_ab >= 5 ORDER BY ratio_ppm DESC, a, b LIMIT 50")


def _q_host_triangles(sf_dir: str):
    """Per-host triangle counts over the deterministic host link graph
    (same planted edges as ``host_pagerank``): degree-ordered
    node-iterator — distinct undirected edges → O(√E)-bounded wedge
    explode → semi co-group closure (``ops/graph.triangle_counts``)."""
    from xtract.ops.graph import triangle_counts

    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = ids % 97
        nl = (ids % 4).astype(np.int64)
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), nl)
        run_start = np.repeat(np.cumsum(nl) - nl, nl)
        j = np.arange(len(rep), dtype=np.int64) - run_start
        return pa.table({
            "src": pa.array(h[rep], pa.int64()),
            "dst": pa.array((h[rep] * 31 + 17 * j + ids[rep]) % 97,
                            pa.int64())})

    return triangle_counts(docs.map_batches(edges, batch_format="pyarrow"))


def _host_triangles_sql() -> str:
    return (
        "WITH raw AS (SELECT (doc_id % 97) AS x, "
        "((doc_id % 97) * 31 + 17 * j + doc_id) % 97 AS y "
        "FROM documents, UNNEST(range(0, doc_id % 4)) AS t(j)), "
        "e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v "
        "FROM raw WHERE x != y), "
        "tri AS (SELECT a.u AS n1, a.v AS n2, b.v AS n3 FROM e a "
        "JOIN e b ON b.u = a.v JOIN e c ON c.u = a.u AND c.v = b.v), "
        "corners AS (SELECT n1 AS node FROM tri UNION ALL "
        "SELECT n2 FROM tri UNION ALL SELECT n3 FROM tri) "
        "SELECT CAST(node AS BIGINT) AS node, count(*) AS n_triangles "
        "FROM corners GROUP BY node")


def _q_orders_anti_events(sf_dir: str):
    """Large-×-large ANTI join via co-group (``semi_join_cogroup``
    with ``anti=True``): orders whose customer never appears in the
    event log — only the right KEY column shuffles, no broadcast."""
    import ray.data as rd

    from xtract.ops.joins import semi_join_cogroup

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return semi_join_cogroup(orders, ev, "o_custkey", "user_id",
                             anti=True)


def _q_user_first_event_daily(sf_dir: str):
    """Windowed first-per-key (recrawl-dedup shape: keep the first
    fetch per url per day): composite (user, epoch-day) key through
    the block-combiner + coarse co-group ``first_row_per_key`` — each
    block contributes ≤1 row per key before the exchange."""
    import ray.data as rd

    from xtract.ops.agg import first_row_per_key

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])

    def keyed(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        uk = (b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
              * 1_000_000 + day)
        return b.append_column("_uk", pa.array(uk, pa.int64()))

    first = first_row_per_key(
        ev.map_batches(keyed, batch_format="pyarrow"),
        "_uk", order_cols=("ts", "event_id"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
            "event_id": b["event_id"],
            "event_type": b["event_type"]})

    return first.map_batches(finish, batch_format="pyarrow")


def _q_doc_split_assign(sf_dir: str):
    """Deterministic train/val/test assignment by content digest
    (``ops/textstats.assign_split_batch``) — the leakage-safe split
    is stable across runs, shards and parallelism."""
    from xtract.ops.textstats import assign_split_batch

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(assign_split_batch, batch_format="pyarrow")
            .select_columns(["doc_id", "split"]))


def _code_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a page with a pre+code block (language class), an
    inline code, and for doc_id%4==0 an unterminated bare <pre>."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://host{d % 6}.example.org/p/{d}")
        h = ("<html><body><pre><code class=\"language-py\">"
             f"def f({d % 5}):\n    return {d % 3}</code></pre>"
             f"<p>x</p><code>inline {d % 7}</code>")
        if d % 4 == 0:
            h += f"<pre>raw &amp; {d % 2}"  # unterminated → EOF
        else:
            h += "</body></html>"
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_page_code_blocks(sf_dir: str):
    """Code-block extraction (``xtract/tables.extract_code_blocks``):
    the seventh tokenizer-walk surface — whitespace-preserving
    <pre>/<code> harvest with language-class detection."""
    from xtract.tables import extract_code_blocks

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _code_pages_batch, batch_format="pyarrow")
    return extract_code_blocks(pages)


def _page_code_sql() -> str:
    page = ("'https://host' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org/p/' || CAST(doc_id AS VARCHAR)")
    rows = [
        ("0", "'pre'", "'py'",
         "'def f(' || CAST(doc_id % 5 AS VARCHAR) || '):' || chr(10) || "
         "'    return ' || CAST(doc_id % 3 AS VARCHAR)", None),
        ("1", "'code'", "''",
         "'inline ' || CAST(doc_id % 7 AS VARCHAR)", None),
        ("2", "'pre'", "''",
         "'raw & ' || CAST(doc_id % 2 AS VARCHAR)", "doc_id % 4 = 0"),
    ]
    parts = []
    for rk, ct, lg, txt, cond in rows:
        q = (f"SELECT {page} AS url, CAST({rk} AS BIGINT) AS rank, "
             f"{ct} AS container, {lg} AS lang, {txt} AS code_text "
             "FROM documents")
        if cond:
            q += f" WHERE {cond}"
        parts.append(q)
    return " UNION ALL ".join(parts)


def _q_host_link_jaccard(sf_dir: str):
    """Pairwise host similarity by shared outlink targets
    (``ops/graph.jaccard_pairs``): distinct memberships → per-target
    pair explode in a coarse co-group → ONE grouped Count → exact
    integer jac_num/jac_den fractions.  Planted membership: host =
    doc_id%23 links to (host*7 + 11j + doc_id)%53 for j < doc_id%3."""
    from xtract.ops.graph import jaccard_pairs

    docs = _docs(sf_dir, ["doc_id"])

    def memb(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = ids % 23
        nl = (ids % 3).astype(np.int64)
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), nl)
        run_start = np.repeat(np.cumsum(nl) - nl, nl)
        j = np.arange(len(rep), dtype=np.int64) - run_start
        return pa.table({
            "host": pa.array(h[rep], pa.int64()),
            "target": pa.array((h[rep] * 7 + 11 * j + ids[rep]) % 53,
                               pa.int64())})

    out = jaccard_pairs(docs.map_batches(memb, batch_format="pyarrow"),
                        "host", "target", min_overlap=2)
    return out.map_batches(
        lambda t: t.rename_columns(["host_a", "host_b", "jac_num",
                                    "jac_den"]),
        batch_format="pyarrow")


def _host_link_jaccard_sql() -> str:
    return (
        "WITH raw AS (SELECT (doc_id % 23) AS s, "
        "((doc_id % 23) * 7 + 11 * j + doc_id) % 53 AS m "
        "FROM documents, UNNEST(range(0, doc_id % 3)) AS t(j)), "
        "memb AS (SELECT DISTINCT s, m FROM raw), "
        "sizes AS (SELECT s, count(*) AS n FROM memb GROUP BY 1), "
        "co AS (SELECT x.s AS a, y.s AS b, count(*) AS c "
        "FROM memb x JOIN memb y ON x.m = y.m AND x.s < y.s "
        "GROUP BY 1, 2) "
        "SELECT CAST(a AS BIGINT) AS host_a, CAST(b AS BIGINT) AS "
        "host_b, CAST(c AS BIGINT) AS jac_num, "
        "CAST(sa.n + sb.n - c AS BIGINT) AS jac_den "
        "FROM co JOIN sizes sa ON sa.s = a JOIN sizes sb ON sb.s = b "
        "WHERE c >= 2")


def _q_customer_orders_left(sf_dir: str):
    """LEFT co-group join (large×large, ``equi_join_cogroup`` with
    ``how='left'``): every customer row survives; customers with no
    orders get n_orders = 0 (nullable-int pinning keeps the block
    schema stable across partitions with/without matches)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from xtract.ops.joins import equi_join_cogroup

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    ocnt = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey"])
            .groupby("o_custkey").aggregate(Count(alias_name="n_orders")))
    j = equi_join_cogroup(cust, ocnt, on="c_custkey",
                          right_on="o_custkey", how="left")

    def fill(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.fill_null(t["n_orders"], 0), pa.int64())
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_nationkey": t["c_nationkey"],
                         "n_orders": n})

    return j.map_batches(fill, batch_format="pyarrow")


def _q_events_gap_fill(sf_dir: str):
    """Dense daily series per event type — every day of the corpus
    range present for every type, missing days 0-filled
    (``ops/joins.gap_filled_daily_counts``): one grouped Count is the
    only corpus pass; the grid is built from the bounded aggregate."""
    import ray.data as rd

    from xtract.ops.joins import gap_filled_daily_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    out = gap_filled_daily_counts(ev, "ts", "event_type")
    return out.rename(columns={"k": "event_type"})


def _q_event_value_histogram(sf_dir: str):
    """Fixed-width value histogram (bin = cents // 500, clamped to
    [0, 19]): one vectorized bin map + ONE native grouped Count."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def binned(b: pa.Table) -> pa.Table:
        cents = np.round(
            b["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"bin": pa.array(
            np.clip(cents // 500, 0, 19), pa.int64())})

    return (ev.map_batches(binned, batch_format="pyarrow")
            .groupby("bin").aggregate(Count(alias_name="n_events")))


def _q_orders_cube(sf_dir: str):
    """CUBE(status, priority) counts + exact cent totals: ONE
    corpus-scale grouped aggregate over the base cells, then the four
    grouping sets derive Dataset-side from that bounded table (explode
    ×4 + a second tiny grouped Sum) — no second corpus pass."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    o = rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderstatus", "o_orderpriority",
                                 "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.round(b["o_totalprice"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        return pa.table({"s": b["o_orderstatus"],
                         "p": b["o_orderpriority"],
                         "cents": pa.array(c, pa.int64())})

    base = (o.map_batches(cents, batch_format="pyarrow")
            .groupby(["s", "p"])
            .aggregate(Count(alias_name="n"),
                       Sum("cents", alias_name="sum_cents")))

    def explode_sets(t: pa.Table) -> pa.Table:
        s = t["s"].to_pylist()
        p = t["p"].to_pylist()
        n = t["n"].to_pylist()
        c = t["sum_cents"].to_pylist()
        ss, pp, nn, cc = [], [], [], []
        for si, pi, ni, ci in zip(s, p, n, c):
            for sv, pv in ((si, pi), (si, "ALL"), ("ALL", pi),
                           ("ALL", "ALL")):
                ss.append(sv)
                pp.append(pv)
                nn.append(ni)
                cc.append(ci)
        return pa.table({"status": pa.array(ss, pa.string()),
                         "priority": pa.array(pp, pa.string()),
                         "n": pa.array(nn, pa.int64()),
                         "sum_cents": pa.array(cc, pa.int64())})

    return (base.map_batches(explode_sets, batch_format="pyarrow")
            .groupby(["status", "priority"])
            .aggregate(Sum("n", alias_name="n_orders"),
                       Sum("sum_cents", alias_name="sum_cents")))


def _q_event_value_moments(sf_dir: str):
    """Exact grouped moments for variance/stddev WITHOUT float
    accumulation order: per type emit (n, Σcents, Σcents²) as int64 —
    one vectorized map + ONE grouped Sum triple; callers derive
    var = (n·Σx² − (Σx)²) / n² exactly.  Σcents² fits int64 up to
    ~9·10¹⁸ / max(cents²) rows per group (document the bound)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def to_int(b: pa.Table) -> pa.Table:
        c = np.round(b["value"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "cents": pa.array(c, pa.int64()),
                         "cents_sq": pa.array(c * c, pa.int64())})

    return (ev.map_batches(to_int, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Count(alias_name="n_events"),
                       Sum("cents", alias_name="sum_cents"),
                       Sum("cents_sq", alias_name="sum_cents_sq")))


def _q_embedding_kmeans(sf_dir: str):
    """Full-corpus distributed k-means over the embeddings table
    (``ops/similarity.distributed_kmeans``): integer micro-unit
    quantization (floor(x·2^20)) makes every iteration's partial sums
    exact and commutative — centroids and assignments are bit-identical
    at any parallelism AND fully replayable in SQL: the oracle unrolls
    the Lloyd iterations as CTEs (assignment = argmin of the integer
    score c·c − 2x·c via ``list_inner_product`` — every intermediate
    stays < 2^53, so DuckDB's DOUBLE arithmetic is exact; update =
    per-dim floor mean via parallel UNNEST; empty centroids keep their
    position)."""
    from xtract.ops.similarity import distributed_kmeans

    _, labels = distributed_kmeans(_emb(sf_dir), k=8, iters=3)
    return labels


def _kmeans_sql(k: int = 8, iters: int = 3, unit: int = 1 << 20) -> str:
    """Unrolled integer Lloyd CTEs mirroring `distributed_kmeans`."""
    assign = (
        "a{i} AS (SELECT e.vec_id, c.cidx, row_number() OVER ("
        "PARTITION BY e.vec_id ORDER BY "
        "list_inner_product(c.q, c.q) - 2 * list_inner_product(e.q, c.q), "
        "c.cidx) AS rn FROM e CROSS JOIN c{p} c)")
    update = (
        "s{i} AS (SELECT cidx, dim, CAST(floor(CAST(sum(val) AS "
        "DOUBLE) / count(*)) AS BIGINT) AS v FROM "
        "(SELECT a{i}.cidx, UNNEST(e.q) AS val, "
        "UNNEST(range(len(e.q))) AS dim FROM e JOIN a{i} "
        "ON a{i}.vec_id = e.vec_id AND a{i}.rn = 1) "
        "GROUP BY cidx, dim), "
        "c{i} AS (SELECT c{p}.cidx, coalesce(m.q, c{p}.q) AS q "
        "FROM c{p} LEFT JOIN (SELECT cidx, list(v ORDER BY dim) AS q "
        "FROM s{i} GROUP BY cidx) m ON m.cidx = c{p}.cidx)")
    parts = []
    for i in range(1, iters + 1):
        parts.append(assign.format(i=i, p=i - 1))
        parts.append(update.format(i=i, p=i - 1))
    final = assign.format(i=iters + 1, p=iters)
    return (
        "WITH e AS (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(floor(x * {unit}.0) AS BIGINT)) AS q "
        "FROM embeddings), "
        "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, "
        f"q FROM e ORDER BY vec_id LIMIT {k}), "
        + ", ".join(parts) + ", " + final +
        f" SELECT vec_id, CAST(cidx AS BIGINT) AS cluster "
        f"FROM a{iters + 1} WHERE rn = 1 ORDER BY vec_id")


def _q_regional_revenue(sf_dir: str):
    """TPC-H-Q5-style multi-join rollup: region ⋈ nation ⋈ customer ⋈
    orders → exact cent revenue per region.  Join strategy by size:
    region/nation/customer are dimension tables → ONE composed driver
    lookup (custkey → region name) broadcast via ``ray.put``; orders
    (the fact table) streams through one vectorized map + ONE grouped
    Sum.  No shuffle join anywhere."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    region = rd.read_parquet(f"{sf_dir}/region.parquet",
                             columns=["r_regionkey", "r_name"]).to_pandas()
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_regionkey"]).to_pandas()
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]).to_pandas()
    rname = dict(zip(region["r_regionkey"], region["r_name"]))
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    ck = cust["c_custkey"].to_numpy(np.int64)
    creg = np.asarray([rname[n2r[n]] for n in cust["c_nationkey"]],
                      dtype=object)
    order = np.argsort(ck)
    ref = ray.put((ck[order], creg[order]))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def attach(b: pa.Table) -> pa.Table:
        keys, regs = ray.get(ref)
        c = b["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, c)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = keys[pos_c] == c
        cents = np.round(b["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        return pa.table({
            "region": pa.array(
                np.where(hit, regs[pos_c], "UNKNOWN"), pa.string()),
            "cents": pa.array(cents, pa.int64())})

    return (orders.map_batches(attach, batch_format="pyarrow")
            .groupby("region")
            .aggregate(Count(alias_name="n_orders"),
                       Sum("cents", alias_name="revenue_cents")))


def _q_customer_spend_bucketed(sf_dir: str):
    """Storage-co-located join (``ops/bucketed``): both sides are
    written hash-bucketed by the join key once, then the join runs one
    task per bucket with ZERO exchange — the pay-the-shuffle-once
    pattern for repeated joins at 100 TB.  Result: exact cent spend
    per customer, same oracle as the co-group join family."""
    import shutil
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.bucketed import bucketed_join, write_bucketed

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.round(b["o_totalprice"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        return pa.table({"o_custkey": b["o_custkey"],
                         "cents": pa.array(c, pa.int64())})

    root = tempfile.mkdtemp(prefix="xtract_bucketed_")
    try:
        da, db = f"{root}/cust", f"{root}/orders"
        write_bucketed(cust, da, "c_custkey", 16)
        write_bucketed(orders.map_batches(cents, batch_format="pyarrow"),
                       db, "o_custkey", 16)
        j = bucketed_join(da, db, on="c_custkey", right_on="o_custkey")
        return (j.groupby("c_custkey")
                .aggregate(Count(alias_name="n_orders"),
                           Sum("cents", alias_name="spend_cents"))
                .to_pandas())
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_customer_spend_incremental(sf_dir: str):
    """Per-customer order aggregates via the PERSISTED incremental
    state store (``ops/incremental``): build the state from pre-1999
    orders, then fold the 1999+ delta in — the delta pass re-aggregates
    ONLY the new rows and rewrites ONLY the key-hash buckets they
    touch (combiner → fragment append → per-bucket compaction with a
    consumed-tag log).  The committed state equals a one-shot GROUP BY
    over the full table (the SQL oracle) — the daily-refresh shape at
    100 TB, where merge cost ∝ delta, not corpus."""
    import datetime as dt
    import shutil
    import tempfile

    import ray.data as rd

    from xtract.ops.incremental import (init_agg_state, merge_delta,
                                        read_agg_state)

    split = pa.scalar(dt.datetime(1999, 1, 1), pa.timestamp("us"))

    def prep(want_delta: bool):
        def fn(t: pa.Table) -> pa.Table:
            m = pa.compute.greater_equal(t["o_orderdate"], split)
            if not want_delta:
                m = pa.compute.invert(m)
            t = t.filter(m)
            return pa.table({
                "o_custkey": t["o_custkey"],
                "cents": pa.compute.cast(pa.compute.round(
                    pa.compute.multiply(t["o_totalprice"], 100)),
                    pa.int64())})
        return fn

    def orders():
        return rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice", "o_orderdate"])

    specs = {"n_orders": ("cents", "count"),
             "spend_cents": ("cents", "sum"),
             "min_order_cents": ("cents", "min"),
             "max_order_cents": ("cents", "max")}
    d = tempfile.mkdtemp(prefix="xtract_aggstate_", dir="/tmp")
    try:
        init_agg_state(orders().map_batches(
            prep(False), batch_format="pyarrow"), d, "o_custkey",
            specs, n_buckets=16)
        merge_delta(d, orders().map_batches(
            prep(True), batch_format="pyarrow"))
        out = read_agg_state(d).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    out = out[["o_custkey", "n_orders", "spend_cents",
               "min_order_cents", "max_order_cents"]]
    return out.sort_values("o_custkey").reset_index(drop=True)


def _q_events_range_pruned(sf_dir: str):
    """Range scan through the SORTED zone-map layout
    (``ops/sorted_layout``): events are written time-sorted once
    (per-file min/max envelopes in a manifest), then the
    [Jan 10, Jan 15) scan opens ONLY the envelope-overlapping files —
    storage-level range pruning, the time-series complement of the
    hash-bucket point lookup.  Per-type counts + exact cent sums over
    the pruned scan match the oracle's WHERE-filtered aggregate."""
    import datetime as dt
    import shutil
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.sorted_layout import read_range, write_sorted

    d = tempfile.mkdtemp(prefix="xtract_sorted_", dir="/tmp")
    try:
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["ts", "event_type", "value"])
        write_sorted(ev, d, "ts")
        sel = read_range(d, dt.datetime(2024, 1, 10),
                         dt.datetime(2024, 1, 15))
        cents = sel.map_batches(
            lambda t: pa.table({
                "event_type": t["event_type"],
                "cents": pa.compute.cast(pa.compute.round(
                    pa.compute.multiply(t["value"], 100)), pa.int64()),
            }), batch_format="pyarrow")
        out = (cents.groupby("event_type")
               .aggregate(Count(alias_name="n_events"),
                          Sum("cents", alias_name="value_cents"))
               .to_pandas())
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out.sort_values("event_type").reset_index(drop=True)


def _q_events_time_travel(sf_dir: str):
    """Snapshot isolation / time travel (``ops/versioned``): commit
    the pre-Jan-15 events as v1, APPEND the rest as v2, then read
    **version 1** — the aggregate must see only the old snapshot even
    though the store has since grown (the Delta/Iceberg transaction-
    log contract: readers pin a manifest, commits are atomic renames,
    old files are never touched)."""
    import datetime as dt
    import shutil
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.versioned import commit_version, read_version

    cut = dt.datetime(2024, 1, 15)
    store = tempfile.mkdtemp(prefix="xtract_versions_", dir="/tmp")
    try:
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["ts", "event_type", "value"])
        commit_version(ev.map_batches(
            lambda t: t.filter(pc.less(t["ts"], pa.scalar(
                cut, t["ts"].type))), batch_format="pyarrow"), store)
        commit_version(ev.map_batches(
            lambda t: t.filter(pc.greater_equal(t["ts"], pa.scalar(
                cut, t["ts"].type))), batch_format="pyarrow"), store,
            mode="append")
        old = read_version(store, 1)
        cents = old.map_batches(
            lambda t: pa.table({
                "event_type": t["event_type"],
                "cents": pc.cast(pc.round(pc.multiply(t["value"], 100)),
                                 pa.int64())}),
            batch_format="pyarrow")
        out = (cents.groupby("event_type")
               .aggregate(Count(alias_name="n_events"),
                          Sum("cents", alias_name="value_cents"))
               .to_pandas())
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out.sort_values("event_type").reset_index(drop=True)


def _q_events_stream_exactly_once(sf_dir: str):
    """EXACTLY-ONCE streaming aggregation over an AT-LEAST-ONCE feed
    (``ops/streaming`` with ``dedup_col``): every batch is delivered
    TWICE (the standard redelivery failure mode of a real feed); a
    redelivered copy is excluded exactly once — recognized by the
    per-window seen-set while its window is open, or dropped as late
    once the watermark has closed it — so the finalized totals equal
    the batch groupby over the unique rows, which is what the oracle
    computes.  Original rows are never late (the feed is time-
    ordered); dedup state is freed with each finalized window
    (bounded by the lateness horizon, never the stream)."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.streaming import stream_window_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type",
                                  "value"])
    cents = ev.map_batches(
        lambda t: pa.table({
            "event_id": t["event_id"], "ts": t["ts"],
            "event_type": t["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100)),
                             pa.int64())}),
        batch_format="pyarrow")
    n_rows = cents.count()

    def at_least_once():
        for b in cents.iter_batches(batch_format="pyarrow",
                                    batch_size=2048):
            yield b
            yield b                      # redelivery

    tbl, stats = stream_window_aggregate(
        at_least_once(), ts_col="ts", key_col="event_type",
        val_col="cents", width_s=3600, lateness_s=3 * 86_400,
        n_shards=4, dedup_col="event_id")
    # every redelivered copy excluded exactly once, never an original
    assert stats["n_dup"] > 0
    assert stats["n_dup"] + stats["n_late"] == n_rows
    df = tbl.to_pandas()
    window = (pd.to_datetime(df["window_start_us"], unit="us")
              .dt.strftime("%Y-%m-%d %H:00"))
    out = pd.DataFrame({"window": window, "event_type": df["key"],
                        "n_events": df["n_events"],
                        "value_cents": df["value_sum"].round()
                        .astype("int64")})
    return (out.sort_values(["window", "event_type"])
            .reset_index(drop=True))


def _q_customer_upsert_cdc(sf_dir: str):
    """Row-level CDC between snapshots (``ops/versioned.
    changed_rows``): after the spend-fold upsert (plus five brand-new
    synthetic customer rows), the v1→v2 change feed must name exactly
    the ordering customers as ``update`` and the new keys as
    ``insert`` — and it reads ONLY the buckets the upsert rewrote
    (manifest math prunes the rest)."""
    import shutil
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.joins import equi_join_cogroup
    from xtract.ops.versioned import (changed_rows, commit_bucketed,
                                      commit_upsert)

    store = tempfile.mkdtemp(prefix="xtract_cdc_", dir="/tmp")
    try:
        def base_ds():
            return rd.read_parquet(
                f"{sf_dir}/customer.parquet",
                columns=["c_custkey", "c_acctbal", "c_mktsegment"]
            ).map_batches(
                lambda t: pa.table({
                    "c_custkey": t["c_custkey"],
                    "acctbal_cents": pc.cast(pc.round(pc.multiply(
                        t["c_acctbal"], 100)), pa.int64()),
                    "segment": t["c_mktsegment"]}),
                batch_format="pyarrow")

        commit_bucketed(base_ds(), store, key="c_custkey",
                        n_buckets=16)
        spend = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey", "o_totalprice"])
                 .map_batches(
                     lambda t: pa.table({
                         "o_custkey": t["o_custkey"],
                         "cents": pc.cast(pc.round(pc.multiply(
                             t["o_totalprice"], 100)), pa.int64())}),
                     batch_format="pyarrow")
                 .groupby("o_custkey")
                 .aggregate(Sum("cents", alias_name="spend_cents")))
        updates = equi_join_cogroup(
            spend, base_ds(), on="o_custkey", right_on="c_custkey",
            how="inner", num_partitions=16).map_batches(
            lambda t: pa.table({
                "c_custkey": t["o_custkey"],
                "acctbal_cents": pc.add(t["acctbal_cents"],
                                        t["spend_cents"]),
                "segment": t["segment"]}),
            batch_format="pyarrow")
        fresh = rd.from_arrow(pa.table({
            "c_custkey": pa.array([200000 + i for i in range(5)],
                                  pa.int64()),
            "acctbal_cents": pa.array([0] * 5, pa.int64()),
            "segment": pa.array(["NEW"] * 5, pa.string())}))
        commit_upsert(updates.union(fresh), store)
        out = (changed_rows(store, 1, 2).to_pandas()
               .sort_values("c_custkey").reset_index(drop=True))
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out


def _q_user_sessions_stream(sf_dir: str):
    """Streaming SESSION windows (``ops/streaming.
    stream_session_aggregate``): the time-ordered event feed flows
    through sharded session actors; a user's session closes as soon as
    the shard watermark passes its last event + 30 min, so sessions
    stream out while the feed runs and open state is bounded by LIVE
    sessions.  On the ordered feed the result equals the batch lag/gap
    sessionization — the oracle is the identical SQL the batch
    ``user_sessions`` query is checked against."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.streaming import stream_session_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    tbl, n_dis = stream_session_aggregate(
        ev.iter_batches(batch_format="pyarrow", batch_size=4096),
        ts_col="ts", key_col="user_id", gap_s=1800, lateness_s=0,
        n_shards=4)
    assert n_dis == 0
    df = tbl.to_pandas()
    out = pd.DataFrame({"user_id": df["key"],
                        "session_id": df["session_id"],
                        "n_events": df["n_events"]})
    return (out.sort_values(["user_id", "session_id"])
            .reset_index(drop=True))


def _q_customer_upsert_merge(sf_dir: str):
    """MERGE/upsert commit against a bucketed versioned store
    (``ops/versioned.commit_upsert``): base = customer roster (exact
    cents), updates = each ordering customer's row with spend folded
    into the balance.  Only the buckets the update keys hash into are
    rewritten (untouched files carried by reference — the Delta MERGE
    shape); the latest snapshot must equal the oracle's LEFT JOIN +
    COALESCE arithmetic row-for-row."""
    import shutil
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.joins import equi_join_cogroup
    from xtract.ops.versioned import (commit_bucketed, commit_upsert,
                                      read_version)

    store = tempfile.mkdtemp(prefix="xtract_upsert_", dir="/tmp")
    try:
        def base_ds():
            return rd.read_parquet(
                f"{sf_dir}/customer.parquet",
                columns=["c_custkey", "c_acctbal", "c_mktsegment"]
            ).map_batches(
                lambda t: pa.table({
                    "c_custkey": t["c_custkey"],
                    "acctbal_cents": pc.cast(pc.round(pc.multiply(
                        t["c_acctbal"], 100)), pa.int64()),
                    "segment": t["c_mktsegment"]}),
                batch_format="pyarrow")

        commit_bucketed(base_ds(), store, key="c_custkey",
                        n_buckets=16)
        spend = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey", "o_totalprice"])
                 .map_batches(
                     lambda t: pa.table({
                         "o_custkey": t["o_custkey"],
                         "cents": pc.cast(pc.round(pc.multiply(
                             t["o_totalprice"], 100)), pa.int64())}),
                     batch_format="pyarrow")
                 .groupby("o_custkey")
                 .aggregate(Sum("cents", alias_name="spend_cents")))
        joined = equi_join_cogroup(spend, base_ds(), on="o_custkey",
                                   right_on="c_custkey", how="inner",
                                   num_partitions=16)
        updates = joined.map_batches(
            lambda t: pa.table({
                "c_custkey": t["o_custkey"],
                "acctbal_cents": pc.add(t["acctbal_cents"],
                                        t["spend_cents"]),
                "segment": t["segment"]}),
            batch_format="pyarrow")
        commit_upsert(updates, store)
        out = (read_version(store).to_pandas()
               .sort_values("c_custkey").reset_index(drop=True))
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out


def _q_doc_weighted_sample(sf_dir: str):
    """Deterministic weighted sample without replacement
    (``ops/agg.priority_sample``): bottom-k of ``lcg(doc_id)/weight``
    with weight = text length + 1 — longer documents proportionally
    likelier, bit-reproducible under any partitioning, corpus never
    shuffled (per-block partial top-k, one k·n_blocks sort+limit)."""
    import ray.data as rd

    from xtract.ops.agg import priority_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    wds = docs.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "weight": pc.cast(pc.add(pc.utf8_length(
                pc.fill_null(t["text"], "")), 1), pa.int64())}),
        batch_format="pyarrow")
    out = priority_sample(wds, k=100, id_col="doc_id",
                          weight_col="weight")
    return (out.to_pandas().sort_values("doc_id")
            .reset_index(drop=True))


def _q_events_zorder_box(sf_dir: str):
    """2-D box scan through the Z-ORDER zone-map layout
    (``ops/sorted_layout.write_zorder``): events are Morton-key sorted
    ONCE on (user_id, ts) so per-file envelopes on BOTH columns prune
    a user-range × time-range box — the multi-dimension generalization
    of ``events_range_pruned`` (Delta/Iceberg ZORDER BY shape).  Only
    envelope-intersecting files are opened; an exact vectorized filter
    proves the box; per-type counts + exact cent sums match the
    oracle's WHERE-filtered aggregate."""
    import datetime as dt
    import shutil
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.sorted_layout import read_box, write_zorder

    d = tempfile.mkdtemp(prefix="xtract_zorder_", dir="/tmp")
    try:
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["ts", "user_id", "event_type",
                                      "value"])
        write_zorder(ev, d, "user_id", "ts", rows_per_file=4_096)
        sel = read_box(d, 30, 90, dt.datetime(2024, 1, 8),
                       dt.datetime(2024, 1, 20))
        cents = sel.map_batches(
            lambda t: pa.table({
                "event_type": t["event_type"],
                "cents": pc.cast(pc.round(pc.multiply(t["value"], 100)),
                                 pa.int64())}),
            batch_format="pyarrow")
        out = (cents.groupby("event_type")
               .aggregate(Count(alias_name="n_events"),
                          Sum("cents", alias_name="value_cents"))
               .to_pandas())
    finally:
        shutil.rmtree(d, ignore_errors=True)
    if len(out) == 0:       # empty box (tiny sf): keep the schema
        import pandas as pd
        out = pd.DataFrame({"event_type": pd.Series(dtype=object),
                            "n_events": pd.Series(dtype="int64"),
                            "value_cents": pd.Series(dtype="int64")})
    return out.sort_values("event_type").reset_index(drop=True)


def _q_events_stream_window(sf_dir: str):
    """Streaming watermark window (``ops/streaming``): the event feed
    is consumed as an ORDERED stream of Arrow batches through sharded
    window actors with per-shard watermarks and bounded open-window
    state — the custom-operator carve-out for unbounded-stream
    semantics the batch engine can't express.  With the lateness
    allowance covering the feed's disorder the finalized windows equal
    the batch hourly groupby EXACTLY (integer cents), which is what
    the oracle checks; the drop-too-late half of the contract is
    pytest-covered (``tests/test_streaming.py``)."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.streaming import stream_window_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    cents = ev.map_batches(
        lambda t: pa.table({
            "ts": t["ts"], "event_type": t["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100)),
                             pa.int64())}),
        batch_format="pyarrow")
    tbl, stats = stream_window_aggregate(
        cents.iter_batches(batch_format="pyarrow", batch_size=4096),
        ts_col="ts", key_col="event_type", val_col="cents",
        width_s=3600, lateness_s=10 ** 9, n_shards=4)
    assert stats["n_late"] == 0
    df = tbl.to_pandas()
    window = (pd.to_datetime(df["window_start_us"], unit="us")
              .dt.strftime("%Y-%m-%d %H:00"))
    out = pd.DataFrame({"window": window, "event_type": df["key"],
                        "n_events": df["n_events"],
                        "value_cents": df["value_sum"].round()
                        .astype("int64")})
    return (out.sort_values(["window", "event_type"])
            .reset_index(drop=True))


def _q_user_customer_outer(sf_dir: str):
    """FULL OUTER co-group join (``ops/joins.equi_join_cogroup`` with
    ``how="outer"``): per-user event counts against the high-balance
    customer roster — unmatched rows survive on BOTH sides (event
    users below the balance bar, customers with no events), keys
    coalesce natively (int64-exact, no float round-trip), and
    null-padded int columns stay nullable ints."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from xtract.ops.joins import equi_join_cogroup

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    ev_agg = ev.groupby("user_id").aggregate(Count(alias_name="n_events"))
    cust = (rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(pc.greater(t["c_acctbal"], 5000))
            .select(["c_custkey", "c_mktsegment"]),
            batch_format="pyarrow"))
    j = equi_join_cogroup(ev_agg, cust, on="user_id",
                          right_on="c_custkey", how="outer",
                          num_partitions=16)

    def finish(t: pa.Table) -> pa.Table:
        ne, seg = t["n_events"], t["c_mktsegment"]
        status = pc.if_else(
            pc.is_null(ne), pa.scalar("customer_only"),
            pc.if_else(pc.is_null(seg), pa.scalar("event_only"),
                       pa.scalar("both")))
        return pa.table({"user_id": t["user_id"], "n_events": ne,
                         "segment": seg, "status": status})

    return (j.map_batches(finish, batch_format="pyarrow").to_pandas()
            .sort_values("user_id").reset_index(drop=True))


def _q_host_crawl_budget(sf_dir: str):
    """Proportional crawl-budget apportionment (Hamilton / largest-
    remainder, the exact integer allocation rule): each host gets
    ``floor(B·n/N)`` pages of a B=10,000 budget, and the leftover
    seats go to the largest remainders (ties → smaller host id).  One
    grouped Count is the corpus pass; the allocation math runs on the
    host-bounded table.  Σbudget == B exactly."""
    import pandas as pd
    from ray.data.aggregate import Count

    B = 10_000

    def hosts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"host": pa.array(ids % 41, pa.int64())})

    agg = (_docs(sf_dir, ["doc_id"])
           .map_batches(hosts, batch_format="pyarrow")
           .groupby("host").aggregate(Count(alias_name="n_docs"))
           .to_pandas())  # host-bounded
    n = agg["n_docs"].to_numpy(np.int64)
    h = agg["host"].to_numpy(np.int64)
    total = int(n.sum())
    base = (B * n) // total
    rem = B * n - base * total           # remainder numerators
    seats_left = B - int(base.sum())
    order = np.lexsort((h, -rem))        # largest remainder, then host
    extra = np.zeros(len(h), np.int64)
    extra[order[:seats_left]] = 1
    out = pd.DataFrame({"host": h, "n_docs": n,
                        "budget": base + extra})
    return out.sort_values("host").reset_index(drop=True)


def _q_doc_prefix_dedup(sf_dir: str):
    """Truncation-duplicate detection: docs sharing an identical
    64-char prefix collapse to the min doc_id (block combiner →
    ONE native grouped Min — the exact-dedup shape on a prefix key)."""
    from ray.data.aggregate import Count, Min

    def key(t: pa.Table) -> pa.Table:
        import hashlib

        ks = [hashlib.md5(((x or "")[:64]).encode("utf-8")).hexdigest()
              for x in t["text"].to_pylist()]
        return pa.table({"pkey": pa.array(ks, pa.string()),
                         "doc_id": t["doc_id"]})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(key, batch_format="pyarrow")
            .groupby("pkey")
            .aggregate(Min("doc_id", alias_name="keep_doc"),
                       Count(alias_name="n_docs")))


def _q_event_transitions(sf_dir: str):
    """Per-user event-type Markov transitions: co-group by user (the
    session-window kernel shape), per-partition vectorized lag pairs,
    ONE grouped Count over (from, to)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from xtract.ops.agg import _hash_part

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_part", pa.array(
            _hash_part(b["user_id"], 32), pa.int64()))

    def pairs(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(g["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        same = u[1:] == u[:-1]
        return pa.table({
            "from_type": pa.array(et[:-1][same], pa.string()),
            "to_type": pa.array(et[1:][same], pa.string())})

    return (ev.map_batches(tag, batch_format="pyarrow")
            .groupby("_part").map_groups(pairs, batch_format="pyarrow")
            .groupby(["from_type", "to_type"])
            .aggregate(Count(alias_name="n_transitions")))


def _q_event_type_approx_users(sf_dir: str):
    """Grouped HLL (``ops/sketch.grouped_approx_distinct``) asserted
    against its exact twin IN the query (round 4, previously
    rows-only): emits per event type the EXACT distinct-user count
    (SQL-checked) plus ``approx_ok`` = |HLL − exact| ≤ 2% · exact —
    the oracle asserts TRUE, so an HLL estimate drifting outside the
    envelope (measured ≈1.3% worst-case at p=12 on this corpus;
    2σ ≈ 3.2%) breaks the hash match.  Both sides join driver-side
    over the ≤5 event-type rows (bounded).  Determinism and
    partition-independence are pytest-covered."""
    import ray.data as rd

    from xtract.ops.agg import count_distinct_per_key
    from xtract.ops.sketch import grouped_approx_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def s(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"],
                         "user": pc.cast(b["user_id"], pa.string())})

    est = grouped_approx_distinct(
        ev.map_batches(s, batch_format="pyarrow"), "event_type", "user",
        p=12).to_pandas()
    exact = count_distinct_per_key(ev, "event_type",
                                   "user_id").to_pandas()
    m = exact.merge(est, on="event_type")
    # integer-exact 2% envelope: |est − exact|·50 ≤ exact
    ok = (50 * (m["approx_distinct"] - m["n_distinct"]).abs()
          <= m["n_distinct"])
    return pa.table({
        "event_type": pa.array(m["event_type"], pa.string()),
        "n_users": pa.array(m["n_distinct"].astype("int64"), pa.int64()),
        "approx_ok": pa.array(ok.to_numpy(), pa.bool_())})


def _q_user_value_ffill(sf_dir: str):
    """Per-key forward-fill imputation (gap repair in event streams):
    'error' events lose their value and inherit the user's last good
    one — coarse co-group by user, ONE vectorized pandas groupby-ffill
    per partition, exact cents; users with no prior value get -1."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.agg import _hash_part

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type", "value"])

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_part", pa.array(
            _hash_part(b["user_id"], 32), pa.int64()))

    def ffill(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        cents = (df["value"] * 100).round().astype("int64")
        cents = cents.mask(df["event_type"] == "error")
        filled = (cents.groupby(df["user_id"]).ffill()
                  .fillna(-1).astype("int64"))
        return pa.table({
            "user_id": pa.array(df["user_id"].to_numpy(), pa.int64()),
            "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
            "filled_cents": pa.array(filled.to_numpy(), pa.int64())})

    return (ev.map_batches(tag, batch_format="pyarrow")
            .groupby("_part").map_groups(ffill, batch_format="pyarrow"))


def _q_orders_monthly_share(sf_dir: str):
    """Month × priority order share as an exact integer fraction
    (share_num / share_den): ONE grouped Count over the composite key,
    month totals derived Dataset-side from the bounded aggregate (the
    orders_cube grouping-set pattern) — no second corpus pass."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    o = rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_orderpriority"])

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.strftime(b["o_orderdate"], format="%Y-%m"),
            "priority": b["o_orderpriority"]})

    base = (o.map_batches(keyed, batch_format="pyarrow")
            .groupby(["month", "priority"])
            .aggregate(Count(alias_name="n_orders")))

    def widen(t: pa.Table) -> pa.Table:
        return pa.table({"month": t["month"],
                         "n": t["n_orders"]})

    totals = (base.map_batches(widen, batch_format="pyarrow")
              .groupby("month").aggregate(Sum("n", alias_name="den")))

    # both sides are (months × priorities)-bounded → driver join
    bt = base.to_pandas()
    tt = totals.to_pandas()
    out = bt.merge(tt, on="month")
    out = out.rename(columns={"n_orders": "share_num"})
    out["share_den"] = out.pop("den").astype("int64")
    out["share_num"] = out["share_num"].astype("int64")
    return out[["month", "priority", "share_num", "share_den"]]


def _q_part_copurchase(sf_dir: str):
    """Market-basket co-occurrence: top-20 part pairs appearing in the
    same order.  Scale shape: slim (orderkey, partkey) projection →
    coarse orderkey co-group (all rows of an order land in one of 64
    partitions) → per-partition vectorized pandas self-merge emits
    p1<p2 pairs with LOCAL counts (orders are bounded-size, so the
    blowup per order is bounded) → native Sum over the pair key →
    per-block partial top-k → tiny final sort.  Deterministic
    tie-break (n_orders desc, p1, p2) keeps the limit boundary stable
    under any partitioning."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.agg import _hash_part

    K = 20
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_part", pa.array(
            _hash_part(b["l_orderkey"], 64), pa.int64()))

    def pairs(g: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o": g["l_orderkey"].to_numpy(zero_copy_only=False),
            "p": g["l_partkey"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()  # count orders, not line items
        m = df.merge(df, on="o")
        m = m[m["p_x"] < m["p_y"]]
        cnt = (m.groupby(["p_x", "p_y"], sort=False).size()
               .reset_index(name="n"))
        return pa.table({"p1": pa.array(cnt["p_x"], pa.int64()),
                         "p2": pa.array(cnt["p_y"], pa.int64()),
                         "n": pa.array(cnt["n"], pa.int64())})

    agg = (li.map_batches(tag, batch_format="pyarrow")
           .groupby("_part").map_groups(pairs, batch_format="pyarrow")
           .groupby(["p1", "p2"]).aggregate(Sum("n", alias_name="n_orders")))

    def topk(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[
            ("n_orders", "descending"), ("p1", "ascending"),
            ("p2", "ascending")])
        return t.take(order[:K])

    head = agg.map_batches(topk, batch_format="pyarrow").to_pandas()
    head = head.sort_values(["n_orders", "p1", "p2"],
                            ascending=[False, True, True]).head(K)
    return head.reset_index(drop=True)


def _q_shipping_priority(sf_dir: str):
    """TPC-H Q3-style shipping priority: top-10 unshipped orders for
    one market segment by exact revenue (micro-units: cents ×
    basis-point discount → int64, no float drift).  Scale shape: the
    one-segment customer key set is broadcast (exact-count-gated
    small side), lineitem revenue pre-aggregates per orderkey inside
    every block (combiner), and ONE orderkey co-group joins order
    attributes to the partial sums — a single all-to-all for a
    three-table join.  Deterministic top-10 tie-break
    (revenue desc, o_orderkey)."""
    import pandas as pd
    import ray
    import ray.data as rd

    from xtract.ops.agg import _hash_part

    SEG, CUT, K, P = "BUILDING", "1998-01-01", 10, 64
    cut = np.datetime64(CUT, "us")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    keys = cust.map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], SEG))
        .select(["c_custkey"]), batch_format="pyarrow")
    # one-segment key set: bounded vs the fact tables; gate then
    # broadcast (the exact-count idiom — fail loudly, never OOM)
    kt = keys.limit(50_000_001).to_pandas()
    assert len(kt) <= 50_000_000, "segment key set too large to broadcast"
    keys_ref = ray.put(pa.array(np.sort(kt["c_custkey"].to_numpy()),
                                pa.int64()))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])

    def o_slim(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.less(b["o_orderdate"], pa.scalar(cut)),
                    pc.is_in(b["o_custkey"], value_set=ray.get(keys_ref)))
        t = b.filter(m)
        n = len(t)
        return pa.table({
            "_part": pa.array(_hash_part(t["o_orderkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "okey": t["o_orderkey"],
            "odate": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
            "oprio": t["o_orderpriority"],
            "micro": pa.nulls(n, pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def l_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["l_shipdate"], pa.scalar(cut)))
        cents = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        bp = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(10_000.0))), pa.int64())
        micro = pc.multiply(cents, pc.subtract(
            pa.scalar(10_000, pa.int64()), bp))
        df = pd.DataFrame({
            "okey": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "micro": micro.to_numpy(zero_copy_only=False)})
        g = df.groupby("okey", sort=False)["micro"].sum().reset_index()
        n = len(g)
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(g["okey"]), P), pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)),
            "okey": pa.array(g["okey"], pa.int64()),
            "odate": pa.nulls(n, pa.string()),
            "oprio": pa.nulls(n, pa.string()),
            "micro": pa.array(g["micro"], pa.int64())})

    both = (orders.map_batches(o_slim, batch_format="pyarrow")
            .union(li.map_batches(l_partial, batch_format="pyarrow")))

    def join(t: pa.Table) -> pa.Table:
        # each side built from its own null-free columns: no upcast
        ot = t.filter(pc.equal(t["_flag"], 0))
        lt = t.filter(pc.equal(t["_flag"], 1))
        O = pd.DataFrame({"okey": ot["okey"].to_pandas(),
                          "odate": ot["odate"].to_pandas(),
                          "oprio": ot["oprio"].to_pandas()})
        L = (pd.DataFrame({"okey": lt["okey"].to_pandas(),
                           "micro": lt["micro"].to_pandas()})
             .groupby("okey", sort=False)["micro"].sum().reset_index())
        m = O.merge(L, on="okey")
        m = m.sort_values(["micro", "okey"],
                          ascending=[False, True]).head(K)
        return pa.table({
            "o_orderkey": pa.array(m["okey"], pa.int64()),
            "revenue_micro": pa.array(m["micro"], pa.int64()),
            "o_orderdate": pa.array(m["odate"], pa.string()),
            "o_orderpriority": pa.array(m["oprio"], pa.string())})

    head = (both.groupby("_part").map_groups(join, batch_format="pyarrow")
            .to_pandas())
    head = head.sort_values(["revenue_micro", "o_orderkey"],
                            ascending=[False, True]).head(K)
    return head.reset_index(drop=True)


def _q_small_quantity_revenue(sf_dir: str):
    """TPC-H Q17-style small-quantity revenue for one brand, computed
    without a broadcast of per-part averages: the one-brand part-key
    set is broadcast (exact-count-gated small side), then a SINGLE
    partkey co-group sees every lineitem of a part together and does
    both passes locally — per-part sum/count of quantity, then the
    strict ``5*qty*cnt < sum_qty`` integer cross-multiplied filter (no
    float average, no drift).  Each partition emits one partial-sum
    row; the driver folds <=P rows."""
    import pandas as pd
    import ray
    import ray.data as rd

    from xtract.ops.agg import _hash_part

    BRAND, P = "Brand#13", 64

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    keys = part.map_batches(
        lambda b: b.filter(pc.equal(b["p_brand"], BRAND))
        .select(["p_partkey"]), batch_format="pyarrow")
    kt = keys.limit(50_000_001).to_pandas()
    assert len(kt) <= 50_000_000, "brand part set too large to broadcast"
    keys_ref = ray.put(pa.array(np.sort(kt["p_partkey"].to_numpy()),
                                pa.int64()))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])

    def slim(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["l_partkey"],
                              value_set=ray.get(keys_ref)))
        return pa.table({
            "_part": pa.array(_hash_part(t["l_partkey"], P), pa.int64()),
            "pk": t["l_partkey"],
            "q": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                t["l_extendedprice"], pa.scalar(100.0))), pa.int64())})

    def small(g: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "pk": g["pk"].to_numpy(zero_copy_only=False),
            "q": g["q"].to_numpy(zero_copy_only=False),
            "cents": g["cents"].to_numpy(zero_copy_only=False)})
        a = df.groupby("pk", sort=False)["q"].agg(["sum", "count"])
        m = df.join(a, on="pk")
        keep = 5 * m["q"] * m["count"] < m["sum"]
        return pa.table({
            "revenue_cents": pa.array(
                [int(m.loc[keep, "cents"].sum())], pa.int64()),
            "n_small": pa.array([int(keep.sum())], pa.int64())})

    parts = (li.map_batches(slim, batch_format="pyarrow")
             .groupby("_part").map_groups(small, batch_format="pyarrow")
             .to_pandas())  # <= P single-row partials
    return pd.DataFrame({
        "revenue_cents": [int(parts["revenue_cents"].sum())],
        "n_small": [int(parts["n_small"].sum())]})


def _q_high_balance_inactive(sf_dir: str):
    """TPC-H Q22-style: per-nation count/total of positive-balance
    customers above the GLOBAL average positive balance with no orders
    since a cutoff (gone-quiet high-value accounts).  The global
    average is one native Sum+Count aggregate broadcast as two ints
    (compared by integer cross-multiplication, never divided); the
    customer-vs-recent-orders anti join is a custkey co-group (both
    sides large at crawl scale — no broadcast), with orders filtered
    at the read and pre-deduped to one slim key row per block
    (combiner).  Each partition emits bounded per-nation partials;
    ONE native grouped Sum folds them."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.agg import _hash_part

    CUT, P = "2000-01-01", 64
    cut = np.datetime64(CUT, "us")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])

    def pos_cents(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["c_acctbal"], pa.scalar(0.0)))
        return pa.table({"cents": pc.cast(pc.round(pc.multiply(
            t["c_acctbal"], pa.scalar(100.0))), pa.int64())})

    g = (cust.map_batches(pos_cents, batch_format="pyarrow")
         .aggregate(Sum("cents", alias_name="s"),
                    Count(alias_name="n")))
    tot_s, tot_n = int(g["s"]), int(g["n"])

    def c_slim(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            b["c_acctbal"], pa.scalar(100.0))), pa.int64())
        # cents > 0 and cents * n > s  (acctbal strictly above the
        # global positive average, exact integers)
        m = pc.and_(pc.greater(cents, pa.scalar(0, pa.int64())),
                    pc.greater(pc.multiply(cents, pa.scalar(
                        tot_n, pa.int64())), pa.scalar(tot_s, pa.int64())))
        t = b.filter(m)
        c = cents.filter(m)
        n = len(t)
        return pa.table({
            "_part": pa.array(_hash_part(t["c_custkey"], P), pa.int64()),
            "ck": t["c_custkey"],
            "_flag": pa.array(np.zeros(n, np.int8)),
            "nk": pc.cast(t["c_nationkey"], pa.int64()),
            "cents": c})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def o_slim(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["o_orderdate"], pa.scalar(cut)))
        ck = pc.unique(t["o_custkey"])  # block-local combiner
        n = len(ck)
        return pa.table({
            "_part": pa.array(_hash_part(ck, P), pa.int64()),
            "ck": ck,
            "_flag": pa.array(np.ones(n, np.int8)),
            "nk": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64())})

    def anti(t: pa.Table) -> pa.Table:
        active = pc.unique(t.filter(pc.equal(t["_flag"], 1))["ck"])
        c = t.filter(pc.equal(t["_flag"], 0))
        c = c.filter(pc.invert(pc.is_in(c["ck"], value_set=active)))
        df = pd.DataFrame({
            "nk": c["nk"].to_numpy(zero_copy_only=False),
            "cents": c["cents"].to_numpy(zero_copy_only=False)})
        p = df.groupby("nk", sort=False)["cents"].agg(["count", "sum"])
        p = p.reset_index()
        return pa.table({
            "nationkey": pa.array(p["nk"], pa.int64()),
            "n_customers": pa.array(p["count"], pa.int64()),
            "acctbal_cents": pa.array(p["sum"], pa.int64())})

    both = (cust.map_batches(c_slim, batch_format="pyarrow")
            .union(orders.map_batches(o_slim, batch_format="pyarrow")))
    out = (both.groupby("_part").map_groups(anti, batch_format="pyarrow")
           .groupby("nationkey")
           .aggregate(Sum("n_customers", alias_name="n_customers"),
                      Sum("acctbal_cents", alias_name="acctbal_cents"))
           .to_pandas())  # <= nations rows
    cols = ["nationkey", "n_customers", "acctbal_cents"]
    if "nationkey" not in out.columns:  # all partitions empty
        out = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    out = out.sort_values("nationkey").reset_index(drop=True)
    for c in ("nationkey", "n_customers", "acctbal_cents"):
        out[c] = out[c].astype("int64")
    return out[["nationkey", "n_customers", "acctbal_cents"]]


def _q_part_revenue_share(sf_dir: str):
    """TPC-H Q11-style group-vs-global share: parts whose discounted
    revenue exceeds 1/2500 of TOTAL revenue.  Per-part revenue is one
    combiner-backed native grouped Sum (block-local partial groupby
    first, so the exchange carries <=parts rows per block); the global
    total is derived from that bounded aggregate — the corpus is read
    ONCE.  Exact integer micro-units; the share test is a cross
    multiplication (2500*rev > total), never a float division."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    T = 2500
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            b["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        bp = pc.cast(pc.round(pc.multiply(
            b["l_discount"], pa.scalar(10_000.0))), pa.int64())
        micro = pc.multiply(cents, pc.subtract(
            pa.scalar(10_000, pa.int64()), bp))
        df = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(zero_copy_only=False),
            "micro": micro.to_numpy(zero_copy_only=False)})
        g = df.groupby("pk", sort=False)["micro"].sum().reset_index()
        return pa.table({"l_partkey": pa.array(g["pk"], pa.int64()),
                         "micro": pa.array(g["micro"], pa.int64())})

    rev = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("l_partkey")
           .aggregate(Sum("micro", alias_name="revenue_micro")))
    df = rev.to_pandas()  # parts-bounded aggregate
    total = int(df["revenue_micro"].sum())
    keep = df[df["revenue_micro"].map(int).map(
        lambda r: T * r > total)]
    keep = keep.sort_values(["revenue_micro", "l_partkey"],
                            ascending=[False, True]).reset_index(drop=True)
    keep["l_partkey"] = keep["l_partkey"].astype("int64")
    keep["revenue_micro"] = keep["revenue_micro"].astype("int64")
    return keep[["l_partkey", "revenue_micro"]]


def _q_promo_revenue_share(sf_dir: str):
    """TPC-H Q14-style promo revenue share over one ship-year as an
    exact integer fraction (promo_micro / total_micro).  Both join
    sides are large at scale, so part flags meet lineitem partial sums
    in ONE partkey co-group (flag-union, the shipping_priority shape);
    lineitems pre-aggregate per partkey inside every block so the
    all-to-all carries <=parts rows per block.  Each partition emits a
    single two-int partial; the driver folds <=P rows."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.agg import _hash_part

    LO, HI, P = "1997-01-01", "1998-01-01", 64
    lo, hi = np.datetime64(LO, "us"), np.datetime64(HI, "us")

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])

    def p_slim(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "_part": pa.array(_hash_part(b["p_partkey"], P), pa.int64()),
            "pk": b["p_partkey"],
            "_flag": pa.array(np.zeros(n, np.int8)),
            "promo": pc.cast(pc.equal(b["p_type"], "PROMO"), pa.int64()),
            "micro": pa.nulls(n, pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def l_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
            pc.less(b["l_shipdate"], pa.scalar(hi))))
        cents = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        bp = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(10_000.0))), pa.int64())
        micro = pc.multiply(cents, pc.subtract(
            pa.scalar(10_000, pa.int64()), bp))
        df = pd.DataFrame({
            "pk": t["l_partkey"].to_numpy(zero_copy_only=False),
            "micro": micro.to_numpy(zero_copy_only=False)})
        g = df.groupby("pk", sort=False)["micro"].sum().reset_index()
        n = len(g)
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(g["pk"]), P), pa.int64()),
            "pk": pa.array(g["pk"], pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)),
            "promo": pa.nulls(n, pa.int64()),
            "micro": pa.array(g["micro"], pa.int64())})

    def join(t: pa.Table) -> pa.Table:
        pt = t.filter(pc.equal(t["_flag"], 0))
        lt = t.filter(pc.equal(t["_flag"], 1))
        PD = pd.DataFrame({"pk": pt["pk"].to_pandas(),
                           "promo": pt["promo"].to_pandas()})
        L = (pd.DataFrame({"pk": lt["pk"].to_pandas(),
                           "micro": lt["micro"].to_pandas()})
             .groupby("pk", sort=False)["micro"].sum().reset_index())
        m = L.merge(PD, on="pk")
        return pa.table({
            "promo_micro": pa.array(
                [int((m["micro"] * m["promo"]).sum())], pa.int64()),
            "total_micro": pa.array([int(m["micro"].sum())], pa.int64())})

    both = (part.map_batches(p_slim, batch_format="pyarrow")
            .union(li.map_batches(l_partial, batch_format="pyarrow")))
    parts = (both.groupby("_part").map_groups(join, batch_format="pyarrow")
             .to_pandas())  # <= P single-row partials
    return pd.DataFrame({
        "promo_micro": [int(parts["promo_micro"].sum())],
        "total_micro": [int(parts["total_micro"].sum())]})


def _q_top_volume_customers(sf_dir: str):
    """TPC-H Q18-style large-volume customers: orders whose total
    quantity is >= a threshold, with customer attribution.  Scale
    shape: per-order quantity pre-aggregates inside every lineitem
    block (combiner) so ONE native grouped Sum is the only all-to-all;
    the threshold filter runs Dataset-side on the bounded aggregate and
    only the tiny survivor set is exact-count-gated and broadcast —
    orders and customer are then each read in one `is_in`-pruned pass
    and the final merge joins driver-side frames of survivor size."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    T = 280

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def l_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "q": pc.cast(pc.round(b["l_quantity"]),
                         pa.int64()).to_numpy(zero_copy_only=False)})
        g = df.groupby("ok", sort=False)["q"].sum().reset_index()
        return pa.table({"ok": pa.array(g["ok"], pa.int64()),
                         "q": pa.array(g["q"], pa.int64())})

    per_order = (li.map_batches(l_partial, batch_format="pyarrow")
                 .groupby("ok").aggregate(Sum("q", alias_name="sum_qty")))
    big = per_order.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b["sum_qty"], pa.scalar(T, pa.int64()))),
        batch_format="pyarrow")
    bt = big.limit(1_000_001).to_pandas()
    assert len(bt) <= 1_000_000, "survivor set too large to broadcast"
    ok_set = pa.array(np.sort(bt["ok"].to_numpy()), pa.int64())

    ot = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey",
                                   "o_totalprice", "o_orderdate"])
          .map_batches(lambda b: b.filter(
              pc.is_in(b["o_orderkey"], value_set=ok_set)),
              batch_format="pyarrow").to_pandas())
    ck_set = pa.array(np.sort(pd.unique(ot["o_custkey"])), pa.int64())
    ct = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_name"])
          .map_batches(lambda b: b.filter(
              pc.is_in(b["c_custkey"], value_set=ck_set)),
              batch_format="pyarrow").to_pandas())

    m = (ot.merge(bt, left_on="o_orderkey", right_on="ok")
         .merge(ct, left_on="o_custkey", right_on="c_custkey"))
    out = pd.DataFrame({
        "c_name": m["c_name"].astype(str),
        "c_custkey": m["c_custkey"].astype("int64"),
        "o_orderkey": m["o_orderkey"].astype("int64"),
        "o_orderdate": m["o_orderdate"].dt.strftime("%Y-%m-%d"),
        "totalprice_cents": (m["o_totalprice"] * 100).round()
        .astype("int64"),
        "sum_qty": m["sum_qty"].astype("int64")})
    return (out.sort_values(["totalprice_cents", "o_orderkey"],
                            ascending=[False, True])
            .reset_index(drop=True))


def _q_top_supplier_revenue(sf_dir: str):
    """TPC-H Q15-style top supplier: the supplier(s) with maximum
    discounted revenue over one ship quarter.  Per-supplier revenue
    pre-aggregates inside every block (combiner) → ONE native grouped
    Sum (supplier-bounded); the global max is a second native Max over
    that aggregate, the argmax filter runs Dataset-side, and only the
    (usually single-row) winner set is pulled, with supplier names
    attached by one `is_in`-pruned pass.  Exact integer micro-units
    throughout — ties are all returned, sorted by s_suppkey."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    LO, HI = np.datetime64("1997-01-01", "us"), np.datetime64(
        "1997-04-01", "us")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(LO)),
            pc.less(b["l_shipdate"], pa.scalar(HI))))
        cents = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        bp = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(10_000.0))), pa.int64())
        micro = pc.multiply(cents, pc.subtract(
            pa.scalar(10_000, pa.int64()), bp))
        df = pd.DataFrame({
            "sk": t["l_suppkey"].to_numpy(zero_copy_only=False),
            "micro": micro.to_numpy(zero_copy_only=False)})
        g = df.groupby("sk", sort=False)["micro"].sum().reset_index()
        return pa.table({"sk": pa.array(g["sk"], pa.int64()),
                         "micro": pa.array(g["micro"], pa.int64())})

    rev = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("sk").aggregate(Sum("micro",
                                        alias_name="total_revenue_micro")))
    best = int(rev.aggregate(Max("total_revenue_micro",
                                 alias_name="m"))["m"])
    win = (rev.map_batches(lambda b: b.filter(pc.equal(
        b["total_revenue_micro"], pa.scalar(best, pa.int64()))),
        batch_format="pyarrow").to_pandas())
    sk_set = pa.array(np.sort(win["sk"].to_numpy()), pa.int64())
    st = (rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
          .map_batches(lambda b: b.filter(
              pc.is_in(b["s_suppkey"], value_set=sk_set)),
              batch_format="pyarrow").to_pandas())
    m = st.merge(win, left_on="s_suppkey", right_on="sk")
    out = pd.DataFrame({
        "s_suppkey": m["s_suppkey"].astype("int64"),
        "s_name": m["s_name"].astype(str),
        "total_revenue_micro": m["total_revenue_micro"].astype("int64")})
    return out.sort_values("s_suppkey").reset_index(drop=True)


def _q_returned_item_revenue(sf_dir: str):
    """TPC-H Q10-style returned-item reporting: top-20 customers by
    revenue lost to returned ('R') lineitems of one order quarter.
    Scale shape: returned-lineitem revenue pre-aggregates per orderkey
    inside every block (combiner); ONE orderkey co-group attaches the
    order's custkey; a native grouped Sum folds to a customer-bounded
    aggregate; per-block partial top-k + global sort-limit pick the
    head without a full sort reaching the driver; customer attributes
    join by an `is_in`-pruned pass over 20 keys."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.agg import _hash_part

    LO, HI = np.datetime64("1997-07-01", "us"), np.datetime64(
        "1997-10-01", "us")
    K, P = 20, 64

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def o_slim(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.greater_equal(b["o_orderdate"], pa.scalar(LO)),
            pc.less(b["o_orderdate"], pa.scalar(HI))))
        n = len(t)
        return pa.table({
            "_part": pa.array(_hash_part(t["o_orderkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "ok": t["o_orderkey"],
            "ck": t["o_custkey"],
            "micro": pa.nulls(n, pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"])

    def l_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], "R"))
        cents = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        bp = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(10_000.0))), pa.int64())
        micro = pc.multiply(cents, pc.subtract(
            pa.scalar(10_000, pa.int64()), bp))
        df = pd.DataFrame({
            "ok": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "micro": micro.to_numpy(zero_copy_only=False)})
        g = df.groupby("ok", sort=False)["micro"].sum().reset_index()
        n = len(g)
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(g["ok"]), P), pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)),
            "ok": pa.array(g["ok"], pa.int64()),
            "ck": pa.nulls(n, pa.int64()),
            "micro": pa.array(g["micro"], pa.int64())})

    both = (orders.map_batches(o_slim, batch_format="pyarrow")
            .union(li.map_batches(l_partial, batch_format="pyarrow")))

    def join(t: pa.Table) -> pa.Table:
        ot = t.filter(pc.equal(t["_flag"], 0))
        lt = t.filter(pc.equal(t["_flag"], 1))
        O = pd.DataFrame({"ok": ot["ok"].to_pandas(),
                          "ck": ot["ck"].to_pandas()})
        L = (pd.DataFrame({"ok": lt["ok"].to_pandas(),
                           "micro": lt["micro"].to_pandas()})
             .groupby("ok", sort=False)["micro"].sum().reset_index())
        m = O.merge(L, on="ok")
        g = m.groupby("ck", sort=False)["micro"].sum().reset_index()
        return pa.table({"ck": pa.array(g["ck"], pa.int64()),
                         "micro": pa.array(g["micro"], pa.int64())})

    rev = (both.groupby("_part").map_groups(join, batch_format="pyarrow")
           .groupby("ck").aggregate(Sum("micro",
                                        alias_name="revenue_micro")))

    def topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[
            ("revenue_micro", "descending"), ("ck", "ascending")])
        return b.take(idx[:K])

    head = (rev.map_batches(topk, batch_format="pyarrow")
            .sort(["revenue_micro", "ck"], descending=[True, False])
            .limit(K).to_pandas())
    ck_set = pa.array(np.sort(head["ck"].to_numpy()), pa.int64())
    ct = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_name", "c_acctbal",
                                   "c_nationkey"])
          .map_batches(lambda b: b.filter(
              pc.is_in(b["c_custkey"], value_set=ck_set)),
              batch_format="pyarrow").to_pandas())
    m = head.merge(ct, left_on="ck", right_on="c_custkey")
    out = pd.DataFrame({
        "c_custkey": m["c_custkey"].astype("int64"),
        "c_name": m["c_name"].astype(str),
        "c_nationkey": m["c_nationkey"].astype("int64"),
        "acctbal_cents": (m["c_acctbal"] * 100).round().astype("int64"),
        "revenue_micro": m["revenue_micro"].astype("int64")})
    return (out.sort_values(["revenue_micro", "c_custkey"],
                            ascending=[False, True])
            .reset_index(drop=True))


def _q_priority_return_check(sf_dir: str):
    """TPC-H Q4-style priority check (adapted to this schema's
    columns): per order priority, how many orders of one quarter have
    at least one returned ('R') lineitem.  Semi-join shape: the
    lineitem side contributes block-local DISTINCT returned orderkeys
    (combiner — one row per key per block), the orders side slim
    (orderkey, priority) rows; ONE orderkey co-group does the EXISTS
    locally and emits bounded per-priority partial counts; a final
    native grouped Sum folds <=5·P rows."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.agg import _hash_part

    LO, HI = np.datetime64("1998-01-01", "us"), np.datetime64(
        "1998-04-01", "us")
    P = 64

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def o_slim(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.greater_equal(b["o_orderdate"], pa.scalar(LO)),
            pc.less(b["o_orderdate"], pa.scalar(HI))))
        n = len(t)
        return pa.table({
            "_part": pa.array(_hash_part(t["o_orderkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "ok": t["o_orderkey"],
            "prio": t["o_orderpriority"]})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag"])

    def l_slim(b: pa.Table) -> pa.Table:
        ok = pc.unique(b.filter(pc.equal(
            b["l_returnflag"], "R"))["l_orderkey"])
        n = len(ok)
        return pa.table({
            "_part": pa.array(_hash_part(ok, P), pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)),
            "ok": ok,
            "prio": pa.nulls(n, pa.string())})

    both = (orders.map_batches(o_slim, batch_format="pyarrow")
            .union(li.map_batches(l_slim, batch_format="pyarrow")))

    def semi(t: pa.Table) -> pa.Table:
        returned = pc.unique(t.filter(pc.equal(t["_flag"], 1))["ok"])
        o = t.filter(pc.equal(t["_flag"], 0))
        o = o.filter(pc.is_in(o["ok"], value_set=returned))
        df = pd.DataFrame({"prio": o["prio"].to_pandas()})
        g = df.groupby("prio", sort=False).size().reset_index(name="n")
        return pa.table({"o_orderpriority": pa.array(g["prio"],
                                                     pa.string()),
                         "n_orders": pa.array(g["n"], pa.int64())})

    out = (both.groupby("_part").map_groups(semi, batch_format="pyarrow")
           .groupby("o_orderpriority")
           .aggregate(Sum("n_orders", alias_name="n_orders"))
           .to_pandas())
    if "o_orderpriority" not in out.columns:
        out = pd.DataFrame({"o_orderpriority": pd.Series(dtype=str),
                            "n_orders": pd.Series(dtype="int64")})
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out[["o_orderpriority", "n_orders"]]
            .sort_values("o_orderpriority").reset_index(drop=True))


def _q_nation_market_share(sf_dir: str):
    """TPC-H Q8-style market share: per order year, NATION_7's share of
    supplier revenue from orders placed by region-2 customers, as an
    exact integer fraction (share_num / share_den micro-units).  Scale
    shape: THREE chained co-groups, each all-to-all carrying only slim
    combined rows — (1) custkey co-group semi-joins orders against
    region-filtered customers (region membership comes from the
    25-row nation table, broadcast); (2) orderkey co-group attaches the
    order year to per-(order,supplier) revenue partials (block-local
    combiner first); (3) suppkey co-group attaches the supplier's
    nation; a final native grouped Sum folds to a years×nations-bounded
    aggregate and the driver reduces that to one fraction per year."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.agg import _hash_part

    REGION, NATION, P = 2, 7, 64

    # 25-row static table: region membership broadcast as a plain set
    nt = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    region_nk = pa.array(np.sort(nt.loc[
        nt["n_regionkey"] == REGION, "n_nationkey"].to_numpy()), pa.int64())

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def c_slim(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(pc.cast(b["c_nationkey"], pa.int64()),
                              value_set=region_nk))
        n = len(t)
        return pa.table({
            "_part": pa.array(_hash_part(t["c_custkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "k": t["c_custkey"],
            "ok": pa.nulls(n, pa.int64()),
            "year": pa.nulls(n, pa.int64())})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def o_slim(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "_part": pa.array(_hash_part(b["o_custkey"], P), pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)),
            "k": b["o_custkey"],
            "ok": b["o_orderkey"],
            "year": pc.cast(pc.year(b["o_orderdate"]), pa.int64())})

    def semi(t: pa.Table) -> pa.Table:
        keep = pc.unique(t.filter(pc.equal(t["_flag"], 0))["k"])
        o = t.filter(pc.equal(t["_flag"], 1))
        o = o.filter(pc.is_in(o["k"], value_set=keep))
        return pa.table({
            "_part": pa.array(_hash_part(o["ok"], P), pa.int64()),
            "_flag": pa.array(np.zeros(len(o), np.int8)),
            "k": o["ok"],
            "sk": pa.nulls(len(o), pa.int64()),
            "year": o["year"],
            "micro": pa.nulls(len(o), pa.int64())})

    region_orders = (cust.map_batches(c_slim, batch_format="pyarrow")
                     .union(orders.map_batches(o_slim,
                                               batch_format="pyarrow"))
                     .groupby("_part")
                     .map_groups(semi, batch_format="pyarrow"))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def l_partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            b["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        bp = pc.cast(pc.round(pc.multiply(
            b["l_discount"], pa.scalar(10_000.0))), pa.int64())
        micro = pc.multiply(cents, pc.subtract(
            pa.scalar(10_000, pa.int64()), bp))
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
            "micro": micro.to_numpy(zero_copy_only=False)})
        g = (df.groupby(["ok", "sk"], sort=False)["micro"].sum()
             .reset_index())
        n = len(g)
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(g["ok"]), P), pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)),
            "k": pa.array(g["ok"], pa.int64()),
            "sk": pa.array(g["sk"], pa.int64()),
            "year": pa.nulls(n, pa.int64()),
            "micro": pa.array(g["micro"], pa.int64())})

    def attach_year(t: pa.Table) -> pa.Table:
        ot = t.filter(pc.equal(t["_flag"], 0))
        lt = t.filter(pc.equal(t["_flag"], 1))
        O = pd.DataFrame({"k": ot["k"].to_pandas(),
                          "year": ot["year"].to_pandas()})
        L = pd.DataFrame({"k": lt["k"].to_pandas(),
                          "sk": lt["sk"].to_pandas(),
                          "micro": lt["micro"].to_pandas()})
        m = L.merge(O, on="k")
        g = (m.groupby(["sk", "year"], sort=False)["micro"].sum()
             .reset_index())
        return pa.table({
            "sk": pa.array(g["sk"], pa.int64()),
            "year": pa.array(g["year"], pa.int64()),
            "micro": pa.array(g["micro"], pa.int64())})

    # supplier→nation is a DIMENSION side (bounded at any corpus
    # scale): broadcast it behind an exact-count gate instead of the
    # round-2 third all-to-all — one fewer exchange floor (~2 s here)
    import ray

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
    sdf = supp.limit(2_000_001).to_pandas()
    if len(sdf) > 2_000_000:
        raise ValueError(
            "market_share: supplier side exceeds the broadcast gate; "
            "restore the co-group attach for this corpus")
    sk_arr = sdf["s_suppkey"].to_numpy(np.int64)
    nk_arr = sdf["s_nationkey"].to_numpy(np.int64)
    so = np.argsort(sk_arr)
    sn_ref = ray.put((sk_arr[so], nk_arr[so]))

    def to_yn(t: pa.Table) -> pa.Table:
        sk_s, nk_s = ray.get(sn_ref)
        sk = t["sk"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(sk):
            return pa.table({"yn": pa.array([], pa.int64()),
                             "micro": pa.array([], pa.int64())})
        pos = np.minimum(np.searchsorted(sk_s, sk), len(sk_s) - 1)
        nk = np.where(sk_s[pos] == sk, nk_s[pos], -1)
        keep = nk >= 0
        year = t["year"].to_numpy(zero_copy_only=False)[keep]
        micro = t["micro"].to_numpy(zero_copy_only=False)[keep]
        # single combined int key: year*100 + nationkey (both small)
        return pa.table({
            "yn": pa.array(year * 100 + nk[keep], pa.int64()),
            "micro": pa.array(micro, pa.int64())})

    agg = (region_orders
           .union(li.map_batches(l_partial, batch_format="pyarrow"))
           .groupby("_part")
           .map_groups(attach_year, batch_format="pyarrow")
           .map_batches(to_yn, batch_format="pyarrow")
           .groupby("yn").aggregate(Sum("micro", alias_name="micro"))
           .to_pandas())  # <= years x 25 nations rows
    agg["o_year"] = agg["yn"] // 100
    agg["nk"] = agg["yn"] % 100
    den = agg.groupby("o_year")["micro"].sum()
    num = (agg[agg["nk"] == NATION].set_index("o_year")["micro"]
           .reindex(den.index, fill_value=0))
    out = pd.DataFrame({
        "o_year": den.index.astype("int64"),
        "share_num": num.to_numpy().astype("int64"),
        "share_den": den.to_numpy().astype("int64")})
    return out.sort_values("o_year").reset_index(drop=True)


def _q_customer_order_distribution(sf_dir: str):
    """TPC-H Q13-style custdist: the distribution of per-customer order
    counts INCLUDING zero-order customers.  Scale shape: orders
    pre-count per custkey inside every block (combiner); ONE custkey
    co-group left-joins customers to the partial counts (absent ->
    0); each partition emits a bounded partial histogram and a native
    grouped Sum folds them — no per-customer rows ever reach the
    driver."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.agg import _hash_part

    P = 64

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])

    def c_slim(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "_part": pa.array(_hash_part(b["c_custkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "ck": b["c_custkey"],
            "n": pa.nulls(n, pa.int64())})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def o_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ck": b["o_custkey"].to_numpy(zero_copy_only=False)})
        g = df.groupby("ck", sort=False).size().reset_index(name="n")
        m = len(g)
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(g["ck"]), P), pa.int64()),
            "_flag": pa.array(np.ones(m, np.int8)),
            "ck": pa.array(g["ck"], pa.int64()),
            "n": pa.array(g["n"], pa.int64())})

    def hist(t: pa.Table) -> pa.Table:
        C = pd.DataFrame({"ck": t.filter(pc.equal(
            t["_flag"], 0))["ck"].to_pandas()})
        ot = t.filter(pc.equal(t["_flag"], 1))
        O = (pd.DataFrame({"ck": ot["ck"].to_pandas(),
                           "n": ot["n"].to_pandas()})
             .groupby("ck", sort=False)["n"].sum())
        cnt = C.join(O, on="ck")["n"].fillna(0).astype("int64")
        h = cnt.value_counts().sort_index()
        return pa.table({
            "n_orders": pa.array(h.index.to_numpy(), pa.int64()),
            "n_customers": pa.array(h.to_numpy(), pa.int64())})

    out = (cust.map_batches(c_slim, batch_format="pyarrow")
           .union(orders.map_batches(o_partial, batch_format="pyarrow"))
           .groupby("_part").map_groups(hist, batch_format="pyarrow")
           .groupby("n_orders")
           .aggregate(Sum("n_customers", alias_name="n_customers"))
           .to_pandas())
    out["n_orders"] = out["n_orders"].astype("int64")
    out["n_customers"] = out["n_customers"].astype("int64")
    return (out[["n_orders", "n_customers"]]
            .sort_values(["n_customers", "n_orders"],
                         ascending=[False, False])
            .reset_index(drop=True))


def _q_brand_filtered_revenue(sf_dir: str):
    """TPC-H Q19-style disjunctive-predicate revenue: discounted
    revenue of lineitems matching any of three (brand, quantity-range,
    size-range) conjunctions.  Part attributes meet per-lineitem rows
    in ONE partkey co-group (flag-union); the OR-of-ANDs predicate is
    evaluated as vectorized numpy masks per partition; each partition
    emits a single two-int partial and the driver folds <=P rows."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.agg import _hash_part

    RULES = [("Brand#12", 1, 11, 1, 5),
             ("Brand#23", 10, 20, 1, 10),
             ("Brand#24", 20, 30, 1, 15)]
    P = 64

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_size"])

    def p_slim(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["p_brand"], value_set=pa.array(
            [r[0] for r in RULES])))
        n = len(t)
        return pa.table({
            "_part": pa.array(_hash_part(t["p_partkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "pk": t["p_partkey"],
            "brand": t["p_brand"],
            "size": pc.cast(t["p_size"], pa.int64()),
            "q": pa.nulls(n, pa.int64()),
            "micro": pa.nulls(n, pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def l_slim(b: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(b["l_quantity"]), pa.int64())
        # cheap pre-filter: quantity within the widest rule window
        m = pc.and_(pc.greater_equal(q, pa.scalar(1, pa.int64())),
                    pc.less_equal(q, pa.scalar(30, pa.int64())))
        t = b.filter(m)
        q = q.filter(m)
        cents = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        bp = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(10_000.0))), pa.int64())
        micro = pc.multiply(cents, pc.subtract(
            pa.scalar(10_000, pa.int64()), bp))
        n = len(t)
        return pa.table({
            "_part": pa.array(_hash_part(t["l_partkey"], P), pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)),
            "pk": t["l_partkey"],
            "brand": pa.nulls(n, pa.string()),
            "size": pa.nulls(n, pa.int64()),
            "q": q,
            "micro": micro})

    def join(t: pa.Table) -> pa.Table:
        pt = t.filter(pc.equal(t["_flag"], 0))
        lt = t.filter(pc.equal(t["_flag"], 1))
        PD = pd.DataFrame({"pk": pt["pk"].to_pandas(),
                           "brand": pt["brand"].to_pandas(),
                           "size": pt["size"].to_pandas()})
        L = pd.DataFrame({"pk": lt["pk"].to_pandas(),
                          "q": lt["q"].to_pandas(),
                          "micro": lt["micro"].to_pandas()})
        m = L.merge(PD, on="pk")
        keep = np.zeros(len(m), bool)
        for brand, qlo, qhi, slo, shi in RULES:
            keep |= ((m["brand"] == brand).to_numpy()
                     & (m["q"].to_numpy() >= qlo)
                     & (m["q"].to_numpy() <= qhi)
                     & (m["size"].to_numpy() >= slo)
                     & (m["size"].to_numpy() <= shi))
        return pa.table({
            "revenue_micro": pa.array(
                [int(m.loc[keep, "micro"].sum())], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64())})

    parts = (part.map_batches(p_slim, batch_format="pyarrow")
             .union(li.map_batches(l_slim, batch_format="pyarrow"))
             .groupby("_part").map_groups(join, batch_format="pyarrow")
             .to_pandas())
    return pd.DataFrame({
        "revenue_micro": [int(parts["revenue_micro"].sum())],
        "n_items": [int(parts["n_items"].sum())]})


def _q_late_supplier_orders(sf_dir: str):
    """TPC-H Q21-style blame assignment (adapted to this schema's
    columns): for finished ('F') multi-supplier orders, count per
    supplier the orders where that supplier ALONE shipped last (the
    unique latest per-supplier max ship date).  Scale shape: lineitem
    pre-reduces to per-(order,supplier) max ship date inside every
    block (combiner); ONE orderkey co-group replays the whole order
    locally — distinct-supplier count, order max, unique-argmax test —
    and emits (suppkey, 1) partials; a native grouped Sum folds to a
    supplier-bounded result."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.agg import _hash_part

    P = 64

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus"])

    def o_slim(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["o_orderstatus"], "F"))
        n = len(t)
        return pa.table({
            "_part": pa.array(_hash_part(t["o_orderkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "ok": t["o_orderkey"],
            "sk": pa.nulls(n, pa.int64()),
            "smax": pa.nulls(n, pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_shipdate"])

    def l_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
            "sd": b["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype("int64")})
        g = (df.groupby(["ok", "sk"], sort=False)["sd"].max()
             .reset_index())
        n = len(g)
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(g["ok"]), P), pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)),
            "ok": pa.array(g["ok"], pa.int64()),
            "sk": pa.array(g["sk"], pa.int64()),
            "smax": pa.array(g["sd"], pa.int64())})

    def blame(t: pa.Table) -> pa.Table:
        keep = pc.unique(t.filter(pc.equal(t["_flag"], 0))["ok"])
        lt = t.filter(pc.equal(t["_flag"], 1))
        lt = lt.filter(pc.is_in(lt["ok"], value_set=keep))
        df = (pd.DataFrame({"ok": lt["ok"].to_pandas(),
                            "sk": lt["sk"].to_pandas(),
                            "smax": lt["smax"].to_pandas()})
              .groupby(["ok", "sk"], sort=False)["smax"].max()
              .reset_index())
        g = df.groupby("ok", sort=False)["smax"]
        omax = g.transform("max")
        nsupp = df.groupby("ok", sort=False)["sk"].transform("size")
        late = df[(df["smax"] == omax) & (nsupp >= 2)]
        uniq = late.groupby("ok", sort=False)["sk"].filter(
            lambda s: len(s) == 1)
        h = uniq.value_counts()
        return pa.table({
            "s_suppkey": pa.array(h.index.to_numpy(), pa.int64()),
            "n_orders": pa.array(h.to_numpy(), pa.int64())})

    out = (orders.map_batches(o_slim, batch_format="pyarrow")
           .union(li.map_batches(l_partial, batch_format="pyarrow"))
           .groupby("_part").map_groups(blame, batch_format="pyarrow")
           .groupby("s_suppkey")
           .aggregate(Sum("n_orders", alias_name="n_orders"))
           .to_pandas())
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out[["s_suppkey", "n_orders"]]
            .sort_values(["n_orders", "s_suppkey"],
                         ascending=[False, True])
            .reset_index(drop=True))


def _q_order_qty_lines_corr(sf_dir: str):
    """Exact-integer Pearson-correlation components between per-order
    total quantity and per-order lineitem count: ONE corpus pass with
    block-local per-order partials (combiner) feeding ONE native
    grouped Sum pair; the six global moments (n, Σx, Σy, Σxy, Σx²,
    Σy²) then fold from single-row per-block partials — both factors
    are small ints so every product stays far inside int64 even at
    10^12 rows.  The correlation itself is derivable from the six
    integers without any float leaving the engine."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "q": pc.cast(pc.round(b["l_quantity"]),
                         pa.int64()).to_numpy(zero_copy_only=False)})
        g = df.groupby("ok", sort=False)["q"].agg(["sum", "count"])
        g = g.reset_index()
        return pa.table({"ok": pa.array(g["ok"], pa.int64()),
                         "x": pa.array(g["sum"], pa.int64()),
                         "y": pa.array(g["count"], pa.int64())})

    per_order = (li.map_batches(partial, batch_format="pyarrow")
                 .groupby("ok").aggregate(Sum("x", alias_name="x"),
                                          Sum("y", alias_name="y")))

    def moments(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_orders": pa.array([len(x)], pa.int64()),
            "sum_x": pa.array([int(x.sum())], pa.int64()),
            "sum_y": pa.array([int(y.sum())], pa.int64()),
            "sum_xy": pa.array([int((x * y).sum())], pa.int64()),
            "sum_x2": pa.array([int((x * x).sum())], pa.int64()),
            "sum_y2": pa.array([int((y * y).sum())], pa.int64())})

    parts = (per_order.map_batches(moments, batch_format="pyarrow")
             .to_pandas())  # one row per block
    return pd.DataFrame({c: [int(parts[c].sum())] for c in
                         ["n_orders", "sum_x", "sum_y", "sum_xy",
                          "sum_x2", "sum_y2"]})


def _value_hist(sf_dir: str):
    """Shared bounded-domain histogram: per (event_type, value-cents)
    counts.  Block-local combiner → ONE native grouped Sum on a
    composite string key; the aggregate is domain-bounded (types ×
    distinct cents), never corpus-bounded."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            b["value"], pa.scalar(100.0))), pa.int64())
        df = pd.DataFrame({
            "t": b["event_type"].to_pandas(),
            "c": cents.to_numpy(zero_copy_only=False)})
        g = df.groupby(["t", "c"], sort=False).size().reset_index(
            name="n")
        return pa.table({
            "k": pa.array(g["t"] + ":" + g["c"].astype(str)),
            "n": pa.array(g["n"], pa.int64())})

    h = (ev.map_batches(partial, batch_format="pyarrow")
         .groupby("k").aggregate(Sum("n", alias_name="n"))
         .to_pandas())
    kv = h["k"].str.rsplit(":", n=1, expand=True)
    h["t"], h["c"] = kv[0], kv[1].astype("int64")
    return h[["t", "c", "n"]]


def _disc_quantile(vals, wts, q=0.5):
    """DuckDB ``quantile_disc`` on a weighted histogram: the value at
    1-based sorted position ceil(q·n) of the expanded multiset,
    clamped to [1, n] (the rule shared with ``ops/quantiles``)."""
    order = np.argsort(vals, kind="stable")
    v, w = np.asarray(vals)[order], np.asarray(wts)[order]
    total = int(w.sum())
    pos = min(max(int(np.ceil(q * total)), 1), total)  # 1-based
    cum = np.cumsum(w)
    return int(v[np.searchsorted(cum, pos)])


def _q_event_value_mad(sf_dir: str):
    """Per-event-type exact discrete median and MAD (median absolute
    deviation) from ONE corpus pass: the bounded (type × cents)
    histogram is the only aggregate; both medians — of the values and
    of |value − median| — are computed from histogram weights on the
    driver (domain-bounded work, matching DuckDB's quantile_disc
    semantics exactly, no sampling)."""
    import pandas as pd

    h = _value_hist(sf_dir)
    rows = []
    for t, g in h.groupby("t", sort=True):
        med = _disc_quantile(g["c"].to_numpy(), g["n"].to_numpy())
        dev = np.abs(g["c"].to_numpy() - med)
        dg = (pd.DataFrame({"d": dev, "n": g["n"].to_numpy()})
              .groupby("d", sort=False)["n"].sum().reset_index())
        mad = _disc_quantile(dg["d"].to_numpy(), dg["n"].to_numpy())
        rows.append((t, med, mad))
    return pd.DataFrame(rows, columns=["event_type", "median_cents",
                                       "mad_cents"])


def _q_event_type_mode_value(sf_dir: str):
    """Per-event-type modal value (most frequent cents, smallest value
    wins ties), read off the same bounded histogram — exact, one
    corpus pass, no per-row data on the driver."""
    import pandas as pd

    h = _value_hist(sf_dir)
    h = h.sort_values(["t", "n", "c"], ascending=[True, False, True])
    m = h.groupby("t", sort=True).head(1)
    return pd.DataFrame({
        "event_type": m["t"].to_numpy(),
        "mode_cents": m["c"].to_numpy().astype("int64"),
        "n_events": m["n"].to_numpy().astype("int64")})


def _brand_supplier_pairs(sf_dir: str):
    """Shared distinct (brand, suppkey) pair stage: lineitem
    pre-dedupes (partkey, suppkey) pairs inside every block
    (combiner); ONE partkey co-group attaches the brand and
    re-dedupes; a grouped Count over the composite pair key yields the
    globally-distinct pairs — exchanges carry pair-distinct rows only,
    never raw lineitems.  Returns a Dataset with one ``pair``
    (``brand:suppkey``) row per distinct pair."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count

    from xtract.ops.agg import _hash_part

    P = 64

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])

    def p_slim(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "_part": pa.array(_hash_part(b["p_partkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "pk": b["p_partkey"],
            "brand": b["p_brand"],
            "sk": pa.nulls(n, pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def l_pairs(b: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(zero_copy_only=False),
            "sk": b["l_suppkey"].to_numpy(zero_copy_only=False)})
            .drop_duplicates())
        n = len(df)
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(df["pk"]), P),
                              pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)),
            "pk": pa.array(df["pk"], pa.int64()),
            "brand": pa.nulls(n, pa.string()),
            "sk": pa.array(df["sk"], pa.int64())})

    def attach(t: pa.Table) -> pa.Table:
        pt = t.filter(pc.equal(t["_flag"], 0))
        lt = t.filter(pc.equal(t["_flag"], 1))
        PD = pd.DataFrame({"pk": pt["pk"].to_pandas(),
                           "brand": pt["brand"].to_pandas()})
        L = (pd.DataFrame({"pk": lt["pk"].to_pandas(),
                           "sk": lt["sk"].to_pandas()})
             .drop_duplicates())
        m = (L.merge(PD, on="pk")[["brand", "sk"]].drop_duplicates())
        return pa.table({
            "pair": pa.array(m["brand"] + ":" + m["sk"].astype(str))})

    return (part.map_batches(p_slim, batch_format="pyarrow")
            .union(li.map_batches(l_pairs, batch_format="pyarrow"))
            .groupby("_part").map_groups(attach,
                                         batch_format="pyarrow")
            .groupby("pair").aggregate(Count(alias_name="_n")))


def _q_brand_supplier_coverage(sf_dir: str):
    """TPC-H Q16-flavoured distinct-count: how many DISTINCT suppliers
    ship each part brand, read off the shared distinct-pair stage
    (`_brand_supplier_pairs`) with one more bounded grouped Count."""
    from ray.data.aggregate import Count

    def brand_of(b: pa.Table) -> pa.Table:
        brand = pc.replace_substring_regex(b["pair"], pattern=":.*$",
                                           replacement="")
        return pa.table({"p_brand": brand})

    out = (_brand_supplier_pairs(sf_dir)
           .map_batches(brand_of, batch_format="pyarrow")
           .groupby("p_brand").aggregate(Count(alias_name="n_suppliers"))
           .to_pandas())
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return (out[["p_brand", "n_suppliers"]]
            .sort_values("p_brand").reset_index(drop=True))


def _q_suppliers_all_brands(sf_dir: str):
    """Relational division: suppliers that ship EVERY brand in the
    part catalog.  The divisor cardinality (distinct brands) is one
    bounded aggregate over part; the dividend reuses the shared
    distinct (brand, suppkey) pair stage; a grouped Count per supplier
    + an equality filter finish — no per-lineitem rows past the first
    combiner."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_brand"])
    n_brands = (part.map_batches(
        lambda b: pa.table({"b": pc.unique(b["p_brand"])}),
        batch_format="pyarrow").groupby("b")
        .aggregate(Count(alias_name="_n")).count())

    def supp_of(b: pa.Table) -> pa.Table:
        sk = pc.replace_substring_regex(b["pair"], pattern="^.*:",
                                        replacement="")
        return pa.table({"sk": pc.cast(sk, pa.int64())})

    per_supp = (_brand_supplier_pairs(sf_dir)
                .map_batches(supp_of, batch_format="pyarrow")
                .groupby("sk").aggregate(Count(alias_name="nb")))
    out = (per_supp.map_batches(
        lambda b: b.filter(pc.equal(
            b["nb"], pa.scalar(n_brands, pa.int64()))),
        batch_format="pyarrow").to_pandas())
    if "sk" not in out.columns or not len(out):
        out = pd.DataFrame({"sk": pd.Series(dtype="int64")})
    return (pd.DataFrame({"s_suppkey": out["sk"].astype("int64")})
            .sort_values("s_suppkey").reset_index(drop=True))


def _q_event_props_key_stats(sf_dir: str):
    """Typed field extraction from a JSON-string column without a
    JSON parser in the hot path: ONE vectorized ``extract_regex``
    kernel pulls ``props.k`` per batch; block-local per-type partials
    (n/sum/min/max as ints) fold through native grouped Sum/Min/Max —
    no Python row loop, no per-row JSON object churn."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"],
                             pattern=r'"k":\s*(?P<v>-?\d+)')
        v = pc.cast(pc.struct_field(m, "v"), pa.int64())
        df = pd.DataFrame({
            "t": b["event_type"].to_pandas(),
            "v": v.to_numpy(zero_copy_only=False)})
        df = df.dropna()
        df["v"] = df["v"].astype("int64")
        g = df.groupby("t", sort=False)["v"].agg(
            ["count", "sum", "min", "max"]).reset_index()
        return pa.table({
            "event_type": pa.array(g["t"]),
            "n_with_k": pa.array(g["count"], pa.int64()),
            "sum_k": pa.array(g["sum"], pa.int64()),
            "min_k": pa.array(g["min"], pa.int64()),
            "max_k": pa.array(g["max"], pa.int64())})

    out = (ev.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n_with_k", alias_name="n_with_k"),
                      Sum("sum_k", alias_name="sum_k"),
                      Min("min_k", alias_name="min_k"),
                      Max("max_k", alias_name="max_k"))
           .to_pandas())
    for c in ("n_with_k", "sum_k", "min_k", "max_k"):
        out[c] = out[c].astype("int64")
    return (out[["event_type", "n_with_k", "sum_k", "min_k", "max_k"]]
            .sort_values("event_type").reset_index(drop=True))


def _q_user_longest_streak(sf_dir: str):
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days.  Scale shape: blocks pre-dedupe (user, day) pairs
    (combiner); ONE user-hash co-group sees each user's full day set
    and runs the islands trick (day − dense-rank is constant within a
    run) vectorized per partition; output is user-bounded."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.agg import _hash_part

    P = 64

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def days(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor(pc.divide(
            pc.cast(b["ts"], pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()))), pa.int64())
        df = (pd.DataFrame({
            "u": b["user_id"].to_numpy(zero_copy_only=False),
            "d": day.to_numpy(zero_copy_only=False)})
            .drop_duplicates())
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(df["u"]), P),
                              pa.int64()),
            "u": pa.array(df["u"], pa.int64()),
            "d": pa.array(df["d"], pa.int64())})

    def streaks(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"u": t["u"].to_pandas(),
                            "d": t["d"].to_pandas()})
              .drop_duplicates().sort_values(["u", "d"]))
        rn = df.groupby("u", sort=False).cumcount()
        df["grp"] = df["d"] - rn
        runs = (df.groupby(["u", "grp"], sort=False).size()
                .reset_index(name="len"))
        best = runs.groupby("u", sort=False)["len"].max().reset_index()
        return pa.table({
            "user_id": pa.array(best["u"], pa.int64()),
            "streak_days": pa.array(best["len"], pa.int64())})

    out = (ev.map_batches(days, batch_format="pyarrow")
           .groupby("_part").map_groups(streaks, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("user_id").reset_index(drop=True)


def _q_click_no_purchase_users(sf_dir: str):
    """Set difference on user behavior: how many users ever clicked
    but never purchased.  Per-block per-user 0/1 flags (combiner) →
    ONE native grouped Max pair → a vectorized filter + Count — the
    exchange carries two bits per (block, user), the driver one
    int."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Max

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def flags(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": b["user_id"].to_numpy(zero_copy_only=False),
            "c": pc.cast(pc.equal(b["event_type"], "click"),
                         pa.int64()).to_numpy(zero_copy_only=False),
            "p": pc.cast(pc.equal(b["event_type"], "purchase"),
                         pa.int64()).to_numpy(zero_copy_only=False)})
        g = df.groupby("u", sort=False)[["c", "p"]].max().reset_index()
        return pa.table({"u": pa.array(g["u"], pa.int64()),
                         "c": pa.array(g["c"], pa.int64()),
                         "p": pa.array(g["p"], pa.int64())})

    per_user = (ev.map_batches(flags, batch_format="pyarrow")
                .groupby("u").aggregate(Max("c", alias_name="c"),
                                        Max("p", alias_name="p")))
    n = (per_user.map_batches(
        lambda b: pa.table({"one": pa.array(
            [len(b.filter(pc.and_(pc.equal(b["c"], 1),
                                  pc.equal(b["p"], 0))))], pa.int64())}),
        batch_format="pyarrow").to_pandas())
    return pd.DataFrame({"n_users": [int(n["one"].sum())]})


def _q_single_month_orders(sf_dir: str):
    """Orders whose every lineitem shipped inside ONE calendar month
    (min ship-month == max ship-month per order), counted per month.
    Block-local per-order min/max month ints (combiner) → native
    grouped Min/Max → vectorized equality filter → bounded grouped
    Count per month."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        ym = pc.add(pc.multiply(pc.cast(pc.year(b["l_shipdate"]),
                                        pa.int64()),
                                pa.scalar(12, pa.int64())),
                    pc.cast(pc.subtract(pc.month(b["l_shipdate"]),
                                        pa.scalar(1)), pa.int64()))
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "ym": ym.to_numpy(zero_copy_only=False)})
        g = df.groupby("ok", sort=False)["ym"].agg(["min", "max"])
        g = g.reset_index()
        return pa.table({"ok": pa.array(g["ok"], pa.int64()),
                         "mn": pa.array(g["min"], pa.int64()),
                         "mx": pa.array(g["max"], pa.int64())})

    per_order = (li.map_batches(partial, batch_format="pyarrow")
                 .groupby("ok").aggregate(Min("mn", alias_name="mn"),
                                          Max("mx", alias_name="mx")))
    out = (per_order.map_batches(
        lambda b: b.filter(pc.equal(b["mn"], b["mx"]))
        .select(["mn"]).rename_columns(["ym"]),
        batch_format="pyarrow")
        .groupby("ym").aggregate(Count(alias_name="n_orders"))
        .to_pandas())
    out["ship_year"] = (out["ym"] // 12).astype("int64")
    out["ship_month"] = (out["ym"] % 12 + 1).astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out[["ship_year", "ship_month", "n_orders"]]
            .sort_values(["ship_year", "ship_month"])
            .reset_index(drop=True))


def _q_user_interarrival_stats(sf_dir: str):
    """Global inter-arrival-time moments over per-user ordered event
    streams (lead/lag shape): ONE user-hash co-group sorts each user's
    timestamps locally and emits a single four-int partial (count /
    sum / min / max of the microsecond gaps); the driver folds <=P
    rows.  Equal timestamps contribute zero-gaps deterministically —
    the gap multiset is tie-order-independent."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.agg import _hash_part

    P = 64

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "_part": pa.array(_hash_part(b["user_id"], P), pa.int64()),
            "u": b["user_id"],
            "t": pc.cast(b["ts"], pa.int64())})

    def gaps(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"u": t["u"].to_pandas(),
                            "t": t["t"].to_pandas()})
              .sort_values(["u", "t"]))
        d = df.groupby("u", sort=False)["t"].diff().dropna()
        arr = d.to_numpy().astype("int64")
        if not len(arr):
            return pa.table({
                "n_gaps": pa.array([0], pa.int64()),
                "sum_us": pa.array([0], pa.int64()),
                "min_us": pa.array([np.iinfo(np.int64).max], pa.int64()),
                "max_us": pa.array([np.iinfo(np.int64).min], pa.int64())})
        return pa.table({
            "n_gaps": pa.array([len(arr)], pa.int64()),
            "sum_us": pa.array([int(arr.sum())], pa.int64()),
            "min_us": pa.array([int(arr.min())], pa.int64()),
            "max_us": pa.array([int(arr.max())], pa.int64())})

    parts = (ev.map_batches(slim, batch_format="pyarrow")
             .groupby("_part").map_groups(gaps, batch_format="pyarrow")
             .to_pandas())
    return pd.DataFrame({
        "n_gaps": [int(parts["n_gaps"].sum())],
        "sum_us": [int(parts["sum_us"].sum())],
        "min_us": [int(parts["min_us"].min())],
        "max_us": [int(parts["max_us"].max())]})


def _q_orders_yoy_growth(sf_dir: str):
    """Year-over-year revenue growth: LAG over a grouped aggregate.
    ONE combiner-backed grouped Sum produces the years-bounded table;
    the shift/delta runs on that bounded result — exact integer cents,
    years without a predecessor dropped (LAG NULL semantics)."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            b["o_totalprice"], pa.scalar(100.0))), pa.int64())
        df = pd.DataFrame({
            "y": pc.cast(pc.year(b["o_orderdate"]),
                         pa.int64()).to_numpy(zero_copy_only=False),
            "c": cents.to_numpy(zero_copy_only=False)})
        g = df.groupby("y", sort=False)["c"].sum().reset_index()
        return pa.table({"y": pa.array(g["y"], pa.int64()),
                         "c": pa.array(g["c"], pa.int64())})

    agg = (orders.map_batches(partial, batch_format="pyarrow")
           .groupby("y").aggregate(Sum("c", alias_name="revenue_cents"))
           .to_pandas().sort_values("y").reset_index(drop=True))
    agg["prev_revenue_cents"] = agg["revenue_cents"].shift(1)
    agg = agg.dropna(subset=["prev_revenue_cents"])
    return pd.DataFrame({
        "o_year": agg["y"].astype("int64"),
        "revenue_cents": agg["revenue_cents"].astype("int64"),
        "prev_revenue_cents": agg["prev_revenue_cents"].astype("int64"),
        "delta_cents": (agg["revenue_cents"]
                        - agg["prev_revenue_cents"]).astype("int64"),
    }).reset_index(drop=True)


def _q_events_daily_distinct_users(sf_dir: str):
    """Distinct users per day: blocks pre-dedupe (day, user) pairs
    (combiner), a grouped Count over the composite pair key finishes
    the global dedup, and a second bounded grouped Count per day
    counts survivors — exchanges carry pair-distinct rows only."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def pairs(b: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
            "day": pc.strftime(b["ts"], format="%Y-%m-%d")
            .to_pandas(),
            "u": b["user_id"].to_numpy(zero_copy_only=False)})
            .drop_duplicates())
        return pa.table({"k": pa.array(
            df["day"] + ":" + df["u"].astype(str))})

    out = (ev.map_batches(pairs, batch_format="pyarrow")
           .groupby("k").aggregate(Count(alias_name="_n"))
           .map_batches(lambda b: pa.table({
               "day": pc.replace_substring_regex(
                   b["k"], pattern=":.*$", replacement="")}),
               batch_format="pyarrow")
           .groupby("day").aggregate(Count(alias_name="n_users"))
           .to_pandas())
    out["n_users"] = out["n_users"].astype("int64")
    return (out[["day", "n_users"]].sort_values("day")
            .reset_index(drop=True))


def _q_lineitem_decile_revenue(sf_dir: str):
    """Decile-banded revenue: the nine exact global deciles of
    per-lineitem discounted revenue come from the shuffle-free
    iterative-histogram quantile op; the scalar thresholds broadcast;
    a second vectorized pass bands every row (band = #thresholds
    strictly below) and folds per-band count/sum through block
    partials + ONE bounded grouped Sum."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.quantiles import quantile_report

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_discount"])

    def micro_col(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            b["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        bp = pc.cast(pc.round(pc.multiply(
            b["l_discount"], pa.scalar(10_000.0))), pa.int64())
        return pa.table({"micro": pc.multiply(cents, pc.subtract(
            pa.scalar(10_000, pa.int64()), bp))})

    mds = li.map_batches(micro_col, batch_format="pyarrow")
    qs = {f"p{i*10}": i / 10 for i in range(1, 10)}
    rep = quantile_report(mds, "micro", qs, n_bins=256)
    thresholds = np.array([int(rep[f"p{i*10}"][0])
                           for i in range(1, 10)], np.int64)

    def band(b: pa.Table) -> pa.Table:
        m = b["micro"].to_numpy(zero_copy_only=False)
        bd = np.searchsorted(thresholds, m, side="left")
        df = pd.DataFrame({"band": bd, "micro": m})
        g = df.groupby("band", sort=False)["micro"].agg(
            ["count", "sum"]).reset_index()
        return pa.table({
            "band": pa.array(g["band"], pa.int64()),
            "n_items": pa.array(g["count"], pa.int64()),
            "sum_micro": pa.array(g["sum"], pa.int64())})

    out = (mds.map_batches(band, batch_format="pyarrow")
           .groupby("band")
           .aggregate(Sum("n_items", alias_name="n_items"),
                      Sum("sum_micro", alias_name="sum_micro"))
           .to_pandas())
    for c in ("band", "n_items", "sum_micro"):
        out[c] = out[c].astype("int64")
    return (out[["band", "n_items", "sum_micro"]]
            .sort_values("band").reset_index(drop=True))


def _q_doc_simpson_diversity(sf_dir: str):
    """Per-document lexical diversity as an exact integer fraction
    (Simpson index components): num = Σᵢ nᵢ(nᵢ−1) over the doc's token
    counts, den = N(N−1).  Entirely block-local — a document's text is
    one row, so there is NO shuffle at all; one pandas groupby chain
    per batch does every doc in the block.  Docs with fewer than two
    tokens are dropped (the index is undefined)."""
    import pandas as pd
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def per_doc(b: pa.Table) -> pa.Table:
        # fully vectorized tokenization: one split kernel, one
        # parent-index flatten, one empty-token mask — no Python loop
        lists = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(b["text"], pa.scalar(""))),
            pattern="[^a-z]+").combine_chunks()
        parents = pc.list_parent_indices(lists)
        flat = pc.list_flatten(lists)
        mask = pc.not_equal(flat, "")
        toks = flat.filter(mask)
        ids = pc.take(b["doc_id"].combine_chunks(),
                      parents.filter(mask))
        if len(toks) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "num": pa.array([], pa.int64()),
                             "den": pa.array([], pa.int64())})
        df = pd.DataFrame({"d": ids.to_numpy(zero_copy_only=False),
                           "t": toks.to_pandas()})
        c = (df.groupby(["d", "t"], sort=False).size()
             .reset_index(name="n"))
        g = c.groupby("d", sort=False)["n"].agg(
            N="sum", num=lambda s: int((s * (s - 1)).sum()))
        g = g[g["N"] >= 2].reset_index()
        return pa.table({
            "doc_id": pa.array(g["d"], pa.int64()),
            "num": pa.array(g["num"], pa.int64()),
            "den": pa.array(g["N"] * (g["N"] - 1), pa.int64())})

    out = docs.map_batches(per_doc, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_bigram_coverage(sf_dir: str):
    """How much of the corpus the 100 most frequent word bigrams
    cover, as an exact integer fraction (covered_n / total_n bigram
    occurrences).  One corpus pass: per-block bigram partial counts
    (dict combiner) → native grouped Sum; the head comes from
    per-block partial top-k + global sort-limit, the denominator from
    ONE native Sum over the same bounded aggregate — the corpus is
    never re-read and no per-token rows reach the driver."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.collocations import _bigram_counts_batch

    K = 100

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    bi = (docs.map_batches(
        lambda t: _bigram_counts_batch(t, "text"),
        batch_format="pyarrow")
        .groupby(["a", "b"]).aggregate(Sum("n", alias_name="c_ab"))
        .materialize())

    total = int(bi.aggregate(Sum("c_ab", alias_name="m"))["m"] or 0)

    def topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("c_ab", "descending"), ("a", "ascending"),
            ("b", "ascending")])
        return t.take(idx[:K])

    head = (bi.map_batches(topk, batch_format="pyarrow")
            .sort(["c_ab", "a", "b"], descending=[True, False, False])
            .limit(K).to_pandas())
    return pd.DataFrame({
        "covered_n": [int(head["c_ab"].sum())],
        "total_n": [total]})


def _q_doc_hapax_stats(sf_dir: str):
    """Long-tail vocabulary profile: hapax-legomena count (tokens
    occurring exactly once), vocabulary size, and total token count.
    One corpus pass builds the vocabulary-bounded unigram aggregate
    (dict combiner → grouped Sum); all three numbers fold from
    single-row per-block partials over that aggregate — the driver
    sees O(blocks) rows."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.collocations import _unigram_counts_batch

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    uni = (docs.map_batches(
        lambda t: _unigram_counts_batch(t, "text"),
        batch_format="pyarrow")
        .groupby("token").aggregate(Sum("n", alias_name="c")))

    def partial(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_hapax": pa.array([int((c == 1).sum())], pa.int64()),
            "n_vocab": pa.array([len(c)], pa.int64()),
            "n_tokens": pa.array([int(c.sum())], pa.int64())})

    parts = (uni.map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    return pd.DataFrame({
        "n_hapax": [int(parts["n_hapax"].sum())],
        "n_vocab": [int(parts["n_vocab"].sum())],
        "n_tokens": [int(parts["n_tokens"].sum())]})


def _q_url_redirect_chains(sf_dir: str):
    """Redirect-chain resolution by POINTER DOUBLING: each round joins
    the pointer table with itself (ptr ← ptr[ptr], hops ← hops +
    hops[ptr]) via one equi co-group, so a chain of length L resolves
    in ⌈log₂ L⌉ all-to-alls instead of L BFS rounds — the shape that
    matters when crawl redirect chains are thousands of hops of
    URL-shortener spam.  Edges are planted deterministically (doc d is
    a redirect source iff d % 8 != 0, target d−1), giving the oracle a
    closed form; the engine only sees the edge table.  Termination is
    an exact driver-checked aggregate (#rows whose pointer is still a
    source), not a fixed round count."""
    import ray.data as rd

    from xtract.ops.graph import resolve_pointer_chains

    P = 16

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def init(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_src = (d % 8) != 0
        ptr = np.where(is_src, d - 1, d)
        return pa.table({
            "d": pa.array(d, pa.int64()),
            "ptr": pa.array(ptr, pa.int64()),
            "hops": pa.array(is_src.astype(np.int64), pa.int64()),
            "src": pa.array(is_src.astype(np.int64), pa.int64())})

    state = resolve_pointer_chains(
        docs.map_batches(init, batch_format="pyarrow"), partitions=P)

    out = (state.map_batches(
        lambda b: b.filter(pc.equal(b["src"], 1))
        .select(["d", "ptr", "hops"])
        .rename_columns(["doc_id", "final_doc", "hops"]),
        batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_parts_never_ordered(sf_dir: str):
    """Large×large ANTI join without a broadcast: parts with no
    lineitem in 1996-H1.  The lineitem side contributes block-local
    DISTINCT partkeys of the window (combiner); ONE partkey co-group
    does the NOT EXISTS locally — at crawl scale both sides stream,
    nothing is collected."""
    import ray.data as rd

    from xtract.ops.agg import _hash_part

    LO, HI = np.datetime64("1996-01-01", "us"), np.datetime64(
        "1996-07-01", "us")
    P = 64

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey"])

    def p_slim(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "_part": pa.array(_hash_part(b["p_partkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "pk": b["p_partkey"]})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate"])

    def l_slim(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(LO)),
            pc.less(b["l_shipdate"], pa.scalar(HI))))
        pk = pc.unique(t["l_partkey"])
        return pa.table({
            "_part": pa.array(_hash_part(pk, P), pa.int64()),
            "_flag": pa.array(np.ones(len(pk), np.int8)),
            "pk": pk})

    def anti(t: pa.Table) -> pa.Table:
        seen = pc.unique(t.filter(pc.equal(t["_flag"], 1))["pk"])
        p = t.filter(pc.equal(t["_flag"], 0))
        p = p.filter(pc.invert(pc.is_in(p["pk"], value_set=seen)))
        return pa.table({"p_partkey": p["pk"]})

    out = (part.map_batches(p_slim, batch_format="pyarrow")
           .union(li.map_batches(l_slim, batch_format="pyarrow"))
           .groupby("_part").map_groups(anti, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("p_partkey").reset_index(drop=True)


def _q_supplier_balance_pct_rank(sf_dir: str):
    """PERCENT_RANK within nation as exact integer components
    (rank_num = rank − 1, rank_den = partition size − 1): ONE
    nation-hash co-group sorts each nation locally (pandas min-rank on
    cents, tie-stable) — no global sort, no floats, no division."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.agg import _hash_part

    P = 16

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey",
                                    "s_acctbal"])

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "_part": pa.array(_hash_part(pc.cast(
                b["s_nationkey"], pa.int64()), P), pa.int64()),
            "sk": b["s_suppkey"],
            "nk": pc.cast(b["s_nationkey"], pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                b["s_acctbal"], pa.scalar(100.0))), pa.int64())})

    def ranks(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"sk": t["sk"].to_pandas(),
                           "nk": t["nk"].to_pandas(),
                           "cents": t["cents"].to_pandas()})
        df["rank_num"] = (df.groupby("nk", sort=False)["cents"]
                          .rank(method="min").astype("int64") - 1)
        df["rank_den"] = (df.groupby("nk", sort=False)["sk"]
                          .transform("size").astype("int64") - 1)
        return pa.table({
            "s_suppkey": pa.array(df["sk"], pa.int64()),
            "n_nationkey": pa.array(df["nk"], pa.int64()),
            "rank_num": pa.array(df["rank_num"], pa.int64()),
            "rank_den": pa.array(df["rank_den"], pa.int64())})

    out = (supp.map_batches(slim, batch_format="pyarrow")
           .groupby("_part").map_groups(ranks, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("s_suppkey").reset_index(drop=True)


def _q_big_spender_customers(sf_dir: str):
    """ALL-quantifier filter (universal quantification over a group):
    customers with at least 3 orders where EVERY order is >= $50,000.
    min() is the universal quantifier — one combiner-backed native
    grouped Min+Count, then a vectorized Dataset-side filter; nothing
    but the qualifying rows reaches the driver."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    T = 5_000_000  # cents

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "ck": b["o_custkey"],
            "cents": pc.cast(pc.round(pc.multiply(
                b["o_totalprice"], pa.scalar(100.0))), pa.int64())})

    agg = (orders.map_batches(slim, batch_format="pyarrow")
           .groupby("ck").aggregate(Min("cents", alias_name="min_cents"),
                                    Count(alias_name="n_orders")))
    out = (agg.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["min_cents"],
                             pa.scalar(T, pa.int64())),
            pc.greater_equal(b["n_orders"], pa.scalar(3, pa.int64())))),
        batch_format="pyarrow").to_pandas())
    if "ck" not in out.columns:
        out = pd.DataFrame({"ck": pd.Series(dtype="int64"),
                            "min_cents": pd.Series(dtype="int64"),
                            "n_orders": pd.Series(dtype="int64")})
    out = out.rename(columns={"ck": "c_custkey"})
    for c in ("c_custkey", "min_cents", "n_orders"):
        out[c] = out[c].astype("int64")
    return (out[["c_custkey", "n_orders", "min_cents"]]
            .sort_values("c_custkey").reset_index(drop=True))


def _q_source_token_divergence(sf_dir: str):
    """Vocabulary drift between two sources: the 20 tokens most
    over-represented in src0 vs src1 by exact add-one-smoothed ratio
    ``ratio_ppm = (n_a+1)(T_b+V) · 10⁶ // ((n_b+1)(T_a+V))`` (big-int,
    no floats).  One corpus pass builds the vocabulary-bounded
    (token, source) counts; totals are native aggregates over that
    bounded table; ONE token-hash co-group pivots and scores; partial
    top-k + global sort-limit pick the head."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.agg import _hash_part

    A, B, K, P = "src0", "src1", 20, 16

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def counts(b: pa.Table) -> pa.Table:
        from xtract.ops.collocations import _flat_tokens

        t = b.filter(pc.is_in(b["source"], value_set=pa.array([A, B])))
        toks, parents = _flat_tokens(t, "text")
        src = pc.take(t["source"].combine_chunks(), parents)
        df = pd.DataFrame({"token": toks.to_pandas(),
                           "source": src.to_pandas()})
        g = (df.groupby(["token", "source"], sort=False).size()
             .reset_index(name="n"))
        return pa.table({
            "token": pa.array(g["token"], pa.string()),
            "source": pa.array(g["source"], pa.string()),
            "n": pa.array(g["n"], pa.int64())})

    ts = (docs.map_batches(counts, batch_format="pyarrow")
          .groupby(["token", "source"])
          .aggregate(Sum("n", alias_name="n")).materialize())

    def totals(b: pa.Table) -> pa.Table:
        isa = pc.equal(b["source"], A)
        n = b["n"]
        return pa.table({
            "sa": pa.array([pc.sum(pc.if_else(
                isa, n, pa.scalar(0, pa.int64()))).as_py() or 0],
                pa.int64()),
            "sb": pa.array([pc.sum(pc.if_else(
                isa, pa.scalar(0, pa.int64()), n)).as_py() or 0],
                pa.int64())})

    tot = ts.map_batches(totals, batch_format="pyarrow").to_pandas()
    ta, tb = int(tot["sa"].sum()), int(tot["sb"].sum())
    v = (ts.map_batches(
        lambda b: pa.table({"token": pc.unique(b["token"])}),
        batch_format="pyarrow")
        .groupby("token").aggregate(Count(alias_name="_c")).count())

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_part", pa.array(
            _hash_part(b["token"], P), pa.int64()))

    def score(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"token": t["token"].to_pandas(),
                           "source": t["source"].to_pandas(),
                           "n": t["n"].to_pandas()})
        p = (df.pivot_table(index="token", columns="source",
                            values="n", aggfunc="sum", fill_value=0)
             .reindex(columns=[A, B], fill_value=0).reset_index())
        na = p[A].to_numpy().astype(object)
        nb = p[B].to_numpy().astype(object)
        r = [int(((x + 1) * (tb + v) * 1_000_000)
                 // ((y + 1) * (ta + v))) for x, y in zip(na, nb)]
        out = pd.DataFrame({"token": p["token"], "n_a": p[A],
                            "n_b": p[B], "ratio_ppm": r})
        out = out.sort_values(["ratio_ppm", "token"],
                              ascending=[False, True]).head(K)
        return pa.table({
            "token": pa.array(out["token"], pa.string()),
            "n_a": pa.array(out["n_a"], pa.int64()),
            "n_b": pa.array(out["n_b"], pa.int64()),
            "ratio_ppm": pa.array(out["ratio_ppm"], pa.int64())})

    head = (ts.map_batches(tag, batch_format="pyarrow")
            .groupby("_part").map_groups(score, batch_format="pyarrow")
            .sort(["ratio_ppm", "token"], descending=[True, False])
            .limit(K).to_pandas())
    return head.reset_index(drop=True)


def _q_segment_nation_contingency(sf_dir: str):
    """Contingency-table components (χ² inputs) for market segment ×
    nation: observed count plus row/column/grand totals per cell, all
    exact ints.  ONE combiner-backed grouped Count is the only
    all-to-all; the margins are computed on the segments×nations-
    bounded aggregate."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_mktsegment", "c_nationkey"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "seg": b["c_mktsegment"].to_pandas(),
            "nk": pc.cast(b["c_nationkey"], pa.int64())
            .to_numpy(zero_copy_only=False)})
        g = df.groupby(["seg", "nk"], sort=False).size().reset_index(
            name="n")
        return pa.table({"seg": pa.array(g["seg"], pa.string()),
                         "nk": pa.array(g["nk"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64())})

    agg = (cust.map_batches(partial, batch_format="pyarrow")
           .groupby(["seg", "nk"]).aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    agg["row_total"] = agg.groupby("seg")["n"].transform("sum")
    agg["col_total"] = agg.groupby("nk")["n"].transform("sum")
    agg["grand_total"] = int(agg["n"].sum())
    out = pd.DataFrame({
        "c_mktsegment": agg["seg"].astype(str),
        "c_nationkey": agg["nk"].astype("int64"),
        "n": agg["n"].astype("int64"),
        "row_total": agg["row_total"].astype("int64"),
        "col_total": agg["col_total"].astype("int64"),
        "grand_total": agg["grand_total"].astype("int64")})
    return (out.sort_values(["c_mktsegment", "c_nationkey"])
            .reset_index(drop=True))


def _q_doc_tree_rollup(sf_dir: str):
    """Hierarchy (subtree) aggregation over a planted 4-ary category
    tree (parent(d) = d // 4, root 0): every node's subtree character
    total and descendant count.  Because the parent function is
    computable, each row EXPLODES its own ancestor chain vectorized
    (≤ log₄ N pairs per row — no iteration, no driver tree) and ONE
    native grouped Sum finishes; the oracle is a recursive CTE."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])

    def ancestors(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = b["n_chars"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        nodes, chars = [d], [ch]
        cur, val = d, ch
        while True:
            live = cur != 0
            if not live.any():
                break
            cur = cur[live] // 4
            val = val[live]
            nodes.append(cur)
            chars.append(val)
        return pa.table({
            "node": pa.array(np.concatenate(nodes), pa.int64()),
            "chars": pa.array(np.concatenate(chars), pa.int64()),
            "one": pa.array(np.ones(sum(len(x) for x in nodes),
                                    np.int64))})

    out = (docs.map_batches(ancestors, batch_format="pyarrow")
           .groupby("node")
           .aggregate(Sum("chars", alias_name="subtree_chars"),
                      Sum("one", alias_name="n_desc"))
           .to_pandas())
    out = out.rename(columns={"node": "doc_id"})
    for c in ("doc_id", "subtree_chars", "n_desc"):
        out[c] = out[c].astype("int64")
    return (out[["doc_id", "subtree_chars", "n_desc"]]
            .sort_values("doc_id").reset_index(drop=True))


def _q_part_popularity_gini(sf_dir: str):
    """Exact integer Gini coefficient of lineitem-count concentration
    across parts: num = 2·Σ i·xᵢ − (n+1)·Σx, den = n·Σx over the
    ascending-sorted per-part counts.  The per-part aggregate is ONE
    combiner-backed grouped Count (catalog-bounded); the rank-weighted
    sum runs on that bounded table with Python big ints — ties don't
    affect the value (equal x swap preserves Σ i·x)."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(zero_copy_only=False)})
        g = df.groupby("pk", sort=False).size().reset_index(name="n")
        return pa.table({"pk": pa.array(g["pk"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64())})

    agg = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("pk").aggregate(Sum("n", alias_name="x"))
           .to_pandas())  # part-catalog-bounded
    x = np.sort(agg["x"].to_numpy().astype("int64"))
    n = len(x)
    sx = int(x.sum())
    ixs = int(sum(int(i + 1) * int(v) for i, v in enumerate(x)))
    return pd.DataFrame({
        "gini_num": [2 * ixs - (n + 1) * sx],
        "gini_den": [n * sx],
        "n_parts": [n]})


def _q_customer_revenue_concentration(sf_dir: str):
    """Revenue concentration report: what share of total order value
    the top 1% / 5% / 10% of customers hold (exact integer cents,
    num/den — no division).  ONE combiner-backed grouped Sum builds
    the customer-bounded spend table; it is sorted ONCE (materialized)
    and each percentile head is a limit + native Sum — the driver
    never sees per-customer rows."""
    import math

    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            b["o_totalprice"], pa.scalar(100.0))), pa.int64())
        df = pd.DataFrame({
            "ck": b["o_custkey"].to_numpy(zero_copy_only=False),
            "c": cents.to_numpy(zero_copy_only=False)})
        g = df.groupby("ck", sort=False)["c"].sum().reset_index()
        return pa.table({"ck": pa.array(g["ck"], pa.int64()),
                         "c": pa.array(g["c"], pa.int64())})

    spend = (orders.map_batches(partial, batch_format="pyarrow")
             .groupby("ck").aggregate(Sum("c", alias_name="cents")))
    ranked = spend.sort(["cents", "ck"],
                        descending=[True, False]).materialize()
    n = ranked.count()
    total = int(ranked.aggregate(Sum("cents", alias_name="t"))["t"]
                or 0)
    rows = []
    for p in (1, 5, 10):
        k = math.ceil(n * p / 100)
        top = int(ranked.limit(k)
                  .aggregate(Sum("cents", alias_name="t"))["t"] or 0)
        rows.append((p, k, top, total))
    return pd.DataFrame(rows, columns=["pct", "top_n", "top_cents",
                                       "total_cents"])


def _q_order_fulfillment_lag(sf_dir: str):
    """Days from order placement to FIRST shipment, rolled up per
    order priority (n / Σ / min / max of the day lag).  Lineitem
    pre-reduces to per-order min ship date inside every block
    (combiner); ONE orderkey co-group joins the order date and
    priority and emits bounded per-priority partials; a native grouped
    Sum/Min/Max folds them — exact integer days."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    from xtract.ops.agg import _hash_part

    P = 64
    DAY = 86_400_000_000

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def o_slim(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "_part": pa.array(_hash_part(b["o_orderkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "ok": b["o_orderkey"],
            "od": pc.cast(pc.divide(pc.cast(b["o_orderdate"],
                                            pa.int64()),
                                    pa.scalar(DAY, pa.int64())),
                          pa.int64()),
            "prio": b["o_orderpriority"]})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def l_partial(b: pa.Table) -> pa.Table:
        sd = pc.cast(pc.divide(pc.cast(b["l_shipdate"], pa.int64()),
                               pa.scalar(DAY, pa.int64())), pa.int64())
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "sd": sd.to_numpy(zero_copy_only=False)})
        g = df.groupby("ok", sort=False)["sd"].min().reset_index()
        n = len(g)
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(g["ok"]), P),
                              pa.int64()),
            "_flag": pa.array(np.ones(n, np.int8)),
            "ok": pa.array(g["ok"], pa.int64()),
            "od": pa.array(g["sd"], pa.int64()),
            "prio": pa.nulls(n, pa.string())})

    def lag(t: pa.Table) -> pa.Table:
        ot = t.filter(pc.equal(t["_flag"], 0))
        lt = t.filter(pc.equal(t["_flag"], 1))
        O = pd.DataFrame({"ok": ot["ok"].to_pandas(),
                          "od": ot["od"].to_pandas(),
                          "prio": ot["prio"].to_pandas()})
        L = (pd.DataFrame({"ok": lt["ok"].to_pandas(),
                           "sd": lt["od"].to_pandas()})
             .groupby("ok", sort=False)["sd"].min().reset_index())
        m = O.merge(L, on="ok")
        m["lag"] = m["sd"] - m["od"]
        g = m.groupby("prio", sort=False)["lag"].agg(
            ["count", "sum", "min", "max"]).reset_index()
        return pa.table({
            "o_orderpriority": pa.array(g["prio"], pa.string()),
            "n_orders": pa.array(g["count"], pa.int64()),
            "sum_days": pa.array(g["sum"], pa.int64()),
            "min_days": pa.array(g["min"], pa.int64()),
            "max_days": pa.array(g["max"], pa.int64())})

    out = (orders.map_batches(o_slim, batch_format="pyarrow")
           .union(li.map_batches(l_partial, batch_format="pyarrow"))
           .groupby("_part").map_groups(lag, batch_format="pyarrow")
           .groupby("o_orderpriority")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("sum_days", alias_name="sum_days"),
                      Min("min_days", alias_name="min_days"),
                      Max("max_days", alias_name="max_days"))
           .to_pandas())
    for c in ("n_orders", "sum_days", "min_days", "max_days"):
        out[c] = out[c].astype("int64")
    return (out[["o_orderpriority", "n_orders", "sum_days",
                 "min_days", "max_days"]]
            .sort_values("o_orderpriority").reset_index(drop=True))


def _q_user_path_signatures(sf_dir: str):
    """Behavioral path mining: the 20 most common signatures formed by
    each user's first five event types in (ts, event_id) order.  ONE
    user-hash co-group sorts each user's events locally and builds the
    signature string vectorized; a bounded grouped Sum counts
    signatures; partial top-k + sort-limit pick the head.  Ties in ts
    break on event_id, so the signature is deterministic."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.agg import _hash_part

    K, P, H = 20, 64, 5

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "_part": pa.array(_hash_part(b["user_id"], P), pa.int64()),
            "u": b["user_id"],
            "t": pc.cast(b["ts"], pa.int64()),
            "e": b["event_id"],
            "ty": b["event_type"]})

    def sig(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"u": t["u"].to_pandas(),
                            "t": t["t"].to_pandas(),
                            "e": t["e"].to_pandas(),
                            "ty": t["ty"].to_pandas()})
              .sort_values(["u", "t", "e"]))
        head = df.groupby("u", sort=False).head(H)
        s = (head.groupby("u", sort=False)["ty"]
             .agg(lambda x: ">".join(x)).reset_index(name="sig"))
        g = s.groupby("sig", sort=False).size().reset_index(name="n")
        return pa.table({"sig": pa.array(g["sig"], pa.string()),
                         "n": pa.array(g["n"], pa.int64())})

    counts = (ev.map_batches(slim, batch_format="pyarrow")
              .groupby("_part").map_groups(sig, batch_format="pyarrow")
              .groupby("sig").aggregate(Sum("n", alias_name="n_users")))

    def topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[
            ("n_users", "descending"), ("sig", "ascending")])
        return b.take(idx[:K])

    head = (counts.map_batches(topk, batch_format="pyarrow")
            .sort(["n_users", "sig"], descending=[True, False])
            .limit(K).to_pandas())
    head["n_users"] = head["n_users"].astype("int64")
    return head[["sig", "n_users"]].reset_index(drop=True)


def _q_event_time_weighted_value(sf_dir: str):
    """Time-weighted value (each event's cents weighted by its
    dwell — microseconds until the user's next event): num = Σ
    gap·cents, den = Σ gap, exact ints.  ONE user-hash co-group sorts
    each user's stream ((ts, event_id) tie-break) and emits a two-int
    partial per partition; the driver folds ≤P rows."""
    import pandas as pd
    import ray.data as rd

    from xtract.ops.agg import _hash_part

    P = 64

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "_part": pa.array(_hash_part(b["user_id"], P), pa.int64()),
            "u": b["user_id"],
            "t": pc.cast(b["ts"], pa.int64()),
            "e": b["event_id"],
            "c": pc.cast(pc.round(pc.multiply(
                b["value"], pa.scalar(100.0))), pa.int64())})

    def weight(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"u": t["u"].to_pandas(),
                            "t": t["t"].to_pandas(),
                            "e": t["e"].to_pandas(),
                            "c": t["c"].to_pandas()})
              .sort_values(["u", "t", "e"]))
        nxt = df.groupby("u", sort=False)["t"].shift(-1)
        gap = (nxt - df["t"]).dropna().astype("int64")
        c = df["c"][gap.index].astype("int64")
        # exact big-int products (gap·cents can pass 2^63 at scale)
        num = int((gap.astype(object) * c.astype(object)).sum())
        return pa.table({
            "num": pa.array([num], pa.int64()),
            "den": pa.array([int(gap.sum())], pa.int64())})

    parts = (ev.map_batches(slim, batch_format="pyarrow")
             .groupby("_part").map_groups(weight,
                                          batch_format="pyarrow")
             .to_pandas())
    return pd.DataFrame({"twv_num": [int(parts["num"].sum())],
                         "twv_den": [int(parts["den"].sum())]})


def _q_orders_weekday_profile(sf_dir: str):
    """Order volume and value by day of week — the weekday is computed
    arithmetically ((epoch_days + 4) % 7, Monday=0) so the engine and
    the oracle share one definition with no calendar-kernel ambiguity.
    One vectorized pass + ONE bounded grouped Sum."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    DAY = 86_400_000_000

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        days = pc.divide(pc.cast(b["o_orderdate"], pa.int64()),
                         pa.scalar(DAY, pa.int64()))
        wd = pc.subtract(pc.add(days, pa.scalar(3, pa.int64())),
                         pc.multiply(pc.divide(pc.add(
                             days, pa.scalar(3, pa.int64())),
                             pa.scalar(7, pa.int64())),
                             pa.scalar(7, pa.int64())))
        cents = pc.cast(pc.round(pc.multiply(
            b["o_totalprice"], pa.scalar(100.0))), pa.int64())
        df = pd.DataFrame({
            "wd": wd.to_numpy(zero_copy_only=False),
            "c": cents.to_numpy(zero_copy_only=False)})
        g = df.groupby("wd", sort=False)["c"].agg(["count", "sum"])
        g = g.reset_index()
        return pa.table({
            "weekday": pa.array(g["wd"], pa.int64()),
            "n_orders": pa.array(g["count"], pa.int64()),
            "revenue_cents": pa.array(g["sum"], pa.int64())})

    out = (orders.map_batches(partial, batch_format="pyarrow")
           .groupby("weekday")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("revenue_cents", alias_name="revenue_cents"))
           .to_pandas())
    for c in ("weekday", "n_orders", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return (out[["weekday", "n_orders", "revenue_cents"]]
            .sort_values("weekday").reset_index(drop=True))


def _q_returns_rate_by_month(sf_dir: str):
    """Monthly return rate as exact integer fractions: per ship month,
    returned ('R') lineitem count and value vs totals.  One vectorized
    pass with block-local per-month partials → ONE bounded grouped
    Sum — four integers per month, no division."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate", "l_returnflag",
                                  "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        ym = pc.add(pc.multiply(pc.cast(pc.year(b["l_shipdate"]),
                                        pa.int64()),
                                pa.scalar(12, pa.int64())),
                    pc.cast(pc.subtract(pc.month(b["l_shipdate"]),
                                        pa.scalar(1)), pa.int64()))
        r = pc.cast(pc.equal(b["l_returnflag"], "R"), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            b["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        df = pd.DataFrame({
            "ym": ym.to_numpy(zero_copy_only=False),
            "r": r.to_numpy(zero_copy_only=False),
            "c": cents.to_numpy(zero_copy_only=False)})
        df["rc"] = df["r"] * df["c"]
        g = df.groupby("ym", sort=False).agg(
            n=("r", "size"), n_ret=("r", "sum"),
            cents=("c", "sum"), ret_cents=("rc", "sum")).reset_index()
        return pa.table({
            "ym": pa.array(g["ym"], pa.int64()),
            "n_items": pa.array(g["n"], pa.int64()),
            "n_returned": pa.array(g["n_ret"], pa.int64()),
            "cents": pa.array(g["cents"], pa.int64()),
            "returned_cents": pa.array(g["ret_cents"], pa.int64())})

    out = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("ym")
           .aggregate(Sum("n_items", alias_name="n_items"),
                      Sum("n_returned", alias_name="n_returned"),
                      Sum("cents", alias_name="cents"),
                      Sum("returned_cents", alias_name="returned_cents"))
           .to_pandas())
    out["ship_year"] = (out["ym"] // 12).astype("int64")
    out["ship_month"] = (out["ym"] % 12 + 1).astype("int64")
    for c in ("n_items", "n_returned", "cents", "returned_cents"):
        out[c] = out[c].astype("int64")
    return (out[["ship_year", "ship_month", "n_items", "n_returned",
                 "cents", "returned_cents"]]
            .sort_values(["ship_year", "ship_month"])
            .reset_index(drop=True))


def _q_nation_order_count_moments(sf_dir: str):
    """Aggregate-of-aggregate: exact moments (n, Σx, Σx²) of the
    per-customer ORDER COUNT distribution within each nation —
    zero-order customers included.  Orders pre-count per custkey in
    every block (combiner); ONE custkey co-group left-joins customers
    and emits bounded per-nation partials; a native grouped Sum folds
    them.  Variance/mean are derivable from the three integers without
    any float leaving the engine."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.agg import _hash_part

    P = 64

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def c_slim(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "_part": pa.array(_hash_part(b["c_custkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "ck": b["c_custkey"],
            "nk": pc.cast(b["c_nationkey"], pa.int64())})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def o_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ck": b["o_custkey"].to_numpy(zero_copy_only=False)})
        g = df.groupby("ck", sort=False).size().reset_index(name="n")
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(g["ck"]), P),
                              pa.int64()),
            "_flag": pa.array(np.ones(len(g), np.int8)),
            "ck": pa.array(g["ck"], pa.int64()),
            "nk": pa.array(g["n"], pa.int64())})  # nk reused as count

    def moments(t: pa.Table) -> pa.Table:
        ct = t.filter(pc.equal(t["_flag"], 0))
        ot = t.filter(pc.equal(t["_flag"], 1))
        C = pd.DataFrame({"ck": ct["ck"].to_pandas(),
                          "nk": ct["nk"].to_pandas()})
        O = (pd.DataFrame({"ck": ot["ck"].to_pandas(),
                           "n": ot["nk"].to_pandas()})
             .groupby("ck", sort=False)["n"].sum())
        C["x"] = C.join(O, on="ck")["n"].fillna(0).astype("int64")
        C["x2"] = C["x"] * C["x"]
        g = C.groupby("nk", sort=False).agg(
            n_customers=("x", "size"), sum_orders=("x", "sum"),
            sum_orders_sq=("x2", "sum")).reset_index()
        return pa.table({
            "nationkey": pa.array(g["nk"], pa.int64()),
            "n_customers": pa.array(g["n_customers"], pa.int64()),
            "sum_orders": pa.array(g["sum_orders"], pa.int64()),
            "sum_orders_sq": pa.array(g["sum_orders_sq"], pa.int64())})

    out = (cust.map_batches(c_slim, batch_format="pyarrow")
           .union(orders.map_batches(o_partial, batch_format="pyarrow"))
           .groupby("_part").map_groups(moments, batch_format="pyarrow")
           .groupby("nationkey")
           .aggregate(Sum("n_customers", alias_name="n_customers"),
                      Sum("sum_orders", alias_name="sum_orders"),
                      Sum("sum_orders_sq", alias_name="sum_orders_sq"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return (out[["nationkey", "n_customers", "sum_orders",
                 "sum_orders_sq"]]
            .sort_values("nationkey").reset_index(drop=True))


def _q_event_type_peak_rate(sf_dir: str):
    """Exact sliding-window burst detection: for each event type, the
    maximum number of events inside ANY one-hour window (windows
    anchored at events).  ONE type co-group sorts each type's
    timestamps and runs a vectorized two-pointer sweep
    (searchsorted of t+1h against the sorted array) — no window
    explosion, no self-join; each partition emits one row per type."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Max

    H = 3_600_000_000

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({"ty": b["event_type"],
                         "t": pc.cast(b["ts"], pa.int64())})

    def peak(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"ty": t["ty"].to_pandas(),
                           "t": t["t"].to_pandas()})
        rows = []
        for ty, g in df.groupby("ty", sort=False):
            ts = np.sort(g["t"].to_numpy())
            hi = np.searchsorted(ts, ts + H, side="left")
            rows.append((ty, int((hi - np.arange(len(ts))).max())))
        out = pd.DataFrame(rows, columns=["event_type", "peak"])
        return pa.table({
            "event_type": pa.array(out["event_type"], pa.string()),
            "peak_events": pa.array(out["peak"], pa.int64())})

    out = (ev.map_batches(slim, batch_format="pyarrow")
           .groupby("ty").map_groups(peak, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Max("peak_events", alias_name="peak_events"))
           .to_pandas())
    out["peak_events"] = out["peak_events"].astype("int64")
    return (out[["event_type", "peak_events"]]
            .sort_values("event_type").reset_index(drop=True))


def _q_orders_rolling_3mo_revenue(sf_dir: str):
    """Rolling 3-row revenue window over the months-bounded aggregate
    (LAG-family window on a grouped result): ONE combiner-backed
    grouped Sum builds per-month cents; the ROWS-frame rolling sum
    runs on that bounded table — exact ints."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        ym = pc.add(pc.multiply(pc.cast(pc.year(b["o_orderdate"]),
                                        pa.int64()),
                                pa.scalar(12, pa.int64())),
                    pc.cast(pc.subtract(pc.month(b["o_orderdate"]),
                                        pa.scalar(1)), pa.int64()))
        cents = pc.cast(pc.round(pc.multiply(
            b["o_totalprice"], pa.scalar(100.0))), pa.int64())
        df = pd.DataFrame({
            "ym": ym.to_numpy(zero_copy_only=False),
            "c": cents.to_numpy(zero_copy_only=False)})
        g = df.groupby("ym", sort=False)["c"].sum().reset_index()
        return pa.table({"ym": pa.array(g["ym"], pa.int64()),
                         "c": pa.array(g["c"], pa.int64())})

    agg = (orders.map_batches(partial, batch_format="pyarrow")
           .groupby("ym").aggregate(Sum("c", alias_name="revenue_cents"))
           .to_pandas().sort_values("ym").reset_index(drop=True))
    agg["rolling3_cents"] = (agg["revenue_cents"]
                             .rolling(3, min_periods=1).sum()
                             .astype("int64"))
    out = pd.DataFrame({
        "o_year": (agg["ym"] // 12).astype("int64"),
        "o_month": (agg["ym"] % 12 + 1).astype("int64"),
        "revenue_cents": agg["revenue_cents"].astype("int64"),
        "rolling3_cents": agg["rolling3_cents"]})
    return out.reset_index(drop=True)


def _q_event_value_first_digit(sf_dir: str):
    """Benford first-digit profile of event values (data-quality /
    fraud screen): leading digit of the integer cents, counted
    exactly.  The digit comes from one vectorized string-slice kernel
    (no float log10); block partials fold through ONE bounded grouped
    Sum."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            b["value"], pa.scalar(100.0))), pa.int64())
        digit = pc.utf8_slice_codeunits(
            pc.cast(cents, pa.string()), 0, 1)
        df = pd.DataFrame({"d": digit.to_pandas()})
        g = df.groupby("d", sort=False).size().reset_index(name="n")
        return pa.table({"d": pa.array(g["d"], pa.string()),
                         "n": pa.array(g["n"], pa.int64())})

    out = (ev.map_batches(partial, batch_format="pyarrow")
           .groupby("d").aggregate(Sum("n", alias_name="n_events"))
           .to_pandas())
    out = out.rename(columns={"d": "first_digit"})
    out["n_events"] = out["n_events"].astype("int64")
    return (out[["first_digit", "n_events"]]
            .sort_values("first_digit").reset_index(drop=True))


def _q_event_type_user_overlap(sf_dir: str):
    """Pairwise audience overlap: for every ordered pair of event
    types (a <= b), how many users did both.  Per-user type bitmasks
    come from ONE grouped Max (block combiner first); each block of
    the user-bounded mask table then emits bounded pair partials
    (types² rows) via one vectorized outer product — the driver folds
    a types²-bounded aggregate."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    TYPES = ["click", "error", "purchase", "signup", "view"]

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def flags(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": b["user_id"].to_numpy(zero_copy_only=False),
            "ty": b["event_type"].to_pandas()})
        ct = (pd.crosstab(df["u"], df["ty"]).clip(upper=1)
              .reindex(columns=TYPES, fill_value=0).reset_index())
        tab = {"u": pa.array(ct["u"], pa.int64())}
        for t in TYPES:
            tab[t] = pa.array(ct[t].to_numpy().astype("int64"))
        return pa.table(tab)

    masks = (ev.map_batches(flags, batch_format="pyarrow")
             .groupby("u").aggregate(*[
                 Max(t, alias_name=t) for t in TYPES]))

    def pairs(b: pa.Table) -> pa.Table:
        m = np.column_stack([
            b[t].to_numpy(zero_copy_only=False) for t in TYPES])
        co = m.T @ m  # types x types co-occurrence counts
        rows = []
        for i, a in enumerate(TYPES):
            for j in range(i, len(TYPES)):
                rows.append((a, TYPES[j], int(co[i, j])))
        df = pd.DataFrame(rows, columns=["type_a", "type_b", "n"])
        return pa.table({
            "k": pa.array(df["type_a"] + "|" + df["type_b"]),
            "n": pa.array(df["n"], pa.int64())})

    agg = (masks.map_batches(pairs, batch_format="pyarrow")
           .groupby("k").aggregate(Sum("n", alias_name="n_users"))
           .to_pandas())
    kv = agg["k"].str.split("|", expand=True)
    out = pd.DataFrame({"type_a": kv[0], "type_b": kv[1],
                        "n_users": agg["n_users"].astype("int64")})
    return (out.sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


def _q_lineitem_tax_discount_grid(sf_dir: str):
    """2-D histogram: lineitem counts and value over the (tax
    basis-point band × discount basis-point band) grid — one
    vectorized banding pass, block partials, ONE bounded grouped
    Sum."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_tax", "l_discount",
                                  "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        tax = pc.cast(pc.round(pc.multiply(
            b["l_tax"], pa.scalar(10_000.0))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            b["l_discount"], pa.scalar(10_000.0))), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            b["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        df = pd.DataFrame({
            "tb": (tax.to_numpy(zero_copy_only=False) // 200),
            "db": (disc.to_numpy(zero_copy_only=False) // 200),
            "c": cents.to_numpy(zero_copy_only=False)})
        g = df.groupby(["tb", "db"], sort=False)["c"].agg(
            ["count", "sum"]).reset_index()
        return pa.table({
            "tax_band": pa.array(g["tb"], pa.int64()),
            "discount_band": pa.array(g["db"], pa.int64()),
            "n_items": pa.array(g["count"], pa.int64()),
            "cents": pa.array(g["sum"], pa.int64())})

    out = (li.map_batches(partial, batch_format="pyarrow")
           .groupby(["tax_band", "discount_band"])
           .aggregate(Sum("n_items", alias_name="n_items"),
                      Sum("cents", alias_name="cents"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return (out[["tax_band", "discount_band", "n_items", "cents"]]
            .sort_values(["tax_band", "discount_band"])
            .reset_index(drop=True))


def _q_customer_repeat_rate_by_segment(sf_dir: str):
    """Repeat-buyer rate per market segment as exact integer
    fractions (n_repeat / n_customers): orders pre-count per custkey
    in every block (combiner); ONE custkey co-group left-joins the
    segment and emits bounded per-segment partials; a native grouped
    Sum folds them — zero-order customers count in the denominator."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.agg import _hash_part

    P = 64

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])

    def c_slim(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "_part": pa.array(_hash_part(b["c_custkey"], P), pa.int64()),
            "_flag": pa.array(np.zeros(n, np.int8)),
            "ck": b["c_custkey"],
            "seg": b["c_mktsegment"],
            "n": pa.nulls(n, pa.int64())})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def o_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ck": b["o_custkey"].to_numpy(zero_copy_only=False)})
        g = df.groupby("ck", sort=False).size().reset_index(name="n")
        m = len(g)
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(g["ck"]), P),
                              pa.int64()),
            "_flag": pa.array(np.ones(m, np.int8)),
            "ck": pa.array(g["ck"], pa.int64()),
            "seg": pa.nulls(m, pa.string()),
            "n": pa.array(g["n"], pa.int64())})

    def rates(t: pa.Table) -> pa.Table:
        ct = t.filter(pc.equal(t["_flag"], 0))
        ot = t.filter(pc.equal(t["_flag"], 1))
        C = pd.DataFrame({"ck": ct["ck"].to_pandas(),
                          "seg": ct["seg"].to_pandas()})
        O = (pd.DataFrame({"ck": ot["ck"].to_pandas(),
                           "n": ot["n"].to_pandas()})
             .groupby("ck", sort=False)["n"].sum())
        C["x"] = C.join(O, on="ck")["n"].fillna(0).astype("int64")
        g = C.groupby("seg", sort=False)["x"].agg(
            n_customers="size",
            n_repeat=lambda s: int((s >= 2).sum())).reset_index()
        return pa.table({
            "c_mktsegment": pa.array(g["seg"], pa.string()),
            "n_customers": pa.array(g["n_customers"], pa.int64()),
            "n_repeat": pa.array(g["n_repeat"], pa.int64())})

    out = (cust.map_batches(c_slim, batch_format="pyarrow")
           .union(orders.map_batches(o_partial, batch_format="pyarrow"))
           .groupby("_part").map_groups(rates, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Sum("n_customers", alias_name="n_customers"),
                      Sum("n_repeat", alias_name="n_repeat"))
           .to_pandas())
    for c in ("n_customers", "n_repeat"):
        out[c] = out[c].astype("int64")
    return (out[["c_mktsegment", "n_customers", "n_repeat"]]
            .sort_values("c_mktsegment").reset_index(drop=True))


def _q_events_anomalous_users(sf_dir: str):
    """Outlier users by activity: users whose event count exceeds
    1.2× the MEDIAN per-user count (exact integer rule
    ``5·n > 6·median`` — no float threshold).  Composition of bounded
    pieces: ONE grouped Count builds the user-bounded activity table;
    its count-of-counts histogram (value-domain-bounded) gives the
    exact discrete median; one vectorized filter finishes — per-user
    rows never hit the driver."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])
    per_user = (ev.map_batches(
        lambda b: pa.table({"u": b["user_id"]}),
        batch_format="pyarrow")
        .groupby("u").aggregate(Count(alias_name="n")).materialize())

    hist = (per_user.map_batches(
        lambda b: pa.table({"n": b["n"]}), batch_format="pyarrow")
        .groupby("n").aggregate(Count(alias_name="w")).to_pandas())
    med = _disc_quantile(hist["n"].to_numpy(), hist["w"].to_numpy())

    out = (per_user.map_batches(
        lambda b: b.filter(pc.greater(
            pc.multiply(b["n"], pa.scalar(5, pa.int64())),
            pa.scalar(6 * med, pa.int64()))),
        batch_format="pyarrow").to_pandas())
    if "u" not in out.columns:
        out = pd.DataFrame({"u": pd.Series(dtype="int64"),
                            "n": pd.Series(dtype="int64")})
    out = out.rename(columns={"u": "user_id", "n": "n_events"})
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return (out[["user_id", "n_events"]]
            .sort_values("user_id").reset_index(drop=True))


def _pareto_2d(day: np.ndarray, cents: np.ndarray):
    """Strict-dominance 2-D skyline (minimize day, maximize cents):
    keep (d, c) iff no other point has day <= d, cents >= c with one
    strict.  Vectorized: sort by (day asc, cents desc); a point
    survives iff its cents strictly exceeds the running max of all
    points on EARLIER days, and it is the max of its own day."""
    order = np.lexsort((-cents, day))
    d, c = day[order], cents[order]
    keep = np.zeros(len(d), bool)
    best = np.int64(np.iinfo(np.int64).min)
    i = 0
    while i < len(d):
        j = i
        while j < len(d) and d[j] == d[i]:
            j += 1
        if c[i] > best:       # day-group max (first in group) wins
            keep[i] = True
            best = c[i]
        i = j
    return d[keep], c[keep]


def _q_orders_pareto_frontier(sf_dir: str):
    """Pareto frontier (skyline) of orders over (earliest date,
    highest value): the set of orders no other order dominates.
    Scale shape: skyline-of-skylines is exact, so every block emits
    its PARTIAL skyline (vectorized sort + running max — typically a
    tiny fraction of the block) and only those survivors are gated
    and folded once on the driver; the corpus is read once and the
    exchange carries frontier candidates only."""
    import pandas as pd
    import ray.data as rd

    DAY = 86_400_000_000

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.divide(pc.cast(b["o_orderdate"], pa.int64()),
                                pa.scalar(DAY, pa.int64())),
                      pa.int64()).to_numpy(zero_copy_only=False)
        cents = pc.cast(pc.round(pc.multiply(
            b["o_totalprice"], pa.scalar(100.0))),
            pa.int64()).to_numpy(zero_copy_only=False)
        d, c = _pareto_2d(day, cents)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "cents": pa.array(c, pa.int64())})

    cand = (orders.map_batches(partial, batch_format="pyarrow")
            .limit(1_000_001).to_pandas())
    assert len(cand) <= 1_000_000, "skyline candidates exceed gate"
    d, c = _pareto_2d(cand["day"].to_numpy(), cand["cents"].to_numpy())
    out = pd.DataFrame({"order_day": d.astype("int64"),
                        "totalprice_cents": c.astype("int64")})
    return out.sort_values("order_day").reset_index(drop=True)


def _q_users_all_event_types(sf_dir: str):
    """Relational division over behavior: how many users performed
    EVERY event type in the catalog.  The divisor cardinality is one
    bounded distinct-count; per-user distinct-type counts come from a
    block combiner + ONE grouped Count over distinct (user, type)
    pairs; a vectorized equality filter + Count finishes."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    n_types = (ev.map_batches(
        lambda b: pa.table({"t": pc.unique(b["event_type"])}),
        batch_format="pyarrow").groupby("t")
        .aggregate(Count(alias_name="_n")).count())

    def pairs(b: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
            "u": b["user_id"].to_numpy(zero_copy_only=False),
            "t": b["event_type"].to_pandas()}).drop_duplicates())
        return pa.table({"k": pa.array(
            df["u"].astype(str) + ":" + df["t"])})

    per_user = (ev.map_batches(pairs, batch_format="pyarrow")
                .groupby("k").aggregate(Count(alias_name="_n"))
                .map_batches(lambda b: pa.table({
                    "u": pc.cast(pc.replace_substring_regex(
                        b["k"], pattern=":.*$", replacement=""),
                        pa.int64())}), batch_format="pyarrow")
                .groupby("u").aggregate(Count(alias_name="nt")))
    n = (per_user.map_batches(
        lambda b: pa.table({"one": pa.array([len(b.filter(pc.equal(
            b["nt"], pa.scalar(n_types, pa.int64()))))], pa.int64())}),
        batch_format="pyarrow").to_pandas())
    return pd.DataFrame({"n_users": [int(n["one"].sum())]})


def _q_order_priority_mix_shift(sf_dir: str):
    """Priority-mix drift: per (year, priority) order counts with the
    year total attached as an exact denominator (window-on-aggregate —
    the share is num/den, no floats).  One combiner-backed grouped Sum
    over a composite bounded key; margins on the years×priorities
    aggregate."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_orderpriority"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "y": pc.cast(pc.year(b["o_orderdate"]),
                         pa.int64()).to_numpy(zero_copy_only=False),
            "p": b["o_orderpriority"].to_pandas()})
        g = df.groupby(["y", "p"], sort=False).size().reset_index(
            name="n")
        return pa.table({"y": pa.array(g["y"], pa.int64()),
                         "p": pa.array(g["p"], pa.string()),
                         "n": pa.array(g["n"], pa.int64())})

    agg = (orders.map_batches(partial, batch_format="pyarrow")
           .groupby(["y", "p"]).aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    agg["year_total"] = agg.groupby("y")["n"].transform("sum")
    out = pd.DataFrame({
        "o_year": agg["y"].astype("int64"),
        "o_orderpriority": agg["p"].astype(str),
        "n_orders": agg["n"].astype("int64"),
        "year_total": agg["year_total"].astype("int64")})
    return (out.sort_values(["o_year", "o_orderpriority"])
            .reset_index(drop=True))


def _q_daily_new_users(sf_dir: str):
    """Growth curve: users seen for the FIRST time each day.  Per-user
    first day is a combiner-backed native grouped Min; a bounded
    grouped Count per day finishes — two exchanges, both carrying at
    most one row per user / per day."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    DAY = 86_400_000_000

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def slim(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.divide(pc.cast(b["ts"], pa.int64()),
                                pa.scalar(DAY, pa.int64())), pa.int64())
        df = (pd.DataFrame({
            "u": b["user_id"].to_numpy(zero_copy_only=False),
            "d": day.to_numpy(zero_copy_only=False)})
            .groupby("u", sort=False)["d"].min().reset_index())
        return pa.table({"u": pa.array(df["u"], pa.int64()),
                         "d": pa.array(df["d"], pa.int64())})

    out = (ev.map_batches(slim, batch_format="pyarrow")
           .groupby("u").aggregate(Min("d", alias_name="first_day"))
           .groupby("first_day").aggregate(Count(alias_name="n_new"))
           .to_pandas())
    out["first_day"] = out["first_day"].astype("int64")
    out["n_new"] = out["n_new"].astype("int64")
    return (out[["first_day", "n_new"]].sort_values("first_day")
            .reset_index(drop=True))


def _q_daily_churned_users(sf_dir: str):
    """Day-over-day churn: users active on day D with NO activity on
    D+1 (for days that have a successor in the data).  ONE user-hash
    co-group sees each user's distinct active days and counts
    lapse transitions locally; a bounded grouped Sum folds per-day
    partials."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.agg import _hash_part

    P = 64

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def slim(b: pa.Table) -> pa.Table:
        wk = pc.divide(pc.cast(b["ts"], pa.int64()),
                       pa.scalar(86_400_000_000, pa.int64()))
        df = (pd.DataFrame({
            "u": b["user_id"].to_numpy(zero_copy_only=False),
            "m": pc.cast(wk, pa.int64()).to_numpy(zero_copy_only=False)})
            .drop_duplicates())
        return pa.table({
            "_part": pa.array(_hash_part(pa.array(df["u"]), P),
                              pa.int64()),
            "u": pa.array(df["u"], pa.int64()),
            "m": pa.array(df["m"], pa.int64())})

    # global max day: churn is undefined for the final day
    last = None

    def churn(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"u": t["u"].to_pandas(),
                            "m": t["m"].to_pandas()})
              .drop_duplicates().sort_values(["u", "m"]))
        nxt = df.groupby("u", sort=False)["m"].shift(-1)
        gone = (df["m"] < last) & ((nxt.isna()) | (nxt > df["m"] + 1))
        g = (df.loc[gone].groupby("m", sort=False).size()
             .reset_index(name="n"))
        return pa.table({"ym": pa.array(g["m"], pa.int64()),
                         "n_churned": pa.array(g["n"], pa.int64())})

    from ray.data.aggregate import Max

    slimmed = ev.map_batches(slim, batch_format="pyarrow").materialize()
    last = int(slimmed.aggregate(Max("m", alias_name="m"))["m"])

    out = (slimmed.groupby("_part")
           .map_groups(churn, batch_format="pyarrow")
           .groupby("ym").aggregate(Sum("n_churned",
                                        alias_name="n_churned"))
           .to_pandas())
    if "ym" not in out.columns:  # no churn anywhere: schema-safe empty
        out = pd.DataFrame({"ym": pd.Series(dtype="int64"),
                            "n_churned": pd.Series(dtype="int64")})
    out = out.rename(columns={"ym": "epoch_day"})
    out["epoch_day"] = out["epoch_day"].astype("int64")
    out["n_churned"] = out["n_churned"].astype("int64")
    return (out[["epoch_day", "n_churned"]]
            .sort_values("epoch_day").reset_index(drop=True))


def _host_edge_batch_97(t: pa.Table) -> pa.Table:
    """The planted mod-97 host link graph shared by the graph-family
    queries (same construction as ``host_triangles``)."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    h = ids % 97
    nl = (ids % 4).astype(np.int64)
    rep = np.repeat(np.arange(len(ids), dtype=np.int64), nl)
    run_start = np.repeat(np.cumsum(nl) - nl, nl)
    j = np.arange(len(rep), dtype=np.int64) - run_start
    return pa.table({
        "src": pa.array(h[rep], pa.int64()),
        "dst": pa.array((h[rep] * 31 + 17 * j + ids[rep]) % 97,
                        pa.int64())})


def _q_host_clustering(sf_dir: str):
    """Per-host local clustering coefficient as exact integers
    (n_triangles, n_wedges = C(deg,2)) over the planted host graph —
    distinct-edge dedup runs once and feeds degrees + the
    degree-ordered triangle kernel; attach is a tagged union → one
    grouped Sum (``ops/graph.clustering_coefficients``)."""
    from xtract.ops.graph import clustering_coefficients

    edges = _docs(sf_dir, ["doc_id"]).map_batches(
        _host_edge_batch_97, batch_format="pyarrow")
    return clustering_coefficients(edges)


def _host_clustering_sql() -> str:
    return (
        "WITH raw AS (SELECT (doc_id % 97) AS x, "
        "((doc_id % 97) * 31 + 17 * j + doc_id) % 97 AS y "
        "FROM documents, UNNEST(range(0, doc_id % 4)) AS t(j)), "
        "e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v "
        "FROM raw WHERE x != y), "
        "deg AS (SELECT node, count(*) AS d FROM "
        "(SELECT u AS node FROM e UNION ALL SELECT v FROM e) "
        "GROUP BY node), "
        "tri AS (SELECT a.u AS n1, a.v AS n2, b.v AS n3 FROM e a "
        "JOIN e b ON b.u = a.v JOIN e c ON c.u = a.u AND c.v = b.v), "
        "corners AS (SELECT n1 AS node FROM tri UNION ALL "
        "SELECT n2 FROM tri UNION ALL SELECT n3 FROM tri), "
        "tc AS (SELECT node, count(*) AS t FROM corners GROUP BY node) "
        "SELECT CAST(deg.node AS BIGINT) AS node, "
        "CAST(COALESCE(tc.t, 0) AS BIGINT) AS n_triangles, "
        "CAST(deg.d * (deg.d - 1) // 2 AS BIGINT) AS n_wedges "
        "FROM deg LEFT JOIN tc ON tc.node = deg.node WHERE deg.d >= 2")


def _q_part_butterflies(sf_dir: str):
    """Per-part butterfly (bipartite 4-cycle) counts over the
    order–part graph — the bipartite clustering signal behind
    recommendation density (``ops/graph.butterfly_counts``): distinct
    (order, part) → coarse order co-group pair counts → one native
    Sum → endpoint explode → grouped Sum, all exact integers."""
    import ray.data as rd

    from xtract.ops.graph import butterfly_counts

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    out = butterfly_counts(li, "l_orderkey", "l_partkey")
    return out.map_batches(
        lambda t: t.rename_columns(["partkey", "n_butterflies"]),
        batch_format="pyarrow")


def _part_butterflies_sql() -> str:
    return (
        "WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem), "
        "pairs AS (SELECT a.p AS p1, b.p AS p2, count(*) AS n "
        "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2), "
        "contrib AS (SELECT p1 AS p, n * (n - 1) // 2 AS b FROM pairs "
        "UNION ALL SELECT p2, n * (n - 1) // 2 FROM pairs) "
        "SELECT CAST(p AS BIGINT) AS partkey, "
        "CAST(sum(b) AS BIGINT) AS n_butterflies "
        "FROM contrib GROUP BY p HAVING sum(b) > 0")


def _q_url_param_cardinality(sf_dir: str):
    """Per-(host, query-param) URL vs distinct-value counts — measured
    evidence for stripping volatile params (session ids) before
    canonical dedup (``ops/urls.param_cardinality``): block pre-count
    combiner → native Sum over (h,p,v) → Count+Sum over (h,p)."""
    from xtract.ops.urls import param_cardinality

    def urls(t: pa.Table) -> pa.Table:
        us = [f"https://host{d % 4}.example.org/x?"
              f"id={d}&page={d % 3}&utm={d % 2}"
              for d in t["doc_id"].to_pylist()]
        return pa.table({"url": pa.array(us, pa.string())})

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        urls, batch_format="pyarrow")
    return param_cardinality(pages)


def _url_param_cardinality_sql() -> str:
    return (
        "WITH u AS (SELECT 'host' || CAST(doc_id % 4 AS VARCHAR) || "
        "'.example.org' AS h, doc_id FROM documents), "
        "p AS (SELECT h, 'id' AS param, CAST(doc_id AS VARCHAR) AS v "
        "FROM u UNION ALL "
        "SELECT h, 'page', CAST(doc_id % 3 AS VARCHAR) FROM u "
        "UNION ALL SELECT h, 'utm', CAST(doc_id % 2 AS VARCHAR) FROM u) "
        "SELECT h AS host, param, "
        "CAST(count(DISTINCT v) AS BIGINT) AS n_values, "
        "CAST(count(*) AS BIGINT) AS n_urls "
        "FROM p GROUP BY 1, 2")


def _hreflang_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a page with two hreflang alternates (one base-relative,
    one absolute cross-host), for doc_id%4==1 a third, plus a
    no-hreflang alternate link that must be skipped."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://host{d % 6}.example.org/p/{d}")
        h = (f"<html><head><base href='/l{d % 2}/'>"
             f"<link rel='Alternate' hreflang='EN' href='en/{d % 7}'>"
             f"<link rel='alternate' hreflang='de-"
             f"{'AT' if d % 3 == 0 else 'DE'}' "
             f"href='https://de.example.org/{d % 5}'>")
        if d % 4 == 1:
            h += f"<link rel='alternate' hreflang='fr' href='f{d % 2}'>"
        h += "<link rel='alternate' href='feed.xml'></head></html>"
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_page_hreflang(sf_dir: str):
    """Language-edition (hreflang alternate) harvest — the cluster key
    translation-aware dedup collapses before per-language sampling
    (``xtract/links.extract_hreflang``)."""
    from xtract.links import extract_hreflang

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _hreflang_pages_batch, batch_format="pyarrow")
    return extract_hreflang(pages)


def _page_hreflang_sql() -> str:
    page = ("'https://host' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org/p/' || CAST(doc_id AS VARCHAR)")
    basep = ("'https://host' || CAST(doc_id % 6 AS VARCHAR) || "
             "'.example.org/l' || CAST(doc_id % 2 AS VARCHAR) || '/'")
    return (
        f"SELECT {page} AS url, CAST(0 AS BIGINT) AS rank, "
        f"'en' AS hreflang, {basep} || 'en/' || "
        "CAST(doc_id % 7 AS VARCHAR) AS href FROM documents "
        f"UNION ALL SELECT {page}, 1, "
        "CASE WHEN doc_id % 3 = 0 THEN 'de-at' ELSE 'de-de' END, "
        "'https://de.example.org/' || CAST(doc_id % 5 AS VARCHAR) "
        "FROM documents "
        f"UNION ALL SELECT {page}, 2, 'fr', "
        f"{basep} || 'f' || CAST(doc_id % 2 AS VARCHAR) "
        "FROM documents WHERE doc_id % 4 = 1")


def _q_pagination_chains(sf_dir: str):
    """Multi-page-article stitching: harvest ``rel=next`` pagination
    edges (``xtract/links.extract_rel_next``), build a functional
    graph, contract it by pointer doubling
    (``ops/graph.resolve_pointer_chains``) — each page resolves to its
    chain END in O(log L) all-to-alls, the key training-data assembly
    groups on.  Fixture: pages chain in runs of 5 (doc d → d+1 unless
    d%5==4 or d is the last doc).  State build uses the composite-Max
    idiom (src‖ptr) so the union of terminal + edge rows collapses to
    one row per page with NO anti-join or broadcast."""
    import ray.data as rd
    from ray.data.aggregate import Max

    from xtract.links import extract_rel_next
    from xtract.ops.graph import resolve_pointer_chains

    docs = _docs(sf_dir, ["doc_id"])
    maxid = int(docs.aggregate(Max("doc_id", alias_name="m"))["m"])

    def pages(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for d in t["doc_id"].to_pylist():
            urls.append(f"https://news.example.org/p/{d}")
            h = f"<html><head><title>part {d}</title>"
            if d % 5 != 4 and d < maxid:
                h += f"<link rel='Next' href='{d + 1}'>"
            h += "</head></html>"
            htmls.append(h.encode())
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    edges = extract_rel_next(docs.map_batches(pages,
                                              batch_format="pyarrow"))

    BIG = np.int64(1) << 32

    def edge_rows(t: pa.Table) -> pa.Table:
        # url tail is the doc id by construction
        d = np.array([int(u.rsplit("/", 1)[1])
                      for u in t["url"].to_pylist()], np.int64)
        p = np.array([int(u.rsplit("/", 1)[1])
                      for u in t["next_url"].to_pylist()], np.int64)
        return pa.table({"d": pa.array(d, pa.int64()),
                         "key": pa.array(BIG + p, pa.int64())})

    def term_rows(t: pa.Table) -> pa.Table:
        d = t["doc_id"].cast(pa.int64())
        return pa.table({"d": d, "key": d})  # src=0 ⇒ key = ptr = d

    state_keys = (edges.map_batches(edge_rows, batch_format="pyarrow")
                  .union(docs.map_batches(term_rows,
                                          batch_format="pyarrow"))
                  .groupby("d").aggregate(Max("key", alias_name="key")))

    def decode(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False)
        src = (k >= BIG).astype(np.int64)
        return pa.table({
            "d": t["d"].cast(pa.int64()),
            "ptr": pa.array(k - src * BIG, pa.int64()),
            "hops": pa.array(src, pa.int64()),
            "src": pa.array(src, pa.int64())})

    state = state_keys.map_batches(decode, batch_format="pyarrow")
    out = resolve_pointer_chains(state, partitions=16)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["d"],
                            "end_doc_id": t["ptr"],
                            "n_hops": t["hops"]}),
        batch_format="pyarrow")


def _pagination_chains_sql() -> str:
    return (
        "WITH m AS (SELECT max(doc_id) AS mx FROM documents) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(least((doc_id // 5) * 5 + 4, mx) AS BIGINT) AS end_doc_id, "
        "CAST(least((doc_id // 5) * 5 + 4, mx) - doc_id AS BIGINT) "
        "AS n_hops FROM documents, m")


def _og_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a page with og:title (entity), og:type cycling over 3
    values, twitter:card for doc_id%2==0, a duplicate og:title that
    must lose to the first, and a non-OG meta that must be skipped."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://host{d % 6}.example.org/p/{d}")
        h = (f"<html><head>"
             f"<meta property='og:Title' content='T &amp; {d % 5}'>"
             f"<meta property='og:type' content='type{d % 3}'>"
             "<meta property='og:title' content='loser'>")
        if d % 2 == 0:
            h += "<meta name='twitter:card' content='summary'>"
        h += ("<meta name='description' content='skip'>"
              "</head></html>")
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_page_opengraph(sf_dir: str):
    """Open-Graph / twitter-card metadata harvest — the social-card
    layer used as title/date/quality evidence when body markup is
    poor (``xtract/links.extract_opengraph``)."""
    from xtract.links import extract_opengraph

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _og_pages_batch, batch_format="pyarrow")
    return extract_opengraph(pages)


def _page_opengraph_sql() -> str:
    page = ("'https://host' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org/p/' || CAST(doc_id AS VARCHAR)")
    return (
        f"SELECT {page} AS url, CAST(0 AS BIGINT) AS rank, "
        "'og:title' AS property, "
        "'T & ' || CAST(doc_id % 5 AS VARCHAR) AS content "
        "FROM documents "
        f"UNION ALL SELECT {page}, 1, 'og:type', "
        "'type' || CAST(doc_id % 3 AS VARCHAR) FROM documents "
        f"UNION ALL SELECT {page}, 2, 'twitter:card', 'summary' "
        "FROM documents WHERE doc_id % 2 = 0")


def _q_source_lang_mix(sf_dir: str):
    """Per-source language-mix profile (multilingual-host signal for
    crawl curation): doc count, distinct languages, majority language
    (tie → lexicographic) and its exact ppm share —
    ``ops/agg.grouped_value_profile`` + one vectorized ppm map."""
    from xtract.ops.agg import grouped_value_profile

    prof = grouped_value_profile(
        _docs(sf_dir, ["source", "lang"]), "source", "lang")

    def ppm(t: pa.Table) -> pa.Table:
        mn = t["mode_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        nr = t["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "source": t["source"],
            "n_docs": t["n_rows"].cast(pa.int64()),
            "n_langs": t["n_values"].cast(pa.int64()),
            "majority_lang": t["mode"],
            "majority_ppm": pa.array(mn * 1_000_000 // nr, pa.int64())})

    return prof.map_batches(ppm, batch_format="pyarrow")


def _source_lang_mix_sql() -> str:
    return (
        "WITH c AS (SELECT source, lang, count(*) AS n FROM documents "
        "GROUP BY 1, 2), "
        "t AS (SELECT source, sum(n) AS n_docs, count(*) AS n_langs "
        "FROM c GROUP BY 1), "
        "m AS (SELECT source, lang, n, row_number() OVER "
        "(PARTITION BY source ORDER BY n DESC, lang) AS rn FROM c) "
        "SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs, "
        "CAST(t.n_langs AS BIGINT) AS n_langs, "
        "m.lang AS majority_lang, "
        "CAST(m.n * 1000000 // t.n_docs AS BIGINT) AS majority_ppm "
        "FROM t JOIN m ON m.source = t.source AND m.rn = 1")


def _q_returnflag_weighted_median(sf_dir: str):
    """Exact quantity-weighted lower median of line price per return
    flag (``ops/quantiles.grouped_weighted_median``): block pre-sum
    combiner → one native Sum → one coarse co-group selection — only
    the distinct (flag, cents) table crosses the wire."""
    import ray.data as rd

    from xtract.ops.quantiles import grouped_weighted_median

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "cents": pc.cast(pc.round(
                pc.multiply(t["l_extendedprice"], 100)), pa.int64()),
            "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64())})

    out = grouped_weighted_median(
        li.map_batches(slim, batch_format="pyarrow"),
        "l_returnflag", "cents", "qty")
    return out.map_batches(
        lambda t: t.rename_columns(
            ["l_returnflag", "wmedian_cents", "total_qty"]),
        batch_format="pyarrow")


def _returnflag_weighted_median_sql() -> str:
    return (
        "WITH src AS (SELECT l_returnflag AS k, "
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS v, "
        "CAST(round(l_quantity) AS BIGINT) AS w FROM lineitem), "
        "c AS (SELECT k, v, sum(w) AS w FROM src GROUP BY 1, 2), "
        "s AS (SELECT k, v, sum(w) OVER (PARTITION BY k ORDER BY v) "
        "AS cum, (sum(w) OVER (PARTITION BY k) + 1) // 2 AS tgt FROM c), "
        "t AS (SELECT k, sum(w) AS total_w FROM c GROUP BY 1), "
        "m AS (SELECT k, min(v) AS wm FROM s WHERE cum >= tgt "
        "GROUP BY k) "
        "SELECT m.k AS l_returnflag, CAST(m.wm AS BIGINT) AS "
        "wmedian_cents, CAST(t.total_w AS BIGINT) AS total_qty "
        "FROM m JOIN t ON t.k = m.k")


def _q_host_bipartite(sf_dir: str):
    """Per-component bipartiteness over the planted 30-chain host
    graph with odd cycles injected on every third chain (edge
    (r, r+60) closes a triangle with the chain edges for r%3==0) —
    the doubled-graph one-CC-run reduction
    (``ops/graph.bipartite_components``).  Expected: component r is
    bipartite iff r % 3 != 0; n_nodes = 4 for r ≤ 6 else 3."""
    from xtract.ops.graph import bipartite_components

    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        h = np.unique(t["doc_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % 97)
        hi = h[h >= 30]
        tri = h[(h < 30) & (h % 3 == 0)]
        return pa.table({
            "src": pa.array(np.concatenate([hi, tri]), pa.int64()),
            "dst": pa.array(np.concatenate([hi - 30, tri + 60]),
                            pa.int64())})

    return bipartite_components(
        docs.map_batches(edges, batch_format="pyarrow"))


def _host_bipartite_sql() -> str:
    # closed form for the planted graph (all 97 residues present at
    # every sweep sf): chains r→r+30→r+60(→r+90 for r≤6) are paths
    # (bipartite) unless the injected (r, r+60) edge closes a triangle
    return (
        "WITH r AS (SELECT DISTINCT doc_id % 30 AS c FROM documents) "
        "SELECT CAST(c AS BIGINT) AS component, "
        "(c % 3 != 0) AS is_bipartite, "
        "CAST(CASE WHEN c <= 6 THEN 4 ELSE 3 END AS BIGINT) AS n_nodes "
        "FROM r")


def _q_doc_winnowing(sf_dir: str):
    """MOSS winnowing fingerprints (k=16-byte grams, w=4 windows,
    rightmost-min rule) — the position-aware local-dedup layer between
    whole-doc hashing and shingle MinHash
    (``ops/textstats.winnow_fingerprints``); streaming flat explode,
    no shuffle."""
    from xtract.ops.textstats import winnow_fingerprints

    return winnow_fingerprints(_docs(sf_dir, ["doc_id", "text"]),
                               k=16, w=4)


def _winnow_cte(k: int = 16, w: int = 4, base: int = 257,
                mod: int = (1 << 61) - 1) -> str:
    """Shared winnowing CTE body ending in ``selfp(doc_id, pos, hv)``:
    per-position HUGEINT polynomial k-gram hashes (the
    ``_rolling_fp_sql`` pattern), then each window of ``w`` consecutive
    hashes selects its rightmost minimum via a bounded self-join,
    DISTINCT over selections.  ASCII-valid (char code == utf-8 byte),
    like the rolling-fp oracle."""
    pows = ", ".join(f"({i}, {pow(base, i, mod)})" for i in range(k))
    return (
        "d2 AS (SELECT doc_id, coalesce(text,'') AS t, "
        "length(coalesce(text,'')) AS n FROM documents), "
        "ch AS (SELECT doc_id, i-1 AS pos, unicode(t[i]) AS code, n "
        "FROM d2, UNNEST(range(1, n+1)) AS u(i)), "
        f"p(i, pw) AS (VALUES {pows}), "
        f"wins AS (SELECT doc_id, e FROM (SELECT DISTINCT doc_id, n "
        f"FROM ch WHERE n >= {k}), UNNEST(range({k - 1}, n)) AS u(e)), "
        "h AS (SELECT w.doc_id, w.e, "
        f"CAST(sum(CAST(c.code AS HUGEINT) * p.pw) % {mod} AS BIGINT) "
        "AS hv FROM wins w JOIN ch c ON c.doc_id = w.doc_id "
        f"AND c.pos BETWEEN w.e - {k - 1} AND w.e "
        "JOIN p ON p.i = w.e - c.pos GROUP BY w.doc_id, w.e), "
        "ww AS (SELECT a.doc_id, a.e AS wend, b.e AS pos, b.hv "
        "FROM h a JOIN h b ON b.doc_id = a.doc_id "
        f"AND b.e BETWEEN a.e - {w - 1} AND a.e "
        f"WHERE a.e >= {k - 1 + w - 1}), "
        "m AS (SELECT doc_id, wend, min(hv) AS mn FROM ww "
        "GROUP BY 1, 2), "
        "s AS (SELECT ww.doc_id, ww.wend, max(ww.pos) AS pos FROM ww "
        "JOIN m ON m.doc_id = ww.doc_id AND m.wend = ww.wend "
        "AND ww.hv = m.mn GROUP BY 1, 2), "
        "selfp AS (SELECT DISTINCT s.doc_id, s.pos, h.hv "
        "FROM s JOIN h ON h.doc_id = s.doc_id AND h.e = s.pos)")


def _doc_winnowing_sql() -> str:
    return ("WITH " + _winnow_cte() +
            " SELECT doc_id, CAST(pos AS BIGINT) AS pos, "
            "CAST(hv AS UBIGINT) AS fp FROM selfp")


def _q_winnow_near_dups(sf_dir: str):
    """Winnowed near-dup candidate pairs: exact Jaccard over each
    doc's SELECTED fingerprint set (winnowing above, the pair/size
    machinery of ``ops/graph.jaccard_pairs`` below) — top-50 pairs by
    integer ppm similarity, ≥2 shared fingerprints.  Deterministic
    boundary: (ppm desc, doc_a, doc_b)."""
    import pandas as pd

    from xtract.ops.graph import jaccard_pairs
    from xtract.ops.textstats import winnow_fingerprints

    K = 50
    fps = winnow_fingerprints(_docs(sf_dir, ["doc_id", "text"]),
                              k=16, w=4)
    fps = fps.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "fp": t["fp"].cast(pa.int64())}),
        batch_format="pyarrow")
    pairs = jaccard_pairs(fps, "doc_id", "fp", min_overlap=2)

    def ppm(t: pa.Table) -> pa.Table:
        num = t["jac_num"].to_numpy(zero_copy_only=False).astype(np.int64)
        den = t["jac_den"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_a": t["a"].cast(pa.int64()),
            "doc_b": t["b"].cast(pa.int64()),
            "jac_num": pa.array(num, pa.int64()),
            "jac_den": pa.array(den, pa.int64()),
            "jac_ppm": pa.array(num * 1_000_000 // den, pa.int64())})

    def topk(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[
            ("jac_ppm", "descending"), ("doc_a", "ascending"),
            ("doc_b", "ascending")])
        return t.take(order[:K])

    head = (pairs.map_batches(ppm, batch_format="pyarrow")
            .map_batches(topk, batch_format="pyarrow").to_pandas())
    head = head.sort_values(["jac_ppm", "doc_a", "doc_b"],
                            ascending=[False, True, True]).head(K)
    return head.reset_index(drop=True)


def _winnow_near_dups_sql() -> str:
    return (
        "WITH " + _winnow_cte() + ", "
        "sets AS (SELECT DISTINCT doc_id, hv FROM selfp), "
        "sizes AS (SELECT doc_id, count(*) AS nf FROM sets GROUP BY 1), "
        "inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n "
        "FROM sets x JOIN sets y ON y.hv = x.hv AND x.doc_id < y.doc_id "
        "GROUP BY 1, 2 HAVING count(*) >= 2), "
        "j AS (SELECT a, b, n, sa.nf + sb.nf - n AS den FROM inter "
        "JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b) "
        "SELECT CAST(a AS BIGINT) AS doc_a, CAST(b AS BIGINT) AS doc_b, "
        "CAST(n AS BIGINT) AS jac_num, CAST(den AS BIGINT) AS jac_den, "
        "CAST(n * 1000000 // den AS BIGINT) AS jac_ppm "
        "FROM j ORDER BY jac_ppm DESC, a, b LIMIT 50")


def _q_bm25_length_rerank(sf_dir: str):
    """Second-stage retrieval reranking: rank-sum fusion (integer
    Borda) of the BM25 top-20 with each candidate's GLOBAL length rank
    — the length rank of 20 docs among N computes in ONE streaming
    counting pass against the broadcast candidate list (count rows
    strictly longer, plus equal-length smaller-id — no global sort,
    the scale shape for reranking few candidates against a huge
    corpus).  Output: top-10 by (rank_sum, doc_id), all integers."""
    import ray
    from ray.data.aggregate import Sum

    from xtract.ops.ranking import bm25_score

    cands = bm25_score(_docs(sf_dir, ["doc_id", "text"]),
                       _BM25_QUERY).to_pandas()  # 20 rows — driver-small
    c_ids = cands["doc_id"].to_numpy(np.int64)
    docs = _docs(sf_dir, ["doc_id", "n_chars"])
    lens_ref = None

    def cand_lens(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        m = np.isin(ids, c_ids)
        return pa.table({"doc_id": pa.array(ids[m], pa.int64()),
                         "n_chars": pa.array(nc[m], pa.int64())})

    cl = docs.map_batches(cand_lens, batch_format="pyarrow").to_pandas()
    cl = cl.set_index("doc_id").loc[c_ids]
    lens_ref = ray.put((c_ids, cl["n_chars"].to_numpy(np.int64)))

    def rank_partials(t: pa.Table) -> pa.Table:
        cid, clen = ray.get(lens_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per candidate: rows longer, or equal length with smaller id
        gt = (nc[None, :] > clen[:, None])
        eq = (nc[None, :] == clen[:, None]) & (ids[None, :] < cid[:, None])
        return pa.table({
            "ci": pa.array(np.arange(len(cid), dtype=np.int64)),
            "n_before": pa.array((gt | eq).sum(axis=1), pa.int64())})

    parts = (docs.map_batches(rank_partials, batch_format="pyarrow")
             .groupby("ci").aggregate(Sum("n_before", alias_name="nb"))
             .to_pandas().sort_values("ci"))
    len_rank = parts["nb"].to_numpy(np.int64) + 1
    out = cands[["rank", "doc_id"]].rename(columns={"rank": "bm25_rank"})
    out["bm25_rank"] = out["bm25_rank"].astype("int64")
    out["len_rank"] = len_rank
    out["rank_sum"] = out["bm25_rank"] + out["len_rank"]
    out = out.sort_values(["rank_sum", "doc_id"]).head(10)
    return out[["doc_id", "bm25_rank", "len_rank",
                "rank_sum"]].reset_index(drop=True)


def _bm25_length_rerank_sql() -> str:
    return (
        "WITH b AS (" + _bm25_sql() + "), "
        "lr AS (SELECT doc_id, rank() OVER (ORDER BY n_chars DESC, "
        "doc_id) AS len_rank FROM documents) "
        "SELECT b.doc_id, CAST(b.rank AS BIGINT) AS bm25_rank, "
        "CAST(lr.len_rank AS BIGINT) AS len_rank, "
        "CAST(b.rank + lr.len_rank AS BIGINT) AS rank_sum "
        "FROM b JOIN lr USING (doc_id) "
        "ORDER BY rank_sum, b.doc_id LIMIT 10")


def _q_schema_evolution_union(sf_dir: str):
    """Schema-evolution read: two parquet stores written from the same
    event log at different schema epochs (v1: event_id int32 + value;
    v2: event_id int64 + value + the later-added user_id column) read
    back as ONE Dataset via footer-only union-schema inference,
    widening casts and typed-null fill
    (``xtract/sources.read_union_evolved``).  Output: per schema epoch
    (event parity), row count, exact value cents, and the null
    user_id count the v1 store contributes."""
    import os

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.sources import read_union_evolved

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"])
    tag = os.path.basename(os.path.normpath(sf_dir))
    base = f"/tmp/xtract_evolved_{tag}"
    done = os.path.join(base, "_DONE")
    if not os.path.exists(done):
        os.makedirs(base, exist_ok=True)

        def v1(t: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(t["event_id"], 1), 0)
            t = t.filter(keep)
            return pa.table({
                "event_id": t["event_id"].cast(pa.int32()),
                "value": t["value"].cast(pa.float64())})

        def v2(t: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(t["event_id"], 1), 1)
            t = t.filter(keep)
            return pa.table({
                "event_id": t["event_id"].cast(pa.int64()),
                "value": t["value"].cast(pa.float64()),
                "user_id": t["user_id"].cast(pa.int64())})

        ev.map_batches(v1, batch_format="pyarrow").write_parquet(
            f"{base}/v1")
        ev.map_batches(v2, batch_format="pyarrow").write_parquet(
            f"{base}/v2")
        with open(done, "w") as f:
            f.write("ok")

    uni = read_union_evolved([f"{base}/v1", f"{base}/v2"])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table({
            "parity": pc.cast(pc.bit_wise_and(
                pc.cast(t["event_id"], pa.int64()), 1), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100)),
                             pa.int64()),
            "u_null": pc.cast(pc.is_null(t["user_id"]), pa.int64())})

    return (uni.map_batches(slim, batch_format="pyarrow")
            .groupby("parity")
            .aggregate(Count(alias_name="n_rows"),
                       Sum("cents", alias_name="value_cents"),
                       Sum("u_null", alias_name="n_user_null")))


def _schema_evolution_union_sql() -> str:
    return (
        "SELECT CAST(event_id % 2 AS BIGINT) AS parity, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
        "AS value_cents, "
        "CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_user_null "
        "FROM events GROUP BY 1")


def _q_source_trigram_growth(sf_dir: str):
    """Per-source vocabulary-growth statistics over word TRIGRAMS
    (Heaps-law shape check for corpus mixing): total trigrams,
    distinct trigrams, and the most frequent one — composition of the
    shared vectorized tokenizer (``collocations._flat_tokens``) and
    ``ops/agg.grouped_value_profile`` (block combiner → native Sum →
    one co-group)."""
    from xtract.ops.agg import grouped_value_profile
    from xtract.ops.collocations import _flat_tokens

    def grams(b: pa.Table) -> pa.Table:
        toks, parents = _flat_tokens(b, "text")
        t = np.asarray(toks.to_pylist(), dtype=object)
        par = parents.to_numpy(zero_copy_only=False)
        src = np.asarray(b["source"].to_pylist(), dtype=object)
        if len(t) < 3:
            return pa.table({"source": pa.array([], pa.string()),
                             "gram": pa.array([], pa.string())})
        m = par[:-2] == par[2:]
        gram = t[:-2][m] + " " + t[1:-1][m] + " " + t[2:][m]
        return pa.table({
            "source": pa.array(src[par[:-2][m]], pa.string()),
            "gram": pa.array(gram, pa.string())})

    prof = grouped_value_profile(
        _docs(sf_dir, ["source", "text"]).map_batches(
            grams, batch_format="pyarrow"),
        "source", "gram")
    return prof.map_batches(
        lambda t: t.rename_columns(
            ["source", "n_trigrams", "n_distinct", "top_trigram",
             "top_n"]),
        batch_format="pyarrow")


def _source_trigram_growth_sql() -> str:
    return (
        "WITH toks AS (SELECT doc, src, tok, row_number() OVER "
        "(PARTITION BY doc ORDER BY pos) AS rn FROM ("
        "SELECT doc_id AS doc, source AS src, "
        "unnest(regexp_split_to_array(lower(coalesce(text,'')), "
        "'[^a-z]+')) AS tok, "
        "unnest(range(1, len(regexp_split_to_array(lower("
        "coalesce(text,'')), '[^a-z]+')) + 1)) AS pos FROM documents) "
        "WHERE tok != ''), "
        "tri AS (SELECT t1.src, t1.tok || ' ' || t2.tok || ' ' || "
        "t3.tok AS g FROM toks t1 "
        "JOIN toks t2 ON t2.doc = t1.doc AND t2.rn = t1.rn + 1 "
        "JOIN toks t3 ON t3.doc = t1.doc AND t3.rn = t1.rn + 2), "
        "c AS (SELECT src, g, count(*) AS n FROM tri GROUP BY 1, 2), "
        "m AS (SELECT src, g, n, row_number() OVER (PARTITION BY src "
        "ORDER BY n DESC, g) AS r FROM c), "
        "t AS (SELECT src, sum(n) AS tot, count(*) AS dis FROM c "
        "GROUP BY 1) "
        "SELECT t.src AS source, CAST(t.tot AS BIGINT) AS n_trigrams, "
        "CAST(t.dis AS BIGINT) AS n_distinct, m.g AS top_trigram, "
        "CAST(m.n AS BIGINT) AS top_n "
        "FROM t JOIN m ON m.src = t.src AND m.r = 1")


def _q_orders_expectations(sf_dir: str):
    """Data-quality expectations audit over orders
    (``ops/profile.expectation_report``): five declarative rules —
    key uniqueness + not-null, a price range, a priority pattern, a
    status value set — with exact violation counts in one shared
    streaming pass plus one slim groupby for the uniqueness rule."""
    import ray.data as rd

    from xtract.ops.profile import expectation_report

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderpriority",
                 "o_orderstatus"])
    rules = [
        {"name": "okey_not_null", "kind": "not_null", "col": "o_orderkey"},
        {"name": "okey_unique", "kind": "unique", "col": "o_orderkey"},
        {"name": "price_range", "kind": "in_range", "col": "o_totalprice",
         "lo": 0.0, "hi": 200000.0},
        {"name": "priority_pattern", "kind": "regex_match",
         "col": "o_orderpriority", "pattern": "[1-5]-[A-Z ]+"},
        {"name": "status_accepted", "kind": "accepted_values",
         "col": "o_orderstatus", "values": ["O", "F", "P"]},
    ]
    return expectation_report(orders, rules)


def _orders_expectations_sql() -> str:
    total = "(SELECT count(*) FROM orders)"
    return (
        f"SELECT 'okey_not_null' AS rule, "
        "CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) "
        f"AS n_violations, CAST({total} AS BIGINT) AS n_checked "
        "FROM orders "
        "UNION ALL SELECT 'okey_unique', CAST(coalesce((SELECT sum(n) "
        "FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey "
        f"HAVING count(*) > 1)), 0) AS BIGINT), CAST({total} AS BIGINT) "
        "UNION ALL SELECT 'price_range', CAST(count(*) FILTER ("
        "WHERE o_totalprice IS NOT NULL AND (o_totalprice < 0 OR "
        f"o_totalprice > 200000)) AS BIGINT), CAST({total} AS BIGINT) "
        "FROM orders "
        "UNION ALL SELECT 'priority_pattern', CAST(count(*) FILTER ("
        "WHERE o_orderpriority IS NOT NULL AND NOT "
        "regexp_full_match(o_orderpriority, '[1-5]-[A-Z ]+')) AS BIGINT), "
        f"CAST({total} AS BIGINT) FROM orders "
        "UNION ALL SELECT 'status_accepted', CAST(count(*) FILTER ("
        "WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN "
        f"('O', 'F', 'P')) AS BIGINT), CAST({total} AS BIGINT) "
        "FROM orders")


def _q_shard_rebalance_audit(sf_dir: str):
    """Rendezvous-hashing resize audit (``ops/bucketed.
    rendezvous_shard``): assign every doc to 8 and to 32 shards, then
    per old shard report how many keys move — and that NONE move to
    another OLD shard (the HRW guarantee that makes N→4N growth cheap
    for a bucketed store)."""
    from ray.data.aggregate import Count, Sum

    from xtract.ops.bucketed import rendezvous_shard

    docs = _docs(sf_dir, ["doc_id"])
    both = rendezvous_shard(
        rendezvous_shard(docs, "doc_id", 8, out_col="shard8"),
        "doc_id", 32, out_col="shard32")

    def flags(t: pa.Table) -> pa.Table:
        s8 = t["shard8"].to_numpy(zero_copy_only=False)
        s32 = t["shard32"].to_numpy(zero_copy_only=False)
        moved = (s8 != s32).astype(np.int64)
        return pa.table({
            "shard8": pa.array(s8, pa.int64()),
            "moved": pa.array(moved, pa.int64()),
            "moved_to_old": pa.array(moved * (s32 < 8), pa.int64())})

    return (both.map_batches(flags, batch_format="pyarrow")
            .groupby("shard8")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("moved", alias_name="n_moved"),
                       Sum("moved_to_old", alias_name="n_moved_to_old")))


def _shard_rebalance_audit_sql() -> str:
    mix = "((doc_id * 2654435761 + n * 40503 + 7) % 4294967296)"
    score = f"(CAST({mix} AS HUGEINT) * {mix}) % 4294967296"
    return (
        f"WITH s AS (SELECT doc_id, n, {score} AS sc "
        "FROM documents, UNNEST(range(0, 32)) AS t(n)), "
        "a8 AS (SELECT doc_id, n AS s8 FROM (SELECT doc_id, n, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, n) "
        "AS rn FROM s WHERE n < 8) WHERE rn = 1), "
        "a32 AS (SELECT doc_id, n AS s32 FROM (SELECT doc_id, n, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, n) "
        "AS rn FROM s) WHERE rn = 1) "
        "SELECT CAST(s8 AS BIGINT) AS shard8, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(CASE WHEN s32 != s8 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_moved, "
        "CAST(sum(CASE WHEN s32 != s8 AND s32 < 8 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_moved_to_old "
        "FROM a8 JOIN a32 USING (doc_id) GROUP BY 1")


def _q_source_token_budget(sf_dir: str):
    """Per-source budgeted selection (fill each source's 3k-char
    budget longest-first — the mixing step that caps any one source's
    contribution): ``ops/agg.take_until_budget``, one coarse co-group
    with a vectorized run-cumsum mask."""
    from xtract.ops.agg import take_until_budget

    return take_until_budget(
        _docs(sf_dir, ["doc_id", "source", "n_chars"]),
        key="source", order_col="n_chars", weight_col="n_chars",
        budget=3_000, id_col="doc_id")


def _source_token_budget_sql() -> str:
    return (
        "WITH s AS (SELECT source, doc_id, n_chars, "
        "sum(n_chars) OVER (PARTITION BY source "
        "ORDER BY n_chars DESC, doc_id) AS cum FROM documents) "
        "SELECT source, CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(n_chars AS BIGINT) AS n_chars, "
        "CAST(cum AS BIGINT) AS cum_weight "
        "FROM s WHERE cum <= 3000")


def _q_embedding_norm_stats(sf_dir: str):
    """Per-label embedding-norm audit over the vector column: count
    and EXACT squared-norm sum in micro-units (each component rounds
    to int64 micros before squaring, so the reduction is
    order-independent and bit-comparable to SQL) — the drift check a
    vector store runs before re-quantizing an index."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])

    def slim(t: pa.Table) -> pa.Table:
        m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        # DuckDB round() is half-AWAY-from-zero; np.rint is half-even —
        # match the SQL rule explicitly
        s = m * 1_000_000
        q = np.where(s >= 0, np.floor(s + 0.5),
                     np.ceil(s - 0.5)).astype(np.int64)
        return pa.table({
            "label": t["label"],
            "sq": pa.array((q * q).sum(axis=1), pa.int64())})

    return (emb.map_batches(slim, batch_format="pyarrow")
            .groupby("label")
            .aggregate(Count(alias_name="n_vecs"),
                       Sum("sq", alias_name="sum_sq_micro")))


def _embedding_norm_stats_sql() -> str:
    return (
        "SELECT label, CAST(count(*) AS BIGINT) AS n_vecs, "
        "CAST(sum(list_sum(list_transform(embedding, "
        "x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) * "
        "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))) "
        "AS BIGINT) AS sum_sq_micro "
        "FROM embeddings GROUP BY label")


def _q_host_degree_mixing(sf_dir: str):
    """Degree-assortativity sufficient statistics over the planted
    host graph (``ops/graph.degree_mixing_sums``): exact integer
    Σdᵤdᵥ / Σ(dᵤ+dᵥ) / Σ(dᵤ²+dᵥ²) over distinct undirected edges —
    hubs-link-hubs vs link-farm signature, no float on either side."""
    from xtract.ops.graph import degree_mixing_sums

    edges = _docs(sf_dir, ["doc_id"]).map_batches(
        _host_edge_batch_97, batch_format="pyarrow")
    return degree_mixing_sums(edges)


def _host_degree_mixing_sql() -> str:
    return (
        "WITH raw AS (SELECT (doc_id % 97) AS x, "
        "((doc_id % 97) * 31 + 17 * j + doc_id) % 97 AS y "
        "FROM documents, UNNEST(range(0, doc_id % 4)) AS t(j)), "
        "e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v "
        "FROM raw WHERE x != y), "
        "deg AS (SELECT node, count(*) AS d FROM "
        "(SELECT u AS node FROM e UNION ALL SELECT v FROM e) "
        "GROUP BY node) "
        "SELECT CAST(count(*) AS BIGINT) AS n_edges, "
        "CAST(sum(a.d * b.d) AS BIGINT) AS sum_prod, "
        "CAST(sum(a.d + b.d) AS BIGINT) AS sum_deg, "
        "CAST(sum(a.d * a.d + b.d * b.d) AS BIGINT) AS sum_sq "
        "FROM e JOIN deg a ON a.node = e.u JOIN deg b ON b.node = e.v")


def _q_winnow_fp_postings(sf_dir: str):
    """Posting-list view of the winnowing layer: the top-20 most
    widely shared fingerprints (boilerplate phrases) with doc counts
    and owning min-doc — what a phrase-provenance index serves.
    Distinct (fp, doc) combiner → one grouped Count+Min → partial
    top-k → tiny final sort."""
    from ray.data.aggregate import Count, Min

    from xtract.ops.textstats import winnow_fingerprints

    K = 20
    fps = winnow_fingerprints(_docs(sf_dir, ["doc_id", "text"]),
                              k=16, w=4)

    def distinct(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "fp": t["fp"].to_numpy(zero_copy_only=False)
                  .astype(np.int64),
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64)}).drop_duplicates()
        return pa.table({"fp": pa.array(df["fp"], pa.int64()),
                         "doc_id": pa.array(df["doc_id"], pa.int64())})

    agg = (fps.map_batches(distinct, batch_format="pyarrow")
           .groupby("fp")
           .aggregate(Count(alias_name="n_docs"),
                      Min("doc_id", alias_name="min_doc")))

    def topk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_docs"], 2))
        order = pc.sort_indices(t, sort_keys=[
            ("n_docs", "descending"), ("fp", "ascending")])
        return t.take(order[:K])

    head = agg.map_batches(topk, batch_format="pyarrow").to_pandas()
    head = head.sort_values(["n_docs", "fp"],
                            ascending=[False, True]).head(K)
    head["fp"] = head["fp"].astype("int64")
    head["n_docs"] = head["n_docs"].astype("int64")
    head["min_doc"] = head["min_doc"].astype("int64")
    return head.reset_index(drop=True)


def _winnow_fp_postings_sql() -> str:
    return (
        "WITH " + _winnow_cte() + ", "
        "sets AS (SELECT DISTINCT doc_id, hv FROM selfp) "
        "SELECT CAST(hv AS BIGINT) AS fp, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(min(doc_id) AS BIGINT) AS min_doc "
        "FROM sets GROUP BY hv HAVING count(*) >= 2 "
        "ORDER BY n_docs DESC, fp LIMIT 20")


def _lr_featurize(t: pa.Table) -> pa.Table:
    """Integer quality features for the trained classifier: centered
    token-count surface stats (constants match the SQL oracle)."""
    text = t["text"]
    spaces = pc.count_substring(text, " ").to_numpy(
        zero_copy_only=False).astype(np.int64)
    tables = pc.count_substring(text, "table").to_numpy(
        zero_copy_only=False).astype(np.int64)
    keys = pc.count_substring(text, "key").to_numpy(
        zero_copy_only=False).astype(np.int64)
    return pa.table({
        "doc_id": t["doc_id"],
        "x0": pa.array(np.ones(len(t), np.int64), pa.int64()),
        "x1": pa.array(np.minimum(spaces, 1000) // 4 - 12, pa.int64()),
        "x2": pa.array(np.minimum(tables, 200) - 3, pa.int64()),
        "x3": pa.array(np.minimum(keys, 200) - 2, pa.int64()),
        "y": pc.cast(pc.greater_equal(t["n_chars"], 306), pa.int64()),
    })


def _q_doc_quality_lr(sf_dir: str):
    """Trained logistic-regression quality classifier (the FineWeb /
    CCNet quality-filter shape): 4 full-batch GD steps in exact
    integer micro-units over centered surface features, then one
    broadcast scoring pass.  Each step is one streaming pass emitting
    a d+1-int partial per block into a native Sum — the driver holds
    d ints.  Label: n_chars ≥ 306 (the sf0.01 median), learned back
    from text-only features at ~97% accuracy."""
    from xtract.ops.logreg import score_logreg, train_logreg

    feats = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
             .map_batches(_lr_featurize, batch_format="pyarrow")
             .materialize())
    model = train_logreg(feats, ["x0", "x1", "x2", "x3"], "y",
                         steps=4, lr=32)
    out = score_logreg(feats, model, ["doc_id"]).to_pandas()
    for c in ("doc_id", "p_micro", "pred"):
        out[c] = out[c].astype("int64")
    return out


def _lr_sql_parts(train_where: str = "") -> tuple[str, str]:
    """Shared CTE body (features → 4 GD steps → w4) + the sigmoid
    micro-probability expression — reused by the scoring, confusion,
    calibration and conformal oracles.  ``train_where`` restricts the
    GRADIENT passes to a split (scoring still covers all of ``f``);
    ``f`` always carries ``bp`` (the LCG split basis points)."""
    def gsum(p):
        return ", ".join(
            f"SUM((y*1000000 - {p}) * x{j}) AS g{j}" for j in range(4))

    zn = " + ".join(f"wa{j}*x{j}" for j in range(4))
    sig = ("CAST(FLOOR(1000000.0/(1.0+EXP(-(CAST(" + zn +
           " AS DOUBLE)/10000000000.0))) + 0.5) AS BIGINT)")
    src = "f"
    parts = [
        "f AS (SELECT doc_id, CAST(1 AS BIGINT) AS x0, "
        "(LEAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')), 1000) // 4)"
        " - 12 AS x1, "
        "LEAST((LENGTH(text) - LENGTH(REPLACE(text, 'table', ''))) // 5,"
        " 200) - 3 AS x2, "
        "LEAST((LENGTH(text) - LENGTH(REPLACE(text, 'key', ''))) // 3,"
        " 200) - 2 AS x3, "
        "CAST(n_chars >= 306 AS BIGINT) AS y, "
        f"{_LCG_SQL} % 10000 AS bp FROM documents)",
    ]
    if train_where:
        src = "ftr"
        parts.append(f"ftr AS (SELECT * FROM f WHERE {train_where})")
    parts += [
        f"s1 AS (SELECT count(*) AS n, {gsum('500000')} FROM {src})",
        "w1 AS (SELECT " + ", ".join(
            f"CAST((32*g{j})//n AS BIGINT) AS wa{j}"
            for j in range(4)) + " FROM s1)",
    ]
    for k in range(2, 5):
        parts.append(f"q{k} AS (SELECT {src}.*, {sig} AS p "
                     f"FROM {src}, w{k - 1})")
        parts.append(f"s{k} AS (SELECT count(*) AS n, {gsum('p')} "
                     f"FROM q{k})")
        parts.append(f"w{k} AS (SELECT " + ", ".join(
            f"CAST(wa{j} + (32*g{j})//n AS BIGINT) AS wa{j}"
            for j in range(4)) + f" FROM w{k - 1}, s{k})")
    return ", ".join(parts), sig


def _doc_quality_lr_sql() -> str:
    """The 4 GD steps as nested scalar CTEs: HUGEINT sums and
    truncating ``//`` replay the int64 gradient/update exactly; the
    sigmoid re-quantization (FLOOR(p+0.5) of a double) is the one
    float step, IEEE-identical on both sides."""
    body, sig = _lr_sql_parts()
    return (f"WITH {body} SELECT doc_id, {sig} AS p_micro, "
            f"CAST({sig} >= 500000 AS BIGINT) AS pred FROM f, w4")


def _q_lr_confusion(sf_dir: str):
    """Exact-integer confusion matrix + precision/recall/accuracy ppm
    of the trained quality classifier against its label — the
    evaluation pass closing the train→score loop
    (``ops/mleval.confusion_stats``: one 4-value partial per block
    into a native Sum)."""
    import pandas as pd

    from xtract.ops.logreg import score_logreg, train_logreg
    from xtract.ops.mleval import confusion_stats

    feats = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
             .map_batches(_lr_featurize, batch_format="pyarrow")
             .materialize())
    model = train_logreg(feats, ["x0", "x1", "x2", "x3"], "y",
                         steps=4, lr=32)
    scored = score_logreg(feats, model, ["doc_id", "y"])
    s = confusion_stats(scored, "y", "pred")
    return pd.DataFrame([s]).astype("int64")


def _lr_confusion_sql() -> str:
    body, sig = _lr_sql_parts()
    return (
        f"WITH {body}, scored AS (SELECT y, "
        f"CAST({sig} >= 500000 AS BIGINT) AS pred FROM f, w4), "
        "c AS (SELECT "
        "sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS tp, "
        "sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS fp, "
        "sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS fn, "
        "sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS tn "
        "FROM scored) "
        "SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, "
        "CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn, "
        "CAST(CASE WHEN tp + fp = 0 THEN 0 ELSE (1000000 * tp) // "
        "(tp + fp) END AS BIGINT) AS precision_ppm, "
        "CAST(CASE WHEN tp + fn = 0 THEN 0 ELSE (1000000 * tp) // "
        "(tp + fn) END AS BIGINT) AS recall_ppm, "
        "CAST((1000000 * (tp + tn)) // (tp + fp + fn + tn) AS BIGINT) "
        "AS accuracy_ppm FROM c")


def _q_lr_calibration(sf_dir: str):
    """Reliability-diagram bins of the trained classifier: per decile
    of predicted micro-probability, (n, n_pos, Σp) exact ints —
    over/under-confidence shows as n_pos/n diverging from sum_p/n
    (``ops/mleval.calibration_bins``)."""
    from xtract.ops.logreg import score_logreg, train_logreg
    from xtract.ops.mleval import calibration_bins

    feats = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
             .map_batches(_lr_featurize, batch_format="pyarrow")
             .materialize())
    model = train_logreg(feats, ["x0", "x1", "x2", "x3"], "y",
                         steps=4, lr=32)
    scored = score_logreg(feats, model, ["doc_id", "y"])
    out = calibration_bins(scored, "p_micro", "y").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("bin").reset_index(drop=True)


def _lr_calibration_sql() -> str:
    body, sig = _lr_sql_parts()
    return (
        f"WITH {body}, scored AS (SELECT y, {sig} AS p FROM f, w4) "
        "SELECT LEAST(p // 100000, 9) AS bin, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(y) AS BIGINT) AS n_pos, "
        "CAST(sum(p) AS BIGINT) AS sum_p "
        "FROM scored GROUP BY 1 ORDER BY 1")


def _q_lr_conformal(sf_dir: str):
    """Split conformal prediction around the quality classifier:
    train on the ≥40% LCG bucket, calibrate the 90%-coverage
    nonconformity quantile on the <20% bucket, report coverage and
    prediction-set sizes on the 20–40% bucket
    (``ops/mleval.conformal_binary`` — the q̂ pull is ~α·n_cal slim
    rows, everything else is partial sums)."""
    import pandas as pd

    from xtract.ops.logreg import score_logreg, train_logreg
    from xtract.ops.mleval import conformal_binary

    def with_split(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bp = ((d * 2654435761 + 12345) % 4294967296) % 10000
        split = np.where(bp < 2000, "calib",
                         np.where(bp < 4000, "test", "train"))
        return t.append_column("split", pa.array(split, pa.string()))

    feats = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
             .map_batches(_lr_featurize, batch_format="pyarrow")
             .map_batches(with_split, batch_format="pyarrow")
             .materialize())
    train = feats.map_batches(
        lambda t: t.filter(pc.equal(t["split"], "train")),
        batch_format="pyarrow")
    model = train_logreg(train, ["x0", "x1", "x2", "x3"], "y",
                         steps=4, lr=32)
    scored = score_logreg(feats, model, ["doc_id", "y", "split"])
    s = conformal_binary(scored, "y", "p_micro", "split")
    return pd.DataFrame([s]).astype("int64")


def _lr_conformal_sql() -> str:
    body, sig = _lr_sql_parts(train_where="bp >= 4000")
    return (
        f"WITH {body}, "
        f"scored AS (SELECT f.doc_id, f.y, f.bp, {sig} AS p "
        "FROM f, w4), "
        "cal AS (SELECT CASE WHEN y = 1 THEN 1000000 - p ELSE p END "
        "AS nc FROM scored WHERE bp < 2000), "
        "nn AS (SELECT count(*) AS n_cal FROM cal), "
        "rk AS (SELECT n_cal, LEAST((9 * (n_cal + 1) + 9) // 10, "
        "n_cal) AS rank FROM nn), "
        "q AS (SELECT nc AS qhat FROM (SELECT nc, row_number() OVER "
        "(ORDER BY nc) AS rn FROM cal), rk WHERE rn = rank), "
        "ev AS (SELECT count(*) AS n_eval, "
        "sum(CASE WHEN (y = 1 AND 1000000 - p <= qhat) OR "
        "(y = 0 AND p <= qhat) THEN 1 ELSE 0 END) AS n_covered, "
        "sum(CASE WHEN 1000000 - p <= qhat THEN 1 ELSE 0 END + "
        "CASE WHEN p <= qhat THEN 1 ELSE 0 END) AS sum_set_size "
        "FROM scored, q WHERE bp >= 2000 AND bp < 4000) "
        "SELECT CAST(qhat AS BIGINT) AS qhat, "
        "CAST(n_cal AS BIGINT) AS n_cal, CAST(rank AS BIGINT) AS rank, "
        "CAST(n_eval AS BIGINT) AS n_eval, "
        "CAST(n_covered AS BIGINT) AS n_covered, "
        "CAST(sum_set_size AS BIGINT) AS sum_set_size "
        "FROM q, rk, ev")


def _q_lr_auc(sf_dir: str):
    """Exact ROC AUC of the trained quality classifier's micro-
    probability against its label (``ops/mleval.roc_auc``: grouped
    Sum over distinct scores → range sort → two-pass distributed
    prefix scan of negatives; doubled integer numerator, one IEEE
    division)."""
    from xtract.ops.logreg import score_logreg, train_logreg
    from xtract.ops.mleval import roc_auc

    feats = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
             .map_batches(_lr_featurize, batch_format="pyarrow")
             .materialize())
    model = train_logreg(feats, ["x0", "x1", "x2", "x3"], "y",
                         steps=4, lr=32)
    scored = score_logreg(feats, model, ["doc_id", "y"])
    return roc_auc(scored, "p_micro", "y")


def _lr_auc_sql() -> str:
    body, sig = _lr_sql_parts()
    return (
        f"WITH {body}, scored AS (SELECT y, {sig} AS p FROM f, w4), "
        "s AS (SELECT p AS v, sum(y) AS np, count(*) - sum(y) AS nn "
        "FROM scored GROUP BY 1), "
        "c AS (SELECT np, nn, COALESCE(sum(nn) OVER (ORDER BY v "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS cneg FROM s) "
        "SELECT CAST(sum(np) AS BIGINT) AS n_pos, "
        "CAST(sum(nn) AS BIGINT) AS n_neg, "
        "CAST(sum(2 * np * cneg + np * nn) AS BIGINT) AS auc_num2, "
        "CAST(sum(2 * np * cneg + np * nn) AS DOUBLE) / "
        "(2.0 * sum(np) * sum(nn)) AS auc FROM c")


def _q_nation_profit(sf_dir: str):
    """TPC-H Q9-shape product-line profit: revenue from lineitems of
    parts matching a name word, by supplier nation × order year, in
    exact integer micro-units.  Scale shape: the part filter is a
    broadcast semi-join (the published-scale path is
    ``bloom_semi_join`` when the filtered key set outgrows the 2M
    gate); supplier→nation is a vectorized searchsorted against a
    broadcast dimension; lineitem revenue is block-combined per
    (orderkey, nation) BEFORE the one large×large orderkey co-group
    that attaches the order year; the final exchange is a native Sum
    over a nations×years-bounded key space."""
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.joins import anti_join_broadcast, equi_join_cogroup

    WORD = "bolt"
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"]).to_pandas()
    pkeys = part.loc[part["p_name"].str.contains(WORD),
                     "p_partkey"].tolist()
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]
                           ).to_pandas().sort_values("s_suppkey")
    sk_ref = ray.put((supp["s_suppkey"].to_numpy(np.int64),
                      supp["s_nationkey"].to_numpy(np.int64)))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    li = anti_join_broadcast(li, "l_partkey", pkeys, semi=True)

    def combine(b: pa.Table) -> pa.Table:
        sk, nk = ray.get(sk_ref)
        cents = pc.cast(pc.round(pc.multiply(
            b["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        bp = pc.cast(pc.round(pc.multiply(
            b["l_discount"], pa.scalar(10_000.0))), pa.int64())
        micro = pc.multiply(cents, pc.subtract(
            pa.scalar(10_000, pa.int64()), bp)).to_numpy(
            zero_copy_only=False)
        pos = np.searchsorted(
            sk, b["l_suppkey"].to_numpy(zero_copy_only=False))
        g = (pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "nk": nk[pos], "micro": micro})
            .groupby(["ok", "nk"], sort=False)["micro"].sum()
            .reset_index())
        return pa.table({"ok": pa.array(g["ok"], pa.int64()),
                         "nk": pa.array(g["nk"], pa.int64()),
                         "micro": pa.array(g["micro"], pa.int64())})

    li_c = li.map_batches(combine, batch_format="pyarrow")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    o_slim = orders.map_batches(
        lambda b: pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64())}),
        batch_format="pyarrow")

    joined = equi_join_cogroup(li_c, o_slim, on="ok",
                               right_on="o_orderkey", how="inner")
    agg = (joined.groupby(["nk", "o_year"])
           .aggregate(Sum("micro", alias_name="profit_micro"))
           .to_pandas())
    nt = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    agg = agg.merge(nt[["n_nationkey", "n_name"]], left_on="nk",
                    right_on="n_nationkey")
    out = (agg[["n_name", "o_year", "profit_micro"]]
           .sort_values(["n_name", "o_year"]).reset_index(drop=True))
    out["o_year"] = out["o_year"].astype("int64")
    out["profit_micro"] = out["profit_micro"].astype("int64")
    return out


def _nation_profit_sql() -> str:
    return (
        "SELECT n_name, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year, "
        "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
        "(10000 - CAST(ROUND(l_discount*10000) AS BIGINT))) AS BIGINT) "
        "AS profit_micro "
        "FROM lineitem, orders, supplier, nation, part "
        "WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey "
        "AND s_nationkey = n_nationkey AND l_partkey = p_partkey "
        "AND p_name LIKE '%bolt%' "
        "GROUP BY n_name, o_year ORDER BY n_name, o_year")


def _q_doc_dsir_select(sf_dir: str):
    """DSIR data selection (Xie et al. 2023 shape): importance weight
    log p_target − log p_raw per document under two unigram LMs
    (target = lang='en' rows), exact integer micro-nats, then the top
    quartile selected by (score desc, doc_id).  vocab_size=24 < the
    corpus's 31 distinct tokens so the OOV bucket path is live.
    Scale shape: one token-count pass (combiner → grouped Sum), top-K
    vocab via block partial top-k, broadcast K-row weight table, one
    scoring pass; the threshold pull is N_sel slim rows."""
    from xtract.ops.dsir import dsir_scores

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    tagged = docs.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"], "text": t["text"],
            "is_tgt": pc.cast(pc.equal(t["lang"], "en"), pa.int64())}),
        batch_format="pyarrow")
    scores = dsir_scores(tagged, "text", "is_tgt", "doc_id",
                         vocab_size=24).materialize()
    n_sel = _docs(sf_dir, ["doc_id"]).count() // 4

    def btopk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("dsir_score", "descending"), ("doc_id", "ascending")])
        return t.take(idx[:n_sel])

    head = (scores.map_batches(btopk, batch_format="pyarrow")
            .sort(["dsir_score", "doc_id"], descending=[True, False])
            .limit(n_sel).take_all())
    thr_s, thr_d = head[-1]["dsir_score"], head[-1]["doc_id"]

    def flag(t: pa.Table) -> pa.Table:
        s = t["dsir_score"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        sel = (s > thr_s) | ((s == thr_s) & (d <= thr_d))
        return t.append_column(
            "selected", pa.array(sel.astype(np.int64), pa.int64()))

    out = scores.map_batches(flag, batch_format="pyarrow").to_pandas()
    for c in ("doc_id", "dsir_score", "selected"):
        out[c] = out[c].astype("int64")
    return out


_DOC_DSIR_SQL = (
    "WITH toks AS (SELECT doc_id, lang, "
    "UNNEST(regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9_]+')) "
    "AS tok FROM documents), "
    "cnt AS (SELECT tok, count(*) AS n_raw, "
    "sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_tgt "
    "FROM toks GROUP BY 1), "
    "vocab AS (SELECT * FROM cnt ORDER BY n_raw DESC, tok LIMIT 24), "
    "vs AS (SELECT count(*) AS v, sum(n_raw) AS t_raw, "
    "sum(n_tgt) AS t_tgt FROM vocab), "
    "w AS (SELECT tok, "
    "CAST(floor(1000000 * ln((n_tgt + 1.0) / (t_tgt + v))) AS BIGINT) - "
    "CAST(floor(1000000 * ln((n_raw + 1.0) / (t_raw + v))) AS BIGINT) "
    "AS w FROM vocab CROSS JOIN vs), "
    "oov AS (SELECT "
    "CAST(floor(1000000 * ln(1.0 / (t_tgt + v))) AS BIGINT) - "
    "CAST(floor(1000000 * ln(1.0 / (t_raw + v))) AS BIGINT) AS w "
    "FROM vs), "
    "tokw AS (SELECT t.doc_id, coalesce(w.w, (SELECT w FROM oov)) AS w "
    "FROM toks t LEFT JOIN w ON w.tok = t.tok), "
    "ssum AS (SELECT doc_id, sum(w) AS s FROM tokw GROUP BY 1), "
    "sc AS (SELECT d.doc_id, CAST(coalesce(s.s, 0) AS BIGINT) AS "
    "dsir_score FROM documents d LEFT JOIN ssum s ON s.doc_id = d.doc_id), "
    "ranked AS (SELECT doc_id, dsir_score, row_number() OVER "
    "(ORDER BY dsir_score DESC, doc_id) AS rn FROM sc) "
    "SELECT doc_id, dsir_score, "
    "CAST(rn <= (SELECT count(*) // 4 FROM documents) AS BIGINT) "
    "AS selected FROM ranked ORDER BY doc_id")


def _q_source_fp_overlap(sf_dir: str):
    """Cross-source contamination matrix: pairwise Jaccard (exact
    integer milli-units) between each source's winnowing-fingerprint
    set — the audit that catches one training source republishing
    another's text.  Winnowing explode keyed by source (no join:
    fingerprints are per-row) → keyed_set_overlap's single
    hash(fp) co-group (diagonal rows carry set sizes) → K²-bounded
    driver fold."""
    from xtract.ops.overlap import keyed_set_overlap, overlap_matrix
    from xtract.ops.textstats import winnow_fingerprints

    fps = winnow_fingerprints(
        _docs(sf_dir, ["source", "text"]), key="source", k=16, w=4)
    fps = fps.map_batches(
        lambda t: pa.table({"source": t["source"],
                            "fp": t["fp"].cast(pa.int64())}),
        batch_format="pyarrow")
    out = overlap_matrix(keyed_set_overlap(fps, "source", "fp"))
    out = out.rename(columns={"key_a": "source_a", "key_b": "source_b"})
    for c in ("inter", "union_n", "jaccard_milli"):
        out[c] = out[c].astype("int64")
    return out


def _source_fp_overlap_sql() -> str:
    return (
        "WITH " + _winnow_cte() + ", "
        "sets AS (SELECT DISTINCT d.source, f.hv FROM selfp f "
        "JOIN documents d USING (doc_id)), "
        "sizes AS (SELECT source, count(*) AS n FROM sets GROUP BY 1), "
        "pairs AS (SELECT a.source AS source_a, b.source AS source_b, "
        "count(*) AS inter FROM sets a JOIN sets b ON a.hv = b.hv "
        "AND a.source < b.source GROUP BY 1, 2) "
        "SELECT source_a, source_b, CAST(inter AS BIGINT) AS inter, "
        "CAST(sa.n + sb.n - inter AS BIGINT) AS union_n, "
        "CAST((1000 * inter) // (sa.n + sb.n - inter) AS BIGINT) "
        "AS jaccard_milli "
        "FROM pairs JOIN sizes sa ON sa.source = source_a "
        "JOIN sizes sb ON sb.source = source_b "
        "ORDER BY source_a, source_b")


def _q_part_name_linkage(sf_dir: str):
    """Entity resolution over part names: exact lev≤2 near-name pairs
    via FastSS deletion-neighborhood blocking — complete blocking, so
    the result equals the full n² SQL self-join without running one.
    Names are deduped to (name, min partkey) first (a grouped Min),
    then exploded/verified distributed."""
    from ray.data.aggregate import Min

    from xtract.ops.linkage import deletion_neighborhood_pairs

    import ray.data as rd

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"])
    names = part.groupby("p_name").aggregate(
        Min("p_partkey", alias_name="id"))
    pairs = deletion_neighborhood_pairs(names, "id", "p_name",
                                        max_dist=2)
    out = pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(
        drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_PART_NAME_LINKAGE_SQL = (
    "WITH nm AS (SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS id "
    "FROM part GROUP BY 1) "
    "SELECT a.id AS id_a, b.id AS id_b, "
    "CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist "
    "FROM nm a JOIN nm b ON a.id < b.id "
    "WHERE levenshtein(a.p_name, b.p_name) <= 2 ORDER BY id_a, id_b")


def _template_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a page rendered from one of FOUR fixed tag templates
    (doc_id%4) with per-page text and attribute values — structure is
    the only template-determined part, so the real DOM walk must map
    template k to exactly one fingerprint."""
    urls, htmls = [], []
    tpl = [
        "<div class='c{v}'><p>alpha {d}</p><p>beta {d}</p></div>",
        "<table id='t{v}'><tr><td>a {d}</td><td>b {d}</td></tr></table>",
        "<div><ul data-x='{v}'><li>one {d}</li><li>two</li><li>{d}</li>"
        "</ul></div>",
        "<article><h1>Head {d}</h1><p>body {d}</p><footer>f{v}</footer>"
        "</article>",
    ]
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://host{d % 6}.example.org/p/{d}")
        body = tpl[d % 4].format(d=d, v=d % 7)
        htmls.append((f"<html><head><title>p{d}</title></head>"
                      f"<body>{body}</body></html>").encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_page_template_stats(sf_dir: str):
    """DOM template detection: per host, how many pages / distinct
    structural templates / pages under the dominant template.  The
    oracle replays the generator's doc_id arithmetic, so it only
    matches if the real tokenizer walk collapses every page of a
    template to ONE fingerprint and never collides across the four
    templates."""
    from xtract.ops.templates import page_templates, template_host_stats

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _template_pages_batch, batch_format="pyarrow")
    out = template_host_stats(page_templates(pages)).to_pandas()
    for c in ("n_pages", "n_templates", "top_template_pages"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


_PAGE_TEMPLATE_STATS_SQL = (
    "WITH g AS (SELECT 'host' || CAST(doc_id % 6 AS VARCHAR) || "
    "'.example.org' AS host, doc_id % 4 AS tpl FROM documents), "
    "c AS (SELECT host, tpl, count(*) AS n FROM g GROUP BY 1, 2) "
    "SELECT host, CAST(sum(n) AS BIGINT) AS n_pages, "
    "CAST(count(*) AS BIGINT) AS n_templates, "
    "CAST(max(n) AS BIGINT) AS top_template_pages "
    "FROM c GROUP BY host ORDER BY host")


def _q_knn_pq(sf_dir: str):
    """Product-quantization ANN (Jégou 2011 shape): train m=2
    integer-micro-unit codebooks (distributed k-means per subspace),
    encode the corpus to 2 codes/vector in one broadcast pass, answer
    the top-10 query from the codes alone via an exact-int ADC lookup
    table — the compressed-index regime where raw vectors no longer
    fit.  Bit-identical at any parallelism; the full
    train→encode→search chain replays in SQL."""
    from xtract.ops.pq import pq_encode, pq_search, train_pq

    emb = _emb(sf_dir)
    q_vec = np.asarray(
        emb.sort("vec_id").limit(1).take_all()[0]["embedding"],
        np.float64)
    books = train_pq(emb, dim=64, m=2, k=8, iters=2)
    codes = pq_encode(emb, books)
    out = pq_search(codes, books, q_vec, topk=10).to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    out["pq_dist"] = out["pq_dist"].astype("int64")
    return out


def _pq_sql(m: int = 2, k: int = 8, iters: int = 2, dim: int = 64,
            unit: int = 1 << 20) -> str:
    """Unrolled PQ replay: per subspace the `_kmeans_sql` Lloyd CTEs
    over the sliced sub-vectors, a final assignment (the codes), the
    query row's exact-int distance table, then the ADC top-10."""
    sub = dim // m
    parts = []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        parts.append(
            f"e{s} AS (SELECT vec_id, list_transform("
            f"embedding[{lo}:{hi}], x -> CAST(floor(x * {unit}.0) AS "
            "BIGINT)) AS q FROM embeddings)")
        parts.append(
            f"c{s}_0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 "
            f"AS cidx, q FROM e{s} ORDER BY vec_id LIMIT {k})")
        for i in range(1, iters + 1):
            parts.append(
                f"a{s}_{i} AS (SELECT e.vec_id, c.cidx, row_number() "
                "OVER (PARTITION BY e.vec_id ORDER BY "
                "list_inner_product(c.q, c.q) - "
                "2 * list_inner_product(e.q, c.q), c.cidx) AS rn "
                f"FROM e{s} e CROSS JOIN c{s}_{i - 1} c)")
            parts.append(
                f"s{s}_{i} AS (SELECT cidx, dim, CAST(floor(CAST("
                "sum(val) AS DOUBLE) / count(*)) AS BIGINT) AS v FROM "
                f"(SELECT a.cidx, UNNEST(e.q) AS val, "
                f"UNNEST(range(len(e.q))) AS dim FROM e{s} e "
                f"JOIN a{s}_{i} a ON a.vec_id = e.vec_id AND a.rn = 1) "
                "GROUP BY cidx, dim)")
            parts.append(
                f"c{s}_{i} AS (SELECT p.cidx, coalesce(mm.q, p.q) AS q "
                f"FROM c{s}_{i - 1} p LEFT JOIN (SELECT cidx, "
                f"list(v ORDER BY dim) AS q FROM s{s}_{i} GROUP BY cidx) "
                "mm ON mm.cidx = p.cidx)")
        parts.append(
            f"a{s}_F AS (SELECT e.vec_id, c.cidx, row_number() OVER ("
            "PARTITION BY e.vec_id ORDER BY "
            "list_inner_product(c.q, c.q) - "
            "2 * list_inner_product(e.q, c.q), c.cidx) AS rn "
            f"FROM e{s} e CROSS JOIN c{s}_{iters} c)")
        parts.append(f"f{s} AS (SELECT vec_id, cidx FROM a{s}_F "
                     "WHERE rn = 1)")
        parts.append(f"q{s} AS (SELECT q FROM e{s} ORDER BY vec_id "
                     "LIMIT 1)")
        parts.append(
            f"d{s} AS (SELECT c.cidx, list_inner_product(c.q, c.q) - "
            "2 * list_inner_product(qq.q, c.q) + "
            "list_inner_product(qq.q, qq.q) AS dd "
            f"FROM c{s}_{iters} c, q{s} qq)")
    dist = " + ".join(f"d{s}.dd" for s in range(m))
    joins = "f0" + "".join(
        f" JOIN f{s} ON f{s}.vec_id = f0.vec_id" for s in range(1, m))
    joins += "".join(
        f" JOIN d{s} ON d{s}.cidx = f{s}.cidx" for s in range(m))
    return ("WITH " + ", ".join(parts) +
            f" SELECT f0.vec_id, CAST({dist} AS BIGINT) AS pq_dist "
            f"FROM {joins} ORDER BY pq_dist, f0.vec_id LIMIT 10")


def _q_event_value_bootstrap(sf_dir: str):
    """Deterministic Poisson bootstrap (Chamandy/Google 2012 shape):
    per (event_type, replica) the Poisson(1)-weighted integer-cent
    value sum and effective count, weights a pure function of
    splitmix64(event_id·B + b) against exact uint64 inverse-CDF
    thresholds — the replicate table any SE/CI computation folds,
    bit-identical at any parallelism.  One streaming pass, keys×B
    combiner rows per block, ONE grouped Sum."""
    import ray.data as rd

    from xtract.ops.bootstrap import bootstrap_group_sums

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    out = bootstrap_group_sums(ev, "event_type", "value", "event_id",
                               n_replicas=16).to_pandas()
    for c in ("replica", "sw", "n_eff"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "replica"]).reset_index(
        drop=True)


def _event_value_bootstrap_sql() -> str:
    from xtract.ops.bootstrap import POISSON1_THRESHOLDS

    case = "CASE " + " ".join(
        f"WHEN u < {t} THEN {k}"
        for k, t in enumerate(POISSON1_THRESHOLDS)) + " ELSE 9 END"
    ctes, last = _sql_chain("h0", _sql_mix64("x0", "u", "bp"), "bs_")
    return (
        "WITH r AS (SELECT event_type, event_id, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, b "
        "FROM events, UNNEST(range(0, 16)) AS t(b)), "
        "h0 AS (SELECT *, CAST((CAST(event_id AS HUGEINT) * 16 + b) % "
        f"{_U64} AS UBIGINT) AS x0 FROM r), "
        + ", ".join(ctes) + ", "
        f"wt AS (SELECT event_type, b, cents, {case} AS w FROM {last}) "
        "SELECT event_type, CAST(b AS BIGINT) AS replica, "
        "CAST(sum(w * cents) AS BIGINT) AS sw, "
        "CAST(sum(w) AS BIGINT) AS n_eff "
        "FROM wt GROUP BY 1, 2 ORDER BY 1, 2")


def _q_shard_assign_2level(sf_dir: str):
    """Two-level rendezvous sharding (8 groups × 8 shards): the
    thousands-of-shards HRW path — rows×(G+S) score work instead of
    rows×(G·S).  Per-doc assignment, SQL-replayed via two unrolled
    argmax windows."""
    from xtract.ops.bucketed import rendezvous_shard_2level

    out = rendezvous_shard_2level(
        _docs(sf_dir, ["doc_id"]), "doc_id", n_groups=8,
        shards_per_group=8).to_pandas()
    out["shard"] = out["shard"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_SHARD_2LEVEL_SQL = (
    "WITH l1 AS (SELECT doc_id, g, "
    "((doc_id * 2654435761 + g * 40503 + 7) % 4294967296) AS m "
    "FROM documents, UNNEST(range(0, 8)) AS t(g)), "
    "b1 AS (SELECT doc_id, g FROM (SELECT doc_id, g, row_number() "
    "OVER (PARTITION BY doc_id ORDER BY (CAST(m AS HUGEINT) * m) % 4294967296 DESC, g) "
    "AS rn FROM l1) WHERE rn = 1), "
    "l2 AS (SELECT b1.doc_id, b1.g * 8 + s AS sid, s, "
    "((doc_id * 2654435761 + b1.g * 40503 + s * 69069 + 11) % "
    "4294967296) AS m FROM b1, UNNEST(range(0, 8)) AS t(s)) "
    "SELECT doc_id, CAST(sid AS BIGINT) AS shard FROM "
    "(SELECT doc_id, sid, row_number() OVER (PARTITION BY doc_id "
    "ORDER BY (CAST(m AS HUGEINT) * m) % 4294967296 DESC, s) AS rn FROM l2) "
    "WHERE rn = 1 ORDER BY doc_id")


def _q_host_truss(sf_dir: str):
    """3-truss of the planted host link graph (every surviving edge in
    ≥1 triangle within the truss): iterative support peel over the
    degree-ordered wedge/closure machinery — the community-core filter
    stricter than k-core (``host_k_core``'s sibling)."""
    from xtract.ops.graph import k_truss

    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = ids % 97
        nl = (ids % 4).astype(np.int64)
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), nl)
        run_start = np.repeat(np.cumsum(nl) - nl, nl)
        j = np.arange(len(rep), dtype=np.int64) - run_start
        return pa.table({
            "src": pa.array(h[rep], pa.int64()),
            "dst": pa.array((h[rep] * 31 + 17 * j + ids[rep]) % 97,
                            pa.int64())})

    out = k_truss(docs.map_batches(edges, batch_format="pyarrow"),
                  k=3, max_rounds=4).to_pandas()
    for c in ("u", "v", "support"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["u", "v"]).reset_index(drop=True)


def _host_truss_sql(rounds: int = 4) -> str:
    """Unrolled peel: R rounds of (triangle triple-join → per-edge
    incidence count → keep support ≥ 1); fixpoint reached by round 2
    on this graph, extra rounds are no-ops, and the Ray side raises
    past max_rounds=R so both sides stay honest."""
    parts = [
        "raw AS MATERIALIZED (SELECT (doc_id % 97) AS x, "
        "((doc_id % 97) * 31 + 17 * j + doc_id) % 97 AS y "
        "FROM documents, UNNEST(range(0, doc_id % 4)) AS t(j)), "
        "e0 AS MATERIALIZED (SELECT DISTINCT least(x, y) AS u, "
        "greatest(x, y) AS v FROM raw WHERE x != y)"]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"tri{i} AS MATERIALIZED (SELECT a.u AS n1, a.v AS n2, b.v AS n3 "
            f"FROM e{p} a JOIN e{p} b ON b.u = a.v "
            f"JOIN e{p} c ON c.u = a.u AND c.v = b.v)")
        parts.append(
            f"inc{i} AS (SELECT n1 AS u, n2 AS v FROM tri{i} "
            f"UNION ALL SELECT n2, n3 FROM tri{i} "
            f"UNION ALL SELECT n1, n3 FROM tri{i})")
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT u, v FROM (SELECT u, v, "
            f"count(*) AS c FROM inc{i} GROUP BY 1, 2) WHERE c >= 1)")
    return (
        "WITH " + ", ".join(parts) +
        f", trif AS (SELECT a.u AS n1, a.v AS n2, b.v AS n3 "
        f"FROM e{rounds} a JOIN e{rounds} b ON b.u = a.v "
        f"JOIN e{rounds} c ON c.u = a.u AND c.v = b.v), "
        "incf AS (SELECT n1 AS u, n2 AS v FROM trif "
        "UNION ALL SELECT n2, n3 FROM trif "
        "UNION ALL SELECT n1, n3 FROM trif) "
        "SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, "
        "CAST(count(*) AS BIGINT) AS support FROM incf "
        "GROUP BY u, v ORDER BY u, v")


def _q_events_late_arrivals(sf_dir: str):
    """Watermark lateness audit: replay the (time-ordered) event log
    in a deterministic LCG-shuffled arrival order and flag events more
    than 7 days behind the running event-time max over earlier
    arrivals — the allowed-lateness sizing pass run before deploying a
    streaming window.  A distributed GLOBAL prefix scan: per-block
    exclusive running max folded on the driver (n_blocks rows),
    finished in-block with one maximum.accumulate (~77% late at this
    knob — the label is live at both SFs)."""
    import ray.data as rd

    from xtract.ops.streaming import tag_late_events

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts"])

    def arrival(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        arr = ((e * 2654435761 + 12345) % 4294967296) * 2147483648 + e
        return pa.table({"event_id": b["event_id"], "ts": b["ts"],
                         "arr": pa.array(arr, pa.int64())})

    out = tag_late_events(ev.map_batches(arrival, batch_format="pyarrow"),
                          "arr", "ts",
                          lateness_us=7 * 86_400_000_000).to_pandas()
    arr = out["arr"].to_numpy(np.int64)
    out["event_id"] = arr % 2147483648
    out = out[["event_id", "late"]]
    for c in ("event_id", "late"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


_EVENTS_LATE_SQL = (
    "WITH x AS (SELECT event_id, ts, "
    "((event_id * 2654435761 + 12345) % 4294967296) * 2147483648 "
    "+ event_id AS arr FROM events) "
    "SELECT event_id, CAST(CASE WHEN epoch_us(ts) < "
    "MAX(epoch_us(ts)) OVER (ORDER BY arr ROWS BETWEEN UNBOUNDED "
    "PRECEDING AND 1 PRECEDING) - 604800000000 THEN 1 ELSE 0 END "
    "AS BIGINT) AS late FROM x ORDER BY event_id")


def _q_events_k_anonymity(sf_dir: str):
    """k-anonymity audit (k=10) over the quasi-identifier pair
    (event_type, user_id): the combinations a linkage attacker can
    isolate below the k threshold (9 violators at sf0.001, 107 at
    sf0.01 — the label is live).  One grouped Count + vectorized
    filter (``ops/pii.k_anonymity_audit``)."""
    import ray.data as rd

    from xtract.ops.pii import k_anonymity_audit

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    out = k_anonymity_audit(ev, ["event_type", "user_id"],
                            k=10).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values(["event_type", "user_id"]).reset_index(
        drop=True)


_EVENTS_K_ANON_SQL = (
    "SELECT event_type, user_id, "
    "CAST(count(*) AS BIGINT) AS n FROM events "
    "GROUP BY 1, 2 HAVING count(*) < 10 ORDER BY 1, 2")


def _q_event_type_dp_counts(sf_dir: str):
    """ε-DP histogram release (discrete Laplace, ε=1/2) with
    hash-seeded noise — reproducible across runs and parallelism, the
    mechanism documented as seed-swappable for a real release
    (``ops/pii.dp_noisy_counts``)."""
    import ray.data as rd

    from xtract.ops.pii import dp_noisy_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type"])
    out = dp_noisy_counts(ev, "event_type", eps_num=1,
                          eps_den=2).to_pandas()
    for c in ("n_true", "noise", "n_noisy"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def _event_type_dp_counts_sql() -> str:
    from xtract.ops.pii import _dgeom_thresholds

    thr = _dgeom_thresholds(1, 2, 64)
    vals = ", ".join(f"(CAST('{t}' AS UBIGINT))" for t in thr)
    ctes, last = _sql_chain("h0", _sql_mix64("x0", "u", "dp"), "dp_")
    return (
        "WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS "
        "n_true FROM events GROUP BY 1), "
        "h0 AS (SELECT *, md5_number_upper(event_type) AS x0 FROM c), "
        + ", ".join(ctes) + ", "
        f"thr(t) AS (VALUES {vals}) "
        "SELECT event_type, n_true, "
        "CAST((SELECT count(*) FROM thr WHERE thr.t <= u) - 64 "
        "AS BIGINT) AS noise, "
        "CAST(n_true + (SELECT count(*) FROM thr WHERE thr.t <= u) - 64 "
        f"AS BIGINT) AS n_noisy FROM {last} ORDER BY event_type")


def _q_event_user_kmv(sf_dir: str):
    """KMV distinct-users sketch per event type (k=64): the mergeable
    distinct estimator whose SKETCH is bit-identical at any
    parallelism (deterministic splitmix64 hash).  Exact path live at
    sf0.001 (15 < k), estimate path at sf0.01 (150 > k)."""
    import ray.data as rd

    from xtract.ops.kmv import grouped_kmv_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    out = grouped_kmv_distinct(ev, "event_type", "user_id",
                               k=64).to_pandas()
    for c in ("n_hashes", "kth_min", "est"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def _event_user_kmv_sql(k: int = 64) -> str:
    ctes, last = _sql_chain("h0", _sql_mix64("x0", "u", "kmv"), "kmv_")
    two64 = 1 << 64
    return (
        "WITH h0 AS (SELECT DISTINCT event_type, "
        "CAST(user_id AS UBIGINT) AS x0 FROM events), "
        + ", ".join(ctes) + ", "
        f"r AS (SELECT event_type, u, row_number() OVER ("
        "PARTITION BY event_type ORDER BY u) AS rn FROM "
        f"(SELECT DISTINCT event_type, u FROM {last})), "
        f"agg AS (SELECT event_type, "
        f"count(*) FILTER (WHERE rn <= {k}) AS n_hashes, "
        f"max(CASE WHEN rn = {k} THEN u END) AS kth FROM r GROUP BY 1) "
        "SELECT event_type, CAST(n_hashes AS BIGINT) AS n_hashes, "
        f"CAST(CASE WHEN n_hashes < {k} THEN 0 ELSE "
        "CAST(kth AS HUGEINT) - 9223372036854775808 END AS BIGINT) "
        "AS kth_min, "
        f"CAST(CASE WHEN n_hashes < {k} THEN n_hashes ELSE "
        f"({k - 1} * CAST({two64} AS HUGEINT)) // CAST(kth AS HUGEINT) "
        "END AS BIGINT) AS est FROM agg ORDER BY event_type")


def _q_doc_neyman_sample(sf_dir: str):
    """Neyman-allocation stratified sample (n=200 across sources,
    allocation ∝ N_h·σ_h of n_chars): the eval-set construction that
    oversamples internally-variable strata.  One grouped-Sum stats
    pass, broadcast allocation, per-stratum deterministic
    (lcg(id), id) selection with a block top-k combiner."""
    from xtract.ops.neyman import neyman_stratified_sample

    _, sel = neyman_stratified_sample(
        _docs(sf_dir, ["doc_id", "source", "n_chars"]),
        "source", "n_chars", "doc_id", n_total=200)
    out = sel.to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True)


_DOC_NEYMAN_SQL = (
    "WITH st AS (SELECT source, count(*) AS n, sum(n_chars) AS sx, "
    "sum(n_chars * n_chars) AS sxx FROM documents GROUP BY 1), "
    "sg AS (SELECT source, n, CAST(FLOOR(SQRT(CAST((n * sxx - sx * sx) "
    "// (n * n) AS DOUBLE))) AS BIGINT) AS sigma FROM st), "
    "tot AS (SELECT sum(n * sigma) AS a FROM sg), "
    "al AS (SELECT source, LEAST(CAST((200 * n * sigma) // "
    "(SELECT a FROM tot) AS BIGINT), n) AS n_alloc FROM sg), "
    "r AS (SELECT source, doc_id, row_number() OVER (PARTITION BY "
    "source ORDER BY (doc_id * 2654435761 + 12345) % 4294967296, "
    "doc_id) AS rn FROM documents) "
    "SELECT r.source, r.doc_id FROM r JOIN al ON al.source = r.source "
    "WHERE r.rn <= al.n_alloc ORDER BY r.source, r.doc_id")


def _q_source_zipf_slope(sf_dir: str):
    """Zipf rank-frequency fit per source: OLS slope of
    (floor(10⁶·ln rank), floor(10⁶·ln freq)) over each source's top-20
    tokens — natural corpora sit near slope −1; synthetic/templated
    text shows up flatter.  Exact integer sufficient statistics
    (slope as num/den pair — no float division crosses the wire).
    One token-count pass (combiner → grouped Sum), per-source top-k,
    sources×20-bounded driver fold."""
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    from xtract.ops.nbayes import flat_tokens

    R = 20

    def partial(b: pa.Table) -> pa.Table:
        flat, cnts = flat_tokens(b["text"])
        src = np.repeat(
            np.asarray(b["source"].to_pylist(), dtype=object), cnts)
        g = (pd.DataFrame({"source": src, "tok": flat})
             .groupby(["source", "tok"], sort=False).size()
             .reset_index(name="n"))
        return pa.table({
            "source": pa.array(g["source"], pa.string()),
            "tok": pa.array(g["tok"], pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64())})

    counts = (_docs(sf_dir, ["source", "text"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["source", "tok"])
              .aggregate(Sum("n", alias_name="n")))

    def block_topk(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
              .sort_values(["source", "n", "tok"],
                           ascending=[True, False, True],
                           kind="mergesort")
              .groupby("source", sort=False).head(R))
        return pa.table({"source": pa.array(df["source"], pa.string()),
                         "tok": pa.array(df["tok"], pa.string()),
                         "n": pa.array(df["n"].to_numpy(np.int64),
                                       pa.int64())})

    head = (counts.map_batches(block_topk, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["source", "n", "tok"],
                         ascending=[True, False, True],
                         kind="mergesort")
            .groupby("source", sort=False).head(R))

    S = 1_000_000
    rows = []
    for src, g in head.groupby("source", sort=True):
        f = g["n"].to_numpy(np.int64)
        r = np.arange(1, len(f) + 1)
        x = np.asarray([math.floor(S * math.log(int(v))) for v in r],
                       dtype=object)
        y = np.asarray([math.floor(S * math.log(int(v))) for v in f],
                       dtype=object)
        nn = len(f)
        num = nn * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        den = nn * int((x * x).sum()) - int(x.sum()) ** 2
        rows.append((src, num, den))
    out = pd.DataFrame(rows, columns=["source", "slope_num",
                                      "slope_den"])
    for c in ("slope_num", "slope_den"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


_SOURCE_ZIPF_SQL = (
    "WITH toks AS (SELECT source, "
    "UNNEST(regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9_]+')) "
    "AS tok FROM documents), "
    "cnt AS (SELECT source, tok, count(*) AS n FROM toks GROUP BY 1, 2), "
    "rk AS (SELECT source, n, row_number() OVER (PARTITION BY source "
    "ORDER BY n DESC, tok) AS r FROM cnt), "
    "top AS (SELECT source, "
    "CAST(floor(1000000 * ln(r)) AS BIGINT) AS x, "
    "CAST(floor(1000000 * ln(n)) AS BIGINT) AS y "
    "FROM rk WHERE r <= 20) "
    "SELECT source, "
    "CAST(count(*) * sum(CAST(x AS HUGEINT) * y) - sum(CAST(x AS "
    "HUGEINT)) * sum(CAST(y AS HUGEINT)) AS BIGINT) AS slope_num, "
    "CAST(count(*) * sum(CAST(x AS HUGEINT) * x) - sum(CAST(x AS "
    "HUGEINT)) * sum(CAST(x AS HUGEINT)) AS BIGINT) AS slope_den "
    "FROM top GROUP BY source ORDER BY source")


def _q_lr_tune(sf_dir: str):
    """Successive-halving hyperparameter search over the classifier's
    learning rate (grid 8/32/128/512, 2-step rungs): exact integer L1
    losses drive the halving, so the SEARCH ITSELF — losses,
    selections, winning weights — replays in SQL.  Compute = half the
    full grid's passes (``ops/logreg.tune_logreg_halving``)."""
    import pandas as pd

    from xtract.ops.logreg import tune_logreg_halving

    feats = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
             .map_batches(_lr_featurize, batch_format="pyarrow")
             .materialize())
    best = tune_logreg_halving(feats, ["x0", "x1", "x2", "x3"], "y",
                               lr_grid=(8, 32, 128, 512), rung_steps=2)
    row = {"best_lr": best["best_lr"], "loss": best["loss"],
           **{f"w{j}": best["w"][j] for j in range(4)}}
    return pd.DataFrame([row]).astype("int64")


def _lr_tune_sql(grid=(8, 32, 128, 512), rung: int = 2) -> str:
    """Every candidate's 2·rung-step GD chain unrolled (the oracle
    skips the compute saving, not the selection rule): rung-1 losses →
    top-half by (loss, lr) → final winner among survivors."""
    def gsum(p, src):
        return ", ".join(
            f"SUM((y*1000000 - {p}) * x{j}) AS g{j}" for j in range(4))

    zn = " + ".join(f"wa{j}*x{j}" for j in range(4))
    sig = ("CAST(FLOOR(1000000.0/(1.0+EXP(-(CAST(" + zn +
           " AS DOUBLE)/10000000000.0))) + 0.5) AS BIGINT)")
    body, _ = _lr_sql_parts()
    # reuse only the f CTE from the shared body
    f_cte = body.split(", s1 AS ")[0]
    parts = [f_cte]
    total = 2 * rung
    for lr in grid:
        p = f"c{lr}_"
        parts.append(f"{p}s1 AS (SELECT count(*) AS n, "
                     f"{gsum('500000', 'f')} FROM f)")
        parts.append(f"{p}w1 AS (SELECT " + ", ".join(
            f"CAST(({lr}*g{j})//n AS BIGINT) AS wa{j}"
            for j in range(4)) + f" FROM {p}s1)")
        for k in range(2, total + 1):
            parts.append(f"{p}q{k} AS (SELECT f.*, {sig} AS p "
                         f"FROM f, {p}w{k - 1})")
            parts.append(f"{p}s{k} AS (SELECT count(*) AS n, "
                         f"{gsum('p', f'{p}q{k}')} FROM {p}q{k})")
            parts.append(f"{p}w{k} AS (SELECT " + ", ".join(
                f"CAST(wa{j} + ({lr}*g{j})//n AS BIGINT) AS wa{j}"
                for j in range(4)) + f" FROM {p}w{k - 1}, {p}s{k})")
        for k in (rung, total):
            parts.append(
                f"{p}loss{k} AS (SELECT CAST(sum(ABS(y*1000000 - p)) "
                f"AS BIGINT) AS loss FROM (SELECT y, {sig} AS p "
                f"FROM f, {p}w{k}))")
    r1 = " UNION ALL ".join(
        f"SELECT {lr} AS lr, (SELECT loss FROM c{lr}_loss{rung}) AS loss"
        for lr in grid)
    r2 = " UNION ALL ".join(
        f"SELECT {lr} AS lr, (SELECT loss FROM c{lr}_loss{total}) AS loss"
        for lr in grid)
    wts = " UNION ALL ".join(
        f"SELECT {lr} AS lr, wa0, wa1, wa2, wa3 FROM c{lr}_w{total}"
        for lr in grid)
    half = max(1, len(grid) // 2)
    return (
        "WITH " + ", ".join(parts) + f", r1 AS ({r1}), "
        f"keep AS (SELECT lr FROM r1 ORDER BY loss, lr LIMIT {half}), "
        f"r2 AS ({r2}), wts AS ({wts}) "
        "SELECT CAST(r2.lr AS BIGINT) AS best_lr, r2.loss, "
        "wa0 AS w0, wa1 AS w1, wa2 AS w2, wa3 AS w3 "
        "FROM r2 JOIN keep USING (lr) JOIN wts ON wts.lr = r2.lr "
        "ORDER BY r2.loss, r2.lr LIMIT 1")


def _form_pages_batch(t: pa.Table) -> pa.Table:
    """doc_id → a page with a search-style form (action + method +
    three field kinds, one required) and for doc_id%4==0 a second
    action-less form (submits to the page url, HTML-spec default)."""
    urls, htmls = [], []
    for d in t["doc_id"].to_pylist():
        urls.append(f"https://host{d % 6}.example.org/p/{d}")
        h = (f"<html><head><base href='/app{d % 2}/'></head><body>"
             f"<form action='go{d % 3}' "
             f"method='{'post' if d % 2 else 'GET'}'>"
             f"<input name='q{d % 5}' type='Text' required>"
             f"<select name='s{d % 3}'></select>"
             "<textarea name='t'></textarea></form>")
        if d % 4 == 0:
            h += f"<form><input type='hidden' name='h{d % 7}'></form>"
        h += "</body></html>"
        htmls.append(h.encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def _q_page_forms(sf_dir: str):
    """Form-field extraction: one row per input/select/textarea/button
    with resolved action + normalized method — the interactivity
    surface crawl scheduling and boilerplate filters read
    (``xtract/tables.extract_forms``)."""
    from xtract.tables import extract_forms

    pages = _docs(sf_dir, ["doc_id"]).map_batches(
        _form_pages_batch, batch_format="pyarrow")
    return extract_forms(pages)


def _page_forms_sql() -> str:
    page = ("'https://host' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org/p/' || CAST(doc_id AS VARCHAR)")
    act = ("'https://host' || CAST(doc_id % 6 AS VARCHAR) || "
           "'.example.org/app' || CAST(doc_id % 2 AS VARCHAR) || "
           "'/go' || CAST(doc_id % 3 AS VARCHAR)")
    meth = "CASE WHEN doc_id % 2 = 1 THEN 'post' ELSE 'get' END"
    core = [
        ("0", "'input'", "'q' || CAST(doc_id % 5 AS VARCHAR)",
         "'text'", "true"),
        ("1", "'select'", "'s' || CAST(doc_id % 3 AS VARCHAR)",
         "''", "false"),
        ("2", "'textarea'", "'t'", "''", "false"),
    ]
    parts = [
        (f"SELECT {page} AS url, CAST(0 AS BIGINT) AS form_idx, "
         f"CAST({fi} AS BIGINT) AS field_idx, {act} AS action, "
         f"{meth} AS method, {tag} AS field_tag, {name} AS field_name, "
         f"{ftype} AS field_type, {req} AS required FROM documents")
        for fi, tag, name, ftype, req in core]
    parts.append(
        f"SELECT {page}, 1, 0, {page}, 'get', 'input', "
        "'h' || CAST(doc_id % 7 AS VARCHAR), 'hidden', false "
        "FROM documents WHERE doc_id % 4 = 0")
    return " UNION ALL ".join(parts)


def _q_user_value_cusum(sf_dir: str):
    """Sequential changepoint detection: one-sided CUSUM per user over
    event values in cents (Page's statistic via the prefix-sum /
    running-min closed form, ``ops/changepoint.cusum_alarms``) —
    drift 6000 cents, alarm threshold 50000 cents.  Exact int64, one
    coarse user-hash co-group, vectorized cython per partition."""
    import ray.data as rd

    from xtract.ops.changepoint import cusum_alarms

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value", "event_id"])

    def to_cents(b: pa.Table) -> pa.Table:
        c = np.round(b["value"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "ts": b["ts"],
            "event_id": b["event_id"],
            "cents": pa.array(c, pa.int64())})

    out = cusum_alarms(ev.map_batches(to_cents, batch_format="pyarrow"),
                       key="user_id", ts_col="ts", val_col="cents",
                       id_col="event_id", drift=6000,
                       threshold=50000).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q_source_length_ks(sf_dir: str):
    """Distribution drift between two sources: exact two-sample KS
    statistic over document lengths (``ops/drift.two_sample_ks``) —
    integer cross-multiplied cumulative counts, distributed global
    prefix scan over the distinct-value table."""
    import ray.data as rd

    from xtract.ops.drift import two_sample_ks

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "n_chars"])
    return two_sample_ks(docs, group_col="source", val_col="n_chars",
                         group_a="src0", group_b="src1")


def _q_embedding_coreset(sf_dir: str):
    """Diversity coreset: Gonzalez farthest-first k-center exemplars
    over the embeddings table (``ops/similarity.farthest_first_centers``)
    — exact integer distances, k corpus passes, one candidate row per
    block per pass."""
    import ray.data as rd

    from xtract.ops.similarity import farthest_first_centers

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    out = farthest_first_centers(emb, k=5)
    return out.rename(columns={"round": "sel_round"})


def _coreset_sql(k: int = 5, unit: int = 1 << 20) -> str:
    """Unrolled Gonzalez farthest-first replay mirroring
    ``farthest_first_centers`` (same quantization as `_kmeans_sql`)."""
    dist = ("CAST({x}.n2 - 2 * list_inner_product({x}.q, {c}.q) "
            "+ {c}.n2 AS BIGINT)")
    parts = [
        f"e AS (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(floor(x * {unit}.0) AS BIGINT)) AS q FROM embeddings)",
        "n AS (SELECT vec_id, q, CAST(list_inner_product(q, q) AS BIGINT)"
        " AS n2 FROM e)",
        "c1 AS (SELECT vec_id, q, n2 FROM n ORDER BY vec_id LIMIT 1)",
        "d1 AS (SELECT n.vec_id, n.q, n.n2, "
        + dist.format(x="n", c="c1") + " AS d FROM n, c1)",
    ]
    for r in range(2, k + 1):
        parts.append(
            f"c{r} AS (SELECT vec_id, q, n2, d FROM d{r-1} "
            f"ORDER BY d DESC, vec_id LIMIT 1)")
        if r < k:
            parts.append(
                f"d{r} AS (SELECT d{r-1}.vec_id, d{r-1}.q, d{r-1}.n2, "
                f"least(d{r-1}.d, "
                + dist.format(x=f"d{r-1}", c=f"c{r}")
                + f") AS d FROM d{r-1}, c{r})")
    sel = [" SELECT CAST(1 AS BIGINT) AS sel_round, vec_id, "
           "CAST(0 AS BIGINT) AS dist2 FROM c1"]
    for r in range(2, k + 1):
        sel.append(f"SELECT CAST({r} AS BIGINT), vec_id, d FROM c{r}")
    return ("WITH " + ", ".join(parts)
            + " UNION ALL ".join(sel) + " ORDER BY sel_round")


def _q_knn_mmr(sf_dir: str):
    """Diverse retrieval: MMR top-5 (λ=0.7) from the relevance top-20
    for the vec_id=0 query (``ops/similarity.mmr_select``) — exact
    integer objective, one corpus pass + bounded-pool greedy."""
    from xtract.ops.similarity import mmr_select

    emb = _emb(sf_dir)
    q0 = [r["embedding"] for r in emb.take(1)][0]
    return mmr_select(emb, np.asarray(q0, np.float64), k=5, pool=20)


def _mmr_sql(k: int = 5, pool: int = 20, lam_num: int = 7,
             lam_den: int = 10, unit: int = 1 << 20) -> str:
    """Unrolled MMR greedy replay mirroring ``mmr_select``."""
    mu = lam_den - lam_num
    parts = [
        f"qv AS (SELECT list_transform(embedding, x -> CAST(floor("
        f"x * {unit}.0) AS BIGINT)) AS q FROM embeddings WHERE vec_id = 0)",
        f"e AS (SELECT vec_id, list_transform(embedding, x -> "
        f"CAST(floor(x * {unit}.0) AS BIGINT)) AS q FROM embeddings)",
        f"p AS (SELECT e.vec_id, e.q, CAST(list_inner_product(e.q, qv.q)"
        f" AS BIGINT) AS rel FROM e, qv ORDER BY rel DESC, vec_id "
        f"LIMIT {pool})",
        "ch1 AS (SELECT CAST(1 AS BIGINT) AS sel_round, vec_id, q, rel, "
        "CAST(0 AS BIGINT) AS max_sim FROM p "
        "ORDER BY rel DESC, vec_id LIMIT 1)",
    ]
    for r in range(2, k + 1):
        prev = f"ch{r-1}"
        parts.append(
            f"sc{r} AS (SELECT p.vec_id, max(CAST(list_inner_product("
            f"p.q, c.q) AS BIGINT)) AS ms FROM p, {prev} c "
            f"WHERE p.vec_id NOT IN (SELECT vec_id FROM {prev}) "
            f"GROUP BY p.vec_id)")
        parts.append(
            f"pk{r} AS (SELECT p.vec_id, p.q, p.rel, s.ms FROM p "
            f"JOIN sc{r} s USING (vec_id) ORDER BY "
            f"{lam_num} * p.rel - {mu} * s.ms DESC, p.vec_id LIMIT 1)")
        parts.append(
            f"ch{r} AS (SELECT * FROM {prev} UNION ALL "
            f"SELECT CAST({r} AS BIGINT), vec_id, q, rel, ms "
            f"FROM pk{r})")
    return ("WITH " + ", ".join(parts)
            + f" SELECT sel_round, vec_id, rel, max_sim FROM ch{k} "
            "ORDER BY sel_round")


def _q_host_weighted_sssp(sf_dir: str):
    """Weighted shortest paths (``ops/graph.sssp``) over a planted
    weighted host DAG: nodes h = doc_id % 50, path edges h→h+1 with
    cost h%7+1, shortcut edges h→h+5 cost 3 for h%3==0.
    Frontier-based Bellman–Ford (broadcast-gated distance table, one
    edge scan per round with a per-block dst-min combiner); the
    oracle is a recursive CTE (terminates: the plant is a DAG)."""
    from xtract.ops.graph import sssp

    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        h = np.unique(t["doc_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % 50)
        s1 = h[h < 49]
        sh = h[(h % 3 == 0) & (h + 5 < 50)]
        return pa.table({
            "src": pa.array(np.concatenate([s1, sh]), pa.int64()),
            "dst": pa.array(np.concatenate([s1 + 1, sh + 5]), pa.int64()),
            "w": pa.array(np.concatenate([s1 % 7 + 1,
                                          np.full(len(sh), 3)]),
                          pa.int64())})

    e = docs.map_batches(edges, batch_format="pyarrow")
    out = sssp(e, [0]).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def _comm_edges(sf_dir: str):
    """Planted 6-community host graph over h = doc_id % 60: each block
    of 10 gets ring edges h→h+1 and h→h+2 (mod 10, intra-block) plus
    one bridge per block (offset-0 node → next block's offset-0)."""
    docs = _docs(sf_dir, ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        h = np.unique(t["doc_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % 60)
        c, off = h // 10, h % 10
        s = np.concatenate([h, h, h[off == 0]])
        d = np.concatenate([c * 10 + (off + 1) % 10,
                            c * 10 + (off + 2) % 10,
                            ((c[off == 0] + 1) % 6) * 10])
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64())})

    return docs.map_batches(edges, batch_format="pyarrow")


_COMM_GRAPH_SQL = (
    "nodes AS (SELECT DISTINCT CAST(doc_id % 60 AS BIGINT) AS h "
    "FROM documents), "
    "e0 AS (SELECT h AS u, (h // 10) * 10 + (h % 10 + 1) % 10 AS v "
    "FROM nodes "
    "UNION ALL SELECT h, (h // 10) * 10 + (h % 10 + 2) % 10 FROM nodes "
    "UNION ALL SELECT h, (((h // 10) + 1) % 6) * 10 FROM nodes "
    "WHERE h % 10 = 0), "
    "ee0 AS (SELECT DISTINCT LEAST(u, v) AS u, GREATEST(u, v) AS v "
    "FROM e0 WHERE u <> v), "
    "ee AS (SELECT u AS s, v AS d FROM ee0 "
    "UNION ALL SELECT v, u FROM ee0)")

_LP_SQL_BODY = (
    _COMM_GRAPH_SQL
    + ", l0 AS (SELECT h AS node, h AS lab FROM nodes)"
    + "".join(
        f", c{r} AS (SELECT e.d AS node, l.lab, count(*) AS c "
        f"FROM ee e JOIN l{r-1} l ON l.node = e.s GROUP BY 1, 2), "
        f"b{r} AS (SELECT node, lab FROM (SELECT node, lab, "
        f"row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) "
        f"AS rn FROM c{r}) WHERE rn = 1), "
        f"l{r} AS (SELECT p.node, COALESCE(b.lab, p.lab) AS lab "
        f"FROM l{r-1} p LEFT JOIN b{r} b USING (node))"
        for r in (1, 2, 3, 4)))


def _q_embedding_rp8(sf_dir: str):
    """Deterministic JL sign projection of the 64-d embeddings to 8
    int64 coordinates (``ops/similarity.random_project``), rolled up
    per (label, j) as exact integer sums — the pre-ANN dimensionality
    reduction with a full SQL replay of quantization, the shared-LCG
    sign matrix, and the projection."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.similarity import random_project

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label", "embedding"])
    proj = random_project(emb, d_out=8)
    out = (proj.groupby(["label", "j"])
           .aggregate(Count(alias_name="n"),
                      Sum("p", alias_name="sum_p")))
    return out.map_batches(lambda t: pa.table({
        "label": pc.cast(t["label"], pa.int64()),
        "j": pc.cast(t["j"], pa.int64()),
        "n": pc.cast(t["n"], pa.int64()),
        "sum_p": pc.cast(t["sum_p"], pa.int64())}),
        batch_format="pyarrow").sort(["label", "j"])


def _embedding_rp8_sql() -> str:
    return (
        "SELECT CAST(label AS BIGINT) AS label, j.j AS j, "
        "CAST(count(*) / 64 AS BIGINT) AS n, "
        "CAST(sum((CASE WHEN (((((i.i - 1) * 8 + j.j) * 2654435761 "
        "+ 12345) % 4294967296) // 65536) % 2 = 0 THEN 1 ELSE -1 END) "
        "* CAST(floor(CAST(embedding[i.i] AS DOUBLE) * 1048576) "
        "AS BIGINT)) AS BIGINT) AS sum_p "
        "FROM embeddings, range(1, 65) i(i), range(0, 8) j(j) "
        "GROUP BY 1, 2 ORDER BY 1, 2")


def _q_host_mis(sf_dir: str):
    """Deterministic Luby maximal independent set
    (``ops/graph.maximal_independent_set``) over the planted host
    graph — conflict-free host sampling; the oracle unrolls three
    Luby rounds with the SAME splitmix64 priorities via the shared
    mix64 CTE chain."""
    from xtract.ops.graph import maximal_independent_set

    out = maximal_independent_set(_comm_edges(sf_dir)).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def _host_mis_sql(rounds: int = 3) -> str:
    gold = 0x9E3779B97F4A7C15
    parts = [_COMM_GRAPH_SQL,
             "a0 AS (SELECT h AS node FROM nodes)"]
    mis_names = []
    for r in range(1, rounds + 1):
        rc = (r * gold) % _U64
        parts.append(
            f"pb{r} AS (SELECT node, CAST((CAST(node AS HUGEINT) + "
            f"{rc}) % {_U64} AS UBIGINT) AS x{r} FROM a{r-1})")
        ctes, last = _sql_chain(
            f"pb{r}", _sql_mix64(f"x{r}", f"pri{r}", f"m{r}"),
            f"pp{r}_")
        parts.extend(ctes)
        parts.append(
            f"minn{r} AS (SELECT e.s AS node, min(p2.pri{r}) AS mn "
            f"FROM ee e JOIN {last} p1 ON p1.node = e.s "
            f"JOIN {last} p2 ON p2.node = e.d GROUP BY 1)")
        parts.append(
            f"mis{r} AS (SELECT p.node FROM {last} p "
            f"LEFT JOIN minn{r} m USING (node) "
            f"WHERE m.mn IS NULL OR p.pri{r} < m.mn)")
        parts.append(
            f"a{r} AS (SELECT a.node FROM a{r-1} a "
            f"WHERE a.node NOT IN (SELECT node FROM mis{r}) "
            f"AND a.node NOT IN (SELECT e.s FROM ee e "
            f"JOIN mis{r} j ON j.node = e.d))")
        mis_names.append(
            f"SELECT node, {r} AS r FROM mis{r}")
    union = " UNION ALL ".join(mis_names)
    parts.append(f"misall AS ({union})")
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT n.h AS node, "
        "CAST(m.node IS NOT NULL AS BIGINT) AS in_mis, "
        "CAST(COALESCE(m.r, 0) AS BIGINT) AS mis_round "
        "FROM nodes n LEFT JOIN misall m ON m.node = n.h "
        "ORDER BY 1")


def _q_host_neighborhood_fn(sf_dir: str):
    """Exact neighborhood function N(r) = ordered pairs within hop
    distance r over the planted host graph
    (``ops/anf.neighborhood_function``: bitset OR-propagation,
    distributed edge scans, gated driver matrix; HyperANF register
    swap documented for crawl scale).  Oracle = 4 unrolled
    reachability joins."""
    from xtract.ops.anf import neighborhood_function

    return neighborhood_function(_comm_edges(sf_dir), max_r=4)


def _host_neighborhood_fn_sql(max_r: int = 4) -> str:
    parts = [_COMM_GRAPH_SQL,
             "r0 AS (SELECT h AS u, h AS v FROM nodes)"]
    for r in range(1, max_r + 1):
        parts.append(
            f"r{r} AS (SELECT DISTINCT u, v FROM (SELECT u, v "
            f"FROM r{r-1} UNION ALL SELECT p.u, e.d FROM r{r-1} p "
            f"JOIN ee e ON e.s = p.v))")
    sel = " UNION ALL ".join(
        f"SELECT {r} AS r, count(*) AS n_pairs FROM r{r}"
        for r in range(max_r + 1))
    return ("WITH " + ", ".join(parts) +
            f" SELECT CAST(r AS BIGINT) AS r, CAST(n_pairs AS BIGINT) "
            f"AS n_pairs FROM ({sel}) ORDER BY r")


def _q_host_harmonic(sf_dir: str):
    """Truncated harmonic centrality over the planted host graph
    (``ops/anf.harmonic_centrality``: exact lcm-weighted integer
    distance shells off the bitset propagation); oracle = unrolled
    reachability deltas."""
    from xtract.ops.anf import harmonic_centrality

    return harmonic_centrality(_comm_edges(sf_dir), max_r=4)


def _host_harmonic_sql(max_r: int = 4) -> str:
    import math

    L = math.lcm(*range(1, max_r + 1))
    parts = [_COMM_GRAPH_SQL,
             "r0 AS (SELECT h AS u, h AS v FROM nodes)"]
    for r in range(1, max_r + 1):
        parts.append(
            f"r{r} AS (SELECT DISTINCT u, v FROM (SELECT u, v "
            f"FROM r{r-1} UNION ALL SELECT p.u, e.d FROM r{r-1} p "
            f"JOIN ee e ON e.s = p.v))")
    for r in range(max_r + 1):
        parts.append(
            f"c{r} AS (SELECT u, count(*) AS n FROM r{r} GROUP BY 1)")
    terms = " + ".join(
        f"(c{r}.n - c{r-1}.n) * {L // r}" for r in range(1, max_r + 1))
    joins = " ".join(f"JOIN c{r} USING (u)" for r in range(1, max_r + 1))
    return ("WITH " + ", ".join(parts) +
            f" SELECT c0.u AS node, CAST({terms} AS BIGINT) AS h_num, "
            f"CAST({L} AS BIGINT) AS lcm FROM c0 {joins} ORDER BY 1")


def _q_host_coloring(sf_dir: str):
    """MIS-layered graph coloring (``ops/coloring.mis_coloring``) —
    conflict-free crawl waves over the planted host graph; the oracle
    nests 5 colors × 4 unrolled Luby rounds through the shared mix64
    CTE chain with the same (color−1)·64+round priorities."""
    from xtract.ops.coloring import mis_coloring

    out = mis_coloring(_comm_edges(sf_dir)).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def _host_coloring_sql(colors: int = 5, rounds: int = 4) -> str:
    gold = 0x9E3779B97F4A7C15
    # Every CTE is MATERIALIZED: the nested unroll references a{c}_{r-1}
    # / mis / ee repeatedly, and DuckDB's default inlining would expand
    # the chain exponentially (and reopen the parquet per reference).
    graph_mat = _COMM_GRAPH_SQL.replace(" AS (SELECT", " AS MATERIALIZED (SELECT")
    parts = [graph_mat,
             "u0 AS MATERIALIZED (SELECT h AS node FROM nodes)"]
    sel = []
    for c in range(1, colors + 1):
        parts.append(f"a{c}_0 AS MATERIALIZED (SELECT node FROM u{c-1})")
        for r in range(1, rounds + 1):
            rg = (c - 1) * 64 + r
            rc = (rg * gold) % _U64
            parts.append(
                f"pb{c}_{r} AS MATERIALIZED (SELECT node, CAST((CAST(node AS "
                f"HUGEINT) + {rc}) % {_U64} AS UBIGINT) AS x{c}_{r} "
                f"FROM a{c}_{r-1})")
            ctes, last = _sql_chain(
                f"pb{c}_{r}",
                _sql_mix64(f"x{c}_{r}", f"pri{c}_{r}", f"m{c}_{r}"),
                f"pp{c}_{r}_")
            parts.extend(x.replace(" AS (SELECT", " AS MATERIALIZED "
                                   "(SELECT", 1) for x in ctes)
            parts.append(
                f"minn{c}_{r} AS MATERIALIZED (SELECT e.s AS node, "
                f"min(p2.pri{c}_{r}) AS mn FROM ee e "
                f"JOIN {last} p1 ON p1.node = e.s "
                f"JOIN {last} p2 ON p2.node = e.d GROUP BY 1)")
            parts.append(
                f"mis{c}_{r} AS MATERIALIZED (SELECT p.node FROM {last} p "
                f"LEFT JOIN minn{c}_{r} m USING (node) "
                f"WHERE m.mn IS NULL OR p.pri{c}_{r} < m.mn)")
            parts.append(
                f"a{c}_{r} AS MATERIALIZED (SELECT a.node FROM a{c}_{r-1} a "
                f"WHERE a.node NOT IN (SELECT node FROM mis{c}_{r}) "
                f"AND a.node NOT IN (SELECT e.s FROM ee e "
                f"JOIN mis{c}_{r} j ON j.node = e.d "
                f"WHERE e.s IN (SELECT node FROM a{c}_{r-1})))")
        union = " UNION ALL ".join(
            f"SELECT node FROM mis{c}_{r}" for r in range(1, rounds + 1))
        parts.append(f"miscol{c} AS MATERIALIZED (SELECT DISTINCT node FROM ({union}))")
        parts.append(
            f"u{c} AS MATERIALIZED (SELECT node FROM u{c-1} "
            f"WHERE node NOT IN (SELECT node FROM miscol{c}))")
        sel.append(f"SELECT node, {c} AS color FROM miscol{c}")
    parts.append("colall AS (" + " UNION ALL ".join(sel) + ")")
    return ("WITH " + ", ".join(parts) + " "
            "SELECT n.h AS node, CAST(c.color AS BIGINT) AS color "
            "FROM nodes n JOIN colall c ON c.node = n.h ORDER BY 1")


def _q_orders_orc_roundtrip(sf_dir: str):
    """ORC sink→source roundtrip (``ops/formats.write_orc`` /
    ``read_orc``: content-hash-named one-file-per-block sink with
    atomic rename, file-parallel column-pruned reader) — the
    warehouse-interchange surface; the post-roundtrip rollup must
    equal the straight-SQL aggregate."""
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.formats import read_orc, write_orc

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_totalprice"]).map_batches(
        lambda t: pa.table({
            "status": t["o_orderstatus"],
            "cents": pc.cast(pc.round(pc.multiply(
                pc.cast(t["o_totalprice"], pa.float64()), 100)),
                pa.int64())}), batch_format="pyarrow")
    out_dir = tempfile.mkdtemp(prefix="xtract_orc_")
    manifest = write_orc(orders, out_dir).to_pandas()
    files = sorted(manifest["path"])
    back = read_orc(files, columns=["status", "cents"])
    agg = back.groupby("status").aggregate(
        Count(alias_name="n"), Sum("cents", alias_name="sum_cents"))
    return agg.map_batches(lambda t: pa.table({
        "status": t["status"],
        "n": pc.cast(t["n"], pa.int64()),
        "sum_cents": pc.cast(t["sum_cents"], pa.int64())}),
        batch_format="pyarrow").sort("status")


def _q_lr_kfold(sf_dir: str):
    """3-fold cross-validated confusion of the quality classifier
    (``ops/xval.kfold_confusion``: deterministic doc_id%3 folds, one
    exact-integer GD train per complement, held-out confusion);
    oracle = three renamed copies of the shared GD CTE body."""
    from xtract.ops.xval import kfold_confusion

    feats = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
             .map_batches(_lr_featurize, batch_format="pyarrow")
             .materialize())
    return kfold_confusion(feats, ["x0", "x1", "x2", "x3"], "y", k=3)


def _lr_kfold_sql(k: int = 3) -> str:
    import re

    parts, sels = [], []
    for fold in range(k):
        body, sig = _lr_sql_parts(
            train_where=f"doc_id % {k} <> {fold}")
        suf = f"_k{fold}"
        body2 = re.sub(r"\b(f|ftr|s[1-4]|w[1-4]|q[2-4])\b",
                       lambda m: m.group(1) + suf, body)
        parts.append(body2)
        sels.append(
            f"SELECT {fold} AS fold, "
            f"sum(CASE WHEN y = 1 AND {sig} >= 500000 THEN 1 ELSE 0 "
            f"END) AS tp, "
            f"sum(CASE WHEN y = 0 AND {sig} >= 500000 THEN 1 ELSE 0 "
            f"END) AS fp, "
            f"sum(CASE WHEN y = 1 AND {sig} < 500000 THEN 1 ELSE 0 "
            f"END) AS fn, "
            f"sum(CASE WHEN y = 0 AND {sig} < 500000 THEN 1 ELSE 0 "
            f"END) AS tn "
            f"FROM f{suf}, w4{suf} WHERE doc_id % {k} = {fold}")
    union = " UNION ALL ".join(sels)
    return (
        "WITH " + ", ".join(parts) +
        " SELECT CAST(fold AS BIGINT) AS fold, CAST(tp AS BIGINT) AS "
        "tp, CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn, "
        f"CAST(tn AS BIGINT) AS tn FROM ({union}) ORDER BY fold")


def _q_host_communities(sf_dir: str):
    """Synchronous label-propagation communities
    (``ops/graph.label_propagation``, 4 deterministic rounds,
    min-label ties) over the planted 6-community host graph; the
    oracle unrolls the identical rounds as CTEs."""
    from xtract.ops.graph import label_propagation

    out = label_propagation(_comm_edges(sf_dir), rounds=4).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def _q_host_modularity(sf_dir: str):
    """Exact integer Newman modularity statistics per LP community
    (``ops/graph.modularity_stats``: q_num = 4·m·m_in − d_tot², global
    Q = Σ q_num / 4m²) — the partition-quality audit chained onto
    ``host_communities``."""
    from xtract.ops.graph import label_propagation, modularity_stats

    e = _comm_edges(sf_dir)
    labels = label_propagation(e, rounds=4)
    out = modularity_stats(e, labels).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("lab").reset_index(drop=True)


def _q_host_anf_hll(sf_dir: str):
    """HyperANF over the planted host graph
    (``ops/anf.hyper_anf``): per-node HLL register arrays propagated
    as register-wise max — the crawl-scale swap the exact-bitset
    gate names, with NO driver-resident state (two slim co-groups per
    round).  The SQL-checked surface is the exact int64 register-state
    checksum per round (reg_sum); the float HLL estimate stays
    Python-side.  Oracle = splitmix64 bucket/rank rule via the shared
    mix64 CTE chain + 4 unrolled reachability joins."""
    from xtract.ops.anf import hyper_anf

    out = hyper_anf(_comm_edges(sf_dir), max_r=4, p=4)
    return out[["r", "reg_sum"]].astype("int64")


def _host_anf_hll_sql(max_r: int = 4) -> str:
    parts = [_COMM_GRAPH_SQL,
             "hx AS (SELECT h, CAST(h AS UBIGINT) AS x0 FROM nodes)"]
    ctes, last = _sql_chain("hx", _sql_mix64("x0", "mh", "hl"), "hl_")
    parts.extend(ctes)
    parts.append(
        f"hr AS (SELECT h, CAST(mh % 16 AS BIGINT) AS b, "
        f"CASE WHEN mh // 16 = 0 THEN 61 ELSE bit_count(xor("
        f"CAST(mh // 16 AS BIGINT), CAST(mh // 16 AS BIGINT) - 1)) "
        f"END AS rk FROM {last})")
    parts.append("r0 AS (SELECT h AS u, h AS v FROM nodes)")
    for r in range(1, max_r + 1):
        parts.append(
            f"r{r} AS (SELECT DISTINCT u, v FROM (SELECT u, v "
            f"FROM r{r-1} UNION ALL SELECT p.u, e.d FROM r{r-1} p "
            f"JOIN ee e ON e.s = p.v))")
    for r in range(max_r + 1):
        parts.append(
            f"g{r} AS (SELECT p.u, hr.b, max(hr.rk) AS mx "
            f"FROM r{r} p JOIN hr ON hr.h = p.v GROUP BY 1, 2)")
    sel = " UNION ALL ".join(
        f"SELECT {r} AS r, sum(mx) AS reg_sum FROM g{r}"
        for r in range(max_r + 1))
    return ("WITH " + ", ".join(parts) +
            f" SELECT CAST(r AS BIGINT) AS r, CAST(reg_sum AS BIGINT) "
            f"AS reg_sum FROM ({sel}) ORDER BY r")


def _q_embedding_scatter(sf_dir: str):
    """Exact-integer PCA sufficient statistics over the 64-d
    embeddings (``ops/pca.scatter_stats``): one streaming pass emits
    per-block upper-triangle Gram partials of q = floor(x·2^10), ONE
    native grouped Sum finishes — the distributed half of PCA (the
    d×d eigh happens on the driver).  Long format (i, j, v): Gram
    cells, per-dim sums (j = −1), row count (−1, −1).  Oracle = the
    same quantization + self-join moment sums in SQL."""
    import ray.data as rd

    from xtract.ops.pca import scatter_stats

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding"])
    out = scatter_stats(emb, unit=1 << 10)
    return out.map_batches(lambda t: pa.table({
        "i": pc.cast(t["i"], pa.int64()),
        "j": pc.cast(t["j"], pa.int64()),
        "v": pc.cast(t["v"], pa.int64())}),
        batch_format="pyarrow").sort(["i", "j"])


def _embedding_scatter_sql() -> str:
    return (
        "WITH q AS (SELECT vec_id, i.i - 1 AS i, "
        "CAST(floor(CAST(embedding[i.i] AS DOUBLE) * 1024) AS BIGINT) "
        "AS qi FROM embeddings, range(1, 65) i(i)), "
        "g AS (SELECT a.i AS i, b.i AS j, "
        "CAST(sum(a.qi * b.qi) AS BIGINT) AS v "
        "FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i "
        "GROUP BY 1, 2), "
        "s AS (SELECT i, CAST(-1 AS BIGINT) AS j, "
        "CAST(sum(qi) AS BIGINT) AS v FROM q GROUP BY 1), "
        "c AS (SELECT CAST(-1 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS j, "
        "count(*) AS v FROM embeddings) "
        "SELECT i, j, v FROM (SELECT * FROM g UNION ALL "
        "SELECT * FROM s UNION ALL SELECT * FROM c) ORDER BY i, j")


def _q_doc_quality_tree(sf_dir: str):
    """Depth-2 decision tree on the logreg quality features
    (``ops/dtree.train_tree``): per level ONE histogram exchange
    (per-block np.unique combiner → native Sum), exact-integer
    misclassification-error splits with the (err, feat, thr) tie
    rule, gated driver histogram.  Output = the flattened tree
    (node, feat, thr, n, n_pos, pred); the oracle replays the entire
    training — both split argmins and the leaf majorities — in SQL."""
    from xtract.ops.dtree import train_tree, tree_table

    feats = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
             .map_batches(_lr_featurize, batch_format="pyarrow")
             .materialize())
    tree = train_tree(feats, ["x1", "x2", "x3"], "y", depth=2)
    return tree_table(tree)


def _doc_quality_tree_sql() -> str:
    fdefs = [
        "(LEAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')), 1000) "
        "// 4) - 12",
        "LEAST((LENGTH(text) - LENGTH(REPLACE(text, 'table', ''))) "
        "// 5, 200) - 3",
        "LEAST((LENGTH(text) - LENGTH(REPLACE(text, 'key', ''))) "
        "// 3, 200) - 2"]
    parts = [
        "fx AS (SELECT CAST(" + fdefs[0] + " AS BIGINT) AS f0, "
        "CAST(" + fdefs[1] + " AS BIGINT) AS f1, "
        "CAST(" + fdefs[2] + " AS BIGINT) AS f2, "
        "CAST(n_chars >= 306 AS BIGINT) AS y FROM documents)"]

    def split_ctes(node: int, src: str) -> None:
        parts.append(
            f"h{node} AS (SELECT feat, val, count(*) AS n, "
            f"CAST(sum(y) AS BIGINT) AS npos FROM ("
            f"SELECT 0 AS feat, f0 AS val, y FROM {src} UNION ALL "
            f"SELECT 1, f1, y FROM {src} UNION ALL "
            f"SELECT 2, f2, y FROM {src}) GROUP BY 1, 2)")
        parts.append(
            f"t{node} AS (SELECT feat, val, "
            f"sum(n) OVER w AS nl, sum(npos) OVER w AS pl, "
            f"sum(n) OVER (PARTITION BY feat) AS nt, "
            f"sum(npos) OVER (PARTITION BY feat) AS pt, "
            f"max(val) OVER (PARTITION BY feat) AS vmax "
            f"FROM h{node} WINDOW w AS (PARTITION BY feat "
            f"ORDER BY val ROWS UNBOUNDED PRECEDING))")
        parts.append(
            f"s{node} AS (SELECT feat, val AS thr, "
            f"LEAST(pl, nl - pl) + LEAST(pt - pl, (nt - nl) - "
            f"(pt - pl)) AS err FROM t{node} WHERE val < vmax "
            f"ORDER BY err, feat, val LIMIT 1)")

    split_ctes(0, "fx")
    parts.append(
        "a1 AS (SELECT fx.*, CASE WHEN (SELECT count(*) FROM s0) = 0 "
        "THEN 0 WHEN (CASE (SELECT feat FROM s0) WHEN 0 THEN f0 "
        "WHEN 1 THEN f1 ELSE f2 END) <= (SELECT thr FROM s0) "
        "THEN 1 ELSE 2 END AS node FROM fx)")
    parts.append("v1 AS (SELECT * FROM a1 WHERE node = 1)")
    parts.append("v2 AS (SELECT * FROM a1 WHERE node = 2)")
    split_ctes(1, "v1")
    split_ctes(2, "v2")
    parts.append(
        "a2 AS (SELECT a1.*, CASE WHEN node = 0 THEN 0 "
        "WHEN node = 1 THEN (CASE WHEN (SELECT count(*) FROM s1) = 0 "
        "THEN 1 WHEN (CASE (SELECT feat FROM s1) WHEN 0 THEN f0 "
        "WHEN 1 THEN f1 ELSE f2 END) <= (SELECT thr FROM s1) "
        "THEN 3 ELSE 4 END) "
        "ELSE (CASE WHEN (SELECT count(*) FROM s2) = 0 THEN 2 "
        "WHEN (CASE (SELECT feat FROM s2) WHEN 0 THEN f0 "
        "WHEN 1 THEN f1 ELSE f2 END) <= (SELECT thr FROM s2) "
        "THEN 5 ELSE 6 END) END AS leaf FROM a1)")
    parts.append(
        "outp AS ("
        "SELECT CAST(0 AS BIGINT) AS node, "
        "COALESCE((SELECT feat FROM s0), -1) AS feat, "
        "COALESCE((SELECT thr FROM s0), 0) AS thr, "
        "count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos FROM fx "
        "UNION ALL SELECT 1, COALESCE((SELECT feat FROM s1), -1), "
        "COALESCE((SELECT thr FROM s1), 0), count(*), "
        "CAST(sum(y) AS BIGINT) FROM v1 HAVING count(*) > 0 "
        "UNION ALL SELECT 2, COALESCE((SELECT feat FROM s2), -1), "
        "COALESCE((SELECT thr FROM s2), 0), count(*), "
        "CAST(sum(y) AS BIGINT) FROM v2 HAVING count(*) > 0 "
        "UNION ALL SELECT leaf, -1, 0, count(*), "
        "CAST(sum(y) AS BIGINT) FROM a2 WHERE leaf >= 3 GROUP BY leaf)")
    return ("WITH " + ", ".join(parts) +
            " SELECT CAST(node AS BIGINT) AS node, "
            "CAST(feat AS BIGINT) AS feat, CAST(thr AS BIGINT) AS thr, "
            "CAST(n AS BIGINT) AS n, n_pos, "
            "CAST(2 * n_pos > n AS BIGINT) AS pred FROM outp "
            "ORDER BY node")


def _q_doc_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion (``ops/ranking.rrf_fuse``) of two
    retrievers — the BM25 top-20 and the global-length top-20 — with
    the float 1/(k+r) replaced by floor(10^12/(60+r)) exact integer
    division.  Both inputs are bounded top-k lists, so fusion is one
    union + ONE slim grouped Sum/Count.  Oracle = the same two ranked
    CTEs + integer-division fusion in SQL."""
    import ray.data as rd

    from xtract.ops.ranking import bm25_score, rrf_fuse

    bm = bm25_score(_docs(sf_dir, ["doc_id", "text"]),
                    _BM25_QUERY).to_pandas()  # 20 rows
    bm_ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(bm["doc_id"].to_numpy(np.int64)),
        "rank": pa.array(bm["rank"].to_numpy(np.int64))}))
    lens = (_docs(sf_dir, ["doc_id", "n_chars"])
            .sort(["n_chars", "doc_id"], descending=[True, False])
            .limit(20).to_pandas())  # top-k result — driver-small
    lens_ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(lens["doc_id"].to_numpy(np.int64)),
        "rank": pa.array(np.arange(1, len(lens) + 1, dtype=np.int64))}))
    out = rrf_fuse([bm_ds, lens_ds]).to_pandas()
    out = out.sort_values(["rrf_score", "doc_id"],
                          ascending=[False, True])
    return out.reset_index(drop=True).astype("int64")


def _doc_rrf_fusion_sql() -> str:
    return (
        "WITH b AS (" + _bm25_sql() + "), "
        "l AS (SELECT doc_id, rank() OVER (ORDER BY n_chars DESC, "
        "doc_id) AS rank FROM documents ORDER BY rank LIMIT 20), "
        "u AS (SELECT doc_id, 1000000000000 // (60 + rank) AS c "
        "FROM b UNION ALL "
        "SELECT doc_id, 1000000000000 // (60 + rank) FROM l) "
        "SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_score, "
        "count(*) AS n_lists FROM u GROUP BY 1 "
        "ORDER BY rrf_score DESC, doc_id")


def _q_event_value_sampled_quantiles(sf_dir: str):
    """Order-invariant sampled quantiles
    (``ops/quantiles.sampled_quantiles``): the bottom-4096 rows by
    splitmix64(event_id) form a deterministic uniform sample — the
    crawl-scale quantile path for float columns where the integer
    histogram refinement doesn't apply and a global sort is off the
    table.  The sample is a pure function of the id set, so the SQL
    oracle replays it exactly (mix64 chain → ORDER BY → LIMIT →
    ceil(q·n) selection)."""
    from xtract.ops.quantiles import sampled_quantiles

    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])
    out = sampled_quantiles(ev, "event_id", "value",
                            {"p25": 0.25, "p50": 0.5,
                             "p90": 0.9, "p99": 0.99}, s=4096)
    return out.sort_values("name").reset_index(drop=True)


def _event_value_sampled_quantiles_sql(s: int = 4096) -> str:
    parts = ["ex AS (SELECT event_id, value, "
             "CAST(event_id AS UBIGINT) AS x0 FROM events)"]
    ctes, last = _sql_chain("ex", _sql_mix64("x0", "mh", "sq"), "sq_")
    parts.extend(ctes)
    parts.append(f"sel AS (SELECT value FROM {last} "
                 f"ORDER BY mh LIMIT {s})")
    parts.append("rk AS (SELECT value, row_number() OVER "
                 "(ORDER BY value) AS r, count(*) OVER () AS n "
                 "FROM sel)")
    sels = " UNION ALL ".join(
        f"SELECT '{name}' AS name, value FROM rk "
        f"WHERE r = GREATEST(CAST(ceil({q} * n) AS BIGINT), 1)"
        for name, q in (("p25", 0.25), ("p50", 0.5),
                        ("p90", 0.9), ("p99", 0.99)))
    return ("WITH " + ", ".join(parts) +
            f" SELECT name, value FROM ({sels}) ORDER BY name")


def _q_orders_late_ship_priority(sf_dir: str):
    """TPC-H Q4 shape (EXISTS semi-join with a cross-side predicate):
    orders per priority that have at least one lineitem shipping
    AFTER the order date.  Scale shape: the EXISTS collapses to a
    slim per-orderkey grouped Max(l_shipdate) BEFORE the join — one
    row per order, not per lineitem — then ONE large-×-large
    orderkey co-group and a grouped Count."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    from xtract.ops.joins import equi_join_cogroup

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"]).map_batches(
        lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "ship_us": pc.cast(t["l_shipdate"], pa.int64())}),
        batch_format="pyarrow").groupby("l_orderkey").aggregate(
        Max("ship_us", alias_name="max_ship_us"))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table({
            "o_orderkey": t["o_orderkey"],
            "od_us": pc.cast(t["o_orderdate"], pa.int64()),
            "o_orderpriority": t["o_orderpriority"]}),
        batch_format="pyarrow")
    joined = equi_join_cogroup(orders, li, on="o_orderkey",
                               right_on="l_orderkey", how="inner")
    late = joined.map_batches(
        lambda t: t.filter(pc.greater(t["max_ship_us"], t["od_us"])),
        batch_format="pyarrow")
    out = late.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_late_orders"))
    return out.map_batches(lambda t: pa.table({
        "o_orderpriority": t["o_orderpriority"],
        "n_late_orders": pc.cast(t["n_late_orders"], pa.int64())}),
        batch_format="pyarrow").sort("o_orderpriority")


def _orders_late_ship_priority_sql() -> str:
    return (
        "WITH x AS (SELECT l_orderkey, max(l_shipdate) AS m "
        "FROM lineitem GROUP BY 1) "
        "SELECT o_orderpriority, count(*) AS n_late_orders "
        "FROM orders JOIN x ON o_orderkey = l_orderkey "
        "WHERE m > o_orderdate GROUP BY 1 ORDER BY 1")


def _q_doc_quality_boost(sf_dir: str):
    """Gradient-boosted stumps on the logreg quality features
    (``ops/boost.train_boost``): 3 squared-loss boosting rounds in
    exact integer micro-units — per round ONE histogram exchange
    (per-block np.unique combiner → native Sum), arbitrary-precision
    gain argmax ``S_L²//n_L + S_R²//n_R`` on the gated driver
    histogram, truncating-division leaf values and lr=1/2 updates.
    Output = per-doc (score, pred); the oracle replays the ENTIRE
    training — every round's histogram, HUGEINT gain argmax and
    score update — in SQL."""
    from xtract.ops.boost import score_boost, train_boost

    feats = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
             .map_batches(_lr_featurize, batch_format="pyarrow")
             .materialize())
    model = train_boost(feats, ["x1", "x2", "x3"], rounds=3)
    return score_boost(feats, model).sort("doc_id")


def _doc_quality_boost_sql(rounds: int = 3, lr_num: int = 1,
                           lr_den: int = 2) -> str:
    fdefs = [
        "(LEAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')), 1000) "
        "// 4) - 12",
        "LEAST((LENGTH(text) - LENGTH(REPLACE(text, 'table', ''))) "
        "// 5, 200) - 3",
        "LEAST((LENGTH(text) - LENGTH(REPLACE(text, 'key', ''))) "
        "// 3, 200) - 2"]
    parts = [
        "fx AS MATERIALIZED (SELECT doc_id, CAST(" + fdefs[0] + " AS BIGINT) AS f0, "
        "CAST(" + fdefs[1] + " AS BIGINT) AS f1, "
        "CAST(" + fdefs[2] + " AS BIGINT) AS f2, "
        "CAST(n_chars >= 306 AS BIGINT) * 1000000 AS tgt "
        "FROM documents)",
        "b0 AS MATERIALIZED (SELECT fx.*, CAST((SELECT CAST(sum(tgt) AS HUGEINT) "
        "// count(*) FROM fx) AS BIGINT) AS sc FROM fx)"]
    for t in range(1, rounds + 1):
        p = f"b{t - 1}"
        parts.append(
            f"h{t} AS MATERIALIZED (SELECT feat, val, count(*) AS n, "
            f"CAST(sum(tgt - sc) AS HUGEINT) AS sr FROM ("
            f"SELECT 0 AS feat, f0 AS val, tgt, sc FROM {p} UNION ALL "
            f"SELECT 1, f1, tgt, sc FROM {p} UNION ALL "
            f"SELECT 2, f2, tgt, sc FROM {p}) GROUP BY 1, 2)")
        parts.append(
            f"t{t} AS MATERIALIZED (SELECT feat, val, "
            f"sum(n) OVER w AS nl, sum(sr) OVER w AS sl, "
            f"sum(n) OVER (PARTITION BY feat) AS nt, "
            f"sum(sr) OVER (PARTITION BY feat) AS st, "
            f"max(val) OVER (PARTITION BY feat) AS vmax "
            f"FROM h{t} WINDOW w AS (PARTITION BY feat "
            f"ORDER BY val ROWS UNBOUNDED PRECEDING))")
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT feat, val AS thr, sl // nl AS vl, "
            f"(st - sl) // (nt - nl) AS vr, "
            f"(sl * sl) // nl + ((st - sl) * (st - sl)) // (nt - nl) "
            f"AS gain FROM t{t} WHERE val < vmax "
            f"ORDER BY gain DESC, feat, val LIMIT 1)")
        leaf = (
            f"CASE WHEN (SELECT count(*) FROM s{t}) = 0 THEN "
            f"(SELECT CAST(sum(tgt - sc) AS HUGEINT) // count(*) "
            f"FROM {p}) WHEN (CASE (SELECT feat FROM s{t}) "
            f"WHEN 0 THEN f0 WHEN 1 THEN f1 ELSE f2 END) <= "
            f"(SELECT thr FROM s{t}) THEN (SELECT vl FROM s{t}) "
            f"ELSE (SELECT vr FROM s{t}) END")
        parts.append(
            f"b{t} AS MATERIALIZED (SELECT doc_id, f0, f1, f2, tgt, "
            f"CAST(sc + ({lr_num} * ({leaf})) // {lr_den} AS BIGINT) "
            f"AS sc FROM {p})")
    return ("WITH " + ", ".join(parts) +
            f" SELECT doc_id, sc AS score, "
            f"CAST(2 * sc > 1000000 AS BIGINT) AS pred "
            f"FROM b{rounds} ORDER BY doc_id")


def _q_lr_isotonic(sf_dir: str):
    """Isotonic (PAV) calibration of the trained quality classifier
    (``ops/mleval.isotonic_calibrate``): the corpus collapses to the
    distinct-p_micro table via one grouped Sum, then exact
    integer-cross-product pool merging on the gated driver table.
    Output = the calibration step function (one row per distinct
    score, cal_p non-decreasing).  Oracle = the minimax
    characterization ŷ_k = max_{i≤k} min_{j≥k} avg(i..j) over the
    prefix-sum table — an O(m²) pairs CTE + one suffix-min window —
    which equals the PAV pooled rate (Ayer et al.; exact here because
    IEEE division is correctly rounded and distinct rationals with
    denominators ≤ n are farther apart than double rounding error at
    bench scale)."""
    from xtract.ops.logreg import score_logreg, train_logreg
    from xtract.ops.mleval import isotonic_calibrate

    feats = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
             .map_batches(_lr_featurize, batch_format="pyarrow")
             .materialize())
    model = train_logreg(feats, ["x0", "x1", "x2", "x3"], "y",
                         steps=4, lr=32)
    scored = score_logreg(feats, model, ["doc_id", "y"])
    out = isotonic_calibrate(scored, "p_micro", "y")
    for c in ("p_micro", "n", "n_pos", "cal_num", "cal_den"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def _lr_isotonic_sql() -> str:
    body, sig = _lr_sql_parts()
    return (
        f"WITH {body}, "
        f"scd AS MATERIALIZED (SELECT {sig} AS s, y FROM f, w4), "
        "dst AS MATERIALIZED (SELECT s, count(*) AS n, "
        "CAST(sum(y) AS BIGINT) AS n_pos FROM scd GROUP BY 1), "
        "r AS MATERIALIZED (SELECT s, n, n_pos, "
        "row_number() OVER (ORDER BY s) AS k, "
        "sum(n) OVER (ORDER BY s) AS cn, "
        "sum(n_pos) OVER (ORDER BY s) AS cp FROM dst), "
        "pairs AS MATERIALIZED (SELECT a.k AS i, b.k AS j, "
        "CAST(b.cp - a.cp + a.n_pos AS DOUBLE) / "
        "CAST(b.cn - a.cn + a.n AS DOUBLE) AS avgv "
        "FROM r a JOIN r b ON b.k >= a.k), "
        "sm AS MATERIALIZED (SELECT i, j AS k, "
        "min(avgv) OVER (PARTITION BY i ORDER BY j DESC "
        "ROWS UNBOUNDED PRECEDING) AS mn FROM pairs), "
        "cal AS (SELECT k, max(mn) AS cal_p FROM sm GROUP BY k), "
        "pool AS (SELECT r.k, r.s, r.n, r.n_pos, cal.cal_p, "
        "cal.cal_p - lag(cal.cal_p, 1, -1.0) OVER (ORDER BY r.k) "
        "AS stp FROM r JOIN cal USING (k)), "
        "grp AS (SELECT *, sum(CASE WHEN stp != 0 THEN 1 ELSE 0 END) "
        "OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS pid FROM pool) "
        "SELECT s AS p_micro, n, n_pos, "
        "CAST(sum(n_pos) OVER (PARTITION BY pid) AS BIGINT) "
        "AS cal_num, "
        "CAST(sum(n) OVER (PARTITION BY pid) AS BIGINT) AS cal_den, "
        "cal_p FROM grp ORDER BY p_micro")


def _q_big_orders_top(sf_dir: str):
    """TPC-H Q18 shape (HAVING over a grouped Sum, then join): the
    20 largest orders by total lineitem quantity above a threshold,
    with their priority — grouped Sum (slim) → having filter →
    orderkey co-group join → deterministic top-20 by
    (total_qty DESC, o_orderkey)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.joins import equi_join_cogroup

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"]).map_batches(
        lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64())}),
        batch_format="pyarrow").groupby("l_orderkey").aggregate(
        Sum("qty", alias_name="total_qty"))
    big = li.map_batches(
        lambda t: t.filter(pc.greater(t["total_qty"],
                                      pa.scalar(180, pa.int64()))),
        batch_format="pyarrow")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])
    joined = equi_join_cogroup(orders, big, on="o_orderkey",
                               right_on="l_orderkey", how="inner")
    out = (joined.sort(["total_qty", "o_orderkey"],
                       descending=[True, False]).limit(20))
    return out.map_batches(lambda t: pa.table({
        "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
        "o_orderpriority": t["o_orderpriority"],
        "total_qty": pc.cast(t["total_qty"], pa.int64())}),
        batch_format="pyarrow")


def _big_orders_top_sql() -> str:
    return (
        "WITH x AS (SELECT l_orderkey, "
        "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS "
        "total_qty FROM lineitem GROUP BY 1 "
        "HAVING total_qty > 180) "
        "SELECT o_orderkey, o_orderpriority, total_qty "
        "FROM orders JOIN x ON o_orderkey = l_orderkey "
        "ORDER BY total_qty DESC, o_orderkey LIMIT 20")


def _q_lineitem_late_by_flag(sf_dir: str):
    """TPC-H Q12 shape (conditional aggregates over a large-×-large
    join): per l_returnflag the line count, the count shipping after
    the order date, and of those the count on urgent/high-priority
    orders — one orderkey co-group join, vectorized conditional
    partials, ONE grouped Sum."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from xtract.ops.joins import equi_join_cogroup

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"]
    ).map_batches(
        lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_returnflag": t["l_returnflag"],
            "ship_us": pc.cast(t["l_shipdate"], pa.int64())}),
        batch_format="pyarrow")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table({
            "o_orderkey": t["o_orderkey"],
            "od_us": pc.cast(t["o_orderdate"], pa.int64()),
            "urgent": pc.cast(pc.is_in(
                t["o_orderpriority"],
                value_set=pa.array(["1-URGENT", "2-HIGH"])),
                pa.int64())}),
        batch_format="pyarrow")
    joined = equi_join_cogroup(li, orders, on="l_orderkey",
                               right_on="o_orderkey", how="inner")

    def partials(t: pa.Table) -> pa.Table:
        late = pc.cast(pc.greater(t["ship_us"], t["od_us"]),
                       pa.int64())
        late_np = late.to_numpy(zero_copy_only=False)
        urg = t["urgent"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "one": pa.array(np.ones(len(t), np.int64), pa.int64()),
            "late": late,
            "late_urgent": pa.array(late_np * urg, pa.int64())})

    out = (joined.map_batches(partials, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(Sum("one", alias_name="n_lines"),
                      Sum("late", alias_name="n_late"),
                      Sum("late_urgent", alias_name="n_late_urgent")))
    return out.map_batches(lambda t: pa.table({
        "l_returnflag": t["l_returnflag"],
        "n_lines": pc.cast(t["n_lines"], pa.int64()),
        "n_late": pc.cast(t["n_late"], pa.int64()),
        "n_late_urgent": pc.cast(t["n_late_urgent"], pa.int64())}),
        batch_format="pyarrow").sort("l_returnflag")


def _lineitem_late_by_flag_sql() -> str:
    return (
        "SELECT l_returnflag, count(*) AS n_lines, "
        "CAST(sum(CAST(l_shipdate > o_orderdate AS BIGINT)) AS BIGINT) "
        "AS n_late, "
        "CAST(sum(CAST(l_shipdate > o_orderdate AND o_orderpriority "
        "IN ('1-URGENT', '2-HIGH') AS BIGINT)) AS BIGINT) AS "
        "n_late_urgent "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY 1 ORDER BY 1")


def _q_doc_quality_forest(sf_dir: str):
    """Bagged random forest (``ops/dtree.train_forest``): 3 stump
    trees on the logreg quality features, each trained on a
    deterministic Poisson(1) bootstrap — resampling is a WEIGHT
    column (the ``ops/bootstrap`` replica rule), never a data copy;
    weighted histograms keep everything exact-integer.  Output = the
    3 flattened stumps; the oracle replays each tree's weighted
    split argmin and leaf majorities with the shared mix64 chain +
    Poisson threshold literals."""
    from xtract.ops.dtree import train_forest, tree_table

    feats = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
             .map_batches(_lr_featurize, batch_format="pyarrow")
             .materialize())
    import pandas as pd

    forest = train_forest(feats, ["x1", "x2", "x3"], "y",
                          id_col="doc_id", n_trees=3, depth=1)
    outs = []
    for t, tree in enumerate(forest):
        tt = tree_table(tree)
        tt.insert(0, "tree", t)
        outs.append(tt)
    return pd.concat(outs).reset_index(drop=True).astype("int64")


def _doc_quality_forest_sql(n_trees: int = 3) -> str:
    from xtract.ops.bootstrap import POISSON1_THRESHOLDS

    case = "CASE " + " ".join(
        f"WHEN u{{t}} < {v} THEN {k}"
        for k, v in enumerate(POISSON1_THRESHOLDS)) + " ELSE 9 END"
    fdefs = [
        "(LEAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')), 1000) "
        "// 4) - 12",
        "LEAST((LENGTH(text) - LENGTH(REPLACE(text, 'table', ''))) "
        "// 5, 200) - 3",
        "LEAST((LENGTH(text) - LENGTH(REPLACE(text, 'key', ''))) "
        "// 3, 200) - 2"]
    parts = [
        "fb AS (SELECT doc_id, CAST(" + fdefs[0] + " AS BIGINT) AS f0, "
        "CAST(" + fdefs[1] + " AS BIGINT) AS f1, "
        "CAST(" + fdefs[2] + " AS BIGINT) AS f2, "
        "CAST(n_chars >= 306 AS BIGINT) AS y FROM documents)"]
    tree_sel = []
    for t in range(n_trees):
        parts.append(
            f"h0t{t} AS (SELECT *, CAST((CAST(doc_id AS HUGEINT) * "
            f"{n_trees} + {t}) % {_U64} AS UBIGINT) AS x0t{t} FROM fb)")
        ctes, last = _sql_chain(
            f"h0t{t}", _sql_mix64(f"x0t{t}", f"u{t}", f"fw{t}"),
            f"fw{t}_")
        parts.extend(ctes)
        parts.append(
            f"ft{t} AS (SELECT f0, f1, f2, y, "
            f"{case.format(t=t)} AS w FROM {last} "
            f"WHERE {case.format(t=t)} > 0)")
        parts.append(
            f"ht{t} AS (SELECT feat, val, CAST(sum(w) AS BIGINT) AS n, "
            f"CAST(sum(w * y) AS BIGINT) AS npos FROM ("
            f"SELECT 0 AS feat, f0 AS val, y, w FROM ft{t} UNION ALL "
            f"SELECT 1, f1, y, w FROM ft{t} UNION ALL "
            f"SELECT 2, f2, y, w FROM ft{t}) GROUP BY 1, 2)")
        parts.append(
            f"tt{t} AS (SELECT feat, val, "
            f"sum(n) OVER w AS nl, sum(npos) OVER w AS pl, "
            f"sum(n) OVER (PARTITION BY feat) AS nt, "
            f"sum(npos) OVER (PARTITION BY feat) AS pt, "
            f"max(val) OVER (PARTITION BY feat) AS vmax "
            f"FROM ht{t} WINDOW w AS (PARTITION BY feat "
            f"ORDER BY val ROWS UNBOUNDED PRECEDING))")
        parts.append(
            f"st{t} AS (SELECT feat, val AS thr, "
            f"LEAST(pl, nl - pl) + LEAST(pt - pl, (nt - nl) - "
            f"(pt - pl)) AS err FROM tt{t} WHERE val < vmax "
            f"ORDER BY err, feat, val LIMIT 1)")
        parts.append(
            f"at{t} AS (SELECT ft{t}.*, CASE WHEN "
            f"(SELECT count(*) FROM st{t}) = 0 THEN 0 WHEN "
            f"(CASE (SELECT feat FROM st{t}) WHEN 0 THEN f0 "
            f"WHEN 1 THEN f1 ELSE f2 END) <= "
            f"(SELECT thr FROM st{t}) THEN 1 ELSE 2 END AS node "
            f"FROM ft{t})")
        tree_sel.append(
            f"SELECT {t} AS tree, CAST(0 AS BIGINT) AS node, "
            f"COALESCE((SELECT feat FROM st{t}), -1) AS feat, "
            f"COALESCE((SELECT thr FROM st{t}), 0) AS thr, "
            f"CAST(sum(w) AS BIGINT) AS n, "
            f"CAST(sum(w * y) AS BIGINT) AS n_pos FROM ft{t}")
        tree_sel.append(
            f"SELECT {t}, node, -1, 0, CAST(sum(w) AS BIGINT), "
            f"CAST(sum(w * y) AS BIGINT) FROM at{t} "
            f"WHERE node > 0 GROUP BY node")
    union = " UNION ALL ".join(tree_sel)
    return ("WITH " + ", ".join(parts) +
            f" SELECT CAST(tree AS BIGINT) AS tree, node, "
            f"CAST(feat AS BIGINT) AS feat, CAST(thr AS BIGINT) AS thr, "
            f"n, n_pos, CAST(2 * n_pos > n AS BIGINT) AS pred "
            f"FROM ({union}) ORDER BY tree, node")


def _q_event_type_salted_join(sf_dir: str):
    """Fragment-replicate ("salted") join on a key hot on BOTH sides
    (``ops/joins.salted_join``): event_type has ~5 distinct values, so
    every key is hot in both the per-user and the per-day count tables
    — the shape where skew_join's broadcast gate raises.  Each hot key
    fragments its LARGER side across ``n_salts`` partitions and
    replicates the smaller; the oracle is the same join in SQL (the
    salting is an internal routing decision, rows are identical)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from xtract.ops.joins import salted_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    left = (ev.map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "event_type": t["event_type"]}),
        batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="n")))
    right = (ev.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "day": pc.strftime(t["ts"], format="%Y-%m-%d")}),
        batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="m")))
    joined = salted_join(left, right, on="event_type",
                         hot_count=20, n_salts=8)
    out = (joined.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "nm": pc.multiply(pc.cast(t["n"], pa.int64()),
                              pc.cast(t["m"], pa.int64()))}),
        batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("nm", alias_name="nm_sum"),
                   Count(alias_name="n_pairs")))
    return out.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "nm_sum": pc.cast(t["nm_sum"], pa.int64()),
            "n_pairs": pc.cast(t["n_pairs"], pa.int64())}),
        batch_format="pyarrow").sort("event_type")


def _event_type_salted_join_sql() -> str:
    return (
        "WITH l AS (SELECT user_id, event_type, count(*) AS n "
        "FROM events GROUP BY 1, 2), "
        "r AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, "
        "count(*) AS m FROM events GROUP BY 1, 2) "
        "SELECT l.event_type, CAST(sum(l.n * r.m) AS BIGINT) AS nm_sum, "
        "count(*) AS n_pairs FROM l JOIN r ON l.event_type = "
        "r.event_type GROUP BY 1 ORDER BY 1")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # SQL-checked
        "doc_lang_histogram": _q_doc_lang_histogram,
        "doc_source_stats": _q_doc_source_stats,
        "doc_token_stats": _q_doc_token_stats,
        "doc_fingerprint": _q_doc_fingerprint,
        "doc_exact_dedup": _q_doc_exact_dedup,
        "events_by_type": _q_events_by_type,
        "events_daily": _q_events_daily,
        "lineitem_pricing": _q_lineitem_pricing,
        "top_customers": _q_top_customers,
        "part_brand_stats": _q_part_brand_stats,
        "supplier_nation": _q_supplier_nation,
        "embedding_knn": _q_embedding_knn,
        "knn_sq8": _q_knn_sq8,
        "knn_ivfsq": _q_knn_ivfsq,
        "doc_upsample_mix": _q_doc_upsample_mix,
        "doc_hash_split": _q_doc_hash_split,
        "doc_content_split": _q_doc_content_split,
        "doc_quality_sample": _q_doc_quality_sample,
        "doc_sample_per_source": _q_doc_sample_per_source,
        "doc_curation_pipeline": _q_doc_curation_pipeline,
        "orders_priority_histogram": _q_orders_priority_histogram,
        "discount_revenue": _q_discount_revenue,
        "nation_customer_balance": _q_nation_customer_balance,
        "events_hourly_by_type": _q_events_hourly_by_type,
        "user_running_total": _q_user_running_total,
        "last_order_before_event": _q_last_order_before_event,
        "last_order_before_event_cogroup": _q_last_order_before_event_cogroup,
        "vocab_top_tokens": _q_vocab_top_tokens,
        "user_sessions": _q_user_sessions,
        "event_gaps": _q_event_gaps,
        "user_rolling_window": _q_user_rolling_window,
        "source_doc_cap": _q_source_doc_cap,
        "target_anchor_stats": _q_target_anchor_stats,
        "doc_exact_dedup_best": _q_doc_exact_dedup_best,
        "doc_normalize": _q_doc_normalize,
        "events_rollup": _q_events_rollup,
        "event_type_anomalies": _q_event_type_anomalies,
        "knn_ivf_int": _q_knn_ivf_int,
        "semantic_dedup_int": _q_semantic_dedup_int,
        "event_funnel": _q_event_funnel,
        "cohort_retention": _q_cohort_retention,
        "user_dominant_event": _q_user_dominant_event,
        "doc_keywords": _q_doc_keywords,
        "user_range_window": _q_user_range_window,
        "user_event_ntile": _q_user_event_ntile,
        "user_event_pivot": _q_user_event_pivot,
        "corpus_refresh_dedup": _q_corpus_refresh_dedup,
        "fuzzy_title_match": _q_fuzzy_title_match,
        "page_tables": _q_page_tables,
        "doc_chunks": _q_doc_chunks,
        "page_headings": _q_page_headings,
        "page_forms": _q_page_forms,
        "page_images": _q_page_images,
        "user_value_trend": _q_user_value_trend,
        "host_components": _q_host_components,
        "host_crawl_depth": _q_host_crawl_depth,
        "host_k_core": _q_host_k_core,
        "doc_phrase_search": _q_doc_phrase_search,
        "entity_cooccurrence": _q_entity_cooccurrence,
        "orders_fd_audit": _q_orders_fd_audit,
        "events_stream_enrich": _q_events_stream_enrich,
        "host_scc": _q_host_scc,
        "url_change_rate": _q_url_change_rate,
        "user_event_breadth": _q_user_event_breadth,
        "host_homographs": _q_host_homographs,
        "feed_entries": _q_feed_entries,
        "page_media": _q_page_media,
        "site_doc_counts": _q_site_doc_counts,
        "orders_sorted_join": _q_orders_sorted_join,
        "customers_no_events_except": _q_customers_no_events_except,
        "doc_set_containment": _q_doc_set_containment,
        "user_event_paths": _q_user_event_paths,
        "event_type_rules": _q_event_type_rules,
        "host_neighbor_features": _q_host_neighbor_features,
        "host_pagerank_weighted": _q_host_pagerank_weighted,
        "user_freshness_score": _q_user_freshness_score,
        "events_users_intersect": _q_events_users_intersect,
        "events_pseudonymized": _q_events_pseudonymized,
        "lineitem_unpivot": _q_lineitem_unpivot,
        "host_robots_filter": _q_host_robots_filter,
        "doc_sentences": _q_doc_sentences,
        "event_value_bands": _q_event_value_bands,
        "doc_length_rank": _q_doc_length_rank,
        "host_sitemaps": _q_host_sitemaps,
        "user_rfm_segments": _q_user_rfm_segments,
        "lineitem_weighted_discount": _q_lineitem_weighted_discount,
        "host_reciprocal_links": _q_host_reciprocal_links,
        "anchor_text_profile": _q_anchor_text_profile,
        "page_lists": _q_page_lists,
        "bigram_pmi": _q_bigram_pmi,
        "host_triangles": _q_host_triangles,
        "host_clustering": _q_host_clustering,
        "part_butterflies": _q_part_butterflies,
        "url_param_cardinality": _q_url_param_cardinality,
        "page_hreflang": _q_page_hreflang,
        "pagination_chains": _q_pagination_chains,
        "nation_trade_flows": _q_nation_trade_flows,
        "page_opengraph": _q_page_opengraph,
        "source_lang_mix": _q_source_lang_mix,
        "returnflag_weighted_median": _q_returnflag_weighted_median,
        "host_bipartite": _q_host_bipartite,
        "doc_winnowing": _q_doc_winnowing,
        "winnow_near_dups": _q_winnow_near_dups,
        "bm25_length_rerank": _q_bm25_length_rerank,
        "schema_evolution_union": _q_schema_evolution_union,
        "source_trigram_growth": _q_source_trigram_growth,
        "orders_expectations": _q_orders_expectations,
        "shard_rebalance_audit": _q_shard_rebalance_audit,
        "source_token_budget": _q_source_token_budget,
        "embedding_norm_stats": _q_embedding_norm_stats,
        "host_degree_mixing": _q_host_degree_mixing,
        "winnow_fp_postings": _q_winnow_fp_postings,
        "doc_quality_lr": _q_doc_quality_lr,
        "nation_profit": _q_nation_profit,
        "doc_dsir_select": _q_doc_dsir_select,
        "source_fp_overlap": _q_source_fp_overlap,
        "part_name_linkage": _q_part_name_linkage,
        "page_template_stats": _q_page_template_stats,
        "knn_pq": _q_knn_pq,
        "event_value_bootstrap": _q_event_value_bootstrap,
        "shard_assign_2level": _q_shard_assign_2level,
        "host_truss": _q_host_truss,
        "events_late_arrivals": _q_events_late_arrivals,
        "events_k_anonymity": _q_events_k_anonymity,
        "event_type_dp_counts": _q_event_type_dp_counts,
        "lr_confusion": _q_lr_confusion,
        "lr_calibration": _q_lr_calibration,
        "event_user_kmv": _q_event_user_kmv,
        "lr_conformal": _q_lr_conformal,
        "lr_auc": _q_lr_auc,
        "doc_neyman_sample": _q_doc_neyman_sample,
        "source_zipf_slope": _q_source_zipf_slope,
        "lr_tune": _q_lr_tune,
        "user_value_cusum": _q_user_value_cusum,
        "source_length_ks": _q_source_length_ks,
        "embedding_coreset": _q_embedding_coreset,
        "knn_mmr": _q_knn_mmr,
        "host_weighted_sssp": _q_host_weighted_sssp,
        "host_communities": _q_host_communities,
        "host_mis": _q_host_mis,
        "host_neighborhood_fn": _q_host_neighborhood_fn,
        "host_harmonic": _q_host_harmonic,
        "host_coloring": _q_host_coloring,
        "orders_orc_roundtrip": _q_orders_orc_roundtrip,
        "lr_kfold": _q_lr_kfold,
        "embedding_rp8": _q_embedding_rp8,
        "host_modularity": _q_host_modularity,
        "event_type_salted_join": _q_event_type_salted_join,
        "host_anf_hll": _q_host_anf_hll,
        "embedding_scatter": _q_embedding_scatter,
        "doc_quality_tree": _q_doc_quality_tree,
        "doc_rrf_fusion": _q_doc_rrf_fusion,
        "event_value_sampled_quantiles": _q_event_value_sampled_quantiles,
        "orders_late_ship_priority": _q_orders_late_ship_priority,
        "big_orders_top": _q_big_orders_top,
        "lineitem_late_by_flag": _q_lineitem_late_by_flag,
        "doc_quality_forest": _q_doc_quality_forest,
        "orders_anti_events": _q_orders_anti_events,
        "user_first_event_daily": _q_user_first_event_daily,
        "doc_split_assign": _q_doc_split_assign,
        "page_code_blocks": _q_page_code_blocks,
        "host_link_jaccard": _q_host_link_jaccard,
        "customer_orders_left": _q_customer_orders_left,
        "events_gap_fill": _q_events_gap_fill,
        "event_value_histogram": _q_event_value_histogram,
        "orders_cube": _q_orders_cube,
        "event_value_moments": _q_event_value_moments,
        "regional_revenue": _q_regional_revenue,
        "customer_spend_bucketed": _q_customer_spend_bucketed,
        "customer_spend_incremental": _q_customer_spend_incremental,
        "events_range_pruned": _q_events_range_pruned,
        "doc_weighted_sample": _q_doc_weighted_sample,
        "events_time_travel": _q_events_time_travel,
        "customer_upsert_merge": _q_customer_upsert_merge,
        "events_stream_exactly_once": _q_events_stream_exactly_once,
        "user_sessions_stream": _q_user_sessions_stream,
        "customer_upsert_cdc": _q_customer_upsert_cdc,
        "events_zorder_box": _q_events_zorder_box,
        "events_stream_window": _q_events_stream_window,
        "user_customer_outer": _q_user_customer_outer,
        "host_crawl_budget": _q_host_crawl_budget,
        "doc_prefix_dedup": _q_doc_prefix_dedup,
        "event_transitions": _q_event_transitions,
        "event_type_approx_users": _q_event_type_approx_users,
        "user_value_ffill": _q_user_value_ffill,
        "orders_monthly_share": _q_orders_monthly_share,
        "part_copurchase": _q_part_copurchase,
        "shipping_priority": _q_shipping_priority,
        "small_quantity_revenue": _q_small_quantity_revenue,
        "high_balance_inactive": _q_high_balance_inactive,
        "part_revenue_share": _q_part_revenue_share,
        "promo_revenue_share": _q_promo_revenue_share,
        "top_volume_customers": _q_top_volume_customers,
        "top_supplier_revenue": _q_top_supplier_revenue,
        "returned_item_revenue": _q_returned_item_revenue,
        "priority_return_check": _q_priority_return_check,
        "nation_market_share": _q_nation_market_share,
        "customer_order_distribution": _q_customer_order_distribution,
        "brand_filtered_revenue": _q_brand_filtered_revenue,
        "late_supplier_orders": _q_late_supplier_orders,
        "order_qty_lines_corr": _q_order_qty_lines_corr,
        "event_value_mad": _q_event_value_mad,
        "event_type_mode_value": _q_event_type_mode_value,
        "brand_supplier_coverage": _q_brand_supplier_coverage,
        "event_props_key_stats": _q_event_props_key_stats,
        "suppliers_all_brands": _q_suppliers_all_brands,
        "user_longest_streak": _q_user_longest_streak,
        "click_no_purchase_users": _q_click_no_purchase_users,
        "single_month_orders": _q_single_month_orders,
        "user_interarrival_stats": _q_user_interarrival_stats,
        "orders_yoy_growth": _q_orders_yoy_growth,
        "events_daily_distinct_users": _q_events_daily_distinct_users,
        "lineitem_decile_revenue": _q_lineitem_decile_revenue,
        "doc_simpson_diversity": _q_doc_simpson_diversity,
        "url_redirect_chains": _q_url_redirect_chains,
        "parts_never_ordered": _q_parts_never_ordered,
        "supplier_balance_pct_rank": _q_supplier_balance_pct_rank,
        "big_spender_customers": _q_big_spender_customers,
        "source_token_divergence": _q_source_token_divergence,
        "segment_nation_contingency": _q_segment_nation_contingency,
        "doc_tree_rollup": _q_doc_tree_rollup,
        "part_popularity_gini": _q_part_popularity_gini,
        "customer_revenue_concentration":
            _q_customer_revenue_concentration,
        "order_fulfillment_lag": _q_order_fulfillment_lag,
        "user_path_signatures": _q_user_path_signatures,
        "event_time_weighted_value": _q_event_time_weighted_value,
        "orders_weekday_profile": _q_orders_weekday_profile,
        "returns_rate_by_month": _q_returns_rate_by_month,
        "nation_order_count_moments": _q_nation_order_count_moments,
        "event_type_peak_rate": _q_event_type_peak_rate,
        "orders_rolling_3mo_revenue": _q_orders_rolling_3mo_revenue,
        "event_value_first_digit": _q_event_value_first_digit,
        "event_type_user_overlap": _q_event_type_user_overlap,
        "lineitem_tax_discount_grid": _q_lineitem_tax_discount_grid,
        "customer_repeat_rate_by_segment":
            _q_customer_repeat_rate_by_segment,
        "events_anomalous_users": _q_events_anomalous_users,
        "orders_pareto_frontier": _q_orders_pareto_frontier,
        "users_all_event_types": _q_users_all_event_types,
        "order_priority_mix_shift": _q_order_priority_mix_shift,
        "daily_new_users": _q_daily_new_users,
        "daily_churned_users": _q_daily_churned_users,
        "bigram_coverage": _q_bigram_coverage,
        "doc_hapax_stats": _q_doc_hapax_stats,
        "doc_oov_rate": _q_doc_oov_rate,
        "doc_stopword_counts": _q_doc_stopword_counts,
        "doc_packing_stats": _q_doc_packing_stats,
        "top_parts_per_brand": _q_top_parts_per_brand,
        "events_hopping": _q_events_hopping,
        "events_last_hour": _q_events_last_hour,
        "orders_semi_events": _q_orders_semi_events,
        "orders_blocklist": _q_orders_blocklist,
        "customer_order_quantiles": _q_customer_order_quantiles,
        "order_price_quantiles": _q_order_price_quantiles,
        "nb_lang_classify": _q_nb_lang_classify,
        "host_pagerank": _q_host_pagerank,
        "host_hits": _q_host_hits,
        "host_authority_profile": _q_host_authority_profile,
        "crawl_schedule": _q_crawl_schedule,
        "url_templates": _q_url_templates,
        "host_crawl_waterfill": _q_host_crawl_waterfill,
        "host_mirror_pairs": _q_host_mirror_pairs,
        "host_crawl_delays": _q_host_crawl_delays,
        "sitemap_entries": _q_sitemap_entries,
        "crawl_plan": _q_crawl_plan,
        "crawl_snapshot_diff": _q_crawl_snapshot_diff,
        "page_head_meta": _q_page_head_meta,
        "heavy_hitter_hosts": _q_heavy_hitter_hosts,
        "lineitem_bloom_semi": _q_lineitem_bloom_semi,
        "event_type_unique_users": _q_event_type_unique_users,
        "nation_revenue": _q_nation_revenue,
        "label_centroids": _q_label_centroids,
        "documents_profile": _q_documents_profile,
        "host_noindex_rates": _q_host_noindex_rates,
        "doc_readability": _q_doc_readability,
        "page_structured": _q_page_structured,
        "doc_length_gate": _q_doc_length_gate,
        "doc_bits_per_char": _q_doc_bits_per_char,
        # extraction + ops (non-SQL → rows-only)
        "extract_pages": _q_extract_pages,
        "webtext_pipeline": _q_webtext_pipeline,
        "extract_retry": _q_extract_retry,
        "extract_blocks": _q_extract_blocks,
        "extract_words": _q_extract_words,
        "corpus_checksum": _q_corpus_checksum,
        "render_formats": _q_render_formats,
        "minhash_dedup": _q_minhash_dedup,
        "simhash_dedup": _q_simhash_dedup,
        "ngram_dedup": _q_ngram_dedup,
        "embedding_dedup": _q_embedding_dedup,
        "bm25_top20": _q_bm25_top20,
        "bm25_index_top20": _q_bm25_index_top20,
        "semantic_dedup": _q_semantic_dedup,
        "knn_ivf": _q_knn_ivf,
        "embedding_kmeans": _q_embedding_kmeans,
        "doc_quality": _q_doc_quality,
        "doc_langid": _q_doc_langid,
        "doc_rolling_fp": _q_doc_rolling_fp,
        "media_features": _q_media_features,
        "image_near_dups": _q_image_near_dups,
        "audio_near_dups": _q_audio_near_dups,
        "video_near_dups": _q_video_near_dups,
        "extract_warc": _q_extract_warc,
        "line_dedup": _q_line_dedup,
        "canonical_url_dedup": _q_canonical_url_dedup,
        "lowest_confidence_docs": _q_lowest_confidence_docs,
        "bpe_subword_stats": _q_bpe_subword_stats,
        "paragraph_dedup": _q_paragraph_dedup,
        "decontaminate": _q_decontaminate,
        "customer_spend_cogroup": _q_customer_spend_cogroup,
        "orders_skew_join": _q_orders_skew_join,
        "doc_sample": _q_doc_sample,
        "doc_repetition": _q_doc_repetition,
        "doc_mixture_sample": _q_doc_mixture_sample,
        "page_outlinks": _q_page_outlinks,
        "doc_pii_redact": _q_doc_pii_redact,
        "substring_dedup": _q_substring_dedup,
        "doc_quality_boost": _q_doc_quality_boost,
        "lr_isotonic": _q_lr_isotonic,
    }


_TRIM = "' ' || chr(9) || chr(10) || chr(13)"


def _chunked_lines_cte(tail_literal: str, mod: int) -> str:
    """CTE body rebuilding ``_chunked_lines_batch``'s multi-line text in
    DuckDB: ``lines(doc_id, ln, l)`` = 12-word chunk lines (list
    slicing) + the shared tail line, ``tot(doc_id, n)`` = line counts."""
    return (
        "ws0 AS (SELECT doc_id, list_filter(string_split(coalesce(text,''), "
        "' '), x -> x != '') AS ws FROM documents), "
        "lines AS ("
        "SELECT doc_id, CAST((i-1)//12 AS BIGINT) AS ln, "
        "array_to_string(ws[i:i+11], ' ') AS l "
        "FROM ws0, UNNEST(range(1, len(ws)+1, 12)) AS t(i) "
        "UNION ALL "
        f"SELECT doc_id, 1000000, '{tail_literal}' || "
        f"CAST(doc_id % {mod} AS VARCHAR) FROM documents), "
        "tot AS (SELECT doc_id, count(*) AS n FROM lines GROUP BY doc_id)")


def _line_dedup_sql() -> str:
    s = f"lower(trim(l, {_TRIM}))"
    ln = f"length(trim(l, {_TRIM}))"
    return (
        "WITH " + _chunked_lines_cte(_LINE_TAIL.replace("{}", ""), 4) + ", "
        f"hot AS (SELECT {s} AS s FROM lines WHERE {ln} >= 8 "
        "GROUP BY 1 HAVING count(DISTINCT doc_id) > 20), "
        f"kept AS (SELECT doc_id, ln, l FROM lines WHERE {ln} < 8 "
        f"OR {s} NOT IN (SELECT s FROM hot)), "
        "agg AS (SELECT doc_id, string_agg(l, chr(10) ORDER BY ln) AS text, "
        "count(*) AS n_kept FROM kept GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(a.text, '') AS text, "
        "CAST(t.n - coalesce(a.n_kept, 0) AS BIGINT) AS n_lines_dropped "
        "FROM documents d JOIN tot t USING (doc_id) "
        "LEFT JOIN agg a USING (doc_id)")


def _paragraph_dedup_sql() -> str:
    return (
        "WITH " + _chunked_lines_cte(_PARA_TAIL.replace("{}", ""), 7) + ", "
        f"pf AS (SELECT doc_id, ln, l, trim(l, {_TRIM}) AS s FROM lines), "
        "own AS (SELECT s, min(doc_id) AS owner FROM pf "
        "WHERE length(s) >= 20 GROUP BY s), "
        "kept AS (SELECT pf.doc_id, pf.ln, pf.l FROM pf "
        "LEFT JOIN own ON pf.s = own.s "
        "WHERE length(pf.s) < 20 OR own.owner = pf.doc_id), "
        "agg AS (SELECT doc_id, string_agg(l, chr(10) ORDER BY ln) AS text, "
        "count(*) AS n_kept FROM kept GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(a.text, '') AS text, "
        "CAST(t.n - coalesce(a.n_kept, 0) AS BIGINT) AS n_paras_dropped "
        "FROM documents d JOIN tot t USING (doc_id) "
        "LEFT JOIN agg a USING (doc_id)")


def _canonical_url_sql() -> str:
    base = "'https://site' || CAST(doc_id//3 AS VARCHAR) || '.example.org"
    return (
        "WITH u AS (SELECT doc_id, CASE doc_id % 6 "
        f"WHEN 0 THEN {base}/a/b?utm_source=rss&ref=tw' "
        "WHEN 1 THEN 'https://SITE' || CAST(doc_id//3 AS VARCHAR) || "
        "'.Example.ORG/a/b/' "
        f"WHEN 2 THEN {base}/a/b#frag' "
        f"WHEN 3 THEN {base}/a/b?b=2&a=1' "
        f"WHEN 4 THEN {base}//a//b' "
        f"ELSE {base}:443/a/b' END AS url, "
        f"{base}/a/b' || CASE WHEN doc_id % 6 = 3 THEN '?a=1&b=2' "
        "ELSE '' END AS canonical_url FROM documents) "
        "SELECT min(url) AS url, canonical_url FROM u GROUP BY canonical_url")


def _simhash_sql() -> str:
    """Independent DuckDB recomputation of the full SimHash clustering:
    md5_number_upper word hashes (= the engine's md5-top-8-bytes
    little-endian definition), 64-bit majority-vote simhash, 4×16-bit
    band candidate pairs, Hamming≤3 verify, min-label connected
    components via a recursive transitive closure."""
    return (
        "WITH RECURSIVE d2 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN "
        "'shared template page content about topic ' || "
        "CAST(doc_id % 3 AS VARCHAR) || ' with ' || "
        "(CASE WHEN doc_id % 2 = 0 THEN 'alpha' ELSE 'beta' END) || "
        "' extra tail words here' ELSE coalesce(text, '') END AS t "
        "FROM documents), "
        "toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(t), "
        "'[a-z0-9_]+')) AS w FROM d2), "
        "wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w), "
        "bits AS (SELECT doc_id, j, sum(c * (CAST((md5_number_upper(w) >> "
        "CAST(j AS INTEGER)) & 1 AS BIGINT)*2 - 1)) AS acc "
        "FROM wc, UNNEST(range(0,64)) AS u(j) GROUP BY doc_id, j), "
        "sims AS (SELECT doc_id, CAST(sum(CASE WHEN acc > 0 THEN "
        "(CAST(1 AS UBIGINT) << CAST(j AS INTEGER)) ELSE CAST(0 AS UBIGINT) "
        "END) AS UBIGINT) AS sim FROM bits GROUP BY doc_id), "
        "bands AS (SELECT doc_id, sim, b, "
        "(sim >> CAST(b*16 AS INTEGER)) & 65535 AS bv "
        "FROM sims, UNNEST(range(0,4)) AS u(b)), "
        "prs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b "
        "FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv "
        "AND x.doc_id < y.doc_id "
        "WHERE bit_count(xor(x.sim, y.sim)) <= 3), "
        "edges AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs), "
        "reach(s, d) AS (SELECT a, b FROM edges UNION "
        "SELECT r.s, e.b FROM reach r JOIN edges e ON r.d = e.a), "
        "lbl AS (SELECT s AS doc_id, least(min(d), s) AS cl "
        "FROM reach GROUP BY s) "
        "SELECT d2.doc_id, CAST(coalesce(l.cl, d2.doc_id) AS BIGINT) "
        "AS cluster_id FROM d2 LEFT JOIN lbl l ON d2.doc_id = l.doc_id")


def _bm25_sql() -> str:
    """Oracle for bm25_top20 / bm25_index_top20 (the two paths are
    bit-identical, so one oracle serves both): exact integer tf/df/dl
    recomputation, Robertson idf ``ln(1+(N−df+0.5)/(df+0.5))``,
    k1=1.2 b=0.75, score-desc doc_id-asc top 20.  Rank agreement is
    float-safe here because distinct true scores are separated by far
    more than cross-engine ulp noise and exact ties break by doc_id in
    both engines."""
    from xtract.ops.ranking import query_terms

    qv = ", ".join(f"('{w}', {j})"
                   for j, w in enumerate(query_terms(_BM25_QUERY)))
    return (
        "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower("
        "coalesce(text,'')), '[a-z0-9_]+')) AS w FROM documents), "
        f"q(w, qi) AS (VALUES {qv}), "
        "dl AS (SELECT d.doc_id, coalesce(t.c, 0) AS dl FROM documents d "
        "LEFT JOIN (SELECT doc_id, count(*) AS c FROM toks "
        "GROUP BY doc_id) t USING (doc_id)), "
        "tf AS (SELECT t.doc_id, q.qi, count(*) AS tf FROM toks t "
        "JOIN q ON t.w = q.w GROUP BY t.doc_id, q.qi), "
        "df AS (SELECT qi, count(*) AS df FROM tf GROUP BY qi), "
        "st AS (SELECT (SELECT count(*) FROM documents) AS n, "
        "(SELECT sum(dl) FROM dl) AS sdl), "
        "sc AS (SELECT tf.doc_id, "
        "sum(ln(1 + (st.n - df.df + 0.5)/(df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / "
        "(CAST(st.sdl AS DOUBLE)/st.n)))) AS s, "
        "sum(tf.tf) AS tf_total, max(dl.dl) AS dl "
        "FROM tf JOIN df USING (qi) JOIN dl ON tf.doc_id = dl.doc_id, st "
        "GROUP BY tf.doc_id) "
        "SELECT CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) "
        "AS rank, doc_id, CAST(tf_total AS BIGINT) AS tf_total, "
        "CAST(dl AS BIGINT) AS dl "
        "FROM sc ORDER BY s DESC, doc_id LIMIT 20")


def _embedding_dedup_sql() -> str:
    """Independent semantic oracle for embedding_dedup: rebuilds the
    same augmented table (scaled copies of every 7th vector), finds ALL
    pairs with exact cosine ≥ 0.95 (no LSH — a brute-force ground
    truth, so it also checks the LSH recall claim), and labels
    components via recursive transitive closure.  Float-safe: true
    cosines are either ≈1.0 (planted scaled pairs) or ≤ 0.52 — no
    value sits near the 0.95 boundary."""
    return (
        "WITH RECURSIVE base AS ("
        "SELECT vec_id, embedding FROM embeddings "
        "UNION ALL "
        "SELECT vec_id + 100000 AS vec_id, "
        "list_transform(embedding, x -> x * 2) AS embedding "
        "FROM embeddings WHERE vec_id % 7 = 0), "
        "prs AS (SELECT a.vec_id AS a, b.vec_id AS b "
        "FROM base a JOIN base b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95), "
        "edges AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs), "
        "reach(s, d) AS (SELECT a, b FROM edges UNION "
        "SELECT r.s, e.b FROM reach r JOIN edges e ON r.d = e.a), "
        "lbl AS (SELECT s AS vec_id, least(min(d), s) AS cl "
        "FROM reach GROUP BY s) "
        "SELECT base.vec_id, CAST(coalesce(l.cl, base.vec_id) AS BIGINT) "
        "AS cluster_id FROM base LEFT JOIN lbl l ON base.vec_id = l.vec_id")


def _doc_quality_sql() -> str:
    """Oracle for doc_quality: recomputes ``textstats.QualityScorer``'s
    composite score from scratch — words are ``[a-z]+`` runs of
    lower(text); the stopword table is the union of the engine's own
    per-language tables (one definition, two engines); the longest
    repeated-word run is gaps-and-islands over an indexed unnest; every
    boundary test is integer-exact (``3.0 <= mean_wlen`` ⇔
    ``3*nw <= sum_len``)."""
    from xtract.langdetect import STOPWORDS

    stop = sorted({w for t in STOPWORDS.values() for w in t
                   if w.isascii() and w.isalpha()})
    rows = ", ".join(f"('{w}')" for w in stop)
    return (
        "WITH stop(w) AS (VALUES " + rows + "), "
        "d2 AS (SELECT doc_id, regexp_extract_all(lower(coalesce("
        "text,'')), '[a-z]+') AS ws FROM documents), "
        "tw AS (SELECT doc_id, i, ws[i] AS w FROM d2, "
        "UNNEST(range(1, len(ws)+1)) AS u(i)), "
        "runs AS (SELECT doc_id, max(cnt) AS max_run FROM ("
        "SELECT doc_id, w, grp, count(*) AS cnt FROM ("
        "SELECT doc_id, w, i - row_number() OVER ("
        "PARTITION BY doc_id, w ORDER BY i) AS grp FROM tw) "
        "GROUP BY doc_id, w, grp) GROUP BY doc_id), "
        "agg AS (SELECT doc_id, count(*) AS nw, "
        "sum(CASE WHEN w IN (SELECT w FROM stop) THEN 1 ELSE 0 END) AS sw, "
        "sum(length(w)) AS sl, count(DISTINCT w) AS nd "
        "FROM tw GROUP BY doc_id) "
        "SELECT d.doc_id, CAST("
        "(CASE WHEN a.nw BETWEEN 20 AND 100000 THEN 30 ELSE 0 END) + "
        "(CASE WHEN a.nw > 0 AND 3*a.sw >= a.nw THEN 25 ELSE 0 END) + "
        "(CASE WHEN a.nw > 0 AND 3*a.nw <= a.sl AND a.sl <= 10*a.nw "
        "THEN 25 ELSE 0 END) + "
        "(CASE WHEN a.nw > 0 AND 2*a.nd >= a.nw THEN 10 ELSE 0 END) + "
        "(CASE WHEN coalesce(r.max_run, 0) <= 4 THEN 10 ELSE 0 END) "
        "AS DOUBLE) AS quality_score, "
        "CASE WHEN coalesce(a.nw, 0) > 0 THEN CAST(a.sw AS DOUBLE)/a.nw "
        "ELSE 0.0 END AS stopword_ratio, "
        "CASE WHEN coalesce(a.nw, 0) > 0 THEN CAST(a.sl AS DOUBLE)/a.nw "
        "ELSE 0.0 END AS mean_word_len "
        "FROM documents d LEFT JOIN agg a USING (doc_id) "
        "LEFT JOIN runs r USING (doc_id)")


def _doc_langid_sql() -> str:
    """Oracle for doc_langid: embeds the engine's own stopword tables
    (xtract.langdetect.STOPWORDS — one definition, two engines) and
    recomputes detect(): +2 per stopword occurrence, best language with
    alphabetical tie-break, margin 2 else 'und', conf = best/total
    (float32 on both sides)."""
    from xtract.langdetect import STOPWORDS

    rows = ", ".join(f"('{l}', '{w}')"
                     for l in sorted(STOPWORDS)
                     for w in sorted(STOPWORDS[l]))
    return (
        "WITH stop(lang, w) AS (VALUES " + rows + "), "
        "toks AS (SELECT doc_id, unnest(regexp_extract_all(lower("
        "coalesce(text,'')), '[a-z]+')) AS w FROM documents), "
        "sc AS (SELECT t.doc_id, s.lang, 2*count(*) AS score "
        "FROM toks t JOIN stop s ON t.w = s.w GROUP BY t.doc_id, s.lang), "
        "tot AS (SELECT doc_id, sum(score) AS total, max(score) AS best "
        "FROM sc GROUP BY doc_id), "
        "pick AS (SELECT sc.doc_id, min(sc.lang) AS lang FROM sc "
        "JOIN tot USING (doc_id) WHERE sc.score = tot.best "
        "GROUP BY sc.doc_id) "
        "SELECT d.doc_id, "
        "CASE WHEN coalesce(t.best, 0) >= 2 THEN p.lang ELSE 'und' END "
        "AS lang_detected, "
        "CAST(CASE WHEN coalesce(t.best, 0) >= 2 THEN "
        "CAST(t.best AS DOUBLE)/t.total ELSE 0.0 END AS REAL) AS lang_conf "
        "FROM documents d LEFT JOIN tot t USING (doc_id) "
        "LEFT JOIN pick p USING (doc_id)")


def _rolling_fp_sql(window: int = 64, base: int = 257,
                    mod: int = (1 << 61) - 1) -> str:
    """Oracle for doc_rolling_fp: recomputes the min-of-rolling-hashes
    fingerprint (``textstats.rolling_fingerprint``) from scratch — each
    64-byte window's polynomial hash is a HUGEINT dot product against a
    precomputed base-power table, min per document.  Valid for ASCII
    text (char code == utf-8 byte)."""
    pows = ", ".join(f"({k}, {pow(base, k, mod)})" for k in range(window))
    return (
        "WITH d2 AS (SELECT doc_id, coalesce(text,'') AS t, "
        "length(coalesce(text,'')) AS n FROM documents), "
        "ch AS (SELECT doc_id, i-1 AS pos, unicode(t[i]) AS code, n "
        "FROM d2, UNNEST(range(1, n+1)) AS u(i)), "
        f"p(k, pw) AS (VALUES {pows}), "
        "wins AS ("
        f"SELECT doc_id, e FROM (SELECT DISTINCT doc_id, n FROM ch "
        f"WHERE n > {window}), UNNEST(range({window - 1}, n)) AS u(e) "
        "UNION ALL "
        f"SELECT DISTINCT doc_id, n-1 AS e FROM ch WHERE n <= {window}), "
        "h AS (SELECT w.doc_id, w.e, "
        f"CAST(sum(CAST(c.code AS HUGEINT) * p.pw) % {mod} AS BIGINT) AS hv "
        "FROM wins w JOIN ch c ON c.doc_id = w.doc_id "
        f"AND c.pos BETWEEN w.e - {window - 1} AND w.e "
        "JOIN p ON p.k = w.e - c.pos GROUP BY w.doc_id, w.e) "
        "SELECT d2.doc_id, CAST(coalesce(m.mn, 0) AS UBIGINT) AS rolling_fp "
        "FROM d2 LEFT JOIN (SELECT doc_id, min(hv) AS mn FROM h "
        "GROUP BY doc_id) m USING (doc_id)")


def _doc_repetition_sql() -> str:
    """Oracle for doc_repetition: duplicate-line mass over the same
    chunked lines CTE; bigrams over the same token stream (original
    text tokens + the tail line's words, digits excluded by the shared
    ``[a-z]+`` tokenizer)."""
    import re as _re

    tail_words = ", ".join(f"'{w}'" for w in _re.findall("[a-z]+", _PARA_TAIL))
    return (
        "WITH " + _chunked_lines_cte(_PARA_TAIL.replace("{}", ""), 7) + ", "
        "lc AS (SELECT doc_id, l, count(*) AS c, length(l) AS len "
        "FROM lines WHERE l != '' GROUP BY doc_id, l), "
        "lagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines, "
        "CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) "
        "AS n_dup_lines, "
        "CAST(sum(len*c) AS BIGINT) AS n_line_chars, "
        "CAST(sum(CASE WHEN c > 1 THEN len*c ELSE 0 END) AS BIGINT) "
        "AS n_dup_line_chars FROM lc GROUP BY doc_id), "
        "tk AS (SELECT doc_id, list_concat(regexp_extract_all(lower("
        f"coalesce(text,'')), '[a-z]+'), [{tail_words}]) AS ws "
        "FROM documents), "
        "bgc AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g, count(*) AS c "
        "FROM tk, UNNEST(range(1, len(ws))) AS u(i) GROUP BY doc_id, g), "
        "top AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count, "
        "CAST(sum(c) AS BIGINT) AS n_bigrams FROM bgc GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(a.n_lines, 0) AS n_lines, "
        "coalesce(a.n_dup_lines, 0) AS n_dup_lines, "
        "coalesce(a.n_line_chars, 0) AS n_line_chars, "
        "coalesce(a.n_dup_line_chars, 0) AS n_dup_line_chars, "
        "coalesce(t.n_bigrams, 0) AS n_bigrams, "
        "coalesce(t.top_bigram_count, 0) AS top_bigram_count "
        "FROM documents d LEFT JOIN lagg a USING (doc_id) "
        "LEFT JOIN top t USING (doc_id)")


def _page_outlinks_sql() -> str:
    """Oracle for page_outlinks: the expected link rows CASE-constructed
    from doc_id (nav link resolved against the page url, external link,
    and the unterminated trailing anchor for doc_id%7==0)."""
    page = "'https://host' || CAST(doc_id % 6 AS VARCHAR) || '.example.org"
    return (
        f"WITH base AS (SELECT doc_id, {page}/p/' || "
        f"CAST(doc_id AS VARCHAR) AS url FROM documents) "
        "SELECT url, 0 AS rank, "
        f"{page}/nav' || CAST(doc_id % 4 AS VARCHAR) AS href, "
        "'Nav ' || CAST(doc_id % 4 AS VARCHAR) AS anchor_text, "
        "'host' || CAST(doc_id % 6 AS VARCHAR) || '.example.org' AS host "
        "FROM base "
        "UNION ALL SELECT url, 1, "
        "'https://ext' || CAST(doc_id % 5 AS VARCHAR) || "
        "'.example.com/x?q=' || CAST(doc_id % 3 AS VARCHAR), "
        "'External Link ' || CAST(doc_id % 3 AS VARCHAR), "
        "'ext' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' FROM base "
        "UNION ALL SELECT url, 2, "
        f"{page}/tail' || CAST(doc_id % 2 AS VARCHAR), 'tail', "
        "'host' || CAST(doc_id % 6 AS VARCHAR) || '.example.org' "
        "FROM base WHERE doc_id % 7 = 0")


def _pii_sql() -> str:
    """Oracle for doc_pii_redact: identical RE2 patterns applied in the
    identical order via nested regexp_replace; counts via
    regexp_extract_all on each stage's input."""
    from xtract.ops.pii import PII_RULES

    (em_name, em, em_r), (ip_name, ip, ip_r), (ph_name, ph, ph_r) = PII_RULES
    t0 = ("coalesce(text,'') || ' contact user' || "
          "CAST(doc_id % 10 AS VARCHAR) || '@mail' || "
          "CAST(doc_id % 7 AS VARCHAR) || '.example.com or +1 555 000 ' || "
          "CAST(1000 + doc_id % 9000 AS VARCHAR) || ' and host 10.0.' || "
          "CAST(doc_id % 256 AS VARCHAR) || '.' || "
          "CAST(doc_id % 100 AS VARCHAR) || ' end'")
    t1 = f"regexp_replace(t0, '{em}', '{em_r}', 'g')"
    t2 = f"regexp_replace(t1, '{ip}', '{ip_r}', 'g')"
    t3 = f"regexp_replace(t2, '{ph}', '{ph_r}', 'g')"
    return (
        f"WITH s0 AS (SELECT doc_id, {t0} AS t0 FROM documents), "
        f"s1 AS (SELECT doc_id, t0, {t1} AS t1 FROM s0), "
        f"s2 AS (SELECT doc_id, t0, t1, {t2} AS t2 FROM s1) "
        f"SELECT doc_id, {t3} AS text, "
        f"CAST(len(regexp_extract_all(t0, '{em}')) AS BIGINT) AS n_{em_name}, "
        f"CAST(len(regexp_extract_all(t1, '{ip}')) AS BIGINT) AS n_{ip_name}, "
        f"CAST(len(regexp_extract_all(t2, '{ph}')) AS BIGINT) AS n_{ph_name} "
        "FROM s2")


def _substring_dedup_sql() -> str:
    """Oracle for substring_dedup: the full pipeline recomputed in
    DuckDB — md5_number_upper token hashes mod 2^61-1, k=20 polynomial
    window hashes (HUGEINT dot product against the precomputed power
    table), canonical occurrence = min(doc_id*2^21+pos), island-merge
    of duplicated intervals via lag/sum window functions."""
    from xtract.ops.substring import BASE, MOD, POS_CAP

    k = 20
    pows = ", ".join(f"({j}, {pow(BASE, k - 1 - j, MOD)})" for j in range(k))
    variant = ("(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'alpha' "
               "WHEN 1 THEN 'beta' ELSE 'gamma' END)")
    return (
        "WITH d2 AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN "
        f"coalesce(text,'') || ' {_SHARED_PASSAGE} ' || {variant} "
        "ELSE coalesce(text,'') END AS t FROM documents), "
        "tk AS (SELECT doc_id, regexp_extract_all(lower(t), '[a-z]+') AS ws "
        "FROM d2), "
        "th AS (SELECT doc_id, i-1 AS p, "
        f"CAST(md5_number_upper(ws[i]) % {MOD} AS BIGINT) AS h, "
        "len(ws) AS n FROM tk, UNNEST(range(1, len(ws)+1)) AS u(i)), "
        f"pw(j, pj) AS (VALUES {pows}), "
        "wh AS (SELECT a.doc_id, a.p AS wp, "
        f"CAST(sum(CAST(b.h AS HUGEINT) * pw.pj) % {MOD} AS BIGINT) AS H "
        "FROM th a JOIN th b ON b.doc_id = a.doc_id "
        f"AND b.p BETWEEN a.p AND a.p + {k - 1} "
        f"JOIN pw ON pw.j = b.p - a.p WHERE a.p + {k - 1} < a.n "
        "GROUP BY a.doc_id, a.p), "
        f"own AS (SELECT H, count(*) AS n_occ, "
        f"min(doc_id * {POS_CAP} + wp) AS owner FROM wh GROUP BY H), "
        "dup AS (SELECT wh.doc_id, wh.wp FROM wh JOIN own USING (H) "
        f"WHERE own.n_occ > 1 AND wh.doc_id * {POS_CAP} + wh.wp != "
        "own.owner), "
        "fl AS (SELECT doc_id, wp, CASE WHEN lag(wp) OVER w IS NULL "
        f"OR wp > lag(wp) OVER w + {k} THEN 1 ELSE 0 END AS ni FROM dup "
        "WINDOW w AS (PARTITION BY doc_id ORDER BY wp)), "
        "isl AS (SELECT doc_id, wp, sum(ni) OVER (PARTITION BY doc_id "
        "ORDER BY wp ROWS UNBOUNDED PRECEDING) AS iid FROM fl), "
        f"cov AS (SELECT doc_id, min(wp) AS s, max(wp) + {k} AS e "
        "FROM isl GROUP BY doc_id, iid), "
        "dw AS (SELECT doc_id, count(*) AS n_dup_windows FROM dup "
        "GROUP BY doc_id), "
        "ct AS (SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS n_dup_tokens "
        "FROM cov GROUP BY doc_id) "
        "SELECT tk.doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, "
        f"CAST(greatest(len(ws) - {k - 1}, 0) AS BIGINT) AS n_windows, "
        "coalesce(d.n_dup_windows, 0) AS n_dup_windows, "
        "coalesce(c.n_dup_tokens, 0) AS n_dup_tokens "
        "FROM tk LEFT JOIN dw d USING (doc_id) LEFT JOIN ct c USING (doc_id)")


# --- MinHash oracle machinery: uint64 wraparound arithmetic in DuckDB ------
_U64 = 1 << 64
_M32 = 1 << 32
_GOLD = 0x9E3779B97F4A7C15
_MIXC2 = 0xBF58476D1CE4E5B9
_MIXC3 = 0x94D049BB133111EB
_MERS61 = (1 << 61) - 1


def _sql_mul64(x: str, c) -> str:
    """(x * c) mod 2^64 in DuckDB: hi/lo 32-bit split so every HUGEINT
    intermediate stays < 2^97."""
    return (f"CAST((((CAST({x} AS HUGEINT) // {_M32}) * {c}) % {_M32} * "
            f"{_M32} + (CAST({x} AS HUGEINT) % {_M32}) * {c}) % {_U64} "
            "AS UBIGINT)")


def _sql_add64(x: str, c) -> str:
    return f"CAST((CAST({x} AS HUGEINT) + {c}) % {_U64} AS UBIGINT)"


def _sql_xs(x: str, s: int) -> str:
    return f"xor({x}, {x} >> {s})"


def _sql_mix64(src: str, out: str, tag: str) -> list[tuple[str, str]]:
    """splitmix64 finalizer as chained column defs (== dedup._mix64)."""
    return [(f"za{tag}", _sql_add64(src, _GOLD)),
            (f"zb{tag}", _sql_mul64(_sql_xs(f"za{tag}", 30), _MIXC2)),
            (f"zc{tag}", _sql_mul64(_sql_xs(f"zb{tag}", 27), _MIXC3)),
            (out, _sql_xs(f"zc{tag}", 31))]


def _sql_chain(base: str, cols: list[tuple[str, str]], prefix: str
               ) -> tuple[list[str], str]:
    ctes, prev = [], base
    for idx, (col, expr) in enumerate(cols):
        name = f"{prefix}{idx}"
        ctes.append(f"{name} AS (SELECT *, {expr} AS {col} FROM {prev})")
        prev = name
    return ctes, prev


def _minhash_sql(char_ngrams: bool = False) -> str:
    """Oracle for minhash_dedup / ngram_dedup: the ENTIRE pipeline
    recomputed in DuckDB — md5_number_upper base hashes, splitmix64
    shingle folds (word mode) or distinct char 5-grams (ngram mode),
    the (a·h+b) wraparound-then-mod-2^61−1 permutation mins (perm
    params inlined from ``dedup._perm_params``), splitmix64 band-bucket
    folds, ≥4/5 signature-equality verify, recursive-CTE connected
    components with min labels."""
    from xtract.ops.dedup import _perm_params

    num_perm, bands, rpb = 64, 16, 4
    thr_num, thr_den = 4, 5
    umax = _U64 - 1
    a, b = _perm_params(num_perm)
    perm_rows = ", ".join(
        f"({i}, CAST({int(a[i])} AS UBIGINT), CAST({int(b[i])} AS UBIGINT))"
        for i in range(num_perm))
    variant = ("(CASE WHEN doc_id % 2 = 0 THEN 'alpha' ELSE 'beta' END)")
    doc_expr = ("SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN "
                "'shared template page content about topic ' || "
                f"CAST(doc_id % 3 AS VARCHAR) || ' with ' || {variant} || "
                "' extra tail words here' ELSE coalesce(text, '') END AS t "
                "FROM documents")
    ctes = [f"d2 AS ({doc_expr})"]
    if not char_ngrams:
        # word 3-shingles: splitmix64 fold over md5 word hashes;
        # docs shorter than one shingle fold whatever words they have
        ctes += [
            "tk AS (SELECT doc_id, regexp_extract_all(lower(t), "
            "'[a-z0-9_]+') AS ws FROM d2)",
            "w AS (SELECT doc_id, i-1 AS p, md5_number_upper(ws[i]) AS wh, "
            "len(ws) AS n FROM tk, UNNEST(range(1, len(ws)+1)) AS u(i))",
            "sw AS (SELECT doc_id, p, n, wh AS w0, "
            "lead(wh, 1) OVER win AS w1, lead(wh, 2) OVER win AS w2 FROM w "
            "WINDOW win AS (PARTITION BY doc_id ORDER BY p))",
            "shr AS (SELECT doc_id, w0, w1, w2, "
            f"CAST({_GOLD} AS UBIGINT) AS x0 FROM sw "
            "WHERE (n >= 3 AND w2 IS NOT NULL) OR (n < 3 AND p = 0))",
        ]
        c1, last = _sql_chain("shr", _sql_mix64("xor(x0, w0)", "x1", "r1"),
                              "f1_")
        ctes += c1
        c2, last = _sql_chain(last, _sql_mix64(
            "xor(x1, coalesce(w1, CAST(0 AS UBIGINT)))", "m2", "r2"), "f2_")
        ctes += c2
        ctes.append(f"g2 AS (SELECT *, CASE WHEN w1 IS NULL THEN x1 ELSE m2 "
                    f"END AS x2 FROM {last})")
        c3, last = _sql_chain("g2", _sql_mix64(
            "xor(x2, coalesce(w2, CAST(0 AS UBIGINT)))", "m3", "r3"), "f3_")
        ctes += c3
        ctes.append(f"sh AS (SELECT doc_id, CASE WHEN w2 IS NULL THEN x2 "
                    f"ELSE m3 END AS h FROM {last})")
    else:
        # distinct char 5-grams of the whitespace-collapsed text
        ctes += [
            "tn AS (SELECT doc_id, trim(regexp_replace(lower(t), "
            r"'\s+', ' ', 'g')) AS s FROM d2)",
            "sh AS (SELECT DISTINCT doc_id, md5_number_upper("
            "substr(s, i, 5)) AS h FROM tn, "
            "UNNEST(range(1, greatest(len(s) - 4, 1) + 1)) AS u(i) "
            "WHERE s != '')",
        ]
    mm = _sql_mul64("sh.h", "perms.pa")
    ctes += [
        f"perms(i, pa, pb) AS (VALUES {perm_rows})",
        "sigv AS (SELECT doc_id, i, "
        f"CAST(((CAST({mm} AS HUGEINT) + pb) % {_U64}) % {_MERS61} "
        "AS UBIGINT) AS v FROM sh, perms)",
        "sig0 AS (SELECT doc_id, i, min(v) AS s FROM sigv "
        "GROUP BY doc_id, i)",
        "sigfull AS (SELECT d.doc_id, pr.i, "
        f"coalesce(s.s, CAST({umax} AS UBIGINT)) AS s "
        "FROM (SELECT doc_id FROM d2) d "
        "CROSS JOIN (SELECT i FROM perms) pr "
        "LEFT JOIN sig0 s ON s.doc_id = d.doc_id AND s.i = pr.i)",
    ]
    s_cols = ", ".join(f"max(CASE WHEN i % {rpb} = {r} THEN s END) AS s{r}"
                       for r in range(rpb))
    ctes.append(f"bp AS (SELECT doc_id, i // {rpb} AS bidx, {s_cols} "
                f"FROM sigfull GROUP BY doc_id, i // {rpb})")
    cb, last = _sql_chain("bp", _sql_mix64("CAST(bidx AS UBIGINT)", "u0",
                                           "b0"), "h0_")
    ctes += cb
    for r in range(rpb):
        cr, last = _sql_chain(last, _sql_mix64(f"xor(u{r}, s{r})",
                                               f"u{r + 1}", f"b{r + 1}"),
                              f"h{r + 1}_")
        ctes += cr
    ctes += [
        f"bk AS (SELECT doc_id, u{rpb} AS bucket FROM {last})",
        "prs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bk x "
        "JOIN bk y ON x.bucket = y.bucket AND x.doc_id < y.doc_id)",
        "vf AS (SELECT p.a, p.b FROM prs p "
        "JOIN sigfull sa ON sa.doc_id = p.a "
        "JOIN sigfull sb ON sb.doc_id = p.b AND sb.i = sa.i "
        "GROUP BY p.a, p.b "
        f"HAVING sum(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) * {thr_den} "
        f">= {thr_num} * {num_perm})",
        "edges AS (SELECT a, b FROM vf UNION SELECT b, a FROM vf)",
        "reach(s, d) AS (SELECT a, b FROM edges UNION "
        "SELECT r.s, e.b FROM reach r JOIN edges e ON r.d = e.a)",
        "lbl AS (SELECT s AS doc_id, least(min(d), s) AS cl "
        "FROM reach GROUP BY s)",
    ]
    return ("WITH RECURSIVE " + ", ".join(ctes) +
            " SELECT d2.doc_id, CAST(coalesce(l.cl, d2.doc_id) AS BIGINT) "
            "AS cluster_id FROM d2 LEFT JOIN lbl l ON d2.doc_id = l.doc_id")


def _stopword_sql() -> str:
    """Oracle for doc_stopword_counts: the English stopword table is
    embedded as a VALUES list built from the SAME source table the Ray
    op uses (xtract.langdetect.STOPWORDS) — one definition, two
    engines."""
    from xtract.langdetect import STOPWORDS

    words = ", ".join(f"('{w}')" for w in sorted(STOPWORDS["en"]))
    return (
        "WITH stop(w) AS (VALUES " + words + "), "
        "toks AS (SELECT doc_id, unnest(regexp_split_to_array("
        "lower(coalesce(text,'')), '[^a-z]+')) AS token FROM documents), "
        "tk AS (SELECT doc_id, token FROM toks WHERE token != ''), "
        "agg AS (SELECT doc_id, count(*) AS n_words_az, "
        "CAST(sum(CASE WHEN token IN (SELECT w FROM stop) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_stopwords FROM tk GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(a.n_words_az, 0) AS n_words_az, "
        "coalesce(a.n_stopwords, 0) AS n_stopwords "
        "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id")


def oracle_sql() -> dict[str, str]:
    return {
        "doc_lang_histogram":
            "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang",
        "doc_source_stats":
            "SELECT source, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
            "min(n_chars) AS min_chars, max(n_chars) AS max_chars "
            "FROM documents GROUP BY source",
        "doc_token_stats":
            f"SELECT doc_id, "
            f"CASE WHEN trim(coalesce(text,''), {_TRIM}) = '' THEN 0 "
            f"ELSE len(regexp_split_to_array(trim(coalesce(text,''), {_TRIM}), "
            f"'[ \t\n\r]+')) END AS n_tokens, "
            "length(regexp_replace(coalesce(text,''), '[^A-Za-z]', '', 'g')) AS n_alpha, "
            "length(regexp_replace(coalesce(text,''), '[^0-9]', '', 'g')) AS n_digit, "
            "length(regexp_replace(coalesce(text,''), '[^.!?,;:]', '', 'g')) AS n_punct, "
            "length(regexp_replace(coalesce(text,''), '[^A-Z]', '', 'g')) AS n_upper "
            "FROM documents",
        "doc_fingerprint":
            "SELECT doc_id, md5(coalesce(text,'')) AS fingerprint FROM documents",
        "doc_exact_dedup":
            "SELECT min(doc_id) AS doc_id, count(*) AS n_dups "
            "FROM documents GROUP BY md5(coalesce(text,''))",
        "events_by_type":
            "SELECT event_type, count(*) AS n_events, "
            "round(sum(value), 2) AS total_value FROM events GROUP BY event_type",
        "events_daily":
            "SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events "
            "FROM events GROUP BY 1",
        "lineitem_pricing":
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus",
        "top_customers":
            "SELECT o_custkey AS c_custkey, c_name, "
            "round(sum(o_totalprice), 2) AS total_spend, count(*) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY o_custkey, c_name "
            "ORDER BY round(sum(o_totalprice), 2) DESC, c_custkey LIMIT 10",
        "part_brand_stats":
            "SELECT p_brand, count(*) AS n_parts, "
            "round(avg(p_retailprice), 2) AS avg_price, "
            "CAST(max(p_size) AS BIGINT) AS max_size "
            "FROM part GROUP BY p_brand",
        "supplier_nation":
            "SELECT n_name, count(*) AS n_suppliers FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name",
        "orders_priority_histogram":
            "SELECT o_orderpriority, count(*) AS n_orders FROM orders "
            "GROUP BY o_orderpriority",
        "discount_revenue":
            "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, "
            "count(*) AS n_rows FROM lineitem "
            "WHERE l_discount >= 0.05 AND l_quantity < 24.0",
        "nation_customer_balance":
            "SELECT n_name, count(*) AS n_customers, "
            "round(sum(c_acctbal), 2) AS total_balance FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name",
        "events_hourly_by_type":
            "SELECT strftime(ts, '%Y-%m-%d %H:00') AS window, event_type, "
            "count(*) AS n_events, round(sum(value), 2) AS total_value "
            "FROM events GROUP BY 1, 2",
        "user_running_total":
            "SELECT user_id, event_id, "
            "row_number() OVER w AS seq, "
            "round(sum(value) OVER w, 2) AS running_value FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING)",
        "last_order_before_event":
            "SELECT e.event_id, "
            "(SELECT strftime(max(o.o_orderdate), '%Y-%m-%d') FROM orders o "
            "WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) "
            "AS last_order_date FROM events e",
        "last_order_before_event_cogroup":
            "SELECT e.event_id, "
            "(SELECT strftime(max(o.o_orderdate), '%Y-%m-%d') FROM orders o "
            "WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) "
            "AS last_order_date FROM events e",
        "user_sessions":
            "WITH marked AS (SELECT user_id, event_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END "
            "AS new_s FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "sess AS (SELECT user_id, "
            "CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM marked) "
            "SELECT user_id, session_id, count(*) AS n_events "
            "FROM sess GROUP BY user_id, session_id",
        "event_gaps":
            "SELECT user_id, event_id, "
            "CAST(coalesce(epoch_us(ts) - epoch_us(lag(ts) OVER w), -1) "
            "AS BIGINT) AS gap_prev_us, "
            "CAST(coalesce(epoch_us(lead(ts) OVER w) - epoch_us(ts), -1) "
            "AS BIGINT) AS gap_next_us FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
        "user_rolling_window":
            "SELECT user_id, event_id, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) "
            "AS roll_sum_cents, "
            "CAST(count(*) OVER w AS BIGINT) AS n_in_window FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)",
        "source_doc_cap":
            "SELECT doc_id, source, n_chars FROM ("
            "SELECT doc_id, source, n_chars, row_number() OVER ("
            "PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn "
            "FROM documents) WHERE rn <= 5",
        "target_anchor_stats":
            f"WITH links AS ({_page_outlinks_sql()}) "
            "SELECT href AS target, CAST(count(*) AS BIGINT) AS n_links, "
            "CAST(count(DISTINCT url) AS BIGINT) AS n_pages, "
            "array_to_string(list_sort(list(DISTINCT anchor_text)), '|') "
            "AS anchors FROM links GROUP BY href",
        "doc_exact_dedup_best":
            "SELECT doc_id, source FROM ("
            "SELECT doc_id, source, row_number() OVER ("
            "PARTITION BY md5(coalesce(text,'')) ORDER BY source, doc_id) "
            "AS rn FROM documents) WHERE rn = 1",
        "doc_normalize":
            "WITH dirty AS (SELECT doc_id, coalesce(text,'') || ' cafe' || "
            "chr(769) || chr(160) || 'x' || chr(8203) || 'y' || chr(13) || "
            "chr(10) || ' tail' || chr(65279) || '  ' AS t0 FROM documents), "
            "n1 AS (SELECT doc_id, t0, nfc_normalize(t0) AS t1 FROM dirty), "
            "n2 AS (SELECT doc_id, t0, replace(replace(replace(replace(t1, "
            "chr(8203), ''), chr(8204), ''), chr(8205), ''), chr(65279), '') "
            "AS t2 FROM n1), "
            "n3 AS (SELECT doc_id, t0, replace(t2, chr(160), ' ') AS t3 "
            "FROM n2), "
            "n4 AS (SELECT doc_id, t0, trim(regexp_replace(t3, "
            "'[ \\t\\r\\n\\x0B\\x0C]+', ' ', 'g'), ' ') AS text FROM n3) "
            "SELECT doc_id, text, text != t0 AS changed FROM n4",
        "events_rollup":
            "WITH base AS (SELECT event_type, strftime(ts, '%Y-%m-%d') "
            "AS day, CAST(round(value*100) AS BIGINT) AS cents FROM events) "
            "SELECT coalesce(event_type, 'ALL') AS event_type, "
            "coalesce(day, 'ALL') AS day, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(sum(cents) AS BIGINT) AS total_cents "
            "FROM base GROUP BY ROLLUP(event_type, day)",
        "event_type_anomalies":
            "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
            "count(*) AS n_events FROM events GROUP BY 1, 2), "
            "t AS (SELECT event_type, sum(n_events) AS total, "
            "count(*) AS n_days FROM d GROUP BY 1) "
            "SELECT d.event_type, d.day, CAST(d.n_events AS BIGINT) "
            "AS n_events FROM d JOIN t USING (event_type) "
            "WHERE 5 * d.n_events * t.n_days > 6 * t.total",
        "knn_ivf_int": _ivf_int_sql(),
        "fuzzy_title_match": _fuzzy_sql(),
        "page_tables": _page_tables_sql(),
        "page_headings": _page_headings_sql(),
        "page_forms": _page_forms_sql(),
        "page_images": _page_images_sql(),
        "host_components":
            # the thirty chains' components are the mod-30 residue
            # classes, so the expected label is provably node % 30 —
            # the planted construction makes the CC fixpoint
            # closed-form (every node 0..96 is an edge endpoint)
            "WITH hosts AS (SELECT DISTINCT doc_id % 97 AS node "
            "FROM documents) "
            "SELECT CAST(node AS BIGINT) AS node, "
            "CAST(node % 30 AS BIGINT) AS label FROM hosts",
        "host_crawl_depth": _crawl_depth_sql(),
        "host_k_core": _k_core_sql(),
        "doc_phrase_search": _phrase_search_sql(),
        "entity_cooccurrence": _entity_cooc_sql(),
        "orders_fd_audit": _fd_audit_sql(),
        "host_homographs": _homograph_sql(),
        "feed_entries": _feed_entries_sql(),
        "page_media": _page_media_sql(),
        "site_doc_counts": _site_counts_sql(),
        "doc_set_containment": _containment_sql(),
        "event_type_rules": _assoc_rules_sql(),
        "host_neighbor_features": _neighbor_features_sql(),
        "host_pagerank_weighted": _pagerank_weighted_sql(),
        "user_freshness_score":
            "WITH ref AS (SELECT MAX(epoch_us(ts)) AS r FROM events) "
            "SELECT user_id, CAST(SUM(CAST(1 AS BIGINT) << "
            "(30 - LEAST(((SELECT r FROM ref) - epoch_us(ts)) "
            "// 86400000000, 30))) AS BIGINT) AS decayed, "
            "COUNT(*) AS n_rows FROM events "
            "GROUP BY user_id ORDER BY user_id",
        "user_event_paths":
            "SELECT user_id, string_agg(event_type, '|' "
            "ORDER BY ts, event_id) AS path, "
            "COUNT(*) AS n_items FROM events "
            "GROUP BY user_id ORDER BY user_id",
        "customers_no_events_except":
            "SELECT c_custkey FROM customer "
            "EXCEPT SELECT user_id AS c_custkey FROM events "
            "ORDER BY c_custkey",
        "events_users_intersect":
            "SELECT user_id FROM events "
            "INTERSECT SELECT c_custkey AS user_id FROM customer "
            "ORDER BY user_id",
        "events_pseudonymized":
            "SELECT event_id, sha256('corpus1' || "
            "CAST(user_id AS VARCHAR)) AS user_id FROM events",
        "orders_sorted_join":
            "SELECT o.o_orderkey, o.o_custkey, c.c_custkey, "
            "c.c_nationkey FROM orders o JOIN customer c "
            "ON o.o_custkey = c.c_custkey",
        "lineitem_unpivot": _lineitem_unpivot_sql(),
        "user_event_breadth":
            "WITH f AS (SELECT user_id, ts, event_id, "
            "CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, "
            "event_type ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END "
            "AS first_flag FROM events) "
            "SELECT user_id, event_id, CAST(SUM(first_flag) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS n_distinct_so_far FROM f",
        "url_change_rate":
            "WITH h AS (SELECT CAST(doc_id % 50 AS BIGINT) AS url_id, "
            "CAST(doc_id AS BIGINT) AS ts, "
            "CAST(((doc_id // 50) // (1 + (doc_id % 50) % 3)) % 4 "
            "AS BIGINT) AS fp FROM documents), "
            "l AS (SELECT url_id, fp, LAG(fp) OVER "
            "(PARTITION BY url_id ORDER BY ts, fp) AS pfp FROM h), "
            "g AS (SELECT url_id, COUNT(*) AS n_obs, "
            "SUM(CASE WHEN pfp IS NOT NULL AND fp <> pfp "
            "THEN 1 ELSE 0 END) AS n_changes FROM l GROUP BY url_id) "
            "SELECT url_id, n_obs, CAST(n_changes AS BIGINT) AS n_changes, "
            "CAST(CASE WHEN n_obs = 1 THEN 0 ELSE "
            "1000000 * n_changes // (n_obs - 1) END AS BIGINT) "
            "AS change_rate_ppm "
            "FROM g ORDER BY url_id",
        "host_scc":
            # the planted construction makes the SCC fixpoint
            # closed-form: each present block's 3-cycle is one SCC
            # labeled by its min member 3b; dangling bridge targets
            # are singletons whose own id is also 3*(node//3)
            "WITH hs AS (SELECT DISTINCT "
            "CAST((doc_id % 90) // 3 AS BIGINT) AS b FROM documents), "
            "n AS (SELECT b * 3 + o AS node FROM hs, "
            "(VALUES (0), (1), (2)) t(o) "
            "UNION SELECT b * 3 + 3 FROM hs WHERE b < 29) "
            "SELECT node, (node // 3) * 3 AS scc_label FROM n "
            "ORDER BY node",
        "events_stream_enrich":
            "SELECT e.event_id, e.user_id, c.c_nationkey "
            "FROM events e LEFT JOIN customer c "
            "ON e.user_id = c.c_custkey",
        "host_robots_filter":
            # closed-form replay of the planted construction: even
            # hosts carry an agent-specific xbot group (Allow / wins
            # everywhere except the /x{h}/ prefix); odd hosts fall back
            # to the * group (deny /p{h}/ and /tmp, Allow /p{h}/pub/
            # overrides by longest match)
            "WITH p AS (SELECT doc_id, doc_id % 7 AS h, doc_id % 5 AS r "
            "FROM documents), "
            "pp AS (SELECT doc_id, h, r, CASE r "
            "WHEN 0 THEN '/a/' || CAST(doc_id AS VARCHAR) "
            "WHEN 1 THEN '/p' || CAST(h AS VARCHAR) || '/x/' || "
            "CAST(doc_id AS VARCHAR) "
            "WHEN 2 THEN '/p' || CAST(h AS VARCHAR) || '/pub/' || "
            "CAST(doc_id AS VARCHAR) "
            "WHEN 3 THEN '/tmp' || CAST(doc_id AS VARCHAR) "
            "ELSE '/x' || CAST(h AS VARCHAR) || '/' || "
            "CAST(doc_id AS VARCHAR) END AS path FROM p) "
            "SELECT 'https://r' || CAST(h AS VARCHAR) || '.example.org' "
            "|| path AS url, "
            "'r' || CAST(h AS VARCHAR) || '.example.org' AS host, path, "
            "CASE WHEN h % 2 = 0 THEN r <> 4 "
            "ELSE r NOT IN (1, 3) END AS crawl_allowed FROM pp",
        "doc_sentences":
            "WITH src AS (SELECT doc_id, CASE doc_id % 4 "
            "WHEN 0 THEN 'Alpha ' || CAST(doc_id AS VARCHAR) || '. Beta ' "
            "|| CAST(doc_id % 9 AS VARCHAR) || '!! Gamma? tail' "
            "WHEN 1 THEN '...' || CAST(doc_id AS VARCHAR) || ' leading' "
            "WHEN 2 THEN 'One sentence ' || CAST(doc_id AS VARCHAR) "
            "ELSE 'Tail spaces ' || CAST(doc_id AS VARCHAR) || '.   ' "
            "END AS text FROM documents), "
            "t AS (SELECT doc_id, regexp_extract_all(text, "
            "'[^.!?]+[.!?]*') AS ss FROM src), "
            "idx AS (SELECT unnest(range(8)) AS c) "
            "SELECT doc_id, CAST(c AS BIGINT) AS sent_idx, "
            f"trim(ss[c+1], {_TRIM} || chr(12) || chr(11)) AS sentence, "
            f"CAST(length(trim(ss[c+1], {_TRIM} || chr(12) || chr(11))) "
            "AS BIGINT) AS n_chars "
            "FROM t, idx WHERE c < len(ss)",
        "host_reciprocal_links":
            # replay: edges h{d%4} → h{(d+2)%4} (mutual 0↔2, 1↔3) plus
            # one-way h{d%4} → ow{d%3}.example.net; self-links impossible
            "WITH e AS ("
            "SELECT DISTINCT 'h' || CAST(doc_id % 4 AS VARCHAR) || "
            "'.example.org' AS src, 'h' || CAST((doc_id + 2) % 4 "
            "AS VARCHAR) || '.example.org' AS dst FROM documents "
            "UNION SELECT DISTINCT 'h' || CAST(doc_id % 4 AS VARCHAR) || "
            "'.example.org', 'ow' || CAST(doc_id % 3 AS VARCHAR) || "
            "'.example.net' FROM documents), "
            "p AS (SELECT least(src, dst) AS host_a, "
            "greatest(src, dst) AS host_b, "
            "max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS f, "
            "max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS w "
            "FROM e GROUP BY 1, 2) "
            "SELECT host_a, host_b FROM p WHERE f = 1 AND w = 1",
        "anchor_text_profile": _anchor_profile_sql(),
        "page_lists": _page_lists_sql(),
        "page_code_blocks": _page_code_sql(),
        "host_link_jaccard": _host_link_jaccard_sql(),
        "orders_monthly_share":
            "WITH c AS (SELECT strftime(o_orderdate, '%Y-%m') AS month, "
            "o_orderpriority AS priority, count(*) AS n FROM orders "
            "GROUP BY 1, 2) "
            "SELECT month, priority, CAST(n AS BIGINT) AS share_num, "
            "CAST(sum(n) OVER (PARTITION BY month) AS BIGINT) "
            "AS share_den FROM c",
        "part_copurchase":
            "WITH d AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
            "FROM lineitem), pr AS (SELECT a.p AS p1, b.p AS p2, "
            "count(*) AS n_orders FROM d a JOIN d b ON a.o = b.o "
            "AND a.p < b.p GROUP BY 1, 2) "
            "SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2, "
            "CAST(n_orders AS BIGINT) AS n_orders FROM pr "
            "ORDER BY n_orders DESC, p1, p2 LIMIT 20",
        "small_quantity_revenue":
            "WITH bp AS (SELECT p_partkey FROM part "
            "WHERE p_brand = 'Brand#13'), "
            "l AS (SELECT l_partkey AS pk, "
            "CAST(round(l_quantity) AS BIGINT) AS q, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents "
            "FROM lineitem JOIN bp ON l_partkey = p_partkey), "
            "a AS (SELECT pk, sum(q) AS sq, count(*) AS cnt "
            "FROM l GROUP BY 1) "
            "SELECT CAST(coalesce(sum(cents), 0) AS BIGINT) "
            "AS revenue_cents, CAST(count(*) AS BIGINT) AS n_small "
            "FROM l JOIN a USING (pk) WHERE 5 * l.q * a.cnt < a.sq",
        "high_balance_inactive":
            "WITH pos AS (SELECT c_custkey, c_nationkey, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS cents "
            "FROM customer WHERE c_acctbal > 0), "
            "t AS (SELECT sum(cents) AS s, count(*) AS n FROM pos), "
            "f AS (SELECT * FROM pos WHERE "
            "cents * (SELECT n FROM t) > (SELECT s FROM t) "
            "AND NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey "
            "AND o_orderdate >= DATE '2000-01-01')) "
            "SELECT CAST(c_nationkey AS BIGINT) AS nationkey, "
            "CAST(count(*) AS BIGINT) AS n_customers, "
            "CAST(sum(cents) AS BIGINT) AS acctbal_cents "
            "FROM f GROUP BY 1 ORDER BY 1",
        "part_revenue_share":
            "WITH r AS (SELECT l_partkey, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS rev "
            "FROM lineitem GROUP BY 1), "
            "t AS (SELECT sum(rev) AS total FROM r) "
            "SELECT CAST(l_partkey AS BIGINT) AS l_partkey, "
            "CAST(rev AS BIGINT) AS revenue_micro FROM r "
            "WHERE 2500 * rev > (SELECT total FROM t) "
            "ORDER BY revenue_micro DESC, l_partkey",
        "promo_revenue_share":
            "SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN micro "
            "ELSE 0 END) AS BIGINT) AS promo_micro, "
            "CAST(sum(micro) AS BIGINT) AS total_micro FROM "
            "(SELECT l_partkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(10000 - CAST(round(l_discount * 10000) AS BIGINT)) AS micro "
            "FROM lineitem WHERE l_shipdate >= DATE '1997-01-01' "
            "AND l_shipdate < DATE '1998-01-01') l "
            "JOIN part ON l_partkey = p_partkey",
        "daily_new_users":
            "WITH f AS (SELECT user_id, "
            "min(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) "
            "AS first_day FROM events GROUP BY 1) "
            "SELECT CAST(first_day AS BIGINT) AS first_day, "
            "CAST(count(*) AS BIGINT) AS n_new "
            "FROM f GROUP BY 1 ORDER BY 1",
        "daily_churned_users":
            "WITH um AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS m FROM events), "
            "mx AS (SELECT max(m) AS last FROM um) "
            "SELECT CAST(m AS BIGINT) AS epoch_day, "
            "CAST(count(*) AS BIGINT) AS n_churned "
            "FROM um a, mx WHERE m < last AND NOT EXISTS "
            "(SELECT 1 FROM um b WHERE b.user_id = a.user_id "
            "AND b.m = a.m + 1) GROUP BY 1 ORDER BY 1",
        "users_all_event_types":
            "SELECT CAST(count(*) AS BIGINT) AS n_users FROM "
            "(SELECT user_id FROM events GROUP BY 1 "
            "HAVING count(DISTINCT event_type) = "
            "(SELECT count(DISTINCT event_type) FROM events))",
        "order_priority_mix_shift":
            "WITH g AS (SELECT year(o_orderdate) AS y, "
            "o_orderpriority AS p, count(*) AS n "
            "FROM orders GROUP BY 1, 2) "
            "SELECT CAST(y AS BIGINT) AS o_year, "
            "p AS o_orderpriority, CAST(n AS BIGINT) AS n_orders, "
            "CAST(sum(n) OVER (PARTITION BY y) AS BIGINT) "
            "AS year_total FROM g ORDER BY 1, 2",
        "orders_pareto_frontier":
            "WITH p AS (SELECT datediff('day', DATE '1970-01-01', "
            "o_orderdate) AS day, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents "
            "FROM orders), "
            "g AS (SELECT day, max(cents) AS cents FROM p GROUP BY 1), "
            "f AS (SELECT day, cents, max(cents) OVER (ORDER BY day "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS prevmax FROM g) "
            "SELECT CAST(day AS BIGINT) AS order_day, "
            "CAST(cents AS BIGINT) AS totalprice_cents FROM f "
            "WHERE prevmax IS NULL OR cents > prevmax ORDER BY 1",
        "customer_repeat_rate_by_segment":
            "WITH x AS (SELECT c_custkey, c_mktsegment, "
            "count(o_orderkey) AS n FROM customer "
            "LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1, 2) "
            "SELECT c_mktsegment, "
            "CAST(count(*) AS BIGINT) AS n_customers, "
            "CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_repeat FROM x GROUP BY 1 ORDER BY 1",
        "events_anomalous_users":
            "WITH u AS (SELECT user_id, count(*) AS n FROM events "
            "GROUP BY 1), "
            "m AS (SELECT quantile_disc(n, 0.5) AS med FROM u) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(n AS BIGINT) AS n_events FROM u, m "
            "WHERE 5 * n > 6 * med ORDER BY user_id",
        "event_value_first_digit":
            "SELECT substr(CAST(CAST(round(value * 100) AS BIGINT) "
            "AS VARCHAR), 1, 1) AS first_digit, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY 1 ORDER BY 1",
        "event_type_user_overlap":
            "WITH d AS (SELECT DISTINCT user_id, event_type "
            "FROM events) "
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "CAST(count(*) AS BIGINT) AS n_users "
            "FROM d a JOIN d b ON b.user_id = a.user_id "
            "AND b.event_type >= a.event_type "
            "GROUP BY 1, 2 ORDER BY 1, 2",
        "lineitem_tax_discount_grid":
            "SELECT CAST(CAST(round(l_tax * 10000) AS BIGINT) // 200 "
            "AS BIGINT) AS tax_band, "
            "CAST(CAST(round(l_discount * 10000) AS BIGINT) // 200 "
            "AS BIGINT) AS discount_band, "
            "CAST(count(*) AS BIGINT) AS n_items, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS cents "
            "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2",
        "nation_order_count_moments":
            "WITH x AS (SELECT c_custkey, "
            "CAST(c_nationkey AS BIGINT) AS nk, "
            "count(o_orderkey) AS x FROM customer "
            "LEFT JOIN orders ON o_custkey = c_custkey GROUP BY 1, 2) "
            "SELECT nk AS nationkey, "
            "CAST(count(*) AS BIGINT) AS n_customers, "
            "CAST(sum(x) AS BIGINT) AS sum_orders, "
            "CAST(sum(x * x) AS BIGINT) AS sum_orders_sq "
            "FROM x GROUP BY 1 ORDER BY 1",
        "event_type_peak_rate":
            "SELECT a.event_type, CAST(max(c) AS BIGINT) "
            "AS peak_events FROM (SELECT a.event_type, a.event_id, "
            "count(*) AS c FROM events a JOIN events b "
            "ON b.event_type = a.event_type AND b.ts >= a.ts "
            "AND b.ts < a.ts + INTERVAL 1 HOUR "
            "GROUP BY 1, 2) a GROUP BY 1 ORDER BY 1",
        "orders_rolling_3mo_revenue":
            "WITH m AS (SELECT year(o_orderdate) AS y, "
            "month(o_orderdate) AS mo, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS r "
            "FROM orders GROUP BY 1, 2) "
            "SELECT CAST(y AS BIGINT) AS o_year, "
            "CAST(mo AS BIGINT) AS o_month, "
            "CAST(r AS BIGINT) AS revenue_cents, "
            "CAST(sum(r) OVER (ORDER BY y, mo "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS rolling3_cents FROM m ORDER BY 1, 2",
        "orders_weekday_profile":
            "SELECT CAST((datediff('day', DATE '1970-01-01', "
            "o_orderdate) + 3) % 7 AS BIGINT) AS weekday, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents "
            "FROM orders GROUP BY 1 ORDER BY 1",
        "returns_rate_by_month":
            "SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year, "
            "CAST(month(l_shipdate) AS BIGINT) AS ship_month, "
            "CAST(count(*) AS BIGINT) AS n_items, "
            "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_returned, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS cents, "
            "CAST(sum(CASE WHEN l_returnflag = 'R' THEN "
            "CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) "
            "AS BIGINT) AS returned_cents "
            "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2",
        "order_fulfillment_lag":
            "WITH f AS (SELECT l_orderkey, "
            "min(datediff('day', DATE '1970-01-01', l_shipdate)) "
            "AS sd FROM lineitem GROUP BY 1) "
            "SELECT o_orderpriority, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(sd - datediff('day', DATE '1970-01-01', "
            "o_orderdate)) AS BIGINT) AS sum_days, "
            "CAST(min(sd - datediff('day', DATE '1970-01-01', "
            "o_orderdate)) AS BIGINT) AS min_days, "
            "CAST(max(sd - datediff('day', DATE '1970-01-01', "
            "o_orderdate)) AS BIGINT) AS max_days "
            "FROM orders JOIN f ON l_orderkey = o_orderkey "
            "GROUP BY 1 ORDER BY 1",
        "user_path_signatures":
            "WITH r AS (SELECT user_id, event_type, row_number() "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn "
            "FROM events), "
            "s AS (SELECT user_id, string_agg(event_type, '>' "
            "ORDER BY rn) AS sig FROM r WHERE rn <= 5 GROUP BY 1) "
            "SELECT sig, CAST(count(*) AS BIGINT) AS n_users "
            "FROM s GROUP BY 1 ORDER BY n_users DESC, sig LIMIT 20",
        "event_time_weighted_value":
            "WITH g AS (SELECT CAST(round(value * 100) AS BIGINT) "
            "AS c, date_diff('microsecond', ts, lead(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id)) AS gap "
            "FROM events) "
            "SELECT CAST(sum(gap::HUGEINT * c) AS BIGINT) AS twv_num, "
            "CAST(sum(gap) AS BIGINT) AS twv_den "
            "FROM g WHERE gap IS NOT NULL",
        "doc_tree_rollup":
            "WITH RECURSIVE anc(node, a) AS ("
            "SELECT doc_id, doc_id FROM documents "
            "UNION ALL SELECT node, a // 4 FROM anc WHERE a != 0) "
            "SELECT CAST(a AS BIGINT) AS doc_id, "
            "CAST(sum(n_chars) AS BIGINT) AS subtree_chars, "
            "CAST(count(*) AS BIGINT) AS n_desc "
            "FROM anc JOIN documents d ON d.doc_id = anc.node "
            "GROUP BY 1 ORDER BY 1",
        "part_popularity_gini":
            "WITH x AS (SELECT count(*) AS x FROM lineitem "
            "GROUP BY l_partkey), "
            "r AS (SELECT x, row_number() OVER (ORDER BY x) AS i "
            "FROM x) "
            "SELECT CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) "
            "AS BIGINT) AS gini_num, "
            "CAST(count(*) * sum(x) AS BIGINT) AS gini_den, "
            "CAST(count(*) AS BIGINT) AS n_parts FROM r",
        "customer_revenue_concentration":
            "WITH s AS (SELECT o_custkey AS ck, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1), "
            "r AS (SELECT cents, row_number() OVER "
            "(ORDER BY cents DESC, ck) AS rn FROM s), "
            "n AS (SELECT count(*) AS n, sum(cents) AS total FROM s) "
            "SELECT CAST(p AS BIGINT) AS pct, "
            "CAST(ceil((SELECT n FROM n) * p / 100.0) AS BIGINT) "
            "AS top_n, "
            "CAST((SELECT sum(cents) FROM r WHERE rn <= "
            "ceil((SELECT n FROM n) * p / 100.0)) AS BIGINT) "
            "AS top_cents, "
            "CAST((SELECT total FROM n) AS BIGINT) AS total_cents "
            "FROM (VALUES (1), (5), (10)) AS t(p) ORDER BY p",
        "big_spender_customers":
            "SELECT CAST(o_custkey AS BIGINT) AS c_custkey, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS min_cents FROM orders GROUP BY 1 "
            "HAVING min(CAST(round(o_totalprice * 100) AS BIGINT)) "
            ">= 5000000 AND count(*) >= 3 ORDER BY 1",
        "source_token_divergence":
            "WITH toks AS (SELECT source, unnest("
            "regexp_split_to_array(lower(coalesce(text,'')), "
            "'[^a-z]+')) AS token FROM documents "
            "WHERE source IN ('src0', 'src1')), "
            "c AS (SELECT token, "
            "sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS n_a, "
            "sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS n_b "
            "FROM toks WHERE token != '' GROUP BY 1), "
            "t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, "
            "count(*) AS v FROM c) "
            "SELECT token, CAST(n_a AS BIGINT) AS n_a, "
            "CAST(n_b AS BIGINT) AS n_b, "
            "CAST(((n_a + 1)::HUGEINT * ((SELECT tb FROM t) + "
            "(SELECT v FROM t)) * 1000000) // ((n_b + 1) * "
            "((SELECT ta FROM t) + (SELECT v FROM t))) AS BIGINT) "
            "AS ratio_ppm FROM c "
            "ORDER BY ratio_ppm DESC, token LIMIT 20",
        "segment_nation_contingency":
            "WITH g AS (SELECT c_mktsegment, "
            "CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "count(*) AS n FROM customer GROUP BY 1, 2) "
            "SELECT c_mktsegment, c_nationkey, CAST(n AS BIGINT) AS n, "
            "CAST(sum(n) OVER (PARTITION BY c_mktsegment) AS BIGINT) "
            "AS row_total, "
            "CAST(sum(n) OVER (PARTITION BY c_nationkey) AS BIGINT) "
            "AS col_total, "
            "CAST(sum(n) OVER () AS BIGINT) AS grand_total "
            "FROM g ORDER BY c_mktsegment, c_nationkey",
        "url_redirect_chains":
            # closed form of the planted redirect map (src iff
            # d % 8 != 0, target d-1): final = d - d%8, hops = d%8
            "SELECT doc_id, CAST(doc_id - doc_id % 8 AS BIGINT) "
            "AS final_doc, CAST(doc_id % 8 AS BIGINT) AS hops "
            "FROM documents WHERE doc_id % 8 != 0 ORDER BY doc_id",
        "parts_never_ordered":
            "SELECT CAST(p_partkey AS BIGINT) AS p_partkey FROM part "
            "WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem "
            "WHERE l_shipdate >= DATE '1996-01-01' "
            "AND l_shipdate < DATE '1996-07-01') ORDER BY 1",
        "supplier_balance_pct_rank":
            "SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, "
            "CAST(s_nationkey AS BIGINT) AS n_nationkey, "
            "CAST(rank() OVER (PARTITION BY s_nationkey "
            "ORDER BY CAST(round(s_acctbal * 100) AS BIGINT)) - 1 "
            "AS BIGINT) AS rank_num, "
            "CAST(count(*) OVER (PARTITION BY s_nationkey) - 1 "
            "AS BIGINT) AS rank_den "
            "FROM supplier ORDER BY s_suppkey",
        "doc_simpson_diversity":
            "WITH toks AS (SELECT doc_id, unnest("
            "regexp_split_to_array(lower(coalesce(text,'')), "
            "'[^a-z]+')) AS token FROM documents), "
            "c AS (SELECT doc_id, token, count(*) AS n FROM toks "
            "WHERE token != '' GROUP BY 1, 2) "
            "SELECT doc_id, CAST(sum(n * (n - 1)) AS BIGINT) AS num, "
            "CAST(sum(n) * (sum(n) - 1) AS BIGINT) AS den "
            "FROM c GROUP BY 1 HAVING sum(n) >= 2 ORDER BY 1",
        "bigram_coverage":
            "WITH toks AS (SELECT doc, tok, row_number() OVER "
            "(PARTITION BY doc ORDER BY pos) AS rn FROM ("
            "SELECT doc_id AS doc, unnest(regexp_split_to_array(lower("
            "coalesce(text,'')), '[^a-z]+')) AS tok, "
            "unnest(range(1, len(regexp_split_to_array(lower("
            "coalesce(text,'')), '[^a-z]+')) + 1)) AS pos "
            "FROM documents) WHERE tok != ''), "
            "bi AS (SELECT t1.tok AS a, t2.tok AS b, count(*) AS c_ab "
            "FROM toks t1 JOIN toks t2 ON t2.doc = t1.doc "
            "AND t2.rn = t1.rn + 1 GROUP BY 1, 2), "
            "h AS (SELECT c_ab FROM bi "
            "ORDER BY c_ab DESC, a, b LIMIT 100) "
            "SELECT CAST((SELECT sum(c_ab) FROM h) AS BIGINT) "
            "AS covered_n, "
            "CAST((SELECT sum(c_ab) FROM bi) AS BIGINT) AS total_n",
        "doc_hapax_stats":
            "WITH toks AS (SELECT unnest(regexp_split_to_array(lower("
            "coalesce(text,'')), '[^a-z]+')) AS token FROM documents), "
            "uni AS (SELECT token, count(*) AS c FROM toks "
            "WHERE token != '' GROUP BY 1) "
            "SELECT CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_hapax, "
            "CAST(count(*) AS BIGINT) AS n_vocab, "
            "CAST(sum(c) AS BIGINT) AS n_tokens FROM uni",
        "orders_yoy_growth":
            "WITH y AS (SELECT year(o_orderdate) AS y, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS r "
            "FROM orders GROUP BY 1) "
            "SELECT CAST(y AS BIGINT) AS o_year, "
            "CAST(r AS BIGINT) AS revenue_cents, "
            "CAST(lag(r) OVER (ORDER BY y) AS BIGINT) "
            "AS prev_revenue_cents, "
            "CAST(r - lag(r) OVER (ORDER BY y) AS BIGINT) "
            "AS delta_cents FROM y "
            "QUALIFY lag(r) OVER (ORDER BY y) IS NOT NULL ORDER BY 1",
        "events_daily_distinct_users":
            "SELECT strftime(ts, '%Y-%m-%d') AS day, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1 ORDER BY 1",
        "lineitem_decile_revenue":
            "WITH m AS (SELECT "
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(10000 - CAST(round(l_discount * 10000) AS BIGINT)) "
            "AS micro FROM lineitem), "
            "t AS (SELECT quantile_disc(micro, 0.1) AS t1, "
            "quantile_disc(micro, 0.2) AS t2, "
            "quantile_disc(micro, 0.3) AS t3, "
            "quantile_disc(micro, 0.4) AS t4, "
            "quantile_disc(micro, 0.5) AS t5, "
            "quantile_disc(micro, 0.6) AS t6, "
            "quantile_disc(micro, 0.7) AS t7, "
            "quantile_disc(micro, 0.8) AS t8, "
            "quantile_disc(micro, 0.9) AS t9 FROM m) "
            "SELECT CAST(CAST(micro > t1 AS INT) + "
            "CAST(micro > t2 AS INT) + CAST(micro > t3 AS INT) + "
            "CAST(micro > t4 AS INT) + CAST(micro > t5 AS INT) + "
            "CAST(micro > t6 AS INT) + CAST(micro > t7 AS INT) + "
            "CAST(micro > t8 AS INT) + CAST(micro > t9 AS INT) "
            "AS BIGINT) AS band, "
            "CAST(count(*) AS BIGINT) AS n_items, "
            "CAST(sum(micro) AS BIGINT) AS sum_micro "
            "FROM m, t GROUP BY 1 ORDER BY 1",
        "suppliers_all_brands":
            "SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "GROUP BY 1 HAVING count(DISTINCT p_brand) = "
            "(SELECT count(DISTINCT p_brand) FROM part) "
            "ORDER BY 1",
        "user_longest_streak":
            "WITH d AS (SELECT DISTINCT user_id, "
            "CAST(ts AS DATE) AS day FROM events), "
            "r AS (SELECT user_id, day, row_number() OVER "
            "(PARTITION BY user_id ORDER BY day) AS rn FROM d), "
            "i AS (SELECT user_id, count(*) AS len FROM (SELECT "
            "user_id, datediff('day', DATE '1970-01-01', day) - rn "
            "AS grp FROM r) GROUP BY user_id, grp) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(max(len) AS BIGINT) AS streak_days "
            "FROM i GROUP BY 1 ORDER BY 1",
        "click_no_purchase_users":
            "SELECT CAST(count(*) AS BIGINT) AS n_users FROM "
            "(SELECT user_id FROM events GROUP BY 1 "
            "HAVING sum(CASE WHEN event_type = 'click' THEN 1 "
            "ELSE 0 END) > 0 AND sum(CASE WHEN event_type = "
            "'purchase' THEN 1 ELSE 0 END) = 0)",
        "single_month_orders":
            "WITH m AS (SELECT l_orderkey, "
            "min(year(l_shipdate) * 12 + month(l_shipdate) - 1) AS mn, "
            "max(year(l_shipdate) * 12 + month(l_shipdate) - 1) AS mx "
            "FROM lineitem GROUP BY 1) "
            "SELECT CAST(mn // 12 AS BIGINT) AS ship_year, "
            "CAST(mn % 12 + 1 AS BIGINT) AS ship_month, "
            "CAST(count(*) AS BIGINT) AS n_orders "
            "FROM m WHERE mn = mx GROUP BY 1, 2 ORDER BY 1, 2",
        "user_interarrival_stats":
            "WITH g AS (SELECT date_diff('microsecond', "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) "
            "AS gap FROM events) "
            "SELECT CAST(count(gap) AS BIGINT) AS n_gaps, "
            "CAST(sum(gap) AS BIGINT) AS sum_us, "
            "CAST(min(gap) AS BIGINT) AS min_us, "
            "CAST(max(gap) AS BIGINT) AS max_us FROM g",
        "order_qty_lines_corr":
            "WITH p AS (SELECT l_orderkey, "
            "sum(CAST(round(l_quantity) AS BIGINT)) AS x, "
            "count(*) AS y FROM lineitem GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(x) AS BIGINT) AS sum_x, "
            "CAST(sum(y) AS BIGINT) AS sum_y, "
            "CAST(sum(x * y) AS BIGINT) AS sum_xy, "
            "CAST(sum(x * x) AS BIGINT) AS sum_x2, "
            "CAST(sum(y * y) AS BIGINT) AS sum_y2 FROM p",
        "event_value_mad":
            "WITH v AS (SELECT event_type, "
            "CAST(round(value * 100) AS BIGINT) AS c FROM events), "
            "m AS (SELECT event_type, quantile_disc(c, 0.5) AS med "
            "FROM v GROUP BY 1) "
            "SELECT v.event_type, "
            "CAST(any_value(med) AS BIGINT) AS median_cents, "
            "CAST(quantile_disc(abs(c - med), 0.5) AS BIGINT) "
            "AS mad_cents FROM v JOIN m USING (event_type) "
            "GROUP BY 1 ORDER BY 1",
        "event_type_mode_value":
            "WITH h AS (SELECT event_type, "
            "CAST(round(value * 100) AS BIGINT) AS c, count(*) AS n "
            "FROM events GROUP BY 1, 2), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY event_type "
            "ORDER BY n DESC, c) AS rn FROM h) "
            "SELECT event_type, CAST(c AS BIGINT) AS mode_cents, "
            "CAST(n AS BIGINT) AS n_events FROM r WHERE rn = 1 "
            "ORDER BY event_type",
        "brand_supplier_coverage":
            "SELECT p_brand, "
            "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "GROUP BY 1 ORDER BY 1",
        "event_props_key_stats":
            "WITH v AS (SELECT event_type, "
            "CAST(nullif(regexp_extract(props, "
            "'\"k\":\\s*(-?\\d+)', 1), '') AS BIGINT) AS k "
            "FROM events) "
            "SELECT event_type, CAST(count(k) AS BIGINT) AS n_with_k, "
            "CAST(sum(k) AS BIGINT) AS sum_k, "
            "CAST(min(k) AS BIGINT) AS min_k, "
            "CAST(max(k) AS BIGINT) AS max_k "
            "FROM v GROUP BY 1 ORDER BY 1",
        "nation_market_share":
            "WITH rev AS (SELECT year(o_orderdate) AS y, "
            "s_nationkey AS nk, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(10000 - CAST(round(l_discount * 10000) AS BIGINT)) AS micro "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON n_nationkey = c_nationkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "WHERE n_regionkey = 2) "
            "SELECT CAST(y AS BIGINT) AS o_year, "
            "CAST(coalesce(sum(CASE WHEN nk = 7 THEN micro END), 0) "
            "AS BIGINT) AS share_num, "
            "CAST(sum(micro) AS BIGINT) AS share_den "
            "FROM rev GROUP BY 1 ORDER BY 1",
        "customer_order_distribution":
            "WITH c AS (SELECT c_custkey, count(o_orderkey) AS n "
            "FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
            "GROUP BY 1) "
            "SELECT CAST(n AS BIGINT) AS n_orders, "
            "CAST(count(*) AS BIGINT) AS n_customers "
            "FROM c GROUP BY 1 ORDER BY n_customers DESC, n_orders DESC",
        "brand_filtered_revenue":
            "WITH m AS (SELECT "
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(10000 - CAST(round(l_discount * 10000) AS BIGINT)) AS micro "
            "FROM lineitem JOIN part ON p_partkey = l_partkey WHERE "
            "(p_brand = 'Brand#12' AND round(l_quantity) "
            "BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5) OR "
            "(p_brand = 'Brand#23' AND round(l_quantity) "
            "BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10) OR "
            "(p_brand = 'Brand#24' AND round(l_quantity) "
            "BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)) "
            "SELECT CAST(coalesce(sum(micro), 0) AS BIGINT) "
            "AS revenue_micro, CAST(count(*) AS BIGINT) AS n_items "
            "FROM m",
        "late_supplier_orders":
            "WITH ls AS (SELECT l_orderkey AS ok, l_suppkey AS sk, "
            "max(l_shipdate) AS smax FROM lineitem "
            "JOIN orders ON o_orderkey = l_orderkey "
            "WHERE o_orderstatus = 'F' GROUP BY 1, 2), "
            "om AS (SELECT ok, max(smax) AS omax, count(*) AS nsupp "
            "FROM ls GROUP BY 1), "
            "w AS (SELECT ls.ok, ls.sk FROM ls JOIN om USING (ok) "
            "WHERE nsupp >= 2 AND smax = omax), "
            "u AS (SELECT ok FROM w GROUP BY ok HAVING count(*) = 1) "
            "SELECT CAST(sk AS BIGINT) AS s_suppkey, "
            "CAST(count(*) AS BIGINT) AS n_orders "
            "FROM w JOIN u USING (ok) GROUP BY 1 "
            "ORDER BY n_orders DESC, s_suppkey",
        "top_volume_customers":
            "WITH s AS (SELECT l_orderkey AS ok, "
            "sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty "
            "FROM lineitem GROUP BY 1 HAVING "
            "sum(CAST(round(l_quantity) AS BIGINT)) >= 280) "
            "SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey, "
            "CAST(o_orderkey AS BIGINT) AS o_orderkey, "
            "strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
            "CAST(round(o_totalprice * 100) AS BIGINT) "
            "AS totalprice_cents, CAST(sum_qty AS BIGINT) AS sum_qty "
            "FROM s JOIN orders ON o_orderkey = ok "
            "JOIN customer ON c_custkey = o_custkey "
            "ORDER BY totalprice_cents DESC, o_orderkey",
        "top_supplier_revenue":
            "WITH r AS (SELECT l_suppkey, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS rev "
            "FROM lineitem WHERE l_shipdate >= DATE '1997-01-01' "
            "AND l_shipdate < DATE '1997-04-01' GROUP BY 1) "
            "SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, "
            "CAST(rev AS BIGINT) AS total_revenue_micro "
            "FROM supplier JOIN r ON s_suppkey = l_suppkey "
            "WHERE rev = (SELECT max(rev) FROM r) ORDER BY s_suppkey",
        "returned_item_revenue":
            "WITH rv AS (SELECT o_custkey AS ck, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS rev "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_returnflag = 'R' "
            "AND o_orderdate >= DATE '1997-07-01' "
            "AND o_orderdate < DATE '1997-10-01' GROUP BY 1) "
            "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, "
            "CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents, "
            "CAST(rev AS BIGINT) AS revenue_micro "
            "FROM rv JOIN customer ON c_custkey = ck "
            "ORDER BY revenue_micro DESC, c_custkey LIMIT 20",
        "priority_return_check":
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) "
            "AS n_orders FROM orders "
            "WHERE o_orderdate >= DATE '1998-01-01' "
            "AND o_orderdate < DATE '1998-04-01' "
            "AND EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') "
            "GROUP BY 1 ORDER BY 1",
        "shipping_priority":
            "SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(10000 - CAST(round(l_discount * 10000) AS BIGINT))) "
            "AS BIGINT) AS revenue_micro, "
            "strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
            "o_orderpriority "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < DATE '1998-01-01' "
            "AND l_shipdate > DATE '1998-01-01' "
            "GROUP BY o_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY revenue_micro DESC, o_orderkey LIMIT 10",
        "user_value_ffill":
            "SELECT user_id, event_id, CAST(coalesce(last_value("
            "CASE WHEN event_type = 'error' THEN NULL "
            "ELSE CAST(round(value*100) AS BIGINT) END IGNORE NULLS) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) "
            "AS BIGINT) AS filled_cents FROM events",
        "host_crawl_budget":
            "WITH c AS (SELECT doc_id % 41 AS host, count(*) AS n_docs "
            "FROM documents GROUP BY 1), "
            "t AS (SELECT sum(n_docs) AS total FROM c), "
            "b AS (SELECT host, n_docs, "
            "(10000 * n_docs) // (SELECT total FROM t) AS base, "
            "10000 * n_docs - ((10000 * n_docs) // (SELECT total FROM t)) "
            "* (SELECT total FROM t) AS rem FROM c), "
            "s AS (SELECT 10000 - sum(base) AS leftover FROM b), "
            "r AS (SELECT host, n_docs, base, row_number() OVER "
            "(ORDER BY rem DESC, host) AS rk FROM b) "
            "SELECT CAST(host AS BIGINT) AS host, "
            "CAST(n_docs AS BIGINT) AS n_docs, "
            "CAST(base + CASE WHEN rk <= (SELECT leftover FROM s) "
            "THEN 1 ELSE 0 END AS BIGINT) AS budget FROM r",
        "doc_prefix_dedup":
            "SELECT md5(substr(coalesce(text,''), 1, 64)) AS pkey, "
            "CAST(min(doc_id) AS BIGINT) AS keep_doc, "
            "CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY 1",
        "event_transitions":
            "WITH o AS (SELECT user_id, event_type, lead(event_type) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt "
            "FROM events) "
            "SELECT event_type AS from_type, nxt AS to_type, "
            "CAST(count(*) AS BIGINT) AS n_transitions FROM o "
            "WHERE nxt IS NOT NULL GROUP BY 1, 2",
        "customer_spend_bucketed":
            "SELECT c_custkey, CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) "
            "AS BIGINT) AS spend_cents "
            "FROM customer JOIN orders ON o_custkey = c_custkey "
            "GROUP BY 1",
        "customer_spend_incremental":
            "SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) "
            "AS BIGINT) AS spend_cents, "
            "CAST(min(CAST(round(o_totalprice*100) AS BIGINT)) "
            "AS BIGINT) AS min_order_cents, "
            "CAST(max(CAST(round(o_totalprice*100) AS BIGINT)) "
            "AS BIGINT) AS max_order_cents "
            "FROM orders GROUP BY 1",
        "events_range_pruned":
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) "
            "AS value_cents FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-10' "
            "AND ts < TIMESTAMP '2024-01-15' GROUP BY 1",
        "customer_upsert_cdc":
            "SELECT o_custkey AS c_custkey, 'update' AS change "
            "FROM orders GROUP BY 1 "
            "UNION ALL "
            "SELECT CAST(200000 + i AS BIGINT) AS c_custkey, "
            "'insert' AS change FROM range(5) t(i)",
        "user_sessions_stream":
            "WITH marked AS (SELECT user_id, event_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END "
            "AS new_s FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "sess AS (SELECT user_id, "
            "CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM marked) "
            "SELECT user_id, session_id, count(*) AS n_events "
            "FROM sess GROUP BY user_id, session_id",
        "events_stream_exactly_once":
            "SELECT strftime(ts, '%Y-%m-%d %H:00') AS window, "
            "event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) "
            "AS value_cents FROM events GROUP BY 1, 2",
        "customer_upsert_merge":
            "WITH s AS (SELECT o_custkey AS k, "
            "CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) "
            "AS BIGINT) AS spend FROM orders GROUP BY 1) "
            "SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) "
            "+ COALESCE(s.spend, 0) AS acctbal_cents, "
            "c_mktsegment AS segment "
            "FROM customer LEFT JOIN s ON c_custkey = s.k "
            "ORDER BY c_custkey",
        "events_time_travel":
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) "
            "AS value_cents FROM events "
            "WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1",
        "doc_weighted_sample":
            "WITH w AS (SELECT doc_id, "
            "CAST(length(coalesce(text, '')) + 1 AS BIGINT) AS weight, "
            "CAST((doc_id * 2654435761 + 12345) % 4294967296 AS BIGINT) "
            "AS h FROM documents), "
            "s AS (SELECT * FROM w "
            "ORDER BY CAST(h AS DOUBLE) / weight, doc_id LIMIT 100) "
            "SELECT doc_id, weight, h FROM s ORDER BY doc_id",
        "events_zorder_box":
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) "
            "AS value_cents FROM events "
            "WHERE user_id >= 30 AND user_id < 90 "
            "AND ts >= TIMESTAMP '2024-01-08' "
            "AND ts < TIMESTAMP '2024-01-20' GROUP BY 1",
        "events_stream_window":
            "SELECT strftime(ts, '%Y-%m-%d %H:00') AS window, "
            "event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) "
            "AS value_cents FROM events GROUP BY 1, 2",
        "user_customer_outer":
            "WITH e AS (SELECT user_id, CAST(count(*) AS BIGINT) "
            "AS n_events FROM events GROUP BY 1), "
            "c AS (SELECT c_custkey, c_mktsegment FROM customer "
            "WHERE c_acctbal > 5000) "
            "SELECT COALESCE(e.user_id, c.c_custkey) AS user_id, "
            "e.n_events, c.c_mktsegment AS segment, "
            "CASE WHEN e.user_id IS NULL THEN 'customer_only' "
            "WHEN c.c_custkey IS NULL THEN 'event_only' "
            "ELSE 'both' END AS status "
            "FROM e FULL OUTER JOIN c ON e.user_id = c.c_custkey",
        "regional_revenue":
            "SELECT r_name AS region, CAST(count(*) AS BIGINT) "
            "AS n_orders, CAST(sum(CAST(round(o_totalprice*100) "
            "AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM orders JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey "
            "JOIN region ON r_regionkey = n_regionkey GROUP BY 1",
        "event_value_moments":
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) "
            "AS sum_cents, "
            "CAST(sum(CAST(round(value*100) AS BIGINT) * "
            "CAST(round(value*100) AS BIGINT)) AS BIGINT) "
            "AS sum_cents_sq FROM events GROUP BY 1",
        "events_gap_fill":
            "WITH c AS (SELECT event_type, CAST(ts AS DATE) AS d, "
            "count(*) AS n FROM events GROUP BY 1, 2), "
            "r AS (SELECT min(d) AS lo, max(d) AS hi FROM c), "
            "days AS (SELECT unnest(generate_series((SELECT lo FROM r), "
            "(SELECT hi FROM r), INTERVAL 1 DAY))::DATE AS d), "
            "keys AS (SELECT DISTINCT event_type FROM c) "
            "SELECT k.event_type, strftime(days.d, '%Y-%m-%d') AS day, "
            "CAST(coalesce(c.n, 0) AS BIGINT) AS n_events "
            "FROM keys k CROSS JOIN days "
            "LEFT JOIN c ON c.event_type = k.event_type AND c.d = days.d",
        "event_value_histogram":
            "SELECT least(greatest(CAST(round(value*100) AS BIGINT) "
            "// 500, 0), 19) AS bin, count(*) AS n_events "
            "FROM events GROUP BY 1",
        "orders_cube":
            "SELECT coalesce(o_orderstatus, 'ALL') AS status, "
            "coalesce(o_orderpriority, 'ALL') AS priority, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) "
            "AS BIGINT) AS sum_cents FROM orders "
            "GROUP BY CUBE(o_orderstatus, o_orderpriority)",
        "customer_orders_left":
            "SELECT c_custkey, c_nationkey, "
            "CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders "
            "FROM customer LEFT JOIN (SELECT o_custkey, count(*) AS n "
            "FROM orders GROUP BY 1) o ON o.o_custkey = c_custkey",
        "bigram_pmi": _bigram_pmi_sql(),
        "host_triangles": _host_triangles_sql(),
        "host_clustering": _host_clustering_sql(),
        "part_butterflies": _part_butterflies_sql(),
        "url_param_cardinality": _url_param_cardinality_sql(),
        "page_hreflang": _page_hreflang_sql(),
        "pagination_chains": _pagination_chains_sql(),
        "nation_trade_flows": _nation_trade_flows_sql(),
        "page_opengraph": _page_opengraph_sql(),
        "source_lang_mix": _source_lang_mix_sql(),
        "returnflag_weighted_median": _returnflag_weighted_median_sql(),
        "host_bipartite": _host_bipartite_sql(),
        "doc_winnowing": _doc_winnowing_sql(),
        "winnow_near_dups": _winnow_near_dups_sql(),
        "bm25_length_rerank": _bm25_length_rerank_sql(),
        "schema_evolution_union": _schema_evolution_union_sql(),
        "source_trigram_growth": _source_trigram_growth_sql(),
        "orders_expectations": _orders_expectations_sql(),
        "shard_rebalance_audit": _shard_rebalance_audit_sql(),
        "source_token_budget": _source_token_budget_sql(),
        "embedding_norm_stats": _embedding_norm_stats_sql(),
        "host_degree_mixing": _host_degree_mixing_sql(),
        "winnow_fp_postings": _winnow_fp_postings_sql(),
        "doc_quality_lr": _doc_quality_lr_sql(),
        "nation_profit": _nation_profit_sql(),
        "doc_dsir_select": _DOC_DSIR_SQL,
        "source_fp_overlap": _source_fp_overlap_sql(),
        "part_name_linkage": _PART_NAME_LINKAGE_SQL,
        "page_template_stats": _PAGE_TEMPLATE_STATS_SQL,
        "knn_pq": _pq_sql(),
        "event_value_bootstrap": _event_value_bootstrap_sql(),
        "shard_assign_2level": _SHARD_2LEVEL_SQL,
        "host_truss": _host_truss_sql(),
        "events_late_arrivals": _EVENTS_LATE_SQL,
        "events_k_anonymity": _EVENTS_K_ANON_SQL,
        "event_type_dp_counts": _event_type_dp_counts_sql(),
        "lr_confusion": _lr_confusion_sql(),
        "lr_calibration": _lr_calibration_sql(),
        "event_user_kmv": _event_user_kmv_sql(),
        "lr_conformal": _lr_conformal_sql(),
        "lr_auc": _lr_auc_sql(),
        "doc_neyman_sample": _DOC_NEYMAN_SQL,
        "source_zipf_slope": _SOURCE_ZIPF_SQL,
        "lr_tune": _lr_tune_sql(),
        "orders_anti_events":
            "SELECT o_orderkey, o_custkey FROM orders "
            "WHERE o_custkey NOT IN (SELECT user_id FROM events)",
        "user_first_event_daily":
            "SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, "
            "event_id, event_type FROM events "
            "QUALIFY row_number() OVER (PARTITION BY user_id, "
            "CAST(ts AS DATE) ORDER BY ts, event_id) = 1",
        "doc_split_assign":
            "SELECT doc_id, CASE WHEN md5(coalesce(text,'')) < 'cc' "
            "THEN 'train' WHEN md5(coalesce(text,'')) < 'e6' "
            "THEN 'val' ELSE 'test' END AS split FROM documents",
        "lineitem_weighted_discount":
            "SELECT l_returnflag, "
            "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS wd_num, "
            "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) "
            "AS BIGINT) AS wd_den "
            "FROM lineitem GROUP BY 1",
        "user_rfm_segments":
            # quantile_disc == the engine's type-1 discrete rule;
            # score = 1 + #quartile thresholds strictly below the value
            "WITH ua AS (SELECT user_id, max(epoch_us(ts)) AS r_us, "
            "count(*) AS f_n, sum(CAST(round(value*100) AS BIGINT)) "
            "AS m_cents FROM events GROUP BY 1), "
            "t AS (SELECT "
            "quantile_disc(r_us, 0.25) AS r1, "
            "quantile_disc(r_us, 0.50) AS r2, "
            "quantile_disc(r_us, 0.75) AS r3, "
            "quantile_disc(f_n, 0.25) AS f1, "
            "quantile_disc(f_n, 0.50) AS f2, "
            "quantile_disc(f_n, 0.75) AS f3, "
            "quantile_disc(m_cents, 0.25) AS m1, "
            "quantile_disc(m_cents, 0.50) AS m2, "
            "quantile_disc(m_cents, 0.75) AS m3 FROM ua), "
            "s AS (SELECT user_id, r_us, f_n, m_cents, "
            "1 + CAST(r_us > r1 AS INT) + CAST(r_us > r2 AS INT) "
            "+ CAST(r_us > r3 AS INT) AS r_score, "
            "1 + CAST(f_n > f1 AS INT) + CAST(f_n > f2 AS INT) "
            "+ CAST(f_n > f3 AS INT) AS f_score, "
            "1 + CAST(m_cents > m1 AS INT) + CAST(m_cents > m2 AS INT) "
            "+ CAST(m_cents > m3 AS INT) AS m_score FROM ua, t) "
            "SELECT user_id, CAST(r_us AS BIGINT) AS r_us, "
            "CAST(f_n AS BIGINT) AS f_n, CAST(m_cents AS BIGINT) "
            "AS m_cents, CAST(r_score AS BIGINT) AS r_score, "
            "CAST(f_score AS BIGINT) AS f_score, "
            "CAST(m_score AS BIGINT) AS m_score, "
            "CAST(100 * r_score + 10 * f_score + m_score AS BIGINT) "
            "AS rfm FROM s",
        "doc_length_rank":
            "SELECT doc_id, n_chars, "
            "CAST(RANK() OVER (ORDER BY n_chars) AS BIGINT) AS rnk, "
            "CAST(count(*) OVER () AS BIGINT) AS n_rows FROM documents",
        "host_sitemaps":
            "WITH h AS (SELECT doc_id, 's' || CAST(doc_id AS VARCHAR) || "
            "'.example.org' AS host FROM documents) "
            "SELECT host, CAST(0 AS BIGINT) AS rank, "
            "'https://' || host || '/sm0.xml' AS sitemap_url "
            "FROM h WHERE doc_id % 3 >= 1 "
            "UNION ALL SELECT host, 1, 'https://' || host || '/sm1.xml' "
            "FROM h WHERE doc_id % 3 = 2",
        "event_value_bands":
            "WITH b(lo, hi, label) AS (VALUES "
            "(0, 1000, 'micro'), (1000, 2500, 'small'), "
            "(2500, 7500, 'mid'), (7500, 20000, 'large')), "
            "e AS (SELECT CAST(round(value * 100) AS BIGINT) AS c "
            "FROM events) "
            "SELECT coalesce(label, 'whale') AS band, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(c) AS BIGINT) AS sum_cents "
            "FROM e LEFT JOIN b ON c >= lo AND c < hi GROUP BY 1",
        "user_value_trend":
            "WITH b AS (SELECT user_id, "
            "(epoch_us(ts) - min(epoch_us(ts)) OVER ("
            "PARTITION BY user_id)) // 1000000 AS x, "
            "CAST(round(value*100) AS BIGINT) AS y FROM events) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS BIGINT) "
            "AS slope_num, "
            "CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS BIGINT) "
            "AS slope_den FROM b GROUP BY user_id",
        "doc_chunks":
            "WITH toks AS (SELECT doc_id, regexp_extract_all(lower("
            "coalesce(text, '')), '[a-z0-9_]+') AS tk FROM documents), "
            "idx AS (SELECT unnest(range(4096)) AS c), "
            "ch AS (SELECT doc_id, c, list_slice(tk, c*24 + 1, c*24 + 32) "
            "AS sl FROM toks, idx WHERE c*24 < len(tk)) "
            "SELECT doc_id, CAST(c AS BIGINT) AS chunk_idx, "
            "array_to_string(sl, ' ') AS chunk_text, "
            "CAST(len(sl) AS BIGINT) AS n_tokens FROM ch",
        "semantic_dedup_int": _semantic_dedup_int_sql(),
        "event_funnel":
            "WITH s1 AS (SELECT user_id, min(ts) AS t FROM events "
            "WHERE event_type = 'view' GROUP BY 1), "
            "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t "
            "WHERE e.event_type = 'click' GROUP BY 1), "
            "s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t "
            "WHERE e.event_type = 'purchase' GROUP BY 1) "
            "SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type, "
            "CAST(count(*) AS BIGINT) AS n_users FROM s1 "
            "UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2 "
            "UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) "
            "FROM s3",
        "cohort_retention":
            "WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort "
            "FROM events GROUP BY 1), "
            "a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
            "FROM events) "
            "SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day, "
            "CAST(a.day - f.cohort AS BIGINT) AS offset_days, "
            "CAST(count(*) AS BIGINT) AS n_users "
            "FROM a JOIN f ON f.user_id = a.user_id GROUP BY 1, 2",
        "user_dominant_event":
            "SELECT user_id, mode, n FROM (SELECT user_id, "
            "event_type AS mode, CAST(count(*) AS BIGINT) AS n, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY count(*) DESC, event_type) AS rn "
            "FROM events GROUP BY user_id, event_type) WHERE rn = 1",
        "doc_keywords":
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(coalesce(text, '')), "
            "'[a-z0-9_]+')) AS token FROM documents), "
            "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks "
            "GROUP BY 1, 2), "
            "df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1), "
            "n AS (SELECT count(*) AS n FROM documents), "
            "sc AS (SELECT tf.doc_id, tf.token, CAST(tf.tf * "
            "floor(1000000 * ln((n.n + 1.0) / (df.df + 1.0))) AS BIGINT) "
            "AS score_micro FROM tf JOIN df ON df.token = tf.token, n) "
            "SELECT doc_id, CAST(rn AS BIGINT) AS rank, token, score_micro "
            "FROM (SELECT doc_id, token, score_micro, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY score_micro DESC, token) AS rn "
            "FROM sc) WHERE rn <= 3",
        "user_range_window":
            "SELECT user_id, event_id, "
            "CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) "
            "AS range_sum_cents, "
            "CAST(count(*) OVER w AS BIGINT) AS n_in_range FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 60 MINUTE PRECEDING AND CURRENT ROW)",
        "user_event_ntile":
            "SELECT user_id, event_id, "
            "CAST(row_number() OVER w AS BIGINT) AS rank, "
            "CAST(ntile(4) OVER w AS BIGINT) AS tile FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
        "user_event_pivot":
            "SELECT user_id, "
            "CAST(count(*) FILTER (event_type = 'click') AS BIGINT) "
            "AS n_click, "
            "CAST(count(*) FILTER (event_type = 'error') AS BIGINT) "
            "AS n_error, "
            "CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) "
            "AS n_purchase, "
            "CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) "
            "AS n_signup, "
            "CAST(count(*) FILTER (event_type = 'view') AS BIGINT) "
            "AS n_view FROM events GROUP BY user_id",
        "corpus_refresh_dedup":
            "SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN "
            "coalesce(text, '') || ' [v2]' ELSE text END AS text, "
            "CAST(CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 1 END AS BIGINT) "
            "AS priority FROM documents",
        "vocab_top_tokens":
            "WITH toks AS (SELECT unnest(regexp_split_to_array(lower("
            "coalesce(text,'')), '[^a-z]+')) AS token FROM documents), "
            "counted AS (SELECT token, count(*) AS n FROM toks "
            "WHERE token != '' GROUP BY token "
            "ORDER BY n DESC, token LIMIT 100) "
            "SELECT row_number() OVER (ORDER BY n DESC, token) - 1 "
            "AS token_id, token, n FROM counted",
        "doc_oov_rate":
            "WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array("
            "lower(coalesce(text,'')), '[^a-z]+')) AS token FROM documents), "
            "tk AS (SELECT doc_id, token FROM toks WHERE token != ''), "
            "vocab AS (SELECT token FROM (SELECT token, count(*) AS n "
            "FROM tk GROUP BY token ORDER BY n DESC, token LIMIT 50)), "
            "agg AS (SELECT doc_id, count(*) AS n_tokens_az, "
            "CAST(sum(CASE WHEN token IN (SELECT token FROM vocab) "
            "THEN 0 ELSE 1 END) AS BIGINT) AS n_oov "
            "FROM tk GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(a.n_tokens_az, 0) AS n_tokens_az, "
            "coalesce(a.n_oov, 0) AS n_oov "
            "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id",
        "doc_stopword_counts": _stopword_sql(),
        "doc_langid": _doc_langid_sql(),
        "doc_quality": _doc_quality_sql(),
        "embedding_dedup": _embedding_dedup_sql(),
        "bm25_top20": _bm25_sql(),
        "bm25_index_top20": _bm25_sql(),
        "bpe_subword_stats": _bpe_subword_stats_sql(),
        "image_near_dups": _image_near_dups_sql(),
        "audio_near_dups": _audio_near_dups_sql(),
        "video_near_dups": _video_near_dups_sql(),
        "doc_repetition": _doc_repetition_sql(),
        "page_outlinks": _page_outlinks_sql(),
        "doc_pii_redact": _pii_sql(),
        "substring_dedup": _substring_dedup_sql(),
        "doc_mixture_sample":
            "SELECT doc_id, lang, source, n_chars FROM documents "
            "WHERE doc_id % (CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 "
            "WHEN 'es' THEN 2 ELSE 5 END) = 0",
        "doc_rolling_fp": _rolling_fp_sql(),
        "line_dedup": _line_dedup_sql(),
        "paragraph_dedup": _paragraph_dedup_sql(),
        "canonical_url_dedup": _canonical_url_sql(),
        "simhash_dedup": _simhash_sql(),
        "minhash_dedup": _minhash_sql(),
        "ngram_dedup": _minhash_sql(char_ngrams=True),
        "media_features":
            "SELECT doc_id AS media_id, "
            "CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' "
            "WHEN 1 THEN 'audio' ELSE 'video' END AS kind, "
            "'ok' AS decode_status FROM documents",
        "top_parts_per_brand":
            "SELECT p_partkey, p_brand, p_retailprice FROM ("
            "SELECT p_partkey, p_brand, p_retailprice, "
            "row_number() OVER (PARTITION BY p_brand "
            "ORDER BY p_retailprice, p_partkey) AS rn FROM part) "
            "WHERE rn <= 3",
        "doc_sample":
            "SELECT doc_id, source, lang, n_chars FROM documents "
            "WHERE doc_id % 20 = 0",
        "customer_spend_cogroup":
            "SELECT o_custkey AS c_custkey, c_name, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            " / 100.0 AS total_spend, "
            "count(*) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY o_custkey, c_name",
        "orders_skew_join": _orders_skew_join_sql(),
        "decontaminate":
            "WITH toks AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(lower(coalesce(text,'')), '[^a-z]+'), "
            "x -> x != '') AS ts FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, "
            "array_to_string(ts[i:i+12], ' ') AS g FROM toks, "
            "UNNEST(range(1, greatest(len(ts) - 11, 1))) AS t(i) "
            "WHERE len(ts) >= 13), "
            "bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 20), "
            "hits AS (SELECT doc_id, count(*) AS n FROM grams "
            "WHERE g IN (SELECT g FROM bench) GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_ngrams, "
            "coalesce(h.n, 0) > 0 AS is_contaminated "
            "FROM documents d LEFT JOIN hits h USING (doc_id)",
        "doc_packing_stats":
            "WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array("
            "lower(coalesce(text,'')), '[^a-z]+')) AS token FROM documents), "
            "tk AS (SELECT doc_id, token FROM toks WHERE token != ''), "
            "vocab AS (SELECT token FROM (SELECT token, count(*) AS n "
            "FROM tk GROUP BY token ORDER BY n DESC, token LIMIT 100)), "
            "kept AS (SELECT doc_id, count(*) AS n_kept FROM tk "
            "WHERE token IN (SELECT token FROM vocab) GROUP BY doc_id) "
            "SELECT doc_id, "
            "CAST(ceil(n_kept / 32.0) AS BIGINT) AS n_sequences, "
            "CAST(n_kept AS BIGINT) AS n_tokens_kept, "
            "CAST(ceil(n_kept / 32.0) * 32 - n_kept AS BIGINT) AS n_pad "
            "FROM kept WHERE n_kept > 0",
        "embedding_knn":
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
            "scored AS (SELECT e.vec_id, "
            "list_cosine_similarity(e.embedding, q.qe) AS score "
            "FROM embeddings e CROSS JOIN q) "
            "SELECT row_number() OVER (ORDER BY score DESC, vec_id) AS rank, vec_id "
            "FROM scored ORDER BY score DESC, vec_id LIMIT 10",
        # knn_sq8: the int8-compressed path must land the SAME exact
        # top-10 as brute force (rescore margin covers quantization)
        "knn_sq8":
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
            "scored AS (SELECT e.vec_id, "
            "list_cosine_similarity(e.embedding, q.qe) AS score "
            "FROM embeddings e CROSS JOIN q) "
            "SELECT row_number() OVER (ORDER BY score DESC, vec_id) AS rank, vec_id "
            "FROM scored ORDER BY score DESC, vec_id LIMIT 10",
        # knn_ivfsq probes ALL cells + exact-rescores, so it must land
        # the same exact top-10 as brute force
        "knn_ivfsq":
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
            "scored AS (SELECT e.vec_id, "
            "list_cosine_similarity(e.embedding, q.qe) AS score "
            "FROM embeddings e CROSS JOIN q) "
            "SELECT row_number() OVER (ORDER BY score DESC, vec_id) AS rank, vec_id "
            "FROM scored ORDER BY score DESC, vec_id LIMIT 10",
        # knn_ivf (float path) probes ALL cells too → exact top-10
        "knn_ivf":
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
            "scored AS (SELECT e.vec_id, "
            "list_cosine_similarity(e.embedding, q.qe) AS score "
            "FROM embeddings e CROSS JOIN q) "
            "SELECT row_number() OVER (ORDER BY score DESC, vec_id) AS rank, vec_id "
            "FROM scored ORDER BY score DESC, vec_id LIMIT 10",
        "semantic_dedup": _semantic_dedup2_sql(),
        "doc_upsample_mix": _upsample_mix_sql(),
        "doc_hash_split": _hash_split_sql(),
        "doc_content_split": _CONTENT_SPLIT_SQL,
        "doc_quality_sample": _quality_sample_sql(),
        "doc_sample_per_source": _sample_per_source_sql(),
        "doc_curation_pipeline": _curation_pipeline_sql(),
        "embedding_kmeans": _kmeans_sql(8, 3),
        "events_hopping":
            "WITH e AS (SELECT event_type, value, epoch_us(ts) AS us "
            "FROM events), "
            "w AS (SELECT event_type, value, "
            "(us // 900000000) * 900000000 - i * 900000000 AS ws "
            "FROM e, UNNEST(range(0, 4)) AS t(i)) "
            "SELECT ws // 1000000 AS window_start, event_type, "
            "count(*) AS n_events, round(sum(value), 2) AS total_value "
            "FROM w GROUP BY 1, 2",
        "events_last_hour":
            "SELECT e.event_id, count(r.ts) AS n_last_hour "
            "FROM events e LEFT JOIN events r "
            "ON r.ts <= e.ts AND e.ts < r.ts + INTERVAL 60 MINUTE "
            "GROUP BY e.event_id",
        "orders_semi_events":
            "SELECT o_orderkey, o_custkey FROM orders "
            "WHERE o_custkey IN (SELECT user_id FROM events)",
        "orders_blocklist":
            "SELECT o_orderkey, o_custkey FROM orders "
            "WHERE o_custkey NOT IN (SELECT UNNEST(range(0, 100000, 7)))",
        "customer_order_quantiles":
            "SELECT o_custkey, "
            "quantile_disc(CAST(round(o_totalprice*100) AS BIGINT), 0.25) "
            "AS p25, "
            "quantile_disc(CAST(round(o_totalprice*100) AS BIGINT), 0.50) "
            "AS p50, "
            "quantile_disc(CAST(round(o_totalprice*100) AS BIGINT), 0.75) "
            "AS p75 FROM orders GROUP BY o_custkey",
        "order_price_quantiles":
            "SELECT "
            "quantile_disc(CAST(round(o_totalprice*100) AS BIGINT), 0.10) "
            "AS p10, "
            "quantile_disc(CAST(round(o_totalprice*100) AS BIGINT), 0.50) "
            "AS p50, "
            "quantile_disc(CAST(round(o_totalprice*100) AS BIGINT), 0.90) "
            "AS p90, "
            "quantile_disc(CAST(round(o_totalprice*100) AS BIGINT), 0.99) "
            "AS p99 FROM orders",
        "nb_lang_classify":
            # full independent re-derivation of the NB training: token
            # counts on the %5 split, top-2000 vocab, integer-log
            # weights (DuckDB ln == glibc libm == math.log, bit-exact),
            # per-doc integer score sums, argmax with (score desc, cls)
            "WITH toks AS (SELECT doc_id, lang, "
            "UNNEST(regexp_extract_all(lower(coalesce(text,'')), "
            "'[a-z0-9_]+')) AS tok FROM documents), "
            "train AS (SELECT * FROM toks WHERE doc_id % 5 != 0), "
            "cnt AS (SELECT tok, lang AS cls, count(*) AS n FROM train "
            "GROUP BY 1, 2), "
            "tok_tot AS (SELECT tok, sum(n) AS nt FROM cnt GROUP BY 1), "
            "vocab AS (SELECT tok FROM tok_tot ORDER BY nt DESC, tok "
            "LIMIT 2000), "
            "cntv AS (SELECT * FROM cnt WHERE tok IN (SELECT tok FROM vocab)), "
            "vs AS (SELECT count(*) AS v FROM vocab), "
            "classes AS (SELECT DISTINCT lang AS cls FROM documents "
            "WHERE doc_id % 5 != 0), "
            "tot AS (SELECT c.cls, coalesce(sum(cv.n), 0) AS tot "
            "FROM classes c LEFT JOIN cntv cv ON cv.cls = c.cls "
            "GROUP BY c.cls), "
            "w AS (SELECT v.tok, c.cls, "
            "CAST(floor(1000000 * ln((coalesce(cv.n, 0) + 1.0) / "
            "(t.tot + vs.v))) AS BIGINT) AS w "
            "FROM vocab v CROSS JOIN classes c "
            "JOIN tot t ON t.cls = c.cls CROSS JOIN vs "
            "LEFT JOIN cntv cv ON cv.tok = v.tok AND cv.cls = c.cls), "
            "oov AS (SELECT t.cls, CAST(floor(1000000 * ln(1.0 / "
            "(t.tot + vs.v))) AS BIGINT) AS w FROM tot t CROSS JOIN vs), "
            "ntr AS (SELECT count(*) AS n FROM documents WHERE doc_id % 5 != 0), "
            "prior AS (SELECT lang AS cls, CAST(floor(1000000 * "
            "ln(count(*) * 1.0 / (SELECT n FROM ntr))) AS BIGINT) AS pw "
            "FROM documents WHERE doc_id % 5 != 0 GROUP BY lang), "
            "tokw AS (SELECT t.doc_id, c.cls, coalesce(w.w, o.w) AS w "
            "FROM toks t CROSS JOIN classes c "
            "JOIN oov o ON o.cls = c.cls "
            "LEFT JOIN w ON w.tok = t.tok AND w.cls = c.cls), "
            "ssum AS (SELECT doc_id, cls, sum(w) AS sw FROM tokw "
            "GROUP BY 1, 2), "
            "base AS (SELECT d.doc_id, c.cls FROM documents d "
            "CROSS JOIN classes c), "
            "sc AS (SELECT b.doc_id, b.cls, p.pw + coalesce(s.sw, 0) AS score "
            "FROM base b JOIN prior p ON p.cls = b.cls "
            "LEFT JOIN ssum s ON s.doc_id = b.doc_id AND s.cls = b.cls), "
            "ranked AS (SELECT doc_id, cls, score, row_number() OVER "
            "(PARTITION BY doc_id ORDER BY score DESC, cls) AS rn FROM sc) "
            "SELECT doc_id, cls AS pred_lang, CAST(score AS BIGINT) "
            "AS nb_score FROM ranked WHERE rn = 1",
        "host_pagerank": _pagerank_sql(5),
        "host_hits": _hits_sql(3),
        "host_authority_profile": _host_authority_sql(),
        "crawl_schedule": _CRAWL_SCHEDULE_SQL,
        "url_templates": _URL_TEMPLATES_SQL,
        "host_crawl_waterfill": _HOST_CRAWL_WATERFILL_SQL,
        "host_mirror_pairs": _HOST_MIRROR_SQL,
        "host_crawl_delays": _HOST_CRAWL_DELAYS_SQL,
        "sitemap_entries": _SITEMAP_ENTRIES_SQL,
        "crawl_plan": _CRAWL_PLAN_SQL,
        "page_head_meta": _head_meta_sql(),
        "heavy_hitter_hosts":
            "WITH h AS (SELECT 'h' || CAST(doc_id % 199 AS VARCHAR) || "
            "'.example.org' AS val FROM documents, "
            "UNNEST(range(0, 1 + doc_id % 5)) AS t(j)) "
            "SELECT val, count(*) AS n FROM h GROUP BY val "
            "ORDER BY n DESC, val LIMIT 20",
        "documents_profile": _profile_sql(),
        "host_noindex_rates":
            "WITH x AS (SELECT 'm' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org' AS host, "
            "CASE WHEN doc_id % 4 = 1 OR doc_id % 4 = 3 THEN 1 ELSE 0 END "
            "AS noindex, "
            "CASE WHEN doc_id % 11 = 7 THEN 0 "
            "WHEN doc_id % 3 = 0 AND doc_id % 9 = 3 THEN 1 "
            "WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS offh "
            "FROM documents) "
            "SELECT host, count(*) AS n_pages, "
            "CAST(sum(noindex) AS BIGINT) AS n_noindex, "
            "CAST(sum(offh) AS BIGINT) AS n_canonical_offhost "
            "FROM x GROUP BY host",
        "doc_readability":
            "WITH x AS (SELECT doc_id, lower(coalesce(text, '')) AS t "
            "FROM documents), "
            "c AS (SELECT doc_id, "
            "len(regexp_extract_all(t, '[.!?]+')) AS s, "
            "regexp_extract_all(t, '[a-z0-9'']+') AS ws FROM x), "
            "d AS (SELECT doc_id, s, len(ws) AS w, "
            "len(list_filter(ws, y -> length(y) >= 7)) AS lw FROM c) "
            "SELECT doc_id, CAST(s AS BIGINT) AS n_sentences, "
            "CAST(w AS BIGINT) AS n_words, "
            "CAST(lw AS BIGINT) AS n_long_words, "
            "CAST(CASE WHEN w = 0 THEN 0 ELSE "
            "floor(1000.0 * (w / greatest(s, 1) + (100.0 * lw) / w)) "
            "END AS BIGINT) AS lix_milli FROM d",
        "lineitem_bloom_semi":
            "SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem "
            "WHERE l_orderkey IN (SELECT o_orderkey FROM orders "
            "WHERE o_totalprice > 200000.0)",
        "event_type_unique_users":
            "SELECT event_type, count(DISTINCT user_id) AS n_distinct "
            "FROM events GROUP BY event_type",
        # approx twin: exact count SQL-checked; approx_ok TRUE asserts
        # the ±2% HLL envelope (a drifting estimate breaks the match)
        "event_type_approx_users":
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) "
            "AS n_users, TRUE AS approx_ok FROM events GROUP BY event_type",
        "nation_revenue":
            "SELECT n_name, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents, count(*) AS n_orders "
            "FROM orders JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey GROUP BY n_name",
        "label_centroids":
            "WITH x AS (SELECT CAST(label AS BIGINT) AS label, "
            "UNNEST(embedding) AS v, "
            "UNNEST(range(0, len(embedding))) AS d FROM embeddings) "
            "SELECT label, d AS dim, "
            "CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) "
            "AS BIGINT) AS sum_micro, count(*) AS n_vecs, "
            "CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) "
            "AS DOUBLE) / (1000000.0 * count(*)) AS centroid "
            "FROM x GROUP BY label, d",
        "page_structured":
            "SELECT 'https://s' || CAST(doc_id % 6 AS VARCHAR) || "
            "'.example.org/p/' || CAST(doc_id AS VARCHAR) AS url, "
            "CASE WHEN doc_id % 2 = 0 THEN 'OG Title ' || "
            "CAST(doc_id AS VARCHAR) ELSE '' END AS og_title, "
            "CASE WHEN doc_id % 5 = 0 THEN 'Desc ' || "
            "CAST(doc_id % 40 AS VARCHAR) ELSE '' END AS og_description, "
            "'article' AS og_type, "
            "CAST(CASE doc_id % 4 WHEN 1 THEN 1 WHEN 2 THEN 2 "
            "ELSE 0 END AS BIGINT) AS n_ldjson, "
            "CASE doc_id % 4 WHEN 1 THEN 'Article' "
            "WHEN 2 THEN 'Article;Product' ELSE '' END AS ld_types, "
            "CASE doc_id % 4 WHEN 1 THEN 'N' || CAST(doc_id AS VARCHAR) "
            "WHEN 2 THEN 'N' || CAST(doc_id AS VARCHAR) "
            "ELSE '' END AS ld_name "
            "FROM documents",
        "doc_length_gate":
            "SELECT doc_id, n_chars FROM documents WHERE n_chars >= "
            "(SELECT quantile_disc(n_chars, 0.10) FROM documents)",
        "doc_bits_per_char":
            # full re-derivation of the char-3-gram LM: normalize
            # (lower, rare→chr(2)), count grams + chr(1)-prefixed
            # 2-gram prefixes, keep top-100k by (n desc, gram), integer
            # micro-bit costs, per-doc int sums.  47 = |_NORM| + 1.
            "WITH norm AS (SELECT doc_id, regexp_replace(lower("
            "coalesce(text, '')), '[^a-z0-9 .,;:!?''\n-]', chr(2), 'g') "
            "AS s FROM documents), "
            "pos AS (SELECT doc_id, substr(s, CAST(i AS INT), 3) AS g "
            "FROM norm, UNNEST(range(1, length(s) - 1)) AS t(i)), "
            "cnt AS (SELECT g, count(*) AS n FROM pos GROUP BY g), "
            "pcnt AS (SELECT chr(1) || substr(g, 1, 2) AS g, "
            "count(*) AS n FROM pos GROUP BY 1), "
            "kept AS (SELECT g, n FROM (SELECT * FROM cnt "
            "UNION ALL SELECT * FROM pcnt) ORDER BY n DESC, g "
            "LIMIT 100000), "
            "w AS (SELECT k.g, CAST(floor(-1000000.0 * log2(least(1.0, "
            "(k.n + 1.0) / (coalesce(p.n, 0) + 47)))) AS BIGINT) AS w "
            "FROM kept k LEFT JOIN kept p "
            "ON p.g = chr(1) || substr(k.g, 1, 2) "
            "WHERE substr(k.g, 1, 1) != chr(1)), "
            "sc AS (SELECT p.doc_id, sum(coalesce(w.w, 12000000)) AS tot, "
            "count(*) AS n FROM pos p LEFT JOIN w ON w.g = p.g "
            "GROUP BY p.doc_id) "
            "SELECT d.doc_id, CASE WHEN s.n IS NULL THEN 12.0 "
            "ELSE CAST(s.tot AS DOUBLE) / (1000000.0 * s.n) END "
            "AS bits_per_char, coalesce(s.n, 0) AS n_scored_grams "
            "FROM documents d LEFT JOIN sc s ON s.doc_id = d.doc_id",
        "crawl_snapshot_diff":
            "WITH base AS (SELECT doc_id, "
            "md5(coalesce(text, '')) AS dg, "
            "md5(coalesce(text, '') || ' v2') AS dg2 FROM documents), "
            "olds AS (SELECT 'https://h' || CAST(doc_id % 97 AS VARCHAR) "
            "|| '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url, "
            "dg AS digest FROM base WHERE doc_id % 7 != 3), "
            "news AS (SELECT 'https://h' || CAST(doc_id % 97 AS VARCHAR) "
            "|| '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url, "
            "CASE WHEN doc_id % 5 = 0 THEN dg2 ELSE dg END AS digest "
            "FROM base WHERE doc_id % 11 != 5) "
            "SELECT coalesce(o.url, n.url) AS url, "
            "CASE WHEN o.url IS NULL THEN 'added' "
            "WHEN n.url IS NULL THEN 'removed' "
            "WHEN o.digest = n.digest THEN 'unchanged' "
            "ELSE 'changed' END AS status "
            "FROM olds o FULL OUTER JOIN news n ON n.url = o.url",
        "user_value_cusum":
            # Page's CUSUM via the prefix-sum/running-min closed form:
            # S_i = P_i - min(0, min_{j<=i} P_j); first alarm by (ts, id).
            "WITH x AS (SELECT user_id, ts, event_id, "
            "CAST(round(value * 100) AS BIGINT) - 6000 AS d FROM events), "
            "p AS (SELECT user_id, ts, event_id, sum(d) OVER w AS pp, "
            "row_number() OVER w AS rn FROM x "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING)), "
            "s AS (SELECT user_id, event_id, rn, pp - least(0, min(pp) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING)) AS cusum FROM p) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(max(cusum) AS BIGINT) AS max_cusum, "
            "CAST(coalesce(min_by(event_id, rn) "
            "FILTER (WHERE cusum > 50000), -1) AS BIGINT) AS alarm_id "
            "FROM s GROUP BY 1 ORDER BY 1",
        "source_length_ks":
            # exact two-sample KS: D·n_a·n_b = max |n_b·C_a − n_a·C_b|
            "WITH x AS (SELECT n_chars AS v, "
            "CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS a, "
            "CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS b "
            "FROM documents WHERE source IN ('src0', 'src1')), "
            "g AS (SELECT v, sum(a) AS na, sum(b) AS nb FROM x "
            "GROUP BY v), "
            "c AS (SELECT sum(na) OVER w AS ca, sum(nb) OVER w AS cb "
            "FROM g WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)), "
            "t AS (SELECT CAST(sum(a) AS BIGINT) AS n_a, "
            "CAST(sum(b) AS BIGINT) AS n_b FROM x) "
            "SELECT t.n_a, t.n_b, "
            "CAST(max(abs(t.n_b * c.ca - t.n_a * c.cb)) AS BIGINT) "
            "AS d_num, CAST(max(abs(t.n_b * c.ca - t.n_a * c.cb)) "
            "AS DOUBLE) / (t.n_a * t.n_b) AS ks "
            "FROM c, t GROUP BY t.n_a, t.n_b",
        "embedding_coreset": _coreset_sql(5),
        "knn_mmr": _mmr_sql(5, 20),
        "embedding_rp8": _embedding_rp8_sql(),
        "host_mis": _host_mis_sql(),
        "host_neighborhood_fn": _host_neighborhood_fn_sql(),
        "host_harmonic": _host_harmonic_sql(),
        "host_coloring": _host_coloring_sql(),
        "lr_kfold": _lr_kfold_sql(),
        "orders_orc_roundtrip":
            "SELECT o_orderstatus AS status, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE) "
            "* 100) AS BIGINT)) AS BIGINT) AS sum_cents "
            "FROM orders GROUP BY 1 ORDER BY 1",
        "host_communities":
            f"WITH {_LP_SQL_BODY} "
            "SELECT node, lab FROM l4 ORDER BY node",
        "host_modularity":
            f"WITH {_LP_SQL_BODY}, "
            "lab AS (SELECT node, lab FROM l4), "
            "mm AS (SELECT count(*) AS m FROM ee0), "
            "intra AS (SELECT l1.lab AS lab, count(*) AS m_in "
            "FROM ee0 e JOIN lab l1 ON l1.node = e.u "
            "JOIN lab l2 ON l2.node = e.v AND l2.lab = l1.lab "
            "GROUP BY 1), "
            "deg AS (SELECT l.lab, count(*) AS d_tot FROM "
            "(SELECT u AS n FROM ee0 UNION ALL SELECT v FROM ee0) x "
            "JOIN lab l ON l.node = x.n GROUP BY 1) "
            "SELECT d.lab, CAST(COALESCE(i.m_in, 0) AS BIGINT) "
            "AS m_in, CAST(d.d_tot AS BIGINT) AS d_tot, "
            "CAST(4 * mm.m * COALESCE(i.m_in, 0) - "
            "d.d_tot * d.d_tot AS BIGINT) AS q_num "
            "FROM deg d LEFT JOIN intra i USING (lab), mm "
            "ORDER BY d.lab",
        "host_weighted_sssp":
            # recursive-CTE replay; the plant is a DAG so UNION
            # (distinct) terminates
            "WITH RECURSIVE nodes AS (SELECT DISTINCT "
            "CAST(doc_id % 50 AS BIGINT) AS h FROM documents), "
            "e AS (SELECT h AS src, h + 1 AS dst, h % 7 + 1 AS w "
            "FROM nodes WHERE h < 49 UNION ALL "
            "SELECT h, h + 5, 3 FROM nodes "
            "WHERE h % 3 = 0 AND h + 5 < 50), "
            "r AS (SELECT CAST(0 AS BIGINT) AS node, "
            "CAST(0 AS BIGINT) AS d UNION "
            "SELECT e.dst, r.d + e.w FROM r JOIN e ON e.src = r.node) "
            "SELECT node, CAST(min(d) AS BIGINT) AS dist FROM r "
            "GROUP BY 1 ORDER BY 1",
        "event_type_salted_join": _event_type_salted_join_sql(),
        "host_anf_hll": _host_anf_hll_sql(),
        "embedding_scatter": _embedding_scatter_sql(),
        "doc_quality_tree": _doc_quality_tree_sql(),
        "doc_rrf_fusion": _doc_rrf_fusion_sql(),
        "event_value_sampled_quantiles":
            _event_value_sampled_quantiles_sql(),
        "orders_late_ship_priority": _orders_late_ship_priority_sql(),
        "big_orders_top": _big_orders_top_sql(),
        "lineitem_late_by_flag": _lineitem_late_by_flag_sql(),
        "doc_quality_forest": _doc_quality_forest_sql(),
        "doc_quality_boost": _doc_quality_boost_sql(),
        "lr_isotonic": _lr_isotonic_sql(),
    }
