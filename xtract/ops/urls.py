"""URL canonicalization + canonical-url dedup (crawl-side exact dedup).

Deterministic, pure-string canonicalization (public crawl practice):
lowercase scheme/host, strip default ports, drop fragments, drop known
tracking query params (utm_*, fbclid, gclid), sort remaining query
params, collapse duplicate slashes, strip trailing slash on non-root
paths.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pyarrow as pa

_TRACKING = re.compile(r"^(utm_|fbclid$|gclid$|mc_cid$|mc_eid$|ref$)")
_MULTI_SLASH = re.compile(r"/{2,}")


def canonicalize_url(url: str) -> str:
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = parts.netloc.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = _MULTI_SLASH.sub("/", parts.path) or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    q = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
         if not _TRACKING.match(k.lower())]
    q.sort()
    return urlunsplit((scheme, host, path, urlencode(q), ""))


def add_canonical_url(batch: pa.Table, col: str = "url") -> pa.Table:
    urls = batch[col].to_pylist()
    return batch.append_column(
        "canonical_url", pa.array([canonicalize_url(u or "") for u in urls],
                                  pa.string()))


def dedup_by_canonical_url(ds, col: str = "url"):
    """Keep one row per canonical url (min original url wins —
    deterministic).  Vectorized combiner + coarse co-group
    (``ops.agg.first_row_per_key``): no per-group Python."""
    from .agg import first_row_per_key

    withc = ds.map_batches(lambda b: add_canonical_url(b, col),
                           batch_format="pyarrow")
    return first_row_per_key(withc, "canonical_url", (col,))


def politeness_schedule(ds, host_col: str = "host",
                        url_col: str = "url",
                        order_cols: tuple = (),
                        num_partitions: int = 64):
    """→ input rows + ``fetch_wave:int64``: deterministic crawl-frontier
    scheduling — within each host, urls are ranked 0,1,2,… by
    ``(order_cols…, url)``, and wave k contains at most ONE url per
    host, so fetching wave-by-wave honors per-host politeness (one
    request per host per wave) while keeping every wave maximally wide
    across hosts.  The batch complement of a live frontier queue: at
    100 TB the frontier is a Dataset, not a heap.

    Scale shape: ONE coarse hash co-group by host; rank within each
    host group is a vectorized sort + run-length subtraction (the
    `agg.top_k_per_key` kernel shape, without the truncation).  Skewed
    hosts cost sort time inside one partition, never a driver pull."""
    import numpy as np
    import pyarrow.compute as pc

    from .agg import _hash_part

    order = list(order_cols) + [url_col]

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_part", pa.array(_hash_part(t[host_col], num_partitions),
                              pa.int64()))

    def rank_host(g: pa.Table) -> pa.Table:
        keys = [(host_col, "ascending")] + [(c, "ascending")
                                            for c in order]
        idx = pc.sort_indices(g, sort_keys=keys)
        g = g.take(idx)
        h = g[host_col]
        ne = pc.not_equal(h.slice(1), h.slice(0, len(g) - 1))
        change = np.concatenate([
            [True], pc.fill_null(ne, True).to_numpy(
                zero_copy_only=False).astype(bool)])
        starts = np.flatnonzero(change)
        run_id = np.cumsum(change) - 1
        wave = np.arange(len(g), dtype=np.int64) - starts[run_id]
        return g.drop_columns(["_part"]).append_column(
            "fetch_wave", pa.array(wave, pa.int64()))

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(rank_host, batch_format="pyarrow"))


def url_template_profile(ds, url_col: str = "url",
                         digit_token: str = "N"):
    """→ Dataset(host, template, n_urls, min_url): URL-pattern mining —
    collapse every digit run in the path to ``N`` and count urls per
    (host, template).  The crawl-side template-farm / infinite-space
    detector (one template with millions of urls = a calendar, a
    session-id trap, or a mirror farm — prune before fetching).

    Scale shape: two vectorized Arrow regex kernels per batch (host
    extract + digit collapse), ONE grouped Count/Min — no Python row
    loop, no broadcast."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    def template(t: pa.Table) -> pa.Table:
        u = pc.fill_null(t[url_col].cast(pa.string()), "")
        host = pc.struct_field(pc.extract_regex(
            u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<h>[^/?#]+)"), "h")
        tail = pc.replace_substring_regex(
            u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+", "")
        tmpl = pc.replace_substring_regex(tail, r"[0-9]+", digit_token)
        return pa.table({
            "host": pc.fill_null(host, "").cast(pa.string()),
            "template": tmpl.cast(pa.string()),
            url_col: u})

    return (ds.map_batches(template, batch_format="pyarrow")
            .groupby(["host", "template"])
            .aggregate(Count(alias_name="n_urls"),
                       Min(url_col, alias_name="min_url")))


def waterfill_allocation(counts_ds, budget: int, key: str = "host",
                         count_col: str = "n_urls",
                         alloc_col: str = "alloc"):
    """Per-key crawl-budget WATERFILLING: find the integer threshold
    τ* = max{t ≥ 0 : Σ_h min(c_h, t) ≤ budget} and allocate
    ``min(c_h, τ*)`` to every key — proportional-fair quota assignment
    (small hosts get everything they asked for, big hosts are capped
    at the common water level).  Σ alloc ≤ budget with remainder
    < n_keys (the integer waterline; no fractional redistribution —
    documented).

    Scale shape: τ* is found by BINARY SEARCH with BATCHED candidate
    evaluation — each pass is one streaming scan computing the partial
    sums Σ min(c, t_j) for 64 candidate thresholds at once (per-block
    vectorized clip + fold-tree), so ⌈log₆₄ range⌉ ≈ 2–5 passes reach
    exactness with NO shuffle and O(64) driver ints per pass; the
    final allocation is one more embarrassingly-parallel map.  Nothing
    key-cardinality ever reaches the driver."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    budget = int(budget)
    hi = counts_ds.max(count_col)
    hi = int(hi) if hi is not None else 0
    lo = 0
    counts = counts_ds.materialize()  # scanned once per search pass

    while hi - lo > 1:
        cands = np.unique(np.linspace(lo + 1, hi, 64).astype(np.int64))
        c_ref = ray.put(cands)

        def partial(t: pa.Table, _c=c_ref) -> pa.Table:
            cd = ray.get(_c)
            c = t[count_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sums = np.minimum(c[:, None], cd[None, :]).sum(axis=0)
            return pa.table({
                "j": pa.array(np.arange(len(cd)), pa.int64()),
                "s": pa.array(sums, pa.int64())})

        rows = (counts.map_batches(partial, batch_format="pyarrow")
                .groupby("j").aggregate(Sum("s", alias_name="s"))
                .take_all())  # 64 rows
        total = np.zeros(len(cands), np.int64)
        for r in rows:
            total[int(r["j"])] = int(r["s"])
        ok = np.flatnonzero(total <= budget)
        if len(ok):
            lo = int(cands[ok[-1]])
            nxt = ok[-1] + 1
            hi = int(cands[nxt]) if nxt < len(cands) else hi
            if lo == hi:
                break
        else:
            hi = int(cands[0]) - 1
            if hi <= lo:
                break
    tau = lo if hi <= lo else (hi if _fits(counts, count_col, hi, budget)
                               else lo)

    def alloc(t: pa.Table) -> pa.Table:
        c = t[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            alloc_col, pa.array(np.minimum(c, tau), pa.int64()))

    out = counts.map_batches(alloc, batch_format="pyarrow")
    return tau, out


def _fits(counts, count_col: str, t: int, budget: int) -> bool:
    import numpy as np
    from ray.data.aggregate import Sum

    def clip(b: pa.Table) -> pa.Table:
        c = b[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"s": pa.array(
            [int(np.minimum(c, t).sum())], pa.int64())})

    row = (counts.map_batches(clip, batch_format="pyarrow")
           .aggregate(Sum("s", alias_name="s")))
    return int(row["s"] or 0) <= budget


def mirror_host_pairs(ds, url_col: str = "url", text_col: str = "text",
                      max_hosts_per_content: int = 64,
                      num_partitions: int = 64):
    """→ Dataset(host_a, host_b, shared, jacc_num, jacc_den): content
    MIRROR detection — host pairs ranked by how much of their distinct
    content is byte-identical (Jaccard over content-hash sets as an
    exact integer fraction).  Mirror/aggregator farms waste crawl
    budget and poison dedup statistics; this is the host-level
    complement of document dedup.

    Scale shape:

    1. slim (host, content_hash) projection with block-level pair
       dedup (sort + run length, no Python loop over rows);
    2. ONE hash co-group by content hash emits host PAIRS per shared
       content; contents on more than ``max_hosts_per_content``
       distinct hosts are EXCLUDED (universal boilerplate is not
       mirror evidence, and C(m,2) on a hot content is quadratic —
       documented cap; pair COUNTS matter here, so capped runs drop
       entirely rather than star-reduce);
    3. grouped Sum per pair + per-host distinct-content totals
       (`Count` over the deduped projection), two co-group joins
       attach the totals: num = shared, den = |A| + |B| − shared."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .agg import _hash_part
    from .joins import equi_join_cogroup

    def slim(t: pa.Table) -> pa.Table:
        hosts = pc.struct_field(pc.extract_regex(
            pc.fill_null(t[url_col].cast(pa.string()), ""),
            r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<h>[^/?#]+)"), "h")
        hs = np.fromiter(
            (int.from_bytes(
                hashlib.md5((x or "").encode()).digest()[:8], "big",
                signed=True) for x in t[text_col].to_pylist()),
            np.int64, len(t))
        out = pa.table({"host": pc.fill_null(hosts, "").cast(pa.string()),
                        "chash": pa.array(hs, pa.int64())})
        # block dedup (host, chash)
        idx = pc.sort_indices(out, sort_keys=[("host", "ascending"),
                                              ("chash", "ascending")])
        out = out.take(idx)
        if len(out) <= 1:
            return out
        ne_h = pc.not_equal(out["host"].slice(1),
                            out["host"].slice(0, len(out) - 1))
        ne_c = pc.not_equal(out["chash"].slice(1),
                            out["chash"].slice(0, len(out) - 1))
        ch = pc.fill_null(pc.or_kleene(ne_h, ne_c), True)
        mask = np.concatenate([[True], ch.to_numpy(
            zero_copy_only=False).astype(bool)])
        return out.filter(pa.array(mask))

    pairs_src = ds.map_batches(slim, batch_format="pyarrow").materialize()

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_part", pa.array(_hash_part(t["chash"], num_partitions),
                              pa.int64()))

    def emit_pairs(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("chash", "ascending"),
                                            ("host", "ascending")])
        g = g.take(idx)
        c = g["chash"].to_numpy(zero_copy_only=False)
        hosts = g["host"].to_pylist()
        change = np.concatenate([[True], c[1:] != c[:-1]])
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(c)]
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            # global dedup of (chash, host): the block combiner only
            # dedups within a block, so the same host can recur here —
            # consecutive after the sort, drop repeats
            hh = [h for k, h in enumerate(hosts[s:e])
                  if k == 0 or hosts[s + k - 1] != h]
            m = len(hh)
            if m < 2 or m > max_hosts_per_content:
                continue  # unique content or universal boilerplate
            for i in range(m - 1):
                for j in range(i + 1, m):
                    a_out.append(hh[i])
                    b_out.append(hh[j])
        return pa.table({"host_a": pa.array(a_out, pa.string()),
                         "host_b": pa.array(b_out, pa.string()),
                         "n": pa.array(np.ones(len(a_out), np.int64))})

    shared = (pairs_src.map_batches(add_part, batch_format="pyarrow")
              .groupby("_part")
              .map_groups(emit_pairs, batch_format="pyarrow")
              .groupby(["host_a", "host_b"])
              .aggregate(Sum("n", alias_name="shared")))

    # per-host DISTINCT content totals (global pair dedup — the
    # block combiner alone would overcount across blocks)
    from .agg import count_distinct_per_key

    totals = count_distinct_per_key(pairs_src, "host", "chash")
    totals = totals.map_batches(
        lambda t: pa.table({"host": t["host"],
                            "n_contents": t["n_distinct"]}),
        batch_format="pyarrow")

    out = equi_join_cogroup(shared, totals, on="host_a",
                            right_on="host", num_partitions=num_partitions)
    out = out.map_batches(
        lambda t: pa.table({"host_a": t["host_a"], "host_b": t["host_b"],
                            "shared": t["shared"],
                            "a_total": t["n_contents"]}),
        batch_format="pyarrow")
    out = equi_join_cogroup(out, totals, on="host_b",
                            right_on="host", num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        sh = t["shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        at = t["a_total"].to_numpy(zero_copy_only=False).astype(np.int64)
        bt = t["n_contents"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "host_a": t["host_a"].cast(pa.string()),
            "host_b": t["host_b"].cast(pa.string()),
            "shared": pa.array(sh, pa.int64()),
            "jacc_num": pa.array(sh, pa.int64()),
            "jacc_den": pa.array(at + bt - sh, pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


def change_rate(history_ds, key: str = "url", ts_col: str = "ts",
                fp_col: str = "fingerprint", num_partitions: int = 32):
    """Per-URL content change rate from a recrawl history →
    Dataset(key, n_obs, n_changes, change_rate_ppm): the freshness
    input a recrawl scheduler needs (how often does this page's
    content hash actually change between visits).

    ``n_changes`` counts observations whose fingerprint differs from
    the PREVIOUS observation of the same url (time order, ties broken
    by fingerprint — deterministic); ``change_rate_ppm`` =
    ``1_000_000 * n_changes // (n_obs - 1)`` (0 for a single
    observation; exact integer arithmetic, no floats).

    Shape: the repo's coarse hash co-group (``hash(url) % P``), one
    vectorized pandas pass per partition — sort + shift + one groupby
    agg; Python runs P times, not per url.  Partitioning assumption:
    one url's history fits in one partition (recrawl counts are small
    by construction).
    """
    import numpy as np
    import pandas as pd

    from .joins import _add_key_part

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, fp_col],
                          kind="mergesort").reset_index(drop=True)
        k = g[key].to_numpy()
        fp = g[fp_col].to_numpy()
        same_key = np.zeros(len(g), bool)
        if len(g) > 1:
            same_key[1:] = k[1:] == k[:-1]
        changed = same_key & (fp != np.roll(fp, 1))
        out = pd.DataFrame({key: k, "_c": changed.astype(np.int64)})
        agg = out.groupby(key, sort=False).agg(
            n_obs=(key, "size"), n_changes=("_c", "sum")).reset_index()
        denom = (agg["n_obs"] - 1).clip(lower=1)
        agg["change_rate_ppm"] = (
            1_000_000 * agg["n_changes"] // denom).astype(np.int64)
        agg.loc[agg["n_obs"] == 1, "change_rate_ppm"] = 0
        agg["n_obs"] = agg["n_obs"].astype(np.int64)
        agg["n_changes"] = agg["n_changes"].astype(np.int64)
        return agg

    return (history_ds.select_columns([key, ts_col, fp_col])
            .map_batches(lambda b: _add_key_part(b, key, num_partitions),
                         batch_format="pyarrow")
            .groupby("_part")
            .map_groups(per_partition, batch_format="pandas")
            .select_columns([key, "n_obs", "n_changes",
                             "change_rate_ppm"]))


#: fixed confusable→ASCII skeleton map (a UTS #39 subset: the Cyrillic
#: and Greek letters that render identically to Latin in hostnames).
#: SQL-replicable as a chain of replace() calls over the same pairs.
CONFUSABLES = {
    "а": "a", "е": "e", "о": "o", "р": "p",
    "с": "c", "х": "x", "у": "y", "і": "i",
    "ѕ": "s", "ј": "j",          # Cyrillic а е о р с х у і ѕ ј
    "ο": "o", "α": "a", "ν": "v",  # Greek ο α ν
}
_CONF_TABLE = str.maketrans(CONFUSABLES)


def confusable_skeleton(host: str) -> str:
    """Lowercased host with confusable Unicode letters folded to their
    Latin look-alikes — two hosts with equal skeletons but different
    raw bytes are homograph-attack candidates."""
    return host.lower().translate(_CONF_TABLE)


def homograph_groups(ds, host_col: str = "host"):
    """Homograph (look-alike hostname) detection →
    Dataset(skeleton, host, n_hosts): every host whose confusable
    skeleton is shared by ≥ 2 DISTINCT raw hosts, with the group
    size — the crawl-security screen for spoofed domains.

    Shape: per-block distinct (skeleton, host) combiner → one grouped
    distinct → one co-group by skeleton that emits only ambiguous
    groups (skeleton groups are tiny by construction; nothing
    corpus-proportional leaves the exchange)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Count

    def partial(t: pa.Table) -> pa.Table:
        hosts = t[host_col].to_pylist()
        sk = [confusable_skeleton(h) for h in hosts if h]
        hs = [h for h in hosts if h]
        if not hs:
            return pa.table({"skeleton": pa.array([], pa.string()),
                             "host": pa.array([], pa.string())})
        df = pd.DataFrame({"skeleton": sk, "host": hs}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = (ds.select_columns([host_col])
                .map_batches(partial, batch_format="pyarrow")
                .groupby(["skeleton", "host"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["skeleton", "host"]))

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        counts = g.groupby("skeleton", sort=False)["host"].transform(
            "nunique")
        out = g.assign(n_hosts=counts.astype(np.int64))
        return out[out["n_hosts"] >= 2]

    return (distinct.groupby("skeleton")
            .map_groups(flag, batch_format="pandas"))


#: embedded public-suffix subset: the two-level suffixes under which
#: registrations happen (a deterministic PSL excerpt — the full list
#: is a data file in a real deployment; the RULE is what matters:
#: registrable domain = one label beyond the public suffix).
PSL_2LEVEL = frozenset({
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "com.tr",
    "co.in", "co.kr", "co.za", "co.nz",
    "github.io", "blogspot.com",
})


def registrable_domain(host: str) -> str:
    """Host → its registrable domain (eTLD+1) under the embedded
    public-suffix subset: ``a.b.co.uk`` → ``b.co.uk``,
    ``x.y.example.org`` → ``example.org``; hosts at or below two
    labels pass through.  Lowercases and strips a trailing dot."""
    parts = host.lower().rstrip(".").split(".")
    if len(parts) < 2:
        return host.lower().rstrip(".")
    last2 = ".".join(parts[-2:])
    if last2 in PSL_2LEVEL and len(parts) >= 3:
        return ".".join(parts[-3:])
    return last2


def add_site_column(ds, host_col: str = "host",
                    out_col: str = "site"):
    """Append the registrable-domain column (vectorized batch map, no
    shuffle) — the grouping key that makes per-SITE crawl policy
    possible where per-host would overcount (www./m./cdn. splits)."""
    def mapper(t: pa.Table) -> pa.Table:
        sites = [registrable_domain(h) if h else ""
                 for h in t[host_col].to_pylist()]
        return t.append_column(out_col, pa.array(sites, pa.string()))

    return ds.map_batches(mapper, batch_format="pyarrow")


def param_cardinality(ds, url_col: str = "url"):
    """Per-(host, query-parameter) URL and distinct-value counts — the
    signal behind data-driven canonicalization: a parameter whose
    ``n_values`` ≈ ``n_urls`` is volatile (session ids, cache busters)
    and should be stripped before dedup; a low-cardinality parameter is
    a real content axis (page number, category).  Complements the
    static ``_TRACKING`` blocklist with measured evidence.

    Shape: flat explode to slim (host, param, value) rows with a
    per-block pre-count combiner → native Sum over the (h, p, v) key →
    second native aggregate over (h, p): Count of surviving rows =
    distinct values, Sum of counts = URL occurrences.  Both exchanges
    carry pre-reduced slim string rows only.

    → Dataset(host, param, n_values int64, n_urls int64).
    """
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    def explode(b: pa.Table) -> pa.Table:
        hs: list[str] = []
        ps: list[str] = []
        vs: list[str] = []
        for u in b[url_col].to_pylist():
            if not u:
                continue
            sp = urlsplit(u)
            host = (sp.hostname or "").lower()
            for k, v in parse_qsl(sp.query, keep_blank_values=True):
                hs.append(host)
                ps.append(k)
                vs.append(v)
        if not hs:
            return pa.table({"host": pa.array([], pa.string()),
                             "param": pa.array([], pa.string()),
                             "value": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        cnt = (pd.DataFrame({"host": hs, "param": ps, "value": vs})
               .groupby(["host", "param", "value"], sort=False)
               .size().reset_index(name="n"))
        return pa.table({
            "host": pa.array(cnt["host"], pa.string()),
            "param": pa.array(cnt["param"], pa.string()),
            "value": pa.array(cnt["value"], pa.string()),
            "n": pa.array(cnt["n"], pa.int64())})

    per_value = (ds.map_batches(explode, batch_format="pyarrow")
                 .groupby(["host", "param", "value"])
                 .aggregate(Sum("n", alias_name="n")))
    return (per_value.groupby(["host", "param"])
            .aggregate(Count(alias_name="n_values"),
                       Sum("n", alias_name="n_urls")))
