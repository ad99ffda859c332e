"""robots.txt crawl-policy application — parse per-host robots files
and decide per-url fetch permission at corpus scale.

The crawl-side policy surface every web pipeline needs next to URL
canonicalization (``ops/urls``) and head-meta robots flags
(``links.extract_head_meta``): given the crawl's fetched
``robots.txt`` bodies (one per host) and the page table, label every
url allowed/denied for a given user agent.

Semantics (deterministic subset of the public REP spec, RFC 9309):

- a *group* is one or more consecutive ``User-agent:`` lines followed
  by ``Allow:`` / ``Disallow:`` rules;
- if any group names our agent (case-insensitive exact value match),
  the union of those groups' rules applies; otherwise the union of the
  ``*`` groups; otherwise everything is allowed;
- rules are plain path prefixes (no ``*``/``$`` wildcards — documented
  simplification); an empty rule value is ignored;
- the LONGEST matching prefix decides; on a tie Allow wins; no match →
  allowed.  ``#`` starts a comment anywhere on a line.

Distribution shape: hash co-group BOTH sides by host (robots bodies at
crawl scale are one per host — far too many to broadcast), parse each
host's file once per partition, then one vectorized
``np.char.startswith`` per (host, rule) over that host's url paths —
no per-url Python loop.  Hosts with no robots row default to allowed.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def parse_robots(txt: str, agent: str) -> list[tuple[str, bool]]:
    """→ [(path_prefix, allow)] rules that apply to ``agent``,
    sorted by (prefix length, allow) ascending — apply in order with
    a ``>= best_len`` update and you get longest-match, tie→allow."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    collecting_agents = False
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not collecting_agents:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                collecting_agents = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            collecting_agents = False
            if cur_agents and val:
                cur_rules.append((val, key == "allow"))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    specific = [r for agents, rules in groups if agent in agents
                for r in rules]
    chosen = specific or [r for agents, rules in groups if "*" in agents
                          for r in rules]
    return sorted(chosen, key=lambda r: (len(r[0]), r[1]))


def robots_allowed(rules: list[tuple[str, bool]],
                   paths: np.ndarray) -> np.ndarray:
    """Vectorized longest-prefix decision for one host's url paths."""
    allowed = np.ones(len(paths), dtype=bool)
    best = np.full(len(paths), -1, dtype=np.int64)
    for prefix, allow in rules:
        m = np.char.startswith(paths, prefix)
        upd = m & (len(prefix) >= best)
        allowed[upd] = allow
        best[upd] = len(prefix)
    return allowed


def split_host_path(url: str) -> tuple[str, str]:
    try:
        parts = urlsplit(url or "")
    except ValueError:
        return "", "/"
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    return parts.netloc.lower(), path


def apply_robots(pages_ds, robots_ds, agent: str = "*",
                 url_col: str = "url", robots_col: str = "robots_txt",
                 host_col: str = "host", num_partitions: int = 32,
                 num_salts: int = 1):
    """→ (url, host, path, crawl_allowed) for every page row.

    Co-group by host (see module docstring for the scale rationale);
    each partition parses its hosts' robots bodies once and runs
    vectorized prefix matching over the urls.

    Hot-host skew: the per-url decision is independent given the rules,
    so with ``num_salts=R`` each page row is salted by a url hash into
    one of R sub-partitions per host while every robots row (ONE small
    row per host) is replicated into all R — a viral host's 10⁹ urls
    spread over R partitions at the cost of R copies of its rule
    text.  Results are identical for any R (tested)."""
    import pandas as pd

    from .agg import _hash_part

    def tag_pages(b: pa.Table) -> pa.Table:
        urls = b[url_col].to_pylist()
        hp = [split_host_path(u) for u in urls]
        hosts = pa.array([h for h, _ in hp], pa.string())
        t = pa.table({
            "_host": hosts,
            "_side": pa.array(np.zeros(len(b), np.int8)),
            "url": pa.array(urls, pa.string()),
            "path": pa.array([p for _, p in hp], pa.string()),
            "robots": pa.nulls(len(b), pa.string()),
        })
        part = _hash_part(hosts, num_partitions)
        if num_salts > 1:
            salt = (pd.util.hash_array(np.asarray(urls, dtype=object))
                    % num_salts).astype(np.int64)
            part = part * num_salts + salt
        return t.append_column("_part", pa.array(part, pa.int64()))

    def tag_robots(b: pa.Table) -> pa.Table:
        hosts = pc.utf8_lower(pc.fill_null(b[host_col], ""))
        t = pa.table({
            "_host": hosts,
            "_side": pa.array(np.ones(len(b), np.int8)),
            "url": pa.nulls(len(b), pa.string()),
            "path": pa.nulls(len(b), pa.string()),
            "robots": pc.cast(b[robots_col], pa.string()),
        })
        part = _hash_part(t["_host"], num_partitions)
        if num_salts > 1:
            n = len(t)
            rep = np.repeat(np.arange(n), num_salts)
            t = t.take(pa.array(rep))
            part = (np.repeat(part * num_salts, num_salts)
                    + np.tile(np.arange(num_salts, dtype=np.int64), n))
        return t.append_column("_part", pa.array(part, pa.int64()))

    both = pages_ds.select_columns([url_col]).map_batches(
        tag_pages, batch_format="pyarrow").union(
        robots_ds.select_columns([host_col, robots_col]).map_batches(
            tag_robots, batch_format="pyarrow"))

    def per_partition(t: pa.Table) -> pa.Table:
        side = t["_side"]
        rt = t.filter(pc.equal(side, 1))
        rules_by_host = {h: parse_robots(x, agent) for h, x in
                         zip(rt["_host"].to_pylist(),
                             rt["robots"].to_pylist())}
        pt = t.filter(pc.equal(side, 0))
        if len(pt) == 0:
            return pa.table({"url": pa.array([], pa.string()),
                             "host": pa.array([], pa.string()),
                             "path": pa.array([], pa.string()),
                             "crawl_allowed": pa.array([], pa.bool_())})
        hosts = np.asarray(pt["_host"].to_pylist(), dtype=object)
        paths = np.asarray(pt["path"].to_pylist(), dtype=str)
        allowed = np.ones(len(pt), dtype=bool)
        order = np.argsort(hosts, kind="stable")
        sh = hosts[order]
        bounds = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1], True])
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            rules = rules_by_host.get(sh[lo])
            if rules:
                sel = order[lo:hi]
                allowed[sel] = robots_allowed(rules, paths[sel])
        return pa.table({"url": pt["url"], "host": pt["_host"],
                         "path": pt["path"],
                         "crawl_allowed": pa.array(allowed)})

    return both.groupby("_part").map_groups(per_partition,
                                            batch_format="pyarrow")


def extract_sitemaps(robots_ds, host_col: str = "host",
                     robots_col: str = "robots_txt"):
    """Harvest ``Sitemap:`` declarations from per-host robots.txt
    bodies — the crawl-frontier seed surface next to ``apply_robots``.

    → (host, rank, sitemap_url) in document order per host (``rank``
    0-based).  Sitemap lines are cross-group per the REP spec, so no
    agent selection applies; ``#`` comments stripped as in
    ``parse_robots``.  Stateless streaming flat explode — no shuffle."""
    def explode(b: pa.Table) -> pa.Table:
        hosts_out: list[str] = []
        ranks: list[int] = []
        urls: list[str] = []
        for h, txt in zip(b[host_col].to_pylist(), b[robots_col].to_pylist()):
            rank = 0
            for raw in (txt or "").splitlines():
                line = raw.split("#", 1)[0].strip()
                key, _, val = line.partition(":")
                if key.strip().lower() == "sitemap" and val.strip():
                    hosts_out.append(h or "")
                    ranks.append(rank)
                    urls.append(val.strip())
                    rank += 1
        return pa.table({"host": pa.array(hosts_out, pa.string()),
                         "rank": pa.array(ranks, pa.int64()),
                         "sitemap_url": pa.array(urls, pa.string())})

    return robots_ds.map_batches(explode, batch_format="pyarrow")


def parse_crawl_delay(txt: str, agent: str) -> "int | None":
    """→ the Crawl-delay (whole milliseconds) the selected agent group
    declares, or None.  Group selection mirrors `parse_robots`
    (specific agent overrides ``*``); a group's LAST crawl-delay line
    wins; fractional seconds keep millisecond precision (integer —
    no float in the value chain)."""
    agent = agent.lower()
    groups: list[tuple[list[str], "int | None"]] = []
    cur_agents: list[str] = []
    cur_delay: "int | None" = None
    collecting_agents = False
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not collecting_agents:
                if cur_agents:
                    groups.append((cur_agents, cur_delay))
                cur_agents, cur_delay = [], None
                collecting_agents = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow", "crawl-delay"):
            collecting_agents = False
            if key == "crawl-delay" and cur_agents:
                try:
                    # integer milliseconds: "1.5" → 1500, "2" → 2000
                    whole, _, frac = val.partition(".")
                    ms = int(whole or 0) * 1000
                    if frac:
                        ms += int((frac + "000")[:3])
                    cur_delay = ms
                except ValueError:
                    pass
    if cur_agents:
        groups.append((cur_agents, cur_delay))

    for agents, d in groups:
        if agent in agents and d is not None:
            return d
    for agents, d in groups:
        if "*" in agents and d is not None:
            return d
    return None


def extract_crawl_delays(robots_ds, agent: str = "*",
                         host_col: str = "host",
                         robots_col: str = "robots_txt",
                         default_ms: int = 0):
    """→ Dataset(host, crawl_delay_ms): per-host politeness interval
    from robots.txt — the rate input `urls.politeness_schedule`'s
    waves are spaced by.  Stateless streaming map, no shuffle."""
    def per_host(b: pa.Table) -> pa.Table:
        hosts = b[host_col].to_pylist()
        delays = [parse_crawl_delay(t, agent)
                  for t in b[robots_col].to_pylist()]
        return pa.table({
            "host": pa.array([h or "" for h in hosts], pa.string()),
            "crawl_delay_ms": pa.array(
                [default_ms if d is None else d for d in delays],
                pa.int64())})

    return robots_ds.map_batches(per_host, batch_format="pyarrow")


def parse_sitemap_xml(body: bytes) -> list[tuple[str, str, str]]:
    """→ [(kind, loc, lastmod)] from a sitemap XML body, kind ∈
    {'url', 'sitemap'} (urlset entries vs sitemapindex children) —
    parsed with the SAME tokenizer walk as the HTML surfaces (never
    raises on malformed input; unterminated entries are recovered at
    EOF).  ``lastmod`` is the raw declared string ('' when absent)."""
    from ..html_tokenizer import tokenize

    out: list[tuple[str, str, str]] = []
    kind = ""            # current container: url | sitemap | ''
    field = ""           # current leaf: loc | lastmod | ''
    loc_parts: list[str] = []
    mod_parts: list[str] = []

    def close_entry() -> None:
        nonlocal loc_parts, mod_parts
        loc = "".join(loc_parts).strip()
        if kind and loc:
            out.append((kind, loc, "".join(mod_parts).strip()))
        loc_parts, mod_parts = [], []

    for tok in tokenize(body):
        t = tok[0]
        if t == "start":
            tag = tok[3]
            if tag in ("url", "sitemap"):
                if kind:
                    close_entry()  # unterminated previous entry
                kind = tag
            elif tag in ("loc", "lastmod") and kind:
                field = tag
        elif t == "end":
            tag = tok[3]
            if tag in ("loc", "lastmod"):
                field = ""
            elif tag in ("url", "sitemap") and kind:
                close_entry()
                kind = ""
        elif t == "text" and field and kind:
            raw = body[tok[1]:tok[2]]
            (loc_parts if field == "loc" else mod_parts).append(
                raw.decode("utf-8", "replace"))
    if kind:
        close_entry()  # entry ran to EOF
    return out


def extract_sitemap_entries(sitemaps_ds, host_col: str = "host",
                            body_col: str = "sitemap_xml"):
    """→ Dataset(host, kind, loc, lastmod): flat explode of fetched
    sitemap XML bodies — the frontier-seed surface downstream of
    `extract_sitemaps` (which finds the sitemap urls in robots.txt).
    Stateless streaming map, no shuffle."""
    def explode(b: pa.Table) -> pa.Table:
        hosts, kinds, locs, mods = [], [], [], []
        for h, body in zip(b[host_col].to_pylist(),
                           b[body_col].to_pylist()):
            if isinstance(body, str):
                body = body.encode()
            for kind, loc, mod in parse_sitemap_xml(body or b""):
                hosts.append(h or "")
                kinds.append(kind)
                locs.append(loc)
                mods.append(mod)
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "loc": pa.array(locs, pa.string()),
            "lastmod": pa.array(mods, pa.string())})

    return sitemaps_ds.map_batches(explode, batch_format="pyarrow")
