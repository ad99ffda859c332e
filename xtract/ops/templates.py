"""DOM template detection: structural fingerprints over tag paths.

Pages rendered from the same server-side template share their element
structure while differing in text and attribute values.  The
fingerprint is a 64-bit hash of the SORTED MULTISET of root-to-element
tag paths (``html/body/div/p``) from a lenient stack walk over the
shared tokenizer — text, attributes, comments and declarations do not
contribute, so a template's fingerprint is invariant across its pages.
The downstream uses are boilerplate discovery (one extraction rule per
template, not per page) and crawl dedup (re-crawling a template
variant adds no layout information).

Scale shape: the fingerprint pass is a stateless streaming
``map_batches`` (one walk per page, bounded stack); clustering is ONE
grouped Count over (host, template_fp) — dimension-bounded output —
and the per-host rollup is a second small grouped aggregate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..dom import VOID_ELEMENTS
from ..html_tokenizer import tokenize

_MAX_DEPTH = 64


def template_fp_one(html: bytes) -> int:
    """64-bit structural fingerprint of one page (pure function)."""
    stack: list[str] = []
    paths: list[str] = []
    for tok in tokenize(html):
        kind = tok[0]
        if kind == "start":
            tag = tok[3]
            selfclose = tok[5]
            if len(stack) < _MAX_DEPTH:
                paths.append("/".join(stack + [tag]))
            if not selfclose and tag not in VOID_ELEMENTS:
                stack.append(tag)
        elif kind == "end":
            tag = tok[3]
            if tag in stack:
                # lenient recovery: pop to the innermost match
                while stack and stack[-1] != tag:
                    stack.pop()
                if stack:
                    stack.pop()
    digest = hashlib.blake2b("\n".join(sorted(paths)).encode(),
                             digest_size=8).digest()
    return int.from_bytes(digest, "big") >> 1  # fits int64


def _host_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    return rest.split("/", 1)[0].lower()


def page_templates(ds, url_col: str = "url", html_col: str = "html"):
    """pages Dataset → (url, host, template_fp:int64), streaming."""
    def fp_batch(b: pa.Table) -> pa.Table:
        urls = b[url_col].to_pylist()
        htmls = b[html_col].to_pylist()
        fps = np.fromiter((template_fp_one(h or b"") for h in htmls),
                          np.int64, count=len(htmls))
        hosts = [_host_of(u or "") for u in urls]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "template_fp": pa.array(fps, pa.int64())})

    return ds.map_batches(fp_batch, batch_format="pyarrow")


def template_host_stats(pages_fp_ds):
    """(url, host, template_fp) → per-host template profile:
    (host, n_pages, n_templates, top_template_pages).  Two grouped
    aggregates over dimension-bounded key spaces."""
    from ray.data.aggregate import Count, Max, Sum

    per_tpl = (pages_fp_ds.groupby(["host", "template_fp"])
               .aggregate(Count(alias_name="n")))
    return (per_tpl.groupby("host")
            .aggregate(Sum("n", alias_name="n_pages"),
                       Count(alias_name="n_templates"),
                       Max("n", alias_name="top_template_pages")))
