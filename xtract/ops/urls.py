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
