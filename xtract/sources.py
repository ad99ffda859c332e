"""Alternative sources for the ``pages`` table (S-family, SURVEY §2.1).

Parquet is the primary source (``pipeline.read_pages``); these cover
the other ingestion paths a crawl pipeline meets: JSONL exports, CSV
manifests, and raw-file directories (one document per file — the
``process_pages`` file-driver analogue, reference ``src/api.rs:844-875``).
Each normalizes to the canonical pages schema
``(url, warc_ts, html, text, lang)`` so every downstream stage is
source-agnostic.
"""

from __future__ import annotations

import base64
from typing import Optional

import pyarrow as pa

from .synth import EPOCH_US, PAGES_SCHEMA


def _looks_like_document(data: bytes) -> bool:
    """Heuristic gate for the base64 interpretation: decoded bytes must
    resemble an actual page payload (markup tag, PDF magic, or gzip)."""
    head = data[:256].lstrip()
    return (head.startswith(b"<") or b"<" in head[:64]
            or data.startswith(b"%PDF-") or data.startswith(b"\x1f\x8b"))


def _normalize_batch(batch: pa.Table) -> pa.Table:
    """Coerce arbitrary ingested columns to the pages schema.  ``html``
    may arrive as base64 string (JSON transport — honored when an
    ``html_encoding`` column says so, or when the decoded bytes look
    like a document) or utf-8 text."""
    n = len(batch)
    names = batch.column_names

    def col(name):
        return batch[name].to_pylist() if name in names else [None] * n

    urls = col("url")
    htmls = col("html")
    # explicit transport marker wins; otherwise a string html is base64
    # ONLY if it both decodes cleanly AND the decoded bytes look like a
    # document (markup or a PDF) — a short plain-text payload that
    # happens to be valid base64 (e.g. 'Data1234') must NOT be
    # silently decoded into garbage bytes
    enc = col("html_encoding") if "html_encoding" in names else [None] * n
    out_html: list[Optional[bytes]] = []
    for h, e in zip(htmls, enc):
        if h is None:
            out_html.append(None)
        elif isinstance(h, bytes):
            out_html.append(h)
        elif e == "base64":
            try:
                out_html.append(base64.b64decode(h, validate=True))
            except Exception:
                out_html.append(h.encode("utf-8"))
        elif e in ("utf-8", "utf8", "text"):
            out_html.append(h.encode("utf-8"))
        else:
            decoded = None
            try:
                decoded = base64.b64decode(h, validate=True)
            except Exception:
                pass
            if decoded is not None and _looks_like_document(decoded):
                out_html.append(decoded)
            else:
                out_html.append(h.encode("utf-8"))
    tss = col("warc_ts")
    out_ts = [t if t is not None else EPOCH_US for t in tss]
    return pa.table({
        "url": pa.array([u or "" for u in urls], pa.string()),
        "warc_ts": pa.array(out_ts, pa.timestamp("us")),
        "html": pa.array(out_html, pa.binary()),
        "text": pa.array(col("text"), pa.string()),
        "lang": pa.array(col("lang"), pa.string()),
    })


def read_pages_json(paths, **kw):
    """JSONL source: one page object per line; html as base64 or text."""
    import ray.data as rd

    return rd.read_json(paths, **kw).map_batches(
        _normalize_batch, batch_format="pyarrow")


def read_pages_csv(paths, **kw):
    """CSV source (html column utf-8 or base64 — binary-unsafe transports
    should prefer parquet/jsonl)."""
    import ray.data as rd

    return rd.read_csv(paths, **kw).map_batches(
        _normalize_batch, batch_format="pyarrow")


_WARC_SEP = b"\r\n\r\n"


def parse_warc(data: bytes) -> list[dict]:
    """Minimal WARC/1.0 parser (public ISO 28500 format — the actual
    Common-Crawl container): split on record boundaries, keep
    ``response`` records, read WARC-Target-URI / WARC-Date headers, and
    strip the HTTP response header block from the payload.  Deterministic;
    unsupported records are skipped, never fatal."""
    from datetime import datetime, timezone

    rows = []
    # records are separated by \r\n\r\n after Content-Length payload bytes
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(_WARC_SEP, pos)
        if head_end < 0:
            break
        header_blob = data[pos:head_end]
        if not header_blob.lstrip().startswith(b"WARC/"):
            break
        headers: dict[str, str] = {}
        for line in header_blob.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = \
                v.decode("latin-1").strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        body = data[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = EPOCH_US
        date = headers.get("warc-date")
        if date:
            try:
                dt = datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ")
                ts = int(dt.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
            except ValueError:
                pass
        # payload may include an HTTP response header block
        if body.startswith(b"HTTP/"):
            http_end = body.find(_WARC_SEP)
            if http_end >= 0:
                body = body[http_end + 4:]
        rows.append({"url": url, "warc_ts": ts, "html": body,
                     "text": None, "lang": None})
    return rows


def read_pages_warc(paths, **kw):
    """WARC source: one or more ``.warc`` / ``.warc.gz`` files → pages
    rows.  Each file parses inside a task (``read_binary_files``), so a
    directory of WARCs streams with file-level parallelism — the shape
    of a real Common-Crawl ingest."""
    import gzip

    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **kw)

    def parse_batch(batch: pa.Table) -> pa.Table:
        rows = []
        for path, blob in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            if blob[:2] == b"\x1f\x8b":  # still gzip (Ray auto-decompresses
                try:                     # .gz by extension; sniff, don't trust)
                    blob = gzip.decompress(blob)
                except OSError:
                    continue
            rows.extend(parse_warc(blob))
        if not rows:
            return PAGES_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    return ds.map_batches(parse_batch, batch_format="pyarrow", batch_size=1)


def write_warc(rows: list[dict], path: str) -> None:
    """Serialize pages rows to a WARC/1.0 file (test/synthesis helper —
    the inverse of parse_warc, deterministic)."""
    from datetime import datetime, timezone

    out = bytearray()
    for r in rows:
        body = r.get("html") or b""
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        ts = r.get("warc_ts") or EPOCH_US
        if isinstance(ts, datetime):
            dt = ts if ts.tzinfo else ts.replace(tzinfo=timezone.utc)
        else:
            dt = datetime.fromtimestamp(ts / 1e6, tz=timezone.utc)
        head = (f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {r['url']}\r\n"
                f"WARC-Date: {dt.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
                f"Content-Length: {len(http)}").encode("latin-1")
        out += head + _WARC_SEP + http + b"\r\n\r\n"
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_pages_files(paths, **kw):
    """Raw-file directory source: one document per file, url = file path
    (``read_binary_files(include_paths=True)`` — the provenance columns
    of ``set_input_name``, reference ``src/api.rs:381-407``)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **kw)

    def to_pages(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "url": pa.array([f"file://{p}" for p in batch["path"].to_pylist()],
                            pa.string()),
            "warc_ts": pa.array([EPOCH_US] * n, pa.timestamp("us")),
            "html": batch["bytes"].cast(pa.binary()),
            "text": pa.array([None] * n, pa.string()),
            "lang": pa.array([None] * n, pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")


def _unify_types(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Widen two parquet column types (schema-evolution rule): equal →
    keep; both integers → the wider (signedness must match); any
    float with a numeric → float64.  Anything else fails loudly."""
    if a.equals(b):
        return a
    ints = {pa.int8(): 8, pa.int16(): 16, pa.int32(): 32, pa.int64(): 64}
    uints = {pa.uint8(): 8, pa.uint16(): 16, pa.uint32(): 32,
             pa.uint64(): 64}
    floats = (pa.float32(), pa.float64())
    if a in ints and b in ints:
        return a if ints[a] >= ints[b] else b
    if a in uints and b in uints:
        return a if uints[a] >= uints[b] else b
    numerics = set(ints) | set(uints) | set(floats)
    if a in numerics and b in numerics and (a in floats or b in floats):
        return pa.float64()
    raise ValueError(f"cannot unify parquet types {a} and {b}")


def read_union_evolved(paths: "list[str]", **read_kwargs):
    """Read several parquet stores whose schemas DRIFTED (columns
    added or dropped between writes, integers widened) as ONE
    Dataset — the long-lived-corpus reality a fixed-schema
    ``read_parquet([dirs])`` rejects.

    The union schema computes from file FOOTERS only (one per store,
    no data read): column order = first appearance across stores;
    types unify by the widening rule (int widths up, int+float →
    float64, incompatible → loud ``ValueError``).  Each store then
    streams through one vectorized align pass (missing columns →
    typed nulls, checked casts) and plain ``Dataset.union`` chains
    the stores — no shuffle, no materialization.
    """
    import pyarrow.compute as pc  # noqa: F401  (checked casts below)
    import pyarrow.parquet as pq
    import ray.data as rd
    from pyarrow import fs as pafs

    schemas = []
    for p in paths:
        fsys, rel = pafs.FileSystem.from_uri(p) if "://" in p else (
            pafs.LocalFileSystem(), p)
        files = [f.path for f in fsys.get_file_info(
            pafs.FileSelector(rel, recursive=True))
            if f.path.endswith(".parquet")]
        if not files:
            raise ValueError(f"no parquet files under {p}")
        schemas.append(pq.read_schema(files[0], filesystem=fsys))

    names: "list[str]" = []
    types: "dict[str, pa.DataType]" = {}
    for sch in schemas:
        for f in sch:
            if f.name not in types:
                names.append(f.name)
                types[f.name] = f.type
            else:
                types[f.name] = _unify_types(types[f.name], f.type)
    unified = pa.schema([(n, types[n]) for n in names])

    def aligner(sch_cols: "frozenset[str]"):
        def align(b: pa.Table) -> pa.Table:
            cols = []
            for n in names:
                if n in b.column_names:
                    cols.append(b[n].cast(types[n]))
                else:
                    cols.append(pa.nulls(len(b), types[n]))
            return pa.Table.from_arrays(cols, schema=unified)
        return align

    out = None
    for p, sch in zip(paths, schemas):
        ds = rd.read_parquet(p, **read_kwargs).map_batches(
            aligner(frozenset(sch.names)), batch_format="pyarrow")
        out = ds if out is None else out.union(ds)
    return out
