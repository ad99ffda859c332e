"""Sequential oracle — the spec implementation goldens are frozen from.

Single-threaded, pure-Python reference run over a corpus: the
conformance anchor (SURVEY §5.2).  It calls the SAME
``extract_document`` the distributed stage calls — divergence between
oracle and pipeline can therefore only come from batching/ordering
bugs, which is exactly what the byte-identity test is for.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable, Optional

from .config import DEFAULT_CONFIG, ExtractionConfig
from .extract import extract_document
from .langdetect import detector_for


def oracle_extract(
    html: Optional[bytes],
    crawl_text: Optional[str] = None,
    lang_hint: Optional[str] = None,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    collect_blocks: bool = False,
) -> dict[str, Any]:
    """Extract one document sequentially (the golden for that document)."""
    return extract_document(html, crawl_text, lang_hint, cfg,
                            collect_blocks=collect_blocks)


def oracle_corpus(
    rows: Iterable[dict[str, Any]],
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    collect_blocks: bool = False,
) -> list[dict[str, Any]]:
    """Sequential run over rows of the ``pages`` schema → golden rows,
    sorted by url (deterministic order)."""
    det = detector_for(cfg)
    out = []
    for r in rows:
        res = extract_document(r.get("html"), r.get("text"), r.get("lang"),
                               cfg, detector=det, collect_blocks=collect_blocks)
        res["url"] = r["url"]
        res["warc_ts"] = r.get("warc_ts")
        out.append(res)
    out.sort(key=lambda d: d["url"])
    return out


def corpus_checksum(results: Iterable[dict[str, Any]]) -> str:
    """Order-independent full-corpus checksum: per-url
    sha256(url || content_text) digests combined by integer sum modulo
    2**256 (commutative ⇒ partition-order independent) — the sequential
    spec for the distributed groupby-url checksum (SURVEY G4)."""
    total = 0
    n = 0
    for r in results:
        h = hashlib.sha256()
        h.update(r["url"].encode("utf-8"))
        h.update(b"\x00")
        h.update(r["content_text"].encode("utf-8"))
        total = (total + int.from_bytes(h.digest(), "big")) % (1 << 256)
        n += 1
    return f"{n}:{total:064x}"
