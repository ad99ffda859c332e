"""Unicode text normalization for web corpora (the cleaning step every
training-data pipeline runs between extraction and dedup): NFC
composition, invisible-character scrub, whitespace canonicalization.

Rule (applied in order, deliberately explicit so the distributed stage
and the ANSI-SQL oracle agree byte for byte):

1. NFC-normalize (compose combining sequences; Unicode-version-stable
   for the planted fixtures we test on);
2. drop zero-width characters (U+200B/U+200C/U+200D/U+FEFF);
3. map NBSP (U+00A0) to a plain space;
4. collapse runs of ASCII whitespace ``[ \\t\\r\\n\\v\\f]+`` to one
   space (an EXPLICIT class — Python's ``\\s`` is Unicode-wide, RE2's
   is ASCII; naming the class keeps both engines identical);
5. strip leading/trailing spaces.

Reference analogue: tesseract-rs normalizes recognized text before
rendering (src/rendering.rs UNLV fold); this op is the corpus-side
generalization.  Stateless, vectorized over batches via one compiled
regex; no shuffle.
"""
from __future__ import annotations

import re
import unicodedata

import pyarrow as pa

_ZW = dict.fromkeys((0x200B, 0x200C, 0x200D, 0xFEFF))
_NBSP = {0xA0: " "}
_WS_RUN = re.compile(r"[ \t\r\n\v\f]+")


def normalize_text_one(s: "str | None") -> str:
    """Pure per-document rule (oracle-shared shape)."""
    s = unicodedata.normalize("NFC", s or "")
    s = s.translate(_ZW).translate(_NBSP)
    return _WS_RUN.sub(" ", s).strip(" ")


def normalize_text_batch(t: pa.Table, col: str = "text") -> pa.Table:
    texts = t[col].to_pylist()
    out = [normalize_text_one(x) for x in texts]
    changed = [o != (x or "") for o, x in zip(out, texts)]
    t = t.drop_columns([col])
    return (t.append_column(col, pa.array(out, pa.string()))
             .append_column("changed", pa.array(changed, pa.bool_())))


def normalize_text(ds, col: str = "text"):
    """documents Dataset → same rows with ``col`` normalized and a
    ``changed`` flag (streaming map, no shuffle)."""
    return ds.map_batches(lambda b: normalize_text_batch(b, col),
                          batch_format="pyarrow")
