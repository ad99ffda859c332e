"""Persist / reload trained pipeline artifacts as parquet so a model
trained on one corpus applies to later jobs without retraining — the
cross-job complement of `ops/dedup_index` (reference parity anchor:
tesseract-rs loads pre-trained `.traineddata` models at init,
`src/api.rs` init_with_data; here the engine's own trained state gets
the same treatment).

Artifacts and their schemas (all plain parquet, versioned by a
`kind` file-level metadata key so a loader fails loudly on the wrong
file):

- BPE merge ranks  → (rank int64, a string, b string)
- token vocabulary → (token_id int64, token string, n int64)
- char-LM cost table → (gram string, microbits int64)

Loads return exactly what the training functions produce, so
``bpe_encode(ds, load_bpe_merges(path))`` is byte-identical to using
the in-session result (tested round-trip).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

_KIND_KEY = b"xtract_artifact_kind"


def _write(table: pa.Table, path: str, kind: str) -> None:
    meta = dict(table.schema.metadata or {})
    meta[_KIND_KEY] = kind.encode()
    pq.write_table(table.replace_schema_metadata(meta), path)


def _read(path: str, kind: str) -> pa.Table:
    t = pq.read_table(path)
    got = (t.schema.metadata or {}).get(_KIND_KEY, b"").decode()
    if got != kind:
        raise ValueError(
            f"{path}: expected artifact kind '{kind}', found "
            f"'{got or 'none'}'")
    return t


def save_bpe_merges(merges: "list[tuple[str, str]]", path: str) -> None:
    _write(pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "a": pa.array([m[0] for m in merges], pa.string()),
        "b": pa.array([m[1] for m in merges], pa.string()),
    }), path, "bpe_merges")


def load_bpe_merges(path: str) -> "list[tuple[str, str]]":
    t = _read(path, "bpe_merges")
    t = t.take(pa.compute.sort_indices(t["rank"]))
    return list(zip(t["a"].to_pylist(), t["b"].to_pylist()))


def save_vocab(vocab: pa.Table, path: str) -> None:
    _write(vocab.select(["token_id", "token", "n"]), path, "vocab")


def load_vocab(path: str) -> pa.Table:
    t = _read(path, "vocab")
    return t.take(pa.compute.sort_indices(t["token_id"]))


def save_lm_table(table: "dict[str, int]", path: str) -> None:
    _write(pa.table({
        "gram": pa.array(list(table), pa.string()),
        "microbits": pa.array(list(table.values()), pa.int64()),
    }), path, "char_lm")


def load_lm_table(path: str) -> "dict[str, int]":
    t = _read(path, "char_lm")
    return dict(zip(t["gram"].to_pylist(), t["microbits"].to_pylist()))
