"""Actor-pool batch stages — the warm-engine workers.

Reference analogue: ``init(datapath, language)`` loads models ONCE per
engine (``src/api.rs:71-97``), ``try_clone()`` replicates the config to
more threads (``src/api.rs:1423-1446``).  Ours: a callable class whose
``__init__`` builds the warm state (lang-detect tables, compiled
regexes, vocab) from a frozen ``ExtractionConfig``, passed to
``ds.map_batches(Extractor, fn_constructor_kwargs=..., concurrency=N)``
— Ray constructs N actors, each running ``__call__`` per batch.  Every
``__call__`` is stateless w.r.t. the previous batch (the ``clear()``
rule, ``src/api.rs:971-992``).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa

from .config import DEFAULT_CONFIG, ExtractionConfig
from .extract import extract_document
from .hierarchy import explode_blocks_into, new_hierarchy_columns
from .langdetect import detector_for

SPAN_T = pa.list_(pa.struct([("start", pa.int64()), ("end", pa.int64())]))

EXTRACTED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("content_text", pa.string()),
    ("content_spans", SPAN_T),
    ("doc_kind", pa.string()),
    ("lang_detected", pa.string()),
    ("lang_conf", pa.float32()),
    ("text_dir", pa.string()),
    ("script", pa.string()),
    ("script_conf", pa.float32()),
    ("mean_conf", pa.float32()),
    ("n_blocks_kept", pa.int32()),
    ("n_blocks_dropped", pa.int32()),
    ("status", pa.string()),
    ("error", pa.string()),
    ("html_len", pa.int64()),
    ("lang_alternatives",
     pa.list_(pa.struct([("lang", pa.string()), ("conf", pa.float32())]))),
])

BLOCKS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("block_id", pa.int32()),
    ("parent_path", pa.string()),
    ("level", pa.string()),
    ("block_type", pa.string()),
    ("text", pa.string()),
    ("span_start", pa.int64()),
    ("span_end", pa.int64()),
    ("is_content", pa.bool_()),
    ("confidence", pa.float32()),
    ("link_density", pa.float32()),
    ("text_density", pa.float32()),
    ("depth", pa.int32()),
    ("justification", pa.string()),
    ("is_list_item", pa.bool_()),
    ("is_bold", pa.bool_()),
    ("is_italic", pa.bool_()),
    ("is_mono", pa.bool_()),
    ("has_sup", pa.bool_()),
    ("has_sub", pa.bool_()),
    ("heading_level", pa.int32()),
    ("lang", pa.string()),
    ("dir", pa.string()),
    ("line_id", pa.int32()),
    ("word_id", pa.int32()),
    ("is_first_in_parent", pa.bool_()),
    ("is_last_in_parent", pa.bool_()),
    ("is_dict_word", pa.bool_()),
    ("is_numeric", pa.bool_()),
    # per-node choice lattice (src/choice_iterator.rs:30-71): ranked
    # block-type alternatives, conf desc; first == block_type
    ("alternatives",
     pa.list_(pa.struct([("label", pa.string()), ("conf", pa.float32())]))),
])


def _col(batch: pa.Table, name: str) -> Optional[list]:
    return batch[name].to_pylist() if name in batch.column_names else None


class Extractor:
    """Stateful extraction worker: one instance per actor, state built once.

    ``loaded_langs()`` mirrors ``get_loaded_languages``
    (``src/api.rs:882-922``)."""

    def __init__(self, cfg: ExtractionConfig | str = DEFAULT_CONFIG,
                 lenient: bool = False) -> None:
        if isinstance(cfg, str):
            cfg = ExtractionConfig.from_json(cfg)
        self.cfg = cfg
        self.lenient = lenient  # retry-config pass (C2)
        # warm tables, honoring cfg.langs (init(language) restriction)
        self.detector = detector_for(cfg)
        self._n_docs = 0  # renderer image-counter analogue (progress metric)

    def loaded_langs(self) -> tuple[str, ...]:
        return self.detector.langs

    def available_langs(self) -> tuple[str, ...]:
        """Discoverable (not merely loaded) languages — built-ins plus
        ``cfg.assets_dir`` tables (``get_available_languages`` analogue,
        reference ``src/api.rs:882-922``)."""
        from .langdetect import available_langs

        return available_langs(self.cfg.assets_dir or None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        n = len(urls)
        tss = _col(batch, "warc_ts") or [None] * n
        htmls = _col(batch, "html") or [None] * n
        texts = _col(batch, "text") or [None] * n
        langs = _col(batch, "lang") or [None] * n
        cols: dict[str, list] = {name: [] for name in (
            "content_text", "doc_kind", "lang_detected", "lang_conf",
            "text_dir", "script", "script_conf", "mean_conf",
            "n_blocks_kept", "n_blocks_dropped", "status", "error",
            "html_len")}
        # nested columns built flat (offsets + child arrays): no per-row
        # Python dicts on the hot path
        span_offsets = np.empty(n + 1, np.int32)
        span_offsets[0] = 0
        span_starts: list[int] = []
        span_ends: list[int] = []
        alt_offsets = np.empty(n + 1, np.int32)
        alt_offsets[0] = 0
        alt_langs: list[str] = []
        alt_confs: list[float] = []
        debug_html: list[str] = []  # cleaned_html column under cfg.debug (M10)
        for i, (url, html, text, lang) in enumerate(zip(urls, htmls, texts, langs)):
            if url is None or url == "":
                r: dict[str, Any] = {
                    "content_text": "", "content_spans": [], "doc_kind": "error",
                    "lang_detected": "und", "lang_conf": 0.0, "text_dir": "ltr",
                    "mean_conf": 0.0, "n_blocks_kept": 0, "n_blocks_dropped": 0,
                    "script": "Unknown", "script_conf": 0.0,
                    "status": "invalid", "error": "null url",
                    "lang_alternatives": [],
                }
            else:
                r = extract_document(html, text, lang, self.cfg,
                                     detector=self.detector,
                                     lenient=self.lenient)
            for s, e in r["content_spans"]:
                span_starts.append(s)
                span_ends.append(e)
            span_offsets[i + 1] = len(span_starts)
            for l, c in r.get("lang_alternatives", []):
                alt_langs.append(l)
                alt_confs.append(c)
            alt_offsets[i + 1] = len(alt_langs)
            cols["content_text"].append(r["content_text"])
            cols["doc_kind"].append(r["doc_kind"])
            cols["lang_detected"].append(r["lang_detected"])
            cols["lang_conf"].append(r["lang_conf"])
            cols["text_dir"].append(r["text_dir"])
            cols["script"].append(r.get("script", "Unknown"))
            cols["script_conf"].append(r.get("script_conf", 0.0))
            cols["mean_conf"].append(r["mean_conf"])
            cols["n_blocks_kept"].append(r["n_blocks_kept"])
            cols["n_blocks_dropped"].append(r["n_blocks_dropped"])
            cols["status"].append(r["status"])
            cols["error"].append(r["error"])
            cols["html_len"].append(len(html) if html else 0)
            if self.cfg.debug:
                debug_html.append(r.get("cleaned_html", ""))
        self._n_docs += n
        spans_arr = pa.ListArray.from_arrays(
            pa.array(span_offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(span_starts, pa.int64()),
                 pa.array(span_ends, pa.int64())], ["start", "end"]))
        alts_arr = pa.ListArray.from_arrays(
            pa.array(alt_offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(alt_langs, pa.string()),
                 pa.array(alt_confs, pa.float32())], ["lang", "conf"]))
        arrays = [
            pa.array([u or "" for u in urls], pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(cols["content_text"], pa.string()),
            spans_arr,
            pa.array(cols["doc_kind"], pa.string()),
            pa.array(cols["lang_detected"], pa.string()),
            pa.array(cols["lang_conf"], pa.float32()),
            pa.array(cols["text_dir"], pa.string()),
            pa.array(cols["script"], pa.string()),
            pa.array(cols["script_conf"], pa.float32()),
            pa.array(cols["mean_conf"], pa.float32()),
            pa.array(cols["n_blocks_kept"], pa.int32()),
            pa.array(cols["n_blocks_dropped"], pa.int32()),
            pa.array(cols["status"], pa.string()),
            pa.array(cols["error"], pa.string()),
            pa.array(cols["html_len"], pa.int64()),
            alts_arr,
        ]
        t = pa.Table.from_arrays(arrays, schema=EXTRACTED_SCHEMA)
        if self.cfg.debug:
            # debug intermediate (get_thresholded_image analogue,
            # src/api.rs:445-456): extra column, canonical schema untouched
            t = t.append_column("cleaned_html",
                                pa.array(debug_html, pa.string()))
        if self.cfg.keep_input:
            # set_input_image/get_input_image round-trip analogue
            # (src/api.rs:675-697): the raw input payload rides through
            # byte-identical (zero-copy from the incoming batch when the
            # column exists; null stays null — per-row NullPointerError
            # analogue)
            if "html" in batch.column_names:
                raw = batch["html"].combine_chunks().cast(pa.binary())
            else:
                raw = pa.nulls(n, pa.binary())
            t = t.append_column("input_bytes", raw)
        return t


_WORKER_EXTRACTORS: dict[str, "Extractor"] = {}


def clear_worker_cache() -> int:
    """Reset the per-worker engine cache (the
    ``clear_adaptive_classifier`` analogue, reference
    ``src/api.rs:957-964``): cached state is derived-deterministic only,
    so clearing can never change outputs — it just frees memory /
    forces rebuild after an asset update.  Returns entries dropped."""
    n = len(_WORKER_EXTRACTORS)
    _WORKER_EXTRACTORS.clear()
    return n


_WORKER_EXPLODERS: dict[tuple, "BlocksExploder"] = {}


def explode_batch_task(batch: pa.Table, cfg_json: str,
                       levels: tuple[str, ...]) -> pa.Table:
    """Stateless-task variant of the BlocksExploder stage with WARM
    per-worker state (same pattern as ``extract_batch_task`` — measured
    faster than an actor pool for short jobs because there is no pool
    ramp and no reserved CPUs)."""
    key = (cfg_json, tuple(levels))
    ex = _WORKER_EXPLODERS.get(key)
    if ex is None:
        ex = _WORKER_EXPLODERS[key] = BlocksExploder(cfg_json, tuple(levels))
    return ex(batch)


def extract_batch_task(batch: pa.Table, cfg_json: str) -> pa.Table:
    """Stateless-task variant of the Extractor stage with WARM per-worker
    state: Ray worker processes persist across tasks, so the configured
    engine (lang tables, compiled regexes) is built once per worker
    process and reused for every subsequent batch — the same
    warm-across-batches property as an actor pool (A1/A7), with the
    elasticity of tasks (no pool ramp, no reserved CPUs).  Used for the
    throughput-critical flagship path; the ``Extractor`` actor class
    remains the pattern for heavy state (models too big to rebuild)."""
    ex = _WORKER_EXTRACTORS.get(cfg_json)
    if ex is None:
        ex = _WORKER_EXTRACTORS[cfg_json] = Extractor(cfg_json)
    return ex(batch)


class BlocksExploder:
    """Actor stage: pages → hierarchy rows (H1-H17).  ``levels`` selects
    which RIL levels to emit; ``segment_only`` in the config gives the
    analyse_layout (structure-only) pass."""

    def __init__(self, cfg: ExtractionConfig | str = DEFAULT_CONFIG,
                 levels: tuple[str, ...] = ("block",)) -> None:
        if isinstance(cfg, str):
            cfg = ExtractionConfig.from_json(cfg)
        self.cfg = cfg
        self.levels = tuple(levels)
        self.detector = detector_for(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = _col(batch, "html") or [None] * len(urls)
        texts = _col(batch, "text") or [None] * len(urls)
        # columnar accumulation across the whole batch — one Arrow build,
        # no per-row dicts (the flat-builder pattern of Extractor.__call__)
        cols = new_hierarchy_columns()
        for url, html, text in zip(urls, htmls, texts):
            if not url:
                continue
            r = extract_document(html, text, None, self.cfg,
                                 detector=self.detector, collect_blocks=True)
            explode_blocks_into(url, r["blocks"], self.levels, cols,
                                detector=self.detector)
        if not cols["url"]:
            return BLOCKS_SCHEMA.empty_table()
        arrays = [pa.array(cols[f.name], f.type) for f in BLOCKS_SCHEMA]
        return pa.Table.from_arrays(arrays, schema=BLOCKS_SCHEMA)
