"""Composed end-to-end training-data pipeline: the full webtext chain.

``webtext_pipeline`` strings together everything a Common-Crawl-scale
training-data job runs, Ray-Data-first, every stage streaming:

    read pages → validate → extract (warm workers, typed errors)
      → corpus-level repeated-line scrub      (ops.linedup)
      → quality gate (length / lang-conf)     (vectorized filter)
      → Gopher repetition gate (dup-line mass) (integer rational compare)
      → PII redaction (email/IP/phone)        (ops.pii)
      → exact dedup by content hash           (salted groupby)
      → final columns ready for tokenization

Returns the surviving documents plus a funnel report (rows in/out per
stage) — the numbers a data-engineering run is judged by.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .config import DEFAULT_CONFIG, ExtractionConfig
from .pipeline import extract_pages


def webtext_pipeline(
    pages_ds,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    min_chars: int = 80,
    line_dedup_max_docs: int = 20,
    require_lang: tuple[str, ...] = (),
    pin_extracted: bool = True,
    max_dup_line_ratio: "tuple[int, int] | None" = (3, 10),
    redact_pii: bool = True,
):
    """→ (clean_ds, funnel: dict[str, int]).

    ``clean_ds`` streams (url, warc_ts, content_text, lang_detected,
    quality flags); ``funnel`` counts survivors per stage (each count
    consumes the lazy stage once — acceptable for reporting; pass the
    returned ds on for the actual write).
    """
    from .ops.dedup import add_content_hash
    from .ops.linedup import drop_repeated_lines

    funnel: dict[str, int] = {}
    extracted = extract_pages(pages_ds, cfg)
    ok = extracted.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok")),
        batch_format="pyarrow")
    # (funnel counts are filled below only where free — i.e. on the
    # pinned intermediate; webtext_funnel adds the rest)

    slim = ok.select_columns(["url", "warc_ts", "content_text",
                              "lang_detected", "lang_conf"])
    if pin_extracted:
        # the line scrub consumes its input twice (document-frequency
        # pass + rewrite pass); unpinned, each pass re-runs the whole
        # read+extract.  Pin the slim projection once (object store,
        # spillable).  Disable only when even extracted text dwarfs
        # local spill capacity — then prefer the job driver's
        # write-then-read shape (pipeline.run_extraction_job).
        slim = slim.materialize()
        funnel["extract_ok"] = slim.count()  # free on the pinned data
    scrubbed = drop_repeated_lines(slim, max_docs=line_dedup_max_docs)

    def quality_gate(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(pc.utf8_length(t["content_text"]), min_chars)
        if require_lang:
            mask = pc.and_(mask, pc.is_in(
                t["lang_detected"], value_set=pa.array(list(require_lang))))
        return t.filter(mask)

    gated = scrubbed.map_batches(quality_gate, batch_format="pyarrow")

    if max_dup_line_ratio is not None:
        # Gopher-style repetition gate: drop documents whose duplicate-
        # line character mass exceeds num/den of all line characters
        # (strict rational compare — no float thresholds, SURVEY §4.3)
        from .ops.textstats import gopher_repetition_batch

        num, den = max_dup_line_ratio

        def repetition_gate(t: pa.Table) -> pa.Table:
            rep = gopher_repetition_batch(t, key="url", col="content_text")
            dup = rep["n_dup_line_chars"].to_numpy(zero_copy_only=False)
            tot = rep["n_line_chars"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(dup * den <= tot * num))

        gated = gated.map_batches(repetition_gate, batch_format="pyarrow")

    if redact_pii:
        from .ops.pii import redact_pii_batch

        gated = gated.map_batches(
            lambda t: redact_pii_batch(t, key="url", col="content_text"),
            batch_format="pyarrow")

    hashed = gated.map_batches(
        lambda t: add_content_hash(t, "content_text"), batch_format="pyarrow")

    from .ops.agg import first_row_per_key

    deduped = first_row_per_key(
        hashed, "content_hash", ("url",)).drop_columns(["content_hash"])
    return deduped, funnel


def webtext_funnel(pages_ds, cfg: ExtractionConfig = DEFAULT_CONFIG, **kw):
    """Run the pipeline and materialize the per-stage funnel counts.
    With the default ``pin_extracted=True`` extraction runs EXACTLY
    once: ``extract_ok`` falls out of the pinned intermediate, and
    ``clean_out`` re-reads only the (cheap) pinned slim columns —
    the round-1 version re-ran the whole read+extract per stage."""
    clean, funnel = webtext_pipeline(pages_ds, cfg, **kw)
    funnel["clean_out"] = clean.count()
    funnel["pages_in"] = pages_ds.count()
    if "extract_ok" not in funnel:  # pin disabled → pay the extra pass
        ex = extract_pages(pages_ds, cfg)
        funnel["extract_ok"] = ex.map_batches(
            lambda t: t.filter(pc.equal(t["status"], "ok")),
            batch_format="pyarrow").count()
    return {"pages_in": funnel["pages_in"],
            "extract_ok": funnel["extract_ok"],
            "clean_out": funnel["clean_out"]}
