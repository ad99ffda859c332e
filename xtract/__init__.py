"""xtract — a Ray-Data-native web-text main-content extraction engine.

Built from scratch with the capability surface of the reference engine
(cafercangundogdu/tesseract-rs: per-document extraction, layout
hierarchy with spans + confidences, block-type classification,
language detection, multi-format rendering, typed per-document errors,
warm per-worker state — see SURVEY.md), re-targeted at Common-Crawl
style web pages and expressed as ray.data.Dataset pipelines of
map_batches over Arrow batches.

The extraction spec lives in pure, deterministic Python
(`xtract.extract.extract_document`); the sequential oracle
(`xtract.oracle`) and the distributed actor stage (`xtract.actors`)
share that single implementation, which is what makes per-url output
byte-identical under any parallelism.
"""

__version__ = "0.3.0"
