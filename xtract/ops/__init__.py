"""Large-scale training-data operations over document corpora.

First-class components alongside the extraction engine: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine, line/
paragraph/substring, cross-job exact + near-dup indexes), similarity
search (brute force, IVF, persisted partition-pruned IVF, SQ8 and
IVF-SQ8 compressed), text analysis (language ID, quality scoring,
token stats, fingerprinting, BPE, n-gram LM, collocations, readability),
relational composition (co-group joins, windows, quantiles, sketches,
grouped top-N), storage layouts (sorted/z-order/similarity-clustered,
versioned store with MERGE/CDC/time travel), streaming windows, crawl
ops (robots/sitemaps/crawl-delay, politeness scheduling, budget
waterfilling, URL templates, mirror detection, PageRank/HITS/triangles),
curation sampling (mixture upsampling, hash/content splits, quality and
per-stratum sampling) and multimodal near-dup (BMP/WAV/XRAW codecs +
perceptual hashes).  All built Ray-Data-first: vectorized map_batches,
block combiners before every exchange, coarse hash co-groups,
count-gated broadcasts, per-batch partial top-k merges.
"""
