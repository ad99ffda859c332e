"""Large-scale training-data operations over document corpora.

First-class components alongside the extraction engine: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine),
similarity search (brute-force + IVF), text analysis (language ID,
quality scoring, token counting, fingerprinting) and multimodal column
plumbing.  All built Ray-Data-first: vectorized map_batches, band
explode + groupby for LSH, broadcast query matrices, per-batch partial
top-k merges.
"""
