"""Operator layer: the engine's query surface.

- ``relational``  : SURVEY.md §2 core surface + general relational
                    queries (joins, aggs, windows, set ops, scalars)
- ``window_ops``  : keep-latest-per-key, as-of join
- ``dedup``       : exact + near-duplicate detection (MinHash-LSH,
                    SimHash, n-gram Jaccard, embedding cosine)
- ``similarity``  : cosine top-k search (brute force + LSH buckets)
- ``text``        : language-ID, quality scoring, token counts,
                    fingerprinting
- ``multimodal``  : binary media columns + typed metadata plumbing
"""

from .window_ops import keep_latest_per_key, asof_join  # noqa: F401
