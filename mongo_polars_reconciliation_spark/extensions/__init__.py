"""Large-scale training-data-pipeline operators (SURVEY.md §2.9).

Beyond reference parity: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding cosine), similarity search (brute-force and IVF),
text analysis (language ID, quality scoring, token counting, fingerprinting),
and multimodal binary-column plumbing. All built on the same join/window/agg
machinery as the reconciliation core — no special-cased tables.
"""
