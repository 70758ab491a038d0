"""Large-scale training-data-pipeline extension queries.

Populated in M5 (dedup families, similarity search, text analysis,
multimodal plumbing).
"""
