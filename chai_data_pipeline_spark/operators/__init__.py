"""Reusable dataflow operators: merge/upsert, windows, dedup, similarity,
text analysis, multimodal plumbing."""
