"""Batch operators: changefeed pipeline, admin/metadata queries, dedup,
similarity search, text analysis, multimodal plumbing."""
