"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal columns. All designed for 100 TB inputs: shuffle-on-key only,
no driver-side collection, LSH instead of O(n²) where a scale path is
needed (the exact O(n²) variants exist as oracle-checkable baselines)."""
