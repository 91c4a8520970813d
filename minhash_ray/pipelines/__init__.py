"""End-to-end pipelines: clips near-dup dedup, text analysis, text dedup,
ANN similarity search, relational ops, multimodal plumbing."""
