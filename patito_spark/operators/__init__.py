"""Dataset-level operators: deduplication, similarity search, multimodal."""
