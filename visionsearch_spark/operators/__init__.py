"""Training-data pipeline operators: deduplication, similarity search,
text analysis, session derivation, multimodal plumbing."""
