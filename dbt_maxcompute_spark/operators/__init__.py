"""Training-data pipeline operators (extensions beyond reference parity):
dedup, similarity search, text analysis, multimodal plumbing."""
