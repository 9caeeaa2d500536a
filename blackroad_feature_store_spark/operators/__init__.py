"""DataFrame operator library: as-of/PIT joins, statistics, dedup,
similarity search, text analysis, multimodal plumbing."""
