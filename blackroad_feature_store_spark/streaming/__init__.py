"""Structured Streaming ingest for frequency='streaming' feature groups."""
