"""Column-level function library (all built-in-function compositions —
no Python UDFs on any hot path)."""
