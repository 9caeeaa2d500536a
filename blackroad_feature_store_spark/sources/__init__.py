"""Sources/sinks: normalized loaders for the driver's parquet testdata
and helpers for reading/writing the store's tables."""
