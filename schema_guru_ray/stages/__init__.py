"""Per-batch kernels for Ray Data ``map_batches``: schema derivation, column
profiling, audio validation, dedup, text analysis, similarity search."""
