"""Index build paths: naive DataFrame-only (the Spark-level oracle) and the
optimized SPIMI + compressed-segment path."""
