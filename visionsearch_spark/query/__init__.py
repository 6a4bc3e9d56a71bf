"""Query paths: naive DataFrame BM25 (index/naive.py) and the optimized
block-max vectorized traversal over compressed segments (wand.py)."""
