"""spark-submit entry point: full index compaction (LSM maintenance).

    spark-submit --py-files visionsearch_spark.zip jobs/compact.py \
        --index /path/to/index [--partitions N]

Merges every live segments/term_stats dir (appends add one O(delta) dir
each) into a single fresh pair and flips the snapshot pointer atomically;
superseded dirs are retired for one flip, then GC'd. Readers stay
consistent throughout.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--partitions", type=int, default=None)
    args = p.parse_args()

    spark = SparkSession.builder.appName("visionsearch-compact").getOrCreate()
    from visionsearch_spark.index.spimi import compact_store

    store = compact_store(spark, args.index, n_partitions=args.partitions)
    meta = store.read_meta()
    print(
        f"compacted {store.root}: live dirs {meta['segment_dirs']} "
        f"(epoch {meta['epoch']}, n_docs {meta['n_docs']})"
    )


if __name__ == "__main__":
    main()
