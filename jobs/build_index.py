"""spark-submit entry point: build (or resume) an index over a transcripts
table.

    spark-submit --py-files visionsearch_spark.zip jobs/build_index.py \
        --input /path/to/transcripts_parquet --output /path/to/index \
        [--partitions N] [--shards S]

On a cluster the SparkSession comes from spark-submit; locally this falls
back to local[*].
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="transcripts parquet path")
    p.add_argument("--output", required=True, help="index root directory")
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--shards", type=int, default=None)
    args = p.parse_args()

    spark = SparkSession.builder.appName("visionsearch-build").getOrCreate()
    from visionsearch_spark.index.spimi import build_index

    tx = spark.read.parquet(args.input)
    store = build_index(
        tx, args.output, n_partitions=args.partitions, n_shards=args.shards
    )
    meta = store.read_meta()
    manifests = store.manifests()
    done = [m for m in manifests if m["status"] == "done"]
    print(
        f"built index at {store.root}: n_docs={meta['n_docs']} "
        f"partitions={len(done)} "
        f"postings={sum(m['postings_written'] for m in done)} "
        f"bytes_compressed={sum(m['bytes_compressed'] for m in done)}"
    )


if __name__ == "__main__":
    main()
