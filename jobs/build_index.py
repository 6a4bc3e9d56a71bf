"""spark-submit entry point: build (or resume) an index over a transcripts
table.

    spark-submit --py-files visionsearch_spark.zip jobs/build_index.py \
        --input /path/to/transcripts --output /path/to/index \
        [--format parquet|jsonl|csv] [--partitions N] [--shards S]

Non-parquet formats go through sources.files.read_transcripts: schema
enforced, malformed rows routed to <output>/rejects instead of killing
the job or silently vanishing. On a cluster the SparkSession comes from
spark-submit; locally this falls back to local[*].
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="transcripts table path")
    p.add_argument("--output", required=True, help="index root directory")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "jsonl", "csv"])
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--shards", type=int, default=None)
    args = p.parse_args()

    spark = SparkSession.builder.appName("visionsearch-build").getOrCreate()
    from visionsearch_spark.index.spimi import build_index
    from visionsearch_spark.sources.files import read_transcripts

    cache_handle: list = []
    tx, rejects = read_transcripts(
        spark, args.input, args.format, unpersist_handle=cache_handle
    )
    if args.format != "parquet":
        rej_path = os.path.join(args.output, "rejects")
        rejects.write.mode("overwrite").parquet(rej_path)
        n_rej = spark.read.parquet(rej_path).count()
        if n_rej:
            print(f"WARNING: {n_rej} malformed rows routed to {rej_path}")
    store = build_index(
        tx.select("conv_id", "turn_idx", "text"), args.output,
        n_partitions=args.partitions, n_shards=args.shards,
    )
    for cached in cache_handle:  # staged table supersedes the source cache
        cached.unpersist()
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
