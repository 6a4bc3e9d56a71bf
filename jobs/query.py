"""spark-submit entry point: top-k BM25 queries against a built index.

    spark-submit --py-files visionsearch_spark.zip jobs/query.py \
        --index /path/to/index --query "join filter" [--k 10] [--threshold 0]
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--query", required=True, nargs="+")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--threshold", type=float, default=0.0)
    args = p.parse_args()

    spark = SparkSession.builder.appName("visionsearch-query").getOrCreate()
    from visionsearch_spark.index.store import IndexStore
    from visionsearch_spark.query.wand import batch_topk

    store = IndexStore(args.index)
    queries = [(i, q, args.k) for i, q in enumerate(args.query)]
    res = batch_topk(spark, store, queries, threshold=args.threshold)
    res.orderBy("query_id", "rank").show(len(queries) * args.k, truncate=False)


if __name__ == "__main__":
    main()
