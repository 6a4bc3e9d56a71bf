"""Unit-level (sentence fan-out) search with per-document collapse.

The reference's caption search indexes one doc as N sentence units and
left a TODO about deduplicating multi-unit hits per document
(`/root/reference/visionsearch/common_utils/aisearch/core.py:96-104`
mean-pools then abandons it). Here the collapse is MAX over unit scores —
deterministic, monotone (a doc ranks by its best-matching sentence), and
exact under the distributed k-cut: per-partition candidates collapse to
per-doc max BEFORE truncation (wand.py `collapse_bounds`), partial maxes
re-combine with one groupBy, and the tie-break (score desc, first-unit
docid asc) equals (score desc, doc key asc) because unit docids are dense
in (conv_id, unit_idx) order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from visionsearch_spark.index.store import IndexStore
from visionsearch_spark.query.wand import batch_topk

DOC_BOUNDS_DIR = "doc_bounds"

UNIT_RESULT_DDL = "query_id long, rank int, conv_id string, score double"


def doc_bounds(spark: SparkSession, store: IndexStore) -> DataFrame:
    """First-unit docid per parent doc. Prefers the parquet materialized
    at build time (get_documents_unit_index); falls back to a docmap agg."""
    path = os.path.join(store.root, DOC_BOUNDS_DIR)
    if os.path.exists(path):
        return spark.read.parquet(path)
    return (
        spark.read.parquet(store.docmap_path)
        .groupBy("conv_id").agg(F.min("docid").alias("docid"))
        .select("docid")
    )


def unit_batch_topk(
    spark: SparkSession,
    store: IndexStore,
    queries: list[tuple[int, str, int]],
    threshold: float = 0.0,
    n_tasks: int | None = None,
) -> DataFrame:
    """Top-k DOCUMENTS by max unit BM25 score over a unit-level store."""
    res = batch_topk(
        spark, store, queries, threshold=threshold, n_tasks=n_tasks,
        collapse_bounds=doc_bounds(spark, store),
    )
    # result docid/conv_id/turn_idx already describe the parent's first
    # unit; the parent key is conv_id
    return res.select("query_id", "rank", "conv_id", "score")


def unit_topk(spark: SparkSession, store: IndexStore, query_text: str,
              k: int = 5, threshold: float = 0.0) -> DataFrame:
    return unit_batch_topk(
        spark, store, [(0, query_text, k)], threshold
    ).select("rank", "conv_id", "score")
