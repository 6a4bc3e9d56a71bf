"""Adapters from the driver's flat tables to the engine's transcript shape,
plus a process-level index cache for repeated queries over the same corpus.

`documents.parquet` (doc_id, text, lang, source, n_chars) is treated as a
single-turn-per-conversation corpus: conv_id = 'doc-%010d' % doc_id (zero
padded so lexicographic order == numeric order), turn_idx = 1. docid then
equals the rank of doc_id — deterministic, matching the reference's
sorted-corpus enumerate (`/root/reference/visionsearch/common_utils/aisearch/main.py:28-33`).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.index.store import IndexStore

CACHE_VERSION = "v1"


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.format_string("doc-%010d", F.col("doc_id")).alias("conv_id"),
        F.lit(1).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def doc_id_col(conv_id_col: str = "conv_id"):
    """Invert the 'doc-%010d' mapping."""
    return F.substring(F.col(conv_id_col), 5, 10).cast("long")


def get_documents_index(spark: SparkSession, sf_dir: str,
                        n_partitions: int = 8) -> IndexStore:
    """Build (once per process+corpus) the compressed index over documents."""
    key = hashlib.sha1(f"{CACHE_VERSION}:{os.path.abspath(sf_dir)}".encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"vss_idx_{key}")
    store = IndexStore(root)
    if os.path.exists(store.meta_path) and store.read_meta().get("phase") == "built":
        return store
    tx = documents_as_transcripts(spark, sf_dir)
    return build_index(tx, root, n_partitions=n_partitions)
