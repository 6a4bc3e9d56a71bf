"""Incremental index maintenance: only-new-docs appends and streaming
ingestion.

The reference's incremental contract: scan only unindexed rows
(`ImageAsset.objects.filter(embedding_index__isnull=True)`,
`/root/reference/visionsearch/common_utils/adapters/django_adapter.py:4-8`),
skip already-indexed ids during build (`aisearch/core.py:34-36`), append to
the existing index (FAISS positions grow monotonically), write ids back
(`django_adapter.py:10-12`).

Spark-first translation — append into the SAME store:
  1. delta = anti-join(new transcripts, docmap) on (conv_id, turn_idx)
     (the NULL-docid scan / P2 membership filter).
  2. delta docids start at current n_docs (monotone append, the FAISS
     `index.add` analog). NOTE: this preserves docid *stability* for
     existing docs (they are never renumbered), at the cost of the global
     (conv_id, turn_idx) sort invariant holding only WITHIN each
     increment — exactly the reference's semantics, where docID is
     arrival position (`aisearch/main.py:28-33` sorted order applies to
     the initial corpus; later adds append).
  3. SPIMI the delta into new fragments/manifests (new pid range), then
     re-merge ALL fragments into fresh segments with UPDATED corpus stats
     (n_docs, avgdl): compaction recomputes block_max from raw tf/dl, so
     stale upper bounds cannot survive an append. Scoring is always exact
     under current stats because postings store tf+dl, not weights.
  4. Query path is unchanged — one store, one segments table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import tokens_col
from visionsearch_spark.docid import assign_docids_with_count
from visionsearch_spark.index.store import (
    MANIFEST_SCHEMA_DDL,
    SEGMENT_SCHEMA_DDL,
    IndexStore,
)


def pending_rows(transcripts: DataFrame, store: IndexStore) -> DataFrame:
    """New rows not yet in the docmap — the reference's NULL-docid scan
    (anti-join form; AQE broadcasts the smaller side automatically)."""
    spark = transcripts.sparkSession
    if not os.path.exists(store.docmap_path):
        return transcripts
    docmap = spark.read.parquet(store.docmap_path).select("conv_id", "turn_idx")
    return transcripts.join(docmap, ["conv_id", "turn_idx"], "left_anti")


def incremental_build(transcripts: DataFrame, root: str,
                      n_partitions: int | None = None) -> IndexStore:
    """Index only rows absent from the docmap, appending to the store."""
    from visionsearch_spark.index.spimi import (
        _compact_segments,
        _make_spimi_fn,
        build_index,
    )

    spark = transcripts.sparkSession
    store = IndexStore(root)
    if not os.path.exists(store.meta_path):
        return build_index(transcripts, root, n_partitions=n_partitions)

    meta = store.read_meta()
    n_partitions = n_partitions or int(meta["n_partitions"])
    delta = pending_rows(
        transcripts.select("conv_id", "turn_idx", "text"), store
    )
    if delta.isEmpty():
        return store

    base = int(meta["n_docs"])
    with_ids, n_new = assign_docids_with_count(delta, n_partitions)
    toks = (
        with_ids.withColumn("docid", F.col("docid") + F.lit(base))
        .select("docid", "conv_id", "turn_idx", tokens_col("text").alias("tokens"))
        .withColumn("dl", F.size("tokens"))
    )
    pid_base = 1 + max(
        (m["partition_id"] for m in store.manifests()), default=-1
    )
    rows_per_pid = max(1, -(-n_new // n_partitions))
    staged = toks.withColumn(
        "pid",
        (F.lit(pid_base) + (F.col("docid") - F.lit(base)) / F.lit(rows_per_pid))
        .cast("int"),
    )
    staged.write.mode("append").parquet(store.staged_path)

    # refresh corpus stats BEFORE SPIMI (avgdl feeds block_max); the
    # docmap IS the staged table (column-pruned view, store.docmap_path)
    sdf = spark.read.parquet(store.staged_path)
    n_docs = base + n_new
    avgdl = float(sdf.agg(F.avg("dl")).collect()[0][0])
    meta.update({"n_docs": n_docs, "avgdl": avgdl})
    store.write_meta(meta)

    spimi_fn = _make_spimi_fn(
        store.root, avgdl, int(meta["shard_range"]), frozenset()
    )
    (
        sdf.filter(F.col("pid") >= pid_base)
        .select("pid", "docid", "dl", "tokens")
        .repartition(n_partitions, "pid")
        .sortWithinPartitions("pid", "docid")
        .mapInArrow(spimi_fn, MANIFEST_SCHEMA_DDL)
        .count()
    )

    frags = (
        spark.read.schema(SEGMENT_SCHEMA_DDL)
        .option("pathGlobFilter", "fragment-*.parquet")
        .parquet(store.fragments_dir)
    )
    frags.groupBy("term").agg(F.sum("n").alias("df")).write.mode(
        "overwrite"
    ).parquet(store.term_stats_path)
    compacted = _compact_segments(frags, int(meta["shard_range"]), avgdl)
    (
        compacted.repartition(n_partitions, "shard")
        .sortWithinPartitions("shard", "term", "min_docid")
        .write.mode("overwrite")
        .parquet(store.segments_path)
    )
    meta["phase"] = "built"
    store.write_meta(meta)
    from visionsearch_spark.query.wand import invalidate_term_df_memo

    invalidate_term_df_memo(store.root)  # df/N changed under this root
    return store


def stream_transcripts_to_index(
    spark: SparkSession,
    input_path: str,
    root: str,
    checkpoint: str,
    schema: str,
    trigger_once: bool = True,
):
    """Structured Streaming ingestion: file source -> foreachBatch
    incremental build. availableNow processes the backlog then stops —
    the batch/stream unification point; the checkpoint dir gives
    exactly-once batch tracking on top of our idempotent anti-join."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        incremental_build(batch_df, root)

    reader = spark.readStream.schema(schema).parquet(input_path)
    writer = reader.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
