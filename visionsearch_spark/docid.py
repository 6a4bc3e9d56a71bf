"""Deterministic docID assignment: (conv_id, turn_idx) -> dense int64.

Invariant: docid == position in global (conv_id ASC, turn_idx ASC) order —
the distributed analog of the reference's sorted-glob enumerate
(`/root/reference/visionsearch/common_utils/aisearch/main.py:28-33`) and of
the `embedding_index` write-back
(`common_utils/adapters/django_adapter.py:10-12`).

Scale recipe (SURVEY.md §7 B2): a single global `row_number()` window would
funnel 10^12 rows through ONE task. Instead:
  1. `repartitionByRange(conv_id, turn_idx)` — range-partitioned shuffle
     (Spark samples split points; each partition holds a contiguous key
     range, ordered ACROSS partitions by construction), sorted within
     partitions.
  2. per-partition counts -> prefix-sum offsets on the driver (tiny: one
     int per partition).
  3. docid = offset + in-partition ordinal. The ordinal is the LOW 33
     BITS of `monotonically_increasing_id()` (documented layout:
     partition id << 33 | record number), evaluated in the same stage as
     the sort and pinned by the persist — equal to the old
     `row_number() OVER (PARTITION BY _pid ORDER BY key)` because the
     partition is already key-sorted and the key is unique, but with NO
     hashpartitioning(_pid) exchange and no window re-sort (r7: the
     window was a second full shuffle of every text byte). The offset
     attaches via a broadcast join (narrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def assign_docids(df: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """See assign_docids_with_count; returns just the DataFrame."""
    return assign_docids_with_count(df, n_partitions)[0]


def dense_ids(
    distinct_vals: DataFrame,
    col: str,
    out_col: str = "id",
    n_partitions: int | None = None,
    unpersist_handle: list | None = None,
) -> DataFrame:
    """Dictionary-encode a DISTINCT single-column frame: ids 1..N in
    lexicographic order of `col` — value-identical to
    ``dense_rank() OVER (ORDER BY col)`` but with NO global window.

    Same two-phase recipe as assign_docids_with_count: range-partition by
    the value (sampled split points keep ranges ordered ACROSS partitions),
    per-partition counts -> prefix-sum offsets on the driver (one int per
    partition), then the in-partition ordinal (monotonically_increasing_id
    low bits — no window exchange, see module docstring) + broadcast
    offset join. At 100 TB the distinct-term table never funnels through
    one task.

    The ranged frame is persisted: range boundaries come from sampling, so
    the offsets job and the row_number job must see the same partitioning.
    """
    n = n_partitions or distinct_vals.sparkSession.sparkContext.defaultParallelism
    ranged = (
        distinct_vals.repartitionByRange(n, col)
        .sortWithinPartitions(col)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_ord",
            F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1)),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if unpersist_handle is not None:
        unpersist_handle.append(ranged)
    counts = ranged.groupBy("_pid").count().orderBy("_pid").collect()
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_pid"], acc))
        acc += r["count"]
    off_df = ranged.sparkSession.createDataFrame(offsets, "_pid int, _offset long")
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_offset") + F.col("_ord") + F.lit(1))
        .drop("_pid", "_ord", "_offset")
    )


def assign_docids_with_count(
    df: DataFrame,
    n_partitions: int | None = None,
    unpersist_handle: list | None = None,
) -> tuple[DataFrame, int]:
    """Add int64 `docid` == row_number-1 over global (conv_id, turn_idx) order;
    also returns the total row count (already known from the offsets pass —
    saves callers a second full scan).

    Returns the input columns + `docid`, range-partitioned and sorted
    within partitions by key (downstream SPIMI relies on that ordering).

    The ranged frame is persisted before the counts pass: range boundaries
    come from sampling, so without pinning them the offsets job and the
    row_number job could see different partitionings. In a production
    build this materialization IS the docmap staging write; callers that
    need the memory back unpersist via the returned plan's lineage.
    """
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_ord",
            F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1)),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if unpersist_handle is not None:
        unpersist_handle.append(ranged)
    counts = ranged.groupBy("_pid").count().orderBy("_pid").collect()
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    off_df = ranged.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    out = (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn("docid", F.col("_offset") + F.col("_ord"))
        .drop("_pid", "_ord", "_offset")
    )
    return out, acc


def prefix_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "cumsum",
    n_partitions: int | None = None,
    unpersist_handle: list | None = None,
) -> DataFrame:
    """INCLUSIVE running sum of `weight_col` in `order_col` order —
    value-identical to ``sum(w) OVER (ORDER BY order_col ROWS UNBOUNDED
    PRECEDING)`` but with NO global window (the same two-phase recipe as
    dense_ids, generalized from counts to weighted sums): range-partition
    by the order key, per-partition weight totals -> driver prefix-sum
    (one long per partition), per-partition running sum + broadcast
    offset. `order_col` must be unique (ties would make the global
    ordering, and thus the cumsum, ill-defined).

    The ranged frame is persisted: range boundaries come from sampling,
    so the totals job and the running-sum job must see the same
    partitioning (CLAUDE.md gotcha)."""
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if unpersist_handle is not None:
        unpersist_handle.append(ranged)
    totals = (
        ranged.groupBy("_pid").agg(F.sum(weight_col).alias("_s"))
        .orderBy("_pid").collect()
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["_pid"], acc))
        acc += int(r["_s"])
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _offset long")
    w = (
        Window.partitionBy("_pid").orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_run", F.sum(weight_col).over(w).cast("long"))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_offset") + F.col("_run"))
        .drop("_pid", "_run", "_offset")
    )
