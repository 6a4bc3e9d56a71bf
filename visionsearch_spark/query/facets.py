"""Facet aggregation and total-hit counting alongside search.

The Lucene/Elasticsearch surface a fulltext user expects next to top-k
ranking (the reference exposes only ranked hits — its UI buckets results
client-side, `templates/index3.html`): for a boolean membership query,
per-field value counts over ALL matching docs, and the total hit count.

Scale shape (100 TB posture):

* Membership comes from :func:`visionsearch_spark.query.boolean.
  matching_docids` — the zero-shuffle file-aligned kernel; only the
  (small) matching docid sets leave the tasks, postings never move.
* The metadata join ships only ``(docid, facet columns)`` of the
  matching side; AQE broadcasts the membership frame when it is small
  (the common case), else it is a plain shuffled join on a long key —
  never a scan-side explode of non-matching rows.
* Multi-facet counting stacks ``(facet, value)`` pairs BEFORE the one
  group-by, so N facets cost one shuffle, not N jobs; partial (map-side)
  aggregation means the exchange carries per-value partial counts,
  bounded by facet cardinality x tasks, not by match count.
* ``top_n`` uses ``row_number`` over (facet) partitions — facet count
  frames are tiny post-aggregation; determinism by (n_docs desc, value
  asc), matching Lucene's count-then-term facet ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from visionsearch_spark.index.store import IndexStore
from visionsearch_spark.query.boolean import matching_docids

FACET_DDL = "facet string, value string, n_docs long"


def match_count(
    spark: SparkSession,
    store: IndexStore,
    all_of: list[str] | None = None,
    any_of: list[str] | None = None,
    none_of: list[str] | None = None,
) -> DataFrame:
    """One-row DataFrame('n_docs long'): total docs matching the boolean
    membership spec (the 'total hits' header of a search response),
    without ranking anything."""
    allow = matching_docids(
        spark, store, all_of=all_of, any_of=any_of, none_of=none_of
    )
    return allow.agg(F.count("*").cast("long").alias("n_docs"))


def facet_counts(
    spark: SparkSession,
    store: IndexStore,
    meta: DataFrame,
    facets: list[str],
    all_of: list[str] | None = None,
    any_of: list[str] | None = None,
    none_of: list[str] | None = None,
    top_n: int | None = None,
) -> DataFrame:
    """Per-facet value counts over the docs matching a boolean query.

    ``meta`` must carry ``docid`` plus the ``facets`` columns (join it
    from the store's docmap / an external metadata table; values are
    counted as strings, NULL kept as its own bucket like SQL GROUP BY).
    Returns FACET_DDL rows; ``top_n`` keeps the top values per facet by
    (n_docs desc, value asc NULLS LAST).
    """
    if not facets:
        raise ValueError("facet_counts requires at least one facet column")
    missing = [c for c in facets if c not in meta.columns]
    if missing:
        raise ValueError(f"meta is missing facet columns: {missing}")
    allow = matching_docids(
        spark, store, all_of=all_of, any_of=any_of, none_of=none_of
    )
    matched = meta.select("docid", *facets).join(allow, "docid")
    stacked = matched.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("facet"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in facets
            ])
        ).alias("fv")
    ).select("fv.facet", "fv.value")
    counts = stacked.groupBy("facet", "value").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    if top_n is not None:
        if top_n <= 0:
            raise ValueError("top_n must be positive (omit it for all values)")
        w = Window.partitionBy("facet").orderBy(
            F.desc("n_docs"), F.asc_nulls_last("value")
        )
        counts = (
            counts.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= top_n)
            .drop("_rk")
        )
    return counts


RANGE_FACET_DDL = ("facet string, bucket string, lo double, hi double, "
                   "n_docs long")


def range_facets(
    spark: SparkSession,
    store: IndexStore,
    meta: DataFrame,
    ranges: dict[str, list[tuple[str, float | None, float | None]]],
    all_of: list[str] | None = None,
    any_of: list[str] | None = None,
    none_of: list[str] | None = None,
) -> DataFrame:
    """Elasticsearch `range` aggregation alongside search: for each
    numeric column, caller-named buckets [lo, hi) (None = open end;
    buckets MAY overlap, like ES) counted over the docs matching the
    boolean membership query. NULL metric values fall in no bucket.

    Every requested bucket is emitted, zero-count included (ES contract)
    — counts right-join a broadcast literal bucket table, so a query
    with no matches still returns all buckets at 0. Same one-shuffle
    stacked-pairs shape as facet_counts: N columns x M buckets cost one
    exchange carrying per-bucket partials."""
    if not ranges or not any(ranges.values()):
        raise ValueError("range_facets requires at least one bucket")
    missing = [c for c in ranges if c not in meta.columns]
    if missing:
        raise ValueError(f"meta is missing range columns: {missing}")
    allow = matching_docids(
        spark, store, all_of=all_of, any_of=any_of, none_of=none_of
    )
    matched = meta.select("docid", *ranges.keys()).join(allow, "docid")
    buckets = spark.createDataFrame(
        [(c, label,
          None if lo is None else float(lo),
          None if hi is None else float(hi))
         for c, bs in ranges.items() for (label, lo, hi) in bs],
        "facet string, bucket string, lo double, hi double",
    )
    stacked = matched.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("facet"),
                    F.lit(label).alias("bucket"),
                    ((F.lit(lo).cast("double").isNull()
                      | (F.col(c) >= F.lit(lo).cast("double")))
                     & (F.lit(hi).cast("double").isNull()
                        | (F.col(c) < F.lit(hi).cast("double")))
                     & F.col(c).isNotNull()).cast("int").alias("hit"),
                )
                for c, bs in ranges.items() for (label, lo, hi) in bs
            ])
        ).alias("fb")
    ).select("fb.facet", "fb.bucket", "fb.hit")
    counts = stacked.groupBy("facet", "bucket").agg(
        F.sum("hit").cast("long").alias("_n")
    )
    return (
        F.broadcast(buckets).join(counts, ["facet", "bucket"], "left")
        .select("facet", "bucket", "lo", "hi",
                F.coalesce("_n", F.lit(0)).cast("long").alias("n_docs"))
    )


_TRUNC_UNITS = {"hour", "day", "week", "month", "year"}


def histogram_frame(df: DataFrame, ts_col: str,
                    interval: str = "day") -> DataFrame:
    """(bucket timestamp, n_docs long): calendar date-histogram of a
    frame's timestamp column with EMPTY BUCKETS ZERO-FILLED between the
    observed min and max (the ES date_histogram contract that a plain
    groupBy misses). The bucket axis comes from F.sequence over a 1-row
    min/max aggregate — two scalar values through the driver, never a
    driver-side loop; NULL timestamps are dropped."""
    if interval not in _TRUNC_UNITS:
        raise ValueError(f"interval must be one of {sorted(_TRUNC_UNITS)}")
    b = df.select(F.date_trunc(interval, F.col(ts_col)).alias("bucket")) \
        .filter(F.col("bucket").isNotNull())
    counts = b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("_n"))
    step = "7 day" if interval == "week" else f"1 {interval}"
    axis = counts.agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    ).filter(F.col("_lo").isNotNull()).select(
        F.explode(F.expr(f"sequence(_lo, _hi, interval {step})"))
        .alias("bucket")
    )
    return axis.join(counts, "bucket", "left").select(
        "bucket", F.coalesce("_n", F.lit(0)).cast("long").alias("n_docs")
    )


def date_histogram(
    spark: SparkSession,
    store: IndexStore,
    meta: DataFrame,
    ts_col: str,
    interval: str = "day",
    all_of: list[str] | None = None,
    any_of: list[str] | None = None,
    none_of: list[str] | None = None,
) -> DataFrame:
    """Date histogram over the docs matching a boolean query (the
    timeline widget next to search results): membership from the
    zero-shuffle kernel, then :func:`histogram_frame` semantics —
    calendar buckets, empty buckets zero-filled."""
    if ts_col not in meta.columns:
        raise ValueError(f"meta is missing timestamp column {ts_col!r}")
    allow = matching_docids(
        spark, store, all_of=all_of, any_of=any_of, none_of=none_of
    )
    matched = meta.select("docid", ts_col).join(allow, "docid")
    return histogram_frame(matched, ts_col, interval)
