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


def facet_cardinality(
    spark: SparkSession,
    store: IndexStore,
    meta: DataFrame,
    facets: list[str],
    all_of: list[str] | None = None,
    any_of: list[str] | None = None,
    none_of: list[str] | None = None,
) -> DataFrame:
    """ES `cardinality` aggregation alongside search: EXACT distinct
    value count per facet column over the matching docs (NULLs excluded,
    the SQL COUNT DISTINCT rule; ES uses HLL++ — at 100 TB swap in
    approx_count_distinct, the exact form is kept because it is
    value-checkable). Same one-shuffle stacked-pairs shape as
    facet_counts; countDistinct adds the standard Spark expand-rewrite,
    still a single exchange of per-value partials."""
    if not facets:
        raise ValueError("facet_cardinality requires at least one facet")
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
    return stacked.groupBy("facet").agg(
        F.countDistinct("value").cast("long").alias("n_values")
    )


def significant_terms(
    spark: SparkSession,
    store: IndexStore,
    all_of: list[str] | None = None,
    any_of: list[str] | None = None,
    none_of: list[str] | None = None,
    top_n: int = 20,
    min_fg_df: int = 3,
) -> DataFrame:
    """Elasticsearch `significant_terms`: terms over-represented in the
    docs matching a boolean query relative to the whole corpus, scored
    with the JLH heuristic
        score = (fg% − bg%) · (fg% / bg%)
    where fg% = fg_df / n_matching and bg% = df / n_docs. The query's
    own terms are excluded (they are trivially significant), as are
    terms below `min_fg_df` foreground docs (ES min_doc_count — kills
    one-doc noise). Rounded to 6 for cross-engine determinism; order
    (score desc, term asc), top_n rows.

    Scale shape: membership from the zero-shuffle kernel; the foreground
    term counts re-tokenize ONLY matching docs (semi-join-pruned staged
    scan — the rarest-query-term-bounded set, same argument as the
    phrase fallback); background df comes from the store's term_stats
    (already aggregated at build). One groupBy(term) shuffle carrying
    per-term partials, one term-keyed join against term_stats, a 2-row
    broadcast of the scalar counts."""
    from visionsearch_spark.analyzer import tokens_col

    qterms = sorted(
        set(_norm(all_of)) | set(_norm(any_of)) | set(_norm(none_of)))
    allow = matching_docids(
        spark, store, all_of=all_of, any_of=any_of, none_of=none_of
    )
    staged = spark.read.parquet(store.staged_path).select("docid", "text")
    matched = staged.join(allow, "docid", "left_semi")
    fg = (
        matched.select("docid", F.explode(tokens_col("text")).alias("term"))
        .dropDuplicates(["docid", "term"])
        .groupBy("term").agg(F.count("*").cast("long").alias("fg_df"))
        .filter(~F.col("term").isin(qterms))
        .filter(F.col("fg_df") >= min_fg_df)
    )
    n_fg = allow.agg(F.count("*").cast("double").alias("_nfg"))
    meta = store.read_meta()
    n_bg = float(int(meta["n_docs"]))
    bg = spark.read.parquet(*store.term_stats_paths()) \
        .groupBy("term").agg(F.sum("df").cast("long").alias("bg_df"))
    scored = (
        fg.join(bg, "term")
        .crossJoin(F.broadcast(n_fg))
        .select(
            "term", "fg_df", "bg_df",
            F.round(
                ((F.col("fg_df") / F.col("_nfg"))
                 - (F.col("bg_df") / F.lit(n_bg)))
                * ((F.col("fg_df") / F.col("_nfg"))
                   / (F.col("bg_df") / F.lit(n_bg))),
                6,
            ).alias("score"),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.orderBy(F.desc("score"), F.asc("term")).limit(top_n)
        .withColumn("rank", F.row_number().over(w))
        .select("term", "fg_df", "bg_df", "score", "rank")
    )


def numeric_stats(
    spark: SparkSession,
    store: IndexStore,
    meta: DataFrame,
    cols: list[str],
    percentiles: list[float] = (0.25, 0.5, 0.75, 0.95),
    all_of: list[str] | None = None,
    any_of: list[str] | None = None,
    none_of: list[str] | None = None,
) -> DataFrame:
    """ES `stats` + `percentiles` aggregations over the docs matching a
    boolean query: per numeric column — count, min, max, avg, and EXACT
    linear-interpolated percentiles (Spark `percentile`, the same
    continuous definition as DuckDB's quantile_cont — cross-engine
    value-checkable, unlike percentile_approx). Long output (facet,
    stat, value) with stats named count/min/max/avg/p25/p50/…; doubles
    rounded to 6. NULL metric values are ignored (SQL aggregate rule).

    Same scale shape as facet_counts: one stacked explode, one
    groupBy(facet) shuffle carrying partial aggregates. Exact
    percentiles sort within each facet group — at 100 TB switch callers
    to approx_percentile if a facet's match set alone is terabytes; the
    contract keeps the exact form because it is value-checkable."""
    if not cols:
        raise ValueError("numeric_stats requires at least one column")
    missing = [c for c in cols if c not in meta.columns]
    if missing:
        raise ValueError(f"meta is missing stat columns: {missing}")
    ps = [float(p) for p in percentiles]
    if any(not 0.0 <= p <= 1.0 for p in ps):
        raise ValueError("percentiles must be in [0, 1]")
    allow = matching_docids(
        spark, store, all_of=all_of, any_of=any_of, none_of=none_of
    )
    matched = meta.select("docid", *cols).join(allow, "docid")
    stacked = matched.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("facet"),
                    F.col(c).cast("double").alias("v"),
                )
                for c in cols
            ])
        ).alias("fv")
    ).select("fv.facet", "fv.v")
    aggs = [
        F.count("v").cast("long").alias("count"),
        F.round(F.min("v"), 6).alias("min"),
        F.round(F.max("v"), 6).alias("max"),
        F.round(F.avg("v"), 6).alias("avg"),
    ] + [
        F.round(F.percentile("v", F.lit(p)), 6)
        .alias(f"p{int(round(p * 100)):02d}")
        for p in ps
    ]
    wide = stacked.groupBy("facet").agg(*aggs)
    stats = [f.name for f in wide.schema.fields if f.name != "facet"]
    return wide.select(
        "facet",
        F.explode(
            F.array(*[
                F.struct(F.lit(s).alias("stat"),
                         F.col(s).cast("double").alias("value"))
                for s in stats
            ])
        ).alias("sv"),
    ).select("facet", "sv.stat", "sv.value")


def _norm(terms: list[str] | None) -> list[str]:
    from visionsearch_spark.analyzer import tokenize

    out: list[str] = []
    for t in terms or []:
        out.extend(tokenize(t))
    return out


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
