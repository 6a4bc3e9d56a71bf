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
