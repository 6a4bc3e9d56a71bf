"""Percolation — reverse search: stored queries run against incoming
documents (the Elasticsearch percolator; Lucene MemoryIndex use case).
Search asks "which docs match this query"; percolation asks "which
registered queries match this doc" — the primitive behind alerting,
routing, and saved-search notification over a document stream.

Semantics (conjunctive, the alerting default): query q matches doc d
iff d's analyzed token set contains EVERY analyzed term of q. Queries
whose terms all analyze away never match (consistent with OOV search
returning nothing, never everything).

Plan shape at 100 TB: the query table is small (alert rules are
human-authored — thousands, not billions) and broadcasts; documents
explode to DISTINCT (doc, term) pairs only for terms some query
mentions (the join prunes first), then one partial-aggregated count
per (doc, query) compares against the query's term count. One shuffle,
carrying only (doc_id, query_id) hits-in-progress. Stateless per
batch, so the streaming form is the SAME function under foreachBatch —
no state store at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import tokenize, tokens_col


def query_table(queries: list[tuple[int, str]]):
    """Normalize [(query_id, text)] -> [(query_id, term, n_terms)] rows
    (driver-side; the registered-rule set is small by nature). Queries
    that analyze to zero terms are dropped — they can never match."""
    rows = []
    for qid, text in queries:
        terms = sorted(set(tokenize(text)))
        rows.extend((qid, t, len(terms)) for t in terms)
    return rows


def percolate(docs: DataFrame, queries: list[tuple[int, str]],
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id_col, query_id) for every (doc, registered query) pair where
    the doc contains ALL the query's analyzed terms. Deterministic set;
    order left to the caller."""
    spark = docs.sparkSession
    rows = query_table(queries)
    if not rows:
        return spark.createDataFrame(
            [], f"{id_col} long, query_id long")
    q = F.broadcast(spark.createDataFrame(
        rows, "query_id long, term string, n_terms int"))
    doc_terms = (
        docs.select(F.col(id_col),
                    F.explode(tokens_col(text_col)).alias("term"))
        .dropDuplicates([id_col, "term"])
    )
    return (
        doc_terms.join(q, "term")  # broadcast: prunes to query terms
        .groupBy(id_col, "query_id")
        .agg(F.count(F.lit(1)).alias("_hit"),
             F.first("n_terms").alias("_need"))
        .filter(F.col("_hit") == F.col("_need"))
        .select(id_col, "query_id")
    )


def percolate_stream(stream_docs: DataFrame,
                     queries: list[tuple[int, str]],
                     out_path: str,
                     checkpoint: str,
                     id_col: str = "doc_id",
                     text_col: str = "text"):
    """Streaming percolation to parquet. Stateless — percolation is
    per-document, so each micro-batch runs the identical batch function
    and restarts resume from the checkpoint with no state migration.
    Exactly-once by idempotent epoch partitioning: each batch OVERWRITES
    its own batch=<epoch> directory, so a replayed batch rewrites the
    same files instead of appending duplicates (plain foreachBatch
    append would be at-least-once). Returns the StreamingQuery."""
    def _batch(df: DataFrame, epoch: int) -> None:
        percolate(df, queries, id_col=id_col, text_col=text_col) \
            .write.mode("overwrite") \
            .parquet(f"{out_path}/batch={epoch}")

    return (
        stream_docs.writeStream
        .foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
