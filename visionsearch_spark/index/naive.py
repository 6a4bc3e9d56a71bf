"""B3: the minimum end-to-end slice — naive inverted index + BM25 query,
entirely built-in DataFrame operators. This path is the permanent
"Spark oracle": the optimized SPIMI/WAND path must match it forever.

Index tables produced (FIXTURES.md §4, naive flavor):
  docmap(docid, conv_id, turn_idx, dl)          — id↔key map + doc length
      (analog of the `.ids.npy` sidecar, `aisearch/core.py:16-18,54-56`,
       plus the length stats BM25 needs where FAISS used normalize_L2)
  postings(term, docid, tf, dl)                 — flat posting rows,
      dl denormalized so scoring never re-joins the (huge) docmap
  term_stats(term, df)                          — per-term doc frequency
  corpus_stats(n_docs, avgdl)                   — global normalizer

Query plan (all Catalyst-optimized, zero Python in the hot path):
  postings scan with `term IN (...)` pushed into parquet
  -> broadcast-join tiny per-query idf table
  -> groupBy(docid).agg(sum(idf*tf_weight))     [partial agg map-side]
  -> orderBy(score desc, tie).limit(k)          [TakeOrderedAndProject]
  -> broadcast-era join back to docmap for (conv_id, turn_idx)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import tokenize, tokens_col
from visionsearch_spark.bm25 import B, K1, idf
from visionsearch_spark.docid import assign_docids


def build_naive_index(transcripts: DataFrame, n_partitions: int | None = None
                      ) -> dict[str, DataFrame]:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> index tables."""
    with_ids = assign_docids(
        transcripts.select("conv_id", "turn_idx", "text"), n_partitions
    )
    toks = with_ids.select(
        "docid", "conv_id", "turn_idx", tokens_col("text").alias("tokens")
    ).withColumn("dl", F.size("tokens"))
    docmap = toks.select("docid", "conv_id", "turn_idx", "dl")
    # explode -> (term, docid) counts; partial aggregation is map-side combined
    postings = (
        toks.select("docid", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "docid", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", "docid", "tf", "dl")
    )
    term_stats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus_stats = docmap.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return {
        "docmap": docmap,
        "postings": postings,
        "term_stats": term_stats,
        "corpus_stats": corpus_stats,
    }


def score_expr(idf_col, tf_col, dl_col, avgdl: float):
    """BM25 contribution as a JVM-side Column (whole-stage codegen)."""
    tf = F.col(tf_col).cast("double") if isinstance(tf_col, str) else tf_col
    dl = F.col(dl_col).cast("double") if isinstance(dl_col, str) else dl_col
    return idf_col * tf * F.lit(K1 + 1.0) / (
        tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / F.lit(avgdl))
    )


def bm25_topk(
    spark: SparkSession,
    index: dict[str, DataFrame],
    query_text: str,
    k: int = 5,
    threshold: float = 0.0,
) -> DataFrame:
    """Top-k (docid, conv_id, turn_idx, score) for one query.

    Returns < k rows when fewer docs match — deliberately NOT the
    reference's asset_ids[-1] padding bug (`aisearch/core.py:62`,
    SURVEY.md §7 R3).
    """
    qterms = sorted(set(tokenize(query_text)))
    if not qterms:
        return _empty_result(spark)
    stats = index["corpus_stats"].collect()[0]
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    if not n_docs:
        return _empty_result(spark)
    dfs = {
        r["term"]: r["df"]
        for r in index["term_stats"].filter(F.col("term").isin(qterms)).collect()
    }
    if not dfs:
        return _empty_result(spark)
    idf_df = spark.createDataFrame(
        [(t, idf(n_docs, d)) for t, d in dfs.items()], "term string, idf double"
    )
    hits = (
        index["postings"]
        .filter(F.col("term").isin(list(dfs)))  # pushed to the parquet scan
        .join(F.broadcast(idf_df), "term")
        .withColumn("contrib", score_expr(F.col("idf"), "tf", "dl", avgdl))
        .groupBy("docid")
        .agg(F.sum("contrib").alias("score"))
        .filter(F.col("score") > threshold)
    )
    return (
        hits.join(index["docmap"].select("docid", "conv_id", "turn_idx"), "docid")
        .orderBy(F.desc("score"), F.asc("conv_id"), F.asc("turn_idx"))
        .limit(k)
        .select("docid", "conv_id", "turn_idx", "score")
    )


def _empty_result(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [], "docid long, conv_id string, turn_idx int, score double"
    )
