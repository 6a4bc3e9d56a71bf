"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship BM25 batch query over sf0.001.
`queries()` exposes one callable per implemented operator (SURVEY.md §2 +
training-data ops); `oracle_sql()` gives the DuckDB-equivalent SQL the
driver compares against at sf0.01. Column names and rounding are matched
pairwise between the two sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import duckdb_tokens, tokenize
from visionsearch_spark.corpus import doc_id_col, get_documents_index
from visionsearch_spark.query.wand import batch_topk

# ---------------------------------------------------------------------------
# shared query definitions (Spark side and oracle side derive from these)
# ---------------------------------------------------------------------------

BM25_QUERIES = {
    "bm25_topk_hot": ("join filter stream", 30),
    "bm25_topk_tail": ("vector scan merge", 10),
    "bm25_topk_single": ("customer", 5),
}
BM25_BATCH = [(0, "join filter stream", 10), (1, "vector scan merge", 10),
              (2, "customer order", 10)]

EVENT_VALUE_THRESHOLD = 150.0


def _p(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# ---------------------------------------------------------------------------
# Spark-side callables
# ---------------------------------------------------------------------------

def _bm25_query(qtext: str, k: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        store = get_documents_index(spark, sf_dir)
        res = batch_topk(spark, store, [(0, qtext, k)])
        return res.select(
            doc_id_col().alias("doc_id"), F.round("score", 6).alias("score")
        )
    return run


def _bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = get_documents_index(spark, sf_dir)
    res = batch_topk(spark, store, BM25_BATCH)
    return res.select(
        "query_id", doc_id_col().alias("doc_id"), F.round("score", 6).alias("score")
    )


def _token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from visionsearch_spark.analyzer import tokens_col

    docs = spark.read.parquet(_p(sf_dir, "documents"))
    return docs.select(
        "doc_id", F.size(tokens_col("text")).alias("n_tokens")
    )


def _term_df_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = get_documents_index(spark, sf_dir)
    ts = spark.read.parquet(store.term_stats_path)
    return ts.orderBy(F.desc("df"), F.asc("term")).limit(50)


def _corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = get_documents_index(spark, sf_dir)
    m = store.read_meta()
    return spark.createDataFrame(
        [(int(m["n_docs"]), round(float(m["avgdl"]), 6))], "n_docs long, avgdl double"
    )


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(_p(sf_dir, "documents"))
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("keep_id", "n_copies")


def _threshold_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(_p(sf_dir, "events"))
    return (
        ev.filter(F.col("value") >= EVENT_VALUE_THRESHOLD)
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(30)
        .select("event_id", "value")
    )


def _turn_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(_p(sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", F.row_number().over(w).alias("turn_idx")
    )


def _session_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(_p(sf_dir, "events"))
    return (
        ev.groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )


def _antijoin_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(_p(sf_dir, "customer"))
    orders = spark.read.parquet(_p(sf_dir, "orders"))
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey")


def _groupby_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(_p(sf_dir, "events"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


def _cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from visionsearch_spark.operators.similarity import cosine_topk_to_query

    emb = spark.read.parquet(_p(sf_dir, "embeddings"))
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return cosine_topk_to_query(emb, list(qvec), k=20).select(
        "vec_id", F.round("cos", 6).alias("cos")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch BM25 top-k over the sf0.001 documents corpus."""
    return _bm25_batch(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _bm25_query(text, k) for name, (text, k) in BM25_QUERIES.items()
    }
    q.update(
        {
            "bm25_batch": _bm25_batch,
            "token_count": _token_count,
            "term_df_top": _term_df_top,
            "corpus_stats": _corpus_stats,
            "dedup_exact": _dedup_exact,
            "threshold_topk_events": _threshold_topk_events,
            "turn_numbering": _turn_numbering,
            "session_window_1h": _session_window_1h,
            "antijoin_customers_no_orders": _antijoin_customers_no_orders,
            "groupby_event_type": _groupby_event_type,
            "cosine_topk": _cosine_topk,
        }
    )
    return q


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

def _bm25_oracle(batch: list[tuple[int, str, int]], with_qid: bool) -> str:
    """Exhaustive BM25 (k1=1.2, b=0.75, Lucene idf) in plain DuckDB SQL —
    the driver-side twin of visionsearch_spark.oracle."""
    toks = duckdb_tokens("text")
    qrows = ", ".join(
        f"({qid}, '{t}', {kk})"
        for qid, text, kk in batch
        for t in sorted(set(tokenize(text)))
    )
    proj = (
        "query_id, doc_id, round(score, 6) AS score"
        if with_qid
        else "doc_id, round(score, 6) AS score"
    )
    return f"""
WITH q(query_id, term, k) AS (VALUES {qrows}),
toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT avg(len({toks})) FROM documents) AS avgdl
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT q.query_id, any_value(q.k) AS k, tf.doc_id,
         sum( ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
  FROM q JOIN tf USING(term) JOIN df USING(term) JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT {proj} FROM ranked WHERE rnk <= k
"""


def oracle_sql() -> dict[str, str]:
    toks = duckdb_tokens("text")
    sql: dict[str, str] = {
        name: _bm25_oracle([(0, text, k)], with_qid=False)
        for name, (text, k) in BM25_QUERIES.items()
    }
    sql["bm25_batch"] = _bm25_oracle(BM25_BATCH, with_qid=True)
    sql["token_count"] = f"SELECT doc_id, len({toks}) AS n_tokens FROM documents"
    sql["term_df_top"] = f"""
        WITH tf AS (
          SELECT doc_id, unnest({toks}) AS term FROM documents
        )
        SELECT term, count(DISTINCT doc_id) AS df FROM tf
        GROUP BY term ORDER BY df DESC, term ASC LIMIT 50
    """
    sql["corpus_stats"] = f"""
        SELECT count(*) AS n_docs, round(avg(len({toks})), 6) AS avgdl
        FROM documents
    """
    sql["dedup_exact"] = """
        SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY text
    """
    sql["threshold_topk_events"] = f"""
        SELECT event_id, value FROM events
        WHERE value >= {EVENT_VALUE_THRESHOLD}
        ORDER BY value DESC, event_id ASC LIMIT 30
    """
    sql["turn_numbering"] = """
        SELECT event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn_idx
        FROM events
    """
    sql["session_window_1h"] = """
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL 1 HOUR
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_s
          FROM events
        ),
        sessioned AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id, floor(epoch(min(ts)))::BIGINT AS session_start,
               count(*) AS n_events
        FROM sessioned GROUP BY user_id, sid
    """
    sql["antijoin_customers_no_orders"] = """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """
    sql["groupby_event_type"] = """
        SELECT event_type, count(*) AS n, round(avg(value), 6) AS avg_value
        FROM events GROUP BY event_type
    """
    sql["cosine_topk"] = """
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT vec_id,
                 list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)) AS cos
          FROM embeddings
        )
        SELECT vec_id, round(cos, 6) AS cos FROM scored
        ORDER BY cos DESC, vec_id ASC LIMIT 20
    """
    return sql
