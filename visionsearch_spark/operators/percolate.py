"""Percolation — reverse search: stored queries run against incoming
documents (the Elasticsearch percolator; Lucene MemoryIndex use case).
Search asks "which docs match this query"; percolation asks "which
registered queries match this doc" — the primitive behind alerting,
routing, and saved-search notification over a document stream.

Semantics: a registered query is either a plain string (conjunctive —
the alerting default: doc's analyzed token set contains EVERY analyzed
term) or, since r6, a dict with Lucene-shaped clauses:

    {"must": "a b" | [..], "must_not": "x" | [..], "phrases": ["p q"]}

must terms AND every phrase's terms are required (conjunctive);
must_not excludes on ANY hit; each phrase must additionally occur as
the exact analyzed token SEQUENCE (same adjacency rule as
query/boolean.phrase_docids). A query with only must_not clauses is
rejected (it would mean enumerating the complement); queries whose
positive terms all analyze away never match (consistent with OOV
search returning nothing, never everything).

Plan shape at 100 TB: the query table is small (alert rules are
human-authored — thousands, not billions) and broadcasts; documents
explode to DISTINCT (doc, term) pairs only for terms some query
mentions (the join prunes first), then one partial-aggregated count
per (doc, query) compares against the query's required-term count.
must_not is a second broadcast join producing an O(hits) exclusion
set, applied as a left-anti join. Phrase adjacency re-tokenizes ONLY
the candidate docs of phrase-bearing queries (a semi-join-pruned scan
— candidates already contain every phrase term, so this is the
rarest-term-bounded set, the same argument as the staged-text phrase
fallback). One shuffle carries (doc_id, query_id) hits-in-progress.
Stateless per batch, so the streaming form is the SAME function under
foreachBatch — no state store at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import tokenize, tokens_col


def _as_list(v) -> list[str]:
    if v is None:
        return []
    return [v] if isinstance(v, str) else list(v)


def _norm_query(qid: int, spec) -> tuple[list, list, list] | None:
    """-> (required_terms, excluded_terms, phrase_token_lists) or None
    for a never-matching query (no positive terms survive analysis)."""
    if isinstance(spec, str):
        must, must_not, phrases = [spec], [], []
    else:
        must = _as_list(spec.get("must"))
        must_not = _as_list(spec.get("must_not"))
        phrases = _as_list(spec.get("phrases"))
    req: set[str] = set()
    for m in must:
        req.update(tokenize(m))
    ph_toks: list[list[str]] = []
    for p in phrases:
        toks = tokenize(p)
        if not toks:
            return None  # an empty-after-analysis phrase is unsatisfiable
        if len(toks) > 1:
            ph_toks.append(toks)
        req.update(toks)  # phrase terms are required (candidate prune)
    exc: set[str] = set()
    for m in must_not:
        exc.update(tokenize(m))
    if not req:
        if must_not:
            raise ValueError(
                f"percolation query {qid} has only must_not clauses — "
                "exclusion-only rules match the complement of a posting "
                "set; register a positive clause"
            )
        return None
    return sorted(req), sorted(exc), ph_toks


def query_table(queries):
    """Normalize [(query_id, spec)] -> (must_rows, neg_rows, phrase_rows)
    driver-side (the registered-rule set is small by nature):
    must_rows  (qid, term, n_required), neg_rows (qid, term),
    phrase_rows (qid, gram, m) with gram = space-joined analyzed tokens."""
    must_rows, neg_rows, phrase_rows = [], [], []
    for qid, spec in queries:
        norm = _norm_query(qid, spec)
        if norm is None:
            continue
        req, exc, phrases = norm
        must_rows.extend((qid, t, len(req)) for t in req)
        neg_rows.extend((qid, t) for t in exc)
        phrase_rows.extend(
            (qid, " ".join(toks), len(toks)) for toks in phrases
        )
    return must_rows, neg_rows, phrase_rows


def percolate(docs: DataFrame, queries,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id_col, query_id) for every (doc, registered query) pair the doc
    satisfies (see module semantics). Deterministic set; order left to
    the caller."""
    spark = docs.sparkSession
    must_rows, neg_rows, phrase_rows = query_table(queries)
    if not must_rows:
        return spark.createDataFrame(
            [], f"{id_col} long, query_id long")
    q = F.broadcast(spark.createDataFrame(
        must_rows, "query_id long, term string, n_terms int"))
    doc_terms = (
        docs.select(F.col(id_col),
                    F.explode(tokens_col(text_col)).alias("term"))
        .dropDuplicates([id_col, "term"])
    )
    cand = (
        doc_terms.join(q, "term")  # broadcast: prunes to query terms
        .groupBy(id_col, "query_id")
        .agg(F.count(F.lit(1)).alias("_hit"),
             F.first("n_terms").alias("_need"))
        .filter(F.col("_hit") == F.col("_need"))
        .select(id_col, "query_id")
    )
    if neg_rows:
        neg = F.broadcast(spark.createDataFrame(
            neg_rows, "query_id long, term string"))
        neg_hits = (
            doc_terms.join(neg, "term")
            .select(id_col, "query_id").dropDuplicates()
        )
        cand = cand.join(neg_hits, [id_col, "query_id"], "left_anti")
    if phrase_rows:
        ph = F.broadcast(spark.createDataFrame(
            phrase_rows, "query_id long, gram string, m int"))
        ph_qids = sorted({r[0] for r in phrase_rows})
        plain = cand.filter(~F.col("query_id").isin(ph_qids))
        # adjacency verify over candidate docs only: candidates already
        # contain every phrase term, so the re-tokenized scan is the
        # rarest-term-bounded subset, never the whole batch
        toks = docs.select(F.col(id_col),
                           tokens_col(text_col).alias("_tk"))
        grams = (
            cand.filter(F.col("query_id").isin(ph_qids))
            .join(ph, "query_id")
            .join(toks, id_col)
            .withColumn("_ok", F.array_contains(
                F.transform(
                    F.when(
                        F.size("_tk") >= F.col("m"),
                        F.sequence(F.lit(1), F.size("_tk") - F.col("m")
                                   + F.lit(1)),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.concat_ws(
                        " ", F.slice("_tk", i, F.col("m"))),
                ),
                F.col("gram"),
            ))
            .groupBy(id_col, "query_id")
            .agg(F.min("_ok").alias("_all"))
            .filter(F.col("_all"))
            .select(id_col, "query_id")
        )
        cand = plain.unionByName(grams)
    return cand


def percolate_one(queries, text: str) -> list[int]:
    """Driver-side single-document percolation — the serving-tier twin
    of :func:`percolate` (one alert check per incoming doc, no Spark
    job): returns the sorted query_ids the analyzed text satisfies,
    under EXACTLY the batch semantics (same _norm_query normalization,
    same conjunctive/negation/phrase rules — parity is test-pinned).
    The registered set is small by nature; per-doc cost is
    O(tokens + phrase occurrences)."""
    toks = tokenize(text)
    tset = set(toks)
    out = []
    for qid, spec in queries:
        norm = _norm_query(qid, spec)
        if norm is None:
            continue
        req, exc, phrases = norm
        if not set(req) <= tset:
            continue
        if any(t in tset for t in exc):
            continue
        ok = True
        for ph in phrases:
            m = len(ph)
            if not any(toks[i:i + m] == ph
                       for i in range(len(toks) - m + 1)):
                ok = False
                break
        if ok:
            out.append(qid)
    return sorted(out)


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
