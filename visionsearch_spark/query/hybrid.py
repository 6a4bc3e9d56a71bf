"""Hybrid search: fuse the engine's two retrieval halves — BM25 over the
inverted index and cosine similarity over an embedding table — with
reciprocal-rank fusion (RRF, Cormack et al. 2009: the standard
score-free fusion; rank-based, so BM25 and cosine need no calibration).

fused(doc) = Σ_lists 1 / (c + rank_list(doc)), missing from a list = no
contribution; ties broken by id. c=60 is the published default.

Scale posture: each input list is depth-bounded (its own top-`depth`
job — BM25 rides the zero-shuffle fast path, the vector side whatever
ANN variant produced it), so the fusion joins two ≤depth-row frames —
AQE broadcasts them regardless of corpus size. The reference serves
pure vector search (`aisearch/core.py:58-81` — FAISS only); hybrid is
what its users move to once text metadata exists, and this engine owns
both sides.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from visionsearch_spark.index.store import IndexStore

RRF_C = 60  # Cormack et al.'s constant; larger = flatter rank discount


def rrf_fuse(lists: list[DataFrame], k: int = 10, c: int = RRF_C,
             id_col: str = "conv_id") -> DataFrame:
    """Fuse N ranked lists — DataFrames with (id_col, rank), rank
    1-based — into (id_col, fused, rank). Deterministic: the fused sum
    adds list contributions in argument order (fixed expression tree),
    final order (fused desc, id asc)."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    parts = [
        df.select(F.col(id_col),
                  (1.0 / (F.lit(float(c)) + F.col("rank").cast("double"))
                   ).alias(f"_rrf{i}"))
        for i, df in enumerate(lists)
    ]
    joined = reduce(lambda a, b: a.join(b, id_col, "full"), parts)
    fused = reduce(
        lambda acc, i: acc + F.coalesce(F.col(f"_rrf{i}"), F.lit(0.0)),
        range(1, len(parts)),
        F.coalesce(F.col("_rrf0"), F.lit(0.0)),
    )
    # TakeOrderedAndProject cut to k, then a row_number over only those
    # k rows (the window is single-partition but k-bounded by the limit)
    w = Window.orderBy(F.desc("fused"), F.asc(id_col))
    return (
        joined.select(F.col(id_col), fused.alias("fused"))
        .orderBy(F.desc("fused"), F.asc(id_col)).limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select(id_col, "rank", "fused")
    )


def weighted_fuse(lists: list[tuple[DataFrame, float]], k: int = 10,
                  id_col: str = "conv_id") -> DataFrame:
    """Score-based fusion: each list is a DataFrame (id_col, score);
    min-max normalize every list over its OWN depth-bounded rows, then
    fused = Σ weight_i · norm_i (absent from a list = 0). The calibrated
    alternative to RRF — use when the score scales are meaningful and a
    tunable text-vs-vector blend (alpha) is wanted; RRF when they're
    not. A single-distinct-score list normalizes to 1.0 (a constant
    list carries presence information only). Normalization constants
    come from two scalar aggs per list — the lists are top-`depth` jobs,
    so this is driver-trivial at any corpus size."""
    if not lists:
        raise ValueError("weighted_fuse needs at least one scored list")
    parts = []
    for i, (df, wgt) in enumerate(lists):
        # materialize before the normalization agg: the min/max collect
        # is one action and the fusion join a second — unmaterialized,
        # each list's full retrieval job (e.g. the BM25 top-depth scan)
        # runs twice. localCheckpoint, not cache: checkpoint blocks are
        # GC-cleaned with the frame, while CacheManager entries leak per
        # call on a long-lived session (and would side-effect the
        # caller's own frame). Depth-bounded rows — the blocks are tiny.
        df = df.localCheckpoint(eager=True)
        row = df.agg(F.min("score").alias("lo"),
                     F.max("score").alias("hi")).collect()[0]
        if row["lo"] is None:  # empty list: contributes nothing
            continue
        lo, hi = float(row["lo"]), float(row["hi"])
        norm = (F.lit(1.0) if hi == lo
                else (F.col("score") - F.lit(lo)) / F.lit(hi - lo))
        parts.append(df.select(
            F.col(id_col), (F.lit(float(wgt)) * norm).alias(f"_w{i}")))
    if not parts:
        spark = lists[0][0].sparkSession
        return spark.createDataFrame(
            [], f"{id_col} string, rank int, fused double")
    joined = reduce(lambda a, b: a.join(b, id_col, "full"), parts)
    cols = [c for c in joined.columns if c.startswith("_w")]
    fused = reduce(
        lambda acc, c: acc + F.coalesce(F.col(c), F.lit(0.0)),
        cols[1:], F.coalesce(F.col(cols[0]), F.lit(0.0)),
    )
    w = Window.orderBy(F.desc("fused"), F.asc(id_col))
    return (
        joined.select(F.col(id_col), fused.alias("fused"))
        .orderBy(F.desc("fused"), F.asc(id_col)).limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select(id_col, "rank", "fused")
    )


def hybrid_weighted_topk(
    spark: SparkSession,
    store: IndexStore,
    query_text: str,
    vector_scored: DataFrame,
    k: int = 10,
    depth: int = 50,
    alpha: float = 0.5,
) -> DataFrame:
    """Weighted hybrid: alpha · norm(BM25) + (1−alpha) · norm(cosine).
    vector_scored: (conv_id, score) — the vector list's scores (e.g.
    cosine), mapped to conv ids by the caller. The BM25 list collapses
    to conv level (max score = best turn) before fusion, mirroring
    hybrid_topk's min-rank collapse."""
    from visionsearch_spark.query.wand import batch_topk

    bm = (
        batch_topk(spark, store, [(0, query_text, depth)])
        .groupBy("conv_id").agg(F.max("score").alias("score"))
    )
    return weighted_fuse([(bm, float(alpha)),
                          (vector_scored, 1.0 - float(alpha))], k=k)


def hybrid_topk(
    spark: SparkSession,
    store: IndexStore,
    query_text: str,
    vector_ranked: DataFrame,
    k: int = 10,
    depth: int = 50,
    c: int = RRF_C,
) -> DataFrame:
    """RRF-fuse BM25 top-`depth` for `query_text` with a caller-supplied
    vector-side ranked list (conv_id, rank) — produced by any of the
    similarity operators (exact cosine / LSH / IVF / IVF-PQ), mapped to
    the store's conv_id key by the caller (the id mapping is corpus
    knowledge, not engine knowledge). Returns (conv_id, rank, fused).
    An OOV text query fuses to the vector list alone, and vice versa.

    The BM25 list is collapsed to conv level before fusion (min rank —
    a conversation is represented by its best-ranked turn): on
    multi-turn stores the raw top-`depth` can hold one conv several
    times, and duplicate join keys would multiply fusion rows."""
    from visionsearch_spark.query.wand import batch_topk

    bm = (
        batch_topk(spark, store, [(0, query_text, depth)])
        .groupBy("conv_id").agg(F.min("rank").alias("rank"))
    )
    return rrf_fuse([bm, vector_ranked], k=k, c=c, id_col="conv_id")
