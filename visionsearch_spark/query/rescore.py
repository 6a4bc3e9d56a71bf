"""Function-score rescoring — the ES `function_score` /  `rescore`
surface: re-rank a depth-bounded BM25 top list by combining the text
score with a per-document factor (field-value-factor, recency decay,
popularity — any (conv_id, factor) frame the caller derives).

Scale shape: the base list is one top-`depth` job on the zero-shuffle
ranked path; the factor join touches ≤ depth rows (AQE broadcasts the
cut list), and the final window is k-bounded post-limit — driver-trivial
at any corpus size, the same argument as hybrid fusion. Determinism: the
combined score is rounded to 6 BEFORE ordering (ties then break on the
frozen (conv_id, turn_idx) key), so mathematically-tied rescores order
identically across engines — the cross-engine contract every ranked row
in this repo follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from visionsearch_spark.index.store import IndexStore

_MODES = {"multiply", "sum"}


def function_score_topk(
    spark: SparkSession,
    store: IndexStore,
    query_text: str,
    factors: DataFrame,
    k: int = 10,
    depth: int = 50,
    mode: str = "multiply",
) -> DataFrame:
    """(conv_id, turn_idx, fscore, rank): BM25 top-`depth` for
    `query_text`, rescored as score·factor (mode="multiply", missing
    factor = 1) or score+factor (mode="sum", missing factor = 0), then
    re-cut to top-k by (round(fscore,6) desc, conv_id, turn_idx).
    `factors` must carry (conv_id, factor double) — per-UNIT factors
    would need the (conv_id, turn_idx) key; conv granularity matches the
    corpus-metadata use cases (popularity, recency, length priors)."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}")
    from visionsearch_spark.query import wand

    base = wand.batch_topk(spark, store, [(0, query_text, depth)])
    joined = base.join(
        F.broadcast(factors.select("conv_id", "factor")), "conv_id",
        "left",
    )
    if mode == "multiply":
        combined = F.col("score") * F.coalesce("factor", F.lit(1.0))
    else:
        combined = F.col("score") + F.coalesce("factor", F.lit(0.0))
    w = Window.orderBy(F.desc("fscore"), F.asc("conv_id"),
                       F.asc("turn_idx"))
    return (
        joined.select("conv_id", "turn_idx",
                      F.round(combined, 6).alias("fscore"))
        .orderBy(F.desc("fscore"), F.asc("conv_id"), F.asc("turn_idx"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("conv_id", "turn_idx", "fscore", "rank")
    )
