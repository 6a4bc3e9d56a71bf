"""BM25F-lite: multi-field weighted search over a field-unit store.

The reference effectively searches two text surfaces per asset — the
caption variant indexes generated caption sentences next to the primary
text (`/root/reference/visionsearch/common_utils/aisearch/core.py:82-111`;
the two text columns live side by side in `images/models.py:5-6`) — but
offers no way to weight them. Here a document's fields are indexed as
typed units (turn_idx = field id, the same unit infrastructure as
sentence fan-out) and the doc score is the WEIGHTED SUM of per-field
BM25 scores:

    score(doc) = Σ_f  w_f · BM25(q, field_f(doc))

computed under unit-level corpus stats (each field-unit is a scoring
unit). This is the "BM25F-lite" simplification: per-field termination of
tf saturation, linear field weights, no cross-field tf pooling.

Plan shape (and why it differs from units.unit_topk): a MAX collapse can
cut per partition before merging — a doc's best unit bounds its score.
A weighted SUM cannot (two mediocre fields can out-sum one good one), so
the plan is: uncut unit scores (wand.unit_scores — still term-IN pruned,
shard-co-located, threshold-filtered) → one groupBy(conv) weighted sum →
TakeOrderedAndProject top-k. Two exchanges total, both over matched rows
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from visionsearch_spark.index.store import IndexStore
from visionsearch_spark.query.wand import unit_scores

# field ids (the store's turn_idx) -> weight; title hits count double
FIELD_WEIGHTS = {1: 2.0, 2: 1.0}

FIELDED_RESULT_DDL = "rank int, conv_id string, score double"


def fielded_topk(
    spark: SparkSession,
    store: IndexStore,
    query_text: str,
    k: int = 10,
    field_weights: dict[int, float] | None = None,
    threshold: float = 0.0,
    n_tasks: int | None = None,
) -> DataFrame:
    """Top-k documents by Σ_f w_f · BM25_f over a field-unit store.

    Fields absent from field_weights are ignored (weight NULL filtered) —
    searching a subset of fields needs no rebuild. Ties break on conv_id
    ascending; the sum over a doc's ≤ len(field_weights) matched fields
    is order-insensitive for the 2-field default (IEEE addition is
    commutative), matching the SQL oracle bit-for-bit."""
    fw = field_weights or FIELD_WEIGHTS
    us = unit_scores(spark, store, [(0, query_text)], threshold, n_tasks)
    wmap = F.create_map(
        *[F.lit(x) for fid_w in sorted(fw.items()) for x in fid_w]
    )
    doc = (
        us.withColumn("w", wmap[F.col("turn_idx")])
        .filter(F.col("w").isNotNull())
        .groupBy("conv_id")
        .agg(F.sum(F.col("w") * F.col("score")).alias("score"))
    )
    top = doc.orderBy(F.desc("score"), F.asc("conv_id")).limit(k)
    # rank over the k surviving rows only (the limit above is the
    # distributed TakeOrderedAndProject; this window sees k rows)
    w = Window.orderBy(F.desc("score"), F.asc("conv_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "conv_id", "score"
    )
