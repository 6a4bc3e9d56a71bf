"""Term vectors — the ES `_termvectors` surface: per-document term
statistics (tf, token positions) joined with corpus-level df.

Two forms, same semantics:

* :func:`term_vector_frame` — the DataFrame operator over a documents
  table (the contract-row form): one posexplode of the target doc, one
  distinct-(doc,term) aggregation for corpus df (at 100 TB serve df from
  the index's term_stats instead — the serving form below does), one
  broadcast-sized join keyed by the target doc's ≤dl distinct terms.
* ``LocalSearcher.term_vector`` (query/serving.py) — the serving form:
  staged point lookup for the text (same O(1) machinery as snippets),
  positions from the frozen analyzer, df from the searcher's
  already-loaded block index — zero Spark jobs, zero extra scans.

Positions are 0-based indices into the ANALYZED token list, space-joined
into a string (cross-engine hashable); the same coordinate pos_bin
stores, so a positional store's payloads can be spot-checked against
this surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import tokens_col

TERM_VECTOR_DDL = "term string, tf long, positions string, df long"


def term_vector_frame(docs: DataFrame, target_id: int,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(term, tf, positions, df) rows for one document; df counts docs
    containing the term across the WHOLE input frame. Empty result for
    an unknown id or empty text."""
    occ = (
        docs.filter(F.col(id_col) == target_id)
        .select(F.posexplode(tokens_col(text_col)).alias("pos", "term"))
    )
    tv = occ.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.concat_ws(
            " ",
            F.transform(F.sort_array(F.collect_list("pos")),
                        lambda p: p.cast("string")),
        ).alias("positions"),
    )
    dfreq = (
        docs.select(F.col(id_col),
                    F.explode(tokens_col(text_col)).alias("term"))
        .dropDuplicates([id_col, "term"])
        .groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    return tv.join(dfreq, "term").select("term", "tf", "positions", "df")


def term_vector_local(searcher, conv_id: str, turn_idx: int
                      ) -> list[tuple[str, int, list[int], int]]:
    """Serving-tier term vector for one unit: [(term, tf, positions,
    df)] sorted by term — staged point lookup + frozen analyzer +
    the searcher's in-memory df. [] for an unknown key."""
    import numpy as np

    from visionsearch_spark.analyzer import tokenize
    from visionsearch_spark.query.highlight import fetch_texts

    hits = np.flatnonzero(
        (searcher._conv == conv_id) & (searcher._turn == turn_idx))
    if not hits.size:
        return []
    docid = int(hits[0])
    text = fetch_texts(searcher.store, [docid]).get(docid)
    toks = tokenize(text or "")
    agg: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        agg.setdefault(t, []).append(i)
    return [
        (t, len(ps), ps, searcher.df(t))
        for t, ps in sorted(agg.items())
    ]
