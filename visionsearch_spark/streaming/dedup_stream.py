"""Streaming exact dedup — emit only the FIRST occurrence of each text.

The streaming form of `operators/dedup.exact_dedup` (keep-first): an
unbounded document stream is deduplicated on sha256(text) with
`applyInPandasWithState`. State shards by a hash-prefix group key
(`pmod(xxhash64(digest), n_groups)`), so the seen-set scales out across
executors and each micro-batch shuffles only its delta; within a group
the state is the list of seen digests — memory is O(distinct texts /
n_groups) per group, the unavoidable floor for EXACT streaming dedup
(use the MinHash operators for sublinear approximate dedup).

Keep-first semantics: the first arrival wins. Within one micro-batch,
rows are processed in ascending id order, so a stream spooled in id
order reproduces batch exact_dedup's min-id winner exactly (pinned in
tests/test_sessionize.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_DDL = "doc_id long, text_hash string"
STATE_DDL = "seen array<string>"


def dedup_stream(
    docs: DataFrame,
    n_groups: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs: STREAMING DataFrame with (doc_id long, text string).
    Returns a streaming DataFrame (doc_id, text_hash) containing each
    distinct text's first-arriving row only."""

    def fn(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        chunks = list(pdfs)
        if not chunks:
            if state.exists:
                state.update((sorted(seen),))
            return
        # concat THEN sort: a large group spans several Arrow chunks
        # (maxRecordsPerBatch) in arbitrary arrival order — sorting each
        # chunk alone would make the in-batch winner nondeterministic
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(id_col, kind="mergesort")
        out_ids: list[int] = []
        out_hashes: list[str] = []
        for i, h in zip(pdf[id_col], pdf["_h"]):
            if h not in seen:
                seen.add(h)
                out_ids.append(int(i))
                out_hashes.append(h)
        state.update((sorted(seen),))
        if out_ids:
            yield pd.DataFrame({"doc_id": out_ids, "text_hash": out_hashes})

    hashed = docs.select(
        F.col(id_col),
        F.sha2(F.col(text_col), 256).alias("_h"),
    ).withColumn("_g", F.pmod(F.xxhash64("_h"), F.lit(n_groups)))
    return hashed.groupBy("_g").applyInPandasWithState(
        fn, OUT_DDL, STATE_DDL, "append", GroupStateTimeout.NoTimeout
    )
