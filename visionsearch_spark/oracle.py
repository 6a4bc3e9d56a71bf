"""Exhaustive pure-Python BM25 oracle — the reference engine for tests.

Mirrors the reference's correctness posture: FAISS IndexFlatIP scores
EVERY vector exactly, no pruning
(`/root/reference/visionsearch/common_utils/indexing/faiss_index/core.py:7,13-16`);
the vendored eval harness materializes the full query×doc score matrix
(`perception_models/apps/pe/clip_benchmark/metrics/zeroshot_retrieval.py:98`).
Here: score every document against every query with the frozen BM25 spec,
argsort with the deterministic tie-break, take k.

Also fixes the reference's corpus<k padding bug (`aisearch/core.py:62`
returns asset_ids[-1] for FAISS's -1 padding): we return fewer rows.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from visionsearch_spark.analyzer import tokenize
from visionsearch_spark.bm25 import idf, tf_weight


@dataclass
class OracleIndex:
    docs: list[tuple[str, int]]        # docid -> (conv_id, turn_idx)
    tfs: list[Counter]                 # docid -> term -> tf
    dls: list[int]                     # docid -> token count
    df: Counter                        # term -> doc frequency
    avgdl: float

    @property
    def n_docs(self) -> int:
        return len(self.docs)


def build_oracle_index(rows: list[tuple[str, int, str]]) -> OracleIndex:
    """rows: (conv_id, turn_idx, text). docid = position in sorted key order
    (deterministic analog of the reference's sorted-glob enumerate,
    `aisearch/main.py:28-33`)."""
    rows = sorted(rows, key=lambda r: (r[0], r[1]))
    docs, tfs, dls = [], [], []
    df: Counter = Counter()
    for conv_id, turn_idx, text in rows:
        toks = tokenize(text)
        c = Counter(toks)
        docs.append((conv_id, turn_idx))
        tfs.append(c)
        dls.append(len(toks))
        for t in c:
            df[t] += 1
    avgdl = (sum(dls) / len(dls)) if dls else 0.0
    return OracleIndex(docs=docs, tfs=tfs, dls=dls, df=df, avgdl=avgdl)


def oracle_search(
    idx: OracleIndex,
    query: str,
    k: int = 5,
    threshold: float = 0.0,
) -> list[tuple[int, str, int, float]]:
    """Top-k as [(docid, conv_id, turn_idx, score)], exhaustively scored.

    threshold mirrors `aisearch/core.py:58` (`similiraty_threshold=0.1`);
    default 0.0 because BM25 scores are not cosine-bounded.
    """
    qterms = sorted(set(tokenize(query)))  # canonical accumulation order (R2)
    if not qterms or idx.n_docs == 0:
        return []
    idfs = {t: idf(idx.n_docs, idx.df[t]) for t in qterms if idx.df[t] > 0}
    if not idfs:
        return []
    scored: list[tuple[float, str, int, int]] = []
    for docid in range(idx.n_docs):
        tf_map = idx.tfs[docid]
        s = 0.0
        for t in qterms:
            if t in idfs and tf_map.get(t, 0) > 0:
                s += idfs[t] * tf_weight(tf_map[t], idx.dls[docid], idx.avgdl)
        if s > threshold:
            conv_id, turn_idx = idx.docs[docid]
            scored.append((-s, conv_id, turn_idx, docid))
    scored.sort()  # (-score, conv_id, turn_idx) == (score desc, conv asc, turn asc)
    return [(d, c, t, -ns) for ns, c, t, d in scored[:k]]
