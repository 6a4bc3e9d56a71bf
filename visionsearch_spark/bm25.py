"""Frozen BM25 scoring spec shared by every path (oracle, naive, WAND, SQL).

score(q, d) = sum over UNIQUE query terms t of
    idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))          # Lucene-style, >= 0

k1 = 1.2, b = 0.75 (north rule). N = total docs, df = docs containing t,
tf = occurrences of t in d, dl = token count of d, avgdl = mean dl.

This length normalization is the lexical analog of the reference's
`faiss.normalize_L2` on both index and query sides
(`/root/reference/visionsearch/common_utils/indexing/faiss_index/core.py:10,14`);
the exhaustive-scan-is-truth posture mirrors IndexFlatIP
(`faiss_index/core.py:13-16`).

Determinism contract (SURVEY.md §7 R2): scores are float64; ties broken by
(score DESC, conv_id ASC, turn_idx ASC); engines must match the oracle
rank-identically with scores within rel tol 1e-9.
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_weight(tf: float, dl: float, avgdl: float) -> float:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


# SQL fragments (valid in both Spark SQL and DuckDB) — {n}, {df}, {tf},
# {dl}, {avgdl} substituted by callers. ln() exists in both dialects.
IDF_SQL = "ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5))"
TFW_SQL = "({tf} * 2.2) / ({tf} + 1.2 * (1.0 - 0.75 + 0.75 * {dl} / {avgdl}))"
