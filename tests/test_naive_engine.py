"""B3 rank-identity: naive Spark BM25 top-k must equal the exhaustive
pure-Python oracle on the full fixture query set — top-k docIDs identical,
scores within rel tol 1e-9 (SURVEY.md §5.2.1, §7 R2)."""

from __future__ import annotations

import math

import pytest

from visionsearch_spark.index.naive import bm25_topk, build_naive_index
from visionsearch_spark.oracle import oracle_search

REL_TOL = 1e-9


@pytest.fixture(scope="module")
def naive_index(transcripts):
    idx = build_naive_index(transcripts, n_partitions=8)
    return {k: v.cache() for k, v in idx.items()}


def test_corpus_stats_match_oracle(naive_index, oracle_index):
    stats = naive_index["corpus_stats"].collect()[0]
    assert stats["n_docs"] == oracle_index.n_docs
    assert math.isclose(stats["avgdl"], oracle_index.avgdl, rel_tol=1e-12)


def test_term_stats_match_oracle(naive_index, oracle_index):
    got = {r["term"]: r["df"] for r in naive_index["term_stats"].collect()}
    assert got == dict(oracle_index.df)


def test_rank_identity_full_query_set(spark, naive_index, oracle_index, query_set):
    mismatches = []
    for row in query_set.itertuples(index=False):
        expected = oracle_search(oracle_index, row.query_text, k=row.k)
        got = bm25_topk(spark, naive_index, row.query_text, k=row.k).collect()
        if len(got) != len(expected):
            mismatches.append((row.query_id, "len", len(got), len(expected)))
            continue
        for g, e in zip(got, expected):
            if (g["docid"], g["conv_id"], g["turn_idx"]) != (e[0], e[1], e[2]):
                mismatches.append((row.query_id, "ids", tuple(g), e))
                break
            if not math.isclose(g["score"], e[3], rel_tol=REL_TOL):
                mismatches.append((row.query_id, "score", g["score"], e[3]))
                break
    assert not mismatches, f"{len(mismatches)} query mismatches: {mismatches[:5]}"


def test_oov_query_returns_zero_rows(spark, naive_index):
    # NOT the reference's asset_ids[-1] padding bug (aisearch/core.py:62)
    assert bm25_topk(spark, naive_index, "zzzznotaword", k=5).count() == 0


def test_k_exceeding_matches_returns_fewer(spark, naive_index, oracle_index):
    got = bm25_topk(spark, naive_index, "xylophone", k=30).count()
    exp = len(oracle_search(oracle_index, "xylophone", k=30))
    assert got == exp
    assert got < 30
