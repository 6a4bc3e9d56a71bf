"""LocalSearcher (load-once serving layer): rank identity with the
exhaustive oracle on the full query set + latency sanity."""

from __future__ import annotations

import math
import time

import pytest

from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.query.serving import LocalSearcher
from visionsearch_spark.oracle import oracle_search


@pytest.fixture(scope="module")
def searcher(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_serving"))
    store = build_index(transcripts, root, n_partitions=8, n_shards=16)
    return LocalSearcher(store)


def test_rank_identity_full_query_set(searcher, oracle_index, query_set):
    mismatches = []
    for row in query_set.itertuples(index=False):
        exp = oracle_search(oracle_index, row.query_text, k=row.k)
        got = searcher.search(row.query_text, k=row.k)
        if [(g[0], g[1], g[2]) for g in got] != [(e[0], e[1], e[2]) for e in exp]:
            mismatches.append((row.query_id, row.query_text))
            continue
        for g, e in zip(got, exp):
            if not math.isclose(g[3], e[3], rel_tol=1e-9):
                mismatches.append((row.query_id, "score"))
                break
    assert not mismatches, mismatches[:5]


def test_df_matches_oracle(searcher, oracle_index):
    for t in ["join", "filter", "xylophone", "zzzznotaword"]:
        assert searcher.df(t) == oracle_index.df.get(t, 0)


def test_oov_and_threshold(searcher, oracle_index):
    assert searcher.search("zzzznotaword", k=5) == []
    thr = 2.0
    exp = oracle_search(oracle_index, "join filter stream", k=30, threshold=thr)
    got = searcher.search("join filter stream", k=30, threshold=thr)
    assert len(got) == len(exp)
    assert all(g[3] > thr for g in got)


def test_serving_latency_is_milliseconds(searcher):
    searcher.search("join filter", k=10)  # warm
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        searcher.search("join filter stream", k=10)
    per_query = (time.perf_counter() - t0) / n
    assert per_query < 0.05, f"serving path too slow: {per_query * 1000:.1f} ms"
