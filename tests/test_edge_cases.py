"""Degenerate-input hardening: tiny corpora, empty texts, k edge values.
The reference crashes or mis-answers on several of these (corpus<k padding
bug, `aisearch/core.py:62`); we must not."""

from __future__ import annotations

import pytest

from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.query.serving import LocalSearcher
from visionsearch_spark.query.wand import batch_topk, topk

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")


def _build(spark, tmp, rows, name):
    df = spark.createDataFrame(rows, SCHEMA)
    return build_index(df, str(tmp.mktemp(name)), n_partitions=2, n_shards=2)


def test_single_doc_corpus(spark, tmp_path_factory):
    store = _build(spark, tmp_path_factory,
                   [("c0", 1, "user", "lonely words here", "", None)], "one")
    got = topk(spark, store, "lonely", k=5).collect()
    assert len(got) == 1 and got[0]["docid"] == 0
    assert topk(spark, store, "absent", k=5).count() == 0


def test_empty_and_whitespace_texts(spark, tmp_path_factory):
    rows = [
        ("c0", 1, "user", "", "", None),
        ("c0", 2, "user", "   ...   ", "", None),
        ("c0", 3, "user", "real content token", "", None),
    ]
    store = _build(spark, tmp_path_factory, rows, "empty")
    assert store.read_meta()["n_docs"] == 3  # empty docs counted in N/avgdl
    got = topk(spark, store, "content", k=10).collect()
    assert len(got) == 1 and got[0]["turn_idx"] == 3
    s = LocalSearcher(store)
    assert [h[2] for h in s.search("content", k=10)] == [3]


def test_k_zero_and_k_huge(spark, tmp_path_factory):
    rows = [("c0", i, "user", "alpha beta", "", None) for i in range(1, 6)]
    store = _build(spark, tmp_path_factory, rows, "kk")
    assert batch_topk(spark, store, [(0, "alpha", 0)]).count() == 0
    assert batch_topk(spark, store, [(0, "alpha", 10_000)]).count() == 5
    s = LocalSearcher(store)
    assert s.search("alpha", k=0) == []
    assert len(s.search("alpha", k=10_000)) == 5


def test_empty_query_batch(spark, tmp_path_factory):
    rows = [("c0", 1, "user", "alpha", "", None)]
    store = _build(spark, tmp_path_factory, rows, "eq")
    assert batch_topk(spark, store, []).count() == 0
    assert batch_topk(spark, store, [(0, "", 5), (1, "...", 5)]).count() == 0
