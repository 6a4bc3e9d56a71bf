"""Function-score rescoring vs hand-composition of the ranked path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.query.rescore import function_score_topk
from visionsearch_spark.query.wand import batch_topk


@pytest.fixture(scope="module")
def rs_store(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rescoreidx"))
    return build_index(transcripts, root, n_partitions=8, n_shards=16)


@pytest.fixture(scope="module")
def conv_factors(spark, transcripts):
    # a deterministic per-conv factor: ln(1 + number of turns)
    return transcripts.groupBy("conv_id").agg(
        F.log(F.lit(1.0) + F.count(F.lit(1))).alias("factor"))


def _hand(spark, store, factors, q, k, depth, mode):
    base = batch_topk(spark, store, [(0, q, depth)]).collect()
    fmap = {r.conv_id: r.factor for r in factors.collect()}
    out = []
    for r in base:
        f = fmap.get(r.conv_id)
        if mode == "multiply":
            s = r.score * (1.0 if f is None else f)
        else:
            s = r.score + (0.0 if f is None else f)
        out.append((r.conv_id, r.turn_idx, round(s, 6)))
    out.sort(key=lambda x: (-x[2], x[0], x[1]))
    return [(c, t, s, i + 1) for i, (c, t, s) in enumerate(out[:k])]


def test_function_score_matches_hand_composition(spark, rs_store,
                                                 conv_factors):
    for mode in ("multiply", "sum"):
        got = function_score_topk(spark, rs_store, "join filter",
                                  conv_factors, k=10, depth=40,
                                  mode=mode).orderBy("rank").collect()
        want = _hand(spark, rs_store, conv_factors, "join filter", 10,
                     40, mode)
        assert [(r.conv_id, r.turn_idx, r.rank) for r in got] \
            == [(c, t, rk) for c, t, _s, rk in want], mode
        for r, (_c, _t, s, _rk) in zip(got, want):
            assert math.isclose(r.fscore, s, abs_tol=2e-6)


def test_function_score_missing_factor_defaults(spark, rs_store):
    empty = rs_store  # factors frame with no matching convs
    spark_ = spark
    none_match = spark_.createDataFrame(
        [("conv-none", 2.0)], "conv_id string, factor double")
    base = batch_topk(spark_, rs_store, [(0, "join", 10)]) \
        .orderBy("rank").collect()
    got = function_score_topk(spark_, rs_store, "join", none_match,
                              k=10, depth=10).orderBy("rank").collect()
    # multiply with missing factor = 1.0: identical ranking and scores
    assert [(r.conv_id, r.turn_idx) for r in got] \
        == [(r.conv_id, r.turn_idx) for r in base]
    for g, b in zip(got, base):
        assert math.isclose(g.fscore, round(b.score, 6), abs_tol=2e-6)


def test_function_score_validates_mode(spark, rs_store, conv_factors):
    with pytest.raises(ValueError, match="mode"):
        function_score_topk(spark, rs_store, "join", conv_factors,
                            mode="divide")
