"""RRF hybrid fusion — rank arithmetic, missing-list behavior, OOV
degeneration, determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.query.hybrid import RRF_C, hybrid_topk, rrf_fuse
from visionsearch_spark.query.wand import batch_topk


@pytest.fixture(scope="module")
def store(transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hyb") / "store")
    return build_index(transcripts, root, n_partitions=4)


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, rank int")


def test_rrf_arithmetic_exact(spark):
    a = _ranked(spark, [("x", 1), ("y", 2), ("z", 3)])
    b = _ranked(spark, [("y", 1), ("w", 2)])
    got = {r["conv_id"]: (r["rank"], r["fused"])
           for r in rrf_fuse([a, b], k=10).collect()}
    want = {
        "y": 1 / (RRF_C + 2) + 1 / (RRF_C + 1),
        "x": 1 / (RRF_C + 1),
        "w": 1 / (RRF_C + 2),
        "z": 1 / (RRF_C + 3),
    }
    assert set(got) == set(want)
    for cid, f in want.items():
        assert math.isclose(got[cid][1], f, rel_tol=1e-15), cid
    order = sorted(got, key=lambda c: got[c][0])
    assert order == sorted(want, key=lambda c: (-want[c], c))


def test_rrf_tie_breaks_on_id(spark):
    a = _ranked(spark, [("b", 1), ("a", 2)])
    b = _ranked(spark, [("a", 1), ("b", 2)])
    got = [r["conv_id"] for r in sorted(rrf_fuse([a, b], k=2).collect(),
                                        key=lambda r: r["rank"])]
    assert got == ["a", "b"]  # equal fused -> id asc


def test_hybrid_degenerates_to_vector_list_on_oov(spark, store):
    vec = _ranked(spark, [("conv-000001", 1), ("conv-000002", 2)])
    got = sorted(hybrid_topk(spark, store, "zzzznotaword", vec, k=5)
                 .collect(), key=lambda r: r["rank"])
    assert [r["conv_id"] for r in got] == ["conv-000001", "conv-000002"]


def test_hybrid_matches_manual_fusion(spark, store):
    depth, k = 20, 8
    vec = _ranked(spark, [(f"conv-{i:06d}", i) for i in range(1, 11)])
    got = sorted(hybrid_topk(spark, store, "join filter", vec,
                             k=k, depth=depth).collect(),
                 key=lambda r: r["rank"])
    bm: dict[str, int] = {}
    for r in batch_topk(spark, store, [(0, "join filter", depth)]).collect():
        bm[r["conv_id"]] = min(bm.get(r["conv_id"], r["rank"]), r["rank"])
    vr = {f"conv-{i:06d}": i for i in range(1, 11)}
    fused = {}
    for cid in set(bm) | set(vr):
        f = 0.0
        if cid in bm:
            f += 1 / (RRF_C + bm[cid])
        if cid in vr:
            f += 1 / (RRF_C + vr[cid])
        fused[cid] = f
    want = sorted(fused, key=lambda c: (-fused[c], c))[:k]
    assert [r["conv_id"] for r in got] == want
    for r in got:
        assert math.isclose(r["fused"], fused[r["conv_id"]], rel_tol=1e-15)


def test_weighted_fuse_arithmetic(spark):
    from visionsearch_spark.query.hybrid import weighted_fuse

    a = spark.createDataFrame([("x", 10.0), ("y", 5.0), ("z", 0.0)],
                              "conv_id string, score double")
    b = spark.createDataFrame([("y", 2.0), ("w", 1.0)],
                              "conv_id string, score double")
    got = {r["conv_id"]: r["fused"]
           for r in weighted_fuse([(a, 0.75), (b, 0.25)], k=10).collect()}
    # a normalizes x=1, y=.5, z=0; b (two rows) y=1, w=0
    want = {"x": 0.75, "y": 0.75 * 0.5 + 0.25, "z": 0.0, "w": 0.0}
    assert set(got) == set(want)
    for cid, f in want.items():
        assert math.isclose(got[cid], f, rel_tol=1e-15), cid


def test_weighted_fuse_constant_and_empty_lists(spark):
    from visionsearch_spark.query.hybrid import weighted_fuse

    const = spark.createDataFrame([("a", 3.0), ("b", 3.0)],
                                  "conv_id string, score double")
    empty = spark.createDataFrame([], "conv_id string, score double")
    got = {r["conv_id"]: r["fused"]
           for r in weighted_fuse([(const, 0.5), (empty, 0.5)],
                                  k=5).collect()}
    assert got == {"a": 0.5, "b": 0.5}  # constant list -> presence at 1.0


def test_hybrid_weighted_alpha_extremes(spark, store):
    """alpha=1 reduces to normalized BM25 order; alpha=0 to the vector
    list's order."""
    from visionsearch_spark.query.hybrid import hybrid_weighted_topk

    vec = spark.createDataFrame(
        [(f"conv-{i:06d}", 1.0 - i / 10.0) for i in range(1, 9)],
        "conv_id string, score double")
    bm_only = hybrid_weighted_topk(spark, store, "join filter", vec,
                                   k=5, alpha=1.0).collect()
    full = batch_topk(spark, store, [(0, "join filter", 50)]).collect()
    bm_convs = {}
    for r in full:
        bm_convs[r["conv_id"]] = max(bm_convs.get(r["conv_id"], 0.0),
                                     r["score"])
    want = sorted(bm_convs, key=lambda c: (-bm_convs[c], c))[:5]
    assert [r["conv_id"] for r in
            sorted(bm_only, key=lambda r: r["rank"])] == want
    vec_only = hybrid_weighted_topk(spark, store, "join filter", vec,
                                    k=3, alpha=0.0).collect()
    assert [r["conv_id"] for r in
            sorted(vec_only, key=lambda r: r["rank"])] == \
        ["conv-000001", "conv-000002", "conv-000003"]
