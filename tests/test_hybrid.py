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
