"""Serving-tier hybrid retrieval (r6): LocalVectorSearcher parity with
the Spark ANN operator, hybrid_serve parity with query/hybrid.hybrid_topk,
and the HTTP /hybrid endpoint vs hand-composition."""

from __future__ import annotations

import json
import urllib.request

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from visionsearch_spark.embedding import HashProjectionEmbedder
from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.operators.similarity import (
    build_ann_index,
    cosine_topk_lsh_indexed,
)
from visionsearch_spark.query.serving import (
    LocalSearcher,
    LocalVectorSearcher,
    hybrid_serve,
)

DIM = 16
QUERY_TEXTS = ["join filter stream", "vector checkpoint", "the fast scan"]


@pytest.fixture(scope="module")
def hybrid_root(spark, transcripts, tmp_path_factory):
    """(store, emb_path, ann_root, conv_ids): a fresh text store plus a
    conv-level embedding table (hash-projection of the conv's first
    turn) with an LSH signature sidecar."""
    root = tmp_path_factory.mktemp("hybsrv")
    store = build_index(transcripts, str(root / "idx"), n_partitions=8,
                        n_shards=16)
    first = (
        transcripts.filter(F.col("turn_idx") == 1)
        .select("conv_id", "text").orderBy("conv_id").collect()
    )
    conv_ids = [r.conv_id for r in first]
    vecs = HashProjectionEmbedder(DIM).extract_text_feature(
        [r.text for r in first])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(conv_ids))],
        "vec_id long, embedding array<double>",
    )
    emb_path = str(root / "emb")
    emb.write.parquet(emb_path)
    ann_root = str(root / "ann")
    build_ann_index(spark.read.parquet(emb_path), ann_root,
                    n_planes=16)
    return store, emb_path, ann_root, conv_ids


def _qvec(text: str) -> list[float]:
    return [float(x) for x in
            HashProjectionEmbedder(DIM).extract_text_feature([text])[0]]


def test_vector_searcher_matches_spark_ann(spark, hybrid_root):
    store, emb_path, ann_root, conv_ids = hybrid_root
    vs = LocalVectorSearcher(ann_root, emb_path,
                             conv_of=lambda i: conv_ids[i])
    emb = spark.read.parquet(emb_path)
    for qt in QUERY_TEXTS:
        qv = _qvec(qt)
        got = vs.topk(qv, k=10, max_hamming=4)
        want = cosine_topk_lsh_indexed(emb, ann_root, qv, k=10,
                                       max_hamming=4).collect()
        assert [cv for cv, _r, _c in got] \
            == [conv_ids[int(r.vec_id)] for r in want], qt
        for (_cv, _r, c), r in zip(got, want):
            assert abs(c - float(r.cos)) < 1e-9, qt


def test_hybrid_serve_matches_spark_hybrid(spark, hybrid_root):
    from visionsearch_spark.query.hybrid import hybrid_topk

    store, emb_path, ann_root, conv_ids = hybrid_root
    ls = LocalSearcher(store)
    vs = LocalVectorSearcher(ann_root, emb_path,
                             conv_of=lambda i: conv_ids[i])
    emb = spark.read.parquet(emb_path)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    for qt in QUERY_TEXTS:
        qv = _qvec(qt)
        got = hybrid_serve(ls, vs, qt, qv, k=10, depth=50)
        vec_ranked = (
            cosine_topk_lsh_indexed(emb, ann_root, qv, k=50,
                                    max_hamming=4)
            .withColumn("rank", F.row_number().over(w))
            .withColumn(
                "conv_id",
                F.udf(lambda i: conv_ids[i])(F.col("vec_id")))
            .select("conv_id", "rank")
        )
        want = hybrid_topk(spark, store, qt, vec_ranked, k=10,
                           depth=50).orderBy("rank").collect()
        assert [(cv, r) for cv, r, _f in got] \
            == [(x.conv_id, x.rank) for x in want], qt
        for (_cv, _r, f), x in zip(got, want):
            assert abs(f - float(x.fused)) < 1e-12, qt


@pytest.fixture(scope="module")
def hybrid_served(hybrid_root, tmp_path_factory):
    import threading

    from visionsearch_spark.sources.http_api import ServingApp

    store, emb_path, ann_root, conv_ids = hybrid_root
    vs = LocalVectorSearcher(ann_root, emb_path,
                             conv_of=lambda i: conv_ids[i])
    app = ServingApp(
        LocalSearcher(store),
        spool_dir=str(tmp_path_factory.mktemp("spool")),
        vec_searcher=vs,
    )
    srv = app.make_server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield app, f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _post(url: str, path: str, body: dict):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_hybrid_matches_hand_composition(hybrid_served, hybrid_root):
    app, url = hybrid_served
    store, emb_path, ann_root, conv_ids = hybrid_root
    for qt in QUERY_TEXTS:
        qv = _qvec(qt)
        code, resp = _post(url, "/hybrid",
                           {"q": qt, "vec": qv, "k": 10, "depth": 50})
        assert code == 200
        want = hybrid_serve(app.searcher, app.vec_searcher, qt, qv,
                            k=10, depth=50)
        assert [(h["conv_id"], h["rank"]) for h in resp["hits"]] \
            == [(cv, r) for cv, r, _f in want], qt
        for h, (_cv, _r, f) in zip(resp["hits"], want):
            assert abs(h["fused"] - f) < 1e-12  # JSON round-trips float64
    # an OOV text query still serves the vector list alone
    code, resp = _post(url, "/hybrid",
                       {"q": "zzzznotaword", "vec": _qvec("join"),
                        "k": 5, "depth": 50})
    assert code == 200 and resp["hits"]


def test_http_hybrid_validation(hybrid_served):
    _app, url = hybrid_served
    code, resp = _post(url, "/hybrid", {"q": "join", "vec": []})
    assert code == 400
    code, resp = _post(url, "/hybrid", {"q": "join"})
    assert code == 400
    code, resp = _post(url, "/hybrid",
                       {"q": "join", "vec": [1.0, 2.0]})  # wrong dim
    assert code == 400


def test_http_hybrid_404_without_vector_index(spark, transcripts,
                                              tmp_path_factory):
    import threading

    from visionsearch_spark.sources.http_api import ServingApp

    root = tmp_path_factory.mktemp("nohyb")
    store = build_index(transcripts, str(root / "idx"), n_partitions=8)
    app = ServingApp(LocalSearcher(store), spool_dir=str(root / "spool"))
    srv = app.make_server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        code, resp = _post(
            f"http://127.0.0.1:{srv.server_port}", "/hybrid",
            {"q": "join", "vec": [0.0] * DIM})
        assert code == 404
    finally:
        srv.shutdown()
