"""Embedder surface: factory registry, deterministic hash-projection
embedder, and the dense pipeline end-to-end (text -> embedding -> ANN
index -> recall eval) with no model weights."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from visionsearch_spark.embedding import (
    BaseEmbedder,
    HashProjectionEmbedder,
    create_embedder,
    embed_text,
    register_embedder,
    token_hash,
)

SF_DIR = "/root/testdata/sf0.001"


def test_factory_registry():
    e = create_embedder("hash-projection", dim=12)
    assert isinstance(e, HashProjectionEmbedder)
    assert e.get_embed_dim() == 12
    with pytest.raises(ValueError, match="hash-projection"):
        create_embedder("no-such-model")
    with pytest.raises(NotImplementedError):
        e.extract_image_feature([b"png"])

    class Fake(BaseEmbedder):
        model_name = "fake"

        def get_embed_dim(self):
            return 2

        def extract_text_feature(self, texts):
            return np.zeros((len(texts), 2))

    register_embedder("fake", Fake)
    assert create_embedder("fake").get_embed_dim() == 2


def test_hashproj_deterministic_and_normalized():
    e = create_embedder("hash-projection", dim=16)
    texts = ["the quick brown fox", "the quick brown fox", "pasta sauce", ""]
    m1 = e.extract_text_feature(texts)
    m2 = e.extract_text_feature(list(texts))
    assert np.array_equal(m1, m2)
    assert m1.shape == (4, 16)
    assert np.array_equal(m1[0], m1[1])              # same text, same vector
    assert not np.array_equal(m1[0], m1[2])          # different text differs
    assert np.allclose(np.linalg.norm(m1[:3], axis=1), 1.0)
    assert np.array_equal(m1[3], np.zeros(16))       # zero-token doc
    # token_hash is the md5_number_lower arithmetic (pinned value so a
    # refactor can't silently change the cross-engine contract)
    import duckdb

    want = duckdb.connect().execute(
        "select md5_number_lower('fox')::HUGEINT % 2147483647"
    ).fetchone()[0]
    assert token_hash("fox") == int(want)


def test_embed_text_matches_local_embedder(spark):
    """The Arrow-batched UDF path == calling the embedder directly, for
    every doc, regardless of partitioning."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").repartition(7)
    got = {r["doc_id"]: np.array(r["embedding"])
           for r in embed_text(docs, dim=8).collect()}
    local = create_embedder("hash-projection", dim=8)
    pdf = docs.orderBy("doc_id").toPandas()
    want = local.extract_text_feature(pdf["text"].tolist())
    for i, did in enumerate(pdf["doc_id"]):
        assert np.array_equal(got[did], want[i]), did


def test_dense_pipeline_end_to_end(spark, tmp_path_factory):
    """transcripts-shaped corpus -> embed -> persisted LSH signature
    sidecar -> ann_recall_at_k: with pruning disabled (max_hamming =
    n_planes) recall is exactly 1.0 per query; with real pruning recall
    stays a valid fraction of k. The full dense path runs with the stub
    model only — swapping in a real encoder is one register_embedder."""
    from visionsearch_spark.operators.similarity import (
        ann_recall_at_k,
        build_ann_index,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").limit(200)
    emb = embed_text(docs, dim=16).withColumnRenamed("doc_id", "vec_id") \
        .cache()
    root = str(tmp_path_factory.mktemp("dense_e2e"))
    build_ann_index(emb, root, n_planes=16, seed=7)
    qids = [0, 1, 2]
    full = ann_recall_at_k(emb, root, qids, k=10, max_hamming=16).collect()
    assert sorted(r["query_vec_id"] for r in full) == qids
    assert all(r["recall"] == 1.0 for r in full), full
    pruned = ann_recall_at_k(emb, root, qids, k=10, max_hamming=4).collect()
    assert all(0.0 <= r["recall"] <= 1.0 for r in pruned)
    emb.unpersist()
