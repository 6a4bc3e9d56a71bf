"""Reindex (store migration under new options, docids preserved)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from visionsearch_spark.index.reindex import reindex
from visionsearch_spark.index.spimi import build_index, compact_store
from visionsearch_spark.index.store import IndexStore
from visionsearch_spark.query.boolean import phrase_docids
from visionsearch_spark.query.wand import batch_topk


def _rows(df):
    return [(r.conv_id, r.turn_idx, round(r.score, 9))
            for r in df.orderBy("rank").collect()]


def test_reindex_to_positional_value_identical(spark, transcripts,
                                               tmp_path_factory):
    """Legacy (no positions) store with folded AND pending deletes →
    reindex to positional: identical docids, value-identical ranking
    to the source after its own purge fold, and phrase queries now ride
    the positional path."""
    from visionsearch_spark.index.deletes import delete_convs_local

    base = tmp_path_factory.mktemp("reidx")
    src_root, dst_root = str(base / "src"), str(base / "dst")
    src = build_index(transcripts, src_root, n_partitions=8, n_shards=16)
    convs = sorted(r.conv_id for r in
                   transcripts.select("conv_id").distinct().collect())
    delete_convs_local(src, convs[:3])
    compact_store(spark, src_root)          # folds the first deletes
    src = IndexStore(src_root)
    delete_convs_local(src, convs[3:5])     # pending at reindex time

    dst = reindex(spark, src_root, dst_root, positions=True)
    assert dst.has_positions()
    assert not dst.read_meta().get("tombstone_dirs")  # all folded

    # identical docid assignment: the staged tables are byte-equal views
    src_dm = {(r.conv_id, r.turn_idx): r.docid for r in
              spark.read.parquet(src.docmap_path)
              .select("docid", "conv_id", "turn_idx").collect()}
    dst_dm = {(r.conv_id, r.turn_idx): r.docid for r in
              spark.read.parquet(dst.docmap_path)
              .select("docid", "conv_id", "turn_idx").collect()}
    assert src_dm == dst_dm

    # value parity once the SOURCE folds its pending deletes too
    compact_store(spark, src_root)
    src = IndexStore(src_root)
    for q in ["join filter", "stream", "vector checkpoint"]:
        assert _rows(batch_topk(spark, dst, [(0, q, 15)])) \
            == _rows(batch_topk(spark, src, [(0, q, 15)])), q

    # the migrated store answers phrase queries from the index and
    # agrees with the source's staged-text path
    got = sorted(r.docid for r in
                 phrase_docids(spark, dst, "join filter").collect())
    want = sorted(r.docid for r in
                  phrase_docids(spark, src, "join filter").collect())
    assert got == want

    from visionsearch_spark.index.fsck import fsck

    rep = fsck(dst_root)
    assert all(rec["ok"] for rec in rep.values()), rep


def test_reindex_refuses_bad_targets(spark, transcripts,
                                     tmp_path_factory):
    base = tmp_path_factory.mktemp("reidx2")
    src_root = str(base / "src")
    build_index(transcripts.limit(50), src_root, n_partitions=4)
    with pytest.raises(ValueError, match="already exists"):
        reindex(spark, src_root, src_root)
    with pytest.raises(ValueError, match="not a built store"):
        reindex(spark, str(base / "nope"), str(base / "dst"))
