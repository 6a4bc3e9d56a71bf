"""Insert-or-replace (upsert_convs) — Lucene updateDocument semantics.

Contract under test (streaming/incremental.upsert_convs):
- replaced convs serve ONLY the new content immediately (old units
  tombstoned, new units live), under stale global stats until the fold;
- pending_rows ignores tombstoned rows, so byte-identical re-ingestion
  after a delete really re-indexes (the delete-then-re-add contract);
- after compaction the store is value-identical (conv keys + scores) to
  a fresh build over the modified corpus;
- unknown convs are plain inserts; re-running the same upsert leaves
  query results unchanged (idempotent end state);
- the delete-first crash window (tombstones flipped, append missing) is
  completed by re-running the same call.
"""

from __future__ import annotations

import math
import shutil

import pytest
from pyspark.sql import functions as F

from visionsearch_spark.index.spimi import build_index, compact_store
from visionsearch_spark.index.store import IndexStore
from visionsearch_spark.query.wand import batch_topk
from visionsearch_spark.streaming.incremental import upsert_convs

REL_TOL = 1e-9
TX_DDL = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")


@pytest.fixture(scope="module")
def base_store(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ups_base") / "store")
    return build_index(transcripts, root, n_partitions=4)


@pytest.fixture()
def store(base_store, tmp_path):
    dst = str(tmp_path / "store")
    shutil.copytree(base_store.root, dst)
    return IndexStore(dst)


def _top(spark, store, q, k=10):
    rows = batch_topk(spark, store, [(0, q, k)]).collect()
    return sorted(rows, key=lambda r: r["rank"])


def _replacement(spark, transcripts, conv_ids, marker="xyzreplacement"):
    """New single-turn bodies for the given convs, tagged with a marker
    token that exists nowhere else."""
    return (
        transcripts.filter(F.col("conv_id").isin(conv_ids))
        .filter(F.col("turn_idx") == 1)  # fixtures number turns from 1
        .withColumn("text", F.concat(F.lit(f"{marker} "), F.col("text")))
    )


def test_replaced_convs_serve_new_content_only(spark, transcripts, store):
    victims = [r["conv_id"] for r in _top(spark, store, "join filter")[:2]]
    delta = _replacement(spark, transcripts, victims)
    n_units_before = spark.read.parquet(store.docmap_path).filter(
        F.col("conv_id").isin(victims)).count()
    store = upsert_convs(delta, store.root)
    # the marker token finds exactly the replaced convs
    got = _top(spark, store, "xyzreplacement", k=50)
    assert {r["conv_id"] for r in got} == set(victims)
    # every OLD unit of the victims is gone from ranking: a query that
    # previously hit their other turns no longer returns them past turn 0
    rows = batch_topk(spark, store, [(0, "join filter stream", 500)]
                      ).collect()
    victim_rows = [r for r in rows if r["conv_id"] in victims]
    assert all(r["turn_idx"] == 1 for r in victim_rows)
    # docmap keeps both copies (stale rule) but only new ones are live
    n_units_after = spark.read.parquet(store.docmap_path).filter(
        F.col("conv_id").isin(victims)).count()
    assert n_units_after == n_units_before + len(victims)


def test_upsert_unknown_conv_is_plain_insert(spark, store):
    delta = spark.createDataFrame(
        [("brandnew-0001", 0, "user", "xyzfresh insert body", "", None)],
        TX_DDL,
    )
    store = upsert_convs(delta, store.root)
    got = _top(spark, store, "xyzfresh")
    assert [r["conv_id"] for r in got] == ["brandnew-0001"]
    assert store.read_meta().get("tombstone_dirs") in (None, [],)


def test_compacted_upsert_equals_fresh_build(spark, transcripts, store,
                                             tmp_path):
    victims = [r["conv_id"] for r in _top(spark, store, "join filter")[:3]]
    delta = _replacement(spark, transcripts, victims)
    store = upsert_convs(delta, store.root)
    store = compact_store(spark, store.root)
    # reference corpus: victims' turns replaced by the single new turn
    ref_tx = transcripts.filter(~F.col("conv_id").isin(victims)) \
        .unionByName(delta)
    ref = build_index(ref_tx, str(tmp_path / "ref"), n_partitions=4)
    for q in ["join filter stream", "xyzreplacement", "join"]:
        a = _top(spark, store, q, k=30)
        b = _top(spark, ref, q, k=30)
        assert [(r["conv_id"], r["turn_idx"]) for r in a] == \
            [(r["conv_id"], r["turn_idx"]) for r in b], q
        for x, y in zip(a, b):
            assert math.isclose(x["score"], y["score"], rel_tol=REL_TOL)


def test_rerun_same_upsert_is_result_stable(spark, transcripts, store):
    """Re-running the same upsert replaces the copy with an identical
    one: the LIVE row set is unchanged (same hits, same order), scores
    drift only through the stale-stats rule (the dead copy still counts
    in df/N until the fold), and compaction restores exact equality."""
    victims = [r["conv_id"] for r in _top(spark, store, "join filter")[:2]]
    delta = _replacement(spark, transcripts, victims)
    store = upsert_convs(delta, store.root)
    store = compact_store(spark, store.root)
    before = [(r["conv_id"], r["turn_idx"], round(r["score"], 9))
              for r in _top(spark, store, "join filter stream", k=30)]
    store = upsert_convs(delta, store.root)  # same call again
    mid = [(r["conv_id"], r["turn_idx"])
           for r in _top(spark, store, "join filter stream", k=30)]
    assert [b[:2] for b in before] == mid  # same hits, stale scores
    store = compact_store(spark, store.root)
    after = [(r["conv_id"], r["turn_idx"], round(r["score"], 9))
             for r in _top(spark, store, "join filter stream", k=30)]
    assert before == after  # fold restores exact score equality
    got = _top(spark, store, "xyzreplacement", k=50)
    assert {r["conv_id"] for r in got} == set(victims)


def test_crash_between_delete_and_append_completes_on_rerun(
        spark, transcripts, store):
    """Simulate the delete-first crash window: tombstones flipped but the
    append never ran — the convs are absent (never duplicated); re-running
    the same upsert completes the replacement."""
    from visionsearch_spark.index.deletes import delete_convs

    victims = [r["conv_id"] for r in _top(spark, store, "join filter")[:2]]
    delta = _replacement(spark, transcripts, victims)
    # the crash: only the delete half happened
    delete_convs(spark, store, delta.select("conv_id"))
    mid = batch_topk(spark, store, [(0, "join filter stream", 500)]).collect()
    assert not {r["conv_id"] for r in mid} & set(victims)
    # re-run the full upsert call
    store = upsert_convs(delta, store.root)
    got = _top(spark, store, "xyzreplacement", k=50)
    assert {r["conv_id"] for r in got} == set(victims)
    # exactly one live copy: the marker query returns one row per conv
    assert len(got) == len(victims)


def test_delete_then_identical_reingest_reindexes(spark, transcripts,
                                                  store):
    """pending_rows must not let dead docmap rows block re-ingestion of
    byte-identical content."""
    from visionsearch_spark.index.deletes import delete_convs
    from visionsearch_spark.streaming.incremental import incremental_build

    victims = [r["conv_id"] for r in _top(spark, store, "join filter")[:1]]
    delete_convs(
        spark, store,
        spark.createDataFrame([(v,) for v in victims], "conv_id string"),
    )
    assert not {r["conv_id"]
                for r in _top(spark, store, "join filter", k=50)} \
        & set(victims)
    same_rows = transcripts.filter(F.col("conv_id").isin(victims))
    store = incremental_build(same_rows, store.root)
    got = _top(spark, store, "join filter", k=50)
    assert set(victims) <= {r["conv_id"] for r in got}


def test_local_searcher_serves_upserted_store(spark, transcripts, store):
    """Before the fold, the docmap holds BOTH copies of a replaced conv
    (same (conv, turn) key, different docids) — the serving tier must
    rank only the live one, and the in-process deny array must match
    batch_topk's DENY sideband ranking exactly."""
    from visionsearch_spark.query.serving import (
        LocalSearcher,
        ShardedSearcher,
    )

    victims = [r["conv_id"] for r in _top(spark, store, "join filter")[:2]]
    delta = _replacement(spark, transcripts, victims)
    store = upsert_convs(delta, store.root)
    for searcher in (LocalSearcher(store), ShardedSearcher(store, 3)):
        hits = searcher.search("xyzreplacement", k=50)
        assert {h[1] for h in hits} == set(victims)
        assert len(hits) == len(victims)  # exactly one live copy each
        wide = searcher.search("join filter stream", k=500)
        assert all(t == 1 for _d, c, t, _s in wide if c in victims)
    # engine parity on the same store (deny sideband vs in-process mask)
    eng = batch_topk(spark, store, [(0, "join filter stream", 30)]
                     ).collect()
    srv = LocalSearcher(store).search("join filter stream", k=30)
    assert [(r["docid"]) for r in
            sorted(eng, key=lambda r: r["rank"])] == [h[0] for h in srv]
