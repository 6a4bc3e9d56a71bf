"""Per-file term Bloom sidecars: no false negatives, planner pruning
never changes results, sidecars track every segment-write path."""

from __future__ import annotations

import os

import pytest

from visionsearch_spark.index import bloom
from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.query import wand
from visionsearch_spark.query.boolean import matching_docids


def test_build_has_no_false_negatives():
    terms = [f"term{i}" for i in range(5000)]
    m, k, payload = bloom.build_bloom(terms)
    import numpy as np

    bits = np.frombuffer(payload, dtype=np.uint8)
    assert all(bloom.may_contain(m, k, bits, t) for t in terms)


def test_false_positive_rate_reasonable():
    import numpy as np

    terms = [f"present{i}" for i in range(5000)]
    m, k, payload = bloom.build_bloom(terms)
    bits = np.frombuffer(payload, dtype=np.uint8)
    fp = sum(
        bloom.may_contain(m, k, bits, f"absent{i}") for i in range(5000)
    )
    assert fp / 5000 < 0.05


@pytest.fixture(scope="module")
def bloom_store(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloomidx"))
    return build_index(transcripts, root, n_partitions=8, n_shards=16)


def test_sidecar_per_segment_file(bloom_store):
    for d in bloom_store.segment_paths():
        seg = [f for f in os.listdir(d)
               if f.endswith(".parquet") and not f.startswith(("_", "."))]
        assert seg
        for f in seg:
            side = bloom.load_bloom(os.path.join(d, f))
            assert side is not None, f


def test_load_bloom_rejects_garbage(tmp_path):
    seg = str(tmp_path / "part-0.parquet")
    with open(bloom.bloom_path(seg), "wb") as f:
        f.write(b"not a bloom")
    assert bloom.load_bloom(seg) is None
    assert bloom.load_bloom(str(tmp_path / "missing.parquet")) is None


def _rare_term(bloom_store):
    """A term present in exactly one doc (df==1) -> lives in one file."""
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    t = pads.dataset(bloom_store.term_stats_paths()[0]).to_table()
    df = t.column("df").to_pylist()
    terms = t.column("term").to_pylist()
    for term, d in zip(terms, df):
        if d == 1:
            return term
    pytest.skip("fixture corpus has no df==1 term")


def test_prune_keeps_only_matching_files(bloom_store):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    term = _rare_term(bloom_store)
    files = wand._segment_files(bloom_store)
    kept = wand._bloom_prune(files, [term])
    # df==1 term lives in ONE of the 8 files; <5% FPR on the rest
    assert 1 <= len(kept) < len(files)
    holders = [
        p for _sz, p in files
        if pq.read_table(p, columns=["term"]).filter(
            pc.equal(pc.field("term"), term)).num_rows > 0
    ]
    assert holders and set(holders) <= {p for _sz, p in kept}


def test_prune_disabled_by_env(bloom_store, monkeypatch):
    files = wand._segment_files(bloom_store)
    monkeypatch.setenv("VSS_QUERY_NO_BLOOM", "1")
    assert wand._bloom_prune(files, ["zzzznotaword"]) == files


def test_missing_sidecar_file_is_kept(bloom_store, tmp_path):
    files = wand._segment_files(bloom_store)
    victim = files[0][1]
    side = bloom.bloom_path(victim)
    saved = side + ".saved"
    os.rename(side, saved)
    try:
        wand._BLOOM_CACHE.clear()
        kept = wand._bloom_prune(files, ["zzzznotaword"])
        assert victim in [p for _s, p in kept]
    finally:
        os.rename(saved, side)
        wand._BLOOM_CACHE.clear()


def test_results_identical_with_and_without_prune(spark, bloom_store,
                                                  monkeypatch):
    term = _rare_term(bloom_store)
    queries = [(0, f"join filter {term}", 10), (1, term, 5),
               (2, "the stream", 10)]
    got = [tuple(r) for r in wand.batch_topk(
        spark, bloom_store, queries).collect()]
    monkeypatch.setenv("VSS_QUERY_NO_BLOOM", "1")
    exp = [tuple(r) for r in wand.batch_topk(
        spark, bloom_store, queries).collect()]
    assert sorted(got) == sorted(exp)


def test_membership_identical_with_and_without_prune(spark, bloom_store,
                                                     monkeypatch):
    term = _rare_term(bloom_store)
    got = sorted(r.docid for r in matching_docids(
        spark, bloom_store, any_of=[term, "join"]).collect())
    monkeypatch.setenv("VSS_QUERY_NO_BLOOM", "1")
    exp = sorted(r.docid for r in matching_docids(
        spark, bloom_store, any_of=[term, "join"]).collect())
    assert got == exp and got


def test_append_defers_blooms_to_compaction(spark, transcripts,
                                            tmp_path_factory):
    """r6 (VERDICT r5 #6): appends skip the Bloom sidecar pass — delta
    dirs serve unpruned-but-correct until the next full compaction
    rewrites every file WITH a sidecar."""
    from pyspark.sql import functions as F

    from visionsearch_spark.index.spimi import compact_store
    from visionsearch_spark.index.store import IndexStore
    from visionsearch_spark.query import wand
    from visionsearch_spark.streaming.incremental import incremental_build

    root = str(tmp_path_factory.mktemp("bloomappend"))
    base = transcripts.filter(F.col("conv_id") < "conv-000070")
    build_index(base, root, n_partitions=8, n_shards=16)
    incremental_build(transcripts, root, n_partitions=8)
    store = IndexStore(root)
    dirs = store.segment_paths()
    assert len(dirs) > 1
    covered = {d: all(
        bloom.load_bloom(os.path.join(d, f)) is not None
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(("_", ".")))
        for d in dirs}
    assert sum(covered.values()) == len(dirs) - 1  # only the delta bare
    # unpruned fallback stays correct: pruning keeps every sidecar-less
    # file, so a query term living only in the delta still matches
    files = wand._segment_files(store)
    kept = wand._bloom_prune(files, ["zzzzneverseen"])
    delta_dir = next(d for d, ok in covered.items() if not ok)
    assert all(any(p.startswith(delta_dir) for _s, p in kept2)
               for kept2 in [kept])  # delta files never pruned away
    compact_store(spark, root, n_partitions=8)
    store = IndexStore(root)
    for d in store.segment_paths():
        for f in os.listdir(d):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                assert bloom.load_bloom(os.path.join(d, f)) is not None
