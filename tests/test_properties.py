"""Property / metamorphic / golden tests (SURVEY.md §5.2.3, §5.2.5).

(a) input partitioning never changes engine results (build determinism);
(b) duplicate-then-dedup is identity on the doc set;
(c) recall invariant: docs holding a unique marker term are always all
    returned for that term's query, before and after appending unrelated
    docs (full score equality under append is NOT expected — N/avgdl
    legitimately shift every BM25 score);
(d) engine == exhaustive oracle on RANDOM corpora/queries (seeded);
(e) golden end-to-end: checked-in expected (docid, score) JSON — any
    drift in tokenizer/scoring/tie-break fails loudly even if engine and
    in-process oracle drift together.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest

from visionsearch_spark.fixtures import TRANSCRIPTS_SCHEMA
from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.oracle import build_oracle_index, oracle_search
from visionsearch_spark.query.wand import batch_topk

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_topk.json")


def test_partitioning_invariance(spark, transcripts, tmp_path_factory):
    """(a) same corpus through 1-partition and 16-partition inputs must
    produce byte-identical docmaps and identical query answers."""
    roots = []
    for i, np_in in enumerate([1, 16]):
        root = str(tmp_path_factory.mktemp(f"idx_pi{i}"))
        build_index(transcripts.repartition(np_in), root,
                    n_partitions=4, n_shards=8)
        roots.append(root)
    from visionsearch_spark.index.store import IndexStore

    maps = []
    for root in roots:
        dm = spark.read.parquet(IndexStore(root).docmap_path) \
            .orderBy("docid").collect()
        maps.append([(r["docid"], r["conv_id"], r["turn_idx"], r["dl"]) for r in dm])
    assert maps[0] == maps[1]
    answers = []
    for root in roots:
        res = batch_topk(spark, IndexStore(root), [(0, "join filter", 10)]).collect()
        answers.append(sorted((r["rank"], r["docid"], r["score"]) for r in res))
    assert answers[0] == answers[1]


def test_duplicate_then_dedup_identity(spark):
    """(b) exact dedup of corpus+duplicates == original doc set."""
    from visionsearch_spark.operators.dedup import exact_dedup

    base = [(i, f"unique text number {i} alpha beta") for i in range(20)]
    dups = [(100 + i, t) for i, (j, t) in enumerate(base[:7])]
    df = spark.createDataFrame(base + dups, "doc_id long, text string")
    kept = sorted(r["keep_id"] for r in exact_dedup(df).collect())
    assert kept == sorted(i for i, _t in base)


def test_marker_recall_stable_under_append(spark, tmp_path_factory):
    """(c) unique-marker docs are all recalled; appending unrelated docs
    never removes them (df of the marker is unchanged)."""
    from visionsearch_spark.streaming.incremental import incremental_build

    rows = [
        ("c-0", 1, "user", "zebra quantum marker here", "", None),
        ("c-1", 1, "user", "plain filler words only", "", None),
        ("c-1", 2, "user", "zebra again in another conversation", "", None),
    ]
    extra = [("c-9", 1, "user", "totally unrelated filler text", "", None)]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    root = str(tmp_path_factory.mktemp("idx_marker"))
    df1 = spark.createDataFrame(rows, schema)
    incremental_build(df1, root, n_partitions=2)
    from visionsearch_spark.index.store import IndexStore

    store = IndexStore(root)
    before = {r["docid"] for r in batch_topk(spark, store, [(0, "zebra", 10)]).collect()}
    assert len(before) == 2
    incremental_build(spark.createDataFrame(rows + extra, schema), root, n_partitions=2)
    after = {r["docid"] for r in batch_topk(spark, store, [(0, "zebra", 10)]).collect()}
    assert after == before


@pytest.mark.parametrize("seed", [7, 99])
def test_random_corpus_rank_identity(spark, tmp_path_factory, seed):
    """(d) engine == exhaustive oracle on random corpora and queries."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for c in range(40):
        for t in range(1, int(rng.integers(1, 6)) + 1):
            n = int(rng.integers(1, 15))
            text = " ".join(vocab[int(i)] for i in rng.integers(0, 60, n))
            rows.append((f"c{c:03d}", t, "user", text, "", None))
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    df = spark.createDataFrame(rows, schema)
    root = str(tmp_path_factory.mktemp(f"idx_rand{seed}"))
    store = build_index(df, root, n_partitions=4, n_shards=8)
    oracle = build_oracle_index([(r[0], r[1], r[3]) for r in rows])
    queries = []
    for qid in range(10):
        nq = int(rng.integers(1, 4))
        queries.append((qid, " ".join(vocab[int(i)] for i in rng.integers(0, 60, nq)),
                        int(rng.choice([3, 5, 10]))))
    got = batch_topk(spark, store, queries).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, text, k in queries:
        exp = oracle_search(oracle, text, k=k)
        rows_ = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [(r["docid"],) for r in rows_] == [(e[0],) for e in exp], (seed, qid, text)
        for g, e in zip(rows_, exp):
            assert math.isclose(g["score"], e[3], rel_tol=1e-9)


def test_tie_break_at_local_k_boundary(spark, tmp_path_factory):
    """Many docs with IDENTICAL scores (same tf, same dl) competing for k
    slots: the engine must return the smallest docids — i.e. smallest
    (conv_id, turn_idx) — exactly like the oracle. Regression for the
    argpartition-arbitrary-tie bug in the local top-k kernel."""
    rows = [
        (f"c{i:03d}", 1, "user", "tiger alpha beta gamma delta", "", None)
        for i in range(25)
    ]
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    df = spark.createDataFrame(rows, schema)
    root = str(tmp_path_factory.mktemp("idx_ties"))
    store = build_index(df, root, n_partitions=2, n_shards=2)
    oracle = build_oracle_index([(r[0], r[1], r[3]) for r in rows])
    for q, k in [("tiger", 7), ("tiger alpha", 5), ("tiger beta gamma", 11)]:
        exp = oracle_search(oracle, q, k=k)
        got = sorted(
            batch_topk(spark, store, [(0, q, k)]).collect(),
            key=lambda r: r["rank"],
        )
        assert [(r["docid"],) for r in got] == [(e[0],) for e in exp], q


def test_golden_end_to_end(spark, transcripts, tmp_path_factory):
    """(e) engine vs the CHECKED-IN golden oracle output."""
    with open(GOLDEN) as f:
        golden = json.load(f)
    root = str(tmp_path_factory.mktemp("idx_golden"))
    store = build_index(transcripts, root, n_partitions=8)
    queries = [
        (int(qid), g["query_text"], g["k"]) for qid, g in golden.items()
    ]
    got = batch_topk(spark, store, queries).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, g in golden.items():
        rows = sorted(by_q.get(int(qid), []), key=lambda r: r["rank"])
        exp = g["hits"]
        assert len(rows) == len(exp), (qid, g["query_text"])
        for got_r, e in zip(rows, exp):
            assert (got_r["docid"], got_r["conv_id"], got_r["turn_idx"]) == (
                e["docid"], e["conv_id"], e["turn_idx"]), (qid, g["query_text"])
            assert math.isclose(got_r["score"], e["score"], rel_tol=1e-9)
