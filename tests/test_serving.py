"""LocalSearcher (load-once serving layer): rank identity with the
exhaustive oracle on the full query set + latency sanity."""

from __future__ import annotations

import math
import time

import pytest

from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.query.serving import LocalSearcher, ShardedSearcher
from visionsearch_spark.oracle import oracle_search


@pytest.fixture(scope="module")
def serving_store(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_serving"))
    return build_index(transcripts, root, n_partitions=8, n_shards=16)


@pytest.fixture(scope="module")
def searcher(serving_store):
    return LocalSearcher(serving_store)


def test_rank_identity_full_query_set(searcher, oracle_index, query_set):
    mismatches = []
    for row in query_set.itertuples(index=False):
        exp = oracle_search(oracle_index, row.query_text, k=row.k)
        got = searcher.search(row.query_text, k=row.k)
        if [(g[0], g[1], g[2]) for g in got] != [(e[0], e[1], e[2]) for e in exp]:
            mismatches.append((row.query_id, row.query_text))
            continue
        for g, e in zip(got, exp):
            if not math.isclose(g[3], e[3], rel_tol=1e-9):
                mismatches.append((row.query_id, "score"))
                break
    assert not mismatches, mismatches[:5]


def test_df_matches_oracle(searcher, oracle_index):
    for t in ["join", "filter", "xylophone", "zzzznotaword"]:
        assert searcher.df(t) == oracle_index.df.get(t, 0)


def test_oov_and_threshold(searcher, oracle_index):
    assert searcher.search("zzzznotaword", k=5) == []
    thr = 2.0
    exp = oracle_search(oracle_index, "join filter stream", k=30, threshold=thr)
    got = searcher.search("join filter stream", k=30, threshold=thr)
    assert len(got) == len(exp)
    assert all(g[3] > thr for g in got)


def test_prefix_filter_rank_identity(searcher, oracle_index, query_set):
    """conv_prefix serves filter ∧ top-k with UNCHANGED global stats:
    expected = exhaustive oracle ranking post-filtered by prefix, cut to
    k — the mask must apply BEFORE the k-cut (a post-cut filter would
    return < k hits even when k prefixed docs match)."""
    prefixes = ["conv-0", "conv-00", "conv-000001"]
    for row in query_set.itertuples(index=False):
        full = oracle_search(oracle_index, row.query_text,
                             k=searcher.n_docs)
        for p in prefixes:
            exp = [h for h in full if h[1].startswith(p)][:row.k]
            got = searcher.search(row.query_text, k=row.k, conv_prefix=p)
            assert [g[:3] for g in got] == [e[:3] for e in exp], (
                row.query_text, p)
            for g, e in zip(got, exp):
                assert math.isclose(g[3], e[3], rel_tol=1e-9)


def test_prefix_filter_edge_cases(searcher):
    assert searcher.search("join filter", k=5, conv_prefix="zzz_nope") == []
    # empty prefix matches everything == unfiltered
    assert (searcher.search("join filter", k=5, conv_prefix="")
            == searcher.search("join filter", k=5))


def test_sharded_router_prefix_identity(serving_store, searcher, query_set):
    router = ShardedSearcher(serving_store, n_groups=4)
    for row in query_set.itertuples(index=False):
        for p in ["conv-0", "conv-000002"]:
            assert (router.search(row.query_text, k=row.k, conv_prefix=p)
                    == searcher.search(row.query_text, k=row.k,
                                       conv_prefix=p)), (row.query_text, p)


def test_serving_latency_is_milliseconds(searcher):
    searcher.search("join filter", k=10)  # warm
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        searcher.search("join filter stream", k=10)
    per_query = (time.perf_counter() - t0) / n
    assert per_query < 0.05, f"serving path too slow: {per_query * 1000:.1f} ms"


def test_sharded_router_rank_identity(serving_store, searcher, query_set):
    """4-group scatter-gather == single full searcher on the full query
    set (turn-level and conv-collapsed), exact scores included — the
    router must fetch GLOBAL df for idf, not each group's local df."""
    router = ShardedSearcher(serving_store, n_groups=4)
    assert sum(s.n_docs == searcher.n_docs for s in router.searchers) == 4
    for row in query_set.itertuples(index=False):
        exp = searcher.search(row.query_text, k=row.k)
        got = router.search(row.query_text, k=row.k)
        assert [g[:3] for g in got] == [e[:3] for e in exp], row.query_text
        for g, e in zip(got, exp):
            assert math.isclose(g[3], e[3], rel_tol=1e-12)
        # FULL-tuple identity incl. representative docid: the router's
        # resolve pass must pick min run-start over ALL matched units,
        # not just the groups that ranked the conv (r3 review finding)
        exp_d = searcher.search_docs(row.query_text, k=row.k)
        got_d = router.search_docs(row.query_text, k=row.k)
        assert got_d == exp_d, row.query_text


def test_sharded_router_on_appended_store(spark, transcripts_pdf,
                                          tmp_path_factory):
    """Router over a multi-dir (appended) store: conv ranking and scores
    identical to the single searcher; turn-level identity is full-tuple
    (docid tie-break is globally consistent)."""
    from visionsearch_spark.fixtures import TRANSCRIPTS_SCHEMA
    from visionsearch_spark.streaming.incremental import incremental_build

    convs = sorted(transcripts_pdf["conv_id"].unique())
    first = transcripts_pdf[transcripts_pdf["conv_id"].isin(convs[:50])]
    root = str(tmp_path_factory.mktemp("idx_router_app"))
    incremental_build(
        spark.createDataFrame(first, schema=TRANSCRIPTS_SCHEMA), root,
        n_partitions=4)
    store = incremental_build(
        spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS_SCHEMA),
        root, n_partitions=4)
    assert len(store.segment_paths()) == 2
    single = LocalSearcher(store)
    router = ShardedSearcher(store, n_groups=3)
    for q, k in [("join filter stream", 10), ("window", 8), ("customer", 5)]:
        assert router.search(q, k=k) == single.search(q, k=k), q
        # full-tuple: representative docid resolve pass, appended layout
        assert router.search_docs(q, k=k) == single.search_docs(q, k=k), q


def test_sharded_router_representative_docid_resolve(
        spark, tmp_path_factory):
    """Adversarial construction of the r3 review finding: conv 'a' has a
    WEAK unit in group 0 (lowest docid) and its STRONG unit in group 1;
    group 0's top-1 is another conv, so pre-fix the router never saw
    a's low-docid run and returned the group-1 run-start as the
    representative — diverging from the single searcher's min run-start
    over ALL matched units."""
    from visionsearch_spark.fixtures import TRANSCRIPTS_SCHEMA
    from visionsearch_spark.streaming.incremental import incremental_build

    def df_of(rows):
        import pandas as pd
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
        return spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)

    root = str(tmp_path_factory.mktemp("idx_rep"))
    # initial build: docid0 = a-t0 (weak), docid1 = b-t0; shard_range=1
    incremental_build(
        df_of([("a", 0, "user", "apple", "", 0.0),
               ("b", 0, "user", "apple apple", "", 1.0)]),
        root, n_partitions=2)
    # append: docid2 = 0zz-t0 (beats a in group 0), docid3 = a-t1
    # (strongest overall, lands in group 1)
    store = incremental_build(
        df_of([("0zz", 0, "user", "apple apple apple", "", 2.0),
               ("a", 1, "user", "apple apple apple apple", "", 3.0),
               ("a", 0, "user", "apple", "", 0.0),
               ("b", 0, "user", "apple apple", "", 1.0)]),
        root, n_partitions=2)
    assert int(store.read_meta()["shard_range"]) == 1

    single = LocalSearcher(store)
    router = ShardedSearcher(store, n_groups=2)
    # group layout sanity: conv a's units straddle the two groups
    assert [sorted(s.shards) for s in router.searchers] == [[0, 2], [1, 3]]

    exp = single.search_docs("apple", k=1)
    got = router.search_docs("apple", k=1)
    assert exp[0][1] == "a" and exp[0][0] == 0  # min run-start, weak unit
    assert got == exp

    # and the full result sets stay identical at larger k
    assert router.search_docs("apple", k=4) == single.search_docs("apple", k=4)


# ---------------------------------------------------------------------------
# term vectors + more-like-this at the serving tier (r6)
# ---------------------------------------------------------------------------

def test_term_vector_matches_analyzer(spark, serving_store):
    from visionsearch_spark.analyzer import tokenize
    from visionsearch_spark.query.serving import LocalSearcher

    import pyarrow.parquet as pq

    s = LocalSearcher(serving_store)
    st = pq.read_table(serving_store.staged_path,
                       columns=["docid", "conv_id", "turn_idx", "text"]
                       ).to_pandas()
    row = st.iloc[5]
    tv = s.term_vector(str(row.conv_id), int(row.turn_idx))
    toks = tokenize(row.text)
    want: dict = {}
    for i, t in enumerate(toks):
        want.setdefault(t, []).append(i)
    assert [(t, len(ps), ps) for t, tf, ps, _df in tv] \
        == [(t, len(ps), ps) for t, ps in sorted(want.items())]
    for t, _tf, _ps, df in tv:
        assert df == s.df(t) and df >= 1
    assert s.term_vector("conv-nope", 1) == []


def test_term_vector_positions_match_pos_bin(spark, transcripts,
                                             tmp_path_factory):
    """The serving surface and the positional payloads use the SAME
    coordinate: decode one term's pos_bin and compare."""
    import numpy as np
    import pyarrow.dataset as pads

    from visionsearch_spark.index.codec import decode_positions, decode_varint
    from visionsearch_spark.index.spimi import build_index
    from visionsearch_spark.query.serving import LocalSearcher

    root = str(tmp_path_factory.mktemp("tvpos"))
    pstore = build_index(transcripts, root, n_partitions=8,
                         positions=True)
    s = LocalSearcher(pstore)
    tv = s.term_vector(str(s._conv[0]), int(s._turn[0]))
    assert tv
    term, _tf, want_ps, _df = tv[0]
    seg = pads.dataset(
        [pads.dataset(p) for p in pstore.segment_paths()]
    ).to_table(columns=["term", "n", "docids_bin", "tfs_bin", "pos_bin"],
               filter=__import__("pyarrow").compute.field("term") == term)
    got = None
    from visionsearch_spark.index.codec import decode_docids

    for i in range(seg.num_rows):
        d = decode_docids(seg.column("docids_bin")[i].as_py(),
                          seg.column("n")[i].as_py())
        if 0 in d:
            tf = decode_varint(seg.column("tfs_bin")[i].as_py(),
                               seg.column("n")[i].as_py()).astype(np.int64)
            ps = decode_positions(seg.column("pos_bin")[i].as_py(), tf)
            starts = np.concatenate(([0], np.cumsum(tf)))
            j = int(np.flatnonzero(d == 0)[0])
            got = ps[starts[j]:starts[j + 1]].tolist()
            break
    assert got == want_ps


def test_more_like_this_serving(spark, serving_store):
    from visionsearch_spark.query.serving import LocalSearcher

    s = LocalSearcher(serving_store)
    seed_conv, seed_turn = str(s._conv[10]), int(s._turn[10])
    hits = s.more_like_this(seed_conv, seed_turn, k=5)
    assert hits
    assert all(not (c == seed_conv and t == seed_turn)
               for _d, c, t, _s in hits)
    assert len(hits) <= 5
    # scores descend with the frozen tie-break
    scores = [h[3] for h in hits]
    assert scores == sorted(scores, reverse=True)
    assert s.more_like_this("conv-nope", 1) == []
