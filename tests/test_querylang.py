"""Query-string language: parser unit tests (no Spark) + end-to-end
equivalence against the composed primitives."""

from __future__ import annotations

import pytest

from visionsearch_spark.query.querylang import parse_query


# ------------------------------------------------------------- parser

def test_parse_signs_and_boosts():
    p = parse_query("+join -dup stream^2.5 plain")
    assert p.must == ["join"]
    assert p.must_not == ["dup"]
    assert sorted(p.should) == ["plain", "stream"]
    assert p.boosts == {"stream": 2.5}


def test_parse_phrase_and_single_token_phrase():
    p = parse_query('"table scan" "single"')
    assert p.phrases == [("table scan", 0)]
    assert p.should == ["single"]


def test_parse_expansions():
    p = parse_query("pre* wi*card mid?dle fuzz~ fuzzy~1")
    assert p.prefixes == ["pre"]
    assert sorted(p.wildcards) == ["mid?dle", "wi*card"]
    assert p.fuzzies == [("fuzz", 2), ("fuzzy", 1)]


def test_parse_rejects_signed_expansions():
    for bad in ["-pre*", "+fuzz~", '-"a b"']:
        with pytest.raises(ValueError):
            parse_query(bad)


def test_parse_garbage_degrades_to_terms():
    p = parse_query("CAFÉ, (hello)")
    # analyzer treats non-[0-9a-z] as separators
    assert sorted(p.should) == ["caf", "hello"]


def test_parse_multi_token_body_splits():
    p = parse_query("+a.b")  # analyzer splits; sign applies to each
    assert sorted(p.must) == ["a", "b"]


# -------------------------------------------------------- end-to-end

@pytest.fixture(scope="module")
def store(transcripts, tmp_path_factory):
    from visionsearch_spark.index.spimi import build_index

    root = str(tmp_path_factory.mktemp("ql") / "store")
    return build_index(transcripts, root, n_partitions=4)


def _rows(df):
    return [(r["docid"], round(r["score"], 9))
            for r in sorted(df.collect(), key=lambda r: r["rank"])]


def test_plain_string_equals_plain_topk(spark, store):
    from visionsearch_spark.query.querylang import query_string_topk
    from visionsearch_spark.query.wand import batch_topk

    got = query_string_topk(spark, store, "join filter stream", k=10)
    want = batch_topk(spark, store, [(0, "join filter stream", 10)])
    assert _rows(got) == _rows(want)


def test_must_not_equals_boolean_topk(spark, store):
    from visionsearch_spark.query.boolean import boolean_topk
    from visionsearch_spark.query.querylang import query_string_topk

    got = query_string_topk(spark, store, "+join +filter -dup", k=10)
    want = boolean_topk(spark, store, must=["join", "filter"],
                        must_not=["dup"], k=10)
    assert _rows(got) == _rows(want)


def test_phrase_clause_equals_phrase_topk(spark, store):
    from visionsearch_spark.query.boolean import phrase_topk
    from visionsearch_spark.query.querylang import query_string_topk

    got = query_string_topk(spark, store, '"join filter"', k=10)
    want = phrase_topk(spark, store, "join filter", k=10)
    assert _rows(got) == _rows(want)


def test_prefix_clause_equals_prefix_topk(spark, store):
    from visionsearch_spark.query.multiterm import prefix_topk
    from visionsearch_spark.query.querylang import query_string_topk

    got = query_string_topk(spark, store, "fil*", k=10)
    want = prefix_topk(spark, store, "fil", k=10)
    assert _rows(got) == _rows(want)


def test_boost_clause_equals_boosted_topk(spark, store):
    from visionsearch_spark.query.multiterm import boosted_topk
    from visionsearch_spark.query.querylang import query_string_topk

    got = query_string_topk(spark, store, "join^2 filter", k=10)
    want = boosted_topk(spark, store, {"join": 2.0, "filter": 1.0}, k=10)
    assert _rows(got) == _rows(want)


def test_combined_query_membership_and_scoring(spark, store):
    """+join -dup "join filter" stream^2 — every hit obeys membership;
    scores equal the boosted disjunction restricted to the allow set."""
    from pyspark.sql import functions as F

    from visionsearch_spark.query.querylang import query_string_topk

    got = query_string_topk(
        spark, store, '+join -dup "join filter" stream^2', k=20).collect()
    assert got
    staged = spark.read.parquet(store.staged_path) \
        .select("docid", "text").collect()
    texts = {r["docid"]: r["text"].lower() for r in staged}
    from visionsearch_spark.analyzer import tokenize
    for r in got:
        toks = tokenize(texts[r["docid"]])
        assert "join" in toks
        assert "dup" not in toks
        grams = {" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)}
        assert "join filter" in grams


def test_oov_and_empty_strings(spark, store):
    from visionsearch_spark.query.querylang import query_string_topk

    assert query_string_topk(spark, store, "zzzznotaword", k=5).count() == 0
    assert query_string_topk(spark, store, "", k=5).count() == 0
    assert query_string_topk(spark, store, "-only -negs", k=5).count() == 0


def test_pagination_composes(spark, store):
    from visionsearch_spark.query.querylang import query_string_topk

    q = '+join stream^2'
    full = _rows(query_string_topk(spark, store, q, k=10))
    p1 = sorted(query_string_topk(spark, store, q, k=5).collect(),
                key=lambda r: r["rank"])
    last = p1[-1]
    p2 = sorted(query_string_topk(
        spark, store, q, k=5,
        search_after=(last["score"], last["conv_id"], last["turn_idx"]),
    ).collect(), key=lambda r: r["rank"])
    assert [(r["docid"], round(r["score"], 9)) for r in p1 + p2] == full


def test_slop_phrase_clause_equals_sloppy_phrase_topk(spark, transcripts,
                                                      tmp_path_factory):
    from visionsearch_spark.index.spimi import build_index
    from visionsearch_spark.query.boolean import phrase_topk
    from visionsearch_spark.query.querylang import parse_query, query_string_topk

    assert parse_query('"join filter"~3').phrases == [("join filter", 3)]
    assert parse_query('"join filter"~').phrases == [("join filter", 2)]
    root = str(tmp_path_factory.mktemp("qlslop"))
    pstore = build_index(transcripts, root, n_partitions=8,
                         positions=True)
    got = query_string_topk(spark, pstore, '"join filter"~3', k=10)
    want = phrase_topk(spark, pstore, "join filter", k=10, slop=3)
    assert [tuple(r) for r in got.collect()] \
        == [tuple(r) for r in want.collect()]
    # widens over the exact phrase
    exact = query_string_topk(spark, pstore, '"join filter"', k=200)
    sloppy = query_string_topk(spark, pstore, '"join filter"~4', k=200)
    assert exact.count() <= sloppy.count()
