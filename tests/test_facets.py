"""Facet counts / total hits vs exhaustive Python oracles."""

from __future__ import annotations

import pytest

from visionsearch_spark.analyzer import tokenize
from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.query.facets import facet_counts, match_count


@pytest.fixture(scope="module")
def facet_store(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("facetidx"))
    return build_index(transcripts, root, n_partitions=8, n_shards=16)


@pytest.fixture(scope="module")
def meta_df(spark, facet_store, transcripts):
    docmap = spark.read.parquet(facet_store.docmap_path).select(
        "docid", "conv_id", "turn_idx"
    )
    return docmap.join(
        transcripts.select("conv_id", "turn_idx", "role", "tool"),
        ["conv_id", "turn_idx"],
    ).select("docid", "role", "tool").cache()


@pytest.fixture(scope="module")
def doc_rows(spark, facet_store, transcripts):
    """docid -> (token set, role, tool) — the exhaustive oracle's view."""
    import pyarrow.parquet as pq

    st = pq.read_table(
        facet_store.staged_path, columns=["docid", "conv_id", "turn_idx", "text"]
    ).to_pandas()
    tx = {
        (r.conv_id, int(r.turn_idx)): (r.role, r.tool)
        for r in transcripts.select(
            "conv_id", "turn_idx", "role", "tool"
        ).collect()
    }
    out = {}
    for r in st.itertuples(index=False):
        role, tool = tx[(r.conv_id, int(r.turn_idx))]
        out[int(r.docid)] = (set(tokenize(r.text)), role, tool)
    return out


def _matches(doc_rows, all_of=(), any_of=(), none_of=()):
    out = []
    for d, (toks, role, tool) in doc_rows.items():
        if all_of and not all(t in toks for t in all_of):
            continue
        if not all_of and any_of and not any(t in toks for t in any_of):
            continue
        if any(t in toks for t in none_of):
            continue
        out.append(d)
    return out


def test_match_count(spark, facet_store, doc_rows):
    exp = len(_matches(doc_rows, all_of=["join", "filter"], none_of=["dup"]))
    got = match_count(
        spark, facet_store, all_of=["join", "filter"], none_of=["dup"]
    ).collect()
    assert [r.n_docs for r in got] == [exp]


def test_facet_counts_full(spark, facet_store, meta_df, doc_rows):
    any_of = ["stream", "window"]
    got = {
        (r.facet, r.value): r.n_docs
        for r in facet_counts(
            spark, facet_store, meta_df, ["role", "tool"], any_of=any_of
        ).collect()
    }
    exp: dict[tuple[str, str], int] = {}
    for d in _matches(doc_rows, any_of=any_of):
        _, role, tool = doc_rows[d]
        exp[("role", role)] = exp.get(("role", role), 0) + 1
        exp[("tool", tool)] = exp.get(("tool", tool), 0) + 1
    assert got == exp


def test_facet_counts_top_n_deterministic(spark, facet_store, meta_df,
                                          doc_rows):
    any_of = ["the"]
    full = facet_counts(
        spark, facet_store, meta_df, ["role"], any_of=any_of
    ).collect()
    ranked = sorted(full, key=lambda r: (-r.n_docs, r.value))
    got = facet_counts(
        spark, facet_store, meta_df, ["role"], any_of=any_of, top_n=2
    ).collect()
    assert sorted(
        (r.facet, r.value, r.n_docs) for r in got
    ) == sorted((r.facet, r.value, r.n_docs) for r in ranked[:2])


def test_facet_counts_validates_columns(spark, facet_store, meta_df):
    with pytest.raises(ValueError, match="missing facet columns"):
        facet_counts(spark, facet_store, meta_df, ["nope"], any_of=["the"])
    with pytest.raises(ValueError, match="at least one facet"):
        facet_counts(spark, facet_store, meta_df, [], any_of=["the"])
    with pytest.raises(ValueError, match="top_n"):
        facet_counts(
            spark, facet_store, meta_df, ["role"], any_of=["the"], top_n=0
        )


def test_facet_counts_no_matches(spark, facet_store, meta_df):
    got = facet_counts(
        spark, facet_store, meta_df, ["role"], any_of=["zzzznotaword"]
    ).collect()
    assert got == []
