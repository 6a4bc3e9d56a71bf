"""Snippet/highlight generation: pure-function semantics + serving
integration (snippets resolve from the staged table, ranks unchanged)."""

from __future__ import annotations

import pytest

from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.query.highlight import highlight, highlight_hits
from visionsearch_spark.query.serving import LocalSearcher, ShardedSearcher


def test_marks_all_query_terms():
    out = highlight("the join reads the filter output", "join filter")
    assert out == "the <em>join</em> reads the <em>filter</em> output"


def test_case_and_separator_insensitive():
    out = highlight("Join,FILTER!", "join filter")
    assert out == "<em>Join</em>,<em>FILTER</em>!"


def test_short_text_untruncated():
    assert highlight("a b c", "zzz") == "a b c"


def test_window_picks_densest_region():
    text = "x " * 50 + "join filter join" + " y" * 50
    out = highlight(text, "join filter", max_tokens=10)
    assert "<em>join</em> <em>filter</em> <em>join</em>" in out
    assert out.startswith("…") and out.endswith("…")


def test_window_prefers_distinct_terms_over_repeats():
    text = "join join join " + "z " * 40 + "join filter end"
    out = highlight(text, "join filter", max_tokens=6)
    # 2 distinct terms beat 3 repeats of one
    assert "<em>filter</em>" in out


def test_no_match_returns_leading_window():
    text = " ".join(f"w{i}" for i in range(100))
    out = highlight(text, "zzzznotaword", max_tokens=10)
    assert out.startswith("w0 w1")
    assert out.endswith("…") and "<em>" not in out


def test_window_budget_respected():
    text = " ".join(f"w{i}" for i in range(100) if True) + " join " \
        + " ".join(f"v{i}" for i in range(100))
    out = highlight(text, "join", max_tokens=9)
    body = out.strip("…")
    n_tokens = len([t for t in body.replace("<em>", " ")
                    .replace("</em>", " ").split() if t])
    assert n_tokens <= 9
    assert "<em>join</em>" in out


def test_empty_and_none():
    assert highlight("", "join") == ""
    assert highlight(None, "join") == ""


def test_deterministic():
    text = ("alpha beta join gamma " * 5) + ("delta filter join " * 5)
    outs = {highlight(text, "join filter", max_tokens=8) for _ in range(5)}
    assert len(outs) == 1


@pytest.fixture(scope="module")
def hl_store(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hlidx"))
    return build_index(transcripts, root, n_partitions=8, n_shards=16)


def test_search_highlighted_matches_search(hl_store):
    s = LocalSearcher(hl_store)
    q = "join filter stream"
    plain = s.search(q, k=5)
    marked = s.search_highlighted(q, k=5)
    assert [h[:4] for h in marked] == plain
    for h in marked:
        snippet = h[4]
        assert snippet
        # every hit matched at least one query term -> something marked
        assert "<em>" in snippet


def test_sharded_search_highlighted(hl_store):
    r = ShardedSearcher(hl_store, n_groups=4)
    s = LocalSearcher(hl_store)
    q = "table scan"
    assert [h[:4] for h in r.search_highlighted(q, k=5)] == s.search(q, k=5)


def test_highlight_hits_snippet_text_is_doc_text(hl_store):
    import pyarrow.dataset as pads

    s = LocalSearcher(hl_store)
    q = "join"
    hits = s.search(q, k=3)
    marked = highlight_hits(hl_store, hits, q, max_tokens=10_000)
    staged = pads.dataset(hl_store.staged_path).to_table(
        columns=["docid", "text"]
    )
    texts = dict(zip(staged.column("docid").to_pylist(),
                     staged.column("text").to_pylist()))
    for h in marked:
        plain = h[4].replace("<em>", "").replace("</em>", "")
        assert plain == texts[h[0]]
