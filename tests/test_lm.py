"""Statistical-LM / keyword operators vs exact Python reimplementations."""

from __future__ import annotations

import collections
import math
import re

import pytest

from visionsearch_spark.analyzer import tokenize
from visionsearch_spark.operators.lm import (
    bigram_lm_nll,
    related_docs,
    tfidf_keywords,
)

DOCS = [
    (0, "the cat sat on the mat and the cat ran"),
    (1, "the dog sat on the log and the dog ran"),
    (2, "the cat sat on the mat and the cat ran"),   # exact dup of 0
    (3, "quantum chromodynamics lattice gauge spinor"),  # all-rare bigrams
    (4, "single"),                                   # one token: no bigram
    (5, ""),                                         # empty
    (6, "the the the the the the"),                  # repetition loop
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bigram_nll():
    toks = {d: tokenize(t) for d, t in DOCS}
    c12: collections.Counter = collections.Counter()
    vocab: set[str] = set()
    for tk in toks.values():
        vocab.update(tk)
        for p in zip(tk, tk[1:]):
            c12[p] += 1
    c1: collections.Counter = collections.Counter()
    for (a, _b), c in c12.items():
        c1[a] += c
    v = len(vocab)
    out = {}
    for d, tk in toks.items():
        prs = list(zip(tk, tk[1:]))
        if not prs:
            out[d] = (0, 0.0)
            continue
        s = sum(-math.log((c12[p] + 1) / (c1[p[0]] + v)) for p in prs)
        out[d] = (len(prs), round(s / len(prs), 6))
    return out


def test_bigram_lm_nll_exact(docs_df):
    exp = _py_bigram_nll()
    got = {r.doc_id: (r.n_bigrams, r.avg_nll)
           for r in bigram_lm_nll(docs_df).collect()}
    assert set(got) == set(exp)          # every doc emits exactly one row
    for d in exp:
        assert got[d][0] == exp[d][0], d
        assert math.isclose(got[d][1], exp[d][1], abs_tol=2e-6), d


def test_bigram_lm_nll_orders_quality(docs_df):
    got = {r.doc_id: r.avg_nll for r in bigram_lm_nll(docs_df).collect()}
    # exact duplicates score identically
    assert got[0] == got[2]
    # all-rare-bigram jargon is less likely than in-distribution text
    assert got[3] > got[0]
    # a repetition loop of the corpus's hottest self-bigram is the MOST
    # predictable text in the corpus
    assert got[6] < got[0]
    # no-bigram docs: defined zero, not null/missing
    assert got[4] == 0.0 and got[5] == 0.0


def _art_depth(line: str) -> int:
    """Column where the operator name starts in a Spark plan-tree line
    (length of the ':  +- ' art prefix, codegen '*(N) ' marker stripped)."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def test_bigram_nll_no_occurrence_exchange_on_w1(spark, docs_df):
    """Plan pin for the r6 fix (VERDICT r5 'What's wrong #2'): no exchange
    keyed by the Zipf-skewed w1 ALONE may move occurrence-shaped rows.
    Every single-key-w1 Exchange must sit over a chain of unary nodes that
    reaches a HashAggregate keyed (w1, w2) — i.e. distinct-bigram
    granularity — before any Join / Generate / Scan (which would mean the
    raw exploded pair stream is being shuffled on w1)."""
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = bigram_lm_nll(docs_df)._jdf.queryExecution(
        ).executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    lines = plan.splitlines()
    singles = [
        i for i, ln in enumerate(lines)
        if re.search(r"Exchange hashpartitioning\(w1#\d+, \d+\)", ln)
    ]
    assert singles, "expected the model-side single-w1 exchanges to exist"
    for i in singles:
        d = _art_depth(lines[i])
        ok = False
        for ln in lines[i + 1:]:
            if _art_depth(ln) <= d:
                break  # left the exchange's subtree
            body = ln[_art_depth(ln):]
            if re.match(r"(\*\(\d+\) )?HashAggregate\(keys=\[w1#\d+, w2#",
                        body):
                ok = True
                break
            if re.search(r"Join|Generate|Scan", body):
                break
        assert ok, f"occurrence-shaped exchange keyed on w1 alone:\n{lines[i]}"


def _py_tfidf(k=3):
    toks = {d: tokenize(t) for d, t in DOCS}
    n = len(DOCS)
    dfreq: collections.Counter = collections.Counter()
    for tk in toks.values():
        dfreq.update(set(tk))
    out = {}
    for d, tk in toks.items():
        if not tk:
            continue
        cc = collections.Counter(tk)
        scored = sorted(
            ((round(c * math.log((n + 1) / dfreq[t]), 6), t, c)
             for t, c in cc.items()),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        out[d] = [(t, c, s, i + 1) for i, (s, t, c) in enumerate(scored)]
    return out


def test_tfidf_keywords_exact(docs_df):
    exp = _py_tfidf(k=3)
    got: dict = collections.defaultdict(list)
    for r in tfidf_keywords(docs_df, k=3).orderBy("doc_id", "rank").collect():
        got[r.doc_id].append((r.term, r.tf, r.tfidf, r.rank))
    assert dict(got) == exp              # empty docs emit nothing


def test_tfidf_rank_determinism(docs_df):
    # docs 0 and 2 are byte-identical: identical keyword lists incl. tie
    # resolution (term-asc on the rounded score)
    kw: dict = collections.defaultdict(list)
    for r in tfidf_keywords(docs_df, k=5).orderBy("doc_id", "rank").collect():
        kw[r.doc_id].append((r.term, r.rank))
    assert kw[0] == kw[2]
    # ranks are 1..n dense per doc
    for d, lst in kw.items():
        assert [r for _t, r in lst] == list(range(1, len(lst) + 1)), d


def test_related_docs(docs_df):
    got = {(r.doc_id, r.rank): (r.rel_id, r.shared)
           for r in related_docs(docs_df, k_keywords=3, top_j=2).collect()}
    # the two duplicate docs are each other's #1 related doc, sharing
    # all 3 keywords
    assert got[(0, 1)] == (2, 3)
    assert got[(2, 1)] == (0, 3)
    # jargon doc 3 shares no top-keyword with anyone -> absent
    assert not any(d == 3 for d, _rk in got)


def test_related_docs_bucket_cap(spark):
    # 30 identical docs: every keyword bucket has 30 members; cap 10
    # drops them all -> zero pairs (and zero quadratic blowup), by design
    dup = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(30)],
        "doc_id long, text string",
    )
    assert related_docs(dup, k_keywords=3, top_j=2, max_bucket=10
                        ).count() == 0
    # raise the cap: every doc relates to 2 others (top_j), all-integer
    out = related_docs(dup, k_keywords=3, top_j=2, max_bucket=64).collect()
    assert len(out) == 60 and all(r.shared == 3 for r in out)
