"""BM25F-lite fielded search (query/fielded.py): weighted-sum collapse vs
a pure-Python oracle, field-weight semantics, field subsetting."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from visionsearch_spark.analyzer import tokenize
from visionsearch_spark.bm25 import idf, tf_weight
from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.query.fielded import fielded_topk

# (conv_id, field_id, text): field 1 = title, field 2 = body
FIELD_DOCS = [
    ("doc-a", 1, "zebra migration patterns"),
    ("doc-a", 2, "long body text about savanna wildlife and rivers"),
    ("doc-b", 1, "savanna wildlife overview"),
    ("doc-b", 2, "the zebra appears only in this body text here"),
    ("doc-c", 1, "cooking pasta quickly"),
    ("doc-c", 2, "tomato sauce recipes with basil and garlic"),
    ("doc-d", 1, "zebra zebra zebra"),
    ("doc-d", 2, "unrelated body content entirely"),
    ("doc-e", 1, "river migration"),
    # one-field doc: no body unit
]


def _py_bm25f(units, query, weights, k):
    """Exhaustive BM25F oracle: per-unit BM25 under unit stats, weighted
    sum per doc, (score desc, conv asc) top-k."""
    toks = {(c, f): tokenize(t) for c, f, t in units}
    dls = {u: len(ts) for u, ts in toks.items()}
    n_units = len(toks)
    avgdl = sum(dls.values()) / n_units
    qterms = sorted(set(tokenize(query)))
    df = Counter(t for ts in toks.values() for t in set(ts))
    scores: dict[str, float] = {}
    for (c, f), ts in sorted(toks.items()):
        tf = Counter(ts)
        s = sum(
            idf(n_units, df[t]) * tf_weight(tf[t], dls[(c, f)], avgdl)
            for t in qterms if df.get(t, 0) > 0 and tf.get(t, 0) > 0
        )
        if s > 0 and f in weights:
            scores[c] = scores.get(c, 0.0) + weights[f] * s
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    return ranked


@pytest.fixture(scope="module")
def field_store(spark, tmp_path_factory):
    import pandas as pd

    pdf = pd.DataFrame(FIELD_DOCS, columns=["conv_id", "turn_idx", "text"])
    pdf["role"] = "user"
    pdf["tool"] = ""
    pdf["ts"] = pd.Timestamp("2024-01-01").as_unit("us")
    tx = spark.createDataFrame(
        pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
        schema=("conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp"),
    )
    root = str(tmp_path_factory.mktemp("idx_fielded"))
    return build_index(tx, root, n_partitions=2)


def test_fielded_matches_python_oracle(spark, field_store):
    for q in ["zebra", "savanna wildlife", "zebra migration", "tomato"]:
        exp = _py_bm25f(FIELD_DOCS, q, {1: 2.0, 2: 1.0}, k=5)
        got = fielded_topk(spark, field_store, q, k=5).collect()
        assert [(r["conv_id"]) for r in got] == [c for c, _ in exp], q
        for r, (_c, s) in zip(got, exp):
            assert math.isclose(r["score"], s, rel_tol=1e-9), q


def test_field_weights_change_ranking(spark, field_store):
    """'zebra' appears in doc-a's TITLE and doc-b's BODY: title-heavy
    weights must rank doc-a over doc-b; body-heavy weights flip it."""
    title_heavy = [r["conv_id"] for r in
                   fielded_topk(spark, field_store, "zebra", k=3,
                                field_weights={1: 5.0, 2: 0.1}).collect()]
    body_heavy = [r["conv_id"] for r in
                  fielded_topk(spark, field_store, "zebra", k=3,
                               field_weights={1: 0.1, 2: 5.0}).collect()]
    assert title_heavy.index("doc-a") < title_heavy.index("doc-b")
    assert body_heavy.index("doc-b") < body_heavy.index("doc-a")


def test_field_subset_search(spark, field_store):
    """Searching only the title field (weights omit field 2) must exclude
    docs whose match is body-only — no rebuild needed."""
    got = [r["conv_id"] for r in
           fielded_topk(spark, field_store, "zebra", k=5,
                        field_weights={1: 1.0}).collect()]
    assert "doc-a" in got and "doc-d" in got
    assert "doc-b" not in got  # zebra only in doc-b's body
