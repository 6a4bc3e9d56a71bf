"""Dedup operators vs pure-Python oracles (exact Jaccard over shingle
sets) on a corpus with planted near-duplicates."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import tokenize
from visionsearch_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river edge"),  # near-dup of 0
    (2, "spark shuffles partitions across executors during wide transformations"),
    (3, "spark shuffles partitions across executors during wide operations today"),  # near-dup of 2
    (4, "completely unrelated text about cooking pasta with tomato sauce"),
    (5, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (6, "short text"),
    (7, "another entirely different document mentioning gradient descent optimization"),
]


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = tokenize(text)
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _py_jaccard_pairs(docs, n=3, tau=0.5):
    sh = {i: _py_shingles(t, n) for i, t in docs}
    out = {}
    for (ia, sa), (ib, sb) in itertools.combinations(sorted(sh.items()), 2):
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= tau:
            out[(ia, ib)] = j
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs_df):
    got = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs_df).collect()}
    assert got[0] == 2          # doc 5 is an exact copy of doc 0
    assert 5 not in got         # keep-first: 5 collapsed into 0
    assert sum(got.values()) == len(DOCS)


def test_shingles_match_python(docs_df):
    got = {}
    for r in shingles(docs_df, n=3).collect():
        got.setdefault(r["id"], set()).add(r["shingle"])
    for i, t in DOCS:
        assert got.get(i, set()) == _py_shingles(t, 3), f"doc {i}"


def test_ngram_jaccard_exact(spark, docs_df):
    expected = _py_jaccard_pairs(DOCS, n=3, tau=0.5)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, n=3, tau=0.5).collect()
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-6


def test_minhash_lsh_finds_planted_neardups(spark, docs_df):
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs_df, n=3, tau=0.5).collect()
    }
    # verified pairs are a SUBSET of exact pairs (no false positives after
    # verify) and must include the exact duplicate pair (identical
    # signatures collide in every band)
    exact = set(_py_jaccard_pairs(DOCS, n=3, tau=0.5))
    assert got <= exact
    assert (0, 5) in got


_M64 = (1 << 64) - 1


def _ham(a: int, b: int) -> int:
    """64-bit Hamming distance; signatures are signed int64 (bit 63 is the
    two's-complement sign bit), so mask before popcount."""
    return bin((a ^ b) & _M64).count("1")


def test_simhash_properties(spark, docs_df):
    got = {r["id"]: r["simhash"] for r in simhash(docs_df).collect()}
    assert got[0] == got[5]  # identical docs -> identical simhash
    assert _ham(got[0], got[1]) < _ham(got[0], got[4])  # near-dup closer


def test_simhash_pairs_complete_vs_bruteforce(spark):
    """Banded Hamming pairing is EXACT (pigeonhole): compare against the
    all-pairs bit_count oracle on a corpus with planted near-duplicates."""
    import random

    from visionsearch_spark.operators.dedup import simhash_pairs

    rng = random.Random(7)
    vocab = ["join", "filter", "stream", "spark", "index", "merge", "scan",
             "sort", "cache", "row", "group", "hash", "table", "query"]
    rows = []
    for d in range(120):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(12)]
        rows.append((d, " ".join(words)))
        if d % 3 == 0:  # planted near-dup: one word changed
            mutated = list(words)
            mutated[rng.randrange(len(words))] = vocab[rng.randrange(len(vocab))]
            rows.append((1000 + d, " ".join(mutated)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["id"]: r["simhash"] for r in simhash(df).collect()}
    ids = sorted(sigs)
    expected = {
        (a, b, _ham(sigs[a], sigs[b]))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if _ham(sigs[a], sigs[b]) <= 3
    }
    assert expected, "fixture must produce close pairs"
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs(df, max_hamming=3).collect()
    }
    assert got == expected

    # 64-bit scale guard: every 16-bit band must be well-spread — in
    # particular the HIGH bands, which under a single-31-bit-hash scheme
    # would be constant (every doc in one bucket => quadratic candidates).
    vals = [s & _M64 for s in sigs.values()]
    n = len(set(vals))
    for band in range(4):
        buckets = {(v >> (band * 16)) & 0xFFFF for v in vals}
        assert len(buckets) > 0.5 * n, (band, len(buckets), n)


def test_cross_contamination_matches_bruteforce(spark, docs_df):
    """Cross-table decontamination vs a pure-python exact-Jaccard replica
    over the SAME banded candidate rule: corpus = DOCS, benchmark = docs
    {0, 3, 6} with one near-dup rewrite. Pairs only cross tables; an
    identical doc on both sides scores jaccard 1.0."""
    from visionsearch_spark.operators.dedup import cross_contamination

    bench_rows = [
        (0, DOCS[0][1]),                       # identical to corpus doc 0
        (3, DOCS[3][1].replace("today", "now")),  # near-dup of corpus 3
        (6, "short text"),                     # < n tokens: no shingles
    ]
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    got = {
        (r["corpus_id"], r["benchmark_id"]): r["jaccard"]
        for r in cross_contamination(docs_df, bench, n=3, tau=0.4).collect()
    }

    def sh_set(text, n=3):
        toks = tokenize(text)
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    want = {}
    for cid, ctext in DOCS:
        for bid, btext in bench_rows:
            a, b = sh_set(ctext), sh_set(btext)
            if not a or not b:
                continue
            j = len(a & b) / len(a | b)
            if j >= 0.4:
                want[(cid, bid)] = round(j, 6)
    # near-dup jaccards here are far from the banded-LSH miss regime, so
    # the exact replica IS the expectation (candidate recall = 1 at these
    # similarities on 8 docs)
    assert got == want
    assert got[(0, 0)] == 1.0 and got[(5, 0)] == 1.0  # cross-side only
    assert all(cid != 6 or bid != 6 for cid, bid in got)
