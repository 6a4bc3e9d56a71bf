"""The three analyzer implementations (Python / Spark JVM / DuckDB SQL)
must produce identical token streams — BM25 rank-identity depends on it
(SURVEY.md §7 R5)."""

from __future__ import annotations

import duckdb
import pytest

from visionsearch_spark.analyzer import (
    duckdb_tokens,
    token_count_col,
    tokenize,
    tokens_col,
)

CASES = [
    "Hello, World! 42 times",
    "join a filter window row",
    "CAFÉ naïve über",
    "...!!!",
    "",
    None,
    "a.b!c?d e\tf\ng",
    "MiXeD CaSe 123abc ABC123",
    "trailing space ",
    " léading",
    # NFC/NFD pairs: no impl normalizes, so composed 'é' is one separator
    # ('caf') while decomposed e+combining-acute leaves the base letter
    # ('cafe') — BOTH must agree across all three engines (r1 ADVICE).
    "Caf\u00e9 au lait",       # NFC: composed e-acute
    "Cafe\u0301 au lait",      # NFD: e + combining acute
    "r\u00e9sum\u00e9 vs re\u0301sume\u0301",
]


def test_nfc_nfd_divergence_is_consistent():
    assert tokenize("Caf\u00e9") == ["caf"]     # composed: separator
    assert tokenize("Cafe\u0301") == ["cafe"]   # decomposed: base stays


def test_python_tokenizer_basics():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("CAFÉ") == ["caf"]  # accents are separators per frozen spec
    assert tokenize("a1b2 c3") == ["a1b2", "c3"]


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "i int, text string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokens_col("text").alias("toks")).collect()
    }
    for i, c in enumerate(CASES):
        expected = tokenize(c)
        assert (got[i] or []) == expected, f"case {i!r}: {c!r}"


def test_token_count_col_matches_tokenize(spark):
    """token_count_col (regexp_count, no array alloc — the staged dl
    expression since r7) must equal BOTH size(tokens_col()) and the
    frozen Python analyzer's len(tokenize()), nulls included. Beyond
    CASES, a few width/casing adversaries (İ, ligatures, ß, emoji,
    NUL) that full-vs-simple case mapping or regex-class differences
    would trip."""
    extra = ["İstanbul ŞEHİR", "ﬁne ﬂow", "ẞß", "🙂ab🙂", "a\x00b",
             "0", "  ", "a" * 500]
    cases = CASES + extra
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, text string"
    )
    import pyspark.sql.functions as F

    rows = df.select(
        "i",
        F.size(tokens_col("text")).alias("via_split"),
        token_count_col("text").alias("via_count"),
    ).collect()
    for r in rows:
        c = cases[r["i"]]
        assert r["via_count"] == r["via_split"], f"case {c!r}"
        if c is not None:
            assert r["via_count"] == len(tokenize(c)), f"case {c!r}"
        else:
            assert r["via_count"] is None


def test_duckdb_matches_python():
    con = duckdb.connect()
    for i, c in enumerate(CASES):
        if c is None:
            continue
        (res,) = con.execute(
            f"select {duckdb_tokens('?')}", [c]
        ).fetchone()
        assert (res or []) == tokenize(c), f"case {i!r}: {c!r}"


def test_fixture_corpus_spark_python_parity(spark, transcripts, transcripts_pdf):
    got = (
        transcripts.select("conv_id", "turn_idx", tokens_col("text").alias("toks"))
        .toPandas()
        .set_index(["conv_id", "turn_idx"])["toks"]
        .to_dict()
    )
    for row in transcripts_pdf.itertuples(index=False):
        assert list(got[(row.conv_id, row.turn_idx)]) == tokenize(row.text)
