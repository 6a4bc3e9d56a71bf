"""Text-analysis operators: deterministic outputs vs Python reimplementation."""

from __future__ import annotations

import pytest

from visionsearch_spark.analyzer import tokenize
from visionsearch_spark.operators.textstats import (
    FP_MULT,
    FP_PRIME,
    LANG_MARKERS,
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    quality_score,
)

DOCS = [
    (0, "The quick brown fox and the lazy dog. It is that simple!"),
    (1, "der hund und die katze sind nicht ein problem"),
    (2, "el perro y la casa de que un es"),
    (3, "le chat est pour le chien et la maison de un"),
    (4, "xyzzy plugh qwerty"),                      # no markers -> und
    (5, ""),                                        # empty
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_lang_id(docs_df):
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs_df).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "es"
    assert got[3] == "fr"
    assert got[4] == "und"
    assert got[5] == "und"


def test_quality_score(docs_df):
    got = {r["doc_id"]: r for r in quality_score(docs_df).collect()}
    for i, text in DOCS:
        toks = tokenize(text)
        assert got[i]["n_tokens"] == len(toks), f"doc {i}"
        assert got[i]["n_punct"] == sum(text.count(c) for c in ".!?")
        assert got[i]["n_stop"] == sum(1 for t in toks if t in STOPWORDS)
    assert got[0]["quality"] == 1.0   # long, punctuated, stopworded English
    assert got[5]["quality"] == 0.0   # empty doc
    assert 4 not in LANG_MARKERS      # sanity: markers keyed by lang code


def _py_fingerprint(all_texts: list[str], text: str) -> int:
    vocab = sorted({t for x in all_texts for t in tokenize(x)})
    tid = {t: i + 1 for i, t in enumerate(vocab)}  # dense_rank is 1-based
    s = 0
    for pos, t in enumerate(tokenize(text)):
        h = (FP_MULT * tid[t] + 12345) % FP_PRIME
        s += (pos + 1) * h
    return s % FP_PRIME


def test_doc_fingerprint_matches_python(docs_df):
    texts = [t for _i, t in DOCS]
    got = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(docs_df).collect()}
    for i, text in DOCS:
        if not tokenize(text):
            assert i not in got  # no tokens -> no fingerprint row
            continue
        assert got[i] == _py_fingerprint(texts, text), f"doc {i}"


def test_training_set_filter_composite(spark):
    """Each leg of the composite does real work: exact dup dropped
    (keep-first), wrong-language dropped, short doc dropped."""
    from visionsearch_spark.operators.textstats import training_set_filter

    rows = [
        (0, "the quick brown fox and the lazy dog run to the river bank."),
        (1, "the quick brown fox and the lazy dog run to the river bank."),  # dup of 0
        (2, "der hund und die katze sind nicht mit der maus ein freund."),   # de
        (3, "too short."),                                                    # <5 tokens
        (4, "it is a long established fact that the reader will be fine."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"] for r in training_set_filter(df).collect()}
    assert got == {0, 4}


def test_deterministic_sample_invariant_to_partitioning(spark):
    from visionsearch_spark.operators.textstats import deterministic_sample

    df = spark.createDataFrame([(i, f"t{i}") for i in range(1000)],
                               "doc_id long, text string")
    a = {r["doc_id"] for r in deterministic_sample(df, 0.2).collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(df.repartition(13), 0.2).collect()}
    assert a == b                       # partitioning-independent
    assert 100 < len(a) < 300           # ~rate, not vacuous
    # exact python replica: same modular arithmetic, same rows
    from visionsearch_spark.operators.textstats import FP_MULT, FP_PRIME
    exp = {i for i in range(1000)
           if (FP_MULT * i + 12345) % FP_PRIME < int(FP_PRIME * 0.2)}
    assert a == exp


def test_token_length_stats_values(spark):
    from visionsearch_spark.operators.textstats import token_length_stats

    rows = [(0, "a b c"), (1, "a b c d e"), (2, "a"), (3, "a b c d e f g h")]
    got = token_length_stats(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()[0]
    assert got["n_docs"] == 4 and got["min_tokens"] == 1 \
        and got["max_tokens"] == 8
    assert got["p50"] == 4.0            # interp between 3 and 5
    assert abs(got["avg_tokens"] - 17 / 4) < 1e-9


def test_llm_token_estimate_matches_python_replica(spark):
    import math
    import re

    from visionsearch_spark.operators.textstats import (
        BPE_CHARS_PER_TOKEN,
        BPE_PIECE_RE,
        llm_token_estimate,
    )

    rows = [
        (0, "hello world"),                          # 2 short words
        (1, ""),                                     # empty -> 0
        (2, "supercalifragilisticexpialidocious"),   # 34 chars -> ceil(34/4)
        (3, "a b, c... 12345 !!"),                   # punct singles, digit run
        (4, "   \t\n  "),                            # whitespace only -> 0
        (5, "CamelCaseWord123mixed"),                # runs split at class edges
        (6, "café über naïve"),                      # non-ascii: piece chars
    ]
    got = {
        r["doc_id"]: r["est_tokens"]
        for r in llm_token_estimate(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    for doc_id, text in rows:
        want = sum(
            math.ceil(len(p) / BPE_CHARS_PER_TOKEN)
            for p in re.findall(BPE_PIECE_RE, text)
        )
        assert got[doc_id] == want, (doc_id, text)
    assert got[1] == 0 and got[4] == 0
    assert got[2] == math.ceil(34 / 4)


def test_prefix_sum_matches_global_window(spark):
    """Two-phase cumsum == a literal global running sum, and invariant to
    input partitioning (the dense_ids recipe, generalized to weights)."""
    from visionsearch_spark.docid import prefix_sum

    rows = [(i, (7 * i + 3) % 23 + 1) for i in range(997)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    want, acc = {}, 0
    for i, wgt in rows:
        acc += wgt
        want[i] = acc
    for parts in (1, 7):
        got = {
            r["doc_id"]: r["cumsum"]
            for r in prefix_sum(df.repartition(parts), "doc_id", "w").collect()
        }
        assert got == want, parts


def test_pack_documents_semantics(spark):
    """bin_id = tokens-before DIV window; bounded overflow/underfill;
    matches a sequential python replica; id order preserved inside bins."""
    from visionsearch_spark.operators.textstats import pack_documents

    rows = [(i, "tok " * ((13 * i + 5) % 40 + 1)) for i in range(300)]
    window = 64
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["bin_id"])
        for r in pack_documents(
            spark.createDataFrame(rows, "doc_id long, text string"),
            window=window,
        ).collect()
    )
    cum = 0
    max_doc = 0
    bins: dict[int, int] = {}
    for (doc_id, n_tokens, bin_id), (i, text) in zip(got, rows):
        n = len(text.split())
        assert doc_id == i and n_tokens == n
        assert bin_id == cum // window          # tokens-before DIV window
        cum += n
        max_doc = max(max_doc, n)
        bins[bin_id] = bins.get(bin_id, 0) + n
    # bounded overflow: every bin < window + max_doc tokens; every bin
    # except the last >= window - max_doc + 1
    last = max(bins)
    for b, total in bins.items():
        assert total < window + max_doc, (b, total)
        if b != last:
            assert total > window - max_doc, (b, total)
    # bins are dense 0..last
    assert set(bins) == set(range(last + 1))


def test_source_mixture_shares(spark):
    from visionsearch_spark.operators.textstats import source_mixture

    rows = [
        (0, "a b c", "web"), (1, "a b", "web"),
        (2, "x y z w", "code"), (3, "q", "chat"),
    ]
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["token_share"])
        for r in source_mixture(
            spark.createDataFrame(rows, "doc_id long, text string, source string")
        ).collect()
    }
    assert got == {
        "web": (2, 5, round(5 / 10, 6)),
        "code": (1, 4, round(4 / 10, 6)),
        "chat": (1, 1, round(1 / 10, 6)),
    }
    assert abs(sum(v[2] for v in got.values()) - 1.0) < 1e-6


def test_repetition_stats(spark):
    from visionsearch_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam"),        # 3 bigrams, 1 distinct
            (1, "all tokens here are unique"), # no repetition
            (2, "ab"),                         # 1 token: no 2-grams
            (3, ""),                           # zero tokens
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[0]["dup_2gram_frac"] == pytest.approx(1 - 1 / 3)
    assert got[0]["dup_3gram_frac"] == pytest.approx(1 - 1 / 2)
    assert got[0]["top_term_frac"] == 1.0
    assert got[1]["dup_2gram_frac"] == 0.0
    assert got[1]["top_term_frac"] == pytest.approx(0.2)
    assert got[2]["dup_2gram_frac"] == 0.0 and got[2]["top_term_frac"] == 1.0
    assert got[3]["top_term_frac"] == 0.0


def test_pii_scrub(spark):
    from visionsearch_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "mail me at jo.doe+x@corp.example.org today"),
            (1, "see https://ex.com/a?user=a@b.co and http://plain.io"),
            (2, "call +1 (555) 123-4567 or 555-867-5309 now"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got[0]["n_emails"] == 1
    assert "<EMAIL>" in got[0]["clean_text"]
    assert "jo.doe" not in got[0]["clean_text"]
    # the email inside the URL counts as the URL it rode in on, once
    assert got[1]["n_urls"] == 2 and got[1]["n_emails"] == 0
    assert got[1]["clean_text"] == "see <URL> and <URL>"
    assert got[2]["n_phones"] == 2
    assert "555" not in got[2]["clean_text"]
    assert got[3]["clean_text"] == "nothing sensitive here"
    assert (got[3]["n_urls"], got[3]["n_emails"], got[3]["n_phones"]) \
        == (0, 0, 0)


def test_mixture_weights(spark):
    from visionsearch_spark.operators.textstats import mixture_weights

    docs = spark.createDataFrame(
        [(0, "a b c d", "web"), (1, "e f g h", "web"),
         (2, "i j k l", "code"), (3, "m n o p", "books")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in
           mixture_weights(docs, {"web": 0.5, "code": 0.5}).collect()}
    # actual shares: web 0.5, code 0.25, books 0.25
    assert got["web"]["weight"] == pytest.approx(1.0)
    assert got["code"]["weight"] == pytest.approx(2.0)
    assert got["books"]["weight"] == 0.0


def test_mixture_sample_applies_weighted_rates(spark):
    """mixture_sample = mixture_weights applied as per-source
    modular-hash Bernoulli: selected rows are exactly the hash-threshold
    set at rate min(1, base_rate*weight); untargeted sources keep
    nothing; determinism across partitionings."""
    from visionsearch_spark.operators.textstats import (
        FP_MULT,
        FP_PRIME,
        mixture_sample,
        mixture_weights,
    )

    rows = [(i, f"src{i % 4}", " ".join(["w"] * (5 + i % 7)))
            for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")
    targets = {"src0": 0.7, "src1": 0.3}
    base = 0.4
    got = {r["doc_id"] for r in
           mixture_sample(docs, targets, base_rate=base).collect()}
    w = {r["source"]: r["weight"]
         for r in mixture_weights(docs, targets).collect()}
    exp = set()
    for did, src, _t in rows:
        thr = int(FP_PRIME * min(1.0, base * w[src]))
        if (FP_MULT * did + 12345) % FP_PRIME < thr:
            exp.add(did)
    assert got == exp
    assert not any(src in ("src2", "src3")
                   for r in mixture_sample(docs, targets,
                                           base_rate=base).collect()
                   for src in [r["source"]])
    # repartitioned input selects the SAME rows
    got2 = {r["doc_id"] for r in
            mixture_sample(docs.repartition(13), targets,
                           base_rate=base).collect()}
    assert got2 == got
    # absent target still fails loudly (inherited from mixture_weights)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="absent from the corpus"):
        mixture_sample(docs, {"nope": 1.0})
