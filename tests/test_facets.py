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


# ---------------------------------------------------------------------------
# range facets + date histogram (r6)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dl_meta(spark, facet_store):
    return spark.read.parquet(facet_store.docmap_path).select("docid", "dl")


def test_range_facets_exact(spark, facet_store, dl_meta, doc_rows):
    from visionsearch_spark.query.facets import range_facets

    import pyarrow.parquet as pq

    dls = {int(r.docid): int(r.dl) for r in pq.read_table(
        facet_store.staged_path, columns=["docid", "dl"]
    ).to_pandas().itertuples(index=False)}
    ranges = {"dl": [("tiny", None, 10.0), ("mid", 10.0, 40.0),
                     ("huge", 40.0, None), ("all", None, None),
                     ("empty", 1e9, None)]}
    got = {(r.facet, r.bucket): (r.lo, r.hi, r.n_docs) for r in range_facets(
        spark, facet_store, dl_meta, ranges, all_of=["join"]
    ).collect()}
    match = _matches(doc_rows, all_of=["join"])
    for label, lo, hi in ranges["dl"]:
        want = sum(
            1 for d in match
            if (lo is None or dls[d] >= lo) and (hi is None or dls[d] < hi)
        )
        assert got[("dl", label)] == (lo, hi, want), label
    # every requested bucket present, zero-count included; overlap OK
    assert got[("dl", "empty")][2] == 0
    assert got[("dl", "all")][2] == len(match)
    assert len(got) == len(ranges["dl"])


def test_range_facets_zero_match_query_keeps_buckets(spark, facet_store,
                                                     dl_meta):
    from visionsearch_spark.query.facets import range_facets

    got = range_facets(
        spark, facet_store, dl_meta,
        {"dl": [("a", None, 10.0), ("b", 10.0, None)]},
        any_of=["zzzznotaword"],
    ).collect()
    assert sorted((r.bucket, r.n_docs) for r in got) == [("a", 0), ("b", 0)]


def test_range_facets_validates(spark, facet_store, dl_meta):
    from visionsearch_spark.query.facets import range_facets

    with pytest.raises(ValueError, match="missing range columns"):
        range_facets(spark, facet_store, dl_meta,
                     {"nope": [("x", None, None)]}, any_of=["the"])
    with pytest.raises(ValueError, match="at least one bucket"):
        range_facets(spark, facet_store, dl_meta, {}, any_of=["the"])


def test_date_histogram_zero_fills(spark, facet_store, transcripts,
                                   doc_rows):
    import collections
    import datetime

    from visionsearch_spark.query.facets import date_histogram

    docmap = spark.read.parquet(facet_store.docmap_path).select(
        "docid", "conv_id", "turn_idx")
    meta = docmap.join(
        transcripts.select("conv_id", "turn_idx", "ts"),
        ["conv_id", "turn_idx"],
    ).select("docid", "ts")
    got = {r.bucket: r.n_docs for r in date_histogram(
        spark, facet_store, meta, "ts", "day", all_of=["join"]
    ).collect()}
    # oracle: per-day counts of matching docs, zero-filled min..max
    ts_of = {}
    for r in docmap.join(
        transcripts.select("conv_id", "turn_idx", "ts"),
        ["conv_id", "turn_idx"],
    ).collect():
        ts_of[int(r.docid)] = r.ts
    match = _matches(doc_rows, all_of=["join"])
    days = collections.Counter(
        ts_of[d].date() for d in match if ts_of[d] is not None
    )
    lo, hi = min(days), max(days)
    want = {}
    cur = lo
    while cur <= hi:
        want[datetime.datetime.combine(cur, datetime.time())] = days.get(
            cur, 0)
        cur += datetime.timedelta(days=1)
    assert got == want
    assert 0 in set(want.values()) or len(want) == len(days)


def test_histogram_frame_bad_interval(spark, transcripts):
    from visionsearch_spark.query.facets import histogram_frame

    with pytest.raises(ValueError, match="interval"):
        histogram_frame(transcripts, "ts", "fortnight")


def test_significant_terms_exact(spark, facet_store, doc_rows):
    """JLH scores vs an exhaustive Python oracle over the fixture
    corpus; query terms excluded; min_fg_df enforced."""
    import collections

    from visionsearch_spark.query.facets import significant_terms

    import pyarrow.parquet as pq

    from visionsearch_spark.analyzer import tokenize

    st = pq.read_table(
        facet_store.staged_path, columns=["docid", "text"]
    ).to_pandas()
    toks = {int(r.docid): set(tokenize(r.text))
            for r in st.itertuples(index=False)}
    any_of, top_n, min_fg = ["join", "filter"], 15, 2
    match = [d for d, s in toks.items() if any(t in s for t in any_of)]
    nfg, nbg = float(len(match)), float(len(toks))
    fg = collections.Counter(t for d in match for t in toks[d])
    bg = collections.Counter(t for s in toks.values() for t in s)
    scored = sorted(
        (
            (round((c / nfg - bg[t] / nbg) * ((c / nfg) / (bg[t] / nbg)),
                   6), t, c)
            for t, c in fg.items()
            if c >= min_fg and t not in any_of
        ),
        key=lambda x: (-x[0], x[1]),
    )[:top_n]
    got = significant_terms(spark, facet_store, any_of=any_of,
                            top_n=top_n, min_fg_df=min_fg) \
        .orderBy("rank").collect()
    assert [(r.term, r.fg_df, r.rank) for r in got] \
        == [(t, c, i + 1) for i, (_s, t, c) in enumerate(scored)]
    for r, (s, _t, _c) in zip(got, scored):
        assert abs(r.score - s) < 2e-6
    assert all(r.term not in any_of for r in got)
    assert all(r.fg_df >= min_fg for r in got)


def test_numeric_stats_exact(spark, facet_store, dl_meta, doc_rows):
    """count/min/max/avg + exact interpolated percentiles vs numpy
    (linear interpolation == Spark percentile == DuckDB quantile_cont)."""
    import numpy as np

    import pyarrow.parquet as pq

    from visionsearch_spark.query.facets import numeric_stats

    dls = {int(r.docid): int(r.dl) for r in pq.read_table(
        facet_store.staged_path, columns=["docid", "dl"]
    ).to_pandas().itertuples(index=False)}
    ps = [0.25, 0.5, 0.9]
    match = _matches(doc_rows, all_of=["join"])
    vals = np.array([dls[d] for d in match], dtype=float)
    want = {
        "count": float(vals.size),
        "min": round(float(vals.min()), 6),
        "max": round(float(vals.max()), 6),
        "avg": round(float(vals.mean()), 6),
        **{f"p{int(round(p * 100)):02d}":
           round(float(np.percentile(vals, p * 100,
                                     method="linear")), 6)
           for p in ps},
    }
    got = {r.stat: r.value for r in numeric_stats(
        spark, facet_store, dl_meta, ["dl"], percentiles=ps,
        all_of=["join"]
    ).collect()}
    assert set(got) == set(want)
    for s in want:
        assert abs(got[s] - want[s]) < 2e-6, s


def test_numeric_stats_validates(spark, facet_store, dl_meta):
    from visionsearch_spark.query.facets import numeric_stats

    with pytest.raises(ValueError, match="missing stat columns"):
        numeric_stats(spark, facet_store, dl_meta, ["nope"],
                      any_of=["the"])
    with pytest.raises(ValueError, match="percentiles"):
        numeric_stats(spark, facet_store, dl_meta, ["dl"],
                      percentiles=[1.5], any_of=["the"])


def test_facet_cardinality_exact(spark, facet_store, meta_df, doc_rows):
    from visionsearch_spark.query.facets import facet_cardinality

    match = set(_matches(doc_rows, any_of=["join", "scan"]))
    want = {
        c: len({v for d, (_t, role, tool) in doc_rows.items()
                if d in match
                for v in [role if c == "role" else tool]
                if v is not None})
        for c in ("role", "tool")
    }
    got = {r.facet: r.n_values for r in facet_cardinality(
        spark, facet_store, meta_df, ["role", "tool"],
        any_of=["join", "scan"]
    ).collect()}
    assert got == want
    with pytest.raises(ValueError, match="at least one facet"):
        facet_cardinality(spark, facet_store, meta_df, [],
                          any_of=["the"])
