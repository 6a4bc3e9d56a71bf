"""End-to-end training-set preparation job: stage counts must match the
individually-run operators, resume must skip committed stages, and the
CLI entry point must run the whole thing one-command."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
DOCS = os.path.join(SF_DIR, "documents.parquet")


@pytest.fixture(scope="module")
def prepared(spark, tmp_path_factory):
    """One pipeline run over sf0.001 with a planted benchmark (a slice
    of the corpus itself — guaranteed contamination hits)."""
    from jobs.prepare_training_set import prepare_training_set

    root = str(tmp_path_factory.mktemp("prep"))
    bench_path = os.path.join(root, "benchmark.parquet")
    docs = spark.read.parquet(DOCS)
    docs.filter(F.col("doc_id") % 37 == 0).write.parquet(bench_path)
    out = os.path.join(root, "out")
    counts = prepare_training_set(spark, DOCS, out,
                                  benchmark_path=bench_path)
    return out, bench_path, counts


def test_stage_counts_match_individual_operators(spark, prepared):
    from visionsearch_spark.operators.dedup import (
        cross_contamination,
        dedup_corpus,
    )
    from visionsearch_spark.operators.textstats import (
        pii_scrub,
        repetition_stats,
        source_mixture,
        training_set_filter,
    )
    from jobs.prepare_training_set import (
        DUP_2GRAM_MAX,
        DUP_3GRAM_MAX,
        TOP_TERM_MAX,
    )

    out, bench_path, counts = prepared
    docs = spark.read.parquet(DOCS)
    n_docs = docs.count()
    assert counts["scrub"] == n_docs  # scrub rewrites, never drops

    scrubbed = pii_scrub(docs).select(
        "doc_id", F.col("clean_text").alias("text")
    ).join(docs.select("doc_id", "source"), "doc_id")
    keep = training_set_filter(scrubbed).select("doc_id")
    rep_ok = repetition_stats(scrubbed).filter(
        (F.col("dup_2gram_frac") <= DUP_2GRAM_MAX)
        & (F.col("dup_3gram_frac") <= DUP_3GRAM_MAX)
        & (F.col("top_term_frac") <= TOP_TERM_MAX)
    ).select("doc_id")
    filtered = scrubbed.join(keep, "doc_id").join(rep_ok, "doc_id")
    assert counts["filter"] == filtered.count()
    assert 0 < counts["filter"] < n_docs  # the filters do real work

    deduped = dedup_corpus(filtered, tau=0.5)
    assert counts["dedup"] == deduped.count()

    bench = spark.read.parquet(bench_path)
    hits = cross_contamination(deduped, bench, tau=0.5) \
        .select(F.col("corpus_id").alias("doc_id")).distinct()
    survivors = deduped.join(hits, "doc_id", "left_anti")
    n_final = survivors.count()
    assert counts["decontaminate"] == n_final
    assert n_final < counts["dedup"]  # planted benchmark must hit

    assert counts["pack"] == n_final  # one row per packed doc
    assert counts["report"] == source_mixture(survivors).count()

    # pack output shape: bins are contiguous, every doc assigned
    pack = spark.read.parquet(os.path.join(out, "pack"))
    assert pack.columns == ["doc_id", "n_tokens", "bin_id"]
    assert pack.count() == n_final


def test_resume_skips_committed_stages(spark, prepared):
    """A second run over the same out dir re-runs NOTHING: the manifest
    gains no rows and stage outputs keep their mtimes."""
    from jobs.prepare_training_set import (
        prepare_training_set,
        read_manifest,
    )

    out, bench_path, _ = prepared
    before = read_manifest(out)
    mtimes = {
        s: os.path.getmtime(os.path.join(out, s, "_SUCCESS"))
        for s in ("scrub", "filter", "dedup", "spandedup",
                  "decontaminate", "pack", "report")
    }
    counts = prepare_training_set(spark, DOCS, out,
                                  benchmark_path=bench_path)
    after = read_manifest(out)
    assert after == before
    for s, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, s, "_SUCCESS")) == m
    assert counts == {m["stage"]: m["rows_out"] for m in before}


def test_partial_resume_reruns_only_missing_stages(spark, prepared,
                                                   tmp_path_factory):
    """Killing the pipeline after `filter` (simulated by a fresh out dir
    seeded with the first two stages) must re-run dedup onward only,
    reusing the committed stage outputs byte-for-byte."""
    import shutil

    from jobs.prepare_training_set import (
        prepare_training_set,
        read_manifest,
    )

    out, bench_path, counts_full = prepared
    out2 = str(tmp_path_factory.mktemp("prep_partial")) + "/out"
    os.makedirs(out2)
    for s in ("scrub", "filter"):
        shutil.copytree(os.path.join(out, s), os.path.join(out2, s))
    with open(os.path.join(out2, "manifest.jsonl"), "w") as f:
        for m in read_manifest(out):
            if m["stage"] in ("scrub", "filter"):
                f.write(__import__("json").dumps(m) + "\n")
    m_scrub = os.path.getmtime(os.path.join(out2, "scrub", "_SUCCESS"))
    counts = prepare_training_set(spark, DOCS, out2,
                                  benchmark_path=bench_path)
    assert counts == counts_full
    assert os.path.getmtime(
        os.path.join(out2, "scrub", "_SUCCESS")) == m_scrub
    stages_run = [m["stage"] for m in read_manifest(out2)]
    assert stages_run == ["scrub", "filter", "dedup", "spandedup",
                          "decontaminate", "pack", "report"]


def test_cli_end_to_end(tmp_path_factory):
    import subprocess
    import sys

    root = str(tmp_path_factory.mktemp("prep_cli"))
    out = os.path.join(root, "out")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "/root/repo/jobs/prepare_training_set.py",
         "--input", DOCS, "--out", out],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for s in ("scrub", "filter", "dedup", "decontaminate", "pack",
              "report"):
        assert f"{s}: " in r.stdout
        assert os.path.exists(os.path.join(out, s, "_SUCCESS"))
    # no benchmark given -> decontaminate passes dedup through
    import json

    counts = {m["stage"]: m["rows_out"]
              for ln in open(os.path.join(out, "manifest.jsonl"))
              for m in [json.loads(ln)]}
    assert counts["decontaminate"] == counts["dedup"]


def test_perplexity_gate(spark, tmp_path_factory):
    """--max-nll composes the bigram-LM gate into the filter stage:
    filter count == base filters ∧ (n_bigrams == 0 ∨ avg_nll <= cap),
    and a permissive cap changes nothing."""
    from visionsearch_spark.operators.lm import bigram_lm_nll
    from visionsearch_spark.operators.textstats import (
        pii_scrub,
        repetition_stats,
        training_set_filter,
    )
    from jobs.prepare_training_set import (
        DUP_2GRAM_MAX,
        DUP_3GRAM_MAX,
        TOP_TERM_MAX,
        prepare_training_set,
    )

    docs = spark.read.parquet(DOCS)
    scrubbed = pii_scrub(docs).select(
        "doc_id", F.col("clean_text").alias("text")
    ).join(docs.select("doc_id", "source"), "doc_id")
    nll = bigram_lm_nll(scrubbed)
    # a cap at the observed median guarantees the gate drops real rows
    cap = nll.filter(F.col("n_bigrams") > 0) \
        .approxQuantile("avg_nll", [0.5], 0.0)[0]

    out = str(tmp_path_factory.mktemp("prep_nll")) + "/out"
    counts = prepare_training_set(spark, DOCS, out, max_nll=cap)

    keep = training_set_filter(scrubbed).select("doc_id")
    rep_ok = repetition_stats(scrubbed).filter(
        (F.col("dup_2gram_frac") <= DUP_2GRAM_MAX)
        & (F.col("dup_3gram_frac") <= DUP_3GRAM_MAX)
        & (F.col("top_term_frac") <= TOP_TERM_MAX)
    ).select("doc_id")
    lm_ok = nll.filter(
        (F.col("n_bigrams") == 0) | (F.col("avg_nll") <= cap)
    ).select("doc_id")
    exp = scrubbed.join(keep, "doc_id").join(rep_ok, "doc_id") \
        .join(lm_ok, "doc_id").count()
    base = scrubbed.join(keep, "doc_id").join(rep_ok, "doc_id").count()
    assert counts["filter"] == exp
    assert exp < base  # the gate did real work at the median cap


def test_spandedup_gate(spark, prepared, tmp_path_factory):
    """--max-dup-ratio drops boilerplate-heavy docs; pass-through when
    omitted (counts equal the dedup stage)."""
    from jobs.prepare_training_set import prepare_training_set
    from visionsearch_spark.operators.dedup import dup_span_stats

    out, bench_path, counts = prepared
    assert counts["spandedup"] == counts["dedup"]  # default off

    out2 = str(tmp_path_factory.mktemp("prep_span")) + "/out"
    counts2 = prepare_training_set(spark, DOCS, out2,
                                   benchmark_path=bench_path,
                                   max_dup_ratio=0.5, span_length=5)
    dedup_df = spark.read.parquet(os.path.join(out2, "dedup"))
    bad = dup_span_stats(dedup_df, length=5, by_hash=True).filter(
        F.col("dup_ratio") > 0.5).count()
    assert counts2["spandedup"] == counts2["dedup"] - bad
