"""One-command LLM training-data preparation — the end-to-end
composition of the operator families this engine ships, with per-stage
materialization, a manifest, and resume.

    spark-submit --py-files visionsearch_spark.zip \
        jobs/prepare_training_set.py \
        --input /path/to/documents.parquet --out /path/to/prepared \
        [--benchmark /path/to/benchmark.parquet] [--window 512] \
        [--min-quality 0.6] [--langs en] [--tau 0.5]

Stages, in order (each writes <out>/<stage>/ parquet and appends one
manifest row with rows in/out; a re-run SKIPS any stage whose output
already committed — the checkpointed-ETL shape of the reference's
caption backfill, `/root/reference/visionsearch/scripts/
generate_captions.py:66-102`, which re-scans for assets without
captions instead of redoing work):

  scrub          pii_scrub: URL/email/phone redaction, text := clean
  filter         training_set_filter (exact-dedup ∧ lang ∧ quality ∧
                 token band) ∧ Gopher repetition caps ∧ (with
                 --max-nll) the CCNet-style perplexity gate: drop docs
                 whose avg bigram-LM NLL under the corpus-trained model
                 (operators/lm.bigram_lm_nll, trained on the SCRUBBED
                 corpus) exceeds the cap; no-bigram docs pass (the LM
                 cannot judge them — the token band catches them)
  dedup          dedup_corpus: MinHash-LSH near-dup pairs → connected
                 components → keep min-id representative
  spandedup      (with --max-dup-ratio) substring-dedup gate: drop docs
                 whose duplicated-span token coverage
                 (operators/dedup.dup_span_stats over the deduped set —
                 Lee et al.-style L-gram spans, interval-unioned)
                 exceeds the cap; pass-through when omitted
  decontaminate  cross_contamination vs --benchmark: drop corpus docs
                 whose shingle sets near-match any benchmark doc
                 (skipped when no benchmark is given)
  pack           pack_documents: context-window bin assignment
  report         source_mixture of the final set (also printed)

Scale shape: every stage is one of the already-audited operator plans
(no new shuffles introduced here); the driver only ever sees stage ROW
COUNTS and the (bounded, per-source) mixture report. Stage outputs are
parquet dirs whose _SUCCESS marker is the commit point — a stage that
died mid-write has no marker and re-runs cleanly.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGES = ("scrub", "filter", "dedup", "spandedup", "decontaminate",
          "pack", "report")

# Gopher-style repetition caps (dup n-gram mass / dominant-term share)
DUP_2GRAM_MAX = 0.20
DUP_3GRAM_MAX = 0.18
TOP_TERM_MAX = 0.30


def _stage_dir(out: str, stage: str) -> str:
    return os.path.join(out, stage)


def _is_done(out: str, stage: str) -> bool:
    return os.path.exists(os.path.join(_stage_dir(out, stage), "_SUCCESS"))


def _manifest_append(out: str, row: dict) -> None:
    with open(os.path.join(out, "manifest.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def read_manifest(out: str) -> list[dict]:
    path = os.path.join(out, "manifest.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _run_stage(out: str, stage: str, rows_in: int, df: DataFrame
               ) -> DataFrame:
    """Materialize one stage: write parquet (the _SUCCESS marker is the
    commit), count from the WRITTEN data (the number the next stage
    will actually read), append the manifest row, and return the
    re-read frame so downstream plans hang off the materialized files,
    not the whole upstream lineage."""
    spark = df.sparkSession
    path = _stage_dir(out, stage)
    t0 = time.time()
    df.write.mode("overwrite").parquet(path)
    done = spark.read.parquet(path)
    _manifest_append(out, {
        "stage": stage,
        "rows_in": rows_in,
        "rows_out": done.count(),
        "seconds": round(time.time() - t0, 3),
    })
    return done


def prepare_training_set(
    spark: SparkSession,
    input_path: str,
    out: str,
    benchmark_path: str | None = None,
    window: int = 512,
    min_quality: float = 0.6,
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_tokens: int = 1000,
    tau: float = 0.5,
    max_nll: float | None = None,
    max_dup_ratio: float | None = None,
    span_length: int = 10,
) -> dict:
    """Run (or resume) the pipeline; returns {stage: rows_out}."""
    from visionsearch_spark.operators.dedup import (
        cross_contamination,
        dedup_corpus,
    )
    from visionsearch_spark.operators.textstats import (
        pack_documents,
        pii_scrub,
        repetition_stats,
        source_mixture,
        training_set_filter,
    )

    os.makedirs(out, exist_ok=True)
    docs0 = spark.read.parquet(input_path)
    passthrough = [c for c in docs0.columns if c != "text"]

    if not _is_done(out, "scrub"):
        scrubbed = pii_scrub(docs0).select(
            "doc_id", F.col("clean_text").alias("text")
        ).join(docs0.select(*passthrough), "doc_id")
        _run_stage(out, "scrub", docs0.count(), scrubbed)
    scrub_df = spark.read.parquet(_stage_dir(out, "scrub"))

    if not _is_done(out, "filter"):
        keep = training_set_filter(
            scrub_df, min_quality=min_quality, langs=langs,
            min_tokens=min_tokens, max_tokens=max_tokens,
        ).select("doc_id")
        rep_ok = repetition_stats(scrub_df).filter(
            (F.col("dup_2gram_frac") <= DUP_2GRAM_MAX)
            & (F.col("dup_3gram_frac") <= DUP_3GRAM_MAX)
            & (F.col("top_term_frac") <= TOP_TERM_MAX)
        ).select("doc_id")
        filtered = scrub_df.join(keep, "doc_id").join(rep_ok, "doc_id")
        if max_nll is not None:
            from visionsearch_spark.operators.lm import bigram_lm_nll

            lm_ok = bigram_lm_nll(scrub_df).filter(
                (F.col("n_bigrams") == 0) | (F.col("avg_nll") <= max_nll)
            ).select("doc_id")
            filtered = filtered.join(lm_ok, "doc_id")
        _run_stage(out, "filter", scrub_df.count(), filtered)
    filter_df = spark.read.parquet(_stage_dir(out, "filter"))

    if not _is_done(out, "dedup"):
        _run_stage(out, "dedup", filter_df.count(),
                   dedup_corpus(filter_df, tau=tau))
    dedup_df = spark.read.parquet(_stage_dir(out, "dedup"))

    if not _is_done(out, "spandedup"):
        if max_dup_ratio is None:
            span_ok = dedup_df
        else:
            from visionsearch_spark.operators.dedup import dup_span_stats

            # spans measured over the SURVIVING set: MinHash removed the
            # whole-doc copies, this catches boilerplate-heavy docs whose
            # duplicated-token coverage exceeds the cap
            bad = dup_span_stats(dedup_df, length=span_length,
                                 by_hash=True).filter(
                F.col("dup_ratio") > max_dup_ratio
            ).select("doc_id")
            span_ok = dedup_df.join(bad, "doc_id", "left_anti")
        _run_stage(out, "spandedup", dedup_df.count(), span_ok)
    span_df = spark.read.parquet(_stage_dir(out, "spandedup"))

    if not _is_done(out, "decontaminate"):
        if benchmark_path is None:
            survivors = span_df
        else:
            bench = spark.read.parquet(benchmark_path)
            hits = cross_contamination(span_df, bench, tau=tau) \
                .select(F.col("corpus_id").alias("doc_id")).distinct()
            survivors = span_df.join(hits, "doc_id", "left_anti")
        _run_stage(out, "decontaminate", span_df.count(), survivors)
    final_df = spark.read.parquet(_stage_dir(out, "decontaminate"))

    if not _is_done(out, "pack"):
        handle: list = []
        packed = pack_documents(final_df, window=window,
                                unpersist_handle=handle)
        _run_stage(out, "pack", final_df.count(), packed)
        for df in handle:
            df.unpersist()

    if not _is_done(out, "report"):
        _run_stage(out, "report", final_df.count(),
                   source_mixture(final_df))

    counts = {m["stage"]: m["rows_out"] for m in read_manifest(out)}
    return counts


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--benchmark", default=None,
                   help="benchmark parquet for decontamination")
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--min-quality", type=float, default=0.6)
    p.add_argument("--langs", default="en",
                   help="comma-separated language allowlist")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-tokens", type=int, default=1000)
    p.add_argument("--tau", type=float, default=0.5)
    p.add_argument("--max-nll", type=float, default=None,
                   help="perplexity gate: drop docs with avg bigram-LM "
                        "NLL above this (off when omitted)")
    p.add_argument("--max-dup-ratio", type=float, default=None,
                   help="substring-dedup gate: drop docs whose "
                        "duplicated-span token coverage exceeds this "
                        "(off when omitted)")
    p.add_argument("--span-length", type=int, default=10)
    args = p.parse_args()

    spark = (SparkSession.builder.appName("prepare-training-set")
             .getOrCreate())
    counts = prepare_training_set(
        spark, args.input, args.out,
        benchmark_path=args.benchmark,
        window=args.window,
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")),
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        tau=args.tau,
        max_nll=args.max_nll,
        max_dup_ratio=args.max_dup_ratio,
        span_length=args.span_length,
    )
    for stage in STAGES:
        if stage in counts:
            print(f"{stage}: {counts[stage]} rows")
    report = spark.read.parquet(_stage_dir(args.out, "report"))
    report.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
