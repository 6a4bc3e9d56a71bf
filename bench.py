"""Headline benchmark: index-build throughput (turns/sec) + query latency.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-phase seconds...}, "sf": <sf>}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

The scaling-efficiency evidence (local[8] vs local[32], the sandbox
substitute for the N->4N executor rule) lives in jobs/scaling_bench.py and
is recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "join filter stream",
    "vector scan merge",
    "customer order",
    "window row group",
    "hash table",
    "spark query data",
    "slow small batch",
    "the fast key",
    "agg line part column",
    "sort big stream",
]
LATENCY_QUERIES = BENCH_QUERIES[:6]


def corpus_parquet(sf: float) -> tuple[str, int]:
    """Deterministic synthetic transcripts at sf-proportional scale
    (FIXTURES.md §1: bench scale sf0.1 -> 20k convs ≈ 220k turns), cached
    as parquet under /tmp. Generation excluded from timings."""
    n_convs = max(200, int(round(sf * 200_000)))
    path = os.path.join(
        tempfile.gettempdir(), f"vss_bench_corpus_{n_convs}.parquet"
    )
    if not os.path.exists(path):
        from visionsearch_spark.fixtures import make_transcripts_pdf

        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = make_transcripts_pdf(n_convs=n_convs, seed=42)
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        # Spark cannot read TIMESTAMP(NANOS) parquet — coerce to micros
        pq.write_table(tbl, path + ".tmp", coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        os.replace(path + ".tmp", path)
    import pyarrow.parquet as pq

    return path, pq.read_metadata(path).num_rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    sf_num = float(sf) if sf.replace(".", "").isdigit() else 0.1

    from visionsearch_spark import get_spark
    from visionsearch_spark.index.spimi import build_index
    from visionsearch_spark.query.wand import batch_topk, topk

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    corpus_path, n_docs = corpus_parquet(sf_num)
    tx = spark.read.parquet(corpus_path)

    # warm-up: tiny build exercises every code path (JVM JIT, Python worker
    # pool, parquet writers) so the timed run measures steady-state
    # throughput — the regime a long-lived cluster actually runs in.
    warm_root = tempfile.mkdtemp(prefix="vss_bench_warm_")
    warm_path, _ = corpus_parquet(0.001)
    build_index(spark.read.parquet(warm_path), warm_root, n_partitions=cpus)
    shutil.rmtree(warm_root, ignore_errors=True)

    root = tempfile.mkdtemp(prefix="vss_bench_idx_")
    try:
        t0 = time.perf_counter()
        store = build_index(tx, root, n_partitions=cpus)
        build_sec = time.perf_counter() - t0

        # batch path: all queries in ONE job
        t0 = time.perf_counter()
        batch = [(i, q, 10) for i, q in enumerate(BENCH_QUERIES)]
        n_rows = batch_topk(spark, store, batch).count()
        batch_sec = time.perf_counter() - t0

        # interactive path A: per-query Spark job (distributed; scheduling-
        # bound at ~1s — right for batch, wrong for serving)
        lats = []
        for q in LATENCY_QUERIES:
            t0 = time.perf_counter()
            topk(spark, store, q, k=10).collect()
            lats.append(time.perf_counter() - t0)
        lats.sort()
        p50 = statistics.median(lats)
        p95 = lats[max(0, int(round(0.95 * len(lats))) - 1)]

        # interactive path B: LocalSearcher serving layer (load-once, pure
        # numpy — the reference's in-memory-index architecture)
        from visionsearch_spark.query.serving import LocalSearcher

        t0 = time.perf_counter()
        searcher = LocalSearcher(store)
        serve_load_sec = time.perf_counter() - t0
        for q in BENCH_QUERIES:  # warm: lazy posting decode per term
            searcher.search(q, k=10)
        slats = []
        for q in BENCH_QUERIES * 5:
            t0 = time.perf_counter()
            searcher.search(q, k=10)
            slats.append(time.perf_counter() - t0)
        slats.sort()
        serve_p50 = statistics.median(slats)
        serve_p95 = slats[max(0, int(round(0.95 * len(slats))) - 1)]

        total = build_sec + batch_sec + sum(lats)
        out = {
            "metric": "bm25_engine_build_plus_query_sec",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {
                "build_index": round(build_sec, 3),
                "build_turns_per_sec": round(n_docs / build_sec, 1),
                "query_batch_10": round(batch_sec, 3),
                "query_p50": round(p50, 4),
                "query_p95": round(p95, 4),
                "serving_load_sec": round(serve_load_sec, 3),
                "serving_p50_ms": round(serve_p50 * 1000, 3),
                "serving_p95_ms": round(serve_p95 * 1000, 3),
                "batch_result_rows": n_rows,
                "n_docs": n_docs,
            },
            "sf": sf_num,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
