"""Scaling-efficiency evidence: the same build+query job at N and 4N cores.

Sandbox substitute for the north rule's two-cluster-size criterion (no real
cluster available): run the IDENTICAL job — same input, same partitioning
(64 tasks), same shuffle layout — at local[8] and local[32];
efficiency = (throughput@32 / throughput@8) / 4. Each run is a separate
subprocess (fresh JVM); runs are interleaved 8/32/8/32/… so environment
drift hits both sides equally; medians reported.

The corpus is ~1.1M turns (5 deterministic replicas of the sf0.1 fixture
corpus) so each of the 64 tasks carries seconds of real work — at the
bench's native 220k turns, fixed per-task costs dominate and the
measurement reflects scheduler overhead, not the engine.

A raw-CPU microbenchmark (perfectly parallel, zero-coordination numpy
kernels at 8 vs 32 processes) is run alongside and reported as
`hw_ceiling`: the efficiency THIS VIRTUALIZED HOST can deliver at all.
Engine efficiency should be read against that ceiling, not against 1.0.

    python jobs/scaling_bench.py [--runs 3]

Prints one JSON line; record the numbers in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_TASKS = 64  # fixed decomposition: both cluster sizes run the same plan
REPLICAS = int(__import__('os').environ.get('VSS_SCALE_REPLICAS', '5'))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, __REPO__)
cores = int(sys.argv[1])
corpus = sys.argv[2]
n_tasks = int(sys.argv[3])
from visionsearch_spark import get_spark
from visionsearch_spark.index.spimi import build_index
from visionsearch_spark.query.wand import batch_topk

# RAM-backed scratch (tmpfs): /tmp sits on a ~187 MB/s virtual disk — at 8
# cores the build becomes disk-bound there and the measurement reflects the
# sandbox disk, not the engine. A real cluster spreads shuffle/index I/O
# across many nodes' local disks.
scratch = tempfile.mkdtemp(prefix="vss_scale_", dir="/dev/shm")
spark = get_spark("scale", cores=cores, shuffle_partitions=n_tasks,
                  extra_conf={"spark.local.dir": os.path.join(scratch, "sl")})
tx = spark.read.parquet(corpus)
# warm-up (JIT + python worker pool), untimed
warm = tempfile.mkdtemp(dir=scratch)
build_index(tx.limit(2000), warm, n_partitions=n_tasks)
shutil.rmtree(warm, ignore_errors=True)

root = tempfile.mkdtemp(dir=scratch)
t0 = time.perf_counter()
store = build_index(tx, root, n_partitions=n_tasks)
build_sec = time.perf_counter() - t0
n_docs = store.read_meta()["n_docs"]

qtexts = ["join filter stream", "vector scan merge", "window row group",
          "hash table", "spark query data", "sort big stream",
          "the fast key", "agg line part column", "slow small batch",
          "customer order"]
# 200 queries per batch (r3, was 40): one batch_topk job carries ~1s of
# fixed scheduling/planning that does NOT shrink with cores — at 40
# queries that floor is ~25% of the 8-core side and caps the measured
# ratio (Amdahl), at 200 it is ~5% and the ratio reflects the engine
queries = [(i, q, 10) for i, q in enumerate(qtexts * 20)]
# median of 3: a single shot right after the build is dominated by
# post-build JVM/worker state (GC, memo warm), not the query engine
reps = []
for _ in range(3):
    t0 = time.perf_counter()
    batch_topk(spark, store, queries).count()
    reps.append(time.perf_counter() - t0)
query_sec = sorted(reps)[1]
print(json.dumps({"cores": cores, "build_sec": build_sec,
                  "query_sec": query_sec, "query_reps": reps,
                  "n_docs": n_docs}))
spark.stop()
shutil.rmtree(scratch, ignore_errors=True)
"""


def _burn(_):
    import numpy as np

    x = np.random.default_rng(0).standard_normal(4096)
    s = 0.0
    for _ in range(30000):
        s += float((x * x + 0.5 * x).sum())
    return s


def hw_ceiling(small: int, large: int) -> float:
    """Max achievable N->4N efficiency on this host: embarrassingly
    parallel, zero-shuffle, zero-JVM numpy work."""
    rates = {}
    for n in (small, large):
        with mp.Pool(n) as p:
            p.map(_burn, range(n))  # warm
            t0 = time.perf_counter()
            p.map(_burn, range(96))
            rates[n] = 96 / (time.perf_counter() - t0)
    return rates[large] / rates[small] / (large / small)


def scaled_corpus(base_corpus: str) -> str:
    """~1.1M-turn corpus: REPLICAS deterministic copies with distinct
    conv_id prefixes (pure Spark, one-time, cached)."""
    path = os.path.join("/tmp", f"vss_scale_corpus_x{REPLICAS}.parquet")
    if os.path.exists(path):
        return path
    from visionsearch_spark import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("scale-corpus", cores=32, shuffle_partitions=32)
    tx = spark.read.parquet(base_corpus)
    rep = tx.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)]))
    ).withColumn(
        "conv_id", F.format_string("r%d-%s", F.col("rep"), F.col("conv_id"))
    ).drop("rep")
    rep.repartition(64).write.mode("overwrite").parquet(path + ".tmp.parquet")
    os.replace(path + ".tmp.parquet", path)
    spark.stop()
    return path


def run_child(cores: int, corpus: str) -> dict:
    env = dict(os.environ)
    # plenty of heap on this 125G host — GC pressure must not masquerade
    # as a scaling limit (observed: 8g heap throttles the 8-core side
    # first, which deflates measured efficiency)
    env.setdefault("SPARK_DRIVER_MEM", "48g")
    out = subprocess.run(
        [sys.executable, "-c", CHILD.replace("__REPO__", repr(REPO)),
         str(cores), corpus, str(N_TASKS)],
        capture_output=True, text=True, check=True, env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--runs", type=int, default=3)
    # N=2 vs 4N=8: in LOCAL mode every task pairs a JVM thread with a
    # Python worker, so local[K] runs ~2K busy threads; on this 32-vCPU
    # host K>8 saturates shared vCPUs and measures the host, not the
    # engine (observed: local[32] is SLOWER than local[8]). At 2 vs 8
    # neither side is host-limited — the honest stand-in for two cluster
    # sizes whose executors are provisioned per node.
    ap.add_argument("--small", type=int, default=2)
    ap.add_argument("--large", type=int, default=8)
    ap.add_argument("--curve", action="store_true",
                    help="also run 2/4/8/16/32 single-shot curve")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bench import corpus_parquet

    base, _ = corpus_parquet(args.sf)
    corpus = scaled_corpus(base)

    ceiling = hw_ceiling(args.small, args.large)

    results: dict[int, list[dict]] = {args.small: [], args.large: []}
    # interleave runs so environment drift affects both sides equally
    for _ in range(args.runs):
        for cores in (args.small, args.large):
            results[cores].append(run_child(cores, corpus))

    def med(cores: int, key: str) -> float:
        return statistics.median(r[key] for r in results[cores])

    n_docs = results[args.small][0]["n_docs"]
    small_tput = n_docs / med(args.small, "build_sec")
    large_tput = n_docs / med(args.large, "build_sec")
    ratio = args.large / args.small
    build_eff = large_tput / small_tput / ratio
    query_eff = med(args.small, "query_sec") / med(args.large, "query_sec") / ratio
    out = {
        "n_docs": n_docs,
        "n_tasks": N_TASKS,
        "runs_per_side": args.runs,
        "cores_small": args.small,
        "cores_large": args.large,
        "hw_ceiling": round(ceiling, 3),
        "build_sec_small_median": round(med(args.small, "build_sec"), 2),
        "build_sec_large_median": round(med(args.large, "build_sec"), 2),
        "build_turns_per_sec_small": round(small_tput, 1),
        "build_turns_per_sec_large": round(large_tput, 1),
        "build_scaling_efficiency": round(build_eff, 3),
        "build_eff_vs_hw_ceiling": round(build_eff / ceiling, 3),
        "n_queries_per_batch": 200,
        "query_sec_small_median": round(med(args.small, "query_sec"), 2),
        "query_sec_large_median": round(med(args.large, "query_sec"), 2),
        "query_scaling_efficiency": round(query_eff, 3),
        "query_eff_vs_hw_ceiling": round(query_eff / ceiling, 3),
    }
    if args.curve:
        out["curve"] = [
            {"cores": c, **{k: round(v, 2) for k, v in run_child(c, corpus).items()
                            if k in ("build_sec", "query_sec")}}
            for c in (2, 4, 8, 16, 32)
        ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
