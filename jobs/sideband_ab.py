"""Same-session A/B: sideband queries (metadata filter / unit collapse)
on the r5 file-aligned fast path vs the legacy shard-shuffle plan.

The r4 round moved only sideband-FREE queries off the posting shuffle
(1.13-1.17x measured); r5 routes the allow/bounds packs to the
whole-file tasks so filtered/collapsed queries ride the same plan. This
bench pins that the win actually transfers: one SparkSession, one
store, fast/shuffle runs interleaved per round (host drift hits both
sides), first round discarded (JVM/python-worker warm-up, CLAUDE.md r4
gotcha), medians reported.

    python jobs/sideband_ab.py [--rounds 4] [--queries 100]

Prints one JSON line:
  {"workload": {"fast_sec": ..., "shuffle_sec": ..., "speedup": ...}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QTEXTS = [
    "join filter stream", "vector scan merge", "window row group",
    "hash table", "spark query data", "sort big stream",
    "the fast key", "agg line part column", "slow small batch",
    "customer order",
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=4,
                   help="interleaved rounds; round 1 is discarded")
    p.add_argument("--queries", type=int, default=100)
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = p.parse_args()

    from bench import corpus_parquet
    from visionsearch_spark import get_spark
    from visionsearch_spark.index.spimi import build_index
    from visionsearch_spark.query.units import doc_bounds
    from visionsearch_spark.query.wand import batch_topk

    from pyspark.sql import functions as F

    scratch = tempfile.mkdtemp(prefix="vss_ab_", dir="/dev/shm")
    spark = get_spark("sideband-ab", cores=args.cpus,
                      shuffle_partitions=args.cpus,
                      extra_conf={"spark.local.dir":
                                  os.path.join(scratch, "sl")})
    corpus_path, _n = corpus_parquet(0.1)
    tx = spark.read.parquet(corpus_path)
    root = os.path.join(scratch, "idx")
    store = build_index(tx, root, n_partitions=args.cpus)

    docmap = spark.read.parquet(store.docmap_path)
    # 10% allow-list: a realistic metadata filter; a near-whole-corpus
    # allow makes pack prep (identical on both plans) dominate and
    # buries the posting-shuffle delta under host noise
    allow = docmap.filter(F.col("docid") % 10 == 0).select("docid") \
        .persist()
    allow.count()
    bounds = doc_bounds(spark, store).persist()
    bounds.count()
    queries = [(i, q, 10)
               for i, q in enumerate(QTEXTS * (args.queries // 10))]

    workloads = {
        "plain": {},
        "filtered": {"docid_filter": allow},
        "collapse": {"collapse_bounds": bounds},
        "filtered_collapse": {"docid_filter": allow,
                              "collapse_bounds": bounds},
    }

    def run(kw: dict) -> float:
        t0 = time.perf_counter()
        batch_topk(spark, store, queries, **kw).count()
        return time.perf_counter() - t0

    # warm-up, untimed
    batch_topk(spark, store, queries[:10]).count()

    times: dict[str, dict[str, list[float]]] = {
        w: {"fast": [], "shuffle": []} for w in workloads
    }
    for rnd in range(args.rounds):
        for w, kw in workloads.items():
            # alternate which side goes first each round
            order = (("fast", "shuffle") if rnd % 2 == 0
                     else ("shuffle", "fast"))
            for side in order:
                if side == "shuffle":
                    os.environ["VSS_QUERY_FORCE_SHUFFLE"] = "1"
                try:
                    sec = run(kw)
                finally:
                    os.environ.pop("VSS_QUERY_FORCE_SHUFFLE", None)
                if rnd > 0:  # round 1 = warm-up, discarded
                    times[w][side].append(sec)

    out = {}
    for w in workloads:
        f = statistics.median(times[w]["fast"])
        s = statistics.median(times[w]["shuffle"])
        out[w] = {"fast_sec": round(f, 3), "shuffle_sec": round(s, 3),
                  "speedup": round(s / f, 3),
                  "fast_all": [round(x, 3) for x in times[w]["fast"]],
                  "shuffle_all": [round(x, 3)
                                  for x in times[w]["shuffle"]]}
    print(json.dumps({"workloads": out, "n_queries": len(queries),
                      "cpus": args.cpus, "sf": 0.1}))
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
