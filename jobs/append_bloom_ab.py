"""A/B: append throughput with delta sidecars written by the fused
kernel path (r7 default) vs bare delta dirs (the r6 blooms=False
deferral), plus tail-term query p50 on the BARE appended store and
after the compaction that restores full sidecar coverage.

Method: build one base store (90% of the sf0.1 corpus) in /dev/shm,
then for each rep copy it fresh, append the remaining 10% with the
default code ("on" arm, fused sidecars) and with blooms forced OFF
("off" arm, spimi.write_segments patched), alternating order across
reps; medians reported. Query p50 = median of tail-term topk calls on
the blooms-off appended store, then after compact_store.

History: the r6 invocation of this script used
functools.partial(write_segments, blooms=True) for its ON arm, which
call-time blooms=False silently overrides — both r6 arms ran identical
code and BENCH_AB_r06's "near-null" measured nothing. The first honest
run (r7, pre-fused-append) read ON 2.35 s vs OFF 1.95 s median (1.20x):
the old per-append sidecar pass was a real ~17% ingest tax, which the
fused kernel path then removed.

Usage: python jobs/append_bloom_ab.py [--reps 3] [--out BENCH_AB_r06.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--work", default="/dev/shm/vss_bloom_ab")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from visionsearch_spark.corpus import documents_as_transcripts
    from visionsearch_spark.index import spimi
    from visionsearch_spark.index.spimi import build_index, compact_store
    from visionsearch_spark.index.store import IndexStore
    from visionsearch_spark.query.wand import topk
    from visionsearch_spark.session import get_spark
    from visionsearch_spark.streaming.incremental import incremental_build

    spark = get_spark("bloom-ab", cores=args.cpus)
    tx = documents_as_transcripts(spark, args.sf_dir).cache()
    convs = sorted(r.conv_id for r in tx.select("conv_id")
                   .distinct().collect())
    cut = convs[int(len(convs) * 0.9)]
    base_tx = tx.filter(F.col("conv_id") < cut)

    shutil.rmtree(args.work, ignore_errors=True)
    os.makedirs(args.work)
    base = os.path.join(args.work, "base")
    build_index(base_tx, base, n_partitions=args.cpus)

    orig_write = spimi.write_segments

    def bloom_off(*a, **k):
        # force-bare arm; plain keyword injection, NOT functools.partial
        # (call-time keywords win over partial keywords — the bug that
        # voided the r6 run of this script, see module docstring)
        k["blooms"] = False
        return orig_write(*a, **k)

    def one_append(tag: str, forced_on: bool) -> str:
        root = os.path.join(args.work, f"arm-{tag}")
        shutil.copytree(base, root)
        spimi.write_segments = orig_write if forced_on else bloom_off
        try:
            t0 = time.perf_counter()
            incremental_build(tx, root, n_partitions=args.cpus)
            dt = time.perf_counter() - t0
        finally:
            spimi.write_segments = orig_write
        times[("on" if forced_on else "off")].append(dt)
        return root

    times: dict[str, list[float]] = {"on": [], "off": []}
    keep_off_root = None
    for rep in range(args.reps):
        order = [(False, f"off{rep}"), (True, f"on{rep}")]
        if rep % 2:
            order.reverse()
        for forced_on, tag in order:
            root = one_append(tag, forced_on)
            if not forced_on:
                keep_off_root = root
            else:
                shutil.rmtree(root)
        print(f"rep {rep}: off={times['off'][-1]:.2f}s "
              f"on={times['on'][-1]:.2f}s", file=sys.stderr)

    # tail term: rarest df>=1 term from term_stats of the base dir
    import pyarrow.dataset as pads

    store = IndexStore(keep_off_root)
    ts = pads.dataset(store.term_stats_paths()[0]).to_table().to_pandas()
    tail_term = ts.sort_values(["df", "term"]).iloc[0]["term"]

    def p50(n: int = 7) -> float:
        xs = []
        for _ in range(n):
            t0 = time.perf_counter()
            topk(spark, store, tail_term, k=10).collect()
            xs.append(time.perf_counter() - t0)
        return statistics.median(xs)

    p50_appended_unpruned = p50()
    compact_store(spark, keep_off_root, n_partitions=args.cpus)
    store = IndexStore(keep_off_root)
    p50_compacted = p50()

    res = {
        "append_sec_blooms_off": round(statistics.median(times["off"]), 3),
        "append_sec_blooms_on": round(statistics.median(times["on"]), 3),
        "append_speedup": round(
            statistics.median(times["on"])
            / statistics.median(times["off"]), 3),
        "off_all": [round(x, 3) for x in times["off"]],
        "on_all": [round(x, 3) for x in times["on"]],
        "tail_term": str(tail_term),
        "tail_p50_appended_unpruned": round(p50_appended_unpruned, 4),
        "tail_p50_post_compaction": round(p50_compacted, 4),
        "cpus": args.cpus, "sf_dir": args.sf_dir, "reps": args.reps,
    }
    print(json.dumps(res))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps({
                "run": "append_fused_sidecars_ab_r7",
                "note": "O(delta) append wall time with delta "
                        "sidecars from the fused kernel path (r7 "
                        "default, ON arm) vs bare delta dirs (r6 "
                        "deferral, OFF arm); fresh store copy per "
                        "rep, arms alternated; tail-term p50 on the "
                        "bare appended store and after the compaction "
                        "that restores sidecars",
                "result": res,
            }) + "\n")
    shutil.rmtree(args.work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
