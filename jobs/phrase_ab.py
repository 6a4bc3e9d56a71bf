"""A/B: positional phrase/proximity verify vs the staged-text fallback
at sf0.1 (VERDICT r5 #3 done-criterion).

Builds (or reuses) the shared documents store — positional since r6 —
then times phrase_topk / proximity_topk with the positional path against
VSS_PHRASE_FORCE_STAGED=1, interleaved, medians reported. The phrase is
picked HIGH-DF on purpose: two common terms make the conjunctive
candidate set a large corpus fraction, which is exactly where the
staged-text verify pays O(candidate tokens) and positions pay
O(postings).

Usage: python jobs/phrase_ab.py [--reps 5] [--out BENCH_AB_r06.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from visionsearch_spark.corpus import get_documents_index
    from visionsearch_spark.query.boolean import phrase_topk, proximity_topk
    from visionsearch_spark.session import get_spark

    spark = get_spark("phrase-ab", cores=args.cpus)
    store = get_documents_index(spark, args.sf_dir)
    assert store.has_positions(), "store must be positional (CACHE v3+)"

    # highest-df term pair that actually phrases: take the top terms by
    # df and probe which adjacent pair has hits
    import pyarrow.dataset as pads

    ts = pads.dataset(store.term_stats_paths()[0]).to_table().to_pandas()
    top = ts.sort_values("df", ascending=False).head(12)["term"].tolist()
    phrase = None
    for a in top[:6]:
        for b in top[:6]:
            if a == b:
                continue
            n = phrase_topk(spark, store, f"{a} {b}", k=5).count()
            if n > 0:
                phrase = f"{a} {b}"
                break
        if phrase:
            break
    assert phrase, "no high-df phrase found"
    print(f"phrase = {phrase!r} (top dfs: "
          f"{top[:6]})", file=sys.stderr)

    def run(kind: str, forced: bool) -> float:
        if forced:
            os.environ["VSS_PHRASE_FORCE_STAGED"] = "1"
        try:
            t0 = time.perf_counter()
            if kind == "phrase":
                phrase_topk(spark, store, phrase, k=20).collect()
            else:
                proximity_topk(spark, store, phrase.split(), 6,
                               k=20).collect()
            return time.perf_counter() - t0
        finally:
            os.environ.pop("VSS_PHRASE_FORCE_STAGED", None)

    res: dict = {"query_phrase": phrase, "sf_dir": args.sf_dir,
                 "cpus": args.cpus}
    for kind in ("phrase", "proximity"):
        pos_t, stg_t = [], []
        run(kind, False)  # warm both paths once (host first-child skew)
        run(kind, True)
        for _ in range(args.reps):
            pos_t.append(run(kind, False))
            stg_t.append(run(kind, True))
        res[kind] = {
            "positional_sec": round(statistics.median(pos_t), 4),
            "staged_sec": round(statistics.median(stg_t), 4),
            "speedup": round(statistics.median(stg_t)
                             / statistics.median(pos_t), 3),
            "positional_all": [round(x, 4) for x in pos_t],
            "staged_all": [round(x, 4) for x in stg_t],
        }
        print(kind, res[kind], file=sys.stderr)
    print(json.dumps(res))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps({
                "run": "phrase_positional_ab_r6",
                "note": "high-df phrase/proximity verify: positional "
                        "pos_bin intersection vs staged-text n-gram "
                        "containment; interleaved, medians of "
                        f"{args.reps} (warmup dropped)",
                "result": res,
            }) + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
