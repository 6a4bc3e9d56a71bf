"""Interactive serving CLI over a built index — the reference's search app
(`/root/reference/visionsearch/common_utils/aisearch/main.py:54-65`)
re-expressed: index loaded ONCE at startup, per-query latency in
milliseconds via LocalSearcher (no Spark jobs on the query path).

    python jobs/serve.py --index /path/to/index [--k 10] [--threshold 0]
    > join filter stream
    rank docid conv_id turn_idx score
    ...
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--threshold", type=float, default=0.0)
    p.add_argument("--query", nargs="*", default=None,
                   help="one-shot queries; omit for interactive stdin loop")
    args = p.parse_args()

    from visionsearch_spark.index.store import IndexStore
    from visionsearch_spark.query.serving import LocalSearcher

    t0 = time.perf_counter()
    searcher = LocalSearcher(IndexStore(args.index))
    print(f"loaded {searcher.n_docs} docs in {time.perf_counter() - t0:.2f}s",
          file=sys.stderr)

    def answer(q: str) -> None:
        t = time.perf_counter()
        hits = searcher.search(q, k=args.k, threshold=args.threshold)
        ms = (time.perf_counter() - t) * 1000
        print(f"# {q!r} -> {len(hits)} hits in {ms:.1f} ms")
        for rank, (docid, conv_id, turn_idx, score) in enumerate(hits, 1):
            print(f"{rank:3d} {docid:10d} {conv_id:>16s} {turn_idx:4d} {score:.6f}")

    if args.query:
        for q in args.query:
            answer(q)
        return
    for line in sys.stdin:
        q = line.strip()
        if not q or q in {"exit", "quit"}:
            break
        answer(q)


if __name__ == "__main__":
    main()
