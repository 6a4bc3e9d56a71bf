"""Serve a built index over HTTP (reference aisearch/main.py analog).

    python jobs/serve_http.py --root /path/to/index [--port 8080]
        [--spool /path/to/spool] [--static /path/to/files]

Endpoints: GET /search?q=&k=   GET /healthz   POST /upload   GET /files/*
Uploads land in the spool dir; run the streaming ingest (or
`python jobs/build_index.py`-style incremental job) to index them:
the serving process stays read-only over the current snapshot and a
restart (or new LocalSearcher) picks up the flipped epoch.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visionsearch_spark.index.store import IndexStore
from visionsearch_spark.query.serving import LocalSearcher, ShardedSearcher
from visionsearch_spark.sources.http_api import ServingApp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--spool", default=None)
    ap.add_argument("--static", default=None)
    ap.add_argument("--shard-groups", type=int, default=1,
                    help="scatter-gather over N per-shard-group searchers "
                         "(1 = single full-index searcher); rank-identical "
                         "either way")
    args = ap.parse_args()
    store = IndexStore(args.root)
    searcher = (ShardedSearcher(store, n_groups=args.shard_groups)
                if args.shard_groups > 1 else LocalSearcher(store))
    spool = args.spool or os.path.join(args.root, "spool")
    app = ServingApp(searcher, spool_dir=spool, static_dir=args.static)
    srv = app.make_server(port=args.port)
    print(f"serving index ({searcher.n_docs} docs) on "
          f"http://127.0.0.1:{srv.server_address[1]}  spool={spool}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
