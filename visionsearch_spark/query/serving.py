"""LocalSearcher — the load-once serving layer over built index segments.

The reference serves queries from an index loaded once at process start
(`/root/reference/visionsearch/common_utils/aisearch/main.py:26-36`) with
per-process model/index caches (`api/routers/caption/queries/analyze_image.py:34-44`);
its per-query latency is in-memory FAISS, not a batch job. The Spark path
(`query/wand.py`) is the distributed analog for batch/offline workloads, but
a Spark job costs ~0.5-1.5 s of scheduling regardless of data size — wrong
tool for interactive serving.

LocalSearcher closes that gap: it memory-loads the compressed segments
(pyarrow, zero Spark) and answers top-k in pure numpy using the IDENTICAL
frozen scoring spec and tie-break, rank-identical with the oracle and the
Spark path (tested). At 10^12-turn scale one process cannot hold the index;
the deployment story is one searcher per docid-shard group behind a
scatter-gather router — the same shard partitioning the Spark path uses,
served warm. `shards=` loads a subset for exactly that.
"""

from __future__ import annotations

import numpy as np
import pyarrow.dataset as pads

from visionsearch_spark.analyzer import tokenize
from visionsearch_spark.bm25 import B, K1
from visionsearch_spark.bm25 import idf as idf_fn
from visionsearch_spark.index.codec import decode_docids, decode_varint
from visionsearch_spark.index.store import IndexStore


class LocalSearcher:
    def __init__(self, store: IndexStore, shards: list[int] | None = None):
        meta = store.read_meta()
        self.n_docs = int(meta["n_docs"])
        self.avgdl = float(meta["avgdl"])
        flt = None
        if shards is not None:
            import pyarrow.compute as pc

            flt = pc.field("shard").isin(shards)
        seg = pads.dataset(store.segments_path).to_table(
            columns=["term", "n", "docids_bin", "tfs_bin", "dls_bin"],
            filter=flt,
        )
        # term -> (docids, tf_weight) fully decoded once at load; postings
        # of one term across blocks are disjoint + sorted by construction
        self._postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        terms = seg.column("term").to_pylist()
        ns = seg.column("n").to_pylist()
        dbins = seg.column("docids_bin").to_pylist()
        tbins = seg.column("tfs_bin").to_pylist()
        lbins = seg.column("dls_bin").to_pylist()
        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(terms):
            by_term.setdefault(t, []).append(i)
        for t, idxs in by_term.items():
            d = np.concatenate([decode_docids(dbins[i], ns[i]) for i in idxs])
            tf = np.concatenate(
                [decode_varint(tbins[i], ns[i]) for i in idxs]
            ).astype(np.float64)
            dl = np.concatenate(
                [decode_varint(lbins[i], ns[i]) for i in idxs]
            ).astype(np.float64)
            order = np.argsort(d, kind="stable")
            tfw = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
            self._postings[t] = (d[order], tfw[order])
        # docmap: docid is dense 0..n-1, so position == docid
        dm = pads.dataset(store.docmap_path).to_table(
            columns=["docid", "conv_id", "turn_idx"]
        )
        order = np.argsort(np.asarray(dm.column("docid")), kind="stable")
        self._conv = np.asarray(dm.column("conv_id").to_pylist(), dtype=object)[order]
        self._turn = np.asarray(dm.column("turn_idx"))[order]

        # unit stores carry a doc_bounds parquet (first unit docid per
        # parent doc); load it when present for search_docs collapse
        import os

        bpath = os.path.join(store.root, "doc_bounds")
        self._bounds: np.ndarray | None = None
        if os.path.isdir(bpath):
            b = pads.dataset(bpath).to_table(columns=["docid"])
            self._bounds = np.sort(np.asarray(b.column("docid")))

    def df(self, term: str) -> int:
        p = self._postings.get(term)
        return 0 if p is None else int(p[0].size)

    def search_docs(self, query: str, k: int = 5, threshold: float = 0.0
                    ) -> list[tuple[int, str, float]]:
        """Doc-level top-k over a UNIT store: per-unit scores collapse to
        per-document max (units.py semantics, served in-memory).
        Returns [(first_unit_docid, conv_id, score)]."""
        if self._bounds is None:
            raise ValueError("store has no doc_bounds — not a unit store")
        units = self._scored(query, threshold)
        if units is None or units[0].size == 0:
            return []
        uniq, sums = units
        parent = self._bounds[
            np.searchsorted(self._bounds, uniq, side="right") - 1
        ]
        st = np.concatenate(
            ([0], np.flatnonzero(parent[1:] != parent[:-1]) + 1)
        )
        uniq = parent[st]
        sums = np.maximum.reduceat(sums, st)
        if uniq.size > k:
            sel = np.lexsort((uniq, -sums))[:k]
            uniq, sums = uniq[sel], sums[sel]
        final = np.lexsort((uniq, -sums))
        return [
            (int(uniq[i]), str(self._conv[uniq[i]]), float(sums[i]))
            for i in final
        ]

    def _scored(self, query: str, threshold: float
                ) -> tuple[np.ndarray, np.ndarray] | None:
        """All (docid, score) above threshold — canonical (docid,
        term-rank) accumulation order; None when every term is OOV."""
        qterms = sorted(set(tokenize(query)))
        present = [t for t in qterms if t in self._postings]
        if not present:
            return None
        cat_d, cat_c, cat_r = [], [], []
        for r, t in enumerate(present):
            d, tfw = self._postings[t]
            w = idf_fn(self.n_docs, d.size)
            cat_d.append(d)
            cat_c.append(w * tfw)
            cat_r.append(np.full(d.size, r, dtype=np.int64))
        d = np.concatenate(cat_d)
        c = np.concatenate(cat_c)
        r = np.concatenate(cat_r)
        order = np.lexsort((r, d))
        d, c = d[order], c[order]
        starts = np.concatenate(([0], np.flatnonzero(d[1:] != d[:-1]) + 1))
        uniq = d[starts]
        sums = np.add.reduceat(c, starts)
        keep = sums > threshold
        return uniq[keep], sums[keep]

    def search(self, query: str, k: int = 5, threshold: float = 0.0
               ) -> list[tuple[int, str, int, float]]:
        """[(docid, conv_id, turn_idx, score)] — rank-identical with the
        oracle: canonical (docid, term-rank) accumulation order, (score
        desc, docid asc) tie-break, OOV -> [] (never padded hits)."""
        scored = self._scored(query, threshold)
        if scored is None:
            return []
        uniq, sums = scored
        if uniq.size > k:
            sel = np.lexsort((uniq, -sums))[:k]
            uniq, sums = uniq[sel], sums[sel]
        final = np.lexsort((uniq, -sums))
        return [
            (int(uniq[i]), str(self._conv[uniq[i]]), int(self._turn[uniq[i]]),
             float(sums[i]))
            for i in final
        ]
