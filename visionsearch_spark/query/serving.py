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
        self.store = store
        self.n_docs = int(meta["n_docs"])
        self.avgdl = float(meta["avgdl"])
        self.shards = shards
        flt = None
        if shards is not None:
            import pyarrow.compute as pc

            flt = pc.field("shard").isin(shards)
        seg = pads.dataset(
            [pads.dataset(p) for p in store.segment_paths()]
        ).to_table(
            columns=["term", "n", "docids_bin", "tfs_bin", "dls_bin"],
            filter=flt,
        )
        # load builds only the term -> block-index map (one vectorized
        # groupby over the term column); posting bytes decode LAZILY on a
        # term's first query and are cached decoded — cold start is
        # column-scan cheap, the warm working set is as fast as eager
        self._ns = seg.column("n").to_pylist()
        self._dbins = seg.column("docids_bin").to_pylist()
        self._tbins = seg.column("tfs_bin").to_pylist()
        self._lbins = seg.column("dls_bin").to_pylist()
        terms = np.asarray(seg.column("term").to_pylist(), dtype=object)
        order = np.argsort(terms, kind="stable")
        sorted_terms = terms[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(sorted_terms[1:] != sorted_terms[:-1]) + 1)
        ) if terms.size else np.array([], dtype=np.int64)
        ends = np.concatenate((starts[1:], [terms.size])) if terms.size else starts
        self._blocks: dict[str, list[int]] = {
            str(sorted_terms[s]): [int(i) for i in order[s:e]]
            for s, e in zip(starts, ends)
        }
        self._decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        # docmap: docid is dense 0..n-1, so position == docid
        dm = pads.dataset(store.docmap_path).to_table(
            columns=["docid", "conv_id", "turn_idx"]
        )
        order = np.argsort(np.asarray(dm.column("docid")), kind="stable")
        self._conv = np.asarray(dm.column("conv_id").to_pylist(), dtype=object)[order]
        self._turn = np.asarray(dm.column("turn_idx"))[order]

        self._bounds: np.ndarray | None = None  # derived lazily

        # pending tombstones (index/deletes.py): loaded once per process,
        # masked in _scored before every cut — the serving twin of the
        # wand kernel's deny sideband. Restricted to this searcher's
        # shards (a shard-group process holds only its slice).
        self._dead: np.ndarray | None = None
        from visionsearch_spark.index.deletes import tombstone_paths

        tpaths = tombstone_paths(store)
        if tpaths:
            tt = pads.dataset(
                [pads.dataset(p) for p in tpaths]
            ).to_table(columns=["docid"])
            dead = np.asarray(tt.column("docid"), dtype=np.int64)
            if shards is not None and dead.size:
                shard_range = int(meta["shard_range"])
                keep = np.isin(dead // shard_range,
                               np.asarray(shards, dtype=np.int64))
                dead = dead[keep]
            if dead.size:
                self._dead = np.unique(dead)

    def _get_postings(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """(docids, tf_weight) for a term — decoded on first use, cached."""
        p = self._decoded.get(term)
        if p is not None:
            return p
        idxs = self._blocks.get(term)
        if idxs is None:
            return None
        d = np.concatenate(
            [decode_docids(self._dbins[i], self._ns[i]) for i in idxs]
        )
        tf = np.concatenate(
            [decode_varint(self._tbins[i], self._ns[i]) for i in idxs]
        ).astype(np.float64)
        dl = np.concatenate(
            [decode_varint(self._lbins[i], self._ns[i]) for i in idxs]
        ).astype(np.float64)
        order = np.argsort(d, kind="stable")
        tfw = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
        p = (d[order], tfw[order])
        self._decoded[term] = p
        return p

    def df(self, term: str) -> int:
        idxs = self._blocks.get(term)
        return 0 if idxs is None else int(sum(self._ns[i] for i in idxs))

    def mask_convs(self, conv_ids: list[str]) -> int:
        """Fold freshly tombstoned conversations into the in-process
        deny set — the serving DELETE endpoint's immediate-visibility
        hook (the on-disk tombstone dir covers every FUTURE searcher;
        this covers the running one without a reload). Returns the
        number of newly masked unit docids."""
        if not conv_ids:
            return 0
        hits = np.flatnonzero(np.isin(self._conv, list(set(conv_ids))))
        if not hits.size:
            return 0
        before = 0 if self._dead is None else self._dead.size
        self._dead = (
            np.unique(hits.astype(np.int64)) if self._dead is None
            else np.unique(np.concatenate([self._dead,
                                           hits.astype(np.int64)]))
        )
        return int(self._dead.size - before)

    def search_docs(self, query: str, k: int = 5, threshold: float = 0.0,
                    term_weights: dict[str, float] | None = None
                    ) -> list[tuple[int, str, float]]:
        """Doc-level top-k over a UNIT store: per-unit scores collapse to
        per-document max (units.py semantics, served in-memory). Bounds
        are derived from the loaded docid-ordered conv column — never a
        stored table that an append could leave stale. Over a transcript
        store this collapses turns per conversation (conv-level search).
        Returns [(first_unit_docid, conv_id, score)]."""
        collapsed = self._docs_collapsed(query, threshold, term_weights)
        if collapsed is None:
            return []
        uniq, convs, sums = collapsed
        # tie-break on the PARENT id (== the distributed path's ordering;
        # docid order can diverge from conv order on appended stores)
        if uniq.size > k:
            kth = -np.partition(-sums, k - 1)[k - 1]
            cand = np.flatnonzero(sums >= kth)
            order2 = np.lexsort((convs[cand], -sums[cand]))[:k]
            sel = cand[order2]
        else:
            sel = np.lexsort((convs, -sums))
        return [
            (int(uniq[i]), str(convs[i]), float(sums[i]))
            for i in sel
        ]

    def _docs_collapsed(self, query: str, threshold: float,
                        term_weights: dict[str, float] | None = None):
        """Score + double-collapse, PRE-cut: (run_start_docids, convs,
        max_scores) with one entry per matched conv — run_start is this
        searcher's MIN matched run-start per conv (runs arrive in docid
        order and the conv collapse keeps the first). Shared by
        search_docs and the router, so scatter-gather ranking AND
        representative resolve cost ONE scoring pass per group."""
        if self._bounds is None:
            conv = self._conv
            if conv.size == 0:
                return None
            change = np.flatnonzero(conv[1:] != conv[:-1]) + 1
            self._bounds = np.concatenate(([0], change)).astype(np.int64)
        units = self._scored(query, threshold, term_weights)
        if units is None or units[0].size == 0:
            return None
        uniq, sums = units
        parent = self._bounds[
            np.searchsorted(self._bounds, uniq, side="right") - 1
        ]
        st = np.concatenate(
            ([0], np.flatnonzero(parent[1:] != parent[:-1]) + 1)
        )
        uniq = parent[st]
        sums = np.maximum.reduceat(sums, st)
        # second collapse keys on the PARENT id: a parent whose units were
        # appended in a later increment owns several runs
        convs = self._conv[uniq]
        order = np.argsort(convs, kind="stable")  # stable: docid asc kept
        convs, uniq, sums = convs[order], uniq[order], sums[order]
        st2 = np.concatenate(
            ([0], np.flatnonzero(convs[1:] != convs[:-1]) + 1)
        )
        return uniq[st2], convs[st2], np.maximum.reduceat(sums, st2)

    def _scored(self, query: str, threshold: float,
                term_weights: dict[str, float] | None = None
                ) -> tuple[np.ndarray, np.ndarray] | None:
        """All (docid, score) above threshold — canonical (docid,
        term-rank) accumulation order; None when every term is OOV.

        term_weights: precomputed per-term idf. REQUIRED when this
        searcher holds a shard subset: its local posting count is not the
        corpus df, so the router (ShardedSearcher) computes global df
        across groups and passes the weights down. A full-index searcher
        derives the identical weights locally (local df == global df)."""
        qterms = sorted(set(tokenize(query)))
        present = [t for t in qterms if t in self._blocks]
        if not present:
            return None
        cat_d, cat_c = [], []
        for t in present:  # sorted unique terms = canonical rank order
            d, tfw = self._get_postings(t)
            w = (term_weights[t] if term_weights is not None
                 else idf_fn(self.n_docs, d.size))
            cat_d.append(d)
            cat_c.append(w * tfw)
        d = np.concatenate(cat_d)
        c = np.concatenate(cat_c)
        # dense scatter-add: bincount sums sequentially in input order, and
        # terms are concatenated in rank order, so per-doc accumulation
        # order is (docid, term-rank) — bit-identical to the oracle's
        # lexsort+reduceat, at O(N + postings) instead of O(P log P).
        # N is bounded per searcher (one docid-shard group per process).
        scores = np.bincount(d, weights=c, minlength=self.n_docs)
        uniq = np.flatnonzero(scores > threshold)
        if self._dead is not None and uniq.size:  # mask BEFORE any cut
            pos = np.minimum(
                np.searchsorted(self._dead, uniq), self._dead.size - 1
            )
            uniq = uniq[self._dead[pos] != uniq]
        return uniq, scores[uniq]

    @staticmethod
    def _select_topk(uniq: np.ndarray, sums: np.ndarray, k: int
                     ) -> tuple[np.ndarray, np.ndarray]:
        """k best by (score desc, docid asc), returned in that order.
        argpartition narrows to the >=kth-score candidates (O(M)), the
        deterministic tie-break lexsort then runs only on that set —
        never on every matching doc."""
        if uniq.size > k:
            kth = -np.partition(-sums, k - 1)[k - 1]
            cand = np.flatnonzero(sums >= kth)  # includes boundary ties
            order = np.lexsort((uniq[cand], -sums[cand]))[:k]
            sel = cand[order]
        else:
            sel = np.lexsort((uniq, -sums))
        return uniq[sel], sums[sel]

    def _prefix_mask(self, uniq: np.ndarray, conv_prefix: str
                     ) -> np.ndarray:
        """Boolean mask over matched docids whose conv_id starts with
        the prefix — the reference's S2 key-prefix filter served
        in-memory (filter ∧ top-k with UNCHANGED global stats, masked
        BEFORE the k-cut, exactly like wand's allow sideband). The
        conv gather is the same O(matches) indexing the collapse path
        already performs."""
        return np.fromiter(
            (c.startswith(conv_prefix) for c in self._conv[uniq]),
            dtype=bool, count=uniq.size,
        )

    def search(self, query: str, k: int = 5, threshold: float = 0.0,
               term_weights: dict[str, float] | None = None,
               conv_prefix: str | None = None,
               search_after: tuple[float, int] | None = None
               ) -> list[tuple[int, str, int, float]]:
        """[(docid, conv_id, turn_idx, score)] — rank-identical with the
        oracle: canonical (docid, term-rank) accumulation order, (score
        desc, docid asc) tie-break, OOV -> [] (never padded hits).
        conv_prefix: serve only docs whose conv_id starts with it.
        search_after: (score, docid) of the previous page's last hit —
        cursor pagination in this searcher's own total order; scores are
        deterministic float64, so the strict-after test is exact."""
        scored = self._scored(query, threshold, term_weights)
        if scored is None:
            return []
        uniq, sums = scored
        if conv_prefix is not None:
            m = self._prefix_mask(uniq, conv_prefix)
            uniq, sums = uniq[m], sums[m]
        if search_after is not None and uniq.size:
            cs, cd = search_after
            m = (sums < cs) | ((sums == cs) & (uniq > cd))
            uniq, sums = uniq[m], sums[m]
        if not uniq.size:
            return []
        uniq, sums = self._select_topk(uniq, sums, k)
        return [
            (int(d), str(self._conv[d]), int(self._turn[d]), float(s))
            for d, s in zip(uniq, sums)
        ]

    def suggest(self, prefix: str, n: int = 10) -> list[tuple[str, int]]:
        """Autocomplete: top-n dictionary completions of `prefix` as
        (term, df), df-desc — the term dictionary IS the suggester
        (Lucene's TermsComponent); driver-side pyarrow scan with prefix
        range pushdown, no Spark job (multiterm.expand_prefix)."""
        from visionsearch_spark.query.multiterm import expand_prefix

        return expand_prefix(None, self.store, prefix, n, use_spark=False)

    def did_you_mean(self, query: str, max_edits: int = 2
                     ) -> tuple[str, int] | None:
        """Spell correction over the term dictionary ('did you mean' —
        ES phrase suggester): OOV query terms replaced by their
        highest-df dictionary term within max_edits; None when nothing
        to correct. Spark-free (query/multiterm.did_you_mean)."""
        from visionsearch_spark.query.multiterm import did_you_mean

        return did_you_mean(self.store, query, max_edits=max_edits)

    def term_vector(self, conv_id: str, turn_idx: int
                    ) -> list[tuple[str, int, list[int], int]]:
        """ES _termvectors for one unit: [(term, tf, positions, df)],
        staged point lookup + in-memory df — no Spark job
        (query/termvectors.term_vector_local)."""
        from visionsearch_spark.query.termvectors import term_vector_local

        return term_vector_local(self, conv_id, turn_idx)

    def more_like_this(self, conv_id: str, turn_idx: int, k: int = 5,
                       max_query_terms: int = 10
                       ) -> list[tuple[int, str, int, float]]:
        """ES more_like_this served in-process: take the unit's top
        `max_query_terms` terms by tf·idf (idf from this searcher's df —
        rare-but-frequent-here terms characterize the doc), search them
        as a disjunction, and drop the seed unit itself from the hits.
        [] for an unknown key or an all-OOV unit."""
        import math as _math

        tv = self.term_vector(conv_id, turn_idx)
        if not tv:
            return []
        scored = sorted(
            ((tf * _math.log((self.n_docs + 1) / df), t)
             for t, tf, _ps, df in tv if df > 0),
            key=lambda x: (-x[0], x[1]),
        )[:max_query_terms]
        if not scored:
            return []
        query = " ".join(sorted(t for _s, t in scored))
        hits = self.search(query, k=k + 1)
        return [h for h in hits
                if not (h[1] == conv_id and h[2] == turn_idx)][:k]

    def search_highlighted(self, query: str, k: int = 5,
                           threshold: float = 0.0,
                           term_weights: dict[str, float] | None = None,
                           conv_prefix: str | None = None,
                           max_tokens: int = 30,
                           search_after: tuple[float, int] | None = None,
                           ) -> list[tuple[int, str, int, float, str]]:
        """search() plus a query-focused snippet per hit (last element),
        resolved from the staged table with an O(k) point lookup
        (query/highlight.highlight_hits)."""
        from visionsearch_spark.query.highlight import highlight_hits

        hits = self.search(query, k=k, threshold=threshold,
                           term_weights=term_weights,
                           conv_prefix=conv_prefix,
                           search_after=search_after)
        return highlight_hits(self.store, hits, query,
                              max_tokens=max_tokens)


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Per-element popcount of an int64 array (numpy<2 lacks
    np.bitwise_count): unpack the underlying bytes and sum bits."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(v)
    b = np.unpackbits(v.astype("<i8").view(np.uint8).reshape(-1, 8),
                      axis=1)
    return b.sum(axis=1)


class LocalVectorSearcher:
    """In-process ANN serving over a build_ann_index LSH sidecar — the
    vector twin of LocalSearcher (load once, answer in numpy, no Spark
    job per query). Loads (id, sig) from the sidecar and the embedding
    vectors keyed by id; a query Hamming-prunes on the signatures and
    exact-cosines the survivors, bit-for-bit the plan of
    operators/similarity.cosine_topk_lsh_indexed (rank-parity pinned in
    tests). At 10^12-row scale the per-process load is a shard of the
    embedding table behind the same scatter-gather story as
    ShardedSearcher; here one process holds the fixture corpus.

    conv_of: maps the embedding id to the text store's conv_id key (the
    id mapping is corpus knowledge, not engine knowledge; default str)."""

    def __init__(self, ann_root: str, emb_path: str,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 conv_of=None):
        import json
        import os

        from visionsearch_spark.operators.similarity import (
            SIG_DIR,
            SIG_META,
            _hyperplanes,
        )

        with open(os.path.join(ann_root, SIG_META)) as f:
            m = json.load(f)
        self.dim = int(m["dim"])
        self._planes = _hyperplanes(self.dim, int(m["n_planes"]),
                                    int(m["seed"]))
        sig = pads.dataset(os.path.join(ann_root, SIG_DIR)).to_table(
            columns=["id", "sig"])
        sig_ids = np.asarray(sig.column("id"), dtype=np.int64)
        sigs = np.asarray(sig.column("sig"), dtype=np.int64)
        emb = pads.dataset(emb_path).to_table(columns=[id_col, vec_col])
        emb_ids = np.asarray(emb.column(id_col), dtype=np.int64)
        vecs = np.asarray(emb.column(vec_col).to_pylist(),
                          dtype=np.float64)
        order = np.argsort(emb_ids, kind="stable")
        emb_ids, vecs = emb_ids[order], vecs[order]
        # align signatures to the vector order by id
        pos = np.searchsorted(emb_ids, sig_ids)
        if not (pos < emb_ids.size).all() or not \
                (emb_ids[np.minimum(pos, emb_ids.size - 1)]
                 == sig_ids).all():
            raise ValueError("ANN sidecar ids not all present in the "
                             "embedding table")
        self._ids = emb_ids
        self._vecs = vecs
        self._sigs = np.zeros(emb_ids.size, dtype=np.int64)
        self._sigs[pos] = sigs
        self._norms = np.sqrt((vecs * vecs).sum(axis=1))
        self.conv_of = conv_of or str

    def topk(self, query_vec, k: int = 10, max_hamming: int = 4
             ) -> list[tuple[str, int, float]]:
        """[(conv_id, rank, cos)] — Hamming prune on signatures, exact
        cosine on survivors, (cos desc, id asc) order, identical to the
        Spark cosine_topk_lsh_indexed plan."""
        qv = np.asarray(query_vec, dtype=np.float64)
        if qv.size != self.dim:
            raise ValueError(
                f"query dim {qv.size} != index dim {self.dim}")
        qsig = 0
        for i, plane in enumerate(self._planes):
            if float(plane @ qv) >= 0:
                qsig |= 1 << i
        surv = np.flatnonzero(
            _popcount64(self._sigs ^ np.int64(qsig)) <= max_hamming)
        if not surv.size:
            return []
        qn = float(np.sqrt(qv @ qv))
        denom = self._norms[surv] * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom > 0,
                           (self._vecs[surv] @ qv) / denom, 0.0)
        order = np.lexsort((self._ids[surv], -cos))[:k]
        sel = surv[order]
        return [
            (self.conv_of(int(self._ids[i])), r + 1, float(c))
            for r, (i, c) in enumerate(zip(sel, cos[order]))
        ]


def hybrid_serve(text_searcher, vec_searcher: LocalVectorSearcher,
                 query: str, query_vec, k: int = 10, depth: int = 50,
                 c: int = 60, max_hamming: int = 4
                 ) -> list[tuple[str, int, float]]:
    """Serving-tier hybrid retrieval: RRF-fuse the text searcher's
    conv-collapsed top-`depth` (rank = first appearance of the conv in
    the turn-level ranking, the serving analog of hybrid_topk's min-rank
    collapse) with the vector searcher's ANN top-`depth`. Returns
    [(conv_id, rank, fused)], ties broken conv asc — the same RRF
    contract as query/hybrid.rrf_fuse, served without a Spark job."""
    ranks: dict[str, float] = {}
    conv_rank: dict[str, int] = {}
    for pos, (_d, cv, _t, _s) in enumerate(
            text_searcher.search(query, k=depth), start=1):
        # min TURN-level rank per conv, gaps preserved — matching
        # hybrid_topk's groupBy(conv).min(rank), not a dense renumber
        if cv not in conv_rank:
            conv_rank[cv] = pos
    for cv, r in conv_rank.items():
        ranks[cv] = ranks.get(cv, 0.0) + 1.0 / (c + r)
    for cv, r, _cos in vec_searcher.topk(query_vec, k=depth,
                                         max_hamming=max_hamming):
        ranks[cv] = ranks.get(cv, 0.0) + 1.0 / (c + r)
    fused = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(cv, i + 1, f) for i, (cv, f) in enumerate(fused)]


class ShardedSearcher:
    """Scatter-gather router over per-shard-group LocalSearchers — the
    deployment story at 10^12-turn scale, where one process cannot hold
    the index: shards (docid ranges) are partitioned into n_groups, each
    group loads only its slice of the segments (`LocalSearcher(shards=)`),
    and a query fans out to every group and heap-merges with the frozen
    tie-break. The reference runs a single serving worker holding the
    whole FAISS index (`supervisord.conf [program:app]`,
    `aisearch/main.py:26-36`) — this router is the horizontal version.

    Correctness invariants:
      * idf uses GLOBAL df: the router sums per-group df (cheap — block
        metadata) and passes explicit term weights down; a group's local
        posting count is not the corpus df.
      * each docid's postings live in exactly one group (shard = docid
        range), so per-group scores are final — the merge never re-sums.
      * global top-k ⊆ union of per-group top-k (scores are doc-local),
        so gathering k per group is lossless; merge re-sorts by the same
        (score desc, key asc) order the single searcher uses.
    Rank-identity with a single full searcher is pinned by
    tests/test_serving.py."""

    def __init__(self, store: IndexStore, n_groups: int = 4):
        meta = store.read_meta()
        self.store = store
        self.n_docs = int(meta["n_docs"])
        self.avgdl = float(meta["avgdl"])
        shard_range = int(meta["shard_range"])
        max_shard = max(0, (self.n_docs - 1) // shard_range)
        groups: list[list[int]] = [
            list(range(g, max_shard + 1, n_groups))
            for g in range(min(n_groups, max_shard + 1))
        ]
        self.searchers = [LocalSearcher(store, shards=g) for g in groups]

    def df(self, term: str) -> int:
        return sum(s.df(term) for s in self.searchers)

    def mask_convs(self, conv_ids: list[str]) -> int:
        """Fan the serving-tier delete out to every shard group (each
        group masks only its own docids — np.isin finds nothing in the
        others)."""
        return sum(s.mask_convs(conv_ids) for s in self.searchers)

    def _weights(self, query: str) -> dict[str, float]:
        qterms = sorted(set(tokenize(query)))
        out = {}
        for t in qterms:
            d = self.df(t)
            if d > 0:
                out[t] = idf_fn(self.n_docs, d)
        return out

    def search(self, query: str, k: int = 5, threshold: float = 0.0,
               conv_prefix: str | None = None,
               search_after: tuple[float, int] | None = None
               ) -> list[tuple[int, str, int, float]]:
        # pagination composes with scatter-gather for free: each group
        # applies the cursor before its local cut (so per-group top-k of
        # the strictly-after set is a superset of the global page), and
        # the merge re-cuts in the same total order
        w = self._weights(query)
        if not w:
            return []
        hits = [
            h for s in self.searchers
            for h in s.search(query, k=k, threshold=threshold,
                              term_weights=w, conv_prefix=conv_prefix,
                              search_after=search_after)
        ]
        hits.sort(key=lambda h: (-h[3], h[0]))  # score desc, docid asc
        return hits[:k]

    def suggest(self, prefix: str, n: int = 10) -> list[tuple[str, int]]:
        """Autocomplete over the FULL dictionary (term_stats spans every
        shard group, so no scatter-gather needed)."""
        from visionsearch_spark.query.multiterm import expand_prefix

        return expand_prefix(None, self.store, prefix, n, use_spark=False)

    def did_you_mean(self, query: str, max_edits: int = 2
                     ) -> tuple[str, int] | None:
        """Spell correction over the FULL dictionary (term_stats spans
        every shard group — no scatter-gather)."""
        from visionsearch_spark.query.multiterm import did_you_mean

        return did_you_mean(self.store, query, max_edits=max_edits)

    def search_highlighted(self, query: str, k: int = 5,
                           threshold: float = 0.0,
                           conv_prefix: str | None = None,
                           max_tokens: int = 30,
                           search_after: tuple[float, int] | None = None,
                           ) -> list[tuple[int, str, int, float, str]]:
        """Scatter-gather search() plus per-hit snippets — ONE staged
        point lookup for the merged k, not one per group."""
        from visionsearch_spark.query.highlight import highlight_hits

        hits = self.search(query, k=k, threshold=threshold,
                           conv_prefix=conv_prefix,
                           search_after=search_after)
        return highlight_hits(self.store, hits, query,
                              max_tokens=max_tokens)

    def search_docs(self, query: str, k: int = 5, threshold: float = 0.0
                    ) -> list[tuple[int, str, float]]:
        """Doc-level (conv-collapsed) scatter-gather: a parent's units can
        span shard groups, so per-group partial maxes re-merge by conv —
        score = max across groups, representative docid = min run-start
        over ALL matched units. Each group scores ONCE
        (LocalSearcher._docs_collapsed); the merge keeps, per conv, the
        max score and the min group-local run-start — a group holding the
        conv's lowest-docid units but beaten out of its own top-k still
        contributes the representative (pre-fix that representative was
        silently lost, and the naive fix re-scored every group twice)."""
        w = self._weights(query)
        if not w:
            return []
        parts = [
            c for c in (
                s._docs_collapsed(query, threshold, term_weights=w)
                for s in self.searchers
            ) if c is not None
        ]
        if not parts:
            return []
        uniq = np.concatenate([p[0] for p in parts])
        convs = np.concatenate([p[1] for p in parts])
        sums = np.concatenate([p[2] for p in parts])
        order = np.argsort(convs, kind="stable")
        uniq, convs, sums = uniq[order], convs[order], sums[order]
        st = np.concatenate(
            ([0], np.flatnonzero(convs[1:] != convs[:-1]) + 1)
        )
        convs = convs[st]
        score = np.maximum.reduceat(sums, st)
        rep = np.minimum.reduceat(uniq, st)
        if convs.size > k:
            kth = -np.partition(-score, k - 1)[k - 1]
            cand = np.flatnonzero(score >= kth)
            sel = cand[np.lexsort((convs[cand], -score[cand]))[:k]]
        else:
            sel = np.lexsort((convs, -score))
        return [
            (int(rep[i]), str(convs[i]), float(score[i])) for i in sel
        ]
