"""Boolean and phrase queries over the inverted index.

* :func:`matching_docids` — the membership kernel: docids matching
  (ALL of / ANY of) term sets minus an exclusion set, computed with
  ZERO shuffle on the same file-aligned plan as scoring
  (`wand._partial_scores`): every posting for a given docid — all
  terms — lives in exactly ONE segment file (files are shard-complete
  per the `spimi.write_segments` invariant, LSM dirs own disjoint
  docid ranges), so per-file set algebra is globally exact and tasks
  emit only the (small) matching docid sets. Only `docids_bin` is
  decoded — tf/dl bytes are never read.
* :func:`boolean_topk` — Lucene-style boolean search: `must` terms are
  conjunctive, `should` terms contribute score only (unless there are
  no musts, in which case any `should` match qualifies), `must_not`
  excludes. Ranking is exact BM25 over must+should with UNCHANGED
  global stats, delivered through `wand.batch_topk(docid_filter=...)`
  — the membership set rides the r5 sideband fast path.
* :func:`phrase_topk` — exact phrase search. On stores built with
  positions=True (meta flag), adjacency/window checks run ENTIRELY on
  the index via :func:`positional_docids`: the per-term pos_bin
  payloads are intersected as shifted (docid, position) key sets on the
  same zero-shuffle file-aligned plan — O(postings of the query's
  terms), the Lucene positional-postings answer to the r5 verdict's
  common-term-phrase concern. Stores without positions (or with
  VSS_PHRASE_FORCE_STAGED=1, the A/B pin) take the legacy fallback:
  conjunctive candidates from the index, adjacency verified on the
  staged text via JVM n-gram containment (candidate-pruned with docid
  pushdown when the set is small, a semi-join otherwise — never an
  unconditional full-text scan). Both paths then BM25-rank over the
  phrase's terms. The reference has no phrase operator; this is the
  standard fulltext surface built from this engine's own parts.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import tokenize, tokens_col
from visionsearch_spark.index.store import IndexStore
from visionsearch_spark.query import wand

# above this many candidates the phrase-verify scan switches from a
# driver-collected docid-IN pushdown (row-group pruning on the
# docid-sorted staged files) to a distributed semi-join — the driver
# never materializes an unbounded set. 16k, not 64k: row-group pruning
# saturates long before 64k and a ~64k-literal InSet bloats plan
# strings/serialization (VERDICT r5 What's-wrong #3)
PHRASE_PUSHDOWN_MAX = 16384

# pin the legacy staged-text verify on positional stores (A/B only)
import os as _os  # noqa: E402

_FORCE_STAGED_ENV = "VSS_PHRASE_FORCE_STAGED"


def _norm_terms(terms: list[str] | None) -> list[str]:
    out: list[str] = []
    for t in terms or []:
        out.extend(tokenize(t))
    return sorted(set(out))


def _make_match_fn(all_of: list[str], any_of: list[str],
                   none_of: list[str]):
    """mapInArrow kernel: path rows in, matching docids out. Per-file
    exactness per the module docstring."""
    read_terms = sorted(set(all_of) | set(any_of) | set(none_of))

    def match(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        paths: list[str] = []
        for b in batches:
            for row in b.to_pandas().itertuples(index=False):
                if row.paths is not None:
                    paths.extend(row.paths)
        if not paths:
            return
        scanner = pads.dataset(paths, format="parquet").scanner(
            columns=["term", "n", "docids_bin"],
            filter=pc.field("term").isin(read_terms),
            use_threads=False,
        )
        tbl = scanner.to_table()
        terms_b = np.asarray(tbl["term"].to_pylist(), dtype=object)
        ns = tbl["n"].to_numpy().astype(np.int64)
        # one varint pass for ALL blocks (r7 — LEB128 streams
        # concatenate; segmented cumsum restores per-block absolutes)
        from visionsearch_spark.index.codec import decode_varint as _dv

        total = int(ns.sum())
        deltas = _dv(b"".join(tbl["docids_bin"].to_pylist()),
                     total).astype(np.int64)
        vbnd = np.zeros(ns.size + 1, dtype=np.int64)
        np.cumsum(ns, out=vbnd[1:])
        c = np.cumsum(deltas) if total else np.zeros(0, dtype=np.int64)
        vs = vbnd[:-1]
        all_docids = (c - np.repeat(c[vs] - deltas[vs], ns)
                      if ns.size else np.zeros(0, dtype=np.int64))
        rows_of: dict[str, list[int]] = {}
        for i, t in enumerate(terms_b):
            rows_of.setdefault(t, []).append(i)

        def docs(t: str) -> np.ndarray:
            idxs = rows_of.get(t)
            if not idxs:
                return np.empty(0, dtype=np.int64)
            return np.unique(np.concatenate(
                [all_docids[vbnd[i]:vbnd[i + 1]] for i in idxs]))

        if all_of:
            base = docs(all_of[0])
            for t in all_of[1:]:
                if not base.size:
                    break
                base = np.intersect1d(base, docs(t), assume_unique=True)
        else:
            parts = [docs(t) for t in any_of]
            parts = [p for p in parts if p.size]
            base = (np.unique(np.concatenate(parts))
                    if parts else np.empty(0, dtype=np.int64))
        if none_of and base.size:
            ex = [docs(t) for t in none_of]
            ex = [e for e in ex if e.size]
            if ex:
                base = np.setdiff1d(base, np.concatenate(ex))
        if base.size:
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame({"docid": base.astype(np.int64)}),
                preserve_index=False,
            )

    return match


def matching_docids(
    spark: SparkSession,
    store: IndexStore,
    all_of: list[str] | None = None,
    any_of: list[str] | None = None,
    none_of: list[str] | None = None,
    n_tasks: int | None = None,
) -> DataFrame:
    """DataFrame('docid long') of docs matching the boolean membership
    spec. Requires all_of or any_of (an exclusion-only query would mean
    enumerating the complement of a posting list — compose it against
    an explicit candidate set instead)."""
    all_of = _norm_terms(all_of)
    any_of = _norm_terms(any_of)
    none_of = _norm_terms(none_of)
    if not all_of and not any_of:
        raise ValueError("matching_docids requires all_of or any_of terms")

    empty = wand._local_df(spark, [], "docid long", ["docid"])
    meta = store.read_meta()
    if int(meta.get("n_docs", 0)) == 0:
        return empty
    # driver-side df lookup (memoized pyarrow, same as query planning):
    # a required term with zero postings empties the conjunction without
    # running a job; absent optional/excluded terms just drop out
    dfs = wand._lookup_term_dfs(
        spark, store, sorted(set(all_of) | set(any_of) | set(none_of))
    )
    if any(t not in dfs for t in all_of):
        return empty
    any_of = [t for t in any_of if t in dfs]
    none_of = [t for t in none_of if t in dfs]
    if not all_of and not any_of:
        return empty

    # bloom-prune on the INCLUSION terms only: each docid's postings
    # live wholly in one file, so an exclusion can only bite where some
    # inclusion term matched in the SAME file — files holding none of
    # all_of/any_of contribute an empty base regardless of none_of
    files = wand._bloom_prune(
        wand._segment_files(store), sorted(set(all_of) | set(any_of))
    )
    if not files:
        return empty
    n_tasks = n_tasks or spark.sparkContext.defaultParallelism
    bins = wand._lpt_bins(files, min(n_tasks, len(files)))
    rkeys = wand._route_keys(len(bins))
    paths_df = wand._local_df(
        spark, [(rkeys[i], b) for i, b in enumerate(bins)],
        "route_key long, paths array<string>", ["route_key", "paths"],
    )
    matched = (
        paths_df.repartition(len(bins), "route_key")
        .mapInArrow(_make_match_fn(all_of, any_of, none_of), "docid long")
    )
    # tombstoned docs are not members (index/deletes.py): counts/facets
    # built on this set must not see them. The deny set is O(deleted)
    # and AQE broadcasts it when small; ranking paths downstream mask
    # again in-kernel, which is idempotent.
    tomb = meta.get("tombstone_dirs") or []
    if tomb:
        import os as _os

        dead = spark.read.schema("docid long, dl long").parquet(
            *[_os.path.join(store.root, d) for d in tomb]
        ).select("docid")
        matched = matched.join(dead, "docid", "left_anti")
    return matched


def _make_positional_fn(toks: list[str], window: int | None,
                        slop: int | None = None):
    """mapInArrow kernel: path-pack rows in, positionally-matching docids
    out. Three modes:
      window=None, slop=None → exact ORDERED phrase (token i at p+i);
      window=w               → every DISTINCT term within some w
                               consecutive tokens (unordered SpanNear);
      slop=s                 → ORDERED sloppy phrase (Lucene SpanNear
                               inOrder=true): positions p_0<…<p_{m-1}
                               matching token order with p_{m-1}−p_0 ≤
                               m−1+s; s=0 degenerates to the exact
                               phrase. Found by the greedy
                               earliest-successor chain (optimal: the
                               earliest next occurrence minimizes the
                               span for a given start), vectorized over
                               every start via np.searchsorted on keys.
    Per-file exactness per the module docstring (files are
    shard-complete). Occurrences are keyed docid<<32 | position
    (docid < 2^31, position < 2^32 → int64-safe), so phrase adjacency is
    pure sorted-set intersection of shifted keys and the window check is
    a vectorized sliding count — O(postings of the query's terms), never
    O(candidate tokens) like the staged-text fallback. Only
    docids_bin/tfs_bin/pos_bin of the query's terms are decoded."""
    from visionsearch_spark.index.codec import decode_positions, decode_varint

    read_terms = sorted(set(toks))

    def match(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        paths: list[str] = []
        for b in batches:
            for row in b.to_pandas().itertuples(index=False):
                if row.paths is not None:
                    paths.extend(row.paths)
        if not paths:
            return
        scanner = pads.dataset(paths, format="parquet").scanner(
            columns=["term", "n", "docids_bin", "tfs_bin", "pos_bin"],
            filter=pc.field("term").isin(read_terms),
            use_threads=False,
        )
        tbl = scanner.to_table()
        terms_b = np.asarray(tbl["term"].to_pylist(), dtype=object)
        ns = tbl["n"].to_numpy().astype(np.int64)
        pbins = tbl["pos_bin"].to_pylist()
        missing = [terms_b[i] for i, p in enumerate(pbins) if p is None]
        if missing:
            raise ValueError(
                f"segment block for {missing[0]!r} has no pos_bin — "
                "positional query on a store built without positions=True"
            )
        # one varint pass per payload column for ALL blocks (r7)
        total = int(ns.sum())
        deltas = decode_varint(b"".join(tbl["docids_bin"].to_pylist()),
                               total).astype(np.int64)
        vbnd = np.zeros(ns.size + 1, dtype=np.int64)
        np.cumsum(ns, out=vbnd[1:])
        vs = vbnd[:-1]
        c = np.cumsum(deltas) if total else np.zeros(0, dtype=np.int64)
        all_d = (c - np.repeat(c[vs] - deltas[vs], ns)
                 if ns.size else np.zeros(0, dtype=np.int64))
        all_tf = decode_varint(b"".join(tbl["tfs_bin"].to_pylist()),
                               total).astype(np.int64)
        all_p = decode_positions(b"".join(pbins), all_tf)
        all_keys = (np.repeat(all_d, all_tf) << np.int64(32)) | all_p
        obnd = np.zeros(ns.size + 1, dtype=np.int64)
        if ns.size:
            np.cumsum(np.add.reduceat(all_tf, vs), out=obnd[1:])
        rows_of: dict[str, list[int]] = {}
        for i, t in enumerate(terms_b):
            rows_of.setdefault(t, []).append(i)

        def keys(t: str) -> np.ndarray:
            idxs = rows_of.get(t)
            if not idxs:
                return np.empty(0, dtype=np.int64)
            return np.sort(np.concatenate(
                [all_keys[obnd[i]:obnd[i + 1]] for i in idxs]))

        if slop is not None:
            m = len(toks)
            k_all = [keys(t) for t in toks]
            if any(k.size == 0 for k in k_all):
                return
            start = k_all[0]
            cur = start.copy()
            alive = np.ones(start.size, dtype=bool)
            for i in range(1, m):
                nxt = k_all[i]
                idx = np.searchsorted(nxt, cur, side="right")
                valid = idx < nxt.size
                cand = nxt[np.minimum(idx, nxt.size - 1)]
                alive &= valid & (
                    (cand >> np.int64(32)) == (start >> np.int64(32)))
                cur = np.where(alive, cand, cur)
            ok = alive & ((cur - start) <= np.int64(m - 1 + slop))
            docs = np.unique(start[ok] >> np.int64(32))
        elif window is None:
            base = keys(toks[0])
            for i, t in enumerate(toks[1:], start=1):
                if not base.size:
                    break
                base = np.intersect1d(base, keys(t) - i,
                                      assume_unique=True)
            docs = np.unique(base >> np.int64(32))
        else:
            terms = sorted(set(toks))
            parts = [keys(t) for t in terms]
            if any(p.size == 0 for p in parts):
                docs = np.empty(0, dtype=np.int64)
            else:
                allk = np.concatenate(parts)
                tags = np.repeat(np.arange(len(parts)),
                                 [p.size for p in parts])
                order = np.argsort(allk, kind="mergesort")
                ks, tg = allk[order], tags[order]
                # window [pos, pos+w-1] never crosses a doc: the next
                # doc's keys jump by >= 2^32 - dl >> w
                j = np.searchsorted(ks, ks + np.int64(window - 1),
                                    side="right")
                i0 = np.arange(ks.size)
                ok = np.ones(ks.size, dtype=bool)
                for t in range(len(parts)):
                    pref = np.concatenate(
                        ([0], np.cumsum(tg == t))
                    )
                    ok &= (pref[j] - pref[i0]) > 0
                docs = np.unique(ks[ok] >> np.int64(32))
        if docs.size:
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame({"docid": docs.astype(np.int64)}),
                preserve_index=False,
            )

    return match


def positional_docids(
    spark: SparkSession,
    store: IndexStore,
    toks: list[str],
    window: int | None = None,
    slop: int | None = None,
    n_tasks: int | None = None,
) -> DataFrame:
    """DataFrame('docid long') of docs with a positional match (exact
    phrase by default; unordered window when `window` is set; ordered
    sloppy phrase when `slop` is set — see _make_positional_fn) — the
    index-only verify path for stores built with positions=True. Same
    file-aligned zero-shuffle plumbing as matching_docids: bloom-pruned
    whole files to route-keyed tasks, tombstones anti-joined after."""
    empty = wand._local_df(spark, [], "docid long", ["docid"])
    meta = store.read_meta()
    if int(meta.get("n_docs", 0)) == 0:
        return empty
    dfs = wand._lookup_term_dfs(spark, store, sorted(set(toks)))
    if any(t not in dfs for t in toks):
        return empty  # a phrase/window term with zero postings
    files = wand._bloom_prune(wand._segment_files(store),
                              sorted(set(toks)))
    if not files:
        return empty
    n_tasks = n_tasks or spark.sparkContext.defaultParallelism
    bins = wand._lpt_bins(files, min(n_tasks, len(files)))
    rkeys = wand._route_keys(len(bins))
    paths_df = wand._local_df(
        spark, [(rkeys[i], b) for i, b in enumerate(bins)],
        "route_key long, paths array<string>", ["route_key", "paths"],
    )
    matched = (
        paths_df.repartition(len(bins), "route_key")
        .mapInArrow(_make_positional_fn(toks, window, slop=slop),
                    "docid long")
    )
    tomb = meta.get("tombstone_dirs") or []
    if tomb:
        dead = spark.read.schema("docid long, dl long").parquet(
            *[_os.path.join(store.root, d) for d in tomb]
        ).select("docid")
        matched = matched.join(dead, "docid", "left_anti")
    return matched


def boolean_topk(
    spark: SparkSession,
    store: IndexStore,
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    k: int = 5,
    threshold: float = 0.0,
    query_id: int = 0,
    search_after: tuple[float, str, int] | None = None,
) -> DataFrame:
    """Boolean-filtered BM25 top-k (wand.RESULT_DDL shape). Scoring terms
    = must + should; membership per the Lucene rule (musts conjunctive,
    shoulds qualify only when no musts, must_not always excludes).
    search_after: (score, conv_id, turn_idx) cursor — next page of the
    same filtered ranking (wand.batch_topk pagination)."""
    must_t = _norm_terms(must)
    should_t = _norm_terms(should)
    if not must_t and not should_t:
        raise ValueError("boolean_topk requires must or should terms")
    allow = matching_docids(
        spark, store,
        all_of=must_t or None,
        any_of=None if must_t else should_t,
        none_of=must_not,
    )
    qtext = " ".join(sorted(set(must_t) | set(should_t)))
    return wand.batch_topk(
        spark, store, [(query_id, qtext, k)], threshold=threshold,
        docid_filter=allow,
        search_after={query_id: search_after} if search_after else None,
    )


def _pruned_staged(spark: SparkSession, store: IndexStore,
                   cands: DataFrame) -> DataFrame | None:
    """Candidate-pruned staged-text scan: docid-IN pushdown (row-group
    pruning on the docid-sorted staged files) while the set is small,
    a distributed semi-join past the cap — the driver collect is
    bounded by PHRASE_PUSHDOWN_MAX + 1 rows. None = no candidates."""
    staged = spark.read.parquet(store.staged_path).select("docid", "text")
    head = cands.limit(PHRASE_PUSHDOWN_MAX + 1).collect()
    if len(head) <= PHRASE_PUSHDOWN_MAX:
        if not head:
            return None
        return staged.filter(
            F.col("docid").isin([int(r["docid"]) for r in head])
        )
    return staged.join(cands, "docid", "left_semi")


def phrase_docids(
    spark: SparkSession,
    store: IndexStore,
    phrase: str,
    slop: int = 0,
    n_tasks: int | None = None,
) -> DataFrame:
    """DataFrame('docid long') of docs containing the analyzed token
    sequence — exact adjacency at slop=0, Lucene SpanNear(inOrder=true,
    slop) otherwise (terms in order, total span ≤ len+slop−1 tokens).
    slop>0 REQUIRES a positional store: the staged-text fallback only
    implements exact m-gram containment. On flagless stores (or
    VSS_PHRASE_FORCE_STAGED=1) the exact form verifies candidates on
    staged text, candidate-only."""
    if slop < 0:
        raise ValueError("slop must be >= 0")
    toks = tokenize(phrase)
    if not toks:
        return wand._local_df(spark, [], "docid long", ["docid"])
    positional_ok = store.has_positions() \
        and not _os.environ.get(_FORCE_STAGED_ENV)
    if slop > 0 and len(toks) > 1:
        if not positional_ok:
            raise ValueError(
                "sloppy phrases need a store built with positions=True"
            )
        return positional_docids(spark, store, toks, slop=slop,
                                 n_tasks=n_tasks)
    if len(toks) > 1 and positional_ok:
        return positional_docids(spark, store, toks, window=None,
                                 n_tasks=n_tasks)
    cands = matching_docids(spark, store, all_of=toks, n_tasks=n_tasks)
    if len(toks) == 1:
        return cands
    m = len(toks)
    gram = " ".join(toks)
    staged = _pruned_staged(spark, store, cands)
    if staged is None:
        return wand._local_df(spark, [], "docid long", ["docid"])
    return (
        staged.withColumn("_tk", tokens_col("text"))
        .withColumn("_hit", F.array_contains(
            F.transform(
                F.when(
                    F.size("_tk") >= m,
                    F.sequence(F.lit(1), F.size("_tk") - (m - 1)),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.concat_ws(" ", F.slice("_tk", i, m)),
            ),
            gram,
        ))
        .filter(F.col("_hit"))
        .select("docid")
    )


def phrase_topk(
    spark: SparkSession,
    store: IndexStore,
    phrase: str,
    k: int = 5,
    threshold: float = 0.0,
    query_id: int = 0,
    slop: int = 0,
    search_after: tuple[float, str, int] | None = None,
) -> DataFrame:
    """Phrase BM25 top-k (exact at slop=0, ordered sloppy otherwise):
    rank only docs containing the analyzed token sequence, scored over
    the phrase's terms with UNCHANGED global stats (filter-the-results
    semantics, like every sideband query). search_after: cursor for the
    next page of the same ranking."""
    toks = tokenize(phrase)
    if not toks:
        return wand._local_df(
            spark, [], wand.RESULT_DDL, wand.RESULT_COLUMNS
        )
    verified = phrase_docids(spark, store, phrase, slop=slop)
    qtext = " ".join(sorted(set(toks)))
    return wand.batch_topk(
        spark, store, [(query_id, qtext, k)], threshold=threshold,
        docid_filter=verified,
        search_after={query_id: search_after} if search_after else None,
    )


def proximity_docids(
    spark: SparkSession,
    store: IndexStore,
    terms: list[str],
    window: int,
    n_tasks: int | None = None,
) -> DataFrame:
    """DataFrame('docid long') of docs where ALL terms co-occur inside
    some window of `window` consecutive tokens (unordered — Lucene's
    SpanNear with inOrder=false; phrase is the ordered window==len
    special case). Candidates = conjunctive index match (a doc can't
    window-match without containing every term); the window check runs
    candidate-only over the staged text as pure JVM array ops. Docs
    shorter than the window are checked whole."""
    toks = _norm_terms(terms)
    if not toks:
        return wand._local_df(spark, [], "docid long", ["docid"])
    if window < len(toks):
        raise ValueError(
            f"window {window} can never hold {len(toks)} distinct terms"
        )
    if len(toks) > 1 and store.has_positions() \
            and not _os.environ.get(_FORCE_STAGED_ENV):
        return positional_docids(spark, store, toks, window=window,
                                 n_tasks=n_tasks)
    cands = matching_docids(spark, store, all_of=toks, n_tasks=n_tasks)
    if len(toks) == 1:
        return cands
    staged = _pruned_staged(spark, store, cands)
    if staged is None:
        return wand._local_df(spark, [], "docid long", ["docid"])

    def window_has_all(i):
        win = F.slice("_tk", i, window)
        cond = F.array_contains(win, toks[0])
        for t in toks[1:]:
            cond = cond & F.array_contains(win, t)
        return cond

    starts = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), F.size("_tk") - (window - 1)),
    )
    return (
        staged.withColumn("_tk", tokens_col("text"))
        .filter(F.exists(starts, window_has_all))
        .select("docid")
    )


def proximity_topk(
    spark: SparkSession,
    store: IndexStore,
    terms: list[str],
    window: int,
    k: int = 5,
    threshold: float = 0.0,
    query_id: int = 0,
    search_after: tuple[float, str, int] | None = None,
) -> DataFrame:
    """Proximity-filtered BM25 top-k: rank only docs where the terms
    co-occur within the window, scored over those terms with UNCHANGED
    global stats (filter-the-results semantics).
    search_after: cursor for the next page of the same ranking."""
    toks = _norm_terms(terms)
    if not toks:
        return wand._local_df(
            spark, [], wand.RESULT_DDL, wand.RESULT_COLUMNS
        )
    verified = proximity_docids(spark, store, terms, window)
    return wand.batch_topk(
        spark, store, [(query_id, " ".join(toks), k)],
        threshold=threshold, docid_filter=verified,
        search_after={query_id: search_after} if search_after else None,
    )
