"""SPIMI index build: per-partition posting construction inside mapInArrow,
per-partition checkpoint commits, then a docid-range-sharded compaction.

Pipeline (SURVEY.md §3.2 "ours"):
  1. STAGE    docid assignment (deterministic, docid.py) + JVM token
              COUNT; staged table (pid, docid, conv_id, turn_idx, dl,
              text) written once — raw text, NOT the token array (the
              array would re-encode every text byte plus offsets,
              doubling the build's one non-scaling write). pid = docid *
              n_partitions // n_docs, a pure function of docid, so resume
              is partition-stable by construction.
  2. SPIMI    mapInArrow over pid-grouped, docid-sorted rows: re-tokenize
              text (pandas str kernel, same frozen spec), accumulate
              term -> (docids, tfs, dls) per pid with pandas explode +
              groupby (vectorized — no per-row Python), cut blocks at 128
              docs AND at docid-shard boundaries (R), delta+varint encode,
              write fragment parquet + manifest json ATOMICALLY per pid.
              Already-committed pids are skipped (resume).
  3. MERGE    fragments -> term_stats (sum of block df) and compacted
              segments via applyInPandas over (term, shard): blocks of one
              term have globally disjoint docid ranges, so merging is
              sort-by-min_docid + re-chunk — never a posting-level merge
              sort. Sharding by docid range bounds per-task work for hot
              terms (the salted-repartition skew defense of the north
              rule: fanout grows with df because a hot term spans more
              shards).
  4. COMMIT   segments written partitioned by shard (query-side docid
              co-location comes from this), meta.json snapshot.

Scale notes: every stage is linear in its partition; nothing funnels
through the driver except the tiny offsets array (docid.py) and meta.
At 10^12 turns the knobs are n_partitions (SPIMI fan-out) and n_shards
(merge/query fan-out); both stream through Arrow batches.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import TOKEN_SEP_RE, tokens_col
from visionsearch_spark.bm25 import B, K1
from visionsearch_spark.docid import assign_docids_with_count
from visionsearch_spark.index.store import (
    MANIFEST_SCHEMA_DDL,
    SEGMENT_SCHEMA_DDL,
    IndexStore,
)

BLOCK_SIZE = 128

# mapInArrow output must match the declared DDL types EXACTLY (no coercion)
_MANIFEST_PA_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("status", pa.string()),
        ("postings_written", pa.int64()),
        ("terms_merged", pa.int64()),
        ("bytes_compressed", pa.int64()),
        ("lineage", pa.string()),
        ("ts", pa.string()),
    ]
)

_FRAGMENT_PA_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("min_docid", pa.int64()),
        ("max_docid", pa.int64()),
        ("n", pa.int32()),
        ("docids_bin", pa.binary()),
        ("tfs_bin", pa.binary()),
        ("dls_bin", pa.binary()),
        ("max_tf", pa.int32()),
        ("min_dl", pa.int32()),
        ("pos_bin", pa.binary()),
    ]
)


def _tf_weight_np(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _encode_term_blocks(term: str, docids: np.ndarray, tfs: np.ndarray,
                        dls: np.ndarray, shard_range: int,
                        pos: np.ndarray | None = None) -> list[tuple]:
    """Cut one term's (sorted-by-docid) postings into blocks of <=BLOCK_SIZE
    that never cross a docid-shard boundary; encode each block. Pruning
    metadata is (max_tf, min_dl) — avgdl-independent, so blocks stay valid
    across appends that shift corpus stats (the query side derives the
    tf-weight upper bound under the CURRENT avgdl). `pos` (positional
    stores): flat token positions aligned with np.repeat(docids, tfs)."""
    from visionsearch_spark.index.codec import (
        encode_docids,
        encode_positions,
        encode_varint,
    )

    rows = []
    shards = docids // shard_range
    # boundaries where shard changes
    cut = np.flatnonzero(shards[1:] != shards[:-1]) + 1
    starts = np.concatenate(([0], cut))
    ends = np.concatenate((cut, [docids.size]))
    occ = (np.concatenate(([0], np.cumsum(tfs)))
           if pos is not None else None)
    for s, e in zip(starts, ends):
        for b0 in range(s, e, BLOCK_SIZE):
            b1 = min(b0 + BLOCK_SIZE, e)
            d = docids[b0:b1]
            rows.append(
                (
                    term,
                    int(d[0]),
                    int(d[-1]),
                    int(b1 - b0),
                    encode_docids(d),
                    encode_varint(tfs[b0:b1].astype(np.uint64)),
                    encode_varint(dls[b0:b1].astype(np.uint64)),
                    int(tfs[b0:b1].max()),
                    int(dls[b0:b1].min()),
                    (encode_positions(pos[occ[b0]:occ[b1]], tfs[b0:b1])
                     if pos is not None else None),
                )
            )
    return rows


def _make_spimi_fn(store_root: str, shard_range: int,
                   fail_pids: frozenset[int], positions: bool = False):
    """Returns the mapInArrow function for the SPIMI stage. With
    `positions` the kernel accumulates the OCCURRENCE stream (term,
    docid, dl, pos) instead of pre-counted postings — ~tf/posting more
    rows through the flush sort, which is why the feature is an opt-in
    store flag rather than always-on (meta['positions'])."""

    def spimi(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        store = IndexStore(store_root)
        acc: list[pd.DataFrame] = []
        cur_pid: int | None = None

        def flush(pid: int) -> dict:
            if pid in fail_pids:
                # test-only: let sibling tasks commit their checkpoints
                # before this one aborts the job (deterministic resume test)
                time.sleep(5)
                raise RuntimeError(f"fault injection: partition {pid}")
            frag_tmp = store.fragment_path(pid) + ".tmp"
            man_tmp = store.manifest_path(pid) + ".tmp"
            if os.path.exists(store.manifest_path(pid)):
                return {"partition_id": pid, "status": "already-done",
                        "postings_written": 0, "terms_merged": 0,
                        "bytes_compressed": 0, "lineage": "{}",
                        "ts": str(time.time())}
            pos_flat: np.ndarray | None = None
            if positions:
                pdf = pd.concat(acc, ignore_index=True) if acc else \
                    pd.DataFrame(columns=["term", "docid", "dl", "pos"])
                pdf = pdf.sort_values(["term", "docid", "pos"],
                                      kind="mergesort")
                t_o = pdf["term"].to_numpy()
                d_o = pdf["docid"].to_numpy(dtype=np.int64)
                pos_flat = pdf["pos"].to_numpy(dtype=np.int64)
                newp = np.ones(len(pdf), dtype=bool)
                if len(pdf) > 1:
                    newp[1:] = (t_o[1:] != t_o[:-1]) | (d_o[1:] != d_o[:-1])
                pstarts = np.flatnonzero(newp)
                terms = t_o[pstarts]
                docids = d_o[pstarts]
                dls = pdf["dl"].to_numpy(dtype=np.int64)[pstarts]
                tfs = np.diff(np.concatenate((pstarts, [len(pdf)])))
            else:
                pdf = pd.concat(acc, ignore_index=True) if acc else \
                    pd.DataFrame(columns=["term", "docid", "tf", "dl"])
                pdf = pdf.sort_values(["term", "docid"], kind="mergesort")
                terms = pdf["term"].to_numpy()
                docids = pdf["docid"].to_numpy(dtype=np.int64)
                tfs = pdf["tf"].to_numpy(dtype=np.int64)
                dls = pdf["dl"].to_numpy(dtype=np.int64)
            bounds = np.flatnonzero(terms[1:] != terms[:-1]) + 1 if terms.size else np.array([], dtype=np.int64)
            starts = np.concatenate(([0], bounds)) if terms.size else np.array([], dtype=np.int64)
            ends = np.concatenate((bounds, [terms.size])) if terms.size else np.array([], dtype=np.int64)
            occ_of = (np.concatenate(([0], np.cumsum(tfs)))
                      if positions else None)
            rows: list[tuple] = []
            for s, e in zip(starts, ends):
                rows.extend(_encode_term_blocks(
                    str(terms[s]), docids[s:e], tfs[s:e], dls[s:e],
                    shard_range,
                    pos=(pos_flat[occ_of[s]:occ_of[e]]
                         if positions else None)))
            tbl = pa.Table.from_arrays(
                [pa.array([r[i] for r in rows], type=f.type)
                 for i, f in enumerate(_FRAGMENT_PA_SCHEMA)],
                schema=_FRAGMENT_PA_SCHEMA,
            )
            pq.write_table(tbl, frag_tmp, compression="zstd")
            os.replace(frag_tmp, store.fragment_path(pid))
            n_bytes = sum(len(r[4]) + len(r[5]) + len(r[6]) for r in rows)
            manifest = {
                "partition_id": pid,
                "status": "done",
                "postings_written": int(tfs.size),
                "terms_merged": int(starts.size),
                "bytes_compressed": int(n_bytes),
                "lineage": json.dumps({
                    "fragment": os.path.basename(store.fragment_path(pid)),
                    "docid_min": int(docids.min()) if docids.size else None,
                    "docid_max": int(docids.max()) if docids.size else None,
                    "n_blocks": len(rows),
                }),
                "ts": str(time.time()),
            }
            with open(man_tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(man_tmp, store.manifest_path(pid))
            return manifest

        out: list[dict] = []
        for batch in batches:
            pdf = batch.to_pandas()
            for pid, grp in pdf.groupby("pid", sort=True):
                pid = int(pid)
                if cur_pid is not None and pid != cur_pid:
                    out.append(flush(cur_pid))
                    acc.clear()
                cur_pid = pid
                # re-tokenize from staged text (pandas str ops are C-level
                # and scale with cores, unlike the staged write they
                # replace); the frozen spec: lower -> split [^0-9a-z]+ ->
                # drop empties — identical to analyzer.tokenize
                toks = grp["text"].str.lower().str.split(TOKEN_SEP_RE)
                ex = pd.DataFrame(
                    {"docid": grp["docid"], "dl": grp["dl"], "term": toks}
                ).explode("term")
                ex = ex[ex["term"].notna() & (ex["term"] != "")]
                if positions:
                    # token index within the ANALYZED list (empties
                    # dropped first) — the coordinate the phrase verify
                    # intersects on, identical to analyzer.tokenize order
                    ex = ex.assign(pos=ex.groupby("docid").cumcount())
                    acc.append(ex[["term", "docid", "dl", "pos"]])
                else:
                    counts = (
                        ex.groupby(["term", "docid", "dl"], sort=False)
                        .size()
                        .reset_index(name="tf")
                    )
                    acc.append(counts[["term", "docid", "tf", "dl"]])
        if cur_pid is not None:
            out.append(flush(cur_pid))
        if out:
            tbl = pa.Table.from_pylist(out).select(
                [f.name for f in _MANIFEST_PA_SCHEMA]
            ).cast(_MANIFEST_PA_SCHEMA)
            yield from tbl.to_batches()

    return spimi


def build_index(
    transcripts: DataFrame,
    root: str,
    n_partitions: int | None = None,
    n_shards: int | None = None,
    fail_partitions: frozenset[int] | set[int] = frozenset(),
    positions: bool = False,
) -> IndexStore:
    """Build (or resume) the compressed index at `root`.

    `fail_partitions` injects a task failure before the given pids commit —
    used by the resume tests to simulate an interrupted build
    (the reference's KeyboardInterrupt-then-rerun contract,
    `generate_captions.py:100-102`).

    `positions` writes per-term token-position payloads (pos_bin) into
    every block — the store flag is fixed here and inherited by appends
    and compactions, so live dirs are always internally consistent;
    phrase/proximity queries then verify on the index instead of
    re-tokenizing staged text (query/boolean.py positional path).
    """
    spark = transcripts.sparkSession
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism
    store = IndexStore(root)
    store.ensure_dirs()
    stage_sec: dict[str, float] = {}
    t_last = time.perf_counter()

    def mark(name: str) -> None:
        nonlocal t_last
        now = time.perf_counter()
        stage_sec[name] = round(now - t_last, 3)
        t_last = now

    if not os.path.exists(store.meta_path):
        cache_handle: list = []
        with_ids, n_docs = assign_docids_with_count(
            transcripts.select("conv_id", "turn_idx", "text"), n_partitions,
            unpersist_handle=cache_handle,
        )
        mark("assign_docids")
        # staged-write diet: stage RAW text + dl, not the token array —
        # the array re-encodes nearly every text byte plus offsets,
        # roughly doubling the one big non-scaling write of the build
        # (r1 scaling evidence: stage_write 1.4x for 4x cores). dl is
        # counted JVM-side here (cheap — only the count shuffles); the
        # SPIMI kernel re-tokenizes text with the same frozen spec.
        toks = (
            with_ids.select("docid", "conv_id", "turn_idx", "text")
            .withColumn("dl", F.size(tokens_col("text")))
        )
        # shard = query-time unit of docid-range co-location. Target ~128k
        # docs per shard (posting decode stays cache-friendly), but never
        # fewer shards than build partitions (query parallelism floor).
        # (A 4x-partitions floor was tried for file occupancy and
        # regressed build 17-40% at sf0.1 — more shards fragment every
        # cross-shard term's blocks; occupancy is solved in
        # write_segments by RANGE-partitioning instead.)
        n_shards_eff = n_shards or max(n_partitions, n_docs // 131072)
        shard_range = max(1, -(-n_docs // n_shards_eff))  # ceil div
        rows_per_pid = max(1, -(-n_docs // n_partitions))
        staged = toks.withColumn(
            "pid", (F.col("docid") / F.lit(rows_per_pid)).cast("int")
        )
        # corpus stats observed DURING the staged write — no extra
        # aggregation job. sum_dl persists in meta so appends can update
        # stats incrementally (O(delta)) instead of re-scanning staged.
        from pyspark.sql import Observation

        obs = Observation("staged_stats")
        staged.observe(obs, F.sum("dl").alias("sum_dl")).write.mode(
            "overwrite"
        ).parquet(store.staged_path)
        sum_dl = int(obs.get["sum_dl"] or 0)
        for cached in cache_handle:  # staged parquet supersedes the cache
            cached.unpersist()
        mark("stage_write")
        store.write_meta(
            {
                "n_docs": n_docs,
                "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
                "sum_dl": sum_dl,
                "shard_range": shard_range,
                "n_partitions": n_partitions,
                "n_shards": n_shards_eff,
                "block_size": BLOCK_SIZE,
                "positions": bool(positions),
                "phase": "staged",
            }
        )
    meta = store.read_meta()

    # ---- SPIMI over pending partitions (resume = skip committed pids) ----
    spimi_pending(spark, store, int(meta["shard_range"]), n_partitions,
                  fail_pids=frozenset(fail_partitions))
    mark("spimi")

    # ---- merge/compact fragments -> term_stats + segments (next epoch) ----
    # written into fresh epoch dirs, then the meta pointer flips atomically:
    # a reader concurrent with this merge serves the previous snapshot.
    frags = (
        spark.read.schema(SEGMENT_SCHEMA_DDL)
        .option("pathGlobFilter", "fragment-*.parquet")
        .parquet(store.fragments_dir)
    )
    next_ep = int(meta.get("epoch") or 0) + 1
    (
        frags.groupBy("term")
        .agg(F.sum("n").alias("df"))
        .write.mode("overwrite")
        .parquet(store.epoch_path("term_stats", next_ep))
    )
    mark("term_stats")
    shard_range = int(meta["shard_range"])
    compacted = _compact_segments(frags, shard_range)
    write_segments(compacted, int(meta["n_partitions"]),
                   store.epoch_path("segments", next_ep))
    mark("compact_write")
    prev_live = (meta.get("segment_dirs") or []) + (meta.get("term_stats_dirs") or [])
    meta.update({
        "phase": "built",
        "epoch": next_ep,
        "segment_dirs": [f"segments-{next_ep:06d}"],
        "term_stats_dirs": [f"term_stats-{next_ep:06d}"],
        "compacted_pids": sorted(store.done_partitions()),
        "retired_dirs": prev_live,
    })
    meta["stage_sec"] = {**meta.get("stage_sec", {}), **stage_sec}
    store.write_meta(meta)
    store.gc_dirs()
    return store


def spimi_pending(spark: SparkSession, store: IndexStore, shard_range: int,
                  n_partitions: int,
                  fail_pids: frozenset[int] = frozenset(),
                  pending: DataFrame | None = None) -> bool:
    """Run the SPIMI stage over every staged pid WITHOUT a committed
    manifest (resume/repair/build all share this exact pipeline — a
    drifted copy silently diverges the repair path from the build path,
    hence ONE implementation). Returns True iff any pid was pending."""
    staged = spark.read.parquet(store.staged_path)
    if pending is None:
        done = store.done_partitions()
        pending = staged
        if done:
            pending = staged.filter(~F.col("pid").isin(sorted(done)))
    if pending.isEmpty():
        return False
    # the store-level positions flag (set once at build) decides whether
    # THIS run emits pos_bin — builds, appends and repairs all agree
    spimi_fn = _make_spimi_fn(store.root, shard_range, fail_pids,
                              positions=store.has_positions())
    (
        pending.select("pid", "docid", "dl", "text")
        .repartition(n_partitions, "pid")
        .sortWithinPartitions("pid", "docid")
        .mapInArrow(spimi_fn, MANIFEST_SCHEMA_DDL)
        .count()  # execute; manifests + fragments are the real output
    )
    return True


def _mask_fragments(frags: DataFrame, dead: DataFrame,
                    shard_range: int,
                    n_tasks: int | None = None) -> DataFrame:
    """Drop tombstoned docids from fragment blocks (the purge half of
    index/deletes.py — compaction folds deletes into the new segments).

    The dead set rides the SAME shard partitioning as the blocks it
    edits, packed per shard with the posting codec (wand._sideband_rows
    — never an unbounded broadcast), and sorts FIRST within each task
    ("\\x00deny" < every analyzer term), so the kernel sees the complete
    deny set before any block. Blocks whose [min_docid, max_docid] range
    contains no dead docid — the overwhelming majority under realistic
    delete rates — pass through with a vectorized binary-search check
    and ZERO decode/encode work; only intersecting blocks re-encode.
    Emptied blocks vanish (term df then falls out of the post-mask
    groupBy naturally)."""
    from visionsearch_spark.index.codec import (
        decode_docids,
        decode_varint,
        encode_docids,
        encode_varint,
    )
    from visionsearch_spark.query.wand import DENY_TERM, _sideband_rows

    in_cols = ["term", "min_docid", "max_docid", "n", "docids_bin",
               "tfs_bin", "dls_bin", "max_tf", "min_dl", "pos_bin"]
    side = _sideband_rows(dead.select("docid"), shard_range, DENY_TERM) \
        .select(
            "term",
            F.lit(None).cast("long").alias("min_docid"),
            F.lit(None).cast("long").alias("max_docid"),
            "n", "docids_bin", "tfs_bin", "dls_bin", "max_tf", "min_dl",
            F.lit(None).cast("binary").alias("pos_bin"),
            "shard",
        )
    tagged = frags.select(
        *in_cols,
        (F.col("min_docid") / F.lit(shard_range)).cast("long").alias("shard"),
    ).unionByName(side)

    def mask_runs(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        deny_parts: list[np.ndarray] = []
        deny: np.ndarray | None = None
        for batch in batches:
            pdf = batch.to_pandas()
            is_deny = (pdf["term"] == DENY_TERM).to_numpy()
            if is_deny.any():
                for row in pdf[is_deny].itertuples(index=False):
                    deny_parts.append(decode_docids(row.docids_bin, row.n))
                pdf = pdf[~is_deny]
            if not len(pdf):
                continue
            if deny is None:  # sort order: all deny rows precede blocks
                deny = (np.unique(np.concatenate(deny_parts))
                        if deny_parts else np.empty(0, dtype=np.int64))
            mins = pdf["min_docid"].to_numpy(dtype=np.int64)
            maxs = pdf["max_docid"].to_numpy(dtype=np.int64)
            if deny.size:
                lo = np.searchsorted(deny, mins)
                hit = (lo < deny.size) & (
                    deny[np.minimum(lo, deny.size - 1)] <= maxs
                )
            else:
                hit = np.zeros(len(pdf), dtype=bool)
            clean = pdf[~hit][in_cols]
            rows: list[tuple] = []
            for row in pdf[hit].itertuples(index=False):
                d = decode_docids(row.docids_bin, row.n)
                pos = np.minimum(np.searchsorted(deny, d), deny.size - 1)
                keep = deny[pos] != d
                if not keep.any():
                    continue  # block fully deleted
                if keep.all():
                    rows.append(tuple(getattr(row, c) for c in in_cols))
                    continue
                d2 = d[keep]
                tf_all = decode_varint(row.tfs_bin, row.n).astype(np.int64)
                tf = tf_all[keep]
                dl = decode_varint(row.dls_bin, row.n)[keep]
                pos_bytes = row.pos_bin
                if pos_bytes is not None:
                    # positions are per-doc-reset deltas: dropping whole
                    # docs' spans keeps the remaining stream valid
                    # (every kept doc still starts with its absolute)
                    deltas = decode_varint(pos_bytes, int(tf_all.sum()))
                    pos_bytes = encode_varint(
                        deltas[np.repeat(keep, tf_all)]
                    )
                rows.append((
                    row.term, int(d2[0]), int(d2[-1]), int(d2.size),
                    encode_docids(d2),
                    encode_varint(tf.astype(np.uint64)),
                    encode_varint(dl.astype(np.uint64)),
                    int(tf.max()), int(dl.min()),
                    pos_bytes,
                ))
            tables = []
            if len(clean):
                tables.append(pa.Table.from_pandas(
                    clean.reset_index(drop=True),
                    schema=_FRAGMENT_PA_SCHEMA, preserve_index=False,
                ))
            if rows:
                tables.append(pa.Table.from_arrays(
                    [pa.array([r[i] for r in rows], type=f.type)
                     for i, f in enumerate(_FRAGMENT_PA_SCHEMA)],
                    schema=_FRAGMENT_PA_SCHEMA,
                ))
            for tbl in tables:
                yield from tbl.to_batches(max_chunksize=65536)

    n_tasks = n_tasks or frags.sparkSession.sparkContext.defaultParallelism
    return (
        tagged.repartition(n_tasks, "shard")
        .sortWithinPartitions("term", "min_docid")
        .mapInArrow(mask_runs, SEGMENT_SCHEMA_DDL)
    )


def compact_store(spark: SparkSession, root: str,
                  n_partitions: int | None = None) -> IndexStore:
    """Full compaction (the LSM maintenance job): merge ALL fragments into
    ONE fresh segments/term_stats dir pair and flip the live-dir lists to
    it atomically. Appends are O(delta) (incremental.py) and accumulate
    one small dir each; run this periodically to restore single-dir scan
    locality. Superseded dirs are retired for one flip (in-flight
    readers), then GC'd."""
    store = IndexStore(root)
    meta = store.read_meta()
    n_partitions = n_partitions or int(meta["n_partitions"])
    for path in store.orphan_fragments():
        os.remove(path)  # uncommitted crash leftovers; staged re-SPIMI covers them
    # repair BEFORE merging: staged pids without a committed manifest
    # (crashed append/build) must be re-SPIMI'd here, not silently
    # dropped — a direct compact_store call on a crashed store would
    # otherwise flip phase to 'built' with those docs unsearchable
    # (r3 review finding; the orphan sweep above removed their torn
    # fragments, this regenerates them from the staged source of truth).
    repaired = spimi_pending(
        spark, store, int(meta["shard_range"]), n_partitions
    )
    if repaired or meta.get("phase") == "appending":
        # stats in meta are stale after a crashed append — staged is the
        # source of truth, same rule as _finish_append's repair. The
        # phase check matters on its own: a crash AFTER every SPIMI
        # manifest committed but BEFORE the meta flip leaves nothing
        # pending yet stats still pre-append.
        stats = spark.read.parquet(store.staged_path).agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl")
        ).collect()[0]
        n_docs = int(stats["n"])
        sum_dl = int(stats["sum_dl"] or 0)
        meta.update({
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        })
    frags = (
        spark.read.schema(SEGMENT_SCHEMA_DDL)
        .option("pathGlobFilter", "fragment-*.parquet")
        .parquet(store.fragments_dir)
    )
    # FOLD TOMBSTONES (index/deletes.py): fragments are immutable and
    # still hold every deleted doc's postings, so EVERY compaction must
    # mask with the union of pending + applied tombstones — pending ones
    # leave the query-time deny set at this flip (they're now physically
    # absent from the live segments and excluded from stats), applied
    # ones stay recorded forever to keep future compactions honest.
    from visionsearch_spark.index.deletes import (
        all_tombstones,
        live_corpus_stats,
    )

    dead = all_tombstones(spark, store)
    if dead is not None:
        frags = _mask_fragments(frags, dead, int(meta["shard_range"]))
        n_docs, sum_dl = live_corpus_stats(spark, store,
                                           include_pending=False)
        meta.update({
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        })
    next_ep = int(meta.get("epoch") or 0) + 1
    frags.groupBy("term").agg(F.sum("n").alias("df")).write.mode(
        "overwrite"
    ).parquet(store.epoch_path("term_stats", next_ep))
    compacted = _compact_segments(frags, int(meta["shard_range"]))
    write_segments(compacted, n_partitions,
                   store.epoch_path("segments", next_ep))
    prev_live = [os.path.basename(p) for p in store.segment_paths()]         + [os.path.basename(p) for p in store.term_stats_paths()]
    meta.update({
        "epoch": next_ep,
        "segment_dirs": [f"segments-{next_ep:06d}"],
        "term_stats_dirs": [f"term_stats-{next_ep:06d}"],
        "compacted_pids": sorted(store.done_partitions()),
        "retired_dirs": prev_live,
        "phase": "built",
    })
    if meta.get("tombstone_dirs"):
        meta["applied_tombstone_dirs"] = (
            (meta.get("applied_tombstone_dirs") or [])
            + meta["tombstone_dirs"]
        )
        meta["tombstone_dirs"] = []
    store.write_meta(meta)
    store.gc_dirs()
    from visionsearch_spark.query.wand import invalidate_term_df_memo

    invalidate_term_df_memo(store.root)
    return store


def write_segments(compacted, n_partitions: int, path: str,
                   blooms: bool = True) -> None:
    """THE segment write: shard-hash partitioned, key-sorted, and pinned
    to one file per partition. ONE FILE PER PARTITION is a correctness
    invariant, not a perf preference — the query fast path assigns whole
    FILES to tasks and relies on each file holding complete shards
    (PLANS.md §17); a deployment-level maxRecordsPerFile would silently
    split a shard's term blocks across files and turn per-task sums
    partial. One shared implementation (build, compact, append) so the
    invariant cannot drift (the spimi_pending rule, CLAUDE.md r3).

    WITHIN each file rows sort TERM-FIRST with bounded row groups (8 MB):
    row-group statistics on the term column then cover narrow term
    ranges, so a query's term-IN filter PRUNES row groups instead of
    merely post-filtering rows — shard-first sorting made every row
    group span the whole term alphabet and pruning a no-op. File
    completeness (all of a shard's rows in one file) comes from the
    partitioning alone; the in-file order is free to serve the read
    path. Trade-off: LocalSearcher(shards=...) per-shard loads scan more
    row groups — a once-per-process load, vs pruning on every query.

    RANGE-partitioned by shard, not hash: a RangePartitioner keeps equal
    keys together (shard-complete files hold), fills EVERY partition
    (hashing n shard keys into n buckets left ~1/e of the files empty —
    empty files capped the file-aligned path's parallelism), and
    balances row counts via sampling. Range boundaries re-sample per
    job, but this is a single write action (the CLAUDE.md
    repartitionByRange gotcha concerns branching two actions)."""
    (
        compacted.repartitionByRange(n_partitions, "shard")
        .sortWithinPartitions("term", "shard", "min_docid")
        .write.option("maxRecordsPerFile", 0)
        .option("parquet.block.size", 8 * 1024 * 1024)
        .mode("overwrite")
        .parquet(path)
    )
    # per-file term Bloom sidecars (planner file pruning; index/bloom.py)
    # written by the same call for builds and compactions; APPENDS pass
    # blooms=False (r6, VERDICT r5 #6) — paying the sidecar scan on every
    # O(delta) append taxed ingest ~5% for pruning that matters on
    # LONG-LIVED many-file stores, which the next compaction (re)covers
    # in full. A file with no sidecar is simply never pruned
    # (wand._bloom_prune keeps it — never wrong results), same rule as a
    # crash between the two writes.
    if blooms:
        from visionsearch_spark.index.bloom import write_segment_blooms

        write_segment_blooms(compacted.sparkSession, path)


def _compact_segments(frags: DataFrame, shard_range: int,
                      n_tasks: int | None = None) -> DataFrame:
    """Re-chunk per (term, shard): fragment blocks of one term never overlap
    in docid and never cross shard boundaries, so compaction is
    concat-in-min_docid-order + re-chunk to BLOCK_SIZE (a metadata-level
    merge, never a posting-level merge sort).

    Implemented as mapInArrow over hash(term, shard)-partitioned,
    key-sorted rows: groups are contiguous runs, so there is no per-group
    scheduling/pandas overhead (applyInPandas costs ~3 ms per group — ruinous
    for vocab × shards tiny groups). Run boundaries are detected with one
    vectorized pass (no per-row Python).

    Block metadata (max_tf, min_dl) is avgdl-independent, so single-block
    runs — the Zipf tail of rare terms — ALWAYS pass through with zero
    decode/encode work (fresh builds and appends alike); only multi-block
    runs (terms present in several build partitions) hit the merge path.
    """
    from visionsearch_spark.index.codec import (
        decode_docids,
        decode_varint,
        encode_docids,
        encode_varint,
    )

    out_fields = [
        ("term", pa.string()), ("min_docid", pa.int64()),
        ("max_docid", pa.int64()), ("n", pa.int32()),
        ("docids_bin", pa.binary()), ("tfs_bin", pa.binary()),
        ("dls_bin", pa.binary()), ("max_tf", pa.int32()),
        ("min_dl", pa.int32()), ("pos_bin", pa.binary()),
        ("shard", pa.int64()),
    ]
    out_pa_schema = pa.schema(out_fields)
    in_cols = ["term", "min_docid", "max_docid", "n", "docids_bin",
               "tfs_bin", "dls_bin", "max_tf", "min_dl", "pos_bin",
               "shard"]

    def compact_runs(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pdfs = [b.to_pandas() for b in batches]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)[in_cols]
        terms = pdf["term"].to_numpy()
        shards = pdf["shard"].to_numpy()
        newrun = np.ones(len(pdf), dtype=bool)
        if len(pdf) > 1:
            newrun[1:] = (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
        starts = np.flatnonzero(newrun)
        ends = np.concatenate((starts[1:], [len(pdf)]))
        singleton = (ends - starts) == 1
        passthrough = pdf.iloc[starts[singleton]]
        work = zip(starts[~singleton], ends[~singleton])

        mins = pdf["min_docid"].to_numpy()
        ns = pdf["n"].to_numpy()
        dbins = pdf["docids_bin"].to_numpy()
        tbins = pdf["tfs_bin"].to_numpy()
        lbins = pdf["dls_bin"].to_numpy()
        pbins = pdf["pos_bin"].to_numpy()
        rows: list[tuple] = []
        for s, e in work:
            idx = list(range(s, e))
            idx.sort(key=lambda i: mins[i])
            docids = np.concatenate([decode_docids(dbins[i], ns[i]) for i in idx])
            per_tf = [decode_varint(tbins[i], ns[i]).astype(np.int64)
                      for i in idx]
            tfs = np.concatenate(per_tf)
            dls = np.concatenate(
                [decode_varint(lbins[i], ns[i]) for i in idx]
            ).astype(np.int64)
            # per-doc-reset position DELTAS concatenate and re-slice at
            # doc boundaries without touching absolutes; a run with any
            # positionless block degrades the whole run to NULL (can only
            # happen on mixed legacy data — flag-built stores are uniform)
            pos_deltas = None
            if all(pbins[i] is not None for i in idx):
                pos_deltas = np.concatenate(
                    [decode_varint(pbins[i], int(per_tf[j].sum()))
                     for j, i in enumerate(idx)]
                )
            occ = np.concatenate(([0], np.cumsum(tfs)))
            term, shard = terms[s], int(shards[s])
            for b0 in range(0, docids.size, BLOCK_SIZE):
                b1 = min(b0 + BLOCK_SIZE, docids.size)
                rows.append(
                    (
                        term, int(docids[b0]), int(docids[b1 - 1]),
                        int(b1 - b0),
                        encode_docids(docids[b0:b1]),
                        encode_varint(tfs[b0:b1].astype(np.uint64)),
                        encode_varint(dls[b0:b1].astype(np.uint64)),
                        int(tfs[b0:b1].max()), int(dls[b0:b1].min()),
                        (encode_varint(pos_deltas[occ[b0]:occ[b1]])
                         if pos_deltas is not None else None),
                        shard,
                    )
                )
        tables = []
        if len(passthrough):
            tables.append(pa.Table.from_pandas(
                passthrough.reset_index(drop=True), schema=out_pa_schema,
                preserve_index=False,
            ))
        if rows:
            tables.append(pa.Table.from_arrays(
                [pa.array([r[i] for r in rows], type=f[1])
                 for i, f in enumerate(out_fields)],
                schema=out_pa_schema,
            ))
        for tbl in tables:
            yield from tbl.to_batches(max_chunksize=65536)

    n_tasks = n_tasks or frags.sparkSession.sparkContext.defaultParallelism
    return (
        frags.withColumn(
            "shard", (F.col("min_docid") / F.lit(shard_range)).cast("long")
        )
        .repartition(n_tasks, "term", "shard")
        .sortWithinPartitions("term", "shard", "min_docid")
        .mapInArrow(compact_runs, SEGMENT_SCHEMA_DDL + ", shard long")
    )
