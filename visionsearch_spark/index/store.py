"""IndexStore — on-disk layout + snapshot/manifest contract for the index.

Layout (Parquet-dir catalog; the same contract an Iceberg catalog would
give us — SURVEY.md §7 R4 fallback since no iceberg-spark-runtime jar is
bundled in this sandbox):

    root/
      meta.json         build parameters + corpus stats (n_docs, avgdl,
                        shard docid range R, n_partitions)
      docmap/           parquet (docid, conv_id, turn_idx, dl)
      term_stats/       parquet (term, df)
      fragments/        per-build-partition parquet, written ATOMICALLY by
                        executor tasks (tmp -> rename): fragment-{pid}.parquet
      manifest/         manifest-{pid}.json per partition — the checkpoint/
                        lineage/metrics record (north rule: postings_written,
                        terms_merged, bytes_compressed per segment)
      segments/         compacted posting blocks (term, min_docid, max_docid,
                        n, docids_bin, tfs_bin, dls_bin, max_tf, min_dl)

The fragment+manifest pair written together per partition is the
distributed analog of the reference's index+ids sidecar pair
(`/root/reference/visionsearch/common_utils/aisearch/core.py:54-56`) and its
per-item checkpointed caption sink
(`/root/reference/visionsearch/scripts/generate_captions.py:53-56,98`):
progress persisted at partition granularity, idempotent re-run, graceful
interrupt.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

# Per-block pruning metadata is (max_tf, min_dl), NOT a precomputed
# tf-weight bound: tf_weight is monotone up in tf and down in dl, so
# tf_weight(max_tf, min_dl, avgdl_now) is a valid upper bound under ANY
# current avgdl — blocks never go stale when appends shift corpus stats,
# which is what makes segments immutable across appends.
# pos_bin (nullable, r6): per-doc delta+varint token positions aligned
# with the block's postings (occurrence counts = decoded tfs_bin) —
# written only for stores built with positions=True (meta["positions"]).
# Scoring kernels never select it, so parquet column pruning keeps the
# ranked path byte-identical in cost; phrase/proximity verify reads it
# instead of re-tokenizing staged text (query/boolean.py).
SEGMENT_SCHEMA_DDL = (
    "term string, min_docid long, max_docid long, n int, "
    "docids_bin binary, tfs_bin binary, dls_bin binary, "
    "max_tf int, min_dl int, pos_bin binary"
)

MANIFEST_SCHEMA_DDL = (
    "partition_id int, status string, postings_written long, "
    "terms_merged long, bytes_compressed long, lineage string, ts string"
)


@dataclass
class IndexStore:
    root: str

    @property
    def meta_path(self) -> str:
        return os.path.join(self.root, "meta.json")

    @property
    def docmap_path(self) -> str:
        """The docmap (docid, conv_id, turn_idx, dl) is a column-pruned
        view of the staged table — parquet column pruning skips the heavy
        `text` column, so a separate materialization would only buy a
        second copy of the same bytes. Readers must select their columns."""
        return os.path.join(self.root, "staged")

    @property
    def term_stats_path(self) -> str:
        return self._epoch_path("term_stats")

    @property
    def fragments_dir(self) -> str:
        return os.path.join(self.root, "fragments")

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.root, "manifest")

    @property
    def segments_path(self) -> str:
        return self._epoch_path("segments")

    @property
    def staged_path(self) -> str:
        return os.path.join(self.root, "staged")

    # ---- snapshot pointer: atomic swap + additive appends (LSM-style) ----
    # segments/term_stats live in IMMUTABLE per-epoch directories
    # (segments-000001/, ...). meta.json's `segment_dirs`/`term_stats_dirs`
    # lists name the live set; flipping the list is one atomic os.replace,
    # so readers resolve either the old snapshot or the new one — never a
    # torn table. An APPEND adds one new dir holding only the delta's
    # blocks (O(delta) work — old dirs untouched; their (max_tf, min_dl)
    # bounds are avgdl-independent so they can't go stale). A FULL
    # COMPACTION (compact_store) replaces the whole list with one merged
    # dir; the superseded dirs are retired for one flip (covering readers
    # that resolved the pointer just before), then GC'd.

    def current_epoch(self) -> int | None:
        if not os.path.exists(self.meta_path):
            return None
        ep = self.read_meta().get("epoch")
        return None if ep is None else int(ep)

    def _live_dirs(self, key: str, prefix: str) -> list[str]:
        if not os.path.exists(self.meta_path):
            return [os.path.join(self.root, prefix)]
        meta = self.read_meta()
        dirs = meta.get(key)
        if dirs:
            return [os.path.join(self.root, d) for d in dirs]
        ep = meta.get("epoch")  # pre-list epoched store
        name = prefix if ep is None else f"{prefix}-{int(ep):06d}"
        return [os.path.join(self.root, name)]

    def segment_paths(self) -> list[str]:
        return self._live_dirs("segment_dirs", "segments")

    def term_stats_paths(self) -> list[str]:
        return self._live_dirs("term_stats_dirs", "term_stats")

    def _epoch_path(self, prefix: str) -> str:
        key = "segment_dirs" if prefix == "segments" else "term_stats_dirs"
        dirs = self._live_dirs(key, prefix)
        if len(dirs) != 1:
            raise ValueError(
                f"store has {len(dirs)} live {prefix} dirs — use the "
                f"*_paths() list API (appends make snapshots additive)"
            )
        return dirs[0]

    def epoch_path(self, prefix: str, epoch: int) -> str:
        return os.path.join(self.root, f"{prefix}-{epoch:06d}")

    def gc_dirs(self) -> None:
        """Delete segments-*/term_stats-* dirs that are neither live nor
        retired (meta `retired_dirs` — the set superseded by the LAST
        full compaction, kept one flip for in-flight readers), plus
        legacy un-suffixed dirs once suffixed snapshots exist."""
        import re
        import shutil

        meta = self.read_meta() if os.path.exists(self.meta_path) else {}
        keep = set(meta.get("segment_dirs") or []) \
            | set(meta.get("term_stats_dirs") or []) \
            | set(meta.get("retired_dirs") or [])
        ep = meta.get("epoch")
        if ep is not None and not meta.get("segment_dirs"):
            keep |= {f"segments-{int(ep):06d}", f"term_stats-{int(ep):06d}",
                     f"segments-{int(ep)-1:06d}", f"term_stats-{int(ep)-1:06d}"}
        pat = re.compile(r"^(segments|term_stats)(-\d{6})?$")
        for name in os.listdir(self.root):
            m = pat.match(name)
            if not m or name in keep:
                continue
            if m.group(2) is None and not any(k.startswith(m.group(1) + "-")
                                              for k in keep):
                continue  # legacy dir still the only snapshot
            shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    def ensure_dirs(self) -> None:
        for d in (self.root, self.fragments_dir, self.manifest_dir):
            os.makedirs(d, exist_ok=True)

    def write_meta(self, meta: dict) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(tmp, self.meta_path)

    def read_meta(self) -> dict:
        with open(self.meta_path) as f:
            return json.load(f)

    def has_positions(self) -> bool:
        """True iff this store was built with the positional-postings
        option (meta['positions']) — the flag is fixed at build time so
        every live dir is consistent; legacy stores default to False."""
        if not os.path.exists(self.meta_path):
            return False
        return bool(self.read_meta().get("positions"))

    def fragment_path(self, pid: int) -> str:
        return os.path.join(self.fragments_dir, f"fragment-{pid:05d}.parquet")

    def manifest_path(self, pid: int) -> str:
        return os.path.join(self.manifest_dir, f"manifest-{pid:05d}.json")

    def done_partitions(self) -> set[int]:
        """Partitions with a committed checkpoint (resume anti-join set)."""
        if not os.path.isdir(self.manifest_dir):
            return set()
        done = set()
        for name in os.listdir(self.manifest_dir):
            if name.startswith("manifest-") and name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    m = json.load(f)
                if m.get("status") == "done":
                    done.add(int(m["partition_id"]))
        return done

    def orphan_fragments(self) -> list[str]:
        """Fragment files whose pid has NO committed manifest — a crash
        landed between the fragment os.replace and the manifest
        os.replace in spimi.flush. They are uncommitted work (resume
        re-SPIMIs those pids from staged), so any reader that globs the
        whole fragments dir (compact_store) must drop them first or the
        orphan pid's postings end up BOTH in the compacted dir and in the
        re-SPIMI'd delta dir — doubled df and scores."""
        done = self.done_partitions()
        out = []
        if os.path.isdir(self.fragments_dir):
            for name in os.listdir(self.fragments_dir):
                m = re.match(r"fragment-(\d+)\.parquet$", name)
                if m and int(m.group(1)) not in done:
                    out.append(os.path.join(self.fragments_dir, name))
        return out

    def manifests(self) -> list[dict]:
        out = []
        if os.path.isdir(self.manifest_dir):
            for name in sorted(os.listdir(self.manifest_dir)):
                if name.endswith(".json"):
                    with open(os.path.join(self.manifest_dir, name)) as f:
                        out.append(json.load(f))
        return out
