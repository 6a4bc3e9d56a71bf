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
                        n, docids_bin, tfs_bin, dls_bin, block_max)

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
from dataclasses import dataclass

SEGMENT_SCHEMA_DDL = (
    "term string, min_docid long, max_docid long, n int, "
    "docids_bin binary, tfs_bin binary, dls_bin binary, block_max double"
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

    # ---- epoch pointer: atomic snapshot swap (Iceberg-style contract) ----
    # segments/term_stats live in immutable per-epoch directories
    # (segments-000001/, ...). Writers build the NEXT epoch's directories,
    # then flip meta.json (os.replace = atomic) so readers resolve either
    # the old snapshot or the new one — never a torn table. The previous
    # epoch is retained for readers that resolved the pointer just before
    # the flip; older epochs are GC'd.

    def current_epoch(self) -> int | None:
        if not os.path.exists(self.meta_path):
            return None
        ep = self.read_meta().get("epoch")
        return None if ep is None else int(ep)

    def _epoch_path(self, prefix: str) -> str:
        ep = self.current_epoch()
        name = prefix if ep is None else f"{prefix}-{ep:06d}"
        return os.path.join(self.root, name)

    def epoch_path(self, prefix: str, epoch: int) -> str:
        return os.path.join(self.root, f"{prefix}-{epoch:06d}")

    def gc_epochs(self, current: int) -> None:
        """Drop epoch dirs older than current-1 (keep current + previous;
        the previous covers readers that resolved the pointer pre-flip),
        plus legacy un-epoched dirs once two epoched snapshots exist."""
        import re
        import shutil

        pat = re.compile(r"^(segments|term_stats)-(\d{6})$")
        for name in os.listdir(self.root):
            m = pat.match(name)
            if m and int(m.group(2)) < current - 1:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
        if current >= 2:
            for prefix in ("segments", "term_stats"):
                p = os.path.join(self.root, prefix)
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)

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

    def manifests(self) -> list[dict]:
        out = []
        if os.path.isdir(self.manifest_dir):
            for name in sorted(os.listdir(self.manifest_dir)):
                if name.endswith(".json"):
                    with open(os.path.join(self.manifest_dir, name)) as f:
                        out.append(json.load(f))
        return out
