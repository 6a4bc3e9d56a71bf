"""Store integrity checker — clean stores pass, each corruption class is
caught by its named check, warnings never fail a store."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from visionsearch_spark.index.fsck import StoreCorruption, fsck
from visionsearch_spark.index.spimi import build_index, compact_store
from visionsearch_spark.index.store import IndexStore


@pytest.fixture(scope="module")
def base_store(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fsck_base") / "store")
    return build_index(transcripts, root, n_partitions=4)


@pytest.fixture()
def store(base_store, tmp_path):
    dst = str(tmp_path / "store")
    shutil.copytree(base_store.root, dst)
    return IndexStore(dst)


def _errors(report):
    return {name: rec["errors"] for name, rec in report.items()
            if rec["errors"]}


def test_clean_store_passes(store):
    report = fsck(store.root, strict=True)
    assert not _errors(report)
    assert set(report) == {"meta", "stats", "segments", "epochs",
                           "manifests", "tombstones", "blooms"}


def test_clean_store_with_appends_deletes_and_purge_passes(
        spark, store, transcripts_pdf):
    from visionsearch_spark.index.deletes import delete_convs
    from visionsearch_spark.streaming.incremental import incremental_build

    extra = transcripts_pdf.head(20).copy()
    extra["conv_id"] = extra["conv_id"].str.replace("conv-", "fsck-")
    from visionsearch_spark.fixtures import TRANSCRIPTS_SCHEMA
    incremental_build(
        spark.createDataFrame(extra, schema=TRANSCRIPTS_SCHEMA),
        store.root, n_partitions=4)
    delete_convs(
        spark, store,
        spark.createDataFrame([("fsck-000001",)], "conv_id string"))
    assert not _errors(fsck(store.root))          # pending tombstones
    compact_store(spark, store.root)
    assert not _errors(fsck(store.root, strict=True))  # applied fold


def test_missing_listed_dir_is_fatal(store):
    d = store.segment_paths()[0]
    shutil.rmtree(d)
    report = fsck(store.root)
    assert "meta" in _errors(report)
    with pytest.raises(StoreCorruption):
        fsck(store.root, strict=True)


def test_tampered_ndocs_caught(store):
    meta = store.read_meta()
    meta["n_docs"] = int(meta["n_docs"]) + 5
    store.write_meta(meta)
    assert "stats" in _errors(fsck(store.root))


def test_shard_overlap_between_files_caught(store):
    # duplicate one segment file inside its dir: two files now cover the
    # same shard interval — the fast-path invariant violation
    d = store.segment_paths()[0]
    files = [f for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    shutil.copy(os.path.join(d, files[0]),
                os.path.join(d, "part-zz-dup.parquet"))
    report = fsck(store.root)
    assert "segments" in _errors(report)
    assert "PARTIAL" in _errors(report)["segments"][0]


def test_double_tombstone_caught(spark, store, transcripts):
    from visionsearch_spark.index.deletes import delete_convs

    conv = transcripts.select("conv_id").first()["conv_id"]
    delete_convs(
        spark, store, spark.createDataFrame([(conv,)], "conv_id string"))
    meta = store.read_meta()
    # corrupt: mark the same dir applied AND pending
    meta["applied_tombstone_dirs"] = list(meta["tombstone_dirs"])
    store.write_meta(meta)
    report = fsck(store.root)
    errs = _errors(report)
    assert "meta" in errs or "tombstones" in errs


def test_dangling_tombstone_caught(spark, store):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(store.root, "tombstones-000001")
    os.makedirs(out)
    pq.write_table(
        pa.table({"docid": pa.array([10 ** 12], pa.int64()),
                  "dl": pa.array([1], pa.int64())}),
        os.path.join(out, "part-00000.parquet"))
    meta = store.read_meta()
    meta["tombstone_dirs"] = ["tombstones-000001"]
    store.write_meta(meta)
    report = fsck(store.root)
    assert "tombstones" in _errors(report)


def test_crash_leftover_is_warning_not_error(spark, store, transcripts_pdf):
    """A staged pid without its manifest (mid-append crash) must be
    reported repairable, not corrupt."""
    from visionsearch_spark.fixtures import TRANSCRIPTS_SCHEMA
    from visionsearch_spark.streaming.incremental import incremental_build

    extra = transcripts_pdf.head(10).copy()
    extra["conv_id"] = extra["conv_id"].str.replace("conv-", "crash-")
    incremental_build(
        spark.createDataFrame(extra, schema=TRANSCRIPTS_SCHEMA),
        store.root, n_partitions=4)
    # simulate the crash: drop one manifest committed by the append
    pids = sorted(store.done_partitions())
    os.remove(store.manifest_path(pids[-1]))
    report = fsck(store.root)
    assert not _errors(report)
    assert report["manifests"]["warnings"]


def test_cli_json_output(store, capsys):
    from visionsearch_spark.index.fsck import main

    assert main([store.root, "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] is True
