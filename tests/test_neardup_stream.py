"""Streaming MinHash-LSH near-dup dedup vs its batch twin.

The oracle relation: band agreement is order-free, so ANY chunked
replay of a corpus through `neardup_stream` must accumulate exactly the
pair set of the batch twin `minhash_pairs_hashed` over the full corpus
— including across a checkpoint restart. State writes must stay
O(batch · family_size) per trigger — a touched band bucket rewrites its
own member list only — the same flat-deltas guard the exact streaming
dedup carries.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from visionsearch_spark.operators.dedup import minhash_pairs_hashed



def _corpus(n_families: int = 12, fam_size: int = 3, n_unique: int = 40):
    """Distinct texts with planted near-dup families: family members
    share a long token core and differ by one trailing token (high
    Jaccard); uniques share nothing."""
    rows = []
    did = 0
    for f in range(n_families):
        core = " ".join(f"fam{f}tok{j}" for j in range(12))
        for m in range(fam_size):
            rows.append((did, f"{core} variant{m}"))
            did += 1
    for u in range(n_unique):
        rows.append((did, " ".join(f"uniq{u}w{j}" for j in range(10))))
        did += 1
    return rows


def _spool(rows, spool_dir: str, n_chunks: int):
    os.makedirs(spool_dir, exist_ok=True)
    per = -(-len(rows) // n_chunks)
    for c in range(n_chunks):
        chunk = rows[c * per:(c + 1) * per]
        if not chunk:
            continue
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in chunk], pa.int64()),
                "text": pa.array([r[1] for r in chunk], pa.string()),
            }),
            os.path.join(spool_dir, f"{c:04d}.parquet"),
        )


def _run(spark, spool_dir: str, ckpt: str, out: str) -> None:
    from visionsearch_spark.streaming.neardup_stream import neardup_stream

    q = (
        neardup_stream(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1).parquet(spool_dir)
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)


def _pairs(df) -> set[tuple]:
    return {(r["id_a"], r["id_b"], r["n_match"]) for r in df.collect()}


def test_chunked_replay_equals_batch_twin(spark, tmp_path_factory):
    rows = _corpus()
    root = str(tmp_path_factory.mktemp("ndstream"))
    spool = os.path.join(root, "spool")
    _spool(rows, spool, n_chunks=4)
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    _run(spark, spool, ckpt, out)

    batch_docs = spark.createDataFrame(rows, "doc_id long, text string")
    exp = _pairs(minhash_pairs_hashed(batch_docs))
    got = _pairs(spark.read.parquet(out))
    assert exp, "planted families must produce pairs"
    assert got == exp
    # each pair exactly once despite 4 bands
    n = spark.read.parquet(out).count()
    assert n == len(got)


def test_checkpoint_restart_continues_pairing(spark, tmp_path_factory):
    """Stop after the first chunks, add more files, resume on the SAME
    checkpoint: pairs spanning the restart boundary must appear, and
    nothing is re-emitted."""
    rows = _corpus(n_families=8, fam_size=2, n_unique=20)
    root = str(tmp_path_factory.mktemp("ndrestart"))
    spool = os.path.join(root, "spool")
    half = len(rows) // 2
    _spool(rows[:half], spool, n_chunks=2)
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    _run(spark, spool, ckpt, out)
    # second half arrives later; same checkpoint
    per = -(-half // 2)
    chunk2 = rows[half:]
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in chunk2], pa.int64()),
            "text": pa.array([r[1] for r in chunk2], pa.string()),
        }),
        os.path.join(spool, "zz_late.parquet"),
    )
    _run(spark, spool, ckpt, out)

    batch_docs = spark.createDataFrame(rows, "doc_id long, text string")
    exp = _pairs(minhash_pairs_hashed(batch_docs))
    got_rows = spark.read.parquet(out)
    assert _pairs(got_rows) == exp
    assert got_rows.count() == len(exp)  # no duplicates across restart


def test_state_writes_flat(spark, tmp_path_factory):
    """Per-batch state write volume must be O(batch), not O(seen):
    constant-size all-unique batches keep every bucket near size 1, so
    per-version .delta bytes stay flat while cumulative state grows 6x
    (bucket-natural keying: a batch only rewrites the buckets it
    touches, and those buckets hold near-dup families, not corpus
    shards)."""
    root = str(tmp_path_factory.mktemp("ndstate"))
    spool = os.path.join(root, "spool")
    os.makedirs(spool)
    n_batches, bsz = 6, 200
    for i in range(n_batches):
        ids = list(range(i * bsz, (i + 1) * bsz))
        pq.write_table(
            pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(
                    [" ".join(f"b{i}d{j}w{k}" for k in range(8))
                     for j in ids], pa.string()),
            }),
            os.path.join(spool, f"{i:04d}.parquet"),
        )
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    _run(spark, spool, ckpt, out)

    # sum across ALL stateful operators (bucket state + the pair
    # dropDuplicates) — whichever id Spark assigns, total write volume
    # per version is what must stay flat
    sizes: dict[int, int] = {}
    state_root = os.path.join(ckpt, "state")
    for dirpath, _dirs, files in os.walk(state_root):
        for f in files:
            if f.endswith(".delta"):
                v = int(f.split(".")[0])
                sizes[v] = sizes.get(v, 0) + os.path.getsize(
                    os.path.join(dirpath, f))
    versions = sorted(sizes)
    assert len(versions) >= n_batches, (versions, sizes)
    first, last = sizes[versions[0]], sizes[versions[-1]]
    assert last <= first * 1.5, (first, last, sizes)
