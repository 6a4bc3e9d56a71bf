"""Multimodal column plumbing: binary media payloads + typed metadata.

The reference handles images as base64 blobs with size caps and MIME
detection (`/root/reference/visionsearch/common_utils/generative_ai/vlm/base.py:185-208`,
upload cap `api/routers/ollama/queries/ollama_api.py:293-316`) and feeds
them to GPU encoders (`embedding/clip/core.py:16-32`). In a Spark pipeline
the media itself is an opaque `binary` column; everything around it —
schema, size guards, format sniffing, batch shape, partition sizing — is
engine work and is REAL here. The pixel/sample decoding itself needs
image/audio libraries that are not in this container, so the decode kernel
is a clearly marked stub (`NotImplementedError` or the deterministic fake)
behind a stable UDF signature; swapping in PIL/torchaudio later changes
ONE function.

Design rules enforced here:
  * media rows are big -> repartition so ~`target_batch_bytes` per Arrow
    batch, and never groupBy on the binary column itself;
  * metadata (mime, width/height, duration) lives in ordinary columns so
    predicates prune without touching bytes (parquet column pruning);
  * decode/feature kernels run via mapInPandas with bounded batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

MAGIC = {  # format sniffing on leading bytes — pure column ops
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"GIF8": "image/gif",
}


def size_guard(media: DataFrame, max_mb: float = 10.0,
               payload_col: str = "payload") -> DataFrame:
    """The reference's 10MB upload cap (`ollama_api.py:303-316`) as a
    pushable predicate on the length column (bytes never read)."""
    return media.filter(F.length(payload_col) <= int(max_mb * 1024 * 1024))


def sniff_mime(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-byte MIME detection via substring on the binary column."""
    col = F.col(payload_col)
    expr = F.lit("application/octet-stream")
    for magic, mime in MAGIC.items():
        expr = F.when(
            F.expr(f"substring({payload_col}, 1, {len(magic)})") == F.lit(magic),
            F.lit(mime),
        ).otherwise(expr)
    return media.withColumn("sniffed_mime", expr)


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB — the real implementation needs PIL/opencv (not in this
    container). Deterministic fake: a 4x4 float32 'image' derived from the
    payload bytes so downstream shape/statistics plumbing is testable."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return (arr.astype(np.float32) / 255.0).reshape(4, 4, 4)


def extract_features(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas.

    The Arrow batch shape (bounded rows, whole-column numpy kernels, no
    per-row Python beyond the decode call) is the production pattern; only
    `decode_image_stub` is fake. Output: (media_id, features:array<float>).
    """
    out_ddl = "media_id long, features array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                img = decode_image_stub(bytes(payload))
                # deterministic pooled 'embedding' of the fake image
                flat = img.reshape(-1)
                reps = int(np.ceil(feature_dim / flat.size))
                feats.append(np.tile(flat, reps)[:feature_dim].tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    src = media.select("media_id", "payload")
    return src.mapInPandas(kernel, out_ddl)


def byte_histogram_features(media: DataFrame, n_bins: int = 64,
                            normalize: bool = True) -> DataFrame:
    """REAL (no stub) feature extraction over opaque binary payloads: a
    byte-value histogram per payload, vectorized with one np.bincount over
    the whole Arrow batch (payload boundaries via repeat + reshape of
    per-row offsets — no per-byte Python). Content-type-agnostic features
    good for corruption detection, near-dup triage on media blobs, and
    MIME clustering before any decoder runs; normalize=True gives a
    distribution (sums to 1) so payload size drops out. n_bins must
    divide 256. Output: (media_id, features:array<float>)."""
    if 256 % n_bins != 0:
        raise ValueError(f"n_bins must divide 256, got {n_bins}")
    shrink = 256 // n_bins
    out_ddl = "media_id long, features array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # null payloads get null features — one bad row must never
            # kill a corpus-sized build (same policy as _pq_encode_udf)
            payloads = pdf["payload"].tolist()
            valid = [i for i, p in enumerate(payloads) if p is not None]
            feats: list = [None] * len(payloads)
            if valid:
                blobs = [np.frombuffer(bytes(payloads[i]), dtype=np.uint8)
                         for i in valid]
                lens = np.array([b.size for b in blobs], dtype=np.int64)
                flat = (np.concatenate(blobs) if lens.sum()
                        else np.array([], dtype=np.uint8))
                # one bincount over row_idx*n_bins + bin — whole-batch kernel
                row_idx = np.repeat(np.arange(len(blobs)), lens)
                keys = row_idx * n_bins + (flat.astype(np.int64) // shrink)
                hist = np.bincount(
                    keys, minlength=len(blobs) * n_bins
                ).reshape(len(blobs), n_bins).astype(np.float32)
                if normalize:
                    denom = np.maximum(lens, 1).astype(np.float32)[:, None]
                    hist = hist / denom
                for row, i in enumerate(valid):
                    feats[i] = hist[row]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.select("media_id", "payload").mapInPandas(kernel, out_ddl)


def partition_by_bytes(media: DataFrame, target_mb: float = 64.0,
                       payload_col: str = "payload",
                       size_col: str | None = "n_bytes") -> DataFrame:
    """The 'media rows are big' design rule as an operator: repartition
    so each partition carries ~target_mb of payload BYTES (row-count
    partitioning puts 10 4K-frames or 10 thumbnails in a task alike —
    byte skew, OOM on the big side, idle on the small). One bounded agg
    (a single sum to the driver) sizes the round-robin; sizes come from
    the metadata column when present (parquet reads ONLY that column —
    bytes untouched at plan time), else F.length(payload)."""
    col = (F.col(size_col) if size_col and size_col in media.columns
           else F.length(payload_col))
    total = media.agg(F.sum(col).alias("b")).collect()[0]["b"] or 0
    n_parts = max(1, -(-int(total) // int(target_mb * 1024 * 1024)))
    return media.repartition(n_parts)


def resize_images(media: DataFrame, width: int = 2, height: int = 2
                  ) -> DataFrame:
    """Image resize over binary payloads — decode is the marked STUB,
    the RESIZE ITSELF is real (vectorized nearest-neighbor index math,
    the same gather a PIL-backed kernel would do after Image.open).
    Output: (media_id, height, width, pixels array<float>) with pixels
    row-major RGBA-flattened — the shape contract a downstream
    embedder's preprocessing consumes. Swapping in PIL later changes
    only decode_image_stub."""
    out_ddl = "media_id long, height int, width int, pixels array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pixels = []
            for payload in pdf["payload"]:
                if payload is None:
                    pixels.append(None)
                    continue
                img = decode_image_stub(bytes(payload))  # (H, W, C)
                h0, w0, _c = img.shape
                # nearest-neighbor gather: real resize arithmetic
                ys = np.minimum((np.arange(height) * h0) // height, h0 - 1)
                xs = np.minimum((np.arange(width) * w0) // width, w0 - 1)
                pixels.append(img[np.ix_(ys, xs)].reshape(-1).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "height": height,
                "width": width,
                "pixels": pixels,
            })

    return media.select("media_id", "payload").mapInPandas(kernel, out_ddl)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling PLUMBING: expands (media_id, n_frames) into
    (media_id, frame_idx) rows JVM-side; the actual frame grab is the
    stubbed decode. n_frames must be a metadata column (never derived by
    reading payload at plan time)."""
    if "n_frames" not in media.columns:
        raise ValueError("frame_sample_plan requires an n_frames metadata column")
    # F.sequence(0, x) DESCENDS for x < 0: n_frames=0 would throw
    # "Illegal sequence boundaries" at runtime — zero-frame media yields
    # zero rows instead (same guard as shingles()).
    idxs = F.when(
        F.col("n_frames") > 0,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return media.select("media_id", F.explode(idxs).alias("frame_idx"))
