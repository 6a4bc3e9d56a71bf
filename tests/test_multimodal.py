"""Multimodal plumbing: schema, size guard, MIME sniffing, batch feature
extraction (decode kernel is a documented deterministic stub)."""

from __future__ import annotations

import numpy as np
import pytest

from visionsearch_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_stub,
    extract_features,
    frame_sample_plan,
    size_guard,
    sniff_mime,
)

ROWS = [
    (0, "image/png", b"\x89PNG\r\n" + b"a" * 100, 106),
    (1, "image/jpeg", b"\xff\xd8\xff\xe0" + b"b" * 50, 54),
    (2, "audio/wav", b"RIFF" + b"c" * 2_000_000, 2_000_004),
    (3, "application/octet-stream", b"zzzz" + b"d" * 10, 14),
]


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(ROWS, MEDIA_SCHEMA)


def test_size_guard(media):
    assert size_guard(media, max_mb=1.0).count() == 3
    assert size_guard(media, max_mb=10.0).count() == 4


def test_sniff_mime(media):
    got = {r["media_id"]: r["sniffed_mime"] for r in sniff_mime(media).collect()}
    assert got == {0: "image/png", 1: "image/jpeg", 2: "audio/wav",
                   3: "application/octet-stream"}


def test_decode_stub_deterministic():
    img = decode_image_stub(b"\x89PNG" + b"a" * 100)
    assert img.shape == (4, 4, 4)
    assert img.dtype == np.float32
    np.testing.assert_array_equal(img, decode_image_stub(b"\x89PNG" + b"a" * 100))


def test_extract_features_shape(media):
    rows = extract_features(media, feature_dim=16).collect()
    assert len(rows) == 4
    for r in rows:
        assert len(r["features"]) == 16
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in
             extract_features(media, feature_dim=16).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame(
        [(0, 100), (1, 31), (2, 1)], "media_id long, n_frames int"
    )
    got = {}
    for r in frame_sample_plan(vids, every_n=30).collect():
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(got[0]) == [0, 30, 60, 90]
    assert sorted(got[1]) == [0, 30]
    assert sorted(got[2]) == [0]


def test_frame_sample_requires_metadata(spark):
    vids = spark.createDataFrame([(0,)], "media_id long")
    with pytest.raises(ValueError):
        frame_sample_plan(vids)


def test_frame_sample_zero_frames(spark):
    """n_frames=0 must yield zero rows, not 'Illegal sequence boundaries'
    (F.sequence(0, -1) descends — r1 ADVICE)."""
    from visionsearch_spark.operators.multimodal import frame_sample_plan

    media = spark.createDataFrame(
        [(1, 90), (2, 0), (3, 1)], "media_id long, n_frames int"
    )
    got = {
        (r["media_id"], r["frame_idx"])
        for r in frame_sample_plan(media, every_n=30).collect()
    }
    assert got == {(1, 0), (1, 30), (1, 60), (3, 0)}


def test_byte_histogram_features(media, spark):
    """Whole-batch bincount == per-row numpy replica; normalized rows sum
    to 1; empty payloads give all-zero features; n_bins validated."""
    from visionsearch_spark.operators.multimodal import byte_histogram_features

    got = {
        r["media_id"]: np.array(r["features"], dtype=np.float32)
        for r in byte_histogram_features(media, n_bins=16).collect()
    }
    for mid, _mime, payload, _n in ROWS:
        arr = np.frombuffer(payload, dtype=np.uint8)
        want = np.bincount(arr // 16, minlength=16).astype(np.float32)
        want /= max(len(arr), 1)
        assert np.allclose(got[mid], want, atol=1e-7), mid
        assert abs(float(got[mid].sum()) - 1.0) < 1e-5, mid

    empty = spark.createDataFrame(
        [(9, "application/octet-stream", b"", 0)], MEDIA_SCHEMA
    )
    feats = byte_histogram_features(empty, n_bins=16).collect()[0]["features"]
    assert list(feats) == [0.0] * 16

    with pytest.raises(ValueError, match="divide 256"):
        byte_histogram_features(media, n_bins=17)


def test_byte_histogram_null_payload_yields_null_features(spark):
    """A null payload must not kill the job (same one-bad-row policy as
    the PQ encoder): the row comes through with features = NULL, valid
    rows unaffected."""
    import pyspark.sql.types as T

    from visionsearch_spark.operators.multimodal import (
        byte_histogram_features,
    )

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])
    df = spark.createDataFrame(
        [(0, b"\x00\x01\x02\x03"), (1, None), (2, b"\xff" * 8)], schema
    )
    got = {r["media_id"]: r["features"]
           for r in byte_histogram_features(df, n_bins=4).collect()}
    assert got[1] is None
    assert got[0] is not None and abs(sum(got[0]) - 1.0) < 1e-6
    assert got[2] is not None and got[2][3] == pytest.approx(1.0)


def test_resize_images_nearest_neighbor_matches_numpy(spark, media):
    """The resize math is REAL (only the decode is fake): output pixels
    equal a numpy nearest-neighbor gather over the same fake decode;
    null payloads give null pixels."""
    from visionsearch_spark.operators.multimodal import (
        decode_image_stub,
        resize_images,
    )

    MEDIA_SCHEMA_NULLABLE = ("media_id long, mime string, "
                             "payload binary, n_bytes long")

    import pandas as pd

    media_df = spark.createDataFrame(
        pd.DataFrame(
            [(i, m, p, n) for i, m, p, n in
             [*[tuple(r) for r in media.collect()], (9, "x", None, 0)]],
            columns=["media_id", "mime", "payload", "n_bytes"],
        ),
        MEDIA_SCHEMA_NULLABLE,
    )
    got = {r["media_id"]: r for r in
           resize_images(media_df, width=2, height=3).collect()}
    rows = media_df.select("media_id", "payload").collect()
    assert set(got) == {r["media_id"] for r in rows}
    for r in rows:
        out = got[r["media_id"]]
        assert (out["height"], out["width"]) == (3, 2)
        if r["payload"] is None:
            assert out["pixels"] is None
            continue
        img = decode_image_stub(bytes(r["payload"]))
        h0, w0, _ = img.shape
        ys = np.minimum((np.arange(3) * h0) // 3, h0 - 1)
        xs = np.minimum((np.arange(2) * w0) // 2, w0 - 1)
        exp = img[np.ix_(ys, xs)].reshape(-1)
        assert np.allclose(out["pixels"], exp)


def test_partition_by_bytes_sizes_by_payload(spark):
    """Byte-targeted partitioning: partition count tracks total payload
    bytes / target, rows survive intact, and the plan reads only the
    size column when metadata is present."""
    from visionsearch_spark.operators.multimodal import partition_by_bytes

    from pyspark.sql import functions as F

    rows = [(i, b"x" * (256 * 1024)) for i in range(40)]  # 10 MB total
    df = spark.createDataFrame(rows, "media_id long, payload binary") \
        .withColumn("n_bytes", F.length("payload"))
    out = partition_by_bytes(df, target_mb=2.0)
    assert out.rdd.getNumPartitions() == 5  # 10 MB / 2 MB
    assert out.count() == 40
    # without the metadata column it falls back to length(payload)
    out2 = partition_by_bytes(df.drop("n_bytes"), target_mb=5.0)
    assert out2.rdd.getNumPartitions() == 2
    # empty frame -> 1 partition, no division by zero
    empty = spark.createDataFrame([], "media_id long, payload binary")
    assert partition_by_bytes(empty, target_mb=1.0) \
        .rdd.getNumPartitions() == 1
