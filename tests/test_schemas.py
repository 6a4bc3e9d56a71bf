"""Nested-record schemas: round-trip JSON payloads into typed structs."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from visionsearch_spark.schemas import (
    VLM_RESPONSE_SCHEMA,
    parse_vlm_response,
    response_text,
)

PAYLOAD = {
    "success": True,
    "response_text": "a cat on a mat",
    "confidence_level": "high",
    "detected_objects": [
        {"label": "cat", "confidence": 0.97,
         "bounding_box": {"x": 1.0, "y": 2.0, "w": 30.0, "h": 40.0}},
        {"label": "mat", "confidence": 0.8, "bounding_box": {"x": 0.0, "y": 0.0}},
    ],
    "extracted_text": [{"text": "EXIT", "confidence": 0.9, "language": "en"}],
    "metadata": {"model": "test", "ms": "12"},
}


def test_parse_round_trip(spark):
    df = spark.createDataFrame(
        [(0, json.dumps(PAYLOAD)), (1, "{}"), (2, "not json")],
        "id long, raw string",
    )
    out = df.select("id", parse_vlm_response("raw").alias("r")).collect()
    r0 = out[0]["r"]
    assert r0["success"] is True
    assert r0["response_text"] == "a cat on a mat"
    assert [o["label"] for o in r0["detected_objects"]] == ["cat", "mat"]
    assert r0["detected_objects"][0]["bounding_box"]["w"] == 30.0
    assert r0["metadata"]["model"] == "test"
    assert out[1]["r"]["success"] is None      # empty object -> nulls
    # malformed -> null struct or all-null fields (PERMISSIVE mode)
    r2 = out[2]["r"]
    assert r2 is None or all(v is None for v in r2.asDict().values())


def test_nested_predicate_and_projection(spark):
    df = spark.createDataFrame(
        [(0, json.dumps(PAYLOAD))], "id long, raw string"
    ).select("id", parse_vlm_response("raw").alias("r"))
    hits = df.filter(
        F.exists("r.detected_objects", lambda o: o["confidence"] > 0.9)
    )
    assert hits.count() == 1
    assert df.select(response_text_col := F.col("r.response_text")).collect()[0][0] \
        == "a cat on a mat"


def test_response_text_helper(spark):
    df = spark.createDataFrame([(json.dumps(PAYLOAD),)], "raw string")
    assert df.select(response_text("raw").alias("t")).collect()[0]["t"] \
        == "a cat on a mat"
    assert len(VLM_RESPONSE_SCHEMA.fields) == 6
