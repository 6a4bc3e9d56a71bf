"""Typed schemas for the reference's nested response/session records.

The reference passes rich nested records between components:
`VLMResponse` with arrays of structs and free-form metadata
(`/root/reference/visionsearch/common_utils/generative_ai/vlm/base.py:60-73`),
`DetectedObject` (`base.py:44-50`), `ExtractedText` (`base.py:52-57`),
`ConversationTurn`/`ChatSession` (`conversation/core/session_manager.py:46-86`).
Here they become explicit Spark StructTypes plus `from_json` parsing
helpers, so pipelines can land the same payloads as typed nested columns
(predicate pushdown on struct fields, no string re-parsing downstream).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

BOUNDING_BOX_SCHEMA = T.MapType(T.StringType(), T.DoubleType())

DETECTED_OBJECT_SCHEMA = T.StructType(
    [
        T.StructField("label", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("bounding_box", BOUNDING_BOX_SCHEMA),
    ]
)

EXTRACTED_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("language", T.StringType()),
    ]
)

VLM_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("success", T.BooleanType()),
        T.StructField("response_text", T.StringType()),
        T.StructField("confidence_level", T.StringType()),
        T.StructField("detected_objects", T.ArrayType(DETECTED_OBJECT_SCHEMA)),
        T.StructField("extracted_text", T.ArrayType(EXTRACTED_TEXT_SCHEMA)),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

CONVERSATION_TURN_SCHEMA = T.StructType(
    [
        T.StructField("turn_number", T.IntegerType()),
        T.StructField("question", T.StringType()),
        T.StructField("response", VLM_RESPONSE_SCHEMA),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def parse_vlm_response(col: Column | str) -> Column:
    """JSON string -> typed VLMResponse struct column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, VLM_RESPONSE_SCHEMA)


def response_text(col: Column | str) -> Column:
    """The indexed text field out of a raw VLMResponse JSON payload."""
    return parse_vlm_response(col).getField("response_text")
