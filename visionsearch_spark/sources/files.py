"""File sources beyond parquet: JSONL and CSV transcript readers with
schema enforcement and corrupt-row routing.

JSONL is the lingua franca of LLM corpora; CSV covers exported logs. The
reference ingests via HTTP upload + database rows (`api/routers/.../
ollama_api.py`, `conversation/models.py`); in a Spark pipeline the batch
equivalents are schema-enforced file reads where a malformed line must
never kill a 100 TB job NOR silently vanish: PERMISSIVE mode routes
rejects to a corrupt-record column, and the caller gets both frames.

Everything stays a DataFrame plan — the format readers are Spark's own
(JVM, splittable, predicate-pushdown where the format allows); this
module only pins the schema, the timestamp format, and the reject
policy so every format yields the SAME shape the parquet path yields.

CSV convention (empty-vs-null is ambiguous in the format itself):
producers must QUOTE string fields ("" = empty string, doubled quotes
per RFC 4180) and write NULL as the unquoted \\N sentinel — the reader
is pinned to that (escape='"', multiLine=true so quoted embedded
newlines survive). Two CSV caveats, both format-inherent: multiLine
reads are NOT splittable (one task per file — ship many files, or
prefer JSONL/parquet for large corpora), and with an enforced schema
Spark maps CSV columns POSITIONALLY (the header row is skipped, not
matched by name) — producers must emit columns in the transcript order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), True),
    T.StructField("turn_idx", T.IntegerType(), True),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]
REQUIRED = ("conv_id", "turn_idx", "text")


def read_transcripts(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    unpersist_handle: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read a transcripts table from `parquet`, `jsonl`, or `csv`.

    Returns (valid, rejects): `valid` has exactly the transcript schema
    (conv_id, turn_idx, role, text, tool, ts) with NULLed optional
    fields allowed; a row lands in `rejects` (original line + reason)
    when the format parser could not decode it OR a REQUIRED field
    (conv_id, turn_idx, text) is missing. Parquet is schema-carrying, so
    its rejects frame is always empty.

    Non-parquet reads must be CACHED to split on the corrupt column
    (Spark rejects filtering it from the lazily-parsed relation); pass
    `unpersist_handle` (same convention as docid.dense_ids) to receive
    the cached frame and release it after consuming both outputs —
    long-lived sessions that skip this accumulate cached partitions."""
    if format == "parquet":
        df = spark.read.parquet(path)
        absent = [c for c in REQUIRED if c not in df.columns]
        if absent:
            raise ValueError(
                f"transcripts table at {path} lacks required columns "
                f"{absent}"
            )
        # optional fields may be absent in minimal tables — select what
        # exists (build only consumes conv_id/turn_idx/text)
        valid = df.select(
            *[f.name for f in TRANSCRIPT_FIELDS if f.name in df.columns]
        )
        return valid, spark.createDataFrame(
            [], "line string, reason string"
        )
    schema = T.StructType(
        TRANSCRIPT_FIELDS + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    if format == "jsonl":
        raw = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
            .json(path)
        )
    elif format == "csv":
        raw = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
            # CSV cannot distinguish "" from NULL; pin NULL to the \N
            # sentinel (mysqldump convention) so empty strings survive
            .option("nullValue", "\\N")
            # RFC-4180 quoting: "" escapes a quote (Spark defaults to
            # backslash) and quoted fields may span lines
            .option("escape", '"')
            .option("multiLine", "true")
            .csv(path)
        )
    else:
        raise ValueError(f"unknown transcripts format: {format!r}")
    # Spark requires the corrupt column to be materialized (cached or
    # selected) before filtering on it — a plan that filters the corrupt
    # column of a lazily-parsed read is explicitly unsupported
    raw = raw.cache()
    if unpersist_handle is not None:
        unpersist_handle.append(raw)
    parse_bad = F.col(CORRUPT_COL).isNotNull()
    missing = F.lit(False)
    for c in REQUIRED:
        missing = missing | F.col(c).isNull()
    rejects = raw.filter(parse_bad | missing).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct(*[
            f.name for f in TRANSCRIPT_FIELDS
        ]))).alias("line"),
        F.when(parse_bad, F.lit("parse_error"))
        .otherwise(F.lit("missing_required_field")).alias("reason"),
    )
    valid = raw.filter(~(parse_bad | missing)).select(
        *[f.name for f in TRANSCRIPT_FIELDS]
    )
    return valid, rejects
