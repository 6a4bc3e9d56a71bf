"""docID assignment: dense, deterministic, equal to global sort order, and
invariant to input partitioning (metamorphic property §5.2.3a)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from visionsearch_spark.docid import assign_docids, dense_ids


def _expected(transcripts_pdf):
    keys = sorted(
        transcripts_pdf[["conv_id", "turn_idx"]].itertuples(index=False, name=None)
    )
    return {k: i for i, k in enumerate(keys)}


def test_docids_match_global_sort_order(transcripts, transcripts_pdf):
    got = {
        (r["conv_id"], r["turn_idx"]): r["docid"]
        for r in assign_docids(transcripts, n_partitions=7).collect()
    }
    assert got == _expected(transcripts_pdf)


def test_docids_invariant_to_partitioning(spark, transcripts, transcripts_pdf):
    exp = _expected(transcripts_pdf)
    for np_in, np_assign in [(1, 3), (16, 5)]:
        got = {
            (r["conv_id"], r["turn_idx"]): r["docid"]
            for r in assign_docids(transcripts.repartition(np_in), n_partitions=np_assign).collect()
        }
        assert got == exp


def test_dense_ids_equals_dense_rank(spark):
    """dense_ids == dense_rank() OVER (ORDER BY v) for any distinct input,
    regardless of input partitioning or partition count."""
    vals = [f"tok{i:04d}" for i in range(997)] + ["", "zz z", "0", "é"]
    import random

    rng = random.Random(13)
    shuffled = vals[:]
    rng.shuffle(shuffled)
    df = spark.createDataFrame([(v,) for v in shuffled], "v string")
    expected = {
        r["v"]: r["id"]
        for r in df.withColumn(
            "id", F.dense_rank().over(Window.orderBy("v")).cast("long")
        ).collect()
    }
    for n_parts in [1, 3, 16]:
        got = {
            r["v"]: r["id"]
            for r in dense_ids(df.repartition(5), "v", n_partitions=n_parts).collect()
        }
        assert got == expected, f"n_partitions={n_parts}"
