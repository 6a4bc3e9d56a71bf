"""docID assignment: dense, deterministic, equal to global sort order, and
invariant to input partitioning (metamorphic property §5.2.3a)."""

from __future__ import annotations

from visionsearch_spark.docid import assign_docids


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
