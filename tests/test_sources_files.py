"""Multi-format transcript sources: JSONL/CSV reads must yield the SAME
frame the parquet path yields, malformed lines route to rejects (never
kill the job, never vanish), and an index built from JSONL is
search-identical to one built from parquet."""

from __future__ import annotations

import json
import math
import os

import pytest

from visionsearch_spark.sources.files import read_transcripts

N_GOOD = 40


@pytest.fixture(scope="module")
def trio(spark, transcripts_pdf, tmp_path_factory):
    """The same N_GOOD rows as parquet, jsonl (+2 corrupt lines), and
    csv; returns (parquet_path, jsonl_path, csv_path)."""
    root = str(tmp_path_factory.mktemp("fmt_src"))
    pdf = transcripts_pdf.head(N_GOOD).copy()
    pq_path = os.path.join(root, "t.parquet")
    import pyarrow as pa
    import pyarrow.parquet as papq

    papq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), pq_path,
        coerce_timestamps="us",
    )
    iso = pdf["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    jl_path = os.path.join(root, "t.jsonl")
    with open(jl_path, "w") as f:
        for i, row in enumerate(pdf.itertuples(index=False)):
            f.write(json.dumps({
                "conv_id": row.conv_id, "turn_idx": int(row.turn_idx),
                "role": row.role, "text": row.text, "tool": row.tool,
                "ts": iso.iloc[i],
            }) + "\n")
        f.write("{this is not json\n")                       # parse error
        f.write(json.dumps({"role": "user", "text": None}) + "\n")  # no id
    csv_path = os.path.join(root, "t.csv")
    csv_pdf = pdf.copy()
    csv_pdf["ts"] = iso
    # QUOTE_ALL: an UNquoted empty CSV field is null to Spark no matter
    # the nullValue sentinel; quoted "" round-trips as empty string
    import csv as _csv

    csv_pdf.to_csv(csv_path, index=False, quoting=_csv.QUOTE_ALL)
    return pq_path, jl_path, csv_path


def _canon(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"],
         r["ts"])
        for r in df.collect()
    )


def test_jsonl_matches_parquet_and_routes_rejects(spark, trio):
    pq_path, jl_path, _ = trio
    pq_valid, pq_rej = read_transcripts(spark, pq_path, "parquet")
    jl_valid, jl_rej = read_transcripts(spark, jl_path, "jsonl")
    assert pq_rej.count() == 0
    assert _canon(jl_valid) == _canon(pq_valid)
    rej = {r["reason"] for r in jl_rej.collect()}
    assert jl_rej.count() == 2
    assert rej == {"parse_error", "missing_required_field"}


def test_csv_matches_parquet(spark, trio):
    pq_path, _, csv_path = trio
    pq_valid, _ = read_transcripts(spark, pq_path, "parquet")
    csv_valid, csv_rej = read_transcripts(spark, csv_path, "csv")
    assert csv_rej.count() == 0
    assert _canon(csv_valid) == _canon(pq_valid)


def test_unknown_format_raises(spark, trio):
    with pytest.raises(ValueError, match="unknown transcripts format"):
        read_transcripts(spark, trio[0], "xml")


def test_index_from_jsonl_search_identical(spark, trio, tmp_path_factory):
    """Source-format parity end-to-end: an index built from the JSONL
    read equals one built from parquet — same stats, same results."""
    from visionsearch_spark.index.spimi import build_index
    from visionsearch_spark.query.wand import topk

    pq_path, jl_path, _ = trio
    pq_valid, _ = read_transcripts(spark, pq_path, "parquet")
    jl_valid, _ = read_transcripts(spark, jl_path, "jsonl")
    roots = []
    for name, df in [("pq", pq_valid), ("jl", jl_valid)]:
        root = str(tmp_path_factory.mktemp(f"idx_{name}"))
        build_index(df.select("conv_id", "turn_idx", "text"), root,
                    n_partitions=2)
        roots.append(root)
    from visionsearch_spark.index.store import IndexStore

    m0 = IndexStore(roots[0]).read_meta()
    m1 = IndexStore(roots[1]).read_meta()
    assert (m0["n_docs"], m0["avgdl"]) == (m1["n_docs"], m1["avgdl"])
    for q in ("join filter", "stream"):
        a = topk(spark, IndexStore(roots[0]), q, k=10).collect()
        b = topk(spark, IndexStore(roots[1]), q, k=10).collect()
        assert [(r["conv_id"], r["turn_idx"]) for r in a] == [
            (r["conv_id"], r["turn_idx"]) for r in b
        ]
        for x, y in zip(a, b):
            assert math.isclose(x["score"], y["score"], rel_tol=1e-12)


def test_parquet_minimal_columns_ok(spark, tmp_path_factory):
    """A minimal (conv_id, turn_idx, text) parquet table reads fine;
    a table missing a REQUIRED column raises a clear error."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    root = str(tmp_path_factory.mktemp("fmt_min"))
    minimal = os.path.join(root, "min.parquet")
    papq.write_table(
        pa.table({"conv_id": ["a"], "turn_idx": pa.array([1], pa.int32()),
                  "text": ["hello world"]}),
        minimal,
    )
    valid, rej = read_transcripts(spark, minimal, "parquet")
    assert valid.columns == ["conv_id", "turn_idx", "text"]
    assert valid.count() == 1 and rej.count() == 0

    broken = os.path.join(root, "broken.parquet")
    papq.write_table(pa.table({"conv_id": ["a"], "text": ["x"]}), broken)
    with pytest.raises(ValueError, match="required columns"):
        read_transcripts(spark, broken, "parquet")


def test_build_cli_from_jsonl(trio, tmp_path_factory):
    """spark-submit entry point end-to-end from JSONL: index builds,
    rejects land in <output>/rejects, manifest metrics print."""
    import subprocess
    import sys

    _, jl_path, _ = trio
    out = str(tmp_path_factory.mktemp("cli_idx")) + "/idx"
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "/root/repo/jobs/build_index.py",
         "--input", jl_path, "--output", out,
         "--format", "jsonl", "--partitions", "2"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "2 malformed rows routed" in r.stdout
    assert "n_docs=40" in r.stdout and "postings=" in r.stdout
    assert os.path.isdir(os.path.join(out, "rejects"))


def test_csv_embedded_newlines_and_quotes(spark, tmp_path_factory):
    """RFC-4180 quoting round-trips: text with embedded newlines and
    doubled quotes parses intact (multiLine + escape='\"' pinned in the
    reader — r3 review: defaults tore such records)."""
    import csv as _csv

    import pandas as pd

    rows = [
        ("c1", 1, "user", 'line1\nline2 and a "quoted" word', "", "2025-01-01T00:00:00.000000"),
        ("c1", 2, "user", "plain text", "", "2025-01-01T00:00:01.000000"),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool", "ts"])
    path = os.path.join(str(tmp_path_factory.mktemp("csv_nl")), "t.csv")
    pdf.to_csv(path, index=False, quoting=_csv.QUOTE_ALL)
    valid, rej = read_transcripts(spark, path, "csv")
    assert rej.count() == 0
    got = {r["turn_idx"]: r["text"] for r in valid.collect()}
    assert got[1] == 'line1\nline2 and a "quoted" word'
    assert got[2] == "plain text"


def test_read_transcripts_unpersist_handle(spark, trio):
    handle = []
    valid, rejects = read_transcripts(spark, trio[1], "jsonl",
                                      unpersist_handle=handle)
    assert valid.count() == N_GOOD and rejects.count() == 2
    assert len(handle) == 1 and handle[0].is_cached
    handle[0].unpersist()
    assert not handle[0].is_cached
