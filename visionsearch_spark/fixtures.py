"""Deterministic synthesis of the north-rule `transcripts` table + query set.

Schema (BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Generator spec frozen in FIXTURES.md §1 (seed=42, Zipf vocabulary with
deliberate hot terms for skew tests, planted rare markers for exact-recall
assertions, punctuation + mixed case + accents to pin the analyzer).

Reference precedents: turn numbering `len(history)+1`
(`/root/reference/visionsearch/common_utils/conversation/core/session_manager.py:210-215`),
20-turn cap (`session_manager.py:91`), ISO timestamps (`session_manager.py:213`).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

HOT_TERMS = ["join", "filter", "stream"]  # planted in ~40% of turns (skew)
MARKER_TERMS = ["xylophone", "quasar", "obelisk"]  # rare exact-recall markers
TOOL_VOCAB = ["search", "calculator", "browser", "python", "sql"]
ROLES = ["user", "assistant", "tool", "system"]

_BASE_WORDS = [
    "join", "a", "filter", "window", "row", "stream", "customer", "data",
    "group", "sort", "merge", "fast", "key", "big", "slow", "small", "table",
    "scan", "part", "hash", "order", "batch", "spark", "query", "value",
    "line", "agg", "column", "vector", "index", "the", "shuffle", "broadcast",
    "partition", "executor", "driver", "cache", "spill", "skew", "salt",
    "token", "term", "posting", "block", "segment", "score", "rank", "doc",
]


def _vocab(n: int = 500) -> list[str]:
    v = list(_BASE_WORDS)
    i = 0
    while len(v) < n:
        v.append(f"w{i:03d}")
        i += 1
    return v[:n]


def make_transcripts_pdf(n_convs: int = 100, seed: int = 42) -> pd.DataFrame:
    """Deterministic pandas frame of transcript turns (no wall clock)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    nv = len(vocab)
    # Zipf(s=1.1) over vocab ranks, normalized.
    ranks = np.arange(1, nv + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()

    base_ts = datetime(2025, 1, 1, 0, 0, 0)
    rows: list[tuple] = []
    n_marker = 0
    for c in range(n_convs):
        conv_id = f"conv-{c:06d}"
        n_turns = int(rng.integers(2, 21))
        conv_off = timedelta(minutes=int(c) * 7)
        for t in range(1, n_turns + 1):
            r = rng.random()
            if r < 0.10:
                role, tool = "tool", TOOL_VOCAB[int(rng.integers(0, len(TOOL_VOCAB)))]
            elif t == 1 and r < 0.15:
                role, tool = "system", ""
            else:
                role, tool = ("user", "") if t % 2 == 1 else ("assistant", "")
            n_tok = int(rng.integers(5, 41))
            words = list(vocab[rng.choice(nv, size=n_tok, p=probs)])
            for hot in HOT_TERMS:
                if rng.random() < 0.40 / len(HOT_TERMS) * 3 / 3 and rng.random() < 0.40:
                    words.insert(int(rng.integers(0, len(words) + 1)), hot)
            # rare markers: ~1 in 300 turns gets one, deterministic via rng
            if rng.random() < 1 / 300:
                words.insert(0, MARKER_TERMS[n_marker % len(MARKER_TERMS)])
                n_marker += 1
            # punctuation / case / accents to exercise the analyzer
            if rng.random() < 0.30:
                k = int(rng.integers(0, len(words)))
                words[k] = words[k] + rng.choice([".", "!", "?"])
            if rng.random() < 0.05:
                k = int(rng.integers(0, len(words)))
                words[k] = words[k].upper()
            if rng.random() < 0.05:
                words.append(rng.choice(["café", "naïve", "über"]))
            text = " ".join(words)
            ts = base_ts + conv_off + timedelta(seconds=t * 30 + int(rng.integers(0, 10)))
            rows.append((conv_id, t, role, text, tool, ts))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def make_transcripts(spark: SparkSession, n_convs: int = 100, seed: int = 42,
                     n_partitions: int = 8) -> DataFrame:
    pdf = make_transcripts_pdf(n_convs, seed)
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA).repartition(n_partitions)


def make_queries(seed: int = 42) -> pd.DataFrame:
    """~50 queries: head-only, tail-only, mixed, markers, OOV, k>matches.

    k mix mirrors the reference: 5 (`aisearch/core.py:58`), 10
    (`index3.html:238`), 30 (`aisearch/main.py:56`).
    """
    rng = np.random.default_rng(seed + 1)
    vocab = _vocab()
    ks = [5, 10, 30]
    rows: list[tuple[int, str, int]] = []
    qid = 0

    def add(text: str, k: int) -> None:
        nonlocal qid
        rows.append((qid, text, k))
        qid += 1

    for h in HOT_TERMS:
        add(h, 10)
    add("join filter", 30)
    add("join filter stream", 5)
    for _ in range(12):  # tail-only
        w = vocab[int(rng.integers(300, 500))]
        add(w, ks[int(rng.integers(0, 3))])
    for _ in range(12):  # mixed head+tail
        w = vocab[int(rng.integers(200, 500))]
        h = HOT_TERMS[int(rng.integers(0, len(HOT_TERMS)))]
        add(f"{h} {w}", ks[int(rng.integers(0, 3))])
    for m in MARKER_TERMS:
        add(m, 5)
    add("zzzznotaword", 5)          # OOV -> 0 rows (NOT the asset_ids[-1] bug)
    add("qqq www eee", 10)          # all-OOV multi-term
    add("xylophone zzzznotaword", 5)  # partial OOV
    for _ in range(8):  # mid-frequency multi-term
        w = [vocab[int(rng.integers(30, 300))] for _ in range(int(rng.integers(2, 7)))]
        add(" ".join(w), ks[int(rng.integers(0, 3))])
    add("CAFÉ naïve", 10)  # analyzer edge: accents/case
    return pd.DataFrame(rows, columns=["query_id", "query_text", "k"])
