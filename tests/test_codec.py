"""Varint/delta codec round-trip — unit + hypothesis property tests
(SURVEY.md §5.2.2)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from visionsearch_spark.index.codec import (
    decode_docids,
    decode_varint,
    encode_docids,
    encode_varint,
)


def test_empty():
    assert encode_varint(np.array([], dtype=np.uint64)) == b""
    assert decode_varint(b"", 0).size == 0
    assert encode_docids(np.array([], dtype=np.int64)) == b""


def test_known_values():
    assert encode_varint(np.array([0], dtype=np.uint64)) == b"\x00"
    assert encode_varint(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varint(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert encode_varint(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert decode_varint(encode_varint(arr), len(vals)).tolist() == vals


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True)
)
@settings(max_examples=200, deadline=None)
def test_docid_roundtrip(vals):
    arr = np.array(sorted(vals), dtype=np.int64)
    out = decode_docids(encode_docids(arr), len(vals))
    assert out.tolist() == sorted(vals)


def test_compression_is_real():
    # dense sorted docids compress far below 8 bytes each
    d = np.arange(10_000, dtype=np.int64) * 3
    assert len(encode_docids(d)) < 10_000 * 2
