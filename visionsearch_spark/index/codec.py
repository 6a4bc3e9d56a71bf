"""Delta + varint (LEB128) posting-list codec, numpy-vectorized.

Postings are stored as binary columns: docids delta-encoded within a block
(first value absolute) then varint-packed; tfs and dls plain varint. All
encode/decode paths are vectorized over whole arrays — byte positions are
looped (<= 10 iterations), elements never are. This is the Arrow-friendly
analog of the reference's contiguous float32 matrix
(`/root/reference/visionsearch/common_utils/aisearch/core.py:43`): a
compact, scan-friendly physical layout for the index payload.

Round-trip property-tested in tests/test_codec.py (hypothesis).
"""

from __future__ import annotations

import numpy as np

_MASK = np.uint64(0x7F)
_CONT = np.uint8(0x80)


# ceil(bit_length/7) boundaries: value v needs 1 + (number of these <= v)
# LEB128 bytes — a searchsorted replaces the per-bit shift loop
_VARINT_POW = np.uint64(1) << (np.uint64(7) * np.arange(1, 10, dtype=np.uint64))


def varint_stream(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 array -> (LEB128 byte stream as uint8 array, per-value byte
    counts). ONE vectorized pass over the whole array; because LEB128
    values are self-delimiting, any slice of the stream at value
    boundaries (cumsum of the counts) is byte-identical to encode_varint
    of that value slice — the per-block encoder the batch builders slice
    from."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    nbytes = np.searchsorted(_VARINT_POW, v, side="right").astype(np.int64) + 1
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    # start offset of each value's byte run
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    max_len = int(nbytes.max())
    tmp = v.copy()
    for pos in range(max_len):
        alive = nbytes > pos
        idx = starts[alive] + pos
        chunk = (tmp[alive] & _MASK).astype(np.uint8)
        more = (nbytes[alive] - 1) > pos
        out[idx] = chunk | np.where(more, _CONT, np.uint8(0))
        tmp[alive] >>= np.uint64(7)
    return out, nbytes


def encode_varint(values: np.ndarray) -> bytes:
    """uint64 array -> LEB128 bytes."""
    return varint_stream(values)[0].tobytes()


def decode_varint(buf: bytes, n: int) -> np.ndarray:
    """LEB128 bytes -> uint64 array of n values."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_last = (raw & _CONT) == 0
    # element index for each byte: cumsum of "previous byte was last"
    elem = np.zeros(raw.size, dtype=np.int64)
    elem[1:] = np.cumsum(is_last[:-1])
    # position of each byte within its element
    starts = np.zeros(raw.size, dtype=np.int64)
    last_pos = np.flatnonzero(is_last)
    run_start = np.concatenate(([0], last_pos[:-1] + 1))
    pos = np.arange(raw.size, dtype=np.int64) - run_start[elem]
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, elem, (raw & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64)))
    return out


def encode_positions(pos: np.ndarray, tfs: np.ndarray) -> bytes:
    """Flat token-position array (ascending within each doc) for a run of
    postings with per-doc occurrence counts `tfs` -> per-doc delta
    (first-of-doc absolute) varint bytes. Because every doc's first delta
    is absolute, any doc-boundary-aligned SLICE of the delta stream is
    itself a valid encoding — compaction re-chunks and delete-masking
    filters by slicing deltas, never re-deriving absolutes."""
    p = np.ascontiguousarray(pos, dtype=np.int64)
    if p.size == 0:
        return b""
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    deltas = np.empty_like(p)
    deltas[0] = p[0]
    np.subtract(p[1:], p[:-1], out=deltas[1:])
    starts = np.concatenate(([0], np.cumsum(t)[:-1]))
    deltas[starts] = p[starts]
    if (deltas < 0).any():
        raise ValueError("positions must be ascending within each doc")
    return encode_varint(deltas.astype(np.uint64))


def decode_positions(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Inverse of encode_positions: flat absolute positions (int64),
    aligned with np.repeat(docids, tfs)."""
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    n = int(t.sum())
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    deltas = decode_varint(buf, n).astype(np.int64)
    c = np.cumsum(deltas)
    ends = np.cumsum(t)
    seg_base = np.concatenate(([0], c[ends[:-1] - 1]))
    return c - np.repeat(seg_base, t)


def encode_docids(docids: np.ndarray) -> bytes:
    """Sorted int64 docids -> delta(first absolute) varint bytes."""
    d = np.ascontiguousarray(docids, dtype=np.int64)
    if d.size == 0:
        return b""
    deltas = np.empty_like(d)
    deltas[0] = d[0]
    np.subtract(d[1:], d[:-1], out=deltas[1:])
    if d.size > 1 and deltas[1:].min() <= 0:
        raise ValueError("docids must be strictly increasing within a block")
    return encode_varint(deltas.astype(np.uint64))


def decode_docids(buf: bytes, n: int) -> np.ndarray:
    deltas = decode_varint(buf, n).astype(np.int64)
    return np.cumsum(deltas)
