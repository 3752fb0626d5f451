"""Vectorized 2x64-bit content hashing of Arrow string columns.

``pd.util.hash_array`` over an object ndarray pays ``to_pylist()``
materialization plus per-PyObject overhead — measured as the dominant
cost of the exact-dedup leg at 24M rows (BASELINE.md round-5 rehearsal).
This hashes straight off the Arrow utf8 buffers: position-sliced FNV-1a
style passes with two independent multipliers, a murmur finalizer for
avalanche, all numpy — O(total_bytes) work, no Python objects.

The pair forms a 128-bit grouping key. Dedup callers only need
collision-freeness, not keyed-SipHash secrecy; the DuckDB oracle twins
group by the FULL text, so the driver check independently verifies that
no collision occurred on the test corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_P1 = np.uint64(0x100000001B3)          # FNV-1a prime
_P2 = np.uint64(0xC6A4A7935BD1E995)     # murmur64A multiplier
_B1 = np.uint64(0xCBF29CE484222325)     # FNV-1a offset basis
_B2 = np.uint64(0x9E3779B97F4A7C15)     # golden-ratio basis
_L1 = np.uint64(0x9E3779B97F4A7C15)
_L2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _fmix(h: np.ndarray) -> np.ndarray:
    """murmur3 64-bit finalizer (vectorized, wrapping)."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _chunk_pair(a: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    n = len(a)
    h1 = np.full(n, _B1, np.uint64)
    h2 = np.full(n, _B2, np.uint64)
    if n == 0:
        return h1, h2
    odt = (
        np.int64
        if pa.types.is_large_string(a.type) or pa.types.is_large_binary(a.type)
        else np.int32
    )
    bufs = a.buffers()
    off = np.frombuffer(bufs[1], odt)[a.offset : a.offset + n + 1].astype(
        np.int64
    )
    data = (
        np.frombuffer(bufs[2], np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    starts = off[:-1]
    lens = off[1:] - starts
    # LENGTH-SORTED processing: equal-length strings form contiguous
    # blocks, so each block's bytes gather into ONE dense (k, L) matrix
    # and hash 8 bytes per step (uint64 words, little-endian load, tail
    # bytes singly). Work is O(sum of lengths / 8) vector ops plus one
    # gather per distinct length — word-at-a-time beats the per-byte
    # position-sliced loop ~4x on this corpus shape.
    order = np.argsort(lens, kind="stable")
    starts_s = starts[order]
    lens_s = lens[order]
    hs1 = h1  # sorted-order accumulators; scattered back at the end
    hs2 = h2
    ulens, block_starts = np.unique(lens_s, return_index=True)
    block_ends = np.append(block_starts[1:], n)
    for length, lo, hi in zip(ulens.tolist(), block_starts, block_ends):
        if length == 0:
            continue
        mat = data[starts_s[lo:hi, None] + np.arange(length)]
        a1 = hs1[lo:hi]
        a2 = hs2[lo:hi]
        nwords = length // 8
        if nwords:
            words = np.ascontiguousarray(mat[:, : nwords * 8]).view(
                "<u8"
            )
            for w in range(nwords):
                col = words[:, w]
                a1[:] = (a1 ^ col) * _P1
                a2[:] = (a2 ^ col) * _P2
        for j in range(nwords * 8, length):
            col = mat[:, j].astype(np.uint64)
            a1[:] = (a1 ^ col) * _P1
            a2[:] = (a2 ^ col) * _P2
    lu = lens_s.astype(np.uint64)
    hs1 ^= lu * _L1
    hs2 ^= lu * _L2
    out1 = np.empty(n, np.uint64)
    out2 = np.empty(n, np.uint64)
    out1[order] = _fmix(hs1)
    out2[order] = _fmix(hs2)
    return out1, out2


def hash_utf8_pair(col) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 content hashes of a pyarrow string/binary Array or
    ChunkedArray. Nulls hash as empty strings (the corpora carry none)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    outs = [_chunk_pair(c) for c in chunks]
    with np.errstate(over="ignore"):
        if not outs:
            return np.empty(0, np.uint64), np.empty(0, np.uint64)
    h1 = np.concatenate([o[0] for o in outs]) if len(outs) > 1 else outs[0][0]
    h2 = np.concatenate([o[1] for o in outs]) if len(outs) > 1 else outs[0][1]
    return h1, h2
