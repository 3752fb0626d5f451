"""Positional-postings codec: per-term blocks of (doc, occurrence positions).

The optional POSITIONS artifact extends the inverted index with in-document
token positions — the structure behind phrase and proximity queries in every
full-text engine (Lucene's positions posting list; the reference's analog is
AnnLite's payload store keyed by doc, ``docs/user-guides/retriever.md:54-62``
— positions are our text-engine substitution for its vector payloads).

Layout mirrors ``state/postings.py``: one PARQUET ROW PER BLOCK, a block
covers up to ``block_size`` docs of one term, doc-sorted, delta-encoded and
width-packed (1/2/4/8-byte lanes chosen per block). Payload layout::

    data = doc_deltas (n * doc_w)      # doc_ids, delta vs previous, [0]=0
         + counts     (n * cnt_w)      # occurrences per doc (phrase tf cap)
         + pos_deltas (total * pos_w)  # per-doc: first absolute, rest deltas

Positions are 0-based token indices AFTER tokenization (the same token
stream the main index's tf counts summarize), so ``positions[i+1] ==
positions[i] + 1`` means "adjacent tokens" — the phrase-match predicate.

Block row schema (``POS_BLOCK_SCHEMA``):
    term:string, block_idx:int32, first_doc:int64, last_doc:int64,
    n:int32, total:int32, doc_w:int8, cnt_w:int8, pos_w:int8, data:binary
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

POS_BLOCK_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("block_idx", pa.int32()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("n", pa.int32()),
        ("total", pa.int32()),
        ("doc_w", pa.int8()),
        ("cnt_w", pa.int8()),
        ("pos_w", pa.int8()),
        ("data", pa.binary()),
    ]
)

_DTYPES = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def _width_for(max_val: int) -> int:
    if max_val < (1 << 8):
        return 1
    if max_val < (1 << 16):
        return 2
    if max_val < (1 << 32):
        return 4
    return 8


def pos_deltas(positions: np.ndarray, doc_starts: np.ndarray) -> np.ndarray:
    """Delta-encode a flat ascending-within-doc position stream: each doc's
    first position stays absolute, the rest become diffs (>=1 — a token
    position occurs once per doc)."""
    if len(positions) == 0:
        return positions.astype(np.int64)
    d = np.diff(positions, prepend=0).astype(np.int64)
    d[doc_starts] = positions[doc_starts]
    return d


def encode_pos_blocks(
    term: str,
    doc_ids: np.ndarray,
    counts: np.ndarray,
    positions: np.ndarray,
    *,
    block_size: int,
    block_idx_base: int = 0,
    out: dict[str, list] | None = None,
) -> dict[str, list]:
    """Split one term's doc-sorted positional postings into encoded block
    rows appended to ``out`` (columns matching POS_BLOCK_SCHEMA).

    ``positions`` is the flat occurrence stream (ascending within each doc),
    ``counts[i]`` its per-doc segment length; ``sum(counts) == len(positions)``.
    """
    cols = out if out is not None else {name: [] for name in POS_BLOCK_SCHEMA.names}
    n_total = len(doc_ids)
    if n_total == 0:
        return cols
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    occ_bounds = np.concatenate([[0], np.cumsum(counts)])
    doc_starts_flat = occ_bounds[:-1]
    pdelta = pos_deltas(np.asarray(positions, dtype=np.int64), doc_starts_flat)

    ddelta = np.diff(doc_ids, prepend=doc_ids[0])
    starts = np.arange(0, n_total, block_size)
    ends = np.minimum(starts + block_size, n_total)
    ddelta[starts] = 0  # per-block baseline is its own first_doc

    for bi in range(len(starts)):
        s, e = int(starts[bi]), int(ends[bi])
        o0, o1 = int(occ_bounds[s]), int(occ_bounds[e])
        # blocks cut on doc boundaries and every doc's first occurrence is
        # stored absolute, so the payload slice needs no re-baselining
        pd = pdelta[o0:o1]
        dd = ddelta[s:e]
        cc = counts[s:e]
        doc_w = _width_for(int(dd.max()) if len(dd) else 0)
        cnt_w = _width_for(int(cc.max()) if len(cc) else 0)
        pos_w = _width_for(int(pd.max()) if len(pd) else 0)
        data = (
            np.ascontiguousarray(dd.astype(_DTYPES[doc_w])).tobytes()
            + np.ascontiguousarray(cc.astype(_DTYPES[cnt_w])).tobytes()
            + np.ascontiguousarray(pd.astype(_DTYPES[pos_w])).tobytes()
        )
        cols["term"].append(term)
        cols["block_idx"].append(block_idx_base + bi)
        cols["first_doc"].append(int(doc_ids[s]))
        cols["last_doc"].append(int(doc_ids[e - 1]))
        cols["n"].append(e - s)
        cols["total"].append(o1 - o0)
        cols["doc_w"].append(doc_w)
        cols["cnt_w"].append(cnt_w)
        cols["pos_w"].append(pos_w)
        cols["data"].append(data)
    return cols


def decode_pos_block(
    data: bytes | memoryview,
    n: int,
    total: int,
    doc_w: int,
    cnt_w: int,
    pos_w: int,
    first_doc: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block -> (doc_ids int64 ascending, counts int64,
    positions int64 flat, ascending within each doc's segment)."""
    buf = memoryview(data)
    off = 0
    dd = np.frombuffer(buf, dtype=_DTYPES[doc_w], count=n, offset=off)
    off += n * doc_w
    cc = np.frombuffer(buf, dtype=_DTYPES[cnt_w], count=n, offset=off).astype(np.int64)
    off += n * cnt_w
    pd = np.frombuffer(buf, dtype=_DTYPES[pos_w], count=total, offset=off).astype(np.int64)
    doc_ids = np.cumsum(dd.astype(np.int64)) + first_doc
    if total:
        # invert the per-doc delta encoding: segment-local cumsum via a
        # global cumsum minus each segment's running base
        occ_bounds = np.concatenate([[0], np.cumsum(cc)])
        starts = occ_bounds[:-1]
        g = np.cumsum(pd)
        base = np.zeros(total, dtype=np.int64)
        seg_first = g[starts] - pd[starts]  # cumsum BEFORE each segment start
        base = np.repeat(seg_first, cc)
        positions = g - base
    else:
        positions = pd
    return doc_ids, cc, positions
