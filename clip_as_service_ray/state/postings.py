"""Posting-list codec: delta-encoded, min-width-packed, block-max blocks.

The reference's analog of this state is the AnnLite HNSW+SQLite workspace
(``/root/reference/docs/user-guides/retriever.md:54-62,156-168``): a per-shard
persistent structure mapping keys to scoreable payloads. Ours is a columnar
inverted index:

- postings for one term are sorted by doc_id and split into fixed-size
  blocks (default 128 docs, ``EngineConfig.postings_block_size``);
- per block we store ``first_doc`` and delta-encode doc_ids, then pack
  deltas / tfs / dls at the minimal byte width (1/2/4/8) — a
  frame-of-reference scheme in the PForDelta family, chosen because both
  encode and decode are single numpy kernels (no per-int Python loop);
- per block we store ``max_tf_norm`` — the idf-free block-max metadata that
  lets the query engine skip blocks that cannot reach the current top-k
  threshold (block-max WAND: block bound = idf(term) * max_tf_norm, with idf
  taken from the term dictionary). Storing the idf-free quantity means the
  merge stage needs only the global scalar ``avgdl``, not per-term global
  df — so a (term, doc-bucket) group can be merged independently;
- ``dl`` (document length in terms) is carried inline with each posting so
  scoring needs no side lookup into a doc-length table (at 10^12 docs a
  broadcast dl array would not fit; +1 byte/posting buys locality).

One PARQUET ROW PER BLOCK — a hot term (stopword) becomes many small rows,
never one giant cell (SURVEY.md §7.5 "wide rows").

Block row schema (``BLOCK_SCHEMA``):
    term:string, block_idx:int32, first_doc:int64, last_doc:int64,
    n:int32, doc_w:int8, tf_w:int8, dl_w:int8, max_tf_norm:float64,
    data:binary
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions import bm25

BLOCK_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("block_idx", pa.int32()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("n", pa.int32()),
        ("doc_w", pa.int8()),
        ("tf_w", pa.int8()),
        ("dl_w", pa.int8()),
        ("max_tf_norm", pa.float64()),
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


def _pack(values: np.ndarray, width: int) -> bytes:
    return np.ascontiguousarray(values.astype(_DTYPES[width])).tobytes()


def _unpack(buf: memoryview | bytes, offset: int, n: int, width: int) -> tuple[np.ndarray, int]:
    arr = np.frombuffer(buf, dtype=_DTYPES[width], count=n, offset=offset)
    return arr, offset + n * width


def encode_block(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> tuple[int, int, int, bytes]:
    """Encode one block (doc_ids sorted ascending). Returns widths + payload."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    deltas = np.diff(doc_ids, prepend=doc_ids[0])  # deltas[0] == 0
    doc_w = _width_for(int(deltas.max()) if len(deltas) else 0)
    tf_w = _width_for(int(np.max(tfs)) if len(tfs) else 0)
    dl_w = _width_for(int(np.max(dls)) if len(dls) else 0)
    data = _pack(deltas, doc_w) + _pack(np.asarray(tfs), tf_w) + _pack(np.asarray(dls), dl_w)
    return doc_w, tf_w, dl_w, data


def decode_block(
    data: bytes, n: int, doc_w: int, tf_w: int, dl_w: int, first_doc: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block -> (doc_ids int64 ascending, tfs int64, dls int64)."""
    buf = memoryview(data)
    deltas, off = _unpack(buf, 0, n, doc_w)
    tfs, off = _unpack(buf, off, n, tf_w)
    dls, _ = _unpack(buf, off, n, dl_w)
    doc_ids = np.cumsum(deltas.astype(np.int64)) + first_doc
    return doc_ids, tfs.astype(np.int64), dls.astype(np.int64)


def encode_postings_to_blocks(
    term: str,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    *,
    block_size: int,
    avgdl: float,
    k1: float = bm25.K1,
    b: float = bm25.B,
    block_idx_base: int = 0,
    out: dict[str, list] | None = None,
) -> dict[str, list]:
    """Split one term's sorted postings run into encoded block rows.

    Only the global scalar ``avgdl`` is needed (``max_tf_norm`` is idf-free),
    so independent (term, doc-bucket) merge groups can call this without any
    per-term global state. Appends to ``out`` (columns matching BLOCK_SCHEMA)
    — cheap: one row per block, not per posting.
    """
    cols = out if out is not None else {name: [] for name in BLOCK_SCHEMA.names}
    n_total = len(doc_ids)
    if n_total == 0:
        return cols
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs)  # any integer dtype; int32 upstream to cut temporaries
    dls = np.asarray(dls)
    tf_norm_all = bm25.tf_norm(tfs, dls, avgdl, k1=k1, b=b)

    starts = np.arange(0, n_total, block_size)
    ends = np.minimum(starts + block_size, n_total)
    # vectorized across blocks: one diff + reduceat for per-block maxima,
    # then pre-cast whole arrays once per needed width — per-block work is
    # just memcpy slices (the per-block-numpy-op version was the merge
    # hotspot at 10k+ blocks per hot term)
    deltas = np.diff(doc_ids, prepend=doc_ids[0])
    deltas[starts] = 0  # per-block baseline is its own first_doc
    max_delta = np.maximum.reduceat(deltas, starts)
    max_tf = np.maximum.reduceat(tfs, starts)
    max_dl = np.maximum.reduceat(dls, starts)
    max_norm = np.maximum.reduceat(tf_norm_all, starts)

    def widths(maxes: np.ndarray) -> np.ndarray:
        w = np.full(len(maxes), 8, dtype=np.int8)
        w[maxes < (1 << 32)] = 4
        w[maxes < (1 << 16)] = 2
        w[maxes < (1 << 8)] = 1
        return w

    doc_ws, tf_ws, dl_ws = widths(max_delta), widths(max_tf), widths(max_dl)
    src = {"d": deltas, "t": tfs, "l": dls}
    cast: dict[tuple[str, int], np.ndarray] = {}

    def _cast(kind: str, w: int) -> np.ndarray:
        key = (kind, w)
        if key not in cast:  # cast lazily, once per width actually used
            cast[key] = src[kind].astype(_DTYPES[w])
        return cast[key]
    for bi in range(len(starts)):
        s, e = int(starts[bi]), int(ends[bi])
        dw, tw, lw = int(doc_ws[bi]), int(tf_ws[bi]), int(dl_ws[bi])
        data = (
            _cast("d", dw)[s:e].tobytes()
            + _cast("t", tw)[s:e].tobytes()
            + _cast("l", lw)[s:e].tobytes()
        )
        cols["term"].append(term)
        cols["block_idx"].append(block_idx_base + bi)
        cols["first_doc"].append(int(doc_ids[s]))
        cols["last_doc"].append(int(doc_ids[e - 1]))
        cols["n"].append(e - s)
        cols["doc_w"].append(dw)
        cols["tf_w"].append(tw)
        cols["dl_w"].append(lw)
        cols["max_tf_norm"].append(float(max_norm[bi]))
        cols["data"].append(data)
    return cols
