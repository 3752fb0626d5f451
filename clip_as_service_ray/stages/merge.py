"""Partial-postings emit + the term-hash merge shuffle.

This is the SPIMI pattern (SURVEY.md §7.2 steps 7-8) expressed Ray-Data-first:

- ``emit_partials`` (stateless ``map_batches`` over the staging checkpoint)
  builds an in-partition dictionary for its batch — the SPIMI "local index":
  all (term, doc, tf, dl) postings of the batch, grouped by term and sorted
  by doc_id, packed into one binary run row per (term, doc-bucket). A batch
  of B docs with V distinct terms shuffles V·(buckets) rows, not sum(dl)
  rows — the partial/combiner pre-aggregation the guide prescribes.

- the merge exchange is a DISK-PARTITIONED 2-D GRID: the map side writes
  runs under ``partials/part=K/bgrp=J/`` (``part = crc32(term) %
  num_index_partitions``; ``bgrp`` = doc-range group, parquet
  partition_cols), the reduce side (``merge_partition``) runs one Ray task
  per grid cell over exactly its files. No in-memory sort shuffle:
  sequential IO both sides, per-partition resume with lineage counters.
  One vectorized merge call handles every term of a cell — no per-term
  Python task overhead at web-scale vocabularies. Skew: a hot stopword's
  postings spread uniformly across doc-range groups, so cells stay
  balanced regardless of term frequency (the skew splitting is the static
  doc-range axis of the grid); a cell's block rows stitch with its
  neighbours by ``first_doc`` order at read time.

Partial-run schema (the exchange wire format — every byte here crosses the
disk/network boundary of the shuffle, so it is width-minimized):
    part:int32, bucket:int64, bgrp:int32, term:string, first_doc:int64,
    n:int32, doc_w/tf_w/dl_w:int8 (byte widths, uniform per input batch),
    docs:binary (doc offsets RELATIVE to bucket*doc_bucket_size — uint16
    whenever doc_bucket_size <= 64Ki, by construction), tfs/dls:binary
    (uint16 normally; uint32 fallback when a batch holds a larger value).
    Binary cells of one batch are zero-copy slices of one packed buffer.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from clip_as_service_ray.state.postings import (
    BLOCK_SCHEMA,
    encode_postings_to_blocks,
)

PARTIAL_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("bucket", pa.int64()),
        ("bgrp", pa.int32()),
        ("term", pa.string()),
        ("first_doc", pa.int64()),
        ("n", pa.int32()),
        ("doc_w", pa.int8()),
        ("tf_w", pa.int8()),
        ("dl_w", pa.int8()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
    ]
)

_W_DTYPES = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def _runs_binary_column(values: np.ndarray, starts: np.ndarray, total: int, width: int) -> pa.Array:
    """Zero-copy-ish binary column: one packed buffer for the whole batch,
    per-run cells are offset slices (no per-run Python loop / bytes objects).
    ``starts`` are run starts in element units; runs are contiguous."""
    offs = np.empty(len(starts) + 1, dtype=np.int32)
    offs[:-1] = starts * width
    offs[-1] = total * width
    return pa.Array.from_buffers(
        pa.binary(),
        len(starts),
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(np.ascontiguousarray(values).tobytes())],
    )

def term_partition(term: str, num_partitions: int) -> int:
    """Stable term -> partition hash (crc32; reproducible across processes,
    unlike Python's salted hash())."""
    return zlib.crc32(term.encode("utf-8")) % num_partitions


# pseudo-partition for per-batch corpus-stats rows (fused stats: the build
# needs (n_docs, sum_dl) and a second pass over the corpus to count them was
# a measurable serial component; instead every EmitPartials batch appends
# ONE tiny row under part=-1 with n=<docs in batch>, bucket=<sum dl> and the
# driver sums that tiny partition afterwards)
STATS_PART = -1


class EmitPartials:
    """map_batches UDF: tokenized batch -> partial posting runs.

    ``bucket_grp_width`` (in buckets) adds the ``bgrp`` column — the
    doc-range axis of the 2-D exchange grid (term-hash part x doc-range
    group). The map side writes partition_cols=[part, bgrp], so each merge
    task reads exactly its grid cell: hot terms are spread uniformly across
    doc ranges, making cells naturally balanced regardless of term skew.

    ``emit_stats``: append one stats row per batch under part=STATS_PART
    (columns reused: n = doc count, bucket = sum of doc lengths) so corpus
    stats fall out of the same single pass over the input.
    """

    def __init__(
        self,
        num_partitions: int,
        doc_bucket_size: int,
        bucket_grp_width=1 << 30,
        emit_stats: bool = False,
    ):
        self.num_partitions = num_partitions
        self.doc_bucket_size = doc_bucket_size
        # int, or an ObjectRef of the build-prep dict (resolved lazily in
        # the worker so the driver never blocks on the extents scan)
        self.bucket_grp_width = (
            max(1, bucket_grp_width) if isinstance(bucket_grp_width, int) else bucket_grp_width
        )
        self.emit_stats = emit_stats

    def _grp_width(self) -> int:
        w = self.bucket_grp_width
        if not isinstance(w, int):
            import ray

            got = ray.get(w) if not isinstance(w, dict) else w
            w = max(1, int(got["grp_width"] if isinstance(got, dict) else got))
            self.bucket_grp_width = w
        return w

    def _stats_table(self, n_docs: int, sum_dl: int) -> pa.Table:
        return pa.table(
            {
                "part": [STATS_PART], "bucket": [sum_dl], "bgrp": [0],
                "term": [""], "first_doc": [0], "n": [n_docs],
                "doc_w": [0], "tf_w": [0], "dl_w": [0],
                "docs": [b""], "tfs": [b""], "dls": [b""],
            },
            schema=PARTIAL_SCHEMA,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms_col = batch.column("terms").combine_chunks()
        tfs_col = batch.column("tfs").combine_chunks()
        if isinstance(terms_col, pa.ChunkedArray):  # single chunk after combine
            terms_col = terms_col.chunk(0)
            tfs_col = tfs_col.chunk(0)
        lengths = terms_col.value_lengths().to_numpy().astype(np.int64)
        flat_terms = terms_col.flatten().to_numpy(zero_copy_only=False)
        flat_tfs = tfs_col.flatten().to_numpy().astype(np.int64)
        doc_id = batch.column("doc_id").to_numpy().astype(np.int64)
        dl = batch.column("dl").to_numpy().astype(np.int64)
        docs_rep = np.repeat(doc_id, lengths)
        dls_rep = np.repeat(dl, lengths)

        if len(flat_terms) == 0:
            empty = pa.table(
                {n: [] for n in PARTIAL_SCHEMA.names}, schema=PARTIAL_SCHEMA
            )
            if self.emit_stats:
                return self._stats_table(len(doc_id), int(dl.sum()))
            return empty

        codes, uniques = pd.factorize(flat_terms, sort=False)
        order = np.lexsort((docs_rep, codes))
        return self._pack_runs(
            codes[order],
            docs_rep[order],
            flat_tfs[order],
            dls_rep[order],
            pa.array(uniques, pa.string()),
            len(doc_id),
            int(dl.sum()),
        )

    def _pack_runs(
        self,
        codes_s: np.ndarray,
        docs_s: np.ndarray,
        tfs_s: np.ndarray,
        dls_s: np.ndarray,
        dict_arr: pa.Array,
        n_docs: int,
        sum_dl: int,
    ) -> pa.Table:
        """Pack a (term-code, doc)-sorted posting stream into partial runs."""
        buckets_s = docs_s // self.doc_bucket_size

        # segment boundaries where term code or doc bucket changes
        change = np.nonzero((np.diff(codes_s) != 0) | (np.diff(buckets_s) != 0))[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(codes_s)]])
        n_post = len(codes_s)
        run_codes = codes_s[starts]
        run_buckets = buckets_s[starts]

        # run columns, fully vectorized: crc32 once per UNIQUE term (the only
        # per-string work), everything else numpy
        crc = np.fromiter(
            (zlib.crc32(t.encode("utf-8")) for t in dict_arr.to_pylist()),
            dtype=np.int64, count=len(dict_arr),
        )
        parts = (crc % self.num_partitions).astype(np.int32)[run_codes]
        bgrps = (run_buckets // self._grp_width()).astype(np.int32)
        term_arr = dict_arr.take(pa.array(run_codes, pa.int64()))

        # batch-uniform byte widths (uint16 normally; uint32 fallback when a
        # batch carries a larger value — recorded per row so mixed batches
        # decode correctly on the reduce side)
        doc_w = 2 if self.doc_bucket_size <= (1 << 16) else 4
        tf_w = 2 if int(tfs_s.max()) < (1 << 16) else 4
        dl_w = 2 if int(dls_s.max()) < (1 << 16) else 4
        docs_rel = (docs_s - buckets_s * self.doc_bucket_size).astype(_W_DTYPES[doc_w])

        out = pa.table(
            {
                "part": pa.array(parts, pa.int32()),
                "bucket": pa.array(run_buckets, pa.int64()),
                "bgrp": pa.array(bgrps, pa.int32()),
                "term": term_arr,
                "first_doc": pa.array(docs_s[starts], pa.int64()),
                "n": pa.array((ends - starts).astype(np.int32), pa.int32()),
                "doc_w": pa.array(np.full(len(starts), doc_w, np.int8), pa.int8()),
                "tf_w": pa.array(np.full(len(starts), tf_w, np.int8), pa.int8()),
                "dl_w": pa.array(np.full(len(starts), dl_w, np.int8), pa.int8()),
                "docs": _runs_binary_column(docs_rel, starts, n_post, doc_w),
                "tfs": _runs_binary_column(tfs_s.astype(_W_DTYPES[tf_w]), starts, n_post, tf_w),
                "dls": _runs_binary_column(dls_s.astype(_W_DTYPES[dl_w]), starts, n_post, dl_w),
            },
            schema=PARTIAL_SCHEMA,
        )
        if self.emit_stats:
            return pa.concat_tables([out, self._stats_table(n_docs, sum_dl)])
        return out


class TokenizeEmitPartials(EmitPartials):
    """ONE fused UDF: raw transcripts batch -> partial posting runs + stats.

    Wire-format- and merge-output-identical to ``tokenize_batch`` ∘
    ``EmitPartials`` (the merge canonicalizes (term, doc) order), but skips
    the staging list<string> assembly, re-flatten and second factorize
    between the two stages — the token stream goes straight from the
    vectorized tokenizer's flat Arrow array into run packing."""

    def __init__(
        self,
        num_partitions: int,
        doc_bucket_size: int,
        conv_base_ref,
        *,
        lowercase: bool = True,
        analyzer: str | None = None,
        emit_stats: bool = True,
    ):
        super().__init__(
            num_partitions, doc_bucket_size, conv_base_ref, emit_stats=emit_stats
        )
        self.conv_base_ref = conv_base_ref
        self.lowercase = lowercase
        self.analyzer = analyzer

    def __call__(self, batch: pa.Table) -> pa.Table:
        from clip_as_service_ray.functions.tokenizer import tokenize_column_flat
        from clip_as_service_ray.stages.tokenize import _get_conv_base

        conv_base = _get_conv_base(self.conv_base_ref)
        conv = np.asarray(batch.column("conv_id").to_pylist(), dtype=object)
        turn = batch.column("turn_idx").to_numpy().astype(np.int64)
        flat_tokens, dl = tokenize_column_flat(
            batch.column("text"), lowercase=self.lowercase
        )
        if self.analyzer:
            from clip_as_service_ray.functions.analyzers import stream_filter

            flat_tokens, dl = stream_filter(self.analyzer, flat_tokens, dl)
        idx = np.nonzero(dl > 0)[0]
        n_docs_b = len(idx)
        sum_dl_b = int(dl[idx].sum())
        if n_docs_b == 0:
            if self.emit_stats:
                return self._stats_table(0, 0)
            return pa.table({n: [] for n in PARTIAL_SCHEMA.names}, schema=PARTIAL_SCHEMA)
        doc_id = (conv_base.lookup(conv) + turn)[idx]
        lens = dl[idx]
        docs_rep = np.repeat(doc_id, lens)
        dls_rep = np.repeat(lens, lens)

        denc = flat_tokens.dictionary_encode()
        codes = denc.indices.to_numpy().astype(np.int64)
        dict_arr = denc.dictionary
        if self.analyzer:
            from clip_as_service_ray.functions.analyzers import fold_dictionary

            dict_arr, codes = fold_dictionary(self.analyzer, dict_arr, codes)
        order = np.lexsort((docs_rep, codes))
        codes_t = codes[order]
        docs_t = docs_rep[order]
        dls_t = dls_rep[order]

        # occurrence stream -> posting-level (term, doc, tf) segments
        pchange = np.nonzero((np.diff(codes_t) != 0) | (np.diff(docs_t) != 0))[0] + 1
        p_starts = np.concatenate([[0], pchange])
        p_ends = np.concatenate([pchange, [len(codes_t)]])
        return self._pack_runs(
            codes_t[p_starts],
            docs_t[p_starts],
            (p_ends - p_starts).astype(np.int64),
            dls_t[p_starts],
            dict_arr,
            n_docs_b,
            sum_dl_b,
        )


def _decode_runs(col, widths: np.ndarray, out_dtype) -> np.ndarray:
    """Decode a packed binary run column into one flat numpy array.

    Fast path: when every row of a chunk shares one byte width (the emit
    side writes batch-uniform widths), the whole chunk's data buffer is
    reinterpreted with ONE view — no per-row Python. Mixed-width chunks
    (files mixing fallback batches) decode per row."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    arrs: list[np.ndarray] = []
    row0 = 0
    for chunk in chunks:
        n_rows = len(chunk)
        if n_rows == 0:
            continue
        w = widths[row0 : row0 + n_rows]
        row0 += n_rows
        bufs = chunk.buffers()
        offs = np.frombuffer(
            bufs[1], dtype=np.int32, count=n_rows + 1, offset=chunk.offset * 4
        )
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        uw = np.unique(w)
        if len(uw) == 1:
            width = int(uw[0])
            seg = data[int(offs[0]) : int(offs[-1])]
            arrs.append(seg.view(_W_DTYPES[width]).astype(out_dtype))
        else:
            for i in range(n_rows):
                width = int(w[i])
                seg = data[int(offs[i]) : int(offs[i + 1])]
                arrs.append(seg.view(_W_DTYPES[width]).astype(out_dtype))
    if not arrs:
        return np.array([], dtype=out_dtype)
    return arrs[0] if len(arrs) == 1 else np.concatenate(arrs)


def merge_partition(
    partial_files: list,
    out_dir: str,
    *,
    avgdl: float,
    block_size: int,
    doc_bucket_size: int,
    k1: float,
    b: float,
    out_suffix: str = "",
) -> dict:
    """Merge ALL partial runs of one term-hash partition into block-max
    posting rows; one call = one partition = one Ray task.

    This is the reduce side of an explicit DISK-PARTITIONED exchange: the
    map side wrote runs under ``partials/part=K/`` (partition_cols), so the
    'shuffle' is a partitioned parquet layout instead of an in-memory sort —
    the SPIMI spill-file model, sequential IO, and independently RESUMABLE
    per partition (the north rule's per-partition checkpoint+lineage).

    One call handles one grid CELL of the 2-D exchange (term-hash part x
    doc-range group): cells of the same part write distinct ``out_suffix``
    files into the part's output dir; disjoint doc ranges keep block rows
    stitchable by first_doc order at read time. The caller writes the
    per-part manifest after all its cells succeed.

    Returns lineage counters {terms, postings, blocks, bytes, seconds}.
    """
    import time as _time

    import pyarrow.parquet as _pq

    t0 = _time.time()
    if partial_files:
        # one multithreaded C++ read over the whole partition's files (the
        # map side writes a file per map task; per-file Python reads were
        # the reduce-side hotspot)
        # use_threads=False: this task owns ONE cpu; concurrent tasks each
        # spawning pyarrow's full thread pool oversubscribes the node
        group = _pq.read_table(
            partial_files,
            columns=["term", "bucket", "n", "doc_w", "tf_w", "dl_w", "docs", "tfs", "dls"],
            use_threads=False,
        )
    else:
        group = None

    cols: dict[str, list] = {n: [] for n in BLOCK_SCHEMA.names}
    n_postings = 0
    if group is not None and group.num_rows:
        terms = group.column("term").to_numpy(zero_copy_only=False)
        ns = group.column("n").to_numpy().astype(np.int64)
        buckets = group.column("bucket").to_numpy().astype(np.int64)
        codes, uniques = pd.factorize(terms, sort=False)
        docs_rel = _decode_runs(
            group.column("docs"), group.column("doc_w").to_numpy(), np.int64
        )
        tfs_all = _decode_runs(
            group.column("tfs"), group.column("tf_w").to_numpy(), np.int32
        )
        dls_all = _decode_runs(
            group.column("dls"), group.column("dl_w").to_numpy(), np.int32
        )
        # absolute doc ids: run-relative offsets + the run's bucket base
        docs_all = docs_rel
        docs_all += np.repeat(buckets * doc_bucket_size, ns)
        # int32 where value ranges allow: the sandbox VM re-faults freed
        # pages at hypervisor speed, so temporary bytes are the real cost
        codes_all = np.repeat(codes.astype(np.int32), ns)
        order = np.lexsort((docs_all, codes_all))
        codes_s = codes_all[order]
        docs_s = docs_all[order]
        tfs_s = tfs_all[order]
        dls_s = dls_all[order]
        dup = (np.diff(codes_s) == 0) & (np.diff(docs_s) == 0)
        if np.any(dup):
            raise ValueError(
                "duplicate (term, doc_id) postings — input has duplicate "
                "(conv_id, turn_idx) rows; run dedup_turns before indexing"
            )
        change = np.nonzero(np.diff(codes_s) != 0)[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(codes_s)]])
        for s, e in zip(starts, ends):
            encode_postings_to_blocks(
                uniques[codes_s[s]],
                docs_s[s:e], tfs_s[s:e], dls_s[s:e],
                block_size=block_size, avgdl=avgdl, k1=k1, b=b, out=cols,
            )
        n_postings = len(codes_s)
        # per-cell df contributions (cells own disjoint doc ranges, so the
        # global df is the plain sum across cells): returned to the caller so
        # the dictionary stage needs no re-read of the postings files
        df_tbl = pa.table(
            {
                "term": pa.array(uniques[codes_s[starts]], pa.string()),
                "df": pa.array((ends - starts).astype(np.int64), pa.int64()),
            }
        )
    else:
        df_tbl = pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )

    os.makedirs(out_dir, exist_ok=True)
    out_tbl = pa.table(cols, schema=BLOCK_SCHEMA)
    out_path = os.path.join(out_dir, f"blocks{out_suffix}.parquet")
    tmp = out_path + f".tmp.{os.getpid()}"
    _pq.write_table(out_tbl, tmp)
    os.replace(tmp, out_path)
    counters = {
        # per-CELL distinct-term count; a term whose postings span multiple
        # doc-range cells is counted once per cell, so the per-part sum is a
        # term-RUN count (the final manifest's n_terms from the dictionary
        # is the true distinct count)
        "term_runs": int(len(np.unique(cols["term"])) if cols["term"] else 0),
        "postings": n_postings,
        "blocks": out_tbl.num_rows,
        "bytes": os.path.getsize(out_path),
        "seconds": _time.time() - t0,
    }
    return counters, df_tbl
