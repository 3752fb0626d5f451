"""Partial-postings emit + the term-hash merge shuffle.

This is the SPIMI pattern (SURVEY.md §7.2 steps 7-8) expressed Ray-Data-first:

- ``emit_partials`` (stateless ``map_batches`` over the staging checkpoint)
  builds an in-partition dictionary for its batch — the SPIMI "local index":
  all (term, doc, tf, dl) postings of the batch, grouped by term and sorted
  by doc_id, packed into one binary run row per (term, doc-bucket). A batch
  of B docs with V distinct terms shuffles V·(buckets) rows, not sum(dl)
  rows — the partial/combiner pre-aggregation the guide prescribes.

- the merge shuffle groups partial runs by ``(part, bucket)`` where
  ``part = crc32(term) % num_index_partitions`` and ``bucket =
  first_doc // doc_bucket_size``. Grouping by (part, bucket) rather than by
  term means (a) one vectorized merge call handles every term of a
  partition — no per-term Python task overhead at web-scale vocabularies;
  (b) a hot term (stopword) with postings across many doc buckets is SPLIT
  across many groups — the per-partition skew splitting the north rule
  requires. Block rows from different buckets of one term are stitched at
  read time by ``first_doc`` order (doc buckets are disjoint ranges).

Partial-run schema:
    part:int32, bucket:int64, term:string, first_doc:int64, n:int32,
    docs:binary (int64 LE), tfs:binary (int32 LE), dls:binary (int32 LE)
"""

from __future__ import annotations

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
        ("term", pa.string()),
        ("first_doc", pa.int64()),
        ("n", pa.int32()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
    ]
)

MERGED_SCHEMA = pa.schema(
    [("part", pa.int32()), ("bucket", pa.int64())] + list(BLOCK_SCHEMA)
)


def term_partition(term: str, num_partitions: int) -> int:
    """Stable term -> partition hash (crc32; reproducible across processes,
    unlike Python's salted hash())."""
    return zlib.crc32(term.encode("utf-8")) % num_partitions


class EmitPartials:
    """map_batches UDF: staging batch -> partial posting runs."""

    def __init__(self, num_partitions: int, doc_bucket_size: int):
        self.num_partitions = num_partitions
        self.doc_bucket_size = doc_bucket_size

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
            return pa.table({n: [] for n in PARTIAL_SCHEMA.names}, schema=PARTIAL_SCHEMA)

        codes, uniques = pd.factorize(flat_terms, sort=False)
        order = np.lexsort((docs_rep, codes))
        codes_s = codes[order]
        docs_s = docs_rep[order]
        tfs_s = flat_tfs[order]
        dls_s = dls_rep[order]
        buckets_s = docs_s // self.doc_bucket_size

        # segment boundaries where term code or doc bucket changes
        change = np.nonzero((np.diff(codes_s) != 0) | (np.diff(buckets_s) != 0))[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(codes_s)]])

        cols: dict[str, list] = {n: [] for n in PARTIAL_SCHEMA.names}
        for s, e in zip(starts, ends):
            term = uniques[codes_s[s]]
            cols["part"].append(term_partition(term, self.num_partitions))
            cols["bucket"].append(int(buckets_s[s]))
            cols["term"].append(term)
            cols["first_doc"].append(int(docs_s[s]))
            cols["n"].append(e - s)
            cols["docs"].append(docs_s[s:e].tobytes())
            cols["tfs"].append(tfs_s[s:e].astype(np.int32).tobytes())
            cols["dls"].append(dls_s[s:e].astype(np.int32).tobytes())
        return pa.table(cols, schema=PARTIAL_SCHEMA)


def make_merge_fn(avgdl: float, block_size: int, k1: float, b: float):
    """Build the map_groups UDF for one (part, bucket) group: merge all
    partial runs of every term in this group into encoded block-max rows.

    Vectorized across terms: one lexsort of all postings in the group by
    (term, doc_id), then per-term slices are block-encoded. Input postings
    within each run are already doc-sorted; the lexsort is the k-way merge.
    """

    def merge_runs(group: pa.Table) -> pa.Table:
        n_runs = group.num_rows
        if n_runs == 0:
            return pa.table({n: [] for n in MERGED_SCHEMA.names}, schema=MERGED_SCHEMA)
        part = int(group.column("part")[0].as_py())
        bucket = int(group.column("bucket")[0].as_py())
        terms = group.column("term").to_numpy(zero_copy_only=False)
        ns = group.column("n").to_numpy().astype(np.int64)
        docs_bufs = group.column("docs").to_pylist()
        tfs_bufs = group.column("tfs").to_pylist()
        dls_bufs = group.column("dls").to_pylist()

        codes, uniques = pd.factorize(terms, sort=False)
        docs_all = np.concatenate([np.frombuffer(b, dtype=np.int64) for b in docs_bufs])
        tfs_all = np.concatenate([np.frombuffer(b, dtype=np.int32) for b in tfs_bufs])
        dls_all = np.concatenate([np.frombuffer(b, dtype=np.int32) for b in dls_bufs])
        codes_all = np.repeat(codes, ns)

        order = np.lexsort((docs_all, codes_all))
        codes_s = codes_all[order]
        docs_s = docs_all[order]
        tfs_s = tfs_all[order].astype(np.int64)
        dls_s = dls_all[order].astype(np.int64)

        dup = (np.diff(codes_s) == 0) & (np.diff(docs_s) == 0)
        if np.any(dup):
            raise ValueError(
                "duplicate (term, doc_id) postings — input has duplicate "
                "(conv_id, turn_idx) rows; run exact dedup before indexing"
            )

        change = np.nonzero(np.diff(codes_s) != 0)[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(codes_s)]])

        cols: dict[str, list] = {n: [] for n in BLOCK_SCHEMA.names}
        for s, e in zip(starts, ends):
            encode_postings_to_blocks(
                uniques[codes_s[s]],
                docs_s[s:e],
                tfs_s[s:e],
                dls_s[s:e],
                block_size=block_size,
                avgdl=avgdl,
                k1=k1,
                b=b,
                out=cols,
            )
        n_out = len(cols["term"])
        out = {"part": [part] * n_out, "bucket": [bucket] * n_out, **cols}
        return pa.table(out, schema=MERGED_SCHEMA)

    return merge_runs
