"""Deduplication stages: exact, MinHash+LSH, SimHash, word-set Jaccard.

The training-data dedup suite (SURVEY.md §2.8 extension — the reference's
only dedup-like behavior is AnnLite last-write-wins upsert by doc id).
Each operator follows the canonical shape from the Ray guide:

  vectorized signature map_batches
    -> explode to (bucket_key, doc_id) rows
    -> groupby(bucket keys)            # the only shuffle, on small sig rows
    -> candidate pairs
    -> exact verify on the (provably small) candidate set

The verify step gathers candidate texts with a broadcast id-set filter and
verifies on the driver — valid while candidates ≪ corpus (log a warning
otherwise); the cluster-scale path is a pair-keyed join of shingle blobs and
a distributed verify map, same kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions import minhash as mh
from clip_as_service_ray.functions.tokenizer import tokenize_texts

PAIRS_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
)
SIMHASH_PAIRS_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
)


def _doc_shingles(texts: list[str], shingle_n: int) -> list[np.ndarray]:
    out = []
    for terms in tokenize_texts(texts):
        if not terms:
            out.append(np.array([], dtype=np.uint64))
            continue
        th = mh.hash_terms(np.asarray(terms, dtype=object))
        out.append(mh.shingle_hashes(th, n=shingle_n))
    return out


class MinHashBands:
    """Actor-pool UDF: documents batch -> (band, band_hash, doc_id) rows.
    Permutation parameters generated once per actor (seeded, identical
    everywhere)."""

    def __init__(self, num_perm: int, bands: int, shingle_n: int):
        self.a, self.b = mh.minhash_params(num_perm)
        self.bands = bands
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        shingle_sets = _doc_shingles(batch.column("text").to_pylist(), self.shingle_n)
        rows_doc, rows_band, rows_hash = [], [], []
        for did, sh in zip(doc_ids, shingle_sets):
            if len(sh) == 0:
                continue
            sig = mh.minhash_signature(sh, self.a, self.b)
            bh = mh.band_hashes(sig, self.bands)
            rows_doc.append(np.full(self.bands, did, dtype=np.int64))
            rows_band.append(np.arange(self.bands, dtype=np.int64))
            rows_hash.append(bh.astype(np.int64))  # reinterpret ok: bucket key only
        if not rows_doc:
            return pa.table(
                {"band": pa.array([], pa.int64()), "band_hash": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "band": pa.array(np.concatenate(rows_band), pa.int64()),
                "band_hash": pa.array(np.concatenate(rows_hash), pa.int64()),
                "doc_id": pa.array(np.concatenate(rows_doc), pa.int64()),
            }
        )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs within one LSH bucket (cap + log giant buckets)."""
    docs = np.unique(group.column("doc_id").to_numpy())
    if len(docs) < 2:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    if len(docs) > 200:  # no silent caps: keep pairs bounded but visible
        import logging

        logging.getLogger(__name__).warning(
            "LSH bucket with %d docs capped to first 200 for pairing", len(docs)
        )
        docs = docs[:200]
    ia, ib = np.triu_indices(len(docs), k=1)
    return pa.table({"doc_a": pa.array(docs[ia], pa.int64()), "doc_b": pa.array(docs[ib], pa.int64())})


def _gather_shingles(ds, doc_ids: np.ndarray, shingle_n: int) -> dict[int, np.ndarray]:
    """Second pass over the corpus restricted to candidate ids (broadcast
    id-set semi-join filter), tokenize, return shingle sets."""
    import ray

    id_ref = ray.put(set(int(x) for x in doc_ids))

    class Filter:
        def __init__(self):
            self.ids = ray.get(id_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = np.fromiter(
                (int(d) in self.ids for d in batch.column("doc_id").to_numpy()),
                dtype=bool, count=batch.num_rows,
            )
            return batch.filter(pa.array(keep))

    sub = ds.map_batches(Filter, batch_format="pyarrow", concurrency=2).to_pandas()
    sh = _doc_shingles(sub["text"].tolist(), shingle_n)
    return dict(zip(sub["doc_id"].astype(int).tolist(), sh))


def minhash_lsh_pairs(
    ds,
    *,
    num_perm: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> pa.Table:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified. ds: Dataset with
    (doc_id, text). Returns PAIRS_SCHEMA sorted by (doc_a, doc_b)."""
    band_rows = ds.map_batches(
        MinHashBands,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_n": shingle_n},
        batch_format="pyarrow",
        concurrency=2,
    )
    cand = (
        band_rows.groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if len(cand) == 0:
        return PAIRS_SCHEMA.empty_table()
    pairs = np.unique(cand[["doc_a", "doc_b"]].to_numpy(), axis=0)
    ids = np.unique(pairs)
    shingles = _gather_shingles(ds, ids, shingle_n)
    out_a, out_b, out_j = [], [], []
    for a, b in pairs:
        j = mh.jaccard(shingles.get(int(a), np.array([], np.uint64)),
                       shingles.get(int(b), np.array([], np.uint64)))
        if j >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(round(j, 6))
    return pa.table(
        {"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64()),
         "jaccard": pa.array(out_j, pa.float64())},
    ).sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


class SimHashStage:
    """map_batches UDF: documents batch -> (doc_id, simhash, band rows)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        sims = []
        for terms in tokenize_texts(batch.column("text").to_pylist()):
            if not terms:
                sims.append(0)
                continue
            u, c = np.unique(np.asarray(terms, dtype=object), return_counts=True)
            sims.append(int(mh.simhash(mh.hash_terms(u), c)))
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "simhash": pa.array(np.array(sims, dtype=np.uint64), pa.uint64())}
        )


def simhash_pairs(ds, *, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup pairs: 4x16-bit band LSH (any pair within Hamming
    distance 3 shares >=1 exact 16-bit band), verified exactly."""
    sigs = ds.map_batches(SimHashStage(), batch_format="pyarrow").to_pandas()
    doc_ids = sigs["doc_id"].to_numpy().astype(np.int64)
    hashes = sigs["simhash"].to_numpy().astype(np.uint64)
    # band explode (driver-side on the small signature table; distributed
    # variant: same groupby pattern as minhash_lsh_pairs)
    cand = set()
    for band in range(4):
        vals = (hashes >> np.uint64(16 * band)) & np.uint64(0xFFFF)
        order = np.argsort(vals, kind="stable")
        vs, ds_ = vals[order], doc_ids[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(vs))[0] + 1, [len(vs)]])
        for s, e in zip(starts[:-1], starts[1:]):
            if e - s > 1:
                grp = np.sort(ds_[s:e])
                for i in range(len(grp)):
                    for j in range(i + 1, len(grp)):
                        cand.add((int(grp[i]), int(grp[j])))
    if not cand:
        return SIMHASH_PAIRS_SCHEMA.empty_table()
    by_id = dict(zip(doc_ids.tolist(), hashes.tolist()))
    pairs = sorted(cand)
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    ham = mh.hamming64(
        np.array([by_id[x] for x in a], dtype=np.uint64),
        np.array([by_id[x] for x in b], dtype=np.uint64),
    )
    keep = ham <= max_hamming
    return pa.table(
        {"doc_a": pa.array(a[keep], pa.int64()), "doc_b": pa.array(b[keep], pa.int64()),
         "hamming": pa.array(ham[keep], pa.int64())}
    )


def word_jaccard_pairs(ds, *, max_id: int = 150, threshold: float = 0.75) -> pa.Table:
    """Exact word-set Jaccard pairs among doc_id < max_id (the SQL-checkable
    small-subset oracle for the Jaccard family; whitespace tokens, lowered).
    """
    sub = (
        ds.map_batches(
            lambda t: t.filter(pa.compute.less(t["doc_id"], pa.scalar(max_id))),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    ids = sub["doc_id"].to_numpy().astype(np.int64)
    sets = [frozenset((t or "").lower().split()) for t in sub["text"]]
    out_a, out_b, out_j = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i]) + len(sets[j]) - inter
            jac = inter / union if union else 1.0
            if jac >= threshold:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[j]))
                out_j.append(round(jac, 6))
    return pa.table(
        {"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64()),
         "jaccard": pa.array(out_j, pa.float64())}
    )


def dedup_turns(ds):
    """Exact (conv_id, turn_idx) dedup for idempotent re-ingest (SURVEY.md
    §2.8): hash-partition on the key, keep the first row per group under a
    deterministic order (ts, then text) — the AnnLite upsert-by-id analog
    made first-write-wins. Run before build_index when the input may carry
    replayed/duplicated turns."""

    def first_per_key(group):
        import pandas as pd  # noqa: F401  (batch_format pandas)

        return group.sort_values(["ts", "text"]).head(1)

    return ds.groupby(["conv_id", "turn_idx"]).map_groups(
        first_per_key, batch_format="pandas"
    )
