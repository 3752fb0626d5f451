"""Deduplication stages: exact, MinHash+LSH, SimHash, word-set Jaccard.

The training-data dedup suite (SURVEY.md §2.8 extension — the reference's
only dedup-like behavior is AnnLite last-write-wins upsert by doc id).
Each operator follows the canonical shape from the Ray guide:

  vectorized signature map_batches
    -> explode to (bucket_key, doc_id) rows
    -> groupby(bucket keys)            # the only shuffle, on small sig rows
    -> candidate pairs
    -> exact verify on the (provably small) candidate set

The minhash verify is a PAIR-KEYED SHUFFLE (``_verify_pairs_distributed``):
one corpus pass emits candidate shingle blobs keyed by pair id (broadcast
pair membership, vectorized ``pc.is_in`` filter), then a ``groupby(pair)``
computes exact Jaccard with both sides co-located — no driver gather of
shingles. SimHash verifies Hamming distance INSIDE its band buckets (the
band rows carry the full 64-bit signature), so neither near-dup family has
a driver-side verify tail.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from clip_as_service_ray.functions import minhash as mh
from clip_as_service_ray.functions.guards import guard_candidate_pairs
from clip_as_service_ray.functions.partitions import (
    parts_for_dataset,
    shuffle_partitions,
)
from clip_as_service_ray.functions.tokenizer import tokenize_column_flat

PAIRS_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
)
SIMHASH_PAIRS_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
)


def _doc_shingles(col, shingle_n: int) -> list[np.ndarray]:
    """Per-doc shingle-hash sets from an Arrow text column. One vectorized
    tokenize for the batch, crc+mix once per DISTINCT token (zipfian text
    makes that a large constant factor), gather to the flat token stream,
    then per-doc n-gram combine. Hash-identical to the per-doc scalar path
    (the hash depends only on the token string)."""
    tokens, lens = tokenize_column_flat(col)
    if len(tokens) == 0:
        return [np.array([], dtype=np.uint64) for _ in range(len(lens))]
    denc = tokens.dictionary_encode()
    codes = denc.indices.to_numpy().astype(np.int64)
    uniq_h = mh.hash_terms(np.asarray(denc.dictionary.to_pylist(), dtype=object))
    tok_h = uniq_h[codes]
    out = []
    p = 0
    for n in lens:
        q = p + int(n)
        out.append(
            mh.shingle_hashes(tok_h[p:q], n=shingle_n)
            if n
            else np.array([], dtype=np.uint64)
        )
        p = q
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
        shingle_sets = _doc_shingles(batch.column("text"), self.shingle_n)
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


_PAIR_SH_SCHEMA = pa.schema(
    [("pair", pa.int64()), ("doc_id", pa.int64()), ("sh", pa.binary())]
)


def _verify_pairs_distributed(
    ds, pairs: np.ndarray, shingle_n: int, threshold: float
) -> pa.Table:
    """Pair-keyed SHUFFLE verify (the cluster-scale verify tail): one pass
    over the corpus emits each candidate doc's shingle set once per pair it
    participates in, keyed by pair id; a groupby(pair) then computes exact
    Jaccard with both sides co-located. The only driver-side state is the
    candidate pair list itself (≪ corpus by LSH construction), broadcast
    via ray.put. The candidate filter is a vectorized ``pc.is_in`` — no
    per-row Python membership loop."""
    import pyarrow.compute as pc
    import ray

    memb: dict[int, list] = {}
    for pi, (a, b) in enumerate(pairs):
        memb.setdefault(int(a), []).append(pi)
        memb.setdefault(int(b), []).append(pi)
    memb_ref = ray.put(memb)
    ids_arr = pa.array(np.unique(pairs).astype(np.int64), pa.int64())
    ids_ref = ray.put(ids_arr)

    class EmitPairShingles:
        def __init__(self):
            self.memb = ray.get(memb_ref)
            self.ids = ray.get(ids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column("doc_id"), value_set=self.ids)
            sub = batch.filter(mask)
            if sub.num_rows == 0:
                return _PAIR_SH_SCHEMA.empty_table()
            sh = _doc_shingles(sub.column("text"), shingle_n)
            out_pair, out_doc, out_sh = [], [], []
            for did, s in zip(sub.column("doc_id").to_numpy(), sh):
                blob = s.tobytes()
                for pi in self.memb.get(int(did), ()):
                    out_pair.append(pi)
                    out_doc.append(int(did))
                    out_sh.append(blob)
            return pa.table(
                {"pair": pa.array(out_pair, pa.int64()),
                 "doc_id": pa.array(out_doc, pa.int64()),
                 "sh": pa.array(out_sh, pa.binary())},
                schema=_PAIR_SH_SCHEMA,
            )

    def verify_group(g: pa.Table) -> pa.Table:
        docs = np.asarray(g.column("doc_id").to_pylist(), dtype=np.int64)
        if len(docs) < 2:
            return PAIRS_SCHEMA.empty_table()
        blobs = g.column("sh").to_pylist()
        order = np.argsort(docs, kind="stable")
        a, b = int(docs[order[0]]), int(docs[order[1]])
        j = mh.jaccard(
            np.frombuffer(blobs[order[0]], np.uint64),
            np.frombuffer(blobs[order[1]], np.uint64),
        )
        if j < threshold:
            return PAIRS_SCHEMA.empty_table()
        return pa.table(
            {"doc_a": pa.array([a], pa.int64()), "doc_b": pa.array([b], pa.int64()),
             "jaccard": pa.array([round(j, 6)], pa.float64())},
            schema=PAIRS_SCHEMA,
        )

    out = (
        ds.map_batches(EmitPairShingles, batch_format="pyarrow", concurrency=2)
        .groupby("pair", num_partitions=shuffle_partitions(len(pairs) * 16_384))
        .map_groups(verify_group, batch_format="pyarrow")
        .to_pandas()
    )
    if len(out) == 0:
        return PAIRS_SCHEMA.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False).cast(PAIRS_SCHEMA)


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
        band_rows.groupby(["band", "band_hash"], num_partitions=parts_for_dataset(ds))
        .map_groups(_bucket_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if len(cand) == 0:
        return PAIRS_SCHEMA.empty_table()
    pairs = guard_candidate_pairs(
        np.unique(cand[["doc_a", "doc_b"]].to_numpy(), axis=0),
        stage="minhash_lsh_pairs",
    )
    verified = _verify_pairs_distributed(ds, pairs, shingle_n, threshold)
    return verified.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


class SimHashBands:
    """map_batches UDF: documents batch -> (band, band_val, doc_id, simhash)
    LSH rows. Carrying the full 64-bit signature in every band row means the
    verify (Hamming distance) runs INSIDE the bucket group with no second
    pass — fully distributed, one shuffle of tiny rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        tokens, lens = tokenize_column_flat(batch.column("text"))
        denc = tokens.dictionary_encode()
        codes = denc.indices.to_numpy().astype(np.int64) if len(tokens) else np.array([], np.int64)
        uniq_h = (
            mh.hash_terms(np.asarray(denc.dictionary.to_pylist(), dtype=object))
            if len(tokens)
            else np.array([], np.uint64)
        )
        sims = []
        p = 0
        for n in lens:
            q = p + int(n)
            if n:
                # per-doc (unique term hash, tf) pairs from the code slice —
                # same votes as np.unique over the doc's term strings
                u, c = np.unique(codes[p:q], return_counts=True)
                sims.append(int(mh.simhash(uniq_h[u], c)))
            else:
                sims.append(0)
            p = q
        hashes = np.array(sims, dtype=np.uint64)
        bands, vals, docs, sigs = [], [], [], []
        for band in range(4):
            bands.append(np.full(len(doc_ids), band, dtype=np.int64))
            vals.append(
                ((hashes >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
            )
            docs.append(doc_ids)
            sigs.append(hashes)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands), pa.int64()),
                "band_val": pa.array(np.concatenate(vals), pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
                "simhash": pa.array(np.concatenate(sigs), pa.uint64()),
            }
        )


def _simhash_bucket_pairs(max_hamming: int):
    def bucket_pairs(group: pa.Table) -> pa.Table:
        docs = group.column("doc_id").to_numpy().astype(np.int64)
        sigs = group.column("simhash").to_numpy().astype(np.uint64)
        order = np.argsort(docs, kind="stable")
        docs, sigs = docs[order], sigs[order]
        keep = np.concatenate([[True], docs[1:] != docs[:-1]])  # unique per bucket
        docs, sigs = docs[keep], sigs[keep]
        if len(docs) < 2:
            return SIMHASH_PAIRS_SCHEMA.empty_table()
        if len(docs) > 200:  # no silent caps: bounded but visible
            import logging

            logging.getLogger(__name__).warning(
                "simhash bucket with %d docs capped to first 200", len(docs)
            )
            docs, sigs = docs[:200], sigs[:200]
        ia, ib = np.triu_indices(len(docs), k=1)
        ham = mh.hamming64(sigs[ia], sigs[ib])
        ok = ham <= max_hamming
        return pa.table(
            {"doc_a": pa.array(docs[ia][ok], pa.int64()),
             "doc_b": pa.array(docs[ib][ok], pa.int64()),
             "hamming": pa.array(ham[ok], pa.int64())},
            schema=SIMHASH_PAIRS_SCHEMA,
        )

    return bucket_pairs


def simhash_pairs(ds, *, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup pairs: 4x16-bit band LSH (any pair within Hamming
    distance 3 shares >=1 exact 16-bit band), verified exactly INSIDE the
    bucket groups (distributed — the signature rows carry the full sig, so
    no driver pandas pass and no second corpus scan). Pairs found in
    multiple bands dedupe on the (small) result."""
    pairs_fn = _simhash_bucket_pairs(max_hamming)
    out = (
        ds.map_batches(SimHashBands(), batch_format="pyarrow")
        .groupby(["band", "band_val"], num_partitions=parts_for_dataset(ds))
        .map_groups(pairs_fn, batch_format="pyarrow")
        .to_pandas()
    )
    if len(out) == 0:
        return SIMHASH_PAIRS_SCHEMA.empty_table()
    out = out.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
    return pa.Table.from_pandas(out, preserve_index=False).cast(SIMHASH_PAIRS_SCHEMA)


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


def dedup_turns(ds, num_buckets: int = 64):
    """Exact (conv_id, turn_idx) dedup for idempotent re-ingest (SURVEY.md
    §2.8): keep the first row per key under a deterministic order (ts, then
    text) — the AnnLite upsert-by-id analog made first-write-wins. Run
    before build_index when the input may carry replayed/duplicated turns.

    Shape: the shuffle key is a SALTED BUCKET (hash of the logical key mod
    num_buckets), so the group UDF runs once per bucket over many keys and
    dedups the whole bucket with one vectorized lexsort + first-of-key mask
    — not once per (tiny) key group. Same result, ~num_rows/num_buckets
    rows per UDF call instead of ~1."""
    import zlib

    def add_bucket(batch: pa.Table) -> pa.Table:
        convs = batch.column("conv_id").to_pylist()
        turns = batch.column("turn_idx").to_numpy()
        h = np.fromiter(
            (zlib.crc32(f"{c}\x1f{t}".encode()) for c, t in zip(convs, turns)),
            dtype=np.int64, count=batch.num_rows,
        )
        return batch.append_column("_bucket", pa.array(h % num_buckets, pa.int64()))

    def first_per_key(group: pa.Table) -> pa.Table:
        conv = np.asarray(group.column("conv_id").to_pylist(), dtype=object)
        turn = group.column("turn_idx").to_numpy().astype(np.int64)
        ts = group.column("ts").cast(pa.int64()).to_numpy()
        text = np.asarray(group.column("text").to_pylist(), dtype=object)
        order = np.lexsort((text, ts, turn, conv))
        conv_s, turn_s = conv[order], turn[order]
        first = np.concatenate(
            [[True], (conv_s[1:] != conv_s[:-1]) | (turn_s[1:] != turn_s[:-1])]
        )
        keep = pa.array(order[first], pa.int64())
        return group.take(keep).drop_columns(["_bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=parts_for_dataset(ds))
        .map_groups(first_per_key, batch_format="pyarrow")
    )


def _levenshtein_capped(a: str, b: str, cap: int) -> int:
    """Banded Levenshtein with early abandon: returns the exact distance if
    <= cap, else cap+1. Row DP vectorized over one string (the sequential
    insertion dependency is resolved by the min-accumulate-minus-index
    trick), O(|a|*|b|) worst case but abandons when a whole row exceeds cap."""
    if a == b:
        return 0
    na, nb = len(a), len(b)
    if abs(na - nb) > cap:
        return cap + 1
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    idx = np.arange(nb + 1)
    prev = idx.copy()
    for i in range(1, na + 1):
        sub = prev[:-1] + (bb != aa[i - 1])
        cand = np.minimum(prev[1:] + 1, sub)
        full = np.concatenate(([i], cand))
        prev = np.minimum.accumulate(full - idx) + idx
        if prev.min() > cap:
            return cap + 1
    return int(prev[-1])


def _osa_capped(a: str, b: str, cap: int) -> int:
    """Banded optimal-string-alignment distance (restricted
    Damerau-Levenshtein — the Lucene/ES ``fuzziness`` metric with
    ``transpositions=true``: an adjacent transposition costs ONE edit).
    Same row DP + min-accumulate insertion-chain trick as
    ``_levenshtein_capped``, plus the ``d[i-2][j-2] + 1`` transposition
    candidate where a[i-1]==b[j-2] and a[i-2]==b[j-1]; early abandon when a
    whole row exceeds ``cap``."""
    if a == b:
        return 0
    na, nb = len(a), len(b)
    if abs(na - nb) > cap:
        return cap + 1
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    idx = np.arange(nb + 1)
    prev = idx.copy()
    prev2 = None
    for i in range(1, na + 1):
        sub = prev[:-1] + (bb != aa[i - 1])
        cand = np.minimum(prev[1:] + 1, sub)
        if i >= 2 and nb >= 2:
            m = (bb[:-1] == aa[i - 1]) & (bb[1:] == aa[i - 2])
            cand[1:] = np.minimum(
                cand[1:], np.where(m, prev2[:-2] + 1, cap + 2)
            )
        full = np.concatenate(([i], cand))
        new = np.minimum.accumulate(full - idx) + idx
        if new.min() > cap:
            return cap + 1
        prev2, prev = prev, new
    return int(prev[-1])


def _edit_band_pairs(max_dist: int):
    """Group UDF factory: one length band -> verified near-dup pairs.

    A pair is counted in the band max(orig_band_a, orig_band_b) only, so
    replication (each doc lives in its own band and the next) never double
    counts."""

    def pairs_fn(group: pa.Table) -> pa.Table:
        band = int(group.column("band")[0].as_py())
        ids = group.column("doc_id").to_numpy()
        obs = group.column("orig_band").to_numpy()
        texts = group.column("text").to_pylist()
        order = np.argsort(ids, kind="stable")
        out_a, out_b, out_d = [], [], []
        for x in range(len(order)):
            i = order[x]
            for y in range(x + 1, len(order)):
                j = order[y]
                if max(int(obs[i]), int(obs[j])) != band:
                    continue
                if abs(len(texts[i]) - len(texts[j])) > max_dist:
                    continue
                d = _levenshtein_capped(texts[i], texts[j], max_dist)
                if d <= max_dist:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_d.append(d)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "dist": pa.array(out_d, pa.int64()),
            }
        )

    return pairs_fn


def edit_distance_pairs(ds, *, max_dist: int = 20) -> "object":
    """Distributed edit-distance near-dup pairs over (doc_id, text) rows:
    LENGTH-BAND blocking (band width max_dist+1: a qualifying pair's bands
    differ by at most 1, so each doc replicates into its own band and the
    next — candidates co-locate in ONE groupby, never all-pairs), then
    exact banded-Levenshtein verify inside each band group. Returns a lazy
    Dataset of (doc_a < doc_b, dist).

    Scale note: a length band is O(corpus at that length) and the verify is
    O(band^2) DPs — right for the bounded/fuzzy-matching use (short keys,
    titles, near-identical record linkage). For corpus-scale near-dup the
    MinHash-LSH route above is the primary; composing it as a prefilter
    INSIDE each band (bucket on shingles before the DP) bounds the
    quadratic term when a length band is hot."""
    width = max_dist + 1

    def to_bands(batch: pa.Table) -> pa.Table:
        lens = pc.utf8_length(batch.column("text")).to_numpy().astype(np.int64)
        ob = lens // width
        n = batch.num_rows
        return pa.table(
            {
                "band": pa.array(np.concatenate([ob, ob + 1]), pa.int64()),
                "orig_band": pa.array(np.concatenate([ob, ob]), pa.int64()),
                "doc_id": pa.concat_arrays(
                    [batch.column("doc_id").combine_chunks()] * 2
                    if isinstance(batch.column("doc_id"), pa.ChunkedArray)
                    else [batch.column("doc_id")] * 2
                ),
                "text": pa.concat_arrays(
                    [batch.column("text").combine_chunks()] * 2
                    if isinstance(batch.column("text"), pa.ChunkedArray)
                    else [batch.column("text")] * 2
                ),
            }
        )

    return (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby("band", num_partitions=parts_for_dataset(ds))
        .map_groups(_edit_band_pairs(max_dist), batch_format="pyarrow")
    )


DUP_SPAN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("dup_tokens", pa.int64())]
)
_SPAN_ROWS_SCHEMA = pa.schema(
    [("_bucket", pa.int64()), ("g", pa.string()),
     ("doc_id", pa.int64()), ("start", pa.int64())]
)
_SPAN_OCC_SCHEMA = pa.schema([("doc_id", pa.int64()), ("start", pa.int64())])


def dup_span_coverage(ds, *, n: int = 8, num_buckets: int = 64):
    """Exact duplicated-substring coverage (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — the span-REMOVAL form of
    exact substring dedup): for each doc, the number of token positions
    covered by at least one n-token shingle that also occurs in ANOTHER
    document. ``ds``: (doc_id, text).

    Shape (two shuffles, both on narrow rows):
      1. vectorized shingling (flat token stream, n shifted slices) ->
         (bucket, gram, doc, start) rows; the bucket is a rolling-hash of
         the gram so every occurrence of a gram lands in ONE group — the
         hash only ROUTES, in-bucket equality is exact string equality via
         dictionary-encode, so hash collisions cannot merge distinct grams;
      2. per bucket: distinct-doc count per gram (one lexsort + flag
         reduceat), emit the occurrences of cross-doc grams only;
      3. per doc bucket: interval union |[start, start+n)| via sorted-diff
         arithmetic (coverage = n per run head + min(gap, n) per follower).

    The suffix-array formulation of the paper finds UNBOUNDED-length
    duplicate spans; the n-gram formulation here finds every span of
    length >= n (any longer duplicate is a union of overlapping n-grams,
    which the interval union reassembles exactly), which is the form the
    paper's public implementation exposes as its threshold parameter."""
    from clip_as_service_ray.functions import minhash as mh

    def shingle_rows(batch: pa.Table) -> pa.Table:
        tokens, lens = tokenize_column_flat(batch.column("text"))
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        L = len(tokens)
        n_rows = len(lens)
        if L < n or n_rows == 0:
            return _SPAN_ROWS_SCHEMA.empty_table()
        row = np.repeat(np.arange(n_rows), lens)
        ok = row[: L - n + 1] == row[n - 1 :]
        if not ok.any():
            return _SPAN_ROWS_SCHEMA.empty_table()
        okp = pa.array(ok)
        slices = [tokens.slice(j, L - n + 1).filter(okp) for j in range(n)]
        grams = pc.binary_join_element_wise(*slices, " ")
        flatpos = np.nonzero(ok)[0]
        r = row[: L - n + 1][ok]
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        start = flatpos - offs[r]
        th = mh.hash_terms(np.asarray(tokens.to_pylist(), dtype=object))
        muls = mh._shingle_muls(n)
        acc = np.zeros(L - n + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(n):
                acc = acc ^ (th[i : L - n + 1 + i] * muls[i])
        b = (acc[ok] % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {"_bucket": pa.array(b, pa.int64()),
             "g": grams.combine_chunks() if hasattr(grams, "combine_chunks") else grams,
             "doc_id": pa.array(ids[r], pa.int64()),
             "start": pa.array(start, pa.int64())},
            schema=_SPAN_ROWS_SCHEMA,
        )

    def emit_cross_doc(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _SPAN_OCC_SCHEMA.empty_table()
        g = group.column("g")
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        doc = group.column("doc_id").to_numpy().astype(np.int64)
        start = group.column("start").to_numpy().astype(np.int64)
        order = np.lexsort((doc, codes))
        cs, ds_ = codes[order], doc[order]
        new_code = np.concatenate([[True], cs[1:] != cs[:-1]])
        new_pair = new_code | np.concatenate([[True], ds_[1:] != ds_[:-1]])
        seg = np.nonzero(new_code)[0]
        ndocs = np.add.reduceat(new_pair.astype(np.int64), seg)
        dup_codes = cs[seg][ndocs >= 2]
        keep = np.isin(codes, dup_codes)
        return pa.table(
            {"doc_id": pa.array(doc[keep], pa.int64()),
             "start": pa.array(start[keep], pa.int64())},
            schema=_SPAN_OCC_SCHEMA,
        )

    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        return batch.append_column(
            "_db", pa.array((d % num_buckets).astype(np.int64), pa.int64())
        )

    SHIFT = np.int64(1) << np.int64(32)

    def coverage(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return DUP_SPAN_SCHEMA.empty_table()
        doc = group.column("doc_id").to_numpy().astype(np.int64)
        start = group.column("start").to_numpy().astype(np.int64)
        key = np.unique(doc * SHIFT + start)  # start < 2^32 per doc
        doc_u = key // SHIFT
        st = key - doc_u * SHIFT
        seg = np.concatenate([[0], np.nonzero(np.diff(doc_u))[0] + 1])
        contrib = np.empty(len(st), dtype=np.int64)
        contrib[0] = n
        if len(st) > 1:
            contrib[1:] = np.minimum(np.diff(st), n)
        contrib[seg] = n
        tot = np.add.reduceat(contrib, seg)
        return pa.table(
            {"doc_id": pa.array(doc_u[seg], pa.int64()),
             "dup_tokens": pa.array(tot, pa.int64())},
            schema=DUP_SPAN_SCHEMA,
        )

    return (
        ds.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=parts_for_dataset(ds))
        .map_groups(emit_cross_doc, batch_format="pyarrow")
        .map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("_db", num_partitions=parts_for_dataset(ds))
        .map_groups(coverage, batch_format="pyarrow")
    )
