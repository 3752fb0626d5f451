"""Tokenize stage: transcripts batches -> staged per-doc term vectors.

The analog of the reference's encode path minus the model: per-batch
normalize + split (``simple_tokenizer.py:135-143``) and per-doc term-frequency
vectorization (the tf analog of token-id framing, ``model/tokenization.py``).

Runs as STATELESS ``map_batches`` tasks (elastic across CPUs; a fixed actor
pool sized to the node starves the read/write operators — the pitfall the
Ray guide warns about). The T1 "load once per worker" pattern
(``executors/clip_torch.py:24-98``) still holds: the compiled regex is
module-level (once per worker process) and the broadcast conv-id -> doc-id
base table is fetched from the object store once per process via
``_CONV_BASE_CACHE``. The truly stateful stage in this engine is the query
scorer (stages/query.py), which IS an actor pool.

Doc-id scheme (SURVEY.md §7.2 step 5): ``doc_id = conv_base[conv_id] +
turn_idx`` where ``conv_base`` is the prefix sum of per-conversation extents
over lexicographically sorted conv_ids — so doc_id order == stable
``(conv_id ASC, turn_idx ASC)`` order without a global sort of the turns
table, and ids are reproducible at any parallelism level. Ids may have gaps
(dropped empty turns); they must only be unique + order-preserving.

Output staging schema (the post-tokenize checkpoint, SURVEY.md §7.5):
    conv_id:string, turn_idx:int32, doc_id:int64, dl:int32,
    terms:list<string>, tfs:list<int32>
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions.tokenizer import tokenize_column_flat

STAGING_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("doc_id", pa.int64()),
        ("dl", pa.int32()),
        ("terms", pa.list_(pa.string())),
        ("tfs", pa.list_(pa.int32())),
    ]
)


class ConvBase:
    """Sorted conv_id -> doc_id base lookup (vectorized via searchsorted).

    Broadcast once with ``ray.put`` and shared read-only by every tokenize
    actor — the small-side-broadcast pattern (ray_guide: joins and lookups).
    At 10^12-turn scale the conv table itself becomes large; the scale path
    is a range-partitioned conv map where each tokenize actor fetches only
    the conv ranges its input shard covers (same searchsorted kernel).
    """

    def __init__(self, conv_ids_sorted: np.ndarray, bases: np.ndarray):
        self.conv_ids = conv_ids_sorted  # object ndarray, lexicographically sorted
        self.bases = bases  # int64 ndarray, same length

    def lookup(self, conv_ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.conv_ids, conv_ids)
        if np.any(pos >= len(self.conv_ids)) or not np.array_equal(
            self.conv_ids[pos], conv_ids
        ):
            missing = conv_ids[
                (pos >= len(self.conv_ids)) | (self.conv_ids[np.minimum(pos, len(self.conv_ids) - 1)] != conv_ids)
            ]
            raise KeyError(f"conv_ids missing from conv base table: {missing[:5]}")
        return self.bases[pos]


def compute_conv_bases(conv_extents: pa.Table) -> ConvBase:
    """conv_extents: (conv_id, max_turn) -> prefix-sum base table.

    Driver-side prefix sum over the (much smaller) conversation table; the
    distributed variant is ``build_sharded_conv_base`` — a two-pass block
    prefix-sum over the sorted conv dataset (per-block sums -> driver scan
    over #blocks -> per-block offset)."""
    t = conv_extents.sort_by("conv_id")
    conv_ids = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
    extents = t.column("max_turn").to_numpy().astype(np.int64) + 1
    bases = np.concatenate([[0], np.cumsum(extents)[:-1]])
    return ConvBase(conv_ids, bases)


class ShardedConvBase:
    """Range-sharded conv_id -> doc-id base map for corpora whose
    CONVERSATION table itself is too large for one process.

    The driver holds only one (first_conv, ObjectRef) pair per shard; a
    tokenize worker routes each batch's conv_ids to shards by binary search
    on the shard boundaries, fetches ONLY the shard tables its batch
    touches (from the object store), and caches them per process. Same
    ``lookup`` contract as ConvBase."""

    def __init__(self, first_convs: np.ndarray, shard_refs: list):
        self.first_convs = first_convs  # object ndarray, sorted
        self.shard_refs = shard_refs
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _shard(self, s: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(s)
        if hit is None:
            import ray

            t = ray.get(self.shard_refs[s])
            hit = (
                np.asarray(t.column("conv_id").to_pylist(), dtype=object),
                t.column("base").to_numpy().astype(np.int64),
            )
            self._cache[s] = hit
        return hit

    def lookup(self, conv_ids: np.ndarray) -> np.ndarray:
        out = np.empty(len(conv_ids), dtype=np.int64)
        sidx = np.searchsorted(self.first_convs, conv_ids, side="right") - 1
        if np.any(sidx < 0):
            raise KeyError(
                f"conv_ids below first shard boundary: {conv_ids[sidx < 0][:5]}"
            )
        for s in np.unique(sidx):
            cids, bases = self._shard(int(s))
            m = sidx == s
            sub = conv_ids[m]
            pos = np.searchsorted(cids, sub)
            bad = (pos >= len(cids)) | (cids[np.minimum(pos, len(cids) - 1)] != sub)
            if np.any(bad):
                raise KeyError(f"conv_ids missing from conv base shards: {sub[bad][:5]}")
            out[m] = bases[pos]
        return out


def _shard_summary(block: pa.Table):
    if block.num_rows == 0:
        return 0, 0, None
    ext = block.column("max_turn").to_numpy().astype(np.int64) + 1
    return block.num_rows, int(ext.sum()), block.column("conv_id")[0].as_py()


def _make_shard(block: pa.Table, base_offset: int) -> pa.Table:
    ext = block.column("max_turn").to_numpy().astype(np.int64) + 1
    bases = base_offset + np.concatenate([[0], np.cumsum(ext)[:-1]])
    return pa.table(
        {
            "conv_id": block.column("conv_id"),
            "max_turn": block.column("max_turn").cast(pa.int64()),
            "base": pa.array(bases, pa.int64()),
        }
    )


def build_sharded_conv_base(extents_ds) -> tuple["ShardedConvBase | None", int]:
    """Distributed two-pass block prefix-sum over a (conv_id, max_turn)
    Dataset — no conversation ever funnels through the driver:

      sort(conv_id) -> per-block (n, sum_extents, first_conv) summaries
      [one tiny row per BLOCK gathered to the driver] -> exclusive scan over
      the #blocks summaries -> one remote task per block attaches absolute
      bases -> shard tables stay in the object store as refs.

    Returns (ShardedConvBase | None-if-empty, n_slots)."""
    import ray

    mat = extents_ds.sort("conv_id").materialize()
    block_refs = [
        bref
        for bundle in mat.iter_internal_ref_bundles()
        for bref in bundle.block_refs
    ]
    summary = ray.remote(num_cpus=1)(_shard_summary)
    sums = ray.get([summary.remote(b) for b in block_refs])
    keep = [(b, s) for b, s in zip(block_refs, sums) if s[0] > 0]
    if not keep:
        return None, 0
    offsets = np.concatenate([[0], np.cumsum([s[1] for _, s in keep])])
    n_slots = int(offsets[-1])
    make = ray.remote(num_cpus=1)(_make_shard)
    shard_refs = [make.remote(b, int(offsets[i])) for i, (b, _) in enumerate(keep)]
    first_convs = np.asarray([s[2] for _, s in keep], dtype=object)
    return ShardedConvBase(first_convs, shard_refs), n_slots


# per-worker-process cache of deserialized broadcast ConvBase objects: the
# tokenize map runs as STATELESS TASKS (elastic across CPUs — a fixed actor
# pool sized to the node starves the read/write stages and can deadlock a
# small cluster), so per-process state lives here instead of an actor.
_CONV_BASE_CACHE: dict[str, "ConvBase"] = {}


def _get_conv_base(conv_base_ref) -> "ConvBase":
    if isinstance(conv_base_ref, ConvBase):
        return conv_base_ref
    if isinstance(conv_base_ref, dict):  # build prep state
        return conv_base_ref["conv_base"]
    import ray

    key = conv_base_ref.hex() if hasattr(conv_base_ref, "hex") else str(conv_base_ref)
    cb = _CONV_BASE_CACHE.get(key)
    if cb is None:
        cb = ray.get(conv_base_ref)
        if isinstance(cb, dict):  # prep-task output: {conv_base, grp_width, ...}
            cb = cb["conv_base"]
        _CONV_BASE_CACHE.clear()  # only ever one live build per worker
        _CONV_BASE_CACHE[key] = cb
    return cb


def tokenize_batch(batch: pa.Table, *, conv_base_ref, lowercase: bool = True) -> pa.Table:
    """Stateless map_batches UDF: transcripts batch -> staging batch."""
    return TokenizeStage(conv_base_ref, lowercase)(batch)


class TokenizeStage:
    """Tokenize UDF body (also usable as a callable class for actor pools)."""

    def __init__(self, conv_base_ref, lowercase: bool = True):
        self.conv_base: ConvBase = _get_conv_base(conv_base_ref)
        self.lowercase = lowercase

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        conv = np.asarray(batch.column("conv_id").to_pylist(), dtype=object)
        turn = batch.column("turn_idx").to_numpy().astype(np.int64)

        flat_tokens, tok_lens = tokenize_column_flat(
            batch.column("text"), lowercase=self.lowercase
        )
        dl = tok_lens.astype(np.int32)
        keep = dl > 0  # drop-empty rule (helper.py:82-86 analog)

        doc_id = self.conv_base.lookup(conv) + turn
        idx = np.nonzero(keep)[0]
        if len(idx) == 0:
            return STAGING_SCHEMA.empty_table()

        # batch-level tf vectorization over the FLAT token array: one Arrow
        # dictionary_encode (C++) + sorted-code remap replaces the object
        # array flatten + pd.factorize(sort=True) — token-identical, since
        # UTF-8 byte order == codepoint order == Python str comparison
        denc = flat_tokens.dictionary_encode()
        raw_codes = denc.indices.to_numpy().astype(np.int64)
        dict_arr = denc.dictionary
        sort_idx = pc.array_sort_indices(dict_arr)
        rank = np.empty(len(dict_arr), np.int64)
        rank[sort_idx.to_numpy()] = np.arange(len(dict_arr))
        codes = rank[raw_codes]
        uniques_arr0 = dict_arr.take(sort_idx)

        lens = tok_lens[idx]
        # tokens belong only to non-empty rows; renumber to kept positions
        row_of_tok = np.repeat(np.arange(len(idx)), lens)
        order = np.lexsort((codes, row_of_tok))
        row_s, code_s = row_of_tok[order], codes[order]
        change = np.nonzero((np.diff(row_s) != 0) | (np.diff(code_s) != 0))[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(code_s)]])
        tfs_flat = (ends - starts).astype(np.int32)
        seg_row = row_s[starts]
        seg_code = code_s[starts]
        # per-row offsets into the (doc, term) segments
        n_rows = len(idx)
        terms_per_row = np.bincount(seg_row, minlength=n_rows)
        offsets = np.concatenate([[0], np.cumsum(terms_per_row)]).astype(np.int32)

        flat_terms = uniques_arr0.take(pa.array(seg_code, pa.int64()))
        terms_col = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat_terms)
        tfs_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(tfs_flat, pa.int32())
        )

        return pa.table(
            {
                "conv_id": pa.array(conv[idx], pa.string()),
                "turn_idx": pa.array(turn[idx].astype(np.int32), pa.int32()),
                "doc_id": pa.array(doc_id[idx], pa.int64()),
                "dl": pa.array(dl[idx], pa.int32()),
                "terms": terms_col,
                "tfs": tfs_col,
            },
            schema=STAGING_SCHEMA,
        )
