"""Distributed suffix array over the corpus token stream (prefix doubling).

The exact-substring dedup of Lee et al. 2022 ("Deduplicating Training Data
Makes Language Models Better", arXiv:2107.06499) is built on a suffix array
of the concatenated corpus; ``stages/dedup.py``'s gram-routed span dedup
approximates it at a FIXED span length. This module builds the real thing —
variable-length matches — with the Manber–Myers prefix-doubling scheme
expressed in Ray Data primitives:

- The corpus becomes one global token stream ``(pos, code)``: documents are
  dictionary-coded against the sorted vocabulary and terminated by a
  per-document UNIQUE sentinel code (``V + doc_id``), so no suffix
  comparison ever crosses a document boundary and every suffix is globally
  unique (termination is guaranteed, not assumed).
- Each doubling iteration ``L -> 2L`` is exactly two distributed steps:
  (1) a position-bucket-routed exchange that pairs ``rank[i]`` with
  ``rank[i+L]`` (a contiguous-range hash join: both sides route to
  ``pos // bucket_rows``, each bucket merges with one searchsorted), and
  (2) one global 2-key sort of ``(r1, r2)`` followed by the
  O(1)-per-block-summary + driver-scan dense-rank assignment — the same
  shape as ``stages/rank.py`` (summaries carry counts and boundary keys,
  never rows; blocks go straight back into a Dataset via
  ``from_arrow_refs``).
- The loop stops at the first level ``2L`` with no duplicate group; the
  last duplicate level ``L*`` brackets the longest repeated sequence:
  ``L* <= LRS < 2L*``. Iteration count is therefore ``O(log LRS)`` — it
  tracks the corpus's actual repetition, not the document length.
- Candidates = members of the surviving duplicate groups at ``L*``
  (driver-guarded, ``functions/guards.py`` policy). Their exact pairwise
  LCPs come from token WINDOWS of width ``2L*`` fetched in one broadcast
  probe over the stream — bounded data, no full-suffix materialization.
  Within a group, sorting members by their window prefix IS suffix order
  (no two suffixes share a ``2L*`` prefix), so adjacent common-prefix
  lengths are exact and the classic SA/LCP argument applies: the longest
  repeated sequence is the maximal adjacent LCP, its occurrence count is
  the size of the maximal run of adjacent suffixes sharing it.

Space note: prefix doubling keeps one ``(pos, rank)`` dataset (24 B/row)
live per level plus its predecessor — the documented trade-off vs Kasai's
inherently sequential LCP construction. At 100 TB the stream and rank
tables live in the object store and spill; every driver-side structure is
bucket- or vocabulary-sized except the guarded candidate list.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions.guards import max_candidate_pairs
from clip_as_service_ray.functions.partitions import shuffle_partitions
from clip_as_service_ray.functions.tokenizer import tokenize_column_flat

logger = logging.getLogger(__name__)

_ROW_BYTES = 24  # (pos, rank) int64 pair + arrow overhead, rough


# ---------------------------------------------------------------------------
# token stream


def token_stream(docs_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """documents Dataset -> (stream Dataset of (pos, code), vocab, n_total).

    Codes are ranks in the SORTED vocabulary (lexicographic = initial
    suffix order on the first token); each document is terminated by the
    unique sentinel code ``len(vocab) + doc_id``. Global positions are
    assigned with the count-only block-offset pass (no row data reaches
    the driver)."""
    import ray
    import ray.data

    def vocab_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tokens, _ = tokenize_column_flat(batch.column(text_col))
        return pa.table({"term": pc.unique(tokens)})

    parts = docs_ds.map_batches(vocab_partial, batch_format="pyarrow").to_pandas()
    vocab = np.unique(parts["term"].to_numpy(dtype=object))
    n_vocab = len(vocab)
    vref = ray.put(vocab)

    def code_stream(batch: pa.Table) -> pa.Table:
        vocab = ray.get(vref)
        doc_ids = batch.column(id_col).to_numpy()
        tokens, lens = tokenize_column_flat(batch.column(text_col))
        if len(tokens):
            denc = tokens.dictionary_encode()
            dterms = denc.dictionary.to_numpy(zero_copy_only=False)
            dcodes = np.searchsorted(vocab, dterms).astype(np.int64)
            codes = dcodes[denc.indices.to_numpy().astype(np.int64)]
        else:
            codes = np.array([], np.int64)
        total = int(codes.size) + len(doc_ids)
        out = np.empty(total, np.int64)
        sent_pos = np.cumsum(lens.astype(np.int64) + 1) - 1
        mask = np.ones(total, bool)
        mask[sent_pos] = False
        out[mask] = codes
        out[sent_pos] = n_vocab + doc_ids
        return pa.table({"code": pa.array(out, pa.int64())})

    coded = docs_ds.map_batches(code_stream, batch_format="pyarrow").materialize()
    refs = [r for r in coded.to_arrow_refs()]

    @ray.remote(num_cpus=0)
    def block_len(tbl: pa.Table) -> int:
        return tbl.num_rows

    @ray.remote(num_cpus=0.5)
    def add_pos(tbl: pa.Table, offset: int) -> pa.Table:
        return pa.table(
            {
                "pos": pa.array(
                    offset + np.arange(tbl.num_rows, dtype=np.int64), pa.int64()
                ),
                "code": tbl.column("code"),
            }
        )

    lens = ray.get([block_len.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(lens)])
    n_total = int(offsets[-1])
    out_refs = [
        add_pos.remote(refs[i], int(offsets[i]))
        for i in range(len(refs))
        if lens[i]
    ]
    if not out_refs:
        empty = pa.table(
            {"pos": pa.array([], pa.int64()), "code": pa.array([], pa.int64())}
        )
        return ray.data.from_arrow(empty), vocab, 0
    return ray.data.from_arrow_refs(out_refs), vocab, n_total


# ---------------------------------------------------------------------------
# dense rank over a sorted (pos, r1, r2) dataset — stages/rank.py shape


def _summarize(tbl: pa.Table, keys) -> dict:
    n = tbl.num_rows
    if n == 0:
        return {"n": 0}
    m = np.stack([tbl.column(k).to_numpy() for k in keys], axis=1)
    change = np.any(m[1:] != m[:-1], axis=1)
    starts = np.concatenate([[0], np.nonzero(change)[0] + 1]).astype(np.int64)
    run_lens = np.diff(np.append(starts, n))
    return {
        "n": n,
        "first": tuple(int(x) for x in m[0]),
        "last": tuple(int(x) for x in m[-1]),
        "head": int(run_lens[0]),
        "tail": int(run_lens[-1]),
        "max_run": int(run_lens.max()),
        "n_runs": len(starts),
    }


def _scan_runs(summaries):
    """Driver scan over block summaries of a globally sorted dataset.

    Returns (offsets, carried_start, lead_dup, tail_dup, any_dup):
    ``carried_start[i]`` is the global start index of block i's leading run
    when that run began in an earlier block (else None); ``lead_dup[i]`` /
    ``tail_dup[i]`` say whether the block's boundary runs belong to a
    GLOBAL run of size >= 2 (needed to emit duplicate-group members
    without shipping rows to the driver)."""
    nb = len(summaries)
    offsets = [0] * nb
    carried = [None] * nb
    lead_dup = [False] * nb
    tail_dup = [False] * nb
    any_dup = False

    # chain of (block idx, head_len contributed) for the currently open run
    open_start = None
    open_len = 0
    open_members: list[int] = []  # blocks whose LEADING run is the open run
    open_tail_of: int | None = None  # block whose TRAILING run opened it

    def close_run():
        nonlocal any_dup
        if open_len >= 2:
            any_dup = True
            for b in open_members:
                lead_dup[b] = True
            if open_tail_of is not None:
                tail_dup[open_tail_of] = True

    offset = 0
    prev_last = None
    for i, s in enumerate(summaries):
        offsets[i] = offset
        if s["n"] == 0:
            continue
        continues = prev_last is not None and s["first"] == prev_last
        if continues:
            carried[i] = open_start
            open_len += s["head"]
            open_members.append(i)
        else:
            close_run()
            open_start = offset
            open_len = s["head"]
            open_members = [i]
            open_tail_of = None
        if s["n_runs"] > 1:
            # run chain broken inside the block; open run closes here
            close_run()
            if s["max_run"] >= 2:
                any_dup = True
            open_start = offset + s["n"] - s["tail"]
            open_len = s["tail"]
            open_members = []
            open_tail_of = i
        # single-run block: chain stays open (open_len already includes it)
        prev_last = s["last"]
        offset += s["n"]
    close_run()
    return offsets, carried, lead_dup, tail_dup, any_dup


def _rank_block(tbl: pa.Table, keys, offset: int, carried_start):
    n = tbl.num_rows
    if n == 0:
        return pa.table(
            {"pos": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())}
        )
    m = np.stack([tbl.column(k).to_numpy() for k in keys], axis=1)
    idx = np.arange(n, dtype=np.int64)
    change = np.concatenate([[True], np.any(m[1:] != m[:-1], axis=1)])
    run_start = np.maximum.accumulate(np.where(change, idx, 0))
    rank = offset + run_start
    if carried_start is not None:
        first_len = int(np.argmax(change[1:])) + 1 if n > 1 and change[1:].any() else n
        rank[:first_len] = carried_start
    return pa.table(
        {
            "pos": tbl.column("pos").cast(pa.int64()),
            "rank": pa.array(rank, pa.int64()),
        }
    )


def _dup_block(tbl: pa.Table, keys, lead_dup: bool, tail_dup: bool):
    """Rows of this sorted block that belong to a GLOBAL run of size >= 2."""
    n = tbl.num_rows
    if n == 0:
        return pa.table({"pos": pa.array([], pa.int64()), "grp": pa.array([], pa.int64())})
    m = np.stack([tbl.column(k).to_numpy() for k in keys], axis=1)
    idx = np.arange(n, dtype=np.int64)
    change = np.concatenate([[True], np.any(m[1:] != m[:-1], axis=1)])
    run_start = np.maximum.accumulate(np.where(change, idx, 0))
    starts = np.nonzero(change)[0]
    run_lens = np.diff(np.append(starts, n))
    len_of_row = np.repeat(run_lens, run_lens)
    keep = len_of_row >= 2
    if lead_dup:
        keep[run_start == 0] = True
    if tail_dup:
        keep[run_start == starts[-1]] = True
    # grp: the level-L rank (first key) identifies the group globally
    return pa.table(
        {
            "pos": tbl.column("pos").filter(pa.array(keep)).cast(pa.int64()),
            "grp": pa.array(m[keep, 0].astype(np.int64), pa.int64()),
        }
    )


def _sorted_refs(ds, keys):
    import ray

    sorted_ds = ds.sort(list(keys))
    return [r for r in sorted_ds.to_arrow_refs()]


def rank_level(ds, keys=("r1", "r2")):
    """Sorted dense-rank pass: Dataset (pos, r1[, r2]) -> (Dataset
    (pos, rank), any_dup). rank = global start index of the row's
    (r1, r2) run in the sorted order."""
    import ray
    import ray.data

    keys = list(keys)
    refs = _sorted_refs(ds, keys)
    summarize = ray.remote(num_cpus=0.5)(_summarize)
    rank_task = ray.remote(num_cpus=0.5)(_rank_block)
    summaries = ray.get([summarize.remote(r, keys) for r in refs])
    offsets, carried, _, _, any_dup = _scan_runs(summaries)
    out = [
        rank_task.remote(refs[i], keys, offsets[i], carried[i])
        for i in range(len(refs))
        if summaries[i]["n"]
    ]
    if not out:
        empty = pa.table(
            {"pos": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())}
        )
        return ray.data.from_arrow(empty), False
    return ray.data.from_arrow_refs(out), any_dup


def duplicate_members(rank_ds):
    """(pos, rank) Dataset -> Dataset (pos, grp) of every row whose rank
    group has >= 2 members (the surviving duplicate groups)."""
    import ray
    import ray.data

    keys = ["rank"]
    refs = _sorted_refs(rank_ds, keys)
    summarize = ray.remote(num_cpus=0.5)(_summarize)
    dup_task = ray.remote(num_cpus=0.5)(_dup_block)
    summaries = ray.get([summarize.remote(r, keys) for r in refs])
    _, _, lead_dup, tail_dup, _ = _scan_runs(summaries)
    out = [
        dup_task.remote(refs[i], keys, lead_dup[i], tail_dup[i])
        for i in range(len(refs))
        if summaries[i]["n"]
    ]
    if not out:
        empty = pa.table(
            {"pos": pa.array([], pa.int64()), "grp": pa.array([], pa.int64())}
        )
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# doubling iteration


def _double(rank_ds, L: int, n_total: int):
    """One prefix-doubling exchange: (pos, rank at L) -> (pos, r1, r2)
    where r2 = rank[pos + L] (-1 past the stream end). Contiguous
    position-bucket routing; each bucket merges with one searchsorted."""
    nparts = shuffle_partitions(n_total * _ROW_BYTES)
    bucket_rows = max(1, -(-n_total // nparts))

    def route(batch: pa.Table) -> pa.Table:
        pos = batch.column("pos").to_numpy()
        rank = batch.column("rank").to_numpy()
        t = pos - L
        m = t >= 0
        return pa.table(
            {
                "bucket": pa.array(
                    np.concatenate([pos // bucket_rows, t[m] // bucket_rows]),
                    pa.int64(),
                ),
                "pos": pa.array(np.concatenate([pos, t[m]]), pa.int64()),
                "rank": pa.array(np.concatenate([rank, rank[m]]), pa.int64()),
                "tag": pa.array(
                    np.concatenate(
                        [np.zeros(len(pos), np.int8), np.ones(int(m.sum()), np.int8)]
                    ),
                    pa.int8(),
                ),
            }
        )

    def merge_bucket(group: pa.Table) -> pa.Table:
        tag = group.column("tag").to_numpy()
        pos = group.column("pos").to_numpy()
        rank = group.column("rank").to_numpy()
        self_m = tag == 0
        spos, srank = pos[self_m], rank[self_m]
        tpos, trank = pos[~self_m], rank[~self_m]
        so = np.argsort(spos)
        spos, srank = spos[so], srank[so]
        r2 = np.full(len(spos), -1, np.int64)
        if len(tpos):
            to = np.argsort(tpos)
            tpos_s, trank_s = tpos[to], trank[to]
            ix = np.searchsorted(tpos_s, spos)
            ok = ix < len(tpos_s)
            ok[ok] = tpos_s[ix[ok]] == spos[ok]
            r2[ok] = trank_s[ix[ok]]
        return pa.table(
            {
                "pos": pa.array(spos, pa.int64()),
                "r1": pa.array(srank, pa.int64()),
                "r2": pa.array(r2, pa.int64()),
            }
        )

    return (
        rank_ds.map_batches(route, batch_format="pyarrow")
        .groupby("bucket", num_partitions=nparts)
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def doubling_loop(stream_ds, n_total: int):
    """Run prefix doubling until no duplicate groups survive.

    Returns (rank_ds at the LAST duplicate level, L*) — the level that
    brackets the LRS (L* <= LRS < 2 L*) — or (None, 0) when no token
    repeats at all."""

    def init(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "pos": batch.column("pos"),
                "r1": batch.column("code"),
                "r2": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    ranked, any_dup = rank_level(
        stream_ds.map_batches(init, batch_format="pyarrow")
    )
    if not any_dup:
        return None, 0
    L = 1
    while L < n_total:
        nxt, nxt_dup = rank_level(_double(ranked, L, n_total))
        logger.info("suffix doubling: level %d -> %d, dup=%s", L, 2 * L, nxt_dup)
        if not nxt_dup:
            return ranked, L
        ranked, L = nxt, 2 * L
    return ranked, L  # unreachable with per-doc sentinels


# ---------------------------------------------------------------------------
# candidate windows + exact LCP finish


def fetch_windows(stream_ds, starts: np.ndarray, width: int):
    """Token windows ``stream[c : c + width]`` for each candidate start.

    One broadcast probe pass over the stream: a block intersects candidate
    c iff c <= block_max and c + width > block_min; intersecting slices
    are emitted as (cand, pos, code) rows — output is bounded by
    len(starts) * width (driver-guarded upstream)."""
    import ray

    starts = np.asarray(starts, np.int64)
    sref = ray.put(starts)

    def probe(batch: pa.Table) -> pa.Table:
        st = ray.get(sref)
        pos = batch.column("pos").to_numpy()
        code = batch.column("code").to_numpy()
        if len(pos) == 0 or len(st) == 0:
            return pa.table(
                {"cand": pa.array([], pa.int64()), "pos": pa.array([], pa.int64()),
                 "code": pa.array([], pa.int64())}
            )
        pmin, pmax = int(pos[0]), int(pos[-1])
        lo = np.searchsorted(st, pmin - width + 1, "left")
        hi = np.searchsorted(st, pmax, "right")
        outc, outp, outv = [], [], []
        for c in st[lo:hi]:
            a = np.searchsorted(pos, c)
            b = np.searchsorted(pos, c + width)
            if b > a:
                outc.append(np.full(b - a, c, np.int64))
                outp.append(pos[a:b])
                outv.append(code[a:b])
        if not outc:
            return pa.table(
                {"cand": pa.array([], pa.int64()), "pos": pa.array([], pa.int64()),
                 "code": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "cand": pa.array(np.concatenate(outc), pa.int64()),
                "pos": pa.array(np.concatenate(outp), pa.int64()),
                "code": pa.array(np.concatenate(outv), pa.int64()),
            }
        )

    parts = stream_ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["cand", "pos"])
    windows: dict[int, np.ndarray] = {}
    for c, grp in parts.groupby("cand"):
        windows[int(c)] = grp["code"].to_numpy().astype(np.int64)
    return windows


def _common_prefix(a: np.ndarray, b: np.ndarray) -> int:
    n = min(len(a), len(b))
    neq = np.nonzero(a[:n] != b[:n])[0]
    return int(neq[0]) if len(neq) else n


def lrs_from_candidates(groups, windows, n_vocab: int):
    """(grp -> member positions), windows -> (maxL, seq codes, count).

    Within a group, sorting members by window content is exact suffix
    order (windows are 2 L* wide; no two suffixes share that much), so
    the LRS is the maximal adjacent common prefix and its count is the
    maximal-run size. Ties at maxL pick the lexicographically smallest
    code sequence (== the SQL twin's ``seq ASC``: codes are sorted-vocab
    ranks and tokens never contain the space separator)."""
    best_len = 0
    candidates = []  # (seq tuple, count)
    for members in groups.values():
        wins = [windows[int(p)] for p in members]
        order = sorted(range(len(wins)), key=lambda i: tuple(wins[i]))
        cps = [
            _common_prefix(wins[order[i]], wins[order[i + 1]])
            for i in range(len(wins) - 1)
        ]
        if not cps:
            continue
        gmax = max(cps)
        if gmax < best_len or gmax == 0:
            continue
        if gmax > best_len:
            best_len, candidates = gmax, []
        # maximal runs of adjacent pairs with cp == gmax
        i = 0
        while i < len(cps):
            if cps[i] == gmax:
                j = i
                while j < len(cps) and cps[j] == gmax:
                    j += 1
                seq = tuple(int(x) for x in wins[order[i]][:gmax])
                # sanity: a repeated sequence never contains a sentinel
                assert all(c < n_vocab for c in seq)
                candidates.append((seq, j - i + 1))
                i = j
            else:
                i += 1
    if not best_len:
        return 0, (), 0
    seq, cnt = min(candidates)  # lexicographically smallest sequence
    return best_len, seq, cnt


def longest_repeated_sequence(docs_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus-wide longest repeated token sequence.

    Returns (length, terms tuple, occurrence count) — occurrences counted
    at every (doc, start) position, overlaps included, never crossing a
    document boundary. (0, (), 0) when no token repeats."""
    import ray

    stream, vocab, n_total = token_stream(
        docs_ds, text_col=text_col, id_col=id_col
    )
    if n_total == 0:
        return 0, (), 0
    stream = stream.materialize()
    ranked, L = doubling_loop(stream, n_total)
    if ranked is None:
        return 0, (), 0
    dups_ds = duplicate_members(ranked)
    cap = max_candidate_pairs()
    # fail loud BEFORE any driver materialization (guards.py policy): the
    # count is distributed; the window fetch downstream ships up to
    # n_members * 2 L* rows, so the width is part of the bound
    n_members = dups_ds.count()
    if n_members > cap or n_members * 2 * L > 8 * cap:
        raise RuntimeError(
            f"suffix_array: {n_members} duplicate-group members at level {L} "
            f"(~{n_members * 2 * L} window rows) exceed the driver cap "
            f"({cap}; env CAS_RAY_MAX_CANDIDATE_PAIRS). The corpus is "
            "extremely repetitive at this span length; raise the cap or "
            "pre-dedup with the fixed-length span pass (stages/dedup.py) "
            "first."
        )
    dups = dups_ds.to_pandas()
    logger.info(
        "suffix_array: L*=%d, %d candidate members in %d groups",
        L, len(dups), dups["grp"].nunique(),
    )
    groups = {
        int(g): grp["pos"].to_numpy().astype(np.int64)
        for g, grp in dups.groupby("grp")
    }
    starts = np.unique(dups["pos"].to_numpy().astype(np.int64))
    windows = fetch_windows(stream, starts, 2 * L)
    length, seq, cnt = lrs_from_candidates(groups, windows, len(vocab))
    terms = tuple(str(vocab[c]) for c in seq)
    return length, terms, cnt
