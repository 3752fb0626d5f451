"""Incremental index segments: /index then /search sees new docs immediately.

The reference supports incremental adds — ``/index`` upserts into AnnLite and
a following ``/search`` already sees the new docs
(``/root/reference/tests/test_search.py:34-44``, ``client.py:608-644``). The
batch engine's analog is the classic SEGMENT model (Lucene-style, expressed
Ray-Data-first):

- ``add_segment``: each incremental batch becomes an independent, fully
  resumable ``build_index`` run under ``segments/seg-XXXX``; the root's union
  stats + union df dictionary are refreshed (tiny). New docs are searchable
  the moment the call returns — no rebuild of earlier segments.
- ``SegmentedQueryService``: scatter-ALL-search across segment indexes with
  GLOBAL corpus stats (BM25 idf/avgdl over the union) — rank-identical to a
  from-scratch rebuild over the concatenated corpus (test-pinned).
- ``merge_segments``: physical background fold into ONE index: per term-hash
  partition, decode segment blocks -> remap doc ids through the union conv
  base -> sort -> re-encode under union avgdl (block-max metadata is
  avgdl-dependent, so re-encoding is required and sufficient — no
  re-tokenize, no shuffle: term-hash partitioning is stable across segments,
  so part k of every segment folds into part k of the output).

Constraint: conversations must be DISJOINT across segments (an upsert of an
existing conversation belongs in a rebuild of its segment) — asserted at
merge time.
"""

from __future__ import annotations

import os
import re
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.sharded import (
    ScatterQueryService,
    write_union_stats,
)
from clip_as_service_ray.stages.tokenize import compute_conv_bases
from clip_as_service_ray.state import manifest as mf
from clip_as_service_ray.state.postings import (
    BLOCK_SCHEMA,
    decode_block,
    encode_postings_to_blocks,
)

SEG_RE = re.compile(r"^seg-(\d{4})$")


def segment_dirs(index_root: str) -> list[str]:
    base = os.path.join(index_root, "segments")
    if not os.path.isdir(base):
        return []
    return [
        os.path.join(base, d)
        for d in sorted(os.listdir(base))
        if SEG_RE.match(d) and os.path.exists(os.path.join(base, d, "manifest.json"))
    ]


def add_segment(
    index_root: str,
    source,
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    overwrite: bool = False,
    positions: bool = False,
) -> dict:
    """Build the next segment from ``source`` and refresh the union stats.
    Returns the root manifest; the new docs are searchable immediately via
    ``SegmentedQueryService``. ``positions=True`` additionally builds the
    segment's positional artifact so phrase/proximity queries see the new
    docs immediately too (``SegmentedPhraseService``)."""
    os.makedirs(os.path.join(index_root, "segments"), exist_ok=True)
    existing = segment_dirs(index_root)
    if existing:
        # write-time analyzer guard: a segment built with a different
        # analyzer would poison every future search (the read-time guard in
        # ScatterQueryService would then reject the whole root)
        sp = os.path.join(existing[0], "stats.json")
        if os.path.exists(sp):
            have = mf.read_json(sp).get("analyzer")
            if have != config.analyzer:
                raise ValueError(
                    f"segment root was built with analyzer={have!r}; "
                    f"refusing to add a segment with analyzer={config.analyzer!r}"
                )
    k = (
        max(int(SEG_RE.match(os.path.basename(d)).group(1)) for d in existing) + 1
        if existing
        else 0
    )
    seg_dir = os.path.join(index_root, "segments", f"seg-{k:04d}")
    # positions=True uses the FUSED single-pass build: postings + positional
    # artifact from one tokenize (no second corpus read)
    report = build_index(
        source, seg_dir, config, overwrite=overwrite, positions=positions
    )
    dirs = segment_dirs(index_root)
    union = write_union_stats(index_root, dirs)
    payload = {
        "n_segments": len(dirs),
        "segments": [os.path.basename(d) for d in dirs],
        **union,
        "last_segment_report": report,
    }
    mf.write_json(os.path.join(index_root, "manifest.json"), payload)
    return payload


def tombstones_path(index_root: str) -> str:
    return os.path.join(index_root, "tombstones.json")


def load_tombstones(index_root: str) -> dict[str, frozenset[str] | None]:
    """conv_id -> segment-name scope the delete applies to (None = every
    segment — the legacy un-scoped format). A delete only affects segments
    that EXISTED when it was issued (the Lucene delete model), so a
    conversation re-added afterwards (an update) is visible again."""
    p = tombstones_path(index_root)
    if not os.path.exists(p):
        return {}
    data = mf.read_json(p)
    if "scoped" in data:
        return {
            c: (frozenset(v) if v is not None else None)
            for c, v in data["scoped"].items()
        }
    return {c: None for c in data.get("conv_ids", [])}  # legacy roots


def _save_tombstones(index_root: str, tomb: dict) -> None:
    mf.write_json(
        tombstones_path(index_root),
        {"scoped": {c: (sorted(v) if v is not None else None) for c, v in sorted(tomb.items())}},
    )


def delete_convs(index_root: str, conv_ids) -> dict:
    """DELETE conversations from the segmented index by tombstone: the ids
    are recorded in ``tombstones.json`` SCOPED to the segments existing at
    delete time and filtered at query time (the Lucene deletion model —
    stats intentionally keep the pre-delete corpus until a purge; scoring
    of survivors is unchanged, which is exactly what an incremental delete
    should do). A conversation re-added in a LATER segment is visible again
    (that is what ``update_convs`` builds on). Physical purge =
    ``compact_segments`` (per-segment postings rewrite, no re-tokenize); a
    merge with live tombstones is refused rather than silently resurrecting
    deleted docs."""
    tomb = load_tombstones(index_root)
    scope = frozenset(os.path.basename(d) for d in segment_dirs(index_root))
    for c in map(str, conv_ids):
        prev = tomb.get(c)
        tomb[c] = None if prev is None and c in tomb else (
            (prev | scope) if prev is not None else scope
        )
    _save_tombstones(index_root, tomb)
    return {"n_tombstones": len(tomb)}


def update_convs(
    index_root: str,
    source,
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    positions: bool = False,
) -> dict:
    """UPDATE conversations: tombstone every conv_id present in ``source``
    (scoped to the segments existing NOW) and add the new turns as the next
    segment — the reference's /update contract (retriever.md:203-225: update
    polls ALL shards; here delete-then-add with segment-scoped deletes).
    The new versions are searchable on return; old versions never surface.
    Stats follow the Lucene model (old docs still count until compaction)."""
    import ray.data

    if isinstance(source, pa.Table):
        convs = set(pc.unique(source.column("conv_id")).to_pylist())
    elif isinstance(source, ray.data.Dataset):
        convs = set(
            source.select_columns(["conv_id"]).unique("conv_id")
        )
    else:  # path-like
        t = pq.read_table(source, columns=["conv_id"])
        convs = set(pc.unique(t.column("conv_id")).to_pylist())
    rep_del = delete_convs(index_root, sorted(convs))
    payload = add_segment(index_root, source, config, positions=positions)
    payload["n_tombstones"] = rep_del["n_tombstones"]
    payload["n_updated_convs"] = len(convs)
    return payload


class FederatedQueryService(ScatterQueryService):
    """Cross-cluster search analog (the ES CCS `remote:index` contract):
    ONE query fans out across the segments of SEVERAL independent index
    roots, scored under FEDERATION-WIDE union stats (n_docs / avgdl exact
    from the per-segment integer sum_dl; per-term df summed across every
    root's dictionary), so results are bit-identical to one monolithic
    index over the union of the corpora.

    Honest guards: conversations must be disjoint across roots (same
    invariant as segments within a root), and roots with live tombstones
    are refused — tombstone scopes are segment NAMES, which collide across
    roots (compact each root first). The union dictionary is written to
    ``federation_dir`` (one small parquet, rebuilt per construction)."""

    def __init__(
        self,
        index_roots: list[str],
        config: EngineConfig = DEFAULT_CONFIG,
        *,
        federation_dir: str | None = None,
        num_cpus: float = 1,
        **mode_kwargs,
    ):
        if not index_roots:
            raise ValueError("need at least one index root")
        dirs: list[str] = []
        for root in index_roots:
            if load_tombstones(root):
                raise ValueError(
                    f"root {root!r} has live tombstones: segment-name scopes "
                    "collide across roots — compact_segments it first"
                )
            segs = segment_dirs(root)
            if not segs:
                raise ValueError(f"no segments under {root!r}")
            dirs.extend(segs)
        # disjointness: a conversation living in two roots would be scored
        # twice and merged as two docs. Stay Arrow end-to-end (no Python
        # lists / object arrays): per-segment convs are unique already
        # (convmap is one row per conv), so sum-of-sizes == distinct-count
        # of the concatenation iff all segments are pairwise disjoint.
        chunks = []
        per_seg_total = 0
        for d in dirs:
            col = pq.read_table(
                os.path.join(d, "convmap.parquet"), columns=["conv_id"]
            ).column("conv_id")
            per_seg_total += len(col)
            chunks.extend(col.chunks)
        union_distinct = pc.count_distinct(pa.chunked_array(chunks)).as_py()
        if union_distinct != per_seg_total:
            raise ValueError("conversations overlap across roots — cannot federate")
        fed = federation_dir or os.path.join(index_roots[0], "_federation")
        union = write_union_stats(fed, dirs)
        global_stats = {
            "n_docs": union["n_docs"],
            "avgdl": union["avgdl"],
            "df_path": os.path.join(fed, "union_dictionary", "dictionary.parquet"),
        }
        super().__init__(
            dirs, global_stats, config, num_cpus=num_cpus, **mode_kwargs
        )


class SegmentedQueryService(ScatterQueryService):
    """Scatter-ALL-search across the segment indexes with union stats;
    tombstoned conversations never appear in results (limit-k preserved by
    over-asking each segment by the tombstone count)."""

    def __init__(
        self,
        index_root: str,
        config: EngineConfig = DEFAULT_CONFIG,
        *,
        conjunctive: bool = False,
        prefix: bool = False,
        fuzzy: int = 0,
        synonyms: dict | None = None,
        delta: float = 0.0,
        boosted: bool = False,
        min_match: int = 0,
        collapse: bool = False,
        suffix: bool = False,
        regex: bool = False,
        term_range: bool = False,
        block_join: str | None = None,
        decay: dict | None = None,
        boosting: float | None = None,
        terms_set: str | None = None,
        similarity: str = "bm25",
        sim_param: float | None = None,
        common_terms: float | None = None,
        bool_query: bool = False,
        min_should: int = 0,
        k1: float | None = None,
        b: float | None = None,
        bool_prefix: bool = False,
        num_cpus: float = 1,
    ):
        root = mf.read_json(os.path.join(index_root, "manifest.json"))
        global_stats = {
            "n_docs": int(root["n_docs"]),
            "avgdl": float(root["avgdl"]),
            "df_path": os.path.join(index_root, "union_dictionary", "dictionary.parquet"),
        }
        super().__init__(
            segment_dirs(index_root),
            global_stats,
            config,
            tombstones=load_tombstones(index_root),
            conjunctive=conjunctive,
            prefix=prefix,
            fuzzy=fuzzy,
            boosted=boosted,
            min_match=min_match,
            collapse=collapse,
            suffix=suffix,
            regex=regex,
            term_range=term_range,
            block_join=block_join,
            decay=decay,
            boosting=boosting,
            terms_set=terms_set,
            synonyms=synonyms,
            delta=delta,
            similarity=similarity,
            sim_param=sim_param,
            common_terms=common_terms,
            bool_query=bool_query,
            min_should=min_should,
            k1=k1,
            b=b,
            bool_prefix=bool_prefix,
            num_cpus=num_cpus,
        )


def _decode_segment_part(part_dir: str, old_bases: np.ndarray, new_bases: np.ndarray):
    """Decode one segment's postings part and remap doc ids into the union
    doc-id space: new_doc = new_base[conv] + (doc - old_base[conv])."""
    terms, docs_l, tfs_l, dls_l = [], [], [], []
    files = (
        [
            os.path.join(part_dir, f)
            for f in sorted(os.listdir(part_dir))
            if f.endswith(".parquet")
        ]
        if os.path.isdir(part_dir)
        else []
    )
    for fp in files:
        t = pq.read_table(fp, use_threads=False)
        for i in range(t.num_rows):
            docs, tfs, dls = decode_block(
                t.column("data")[i].as_buffer(),
                int(t.column("n")[i].as_py()),
                int(t.column("doc_w")[i].as_py()),
                int(t.column("tf_w")[i].as_py()),
                int(t.column("dl_w")[i].as_py()),
                int(t.column("first_doc")[i].as_py()),
            )
            pos = np.searchsorted(old_bases, docs, side="right") - 1
            terms.append(t.column("term")[i].as_py())
            docs_l.append(docs - old_bases[pos] + new_bases[pos])
            tfs_l.append(tfs)
            dls_l.append(dls)
    return terms, docs_l, tfs_l, dls_l


def _merge_segments_part(
    part_dirs: list[str],
    remaps: list,
    out_dir: str,
    *,
    avgdl: float,
    block_size: int,
    k1: float,
    b: float,
) -> pa.Table:
    """One Ray task: fold part k of every segment into one output part.
    Returns the per-part (term, df) table for the union dictionary."""
    terms_all, docs_all, tfs_all, dls_all = [], [], [], []
    for part_dir, (old_bases, new_bases) in zip(part_dirs, remaps):
        te, do, tf, dl = _decode_segment_part(part_dir, old_bases, new_bases)
        terms_all += te
        docs_all += do
        tfs_all += tf
        dls_all += dl
    cols: dict[str, list] = {n: [] for n in BLOCK_SCHEMA.names}
    df_terms: list[str] = []
    df_counts: list[int] = []
    if terms_all:
        ns = np.fromiter((len(d) for d in docs_all), dtype=np.int64, count=len(docs_all))
        codes_u, uniques = pd.factorize(np.asarray(terms_all, dtype=object), sort=False)
        codes = np.repeat(codes_u.astype(np.int32), ns)
        docs = np.concatenate(docs_all)
        tfs = np.concatenate(tfs_all)
        dls = np.concatenate(dls_all)
        order = np.lexsort((docs, codes))
        codes, docs, tfs, dls = codes[order], docs[order], tfs[order], dls[order]
        if np.any((np.diff(codes) == 0) & (np.diff(docs) == 0)):
            raise ValueError(
                "duplicate (term, doc) across segments — conversations must "
                "be disjoint between segments; rebuild the owning segment "
                "instead of adding a new one"
            )
        change = np.nonzero(np.diff(codes) != 0)[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(codes)]])
        for s, e in zip(starts, ends):
            encode_postings_to_blocks(
                uniques[codes[s]], docs[s:e], tfs[s:e], dls[s:e],
                block_size=block_size, avgdl=avgdl, k1=k1, b=b, out=cols,
            )
        df_terms = list(uniques[codes[starts]])
        df_counts = (ends - starts).astype(np.int64).tolist()
    os.makedirs(out_dir, exist_ok=True)
    out_tbl = pa.table(cols, schema=BLOCK_SCHEMA)
    tmp = os.path.join(out_dir, f"blocks.parquet.tmp.{os.getpid()}")
    pq.write_table(out_tbl, tmp)
    os.replace(tmp, os.path.join(out_dir, "blocks.parquet"))
    mf.mark_stage_done(
        out_dir,
        {"stage": "postings_part", "postings": int(sum(df_counts)), "blocks": out_tbl.num_rows},
    )
    return pa.table(
        {"term": pa.array(df_terms, pa.string()), "df": pa.array(df_counts, pa.int64())}
    )


def _part_block_files(part_dir: str) -> list[str]:
    if not os.path.isdir(part_dir):
        return []
    return [
        os.path.join(part_dir, f)
        for f in sorted(os.listdir(part_dir))
        if f.endswith(".parquet")
    ]


def _dead_doc_stats_part(part_dir: str, old_bases: np.ndarray, alive: np.ndarray):
    """One Ray task of compaction phase 1: scan one postings part and return
    the UNIQUE (doc_id, dl) pairs belonging to tombstoned conversations.
    Output is bounded by the deleted conversations' turn count (deletes are
    incremental), never by the corpus."""
    docs_l, dls_l = [], []
    for fp in _part_block_files(part_dir):
        t = pq.read_table(fp, use_threads=False)
        for i in range(t.num_rows):
            docs, _tfs, dls = decode_block(
                t.column("data")[i].as_buffer(),
                int(t.column("n")[i].as_py()),
                int(t.column("doc_w")[i].as_py()),
                int(t.column("tf_w")[i].as_py()),
                int(t.column("dl_w")[i].as_py()),
                int(t.column("first_doc")[i].as_py()),
            )
            pos = np.searchsorted(old_bases, docs, side="right") - 1
            dead = ~alive[pos]
            if dead.any():
                docs_l.append(docs[dead])
                dls_l.append(dls[dead])
    if not docs_l:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    docs = np.concatenate(docs_l)
    dls = np.concatenate(dls_l).astype(np.int64)
    _, first = np.unique(docs, return_index=True)
    return docs[first], dls[first]


def _compact_part(
    part_dir: str,
    old_bases: np.ndarray,
    new_bases: np.ndarray,
    alive: np.ndarray,
    out_dir: str,
    *,
    avgdl: float,
    block_size: int,
    k1: float,
    b: float,
) -> pa.Table:
    """One Ray task of compaction phase 2: drop tombstoned docs from one
    postings part, remap surviving doc ids through the compacted conv base,
    and re-encode block-max blocks under the segment's post-purge avgdl
    (block bounds are avgdl-dependent). Returns the part's (term, df)."""
    terms, docs_l, tfs_l, dls_l = [], [], [], []
    for fp in _part_block_files(part_dir):
        t = pq.read_table(fp, use_threads=False)
        for i in range(t.num_rows):
            docs, tfs, dls = decode_block(
                t.column("data")[i].as_buffer(),
                int(t.column("n")[i].as_py()),
                int(t.column("doc_w")[i].as_py()),
                int(t.column("tf_w")[i].as_py()),
                int(t.column("dl_w")[i].as_py()),
                int(t.column("first_doc")[i].as_py()),
            )
            pos = np.searchsorted(old_bases, docs, side="right") - 1
            keep = alive[pos]
            if not keep.any():
                continue
            pos = pos[keep]
            terms.append(t.column("term")[i].as_py())
            docs_l.append(docs[keep] - old_bases[pos] + new_bases[pos])
            tfs_l.append(tfs[keep])
            dls_l.append(dls[keep])
    cols: dict[str, list] = {n: [] for n in BLOCK_SCHEMA.names}
    df_terms: list[str] = []
    df_counts: list[int] = []
    if terms:
        ns = np.fromiter((len(d) for d in docs_l), dtype=np.int64, count=len(docs_l))
        codes_u, uniques = pd.factorize(np.asarray(terms, dtype=object), sort=False)
        codes = np.repeat(codes_u.astype(np.int32), ns)
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        order = np.lexsort((docs, codes))
        codes, docs, tfs, dls = codes[order], docs[order], tfs[order], dls[order]
        change = np.nonzero(np.diff(codes) != 0)[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(codes)]])
        for s, e in zip(starts, ends):
            encode_postings_to_blocks(
                uniques[codes[s]], docs[s:e], tfs[s:e], dls[s:e],
                block_size=block_size, avgdl=avgdl, k1=k1, b=b, out=cols,
            )
        df_terms = list(uniques[codes[starts]])
        df_counts = (ends - starts).astype(np.int64).tolist()
    os.makedirs(out_dir, exist_ok=True)
    out_tbl = pa.table(cols, schema=BLOCK_SCHEMA)
    tmp = os.path.join(out_dir, f"blocks.parquet.tmp.{os.getpid()}")
    pq.write_table(out_tbl, tmp)
    os.replace(tmp, os.path.join(out_dir, "blocks.parquet"))
    mf.mark_stage_done(
        out_dir,
        {"stage": "postings_part", "postings": int(sum(df_counts)), "blocks": out_tbl.num_rows},
    )
    return pa.table(
        {"term": pa.array(df_terms, pa.string()), "df": pa.array(df_counts, pa.int64())}
    )


def compact_segments(
    index_root: str, config: EngineConfig = DEFAULT_CONFIG
) -> dict:
    """Physically purge tombstoned conversations — the delete lifecycle's
    final step (round 2 stopped at query-time filtering).

    Per-segment rewrite at the POSTINGS level, no re-tokenize: segments with
    no dead conversations are untouched; an affected segment gets (1) a
    tiny phase-1 scan collecting the dead docs' (doc_id, dl) pairs so the
    post-purge n_docs/sum_dl/avgdl are exact, then (2) one Ray task per
    term-hash partition that drops dead postings, remaps surviving doc ids
    through the compacted conv base (doc_id = base[conv] + turn_idx stays
    invariant), and re-encodes block-max blocks under the new avgdl. The
    rewritten segment lands in a temp dir and is swapped in atomically; a
    segment whose every conversation is dead is removed outright. Tombstones
    are cleared and union stats refreshed, so a subsequent
    ``merge_segments`` is legal again.

    Search over the compacted root is bit-identical to a from-scratch
    segmented build over the surviving corpus (test-pinned)."""
    import shutil

    import ray

    t0 = time.time()
    dead_convs = load_tombstones(index_root)
    if not dead_convs:
        return {"n_segments_compacted": 0, "n_tombstones_purged": 0}
    compacted = 0
    removed = 0
    for seg_dir in segment_dirs(index_root):
        seg_name = os.path.basename(seg_dir)
        # scope-aware purge: a delete only covers segments that existed when
        # it was issued — an updated conversation's NEW segment is untouched
        dead_here = sorted(
            c for c, scope in dead_convs.items()
            if scope is None or seg_name in scope
        )
        if not dead_here:
            continue
        dead_arr = np.asarray(dead_here, dtype=object)
        ext = pq.read_table(os.path.join(seg_dir, "convmap.parquet")).select(
            ["conv_id", "max_turn"]
        )
        ext = ext.set_column(1, "max_turn", ext.column("max_turn").cast(pa.int64()))
        ext = ext.sort_by("conv_id")
        convs = np.asarray(ext.column("conv_id").to_pylist(), dtype=object)
        dead_mask = np.isin(convs, dead_arr)
        if not dead_mask.any():
            continue
        surv_ext = ext.filter(pa.array(~dead_mask))
        if surv_ext.num_rows == 0:
            shutil.rmtree(seg_dir)
            removed += 1
            continue
        stats = mf.read_json(os.path.join(seg_dir, "stats.json"))
        n_parts = int(stats["num_index_partitions"])
        old_cb = compute_conv_bases(ext)
        new_cb = compute_conv_bases(surv_ext)
        alive = ~dead_mask
        new_bases = np.zeros(len(convs), dtype=np.int64)
        new_bases[alive] = new_cb.bases  # both sides sorted by conv_id
        part_dirs = [
            os.path.join(seg_dir, "postings", f"part={p}") for p in range(n_parts)
        ]

        dead_task = ray.remote(num_cpus=1)(_dead_doc_stats_part)
        ob_ref = ray.put(old_cb.bases)
        alive_ref = ray.put(alive)
        pairs = ray.get([dead_task.remote(d, ob_ref, alive_ref) for d in part_dirs])
        dd = np.concatenate([p[0] for p in pairs])
        dl = np.concatenate([p[1] for p in pairs])
        _, first = np.unique(dd, return_index=True)
        n_docs = int(stats["n_docs"]) - len(first)
        sum_dl = int(stats["sum_dl"]) - int(dl[first].sum())
        avgdl = (sum_dl / n_docs) if n_docs else 0.0

        tmp_dir = seg_dir + ".compact.tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)
        pq.write_table(surv_ext, os.path.join(tmp_dir, "convmap.parquet"))
        mf.write_json(
            os.path.join(tmp_dir, "stats.json"),
            {
                "n_docs": n_docs, "sum_dl": sum_dl, "avgdl": avgdl,
                "k1": stats["k1"], "b": stats["b"],
                "block_size": stats["block_size"],
                "doc_bucket_size": stats["doc_bucket_size"],
                "num_index_partitions": n_parts,
            },
        )
        compact_task = ray.remote(num_cpus=1)(_compact_part)
        nb_ref = ray.put(new_bases)
        postings_dir = os.path.join(tmp_dir, "postings")
        futs = [
            compact_task.remote(
                part_dirs[p], ob_ref, nb_ref, alive_ref,
                os.path.join(postings_dir, f"part={p}"),
                avgdl=avgdl, block_size=int(stats["block_size"]),
                k1=float(stats["k1"]), b=float(stats["b"]),
            )
            for p in range(n_parts)
        ]
        df_tables = ray.get(futs)
        mf.mark_stage_done(
            postings_dir, {"stage": "postings", "bytes": mf.dir_bytes(postings_dir)}
        )
        # positional artifact, if present, must be purged in lockstep —
        # compaction REMAPS doc ids, so a stale positions/ would resurrect
        # deleted docs in phrase results once tombstones clear
        pos_root = os.path.join(seg_dir, "positions")
        if os.path.isdir(pos_root):
            from clip_as_service_ray.stages.positions import compact_pos_part

            pos_parts = sorted(
                d for d in os.listdir(pos_root) if d.startswith("part=")
            )
            pos_task = ray.remote(num_cpus=1)(compact_pos_part)
            new_pos = os.path.join(tmp_dir, "positions")
            ray.get(
                [
                    pos_task.remote(
                        os.path.join(pos_root, d), ob_ref, nb_ref, alive_ref,
                        os.path.join(new_pos, d),
                        block_size=int(stats["block_size"]),
                    )
                    for d in pos_parts
                ]
            )
            mf.mark_stage_done(
                new_pos,
                {"stage": "positions", "bytes": mf.dir_bytes(new_pos)},
            )
        dict_dir = os.path.join(tmp_dir, "dictionary")
        mf.reset_stage(dict_dir)
        cat = pa.concat_tables(df_tables)
        g = cat.group_by("term").aggregate([("df", "sum")]).rename_columns(["term", "df"])
        g = g.sort_by("term")
        pq.write_table(
            g.set_column(1, "df", g.column("df").cast(pa.int64())),
            os.path.join(dict_dir, "dictionary.parquet"),
        )
        mf.mark_stage_done(dict_dir, {"stage": "dictionary"})
        mf.write_json(
            os.path.join(tmp_dir, "manifest.json"),
            {
                "engine": "clip_as_service_ray",
                "compacted_from": os.path.basename(seg_dir),
                "n_docs": n_docs, "avgdl": avgdl, "n_terms": g.num_rows,
                "n_postings": int(np.sum(g.column("df").to_numpy())) if g.num_rows else 0,
            },
        )
        old = seg_dir + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(seg_dir, old)
        os.rename(tmp_dir, seg_dir)
        shutil.rmtree(old)
        compacted += 1

    os.remove(tombstones_path(index_root))
    dirs = segment_dirs(index_root)
    union = write_union_stats(index_root, dirs)
    payload = {
        "n_segments": len(dirs),
        "segments": [os.path.basename(d) for d in dirs],
        **union,
        "compaction": {
            "n_segments_compacted": compacted,
            "n_segments_removed": removed,
            "n_tombstones_purged": len(dead_convs),
            "seconds": round(time.time() - t0, 3),
        },
    }
    mf.write_json(os.path.join(index_root, "manifest.json"), payload)
    return payload


def merge_segments(
    index_root: str, out_dir: str, config: EngineConfig = DEFAULT_CONFIG
) -> dict:
    """Physically fold all segments into one fresh index at ``out_dir``:
    no re-tokenize, no shuffle — one Ray task per term-hash partition reads
    that partition from every segment, remaps doc ids through the union
    conv base, and re-encodes block-max postings under the union avgdl.
    Search over the result is rank-identical to a from-scratch build over
    the concatenated corpus (test-pinned)."""
    import ray

    t0 = time.time()
    seg_dirs = segment_dirs(index_root)
    if not seg_dirs:
        raise ValueError(f"no segments under {index_root!r}")
    if load_tombstones(index_root):
        raise ValueError(
            "segments have live tombstones: a physical merge would resurrect "
            "deleted docs (stats/postings still contain them). Rebuild from "
            "the surviving source instead, or clear tombstones explicitly."
        )
    seg_stats = [mf.read_json(os.path.join(d, "stats.json")) for d in seg_dirs]
    parts = {s.get("num_index_partitions") for s in seg_stats}
    if len(parts) != 1:
        raise ValueError(f"segments disagree on num_index_partitions: {parts}")
    n_parts = int(parts.pop())

    # union conv extents -> union conv base (conversations must be disjoint)
    extents = [
        pq.read_table(os.path.join(d, "convmap.parquet")).select(["conv_id", "max_turn"])
        for d in seg_dirs
    ]
    extents = [
        e.set_column(1, "max_turn", e.column("max_turn").cast(pa.int64()))
        for e in extents
    ]
    union_ext = pa.concat_tables(extents).sort_by("conv_id")
    convs = np.asarray(union_ext.column("conv_id").to_pylist(), dtype=object)
    if len(convs) != len(np.unique(convs)):
        raise ValueError("conversations overlap across segments — cannot merge")
    union_cb = compute_conv_bases(union_ext)

    n_docs = sum(int(s["n_docs"]) for s in seg_stats)
    sum_dl = sum(int(s["sum_dl"]) for s in seg_stats)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0

    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f"convmap.parquet.tmp.{os.getpid()}")
    pq.write_table(union_ext, tmp)
    os.replace(tmp, os.path.join(out_dir, "convmap.parquet"))
    mf.write_json(
        os.path.join(out_dir, "stats.json"),
        {
            "n_docs": n_docs, "sum_dl": sum_dl, "avgdl": avgdl,
            "k1": config.k1, "b": config.b,
            "block_size": config.postings_block_size,
            "doc_bucket_size": config.doc_bucket_size,
            "num_index_partitions": n_parts,
        },
    )

    # per-segment doc-id remap arrays (aligned to each segment's sorted convs)
    remaps = []
    for ext in extents:
        cb = compute_conv_bases(ext)
        remaps.append((cb.bases, union_cb.lookup(cb.conv_ids)))
    remap_ref = ray.put(remaps)

    merge_task = ray.remote(num_cpus=1)(_merge_segments_part)
    postings_dir = os.path.join(out_dir, "postings")
    os.makedirs(postings_dir, exist_ok=True)
    futs = []
    for p in range(n_parts):
        part_dirs = [os.path.join(d, "postings", f"part={p}") for d in seg_dirs]
        futs.append(
            merge_task.remote(
                part_dirs, remap_ref, os.path.join(postings_dir, f"part={p}"),
                avgdl=avgdl, block_size=config.postings_block_size,
                k1=config.k1, b=config.b,
            )
        )
    df_tables = ray.get(futs)
    mf.mark_stage_done(postings_dir, {"stage": "postings", "bytes": mf.dir_bytes(postings_dir)})

    dict_dir = os.path.join(out_dir, "dictionary")
    mf.reset_stage(dict_dir)
    cat = pa.concat_tables(df_tables)
    g = cat.group_by("term").aggregate([("df", "sum")]).rename_columns(["term", "df"])
    g = g.sort_by("term")
    pq.write_table(
        g.set_column(1, "df", g.column("df").cast(pa.int64())),
        os.path.join(dict_dir, "dictionary.parquet"),
    )
    mf.mark_stage_done(dict_dir, {"stage": "dictionary"})

    payload = {
        "engine": "clip_as_service_ray",
        "merged_from": [os.path.basename(d) for d in seg_dirs],
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_terms": g.num_rows,
        "n_postings": int(np.sum(g.column("df").to_numpy())) if g.num_rows else 0,
        "index_bytes": mf.dir_bytes(postings_dir),
        "config": {"k1": config.k1, "b": config.b},
        "total_seconds": time.time() - t0,
    }
    mf.write_json(os.path.join(out_dir, "manifest.json"), payload)
    return payload
