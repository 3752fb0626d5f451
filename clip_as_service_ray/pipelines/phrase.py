"""Phrase search: positional-index build + query pipelines.

Extends a built index with the optional POSITIONS artifact and serves exact
token-phrase queries over it — the classic full-text feature the reference's
dense-vector engine approximates with embedding similarity but cannot answer
exactly (its nearest analog is the match-filter path,
``/root/reference/docs/user-guides/retriever.md:107-121``). Here it is the
real thing: positional postings + vectorized positional intersection.

Dataflow (same disk-partitioned grid exchange as the main build,
pipelines/build_index.py):

    read(source) -> TokenizePositions (ONE fused pass)
      -> pos_partials/part=K/bgrp=J/          [map side, partition_cols]
    merge_pos_partition x 1 task per cell -> positions/part=K/   [reduce]

Query:  PhraseScorer actor pool (positions loaded once per actor in
__init__) scores batches of phrase queries; hits are ranked by
(phrase_tf DESC, doc_id ASC) — deterministic, SQL-checkable against a
positional self-join in DuckDB.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig
from clip_as_service_ray.stages.positions import (
    PositionsReader,
    TokenizePositions,
    merge_pos_partition,
)
from clip_as_service_ray.state import manifest as mf

POS_PARTIALS = "pos_partials"
POSITIONS = "positions"

PHRASE_HITS_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("phrase_tf", pa.int64()),
        # first match start (token index) — feeds snippet extraction
        ("first_pos", pa.int64()),
    ]
)


def build_positions(
    source, index_dir: str, config: EngineConfig = DEFAULT_CONFIG
) -> dict:
    """Build (or resume) the positional artifact inside an EXISTING index dir
    (needs convmap.parquet from ``build_index`` for the doc-id scheme — the
    positional artifact shares doc ids with the main postings).

    The conv base is re-derived driver-side from convmap (file or shard
    dir); for conv tables beyond driver memory the ShardedConvBase route of
    ``build_index`` applies unchanged here (the emit UDF only needs a
    ``lookup``-capable object) — wire it through ``prep_ref`` when needed."""
    import ray

    from clip_as_service_ray.pipelines.build_index import (
        _as_dataset,
        _prep_from_extents,
    )

    done_path = os.path.join(index_dir, POSITIONS)
    if config.resume and mf.stage_done(done_path):
        return mf.read_stage(done_path)

    convmap_path = os.path.join(index_dir, "convmap.parquet")
    if not os.path.exists(convmap_path):
        raise FileNotFoundError(
            f"{convmap_path} missing: build_index must run before build_positions"
        )
    prep = _prep_from_extents(
        pq.read_table(convmap_path).select(["conv_id", "max_turn"]),
        config.doc_bucket_size,
        config.merge_groups_per_part,
    )
    prep_ref = ray.put(prep)

    partials_dir = os.path.join(index_dir, POS_PARTIALS)
    if not (config.resume and mf.stage_done(partials_dir)):
        mf.reset_stage(partials_dir)
        ds = _as_dataset(source, roles=config.index_roles)
        ds.map_batches(
            TokenizePositions(
                prep_ref,
                config.num_index_partitions,
                config.doc_bucket_size,
                bucket_grp_width=prep["grp_width"],
                lowercase=config.lowercase,
                analyzer=config.analyzer,
            ),
            batch_format="pyarrow",
            batch_size=config.tokenize_batch_size,
        ).write_parquet(partials_dir, partition_cols=["part", "bgrp"])
        mf.mark_stage_done(
            partials_dir, {"stage": "pos_partials", "bytes": mf.dir_bytes(partials_dir)}
        )

    return merge_positions_grid(partials_dir, index_dir, config)


def merge_positions_grid(
    partials_dir: str,
    index_dir: str,
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    cnt_cols: tuple[str, str] = ("cnt_w", "cnts"),
) -> dict:
    """Reduce side of the positional build: one Ray task per (part, bgrp)
    grid cell over ``partials_dir`` -> ``index_dir/positions/part=K/``,
    per-partition resumable. ``cnt_cols``: ("cnt_w", "cnts") for standalone
    pos_partials; ("tf_w", "tfs") for the FUSED single-pass partials
    (build_index(..., positions=True)) where tf == occurrence count."""
    import ray

    positions_dir = os.path.join(index_dir, POSITIONS)
    merge_remote = ray.remote(num_cpus=1)(merge_pos_partition)
    futs = []
    for p in range(config.num_index_partitions):
        part_in = os.path.join(partials_dir, f"part={p}")
        part_out = os.path.join(positions_dir, f"part={p}")
        if config.resume and mf.stage_done(part_out):
            continue
        if os.path.exists(part_out):
            mf.reset_stage(part_out)
        grp_dirs = (
            sorted(
                os.path.join(part_in, d)
                for d in os.listdir(part_in)
                if d.startswith("bgrp=")
            )
            if os.path.isdir(part_in)
            else []
        )
        pf = []
        if not grp_dirs:
            pf.append(
                merge_remote.remote(
                    [], part_out,
                    block_size=config.postings_block_size,
                    doc_bucket_size=config.doc_bucket_size,
                    cnt_cols=cnt_cols,
                )
            )
        for gd in grp_dirs:
            files = sorted(
                os.path.join(gd, f) for f in os.listdir(gd) if f.endswith(".parquet")
            )
            grp_tag = os.path.basename(gd).split("=")[1]
            pf.append(
                merge_remote.remote(
                    files, part_out, out_suffix=f"_g{grp_tag}",
                    block_size=config.postings_block_size,
                    doc_bucket_size=config.doc_bucket_size,
                    cnt_cols=cnt_cols,
                )
            )
        futs.append((part_out, pf))
    counters = {"postings": 0, "blocks": 0, "bytes": 0}
    for part_out, pf in futs:
        results = ray.get(pf)
        mf.mark_stage_done(
            part_out,
            {
                "stage": "positions_part",
                "cells": len(results),
                "postings": sum(r["postings"] for r in results),
                "blocks": sum(r["blocks"] for r in results),
                "bytes": sum(r["bytes"] for r in results),
            },
        )
        for r in results:
            for k in counters:
                counters[k] += r[k]
    payload = {"stage": "positions", **counters}
    mf.mark_stage_done(positions_dir, payload)
    return payload


class PhraseScorer:
    """map_batches actor-pool UDF: phrase-query batch -> ranked hits.

    Positional index + convmap loaded once per actor (T1 pattern). Queries:
    (query_id:int64, text:string phrase, limit:int32 optional).
    """

    def __init__(
        self, index_dir: str, default_limit: int = 10, window: int = 0,
        warm: bool = False, span_first: int = 0, prefix_last: bool = False,
        max_expansions: int = 50, span_or: bool = False,
        span_not_pre: int = 0, span_not_post: int = 0,
        interval_gaps: int = -1,
    ):
        self.reader = PositionsReader(index_dir)
        if warm:  # pre-fault composite-key arrays at pool spawn (T1 pattern)
            self.reader.warm_keys()
        # window > 0: proximity mode — a two-term query matches docs where
        # the terms co-occur within `window` tokens (any order); phrase_tf
        # becomes the qualifying pair count
        self.window = int(window)
        # span_first > 0: SpanFirstQuery mode — a single-term query matches
        # docs where the term occurs before token position `span_first`
        self.span_first = int(span_first)
        # prefix_last: match_phrase_prefix mode — the query's LAST token is
        # a prefix (query text must end with '*'); the first
        # `max_expansions` vocabulary expansions (lex ASC) fill the slot
        self.prefix_last = bool(prefix_last)
        self.max_expansions = int(max_expansions)
        # span_or: SpanOrQuery mode — the query text holds '|'-separated
        # phrase clauses; hits carry the union of clause start sets
        self.span_or = bool(span_or)
        # span_not pre/post widen the exclusion window around the include
        # span (SpanNotQuery(pre, post)); the exclude phrase itself rides
        # the per-query 'not_phrase' column
        self.span_not_pre = int(span_not_pre)
        self.span_not_post = int(span_not_post)
        # interval_gaps >= 0: ES intervals (ordered, max_gaps) mode for a
        # two-term query — b strictly after a with <= max_gaps tokens
        # between (0 = adjacent); -1 = off. Per-query 'max_gaps' column
        # overrides.
        self.interval_gaps = int(interval_gaps)
        conv_tbl = pq.read_table(os.path.join(index_dir, "convmap.parquet"))
        conv_tbl = conv_tbl.sort_by("conv_id")
        self._conv_ids = np.asarray(
            conv_tbl.column("conv_id").to_pylist(), dtype=object
        )
        extents = conv_tbl.column("max_turn").to_numpy().astype(np.int64) + 1
        self._bases = np.concatenate([[0], np.cumsum(extents)[:-1]])
        self.default_limit = default_limit

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("query_id").to_pylist()
        texts = batch.column("text").to_pylist()
        limits = (
            batch.column("limit").to_pylist()
            if "limit" in batch.column_names
            else [self.default_limit] * len(qids)
        )
        windows = (
            batch.column("window").to_pylist()
            if "window" in batch.column_names
            else [self.window] * len(qids)
        )
        span_firsts = (
            batch.column("span_first").to_pylist()
            if "span_first" in batch.column_names
            else [self.span_first] * len(qids)
        )
        prefix_lasts = (
            batch.column("prefix_last").to_pylist()
            if "prefix_last" in batch.column_names
            else [self.prefix_last] * len(qids)
        )
        span_ors = (
            batch.column("span_or").to_pylist()
            if "span_or" in batch.column_names
            else [self.span_or] * len(qids)
        )
        not_phrases = (
            batch.column("not_phrase").to_pylist()
            if "not_phrase" in batch.column_names
            else [""] * len(qids)
        )
        within_phrases = (
            batch.column("within_phrase").to_pylist()
            if "within_phrase" in batch.column_names
            else [""] * len(qids)
        )
        contains_phrases = (
            batch.column("contains_phrase").to_pylist()
            if "contains_phrase" in batch.column_names
            else [""] * len(qids)
        )
        max_gaps = (
            batch.column("max_gaps").to_pylist()
            if "max_gaps" in batch.column_names
            else [self.interval_gaps] * len(qids)
        )
        cols: dict[str, list] = {n: [] for n in PHRASE_HITS_SCHEMA.names}
        for (
            qid, text, limit, window, sfirst, plast, sor, nphrase, gaps,
            wphrase, cphrase,
        ) in zip(
            qids, texts, limits, windows, span_firsts, prefix_lasts,
            span_ors, not_phrases, max_gaps, within_phrases, contains_phrases,
        ):
            k = int(limit or self.default_limit)
            gaps = -1 if gaps is None else int(gaps)
            if (sor or nphrase or gaps >= 0 or wphrase) and (
                plast or sfirst or window
            ):
                raise ValueError(
                    "span_or/not_phrase/max_gaps/within_phrase are "
                    "mutually exclusive with prefix_last/span_first/window "
                    "per query"
                )
            if cphrase and (plast or sfirst):
                raise ValueError(
                    "contains_phrase is mutually exclusive with "
                    "prefix_last/span_first per query (it composes with "
                    "window: big = span_near)"
                )
            if sum(bool(x) for x in (sor, nphrase, gaps >= 0, wphrase, cphrase)) > 1:
                raise ValueError(
                    "span_or/not_phrase/max_gaps/within_phrase/"
                    "contains_phrase are mutually exclusive per query"
                )
            if plast:
                if window or sfirst:
                    raise ValueError(
                        "prefix_last is mutually exclusive with window/"
                        "span_first"
                    )
                body = (text or "").rstrip()
                if not body.endswith("*") or len(body) < 2:
                    raise ValueError(
                        "match_phrase_prefix queries must end with '*'"
                    )
                toks = self.reader.query_tokens(body[:-1])
                if not toks:
                    raise ValueError("empty match_phrase_prefix query")
                docs, tfs, firsts = self.reader.phrase_prefix_docs(
                    toks[:-1], toks[-1], self.max_expansions
                )
            elif sfirst:
                if window:
                    raise ValueError(
                        "span_first and proximity window are mutually "
                        "exclusive per query"
                    )
                terms = self.reader.query_tokens(text or "")
                if len(terms) != 1:
                    raise ValueError("span_first mode expects a single term")
                docs, tfs, firsts = self.reader.span_first_docs(
                    terms[0], int(sfirst)
                )
            elif cphrase:
                if not window:
                    raise ValueError(
                        "span_containing requires a proximity window "
                        "(big = span_near(a, b, window))"
                    )
                terms = self.reader.query_tokens(text or "")
                if len(terms) != 2:
                    raise ValueError(
                        "span_containing expects exactly 2 big terms"
                    )
                little = self.reader.query_tokens(cphrase)
                if not little:
                    raise ValueError(
                        "span_containing expects a non-empty little phrase"
                    )
                docs, tfs, firsts = self.reader.span_containing_docs(
                    terms[0], terms[1], int(window), little
                )
            elif window:
                terms = self.reader.query_tokens(text or "")
                if len(terms) < 2:
                    raise ValueError("proximity mode expects >= 2 terms")
                if len(terms) == 2:
                    docs, tfs, firsts = self.reader.cooccur_docs(
                        terms[0], terms[1], int(window)
                    )
                else:  # N-term span_near (anchored at the first term)
                    docs, tfs, firsts = self.reader.span_near_docs(
                        terms, int(window)
                    )
            elif gaps >= 0:
                terms = self.reader.query_tokens(text or "")
                if len(terms) != 2:
                    raise ValueError(
                        "intervals (max_gaps) mode expects exactly 2 terms"
                    )
                docs, tfs, firsts = self.reader.interval_docs(
                    terms[0], terms[1], gaps
                )
            elif sor:
                if nphrase:
                    raise ValueError(
                        "span_or and not_phrase are mutually exclusive "
                        "per query"
                    )
                clauses = [
                    self.reader.query_tokens(c)
                    for c in (text or "").split("|")
                ]
                clauses = [c for c in clauses if c]
                if not clauses:
                    raise ValueError("span_or expects >= 1 phrase clause")
                docs, tfs, firsts = self.reader.span_or_docs(clauses)
            elif nphrase:
                include = self.reader.query_tokens(text or "")
                exclude = self.reader.query_tokens(nphrase)
                if not include or not exclude:
                    raise ValueError(
                        "span_not expects non-empty include and exclude "
                        "phrases"
                    )
                docs, tfs, firsts = self.reader.span_not_docs(
                    include, exclude,
                    pre=self.span_not_pre, post=self.span_not_post,
                )
            elif wphrase:
                little = self.reader.query_tokens(text or "")
                big = self.reader.query_tokens(wphrase)
                if not little or not big:
                    raise ValueError(
                        "span_within expects non-empty little (text) and "
                        "big (within_phrase) phrases"
                    )
                docs, tfs, firsts = self.reader.span_within_docs(little, big)
            else:
                docs, tfs, firsts = self.reader.phrase_docs(text or "")
            if len(docs) == 0:
                continue
            # (phrase_tf DESC, doc_id ASC): docs ascending, so a stable sort
            # on -tf preserves the doc_id tiebreak
            order = np.argsort(-tfs, kind="stable")[:k]
            d, t, f = docs[order], tfs[order], firsts[order]
            pos = np.searchsorted(self._bases, d, side="right") - 1
            cols["query_id"].extend([qid] * len(d))
            cols["rank"].extend(range(len(d)))
            cols["conv_id"].extend(self._conv_ids[pos].tolist())
            cols["turn_idx"].extend((d - self._bases[pos]).astype(np.int32).tolist())
            cols["phrase_tf"].extend(t.tolist())
            cols["first_pos"].extend(f.tolist())
        return pa.table(cols, schema=PHRASE_HITS_SCHEMA)


def phrase_search_table(
    index_dir: str,
    queries: pa.Table,
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    window: int = 0,
    span_first: int = 0,
    prefix_last: bool = False,
    max_expansions: int = 50,
    span_or: bool = False,
    span_not_pre: int = 0,
    span_not_post: int = 0,
    interval_gaps: int = -1,
) -> pa.Table:
    """Batch phrase (or, with ``window>0``, proximity; with
    ``span_first>0``, SpanFirstQuery; with ``prefix_last``,
    match_phrase_prefix; with ``span_or``, SpanOrQuery over '|'-separated
    clauses; with a per-query ``not_phrase`` column, SpanNotQuery widened
    by ``span_not_pre``/``span_not_post``) search through a Ray Data actor
    pool; returns hits sorted by (query_id, rank)."""
    import ray.data

    # fail on the driver with a clear message, not a RayTaskError from the
    # actor pool's first __init__ (round-3 handoff soft spot: querylang
    # phrase entries surfaced a raw FileNotFoundError)
    if not os.path.isdir(os.path.join(index_dir, POSITIONS)):
        raise FileNotFoundError(
            f"no positional artifact under {index_dir!r}: run "
            "build_positions(index_dir) before phrase/proximity search"
        )
    ds = ray.data.from_arrow(queries)
    hits = ds.map_batches(
        PhraseScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "default_limit": config.limit,
            "window": window,
            "span_first": span_first,
            "prefix_last": prefix_last,
            "max_expansions": max_expansions,
            "span_or": span_or,
            "span_not_pre": span_not_pre,
            "span_not_post": span_not_post,
            "interval_gaps": interval_gaps,
        },
        batch_format="pyarrow",
        batch_size=config.query_batch_size,
        concurrency=config.query_concurrency,
    )
    out = hits.to_pandas()
    if len(out) == 0:
        return PHRASE_HITS_SCHEMA.empty_table()
    out = out.sort_values(["query_id", "rank"], kind="stable").reset_index(drop=True)
    return pa.Table.from_pandas(out, schema=PHRASE_HITS_SCHEMA, preserve_index=False)


class SegmentedPhraseService:
    """Scatter-ALL phrase/proximity search across incremental segments.

    Phrase counts carry no corpus-global state (unlike BM25's idf/avgdl),
    and conversations are disjoint across segments, so the merge is a plain
    union + re-rank: results are identical to a monolithic positional index
    over the concatenated corpus. Tombstoned conversations are filtered at
    merge time; each segment is over-asked by the tombstoned DOC (turn)
    count — one deleted conversation can occupy one hit slot per turn — so
    limit-k survives the filter (round-2 ADVICE, medium)."""

    def __init__(
        self,
        index_root: str,
        config: EngineConfig = DEFAULT_CONFIG,
        *,
        window: int = 0,
        num_cpus: float = 1,
    ):
        import ray

        from clip_as_service_ray.pipelines.segments import (
            load_tombstones,
            segment_dirs,
        )

        from clip_as_service_ray.pipelines.sharded import count_tombstoned_docs

        self.config = config
        self.tombstones = load_tombstones(index_root)  # conv -> scope|None
        dirs = [
            d for d in segment_dirs(index_root)
            if os.path.isdir(os.path.join(d, POSITIONS))
        ]
        self.shard_names = [os.path.basename(d) for d in dirs]
        self.n_tombstoned_docs = (
            count_tombstoned_docs(dirs, self.tombstones) if self.tombstones else 0
        )
        if not dirs:
            raise FileNotFoundError(
                f"no segments with a positions artifact under {index_root}: "
                "add segments with add_segment(..., positions=True)"
            )
        # num_cpus=0 for co-resident serving (e.g. the HTTP server holds the
        # BM25 scatter pool too): phrase actors are bursty and sharing cores
        # beats reserving a second full pool — a 2x reservation starves the
        # very build tasks that /index needs on a small cluster
        worker = ray.remote(num_cpus=num_cpus)(PhraseScorer)
        # warm=True: a SERVING pool pays the key build + page faulting once
        # at spawn, not on the first user queries
        self.replicas = [
            worker.remote(d, config.limit, window, True) for d in dirs
        ]
        ray.get([r.__ray_ready__.remote() for r in self.replicas])

    def search(self, queries: pa.Table) -> pa.Table:
        import ray

        if queries.num_rows == 0:
            return PHRASE_HITS_SCHEMA.empty_table()
        limits = (
            queries.column("limit").to_numpy()
            if "limit" in queries.column_names
            else np.full(queries.num_rows, self.config.limit, np.int64)
        ).astype(np.int64)
        over = queries.set_column(
            queries.column_names.index("limit"),
            "limit",
            pa.array(limits + self.n_tombstoned_docs, pa.int32()),
        ) if "limit" in queries.column_names else queries.append_column(
            "limit",
            pa.array(limits + self.n_tombstoned_docs, pa.int32()),
        )
        parts = ray.get([r.__call__.remote(over) for r in self.replicas])
        tagged = []
        for name, p in zip(self.shard_names, parts):
            if p.num_rows:
                tagged.append(
                    p.append_column("_seg", pa.array([name] * p.num_rows, pa.string()))
                )
        if not tagged:
            return PHRASE_HITS_SCHEMA.empty_table()
        merged = pa.concat_tables(tagged)
        if self.tombstones:
            tomb = self.tombstones
            miss = object()

            def _dead(c, seg):
                scope = tomb.get(c, miss)
                if scope is miss:
                    return False
                return scope is None or seg in scope

            keep = pa.array(
                [
                    not _dead(c, seg)
                    for c, seg in zip(
                        merged.column("conv_id").to_pylist(),
                        merged.column("_seg").to_pylist(),
                    )
                ]
            )
            merged = merged.filter(keep)
        if merged.num_rows == 0:
            return PHRASE_HITS_SCHEMA.empty_table()
        df = merged.to_pandas()
        df = df.sort_values(
            ["query_id", "phrase_tf", "conv_id", "turn_idx"],
            ascending=[True, False, True, True],
            kind="stable",
        )
        import pandas as pd

        lim = dict(zip(queries.column("query_id").to_pylist(), limits.tolist()))
        out_parts = []
        for qid, g in df.groupby("query_id", sort=True):
            k = int(lim.get(qid, self.config.limit))
            gg = g.head(k).copy()
            gg["rank"] = np.arange(len(gg), dtype=np.int32)
            out_parts.append(gg)
        out = pd.concat(out_parts, ignore_index=True)
        return pa.Table.from_pandas(
            out[["query_id", "rank", "conv_id", "turn_idx", "phrase_tf", "first_pos"]],
            schema=PHRASE_HITS_SCHEMA,
            preserve_index=False,
        )

    def shutdown(self):
        import ray

        for r in self.replicas:
            ray.kill(r)
        self.replicas = []
