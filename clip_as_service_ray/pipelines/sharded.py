"""Sharded index build + scatter-ALL-search across shards.

The reference's sharding model (``retriever.md:180-229``): `/index` routes
each doc to ONE shard (polling ANY), `/search` scatters each query to ALL
shards, each returns its local top-limit, the gateway merges. Here:

- ``build_sharded_index``: each shard is an independent, independently
  RESUMABLE ``build_index`` run over its own input slice (this is the
  per-partition resume story: a failed run re-enters and skips finished
  shards via their manifests). Shard assignment = caller-provided input
  splits (by file / conv range), mirroring polling-ANY.

- BM25 correctness across shards requires GLOBAL corpus stats: per-shard
  n_docs / sum_dl are summed into union stats, per-shard dictionaries are
  summed into a union df table, and every shard's scorer is overridden with
  those globals at query time. (Shard-local block-max bounds are computed
  under shard-local avgdl, which is not a valid bound under global avgdl, so
  pruning is disabled in sharded mode — the dense exact path is the default
  for the hot queries anyway.)

- ``ShardedQueryService``: one scorer replica (or more) per shard; a query
  batch is sent to ALL shards, per-shard ranked hits come back, and the
  merge keeps the global top-limit per query under the same deterministic
  tie-break. Identical results to a single-shard build over the union corpus
  (tests/test_sharded.py).
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.oracle import HITS_SCHEMA
from clip_as_service_ray.state import manifest as mf


_MISSING = object()


def _as_scoped(tombstones) -> dict:
    """Normalize tombstones to the scoped form: conv -> segment-name scope
    (None = all segments; a plain set/frozenset input means un-scoped)."""
    if isinstance(tombstones, dict):
        return dict(tombstones)
    return {c: None for c in tombstones}


def count_tombstoned_docs(index_dirs: list[str], tombstones) -> int:
    """Total DOC (turn) count of the tombstoned conversations across index
    dirs: sum of (max_turn + 1) from each dir's convmap, honoring each
    delete's SEGMENT SCOPE (a conversation re-added after its delete is live
    in the newer segment and must not inflate the over-ask). This is the
    correct over-ask amount for limit-k under query-time tombstone
    filtering — a single deleted conversation can occupy one hit slot PER
    TURN. Cost is one column-pruned convmap read per dir at service
    construction."""
    tomb = _as_scoped(tombstones)
    if not tomb:
        return 0
    total = 0
    for d in index_dirs:
        name = os.path.basename(d)
        dead_here = sorted(
            c for c, scope in tomb.items() if scope is None or name in scope
        )
        if not dead_here:
            continue
        t = pq.read_table(
            os.path.join(d, "convmap.parquet"), columns=["conv_id", "max_turn"]
        )
        convs = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
        dead = np.isin(convs, np.asarray(dead_here, dtype=object))
        if dead.any():
            ext = t.column("max_turn").to_numpy().astype(np.int64) + 1
            total += int(ext[dead].sum())
    return total


def write_union_stats(index_root: str, shard_dirs: list[str]) -> dict:
    """Union corpus stats + union df dictionary across independent index
    dirs (shards or segments): per-dir n_docs/sum_dl summed, per-term df
    summed into ``union_dictionary/dictionary.parquet``. BM25 idf/length
    normalization must see the WHOLE corpus — the reference's
    global-model-per-shard semantics."""
    n_docs, sum_dl = 0, 0
    df_union: dict[str, int] = defaultdict(int)
    for d in shard_dirs:
        st = mf.read_json(os.path.join(d, "stats.json"))
        n_docs += int(st["n_docs"])
        sum_dl += int(st.get("sum_dl", 0))
        t = pq.read_table(os.path.join(d, "dictionary"))
        for term, df in zip(t.column("term").to_pylist(), t.column("df").to_pylist()):
            df_union[term] += int(df)
    union_dir = os.path.join(index_root, "union_dictionary")
    mf.reset_stage(union_dir)
    pq.write_table(
        pa.table(
            {"term": pa.array(list(df_union.keys()), pa.string()),
             "df": pa.array(list(df_union.values()), pa.int64())}
        ),
        os.path.join(union_dir, "dictionary.parquet"),
    )
    return {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        "n_terms_union": len(df_union),
    }


def build_sharded_index(
    shard_sources: list,
    index_root: str,
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    overwrite: bool = False,
) -> dict:
    """Build one index dir per input shard + union stats. Returns the root
    manifest. Each shard build is skip-if-valid resumable on its own."""
    os.makedirs(index_root, exist_ok=True)
    shard_reports = []
    shard_dirs = []
    for k, src in enumerate(shard_sources):
        shard_dir = os.path.join(index_root, f"shard={k}")
        shard_dirs.append(shard_dir)
        shard_reports.append(build_index(src, shard_dir, config, overwrite=overwrite))

    union = write_union_stats(index_root, shard_dirs)
    payload = {
        "n_shards": len(shard_sources),
        **union,
        "n_postings": sum(r["n_postings"] for r in shard_reports),
        "shards": shard_reports,
    }
    mf.write_json(os.path.join(index_root, "manifest.json"), payload)
    return payload


def _merge_assist(parts: list[pa.Table], k: int, with_dist: bool) -> pa.Table:
    """Merge per-segment suggest/complete tables. Each shard's reader holds
    the UNION dictionary (global_stats df_path), so a term's df is already
    the global value — the merge DEDUPES per (query, term) (max = the common
    value), it must not sum. dist is segment-invariant; per-query top-k
    re-ranks globally."""
    import pandas as pd

    merged = pd.concat([p.to_pandas() for p in parts], ignore_index=True)
    if len(merged) == 0:
        return parts[0].slice(0, 0)
    agg = {"df": "max"} | ({"dist": "min"} if with_dist else {})
    g = merged.groupby(["query_id", "term"], as_index=False).agg(agg)
    sort_cols = (["query_id", "dist", "df", "term"] if with_dist
                 else ["query_id", "df", "term"])
    asc = [True, True, False, True] if with_dist else [True, False, True]
    g = g.sort_values(sort_cols, ascending=asc, kind="mergesort")
    if k > 0:
        g = g.groupby("query_id", sort=False).head(k)
    cols = {
        "query_id": pa.array(g["query_id"].to_numpy(), pa.int64()),
        "term": pa.array(g["term"].tolist(), pa.string()),
    }
    if with_dist:
        cols["dist"] = pa.array(g["dist"].to_numpy(), pa.int64())
    cols["df"] = pa.array(g["df"].to_numpy(), pa.int64())
    return pa.table(cols)


class ScatterQueryService:
    """Scatter-ALL-search over per-partition scorer actors with GLOBAL
    corpus stats — the shared engine behind sharded indexes and incremental
    segments (both are 'many independent index dirs + union stats')."""

    def __init__(
        self,
        index_dirs: list[str],
        global_stats: dict,
        config: EngineConfig = DEFAULT_CONFIG,
        tombstones: frozenset[str] = frozenset(),
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
        import ray

        from clip_as_service_ray.stages.query import QueryScorer

        # LM similarities score with the term's COLLECTION frequency (ctf),
        # which each shard derives from its OWN postings — correct only when
        # one shard holds the whole collection. df/N/avgdl-only kernels
        # (tfidf, boolean) use the union global_stats and stay shard-safe.
        if similarity in ("lmdirichlet", "lmjm") and len(index_dirs) > 1:
            raise ValueError(
                f"similarity {similarity!r} needs union collection term "
                "frequencies; multi-shard scatter would use shard-local ctf "
                "(merge segments first, or use tfidf/boolean/bm25)"
            )
        self.config = config
        # deleted conv_ids filtered at query time (segment tombstones);
        # shards are over-asked by the number of tombstoned DOCS (turns) so
        # limit-k survives the filter even if every deleted doc out-ranked
        # the survivors. Counting conversations is NOT enough: one tombstoned
        # 12-turn conversation can occupy 12 hit slots (round-2 ADVICE, high).
        self.tombstones = _as_scoped(tombstones)
        self.n_tombstoned_docs = (
            count_tombstoned_docs(index_dirs, self.tombstones)
            if self.tombstones
            else 0
        )
        self.n_shards = len(index_dirs)
        self.shard_names = [os.path.basename(d) for d in index_dirs]
        # analyzers must agree across segments: each reader folds queries by
        # ITS OWN stats.json analyzer, so a mixed set would score the same
        # query against different term spaces and the merge would be garbage
        analyzers = set()
        for d in index_dirs:
            sp = os.path.join(d, "stats.json")
            if os.path.exists(sp):
                analyzers.add(mf.read_json(sp).get("analyzer"))
        if len(analyzers) > 1:
            raise ValueError(
                f"segments built with different analyzers: {sorted(map(str, analyzers))}"
            )
        # boolean/prefix/suffix/regex/fuzzy/boosted/msm modes are
        # shard-safe: each shard
        # expands over its LOCAL vocabulary but scores with the UNION df/idf — a term
        # present only in other shards contributes zero to this shard's docs
        # either way, so scatter results are bit-identical to a monolithic
        # index in every mode (test-pinned); a per-query `exclude` column
        # flows through unchanged (shard-local doc exclusion is exact).
        # num_cpus=0 for SECONDARY co-resident pools (e.g. the HTTP server's
        # lazily-spawned boolean-mode pools next to the primary OR pool): the
        # modes are bursty and sharing cores beats a 2x CPU reservation that
        # can starve concurrent build tasks on a small cluster
        worker = ray.remote(num_cpus=num_cpus)(QueryScorer)
        self.replicas = [
            worker.remote(
                d,
                config.limit,
                False,  # pruning off: shard-local block bounds invalid under global avgdl
                global_stats,
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
                query_cache_size=config.query_cache_size,
                delta=delta,
                similarity=similarity,
                sim_param=sim_param,
                common_terms=common_terms,
                bool_query=bool_query,
                min_should=min_should,
                k1=k1,
                b=b,
                bool_prefix=bool_prefix,
            )
            for d in index_dirs
        ]
        ray.get([r.__ray_ready__.remote() for r in self.replicas])

    def explain(self, text: str, conv_id: str, turn_idx: int) -> dict | None:
        """Scatter Lucene-explain: every segment is asked, only owners
        answer; scoped tombstones filter dead (conv, segment) pairs and the
        NEWEST live owner wins (the update_convs contract: a re-added
        conversation's latest version is the visible one)."""
        import ray

        outs = ray.get(
            [r.explain.remote(text, conv_id, turn_idx) for r in self.replicas]
        )
        tomb = self.tombstones
        best = None
        for seg, out in zip(self.shard_names, outs):
            if out is None:
                continue
            if conv_id in tomb:
                scope = tomb[conv_id]
                if scope is None or seg in scope:
                    continue  # dead in this segment
            best = dict(out)
            best["segment"] = seg
        return best

    def rank(self, queries: pa.Table, candidates: pa.Table) -> pa.Table:
        """Scatter /rank: every segment ranks the candidates IT holds
        (lenient resolution), results merge per query under the same
        (score DESC, conv ASC, turn ASC) order; scoped tombstones filter
        dead candidate versions. Scores use the union global stats, so a
        candidate's rank score equals its retrieval score."""
        import ray

        if queries.num_rows == 0 or candidates.num_rows == 0:
            return HITS_SCHEMA.empty_table()
        futs = [
            r.rank_batch.remote(queries, candidates, True) for r in self.replicas
        ]
        raw = ray.get(futs)
        frames = []
        for name, p in zip(self.shard_names, raw):
            if p.num_rows > 0:
                f = p.to_pandas()
                f["_seg"] = name
                frames.append(f)
        if not frames:
            return HITS_SCHEMA.empty_table()
        import pandas as pd

        merged = pd.concat(frames, ignore_index=True)
        if self.tombstones:
            tomb = self.tombstones

            def _dead(c, seg):
                scope = tomb.get(c, _MISSING)
                if scope is _MISSING:
                    return False
                return scope is None or seg in scope

            drop = np.fromiter(
                (_dead(c, seg) for c, seg in zip(merged["conv_id"], merged["_seg"])),
                dtype=bool, count=len(merged),
            )
            merged = merged[~drop]
        out = {n: [] for n in HITS_SCHEMA.names}
        for qid, g in merged.groupby("query_id", sort=True):
            g = g.sort_values(
                ["score", "conv_id", "turn_idx"], ascending=[False, True, True]
            )
            n = len(g)
            out["query_id"].extend([qid] * n)
            out["rank"].extend(range(n))
            out["conv_id"].extend(g.conv_id)
            out["turn_idx"].extend(g.turn_idx)
            out["score"].extend(g.score)
        return pa.table(out, schema=HITS_SCHEMA)

    def suggest(self, queries: pa.Table, max_dist: int = 2, k: int = 5) -> pa.Table:
        """Scatter did-you-mean: each segment expands over its LOCAL
        vocabulary (the union of shard vocabs IS the union vocabulary) but
        reports the UNION df (readers load global_stats df_path), so the
        merge dedupes per (query, term) and re-ranks globally (dist ASC,
        df DESC, term ASC). Each shard returns its full neighborhood (k=0):
        per-shard top-k could hide a term that only out-ranks after the
        global merge. df counts tombstoned docs until compaction — an
        approximate prior by design in a segmented index."""
        import ray

        if queries.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
                 "dist": pa.array([], pa.int64()), "df": pa.array([], pa.int64())}
            )
        raw = ray.get(
            [r.suggest_batch.remote(queries, max_dist, 0) for r in self.replicas]
        )
        return _merge_assist(raw, k, with_dist=True)

    def complete(self, queries: pa.Table, k: int = 5) -> pa.Table:
        """Scatter autocomplete: union of per-segment prefix expansions
        (union df deduped per (query, term)), global (df DESC, term ASC)
        top-k."""
        import ray

        if queries.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64())}
            )
        raw = ray.get(
            [r.complete_batch.remote(queries, 0) for r in self.replicas]
        )
        return _merge_assist(raw, k, with_dist=False)

    def search(self, queries: pa.Table) -> pa.Table:
        import ray

        if queries.num_rows == 0:
            return HITS_SCHEMA.empty_table()
        limits = (
            dict(zip(queries.column("query_id").to_pylist(), queries.column("limit").to_pylist()))
            if "limit" in queries.column_names
            else {}
        )
        scatter_q = queries
        if self.tombstones:
            extra = self.n_tombstoned_docs
            raised = [
                int(limits.get(q, self.config.limit)) + extra
                for q in queries.column("query_id").to_pylist()
            ]
            scatter_q = queries.drop_columns(
                [c for c in ("limit",) if c in queries.column_names]
            ).append_column("limit", pa.array(raised, pa.int32()))
        futs = [r.__call__.remote(scatter_q) for r in self.replicas]  # scatter ALL
        raw = ray.get(futs)
        frames = []
        for name, p in zip(self.shard_names, raw):
            if p.num_rows > 0:
                f = p.to_pandas()
                f["_seg"] = name  # provenance for scope-aware tombstones
                frames.append(f)
        if not frames:
            return HITS_SCHEMA.empty_table()
        import pandas as pd

        merged = pd.concat(frames, ignore_index=True)
        if self.tombstones:
            tomb = self.tombstones

            def _dead(c, seg):
                scope = tomb.get(c, _MISSING)
                if scope is _MISSING:
                    return False
                return scope is None or seg in scope

            drop = np.fromiter(
                (_dead(c, seg) for c, seg in zip(merged["conv_id"], merged["_seg"])),
                dtype=bool, count=len(merged),
            )
            merged = merged[~drop]
        out = {n: [] for n in HITS_SCHEMA.names}
        for qid, g in merged.groupby("query_id", sort=True):
            k = int(limits.get(qid, self.config.limit))
            # deterministic k-way merge of per-shard ranked lists
            g = g.sort_values(
                ["score", "conv_id", "turn_idx"], ascending=[False, True, True]
            ).head(k)
            n = len(g)
            out["query_id"].extend([qid] * n)
            out["rank"].extend(range(n))
            out["conv_id"].extend(g.conv_id)
            out["turn_idx"].extend(g.turn_idx)
            out["score"].extend(g.score)
        return pa.table(out, schema=HITS_SCHEMA)

    def shutdown(self) -> None:
        import ray

        for r in self.replicas:
            ray.kill(r)
        self.replicas = []


class ShardedQueryService(ScatterQueryService):
    """Scatter-ALL-search over a ``build_sharded_index`` root."""

    def __init__(
        self, index_root: str, config: EngineConfig = DEFAULT_CONFIG, **modes
    ):
        root = mf.read_json(os.path.join(index_root, "manifest.json"))
        global_stats = {
            "n_docs": int(root["n_docs"]),
            "avgdl": float(root["avgdl"]),
            "df_path": os.path.join(index_root, "union_dictionary", "dictionary.parquet"),
        }
        dirs = [
            os.path.join(index_root, f"shard={k}") for k in range(int(root["n_shards"]))
        ]
        super().__init__(dirs, global_stats, config, **modes)
