"""QueryService: a persistent query-actor pool for low-latency serving.

The reference is an always-on serving system (Jina Flow with executor
replicas, ``docs/user-guides/server.md:352-372``): the model loads once and
requests stream through. A Ray Data ``map_batches`` job re-creates its actor
pool per run — right for batch pipelines, wrong for interactive latency. This
module is the serving analog: plain ``@ray.remote`` actors (the documented
escape hatch for state the Dataset API can't express) created once, each
holding an ``IndexReader``, reused across ``search()`` calls.

Scatter/gather mirrors the reference's shard fan-out
(``retriever.md:203-225``): queries round-robin across replicas (each replica
holds the full index here; one-actor-per-index-partition is the cluster-scale
layout), results gathered and re-ordered by (query_id, rank) — the id-join
order restoration of ``client.py:160-166``.
"""

from __future__ import annotations

import pyarrow as pa

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig
from clip_as_service_ray.pipelines.oracle import HITS_SCHEMA
from clip_as_service_ray.stages.query import QueryScorer


class QueryService:
    def __init__(
        self,
        index_dir: str,
        config: EngineConfig = DEFAULT_CONFIG,
        num_replicas: int | None = None,
        synonyms: dict | None = None,
    ):
        import ray

        self.config = config
        self.index_dir = index_dir
        n = num_replicas or config.query_concurrency
        worker = ray.remote(num_cpus=1)(QueryScorer)
        self.replicas = [
            worker.remote(index_dir, config.limit, config.query_pruning,
                          synonyms=synonyms,
                          query_cache_size=config.query_cache_size)
            for _ in range(n)
        ]
        # warm: force index load now (actor __init__ errors surface here)
        ray.get([r.__ray_ready__.remote() for r in self.replicas])
        self._rr = 0

    def encode(self, queries: pa.Table) -> pa.Table:
        """Sparse BM25 term vectors for texts (the /encode analog)."""
        import ray

        self._rr = (self._rr + 1) % len(self.replicas)
        return ray.get(self.replicas[self._rr].encode_batch.remote(queries))

    def suggest(self, queries: pa.Table, max_dist: int = 2, k: int = 5) -> pa.Table:
        """Did-you-mean over the index dictionary (the /suggest analog)."""
        import ray

        self._rr = (self._rr + 1) % len(self.replicas)
        return ray.get(
            self.replicas[self._rr].suggest_batch.remote(queries, max_dist, k)
        )

    def complete(self, queries: pa.Table, k: int = 5) -> pa.Table:
        """Prefix autocomplete over the index dictionary (/complete)."""
        import ray

        self._rr = (self._rr + 1) % len(self.replicas)
        return ray.get(self.replicas[self._rr].complete_batch.remote(queries, k))

    def explain(self, text: str, conv_id: str, turn_idx: int) -> dict | None:
        """Per-term score decomposition of one (doc, query) pair — the
        Lucene-explain analog; score bit-identical to /search's."""
        import ray

        self._rr = (self._rr + 1) % len(self.replicas)
        return ray.get(
            self.replicas[self._rr].explain.remote(text, conv_id, turn_idx)
        )

    def rank(self, queries: pa.Table, candidates: pa.Table) -> pa.Table:
        """Re-rank provided candidates per query (the reference's /rank,
        set_rank semantics) through one pool replica, round-robin."""
        import ray

        self._rr = (self._rr + 1) % len(self.replicas)
        return ray.get(
            self.replicas[self._rr].rank_batch.remote(queries, candidates)
        )

    def search(self, queries: pa.Table) -> pa.Table:
        """Blocking scatter/gather search; hits sorted (query_id, rank)."""
        import ray

        n = len(self.replicas)
        if queries.num_rows == 0:
            return HITS_SCHEMA.empty_table()
        chunk = max(1, -(-queries.num_rows // n))
        futs = []
        for i in range(0, queries.num_rows, chunk):
            replica = self.replicas[self._rr % n]
            self._rr += 1
            futs.append(replica.__call__.remote(queries.slice(i, chunk)))
        parts = [p for p in ray.get(futs) if p.num_rows > 0]
        if not parts:
            return HITS_SCHEMA.empty_table()
        out = pa.concat_tables(parts)
        return out.sort_by([("query_id", "ascending"), ("rank", "ascending")])

    def profile(self) -> dict:
        """Aggregated per-stage query timings across replicas — the analog
        of the reference client's profile() latency tree (client.py:68-120):
        score (tokenize+lookup+score), invert (doc id -> conv/turn), plus
        lazy-decode counters."""
        import ray

        profs = ray.get([r.profile.remote() for r in self.replicas])
        agg: dict = {}
        for p in profs:
            for k, v in p.items():
                agg[k] = agg.get(k, 0) + v
        # blocks_total is per-replica state, not additive
        if profs:
            agg["blocks_total"] = profs[0]["blocks_total"]
        return agg

    def shutdown(self) -> None:
        import ray

        for r in self.replicas:
            ray.kill(r)
        self.replicas = []
