"""HNSW graph ANN (Malkov & Yashunin, TPAMI 2018) — shard-partitioned.

The graph-based member of the ANN family (brute / IVF / IVF-PQ live in
stages/ann.py, stages/pq.py). Scale story: vectors hash-partition into
shards by vec_id; each shard builds an independent HNSW graph INSIDE the
map_groups call that owns its rows (graph state never crosses workers, no
driver materialization) and scores the broadcast query set right there;
the driver merges k-sized per-shard results — the same scatter/merge shape
as the sharded BM25 index. At 10^12 vectors shards are the unit of
placement and resume, and per-shard search is O(ef * M * log n) distance
computations instead of the brute-force O(n).

Everything is deterministic:

- level assignment uses splitmix64(vec_id) -> uniform(0,1) ->
  floor(-ln(u) * mL) instead of an RNG stream, so a vector's level is a
  pure function of its id (insertion ORDER cannot change levels, and a
  re-partitioned rebuild assigns the same levels);
- insertion order is vec_id ASC within a shard;
- all candidate/neighbor orderings tie-break (distance, id).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return z ^ (z >> np.uint64(31))


def assign_levels(ids: np.ndarray, m: int, seed: int = 0x5EED) -> np.ndarray:
    """Deterministic HNSW level per id: u = splitmix64(id ^ seed) scaled to
    (0,1), level = floor(-ln(u) / ln(M)) — the paper's mL = 1/ln(M)."""
    h = _splitmix64(np.asarray(ids, dtype=np.uint64) ^ np.uint64(seed))
    # (0, 1]: add 1 so u never hits 0
    u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
    return np.floor(-np.log(u) / np.log(float(m))).astype(np.int64)


class HNSWGraph:
    """One shard's navigable small-world graph over normalized vectors.

    Similarity = inner product on unit vectors (cosine); internally
    distances are d = -sim so the textbook min-heap formulation applies.
    """

    def __init__(self, m: int = 8, ef_construction: int = 64, seed: int = 0x5EED):
        self.m = int(m)
        self.m_max0 = 2 * self.m  # level-0 degree cap, per the paper
        self.efc = int(ef_construction)
        self.seed = int(seed)
        self.ids: np.ndarray | None = None  # external ids, insertion order
        self.vecs: np.ndarray | None = None  # unit vectors, same order
        self.levels: np.ndarray | None = None
        # adjacency: per level, list of int64 ndarrays (internal indices)
        self.links: list[list[np.ndarray]] = []
        self.entry: int = -1
        self.max_level: int = -1

    # -- internals ---------------------------------------------------------

    def _dist(self, q: np.ndarray, idx: np.ndarray) -> np.ndarray:
        return -(self.vecs[idx] @ q)

    def _search_layer(
        self, q: np.ndarray, entries: list[tuple[float, int]], ef: int, level: int
    ) -> list[tuple[float, int]]:
        """Greedy beam search at one level. entries/result: (d, idx) lists;
        result is the ef best found, sorted (d ASC, idx ASC)."""
        visited = set(i for _, i in entries)
        cand = list(entries)  # min-heap by (d, idx)
        heapq.heapify(cand)
        best = [(-d, -i) for d, i in entries]  # max-heap via negation
        heapq.heapify(best)
        adj = self.links[level]
        while cand:
            d_c, c = heapq.heappop(cand)
            d_worst = -best[0][0]
            if d_c > d_worst and len(best) >= ef:
                break
            neigh = adj[c]
            fresh = [int(n) for n in neigh if int(n) not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            fr = np.asarray(fresh, dtype=np.int64)
            ds = self._dist(q, fr)
            order = np.lexsort((fr, ds))
            for j in order:
                d_n, n = float(ds[j]), int(fr[j])
                if len(best) < ef:
                    heapq.heappush(best, (-d_n, -n))
                    heapq.heappush(cand, (d_n, n))
                elif d_n < -best[0][0]:
                    heapq.heapreplace(best, (-d_n, -n))
                    heapq.heappush(cand, (d_n, n))
        out = sorted((-nd, -ni) for nd, ni in best)
        return out

    def _select(self, cands: list[tuple[float, int]], m: int) -> np.ndarray:
        """Neighbor selection: the m closest, ties by id (the paper's
        'simple' selector — deterministic and adequate at shard sizes)."""
        return np.asarray([i for _, i in sorted(cands)[:m]], dtype=np.int64)

    # -- build -------------------------------------------------------------

    def build(self, ids: np.ndarray, vecs: np.ndarray) -> "HNSWGraph":
        order = np.argsort(ids, kind="stable")  # insertion order = id ASC
        self.ids = np.asarray(ids, dtype=np.int64)[order]
        v = np.asarray(vecs, dtype=np.float64)[order]
        n = np.linalg.norm(v, axis=1, keepdims=True)
        self.vecs = v / np.where(n == 0, 1.0, n)
        self.levels = assign_levels(self.ids, self.m, self.seed)
        top = int(self.levels.max()) if len(self.ids) else -1
        self.links = [
            [np.empty(0, np.int64) for _ in range(len(self.ids))]
            for _ in range(top + 1)
        ]
        self.entry, self.max_level = -1, -1
        for i in range(len(self.ids)):
            self._insert(i)
        return self

    def _insert(self, i: int) -> None:
        l_i = int(self.levels[i])
        if self.entry < 0:
            self.entry, self.max_level = i, l_i
            return
        q = self.vecs[i]
        ep = [(float(-(self.vecs[self.entry] @ q)), self.entry)]
        # zoom down through levels above the node's level (greedy, ef=1)
        for level in range(self.max_level, l_i, -1):
            ep = self._search_layer(q, ep, 1, level)
        # connect at min(l_i, max_level) .. 0
        for level in range(min(l_i, self.max_level), -1, -1):
            found = self._search_layer(q, ep, self.efc, level)
            m_max = self.m_max0 if level == 0 else self.m
            neigh = self._select(found, self.m)
            self.links[level][i] = neigh
            for nb in neigh:
                nb = int(nb)
                cur = self.links[level][nb]
                if len(cur) < m_max:
                    self.links[level][nb] = np.append(cur, np.int64(i))
                else:
                    # prune: keep the m_max closest to nb (ties by id)
                    cand = np.append(cur, np.int64(i))
                    ds = self._dist(self.vecs[nb], cand)
                    keep = np.lexsort((cand, ds))[:m_max]
                    self.links[level][nb] = cand[np.sort(keep)]
            ep = found
        if l_i > self.max_level:
            self.entry, self.max_level = i, l_i

    # -- query -------------------------------------------------------------

    def search(self, q: np.ndarray, k: int, ef: int = 64):
        """Top-k by cosine: returns (ids, sims) sorted (sim DESC, id ASC)."""
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        qn = np.asarray(q, dtype=np.float64)
        nrm = np.linalg.norm(qn)
        qn = qn / (nrm if nrm else 1.0)
        ep = [(float(-(self.vecs[self.entry] @ qn)), self.entry)]
        for level in range(self.max_level, 0, -1):
            ep = self._search_layer(qn, ep, 1, level)
        found = self._search_layer(qn, ep, max(ef, k), 0)
        idx = np.asarray([i for _, i in found[:k]], dtype=np.int64)
        sims = self.vecs[idx] @ qn
        ext = self.ids[idx]
        order = np.lexsort((ext, -sims))
        return ext[order], sims[order]


def hnsw_topk_table(
    ds,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_shards: int = 4,
    m: int = 8,
    ef_construction: int = 64,
    ef: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Scatter/build/search/merge in ONE streaming pass: shard by
    hash(vec_id), each shard group builds its HNSW graph and scores every
    query (broadcast — queries are the small side), driver merges the
    k-sized per-shard partials. Returns (query_id, vec_id, sim) with sim
    rounded to 6dp, (sim DESC, vec_id ASC) per query."""
    import ray
    import ray.data

    q = np.asarray(queries, dtype=np.float64)
    if q.ndim == 1:
        q = q[None, :]
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
    q_ref = ray.put(qn)
    n_shards = max(1, int(n_shards))

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        shard = (_splitmix64(ids.astype(np.uint64)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return batch.append_column("_shard", pa.array(shard, pa.int64()))

    def build_and_search(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy()
        vecs = np.array(group.column(vec_col).to_pylist(), dtype=np.float64)
        g = HNSWGraph(m=m, ef_construction=ef_construction).build(ids, vecs)
        qs = ray.get(q_ref)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(qs)):
            hit_ids, sims = g.search(qs[qi], k, ef=ef)
            out_q.extend([qi] * len(hit_ids))
            out_id.extend(hit_ids.tolist())
            out_s.extend(sims.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    parts = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_shard", num_partitions=n_shards)
        .map_groups(build_and_search, batch_format="pyarrow")
        .to_pandas()
    )
    out_parts = []
    for qi, grp in parts.groupby("query_id", sort=True):
        sims = grp["sim"].to_numpy()
        vids = grp["vec_id"].to_numpy()
        top = np.lexsort((vids, -sims))[: min(k, len(vids))]
        out_parts.append(
            pa.table(
                {
                    "query_id": pa.array([qi] * len(top), pa.int64()),
                    "vec_id": pa.array(vids[top], pa.int64()),
                    "sim": pa.array(np.round(sims[top], 6), pa.float64()),
                }
            )
        )
    if not out_parts:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    return pa.concat_tables(out_parts)
