"""Approximate nearest neighbor over embedding columns: brute-force baseline
+ IVF (inverted-file) variant.

The AnnLite /search analog (``retriever.md:139-168``): cosine top-k with the
limit-k contract. Brute force = per-batch numpy matmul against a broadcast
query matrix (exact; the baseline). IVF = coarse k-means cells; build
assigns each vector to its nearest centroid (one map_batches pass), search
probes the ``nprobe`` nearest cells only — the scale path: at 10^12 vectors
the probe set is a tiny fraction of cells, and cells are the partition key
for pruned parquet reads (one directory per cell range).

Everything is deterministic: centroid training is seeded k-means on a seeded
sample; ties break by lowest index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


def train_centroids(
    sample: np.ndarray, n_centroids: int, *, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Seeded Lloyd k-means (cosine via normalized dot) on a driver-side
    sample — the small-side model that gets broadcast, like the reference's
    model weights in the executor ctor."""
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)
    cents = x[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_assign(ds, centroids: np.ndarray):
    """Dataset(vec_id, embedding) -> Dataset(cell, vec_id, embedding):
    one vectorized pass; `cell` is the partition key for the index layout."""
    import ray

    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    class Assign:
        def __init__(self):
            self.cents = ray.get(cents_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
            cell = np.argmax(emb @ self.cents.T, axis=1).astype(np.int32)
            return pa.table(
                {
                    "cell": pa.array(cell, pa.int32()),
                    "vec_id": batch.column("vec_id"),
                    "embedding": batch.column("embedding"),
                }
            )

    return ds.map_batches(Assign, batch_format="pyarrow", batch_size=4096, concurrency=2)


def ivf_search(
    assigned_ds,
    centroids: np.ndarray,
    query: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
) -> pa.Table:
    """Probe the nprobe nearest cells, exact-score their members, global
    top-k by (sim DESC, vec_id ASC). With nprobe == n_centroids this is
    exact (== brute force), which is how the SQL oracle checks it."""
    import ray

    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    cents = _normalize(np.asarray(centroids, dtype=np.float64))
    probe = np.argsort(-(cents @ q), kind="stable")[:nprobe].astype(np.int32)
    probe_ref = ray.put(set(int(c) for c in probe))
    q_ref = ray.put(q)

    class ProbeScore:
        def __init__(self):
            self.cells = ray.get(probe_ref)
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cell = batch.column("cell").to_numpy()
            keep = np.fromiter((int(c) in self.cells for c in cell), dtype=bool, count=len(cell))
            if not keep.any():
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            sub = batch.filter(pa.array(keep))
            emb = _normalize(np.array(sub.column("embedding").to_pylist(), dtype=np.float64))
            sims = emb @ self.q
            vec_ids = sub.column("vec_id").to_numpy().astype(np.int64)
            top = np.lexsort((vec_ids, -sims))[: min(k, len(vec_ids))]
            return pa.table({"vec_id": pa.array(vec_ids[top], pa.int64()),
                             "sim": pa.array(sims[top], pa.float64())})

    parts = assigned_ds.map_batches(
        ProbeScore, batch_format="pyarrow", batch_size=4096, concurrency=2
    ).to_pandas()
    if len(parts) == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
    sims = parts["sim"].to_numpy()
    vec_ids = parts["vec_id"].to_numpy()
    top = np.lexsort((vec_ids, -sims))[: min(k, len(vec_ids))]
    return pa.table(
        {"vec_id": pa.array(vec_ids[top], pa.int64()),
         "sim": pa.array(sims[top], pa.float64())}
    )
