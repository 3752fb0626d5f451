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

import os

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


def ivf_build(ds, centroids: np.ndarray, index_dir: str, *, overwrite: bool = False) -> str:
    """Write the cell-PARTITIONED IVF index: assigned vectors land under
    ``index_dir/cell=K/`` (parquet partition_cols) and the centroid table
    under ``_centroids.parquet``. ``cell`` is the physical pruning key: a
    probe reads ONLY its nprobe cell directories, so bytes read scale with
    nprobe, not with the corpus — the AnnLite cell model
    (docs/user-guides/retriever.md:156-168) expressed as a parquet layout."""
    import json
    import shutil

    import pyarrow.parquet as pq

    done = os.path.join(index_dir, "_ivf.json")
    if os.path.exists(done) and not overwrite:
        return index_dir
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    cents = _normalize(np.asarray(centroids, dtype=np.float64))
    ivf_assign(ds, cents).write_parquet(index_dir, partition_cols=["cell"])
    pq.write_table(
        pa.table(
            {
                "cell": pa.array(range(len(cents)), pa.int64()),
                "centroid": pa.array([c.tolist() for c in cents], pa.list_(pa.float64())),
            }
        ),
        os.path.join(index_dir, "_centroids.parquet"),
    )
    with open(done, "w") as f:
        json.dump({"n_centroids": int(len(cents)), "dim": int(cents.shape[1])}, f)
    return index_dir


def load_centroids(index_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, "_centroids.parquet"))
    return np.array(t.column("centroid").to_pylist(), dtype=np.float64)


def probe_cells(centroids: np.ndarray, query: np.ndarray, nprobe: int) -> np.ndarray:
    """The nprobe nearest cells to the query (deterministic tie-break)."""
    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    cents = _normalize(np.asarray(centroids, dtype=np.float64))
    return np.argsort(-(cents @ q), kind="stable")[:nprobe].astype(np.int64)


def ivf_search(
    index_dir: str,
    query: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    return_stats: bool = False,
):
    """Probe the nprobe nearest cells by reading ONLY their partition
    directories, exact-score their members, global top-k by (sim DESC,
    vec_id ASC). With nprobe == n_centroids this is exact (== brute force),
    which is how the SQL oracle checks it. ``return_stats`` additionally
    reports cells/rows/bytes actually read (pinned by tests/test_ann.py:
    probe cost scales with nprobe, not corpus size)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    cents = load_centroids(index_dir)
    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    cells = probe_cells(cents, q, nprobe)
    paths = []
    for c in cells:
        p = os.path.join(index_dir, f"cell={c}")
        if os.path.isdir(p):
            paths.append(p)
    empty = pa.table(
        {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
    )
    stats = {"cells_probed": len(paths), "rows_read": 0, "bytes_read": 0}
    if not paths:
        return (empty, stats) if return_stats else empty
    if return_stats:
        for p in paths:
            for f in os.listdir(p):
                if f.endswith(".parquet"):
                    fp = os.path.join(p, f)
                    stats["rows_read"] += pq.ParquetFile(fp).metadata.num_rows
                    stats["bytes_read"] += os.path.getsize(fp)
    q_ref = ray.put(q)

    class ProbeScore:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
            sims = emb @ self.q
            vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
            top = np.lexsort((vec_ids, -sims))[: min(k, len(vec_ids))]
            return pa.table({"vec_id": pa.array(vec_ids[top], pa.int64()),
                             "sim": pa.array(sims[top], pa.float64())})

    files = [
        os.path.join(p, f)
        for p in paths
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    parts = (
        ray.data.read_parquet(files, columns=["vec_id", "embedding"])
        .map_batches(ProbeScore, batch_format="pyarrow", batch_size=4096, concurrency=2)
        .to_pandas()
    )
    if len(parts) == 0:
        return (empty, stats) if return_stats else empty
    sims = parts["sim"].to_numpy()
    vec_ids = parts["vec_id"].to_numpy()
    top = np.lexsort((vec_ids, -sims))[: min(k, len(vec_ids))]
    out = pa.table(
        {"vec_id": pa.array(vec_ids[top], pa.int64()),
         "sim": pa.array(sims[top], pa.float64())}
    )
    return (out, stats) if return_stats else out
