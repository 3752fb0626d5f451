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

from clip_as_service_ray.functions.guards import guard_candidate_pairs
from clip_as_service_ray.functions.partitions import (
    parts_for_dataset,
    shuffle_partitions,
)


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


def cosine_lsh_pairs(
    ds,
    *,
    threshold: float = 0.4,
    bits_per_band: int = 4,
    n_bands: int = 64,
    seed: int = 7,
) -> pa.Table:
    """Embedding-cosine near-dup pairs over the WHOLE table via
    random-hyperplane LSH — the scale path for ``cosine_dup_pairs`` (whose
    broadcast-candidate kernel is bounded by max_id):

      normalize -> sign(V @ R) bit signature -> (band, band_val, vec_id)
      rows -> groupby(band, band_val) candidate pairs -> pair-keyed shuffle
      verify with exact cosine (both vectors co-located per pair group).

    Collision probability per band for angle θ is (1-θ/π)^bits; with 64
    bands x 4 bits the miss probability AT cos=0.4 is ~(1-0.158)^64 ≈ 2e-5
    per pair, so on deterministic data the output equals the exact
    all-pairs result (the SQL oracle checks exactly that). Returns
    (vec_a, vec_b, sim) sorted."""
    import ray

    OUT = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("sim", pa.float64())]
    )

    class Bands:
        """(band, band_val, vec_id) rows; hyperplanes generated once per
        actor from the shared seed (identical everywhere)."""

        def __init__(self):
            self._R = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
            if self._R is None:
                r = np.random.default_rng(seed)
                self._R = r.normal(size=(emb.shape[1], n_bands * bits_per_band))
            bits = (emb @ self._R) > 0  # (n, bands*bits)
            weights = (1 << np.arange(bits_per_band, dtype=np.int64))
            vals = bits.reshape(len(emb), n_bands, bits_per_band) @ weights
            ids = batch.column("vec_id").to_numpy().astype(np.int64)
            return pa.table(
                {
                    "band": pa.array(
                        np.tile(np.arange(n_bands, dtype=np.int64), len(ids)), pa.int64()
                    ),
                    "band_val": pa.array(vals.ravel().astype(np.int64), pa.int64()),
                    "vec_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
                }
            )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        docs = np.unique(group.column("vec_id").to_numpy())
        if len(docs) < 2:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
            )
        if len(docs) > 500:
            import logging

            logging.getLogger(__name__).warning(
                "LSH bucket with %d vectors capped to first 500", len(docs)
            )
            docs = docs[:500]
        ia, ib = np.triu_indices(len(docs), k=1)
        return pa.table(
            {"vec_a": pa.array(docs[ia], pa.int64()), "vec_b": pa.array(docs[ib], pa.int64())}
        )

    cand = (
        ds.map_batches(Bands, batch_format="pyarrow", batch_size=4096, concurrency=2)
        .groupby(["band", "band_val"], num_partitions=parts_for_dataset(ds))
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if len(cand) == 0:
        return OUT.empty_table()
    pairs = guard_candidate_pairs(
        np.unique(cand[["vec_a", "vec_b"]].to_numpy(), axis=0),
        stage="cosine_lsh_pairs",
    )

    # pair-keyed distributed verify: exact cosine with both sides co-located
    memb: dict[int, list] = {}
    for pi, (a, b) in enumerate(pairs):
        memb.setdefault(int(a), []).append(pi)
        memb.setdefault(int(b), []).append(pi)
    memb_ref = ray.put(memb)
    ids_ref = ray.put(pa.array(np.unique(pairs).astype(np.int64), pa.int64()))

    class EmitPairVecs:
        def __init__(self):
            self.memb = ray.get(memb_ref)
            self.ids = ray.get(ids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            sub = batch.filter(pc.is_in(batch.column("vec_id"), value_set=self.ids))
            out_pair, out_id, out_v = [], [], []
            if sub.num_rows:
                emb = np.array(sub.column("embedding").to_pylist(), dtype=np.float64)
                for j, vid in enumerate(sub.column("vec_id").to_numpy()):
                    blob = emb[j].tobytes()
                    for pi in self.memb.get(int(vid), ()):
                        out_pair.append(pi)
                        out_id.append(int(vid))
                        out_v.append(blob)
            return pa.table(
                {"pair": pa.array(out_pair, pa.int64()),
                 "vec_id": pa.array(out_id, pa.int64()),
                 "v": pa.array(out_v, pa.binary())}
            )

    def verify_group(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column("vec_id").to_pylist(), dtype=np.int64)
        if len(ids) < 2:
            return OUT.empty_table()
        order = np.argsort(ids, kind="stable")
        va = np.frombuffer(g.column("v")[int(order[0])].as_py(), dtype=np.float64)
        vb = np.frombuffer(g.column("v")[int(order[1])].as_py(), dtype=np.float64)
        sim = float(
            (va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
        )
        if sim < threshold:
            return OUT.empty_table()
        return pa.table(
            {"vec_a": pa.array([int(ids[order[0]])], pa.int64()),
             "vec_b": pa.array([int(ids[order[1]])], pa.int64()),
             "sim": pa.array([round(sim, 6)], pa.float64())},
            schema=OUT,
        )

    out = (
        ds.map_batches(EmitPairVecs, batch_format="pyarrow", concurrency=2)
        .groupby("pair", num_partitions=shuffle_partitions(len(pairs) * 8_192))
        .map_groups(verify_group, batch_format="pyarrow")
        .to_pandas()
    )
    if len(out) == 0:
        return OUT.empty_table()
    return (
        pa.Table.from_pandas(out, preserve_index=False)
        .cast(OUT)
        .sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])
    )


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


def kmeans_fit(
    ds,
    n_clusters: int,
    *,
    n_iters: int = 5,
    init: np.ndarray | None = None,
    seed: int = 5,
):
    """DISTRIBUTED Lloyd's k-means over an embedding Dataset — the
    iterative-algorithm shape on this engine: per iteration the centroid
    matrix is broadcast once (``ray.put``), every batch folds into a
    (k x dim sums, k counts, scalar inertia) partial, and the driver merges
    the tiny partials (k*dim floats per block — independent of corpus
    size). The input is re-read from storage each sweep (the 100-TB form:
    iterating a materialized copy would pin the corpus in the object
    store).

    Returns (centroids, counts, inertia_history); inertia (sum of squared
    distances on the normalized sphere) is non-increasing across
    iterations for fixed assignments semantics, which the tests pin.
    """
    import ray

    first = ds.take_batch(max(n_clusters * 8, 256), batch_format="pyarrow")
    sample = np.array(first.column("embedding").to_pylist(), dtype=np.float64)
    cents = (
        _normalize(np.asarray(init, dtype=np.float64))
        if init is not None
        else train_centroids(sample, n_clusters, iters=1, seed=seed)
    )
    history: list[float] = []
    counts = np.zeros(len(cents), dtype=np.int64)
    for _ in range(n_iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            emb = _normalize(
                np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            )
            sims = emb @ c.T
            a = np.argmax(sims, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, emb)
            cnt = np.bincount(a, minlength=len(c)).astype(np.int64)
            # ||x - c||^2 on the unit sphere = 2 - 2 cos
            inert = float(np.sum(2.0 - 2.0 * sims[np.arange(len(a)), a]))
            return pa.table(
                {
                    "sums": pa.array([sums.tobytes()], pa.binary()),
                    "counts": pa.array([cnt.tobytes()], pa.binary()),
                    "inertia": pa.array([inert], pa.float64()),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        inertia = 0.0
        for r in rows:
            sums += np.frombuffer(r["sums"], np.float64).reshape(cents.shape)
            counts += np.frombuffer(r["counts"], np.int64)
            inertia += r["inertia"]
        history.append(round(inertia, 9))
        nz = counts > 0
        new = cents.copy()
        new[nz] = sums[nz] / counts[nz, None]
        cents = _normalize(new)
    return cents, counts, history


def pca_fit(ds, *, column: str = "embedding"):
    """Distributed exact PCA moments: every batch folds to (n, Σx, XᵀX) —
    O(d²) float64 scalars per block, independent of corpus size — the
    driver merges partials, forms the population covariance
    XᵀX/n − μμᵀ, and eigendecomposes the d×d matrix locally (d is the
    embedding width, always driver-sized). Returns
    (eigenvalues DESC, components[d, d] row-per-component, total_variance).

    Zero-copy flatten: the list<float> column is reshaped, not iterated."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(column).combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(col[0]) if len(col) else 1
        m = flat.reshape(-1, dim)
        return pa.table(
            {
                "n": pa.array([m.shape[0]], pa.int64()),
                "dim": pa.array([dim], pa.int64()),
                "s": pa.array([m.sum(axis=0).tobytes()], pa.binary()),
                "xtx": pa.array([(m.T @ m).tobytes()], pa.binary()),
            }
        )

    n_total, s_total, xtx_total, dim = 0, None, None, None
    for part in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for i in range(part.num_rows):
            d = int(part.column("dim")[i].as_py())
            if dim is None:
                dim = d
                s_total = np.zeros(d, dtype=np.float64)
                xtx_total = np.zeros((d, d), dtype=np.float64)
            n_total += int(part.column("n")[i].as_py())
            s_total += np.frombuffer(part.column("s")[i].as_py(), dtype=np.float64)
            xtx_total += np.frombuffer(
                part.column("xtx")[i].as_py(), dtype=np.float64
            ).reshape(d, d)
    if not n_total:
        raise ValueError("pca_fit: empty dataset")
    mu = s_total / n_total
    cov = xtx_total / n_total - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0  # symmetrize float noise before eigh
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1]
    eigvals = np.maximum(eigvals[order], 0.0)
    components = eigvecs[:, order].T
    return eigvals, components, float(eigvals.sum())
