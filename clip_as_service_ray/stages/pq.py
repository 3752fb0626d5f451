"""Product-quantization ANN: the memory/disk-compressed IVF scale path.

The reference's vector backend (AnnLite) couples an IVF cell layout with
PQ compression (``/root/reference/docs/user-guides/retriever.md:156-168``
describes cells; AnnLite's PQ is the published Jégou et al. 2011 scheme).
This module is that second half, Ray-Data-first, layered on the
cell-partitioned IVF index of ``stages/ann.py``:

- ``pq_train``    — per-subspace Lloyd k-means over a bounded SAMPLE
  (sample-based training is the standard PQ contract — the corpus-sized
  work is encoding, not training). Deterministic: seeded init, stable
  tie-breaks, empty clusters reseeded to the farthest point.
- ``pq_encode``   — corpus pass: ``map_batches`` with broadcast codebooks,
  vectorized argmin per subspace, codes written CELL-PARTITIONED next to
  the IVF index (``pq_codes/cell=K/``), m bytes per vector — a dim·4/m
  compression of the scan payload (16x at dim=32, m=8).
- ``ivfpq_search``— per-query lookup table (m × ksub inner products), ADC
  scan over ONLY the probed cells' code files, then an optional exact
  refine that reads full vectors for just the top candidates (filtered
  read). nprobe = all cells + refine ≥ candidate count degenerates to the
  exact answer, which is how the SQL oracle checks the whole path.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from clip_as_service_ray.stages.ann import (
    _normalize,
    ivf_assign,
    load_centroids,
    probe_cells,
)


def pq_train(
    sample: np.ndarray,
    m: int,
    ksub: int = 256,
    n_iters: int = 20,
    seed: int = 0,
) -> np.ndarray:
    """(n, dim) training sample -> (m, ksub, dim//m) codebooks.

    Vectors are L2-normalized first (the engine's similarity is cosine);
    ksub is capped at the sample size."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ksub = min(ksub, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cents = xs[rng.choice(n, size=ksub, replace=False)].copy()
        for _ in range(n_iters):
            # ||x-c||^2 argmin == argmax(x@c.T - ||c||^2/2)
            score = xs @ cents.T - 0.5 * np.sum(cents * cents, axis=1)[None, :]
            assign = np.argmax(score, axis=1)
            sums = np.zeros_like(cents)
            np.add.at(sums, assign, xs)
            counts = np.bincount(assign, minlength=ksub).astype(np.float64)
            empty = counts == 0
            nz = ~empty
            cents[nz] = sums[nz] / counts[nz, None]
            if np.any(empty):
                # reseed each empty cluster to the point farthest from its
                # assigned centroid (deterministic order)
                d = np.sum((xs - cents[assign]) ** 2, axis=1)
                far = np.argsort(-d, kind="stable")
                for e, p in zip(np.nonzero(empty)[0], far):
                    cents[e] = xs[p]
        books[j] = cents
    return books


def pq_encode_array(emb: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m) uint8/uint16 codes (normalized internally)."""
    x = _normalize(np.asarray(emb, dtype=np.float64))
    m, ksub, dsub = books.shape
    dtype = np.uint8 if ksub <= 256 else np.uint16
    codes = np.empty((x.shape[0], m), dtype=dtype)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        score = xs @ books[j].T - 0.5 * np.sum(books[j] * books[j], axis=1)[None, :]
        codes[:, j] = np.argmax(score, axis=1)
    return codes


def pq_reconstruct(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) codes -> (n, dim) approximate (normalized) vectors."""
    m = books.shape[0]
    return np.concatenate([books[j][codes[:, j]] for j in range(m)], axis=1)


def adc_lut(query: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(m, ksub) per-subspace inner products of the normalized query."""
    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    m, ksub, dsub = books.shape
    return np.stack([books[j] @ q[j * dsub : (j + 1) * dsub] for j in range(m)])


def adc_scores(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """(n, m) codes + (m, ksub) LUT -> (n,) approximate cosine sims."""
    m = lut.shape[0]
    return lut[np.arange(m)[None, :], codes.astype(np.int64)].sum(axis=1)


def _codes_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "pq_codes")


def ivfpq_build(
    ds,
    index_dir: str,
    *,
    m: int = 8,
    ksub: int = 256,
    n_train: int = 4096,
    overwrite: bool = False,
    seed: int = 0,
) -> str:
    """Add PQ codes to an existing IVF index (``stages/ann.ivf_build``).

    One extra streaming pass over ``ds``: assign cell + encode codes in the
    same ``map_batches``, written cell-partitioned so a probe reads only
    its cells' code files. Training reads only the first ``n_train`` rows
    (deterministic block order)."""
    import ray
    import pyarrow.parquet as pq_

    if ksub > 256:
        raise ValueError("on-disk codes are 1 byte/subspace: ksub must be <= 256")
    done = os.path.join(index_dir, "_pq.json")
    if os.path.exists(done) and not overwrite:
        return index_dir
    cents = load_centroids(index_dir)

    sample_tbl = ds.limit(n_train).to_pandas()
    sample = np.array(sample_tbl["embedding"].tolist(), dtype=np.float64)
    books = pq_train(sample, m=m, ksub=ksub, seed=seed)
    books_ref = ray.put(books)

    def encode(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bks = _ray.get(books_ref)
        emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        codes = pq_encode_array(emb, bks)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cell": batch.column("cell"),
                "code": pa.array([c.tobytes() for c in codes], pa.binary()),
            }
        )

    ivf_assign(ds, cents).map_batches(encode, batch_format="pyarrow").write_parquet(
        _codes_dir(index_dir), partition_cols=["cell"]
    )
    mm, kk, dsub = books.shape
    pq_.write_table(
        pa.table(
            {
                "subspace": pa.array(
                    np.repeat(np.arange(mm), kk), pa.int32()
                ),
                "k": pa.array(np.tile(np.arange(kk), mm), pa.int32()),
                "centroid": pa.array(
                    [books[j][k_].tolist() for j in range(mm) for k_ in range(kk)],
                    pa.list_(pa.float64()),
                ),
            }
        ),
        os.path.join(index_dir, "_pq_codebooks.parquet"),
    )
    with open(done, "w") as f:
        json.dump({"m": int(mm), "ksub": int(kk), "dsub": int(dsub)}, f)
    return index_dir


def load_codebooks(index_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq_

    with open(os.path.join(index_dir, "_pq.json")) as f:
        meta = json.load(f)
    t = pq_.read_table(os.path.join(index_dir, "_pq_codebooks.parquet"))
    books = np.array(t.column("centroid").to_pylist(), dtype=np.float64)
    return books.reshape(meta["m"], meta["ksub"], meta["dsub"])


def ivfpq_search(
    index_dir: str,
    query: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    refine: int = 0,
    return_stats: bool = False,
):
    """ADC scan of the probed cells' CODE files; optional exact refine.

    ``refine > 0``: the top max(k, refine) ADC candidates are re-scored
    exactly by reading ONLY their rows from the probed cells' full-vector
    files (predicate-pushdown read). Returns (vec_id, sim) — approximate
    sims when refine == 0, exact when refine > 0."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_

    cents = load_centroids(index_dir)
    books = load_codebooks(index_dir)
    cells = probe_cells(cents, query, nprobe)
    lut = adc_lut(query, books)
    m = books.shape[0]

    stats = {"cells_probed": 0, "code_bytes_read": 0, "refine_rows_read": 0}
    cand_ids, cand_sims = [], []
    for c in cells:
        p = os.path.join(_codes_dir(index_dir), f"cell={c}")
        if not os.path.isdir(p):
            continue
        stats["cells_probed"] += 1
        for f in sorted(os.listdir(p)):
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(p, f)
            stats["code_bytes_read"] += os.path.getsize(fp)
            t = pq_.read_table(fp, columns=["vec_id", "code"])
            if t.num_rows == 0:
                continue
            codes = np.frombuffer(
                b"".join(t.column("code").to_pylist()), dtype=np.uint8
            ).reshape(-1, m)
            cand_ids.append(t.column("vec_id").to_numpy().astype(np.int64))
            cand_sims.append(adc_scores(codes, lut))
    empty = pa.table(
        {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
    )
    if not cand_ids:
        return (empty, stats) if return_stats else empty
    ids = np.concatenate(cand_ids)
    sims = np.concatenate(cand_sims)

    if refine:
        n_keep = min(max(k, refine), len(ids))
        keep = np.lexsort((ids, -sims))[:n_keep]
        keep_ids = np.sort(ids[keep])
        q = np.asarray(query, dtype=np.float64)
        q = q / np.linalg.norm(q)
        ex_ids, ex_sims = [], []
        for c in cells:
            p = os.path.join(index_dir, f"cell={c}")
            if not os.path.isdir(p):
                continue
            t = pq_.read_table(
                p,
                columns=["vec_id", "embedding"],
                filters=pc.field("vec_id").isin(pa.array(keep_ids, pa.int64())),
            )
            if t.num_rows == 0:
                continue
            stats["refine_rows_read"] += t.num_rows
            emb = _normalize(np.array(t.column("embedding").to_pylist(), np.float64))
            ex_ids.append(t.column("vec_id").to_numpy().astype(np.int64))
            ex_sims.append(emb @ q)
        ids = np.concatenate(ex_ids) if ex_ids else np.array([], np.int64)
        sims = np.concatenate(ex_sims) if ex_sims else np.array([], np.float64)

    top = np.lexsort((ids, -sims))[: min(k, len(ids))]
    out = pa.table(
        {"vec_id": pa.array(ids[top], pa.int64()),
         "sim": pa.array(sims[top], pa.float64())}
    )
    return (out, stats) if return_stats else out
