"""ANN: IVF exactness at full probe, recall at partial probe, determinism."""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.stages.ann import (
    _normalize,
    ivf_build,
    ivf_search,
    train_centroids,
)


@pytest.fixture(scope="module")
def vectors(ray_session):
    import ray.data

    rng = np.random.default_rng(21)
    n, d = 2000, 32
    m = rng.normal(size=(n, d))
    tbl = pa.table(
        {"vec_id": pa.array(range(n), pa.int64()),
         "embedding": pa.array([row.tolist() for row in m], pa.list_(pa.float32()))}
    )
    return ray.data.from_arrow(tbl), m.astype(np.float64)


def _brute(m, q, k=10):
    mn = _normalize(m)
    q = q / np.linalg.norm(q)
    sims = mn @ q
    ids = np.arange(len(m))
    top = np.lexsort((ids, -sims))[:k]
    return ids[top]


def test_centroids_deterministic(vectors):
    _, m = vectors
    c1 = train_centroids(m[:500], 16)
    c2 = train_centroids(m[:500], 16)
    np.testing.assert_array_equal(c1, c2)
    assert c1.shape == (16, 32)


@pytest.fixture(scope="module")
def ivf_index(vectors, tmp_path_factory):
    ds, m = vectors
    cents = train_centroids(m[:500], 16)
    index_dir = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf_build(ds, cents, index_dir, overwrite=True)
    return index_dir, m


def test_full_probe_is_exact(ivf_index):
    index_dir, m = ivf_index
    q = m[7]
    got = ivf_search(index_dir, q, k=10, nprobe=16)
    # float32 storage round-trips through the same cast in both paths
    import pyarrow.parquet as pq
    import pandas as pd
    import glob, os
    parts = pd.concat(
        [pq.read_table(p).to_pandas() for p in glob.glob(os.path.join(index_dir, "cell=*/*.parquet"))]
    ).sort_values("vec_id")
    m32 = np.array([r for r in parts["embedding"]], dtype=np.float64)
    want = _brute(m32, q.astype(np.float64), 10)
    assert got.column("vec_id").to_pylist() == want.tolist()


def test_partial_probe_recall(ivf_index):
    index_dir, m = ivf_index
    hits = 0
    for qi in (1, 42, 77, 123, 999):
        q = m[qi]
        approx = set(ivf_search(index_dir, q, k=10, nprobe=6).column("vec_id").to_pylist())
        exact = set(_brute(m, q, 10).tolist())
        hits += len(approx & exact)
    recall = hits / 50
    assert recall >= 0.5  # random gaussian data, 6/16 cells probed


def test_probe_cost_scales_with_nprobe(ivf_index):
    """The pruned-read contract: bytes/rows read grow with nprobe and a
    partial probe reads strictly less than the corpus (the AnnLite cell
    model, retriever.md:156-168)."""
    index_dir, m = ivf_index
    q = m[3]
    _, s2 = ivf_search(index_dir, q, k=10, nprobe=2, return_stats=True)
    _, s6 = ivf_search(index_dir, q, k=10, nprobe=6, return_stats=True)
    _, s16 = ivf_search(index_dir, q, k=10, nprobe=16, return_stats=True)
    assert s2["cells_probed"] == 2 and s6["cells_probed"] == 6
    assert s2["rows_read"] < s6["rows_read"] < s16["rows_read"]
    assert s2["bytes_read"] < s6["bytes_read"] < s16["bytes_read"]
    assert s16["rows_read"] == 2000  # full probe == whole corpus
    assert s6["rows_read"] < 2000


def test_cosine_lsh_pairs_match_exact(ray_session):
    """Hyperplane-LSH near-dup pairs == exact all-pairs cosine at the
    threshold (recall 1.0, seeded/deterministic) on a corpus with PLANTED
    near-duplicates — the actual dedup regime (high threshold, high bits:
    few candidates; the sf0.01 oracle covers the low-threshold regime)."""
    import pyarrow as pa
    import ray.data

    from clip_as_service_ray.stages.ann import cosine_lsh_pairs

    rng = np.random.default_rng(17)
    base = rng.normal(size=(400, 32))
    # 30 near-dups: small perturbations of existing rows (cos ~0.95+)
    dup_src = rng.choice(400, 30, replace=False)
    dups = base[dup_src] + 0.12 * rng.normal(size=(30, 32))
    m = np.vstack([base, dups])
    tbl = pa.table(
        {"vec_id": pa.array(range(len(m)), pa.int64()),
         "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32()))}
    )
    got = cosine_lsh_pairs(
        ray.data.from_arrow(tbl), threshold=0.85, bits_per_band=8, n_bands=48
    ).to_pandas()
    m32 = m.astype(np.float32).astype(np.float64)
    sims = (m32 @ m32.T) / (
        np.linalg.norm(m32, axis=1)[:, None] * np.linalg.norm(m32, axis=1)[None, :]
    )
    ia, ib = np.triu_indices(len(m32), k=1)
    keep = sims[ia, ib] >= 0.85
    want = sorted(zip(ia[keep].tolist(), ib[keep].tolist()))
    assert len(want) >= 25  # the planted dups are actually above threshold
    assert sorted(zip(got.vec_a, got.vec_b)) == want


def test_kmeans_fit_converges_and_deterministic(ray_session):
    import ray.data

    from clip_as_service_ray.stages.ann import kmeans_fit

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    c1, n1, h1 = kmeans_fit(ds, 6, n_iters=4)
    # spherical k-means objective is monotone: inertia never increases
    assert all(a >= b - 1e-9 for a, b in zip(h1, h1[1:])), h1
    assert n1.sum() == ds.count()
    # deterministic across runs (seeded init, order-independent partials
    # modulo float summation — compare to tolerance)
    c2, n2, h2 = kmeans_fit(ds, 6, n_iters=4)
    np.testing.assert_allclose(c1, c2, atol=1e-9)
    assert (n1 == n2).all()


def test_pca_fit_matches_direct_numpy(ray_session):
    """Distributed (n, Σx, XᵀX) partials reproduce the full-matrix PCA:
    eigenvalues match a direct np.linalg.eigh on the exactly-computed
    covariance, and components reconstruct the covariance."""
    import ray.data

    from clip_as_service_ray.stages.ann import pca_fit

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["embedding"],
        override_num_blocks=8,
    )
    eigvals, components, total = pca_fit(ds, column="embedding")

    import pyarrow.parquet as pq

    m = np.array(
        pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        .column("embedding")
        .to_pylist(),
        dtype=np.float64,
    )
    mu = m.mean(axis=0)
    cov = (m - mu).T @ (m - mu) / len(m)
    exp = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(eigvals, np.maximum(exp, 0), atol=1e-9)
    assert abs(total - exp.sum()) < 1e-9
    # components are orthonormal and diagonalize the covariance
    np.testing.assert_allclose(components @ components.T, np.eye(len(mu)), atol=1e-9)
    diag = components @ cov @ components.T
    np.testing.assert_allclose(np.diag(diag), eigvals, atol=1e-9)


def test_sq8_refine_equals_exact(ray_session):
    """SQ8 coarse scan + exact refine returns EXACTLY the brute-force
    top-k (the pool >> k recall contract the oracle twin relies on)."""
    from clip_as_service_ray.pipelines.operators import ann_topk, ann_topk_sq8

    sf = "/root/testdata/sf0.001"
    exact = ann_topk(sf, k=10)
    sq8 = ann_topk_sq8(sf, k=10)
    assert sq8.column("vec_id").to_pylist() == exact.column("vec_id").to_pylist()
    import numpy as np
    np.testing.assert_array_equal(
        sq8.column("sim").to_numpy(), exact.column("sim").to_numpy()
    )


def test_pagerank_matches_local_power_iteration(ray_session):
    """Distributed PageRank == a single-machine numpy power iteration over
    the same distinct co-purchase edge set (5 iters, d=0.85)."""
    import os

    import duckdb
    import numpy as np

    from clip_as_service_ray.pipelines.operators import pagerank_parts

    sf = "/root/testdata/sf0.001"
    got = pagerank_parts(sf)
    con = duckdb.connect()
    edges = con.execute(
        "WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"read_parquet('{os.path.join(sf, 'lineitem.parquet')}')) "
        "SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst FROM dp a "
        "JOIN dp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"
    ).df()
    src = edges["src"].to_numpy(dtype=np.int64)
    dst = edges["dst"].to_numpy(dtype=np.int64)
    nodes = np.unique(src)
    n = float(len(nodes))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    deg = np.bincount(si).astype(np.float64)
    rank = np.full(len(nodes), 1.0 / n)
    for _ in range(5):
        rank = (1.0 - 0.85) / n + 0.85 * np.bincount(
            di, weights=rank[si] / deg[si], minlength=len(nodes)
        )
    # probability mass is conserved (no dangling nodes in this graph)
    assert abs(rank.sum() - 1.0) < 1e-9
    rank = np.round(rank, 6)
    top = np.lexsort((nodes, -rank))[:20]
    assert got.column("p_partkey").to_pylist() == nodes[top].tolist()
    np.testing.assert_allclose(
        got.column("pr").to_numpy(), rank[top], rtol=0, atol=1e-9
    )


def test_bq_refine_equals_exact(ray_session):
    """1-bit Hamming coarse scan + exact refine returns EXACTLY the
    brute-force top-k (pool >> k keeps the true top-k inside the 1-bit
    pool — the contract the oracle twin relies on)."""
    from clip_as_service_ray.pipelines.operators import ann_topk, ann_topk_bq

    sf = "/root/testdata/sf0.001"
    exact = ann_topk(sf, k=10)
    bq = ann_topk_bq(sf, k=10)
    assert bq.column("vec_id").to_pylist() == exact.column("vec_id").to_pylist()
    import numpy as np
    np.testing.assert_array_equal(
        bq.column("sim").to_numpy(), exact.column("sim").to_numpy()
    )
