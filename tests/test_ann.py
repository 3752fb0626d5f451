"""ANN: IVF exactness at full probe, recall at partial probe, determinism."""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.stages.ann import (
    _normalize,
    ivf_assign,
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


def test_full_probe_is_exact(vectors):
    ds, m = vectors
    cents = train_centroids(m[:500], 16)
    assigned = ds.map_batches(lambda t: t, batch_format="pyarrow")  # passthrough
    assigned = ivf_assign(ds, cents).materialize()
    q = m[7]
    got = ivf_search(assigned, cents, q, k=10, nprobe=16)
    # float32 storage round-trips through the same cast in both paths
    m32 = np.array([r for r in assigned.to_pandas().sort_values("vec_id")["embedding"]],
                   dtype=np.float64)
    want = _brute(m32, q.astype(np.float64), 10)
    assert got.column("vec_id").to_pylist() == want.tolist()


def test_partial_probe_recall(vectors):
    ds, m = vectors
    cents = train_centroids(m[:500], 16)
    assigned = ivf_assign(ds, cents).materialize()
    hits = 0
    for qi in (1, 42, 77, 123, 999):
        q = m[qi]
        approx = set(ivf_search(assigned, cents, q, k=10, nprobe=6).column("vec_id").to_pylist())
        exact = set(_brute(m, q, 10).tolist())
        hits += len(approx & exact)
    recall = hits / 50
    assert recall >= 0.5  # random gaussian data, 6/16 cells probed
