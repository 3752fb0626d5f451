"""HNSW graph ANN: determinism, recall, and shard-merge contracts."""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.stages.hnsw import (
    HNSWGraph,
    assign_levels,
    hnsw_topk_table,
)


def _unit_rows(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(800, 32))
    ids = np.arange(800, dtype=np.int64) * 3 + 1  # non-contiguous ids
    return ids, vecs


def test_levels_deterministic_and_geometric(cloud):
    ids, _ = cloud
    lv = assign_levels(ids, 8)
    assert np.array_equal(lv, assign_levels(ids, 8))  # pure function of id
    assert lv.min() == 0
    # ~1/M of points above level 0 (geometric decay)
    frac = (lv > 0).mean()
    assert 0.03 < frac < 0.35


def test_graph_recall_vs_bruteforce(cloud):
    ids, vecs = cloud
    g = HNSWGraph(m=8, ef_construction=64).build(ids, vecs)
    u = _unit_rows(vecs)
    rng = np.random.default_rng(7)
    recalls = []
    for _ in range(20):
        q = rng.normal(size=32)
        qn = q / np.linalg.norm(q)
        exact = ids[np.argsort(-(u @ qn), kind="stable")[:10]]
        got, sims = g.search(q, 10, ef=64)
        assert np.all(np.diff(sims) <= 1e-12)  # sim DESC
        recalls.append(len(set(got) & set(exact)) / 10)
    assert np.mean(recalls) >= 0.95


def test_graph_build_deterministic(cloud):
    ids, vecs = cloud
    g1 = HNSWGraph(m=8, ef_construction=32).build(ids, vecs)
    g2 = HNSWGraph(m=8, ef_construction=32).build(ids, vecs)
    q = np.ones(32)
    a_ids, a_s = g1.search(q, 10, ef=48)
    b_ids, b_s = g2.search(q, 10, ef=48)
    assert np.array_equal(a_ids, b_ids)
    assert np.array_equal(a_s, b_s)


def test_exhaustive_ef_is_exact(cloud):
    """ef >= n makes the level-0 beam exhaustive over the connected graph:
    the result must equal brute force exactly (the property the oracle
    entry's SQL twin relies on)."""
    ids, vecs = cloud
    sub_ids, sub = ids[:200], vecs[:200]
    g = HNSWGraph(m=8, ef_construction=64).build(sub_ids, sub)
    u = _unit_rows(sub)
    q = np.full(32, 0.3)
    qn = q / np.linalg.norm(q)
    sims = u @ qn
    exact = sub_ids[np.lexsort((sub_ids, -sims))[:10]]
    got, _ = g.search(q, 10, ef=200)
    assert np.array_equal(got, exact)


def test_sharded_topk_table(ray_session, cloud):
    import ray.data

    ids, vecs = cloud
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs]),
            }
        )
    )
    qs = np.stack([np.ones(32), -np.ones(32)])
    out = hnsw_topk_table(ds, qs, k=5, n_shards=3, ef=800)
    df = out.to_pandas()
    assert sorted(df["query_id"].unique()) == [0, 1]
    u = _unit_rows(vecs)
    for qi in (0, 1):
        qn = qs[qi] / np.linalg.norm(qs[qi])
        sims = u @ qn
        exact = ids[np.lexsort((ids, -sims))[:5]]
        got = df[df["query_id"] == qi]["vec_id"].to_numpy()
        # exhaustive ef within every shard -> exact merge
        assert np.array_equal(got, exact)


def test_empty_and_tiny_graphs():
    g = HNSWGraph().build(np.array([], np.int64), np.empty((0, 8)))
    got, sims = g.search(np.ones(8), 5)
    assert len(got) == 0 and len(sims) == 0
    g1 = HNSWGraph().build(np.array([7], np.int64), np.ones((1, 8)))
    got, sims = g1.search(np.ones(8), 5)
    assert got.tolist() == [7]
    assert sims[0] == pytest.approx(1.0)
