"""Product quantization: training, codes, ADC recall, refine exactness."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clip_as_service_ray.stages.ann import _normalize, ivf_build, train_centroids
from clip_as_service_ray.stages.pq import (
    adc_lut,
    adc_scores,
    ivfpq_build,
    ivfpq_search,
    pq_encode_array,
    pq_reconstruct,
    pq_train,
)

SF = "/root/testdata/sf0.001"


def _clustered(n=400, dim=32, k=8, seed=3):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(k, dim))
    x = cents[rng.integers(0, k, n)] + 0.15 * rng.normal(size=(n, dim))
    return x


def test_train_deterministic_and_shapes():
    x = _clustered()
    b1 = pq_train(x, m=4, ksub=16, seed=1)
    b2 = pq_train(x, m=4, ksub=16, seed=1)
    assert b1.shape == (4, 16, 8)
    np.testing.assert_array_equal(b1, b2)


def test_reconstruction_beats_single_centroid():
    x = _clustered()
    books = pq_train(x, m=4, ksub=32)
    codes = pq_encode_array(x, books)
    recon = pq_reconstruct(codes, books)
    xn = _normalize(x)
    pq_err = np.mean(np.sum((recon - xn) ** 2, axis=1))
    base_err = np.mean(np.sum((xn - xn.mean(0)) ** 2, axis=1))
    assert pq_err < 0.25 * base_err


def test_adc_matches_reconstructed_dot():
    x = _clustered(n=100)
    books = pq_train(x, m=4, ksub=16)
    codes = pq_encode_array(x, books)
    q = x[0]
    lut = adc_lut(q, books)
    got = adc_scores(codes, lut)
    want = pq_reconstruct(codes, books) @ (q / np.linalg.norm(q))
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.fixture()
def ivfpq_index(ray_session, tmp_path):
    import ray.data

    tbl = pq.read_table(
        os.path.join(SF, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    sample = np.array(tbl.column("embedding").to_pylist()[:256], dtype=np.float64)
    cents = train_centroids(sample, 8)
    d = str(tmp_path / "ivfpq")
    ds = ray.data.read_parquet(
        os.path.join(SF, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ivf_build(ds, cents, d)
    ivfpq_build(ds, d, m=8, ksub=64, n_train=512)
    return d, tbl


def _exact_topk(tbl, q, k=10):
    emb = _normalize(np.array(tbl.column("embedding").to_pylist(), np.float64))
    qn = np.asarray(q, np.float64)
    qn = qn / np.linalg.norm(qn)
    sims = emb @ qn
    ids = tbl.column("vec_id").to_numpy().astype(np.int64)
    top = np.lexsort((ids, -sims))[:k]
    return ids[top], sims[top]


def test_full_probe_refine_is_exact(ivfpq_index):
    d, tbl = ivfpq_index
    q = np.array(tbl.column("embedding")[0].as_py(), np.float64)
    out = ivfpq_search(d, q, k=10, nprobe=8, refine=tbl.num_rows)
    want_ids, want_sims = _exact_topk(tbl, q, 10)
    assert out.column("vec_id").to_pylist() == want_ids.tolist()
    np.testing.assert_allclose(out.column("sim").to_numpy(), want_sims, atol=1e-12)


def test_adc_only_recall_reasonable(ivfpq_index):
    d, tbl = ivfpq_index
    q = np.array(tbl.column("embedding")[5].as_py(), np.float64)
    out = ivfpq_search(d, q, k=10, nprobe=8, refine=0)
    want_ids, _ = _exact_topk(tbl, q, 10)
    overlap = len(set(out.column("vec_id").to_pylist()) & set(want_ids.tolist()))
    assert overlap >= 4  # compressed-domain scan, no refine


def test_refine_small_candidate_recall(ivfpq_index):
    d, tbl = ivfpq_index
    q = np.array(tbl.column("embedding")[5].as_py(), np.float64)
    out = ivfpq_search(d, q, k=10, nprobe=8, refine=50)
    want_ids, _ = _exact_topk(tbl, q, 10)
    overlap = len(set(out.column("vec_id").to_pylist()) & set(want_ids.tolist()))
    assert overlap >= 8  # exact re-rank of top-50 ADC candidates


def test_code_bytes_much_smaller_than_vectors(ivfpq_index):
    d, tbl = ivfpq_index
    q = np.array(tbl.column("embedding")[1].as_py(), np.float64)
    _, stats = ivfpq_search(d, q, k=10, nprobe=8, refine=0, return_stats=True)
    emb_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _dirs, files in os.walk(d)
        for f in files
        if f.endswith(".parquet") and "cell=" in r and "pq_codes" not in r
    )
    assert stats["code_bytes_read"] < emb_bytes  # compressed scan payload
    assert stats["cells_probed"] == 8


def test_probe_cost_scales_with_nprobe(ivfpq_index):
    d, tbl = ivfpq_index
    q = np.array(tbl.column("embedding")[2].as_py(), np.float64)
    _, s1 = ivfpq_search(d, q, k=5, nprobe=1, refine=0, return_stats=True)
    _, s8 = ivfpq_search(d, q, k=5, nprobe=8, refine=0, return_stats=True)
    assert s1["cells_probed"] < s8["cells_probed"]
    assert s1["code_bytes_read"] < s8["code_bytes_read"]


def test_operator_matches_duckdb(ray_session):
    import duckdb

    from clip_as_service_ray.pipelines.operators import ann_ivfpq_topk

    got = ann_ivfpq_topk(SF)
    con = duckdb.connect()
    want = con.execute(
        "WITH q AS (SELECT embedding FROM read_parquet(?) WHERE vec_id = 0) "
        "SELECT e.vec_id, "
        "round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS sim "
        "FROM read_parquet(?) e, q "
        "ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, e.vec_id ASC "
        "LIMIT 10",
        [os.path.join(SF, "embeddings.parquet")] * 2,
    ).df()
    assert got.column("vec_id").to_pylist() == want["vec_id"].tolist()
    np.testing.assert_allclose(got.column("sim").to_numpy(), want["sim"], atol=1e-9)
