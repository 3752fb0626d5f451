"""Driver-side LSH candidate-pair guard (round-3 verdict item 8): the one
driver-held structure in the dedup/ANN verify path must fail LOUDLY on an
adversarial corpus instead of silently OOMing the driver."""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.functions.guards import (
    DEFAULT_MAX_CANDIDATE_PAIRS,
    guard_candidate_pairs,
    max_candidate_pairs,
)


def test_guard_passes_small_lists():
    pairs = np.array([[1, 2], [3, 4]], dtype=np.int64)
    out = guard_candidate_pairs(pairs, stage="test")
    assert out is pairs  # unchanged, wrap-the-assignment contract


def test_guard_env_override(monkeypatch):
    monkeypatch.setenv("CAS_RAY_MAX_CANDIDATE_PAIRS", "7")
    assert max_candidate_pairs() == 7
    monkeypatch.setenv("CAS_RAY_MAX_CANDIDATE_PAIRS", "not-an-int")
    assert max_candidate_pairs() == DEFAULT_MAX_CANDIDATE_PAIRS


def test_guard_raises_past_cap(monkeypatch):
    monkeypatch.setenv("CAS_RAY_MAX_CANDIDATE_PAIRS", "10")
    pairs = np.stack([np.arange(11), np.arange(11) + 100], axis=1)
    with pytest.raises(RuntimeError, match="candidate pairs exceed"):
        guard_candidate_pairs(pairs, stage="test")


def test_minhash_giant_bucket_hits_guard(ray_session, monkeypatch):
    # planted adversarial corpus: 25 IDENTICAL documents -> every LSH band
    # puts all of them in one bucket -> C(25,2)=300 candidate pairs; with
    # the cap forced to 50 the pipeline must die at the guard, not in the
    # driver-side membership-dict build.
    import ray

    from clip_as_service_ray.stages.dedup import minhash_lsh_pairs

    monkeypatch.setenv("CAS_RAY_MAX_CANDIDATE_PAIRS", "50")
    text = "the same adversarial document body repeated for every row here"
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(25, dtype=np.int64), pa.int64()),
            "text": pa.array([text] * 25),
        }
    )
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(RuntimeError, match="candidate pairs exceed"):
        minhash_lsh_pairs(ds, num_perm=32, bands=8)


def test_ann_giant_bucket_hits_guard(ray_session, monkeypatch):
    # same plant for the embedding-cosine LSH: identical vectors collide in
    # every hyperplane band.
    import ray

    from clip_as_service_ray.stages.ann import cosine_lsh_pairs

    monkeypatch.setenv("CAS_RAY_MAX_CANDIDATE_PAIRS", "20")
    vec = [0.25, -0.5, 0.75, 0.125]
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(12, dtype=np.int64), pa.int64()),
            "embedding": pa.array([vec] * 12, pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(RuntimeError, match="candidate pairs exceed"):
        cosine_lsh_pairs(ds, threshold=0.9)
