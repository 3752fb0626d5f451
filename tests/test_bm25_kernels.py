"""BM25 kernel properties: idf monotonicity, tf_norm bounds, and equivalence
of the partitioned top-k fast path with the full-lexsort slow path."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from clip_as_service_ray.functions import bm25


def test_idf_monotone_decreasing_in_df():
    n = 1000
    dfs = np.arange(1, n + 1)
    vals = bm25.idf(dfs, n)
    assert np.all(np.diff(vals) < 0)
    assert np.all(vals > 0)


def test_tf_norm_bounds_and_monotonicity():
    tf = np.arange(1, 100)
    dl = np.full(99, 20.0)
    v = bm25.tf_norm(tf, dl, avgdl=20.0)
    assert np.all(np.diff(v) > 0)  # increasing in tf
    assert np.all(v < bm25.K1 + 1)  # asymptote k1+1
    # longer docs score lower at equal tf
    v_long = bm25.tf_norm(tf, np.full(99, 200.0), avgdl=20.0)
    assert np.all(v_long < v)


def _slow_topk(scores, doc_ids, k):
    order = np.lexsort((doc_ids, -scores))
    return order[: min(k, len(scores))]


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=5000),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=1, max_value=8),
)
def test_topk_fast_path_equals_slow(n, k, seed, tie_levels):
    rng = np.random.default_rng(seed)
    # heavy ties: few distinct score levels
    scores = rng.integers(0, tie_levels, n).astype(np.float64)
    doc_ids = rng.permutation(n).astype(np.int64)
    fast = bm25.topk_indices(scores, doc_ids, k)
    slow = _slow_topk(scores, doc_ids, k)
    assert doc_ids[fast].tolist() == doc_ids[slow].tolist()
    assert scores[fast].tolist() == scores[slow].tolist()
