"""HyperLogLog sketch + the round-2 count/percentile/top-k operators.

Operator-level value equality vs DuckDB is covered by the driver oracle
(scripts/check_oracle.py); these tests pin the kernel math and the
distributed shapes at sf0.001 inside the shared Ray session.
"""

import duckdb
import numpy as np
import pytest

from clip_as_service_ray.functions.sketches import (
    hll_estimate,
    hll_merge,
    hll_partial,
)

SF = "/root/testdata/sf0.001"


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 62, 200_000, dtype=np.int64)
    exact = len(np.unique(vals))
    # split into 8 partials, merge — must equal the single-pass sketch
    parts = [hll_partial(c) for c in np.array_split(vals, 8)]
    merged = hll_merge(parts)
    assert np.array_equal(merged, hll_partial(vals))
    est = hll_estimate(merged)
    assert abs(est - exact) / exact < 0.02  # p=14 => ~0.81% std error


def test_hll_small_range_linear_counting():
    vals = np.arange(50, dtype=np.int64)
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 50) <= 2


def test_hll_empty_and_duplicates():
    assert hll_estimate(hll_partial(np.array([], dtype=np.int64))) == 0.0
    dup = np.full(10_000, 42, dtype=np.int64)
    assert abs(hll_estimate(hll_partial(dup)) - 1) < 0.5


def test_hll_bad_p():
    with pytest.raises(ValueError):
        hll_partial(np.array([1], dtype=np.int64), p=4)


def test_approx_distinct_users_vs_exact(ray_session):
    from clip_as_service_ray.pipelines import operators as ops

    approx = ops.approx_distinct_users(SF).column("n_users_approx")[0].as_py()
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert abs(approx - exact) / max(exact, 1) < 0.03


def test_top_events_per_type_matches_window_sql(ray_session):
    from clip_as_service_ray.pipelines import operators as ops

    got = (
        ops.top_events_per_type(SF, k=3)
        .to_pandas()
        .sort_values(["event_type", "rank"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT event_type, event_id, round(value, 6)::DOUBLE AS value, rank "
        "FROM (SELECT event_type, event_id, value, row_number() OVER ("
        "PARTITION BY event_type ORDER BY value DESC, event_id ASC)::BIGINT "
        f"AS rank FROM '{SF}/events.parquet') WHERE rank <= 3 "
        "ORDER BY event_type, rank"
    ).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()
    assert np.allclose(got["value"], want["value"])


def test_token_counts_vectorized_kernel(ray_session):
    from clip_as_service_ray.pipelines import operators as ops

    t = ops.token_counts(SF).to_pandas().set_index("doc_id")
    d = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' LIMIT 5"
    ).df()
    from clip_as_service_ray.functions.tokenizer import tokenize_texts

    for _, row in d.iterrows():
        assert t.loc[row.doc_id, "ws_tokens"] == len(row.text.split())
        assert t.loc[row.doc_id, "n_chars"] == len(row.text)
        # BPE-ish regex count == reference tokenizer term count (the RE2
        # pattern is the same alternation as functions.tokenizer.TOKEN_PATTERN)
        assert t.loc[row.doc_id, "bpe_tokens"] == len(tokenize_texts([row.text])[0])


def test_quantile_sketch_accuracy_and_merge():
    from clip_as_service_ray.functions.sketches import (
        quantile_sketch_merge,
        quantile_sketch_partial,
        quantile_sketch_query,
    )

    rng = np.random.default_rng(23)
    vals = rng.lognormal(3.0, 1.2, 300_000)
    qs = [0.5, 0.9, 0.99]
    # many partials merged (simulates per-batch fold + shuffle)
    parts = [quantile_sketch_partial(c) for c in np.array_split(vals, 64)]
    est = quantile_sketch_query(quantile_sketch_merge(parts), qs)
    sorted_vals = np.sort(vals)
    for e, q in zip(est, qs):
        # rank error: position of the estimate within the sorted data
        rank = np.searchsorted(sorted_vals, e) / len(vals)
        assert abs(rank - q) < 0.02, (q, rank)


def test_quantile_sketch_small_is_exactish():
    from clip_as_service_ray.functions.sketches import (
        quantile_sketch_partial,
        quantile_sketch_query,
    )

    vals = np.arange(100, dtype=np.float64)
    est = quantile_sketch_query(quantile_sketch_partial(vals), [0.0, 0.5, 1.0])
    assert est[0] == 0.0 and est[2] == 99.0 and abs(est[1] - 49.5) <= 1.0


def test_quantile_sketch_rows_round_trip():
    from clip_as_service_ray.functions.sketches import (
        quantile_sketch_from_rows,
        quantile_sketch_partial,
        quantile_sketch_to_rows,
    )

    vals = np.random.default_rng(1).normal(size=10_000)
    sk = quantile_sketch_partial(vals)
    rt = quantile_sketch_from_rows(quantile_sketch_to_rows(sk))
    assert all(np.array_equal(a, b) for a, b in zip(sk, rt) if len(a) or len(b))


def test_event_value_percentiles_sketch_close_to_exact(ray_session):
    from clip_as_service_ray.pipelines import operators as ops

    approx = (
        ops.event_value_percentiles_sketch(SF)
        .to_pandas().set_index("event_type").sort_index()
    )
    assert list(approx.columns) == ["p50", "p90", "p99"]
    # quantile sketches guarantee RANK error, not value error (a heavy tail
    # makes tail value-error unbounded): check each estimate's rank within
    # the group's sorted values against the target quantile
    raw = duckdb.sql(
        f"SELECT event_type, value FROM '{SF}/events.parquet'"
    ).df()
    for et, grp in raw.groupby("event_type"):
        vals = np.sort(grp["value"].to_numpy())
        for c, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            rank = np.searchsorted(vals, approx.loc[et, c]) / len(vals)
            assert abs(rank - q) < 0.02, (et, c, rank)


from hypothesis import given, settings
from hypothesis import strategies as hst


@settings(max_examples=25, deadline=None)
@given(
    hst.integers(min_value=0, max_value=2**32),
    hst.integers(min_value=2, max_value=9),
)
def test_hll_split_invariance(seed, n_parts):
    """HLL partials are split-invariant: any partition of the input merges
    to the SAME registers as one-shot folding (commutative idempotent max)."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << 60, 5_000, dtype=np.int64)
    whole = hll_partial(vals)
    cut = np.sort(rng.integers(0, len(vals), n_parts - 1))
    parts = [hll_partial(c) for c in np.split(vals, cut)]
    assert np.array_equal(hll_merge(parts), whole)


@settings(max_examples=15, deadline=None)
@given(hst.integers(min_value=0, max_value=2**32), hst.integers(min_value=1, max_value=32))
def test_quantile_sketch_rank_error_any_merge_tree(seed, n_parts):
    """Rank error stays bounded for ANY split of the stream into partials
    (the property the shuffle relies on: block boundaries are arbitrary)."""
    from clip_as_service_ray.functions.sketches import (
        quantile_sketch_merge,
        quantile_sketch_partial,
        quantile_sketch_query,
    )

    rng = np.random.default_rng(seed)
    vals = rng.normal(size=20_000)
    cut = np.sort(rng.integers(0, len(vals), n_parts - 1))
    parts = [quantile_sketch_partial(c) for c in np.split(vals, cut) if len(c)]
    est = quantile_sketch_query(quantile_sketch_merge(parts), [0.25, 0.5, 0.9])
    sv = np.sort(vals)
    for e, q in zip(est, [0.25, 0.5, 0.9]):
        rank = np.searchsorted(sv, e) / len(sv)
        assert abs(rank - q) < 0.03


def test_cms_linearity_and_bounds():
    from clip_as_service_ray.functions.sketches import (
        cms_merge,
        cms_partial,
        cms_query,
    )

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 1 << 60, 500).astype(np.uint64)
    counts = rng.integers(1, 100, 500)
    whole = cms_partial(keys, counts)
    parts = [
        cms_partial(keys[:200], counts[:200]),
        cms_partial(keys[200:], counts[200:]),
    ]
    assert np.array_equal(cms_merge(parts), whole)  # linear sketch
    # estimates are upper bounds and exact when collisions are rare
    est = cms_query(whole, keys)
    true = np.zeros(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        true[i] = counts[keys == k].sum()
    assert (est >= true).all()
    assert (est == true).mean() > 0.95


def test_approx_top_terms_matches_exact(ray_session):
    from clip_as_service_ray.pipelines.operators import approx_top_terms, top_terms

    a = approx_top_terms(SF).to_pandas()
    e = top_terms(SF).to_pandas()
    assert set(a.term) == set(e.term)  # same top-20 set
    # estimates are upper bounds of the true totals
    true = dict(zip(e.term, e.total_tf))
    assert all(int(r.est_tf) >= int(true[r.term]) for r in a.itertuples())
