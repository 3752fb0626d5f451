"""Range-sharded key->value map (state/kvmap.py): correctness, missing-key
default, and shard-count invariance — the scale path replacing
vocabulary-sized driver broadcasts in doc_keywords / doc_perplexity."""

import numpy as np

from clip_as_service_ray.state.kvmap import build_sharded_float_map


def _ds(n, parts):
    import ray.data

    rows = [{"key": f"k{i:05d}", "val": i * 0.5} for i in range(n)]
    return ray.data.from_items(rows).repartition(parts)


def test_lookup_and_default(ray_session):
    m = build_sharded_float_map(_ds(1000, 7), default=-1.0)
    needles = np.asarray(
        ["k00000", "k00999", "k00500", "zzz-missing", "a-below-first"],
        dtype=object,
    )
    out = m.lookup(needles)
    assert out.tolist() == [0.0, 499.5, 250.0, -1.0, -1.0]
    assert m.lookup(np.asarray([], dtype=object)).tolist() == []


def test_shard_count_invariance(ray_session):
    """Lookups are identical whether the map landed in 1 block or many."""
    rng = np.random.default_rng(3)
    needles = np.asarray(
        [f"k{int(i):05d}" for i in rng.integers(0, 1200, 200)], dtype=object
    )  # some beyond the key range -> default
    m1 = build_sharded_float_map(_ds(800, 1), default=0.0)
    m2 = build_sharded_float_map(_ds(800, 13), default=0.0)
    np.testing.assert_array_equal(m1.lookup(needles), m2.lookup(needles))


def test_empty_map(ray_session):
    import ray.data

    ds = ray.data.from_items([{"key": "x", "val": 1.0}]).filter(
        lambda r: False
    )
    m = build_sharded_float_map(ds, default=7.0)
    assert m.n_shards == 0
    assert m.lookup(np.asarray(["x"], dtype=object)).tolist() == [7.0]


def test_lookup_tokens_matches_direct_probe(ray_session):
    """lookup_tokens (dictionary-encoded Arrow probe) is value-identical
    to prefixing + probing every token directly, including misses and the
    prefix path; dictionary-typed input short-circuits the encode."""
    import pyarrow as pa

    m = build_sharded_float_map(_ds(800, 7), default=0.0)
    rng = np.random.default_rng(11)
    toks = [f"k{int(i):05d}" for i in rng.integers(0, 1200, 500)]
    arr = pa.array(toks, pa.string())
    direct = m.lookup(np.asarray(toks, dtype=object))
    np.testing.assert_array_equal(m.lookup_tokens(arr), direct)
    np.testing.assert_array_equal(
        m.lookup_tokens(arr.dictionary_encode()), direct
    )
    np.testing.assert_array_equal(
        m.lookup_tokens(pa.chunked_array([arr[:200], arr[200:]])), direct
    )
    # prefix path: probe "u\x00"-prefixed keys against a prefixed map
    import ray.data

    ds = ray.data.from_items(
        [{"key": f"u\x00k{i:05d}", "val": float(i)} for i in range(100)]
    )
    mp = build_sharded_float_map(ds, default=-1.0)
    want = mp.lookup(
        np.asarray([f"u\x00{t}" for t in toks], dtype=object)
    )
    np.testing.assert_array_equal(mp.lookup_tokens(arr, "u\x00"), want)
    assert m.lookup_tokens(pa.array([], pa.string())).tolist() == []
