"""functions/strhash.py — buffer-level vectorized 2x64 content hash
(replaces the per-batch object-array hash hop the 24M rehearsal flagged
in the dedup legs)."""

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions.strhash import hash_utf8_pair

TEXTS = (
    ["", "a", "ab", "ba", "a" * 300, "a" * 299 + "b", "héllo wörld",
     "中文 text", "12345678", "123456789", "1234567", "x" * 8, "x" * 16]
    + [f"doc {i} body {i * 7}" for i in range(5000)]
)


def test_determinism_and_no_collisions():
    arr = pa.array(TEXTS, pa.string())
    h1, h2 = hash_utf8_pair(arr)
    j1, j2 = hash_utf8_pair(pa.array(TEXTS))
    np.testing.assert_array_equal(h1, j1)
    np.testing.assert_array_equal(h2, j2)
    keys = {(int(a), int(b)) for a, b in zip(h1, h2)}
    assert len(keys) == len(set(TEXTS))
    # equal strings at different positions hash equal
    dup = pa.array(["same", "other", "same"])
    d1, d2 = hash_utf8_pair(dup)
    assert d1[0] == d1[2] and d2[0] == d2[2] and d1[0] != d1[1]


def test_slice_and_chunk_parity():
    """a.offset handling: hashing a sliced or chunked view must equal the
    corresponding rows of the full-array hash."""
    arr = pa.array(TEXTS)
    h1, h2 = hash_utf8_pair(arr)
    s1, s2 = hash_utf8_pair(arr.slice(7, 100))
    np.testing.assert_array_equal(s1, h1[7:107])
    np.testing.assert_array_equal(s2, h2[7:107])
    c1, c2 = hash_utf8_pair(pa.chunked_array([arr[:19], arr[19:]]))
    np.testing.assert_array_equal(c1, h1)
    np.testing.assert_array_equal(c2, h2)
    e1, e2 = hash_utf8_pair(pa.array([], pa.string()))
    assert len(e1) == len(e2) == 0


def test_distribution_low_bits():
    """groupby partitioning keys off the low bits — they must spread."""
    arr = pa.array([f"k{i}" for i in range(64 * 400)])
    h1, _ = hash_utf8_pair(arr)
    counts = np.bincount((h1 & np.uint64(63)).astype(int), minlength=64)
    assert counts.min() > 400 * 0.7 and counts.max() < 400 * 1.4
