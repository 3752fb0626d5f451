"""Mergeable cardinality sketches (HyperLogLog).

The scale path for COUNT(DISTINCT ...) at 100 TB: each map_batches task
folds its rows into a fixed 2^p-byte register array (a *commutative,
idempotent* partial), partials merge by elementwise max — so the combine
tree can be arbitrary and the driver-side final merge is O(blocks * 2^p)
bytes, independent of cardinality. Standard HLL per Flajolet et al. 2007
(public algorithm); hash is splitmix64 (public domain).
"""

from __future__ import annotations

import numpy as np

DEFAULT_P = 14  # 16384 registers, ~0.81% relative standard error


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (public-domain mixer)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def hll_partial(values: np.ndarray, p: int = DEFAULT_P) -> np.ndarray:
    """Fold an int array into a fresh 2^p uint8 register array, vectorized:
    register index = top p hash bits; rank = leading-zero count of the
    remaining (64-p) bits + 1 (bit_length via frexp — exact for <=52-bit
    ints in float64, and 64-p <= 52 for p >= 12)."""
    if p < 12 or p > 18:
        raise ValueError("p must be in [12, 18]")
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = splitmix64(values.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    bitlen = np.frexp(w.astype(np.float64))[1]  # 0 for w == 0
    rank = ((64 - p) - bitlen + 1).astype(np.uint8)  # w==0 -> 64-p+1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(partials: list[np.ndarray]) -> np.ndarray:
    """Elementwise-max merge of register arrays (associative+commutative)."""
    return np.maximum.reduce(partials) if partials else np.zeros(1 << DEFAULT_P, np.uint8)


def hll_estimate(regs: np.ndarray) -> float:
    """Raw HLL estimate with the standard small-range (linear counting)
    correction (Flajolet et al. 2007, fig. 3)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------------------
# Deterministic KLL-style quantile sketch
#
# The mergeable-partial path for percentiles over groups too big for one
# worker: each batch folds its values into a bounded multi-level sketch
# (level i holds sorted values of weight 2^i, capacity k per level); merge =
# concatenate per level + deterministic compaction (keep alternating
# elements, parity flips per compaction so the bias cancels). Rank error is
# O(levels / k): k=256 over 2^20 x-fold compactions stays ~1%. Deterministic
# compaction (vs KLL's coin flips) trades the tight proof for exact
# reproducibility given the same merge tree.


def quantile_sketch_partial(values: np.ndarray, k: int = 256) -> list[np.ndarray]:
    """Fold a value array into sketch levels: list[level] -> sorted float64."""
    levels: list[np.ndarray] = [np.sort(values.astype(np.float64))]
    _compact(levels, k)
    return levels


def quantile_sketch_merge(
    sketches: list[list[np.ndarray]], k: int = 256
) -> list[np.ndarray]:
    """Merge sketches: per-level concatenation + compaction."""
    if not sketches:
        return [np.empty(0, np.float64)]
    depth = max(len(s) for s in sketches)
    levels = [
        np.sort(np.concatenate([s[i] for s in sketches if i < len(s)] or
                               [np.empty(0, np.float64)]))
        for i in range(depth)
    ]
    _compact(levels, k)
    return levels


def _compact(levels: list[np.ndarray], k: int) -> None:
    i = 0
    while i < len(levels):
        if len(levels[i]) > k:
            v = np.sort(levels[i])
            # alternate the kept offset by the current length parity so
            # successive compactions don't systematically bias one way
            off = (len(v) // 2) % 2
            promoted = v[off::2]
            levels[i] = np.empty(0, np.float64)
            if i + 1 == len(levels):
                levels.append(promoted)
            else:
                levels[i + 1] = np.concatenate([levels[i + 1], promoted])
        i += 1


def quantile_sketch_query(levels: list[np.ndarray], qs) -> np.ndarray:
    """Weighted-quantile estimates for each q in qs."""
    vals = np.concatenate([lv for lv in levels if len(lv)] or [np.empty(0)])
    if len(vals) == 0:
        return np.full(len(qs), np.nan)
    wts = np.concatenate(
        [np.full(len(lv), float(1 << i)) for i, lv in enumerate(levels) if len(lv)]
    )
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    total = cum[-1]
    # midpoint rule: value whose cumulative weight first covers q*total
    targets = np.asarray(qs, dtype=np.float64) * total
    idx = np.searchsorted(cum, targets, side="left")
    return vals[np.minimum(idx, len(vals) - 1)]


def quantile_sketch_to_rows(levels: list[np.ndarray]):
    """(level:int, blob:bytes) rows for Arrow transport."""
    return [(i, lv.tobytes()) for i, lv in enumerate(levels) if len(lv)]


def quantile_sketch_from_rows(rows) -> list[np.ndarray]:
    depth = max((r[0] for r in rows), default=-1) + 1
    levels = [np.empty(0, np.float64) for _ in range(depth)]
    for i, blob in rows:
        levels[i] = np.concatenate([levels[i], np.frombuffer(blob, np.float64)])
    return levels if levels else [np.empty(0, np.float64)]


# ---------------------------------------------------------------------------
# Count-min sketch (heavy hitters)


def cms_partial(
    keys: np.ndarray, counts: np.ndarray, *, width: int = 8192, depth: int = 4
) -> np.ndarray:
    """Fold (hashed key, count) pairs into a depth x width count-min matrix.
    Mergeable by elementwise ADD (linear sketch). keys must be uint64
    hashes (e.g. splitmix64 of the raw key)."""
    m = np.zeros((depth, width), dtype=np.int64)
    if len(keys) == 0:
        return m
    h = keys.astype(np.uint64, copy=True)
    for d in range(depth):
        h = splitmix64(h)
        idx = (h % np.uint64(width)).astype(np.int64)
        np.add.at(m[d], idx, counts)
    return m


def cms_merge(partials: list[np.ndarray]) -> np.ndarray:
    return np.sum(partials, axis=0) if partials else np.zeros((4, 8192), np.int64)


def cms_query(m: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates (upper bounds; min over rows) for hashed keys."""
    depth, width = m.shape
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    h = keys.astype(np.uint64, copy=True)
    for d in range(depth):
        h = splitmix64(h)
        idx = (h % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, m[d, idx])
    return est
