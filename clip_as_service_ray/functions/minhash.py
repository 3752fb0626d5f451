"""Near-duplicate kernels: term hashing, shingles, MinHash, SimHash.

Pure numpy; everything deterministic (fixed hash constants, seeded
permutation parameters). These are the per-batch building blocks for the
dedup stages in ``stages/dedup.py`` — the training-data-pipeline operators
the reference lacks (its only dedup-like behavior is AnnLite upsert
last-write-wins by doc id, SURVEY.md §2.8).
"""

from __future__ import annotations

import zlib

import numpy as np

_MERSENNE = (1 << 61) - 1  # prime modulus for universal hashing


def hash_terms(terms: np.ndarray) -> np.ndarray:
    """Stable 64-bit-ish hashes for an object array of term strings.

    crc32 per unique string (C speed), spread to 61 bits by a splitmix-style
    mix so downstream modular hashing sees well-distributed values.
    """
    uniq, inv = np.unique(terms, return_inverse=True)
    h = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in uniq), dtype=np.uint64, count=len(uniq)
    )
    h = (h + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h = (h * np.uint64(0x94D049BB133111EB)) % np.uint64(_MERSENNE)
    return h[inv]


_SHINGLE_MULS_BASE = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _shingle_muls(n: int) -> np.ndarray:
    """First 3 multipliers are the historical fixed constants (signatures
    for shingle_n <= 3 are stable); beyond that, odd splitmix64 outputs."""
    muls = list(_SHINGLE_MULS_BASE[:n])
    x = np.uint64(_SHINGLE_MULS_BASE[2])
    with np.errstate(over="ignore"):
        while len(muls) < n:
            x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
            z = x
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
            muls.append(int(z | np.uint64(1)))  # odd
    return np.array(muls, dtype=np.uint64)


def shingle_hashes(term_hashes: np.ndarray, n: int = 3) -> np.ndarray:
    """Hashes of overlapping word n-grams, vectorized: combine n consecutive
    term hashes with distinct odd multipliers. Docs shorter than n fall back
    to their unigram hashes. Returns UNIQUE sorted shingle hashes (a set)."""
    m = len(term_hashes)
    if m == 0:
        return np.array([], dtype=np.uint64)
    if m < n:
        return np.unique(term_hashes)
    muls = _shingle_muls(n)
    acc = np.zeros(m - n + 1, dtype=np.uint64)
    for i in range(n):
        acc = acc ^ (term_hashes[i : m - n + 1 + i] * muls[i])
    acc ^= acc >> np.uint64(29)
    return np.unique(acc % np.uint64(_MERSENNE))


def minhash_params(num_perm: int = 128, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 signature: min over shingles of (a*x+b) mod p.

    Products are taken mod 2^64 (numpy wraparound) then mod p — a standard
    practical universal-hash family; deterministic and mergeable (min)."""
    if len(shingles) == 0:
        return np.full(len(a), np.uint64(_MERSENNE), dtype=np.uint64)
    vals = (a[:, None] * shingles[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def band_hashes(signature: np.ndarray, bands: int) -> np.ndarray:
    """Collapse the signature into `bands` LSH bucket keys (uint64)."""
    r = len(signature) // bands
    sig = signature[: bands * r].reshape(bands, r)
    acc = np.zeros(bands, dtype=np.uint64)
    for i in range(r):
        acc = (acc * np.uint64(1099511628211)) ^ sig[:, i]
    return acc


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique hash arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def simhash(term_hashes: np.ndarray, tfs: np.ndarray) -> np.uint64:
    """64-bit SimHash: tf-weighted bit votes over term hashes."""
    if len(term_hashes) == 0:
        return np.uint64(0)
    bits = ((term_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = ((bits * 2 - 1) * tfs[:, None].astype(np.int64)).sum(axis=0)
    out = np.uint64(0)
    for i in np.nonzero(votes > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a, b)
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
