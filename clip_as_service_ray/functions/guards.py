"""Driver-side size guards (round-3 verdict item 8).

The LSH dedup/ANN verify stages keep exactly one driver-side structure: the
candidate pair list (``np.unique`` over the bucket pairs, then ``ray.put``
broadcast to the verify pass). By LSH construction plus the per-bucket caps
it is ≪ corpus, but a pathological corpus (one shingle shared by every doc,
an adversarial band collision) could blow it up *silently* — the driver
would OOM building the membership dict long after the cheap place to fail.

``guard_candidate_pairs`` makes that failure loud and early: it logs the
pair count and approximate driver bytes, and raises past a threshold
(default 5M pairs ≈ 80 MB of int64 pairs + membership dict overhead;
override with ``CAS_RAY_MAX_CANDIDATE_PAIRS``). The error documents the
spill path: persist the pair list to parquet and run the verify as a
pair-hash SHUFFLE join (both sides keyed by ``hash(pair) % P``) instead of
a driver broadcast — no driver materialization at any size.
"""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_MAX_CANDIDATE_PAIRS = 5_000_000
_ENV = "CAS_RAY_MAX_CANDIDATE_PAIRS"


def max_candidate_pairs() -> int:
    try:
        return int(os.environ.get(_ENV, DEFAULT_MAX_CANDIDATE_PAIRS))
    except ValueError:
        return DEFAULT_MAX_CANDIDATE_PAIRS


def guard_candidate_pairs(pairs: np.ndarray, *, stage: str) -> np.ndarray:
    """Validate a driver-held LSH candidate pair array (N x 2 int64).

    Logs the size; raises ``RuntimeError`` when the list exceeds the
    configured cap instead of letting the driver build an oversized
    membership dict. Returns ``pairs`` unchanged so call sites can wrap
    the assignment."""
    n = int(len(pairs))
    cap = max_candidate_pairs()
    approx_mb = n * (16 + 120) / 1e6  # pair ints + dict-entry overhead
    logger.info(
        "%s: %d candidate pairs on the driver (~%.1f MB incl. membership dict)",
        stage, n, approx_mb,
    )
    if n > cap:
        raise RuntimeError(
            f"{stage}: {n} LSH candidate pairs exceed the driver-side cap "
            f"({cap}; env {_ENV}). The corpus is adversarial for the current "
            "banding (a near-universal shingle or band collision). Either "
            "raise the cap, tighten the per-bucket cap / band width, or use "
            "the spill path: write the pair list to parquet and verify via a "
            "pair-hash shuffle join (groupby hash(pair) % P over both the "
            "pair table and the corpus emits) instead of the ray.put "
            "broadcast — no driver materialization at any corpus size."
        )
    return pairs
