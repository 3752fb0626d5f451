"""clip_as_service_ray — a Ray-Data-native full-text engine.

A from-scratch inverted-index build + BM25 top-k query engine over Parquet
transcript turns, preserving the operator semantics of the reference
(jina-ai/clip-as-service) re-expressed Ray-Data-first:

- text canonicalization + term splitting cloned from the reference tokenizer
  (``server/clip_server/model/simple_tokenizer.py:58-92,135-143``)
- score -> sort-desc -> top-k with dropped heavy payloads mirrors ``set_rank``
  (``server/clip_server/executors/helper.py:89-124``) with BM25 in place of
  the cosine/softmax kernel and fixed k1=1.2, b=0.75 as the analog of the
  frozen ``logit_scale = e**4.60517``
- limit-k search contract (default 10) from ``client/clip_client/client.py:785``

Layout:
- ``functions/`` pure per-row / per-array kernels (tokenizer, bm25, hashing)
- ``sources/``   readers + the deterministic transcripts synthesizer
- ``stages/``    Ray Data map_batches / groupby stages
- ``state/``     posting-list codec, manifests, broadcast helpers
- ``pipelines/`` end-to-end build / search pipelines + the golden oracle
"""

import os as _os


def _tune_malloc() -> bool:
    """Keep large numpy temporaries on the brk heap instead of fresh mmaps.

    glibc malloc mmap()s allocations above M_MMAP_THRESHOLD (128 KiB default)
    and munmap()s them on free, so every batch's big temporaries (repeat /
    lexsort / gather buffers, tens of MB each) are returned to the kernel and
    re-page-faulted on the next batch. Under memory ballooning / free-page
    reporting hypervisors those first-touch faults dominate batch wall time
    (measured here: 3-4x on the fused emit UDF) and add run-to-run variance.
    Raising the mmap + trim thresholds keeps the pages faulted-in for the
    worker's lifetime — the standard long-lived-worker allocator setting.
    Runs once per process at package import, so every Ray worker that
    unpickles a UDF gets it. Opt out: CAS_RAY_NO_MALLOC_TUNE=1."""
    if _os.environ.get("CAS_RAY_NO_MALLOC_TUNE"):
        return False
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        m_mmap_threshold, m_trim_threshold = -3, -1
        ok = libc.mallopt(m_mmap_threshold, 1 << 30) == 1
        ok = libc.mallopt(m_trim_threshold, 1 << 30) == 1 and ok
        return ok
    except Exception:  # pragma: no cover - non-glibc platforms
        return False


_MALLOC_TUNED = _tune_malloc()

from clip_as_service_ray.config import EngineConfig  # noqa: E402

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
