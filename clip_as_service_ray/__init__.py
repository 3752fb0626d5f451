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

from clip_as_service_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
