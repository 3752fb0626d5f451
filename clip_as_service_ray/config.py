"""Engine configuration.

The config dict plays the role of the reference's Flow YAML
(``server/clip_server/__main__.py:21-27``, ``torch-flow.yml``): every knob a
pipeline builder needs, in one plain dataclass, no distribution concern.

BM25 constants are FROZEN (k1=1.2, b=0.75) — the analog of the reference's
frozen ``_logit_scale = np.exp(4.60517)`` in
``server/clip_server/executors/helper.py:89``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # --- BM25 scoring (frozen to match the golden oracle) ---
    k1: float = 1.2
    b: float = 0.75
    # default top-k limit; mirrors client.py:785 / retriever.md:107
    limit: int = 10

    # --- index layout ---
    # number of term-hash output partitions for the posting merge shuffle
    num_index_partitions: int = 8
    # postings are split into fixed-size blocks with per-block max-score
    # metadata (block-max) so query scoring can skip blocks
    postings_block_size: int = 128
    # doc-range bucket width for the merge shuffle sub-key: partial posting
    # runs are split on bucket boundaries so a hot term (stopword) becomes
    # many (term, bucket) groups instead of one giant group — the skew
    # splitting required by the north rule. 64k docs/bucket caps a hot
    # term's per-group postings at ~bucket_size regardless of corpus size.
    doc_bucket_size: int = 1 << 16
    # doc-range groups per term-hash partition: the merge exchange is a 2-D
    # grid (part x bgrp) and each grid cell is one merge task. Hot terms
    # spread uniformly over doc ranges, so cells stay balanced under term
    # skew; wall time of the merge stage is bounded by a cell, not by the
    # hottest term (the north rule's skew splitting, statically planned).
    merge_groups_per_part: int = 4

    # --- execution sizing ---
    tokenize_batch_size: int = 16384
    # actor pool bounds for the tokenize stage (autoscaling (min, max))
    tokenize_concurrency: int = 8
    query_batch_size: int = 64
    # actor pool size for the query scorer; None -> let Ray autoscale
    query_concurrency: int = 4
    # per-replica LRU result-cache entries for SERVING pools (QueryService /
    # ScatterQueryService); safe because readers are immutable per actor
    # (writes swap in fresh pools). The batch map_batches path keeps it off.
    query_cache_size: int = 256

    # --- tokenizer ---
    lowercase: bool = True
    # post-tokenize analyzer applied symmetrically at build and query time
    # (functions/analyzers.py): None = raw terms, "stem" = Porter stemming,
    # "stop" = English stopword removal, "stop+stem" = both (Lucene order).
    # Recorded in stats.json so readers auto-apply it — never a search flag.
    analyzer: str | None = None
    # M1 modality-split analog (helper.py:82-86): when set, only turns whose
    # `role` is in this tuple are indexed (e.g. ("user", "assistant"));
    # None indexes every role. Empty/whitespace turns are always dropped.
    index_roles: tuple | None = None

    # --- query execution ---
    # rank-safe MaxScore/block-max pruning (score_query_pruned); results are
    # identical to the exact TAAT path (tests/test_query_pruning.py)
    query_pruning: bool = True

    # --- resumability ---
    # if True, pipeline stages skip partitions whose manifest says done
    resume: bool = True

    extra: dict = field(default_factory=dict)


DEFAULT_CONFIG = EngineConfig()
