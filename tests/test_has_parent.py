"""ES has_parent (block_join mode \"parent\"): children of conversations
whose turn-0 parent doc matches the query, carrying the parent's score —
bit-identical to rank-scoring the parent doc itself."""

import numpy as np
import pyarrow as pa

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.search import search_table
from clip_as_service_ray.sources.transcripts import synthesize_transcripts

CFG = EngineConfig(num_index_partitions=2, postings_block_size=64,
                   query_concurrency=1)


def _build(tmp_path, ray_session):
    corpus = synthesize_transcripts(1500, seed=9)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, CFG, overwrite=True)
    return idx


def _q(text, limit=10, exclude=None):
    cols = {
        "query_id": pa.array([0], pa.int64()),
        "text": pa.array([text]),
        "limit": pa.array([limit], pa.int32()),
    }
    if exclude is not None:
        cols["exclude"] = pa.array([exclude])
    return pa.table(cols)


def test_has_parent_children_carry_parent_score(ray_session, tmp_path):
    from clip_as_service_ray.stages.query import QueryScorer

    idx = _build(tmp_path, ray_session)
    hits = search_table(idx, _q("merge window", limit=25), CFG,
                        block_join="parent")
    assert hits.num_rows > 0
    turns = hits.column("turn_idx").to_numpy()
    assert (turns >= 1).all()  # parents themselves never surface

    # every child's score is BIT-IDENTICAL to scoring the parent doc alone
    scorer = QueryScorer(idx, default_limit=10, pruning=False)
    convs = hits.column("conv_id").to_pylist()
    cands = pa.table(
        {"query_id": pa.array([0] * len(set(convs)), pa.int64()),
         "conv_id": pa.array(sorted(set(convs)), pa.string()),
         "turn_idx": pa.array([0] * len(set(convs)), pa.int32())}
    )
    ranked = scorer.rank_batch(
        pa.table({"query_id": pa.array([0], pa.int64()),
                  "text": pa.array(["merge window"])}),
        cands,
    )
    parent_score = dict(zip(ranked.column("conv_id").to_pylist(),
                            ranked.column("score").to_pylist()))
    for conv, score in zip(convs, hits.column("score").to_pylist()):
        assert score == parent_score[conv], (conv, score, parent_score[conv])

    # rank order: score DESC, then doc ASC (conv ASC, turn ASC)
    scores = hits.column("score").to_numpy()
    assert (np.diff(scores) <= 1e-12).all()
    rows = list(zip(np.round(-scores, 12), convs, turns))
    assert rows == sorted(rows)


def test_has_parent_exclude_filters_children(ray_session, tmp_path):
    idx = _build(tmp_path, ray_session)
    base = search_table(idx, _q("merge window", limit=30), CFG,
                        block_join="parent")
    assert base.num_rows > 0
    # exclusion applies to the CHILD side: excluded children disappear,
    # surviving children keep the same parent scores
    excl_term = "stream"
    filt = search_table(idx, _q("merge window", limit=30, exclude=excl_term),
                        CFG, block_join="parent")
    base_keys = {(c, int(t)): s for c, t, s in zip(
        base.column("conv_id").to_pylist(),
        base.column("turn_idx").to_pylist(),
        base.column("score").to_pylist())}
    for c, t, s in zip(filt.column("conv_id").to_pylist(),
                       filt.column("turn_idx").to_pylist(),
                       filt.column("score").to_pylist()):
        if (c, int(t)) in base_keys:
            assert s == base_keys[(c, int(t))]


def test_has_parent_no_match_is_empty(ray_session, tmp_path):
    idx = _build(tmp_path, ray_session)
    hits = search_table(idx, _q("zzzznotaterm"), CFG, block_join="parent")
    assert hits.num_rows == 0
