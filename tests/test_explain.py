"""Lucene-explain analog: per-term score decomposition is bit-identical to
retrieval scoring, reflects the index's analyzer + synonym expansion, and
scatter-explain honors segment ownership and tombstones."""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.search import search_table
from clip_as_service_ray.sources.transcripts import (
    reference_query_table,
    synthesize_transcripts,
)
from clip_as_service_ray.stages.query import IndexReader

CFG = EngineConfig(num_index_partitions=2, postings_block_size=64)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("explain")
    corpus = synthesize_transcripts(900, seed=21)
    idx = str(root / "index")
    build_index(corpus, idx, CFG, overwrite=True)
    return idx, corpus


def test_explain_matches_search_score(built):
    idx, _ = built
    queries = reference_query_table()
    hits = search_table(idx, queries, CFG).to_pandas()
    reader = IndexReader(idx)
    texts = dict(zip(queries.column("query_id").to_pylist(),
                     queries.column("text").to_pylist()))
    checked = 0
    for _, h in hits.head(20).iterrows():
        out = reader.explain(texts[h.query_id], h.conv_id, int(h.turn_idx))
        assert out is not None
        # bit-identical to the retrieval score (same accumulation structure)
        assert out["score"] == h.score
        # sequential re-accumulation of the parts reproduces it too
        s = 0.0
        for p in out["terms"]:
            s += p["score"]
            assert p["score"] == p["idf"] * p["tf_norm"]
            assert p["tf"] >= 1 and p["dl"] >= p["tf"] and p["df"] >= 1
        assert s == out["score"]
        checked += 1
    assert checked > 0


def test_explain_unknown_doc_is_none(built):
    idx, _ = built
    reader = IndexReader(idx)
    assert reader.explain("anything", "no-such-conv", 0) is None


def test_explain_reflects_analyzer_and_synonyms(ray_session, tmp_path):
    corpus = pa.table(
        {
            "conv_id": ["a"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["the merged windows opened"],
        }
    )
    scfg = EngineConfig(num_index_partitions=2, analyzer="stop+stem")
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, scfg, overwrite=True)
    reader = IndexReader(idx)
    reader.synonyms = {"merg": ("window",)}
    out = reader.explain("merging", "a", 0)
    # query folds to [merg]; synonym adds window (folded doc term for
    # 'windows'); 'the' never appears (stopword)
    terms = [p["term"] for p in out["terms"]]
    assert terms == ["merg", "window"]
    assert out["score"] == sum(p["score"] for p in out["terms"])


def test_scatter_explain_owner_and_tombstones(ray_session, tmp_path):
    from clip_as_service_ray.pipelines.segments import (
        SegmentedQueryService,
        add_segment,
        delete_convs,
    )

    root = str(tmp_path / "segroot")
    t1 = pa.table(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user"] * 2,
            "text": ["alpha beta gamma", "alpha alpha delta"],
        }
    )
    add_segment(root, t1, CFG)
    t2 = pa.table(
        {
            "conv_id": ["c3"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["alpha epsilon"],
        }
    )
    add_segment(root, t2, CFG)
    svc = SegmentedQueryService(root, CFG)
    try:
        out = svc.explain("alpha beta", "c1", 0)
        assert out is not None and out["segment"].startswith("seg")
        assert [p["term"] for p in out["terms"]] == ["alpha", "beta"]
        assert svc.explain("alpha", "nope", 0) is None
    finally:
        svc.shutdown()
    delete_convs(root, ["c1"])
    svc2 = SegmentedQueryService(root, CFG)
    try:
        assert svc2.explain("alpha beta", "c1", 0) is None  # tombstoned
        assert svc2.explain("alpha", "c3", 0) is not None
    finally:
        svc2.shutdown()
