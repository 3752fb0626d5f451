"""Query-time synonym expansion: expanded-query equivalence (bit-identical
to manually expanding the query text), analyzer folding of the map itself,
and the OR-only contract."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.search import search_table
from clip_as_service_ray.sources.transcripts import synthesize_transcripts

CFG = EngineConfig(num_index_partitions=4, doc_bucket_size=512, postings_block_size=64)


def _queries(texts, limit=25):
    return pa.table(
        {
            "query_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
            "limit": pa.array([limit] * len(texts), pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("syn")
    corpus = synthesize_transcripts(1200, seed=5)
    src = str(root / "t.parquet")
    pq.write_table(corpus, src)
    index_dir = str(root / "index")
    build_index(src, index_dir, CFG, overwrite=True)
    return index_dir, corpus


def _vocab_terms(corpus, k=3):
    from clip_as_service_ray.functions.tokenizer import tokenize

    seen = []
    for t in corpus.column("text").to_pylist()[:50]:
        for tok in tokenize(t):
            if tok.isalpha() and tok not in seen:
                seen.append(tok)
            if len(seen) >= k:
                return seen
    return seen


def test_expansion_equals_expanded_text(idx):
    index_dir, corpus = idx
    a, b, c = _vocab_terms(corpus, 3)
    got = search_table(
        index_dir, _queries([a]), CFG, synonyms={a: [b, c]}
    ).to_pandas()
    want = search_table(index_dir, _queries([f"{a} {b} {c}"]), CFG).to_pandas()
    assert len(got) == len(want) > 0
    for col in ("conv_id", "turn_idx", "rank"):
        assert (got[col].values == want[col].values).all()
    assert np.array_equal(got["score"].values, want["score"].values)


def test_unknown_expansion_term_is_noop(idx):
    index_dir, corpus = idx
    a = _vocab_terms(corpus, 1)[0]
    got = search_table(
        index_dir, _queries([a]), CFG, synonyms={a: ["zzzznotaterm"]}
    ).to_pandas()
    want = search_table(index_dir, _queries([a]), CFG).to_pandas()
    assert np.array_equal(got["score"].values, want["score"].values)


def test_synonyms_fold_through_analyzer(ray_session, tmp_path):
    corpus = pa.table(
        {
            "conv_id": ["a", "b"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user"] * 2,
            "text": ["the merging stage finished", "a joined table appears"],
        }
    )
    scfg = EngineConfig(num_index_partitions=2, analyzer="stem")
    d = str(tmp_path / "idx")
    build_index(corpus, d, scfg, overwrite=True)
    # map key 'merges' and value 'joining' both fold (merg, join): query
    # 'merged' retrieves BOTH docs through the folded expansion
    hits = search_table(
        d, _queries(["merged"]), scfg, synonyms={"merges": ["joining"]}
    ).to_pandas()
    assert set(zip(hits.conv_id, hits.turn_idx)) == {("a", 0), ("b", 0)}


def test_synonyms_reject_boolean_modes(idx):
    index_dir, _ = idx
    with pytest.raises(Exception, match="synonyms expand OR queries only"):
        search_table(
            index_dir, _queries(["x"]), CFG,
            conjunctive=True, synonyms={"x": ["y"]},
        )


def test_segmented_synonyms_match_monolithic(ray_session, tmp_path):
    from clip_as_service_ray.pipelines.segments import (
        SegmentedQueryService,
        add_segment,
    )

    corpus = synthesize_transcripts(600, seed=8)
    half = corpus.num_rows // 2
    root = str(tmp_path / "segroot")
    add_segment(root, corpus.slice(0, half), CFG)
    add_segment(root, corpus.slice(half), CFG)
    mono = str(tmp_path / "mono")
    build_index(corpus, mono, CFG, overwrite=True)

    a, b = _vocab_terms(corpus, 2)
    syn = {a: [b]}
    svc = SegmentedQueryService(root, CFG, synonyms=syn)
    try:
        got = svc.search(_queries([a])).to_pandas()
    finally:
        svc.shutdown()
    want = search_table(mono, _queries([a]), CFG, synonyms=syn).to_pandas()
    assert len(got) == len(want) > 0
    for col in ("conv_id", "turn_idx", "rank"):
        assert (got[col].values == want[col].values).all()
    assert np.array_equal(got["score"].values, want["score"].values)

