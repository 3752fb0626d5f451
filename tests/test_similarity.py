"""Alternative similarity modules (the Lucene/ES per-index ``similarity``
setting): lmdirichlet / lmjm / tfidf / boolean score the SAME index artifact
through the exact dense path. Engine results must be bit-identical to a
brute-force recompute of ``functions/bm25.py::alt_term_scores`` over golden
oracle postings with the engine's own corpus stats."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.functions import bm25
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.oracle import OracleIndex
from clip_as_service_ray.pipelines.search import search_table
from clip_as_service_ray.sources.transcripts import (
    reference_query_table,
    synthesize_transcripts,
)
from clip_as_service_ray.stages.query import IndexReader

CFG = EngineConfig(num_index_partitions=4, doc_bucket_size=512, postings_block_size=64)
CFG_NOPRUNE = EngineConfig(
    num_index_partitions=4, doc_bucket_size=512, postings_block_size=64,
    query_pruning=False,
)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("similarity")
    corpus = synthesize_transcripts(1500, seed=11)
    src = str(root / "transcripts.parquet")
    pq.write_table(corpus, src)
    index_dir = str(root / "index")
    build_index(src, index_dir, CFG, overwrite=True)
    return corpus, index_dir, OracleIndex(corpus), IndexReader(index_dir)


def _brute(oracle, reader, kind, text, limit=10, param=None):
    """alt_term_scores over golden postings + engine stats, dense-accumulated
    in sorted term order (the canonical structure)."""
    terms = sorted(set(reader._qtokens(text)))
    scores = np.zeros(oracle.n_docs, dtype=np.float64)
    matched = np.zeros(oracle.n_docs, dtype=bool)
    for t in terms:
        ps = oracle.postings.get(t)
        if ps is None:
            continue
        docs, tfs = ps
        s = bm25.alt_term_scores(
            kind, tfs, oracle.dl_arr[docs], len(docs), float(tfs.sum()),
            reader.n_docs, reader.avgdl, param=param,
        )
        scores[docs] += s
        matched[docs] = True
    cand = np.nonzero(matched)[0]
    top = bm25.topk_indices(scores[cand], cand, limit)
    sel = cand[top]
    return (
        [oracle.docs[i] for i in sel],
        scores[sel],
    )


QUERIES = ["merge window", "the merge", "dataset shuffle spill", "window"]
KINDS = ["lmdirichlet", "lmjm", "tfidf", "boolean"]


def _qtable(texts, limit=10):
    return pa.table(
        {"query_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string()),
         "limit": pa.array([limit] * len(texts), pa.int32())}
    )


@pytest.mark.parametrize("kind", KINDS)
def test_similarity_matches_brute(built, kind):
    corpus, index_dir, oracle, reader = built
    got = search_table(index_dir, _qtable(QUERIES), CFG, similarity=kind).to_pandas()
    for qid, text in enumerate(QUERIES):
        want_docs, want_scores = _brute(oracle, reader, kind, text)
        g = got[got.query_id == qid].sort_values("rank")
        assert list(zip(g.conv_id, g.turn_idx)) == want_docs, (kind, text)
        assert np.array_equal(g.score.to_numpy(), want_scores), (kind, text)


def test_similarity_pruning_config_is_inert(built):
    """QueryScorer forces the exact path under non-BM25 similarity, so the
    pruning config flag cannot change results."""
    corpus, index_dir, oracle, reader = built
    q = _qtable(QUERIES)
    for kind in ("lmdirichlet", "tfidf"):
        a = search_table(index_dir, q, CFG, similarity=kind).to_pandas()
        b = search_table(index_dir, q, CFG_NOPRUNE, similarity=kind).to_pandas()
        assert np.array_equal(a.score.values, b.score.values)
        assert (a.conv_id.values == b.conv_id.values).all()


def test_sim_param_threads_through(built):
    corpus, index_dir, oracle, reader = built
    got = search_table(
        index_dir, _qtable(["merge window"]), CFG,
        similarity="lmjm", sim_param=0.5,
    ).to_pandas()
    want_docs, want_scores = _brute(oracle, reader, "lmjm", "merge window", param=0.5)
    assert list(zip(got.conv_id, got.turn_idx)) == want_docs
    assert np.array_equal(got.score.to_numpy(), want_scores)
    # and differs from the default lambda=0.1 scores
    base = search_table(
        index_dir, _qtable(["merge window"]), CFG, similarity="lmjm"
    ).to_pandas()
    assert not np.array_equal(got.score.to_numpy(), base.score.to_numpy())


def test_boolean_scores_are_match_counts(built):
    corpus, index_dir, oracle, reader = built
    got = search_table(
        index_dir, _qtable(["merge window"], limit=5), CFG, similarity="boolean"
    ).to_pandas()
    assert set(got.score.unique()) <= {1.0, 2.0}
    _, want_scores = _brute(oracle, reader, "boolean", "merge window", limit=5)
    assert got.score.iloc[0] == want_scores[0]  # top score = max match count


def test_similarity_validation():
    from clip_as_service_ray.stages.query import QueryScorer

    with pytest.raises(ValueError, match="unknown similarity"):
        QueryScorer("/nonexistent", similarity="nope")
    with pytest.raises(ValueError, match="delta"):
        QueryScorer("/nonexistent", similarity="tfidf", delta=1.0)


def test_scatter_guard_lm_multi_shard():
    """LM kernels need union ctf: multi-shard scatter must refuse them
    before spawning any actor."""
    from clip_as_service_ray.pipelines.sharded import ScatterQueryService

    with pytest.raises(ValueError, match="collection term"):
        ScatterQueryService(["/a", "/b"], {}, similarity="lmjm")


def test_kernel_reference_values():
    """Hand-checked kernel spot values (guards against silent formula
    drift; the SQL twins encode the same expressions)."""
    tf = np.array([2.0])
    dl = np.array([10.0])
    # lmdirichlet: mu=2000, N=100, avgdl=10, ctf=5 -> p=5/1000
    s = bm25.alt_term_scores("lmdirichlet", tf, dl, 3, 5.0, 100, 10.0)
    want = max(np.log(1.0 + 2.0 / (2000.0 * (5.0 / 1000.0))) + np.log(2000.0 / 2010.0), 0.0)
    assert s[0] == want
    # lmjm: lambda=0.1
    s = bm25.alt_term_scores("lmjm", tf, dl, 3, 5.0, 100, 10.0)
    want = np.log(1.0 + (0.9 * 0.2) / (0.1 * (5.0 / 1000.0)))
    assert s[0] == want
    # tfidf: idf = 1 + ln(100/4)
    s = bm25.alt_term_scores("tfidf", tf, dl, 3, 5.0, 100, 10.0)
    i = 1.0 + np.log(100 / 4.0)
    assert s[0] == np.sqrt(2.0) * (i * i) / np.sqrt(10.0)
    assert bm25.alt_term_scores("boolean", tf, dl, 3, 5.0, 100, 10.0)[0] == 1.0
    with pytest.raises(ValueError):
        bm25.alt_term_scores("bm25x", tf, dl, 3, 5.0, 100, 10.0)


def test_tuned_k1_b_matches_brute(built):
    """Per-request BM25 k1/b override (ES similarity tuning): exact path,
    bit-identical to a brute recompute under the tuned constants."""
    corpus, index_dir, oracle, reader = built
    k1, b = 0.9, 0.4
    text = "merge window"
    terms = sorted(set(reader._qtokens(text)))
    scores = np.zeros(oracle.n_docs)
    matched = np.zeros(oracle.n_docs, bool)
    for t in terms:
        ps = oracle.postings.get(t)
        if ps is None:
            continue
        docs, tfs = ps
        scores[docs] += bm25.term_scores(
            tfs, oracle.dl_arr[docs], len(docs), reader.n_docs, reader.avgdl,
            k1=k1, b=b,
        )
        matched[docs] = True
    cand = np.nonzero(matched)[0]
    top = bm25.topk_indices(scores[cand], cand, 10)
    want_docs = [oracle.docs[i] for i in cand[top]]
    want_scores = scores[cand[top]]
    got = search_table(index_dir, _qtable([text]), CFG, k1=k1, b=b).to_pandas()
    assert list(zip(got.conv_id, got.turn_idx)) == want_docs
    assert np.array_equal(got.score.to_numpy(), want_scores)
    # and differs from the default-constants ranking's scores
    base = search_table(index_dir, _qtable([text]), CFG).to_pandas()
    assert not np.array_equal(got.score.to_numpy(), base.score.to_numpy())
