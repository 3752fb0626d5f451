"""Full Lucene BooleanQuery (must + should + must_not + filter with a
minimum_should_match floor) — clause algebra vs brute force, ES defaults,
and score bit-identity with plain OR on the union term set."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.functions import bm25
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.oracle import OracleIndex
from clip_as_service_ray.pipelines.search import search_table
from clip_as_service_ray.sources.transcripts import synthesize_transcripts
from clip_as_service_ray.stages.query import IndexReader

CFG = EngineConfig(num_index_partitions=4, doc_bucket_size=512, postings_block_size=64)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("boolq")
    corpus = synthesize_transcripts(1500, seed=3)
    src = str(root / "transcripts.parquet")
    pq.write_table(corpus, src)
    index_dir = str(root / "index")
    build_index(src, index_dir, CFG, overwrite=True)
    return corpus, index_dir, OracleIndex(corpus), IndexReader(index_dir)


def _brute(oracle, reader, must_text, should_text, min_should=0,
           exclude_text="", limit=10):
    must = sorted(set(reader._qtokens(must_text)))
    should = sorted(set(reader._qtokens(should_text)) - set(must))
    if must and any(t not in oracle.postings for t in must):
        return [], np.array([])
    should_present = [t for t in should if t in oracle.postings]
    if not must and min_should <= 0:
        min_should = 1
    if min_should > len(should_present):
        return [], np.array([])
    present = sorted(set(must) | set(should_present))
    scores = np.zeros(oracle.n_docs)
    m_cnt = np.zeros(oracle.n_docs, np.int64)
    s_cnt = np.zeros(oracle.n_docs, np.int64)
    for t in present:
        docs, tfs = oracle.postings[t]
        scores[docs] += bm25.term_scores(
            tfs, oracle.dl_arr[docs], len(docs), reader.n_docs, reader.avgdl
        )
        if t in must:
            m_cnt[docs] += 1
        else:
            s_cnt[docs] += 1
    ok = (m_cnt == len(must)) & (s_cnt >= max(min_should, 0)) \
        & ((m_cnt + s_cnt) > 0)
    if exclude_text:
        for t in sorted(set(reader._qtokens(exclude_text))):
            ps = oracle.postings.get(t)
            if ps is not None:
                ok[ps[0]] = False
    cand = np.nonzero(ok)[0]
    top = bm25.topk_indices(scores[cand], cand, limit)
    sel = cand[top]
    return [oracle.docs[i] for i in sel], scores[sel]


def _q(must, should=None, exclude=None, limit=10):
    cols = {"query_id": pa.array([0], pa.int64()),
            "text": pa.array([must], pa.string()),
            "limit": pa.array([limit], pa.int32())}
    if should is not None:
        cols["should"] = pa.array([should], pa.string())
    if exclude is not None:
        cols["exclude"] = pa.array([exclude], pa.string())
    return pa.table(cols)


CASES = [
    ("merge", "window stream", 1, ""),
    ("merge window", "", 0, ""),            # must-only == conjunctive
    ("", "merge window stream", 2, ""),     # should-only with floor
    ("merge", "window stream", 0, ""),      # must + optional shoulds
    ("merge", "window stream", 1, "the"),   # with must_not
]


@pytest.mark.parametrize("must,should,msm,excl", CASES)
def test_bool_matches_brute(built, must, should, msm, excl):
    corpus, index_dir, oracle, reader = built
    want_docs, want_scores = _brute(oracle, reader, must, should,
                                    min_should=msm, exclude_text=excl)
    got = search_table(
        index_dir, _q(must, should, exclude=excl or None), CFG,
        bool_query=True, min_should=msm,
    ).to_pandas()
    assert list(zip(got.conv_id, got.turn_idx)) == want_docs, (must, should, msm)
    assert np.array_equal(got.score.to_numpy(), want_scores)


def test_should_only_defaults_to_one(built):
    """ES rule: a should-only bool requires >= 1 matching should clause —
    identical to plain OR retrieval (and bit-identical scores)."""
    corpus, index_dir, oracle, reader = built
    got = search_table(
        index_dir, _q("", "merge window"), CFG, bool_query=True,
    ).to_pandas()
    plain = search_table(index_dir, _q("merge window", None), CFG).to_pandas()
    assert (got.conv_id.values == plain.conv_id.values).all()
    assert np.array_equal(got.score.values, plain.score.values)


def test_must_oov_returns_empty(built):
    corpus, index_dir, oracle, reader = built
    got = search_table(
        index_dir, _q("merge zzzznosuchterm", "window"), CFG, bool_query=True,
    )
    assert got.num_rows == 0


def test_survivor_scores_match_or_union(built):
    """A bool hit's score equals the plain-OR score of the union term set
    (clauses gate candidacy, not scoring)."""
    corpus, index_dir, oracle, reader = built
    got = search_table(
        index_dir, _q("merge", "window", limit=10_000), CFG,
        bool_query=True, min_should=0,
    ).to_pandas()
    orr = search_table(
        index_dir, _q("merge window", None, limit=10_000), CFG
    ).to_pandas()
    or_scores = {(c, t): s for c, t, s in zip(orr.conv_id, orr.turn_idx, orr.score)}
    assert len(got) > 0
    for c, t, s in zip(got.conv_id, got.turn_idx, got.score):
        assert or_scores[(c, t)] == s


def test_bool_chunked_path_identical(built):
    """The memory-bounded chunked loop (dense_chunk_docs < n_docs) returns
    bit-identical results to the single-chunk dense path."""
    corpus, index_dir, oracle, reader = built
    from clip_as_service_ray.stages.query import IndexReader

    small = IndexReader(index_dir, dense_chunk_docs=128)
    big = IndexReader(index_dir)
    for must, should, msm in [("merge", "window stream", 0),
                              ("", "merge window", 1)]:
        d1, s1 = small.score_query_bool(must, should, 10, min_should=msm)
        d2, s2 = big.score_query_bool(must, should, 10, min_should=msm)
        assert np.array_equal(d1, d2) and np.array_equal(s1, s2)
