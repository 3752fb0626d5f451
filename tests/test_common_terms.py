"""Lucene CommonTermsQuery (cutoff_frequency): low-df terms select
candidates, high-df terms only score them; all-high queries degrade to
plain OR; survivor scores bit-identical to score_query."""

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
    root = tmp_path_factory.mktemp("common_terms")
    corpus = synthesize_transcripts(1500, seed=7)
    src = str(root / "transcripts.parquet")
    pq.write_table(corpus, src)
    index_dir = str(root / "index")
    build_index(src, index_dir, CFG, overwrite=True)
    return corpus, index_dir, OracleIndex(corpus), IndexReader(index_dir)


def _brute(oracle, reader, text, cutoff, limit=10):
    terms = sorted(set(reader._qtokens(text)))
    present = [t for t in terms if t in oracle.postings]
    low = {
        t for t in present
        if float(len(oracle.postings[t][0])) < cutoff * reader.n_docs
    }
    if not low:
        low = set(present)
    scores = np.zeros(oracle.n_docs, dtype=np.float64)
    matched = np.zeros(oracle.n_docs, dtype=bool)
    for t in present:
        docs, tfs = oracle.postings[t]
        s = bm25.term_scores(
            tfs, oracle.dl_arr[docs], len(docs), reader.n_docs, reader.avgdl
        )
        scores[docs] += s
        if t in low:
            matched[docs] = True
    cand = np.nonzero(matched)[0]
    top = bm25.topk_indices(scores[cand], cand, limit)
    sel = cand[top]
    return [oracle.docs[i] for i in sel], scores[sel]


def _q(text, limit=10):
    return pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([text], pa.string()),
         "limit": pa.array([limit], pa.int32())}
    )


def _cutoff_splitting(reader, rare_min=1):
    """Pick a cutoff that puts 'the' in the high group and at least one
    query term in the low group for this corpus."""
    df_the = reader.df.get("the", 0)
    return (df_the / reader.n_docs) * 0.5


def test_common_terms_matches_brute(built):
    corpus, index_dir, oracle, reader = built
    # pick a genuinely rare term from the corpus vocabulary
    rare = min(
        (t for t in oracle.postings if t.isalpha()),
        key=lambda t: (len(oracle.postings[t][0]), t),
    )
    cutoff = _cutoff_splitting(reader)
    for text in (f"{rare} the", "merge the window", f"{rare} merge the"):
        want_docs, want_scores = _brute(oracle, reader, text, cutoff)
        got = search_table(index_dir, _q(text), CFG, common_terms=cutoff).to_pandas()
        assert list(zip(got.conv_id, got.turn_idx)) == want_docs, text
        assert np.array_equal(got.score.to_numpy(), want_scores), text


def test_all_high_degrades_to_or(built):
    """When every term is above the cutoff, common_terms == plain OR
    (bit-identical scores and ranks)."""
    corpus, index_dir, oracle, reader = built
    text = "merge the"
    got = search_table(index_dir, _q(text), CFG, common_terms=1e-9).to_pandas()
    plain = search_table(index_dir, _q(text), CFG).to_pandas()
    assert (got.conv_id.values == plain.conv_id.values).all()
    assert np.array_equal(got.score.values, plain.score.values)


def test_candidates_require_low_term(built):
    """Every hit must contain at least one low-frequency term — high terms
    alone cannot create candidates."""
    corpus, index_dir, oracle, reader = built
    rare = min(
        (t for t in oracle.postings if t.isalpha()),
        key=lambda t: (len(oracle.postings[t][0]), t),
    )
    cutoff = _cutoff_splitting(reader)
    got = search_table(
        index_dir, _q(f"{rare} the", limit=10_000), CFG, common_terms=cutoff
    ).to_pandas()
    rare_docs = {oracle.docs[i] for i in oracle.postings[rare][0]}
    assert len(got) == len(rare_docs)
    assert set(zip(got.conv_id, got.turn_idx)) == rare_docs


def test_survivor_scores_bit_identical_to_or(built):
    """A common_terms hit's score equals its plain-OR score exactly (the
    split gates candidacy, not scoring)."""
    corpus, index_dir, oracle, reader = built
    rare = min(
        (t for t in oracle.postings if t.isalpha()),
        key=lambda t: (len(oracle.postings[t][0]), t),
    )
    cutoff = _cutoff_splitting(reader)
    text = f"{rare} the"
    ct = search_table(index_dir, _q(text, 10_000), CFG, common_terms=cutoff).to_pandas()
    orr = search_table(index_dir, _q(text, 10_000), CFG).to_pandas()
    or_scores = {
        (c, t): s for c, t, s in zip(orr.conv_id, orr.turn_idx, orr.score)
    }
    for c, t, s in zip(ct.conv_id, ct.turn_idx, ct.score):
        assert or_scores[(c, t)] == s


def test_common_terms_chunked_path_identical(built):
    corpus, index_dir, oracle, reader = built
    from clip_as_service_ray.stages.query import IndexReader

    small = IndexReader(index_dir, dense_chunk_docs=128)
    big = IndexReader(index_dir)
    cutoff = _cutoff_splitting(reader)
    for text in ("merge the window", "merge the"):
        d1, s1 = small.score_query_common_terms(text, 10, cutoff=cutoff)
        d2, s2 = big.score_query_common_terms(text, 10, cutoff=cutoff)
        assert np.array_equal(d1, d2) and np.array_equal(s1, s2)
