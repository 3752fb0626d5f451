"""ES boosting query (soft NOT): demotion-not-exclusion semantics, float
identity with the OR path, chunked-path equivalence, mode composition, and
segmented == monolithic parity."""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.search import search_table
from clip_as_service_ray.sources.transcripts import synthesize_transcripts
from clip_as_service_ray.stages.query import IndexReader

CFG = EngineConfig(num_index_partitions=4, doc_bucket_size=512,
                   postings_block_size=64)


def _queries(texts, negatives=None, excludes=None, limit=15):
    cols = {
        "query_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts,
        "limit": pa.array([limit] * len(texts), pa.int32()),
    }
    if negatives is not None:
        cols["negative"] = pa.array(negatives, pa.string())
    if excludes is not None:
        cols["exclude"] = pa.array(excludes, pa.string())
    return pa.table(cols)


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("boosting")
    corpus = synthesize_transcripts(900, seed=13)
    index_dir = str(root / "index")
    build_index(corpus, index_dir, CFG, overwrite=True)
    reader = IndexReader(index_dir)
    # three reasonably common corpus terms
    dfs = np.array([reader._term_df(t) for t in reader._terms_sorted])
    order = np.argsort(-dfs)
    a, b, c = (reader._terms_sorted[order[i]] for i in (0, 2, 4))
    return index_dir, reader, str(a), str(b), str(c)


def test_boosting_vs_bruteforce(idx):
    """Engine top-k == full OR match set with negative-matching docs
    demoted by the multiplier, bit-identically (non-demoted scores equal
    score_query's floats; demoted are exactly score * nb)."""
    index_dir, reader, a, b, c = idx
    text = f"{a} {b}"
    full_docs, full_scores = reader.score_query(text, 10**9)
    neg = reader.excluded_docs(c)
    assert len(neg) > 0
    demoted = np.isin(full_docs, neg)
    assert demoted.any() and not demoted.all()
    want = full_scores.copy()
    want[demoted] *= 0.5
    order = np.lexsort((full_docs, -want))[:15]
    got = search_table(
        index_dir, _queries([text], negatives=[c]), CFG, boosting=0.5
    )
    wc, wt = reader.invert_doc_ids(full_docs[order])
    assert got.column("conv_id").to_pylist() == wc.tolist()
    assert got.column("turn_idx").to_pylist() == wt.tolist()
    np.testing.assert_array_equal(got.column("score").to_numpy(), want[order])


def test_boosting_chunked_path_identical(idx):
    index_dir, reader, a, b, c = idx
    text = f"{a} {b}"
    r2 = IndexReader(index_dir)
    r2.dense_chunk_docs = 89  # force many chunks
    d1, s1 = reader.score_query_boosting(text, c, 15, negative_boost=0.5)
    d2, s2 = r2.score_query_boosting(text, c, 15, negative_boost=0.5)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2)


def test_boosting_empty_negative_is_plain_or(idx):
    index_dir, reader, a, b, _ = idx
    text = f"{a} {b}"
    got = search_table(
        index_dir, _queries([text], negatives=[""]), CFG, boosting=0.5
    )
    want = search_table(index_dir, _queries([text]), CFG)
    assert got.column("conv_id").to_pylist() == want.column("conv_id").to_pylist()
    np.testing.assert_array_equal(
        got.column("score").to_numpy(), want.column("score").to_numpy()
    )


def test_boosting_composes_with_exclude(idx):
    """Hard NOT (exclude) and soft NOT (negative) together: excluded docs
    vanish, negative docs are demoted among the survivors."""
    index_dir, reader, a, b, c = idx
    text = f"{a} {b}"
    full_docs, full_scores = reader.score_query(text, 10**9)
    excl = reader.excluded_docs(b)  # docs containing b are dropped
    neg = reader.excluded_docs(c)
    keep = ~np.isin(full_docs, excl)
    docs_k, scores_k = full_docs[keep], full_scores[keep].copy()
    scores_k[np.isin(docs_k, neg)] *= 0.25
    order = np.lexsort((docs_k, -scores_k))[:15]
    got = search_table(
        index_dir, _queries([text], negatives=[c], excludes=[b]), CFG,
        boosting=0.25,
    )
    wc, wt = reader.invert_doc_ids(docs_k[order])
    assert got.column("conv_id").to_pylist() == wc.tolist()
    assert got.column("turn_idx").to_pylist() == wt.tolist()
    np.testing.assert_array_equal(
        got.column("score").to_numpy(), scores_k[order]
    )


def test_boosting_mode_mutually_exclusive(idx):
    index_dir, *_ = idx
    with pytest.raises(Exception, match="mutually exclusive"):
        search_table(
            index_dir, _queries(["x"]), CFG, boosting=0.5, conjunctive=True,
        )


def test_segmented_boosting_match_monolithic(ray_session, tmp_path):
    from clip_as_service_ray.pipelines.segments import (
        SegmentedQueryService,
        add_segment,
    )

    corpus = synthesize_transcripts(600, seed=21)
    half = corpus.num_rows // 2
    root = str(tmp_path / "segroot")
    add_segment(root, corpus.slice(0, half), CFG)
    add_segment(root, corpus.slice(half), CFG)
    mono = str(tmp_path / "mono")
    build_index(corpus, mono, CFG, overwrite=True)
    reader = IndexReader(mono)
    dfs = np.array([reader._term_df(t) for t in reader._terms_sorted])
    order = np.argsort(-dfs)
    a, b, c = (str(reader._terms_sorted[order[i]]) for i in (0, 2, 4))
    q = _queries([f"{a} {b}"], negatives=[c])
    svc = SegmentedQueryService(root, CFG, boosting=0.5)
    try:
        got = svc.search(q).to_pandas()
    finally:
        svc.shutdown()
    want = search_table(mono, q, CFG, boosting=0.5).to_pandas()
    assert len(got) == len(want) > 0
    for col in ("conv_id", "turn_idx", "rank"):
        assert (got[col].values == want[col].values).all()
    assert np.array_equal(got["score"].values, want["score"].values)
