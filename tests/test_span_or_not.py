"""Lucene SpanOrQuery / SpanNotQuery kernels vs DuckDB at sf0.001, plus
kernel identities (single-clause degeneration, absent-exclude no-op)."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _oracle(entry: str):
    import __ray_entry__ as re_

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(re_.oracle_sql()[entry]).df()


def test_span_or_vs_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import span_or_search

    got = span_or_search(SF).to_pandas()
    want = _oracle("span_or_search")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["span_tf"].tolist() == want["span_tf"].tolist()
    assert got["first_pos"].tolist() == want["first_pos"].tolist()


def test_span_not_vs_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import span_not_search

    got = span_not_search(SF).to_pandas()
    want = _oracle("span_not_search")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["span_tf"].tolist() == want["span_tf"].tolist()
    assert got["first_pos"].tolist() == want["first_pos"].tolist()


def test_span_or_single_clause_is_phrase(ray_session):
    """SpanOr over one clause must equal the plain phrase kernel, and a
    SpanNot with an absent exclude term must be a no-op."""
    from clip_as_service_ray.pipelines.operators import (
        _docs_as_transcripts,
        _index_dir_for,
    )
    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import build_positions
    from clip_as_service_ray.stages.positions import PositionsReader

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(SF)
    build_index(_docs_as_transcripts(SF), index_dir, cfg)
    build_positions(_docs_as_transcripts(SF), index_dir, cfg)
    r = PositionsReader(index_dir)
    terms = r.query_tokens("merge part")

    d0, t0, f0 = r.phrase_docs(terms)
    d1, t1, f1 = r.span_or_docs([terms])
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(f0, f1)

    d2, t2, f2 = r.span_not_docs(terms, ["zzzabsent"], pre=3, post=3)
    np.testing.assert_array_equal(d0, d2)
    np.testing.assert_array_equal(t0, t2)
    np.testing.assert_array_equal(f0, f2)

    # span_not with pre=post=0 and exclude == include kills everything
    # (the include span always overlaps itself)
    d3, t3, f3 = r.span_not_docs(terms, terms)
    assert len(d3) == 0


def test_span_mode_mutual_exclusion(ray_session):
    import pyarrow as pa
    import pytest

    from clip_as_service_ray.pipelines.operators import _index_dir_for
    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.phrase import phrase_search_table

    index_dir = _index_dir_for(SF)
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array(["merge part"]),
            "limit": pa.array([5], pa.int32()),
            "window": pa.array([3], pa.int32()),
            "span_or": pa.array([True], pa.bool_()),
        }
    )
    with pytest.raises(Exception, match="mutually exclusive"):
        phrase_search_table(index_dir, q, EngineConfig())


def test_interval_search_vs_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import interval_search

    got = interval_search(SF).to_pandas()
    want = _oracle("interval_search")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["interval_tf"].tolist() == want["interval_tf"].tolist()
    assert got["first_pos"].tolist() == want["first_pos"].tolist()


def test_interval_gap_zero_is_phrase(ray_session):
    """max_gaps=0 (adjacent, ordered) must equal the exact 2-term phrase."""
    from clip_as_service_ray.pipelines.operators import _index_dir_for
    from clip_as_service_ray.stages.positions import PositionsReader

    r = PositionsReader(_index_dir_for(SF))
    d0, t0, f0 = r.phrase_docs(["merge", "part"])
    d1, t1, f1 = r.interval_docs("merge", "part", 0)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(f0, f1)


def test_rare_terms_vs_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import rare_terms

    got = rare_terms(SF).to_pandas()
    want = _oracle("rare_terms")
    assert got["term"].tolist() == want["term"].tolist()
    assert got["df"].tolist() == want["df"].tolist()
    assert len(got) >= 1  # the corpus has a planted long-tail term ('dup')


def test_span_within_vs_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import span_within_search

    got = span_within_search(SF).to_pandas()
    want = _oracle("span_within_search")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["span_tf"].tolist() == want["span_tf"].tolist()
    assert got["first_pos"].tolist() == want["first_pos"].tolist()


def test_span_containing_vs_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import span_containing_search

    got = span_containing_search(SF).to_pandas()
    want = _oracle("span_containing_search")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["span_tf"].tolist() == want["span_tf"].tolist()
    assert got["first_pos"].tolist() == want["first_pos"].tolist()


def test_span_within_identities(ray_session):
    """little == big degenerates to the phrase kernel; a big phrase shorter
    than little yields nothing; little-within-itself also degenerates."""
    from clip_as_service_ray.pipelines.operators import (
        _docs_as_transcripts,
        _index_dir_for,
    )
    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import build_positions
    from clip_as_service_ray.stages.positions import PositionsReader

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(SF)
    build_index(_docs_as_transcripts(SF), index_dir, cfg)
    build_positions(_docs_as_transcripts(SF), index_dir, cfg)
    r = PositionsReader(index_dir)
    big = r.query_tokens("window join")

    d0, t0, f0 = r.phrase_docs(big)
    d1, t1, f1 = r.span_within_docs(big, big)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(f0, f1)

    d2, _t2, _f2 = r.span_within_docs(big, ["join"])  # big shorter: empty
    assert len(d2) == 0

    # every 'window' occurrence inside 'window join' = the phrase's starts
    d3, t3, f3 = r.span_within_docs(["window"], big)
    np.testing.assert_array_equal(d0, d3)
    np.testing.assert_array_equal(t0, t3)
    np.testing.assert_array_equal(f0, f3)


def test_span_containing_brute_force(ray_session):
    """Kernel vs a per-doc brute force over the raw corpus (pair envelopes
    containing the little term)."""
    import pyarrow.parquet as pq

    from clip_as_service_ray.functions.tokenizer import tokenize
    from clip_as_service_ray.pipelines.operators import (
        _docs_as_transcripts,
        _index_dir_for,
    )
    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import build_positions
    from clip_as_service_ray.stages.positions import PositionsReader

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(SF)
    build_index(_docs_as_transcripts(SF), index_dir, cfg)
    build_positions(_docs_as_transcripts(SF), index_dir, cfg)
    r = PositionsReader(index_dir)
    W = 5
    d, t, f = r.span_containing_docs("merge", "sort", W, ["fast"])

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp = {}
    for doc_id, text in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        toks = tokenize(text)
        pa_ = [i for i, x in enumerate(toks) if x == "merge"]
        pb_ = [i for i, x in enumerate(toks) if x == "sort"]
        pl_ = [i for i, x in enumerate(toks) if x == "fast"]
        hits = [
            (min(a, b), max(a, b))
            for a in pa_ for b in pb_
            if abs(a - b) <= W
            and any(lo <= s <= hi for s in pl_
                    for lo, hi in [(min(a, b), max(a, b))])
        ]
        if hits:
            exp[doc_id] = (len(hits), min(h[0] for h in hits))
    got = {int(dd): (int(tt), int(ff)) for dd, tt, ff in zip(d, t, f)}
    assert got == exp
