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
