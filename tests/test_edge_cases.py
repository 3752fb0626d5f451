"""Edge contracts (M9 analog: empty input -> empty output, no error;
tests/test_client.py:76-144): empty corpus, all-empty texts, multi-file
inputs, empty index search."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.search import search_table
from clip_as_service_ray.sources.transcripts import (
    TRANSCRIPTS_SCHEMA,
    reference_query_table,
    synthesize_transcripts,
)

CFG = EngineConfig(num_index_partitions=2)


def _empty_corpus():
    return TRANSCRIPTS_SCHEMA.empty_table()


def _whitespace_corpus():
    return pa.table(
        {
            "conv_id": ["a", "b"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user", "user"],
            "text": ["", "   \t "],
            "tool": ["", ""],
            "ts": pa.array([0, 0], pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def test_empty_corpus_build_and_search(ray_session, tmp_path):
    idx = str(tmp_path / "empty_idx")
    report = build_index(_empty_corpus(), idx, CFG, overwrite=True)
    assert report["n_docs"] == 0
    assert report["n_postings"] == 0
    hits = search_table(idx, reference_query_table(), CFG)
    assert hits.num_rows == 0
    assert hits.schema.names == ["query_id", "rank", "conv_id", "turn_idx", "score"]


def test_all_whitespace_corpus(ray_session, tmp_path):
    """Every turn drops under the empty-text rule -> empty index, no error."""
    idx = str(tmp_path / "ws_idx")
    report = build_index(_whitespace_corpus(), idx, CFG, overwrite=True)
    assert report["n_docs"] == 0
    hits = search_table(idx, reference_query_table(), CFG)
    assert hits.num_rows == 0


def test_multi_file_input(ray_session, tmp_path):
    """source may be a list of parquet files (the many-shard input shape)."""
    corpus = synthesize_transcripts(1000, seed=42)
    half = corpus.num_rows // 2
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(corpus.slice(0, half), p1)
    pq.write_table(corpus.slice(half), p2)
    idx = str(tmp_path / "mf_idx")
    report = build_index([p1, p2], idx, CFG, overwrite=True)

    idx_single = str(tmp_path / "single_idx")
    p_all = str(tmp_path / "all.parquet")
    pq.write_table(corpus, p_all)
    report2 = build_index(p_all, idx_single, CFG, overwrite=True)
    assert report["n_docs"] == report2["n_docs"]
    assert report["n_postings"] == report2["n_postings"]
    a = search_table(idx, reference_query_table(), CFG).to_pandas()
    b = search_table(idx_single, reference_query_table(), CFG).to_pandas()
    assert a.equals(b)


def test_empty_query_table(ray_session, tmp_path):
    corpus = synthesize_transcripts(500, seed=42)
    idx = str(tmp_path / "q_idx")
    build_index(corpus, idx, CFG, overwrite=True)
    empty_q = pa.table(
        {"query_id": pa.array([], pa.int64()), "text": pa.array([], pa.string()),
         "limit": pa.array([], pa.int32())}
    )
    hits = search_table(idx, empty_q, CFG)
    assert hits.num_rows == 0
