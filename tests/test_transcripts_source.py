"""Deterministic synthetic transcripts: schema, determinism, edge rows."""

import pyarrow as pa

from clip_as_service_ray.sources.transcripts import (
    EDGE_TEXTS,
    TRANSCRIPTS_SCHEMA,
    reference_query_table,
    synthesize_transcripts,
)


def test_schema_and_count():
    t = synthesize_transcripts(1000, seed=42)
    assert t.schema.equals(TRANSCRIPTS_SCHEMA)
    assert t.num_rows == 1000


def test_deterministic():
    a = synthesize_transcripts(500, seed=42)
    b = synthesize_transcripts(500, seed=42)
    assert a.equals(b)
    c = synthesize_transcripts(500, seed=7)
    assert not a.equals(c)


def test_key_unique_and_dense():
    t = synthesize_transcripts(2000, seed=42).to_pandas()
    assert not t.duplicated(["conv_id", "turn_idx"]).any()
    for _, g in t.groupby("conv_id"):
        idx = sorted(g.turn_idx)
        assert idx == list(range(len(idx)))  # dense 0-based
        # ts monotone within conversation under turn order
        ts = list(g.sort_values("turn_idx").ts)
        assert ts == sorted(ts)


def test_edge_rows_present():
    t = synthesize_transcripts(1000, seed=42)
    texts = set(t.column("text").to_pylist())
    for e in EDGE_TEXTS:
        assert e in texts


def test_query_table():
    q = reference_query_table()
    assert q.column_names == ["query_id", "text", "limit"]
    assert q.num_rows >= 10
