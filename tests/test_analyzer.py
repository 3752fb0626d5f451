"""Analyzer mode (Porter stemming) applied symmetrically at build and query
time: engine-vs-oracle parity under analyzer="stem", morphological recall,
stats invariance (analyzers are 1:1 token maps — dl/N/avgdl never change),
phrase search over stemmed positions, and the self-describing-index contract
(stats.json records the analyzer; no search flag exists)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.oracle import OracleIndex
from clip_as_service_ray.pipelines.search import search_table
from clip_as_service_ray.sources.transcripts import (
    reference_query_table,
    synthesize_transcripts,
)

N_TURNS = 1500
CFG = EngineConfig(
    num_index_partitions=4, doc_bucket_size=512, postings_block_size=64,
    analyzer="stem",
)


def _queries(texts, limit=10):
    return pa.table(
        {
            "query_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
            "limit": pa.array([limit] * len(texts), pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("analyzer")
    corpus = synthesize_transcripts(N_TURNS, seed=7)
    src = str(root / "transcripts.parquet")
    pq.write_table(corpus, src)
    index_dir = str(root / "index")
    report = build_index(src, index_dir, CFG, overwrite=True)
    raw_dir = str(root / "index_raw")
    raw_report = build_index(
        src, raw_dir, EngineConfig(
            num_index_partitions=4, doc_bucket_size=512, postings_block_size=64
        ), overwrite=True,
    )
    return corpus, index_dir, report, raw_dir, raw_report


def test_stemmed_rank_identical_to_oracle(built):
    corpus, index_dir, report, _, _ = built
    oracle = OracleIndex(corpus, analyzer="stem")
    queries = reference_query_table()
    got = search_table(index_dir, queries, CFG).to_pandas()
    want = oracle.search(queries).to_pandas()
    assert len(got) == len(want)
    for col in ("query_id", "rank", "conv_id", "turn_idx"):
        assert (got[col].values == want[col].values).all(), col
    assert np.array_equal(got["score"].values, want["score"].values)


def test_stats_invariant_and_vocab_folds(built):
    corpus, _, report, _, raw_report = built
    # 1:1 token maps never change doc lengths or the drop-empty rule
    assert report["n_docs"] == raw_report["n_docs"]
    assert abs(report["avgdl"] - raw_report["avgdl"]) < 1e-12
    # folding merges surface forms: the stemmed vocabulary is never larger,
    # and on natural-ish text strictly smaller
    assert report["n_terms"] <= raw_report["n_terms"]
    assert report["analyzer"] == "stem" if "analyzer" in report else True


def test_analyzer_recorded_in_stats(built):
    import os

    from clip_as_service_ray.state import manifest as mf

    _, index_dir, _, raw_dir, _ = built
    assert mf.read_json(os.path.join(index_dir, "stats.json"))["analyzer"] == "stem"
    assert mf.read_json(os.path.join(raw_dir, "stats.json"))["analyzer"] is None


def test_morphological_match(ray_session, tmp_path):
    corpus = pa.table(
        {
            "conv_id": ["a", "a", "b", "c"],
            "turn_idx": pa.array([0, 1, 0, 0], pa.int32()),
            "role": ["user"] * 4,
            "text": [
                "the wires were connected quickly",
                "a totally unrelated sentence",
                "connecting wire looms takes patience",
                "nothing relevant here at all",
            ],
        }
    )
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, CFG, overwrite=True)
    hits = search_table(idx, _queries(["connection wiring"]), CFG).to_pandas()
    got = set(zip(hits.conv_id, hits.turn_idx))
    # stems: connection->connect, wiring->wire match connected/connecting/wires/wire
    assert ("a", 0) in got and ("b", 0) in got
    assert ("a", 1) not in got and ("c", 0) not in got

    raw_idx = str(tmp_path / "raw")
    build_index(corpus, raw_idx, EngineConfig(), overwrite=True)
    raw_hits = search_table(raw_idx, _queries(["connection wiring"])).to_pandas()
    assert len(raw_hits) == 0  # no exact surface forms anywhere


def test_phrase_over_stemmed_positions(ray_session, tmp_path):
    from clip_as_service_ray.pipelines.phrase import phrase_search_table

    corpus = pa.table(
        {
            "conv_id": ["a", "b", "c"],
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "role": ["user"] * 3,
            "text": [
                "he was running fast yesterday",
                "she runs fast every day",
                "fast running is tiring",  # reversed order: no phrase hit
            ],
        }
    )
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, CFG, overwrite=True, positions=True)
    hits = phrase_search_table(idx, _queries(["runs fast"]), CFG).to_pandas()
    got = set(zip(hits.conv_id, hits.turn_idx))
    assert got == {("a", 0), ("b", 0)}
    # proximity window catches the reversed doc too
    prox = phrase_search_table(
        idx, _queries(["running fast"]), CFG, window=2
    ).to_pandas()
    assert set(zip(prox.conv_id, prox.turn_idx)) == {("a", 0), ("b", 0), ("c", 0)}


def test_conjunctive_mode_folds_queries(ray_session, tmp_path):
    corpus = pa.table(
        {
            "conv_id": ["a", "b"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user"] * 2,
            "text": ["caching strategies improved", "caching nothing else"],
        }
    )
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, CFG, overwrite=True)
    hits = search_table(
        idx, _queries(["cached improvements"]), CFG, conjunctive=True
    ).to_pandas()
    assert set(zip(hits.conv_id, hits.turn_idx)) == {("a", 0)}


def test_unknown_analyzer_raises(ray_session, tmp_path):
    with pytest.raises(ValueError, match="unknown analyzer"):
        build_index(
            synthesize_transcripts(10, seed=1),
            str(tmp_path / "idx"),
            EngineConfig(analyzer="nosuch"),
            overwrite=True,
        )


def test_segment_analyzer_mismatch_raises(ray_session, tmp_path):
    from clip_as_service_ray.pipelines.sharded import ScatterQueryService

    corpus = synthesize_transcripts(60, seed=3)
    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(corpus, d1, CFG, overwrite=True)
    build_index(corpus, d2, EngineConfig(), overwrite=True)
    with pytest.raises(ValueError, match="different analyzers"):
        ScatterQueryService(
            [d1, d2],
            {"n_docs": 1, "avgdl": 1.0, "df_path": "unused"},
            CFG,
        )


# ---- stopword analyzer (stream-level, token-dropping) ----


def test_stop_rank_identical_to_oracle(ray_session, tmp_path):
    scfg = EngineConfig(
        num_index_partitions=4, doc_bucket_size=512, postings_block_size=64,
        analyzer="stop+stem",
    )
    corpus = synthesize_transcripts(800, seed=13)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, scfg, overwrite=True)
    oracle = OracleIndex(corpus, analyzer="stop+stem")
    queries = reference_query_table()
    got = search_table(idx, queries, scfg).to_pandas()
    want = oracle.search(queries).to_pandas()
    assert len(got) == len(want)
    for col in ("query_id", "rank", "conv_id", "turn_idx"):
        assert (got[col].values == want[col].values).all(), col
    assert np.array_equal(got["score"].values, want["score"].values)


def test_stopwords_dropped_and_dl_counts_survivors(ray_session, tmp_path):
    corpus = pa.table(
        {
            "conv_id": ["a", "b", "c"],
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "role": ["user"] * 3,
            "text": [
                "the cat sat on the mat",
                "and or not but if",          # ALL stopwords -> dropped doc
                "a cat and a dog",
            ],
        }
    )
    scfg = EngineConfig(num_index_partitions=2, analyzer="stop")
    idx = str(tmp_path / "idx")
    report = build_index(corpus, idx, scfg, overwrite=True)
    # doc b vanishes (drop-empty over the filtered stream); dl counts
    # survivors: a -> [cat, sat, mat] = 3, c -> [cat, dog] = 2
    assert report["n_docs"] == 2
    assert abs(report["avgdl"] - 2.5) < 1e-12
    # a stopword query matches nothing; content terms still rank
    assert len(search_table(idx, _queries(["the"]), scfg)) == 0
    hits = search_table(idx, _queries(["cat"]), scfg).to_pandas()
    assert set(hits.conv_id) == {"a", "c"}


def test_stop_phrase_over_filtered_positions(ray_session, tmp_path):
    from clip_as_service_ray.pipelines.phrase import phrase_search_table

    corpus = pa.table(
        {
            "conv_id": ["a", "b"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user"] * 2,
            "text": [
                "merge of the window",   # filtered stream: merge window
                "window merge",          # reversed: no phrase hit
            ],
        }
    )
    scfg = EngineConfig(num_index_partitions=2, analyzer="stop")
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, scfg, overwrite=True, positions=True)
    hits = phrase_search_table(
        idx, _queries(["merge of the window"]), scfg
    ).to_pandas()
    # query folds to [merge, window]; doc a's filtered stream is adjacent
    assert set(zip(hits.conv_id, hits.turn_idx)) == {("a", 0)}


def test_stopword_synonym_key_skipped(ray_session, tmp_path):
    corpus = pa.table(
        {
            "conv_id": ["a"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["merge window pipeline"],
        }
    )
    scfg = EngineConfig(num_index_partitions=2, analyzer="stop")
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, scfg, overwrite=True)
    # 'the' folds to nothing under stop: the map entry is dropped, search
    # still works
    hits = search_table(
        idx, _queries(["merge"]), scfg, synonyms={"the": ["window"]}
    ).to_pandas()
    assert len(hits) == 1


def test_add_segment_analyzer_guard(ray_session, tmp_path):
    from clip_as_service_ray.pipelines.segments import add_segment

    root = str(tmp_path / "segroot")
    corpus = synthesize_transcripts(40, seed=9)
    add_segment(root, corpus, CFG)  # stemmed root
    with pytest.raises(ValueError, match="refusing to add a segment"):
        add_segment(root, corpus, EngineConfig())
