"""Golden-oracle invariants — the conformance core mirrored from the
reference's /rank and /search tests (tests/test_ranker.py:34-35,
tests/test_search.py:41-44, tests/test_client.py:83-98)."""

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions import bm25
from clip_as_service_ray.pipelines.oracle import OracleIndex
from clip_as_service_ray.sources.transcripts import (
    reference_query_table,
    synthesize_transcripts,
)


def _small_corpus():
    return pa.table(
        {
            "conv_id": ["c1", "c1", "c2", "c2", "c3", "c3"],
            "turn_idx": pa.array([0, 1, 0, 1, 0, 1], pa.int32()),
            "role": ["user"] * 6,
            "text": [
                "the cat sat on the mat",
                "the dog",
                "cat cat cat",
                "",
                "dog and cat together",
                "unrelated words entirely",
            ],
            "tool": [""] * 6,
            "ts": pa.array([0] * 6, pa.timestamp("us")),
        }
    )


def test_drop_empty_and_stats():
    idx = OracleIndex(_small_corpus())
    assert idx.n_docs == 5  # empty turn dropped (helper.py:82-86 analog)
    assert idx.df("cat") == 3
    assert idx.df("the") == 2
    assert idx.df("zzz") == 0
    dls = [6, 2, 3, 4, 3]
    assert idx.avgdl == np.mean(dls)


def test_scores_match_hand_computed():
    idx = OracleIndex(_small_corpus())
    hits = idx.search_one("cat", limit=10)
    assert len(hits) == 3
    # hand BM25: df(cat)=3, N=5, avgdl=3.6
    n, avgdl, df = 5, 3.6, 3
    idf = np.log1p((n - df + 0.5) / (df + 0.5))

    def s(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    expected = {("c1", 0): s(1, 6), ("c2", 0): s(3, 3), ("c3", 0): s(1, 4)}
    got = {(c, t): sc for c, t, sc in hits}
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-12
    # descending order (test_ranker.py:34-35)
    scores = [sc for _, _, sc in hits]
    assert scores == sorted(scores, reverse=True)


def test_tie_break_deterministic():
    # two docs with identical text -> identical score; order by (conv, turn)
    t = pa.table(
        {
            "conv_id": ["b", "a", "a"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "role": ["user"] * 3,
            "text": ["same words here"] * 3,
            "tool": [""] * 3,
            "ts": pa.array([0] * 3, pa.timestamp("us")),
        }
    )
    idx = OracleIndex(t)
    hits = idx.search_one("same", limit=3)
    assert [(c, i) for c, i, _ in hits] == [("a", 0), ("a", 1), ("b", 0)]


def test_limit_contract_and_empty_query():
    idx = OracleIndex(_small_corpus())
    # exactly `limit` hits when corpus has >= limit matches (test_search.py:41-44)
    assert len(idx.search_one("cat", limit=2)) == 2
    assert len(idx.search_one("cat", limit=1)) == 1
    # absent term -> empty; empty query -> empty (test_client.py:83-98)
    assert idx.search_one("zzzz") == []
    assert idx.search_one("") == []
    assert idx.search_one("   ") == []


def test_batch_search_on_reference_queries():
    corpus = synthesize_transcripts(2000, seed=42)
    idx = OracleIndex(corpus)
    assert idx.n_docs > 1500
    queries = reference_query_table()
    hits = idx.search(queries)
    assert hits.schema.names == ["query_id", "rank", "conv_id", "turn_idx", "score"]
    df = hits.to_pandas()
    # hot stopword query saturates its limit
    hot = df[df.query_id == 2]
    assert len(hot) == 10
    # absent-term and empty queries yield no rows
    assert len(df[df.query_id == 3]) == 0
    assert len(df[df.query_id == 4]) == 0
    # per-query descending scores, ranks dense from 0
    for qid, g in df.groupby("query_id"):
        assert list(g["rank"]) == list(range(len(g)))
        assert list(g.score) == sorted(g.score, reverse=True)


def test_topk_indices_tiebreak():
    scores = np.array([1.0, 2.0, 2.0, 0.5])
    docs = np.array([9, 7, 3, 1])
    idx = bm25.topk_indices(scores, docs, 3)
    assert list(docs[idx]) == [3, 7, 9]


def test_board_has_no_duplicate_keys():
    """queries()/oracle_sql() are dict LITERALS: a re-added name silently
    overrides the earlier entry (this session re-invented doc_term_vectors
    before catching it) — pin zero duplicates and twin-key consistency."""
    import ast
    import collections

    src = open("/root/repo/__ray_entry__.py").read()
    tree = ast.parse(src)
    sizes = {}
    for fn in [n for n in ast.walk(tree)
               if isinstance(n, ast.FunctionDef)
               and n.name in ("queries", "oracle_sql")]:
        for node in ast.walk(fn):
            if isinstance(node, ast.Dict):
                keys = [k.value for k in node.keys
                        if isinstance(k, ast.Constant)]
                if len(keys) > 50:  # the board dict, not helper literals
                    dups = [k for k, c in collections.Counter(keys).items()
                            if c > 1]
                    assert dups == [], f"{fn.name} duplicate keys: {dups}"
                    sizes[fn.name] = set(keys)
    assert sizes["oracle_sql"] <= sizes["queries"], (
        "oracle_sql keys missing from queries(): "
        f"{sorted(sizes['oracle_sql'] - sizes['queries'])}"
    )
