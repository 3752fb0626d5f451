"""Query-assist + curation operators (spell suggest, autocomplete, facets,
n-gram decontamination) vs DuckDB at sf0.001 — fast in-suite twins of the
driver oracle entries, plus kernel edge cases the oracle can't see."""

import duckdb
import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"

_PAT_SQL = (
    r"<\|startoftext\|>|<\|endoftext\|>|''s|''t|''re|''ve|''m|''ll|''d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
)


def _docs_view(con):
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )


def test_spell_suggest_matches_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import spell_suggest

    got = spell_suggest(SF, queries=("merg", "jon", "sot"), max_dist=2, k=5)
    got = got.to_pandas().sort_values(["query", "dist", "term"]).reset_index(drop=True)
    con = duckdb.connect()
    _docs_view(con)
    want = con.execute(
        "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '"
        + _PAT_SQL
        + "')) AS term FROM documents), "
        "df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term), "
        "q(query) AS (VALUES ('merg'), ('jon'), ('sot')), "
        "cand AS (SELECT q.query, d.term, levenshtein(q.query, d.term)::BIGINT AS dist, d.df "
        "FROM q, df d WHERE levenshtein(q.query, d.term) <= 2) "
        "SELECT query, term, dist, df FROM (SELECT cand.*, row_number() OVER ("
        "PARTITION BY query ORDER BY dist ASC, df DESC, term ASC) AS rn FROM cand) "
        "WHERE rn <= 5 ORDER BY query, dist, term"
    ).df()
    assert got["query"].tolist() == want["query"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["dist"].tolist() == want["dist"].tolist()
    assert got["df"].tolist() == want["df"].tolist()


def test_spell_suggest_no_match(ray_session):
    from clip_as_service_ray.pipelines.operators import spell_suggest

    got = spell_suggest(SF, queries=("zzzzzzzzzz",), max_dist=1, k=5)
    assert len(got) == 0
    assert got.column_names == ["query", "term", "dist", "df"]


def test_autocomplete_matches_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import autocomplete_prefix

    got = autocomplete_prefix(SF, prefixes=("s", "wi"), k=5)
    got = got.to_pandas().sort_values(["prefix", "term"]).reset_index(drop=True)
    con = duckdb.connect()
    _docs_view(con)
    want = con.execute(
        "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '"
        + _PAT_SQL
        + "')) AS term FROM documents), "
        "df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term), "
        "q(prefix) AS (VALUES ('s'), ('wi')), "
        "cand AS (SELECT q.prefix, d.term, d.df FROM q, df d "
        "WHERE starts_with(d.term, q.prefix)) "
        "SELECT prefix, term, df FROM (SELECT cand.*, row_number() OVER ("
        "PARTITION BY prefix ORDER BY df DESC, term ASC) AS rn FROM cand) "
        "WHERE rn <= 5 ORDER BY prefix, term"
    ).df()
    assert got["prefix"].tolist() == want["prefix"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["df"].tolist() == want["df"].tolist()


def test_search_facets_matches_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import search_facets

    got = search_facets(SF).to_pandas()
    got = got.sort_values(["facet", "value"]).reset_index(drop=True)
    con = duckdb.connect()
    _docs_view(con)
    want = con.execute(
        "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '"
        + _PAT_SQL
        + "')) AS term FROM documents), "
        "m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('merge', 'window')) "
        "SELECT 'lang' AS facet, lang AS value, count(*)::BIGINT AS n_docs "
        "FROM documents JOIN m USING (doc_id) GROUP BY lang "
        "UNION ALL SELECT 'source', source, count(*)::BIGINT "
        "FROM documents JOIN m USING (doc_id) GROUP BY source "
        "ORDER BY facet, value"
    ).df()
    assert got["facet"].tolist() == want["facet"].tolist()
    assert got["value"].tolist() == want["value"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()


def test_ngram_contamination_matches_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import ngram_contamination

    got = ngram_contamination(SF, n=3).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    _docs_view(con)
    want = con.execute(
        "WITH t AS (SELECT doc_id, source, regexp_extract_all(lower(text), '"
        + _PAT_SQL
        + "') AS toks FROM documents), "
        "g AS (SELECT doc_id, source, array_to_string(toks[i:i+2], ' ') AS shingle "
        "FROM t, unnest(generate_series(1, greatest(len(toks)-2, 0))) AS u(i)), "
        "bench AS (SELECT DISTINCT shingle FROM g WHERE source = 'src0'), "
        "corp AS (SELECT DISTINCT doc_id, shingle FROM g WHERE source <> 'src0') "
        "SELECT c.doc_id, count(*)::BIGINT AS n_overlap FROM corp c "
        "JOIN bench b USING (shingle) GROUP BY c.doc_id ORDER BY c.doc_id"
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_overlap"].tolist() == want["n_overlap"].tolist()
    assert len(got) > 0  # the fixture must actually exercise overlap


def test_flat_ngrams_row_boundaries():
    """Shingles never span rows; short rows contribute nothing; per-row
    dedupe in the contamination kernel is batch-local-exact."""
    from clip_as_service_ray.pipelines.operators import _flat_ngrams

    col = pa.chunked_array(
        [pa.array(["a b c d", "x y", "a b c d e", ""], pa.string())]
    )
    grams, row_of, n_rows = _flat_ngrams(col, 3)
    assert n_rows == 4
    assert grams.to_pylist() == ["a b c", "b c d", "a b c", "b c d", "c d e"]
    assert row_of.tolist() == [0, 0, 2, 2, 2]

    grams2, row2, _ = _flat_ngrams(pa.chunked_array([pa.array(["x y"], pa.string())]), 3)
    assert len(grams2) == 0 and len(row2) == 0


def test_query_cache_identical_results_and_counter(ray_session, tmp_path):
    """Per-replica LRU result cache: second identical request returns the
    SAME hits (bit-identical scores) and the profile counter moves."""
    import pyarrow as pa

    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.serving import QueryService
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts

    cfg = EngineConfig(num_index_partitions=2, query_concurrency=1,
                       query_cache_size=8)
    idx = str(tmp_path / "idx")
    build_index(synthesize_transcripts(400, seed=17), idx, cfg, overwrite=True)
    svc = QueryService(idx, cfg, num_replicas=1)
    try:
        q = pa.table(
            {"query_id": pa.array([0], pa.int64()),
             "text": ["merge window"],
             "limit": pa.array([5], pa.int32())}
        )
        first = svc.search(q)
        second = svc.search(q)
        assert first.equals(second)
        prof = svc.profile()
        assert prof.get("cache_hits", 0) >= 1
    finally:
        svc.shutdown()


def test_pack_sequences_matches_duckdb(ray_session):
    """GPT-style packing manifest vs the SQL window-sum twin at a NON-default
    seq_len, plus packer invariants the SQL can't see: first_seq
    nondecreasing in doc order and exclusive-prefix reconstruction."""
    import duckdb

    from clip_as_service_ray.pipelines.operators import pack_sequences

    L = 96
    got = (
        pack_sequences(SF, seq_len=L)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    _docs_view(con)
    want = con.execute(
        "WITH cnt AS (SELECT doc_id, "
        "len(regexp_extract_all(lower(text), '" + _PAT_SQL + "'))::BIGINT AS n "
        "FROM documents), "
        "s AS (SELECT doc_id, n, coalesce(sum(n) OVER ("
        "  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
        "), 0)::BIGINT AS prev FROM cnt) "
        f"SELECT doc_id, n AS n_tokens, (prev // {L})::BIGINT AS first_seq, "
        f"((prev + greatest(n, 1) - 1) // {L})::BIGINT AS last_seq "
        "FROM s ORDER BY doc_id"
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert got["first_seq"].tolist() == want["first_seq"].tolist()
    assert got["last_seq"].tolist() == want["last_seq"].tolist()
    first = got["first_seq"].to_numpy()
    assert (np.diff(first) >= 0).all()
    prev = np.concatenate([[0], np.cumsum(got["n_tokens"].to_numpy())[:-1]])
    assert (first == prev // L).all()
